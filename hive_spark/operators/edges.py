"""Semantic-edge conformance queries — SURVEY §7's "genuinely hard" list.

Hive-vs-Spark divergences that need explicit handling, each pinned by an
oracle so regressions surface as hash mismatches:

- null-safe equality `<=>` (Hive GenericUDFOPEqualNS; joins on nullable
  keys must not drop NULL=NULL pairs)
- ASC NULLS LAST default ordering (hive.default.nulls.last=true, ref:
  common/src/java/org/apache/hadoop/hive/conf/HiveConf.java:1926 — Spark
  defaults NULLS FIRST, so the engine emits asc_nulls_last)
- exact `percentile` (Hive UDAFPercentile over longs: linear
  interpolation — Spark `percentile` matches; verified against DuckDB
  quantile_cont)
- interval arithmetic (INTERVAL_YEAR_MONTH / INTERVAL_DAY_TIME primitives,
  ref: serde PrimitiveObjectInspector.java:37-39)
- implicit string<->number coercion ('7' = 7, int/int -> double; Hive
  FunctionRegistry coercion rules)

The testdata has no NULLs, so NULLIF manufactures them deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hive_spark.operators import QuerySpec, views


def _mk(sql: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        views(spark, sf_dir)
        return spark.sql(sql)

    return run


# NULLIF(x % 5, 0) yields NULL for multiples of five on both engines;
# <=> (Spark) and IS NOT DISTINCT FROM (standard / DuckDB) must agree,
# including the NULL<=>NULL = TRUE join matches.
_NULL_SAFE_SPARK = """
WITH a AS (SELECT n_nationkey, NULLIF(n_regionkey % 2, 0) AS k FROM nation),
     b AS (SELECT r_regionkey, NULLIF(r_regionkey % 2, 0) AS k FROM region)
SELECT a.n_nationkey, b.r_regionkey
FROM a JOIN b ON a.k <=> b.k
ORDER BY a.n_nationkey, b.r_regionkey
"""

_NULL_SAFE_DUCK = """
WITH a AS (SELECT n_nationkey, NULLIF(n_regionkey % 2, 0) AS k FROM nation),
     b AS (SELECT r_regionkey, NULLIF(r_regionkey % 2, 0) AS k FROM region)
SELECT a.n_nationkey, b.r_regionkey
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
ORDER BY a.n_nationkey, b.r_regionkey
"""


# Hive default ordering: ASC NULLS LAST. Spark SQL `ASC NULLS LAST` spelled
# explicitly (the engine's translation rule); DuckDB default is already
# NULLS LAST for ASC.
_NULLS_LAST_SPARK = """
SELECT c_custkey, NULLIF(c_nationkey, 3) AS nk
FROM customer
ORDER BY nk ASC NULLS LAST, c_custkey
LIMIT 200
"""

_NULLS_LAST_DUCK = """
SELECT c_custkey, NULLIF(c_nationkey, 3) AS nk
FROM customer
ORDER BY nk ASC NULLS LAST, c_custkey
LIMIT 200
"""


# exact percentile over integral values (Hive UDAFPercentile): Spark's
# percentile() interpolates linearly, as does DuckDB quantile_cont.
_PCTL_SPARK = """
SELECT l_returnflag,
       CAST(percentile(CAST(l_quantity AS BIGINT), 0.5) AS DECIMAL(18,6)) AS p50,
       CAST(percentile(CAST(l_quantity AS BIGINT), 0.95) AS DECIMAL(18,6)) AS p95,
       CAST(percentile(CAST(l_quantity AS BIGINT),
                       array(0.25, 0.75))[0] AS DECIMAL(18,6)) AS p25
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""

_PCTL_DUCK = """
SELECT l_returnflag,
       CAST(quantile_cont(CAST(l_quantity AS BIGINT), 0.5) AS DECIMAL(18,6)) AS p50,
       CAST(quantile_cont(CAST(l_quantity AS BIGINT), 0.95) AS DECIMAL(18,6)) AS p95,
       CAST(quantile_cont(CAST(l_quantity AS BIGINT), 0.25) AS DECIMAL(18,6)) AS p25
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# interval arithmetic: +3 months (year-month interval), +36 hours
# (day-time interval), month boundaries per Hive add_months semantics
_INTERVAL_SPARK = """
SELECT o_orderkey,
       CAST(o_orderdate + INTERVAL '3' MONTH AS DATE) AS plus_3m,
       CAST(o_orderdate + INTERVAL '36' HOUR AS TIMESTAMP_NTZ) AS plus_36h,
       CAST(add_months(o_orderdate, 1) AS DATE) AS next_month
FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey
"""

_INTERVAL_DUCK = """
SELECT o_orderkey,
       CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3m,
       o_orderdate + INTERVAL 36 HOUR AS plus_36h,
       CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS next_month
FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey
"""


# implicit coercions: string-number comparison and int/int division.
# Spark and Hive both compare '7' = 7 numerically; 7/2 -> 3.5 (double).
_COERCE_SPARK = """
SELECT n_nationkey,
       CAST(n_nationkey AS STRING) = n_nationkey AS str_eq_int,
       n_nationkey / 4 AS int_div_double,
       n_nationkey div 4 AS int_div_int
FROM nation ORDER BY n_nationkey
"""

_COERCE_DUCK = """
SELECT n_nationkey,
       CAST(CAST(n_nationkey AS VARCHAR) AS INT) = n_nationkey AS str_eq_int,
       n_nationkey / 4 AS int_div_double,
       n_nationkey // 4 AS int_div_int
FROM nation ORDER BY n_nationkey
"""


REGISTRY: dict[str, QuerySpec] = {
    "edge_null_safe_join": QuerySpec(_mk(_NULL_SAFE_SPARK), _NULL_SAFE_DUCK),
    "edge_nulls_last_order": QuerySpec(_mk(_NULLS_LAST_SPARK), _NULLS_LAST_DUCK),
    "edge_exact_percentile": QuerySpec(_mk(_PCTL_SPARK), _PCTL_DUCK),
    "edge_interval_arith": QuerySpec(_mk(_INTERVAL_SPARK), _INTERVAL_DUCK),
    "edge_implicit_coercion": QuerySpec(_mk(_COERCE_SPARK), _COERCE_DUCK),
}
