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
       CAST(n_nationkey // 4 AS BIGINT) AS int_div_int
FROM nation ORDER BY n_nationkey
"""


# grouping__id bit order (SURVEY §7 hard list): leftmost GROUP BY column is
# the MOST significant bit (Hive ≥2.3 and Spark agree; pinned vs DuckDB's
# per-column GROUPING() composed explicitly).
_GROUPING_ID_SPARK = """
SELECT r_name, n_name, CAST(grouping_id() AS INT) AS gid,
       COUNT(*) AS n
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name GROUPING SETS ((r_name, n_name), (r_name), ())
ORDER BY gid, r_name, n_name
"""

_GROUPING_ID_DUCK = """
SELECT r_name, n_name,
       CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS INT) AS gid,
       COUNT(*) AS n
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
ORDER BY gid, r_name, n_name
"""


# xpath family (Hive UDFXPath*, SURVEY §2.11 JSON/URL/XML) over synthesized
# XML; DuckDB has no xpath so the oracle recomputes via regexp/arithmetic.
_XPATH_SPARK = """
WITH x AS (
    SELECT n_nationkey,
           concat('<nation><id>', CAST(n_nationkey AS STRING),
                  '</id><region>', CAST(n_regionkey AS STRING),
                  '</region></nation>') AS xml
    FROM nation
)
SELECT n_nationkey,
       xpath_int(xml, '/nation/id') AS id_val,
       xpath_int(xml, '/nation/region') AS region_val,
       CAST(xpath_boolean(xml, '/nation/id > 10') AS BOOLEAN) AS id_gt_10,
       size(xpath(xml, '/nation/*')) AS n_children
FROM x ORDER BY n_nationkey
"""

_XPATH_DUCK = """
SELECT n_nationkey,
       n_nationkey AS id_val,
       n_regionkey AS region_val,
       n_nationkey > 10 AS id_gt_10,
       2 AS n_children
FROM nation ORDER BY n_nationkey
"""


# VARIANT (semi-structured, Hive VariantTypeInfo / serde2/variant — new):
# Spark 4 parse_json/variant_get vs DuckDB native JSON operators.
_VARIANT_SPARK = """
SELECT event_type,
       SUM(variant_get(parse_json(props), '$.k', 'bigint')) AS sum_k,
       COUNT(CASE WHEN variant_get(parse_json(props), '$.k', 'bigint') > 50
                  THEN 1 END) AS n_big
FROM events GROUP BY event_type ORDER BY event_type
"""

_VARIANT_DUCK = """
SELECT event_type,
       SUM(CAST(props->>'k' AS BIGINT)) AS sum_k,
       COUNT(CASE WHEN CAST(props->>'k' AS BIGINT) > 50 THEN 1 END) AS n_big
FROM events GROUP BY event_type ORDER BY event_type
"""


REGISTRY: dict[str, QuerySpec] = {
    "edge_grouping_id": QuerySpec(_mk(_GROUPING_ID_SPARK), _GROUPING_ID_DUCK),
    "func_xpath": QuerySpec(_mk(_XPATH_SPARK), _XPATH_DUCK),
    "edge_variant": QuerySpec(_mk(_VARIANT_SPARK), _VARIANT_DUCK),
    "edge_null_safe_join": QuerySpec(_mk(_NULL_SAFE_SPARK), _NULL_SAFE_DUCK),
    "edge_nulls_last_order": QuerySpec(_mk(_NULLS_LAST_SPARK), _NULLS_LAST_DUCK),
    "edge_exact_percentile": QuerySpec(_mk(_PCTL_SPARK), _PCTL_DUCK),
    "edge_interval_arith": QuerySpec(_mk(_INTERVAL_SPARK), _INTERVAL_DUCK),
    "edge_implicit_coercion": QuerySpec(_mk(_COERCE_SPARK), _COERCE_DUCK),
}
