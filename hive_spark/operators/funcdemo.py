"""Scalar-function surface demos — SURVEY §2.11 (string/math/date/
conditional/complex/JSON families, ref: ql/.../exec/FunctionRegistry.java
registrations :286-662).

Nearly all of Hive's scalar registry exists natively in Spark; these
queries prove the shared subset end-to-end against DuckDB. Functions with
no DuckDB analog (soundex, levenshtein vs oracle, months_between, masking,
xpath, ...) are unit-tested with literal expectations in
tests/test_functions.py instead.

Determinism: only exact operations face the oracle — integer/date
arithmetic, string transforms, IEEE-exact sqrt, per-value decimal casts.
Transcendentals (ln/exp/pow) stay in tolerance-based unit tests because
libm last-ulp behavior differs across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_spark.operators import QuerySpec, views

D2 = "decimal(18,2)"


def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = views(spark, sf_dir)
    s = F.col("c_name")
    return (
        t["customer"]
        .select(
            "c_custkey",
            F.upper(s).alias("up"),
            F.lower(s).alias("lo"),
            F.length(s).alias("len"),
            F.substring(s, 2, 5).alias("sub"),
            F.lpad(s, 22, "*").alias("lp"),
            F.rpad(s, 22, "#").alias("rp"),
            F.reverse(s).alias("rev"),
            F.regexp_replace(s, "[0-9]+", "N").alias("rre"),
            F.concat_ws("-", F.lit("cust"), s).alias("cw"),
            F.instr(s, "1").alias("pos1"),
            F.trim(F.lpad(s, 25, " ")).alias("trm"),
            F.split_part(s, F.lit("#"), F.lit(2)).alias("part2"),
        )
        .orderBy("c_custkey")
    )


_STRING_SQL = """
SELECT c_custkey,
       UPPER(c_name) AS up, LOWER(c_name) AS lo,
       CAST(LENGTH(c_name) AS INT) AS len,
       SUBSTR(c_name, 2, 5) AS sub,
       LPAD(c_name, 22, '*') AS lp, RPAD(c_name, 22, '#') AS rp,
       REVERSE(c_name) AS rev,
       REGEXP_REPLACE(c_name, '[0-9]+', 'N', 'g') AS rre,
       CONCAT_WS('-', 'cust', c_name) AS cw,
       CAST(STRPOS(c_name, '1') AS INT) AS pos1,
       TRIM(LPAD(c_name, 25, ' ')) AS trm,
       SPLIT_PART(c_name, '#', 2) AS part2
FROM customer ORDER BY c_custkey
"""


def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = views(spark, sf_dir)
    x = F.col("o_totalprice")
    return (
        t["orders"]
        .select(
            "o_orderkey",
            F.round(x, 1).cast(D2).alias("rnd"),
            F.floor(x).cast("bigint").alias("flr"),
            F.ceil(x).cast("bigint").alias("cl"),
            F.abs(x - 100000).cast(D2).alias("ab"),
            F.signum(x - 100000).cast("int").alias("sgn"),
            F.sqrt(x).cast(D2).alias("sq"),
            F.pmod(F.col("o_orderkey"), F.lit(7)).cast("int").alias("md"),
            F.greatest(x, F.lit(50000.0)).cast(D2).alias("gr"),
            F.least(x, F.lit(50000.0)).cast(D2).alias("ls"),
        )
        .orderBy("o_orderkey")
    )


_MATH_SQL = """
SELECT o_orderkey,
       CAST(ROUND(o_totalprice, 1) AS DECIMAL(18,2)) AS rnd,
       CAST(FLOOR(o_totalprice) AS BIGINT) AS flr,
       CAST(CEIL(o_totalprice) AS BIGINT) AS cl,
       CAST(ABS(o_totalprice - 100000) AS DECIMAL(18,2)) AS ab,
       CAST(SIGN(o_totalprice - 100000) AS INT) AS sgn,
       CAST(SQRT(o_totalprice) AS DECIMAL(18,2)) AS sq,
       CAST(o_orderkey % 7 AS INT) AS md,
       CAST(GREATEST(o_totalprice, 50000.0) AS DECIMAL(18,2)) AS gr,
       CAST(LEAST(o_totalprice, 50000.0) AS DECIMAL(18,2)) AS ls
FROM orders ORDER BY o_orderkey
"""


def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = views(spark, sf_dir)
    d = F.col("o_orderdate")
    return (
        t["orders"]
        .select(
            "o_orderkey",
            F.year(d).alias("yr"),
            F.quarter(d).alias("qtr"),
            F.month(d).alias("mo"),
            F.dayofmonth(d).alias("dom"),
            F.dayofweek(d).alias("dow"),
            F.weekofyear(d).alias("woy"),
            F.last_day(d).alias("eom"),
            F.date_trunc("month", d).cast("date").alias("mstart"),
            F.date_add(d.cast("date"), 7).alias("plus7"),
            F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias("age_days"),
            F.add_months(d.cast("date"), 3).alias("plus3m"),
            F.date_format(d, "yyyy-MM").alias("ym"),
        )
        .orderBy("o_orderkey")
    )


_DATE_SQL = """
SELECT o_orderkey,
       CAST(YEAR(o_orderdate) AS INT) AS yr,
       CAST(QUARTER(o_orderdate) AS INT) AS qtr,
       CAST(MONTH(o_orderdate) AS INT) AS mo,
       CAST(DAY(o_orderdate) AS INT) AS dom,
       CAST(DAYOFWEEK(o_orderdate) + 1 AS INT) AS dow,
       CAST(WEEKOFYEAR(o_orderdate) AS INT) AS woy,
       CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS DATE) AS eom,
       CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS mstart,
       CAST(o_orderdate AS DATE) + 7 AS plus7,
       CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS INT) AS age_days,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
       STRFTIME(o_orderdate, '%Y-%m') AS ym
FROM orders ORDER BY o_orderkey
"""


def conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/if/nvl/coalesce/nullif/<=> (Hive GenericUDFWhen, GenericUDFNvl,
    GenericUDFOPEqualNS — null-safe = maps to IS NOT DISTINCT FROM)."""
    views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey,
               CASE WHEN c_acctbal < 0 THEN 'debt'
                    WHEN c_acctbal < 5000 THEN 'low'
                    ELSE 'high' END AS tier,
               IF(c_mktsegment = 'BUILDING', 1, 0) AS is_bld,
               NVL(NULLIF(c_mktsegment, 'BUILDING'), 'n/a') AS seg_or_na,
               COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'was_mach') AS seg2,
               CAST(c_nationkey <=> 3 AS INT) AS ns_eq3,
               CAST(c_acctbal BETWEEN 0 AND 1000 AS INT) AS in_band,
               CAST(c_mktsegment IN ('BUILDING', 'AUTOMOBILE') AS INT) AS in_set,
               CAST(ISNULL(NULLIF(c_mktsegment, 'FURNITURE')) AS INT) AS was_furn
        FROM customer ORDER BY c_custkey
        """
    )


_CONDITIONAL_SQL = """
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal < 5000 THEN 'low'
            ELSE 'high' END AS tier,
       CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS is_bld,
       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'n/a') AS seg_or_na,
       COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'was_mach') AS seg2,
       CAST(c_nationkey IS NOT DISTINCT FROM 3 AS INT) AS ns_eq3,
       CAST(c_acctbal BETWEEN 0 AND 1000 AS INT) AS in_band,
       CAST(c_mktsegment IN ('BUILDING', 'AUTOMOBILE') AS INT) AS in_set,
       CAST(NULLIF(c_mktsegment, 'FURNITURE') IS NULL AS INT) AS was_furn
FROM customer ORDER BY c_custkey
"""


def complex_type_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array construction + manipulation (SURVEY §2.11 complex-type family).
    collect_set order is nondeterministic at scale → sort_array before any
    output, then array_join to a canonical string."""
    t = views(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(F.collect_set("l_linestatus").alias("_statuses"))
        .select(
            "l_returnflag",
            F.array_join(F.sort_array("_statuses"), ",").alias("statuses"),
            F.size("_statuses").alias("n_statuses"),
            F.array_contains("_statuses", "O").cast("int").alias("has_open"),
            F.element_at(F.sort_array("_statuses"), 1).alias("first_status"),
        )
        .orderBy("l_returnflag")
    )


_COMPLEX_SQL = """
SELECT l_returnflag,
       ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT l_linestatus)), ',') AS statuses,
       CAST(LEN(LIST(DISTINCT l_linestatus)) AS INT) AS n_statuses,
       CAST(LIST_CONTAINS(LIST(DISTINCT l_linestatus), 'O') AS INT) AS has_open,
       LIST_SORT(LIST(DISTINCT l_linestatus))[1] AS first_status
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object over events.props (ref: ql/.../udf/generic/
    GenericUDFGetJsonObject? — UDFJson.java; json_tuple UDTF ref:
    GenericUDTFJSONTuple.java)."""
    views(spark, sf_dir)
    return spark.sql(
        """
        SELECT CAST(get_json_object(props, '$.k') AS INT) AS k, COUNT(*) AS n
        FROM events
        GROUP BY 1 ORDER BY k
        """
    )


_JSON_SQL = """
SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k, COUNT(*) AS n
FROM events GROUP BY 1 ORDER BY k
"""


REGISTRY: dict[str, QuerySpec] = {
    "func_string": QuerySpec(string_funcs, _STRING_SQL),
    "func_math": QuerySpec(math_funcs, _MATH_SQL),
    "func_date": QuerySpec(date_funcs, _DATE_SQL),
    "func_conditional": QuerySpec(conditional_funcs, _CONDITIONAL_SQL),
    "func_complex_agg": QuerySpec(complex_type_agg, _COMPLEX_SQL),
    "func_json": QuerySpec(json_funcs, _JSON_SQL),
}
