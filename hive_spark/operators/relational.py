"""Relational operator coverage — SURVEY §2.4 (joins), §2.5 (agg/grouping
sets), §2.6 (windows/PTF), §2.7 (sort/sample), §2.8 (set ops), §2.9
(UDTF/lateral view), §2.14 (QUALIFY, VALUES, DISTRIBUTE/SORT BY).

Each query pairs a Spark implementation (DataFrame API or SQL passthrough —
both compile to the same Catalyst plan) with a DuckDB oracle. Determinism
rules follow hive_spark/operators/__init__.py: decimal aggregates, full
ORDER BY tie-breaks on every LIMIT, integer/exact-fraction window outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from hive_spark.operators import QuerySpec, views

D2 = "decimal(18,2)"

# ---------------------------------------------------------------------------
# §2.4 Joins — Hive JoinType {INNER, LEFTOUTER, RIGHTOUTER, FULLOUTER,
# LEFTSEMI, ANTI} (ref: ql/.../parse/JoinType.java:26) + cross product
# (ref: ql/.../optimizer/physical/CrossProductHandler.java)
# ---------------------------------------------------------------------------


def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving unmatched customers (null-side counts)."""
    t = views(spark, sf_dir)
    open_orders = t["orders"].filter(F.col("o_orderstatus") == "P")
    return (
        t["customer"]
        .join(open_orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_open_orders"))
        .orderBy("c_custkey")
    )


_JOIN_LEFT_SQL = """
SELECT c_custkey, COUNT(o_orderkey) AS n_open_orders
FROM customer
LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'P') o
  ON c_custkey = o_custkey
GROUP BY c_custkey
ORDER BY c_custkey
"""


def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of per-nation customer vs supplier counts."""
    t = views(spark, sf_dir)
    c = t["customer"].groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n_cust"))
    s = t["supplier"].groupBy("s_nationkey").agg(F.count(F.lit(1)).alias("n_supp"))
    return (
        c.join(s, c.c_nationkey == s.s_nationkey, "full")
        .select(
            F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy("nationkey")
    )


_JOIN_FULL_SQL = """
SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
       COALESCE(n_cust, 0) AS n_cust,
       COALESCE(n_supp, 0) AS n_supp
FROM (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey) c
FULL JOIN (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey) s
  ON c_nationkey = s_nationkey
ORDER BY nationkey
"""


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (Hive ANTI_JOIN=6, ref: ql/.../plan/JoinDesc.java:51):
    customers with no finished ('F') orders."""
    t = views(spark, sf_dir)
    f_orders = t["orders"].filter(F.col("o_orderstatus") == "F")
    return (
        t["customer"]
        .join(f_orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


_JOIN_ANTI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
ORDER BY c_custkey
"""


def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross product (Hive XPROD_EDGE, ref: ql/.../plan/TezEdgeProperty.java:32)."""
    t = views(spark, sf_dir)
    a = t["region"].select(F.col("r_name").alias("region_a"))
    b = t["region"].select(F.col("r_name").alias("region_b"))
    return a.crossJoin(b).orderBy("region_a", "region_b")


_JOIN_CROSS_SQL = """
SELECT a.r_name AS region_a, b.r_name AS region_b
FROM region a CROSS JOIN region b
ORDER BY region_a, region_b
"""


def join_nonequi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join (equi key + range residual — Hive attaches residuals as
    join filters on CommonJoinOperator): lineitems shipped >2 years after
    their order date."""
    t = views(spark, sf_dir)
    o = t["orders"].select("o_orderkey", "o_orderdate")
    l = t["lineitem"].select("l_orderkey", "l_linenumber", "l_shipdate")
    return (
        l.join(
            o,
            (l.l_orderkey == o.o_orderkey)
            & (l.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 730 DAYS")),
        )
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    )


_JOIN_NONEQUI_SQL = """
SELECT l_orderkey, l_linenumber
FROM lineitem JOIN orders
  ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 730 DAYS
ORDER BY l_orderkey, l_linenumber
"""

# ---------------------------------------------------------------------------
# §2.8 Set operations (Hive rewrites INTERSECT/EXCEPT via group-by+UDTF,
# ref: ql/.../optimizer/calcite/rules/HiveIntersectRewriteRule.java —
# Spark has native physical operators)
# ---------------------------------------------------------------------------


def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = views(spark, sf_dir)
    c = t["customer"].select(F.col("c_nationkey").alias("nk"))
    s = t["supplier"].select(F.col("s_nationkey").alias("nk"))
    return c.union(s).distinct().orderBy("nk")


_SETOP_UNION_SQL = """
SELECT c_nationkey AS nk FROM customer UNION SELECT s_nationkey FROM supplier ORDER BY nk
"""


def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = views(spark, sf_dir)
    c = t["customer"].select(F.col("c_nationkey").alias("nk"))
    s = t["supplier"].select(F.col("s_nationkey").alias("nk"))
    return c.intersect(s).orderBy("nk")


_SETOP_INTERSECT_SQL = """
SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey FROM supplier ORDER BY nk
"""


def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    # customers with open ('O') orders minus those with pending ('P') ones —
    # a non-empty difference at every SF (all-nations variants are vacuous)
    t = views(spark, sf_dir)
    o = t["orders"]
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return a.subtract(b).orderBy("o_custkey")  # subtract == EXCEPT DISTINCT


_SETOP_EXCEPT_SQL = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
ORDER BY o_custkey
"""


def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiset semantics — Hive replicate_rows rewrite)."""
    t = views(spark, sf_dir)
    a = t["orders"].filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    b = t["orders"].filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    return (
        a.intersectAll(b)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderpriority")
    )


_SETOP_INTERSECT_ALL_SQL = """
SELECT o_orderpriority, COUNT(*) AS n FROM (
  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
  INTERSECT ALL
  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
) GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

# ---------------------------------------------------------------------------
# §2.5 Aggregation — GROUPING SETS / ROLLUP / CUBE (ref:
# ql/.../parse/SemanticAnalyzer.java:1956-1971), DISTINCT aggregates
# (ref: ql/.../optimizer/CountDistinctRewriteProc.java)
# ---------------------------------------------------------------------------


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = views(spark, sf_dir)
    geo = (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        geo.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.grouping("r_name").cast("int").alias("g_r"),
            F.grouping("n_name").cast("int").alias("g_n"),
        )
        .orderBy("g_r", "g_n", "r_name", "n_name")
    )


_AGG_ROLLUP_SQL = """
SELECT r_name, n_name, COUNT(*) AS n_cust,
       CAST(GROUPING(r_name) AS INT) AS g_r, CAST(GROUPING(n_name) AS INT) AS g_n
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY g_r, g_n, r_name, n_name
"""


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = views(spark, sf_dir)
    return (
        t["lineitem"]
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast(D2)).cast(D2).alias("sum_qty"),
            F.grouping("l_returnflag").cast("int").alias("g_f"),
            F.grouping("l_linestatus").cast("int").alias("g_s"),
        )
        .orderBy("g_f", "g_s", "l_returnflag", "l_linestatus")
    )


_AGG_CUBE_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty,
       CAST(GROUPING(l_returnflag) AS INT) AS g_f,
       CAST(GROUPING(l_linestatus) AS INT) AS g_s
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY g_f, g_s, l_returnflag, l_linestatus
"""


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via SQL passthrough (HiveQL-compatible text)."""
    views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_st,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_pr
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        ORDER BY g_st, g_pr, o_orderstatus, o_orderpriority
        """
    )


_AGG_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_st,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_pr
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
ORDER BY g_st, g_pr, o_orderstatus, o_orderpriority
"""


def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-DISTINCT aggregation (Hive expands via
    HiveExpandDistinctAggregatesRule; Catalyst RewriteDistinctAggregates)."""
    t = views(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_partkey").alias("n_part"),
            F.sum_distinct(F.col("l_quantity").cast(D2)).cast(D2).alias("sum_dist_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


_AGG_DISTINCT_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_suppkey) AS n_supp,
       COUNT(DISTINCT l_partkey) AS n_part,
       CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_dist_qty,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical moments from exact decimal sums (map-side-combinable —
    the same partial/final shape Hive's GenericUDAFVariance uses, ref:
    ql/.../udf/generic/GenericUDAFVariance.java). var/std derived in
    double from exact sums → bit-reproducible at any parallelism."""
    t = views(spark, sf_dir)
    agg = (
        t["customer"]
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("c_acctbal").cast(D2)).alias("_sx"),
            F.sum((F.col("c_acctbal").cast(D2) * F.col("c_acctbal").cast(D2))).alias("_sxx"),
            F.min(F.col("c_acctbal").cast(D2)).alias("min_bal"),
            F.max(F.col("c_acctbal").cast(D2)).alias("max_bal"),
        )
    )
    n = F.col("n").cast("double")
    sx = F.col("_sx").cast("double")
    sxx = F.col("_sxx").cast("double")
    return agg.select(
        "c_nationkey",
        "n",
        F.col("_sx").cast(D2).alias("sum_bal"),
        "min_bal",
        "max_bal",
        ((sxx - sx * sx / n) / n).alias("var_pop"),
    ).orderBy("c_nationkey")


_AGG_STATS_SQL = """
SELECT c_nationkey, COUNT(*) AS n,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_bal,
       CAST(MIN(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS min_bal,
       CAST(MAX(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS max_bal,
       (CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)) * CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        - CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
          * CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
       / COUNT(*) AS var_pop
FROM customer GROUP BY c_nationkey ORDER BY c_nationkey
"""

# ---------------------------------------------------------------------------
# §2.6 Window functions (Hive PTF framework, ref: ql/.../exec/
# PTFOperator.java:47, WindowingTableFunction.java:61 — Spark Window 1:1)
# ---------------------------------------------------------------------------


def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = views(spark, sf_dir)
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        t["customer"]
        .select(
            "c_custkey",
            "c_nationkey",
            F.row_number().over(w).cast("bigint").alias("rn"),
            F.rank().over(w).cast("bigint").alias("rnk"),
            F.dense_rank().over(w).cast("bigint").alias("drnk"),
            F.ntile(4).over(w).cast("bigint").alias("quartile"),
            F.percent_rank().over(w).alias("prank"),
            F.cume_dist().over(w).alias("cdist"),
        )
        .orderBy("c_nationkey", "rn")
    )


_WINDOW_RANK_SQL = """
SELECT c_custkey, c_nationkey,
       ROW_NUMBER()   OVER w AS rn,
       RANK()         OVER w AS rnk,
       DENSE_RANK()   OVER w AS drnk,
       NTILE(4)       OVER w AS quartile,
       PERCENT_RANK() OVER w AS prank,
       CUME_DIST()    OVER w AS cdist
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
ORDER BY c_nationkey, rn
"""


def window_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = views(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    tp = F.col("o_totalprice").cast(D2)
    return (
        t["orders"]
        .select(
            "o_custkey",
            "o_orderkey",
            F.lag(tp, 1).over(w).alias("prev_price"),
            F.lead(tp, 1).over(w).alias("next_price"),
            F.first(tp).over(wf).alias("first_price"),
            F.last(tp).over(wf).alias("last_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


_WINDOW_LEAD_LAG_SQL = """
SELECT o_custkey, o_orderkey,
       LAG(CAST(o_totalprice AS DECIMAL(18,2)), 1)  OVER w AS prev_price,
       LEAD(CAST(o_totalprice AS DECIMAL(18,2)), 1) OVER w AS next_price,
       FIRST_VALUE(CAST(o_totalprice AS DECIMAL(18,2)))
         OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_price,
       LAST_VALUE(CAST(o_totalprice AS DECIMAL(18,2)))
         OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
"""


def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS + RANGE frames (Hive WindowingSpec ROWS/RANGE boundaries, ref:
    ql/.../parse/WindowingSpec.java:193-235; RANGE scan ref:
    ql/.../udf/ptf/ValueBoundaryScanner.java:51).

    RANGE frame keyed on epoch seconds: trailing 7-day sum per supplier.
    """
    t = views(spark, sf_dir)
    line = t["lineitem"].withColumn(
        "ship_epoch", F.unix_seconds(F.col("l_shipdate").cast("timestamp"))
    )
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic testdata
    # (dup rows at sf0.1) — l_quantity completes a total order so the
    # ROWS-frame running sum is deterministic across engines/partitions
    w_rows = W.partitionBy("l_suppkey").orderBy(
        "ship_epoch", "l_orderkey", "l_linenumber", "l_quantity"
    ).rowsBetween(W.unboundedPreceding, W.currentRow)
    w_range = W.partitionBy("l_suppkey").orderBy("ship_epoch").rangeBetween(-7 * 86400, 0)
    q = F.col("l_quantity").cast(D2)
    return (
        line.select(
            "l_orderkey",
            "l_linenumber",
            "l_suppkey",
            F.sum(q).over(w_rows).cast(D2).alias("running_qty"),
            F.sum(q).over(w_range).cast(D2).alias("qty_7d"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


_WINDOW_FRAMES_SQL = """
SELECT l_orderkey, l_linenumber, l_suppkey,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
           PARTITION BY l_suppkey
           ORDER BY epoch_us(l_shipdate) // 1000000, l_orderkey, l_linenumber, l_quantity
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(18,2)) AS running_qty,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
           PARTITION BY l_suppkey
           ORDER BY epoch_us(l_shipdate) // 1000000
           RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS DECIMAL(18,2)) AS qty_7d
FROM lineitem
ORDER BY l_orderkey, l_linenumber
"""


def window_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) OVER — Hive-only surface (ref: ql/src/test/queries/
    clientpositive/windowing_distinct.q:22-30); Spark rejects DISTINCT in
    windows → rewrite as size(collect_set() OVER) per SURVEY §2.6."""
    t = views(spark, sf_dir)
    w = W.partitionBy("c_nationkey")
    return (
        t["customer"]
        .select(
            "c_custkey",
            F.size(F.collect_set("c_mktsegment").over(w)).alias("n_segments"),
        )
        .orderBy("c_custkey")
    )


_WINDOW_DISTINCT_SQL = """
SELECT c_custkey,
       CAST(COUNT(DISTINCT c_mktsegment) OVER (PARTITION BY c_nationkey) AS INT) AS n_segments
FROM customer ORDER BY c_custkey
"""


def qualify_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive QUALIFY (ref: parser HiveParser.g:89,2593,2712) desugared to
    window + filter — the oracle uses DuckDB's native QUALIFY, proving the
    desugar is semantics-preserving. Physical plan: TopNKey-equivalent
    rank filter pushed below the final sort."""
    t = views(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        t["orders"]
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.col("o_totalprice").cast(D2).alias("price"), "rn")
        .orderBy("o_custkey", "rn")
    )


_QUALIFY_SQL = """
SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price,
       ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
FROM orders
QUALIFY rn <= 3
ORDER BY o_custkey, rn
"""

# ---------------------------------------------------------------------------
# Subqueries (Hive HiveSubQueryRemoveRule / HiveRelDecorrelator, ref:
# ql/.../optimizer/calcite/rules/HiveSubQueryRemoveRule.java:80 —
# Catalyst RewritePredicateSubquery / DecorrelateInnerQuery)
# ---------------------------------------------------------------------------


def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) * 1.5 FROM customer)
        ORDER BY c_custkey
        """
    )


_SUBQUERY_SCALAR_SQL = """
SELECT c_custkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) * 1.5 FROM customer)
ORDER BY c_custkey
"""


def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — decorrelated by Catalyst into a join."""
    views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey
        FROM customer c1
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer c2
                           WHERE c2.c_nationkey = c1.c_nationkey)
        ORDER BY c_custkey
        """
    )


_SUBQUERY_CORRELATED_SQL = """
SELECT c_custkey
FROM customer c1
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer c2
                   WHERE c2.c_nationkey = c1.c_nationkey)
ORDER BY c_custkey
"""

# ---------------------------------------------------------------------------
# §2.9 Lateral view / UDTF (ref: ql/.../exec/UDTFOperator.java:43,
# LateralViewJoinOperator.java:76) — Spark supports LATERAL VIEW verbatim
# ---------------------------------------------------------------------------


def lateral_view_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word frequency via LATERAL VIEW explode — HiveQL text runs unchanged."""
    views(spark, sf_dir)
    return spark.sql(
        """
        SELECT word, COUNT(*) AS cnt
        FROM documents LATERAL VIEW explode(split(text, ' ')) t AS word
        WHERE word != ''
        GROUP BY word
        ORDER BY cnt DESC, word
        LIMIT 25
        """
    )


_LATERAL_EXPLODE_SQL = """
SELECT word, COUNT(*) AS cnt
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
WHERE word != ''
GROUP BY word
ORDER BY cnt DESC, word
LIMIT 25
"""


def lateral_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    return spark.sql(
        """
        SELECT doc_id, CAST(pos AS BIGINT) AS pos, token
        FROM documents LATERAL VIEW posexplode(split(text, ' ')) t AS pos, token
        WHERE doc_id < 5
        ORDER BY doc_id, pos
        """
    )


_LATERAL_POSEXPLODE_SQL = """
SELECT doc_id, i - 1 AS pos, arr[i] AS token
FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM documents WHERE doc_id < 5) t
JOIN (SELECT unnest(generate_series(1, 10000)) AS i) s ON i <= len(arr)
ORDER BY doc_id, pos
"""

# ---------------------------------------------------------------------------
# §2.3 TABLESAMPLE bucket sampling (ref: SemanticAnalyzer.genSamplePredicate
# ql/.../parse/SemanticAnalyzer.java:11955) — hash-bucket filter
# ---------------------------------------------------------------------------


def tablesample_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLESAMPLE(BUCKET 1 OUT OF 4 ON l_orderkey) → deterministic
    modulus filter (portable stand-in for Hive's bucket hash)."""
    t = views(spark, sf_dir)
    return (
        t["lineitem"]
        .filter(F.pmod(F.col("l_orderkey"), F.lit(4)) == 0)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast(D2)).cast(D2).alias("sum_qty"),
        )
    )


_TABLESAMPLE_SQL = """
SELECT COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty
FROM lineitem WHERE l_orderkey % 4 = 0
"""

# ---------------------------------------------------------------------------
# Pivot (Hive expresses as CASE-WHEN aggregation; Spark has native pivot)
# ---------------------------------------------------------------------------


def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = views(spark, sf_dir)
    p = (
        t["orders"]
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
    )
    return p.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).alias("cnt_open"),
        F.coalesce(F.col("F"), F.lit(0)).alias("cnt_finished"),
        F.coalesce(F.col("P"), F.lit(0)).alias("cnt_partial"),
    ).orderBy("o_orderpriority")


_PIVOT_SQL = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_open,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_finished,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_partial
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

# ---------------------------------------------------------------------------
# §2.14 VALUES inline tables + DISTRIBUTE BY / SORT BY surface
# ---------------------------------------------------------------------------


def values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    return spark.sql(
        """
        SELECT t.k, t.v, n_name
        FROM VALUES (0, 'zero'), (1, 'one'), (2, 'two') AS t(k, v)
        JOIN nation ON n_nationkey = t.k
        ORDER BY k
        """
    )


_VALUES_SQL = """
SELECT t.k, t.v, n_name
FROM (VALUES (0, 'zero'), (1, 'one'), (2, 'two')) t(k, v)
JOIN nation ON n_nationkey = t.k
ORDER BY k
"""


def distribute_sort_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTE BY + SORT BY (ref: ql/.../exec/ReduceSinkOperator.java:60
    key/partition columns): per-partition sort — globally the same row set,
    verified by a set-level oracle."""
    views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_nationkey, c_custkey
        FROM customer
        DISTRIBUTE BY c_nationkey SORT BY c_nationkey, c_custkey
        """
    )


_DISTRIBUTE_SQL = """
SELECT c_nationkey, c_custkey FROM customer
"""


REGISTRY: dict[str, QuerySpec] = {
    "join_left_outer": QuerySpec(join_left_outer, _JOIN_LEFT_SQL),
    "join_full_outer": QuerySpec(join_full_outer, _JOIN_FULL_SQL),
    "join_anti": QuerySpec(join_anti, _JOIN_ANTI_SQL),
    "join_cross": QuerySpec(join_cross, _JOIN_CROSS_SQL),
    "join_nonequi": QuerySpec(join_nonequi, _JOIN_NONEQUI_SQL),
    "setop_union_distinct": QuerySpec(setop_union_distinct, _SETOP_UNION_SQL),
    "setop_intersect": QuerySpec(setop_intersect, _SETOP_INTERSECT_SQL),
    "setop_except": QuerySpec(setop_except, _SETOP_EXCEPT_SQL),
    "setop_intersect_all": QuerySpec(setop_intersect_all, _SETOP_INTERSECT_ALL_SQL),
    "agg_rollup": QuerySpec(agg_rollup, _AGG_ROLLUP_SQL),
    "agg_cube": QuerySpec(agg_cube, _AGG_CUBE_SQL),
    "agg_grouping_sets": QuerySpec(agg_grouping_sets, _AGG_GROUPING_SETS_SQL),
    "agg_distinct": QuerySpec(agg_distinct, _AGG_DISTINCT_SQL),
    "agg_stats": QuerySpec(agg_stats, _AGG_STATS_SQL),
    "window_rank": QuerySpec(window_rank, _WINDOW_RANK_SQL),
    "window_lead_lag": QuerySpec(window_lead_lag, _WINDOW_LEAD_LAG_SQL),
    "window_frames": QuerySpec(window_frames, _WINDOW_FRAMES_SQL),
    "window_distinct": QuerySpec(window_distinct, _WINDOW_DISTINCT_SQL),
    "qualify_topn": QuerySpec(qualify_topn, _QUALIFY_SQL),
    "subquery_scalar": QuerySpec(subquery_scalar, _SUBQUERY_SCALAR_SQL),
    "subquery_correlated": QuerySpec(subquery_correlated, _SUBQUERY_CORRELATED_SQL),
    "lateral_view_explode": QuerySpec(lateral_view_explode, _LATERAL_EXPLODE_SQL),
    "lateral_posexplode": QuerySpec(lateral_posexplode, _LATERAL_POSEXPLODE_SQL),
    "tablesample_bucket": QuerySpec(tablesample_bucket, _TABLESAMPLE_SQL),
    "pivot_status": QuerySpec(pivot_status, _PIVOT_SQL),
    "values_inline": QuerySpec(values_inline, _VALUES_SQL),
    "distribute_sort_by": QuerySpec(distribute_sort_by, _DISTRIBUTE_SQL),
}
