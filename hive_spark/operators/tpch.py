"""TPC-H-style analytical queries (adapted to the testdata schema).

Hive ships TPC-H Q18 as a functional test (ref: ql/src/test/queries/
clientpositive/tpch18.q) and the full TPC-DS corpus as plan tests (ref:
ql/src/test/queries/clientpositive/perf/). These queries exercise the same
operator classes: scan→filter→project→hash-agg→sort (Q1), multi-way joins
with selective dims (Q3/Q5/Q10), semi-join via EXISTS (Q4), and
HAVING-gated subquery joins (Q18).

Scale design: filters precede joins (Catalyst pushes them into the parquet
scan), dimension tables broadcast (region/nation/customer are tiny vs a
100 TB lineitem), aggregates are partial/map-side-combined by Spark's
HashAggregate, and every money column is summed as DECIMAL so results are
bit-identical regardless of partition count or AQE re-planning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_spark.operators import QuerySpec, views

D2 = "decimal(18,2)"
D4 = "decimal(9,4)"
D6 = "decimal(18,6)"
# exact scales of decimal products — final casts never reduce scale, so no
# rounding ties can arise between Spark (HALF_UP) and DuckDB (HALF_EVEN)
DS6 = "decimal(38,6)"
DS10 = "decimal(38,10)"


def _input_bytes(df: DataFrame) -> int:
    """Total on-disk bytes behind a scan — the scale guard for broadcast
    hints whose build side grows with data volume (file metadata only,
    no job)."""
    import os

    total = 0
    for f in df.inputFiles():
        try:
            total += os.path.getsize(f.removeprefix("file:"))
        except OSError:
            return 1 << 62  # unknown source: treat as too big to hint
    return total


def _dec2(c):
    return F.col(c).cast(D2)


def _sum_hi_lo(int_expr: str, per_row_bound: float) -> F.Column:
    """Overflow-safe exact SUM of a fixed-point BIGINT expression as
    DECIMAL(38,0), via two long sums (hi = v div 1e9, lo = v mod 1e9)
    recombined after aggregation.

    Why: Spark's decimal Sum accumulates through BigDecimal for results
    over 18 digits — ~3x the per-row cost of a codegen'd long sum
    (measured: q1's four decimal aggregates 2.45s -> 0.89s at 9.6M rows).
    Long sums alone would overflow: per-row charge values reach ~2e15, so
    6e5 rows already exceed int64. The split keeps both partial sums safe
    to ~9e9 rows (lo <= 1e9/row, hi <= per_row_bound/1e9 per row) — ample
    for a 100 TB partition-level partial; the merged value is exact.
    """
    assert per_row_bound < 2**53  # v div/mod arithmetic stays exact
    hi = F.sum(F.expr(f"({int_expr}) DIV 1000000000"))
    lo = F.sum(F.expr(f"({int_expr}) % 1000000000"))
    return hi.cast("decimal(38,0)") * 1000000000 + lo


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: scan + filter + hash-agg + sort (SURVEY §2.1/2.3/2.5/2.7).

    All four aggregates run on fixed-point BIGINT (quantity/price in
    cents, discount/tax at scale 4), summed via `_sum_hi_lo`, and only
    the final 12 group rows convert back to DECIMAL — bit-identical to
    the all-decimal formulation (pinned by the oracle hash) at ~2.7x the
    aggregate throughput."""
    t = views(spark, sf_dir)
    rows = (
        t["lineitem"]
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .select(
            "l_returnflag",
            "l_linestatus",
            F.expr("CAST(round(l_quantity * 100) AS BIGINT)").alias("qc"),
            F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("pc"),
            F.expr(
                "CAST(round(l_extendedprice * 100) AS BIGINT)"
                " * (10000 - CAST(round(l_discount * 10000) AS BIGINT))"
            ).alias("dpi"),  # scale 6, <= ~1e11/row
            F.expr(
                "CAST(round(l_extendedprice * 100) AS BIGINT)"
                " * (10000 - CAST(round(l_discount * 10000) AS BIGINT))"
                " * (10000 + CAST(round(l_tax * 10000) AS BIGINT))"
            ).alias("ci"),  # scale 10, <= ~2e15/row
        )
    )
    agg = rows.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("qc").cast("decimal(38,0)").alias("_sq"),  # <= 1e7/row: plain long sum
        F.sum("pc").cast("decimal(38,0)").alias("_sbp"),
        _sum_hi_lo("dpi", 1e11).alias("_sdp"),
        _sum_hi_lo("ci", 2e15).alias("_sc"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        (F.col("_sq") / 100).cast(D2).alias("sum_qty"),
        (F.col("_sbp") / 100).cast(D2).alias("sum_base_price"),
        (F.col("_sdp") / 1000000).cast(DS6).alias("sum_disc_price"),
        (F.col("_sc") / F.lit(10_000_000_000)).cast(DS10).alias("sum_charge"),
        ((F.col("_sq") / 100).cast("double") / F.col("count_order"))
        .cast(D6)
        .alias("avg_qty"),
        ((F.col("_sbp") / 100).cast("double") / F.col("count_order"))
        .cast(D6)
        .alias("avg_price"),
        "count_order",
    ).orderBy("l_returnflag", "l_linestatus")


_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(9,4))) AS DECIMAL(38,6)) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(9,4)) * CAST(1 + l_tax AS DECIMAL(9,4))) AS DECIMAL(38,10)) AS sum_charge,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS DECIMAL(18,6)) AS avg_qty,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS DECIMAL(18,6)) AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: selective dim filter + 3-way join + agg + top-k.

    customer is broadcast (tiny vs lineitem at scale); the o_orderdate /
    l_shipdate filters push into the parquet scans before the join.
    """
    t = views(spark, sf_dir)
    cut = F.lit("1997-06-30").cast("timestamp")
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    orders = t["orders"].filter(F.col("o_orderdate") < cut)
    # r9 opt (guide §3.1): join the two FILTERED dims first, so what
    # reaches the fact join is the date-filtered AND segment-filtered
    # order keys projected to 2 columns — ~5x smaller than the filtered
    # orders relation the planner was broadcasting (interleaved
    # best-of-5 at sf1: 1.25 -> 1.01s). The broadcast hint is guarded
    # by the orders input size: the relation grows with SF (~10% of
    # orders), so past ~2 GB of orders parquet the hint is dropped and
    # the planner falls back to its estimate-driven strategy (locally
    # that guard never triggers; at cluster scale it must).
    ord_cust = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("o_orderkey", "o_orderdate")
    )
    if _input_bytes(t["orders"]) < (2 << 30):
        ord_cust = F.broadcast(ord_cust)
    line = t["lineitem"].filter(F.col("l_shipdate") > cut)
    revenue = _dec2("l_extendedprice") * (1 - F.col("l_discount")).cast(D4)
    return (
        line.join(ord_cust, line.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(revenue).cast(DS6).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


_Q3_SQL = """
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(9,4))) AS DECIMAL(38,6)) AS revenue,
       CAST(o_orderdate AS DATE) AS o_orderdate
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-06-30 00:00:00'
  AND l_shipdate > TIMESTAMP '1997-06-30 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: correlated EXISTS → left-semi join (Hive JoinType LEFTSEMI,
    ref: ql/.../parse/JoinType.java:26)."""
    t = views(spark, sf_dir)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    late = t["lineitem"].select("l_orderkey", "l_shipdate")
    semi = orders.join(
        late,
        (orders.o_orderkey == late.l_orderkey) & (late.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        semi.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way star join; region/nation/supplier broadcast."""
    t = views(spark, sf_dir)
    revenue = _dec2("l_extendedprice") * (1 - F.col("l_discount")).cast(D4)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return (
        t["lineitem"]
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(F.sum(revenue).cast(DS6).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


_Q5_SQL = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(9,4))) AS DECIMAL(38,6)) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan+filter+agg — every predicate reaches the parquet
    reader as a pushed filter (verified in tests/test_plans.py)."""
    t = views(spark, sf_dir)
    rev = _dec2("l_extendedprice") * F.col("l_discount").cast(D4)
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(rev).cast(DS6).alias("revenue"), F.count(F.lit(1)).alias("n_rows"))
    )


_Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(9,4))) AS DECIMAL(38,6)) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.03 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: fact-dim join + agg + deterministic top-20."""
    t = views(spark, sf_dir)
    revenue = _dec2("l_extendedprice") * (1 - F.col("l_discount")).cast(D4)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    return (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(revenue).cast(DS6).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


_Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(9,4))) AS DECIMAL(38,6)) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (Hive's own functional test, ref: ql/src/test/queries/
    clientpositive/tpch18.q): HAVING-gated IN-subquery + 3-way join.

    The IN subquery's aggregate doubles as the output sum, so the semi
    join collapses to an inner join against the aggregated rows — at
    100 TB the aggregate is partial/final with AQE sizing the shuffle.
    """
    t = views(spark, sf_dir)
    # Single lineitem pass: the HAVING aggregate IS the output sum, so keep
    # it in `big` instead of semi-joining on the key and re-scanning +
    # re-shuffling the fact table for the same per-order sum (the r2 scale
    # sweep measured that second shuffle at 4.99x time for 4x data).
    # quantity cents <= 5000/row: a plain long sum is exact to ~1.8e15
    # rows and skips the BigDecimal accumulation path (see q1)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(F.expr("CAST(round(l_quantity * 100) AS BIGINT)")).alias("_qc"))
        .filter(F.col("_qc") > 300 * 100)
        .select(
            F.col("l_orderkey").alias("bk"),
            (F.col("_qc") / 100).cast(D2).alias("sum_qty"),
        )
    )
    # r9 opt (guide §3.1 "broadcast the side that fits"): `big` after the
    # HAVING filter is ~0.006% of orders (TPC-H q18 selectivity), but the
    # planner can't see through the aggregate and was broadcasting ORDERS
    # instead — a 1.5M-row hash relation built on the driver at the sf1
    # tier. Pin the build side to the filtered aggregate: orders is then
    # probed in place (never shuffled, never collected). Interleaved
    # best-of-5 at sf1: 1.60 -> 1.14s, 5/5 reps faster, rows identical.
    # At 100 TB the broadcast side stays ~0.006% of orders (~hundreds of
    # MB at SF100k) — inside the guide's broadcast envelope, and far
    # smaller than shipping orders itself.
    #
    # r10 (VERDICT r9 #4 / ADVICE): the hint is SIZE-GUARDED like q3's.
    # The build side is selectivity-bound, not fixed: ~6e-5 of orders
    # rows survive HAVING > 300 under the TPC-H quantity distribution,
    # so 64 TiB of lineitem (~SF 60k) still builds only ~5M rows
    # (~150 MB hashed) — comfortably inside the guide's envelope and
    # far under the 8 GB broadcast cap. Past the guard (or when input
    # sizes are unknowable) the planner chooses with its own stats
    # rather than an unconditional driver-side collect.
    big_join = F.broadcast(big) if _input_bytes(t["lineitem"]) < (64 << 40) else big
    return (
        t["orders"]
        .join(big_join, F.col("o_orderkey") == F.col("bk"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            F.col("o_totalprice").cast(D2).alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


_Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS o_orderdate,
       CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


REGISTRY: dict[str, QuerySpec] = {
    "tpch_q1": QuerySpec(q1_pricing_summary, _Q1_SQL, "scan+filter+agg+sort"),
    "tpch_q3": QuerySpec(q3_shipping_priority, _Q3_SQL, "3-way join + top-k"),
    "tpch_q4": QuerySpec(q4_order_priority, _Q4_SQL, "correlated EXISTS semi-join"),
    "tpch_q5": QuerySpec(q5_local_supplier, _Q5_SQL, "6-way star join"),
    "tpch_q6": QuerySpec(q6_forecast_revenue, _Q6_SQL, "pushdown filter agg"),
    "tpch_q10": QuerySpec(q10_returned_items, _Q10_SQL, "join+agg+top20"),
    "tpch_q18": QuerySpec(q18_large_volume, _Q18_SQL, "IN-subquery + HAVING"),
}
