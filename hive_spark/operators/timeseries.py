"""As-of and range joins — time-series operators neither Hive nor Spark
has natively (SURVEY §2.4: "No range/as-of/interval join exists"; the
north star names both as custom-operator targets).

Scale-safe compositions, NOT inequality joins:

- AS-OF: union both sides tagged, one window sort per user carries the
  most recent left-side row forward (`last_value IGNORE NULLS`), filter to
  right-side rows. One shuffle on the partition key, no join at all —
  survives any skew an inequality join would die on.
- RANGE: time-bucketize both sides to the range width, equi-join on
  (key, bucket±1), then filter the exact predicate. The equi-join prunes
  candidates to adjacent buckets, so the residual filter touches O(matches)
  rows instead of O(n·m). (Spark cannot push |Δt|<w through a join; this
  is Hive's bucket-map-join idea applied to the time axis.)

Oracles: DuckDB has a native ASOF JOIN — our composition must reproduce
it exactly; the range join is checked against a plain inequality join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_spark.operators import QuerySpec, views


def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase event: the most recent prior-or-equal click by
    the same user (classic trade/quote as-of shape)."""
    views(spark, sf_dir)
    ev = spark.table("events").select(
        "user_id", "event_id", "event_type", "ts", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")

    tagged = purchases.select(
        "user_id",
        "ts",
        F.col("event_id").alias("p_event"),
        F.lit(None).cast("bigint").alias("c_event"),
        F.lit(None).cast("timestamp_ntz").alias("c_ts"),
        F.lit(1).alias("_side"),
    ).unionAll(
        clicks.select(
            "user_id",
            "ts",
            F.lit(None).cast("bigint").alias("p_event"),
            F.col("event_id").alias("c_event"),
            F.col("ts").alias("c_ts"),
            F.lit(0).alias("_side"),
        )
    )
    # clicks sort before purchases at identical ts (_side 0 < 1), so an
    # exactly-simultaneous click is visible to the purchase (<= semantics,
    # matching DuckDB ASOF's ts >= c_ts)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "_side", "c_event")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn("last_click", F.last("c_event", ignorenulls=True).over(w))
        .withColumn("last_click_ts", F.last("c_ts", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .select(
            "user_id",
            F.col("p_event").alias("purchase_event"),
            F.col("last_click").alias("click_event"),
            F.unix_millis(F.col("last_click_ts").cast("timestamp")).alias("click_ms"),
        )
        .orderBy("user_id", "purchase_event")
    )


_ASOF_SQL = """
SELECT p.user_id,
       p.event_id AS purchase_event,
       c.event_id AS click_event,
       epoch_ms(c.ts) AS click_ms
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.user_id, purchase_event
"""


_RANGE_W = 600  # seconds: pair events within ±10 minutes


def range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs of (signup, error) events of the same user within ±10 min —
    bucketized so the only join is an equi-join on (user, bucket)."""
    views(spark, sf_dir)
    ev = spark.table("events")
    a = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("event_id").alias("a_event"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("a_us"),
    )
    b = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("b_user"),
        F.col("event_id").alias("b_event"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("b_us"),
    )
    w_us = _RANGE_W * 1_000_000
    # each left row probes its own bucket and both neighbors: any |Δ|<w
    # pair shares or neighbors a bucket of width w
    a_buck = a.withColumn(
        "bucket",
        F.explode(
            F.array(
                (F.col("a_us") / w_us).cast("bigint") - 1,
                (F.col("a_us") / w_us).cast("bigint"),
                (F.col("a_us") / w_us).cast("bigint") + 1,
            )
        ),
    )
    b_buck = b.withColumn("b_bucket", (F.col("b_us") / w_us).cast("bigint"))
    return (
        a_buck.join(
            b_buck,
            (F.col("user_id") == F.col("b_user"))
            & (F.col("bucket") == F.col("b_bucket")),
        )
        .filter(F.abs(F.col("a_us") - F.col("b_us")) <= w_us)
        .select(
            "user_id",
            "a_event",
            "b_event",
            (F.col("b_us") - F.col("a_us")).alias("delta_us"),
        )
        .distinct()
        .orderBy("user_id", "a_event", "b_event")
    )


_RANGE_SQL = f"""
SELECT a.user_id, a.event_id AS a_event, b.event_id AS b_event,
       epoch_us(b.ts) - epoch_us(a.ts) AS delta_us
FROM (SELECT * FROM events WHERE event_type = 'signup') a
JOIN (SELECT * FROM events WHERE event_type = 'error') b
  ON a.user_id = b.user_id
 AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= {_RANGE_W} * 1000000
ORDER BY a.user_id, a_event, b_event
"""


REGISTRY: dict[str, QuerySpec] = {
    "asof_join": QuerySpec(asof_join, _ASOF_SQL),
    "range_join": QuerySpec(range_join, _RANGE_SQL),
}
