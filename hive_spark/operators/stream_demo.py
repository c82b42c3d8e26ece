"""Streaming operator demos wired into the driver registry.

Each runs a real Structured Streaming query (readStream → stateful op →
sink, Trigger.AvailableNow) and returns the final state, which must equal
the batch/DuckDB computation of the same expression — so streaming
correctness rides the same oracle gate as everything else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hive_spark import streaming
from hive_spark.operators import QuerySpec, views
from hive_spark.operators.events import _SESSION_SQL, _SLIDING_SQL, _TUMBLING_SQL


def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    return streaming.stream_tumbling_counts(spark, sf_dir)


def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    return streaming.stream_dedup_counts(spark, sf_dir)


_DEDUP_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS sum_value
FROM events
GROUP BY event_type ORDER BY event_type
"""


def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    return streaming.stream_sliding_counts(spark, sf_dir)


def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    return streaming.stream_session_upsert(spark, sf_dir)


def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: streaming events inner-join the
    static customer dimension (stateless per micro-batch — each batch
    joins against the broadcast static side; the 100 TB pattern for
    dimension enrichment in ingest pipelines). Final parquet sink content
    equals the batch join."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from hive_spark.streaming import _SCRATCH, _chunked_source, _run, read_stream

    views(spark, sf_dir)
    src = _chunked_source(spark, sf_dir, "ssj")
    out = os.path.join(_SCRATCH, f"ssj_out_{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(out, ignore_errors=True)
    customer = spark.table("customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enriched = read_stream(spark, src).join(customer, "user_id", "inner")
    _run(
        lambda cp: enriched.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(availableNow=True)
        .start(),
        os.path.join(_SCRATCH, "cp_ssj"),
    )
    return (
        spark.read.parquet(out)
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("decimal(28,4)").alias("sum_value"),
        )
        .orderBy("c_mktsegment", "event_type")
    )


_SSJ_SQL = """
SELECT c_mktsegment, event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment, event_type
ORDER BY c_mktsegment, event_type
"""


def stream_custom_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    return streaming.stream_custom_state(spark, sf_dir)


_CUSTOM_STATE_SQL = """
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM events GROUP BY user_id ORDER BY user_id
"""


def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    return streaming.stream_stream_join_pairs(spark, sf_dir)


_S2J_SQL = """
WITH c AS (SELECT user_id, epoch_us(ts) AS c_us FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, epoch_us(ts) AS p_us FROM events WHERE event_type = 'purchase'),
pairs AS (
  SELECT c.user_id, (p.p_us - c.c_us) // 1000 AS ms
  FROM c JOIN p ON c.user_id = p.user_id
   AND p.p_us >= c.c_us AND p.p_us - c.c_us <= 1800000000
)
SELECT user_id, COUNT(*) AS n_pairs,
       MIN(ms) AS min_ms_to_purchase,
       MAX(ms) AS max_ms_to_purchase
FROM pairs GROUP BY user_id ORDER BY user_id
"""


def stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    return streaming.stream_stream_left_join_pairs(spark, sf_dir)


_S2JL_SQL = """
WITH c AS (SELECT user_id, epoch_us(ts) AS c_us FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, epoch_us(ts) AS p_us FROM events WHERE event_type = 'purchase'),
j AS (
  SELECT c.user_id, (p.p_us - c.c_us) // 1000 AS ms
  FROM c LEFT JOIN p ON c.user_id = p.user_id
   AND p.p_us >= c.c_us AND p.p_us - c.c_us <= 1800000000
)
SELECT user_id, COUNT(*) AS n_rows, COUNT(ms) AS n_matched,
       MIN(ms) AS min_ms, MAX(ms) AS max_ms
FROM j GROUP BY user_id ORDER BY user_id
"""


def stream_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    return streaming.stream_cdc_upsert(spark, sf_dir)


# latest row per key, ordered by (ts, event_id) — chunking-independent
_CDC_SQL = """
SELECT user_id,
       CAST(epoch_us(ts) // 1000 AS BIGINT) AS last_ts_ms,
       event_id AS last_event_id,
       value AS last_value
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rk
      FROM events) t
WHERE rk = 1
ORDER BY user_id
"""


REGISTRY: dict[str, QuerySpec] = {
    "stream_cdc_upsert": QuerySpec(
        stream_cdc_upsert,
        _CDC_SQL,
        "foreachBatch + MERGE upsert: latest-per-key table vs batch oracle",
    ),
    "stream_stream_join": QuerySpec(stream_stream_join, _S2J_SQL),
    "stream_stream_left_join": QuerySpec(stream_stream_left_join, _S2JL_SQL),
    "stream_custom_state": QuerySpec(stream_custom_state, _CUSTOM_STATE_SQL),
    "stream_static_join": QuerySpec(stream_static_join, _SSJ_SQL),
    "stream_tumbling": QuerySpec(stream_tumbling, _TUMBLING_SQL),
    "stream_sliding": QuerySpec(stream_sliding, _SLIDING_SQL),
    "stream_dedup": QuerySpec(stream_dedup, _DEDUP_SQL),
    "stream_session": QuerySpec(stream_session, _SESSION_SQL),
}
