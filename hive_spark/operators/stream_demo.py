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
from hive_spark.operators.events import _SESSION_SQL, _TUMBLING_SQL


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


def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    return streaming.stream_session_upsert(spark, sf_dir)


REGISTRY: dict[str, QuerySpec] = {
    "stream_tumbling": QuerySpec(stream_tumbling, _TUMBLING_SQL),
    "stream_dedup": QuerySpec(stream_dedup, _DEDUP_SQL),
    "stream_session": QuerySpec(stream_session, _SESSION_SQL),
}
