"""Source registry: working formats + honest gating of absent connectors."""

import pytest

from hive_spark import sources
from hive_spark.operators import views


def test_open_file_formats(spark, sf_dir):
    views(spark, sf_dir)
    df = sources.open_source(spark, "parquet", path=f"{sf_dir}/nation.parquet")
    assert df.count() == 25


def test_absent_connector_raises_cleanly(spark):
    with pytest.raises(sources.UnsupportedSourceError, match="kafka"):
        sources.open_source(spark, "kafka", subscribe="t")
    with pytest.raises(sources.UnsupportedSourceError, match="unknown"):
        sources.open_source(spark, "hbase")


def test_open_stream_parquet(spark, sf_dir):
    sdf = sources.open_stream(
        spark,
        "parquet",
        schema="r_regionkey INT, r_name STRING",
        path=f"{sf_dir}",
        pathGlobFilter="region.parquet",
    )
    assert sdf.isStreaming
