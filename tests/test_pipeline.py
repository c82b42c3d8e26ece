"""End-to-end training-data pipeline vs DuckDB oracle."""

from hive_spark.operators import pipeline
from tests.oracle_check import compare


def test_training_pipeline_oracle(spark, sf_dir):
    spec = pipeline.REGISTRY["training_data_pipeline"]
    df = spec.fn(spark, sf_dir)
    assert {r.lang for r in df.collect()} == {"en", "de", "fr"}
    compare(spec.fn(spark, sf_dir), spec.oracle, sf_dir)
