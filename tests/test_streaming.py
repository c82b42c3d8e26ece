"""Structured Streaming demos vs DuckDB oracle (final state == batch)."""

import pytest

from hive_spark.operators import stream_demo
from tests.oracle_check import compare


@pytest.mark.parametrize("name", sorted(stream_demo.REGISTRY))
def test_stream_oracle(spark, sf_dir, name):
    spec = stream_demo.REGISTRY[name]
    compare(spec.fn(spark, sf_dir), spec.oracle, sf_dir)


def test_custom_state_final_equals_batch(spark, sf_dir):
    from hive_spark.operators.stream_demo import REGISTRY

    spec = REGISTRY["stream_custom_state"]
    compare(spec.fn(spark, sf_dir), spec.oracle, sf_dir)
