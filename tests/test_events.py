"""Event-stream analytics vs DuckDB oracle."""

import pytest

from hive_spark.operators import events
from tests.oracle_check import compare


@pytest.mark.parametrize("name", sorted(events.REGISTRY))
def test_events_oracle(spark, sf_dir, name):
    spec = events.REGISTRY[name]
    assert spec.oracle is not None
    compare(spec.fn(spark, sf_dir), spec.oracle, sf_dir)
