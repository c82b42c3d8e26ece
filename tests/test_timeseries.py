"""As-of and range joins vs DuckDB (native ASOF JOIN as the oracle)."""

import pytest

from hive_spark.operators import timeseries
from tests.oracle_check import compare


@pytest.mark.parametrize("name", sorted(timeseries.REGISTRY))
def test_timeseries_oracle(spark, sf_dir, name):
    spec = timeseries.REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() > 0
    compare(spec.fn(spark, sf_dir), spec.oracle, sf_dir)
