"""TPC-H suite vs DuckDB oracle (driver-gate replica)."""

import pytest

from hive_spark.operators import tpch
from tests.oracle_check import compare


@pytest.mark.parametrize("name", sorted(tpch.REGISTRY))
def test_tpch_oracle(spark, sf_dir, name):
    spec = tpch.REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert spec.oracle is not None
    compare(df, spec.oracle, sf_dir)
