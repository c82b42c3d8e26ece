"""Function-surface demos vs DuckDB oracle."""

import pytest

from hive_spark.operators import funcdemo
from tests.oracle_check import compare


@pytest.mark.parametrize("name", sorted(funcdemo.REGISTRY))
def test_funcdemo_oracle(spark, sf_dir, name):
    spec = funcdemo.REGISTRY[name]
    compare(spec.fn(spark, sf_dir), spec.oracle, sf_dir)
