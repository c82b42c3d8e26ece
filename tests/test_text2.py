"""N-gram estimators + url/map functions vs DuckDB oracle."""

import pytest

from hive_spark.operators import text2
from tests.oracle_check import compare


@pytest.mark.parametrize("name", sorted(text2.REGISTRY))
def test_text2_oracle(spark, sf_dir, name):
    spec = text2.REGISTRY[name]
    compare(spec.fn(spark, sf_dir), spec.oracle, sf_dir)
