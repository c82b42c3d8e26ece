"""Relational operator coverage vs DuckDB oracle."""

import pytest

from hive_spark.operators import relational
from tests.oracle_check import compare


@pytest.mark.parametrize("name", sorted(relational.REGISTRY))
def test_relational_oracle(spark, sf_dir, name):
    spec = relational.REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert spec.oracle is not None
    compare(df, spec.oracle, sf_dir)
