"""TPC-H remainder (q2-q22 adapted) vs DuckDB oracle — shared SQL text."""

import pytest

from hive_spark.operators import tpch2
from tests.oracle_check import compare


@pytest.mark.parametrize("name", sorted(tpch2.REGISTRY))
def test_tpch2_oracle(spark, sf_dir, name):
    spec = tpch2.REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert spec.oracle is not None
    compare(df, spec.oracle, sf_dir)


@pytest.mark.parametrize(
    "name",
    ["tpch_q2", "tpch_q7", "tpch_q8", "tpch_q9", "tpch_q13", "tpch_q21", "tpch_q22"],
)
def test_tpch2_nonempty(spark, sf_dir, name):
    # the filter constants must actually select data at test SF
    assert tpch2.REGISTRY[name].fn(spark, sf_dir).count() > 0
