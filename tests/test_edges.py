"""Semantic-edge conformance vs DuckDB oracle."""

import pytest

from hive_spark.operators import edges
from tests.oracle_check import compare


@pytest.mark.parametrize("name", sorted(edges.REGISTRY))
def test_edge_oracle(spark, sf_dir, name):
    spec = edges.REGISTRY[name]
    compare(spec.fn(spark, sf_dir), spec.oracle, sf_dir)


def test_null_safe_join_nonvacuous(spark, sf_dir):
    # the NULL<=>NULL matches must actually appear
    df = edges.REGISTRY["edge_null_safe_join"].fn(spark, sf_dir)
    assert df.count() > 25  # more than plain equality would give
