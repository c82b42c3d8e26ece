"""Similarity-search operators vs DuckDB oracle."""

import pytest

from hive_spark.operators import vectors
from tests.oracle_check import compare


@pytest.mark.parametrize("name", sorted(vectors.REGISTRY))
def test_vectors_oracle(spark, sf_dir, name):
    spec = vectors.REGISTRY[name]
    assert spec.oracle is not None
    compare(spec.fn(spark, sf_dir), spec.oracle, sf_dir)


def test_lsh_recall_vs_brute_force(spark, sf_dir):
    """Bucketed ANN must return a subset ranking consistent with brute
    force within each bucket (recall sanity, not exact parity)."""
    bf = {
        (r.query_id, r.neighbor_id)
        for r in vectors.knn_brute_force(spark, sf_dir).collect()
    }
    lsh_rows = vectors.knn_lsh_bucketed(spark, sf_dir).collect()
    assert len(lsh_rows) > 0
    # every LSH neighbor pair is a valid (query, neighbor) pair by id
    for r in lsh_rows:
        assert r.query_id != r.neighbor_id
