"""Deterministic sampling/selection: oracle parity plus the property the
module exists for — results independent of partitioning (same corpus +
same config => the same training set on 8 cores or 8000)."""

import pytest
from pyspark.sql import functions as F

from hive_spark.operators import sampling, views
from tests.oracle_check import compare


@pytest.mark.parametrize("name", sorted(sampling.REGISTRY))
def test_sampling_oracle(spark, sf_dir, name):
    spec = sampling.REGISTRY[name]
    compare(spec.fn(spark, sf_dir), spec.oracle, sf_dir)


def test_hash_sample_partition_independent(spark, sf_dir):
    docs = views(spark, sf_dir)["documents"]
    expr = f"(doc_id * {sampling._KNUTH}) % {sampling._MOD} < {sampling._threshold(0.10)}"
    one = sorted(r.doc_id for r in docs.coalesce(1).filter(expr).collect())
    many = sorted(
        r.doc_id for r in docs.repartition(16, "lang").filter(expr).collect()
    )
    assert one == many and len(one) > 0


def test_hash_sample_rate_is_close(spark, sf_dir):
    docs = views(spark, sf_dir)["documents"]
    n = docs.count()
    expr = f"(doc_id * {sampling._KNUTH}) % {sampling._MOD} < {sampling._threshold(0.10)}"
    k = docs.filter(expr).count()
    assert abs(k / n - 0.10) < 0.03  # multiplicative hash spreads uniformly


def test_token_budget_is_floor_not_ceiling(spark, sf_dir):
    out = {r.lang: r for r in sampling.sample_token_budget(spark, sf_dir).collect()}
    docs = views(spark, sf_dir)["documents"]
    totals = {
        r.lang: r.total
        for r in docs.groupBy("lang").agg(F.sum("n_chars").alias("total")).collect()
    }
    for lang, r in out.items():
        # crossed the budget (floor semantics) unless the corpus ran out
        assert r.chars_taken >= min(sampling._BUDGET, totals[lang])
