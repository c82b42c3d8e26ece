"""DataSketches HLL lifecycle operators vs DuckDB exact-count oracle."""

import pytest

from hive_spark.operators import sketches
from tests.oracle_check import compare


@pytest.mark.parametrize("name", sorted(sketches.REGISTRY))
def test_sketches_oracle(spark, sf_dir, name):
    spec = sketches.REGISTRY[name]
    assert spec.oracle is not None
    compare(spec.fn(spark, sf_dir), spec.oracle, sf_dir)


def test_stored_sketches_merge_like_global(spark, sf_dir):
    """Merging the persisted per-group sketches must estimate the same
    cardinality as sketching the whole column in one pass — the
    register-max merge property that makes sketches safe to build
    per-partition at 100 TB and union at query time. (Not bit-equal:
    DataSketches unions re-target to HLL_8, so the two estimators can
    differ by a rounding hair — but both must sit inside the lgK=12
    error bound, and the merged estimate must be deterministic.)"""
    from hive_spark.operators import views

    views(spark, sf_dir)
    sketches.sketch_hll_lifecycle(spark, sf_dir).collect()  # persists
    import os
    import tempfile

    path = os.path.join(
        tempfile.gettempdir(),
        f"hive_spark_hll_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    stored = spark.read.parquet(path)
    merge_expr = "hll_sketch_estimate(hll_union_agg(sk)) AS est"
    merged = stored.selectExpr(merge_expr).collect()[0].est
    # deterministic under re-evaluation and a different partitioning
    assert stored.repartition(7).selectExpr(merge_expr).collect()[0].est == merged
    single = (
        spark.table("lineitem")
        .selectExpr("hll_sketch_estimate(hll_sketch_agg(l_orderkey)) AS est")
        .collect()[0]
        .est
    )
    exact = spark.table("lineitem").select("l_orderkey").distinct().count()
    assert abs(merged - single) / exact < 0.005
    assert abs(merged - exact) / exact < 0.05
    assert abs(single - exact) / exact < 0.05
