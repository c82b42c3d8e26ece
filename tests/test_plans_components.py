"""Custom plan-level components: results cache, MV rewrite, salted agg."""

import pytest
from pyspark.sql import functions as F

from hive_spark.operators import views
from hive_spark.plans import (
    MaterializedViews,
    ResultsCache,
    plan_fingerprint,
    salted_agg_count,
)


def _q(spark, sf_dir):
    views(spark, sf_dir)
    return (
        spark.table("orders")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def test_fingerprint_stable_and_sensitive(spark, sf_dir):
    a = plan_fingerprint(_q(spark, sf_dir))
    b = plan_fingerprint(_q(spark, sf_dir))
    assert a == b  # same query -> same fingerprint (fresh expr IDs stripped)
    c = plan_fingerprint(_q(spark, sf_dir).filter(F.col("n") > 0))
    assert a != c  # different plan -> different fingerprint


def test_results_cache_roundtrip(spark, sf_dir):
    cache = ResultsCache(spark, root="/tmp/hive_spark_qcache_test")
    cache.clear()
    df = _q(spark, sf_dir)
    r1, hit1 = cache.get_or_compute(df)
    assert not hit1
    r2, hit2 = cache.get_or_compute(_q(spark, sf_dir))
    assert hit2  # identical plan served from cache
    assert sorted(map(tuple, r1.collect())) == sorted(map(tuple, r2.collect()))
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, r2.collect()))


def test_materialized_view_rewrite(spark, sf_dir):
    mv = MaterializedViews(spark, root="/tmp/hive_spark_mv_test")
    defining = _q(spark, sf_dir)
    mv.create("status_counts", defining)
    rewritten, used = mv.rewrite(_q(spark, sf_dir))
    assert used
    assert sorted(map(tuple, rewritten.collect())) == sorted(
        map(tuple, defining.collect())
    )
    other = spark.table("orders").groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    _, used2 = mv.rewrite(other)
    assert not used2  # non-matching plan untouched


def test_salted_agg_matches_direct(spark, sf_dir):
    views(spark, sf_dir)
    line = spark.table("lineitem")
    direct = (
        line.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(30,4)"))
            .cast("decimal(38,4)")
            .alias("sum_l_quantity"),
        )
        .orderBy("l_returnflag")
    )
    salted = salted_agg_count(line, "l_returnflag", salt=16, agg_col="l_quantity").orderBy(
        "l_returnflag"
    )
    assert [tuple(r) for r in salted.collect()] == [tuple(r) for r in direct.collect()]


def test_salted_agg_spreads_partitions(spark, sf_dir):
    """The stage-1 shuffle key is (key, salt): a single hot key must land
    in multiple shuffle partitions."""
    views(spark, sf_dir)
    line = spark.table("lineitem")
    salted = line.withColumn(
        "_salt", F.pmod(F.hash(F.monotonically_increasing_id()), 16)
    )
    n_groups = (
        salted.filter(F.col("l_returnflag") == "N")
        .groupBy("l_returnflag", "_salt")
        .count()
        .count()
    )
    assert n_groups > 8  # hot key spread over most salt buckets
