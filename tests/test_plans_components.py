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


def test_incremental_mv_refresh(spark, sf_dir):
    """Partition-level incremental rebuild equals a full recompute when
    only those partitions' inputs changed."""
    import os
    import shutil

    from hive_spark.plans import MaterializedViews

    views(spark, sf_dir)
    scratch = "/tmp/hive_spark_mv_incr"
    shutil.rmtree(scratch, ignore_errors=True)
    base_path = f"{scratch}/orders_base"
    spark.table("orders").write.parquet(base_path)

    def defining(path):
        o = spark.read.parquet(path)
        return (
            o.withColumn("o_year", F.year("o_orderdate"))
            .groupBy("o_year", "o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("decimal(38,2)")
                .alias("total"),
            )
        )

    mv = MaterializedViews(spark, root=f"{scratch}/mv")
    mv.create_partitioned("orders_by_year", defining(base_path), "o_year")

    # mutate ONLY 1997 rows in the base table (10% price cut)
    o = spark.read.parquet(base_path)
    patched = o.withColumn(
        "o_totalprice",
        F.when(
            F.year("o_orderdate") == 1997, F.col("o_totalprice") * 0.9
        ).otherwise(F.col("o_totalprice")),
    )
    base2 = f"{scratch}/orders_base2"
    patched.write.parquet(base2)

    mv.refresh_partitions("orders_by_year", defining(base2), [1997])

    cols = ["o_year", "o_orderstatus", "n", "total"]
    # partitioned parquet reads the partition column last; align by name
    got = sorted(map(tuple, mv.table("orders_by_year").select(*cols).collect()))
    want = sorted(map(tuple, defining(base2).select(*cols).collect()))
    assert got == want
    # fingerprint now serves the refreshed definition
    rewritten, used = mv.rewrite(defining(base2))
    assert used
