"""JDBC connector against embedded Derby: round trip, remote pushdown,
and sharded parallel reads (the properties that matter when the remote
table is big and the cluster is bigger)."""

import pytest

from hive_spark.sources import jdbc


@pytest.fixture(scope="module")
def db(spark, sf_dir, tmp_path_factory):
    url = jdbc.derby_url(str(tmp_path_factory.mktemp("derby") / "db"))
    src = (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .select("n_nationkey", "n_name", "n_regionkey")
    )
    jdbc.write(spark, src, url, "nation_j")
    return url, src


def test_round_trip(spark, db):
    url, src = db
    back = jdbc.read(spark, url, "nation_j")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_remote_pushdown(spark, db):
    url, _ = db
    q = (
        jdbc.read(spark, url, "nation_j")
        .filter("n_regionkey = 2")
        .select("n_name")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "EqualTo(n_regionkey,2)" in plan.replace(" ", "")
    assert "struct<n_name:string>" in plan.replace("ReadSchema: ", "")


def test_sharded_parallel_read(spark, db):
    url, src = db
    sharded = jdbc.read(
        spark, url, "nation_j",
        partition_column="n_nationkey",
        lower_bound=0, upper_bound=25, num_partitions=4,
    )
    assert sharded.rdd.getNumPartitions() == 4
    assert sorted(map(tuple, sharded.collect())) == sorted(map(tuple, src.collect()))
