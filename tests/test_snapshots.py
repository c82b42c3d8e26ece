"""Versioned tables: time travel + snapshot isolation + retention."""

import shutil

import pytest
from pyspark.sql import functions as F

from hive_spark import snapshots
from hive_spark.operators import views

PATH = "/tmp/hive_spark_snap/tbl"


def test_time_travel_versions(spark, sf_dir):
    shutil.rmtree("/tmp/hive_spark_snap", ignore_errors=True)
    t = views(spark, sf_dir)
    v0 = snapshots.write_version(t["nation"], PATH)
    v1 = snapshots.write_version(
        t["nation"].withColumn("n_name", F.lower("n_name")), PATH
    )
    v2 = snapshots.write_version(t["nation"].filter("n_regionkey = 0"), PATH)
    assert (v0, v1, v2) == (0, 1, 2)
    assert snapshots.current_version(PATH) == 2

    # latest == v2
    assert snapshots.read_table(spark, PATH).count() == 5
    # VERSION AS OF 0: original rows
    first = snapshots.read_table(spark, PATH, 0)
    assert first.count() == 25
    assert first.filter("n_name = lower(n_name)").count() == 0
    # VERSION AS OF 1: lowercased
    assert snapshots.read_table(spark, PATH, 1).filter(
        "n_name = lower(n_name)"
    ).count() == 25


def test_snapshot_isolation_from_writers(spark, sf_dir):
    """A reader that pinned v1 still sees v1 after two more writes."""
    t = views(spark, sf_dir)
    pinned = snapshots.read_table(spark, PATH, 1)
    snapshots.write_version(t["region"], PATH)
    snapshots.write_version(t["region"], PATH)
    assert pinned.count() == 25  # still nation-v1, not region


def test_retention_expires_old_versions(spark):
    dropped = snapshots.expire(PATH, keep_last=2)
    assert dropped  # something was expired
    vs = snapshots.versions(PATH)
    assert len(vs) == 2
    with pytest.raises(FileNotFoundError, match="expired"):
        snapshots.read_table(spark, PATH, dropped[0])


def test_schema_evolution_across_versions(spark, sf_dir):
    """Iceberg-style schema evolution under CoW versioning: every write
    is a full new version, so ADD/DROP/RENAME COLUMN are just writes
    with the new schema — each snapshot carries ITS OWN schema, time
    travel returns it (the Iceberg snapshot-schema contract,
    HiveIcebergStorageHandler.java:232), and the latest version is
    never polluted by old layouts."""
    import shutil

    shutil.rmtree("/tmp/hive_spark_snap_evo", ignore_errors=True)
    path = "/tmp/hive_spark_snap_evo/tbl"
    t = views(spark, sf_dir)
    base = t["region"].select("r_regionkey", "r_name")
    snapshots.write_version(base, path)  # v0: 2 columns
    # ADD COLUMN (backfilled by the CoW write itself)
    snapshots.write_version(
        base.withColumn("tier", F.col("r_regionkey") % 2), path
    )  # v1: 3 columns
    # RENAME + DROP in one evolution step
    snapshots.write_version(
        base.select(F.col("r_regionkey").alias("region_id")), path
    )  # v2: 1 renamed column

    assert snapshots.read_table(spark, path, 0).columns == [
        "r_regionkey", "r_name",
    ]
    assert snapshots.read_table(spark, path, 1).columns == [
        "r_regionkey", "r_name", "tier",
    ]
    assert snapshots.read_table(spark, path).columns == ["region_id"]
    # old snapshots remain queryable with their own schema after evolution
    assert (
        snapshots.read_table(spark, path, 1).filter("tier = 0").count() == 3
    )


def test_schema_evolution_add_column_with_time_travel(spark, tmp_path):
    """Add-column evolution publishes a new version; time travel to the
    old version returns the OLD schema (per-version schema, the Iceberg
    semantics), and $history-style metadata surfaces both."""
    from pyspark.sql import functions as F

    from hive_spark import snapshots

    path = str(tmp_path / "evolving")
    snapshots.write_version(
        spark.range(4).select(F.col("id"), (F.col("id") * 2).alias("v")), path
    )
    v1 = snapshots.evolve_add_columns(
        spark, path, {"v_sq": "v * v", "tag": "'backfilled'"}
    )
    assert snapshots.read_table(spark, path).columns == ["id", "v", "v_sq", "tag"]
    assert snapshots.read_table(spark, path, 0).columns == ["id", "v"]
    assert (
        snapshots.read_table(spark, path, v1).filter("v_sq <> v * v").count()
        == 0
    )

    hist = {r.version: r for r in snapshots.history(spark, path).collect()}
    assert hist[0].columns == ["id", "v"] and not hist[0].is_current
    assert hist[v1].columns == ["id", "v", "v_sq", "tag"] and hist[v1].is_current
