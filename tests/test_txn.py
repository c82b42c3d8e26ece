"""Writer locks + multi-statement transactions (DbTxnManager analog)."""

import os

import pytest
from pyspark.sql import functions as F

from hive_spark import snapshots
from hive_spark.txn import LockTimeout, Transaction, write_lock


def test_write_lock_excludes_second_writer(tmp_path):
    path = str(tmp_path / "t")
    os.makedirs(path)
    with write_lock(path):
        with pytest.raises(LockTimeout):
            with write_lock(path, timeout=0.3):
                pass
    # released: acquirable again
    with write_lock(path, timeout=0.3):
        pass


def test_stale_lock_reclaimed(tmp_path):
    """A lock whose holder pid is dead must be reclaimed (heartbeat-expiry
    analog), not block forever."""
    path = str(tmp_path / "t")
    os.makedirs(path)
    with open(path + "._lock", "w") as f:
        f.write("999999999:0")  # no such pid
    with write_lock(path, timeout=1.0):
        pass


def test_dml_rewrite_serializes_under_lock(spark, tmp_path):
    """update_where must wait for (or fail on) a held table lock instead
    of interleaving with another writer's rewrite."""
    from hive_spark.dml import update_where

    path = str(tmp_path / "t")
    spark.range(10).withColumn("v", F.lit(1)).write.parquet(path)
    with write_lock(path):
        with pytest.raises(LockTimeout):
            import hive_spark.txn as txn_mod

            orig = txn_mod.write_lock
            txn_mod.write_lock = lambda p, timeout=0.3, poll=0.05: orig(
                p, timeout=timeout, poll=poll
            )
            try:
                update_where(spark, path, F.col("id") < 5, {"v": F.lit(2)})
            finally:
                txn_mod.write_lock = orig
    # lock released: the update applies cleanly now
    update_where(spark, path, F.col("id") < 5, {"v": F.lit(2)})
    assert (
        spark.read.parquet(path).filter("v = 2").count() == 5
    )


def test_transaction_commit_and_rollback(spark, tmp_path):
    ta, tb = str(tmp_path / "a"), str(tmp_path / "b")
    snapshots.write_version(spark.range(3), ta)
    snapshots.write_version(spark.range(5), tb)

    # rollback: both tables flip back atomically
    with pytest.raises(RuntimeError, match="boom"):
        with Transaction(spark, {"a": ta, "b": tb}) as txn:
            txn.write("a", spark.range(30))
            txn.write("b", spark.range(50))
            raise RuntimeError("boom")
    assert snapshots.read_table(spark, ta).count() == 3
    assert snapshots.read_table(spark, tb).count() == 5

    # commit: both new versions visible
    with Transaction(spark, {"a": ta, "b": tb}) as txn:
        txn.write("a", spark.range(30))
        txn.write("b", spark.range(50))
    assert snapshots.read_table(spark, ta).count() == 30
    assert snapshots.read_table(spark, tb).count() == 50


def test_transaction_repeatable_read(spark, tmp_path):
    """txn.read() serves the version pinned at BEGIN even after the txn
    itself writes a newer one (reader-snapshot semantics)."""
    ta = str(tmp_path / "a")
    snapshots.write_version(spark.range(3), ta)
    with Transaction(spark, {"a": ta}) as txn:
        txn.write("a", spark.range(99))
        assert txn.read("a").count() == 3  # still the BEGIN snapshot
    assert snapshots.read_table(spark, ta).count() == 99


def test_transaction_holds_write_lock(spark, tmp_path):
    ta = str(tmp_path / "a")
    snapshots.write_version(spark.range(3), ta)
    with Transaction(spark, {"a": ta}):
        with pytest.raises(LockTimeout):
            with write_lock(ta, timeout=0.3):
                pass
    with write_lock(ta, timeout=0.3):  # released after commit
        pass


def test_hql_script_transaction_rollback(spark, tmp_path):
    """SQL-text BEGIN/ROLLBACK over a registered versioned table: a write
    inside the txn disappears on ROLLBACK; reads inside the txn are
    pinned at BEGIN."""
    from hive_spark.hqlscript import register_versioned, run_script

    ta = str(tmp_path / "vt")
    snapshots.write_version(
        spark.range(4).withColumn("v", F.lit(0)), ta
    )
    register_versioned("vt_txn_demo", ta)
    try:
        out = run_script(
            spark,
            "START TRANSACTION; SELECT COUNT(*) AS n FROM vt_txn_demo;",
        )
        # script ended with the txn open -> auto-rollback recorded
        assert any("rolled back" in s for s in out.skipped)
        assert out.results[-1].collect()[0].n == 4

        # a write between BEGIN and ROLLBACK is undone
        with Transaction(spark, {"vt_txn_demo": ta}) as t2:
            t2.write("vt_txn_demo", spark.range(100).withColumn("v", F.lit(1)))
            t2.rollback()
        assert snapshots.read_table(spark, ta).count() == 4
    finally:
        from hive_spark.hqlscript import VERSIONED_TABLES

        VERSIONED_TABLES.pop("vt_txn_demo", None)


def test_show_locks(spark, tmp_path):
    """SHOW LOCKS surfaces held writer locks for registered versioned
    tables (table, path, holder pid, liveness)."""
    from hive_spark.hqlscript import VERSIONED_TABLES, register_versioned, run_script
    from hive_spark.txn import list_locks

    ta = str(tmp_path / "locked")
    snapshots.write_version(spark.range(2), ta)
    register_versioned("locked_tbl", ta)
    try:
        assert list_locks({"locked_tbl": ta}) == []
        with write_lock(ta):
            rows = run_script(spark, "SHOW LOCKS;").results[-1].collect()
            mine = [r for r in rows if r.table == "locked_tbl"]
            assert len(mine) == 1
            assert mine[0].holder_pid > 0 and mine[0].holder_alive
        assert list_locks({"locked_tbl": ta}) == []
    finally:
        VERSIONED_TABLES.pop("locked_tbl", None)


def test_begin_partial_failure_releases_acquired_locks(spark, tmp_path):
    """LockTimeout on table N must release tables 1..N-1's locks before
    propagating — otherwise later writers block with no handle."""
    import hive_spark.txn as txn_mod

    ta, tb = str(tmp_path / "a"), str(tmp_path / "b")
    snapshots.write_version(spark.range(1), ta)
    snapshots.write_version(spark.range(1), tb)
    orig = txn_mod.write_lock
    txn_mod.write_lock = lambda p, timeout=0.3, poll=0.05: orig(
        p, timeout=timeout, poll=poll
    )
    try:
        with orig(tb):  # second table's lock is held by "another writer"
            with pytest.raises(LockTimeout):
                Transaction(spark, {"a": ta, "b": tb}).begin()
            # the first table's lock must NOT have leaked
            with orig(ta, timeout=0.3):
                pass
    finally:
        txn_mod.write_lock = orig


def test_pid_alive_eperm_means_alive(monkeypatch):
    """EPERM from kill(pid, 0) = pid exists under another user — the
    lock must be treated as held, not reclaimed."""
    from hive_spark.txn import _pid_alive

    def eperm(pid, sig):
        raise PermissionError("not permitted")

    monkeypatch.setattr(os, "kill", eperm)
    assert _pid_alive(12345)


def test_reclaim_restores_fresh_lock(tmp_path):
    """If the reclaim rename grabs a DIFFERENT (fresh, live) lock than
    the stale one observed, the fresh lock is restored, not dropped."""
    import hive_spark.txn as txn_mod

    path = str(tmp_path / "t")
    os.makedirs(path)
    lock = path + "._lock"
    stale = "999999999:0"
    fresh = f"{os.getpid()}:1.0"

    real_rename = os.rename
    swapped = {}

    def racing_rename(src, dst):
        # simulate: holder released and a live writer re-created the lock
        # file in the window between our staleness check and the rename
        if src == lock and not swapped:
            swapped["done"] = True
            with open(lock, "w") as f:
                f.write(fresh)
        real_rename(src, dst)

    with open(lock, "w") as f:
        f.write(stale)
    orig_rename = txn_mod.os.rename
    txn_mod.os.rename = racing_rename
    try:
        with pytest.raises(LockTimeout):
            with write_lock(path, timeout=0.4):
                pass
    finally:
        txn_mod.os.rename = orig_rename
    # the live writer's lock survived the attempted reclaim
    with open(lock) as f:
        assert f.read() == fresh


def test_script_error_inside_txn_rolls_back_and_releases(spark, tmp_path):
    """A failing statement between BEGIN and COMMIT must roll the txn
    back (releasing write locks) and restore latest-version views."""
    from hive_spark.hqlscript import (
        VERSIONED_TABLES,
        register_versioned,
        run_script,
    )

    ta = str(tmp_path / "vt_err")
    snapshots.write_version(spark.range(6), ta)
    register_versioned("vt_err_demo", ta)
    try:
        with pytest.raises(Exception):
            run_script(
                spark,
                "BEGIN; SELECT * FROM table_that_does_not_exist_xyz;",
            )
        # lock released (would LockTimeout if leaked)
        with write_lock(ta, timeout=0.5):
            pass
        # view restored to the latest committed version, not the pin
        assert spark.table("vt_err_demo").count() == 6
    finally:
        VERSIONED_TABLES.pop("vt_err_demo", None)
