"""HiveQL script on-ramp: statement splitting, SET/txn/ADD mapping, and
a representative multi-statement Hive script running unmodified."""

import pytest

from hive_spark.hqlscript import run_script, split_statements
from hive_spark.operators import views


def test_split_respects_quotes_and_comments():
    text = """
    -- leading comment; with a semicolon
    SELECT 'a;b' AS x;    -- trailing comment
    SELECT "c;d" AS y
    """
    stmts = split_statements(text)
    assert stmts == ["SELECT 'a;b' AS x", 'SELECT "c;d" AS y']


def test_representative_hive_script(spark, sf_dir):
    views(spark, sf_dir)
    script = """
    -- classic Hive job prologue
    SET hive.exec.dynamic.partition=true;
    SET hive.exec.dynamic.partition.mode=nonstrict;
    SET spark.sql.shuffle.partitions=8;
    ADD JAR /tmp/udfs.jar;
    START TRANSACTION;
    CREATE OR REPLACE TEMPORARY VIEW big_orders AS
      SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 100000;
    SELECT /*+ MAPJOIN(n) */ n.n_name, COUNT(*) AS cnt
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name ORDER BY cnt DESC, n.n_name LIMIT 5;
    COMMIT;
    """
    out = run_script(spark, script)
    # hive-only knobs recorded, spark conf actually applied
    assert out.set_commands["hive.exec.dynamic.partition"] == "true"
    assert spark.conf.get("spark.sql.shuffle.partitions") == "8"
    # ADD JAR no-op'd; START TRANSACTION/COMMIT now bracket a REAL
    # (here empty) hive_spark.txn.Transaction and are not skipped
    assert len(out.skipped) == 1
    assert out.txn is not None and not out.txn.active
    rows = out.results[-1].collect()
    assert len(rows) == 5 and rows[0].cnt >= rows[-1].cnt
    spark.conf.set("spark.sql.shuffle.partitions", "8")


def test_mapjoin_hint_broadcasts(spark, sf_dir):
    """Hive's /*+ MAPJOIN */ hint name is honored by Spark's parser —
    HiveQL text keeps its broadcast intent without rewriting."""
    views(spark, sf_dir)
    plan = (
        spark.sql(
            """SELECT /*+ MAPJOIN(n) */ n.n_name, c.c_custkey
               FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey"""
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_shell_commands_rejected(spark):
    with pytest.raises(ValueError, match="shell/dfs"):
        run_script(spark, "!rm -rf /tmp/x;")
    with pytest.raises(ValueError, match="shell/dfs"):
        run_script(spark, "dfs -ls /;")
