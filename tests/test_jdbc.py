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


def test_jdbc_storage_handler_sql_text(spark):
    """STORED BY JdbcStorageHandler end-to-end in SQL text (ref:
    jdbc-handler/.../JdbcStorageHandler.java): qt:database directive
    boots in-memory Derby + init script, dboutput folds execute DDL/DML
    driver-side, the handler CREATE registers a pushdown-capable scan,
    INSERT INTO writes back, DROP unregisters."""
    from hive_spark.hqlscript import run_script
    from hive_spark.sources.jdbc_handler import (
        HANDLER_TABLES,
        drop_memory_databases,
    )

    try:
        out = run_script(
            spark,
            "--!qt:database:derby:hdl\n"
            "SELECT dboutput('${system:hive.test.database.hdl.jdbc.url}',"
            " '', '', 'CREATE TABLE HT (\"k\" INTEGER, \"v\" VARCHAR(10))')"
            " AS rc;\n"
            "SELECT dboutput('${system:hive.test.database.hdl.jdbc.url}',"
            " '', '', 'INSERT INTO HT VALUES (?, ?)', '1', 'a') AS rc;\n"
            "CREATE EXTERNAL TABLE ht (k INT, v STRING)"
            " STORED BY 'org.apache.hive.storage.jdbc.JdbcStorageHandler'"
            " TBLPROPERTIES ("
            "  'hive.sql.database.type' = 'DERBY',"
            "  'hive.sql.jdbc.url' ="
            "    '${system:hive.test.database.hdl.jdbc.url}',"
            "  'hive.sql.table' = 'HT');\n"
            "INSERT INTO ht VALUES (2, 'b');\n"
            "SELECT k, v FROM ht ORDER BY k;\n"
            "DROP TABLE ht;",
        )
        assert [r.rc for r in out.results[0].collect()] == [0]
        rows = [(r.k, r.v) for r in out.results[-1].collect()]
        assert rows == [(1, "a"), (2, "b")]
        assert "ht" not in HANDLER_TABLES
    finally:
        drop_memory_databases(spark)


def test_dboutput_not_executed_under_explain(spark):
    """Hive's EXPLAIN renders without executing; a dboutput inside an
    EXPLAINed statement must not run its JDBC DML as a rewrite side
    effect."""
    from hive_spark.hqlscript import run_script
    from hive_spark.sources.jdbc_handler import drop_memory_databases

    try:
        # the EXPLAIN must produce plan text while leaving its INSERT
        # unexecuted: only k=2 (the non-EXPLAIN insert) lands in ET
        out = run_script(
            spark,
            "--!qt:database:derby:expl\n"
            "SELECT dboutput('${system:hive.test.database.expl.jdbc.url}',"
            " '', '', 'CREATE TABLE ET (\"k\" INTEGER)') AS rc;\n"
            "EXPLAIN SELECT dboutput("
            "'${system:hive.test.database.expl.jdbc.url}',"
            " '', '', 'INSERT INTO ET VALUES (1)') AS rc;\n"
            "SELECT dboutput('${system:hive.test.database.expl.jdbc.url}',"
            " '', '', 'INSERT INTO ET VALUES (2)') AS rc;\n"
            "CREATE EXTERNAL TABLE et_rb (k INT)"
            " STORED BY 'org.apache.hive.storage.jdbc.JdbcStorageHandler'"
            " TBLPROPERTIES ("
            "  'hive.sql.database.type' = 'DERBY',"
            "  'hive.sql.jdbc.url' ="
            "    '${system:hive.test.database.expl.jdbc.url}',"
            "  'hive.sql.table' = 'ET');\n"
            "SELECT k FROM et_rb ORDER BY k;\n"
            "DROP TABLE et_rb;",
        )
        assert [r.k for r in out.results[-1].collect()] == [2]
    finally:
        drop_memory_databases(spark)
