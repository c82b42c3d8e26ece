"""SQL-text multi-insert + TRANSFORM end-to-end (hql_demo registry)."""

import pytest

from hive_spark.hqlscript import run_script
from hive_spark.operators import hql_demo, views
from tests.oracle_check import compare


def test_hql_etl_multi_insert_oracle(spark, sf_dir):
    spec = hql_demo.REGISTRY["hql_etl_multi_insert"]
    compare(spec.fn(spark, sf_dir), spec.oracle, sf_dir)


def test_sql_text_multi_insert_fans_one_scan(spark, sf_dir):
    """FROM t INSERT ... INSERT ... parses and writes both sinks in one
    statement (HiveParser.g:2565 shape, executed verbatim by spark.sql)."""
    views(spark, sf_dir)
    run_script(
        spark,
        """
        DROP TABLE IF EXISTS mi_a;
        DROP TABLE IF EXISTS mi_b;
        CREATE TABLE mi_a (n_name STRING) USING parquet;
        CREATE TABLE mi_b (n_name STRING) USING parquet;
        FROM nation
        INSERT OVERWRITE TABLE mi_a SELECT n_name WHERE n_regionkey = 0
        INSERT OVERWRITE TABLE mi_b SELECT n_name WHERE n_regionkey <> 0;
        """,
    )
    a = spark.table("mi_a").count()
    b = spark.table("mi_b").count()
    assert a > 0 and b > 0 and a + b == spark.table("nation").count()
    run_script(spark, "DROP TABLE mi_a; DROP TABLE mi_b;")


def test_sql_text_transform_pipes_rows(spark, sf_dir):
    """SELECT TRANSFORM ... USING 'cat' round-trips rows through an
    external process (ScriptOperator.java:61 behavior)."""
    views(spark, sf_dir)
    out = run_script(
        spark,
        """SELECT TRANSFORM (r_regionkey, r_name)
           USING 'cat' AS (k STRING, name STRING)
           FROM region;""",
    )
    rows = {(r.k, r.name) for r in out.results[-1].collect()}
    want = {
        (str(r.r_regionkey), r.r_name)
        for r in spark.table("region").collect()
    }
    assert rows == want


def test_hql_time_travel_oracle(spark, sf_dir):
    spec = hql_demo.REGISTRY["hql_time_travel"]
    compare(spec.fn(spark, sf_dir), spec.oracle, sf_dir)


def test_system_time_as_of_picks_version_by_mtime(spark, sf_dir, tmp_path):
    """FOR SYSTEM_TIME AS OF resolves to the last version committed at or
    before the timestamp (version-dir mtimes are the commit times)."""
    import os

    from hive_spark import snapshots
    from hive_spark.hqlscript import register_versioned, run_script

    v = views(spark, sf_dir)
    path = str(tmp_path / "tt_time")
    snapshots.write_version(v["region"], path)
    snapshots.write_version(v["region"].limit(2), path)
    # pin deterministic commit times: v0 @ 10:00, v1 @ 12:00 UTC
    os.utime(os.path.join(path, "v00000"), (1704103200, 1704103200))
    os.utime(os.path.join(path, "v00001"), (1704110400, 1704110400))
    register_versioned("region_versioned", path)
    out = run_script(
        spark,
        """SELECT COUNT(*) AS n FROM region_versioned
           FOR SYSTEM_TIME AS OF '2024-01-01T11:00:00';""",
    )
    assert out.results[-1].collect()[0].n == 5  # v0: all regions
    out2 = run_script(
        spark,
        """SELECT COUNT(*) AS n FROM region_versioned
           FOR SYSTEM_TIME AS OF '2024-01-01T13:00:00';""",
    )
    assert out2.results[-1].collect()[0].n == 2  # v1


def test_ds_sketch_names_run_as_hiveql(spark, sf_dir):
    """HiveQL text calling ds_hll_estimate(ds_hll_sketch(x)) and
    ds_kll_quantile(ds_kll_sketch(x), q) runs via the session rewrite
    (DataSketchesFunctions.java name surface -> Spark approx natives)."""
    views(spark, sf_dir)
    out = run_script(
        spark,
        """SELECT ds_hll_estimate(ds_hll_sketch(c_custkey)) AS nd,
                  ds_kll_quantile(ds_kll_sketch(CAST(c_acctbal AS FLOAT)), 0.5) AS med
           FROM customer;""",
    )
    row = out.results[-1].collect()[0]
    n_exact = spark.table("customer").select("c_custkey").distinct().count()
    # HLL standard error at default precision is ~2.3%; allow 5%
    assert abs(row.nd - n_exact) / n_exact < 0.05
    assert row.med is not None


def test_ds_sketch_lifecycle_in_hiveql(spark, sf_dir):
    """The FULL DataSketches lifecycle in HiveQL text: build sketches
    into a stored table (binary column), then estimate the union of the
    STORED sketches in a later statement — the storable/mergeable
    sketch-object surface (DataSketchesFunctions.java), not just the
    estimate(sketch(x)) composition."""
    views(spark, sf_dir)
    out = run_script(
        spark,
        """CREATE OR REPLACE TEMPORARY VIEW _sk AS
           SELECT o_orderstatus, ds_hll_sketch(o_custkey) AS sk
           FROM orders GROUP BY o_orderstatus;
           SELECT ds_hll_estimate(ds_hll_union(sk)) AS nd FROM _sk;""",
    )
    nd = out.results[-1].collect()[0].nd
    n_exact = spark.table("orders").select("o_custkey").distinct().count()
    assert abs(nd - n_exact) / n_exact < 0.05
    # the stored sketch column is real binary, loadable by later queries
    sk_type = dict(spark.table("_sk").dtypes)["sk"]
    assert sk_type == "binary"


def test_likeany_likeall_fold_to_jvm(spark, sf_dir):
    """likeany/likeall in SQL text fold into LIKE OR/AND chains — no
    Python UDF in the executed plan (GenericUDFLikeAny.java semantics)."""
    views(spark, sf_dir)
    from hive_spark.hqlscript import rewrite_statement

    stmt = rewrite_statement(
        spark,
        "SELECT COUNT(*) AS n FROM part "
        "WHERE likeany(p_name, 'alm%', '%rose%') "
        "AND NOT likeall(p_name, '%a%', '%z%')",
    )
    assert "likeany" not in stmt and "likeall" not in stmt
    df = spark.sql(stmt)
    assert "BatchEvalPython" not in df._jdf.queryExecution().executedPlan().toString()
    # same answer as the Python-UDF registration
    want = spark.sql(
        "SELECT COUNT(*) AS n FROM part "
        "WHERE likeany(p_name, 'alm%', '%rose%') "
        "AND NOT likeall(p_name, '%a%', '%z%')"
    ).collect()[0].n
    assert df.collect()[0].n == want


def test_sql_text_transform_custom_command(spark, sf_dir):
    """A non-identity pipe command (awk rewriting the stream) — the
    external process genuinely transforms the rows."""
    views(spark, sf_dir)
    df = spark.sql(
        r"""SELECT TRANSFORM (r_regionkey)
            USING 'awk ''{print $1 * 10}''' AS (k10 STRING)
            FROM region"""
    )
    got = sorted(int(r.k10) for r in df.collect())
    want = sorted(
        r.r_regionkey * 10 for r in spark.table("region").collect()
    )
    assert got == want


def test_prepare_execute_positional(spark, sf_dir):
    """PREPARE p FROM <query with ?>; EXECUTE p USING <literals> — Hive 4
    prepared statements (PrepareStatementAnalyzer.java /
    ExecuteStatementAnalyzer.java) over Spark positional parameters.
    Re-EXECUTE with different bindings reuses the stored text."""
    views(spark, sf_dir)
    out = run_script(
        spark,
        """PREPARE seg FROM SELECT COUNT(*) AS n FROM customer
             WHERE c_mktsegment = ? AND c_acctbal > ?;
           EXECUTE seg USING 'BUILDING', 1000;
           EXECUTE seg USING 'MACHINERY', 5000;""",
    )
    assert list(out.prepared) == ["seg"]
    n1 = out.results[0].collect()[0].n
    n2 = out.results[1].collect()[0].n
    exp1 = spark.sql(
        "SELECT COUNT(*) AS n FROM customer "
        "WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 1000"
    ).collect()[0].n
    exp2 = spark.sql(
        "SELECT COUNT(*) AS n FROM customer "
        "WHERE c_mktsegment = 'MACHINERY' AND c_acctbal > 5000"
    ).collect()[0].n
    assert (n1, n2) == (exp1, exp2) and n1 != n2
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown prepared"):
        run_script(spark, "EXECUTE nope USING 1;")


def test_parameterized_sql_named_args(spark, sf_dir):
    """Native named-parameter path (spark.sql(text, args=...)) — the
    PREPARE/EXECUTE equivalent the engine claims as built-in."""
    views(spark, sf_dir)
    df = spark.sql(
        "SELECT COUNT(*) AS n FROM orders WHERE o_orderpriority = :prio",
        args={"prio": "1-URGENT"},
    )
    exp = spark.sql(
        "SELECT COUNT(*) AS n FROM orders WHERE o_orderpriority = '1-URGENT'"
    ).collect()[0].n
    assert df.collect()[0].n == exp > 0


def test_explain_analyze_actual_rows(spark, sf_dir):
    """EXPLAIN ANALYZE runs the query and annotates operators with actual
    row counts (Hive ExplainSemanticAnalyzer analyze mode; here from
    executed-plan SQLMetrics)."""
    views(spark, sf_dir)
    out = run_script(
        spark,
        """EXPLAIN ANALYZE SELECT n_regionkey, COUNT(*) AS n
           FROM nation GROUP BY n_regionkey;""",
    )
    plan = out.results[-1].collect()[0].plan
    assert "HashAggregate" in plan and "Scan parquet" in plan
    assert "rows=25" in plan  # the scan's actual output rows
    assert "rows=5" in plan  # the aggregate's actual output rows


def test_create_temporary_macro(spark, sf_dir):
    """CREATE TEMPORARY MACRO (MacroSemanticAnalyzer.java /
    GenericUDFMacro.java): expression template inlined at call sites —
    stays JVM-side, composes with other expressions; DROP removes it."""
    views(spark, sf_dir)
    out = run_script(
        spark,
        """CREATE TEMPORARY MACRO sigmoid(x DOUBLE) 1.0 / (1.0 + exp(-x));
           CREATE TEMPORARY MACRO clip(v DOUBLE, lo DOUBLE, hi DOUBLE)
             least(greatest(v, lo), hi);
           SELECT ROUND(SUM(sigmoid(clip(c_acctbal / 1000, -1, 1))), 6) AS s
           FROM customer;""",
    )
    got = out.results[-1].collect()[0].s
    exp = spark.sql(
        """SELECT ROUND(SUM(1.0 / (1.0 + exp(-(least(greatest(
             (c_acctbal / 1000), -1), 1))))), 6) AS s FROM customer"""
    ).collect()[0].s
    assert got == exp
    # macros persist across run_script calls (session-scoped, like Hive)
    again = run_script(spark, "SELECT sigmoid(0.0) AS v;")
    assert float(again.results[-1].collect()[0].v) == 0.5
    run_script(spark, "DROP TEMPORARY MACRO sigmoid;")
    import pytest as _pytest
    from pyspark.errors import AnalysisException

    with _pytest.raises(AnalysisException):
        run_script(spark, "SELECT sigmoid(1.0) AS v;").results[-1].collect()


def test_macro_wrong_arity_rejected(spark, sf_dir):
    views(spark, sf_dir)
    run_script(spark, "CREATE TEMPORARY MACRO twice(x INT) x + x;")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="expects 1 arguments"):
        run_script(spark, "SELECT twice(1, 2);")


def test_field_folds_to_case_chain(spark, sf_dir):
    """field(v, a, b, ...) in SQL text folds to a JVM CASE chain
    (GenericUDFField 1-based index, 0 on no match / NULL input) —
    matching the variadic Python UDF fallback exactly."""
    views(spark, sf_dir)
    from hive_spark.hqlscript import rewrite_statement

    sql = ("SELECT c_mktsegment, "
           "field(c_mktsegment, 'BUILDING', 'MACHINERY', 'HOUSEHOLD') AS f "
           "FROM customer")
    rewritten = rewrite_statement(spark, sql)
    assert "CASE" in rewritten and "field" not in rewritten
    got = {(r.c_mktsegment, r.f) for r in spark.sql(rewritten).collect()}
    exp = {
        (r.c_mktsegment, r.f)
        for r in spark.sql(
            """SELECT c_mktsegment, CASE c_mktsegment WHEN 'BUILDING' THEN 1
               WHEN 'MACHINERY' THEN 2 WHEN 'HOUSEHOLD' THEN 3 ELSE 0 END AS f
               FROM customer"""
        ).collect()
    }
    assert got == exp
    assert spark.sql(
        "SELECT " + rewrite_statement(
            spark, "SELECT field(CAST(NULL AS STRING), 'x') AS f"
        ).split("SELECT", 1)[1]
    ).collect()[0].f == 0
