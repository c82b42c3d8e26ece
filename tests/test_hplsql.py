"""HPL/SQL subset interpreter (ref: hplsql/.../Exec.java) — procedural
control flow driving real engine queries."""

import pytest

from hive_spark.hplsql import run_hplsql
from hive_spark.operators import views


def test_declare_set_print(spark, sf_dir):
    views(spark, sf_dir)
    out = run_hplsql(
        spark,
        """DECLARE cnt INT := (SELECT COUNT(*) FROM nation);
           DECLARE msg STRING := 'nations';
           SET cnt := cnt + 1;
           PRINT concat(msg, '=', CAST(cnt AS STRING));""",
    )
    assert out.printed == ["nations=26"]
    assert out.variables == {"cnt": 26, "msg": "nations"}


def test_if_elsif_else(spark, sf_dir):
    views(spark, sf_dir)
    script = """DECLARE n INT := {n};
           IF n > 100 THEN PRINT 'big';
           ELSIF n > 10 THEN PRINT 'medium';
           ELSE PRINT 'small';
           END IF;"""
    assert run_hplsql(spark, script.format(n=500)).printed == ["big"]
    assert run_hplsql(spark, script.format(n=50)).printed == ["medium"]
    assert run_hplsql(spark, script.format(n=5)).printed == ["small"]


def test_nested_if(spark, sf_dir):
    views(spark, sf_dir)
    out = run_hplsql(
        spark,
        """DECLARE a INT := 1;
           IF a = 1 THEN
             IF a < 0 THEN PRINT 'neg'; ELSE PRINT 'pos'; END IF;
             PRINT 'outer';
           END IF;""",
    )
    assert out.printed == ["pos", "outer"]


def test_while_loop_accumulates(spark, sf_dir):
    views(spark, sf_dir)
    out = run_hplsql(
        spark,
        """DECLARE i INT := 0;
           DECLARE total INT := 0;
           WHILE i < 4 LOOP
             SET total := total + i;
             SET i := i + 1;
           END LOOP;
           PRINT total;""",
    )
    assert out.printed == ["6"]


def test_for_in_select_cursor(spark, sf_dir):
    """FOR rec IN (SELECT ...) LOOP — the HPL/SQL cursor loop; row
    columns bind as rec.col."""
    views(spark, sf_dir)
    out = run_hplsql(
        spark,
        """DECLARE total BIGINT := 0;
           FOR r IN (SELECT r_regionkey, r_name FROM region
                     ORDER BY r_regionkey LIMIT 3) LOOP
             PRINT concat(r.r_name, ':', CAST(r.r_regionkey AS STRING));
           END LOOP;""",
    )
    assert len(out.printed) == 3
    assert out.printed[0].endswith(":0")


def test_sql_statements_and_macros_inside_procedure(spark, sf_dir, tmp_path):
    """Plain SQL inside a procedure goes through hqlscript, so the HiveQL
    rewrite layer (macros, ds_*) works inside control flow; DML executes."""
    views(spark, sf_dir)
    out = run_hplsql(
        spark,
        """CREATE TEMPORARY MACRO dbl(x INT) x * 2;
           DECLARE five INT := 5;
           IF five = 5 THEN
             SELECT dbl(five) AS v;
           END IF;""",
    )
    assert out.printed == ["(10,)"]


def test_while_iteration_guard(spark, sf_dir):
    views(spark, sf_dir)
    from hive_spark.hplsql import HplInterpreter

    interp = HplInterpreter(spark, max_loop_iters=3)
    with pytest.raises(RuntimeError, match="max_loop_iters"):
        interp.run("WHILE 1 = 1 LOOP PRINT 'x'; END LOOP;")


def test_engine_procedure_facade(spark, sf_dir):
    from hive_spark.engine import Engine

    views(spark, sf_dir)
    eng = Engine(spark)
    out = eng.procedure(
        "DECLARE n INT := (SELECT COUNT(*) FROM region); PRINT n * 2;"
    )
    assert out.printed == ["10"]
