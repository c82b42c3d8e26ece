"""Hive canonical qtest fixtures, synthesized (FIXTURES.md §B / SURVEY §5).

Hive's golden-file tests run over a handful of canonical tables — src
(string kv), srcpart (partitioned), alltypes (every primitive, heavy
NULLs). This module synthesizes deterministic equivalents, writes them as
parquet, and replays classic qtest query shapes against a DuckDB oracle
over the same files — the engine-side adoption of Hive's test strategy
(ref: ql/src/test/queries/clientpositive/, data/files/datasets/src/
load.hive.sql:1, .../srcpart/load.hive.sql:1-16,
.../alltypesorc/load.hive.sql:1-14).
"""

import os
import shutil

import duckdb
import pytest
from pyspark.sql import functions as F

SCRATCH = "/tmp/hive_spark_qtest"


@pytest.fixture(scope="module")
def fixtures(spark):
    """src(key string, value string) 500 rows with dup keys;
    srcpart = src x (ds, hr) partitions; alltypes with ~1/3 NULLs."""
    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH)

    src = spark.range(500).select(
        F.concat(F.lit(""), (F.col("id") * 7 % 499).cast("string")).alias("key"),
        F.concat(F.lit("val_"), (F.col("id") * 7 % 499).cast("string")).alias("value"),
    )
    src.write.parquet(f"{SCRATCH}/src")

    srcpart = (
        src.crossJoin(
            spark.createDataFrame(
                [("2008-04-08", "11"), ("2008-04-08", "12"),
                 ("2008-04-09", "11"), ("2008-04-09", "12")],
                "ds string, hr string",
            )
        )
    )
    srcpart.write.partitionBy("ds", "hr").parquet(f"{SCRATCH}/srcpart")

    alltypes = spark.range(1000).select(
        F.when(F.col("id") % 3 == 0, None)
        .otherwise((F.col("id") % 128 - 64).cast("tinyint")).alias("ctinyint"),
        F.when(F.col("id") % 5 == 0, None)
        .otherwise((F.col("id") * 13 % 30000).cast("smallint")).alias("csmallint"),
        F.when(F.col("id") % 7 == 0, None)
        .otherwise((F.col("id") * 104729 % 1000003).cast("int")).alias("cint"),
        F.when(F.col("id") % 11 == 0, None)
        .otherwise((F.col("id") * 2654435761).cast("bigint")).alias("cbigint"),
        F.when(F.col("id") % 3 == 1, None)
        .otherwise((F.col("id") % 97).cast("double") / 7).alias("cdouble"),
        F.when(F.col("id") % 13 == 0, None)
        .otherwise(F.concat(F.lit("s"), (F.col("id") % 50).cast("string"))).alias("cstring1"),
        F.when(F.col("id") % 2 == 0, None)
        .otherwise(F.col("id") % 2 == 1).alias("cboolean1"),
    )
    alltypes.write.parquet(f"{SCRATCH}/alltypes")

    con = duckdb.connect()
    for t in ("src", "alltypes"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SCRATCH}/{t}/*.parquet')"
        )
    con.execute(
        "CREATE VIEW srcpart AS SELECT * FROM read_parquet("
        f"'{SCRATCH}/srcpart/*/*/*.parquet', hive_partitioning=true)"
    )
    for t in ("src", "alltypes"):
        spark.read.parquet(f"{SCRATCH}/{t}").createOrReplaceTempView(f"q_{t}")
    spark.read.parquet(f"{SCRATCH}/srcpart").createOrReplaceTempView("q_srcpart")
    yield con


def _cmp(spark, con, spark_sql, duck_sql=None):
    from tests.oracle_check import _rows

    sdf = spark.sql(spark_sql)
    cur = con.sql(duck_sql or spark_sql.replace("q_src", "src").replace(
        "q_alltypes", "alltypes").replace("q_srcpart", "srcpart"))
    assert sorted(sdf.columns) == sorted(cur.columns)
    a = _rows([tuple(r) for r in sdf.collect()], sdf.columns)
    b = _rows(cur.fetchall(), cur.columns)
    assert a == b, f"mismatch: {a[:3]} vs {b[:3]}"


def test_src_groupby_join(spark, fixtures):
    """The classic qtest shape: self-join on string key + group-by
    (string keys compare/join with dup handling)."""
    _cmp(
        spark,
        fixtures,
        """SELECT a.key, COUNT(*) AS n
           FROM q_src a JOIN q_src b ON a.key = b.key
           GROUP BY a.key ORDER BY n DESC, a.key LIMIT 20""",
        """SELECT a.key, COUNT(*) AS n
           FROM src a JOIN src b ON a.key = b.key
           GROUP BY a.key ORDER BY n DESC, a.key LIMIT 20""",
    )


def test_srcpart_partition_pruning(spark, fixtures):
    """Static partition predicate (Hive PartitionPruner): one (ds, hr)
    pair scanned, values correct."""
    _cmp(
        spark,
        fixtures,
        """SELECT ds, hr, COUNT(*) AS n, MIN(key) AS min_key
           FROM q_srcpart WHERE ds = '2008-04-08' AND hr = '11'
           GROUP BY ds, hr ORDER BY ds, hr""",
        """SELECT ds, hr, COUNT(*) AS n, MIN(key) AS min_key
           FROM srcpart WHERE ds = '2008-04-08' AND hr = '11'
           GROUP BY ds, hr ORDER BY ds, hr""",
    )
    # plan-level: only one of four partitions survives pruning
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        spark.sql(
            "SELECT COUNT(*) FROM q_srcpart WHERE ds = '2008-04-08' AND hr = '11'"
        ).explain(True)
    assert "2008-04-09" not in buf.getvalue()


def test_alltypes_null_semantics(spark, fixtures):
    """NULL-heavy aggregation parity across every primitive (Hive
    alltypesorc exercises NULL handling through the vectorized path)."""
    _cmp(
        spark,
        fixtures,
        """SELECT COUNT(*) AS n_rows,
                  COUNT(ctinyint) AS n_tiny,
                  COUNT(csmallint) AS n_small,
                  COUNT(cint) AS n_int,
                  COUNT(cbigint) AS n_big,
                  SUM(CAST(cint AS BIGINT)) AS sum_int,
                  MIN(cstring1) AS min_str,
                  COUNT(CASE WHEN cboolean1 THEN 1 END) AS n_true
           FROM q_alltypes""",
        """SELECT COUNT(*) AS n_rows,
                  COUNT(ctinyint) AS n_tiny,
                  COUNT(csmallint) AS n_small,
                  COUNT(cint) AS n_int,
                  COUNT(cbigint) AS n_big,
                  SUM(CAST(cint AS BIGINT)) AS sum_int,
                  MIN(cstring1) AS min_str,
                  COUNT(CASE WHEN cboolean1 THEN 1 END) AS n_true
           FROM alltypes""",
    )


def test_string_number_coercion_on_src(spark, fixtures):
    """Hive compares string keys to numbers numerically (qtest staple:
    WHERE key < 100 on a string column)."""
    _cmp(
        spark,
        fixtures,
        """SELECT key, value FROM q_src WHERE key < 100
           ORDER BY CAST(key AS INT), value""",
        """SELECT key, value FROM src WHERE CAST(key AS INT) < 100
           ORDER BY CAST(key AS INT), value""",
    )


def test_dynamic_partition_pruning_join(spark, fixtures):
    """DPP shape: fact (srcpart) joined to a filtered dim — Hive's
    DynamicPartitionPruningOptimization (ref ql/.../optimizer/
    DynamicPartitionPruningOptimization.java:96); Spark DPP handles the
    runtime pruning, results must match the oracle."""
    _cmp(
        spark,
        fixtures,
        """WITH dim AS (SELECT '2008-04-08' AS ds)
           SELECT p.ds, COUNT(*) AS n
           FROM q_srcpart p JOIN dim d ON p.ds = d.ds
           GROUP BY p.ds ORDER BY p.ds""",
        """WITH dim AS (SELECT '2008-04-08' AS ds)
           SELECT p.ds, COUNT(*) AS n
           FROM srcpart p JOIN dim d ON p.ds = d.ds
           GROUP BY p.ds ORDER BY p.ds""",
    )


def test_outer_join_on_vs_where_filter(spark, fixtures):
    """Hive qtest join_filters.q semantics: a right-side predicate in the
    ON clause of a LEFT JOIN preserves unmatched left rows (filter before
    join), while the same predicate in WHERE turns the join inner. Both
    placements must match the oracle exactly."""
    on_clause = """SELECT a.key, b.value
           FROM {src} a LEFT JOIN {src} b
             ON a.key = b.key AND b.value > 'val_3'
           ORDER BY a.key, b.value"""
    where_clause = """SELECT a.key, b.value
           FROM {src} a LEFT JOIN {src} b ON a.key = b.key
           WHERE b.value > 'val_3'
           ORDER BY a.key, b.value"""
    for tpl in (on_clause, where_clause):
        _cmp(
            spark,
            fixtures,
            tpl.format(src="q_src"),
            tpl.format(src="src"),
        )
    # the two placements differ: ON keeps every left row
    n_on = spark.sql(on_clause.format(src="q_src")).count()
    n_where = spark.sql(where_clause.format(src="q_src")).count()
    assert n_on > n_where


def test_lateral_view_outer(spark, fixtures):
    """Hive lateral_view_outer.q: LATERAL VIEW OUTER explode keeps the
    parent row (with NULL) when the generated array is empty; the inner
    variant drops it."""
    outer = spark.sql(
        """SELECT key, tok
           FROM (SELECT key,
                        CASE WHEN key < '2' THEN split(value, '_')
                             ELSE array() END AS arr
                 FROM q_src) t
           LATERAL VIEW OUTER explode(arr) e AS tok
           ORDER BY key, tok"""
    )
    duck = fixtures.sql(
        """SELECT key, unnest(
                 CASE WHEN key < '2' THEN str_split(value, '_')
                      ELSE [NULL] END) AS tok
           FROM src ORDER BY key, tok"""
    )
    from tests.oracle_check import _rows

    assert _rows([tuple(r) for r in outer.collect()], outer.columns) == _rows(
        duck.fetchall(), [d[0] for d in duck.description]
    )
    inner = spark.sql(
        """SELECT key, tok
           FROM (SELECT key,
                        CASE WHEN key < '2' THEN split(value, '_')
                             ELSE array() END AS arr
                 FROM q_src) t
           LATERAL VIEW explode(arr) e AS tok"""
    )
    assert inner.count() < outer.count()


def test_cube_grouping_id_on_srcpart(spark, fixtures):
    """Hive groupby_cube1.q analog: CUBE over the partition columns with
    grouping_id — Spark and DuckDB agree on both the rollup rows and the
    grouping-bit order (GROUPING returns the same bitmask)."""
    _cmp(
        spark,
        fixtures,
        """SELECT ds, hr, GROUPING_ID(ds, hr) AS gid, COUNT(*) AS n
           FROM q_srcpart GROUP BY CUBE(ds, hr)
           ORDER BY gid, ds, hr""",
        """SELECT ds, hr, GROUPING(ds, hr) AS gid, COUNT(*) AS n
           FROM srcpart GROUP BY CUBE(ds, hr)
           ORDER BY gid, ds, hr""",
    )


def test_group_order_by_ordinal(spark, fixtures):
    """Hive groupby/orderby position aliases (hive.groupby.position.alias,
    HiveConf): GROUP BY 1 / ORDER BY 2 resolve to select-list positions in
    both engines."""
    _cmp(
        spark,
        fixtures,
        """SELECT substr(key, 1, 1) AS k1, COUNT(*) AS n
           FROM q_src GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 10""",
        """SELECT substr(key, 1, 1) AS k1, COUNT(*) AS n
           FROM src GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 10""",
    )


def test_union_remove_aggregate(spark, fixtures):
    """Hive union_remove_*.q family: aggregate over a UNION ALL of
    branches collapses correctly (Hive had a dedicated optimizer to
    remove the union stage; Catalyst plans it as one scan set)."""
    _cmp(
        spark,
        fixtures,
        """SELECT key, SUM(n) AS total FROM (
             SELECT key, COUNT(*) AS n FROM q_src GROUP BY key
             UNION ALL
             SELECT key, 1 AS n FROM q_src WHERE value > 'val_45'
           ) u GROUP BY key ORDER BY total DESC, key LIMIT 15""",
        """SELECT key, SUM(n) AS total FROM (
             SELECT key, COUNT(*) AS n FROM src GROUP BY key
             UNION ALL
             SELECT key, 1 AS n FROM src WHERE value > 'val_45'
           ) u GROUP BY key ORDER BY total DESC, key LIMIT 15""",
    )


def test_group_by_array_key(spark, fixtures):
    """Complex-type group keys (Hive groups by array/struct since
    HIVE-9project): arrays compare element-wise as grouping keys."""
    _cmp(
        spark,
        fixtures,
        """SELECT split(value, '_') AS parts, COUNT(*) AS n
           FROM q_src GROUP BY split(value, '_')
           ORDER BY n DESC, parts[1] LIMIT 10""",
        """SELECT string_split(value, '_') AS parts, COUNT(*) AS n
           FROM src GROUP BY string_split(value, '_')
           ORDER BY n DESC, parts[2] LIMIT 10""",
    )
