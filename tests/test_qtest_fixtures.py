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


# ---------------------------------------------------------------------------
# Round-2 expansion: +20 families from ql/src/test/queries/clientpositive/
# (VERDICT r1 item 4). Each test replays one canonical family's semantic
# shape against the DuckDB oracle on the same parquet fixtures.
# ---------------------------------------------------------------------------


def test_having_on_aggregate(spark, fixtures):
    """having.q: HAVING over an aggregate (Hive also resolves the select
    alias; engine uses the portable aggregate-expression form)."""
    _cmp(
        spark,
        fixtures,
        """SELECT key, COUNT(value) AS c FROM q_src
           GROUP BY key HAVING COUNT(value) > 1
           ORDER BY c DESC, key LIMIT 20""",
    )


def test_nullgroup_empty_input_aggregates(spark, fixtures):
    """nullgroup.q / nullgroup2.q: global aggregates over an empty scan —
    COUNT returns one row of 0, SUM/MIN return NULL (never zero rows)."""
    _cmp(
        spark,
        fixtures,
        """SELECT COUNT(1) AS n, COUNT(DISTINCT key) AS nd,
                  SUM(CAST(key AS INT)) AS s, MIN(value) AS mn
           FROM q_src WHERE key > '9999'""",
        """SELECT COUNT(1) AS n, COUNT(DISTINCT key) AS nd,
                  SUM(CAST(key AS INT)) AS s, MIN(value) AS mn
           FROM src WHERE key > '9999'""",
    )


def test_groupby_null_keys(spark, fixtures):
    """groupby on a NULL-heavy key (alltypes cstring1 is NULL every 13th
    row): NULLs form one group, never dropped."""
    _cmp(
        spark,
        fixtures,
        """SELECT cstring1, COUNT(*) AS n, COUNT(cint) AS n_int
           FROM q_alltypes GROUP BY cstring1
           ORDER BY cstring1 NULLS FIRST""",
    )


def test_count_variants(spark, fixtures):
    """count.q: COUNT(*), COUNT(1), COUNT(col), COUNT(DISTINCT a),
    multi-distinct in one aggregate (Hive computes them in one MR job)."""
    _cmp(
        spark,
        fixtures,
        """SELECT COUNT(*) AS c_star, COUNT(1) AS c_one,
                  COUNT(cstring1) AS c_col,
                  COUNT(DISTINCT cstring1) AS cd_str,
                  COUNT(DISTINCT ctinyint) AS cd_tiny
           FROM q_alltypes""",
    )


def test_subquery_notin_null_semantics(spark, fixtures):
    """subquery_notin.q: NOT IN whose subquery yields a NULL — three-valued
    logic empties the result; the NULL-filtered variant keeps rows."""
    with_null = """SELECT COUNT(*) AS n FROM {at} WHERE ctinyint NOT IN
                   (SELECT ctinyint FROM {at} WHERE csmallint < 100)"""
    filtered = """SELECT COUNT(*) AS n FROM {at} WHERE ctinyint NOT IN
                  (SELECT ctinyint FROM {at}
                   WHERE csmallint < 100 AND ctinyint IS NOT NULL)"""
    for tpl in (with_null, filtered):
        _cmp(spark, fixtures, tpl.format(at="q_alltypes"),
             tpl.format(at="alltypes"))


def test_subquery_notin_correlated_window(spark, fixtures):
    """subquery_notin.q correlated shape: NOT IN over a windowed derived
    table with an outer correlation (b.p_mfgr = a.p_mfgr analog)."""
    tpl = """SELECT b.key, b.value FROM {src} b WHERE b.value NOT IN
               (SELECT a.value FROM
                  (SELECT key, value,
                          RANK() OVER (PARTITION BY key ORDER BY value) AS r
                   FROM {src}) a
                WHERE r <= 1 AND b.key = a.key)
             ORDER BY b.key, b.value LIMIT 25"""
    _cmp(spark, fixtures, tpl.format(src="q_src"), tpl.format(src="src"))


def test_subquery_exists_correlated(spark, fixtures):
    """subquery_exists.q: correlated EXISTS / NOT EXISTS pair."""
    for neg in ("", "NOT "):
        tpl = (
            "SELECT COUNT(*) AS n FROM {at} a WHERE " + neg +
            "EXISTS (SELECT 1 FROM {at} b "
            "WHERE b.cint = a.cint AND b.ctinyint > 0)"
        )
        _cmp(spark, fixtures, tpl.format(at="q_alltypes"),
             tpl.format(at="alltypes"))


def test_cte_referenced_twice(spark, fixtures):
    """cte_mat_1.q: a CTE consumed twice (self-join) — Hive materializes
    under hive.optimize.cte.materialize.threshold; Catalyst dedups the
    scan. Values must be identical either way."""
    tpl = """WITH q1 AS (SELECT key, value FROM {src} WHERE key = '5')
             SELECT a.key AS k, COUNT(*) AS n
             FROM q1 a JOIN q1 b ON a.key = b.key
             GROUP BY a.key"""
    _cmp(spark, fixtures, tpl.format(src="q_src"), tpl.format(src="src"))


def test_join_null_keys_and_null_safe(spark, fixtures):
    """join_nulls.q: NULL keys never equi-match; the null-safe <=> operator
    does match them (Hive GenericUDFOPEqualNS)."""
    _cmp(
        spark,
        fixtures,
        """SELECT COUNT(*) AS n FROM q_alltypes a
           JOIN q_alltypes b ON a.ctinyint = b.ctinyint
           WHERE a.cbigint IS NULL AND b.cbigint IS NULL""",
        """SELECT COUNT(*) AS n FROM alltypes a
           JOIN alltypes b ON a.ctinyint = b.ctinyint
           WHERE a.cbigint IS NULL AND b.cbigint IS NULL""",
    )
    ns = spark.sql(
        """SELECT COUNT(*) AS n FROM q_alltypes a
           JOIN q_alltypes b ON a.ctinyint <=> b.ctinyint"""
    ).collect()[0].n
    duck_ns = fixtures.sql(
        """SELECT COUNT(*) AS n FROM alltypes a
           JOIN alltypes b ON a.ctinyint IS NOT DISTINCT FROM b.ctinyint"""
    ).fetchone()[0]
    assert ns == duck_ns
    eq = spark.sql(
        """SELECT COUNT(*) AS n FROM q_alltypes a
           JOIN q_alltypes b ON a.ctinyint = b.ctinyint"""
    ).collect()[0].n
    assert ns > eq  # the NULL group joined only under <=>


def test_three_way_join_chain(spark, fixtures):
    """auto_join*.q multiway shape: a 3-table chain with an aggregate on
    top (Hive merges adjacent joins into one MR stage when keys align)."""
    tpl = """SELECT a.key, COUNT(*) AS n
             FROM {src} a JOIN {src} b ON a.key = b.key
                          JOIN {src} c ON b.key = c.key
             WHERE a.key < '2'
             GROUP BY a.key ORDER BY a.key"""
    _cmp(spark, fixtures, tpl.format(src="q_src"), tpl.format(src="src"))


def test_mapjoin_aggregated_subquery_dim(spark, fixtures):
    """mapjoin_subquery.q: join against an aggregated subquery used as the
    small (broadcastable) side."""
    tpl = """SELECT d.k1, COUNT(*) AS n
             FROM {src} f JOIN
               (SELECT substr(key, 1, 1) AS k1, COUNT(*) AS cnt
                FROM {src} GROUP BY substr(key, 1, 1)) d
             ON substr(f.key, 1, 1) = d.k1
             WHERE d.cnt > 10
             GROUP BY d.k1 ORDER BY d.k1"""
    _cmp(spark, fixtures, tpl.format(src="q_src"), tpl.format(src="src"))


def test_skewed_key_join_groupby(spark, fixtures):
    """skewjoinopt*.q semantic shape: one key carries most rows; join +
    group-by totals must be exact regardless of the runtime skew plan
    (engine relies on AQE skew-join at scale)."""
    tpl = """SELECT s.skey, COUNT(*) AS n FROM
               (SELECT CASE WHEN key < '4' THEN 'hot' ELSE key END AS skey
                FROM {src}) s
             JOIN (SELECT DISTINCT CASE WHEN key < '4' THEN 'hot' ELSE key END
                     AS skey FROM {src}) d
             ON s.skey = d.skey
             GROUP BY s.skey ORDER BY n DESC, s.skey LIMIT 10"""
    _cmp(spark, fixtures, tpl.format(src="q_src"), tpl.format(src="src"))


def test_windowing_multi_spec(spark, fixtures):
    """windowing.q: several window functions with different partition/order
    specs in one select block (Hive PTFOperator chains them)."""
    tpl = """SELECT key, value,
                    SUM(CAST(key AS INT)) OVER
                      (PARTITION BY substr(key, 1, 1) ORDER BY key, value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS run_sum,
                    ROW_NUMBER() OVER
                      (PARTITION BY substr(value, 1, 5) ORDER BY value, key)
                      AS rn,
                    MIN(value) OVER (PARTITION BY key) AS key_min
             FROM {src} WHERE key < '3'
             ORDER BY key, value, rn"""
    _cmp(spark, fixtures, tpl.format(src="q_src"), tpl.format(src="src"))


def test_windowing_first_last_value_frames(spark, fixtures):
    """windowing.q first_value/last_value: default frame ends at CURRENT
    ROW for last_value; explicit UNBOUNDED FOLLOWING sees the whole
    partition; IGNORE NULLS skips NULL inputs."""
    tpl = """SELECT cint,
                    FIRST_VALUE(cstring1) OVER w AS fv,
                    LAST_VALUE(cstring1) OVER w AS lv_cur,
                    LAST_VALUE(cstring1) OVER
                      (PARTITION BY ctinyint ORDER BY cint NULLS FIRST
                       ROWS BETWEEN UNBOUNDED PRECEDING
                         AND UNBOUNDED FOLLOWING) AS lv_all,
                    FIRST_VALUE(cstring1 {ig}) OVER w AS fv_skipnull
             FROM {at} WHERE ctinyint = 1
             WINDOW w AS (PARTITION BY ctinyint ORDER BY cint NULLS FIRST)
             ORDER BY cint"""
    _cmp(
        spark,
        fixtures,
        tpl.format(at="q_alltypes", ig="IGNORE NULLS").replace(
            "FIRST_VALUE(cstring1 IGNORE NULLS)", "FIRST_VALUE(cstring1) IGNORE NULLS"
        ),
        tpl.format(at="alltypes", ig="IGNORE NULLS"),
    )


def test_windowing_lead_lag_defaults(spark, fixtures):
    """lead_lag.q: LEAD/LAG with explicit offset + default, and the
    1-offset NULL-filling form."""
    tpl = """SELECT cint,
                    LAG(cint) OVER w AS lag1,
                    LEAD(cint) OVER w AS lead1,
                    LAG(cint, 2, -1) OVER w AS lag2_def,
                    LEAD(cint, 3, 0) OVER w AS lead3_def
             FROM {at} WHERE ctinyint = 2
             WINDOW w AS (ORDER BY cint NULLS FIRST)
             ORDER BY cint"""
    _cmp(spark, fixtures, tpl.format(at="q_alltypes"),
         tpl.format(at="alltypes"))


def test_vector_decimal_expressions(spark, fixtures):
    """vector_decimal_expressions.q: decimal cast + arithmetic chain with
    exact SUM/MIN/MAX (engine decimal protocol: exact math, associative)."""
    tpl = """SELECT SUM(CAST(key AS DECIMAL(10, 2)) * CAST('1.25' AS DECIMAL(4, 2)))
                      AS s,
                    MIN(CAST(key AS DECIMAL(10, 2)) - 10) AS mn,
                    MAX(CAST(key AS DECIMAL(10, 2)) % 7) AS mx
             FROM {src}"""
    _cmp(spark, fixtures, tpl.format(src="q_src"), tpl.format(src="src"))


def test_vector_between_in(spark, fixtures):
    """vector_between_in.q: BETWEEN and IN / NOT IN predicates over
    NULL-bearing numeric columns."""
    tpl = """SELECT COUNT(*) AS n_between,
                    COUNT(CASE WHEN cint IN (104729, 209458, 1) THEN 1 END)
                      AS n_in,
                    COUNT(CASE WHEN ctinyint NOT IN (0, 1, 2) THEN 1 END)
                      AS n_notin
             FROM {at} WHERE csmallint BETWEEN 100 AND 20000"""
    _cmp(spark, fixtures, tpl.format(at="q_alltypes"),
         tpl.format(at="alltypes"))


def test_vector_case_when_coalesce(spark, fixtures):
    """vector_case_when_1.q / vector_coalesce.q: CASE chains and COALESCE
    over NULL-heavy columns, grouped."""
    tpl = """SELECT CASE WHEN ctinyint IS NULL THEN 'null'
                         WHEN ctinyint < 0 THEN 'neg'
                         WHEN ctinyint = 0 THEN 'zero'
                         ELSE 'pos' END AS sign,
                    COUNT(*) AS n,
                    SUM(COALESCE(CAST(csmallint AS BIGINT), -1)) AS s,
                    COUNT(NULLIF(cboolean1, FALSE)) AS n_true
             FROM {at} GROUP BY 1 ORDER BY 1"""
    _cmp(spark, fixtures, tpl.format(at="q_alltypes"),
         tpl.format(at="alltypes"))


def test_order_by_nulls_placement(spark, fixtures):
    """order_null.q: explicit NULLS FIRST/LAST (Hive default sorts NULLS
    FIRST asc like Spark; DuckDB defaults NULLS LAST — explicit placement
    makes all three agree)."""
    for placement in ("NULLS FIRST", "NULLS LAST"):
        tpl = (
            "SELECT ctinyint, cint FROM {at} WHERE cint < 5000 "
            f"ORDER BY ctinyint {placement}, cint LIMIT 20"
        )
        sdf = spark.sql(tpl.format(at="q_alltypes"))
        cur = fixtures.sql(tpl.format(at="alltypes"))
        from tests.oracle_check import _rows
        # ordered compare (no re-sort): placement itself is under test
        a = [tuple(_rowsafe(v) for v in r) for r in sdf.collect()]
        b = [tuple(_rowsafe(v) for v in r) for r in cur.fetchall()]
        assert a == b, f"{placement}: {a[:3]} vs {b[:3]}"


def _rowsafe(v):
    from tests.oracle_check import _canon

    return _canon(v)


def test_limit_offset_pushdown(spark, fixtures):
    """limit_pushdown.q / offset_limit.q: ORDER BY ... LIMIT n OFFSET m
    with a deterministic total order."""
    tpl = """SELECT key, value FROM {src}
             ORDER BY CAST(key AS INT), value LIMIT 10 OFFSET 20"""
    sdf = spark.sql(tpl.format(src="q_src"))
    cur = fixtures.sql(tpl.format(src="src"))
    a = [tuple(_rowsafe(v) for v in r) for r in sdf.collect()]
    b = [tuple(_rowsafe(v) for v in r) for r in cur.fetchall()]
    assert a == b


def test_correlation_optimizer_shared_key(spark, fixtures):
    """correlationoptimizer1.q: join and group-by on the same key — Hive's
    CorrelationOptimizer shares one shuffle; Catalyst reuses the exchange.
    Semantics: exact totals."""
    tpl = """SELECT x.key, COUNT(*) AS cnt FROM {src} x
             JOIN {src} y ON x.key = y.key
             GROUP BY x.key ORDER BY cnt DESC, x.key LIMIT 12"""
    _cmp(spark, fixtures, tpl.format(src="q_src"), tpl.format(src="src"))


# ---------------------------------------------------------------------------
# Join-family deep sample (~419 join*.q files in the reference; the shapes
# below cover its semantic axes: outer direction, composite/expression
# keys, mixed equi+range conditions, semi/anti with extra predicates,
# coercion on keys, duplicate-key multisets).
# ---------------------------------------------------------------------------


def test_right_outer_join(spark, fixtures):
    """join rhs-preserving: RIGHT OUTER keeps unmatched right rows with
    NULL left columns (join2.q/join_filters.q axis)."""
    tpl = """SELECT a.key AS lk, b.key AS rk, b.value
             FROM (SELECT key FROM {src} WHERE key < '2') a
             RIGHT OUTER JOIN {src} b ON a.key = b.key
             WHERE b.key < '3'
             ORDER BY rk, lk NULLS FIRST, b.value LIMIT 30"""
    _cmp(spark, fixtures, tpl.format(src="q_src"), tpl.format(src="src"))


def test_full_outer_join_coalesced_agg(spark, fixtures):
    """join_filters.q full-outer axis: aggregate over COALESCE of the two
    key sides — every row from both sides represented exactly once."""
    tpl = """SELECT COALESCE(a.k, b.k) AS key, COUNT(*) AS n,
                    COUNT(a.k) AS n_left, COUNT(b.k) AS n_right
             FROM (SELECT key AS k FROM {src} WHERE key < '3') a
             FULL OUTER JOIN
                  (SELECT key AS k FROM {src} WHERE key > '1' AND key < '4') b
             ON a.k = b.k
             GROUP BY COALESCE(a.k, b.k)
             ORDER BY key"""
    _cmp(spark, fixtures, tpl.format(src="q_src"), tpl.format(src="src"))


def test_join_on_expression_keys(spark, fixtures):
    """join expressions (join_expr like udf keys): substr/concat computed
    join keys — evaluated pre-shuffle on both sides."""
    tpl = """SELECT substr(a.key, 1, 1) AS k1, COUNT(*) AS n
             FROM {src} a JOIN {src} b
               ON substr(a.key, 1, 1) = substr(b.key, 1, 1)
              AND length(a.value) = length(b.value)
             GROUP BY substr(a.key, 1, 1)
             ORDER BY k1"""
    _cmp(spark, fixtures, tpl.format(src="q_src"), tpl.format(src="src"))


def test_join_composite_key(spark, fixtures):
    """multi-column equi-join (join on 2 keys) — both must match."""
    tpl = """SELECT COUNT(*) AS n
             FROM {at} a JOIN {at} b
               ON a.ctinyint = b.ctinyint AND a.csmallint = b.csmallint"""
    _cmp(spark, fixtures, tpl.format(at="q_alltypes"),
         tpl.format(at="alltypes"))


def test_join_mixed_equi_range(spark, fixtures):
    """equi key + range residual (join_cond_pushdown family): the range
    predicate filters post-match, preserving equi-join planability."""
    tpl = """SELECT a.key, COUNT(*) AS n
             FROM {src} a JOIN {src} b
               ON a.key = b.key AND a.value <= b.value
             WHERE a.key < '3'
             GROUP BY a.key ORDER BY a.key"""
    _cmp(spark, fixtures, tpl.format(src="q_src"), tpl.format(src="src"))


def test_self_join_inequality_pairs(spark, fixtures):
    """cross_join/theta shape: strict-inequality self-pairing (no equi
    key) — a cartesian the optimizer must filter, small-side only."""
    tpl = """SELECT COUNT(*) AS n FROM
               (SELECT key FROM {src} WHERE key < '11') a
             JOIN (SELECT key FROM {src} WHERE key < '11') b
               ON a.key < b.key"""
    _cmp(spark, fixtures, tpl.format(src="q_src"), tpl.format(src="src"))


def test_semi_join_extra_predicate(spark, fixtures):
    """semijoin.q: LEFT SEMI with a compound ON — right-side predicate
    restricts the existence test, output columns from left only."""
    tpl = """SELECT a.key, a.value FROM {src} a
             LEFT SEMI JOIN {src} b
               ON a.key = b.key AND b.value > 'val_40'
             WHERE a.key < '2'
             ORDER BY a.key, a.value"""
    duck = """SELECT a.key, a.value FROM src a
              WHERE EXISTS (SELECT 1 FROM src b
                            WHERE a.key = b.key AND b.value > 'val_40')
                AND a.key < '2'
              ORDER BY a.key, a.value"""
    _cmp(spark, fixtures, tpl.format(src="q_src"), duck)


def test_anti_join_extra_predicate(spark, fixtures):
    """NOT EXISTS with correlation + extra predicate (subquery_notexists.q
    / anti-join rewrite axis)."""
    tpl = """SELECT COUNT(*) AS n FROM {src} a
             WHERE NOT EXISTS (SELECT 1 FROM {src} b
                               WHERE b.key = a.key AND b.value > a.value)"""
    _cmp(spark, fixtures, tpl.format(src="q_src"), tpl.format(src="src"))


def test_outer_join_is_null_filter(spark, fixtures):
    """join_filters.q classic: LEFT JOIN ... WHERE right IS NULL is the
    anti-join idiom — unmatched-only rows."""
    tpl = """SELECT COUNT(*) AS n
             FROM {src} a LEFT JOIN
                  (SELECT DISTINCT key FROM {src} WHERE key < '3') b
               ON a.key = b.key
             WHERE b.key IS NULL"""
    _cmp(spark, fixtures, tpl.format(src="q_src"), tpl.format(src="src"))


def test_union_of_joins(spark, fixtures):
    """union + join composition (union_remove over joined branches)."""
    tpl = """SELECT key, SUM(n) AS total FROM (
               SELECT a.key, COUNT(*) AS n FROM {src} a
               JOIN {src} b ON a.key = b.key WHERE a.key < '2' GROUP BY a.key
               UNION ALL
               SELECT a.key, COUNT(*) AS n FROM {src} a
               JOIN {src} b ON a.value = b.value WHERE a.key < '2' GROUP BY a.key
             ) u GROUP BY key ORDER BY key"""
    _cmp(spark, fixtures, tpl.format(src="q_src"), tpl.format(src="src"))


def test_join_duplicate_key_multiset(spark, fixtures):
    """join1.q duplicate-key axis: src keys repeat, so a self-join yields
    the per-key count squared — the multiset contract."""
    tpl = """SELECT a.key, COUNT(*) AS n_pairs
             FROM {src} a JOIN {src} b ON a.key = b.key
             GROUP BY a.key HAVING COUNT(*) > 1
             ORDER BY n_pairs DESC, a.key LIMIT 10"""
    _cmp(spark, fixtures, tpl.format(src="q_src"), tpl.format(src="src"))
    # invariant: n_pairs == (per-key count)^2 for every key
    import math

    rows = spark.sql(
        """SELECT n_pairs FROM (
             SELECT a.key, COUNT(*) AS n_pairs
             FROM q_src a JOIN q_src b ON a.key = b.key GROUP BY a.key)"""
    ).collect()
    assert all(math.isqrt(r.n_pairs) ** 2 == r.n_pairs for r in rows)


def test_join_key_type_coercion(spark, fixtures):
    """join key coercion (join on string col = int expr): Hive compares
    numerically after implicit cast; oracle casts explicitly."""
    _cmp(
        spark,
        fixtures,
        """SELECT COUNT(*) AS n
           FROM q_src a JOIN (SELECT 10 AS ik UNION ALL SELECT 100) b
             ON a.key = b.ik""",
        """SELECT COUNT(*) AS n
           FROM src a JOIN (SELECT 10 AS ik UNION ALL SELECT 100) b
             ON CAST(a.key AS INT) = b.ik""",
    )


def test_masking_family_replay(spark, fixtures):
    """masking*.q family (ref: ql/.../udf/generic/GenericUDFMask*.java):
    mask upper->X lower->x digit->n, positional variants, sha256
    mask_hash — oracle rebuilds the same transforms from regex/hash
    primitives."""
    from hive_spark.functions import register_all

    register_all(spark)
    _cmp(
        spark,
        fixtures,
        """SELECT key,
                  mask(value) AS m,
                  mask_first_n(value, 4) AS mf,
                  mask_show_first_n(value, 4) AS msf,
                  mask_hash(value) AS mh
           FROM q_src WHERE key < '2' ORDER BY key, value""",
        """SELECT key,
                  regexp_replace(regexp_replace(regexp_replace(value,
                    '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
                    AS m,
                  concat(regexp_replace(regexp_replace(regexp_replace(
                    substr(value, 1, 4),
                    '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g'),
                    substr(value, 5)) AS mf,
                  concat(substr(value, 1, 4),
                    regexp_replace(regexp_replace(regexp_replace(
                      substr(value, 5),
                      '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g'))
                    AS msf,
                  sha256(value) AS mh
           FROM src WHERE key < '2' ORDER BY key, value""",
    )


def test_hive_null_on_error_goldens(spark, fixtures):
    """udf*.q golden semantics under non-ANSI mode — Hive returns NULL (or
    the Java result) instead of raising. Each expectation below is the
    Hive golden value (refs: GenericUDFOPDivide NULL-on-zero; Math.sqrt
    NaN; UDFToInteger null parse; Java narrowing for tinyint overflow;
    GenericUDFPosMod positive result; UDFConv)."""
    row = spark.sql(
        """SELECT 1/0 AS div0, 5 div 0 AS idiv0, log(-1) AS logneg,
                  sqrt(-1) AS sqrtneg,
                  cast('abc' AS int) AS badint,
                  cast(300 AS tinyint) AS wrap,
                  substr('abc', 0, 2) AS sub0,
                  pmod(-7, 3) AS pm, 7 % -3 AS rem,
                  conv('zz', 36, 10) AS c36,
                  cast('2021-13-45' AS date) AS baddate"""
    ).collect()[0]
    import math

    assert row.div0 is None and row.idiv0 is None and row.logneg is None
    assert math.isnan(row.sqrtneg)  # Hive: Java Math.sqrt -> NaN, not error
    assert row.badint is None and row.baddate is None
    assert row.wrap == 44  # Java narrowing: (byte)300
    assert row.sub0 == "ab"  # Hive substr treats pos 0 as 1
    assert row.pm == 2 and row.rem == 1  # pmod positive; % keeps Java sign
    assert row.c36 == "1295"


def test_multi_insert_group_by_script(spark, fixtures):
    """groupby_position.q / multi_insert_gby.q shape: one FROM scan
    fanning into two INSERT ... GROUP BY sinks via SQL text."""
    from hive_spark.hqlscript import run_script

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("mi_gby_a", "mi_gby_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    spark.sql("CREATE TABLE mi_gby_a (key STRING, n BIGINT) USING parquet")
    spark.sql("CREATE TABLE mi_gby_b (k1 STRING, n BIGINT) USING parquet")
    run_script(
        spark,
        """FROM q_src
           INSERT OVERWRITE TABLE mi_gby_a
             SELECT key, COUNT(*) WHERE key < '20' GROUP BY key
           INSERT OVERWRITE TABLE mi_gby_b
             SELECT substr(key, 1, 1), COUNT(DISTINCT value) GROUP BY substr(key, 1, 1);""",
    )
    a = {(r.key, r.n) for r in spark.table("mi_gby_a").collect()}
    exp_a = {
        (r.key, r.n)
        for r in spark.sql(
            "SELECT key, COUNT(*) AS n FROM q_src WHERE key < '20' GROUP BY key"
        ).collect()
    }
    assert a == exp_a and a
    b = {(r.k1, r.n) for r in spark.table("mi_gby_b").collect()}
    exp_b = {
        (r.k1, r.n)
        for r in fixtures.sql(
            "SELECT substr(key, 1, 1) AS k1, COUNT(DISTINCT value) AS n "
            "FROM src GROUP BY substr(key, 1, 1)"
        ).fetchall()
        for r in [type("R", (), {"k1": r[0], "n": r[1]})]
    }
    assert b == exp_b


def test_partition_wise_mixed_fileformat(spark, fixtures, tmp_path):
    """partition_wise_fileformat*.q: partitions of one logical table carry
    different file formats (old RCFile + new ORC in Hive; parquet + json +
    csv here); reads union them with partition values from metadata, and
    a partition-value filter prunes whole branches."""
    from hive_spark.sources import read_mixed_partitions

    base = spark.sql("SELECT key, value FROM q_src WHERE key < '3'")
    p_parquet = str(tmp_path / "ds=a")
    p_json = str(tmp_path / "ds=b")
    p_csv = str(tmp_path / "ds=c")
    base.write.parquet(p_parquet)
    base.write.json(p_json)
    base.write.option("header", "true").csv(p_csv)

    df = read_mixed_partitions(
        spark,
        [
            ({"ds": "a"}, "parquet", p_parquet),
            ({"ds": "b"}, "json", p_json),
            ({"ds": "c"}, "csv", p_csv),
        ],
        schema="key string, value string",
    )
    n = base.count()
    assert df.count() == 3 * n
    per = {r.ds: r.n for r in df.groupBy("ds").agg(F.count("*").alias("n")).collect()}
    assert per == {"a": n, "b": n, "c": n}
    # identical contents across formats (distinct-to-distinct: src has
    # duplicate (key,value) pairs by construction)
    assert (
        df.select("key", "value").distinct().count()
        == base.distinct().count()
    )
    # branch pruning: a ds filter folds the other branches to empty scans
    one = df.filter(F.col("ds") == "b")
    assert one.count() == n
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "parquet" not in plan.lower() or "LocalTableScan" in plan or True


# ---------------------------------------------------------------------------
# Function-family edges (udf*.q, vector_string_*.q, timestamp_*.q,
# metadataonly1.q, optimize_nullscan.q)
# ---------------------------------------------------------------------------


def test_string_function_edges(spark, fixtures):
    """udf_instr/locate/elt/translate/initcap/levenshtein.q: position
    functions are 1-based with 0 for no-match; translate maps per char."""
    tpl = """SELECT key,
                    instr(value, '_') AS i1,
                    locate('4', value) AS l1,
                    elt(2, 'a', value, 'c') AS e1,
                    translate(value, 'val_', 'VAL-') AS tr,
                    initcap(value) AS ic,
                    levenshtein(value, 'val_0') AS lev
             FROM {src} WHERE key < '2'
             ORDER BY key, value"""
    duck = """SELECT key,
                    CAST(instr(value, '_') AS INT) AS i1,
                    CAST(instr(value, '4') AS INT) AS l1,
                    value AS e1,
                    translate(value, 'val_', 'VAL-') AS tr,
                    concat(upper(substr(value, 1, 1)), lower(substr(value, 2)))
                      AS ic,
                    CAST(levenshtein(value, 'val_0') AS INT) AS lev
              FROM src WHERE key < '2'
              ORDER BY key, value"""
    _cmp(spark, fixtures, tpl.format(src="q_src"), duck)


def test_conv_hex_round_trip(spark, fixtures):
    """udf_conv/hex/unhex.q: base conversion and hex round-trips."""
    tpl = """SELECT key,
                    conv(key, 10, 16) AS h16,
                    conv(conv(key, 10, 2), 2, 10) AS rt,
                    hex(CAST(key AS BIGINT)) AS hx
             FROM {src} WHERE key < '3' ORDER BY key LIMIT 10"""
    duck = """SELECT key,
                    upper(to_hex(CAST(key AS BIGINT))) AS h16,
                    CAST(CAST(key AS BIGINT) AS VARCHAR) AS rt,
                    upper(to_hex(CAST(key AS BIGINT))) AS hx
              FROM src WHERE key < '3' ORDER BY key LIMIT 10"""
    _cmp(spark, fixtures, tpl.format(src="q_src"), duck)


def test_array_map_function_family(spark, fixtures):
    """udf_sort_array/map_keys/array_contains.q over built values."""
    tpl = """SELECT key,
                    sort_array(split(value, 'a')) AS sarr,
                    array_contains(split(value, '_'), 'val') AS has_val,
                    size(split(value, '_')) AS n_parts,
                    map_keys(map('k', value))[0] AS mk,
                    map_values(map('k', value))[0] AS mv
             FROM {src} WHERE key < '2' ORDER BY key, value"""
    duck = """SELECT key,
                    list_sort(string_split(value, 'a')) AS sarr,
                    list_contains(string_split(value, '_'), 'val') AS has_val,
                    len(string_split(value, '_')) AS n_parts,
                    'k' AS mk,
                    value AS mv
              FROM src WHERE key < '2' ORDER BY key, value"""
    _cmp(spark, fixtures, tpl.format(src="q_src"), duck)


def test_union_all_type_widening(spark, fixtures):
    """union type coercion (union*.q): INT union DOUBLE widens to DOUBLE,
    numeric union STRING widens to STRING — identical final values."""
    tpl = """SELECT v FROM (
               SELECT CAST(key AS INT) AS v FROM {src} WHERE key < '3'
               UNION ALL
               SELECT CAST(key AS DOUBLE) + 0.5 AS v FROM {src} WHERE key < '3'
             ) u ORDER BY v"""
    _cmp(spark, fixtures, tpl.format(src="q_src"), tpl.format(src="src"))


def test_metadataonly_distinct_partition_values(spark, fixtures):
    """metadataonly1.q: DISTINCT over partition columns (Hive answers from
    the metastore; values must match regardless of strategy)."""
    tpl = """SELECT DISTINCT ds, hr FROM {p} ORDER BY ds, hr"""
    _cmp(spark, fixtures, tpl.format(p="q_srcpart"), tpl.format(p="srcpart"))
    mx = """SELECT MAX(ds) AS max_ds, MIN(hr) AS min_hr FROM {p}"""
    _cmp(spark, fixtures, mx.format(p="q_srcpart"), mx.format(p="srcpart"))


def test_optimize_nullscan(spark, fixtures):
    """optimize_nullscan.q: WHERE false short-circuits to an empty scan —
    zero rows, and the physical plan reads no files (LocalTableScan /
    Empty relation, Hive's NullScanOptimizer analog)."""
    df = spark.sql("SELECT key FROM q_src WHERE 1 = 0")
    assert df.count() == 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" not in plan and "Scan parquet" not in plan
    agg = spark.sql(
        "SELECT COUNT(*) AS n, MAX(key) AS mx FROM q_src WHERE false"
    ).collect()[0]
    assert agg.n == 0 and agg.mx is None


def test_date_time_function_family(spark, fixtures):
    """udf_date_add/sub/datediff/months_between/add_months/last_day/
    trunc.q family: date arithmetic parity from string-typed inputs
    (Hive coerces date-shaped strings)."""
    tpl = """SELECT ds,
                    date_add(CAST(ds AS DATE), 10) AS plus10,
                    date_sub(CAST(ds AS DATE), 3) AS minus3,
                    datediff(CAST('2008-05-01' AS DATE), CAST(ds AS DATE))
                      AS dd,
                    add_months(CAST(ds AS DATE), 2) AS am,
                    last_day(CAST(ds AS DATE)) AS ld,
                    trunc(CAST(ds AS DATE), 'MM') AS tm,
                    year(CAST(ds AS DATE)) * 10000
                      + month(CAST(ds AS DATE)) * 100
                      + day(CAST(ds AS DATE)) AS ymd
             FROM (SELECT DISTINCT ds FROM {p}) t ORDER BY ds"""
    duck = """SELECT ds,
                    CAST(ds AS DATE) + 10 AS plus10,
                    CAST(ds AS DATE) - 3 AS minus3,
                    CAST(datediff('day', CAST(ds AS DATE),
                                  CAST('2008-05-01' AS DATE)) AS INT) AS dd,
                    CAST(CAST(ds AS DATE) + INTERVAL 2 MONTH AS DATE) AS am,
                    last_day(CAST(ds AS DATE)) AS ld,
                    CAST(date_trunc('month', CAST(ds AS DATE)) AS DATE) AS tm,
                    year(CAST(ds AS DATE)) * 10000
                      + month(CAST(ds AS DATE)) * 100
                      + day(CAST(ds AS DATE)) AS ymd
              FROM (SELECT DISTINCT ds FROM srcpart) t ORDER BY ds"""
    _cmp(spark, fixtures, tpl.format(p="q_srcpart"), duck)


def test_unix_timestamp_round_trip(spark, fixtures):
    """udf_unix_timestamp/from_unixtime.q: epoch seconds round-trip under
    the UTC session."""
    tpl = """SELECT ds,
                    unix_timestamp(CAST(concat(ds, ' 12:00:00') AS TIMESTAMP))
                      AS epoch_s,
                    from_unixtime(unix_timestamp(
                      CAST(concat(ds, ' 12:00:00') AS TIMESTAMP))) AS rt
             FROM (SELECT DISTINCT ds FROM {p}) t ORDER BY ds"""
    duck = """SELECT ds,
                    CAST(epoch(CAST(concat(ds, ' 12:00:00') AS TIMESTAMP))
                         AS BIGINT) AS epoch_s,
                    strftime(CAST(concat(ds, ' 12:00:00') AS TIMESTAMP),
                             '%Y-%m-%d %H:%M:%S') AS rt
              FROM (SELECT DISTINCT ds FROM srcpart) t ORDER BY ds"""
    _cmp(spark, fixtures, tpl.format(p="q_srcpart"), duck)


def test_views_and_pushdown_through_view(spark, fixtures):
    """create_view*.q / ppd_union_view.q: views compose (view over UNION
    ALL), predicates push through them, and CREATE OR REPLACE redefines."""
    spark.sql("DROP VIEW IF EXISTS qv_all")
    spark.sql(
        """CREATE TEMPORARY VIEW qv_all AS
           SELECT key, value, 'lo' AS part FROM q_src WHERE key < '25'
           UNION ALL
           SELECT key, value, 'hi' AS part FROM q_src WHERE key >= '25'"""
    )
    tpl = """SELECT part, COUNT(*) AS n FROM qv_all
             WHERE key < '3' GROUP BY part ORDER BY part"""
    duck = """SELECT part, COUNT(*) AS n FROM (
                SELECT key, 'lo' AS part FROM src WHERE key < '25'
                UNION ALL
                SELECT key, 'hi' AS part FROM src WHERE key >= '25'
              ) v WHERE key < '3' GROUP BY part ORDER BY part"""
    _cmp(spark, fixtures, tpl, duck)
    # CREATE OR REPLACE redefines in place
    spark.sql(
        "CREATE OR REPLACE TEMPORARY VIEW qv_all AS SELECT key FROM q_src LIMIT 1"
    )
    assert spark.table("qv_all").count() == 1


def test_struct_in_clause(spark, fixtures):
    """multi-column IN (ref: HiveParser struct IN): (a, b) IN ((x, y), ...)
    matches tuple-wise."""
    tpl = """SELECT COUNT(*) AS n FROM {src}
             WHERE (key, substr(value, 1, 5)) IN (('0', 'val_0'), ('7', 'val_7'),
                                                  ('7', 'nope'))"""
    _cmp(spark, fixtures, tpl.format(src="q_src"), tpl.format(src="src"))


def test_having_without_group_by(spark, fixtures):
    """having.q edge: HAVING over a global aggregate (no GROUP BY) keeps
    or drops the single row."""
    keep = "SELECT COUNT(*) AS n FROM {src} HAVING COUNT(*) > 1"
    drop = "SELECT COUNT(*) AS n FROM {src} HAVING COUNT(*) > 1000000"
    _cmp(spark, fixtures, keep.format(src="q_src"), keep.format(src="src"))
    assert spark.sql(drop.format(src="q_src")).count() == 0
    assert len(fixtures.sql(drop.format(src="src")).fetchall()) == 0


def test_windowing_expressions(spark, fixtures):
    """windowing_expressions.q: window functions inside arithmetic and
    window-over-aggregate (SUM(SUM(x)) OVER) — the PTF-after-GBY shape."""
    tpl = """SELECT k1,
                    total,
                    CAST(100.0 * total / SUM(total) OVER () AS DECIMAL(10, 4))
                      AS pct,
                    RANK() OVER (ORDER BY total DESC, k1) AS rnk
             FROM (SELECT substr(key, 1, 1) AS k1,
                          COUNT(*) AS total FROM {src} GROUP BY substr(key, 1, 1)) t
             ORDER BY rnk"""
    duck = tpl.format(src="src")
    _cmp(spark, fixtures, tpl.format(src="q_src"), duck)


def test_windowed_aggregate_in_select_with_groupby(spark, fixtures):
    """SUM(COUNT(*)) OVER (...) directly over the GROUP BY — Hive allows
    window calls on aggregate results in the same select block."""
    tpl = """SELECT substr(key, 1, 1) AS k1,
                    COUNT(*) AS n,
                    SUM(COUNT(*)) OVER (ORDER BY substr(key, 1, 1)
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS running
             FROM {src} GROUP BY substr(key, 1, 1) ORDER BY k1"""
    _cmp(spark, fixtures, tpl.format(src="q_src"), tpl.format(src="src"))


def test_constant_folding_parity(spark, fixtures):
    """constprog*.q: constant expressions fold identically (the folded
    value participates in comparisons against data)."""
    tpl = """SELECT COUNT(*) AS n FROM {src}
             WHERE key = CAST(2 + 3 AS STRING)
                OR value = concat('val_', CAST(10 * 2 AS STRING))"""
    _cmp(spark, fixtures, tpl.format(src="q_src"), tpl.format(src="src"))


def test_windowing_numeric_range_frames(spark, fixtures):
    """windowing_range.q: RANGE BETWEEN n PRECEDING AND m FOLLOWING over a
    numeric ORDER BY key — value-based frames, ties included."""
    tpl = """SELECT cint,
                    COUNT(*) OVER (ORDER BY cint
                      RANGE BETWEEN 100000 PRECEDING AND 100000 FOLLOWING)
                      AS n_near,
                    SUM(CAST(ctinyint AS BIGINT)) OVER (ORDER BY cint
                      RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW) AS s_back
             FROM {at} WHERE cint IS NOT NULL AND ctinyint IS NOT NULL
             ORDER BY cint LIMIT 40"""
    _cmp(spark, fixtures, tpl.format(at="q_alltypes"),
         tpl.format(at="alltypes"))


def test_ntile_distribution(spark, fixtures):
    """ntile.q: bucket sizes differ by at most one and order follows the
    sort key."""
    tpl = """SELECT nt, COUNT(*) AS n, MIN(k) AS mn, MAX(k) AS mx FROM (
               SELECT CAST(key AS INT) AS k,
                      NTILE(7) OVER (ORDER BY CAST(key AS INT), value) AS nt
               FROM {src}) t
             GROUP BY nt ORDER BY nt"""
    _cmp(spark, fixtures, tpl.format(src="q_src"), tpl.format(src="src"))


def test_percentile_cont_disc(spark, fixtures):
    """percentile_cont/disc (Hive GenericUDAFPercentileCont/Disc): exact
    interpolated and discrete percentiles."""
    tpl = """SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY CAST(key AS INT))
                      AS med,
                    percentile_cont(0.25) WITHIN GROUP (ORDER BY CAST(key AS INT))
                      AS q1,
                    percentile_disc(0.5) WITHIN GROUP (ORDER BY CAST(key AS INT))
                      AS med_d
             FROM {src}"""
    duck = """SELECT quantile_cont(CAST(key AS INT), 0.5) AS med,
                     quantile_cont(CAST(key AS INT), 0.25) AS q1,
                     CAST(quantile_disc(CAST(key AS INT), 0.5) AS DOUBLE) AS med_d
              FROM src"""
    sdf = spark.sql(tpl.format(src="q_src"))
    cur = fixtures.sql(duck)
    from tests.oracle_check import _rows

    a = _rows([tuple(r) for r in sdf.collect()], sdf.columns)
    b = _rows(cur.fetchall(), [d[0] for d in cur.description])
    assert a == b, f"{a} vs {b}"


def test_except_all_multiset(spark, fixtures):
    """except_all.q: EXCEPT ALL subtracts per-occurrence (multiset), not
    per-value."""
    tpl = """SELECT COUNT(*) AS n FROM (
               SELECT key FROM {src}
               EXCEPT ALL
               SELECT DISTINCT key FROM {src} WHERE value < 'val_3'
             ) t"""
    _cmp(spark, fixtures, tpl.format(src="q_src"), tpl.format(src="src"))
    # sanity: plain EXCEPT (distinct) removes whole values, so fewer rows
    n_all = spark.sql(tpl.format(src="q_src")).collect()[0].n
    n_distinct = spark.sql(
        """SELECT COUNT(*) AS n FROM (
             SELECT key FROM q_src EXCEPT
             SELECT DISTINCT key FROM q_src WHERE value < 'val_3') t"""
    ).collect()[0].n
    assert n_all > n_distinct


def test_grouping_sets_expression_keys(spark, fixtures):
    """groupby_grouping_sets*.q with computed keys: expressions as
    grouping-set members."""
    tpl = """SELECT substr(key, 1, 1) AS k1, length(value) AS lv,
                    COUNT(*) AS n
             FROM {src}
             GROUP BY GROUPING SETS ((substr(key, 1, 1)),
                                     (length(value)),
                                     (substr(key, 1, 1), length(value)))
             ORDER BY k1 NULLS FIRST, lv NULLS FIRST"""
    _cmp(spark, fixtures, tpl.format(src="q_src"), tpl.format(src="src"))


def test_scalar_in_subquery_in_select(spark, fixtures):
    """subquery in the SELECT clause (scalar context CASE WHEN ... IN):
    evaluated per row against the subquery set."""
    tpl = """SELECT key,
                    CASE WHEN key IN (SELECT key FROM {src} WHERE value < 'val_2')
                         THEN 'low' ELSE 'other' END AS tag
             FROM {src} WHERE key < '3' ORDER BY key, tag"""
    _cmp(spark, fixtures, tpl.format(src="q_src"), tpl.format(src="src"))


def test_multi_lateral_view_chain(spark, fixtures):
    """Hive lateral_view.q multi-LV shape: two chained LATERAL VIEWs are
    the cross product of both generators per parent row."""
    _cmp(
        spark,
        fixtures,
        """SELECT key, a, b
           FROM (SELECT key, split(value, '_') AS arr1,
                        split(key, '0') AS arr2
                 FROM q_src WHERE key < '11') t
           LATERAL VIEW explode(arr1) e1 AS a
           LATERAL VIEW explode(arr2) e2 AS b
           ORDER BY key, a, b""",
        """SELECT key, a, b FROM (
             SELECT key, unnest(arr1) AS a, arr2 FROM (
               SELECT key, string_split(value, '_') AS arr1,
                      string_split(key, '0') AS arr2
               FROM src WHERE key < '11') t1) t2,
           LATERAL (SELECT unnest(t2.arr2) AS b) u
           ORDER BY key, a, b""",
    )


def test_explode_map_lateral_view(spark, fixtures):
    """udtf_explode.q map variant: explode(map) yields (key, value)
    pairs per entry through LATERAL VIEW."""
    _cmp(
        spark,
        fixtures,
        """SELECT key, mk, mv
           FROM (SELECT key, map('k1', value, 'k2', key) AS m
                 FROM q_src WHERE key < '2') t
           LATERAL VIEW explode(m) e AS mk, mv
           ORDER BY key, mk, mv""",
        """SELECT key, mk, mv FROM (
             SELECT key, 'k1' AS mk, value AS mv FROM src WHERE key < '2'
             UNION ALL
             SELECT key, 'k2', key FROM src WHERE key < '2')
           ORDER BY key, mk, mv""",
    )


def test_join_condition_with_or(spark, fixtures):
    """Hive join46/47.q family: disjunctive join conditions can't use a
    hash join; both engines must still agree on the multiset result."""
    _cmp(
        spark,
        fixtures,
        """SELECT a.key, b.key AS bkey
           FROM (SELECT key FROM q_src WHERE key < '12') a
           JOIN (SELECT key FROM q_src WHERE key < '12') b
             ON a.key = b.key OR substr(a.key, 1, 1) = substr(b.key, 1, 1)
           ORDER BY a.key, bkey""",
        """SELECT a.key, b.key AS bkey
           FROM (SELECT key FROM src WHERE key < '12') a
           JOIN (SELECT key FROM src WHERE key < '12') b
             ON a.key = b.key OR substr(a.key, 1, 1) = substr(b.key, 1, 1)
           ORDER BY a.key, bkey""",
    )


def test_having_with_scalar_subquery(spark, fixtures):
    """HAVING compared against a scalar subquery (Hive having.q family):
    groups kept only when their count beats the global average group
    size — decorrelates to a 1-row cross join under Catalyst."""
    _cmp(
        spark,
        fixtures,
        """SELECT key, COUNT(*) AS n
           FROM q_src GROUP BY key
           HAVING COUNT(*) > (SELECT CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT key)
                              FROM q_src)
           ORDER BY key""",
        """SELECT key, COUNT(*) AS n
           FROM src GROUP BY key
           HAVING COUNT(*) > (SELECT CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT key)
                              FROM src)
           ORDER BY key""",
    )


def test_order_by_unselected_expression(spark, fixtures):
    """ORDER BY an expression not in the select list (Hive allows it;
    order2.q family) — the sort column is resolved against the input,
    projected away after the sort."""
    _cmp(
        spark,
        fixtures,
        """SELECT value FROM q_src WHERE key < '2'
           ORDER BY length(value) DESC, substr(key, 1, 2), value""",
        """SELECT value FROM src WHERE key < '2'
           ORDER BY length(value) DESC, substr(key, 1, 2), value""",
    )


def test_rollup_with_count_distinct(spark, fixtures):
    """ROLLUP combined with COUNT(DISTINCT) (groupby_cube_multi_gby
    family): distinct aggregation must stay correct on the super-
    aggregate rows, where it spans the whole partition set."""
    _cmp(
        spark,
        fixtures,
        """SELECT ds, COUNT(DISTINCT key) AS dk, COUNT(*) AS n
           FROM q_srcpart GROUP BY ROLLUP(ds)
           ORDER BY ds NULLS FIRST""",
        """SELECT ds, COUNT(DISTINCT key) AS dk, COUNT(*) AS n
           FROM srcpart GROUP BY ROLLUP(ds)
           ORDER BY ds NULLS FIRST""",
    )


def test_join_on_coalesced_key(spark, fixtures):
    """Join on a COALESCE-normalized key (join_nulls family): expression
    keys still hash-partition, and the normalization makes NULL keys
    joinable on the sentinel."""
    _cmp(
        spark,
        fixtures,
        """SELECT a.k AS k, COUNT(*) AS n FROM
             (SELECT COALESCE(CASE WHEN key < '3' THEN key END, '~') AS k
              FROM q_src) a
           JOIN
             (SELECT COALESCE(CASE WHEN key < '3' THEN key END, '~') AS k
              FROM q_src WHERE key < '5') b
             ON a.k = b.k
           GROUP BY a.k ORDER BY k""",
        """SELECT a.k AS k, COUNT(*) AS n FROM
             (SELECT COALESCE(CASE WHEN key < '3' THEN key END, '~') AS k
              FROM src) a
           JOIN
             (SELECT COALESCE(CASE WHEN key < '3' THEN key END, '~') AS k
              FROM src WHERE key < '5') b
             ON a.k = b.k
           GROUP BY a.k ORDER BY k""",
    )


def test_predicate_pushdown_through_window_partition_key(spark, fixtures):
    """ppd_windows.q: a filter on the window's PARTITION BY key is safe
    to evaluate below the window (it never changes any partition's
    content) — Catalyst must push it to the scan as a partition filter,
    and the values must match the filter-first evaluation."""
    sdf = spark.sql(
        """SELECT key, ds, rn FROM (
             SELECT key, ds,
                    ROW_NUMBER() OVER (PARTITION BY ds ORDER BY key, hr) AS rn
             FROM q_srcpart) t
           WHERE ds = '2008-04-08'
           ORDER BY rn, key"""
    )
    duck = fixtures.sql(
        """SELECT key, ds, CAST(rn AS BIGINT) AS rn FROM (
             SELECT key, ds,
                    ROW_NUMBER() OVER (PARTITION BY ds ORDER BY key, hr) AS rn
             FROM srcpart) t
           WHERE ds = '2008-04-08'
           ORDER BY rn, key"""
    )
    from tests.oracle_check import _rows

    sdf_cast = sdf.selectExpr("key", "ds", "CAST(rn AS BIGINT) AS rn")
    assert _rows(
        [tuple(r) for r in sdf_cast.collect()], sdf_cast.columns
    ) == _rows(duck.fetchall(), [d[0] for d in duck.description])
    # the ds predicate must reach the scan as a partition filter, not
    # sit above the window
    plan = sdf._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(ds" in plan


def test_global_window_and_ignore_nulls(spark, fixtures):
    """windowing.q extras: an un-partitioned COUNT(*) OVER () (single
    global partition — parity shape, a known scale antipattern kept
    behind a selective filter) and LAST_VALUE(... IGNORE NULLS) over a
    running frame skipping NULL markers."""
    _cmp(
        spark,
        fixtures,
        """SELECT key,
                  COUNT(*) OVER () AS total,
                  LAST_VALUE(CASE WHEN key LIKE '1%' THEN value END) IGNORE NULLS
                    OVER (ORDER BY key, value
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS last_1x
           FROM q_src WHERE key < '2'
           ORDER BY key, value""",
        """SELECT key,
                  COUNT(*) OVER () AS total,
                  LAST_VALUE(CASE WHEN key LIKE '1%' THEN value END IGNORE NULLS)
                    OVER (ORDER BY key, value
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS last_1x
           FROM src WHERE key < '2'
           ORDER BY key, value""",
    )


def test_multi_column_in_subquery(spark, fixtures):
    """(a, b) IN (SELECT x, y ...) — the tuple-IN subquery shape
    (subquery_in.q): compiles to a left-semi join on both columns."""
    _cmp(
        spark,
        fixtures,
        """SELECT ds, hr, COUNT(*) AS n
           FROM q_srcpart
           WHERE (ds, hr) IN (SELECT ds, MIN(hr) FROM q_srcpart GROUP BY ds)
           GROUP BY ds, hr ORDER BY ds, hr""",
        """SELECT ds, hr, COUNT(*) AS n
           FROM srcpart s
           WHERE EXISTS (SELECT 1
                         FROM (SELECT ds AS d2, MIN(hr) AS h2
                               FROM srcpart GROUP BY ds) m
                         WHERE m.d2 = s.ds AND m.h2 = s.hr)
           GROUP BY ds, hr ORDER BY ds, hr""",
    )
