"""Verbatim qtest execution: the reference's own .q files, unmodified.

tests/test_qtest_fixtures.py replays qtest SHAPES; this module goes
further and feeds the reference's actual clientpositive scripts
(read from /root/reference at test time — nothing is copied into the
repo) through `hqlscript.run_script`, proving the CliDriver on-ramp
executes real Hive test scripts end-to-end: dataset-header comments,
`set` commands (including Hive-only and deliberately-invalid ones),
EXPLAIN statements, `CREATE TABLE ... STORED AS`, Hive's FROM-first
`INSERT OVERWRITE` / bare `FROM ... SELECT`, MAPJOIN hints, and
CLUSTER BY.

Each script runs against synthesized src/srcpart catalog TABLES (the
canonical qtest fixtures — data/files/datasets/src/load.hive.sql), so
values differ from Hive's golden .q.out; correctness is instead
re-derived per script with a DuckDB oracle over the same parquet
(deterministic finals), or a row-count check where the script's LIMIT
cuts an order tie (Hive masks those with SORT_QUERY_RESULTS too).
"""

import os
import shutil

import duckdb
import pytest
from pyspark.sql import functions as F

from hive_spark.hqlscript import LOAD_DATA_BASES, run_script

REF_ROOT = "/root/reference/ql/src"

QDIR = "/root/reference/ql/src/test/queries/clientpositive"
SCRATCH = os.path.expanduser("~/.hive_spark_scratch/qverbatim")  # /tmp is tmpfiles-purged mid-run on this host (r9)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(QDIR), reason="reference qtest corpus not present"
)


@pytest.fixture(scope="module")
def qtables(spark):
    """The canonical qtest catalog (src, srcpart, src1, cbo_t1-t3, part,
    lineitem, srcbucket, alltypesorc) built by the shared fixture lib;
    the scripts CREATE/INSERT their own dest tables next to them."""
    from tests.qtest_fixture_lib import build_qtest_fixtures

    from tests.qtest_fixture_lib import FIXTURE_TABLES

    build_qtest_fixtures(spark, "qverbatim", SCRATCH)
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW src AS SELECT key, value FROM "
        f"read_parquet('{wh}/src/*.parquet')"
    )
    con.execute(
        "CREATE VIEW srcpart AS SELECT * FROM "
        f"read_parquet('{wh}/srcpart/*/*/*.parquet',"
        " hive_partitioning = true)"
    )
    yield con
    spark.catalog.setCurrentDatabase("default")
    for t in FIXTURE_TABLES:
        spark.sql(f"DROP TABLE IF EXISTS `default`.`{t}`")


def _run(spark, fname):
    text = open(os.path.join(QDIR, fname)).read()
    return run_script(spark, text)


def _match(df, con, oracle_sql):
    got = sorted(tuple(map(str, r)) for r in df.collect())
    want = sorted(
        tuple(map(str, r)) for r in con.execute(oracle_sql).fetchall()
    )
    assert got == want, f"{got[:3]} != {want[:3]} ({len(got)}/{len(want)})"


def test_having_q(spark, qtables):
    """clientpositive/having.q — HAVING over alias / unselected
    aggregate; final statement: keys with count(value) >= 4."""
    res = _run(spark, "having.q")
    _match(
        res.results[-1], qtables,
        "SELECT key, COUNT(value) FROM src GROUP BY key"
        " HAVING count(value) >= 4",
    )


def test_groupby1_q(spark, qtables):
    """clientpositive/groupby1.q — FROM-first INSERT OVERWRITE with
    string-arithmetic aggregation into a typed dest table (and an
    invalid fs.default.name SET the runner must shrug off)."""
    res = _run(spark, "groupby1.q")
    _match(
        res.results[-1], qtables,
        "SELECT CAST(key AS INT), SUM(CAST(substr(value, 5) AS DOUBLE))"
        " FROM src GROUP BY CAST(key AS INT)",
    )


def test_join1_q(spark, qtables):
    """clientpositive/join1.q — self-join INSERT OVERWRITE into a
    STORED AS TEXTFILE dest, then read back."""
    res = _run(spark, "join1.q")
    _match(
        res.results[-1], qtables,
        "SELECT CAST(s1.key AS INT), s2.value FROM src s1"
        " JOIN src s2 ON s1.key = s2.key",
    )


def test_union3_q(spark, qtables):
    """clientpositive/union3.q — 4-arm UNION ALL with CLUSTER BY inside
    a subquery, inserted and read back: exactly {1,2,3,4}."""
    res = _run(spark, "union3.q")
    got = sorted(r[0] for r in res.results[-1].collect())
    assert got == [1, 2, 3, 4]


def test_mapjoin_distinct_q(spark, qtables):
    """clientpositive/mapjoin_distinct.q — Hive's bare FROM-first
    SELECT with a MAPJOIN hint and partition predicates in the join
    condition; DISTINCT+ORDER makes the LIMIT deterministic."""
    res = _run(spark, "mapjoin_distinct.q")
    _match(
        res.results[-1], qtables,
        "SELECT DISTINCT c.value AS cvalue FROM srcpart c JOIN srcpart d"
        " ON c.key = d.key AND c.ds = '2008-04-08' AND d.ds = '2008-04-08'"
        " ORDER BY cvalue LIMIT 10",
    )


def test_groupby_ppd_q(spark, qtables):
    """clientpositive/groupby_ppd.q — predicate pushed through an
    ORDER+LIMIT subquery; the LIMIT cuts an order tie, so assert the
    row count (Hive masks this with SORT_QUERY_RESULTS)."""
    res = _run(spark, "groupby_ppd.q")
    n = res.results[-1].count()
    assert 0 < n <= 10


def test_order2_q(spark, qtables):
    """clientpositive/order2.q — same ORDER+LIMIT subquery family."""
    res = _run(spark, "order2.q")
    assert 0 < res.results[-1].count() <= 10


def test_semijoin4_q(spark, qtables):
    """clientpositive/semijoin4.q — 87-column DECIMAL/CHAR/VARCHAR DDL
    plus an EXPLAIN of a windowed IN-subquery join over the (empty)
    tables: a pure parser/analyzer workout."""
    res = _run(spark, "semijoin4.q")
    assert res.results  # the EXPLAIN produced a plan
    spark.sql("DROP TABLE IF EXISTS table_1")
    spark.sql("DROP TABLE IF EXISTS table_18")


# Additional verbatim scripts: (file, expected final row count). Counts
# are deterministic functions of the synthesized fixtures (500-row src
# with one duplicated key, 4-partition srcpart) — a change here means
# the runner or the engine changed behavior, not the data.
SMOKE_SCRIPTS = [
    ("auto_join0.q", 1),        # crossed sums under auto map-join
    ("auto_join1.q", 1),        # map-join INSERT + checksum
    ("groupby5.q", 499),        # per-key sums via INSERT OVERWRITE
    ("groupby6.q", 10),         # DISTINCT substr bucket
    ("join2.q", 257),           # 3-way self-join on key arithmetic
    ("join3.q", 506),           # 3-way same-key self-join
    ("union20.q", 14),          # union of joins with mixed widths
    ("order.q", 10),            # ORDER BY asc/desc + LIMIT
    ("sort.q", 500),            # full-table SORT BY
    ("nullgroup.q", 1),         # aggregates over empty group input
    ("limit_pushdown2.q", 20),  # 21 statements of grouped top-k
    ("ppd_gby.q", 221),         # predicate pushed through GROUP BY
    ("groupby_position.q", 499),  # GROUP BY ordinal positions
    ("subquery_exists.q", 1),   # EXISTS/IN correlated subqueries,
                                # tables created+dropped in-script
    ("groupby_distinct_samekey.q", 6),  # sum(DISTINCT) same-key
    # windowing family: scripts CREATE their over10k table with ROW
    # FORMAT DELIMITED and LOAD DATA the reference's 9,999-row file —
    # exercising the SQL-text delimited-serde + LOAD DATA on-ramp
    ("distinct_windowing.q", 50),   # DISTINCT first_value over windows
    ("windowing_ntile.q", 100),     # ntile/percent_rank/cume_dist
    # cbo family over the reference's own cbo_t1-t3 dataset files
    ("cbo_simple_select.q", 1),     # 40 result statements
    ("cbo_union.q", 774),
    ("cbo_gby.q", 2),
    ("cbo_semijoin.q", 4),
    ("cbo_limit.q", 1),
    ("cbo_udf_udaf.q", 2),
    ("windowing_windowspec.q", 45),  # named WINDOW clauses, range
                                     # frames, tstz cast over over10k
]

# Known Hive-extension divergences (documented, not papered over): the
# rest of windowing.q uses negative RANGE frame bounds and DISTINCT in
# windows, ptf.q ranks ordered only by the PTF spec (not the OVER
# clause), and leadlag.q calls lag() with no OVER — Spark rejects all
# four forms; the engine's own windowing surface covers the ANSI
# equivalents (window_* registry queries, ext_matchpath).



@pytest.mark.parametrize(
    "fname,last_rows", SMOKE_SCRIPTS, ids=[f for f, _ in SMOKE_SCRIPTS]
)
def test_verbatim_smoke(spark, qtables, fname, last_rows):
    """The script executes end-to-end through run_script and its final
    statement's materialized result has the fixture-determined size
    (CliDriver-eager results: in-script DROPs cannot invalidate them)."""
    res = _run(spark, fname)
    assert res.results, f"{fname} produced no results"
    assert res.results[-1].count() == last_rows
