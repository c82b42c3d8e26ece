"""DDL/catalog + storage-format conformance (SURVEY §2.1/§2.14/§7.4)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from hive_spark import ddl

SCRATCH = "/tmp/hive_spark_ddl"


@pytest.fixture(autouse=True)
def _clean_tables(spark):
    yield
    for t in spark.catalog.listTables():
        if t.name.startswith("ddl_"):
            spark.sql(f"DROP TABLE IF EXISTS {t.name}")


def test_create_insert_select_partitioned(spark, sf_dir):
    loc = f"{SCRATCH}/part_tbl"
    shutil.rmtree(loc, ignore_errors=True)
    ddl.create_table(
        spark,
        "ddl_part",
        "o_orderkey BIGINT, o_totalprice DOUBLE, o_year INT",
        partition_by=("o_year",),
        location=loc,
    )
    from hive_spark.operators import views

    views(spark, sf_dir)
    spark.sql(
        """
        INSERT INTO ddl_part
        SELECT o_orderkey, o_totalprice, year(o_orderdate) AS o_year FROM orders
        """
    )
    # partition dirs exist on disk (Hive partition = one dir per value)
    years = {d for d in os.listdir(loc) if d.startswith("o_year=")}
    assert len(years) >= 5
    # partition pruning: scan of one year reads one partition
    plan_df = spark.sql("SELECT count(*) FROM ddl_part WHERE o_year = 1997")
    n_1997 = plan_df.collect()[0][0]
    assert n_1997 == spark.sql(
        "SELECT count(*) FROM orders WHERE year(o_orderdate) = 1997"
    ).collect()[0][0]


def test_ctas_and_analyze_feeds_cbo(spark, sf_dir):
    from hive_spark.operators import views

    views(spark, sf_dir)
    spark.sql("DROP TABLE IF EXISTS ddl_ctas")
    ddl.ctas(spark, "ddl_ctas", "SELECT n_nationkey, n_name FROM nation")
    assert spark.table("ddl_ctas").count() == 25
    ddl.analyze(spark, "ddl_ctas")
    stats = ddl.table_stats(spark, "ddl_ctas")
    assert "Statistics" in stats  # sizeInBytes + rowCount recorded
    assert "25 rows" in stats["Statistics"]


def test_msck_partition_repair(spark):
    """Partitions written out-of-band are invisible until MSCK repair
    (Hive: ql/.../ddl/misc/msck/)."""
    loc = f"{SCRATCH}/msck_tbl"
    shutil.rmtree(loc, ignore_errors=True)
    spark.sql("DROP TABLE IF EXISTS ddl_msck")
    df = spark.range(10).select(F.col("id"), F.lit(1).alias("p"))
    df.write.partitionBy("p").parquet(loc)  # out-of-band write
    ddl.create_table(
        spark, "ddl_msck", "id BIGINT, p INT", partition_by=("p",), location=loc
    )
    assert spark.table("ddl_msck").count() == 0  # catalog knows nothing
    ddl.repair_partitions(spark, "ddl_msck")
    assert spark.table("ddl_msck").count() == 10


def test_bucketed_join_elides_shuffle(spark, sf_dir):
    """Bucketed tables joined on the bucket key must not re-shuffle
    (Hive SMB join, SMBMapJoinOperator.java:58 — Spark elides the
    Exchange when bucketBy specs match)."""
    import contextlib
    import io

    from hive_spark.operators import views

    views(spark, sf_dir)
    for t in ("ddl_bkt_orders", "ddl_bkt_line"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    spark.table("orders").select("o_orderkey", "o_totalprice").write.bucketBy(
        8, "o_orderkey"
    ).sortBy("o_orderkey").saveAsTable("ddl_bkt_orders")
    spark.table("lineitem").select("l_orderkey", "l_quantity").write.bucketBy(
        8, "l_orderkey"
    ).sortBy("l_orderkey").saveAsTable("ddl_bkt_line")
    # force SMJ (small test tables would broadcast); at fact-fact scale
    # SMJ is what the planner picks anyway and bucketing elides its shuffle
    joined = spark.table("ddl_bkt_orders").hint("merge").join(
        spark.table("ddl_bkt_line"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    assert "SortMergeJoin" in plan
    assert "hashpartitioning" not in plan  # no shuffle on either side
    assert "Bucketed: true" in plan
    for t in ("ddl_bkt_orders", "ddl_bkt_line"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_format_round_trip(spark, sf_dir, fmt):
    """Storage-format matrix (Hive SerDes: ORC/Parquet/JSON/CSV/Text —
    SURVEY §2.1): write+read preserves values."""
    from hive_spark.operators import views

    t = views(spark, sf_dir)
    src = t["nation"].orderBy("n_nationkey")
    path = f"{SCRATCH}/fmt_{fmt}"
    shutil.rmtree(path, ignore_errors=True)
    back = ddl.round_trip(src, path, fmt).orderBy("n_nationkey")
    assert [tuple(r) for r in back.collect()] == [tuple(r) for r in src.collect()]


def test_text_format_with_regex_serde_pattern(spark, sf_dir):
    """Hive RegexSerDe analog: text format + regexp_extract projection."""
    from hive_spark.operators import views

    t = views(spark, sf_dir)
    path = f"{SCRATCH}/fmt_text"
    shutil.rmtree(path, ignore_errors=True)
    t["nation"].select(
        F.concat_ws("|", "n_nationkey", "n_name", "n_regionkey").alias("value")
    ).write.mode("overwrite").text(path)
    back = (
        spark.read.text(path)
        .select(
            F.regexp_extract("value", r"^(\d+)\|([^|]*)\|(\d+)$", 1)
            .cast("int")
            .alias("n_nationkey"),
            F.regexp_extract("value", r"^(\d+)\|([^|]*)\|(\d+)$", 2).alias("n_name"),
            F.regexp_extract("value", r"^(\d+)\|([^|]*)\|(\d+)$", 3)
            .cast("int")
            .alias("n_regionkey"),
        )
        .orderBy("n_nationkey")
    )
    assert [tuple(r) for r in back.collect()] == [
        tuple(r) for r in t["nation"].orderBy("n_nationkey").collect()
    ]


def test_show_describe_surface(spark, sf_dir):
    """SHOW TABLES / DESCRIBE — catalog introspection parity."""
    from hive_spark.operators import views

    views(spark, sf_dir)
    tables = {r.tableName for r in spark.sql("SHOW TABLES").collect()}
    assert {"nation", "orders", "lineitem"} <= tables
    desc = {r.col_name: r.data_type for r in spark.sql("DESCRIBE nation").collect()}
    assert desc["n_nationkey"] == "int"


def test_compaction_merges_small_files(spark, sf_dir):
    """Hive compactor analog: 32 tiny files -> 1, data unchanged."""
    from hive_spark.operators import views

    t = views(spark, sf_dir)
    path = f"{SCRATCH}/compact_tbl"
    shutil.rmtree(path, ignore_errors=True)
    t["orders"].repartition(32).write.parquet(path)
    n_before = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert n_before == 32
    before = t["orders"].count()
    n_files = ddl.compact(spark, path)
    n_after = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert n_after == n_files == 1
    assert spark.read.parquet(path).count() == before


def test_parameterized_sql(spark, sf_dir):
    """PREPARE/EXECUTE equivalent: named-parameter spark.sql (Hive
    PrepareStatementParser.g surface, SURVEY §2.14)."""
    from hive_spark.operators import views

    views(spark, sf_dir)
    df = spark.sql(
        "SELECT COUNT(*) AS n FROM orders WHERE o_orderstatus = :status",
        args={"status": "F"},
    )
    direct = spark.sql(
        "SELECT COUNT(*) AS n FROM orders WHERE o_orderstatus = 'F'"
    )
    assert df.collect() == direct.collect()


def test_analyze_stats_reach_cbo_costs(spark, sf_dir):
    """EXPLAIN COST must show real rowCount after ANALYZE — the signal
    Spark's CBO join reordering consumes (Hive: StatsRulesProcFactory
    selectivities over metastore column stats)."""
    from hive_spark.operators import views

    views(spark, sf_dir)
    spark.sql("DROP TABLE IF EXISTS ddl_stats")
    ddl.ctas(spark, "ddl_stats", "SELECT * FROM nation")
    ddl.analyze(spark, "ddl_stats")
    cost = "\n".join(
        r.plan for r in spark.sql(
            "EXPLAIN COST SELECT n_regionkey, COUNT(*) FROM ddl_stats GROUP BY 1"
        ).collect()
    )
    assert "rowCount=25" in cost.replace(" ", "").replace("25.0", "25"), cost[:500]


def test_load_data_into_partition(spark, sf_dir, tmp_path):
    """LOAD DATA INPATH ... INTO TABLE ... PARTITION: files land in the
    partition directory, the partition registers, rows become queryable
    (ref: LoadSemanticAnalyzer.java file-move contract)."""
    from hive_spark.operators import views

    views(spark, sf_dir)
    spark.sql("DROP TABLE IF EXISTS ddl_load_t")
    ddl.create_table(
        spark,
        "ddl_load_t",
        "n_nationkey bigint, n_name string, region string",
        partition_by=("region",),
    )
    # stage files in the table's parquet format (LOAD DATA converts nothing)
    staged = str(tmp_path / "staged")
    spark.table("nation").selectExpr(
        "n_nationkey", "n_name"
    ).limit(5).coalesce(1).write.parquet(staged)
    n = ddl.load_data(
        spark, staged, "ddl_load_t", partition={"region": "emea"}
    )
    assert n == 1
    got = spark.table("ddl_load_t")
    assert got.count() == 5
    assert got.select("region").distinct().collect()[0].region == "emea"
    # OVERWRITE replaces the partition's files, not appends
    ddl.load_data(
        spark, staged, "ddl_load_t", partition={"region": "emea"}, overwrite=True
    )
    assert spark.table("ddl_load_t").count() == 5
    # missing partition key in the spec is rejected
    import pytest as _pytest

    with _pytest.raises(ValueError, match="missing"):
        ddl.load_data(spark, staged, "ddl_load_t", partition={})


def test_export_import_round_trip(spark, sf_dir, tmp_path):
    """EXPORT TABLE -> IMPORT TABLE recreates a partitioned table with
    identical contents elsewhere (ref: ExportSemanticAnalyzer.java /
    ImportSemanticAnalyzer.java _metadata + data layout)."""
    from hive_spark.operators import views

    views(spark, sf_dir)
    spark.sql("DROP TABLE IF EXISTS ddl_exp_src")
    spark.sql("DROP TABLE IF EXISTS ddl_exp_copy")
    spark.sql(
        """CREATE TABLE ddl_exp_src USING parquet PARTITIONED BY (r)
           AS SELECT n_nationkey, n_name,
                     CAST(n_regionkey % 2 AS STRING) AS r
              FROM nation"""
    )
    dest = str(tmp_path / "export")
    ddl.export_table(spark, "ddl_exp_src", dest)
    assert os.path.exists(os.path.join(dest, "_metadata.json"))
    ddl.import_table(spark, dest, "ddl_exp_copy")
    a = sorted(tuple(x) for x in spark.table("ddl_exp_src").collect())
    b = sorted(tuple(x) for x in spark.table("ddl_exp_copy").collect())
    assert a == b and len(a) == 25


def test_alter_table_family(spark, sf_dir):
    """ALTER TABLE rename / add columns / tblproperties / drop partition —
    the DDL dispatch surface (Hive ql/.../ddl/table analyzers)."""
    from hive_spark.operators import views

    views(spark, sf_dir)
    for t in ("ddl_alter_a", "ddl_alter_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    ddl.create_table(
        spark, "ddl_alter_a", "k bigint, v string, p string", partition_by=("p",)
    )
    spark.sql(
        "INSERT INTO ddl_alter_a PARTITION (p='x') VALUES (1, 'a'), (2, 'b')"
    )
    spark.sql("INSERT INTO ddl_alter_a PARTITION (p='y') VALUES (3, 'c')")

    ddl.set_tblproperties(spark, "ddl_alter_a", {"comment.owner": "etl"})
    assert ddl.tblproperties(spark, "ddl_alter_a")["comment.owner"] == "etl"

    ddl.add_columns(spark, "ddl_alter_a", "extra int")
    # existing rows read the new column as NULL (schema evolution on read)
    assert (
        spark.table("ddl_alter_a").filter("extra IS NULL").count() == 3
    )

    ddl.drop_partition(spark, "ddl_alter_a", {"p": "y"}, purge=True)
    assert spark.table("ddl_alter_a").select("p").distinct().count() == 1

    ddl.rename_table(spark, "ddl_alter_a", "ddl_alter_b")
    assert spark.table("ddl_alter_b").count() == 2
    assert "ddl_alter_a" not in [
        t.name for t in spark.catalog.listTables()
    ]
