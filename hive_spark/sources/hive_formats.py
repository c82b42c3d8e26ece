"""Hive storage formats — RCFile, SequenceFile, TextFile, Avro — served
by the hive-serde jars BUNDLED with this Spark distribution.

Hive's format matrix (ref: ql/.../io/RCFileOutputFormat.java,
serde2/columnar/LazyBinaryColumnarSerDe.java, serde2/avro/) is reachable
from Spark through the Hive catalog: a session built with
``spark.sql.catalogImplementation=hive`` executes
``CREATE TABLE ... STORED AS RCFILE/SEQUENCEFILE/AVRO/TEXTFILE`` with the
real Hive SerDes — no extra packages. The catch is that the catalog
implementation is fixed per JVM at first-session creation, so the engine
keeps its default in-memory catalog (temp views over parquet — the driver
contract) and exposes these formats through an explicitly hive-catalog
session (``hive_session()``), exercised by a subprocess test.

SequenceFile is ALSO reachable without any catalog via the RDD bridge
(``saveAsSequenceFile`` / ``sequenceFile``) — one of the rare legitimate
RDD uses: Hadoop InputFormat plumbing that the DataFrame reader does not
expose.

At 100 TB none of these are the format you'd choose (columnar parquet/orc
with pushdown win by construction — see tests/test_ddl.py round trips);
they exist for READ COMPATIBILITY with data Hive already wrote.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

HIVE_TABLE_FORMATS = ("rcfile", "sequencefile", "textfile", "avro", "orc", "parquet")


def hive_session(
    app_name: str = "hive_spark_hivecat",
    master: str = "local[4]",
    warehouse: str = "/tmp/hive_spark_warehouse",
) -> SparkSession:
    """A session whose catalog is the Hive metastore (embedded Derby).
    Must be the FIRST session in its JVM: catalogImplementation is a
    static conf, which is why the engine's default session does not
    flip it (the driver talks to temp views, not the metastore)."""
    return (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.catalogImplementation", "hive")
        .config("spark.sql.warehouse.dir", warehouse)
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def _require_hive_catalog(spark: SparkSession) -> None:
    if spark.conf.get("spark.sql.catalogImplementation", "in-memory") != "hive":
        raise RuntimeError(
            "STORED AS needs a hive-catalog session (hive_session()); "
            "this session was built with the in-memory catalog"
        )


def write_stored_as(
    spark: SparkSession, df: DataFrame, table: str, fmt: str
) -> None:
    """CREATE TABLE <table> STORED AS <fmt> AS SELECT — Hive's write
    path for its own formats."""
    fmt = fmt.lower()
    if fmt not in HIVE_TABLE_FORMATS:
        raise ValueError(f"unknown Hive storage format: {fmt}")
    _require_hive_catalog(spark)
    tmp = f"_src_{table}"
    df.createOrReplaceTempView(tmp)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"CREATE TABLE {table} STORED AS {fmt.upper()} AS SELECT * FROM {tmp}")
    spark.catalog.dropTempView(tmp)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    _require_hive_catalog(spark)
    return spark.table(table)


def write_sequencefile_kv(df: DataFrame, path: str) -> None:
    """SequenceFile<K,V> via the RDD bridge (no catalog needed): first
    column is the key, second the value. Writable conversion is automatic
    for primitives/strings."""
    if len(df.columns) != 2:
        raise ValueError("sequencefile KV bridge expects exactly 2 columns")
    df.rdd.map(tuple).saveAsSequenceFile(path)


def read_sequencefile_kv(
    spark: SparkSession, path: str, key_col: str = "key", value_col: str = "value"
) -> DataFrame:
    rdd = spark.sparkContext.sequenceFile(path)
    return spark.createDataFrame(rdd, [key_col, value_col])
