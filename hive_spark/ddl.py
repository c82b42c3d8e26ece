"""DDL/catalog surface: CREATE TABLE (+partitioning/bucketing/format),
CTAS, ANALYZE, partition repair (MSCK), SHOW/DESCRIBE.

Hive's DDL family is dispatched via DDLSemanticAnalyzerFactory (ref:
ql/src/java/org/apache/hadoop/hive/ql/ddl/ — CREATE/ALTER/DROP/SHOW/MSCK);
in the Spark engine each maps to `spark.sql` DDL text or `spark.catalog`
calls. This module provides the programmatic API; SQL-text DDL works
directly through `spark.sql` (verified in tests/test_ddl.py).

Scale notes: partitioned layout (one dir per value — Hive's metastore
Partition model, thrift struct Partition, hive_metastore.thrift:684) is
what enables partition pruning at 100 TB; bucketing (CLUSTERED BY ... INTO
n BUCKETS, ReduceSinkOperator bucket hash ref ql/.../exec/
ReduceSinkOperator.java:60) pre-shuffles fact tables once so repeated
joins/aggregations on the bucket key skip their exchange. ANALYZE feeds
Spark CBO (join reordering needs rowCount/size stats like Hive's
StatsRulesProcFactory selectivities).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

STORAGE_FORMATS = ("parquet", "orc", "json", "csv", "text")


def create_table(
    spark: SparkSession,
    name: str,
    schema: str,
    fmt: str = "parquet",
    partition_by: tuple[str, ...] = (),
    location: str | None = None,
    bucket_spec: tuple[int, tuple[str, ...]] | None = None,
) -> None:
    """CREATE TABLE ... USING fmt [PARTITIONED BY] [CLUSTERED BY ... INTO n
    BUCKETS] [LOCATION] (Hive: STORED AS orc/parquet/textfile etc.)."""
    parts = [f"CREATE TABLE IF NOT EXISTS {name} ({schema}) USING {fmt}"]
    if partition_by:
        parts.append(f"PARTITIONED BY ({', '.join(partition_by)})")
    if bucket_spec:
        n, cols = bucket_spec
        parts.append(f"CLUSTERED BY ({', '.join(cols)}) INTO {n} BUCKETS")
    if location:
        parts.append(f"LOCATION '{location}'")
    spark.sql(" ".join(parts))


def ctas(spark: SparkSession, name: str, query: str, fmt: str = "parquet") -> None:
    """CREATE TABLE AS SELECT (Hive CTAS, HiveParser.g query alternatives)."""
    spark.sql(f"CREATE TABLE {name} USING {fmt} AS {query}")


def analyze(spark: SparkSession, name: str, columns: bool = True) -> None:
    """ANALYZE TABLE ... COMPUTE STATISTICS [FOR ALL COLUMNS] — feeds CBO
    (Hive: StatsTask/ColumnStatsUpdateTask, ql/.../exec/StatsTask.java)."""
    spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")
    if columns:
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR ALL COLUMNS")


def repair_partitions(spark: SparkSession, name: str) -> None:
    """MSCK REPAIR TABLE equivalent: discover partition dirs written
    outside the catalog (Hive Msck, ql/.../ddl/misc/msck/)."""
    spark.sql(f"MSCK REPAIR TABLE {name}")


def table_stats(spark: SparkSession, name: str) -> dict[str, str]:
    """DESCRIBE EXTENDED summary → dict (rowCount/sizeInBytes when
    ANALYZE has run)."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
    out: dict[str, str] = {}
    for r in rows:
        if r.col_name and r.data_type:
            out[r.col_name.strip()] = str(r.data_type).strip()
    return out


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_cols: list[str] | None = None,
) -> int:
    """Small-file compaction (Hive: ALTER TABLE ... CONCATENATE + the
    background compactor, ref ql/src/java/org/apache/hadoop/hive/ql/txn/
    compactor/Compactor.java): rewrite a parquet dir into
    ceil(total_bytes / target) files. Returns the new file count.

    The 100 TB story: streaming/micro-batch sinks accumulate small files
    that wreck scan parallelism and NameNode/listing costs; periodic
    compaction keeps file sizes near the scan split size so one task
    reads one file."""
    import math

    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    staging = path.rstrip("/") + "._compact"
    writer = df.repartition(n_files).write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(staging)
    import shutil

    shutil.rmtree(path)
    shutil.move(staging, path)
    return n_files


def round_trip(
    df: DataFrame, path: str, fmt: str, read_options: dict | None = None
) -> DataFrame:
    """Write+read through a storage format (Hive SerDe matrix: ORC/Parquet/
    JSON/CSV/Text — ref SURVEY §2.1 file formats). CSV/JSON lose type
    precision by design; caller supplies schema-bearing read options."""
    df.write.mode("overwrite").format(fmt).options(
        **({"header": "true"} if fmt == "csv" else {})
    ).save(path)
    reader = df.sparkSession.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true").schema(df.schema)
    elif fmt == "json":
        reader = reader.schema(df.schema)
    if read_options:
        reader = reader.options(**read_options)
    return reader.load(path)
