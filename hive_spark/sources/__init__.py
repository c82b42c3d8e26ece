"""Source/sink registry — Hive's storage-handler + SerDe matrix, Spark-side.

Hive routes every format/connector through StorageHandler + SerDe pairs
(SURVEY §2.1: ORC/Parquet/Avro/Text/CSV/JSON SerDes; Kafka/JDBC/Iceberg/
HBase/Kudu handlers). Spark's DataSource V2 already owns that layer, so
the engine's job is a uniform dispatch with honest capability reporting:
formats bundled in this environment work; connectors whose packages or
services are absent raise a clear error at OPEN time (not a confusing
ClassNotFound at execution), matching the rule that absent integrations
are gated, not faked.

Usage:
    src = open_source(spark, "parquet", path="/data/t")       # DataFrame
    src = open_source(spark, "jdbc", url=..., dbtable=...)    # if driver jar
    open_source(spark, "kafka", ...)  # raises UnsupportedSourceError here
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# formats the baked-in Spark distribution serves (verified by tests/ddl)
FILE_FORMATS = ("parquet", "orc", "json", "csv", "text")

# connector -> (required jar/class hint, Hive storage-handler ref)
CONNECTORS = {
    "kafka": (
        "org.apache.spark.sql.kafka010.KafkaSourceProvider",
        "kafka-handler/src/java/org/apache/hadoop/hive/kafka/KafkaStorageHandler.java:71",
    ),
    "jdbc": (
        "java.sql.Driver (vendor jar)",
        "jdbc-handler/",
    ),
    "iceberg": (
        "org.apache.iceberg.spark.SparkCatalog",
        "iceberg/iceberg-handler/.../HiveIcebergStorageHandler.java:232",
    ),
    # NOTE: avro (and rcfile/sequencefile/textfile) ARE served through the
    # bundled hive-serde jars via a hive-catalog session — see
    # hive_formats.py. This entry gates only the spark-avro DataSource
    # (`spark.read.format("avro")`), whose connector jar is absent.
    "avro": (
        "org.apache.spark.sql.avro.AvroFileFormat",
        "serde/src/java/org/apache/hadoop/hive/serde2/avro/",
    ),
}


class UnsupportedSourceError(RuntimeError):
    pass


def _provider_available(spark: SparkSession, class_name: str) -> bool:
    if "(" in class_name:  # descriptive hint, not a class
        return False
    try:
        spark._jvm.java.lang.Class.forName(class_name)  # noqa: SLF001
        return True
    except Exception:
        return False


def open_source(spark: SparkSession, fmt: str, **options) -> DataFrame:
    """Open a batch source uniformly; stream=True callers use
    open_stream. File formats take path=...; connectors take their
    standard Spark options."""
    fmt = fmt.lower()
    if fmt in FILE_FORMATS:
        path = options.pop("path")
        return spark.read.format(fmt).options(**options).load(path)
    if fmt in CONNECTORS:
        clazz, hive_ref = CONNECTORS[fmt]
        if not _provider_available(spark, clazz):
            raise UnsupportedSourceError(
                f"source '{fmt}' needs {clazz}, not present in this "
                f"environment (Hive analog: {hive_ref}). The call path is "
                "the standard spark.read.format; add the package to enable."
            )
        return spark.read.format(fmt).options(**options).load()
    raise UnsupportedSourceError(f"unknown source format: {fmt}")


def open_stream(spark: SparkSession, fmt: str, schema: str | None = None, **options) -> DataFrame:
    """Streaming twin of open_source (Hive had only the ingest API +
    Kafka-table reads, SURVEY §2.10)."""
    fmt = fmt.lower()
    if fmt in FILE_FORMATS:
        path = options.pop("path")
        reader = spark.readStream.format(fmt).options(**options)
        if schema:
            reader = reader.schema(schema)
        return reader.load(path)
    if fmt == "kafka":
        clazz, hive_ref = CONNECTORS["kafka"]
        if not _provider_available(spark, clazz):
            raise UnsupportedSourceError(
                f"kafka streaming needs {clazz} (Hive analog: {hive_ref})"
            )
        return spark.readStream.format("kafka").options(**options).load()
    raise UnsupportedSourceError(f"unknown stream format: {fmt}")


def read_mixed_partitions(
    spark: SparkSession,
    partitions: list[tuple[dict[str, str], str, str]],
    schema: str | None = None,
) -> DataFrame:
    """Per-partition file formats — a Hive capability Spark tables lack
    (Hive: each Partition carries its own SerDe/InputFormat, metastore
    StorageDescriptor per partition; qtest family
    partition_wise_fileformat*.q — e.g. some partitions RCFile, newer
    ones ORC, after ALTER TABLE ... SET FILEFORMAT applies only to new
    partitions).

    `partitions` is [(partition_spec, fmt, path), ...]. Each partition is
    read with its own format reader, partition-value columns are attached
    as literals (exactly how Hive serves them — from metadata, not data
    files), and the branches union by name.

    Scale note: each branch is its own scan with its own pushdown;
    Catalyst prunes entire branches when a filter contradicts a
    partition's literal values (constant folding turns the filter into
    FALSE — the partition-pruning equivalent for this layout).
    """
    from pyspark.sql import functions as F

    branches = []
    for spec, fmt, path in partitions:
        r = spark.read.format(fmt)
        if schema is not None:
            r = r.schema(schema)
        if fmt == "csv":
            r = r.option("header", "true")
        df = r.load(path)
        for k, v in spec.items():
            df = df.withColumn(k, F.lit(v))
        branches.append(df)
    if not branches:
        raise ValueError("no partitions given")
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out
