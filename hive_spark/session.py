"""SparkSession factory + catalog bootstrap.

Hive equivalents: Driver/SessionState setup (ref: ql/src/java/org/apache/
hadoop/hive/ql/Driver.java:143) and metastore table registration (ref:
standalone-metastore/.../hive_metastore.thrift:644 `struct Table`). In the
Spark-native engine both collapse into one tuned SparkSession plus temp-view
registration over parquet directories.

Scale notes (100 TB design intent):
- AQE on: runtime coalescing, skew-join splitting, SMJ->BHJ conversion
  replace Hive's SkewJoinOptimizer / ConvertJoinMapJoin passes.
- Broadcast threshold mirrors Hive's 10 MB auto-mapjoin default
  (ref: common/.../HiveConf.java:2308) but raised to 64 MB — on a
  1000-executor cluster shipping a 64 MB table beats shuffling 100 TB.
- shuffle.partitions is a *default*; AQE coalesces down, and at cluster
  scale it should be set ~2-3x total cores by the deployment, not code.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# Tables the driver materializes at /root/testdata/sf*/ (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_session(
    app_name: str = "hive_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    Local test default is ``local[$SPARK_GRAFT_CPUS]``; on a real cluster the
    caller passes ``master=None`` with spark-submit providing the master and
    the same configs scale up unchanged.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # -- determinism / oracle parity --------------------------------
        .config("spark.sql.session.timeZone", "UTC")
        # Hive semantics: x/0 -> NULL, invalid cast -> NULL, silent overflow
        # (Spark 4 defaults ANSI=true, which ERRORS on all three — a real
        # behavior divergence for any query over dirty data)
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.storeAssignmentPolicy", "LEGACY")
        # Hive's date_format/unix_timestamp/from_unixtime speak Java
        # SimpleDateFormat ('YYYY', 'u', 'MM/dd/yy' two-digit years);
        # Spark >= 3 errors on those patterns unless the parser runs in
        # the LEGACY (SimpleDateFormat) mode Hive uses
        .config("spark.sql.legacy.timeParserPolicy", "LEGACY")
        # Hive builds maps with HashMap.put — duplicate keys keep the
        # LAST value (str_to_map, map()); Spark 3+ errors by default
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        # deep LATERAL VIEW chains exceed the default 100 analyzer
        # iterations (lateral_view_multi.q)
        .config("spark.sql.analyzer.maxIterations", "500")
        # -- optimizer: everything Hive's Optimizer.java does, built in --
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.cbo.enabled", "true")
        .config("spark.sql.cbo.joinReorder.enabled", "true")
        .config("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # -- execution ---------------------------------------------------
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # testdata parquet stores TIMESTAMP(NANOS); read as long + convert
        # in load_tables (Spark has no native ns timestamp type)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    # Shuffle/blockmgr scratch: /tmp is subject to tmpfiles purging on this
    # host (observed mid-run: FAILED_READ_FILE on /tmp/spark-*), so default
    # the local dir somewhere durable unless the caller already chose one.
    local_dir = os.environ.get(
        "SPARK_GRAFT_LOCAL_DIR", os.path.expanduser("~/.spark_local")
    )
    os.makedirs(local_dir, exist_ok=True)
    if "SPARK_LOCAL_DIRS" not in os.environ:
        builder = builder.config("spark.local.dir", local_dir)
    # java.io.tmpdir defaults to /tmp, where the JVM keeps its driver
    # staging dirs (/tmp/spark-<uuid>: py4j secrets, userFiles) — this
    # host's tmpfiles purger deletes them mid-run and the whole JVM dies
    # (observed r9: three concurrent sessions killed in one sweep). Keep
    # the JVM's temp root on durable scratch alongside spark.local.dir.
    jtmp = os.path.join(local_dir, "jtmp")
    os.makedirs(jtmp, exist_ok=True)
    builder = builder.config(
        "spark.driver.extraJavaOptions", f"-Djava.io.tmpdir={jtmp}"
    ).config("spark.executor.extraJavaOptions", f"-Djava.io.tmpdir={jtmp}")
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    # Register the Hive function gap-fill into this session's SQL namespace.
    from hive_spark.functions import register_all

    register_all(spark)
    return spark


def load_tables(
    spark: SparkSession,
    sf_dir: str = DEFAULT_SF_DIR,
    tables: tuple[str, ...] = TESTDATA_TABLES,
) -> dict[str, DataFrame]:
    """Load the testdata parquet tables as DataFrames.

    Plain `spark.read.parquet` — Catalyst handles column pruning and filter
    pushdown into the scan; nothing to hand-roll (Hive needed MapOperator +
    SerDe per format, ref: ql/.../exec/MapOperator.java:78).
    """
    from pyspark.sql import functions as F

    out: dict[str, DataFrame] = {}
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        # Timestamp normalization: ms/us parquet timestamps read natively as
        # TIMESTAMP_NTZ; TIMESTAMP(NANOS) columns arrive as long (nanosAsLong)
        # and are converted here to TIMESTAMP_NTZ at microsecond precision,
        # so every table exposes one timestamp type (matching the DuckDB
        # oracle's naive timestamps under the UTC session).
        for col, unit in _ns_timestamp_columns(path):
            if unit == "ns":
                df = df.withColumn(
                    col,
                    F.timestamp_micros(F.expr(f"`{col}` div 1000")).cast(
                        "timestamp_ntz"
                    ),
                )
        out[name] = df
    return out


def _ns_timestamp_columns(path: str) -> list[tuple[str, str]]:
    import pyarrow.parquet as pq
    import pyarrow.types as pat

    if os.path.isdir(path):  # multi-file table: any part carries the schema
        parts = sorted(
            f for f in os.listdir(path) if f.endswith(".parquet")
        )
        if not parts:
            return []
        path = os.path.join(path, parts[0])
    schema = pq.read_schema(path)
    return [
        (f.name, f.type.unit)
        for f in schema
        if pat.is_timestamp(f.type) and f.type.unit == "ns"
    ]


def register_views(
    spark: SparkSession,
    sf_dir: str = DEFAULT_SF_DIR,
    tables: tuple[str, ...] = TESTDATA_TABLES,
) -> dict[str, DataFrame]:
    """Register testdata tables as temp views (SQL entry point parity:
    Hive metastore tables -> Spark temp views over parquet)."""
    dfs = load_tables(spark, sf_dir, tables)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
