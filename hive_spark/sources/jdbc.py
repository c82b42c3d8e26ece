"""JDBC source/sink (Hive JdbcStorageHandler analog, ref:
jdbc-handler/src/main/java/org/apache/hive/storage/jdbc/
JdbcStorageHandler.java + JdbcInputFormat.java's split-on-bounds logic).

Spark's built-in JDBC DataSource is the whole implementation; this module
pins the two things that matter at scale and proves them with an embedded
Derby database (the driver jar ships with this distribution — it backs
the Hive metastore):

- PARALLEL READS: a bare `dbtable` read is one task against the database
  (numPartitions=1) no matter how big the cluster — the Hive analog is
  JdbcInputFormat computing splits. `read(partition_column, lower, upper,
  num_partitions)` shards the scan into range predicates the remote
  database serves concurrently.
- PUSHDOWN: filters and projections reach the remote scan (PushedFilters
  / ReadSchema on JDBCRelation), so the database ships rows, not tables.

Any vendor database works by swapping url/driver; Derby is what this
environment can actually run end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_url(path: str, create: bool = True) -> str:
    return f"jdbc:derby:{path}{';create=true' if create else ''}"


def write(
    spark: SparkSession,
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    driver: str = DERBY_DRIVER,
) -> None:
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .mode(mode)
        .save()
    )


def read(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str = DERBY_DRIVER,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Read a remote table; pass partition_column + bounds to shard the
    scan across executors (each partition issues its own range query)."""
    r = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
    )
    if partition_column is not None:
        r = (
            r.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return r.load()
