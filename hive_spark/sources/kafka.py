"""Kafka table surface: Hive kafka-handler contract on Spark's kafka source.

Hive exposes a Kafka topic as a table with four metadata columns and
pushes partition/offset/timestamp predicates into the consumer scan:
- metadata columns `__key __partition __offset __timestamp`
  (ref: kafka-handler/.../MetadataColumn.java:51-63)
- scan trimming: `__partition = p`, `__offset >=/<=/= o`,
  `__timestamp >= t` each narrow the (TopicPartition -> [start, end))
  split map (ref: kafka-handler/.../KafkaScanTrimmer.java:64,134-140,
  buildScanFromOffsetPredicate:282)
- table properties `kafka.topic`, `kafka.bootstrap.servers`
  (ref: kafka-handler/.../KafkaTableProperties.java:28-34)

Spark's kafka source takes the same scan bounds as reader options
(`assign`, `startingOffsets`, `endingOffsets`,
`startingOffsetsByTimestamp`) and exposes the same metadata as columns
(key, partition, offset, timestamp) — so the Hive contract maps to an
option-building step plus a projection. Both halves are pure plan
construction, verified without a broker; `.load()` needs the
spark-sql-kafka jar and a cluster (env-blocked here, documented).

Scale: trimming happens broker-side (consumer seeks), so a query over
`__timestamp >= now()-1h` reads an hour of the topic, not its history —
the Kafka equivalent of partition pruning.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Hive metadata column -> Spark kafka source column
METADATA_COLUMNS = {
    "__key": "key",
    "__partition": "partition",
    "__offset": "offset",
    "__timestamp": "timestamp",
}

_EARLIEST = -2  # kafka sentinel offsets (KafkaInputSplit start/end defaults)
_LATEST = -1


@dataclass
class KafkaTable:
    """CREATE EXTERNAL TABLE ... STORED BY KafkaStorageHandler analog."""

    topic: str
    bootstrap_servers: str
    value_schema: str | None = None  # DDL string for kafka.serde JSON payloads
    options: dict[str, str] = field(default_factory=dict)

    def reader_options(
        self, filters: list[tuple[str, str, int]] = ()
    ) -> dict[str, str]:
        """Consumer options incl. trimmed scan bounds — the
        KafkaScanTrimmer analog. `filters` are conjunctive simple
        predicates (col, op, value) over __partition/__offset/__timestamp
        with op in =, <, <=, >, >=. Unsupported columns/shapes are simply
        not pushed (Hive behaves the same: trimmer returns full scan)."""
        opts = {
            "kafka.bootstrap.servers": self.bootstrap_servers,
            **self.options,
        }
        parts: list[int] | None = None
        start: int | None = None
        end: int | None = None
        start_ts: int | None = None
        for col, op, val in filters:
            if col == "__partition" and op == "=":
                parts = [int(val)]
            elif col == "__offset":
                # half-open [start, end) like KafkaInputSplit
                if op in (">=", "="):
                    start = max(start or 0, int(val))
                if op == ">":
                    start = max(start or 0, int(val) + 1)
                if op in ("<=", "="):
                    end = min(end if end is not None else 1 << 62, int(val) + 1)
                if op == "<":
                    end = min(end if end is not None else 1 << 62, int(val))
            elif col == "__timestamp" and op in (">=", ">"):
                start_ts = int(val)
        if parts is not None:
            opts["assign"] = json.dumps({self.topic: parts})
        else:
            opts["subscribe"] = self.topic
            parts = []  # offsets-by-partition keys below need explicit parts
        if start_ts is not None and start is None:
            key = json.dumps({self.topic: {str(p): start_ts for p in parts}})
            opts["startingOffsetsByTimestamp"] = key
        elif start is not None and parts:
            opts["startingOffsets"] = json.dumps(
                {self.topic: {str(p): start for p in parts}}
            )
        if end is not None and parts:
            opts["endingOffsets"] = json.dumps(
                {self.topic: {str(p): end for p in parts}}
            )
        return opts

    def reader(self, spark, streaming: bool = True, filters=()):
        """Unstarted reader with trimmed options. `.load()` requires the
        spark-sql-kafka connector jar + a reachable broker."""
        r = spark.readStream if streaming else spark.read
        r = r.format("kafka")
        for k, v in self.reader_options(filters).items():
            r = r.option(k, v)
        return r

    def project(self, raw: DataFrame) -> DataFrame:
        """Hive column surface over a kafka-shaped frame: decode the JSON
        value into `value_schema` columns and rename metadata to the
        `__` names (KafkaSerDe row = payload columns ++ metadata)."""
        cols = []
        if self.value_schema:
            decoded = F.from_json(
                F.col("value").cast("string"), self.value_schema
            ).alias("v")
            raw = raw.select(decoded, "key", "partition", "offset", "timestamp")
            cols.append("v.*")
        else:
            cols.append(F.col("value").cast("string").alias("value"))
        cols += [
            F.col("key").cast("binary").alias("__key"),
            F.col("partition").cast("int").alias("__partition"),
            F.col("offset").cast("long").alias("__offset"),
            F.unix_millis(F.col("timestamp")).alias("__timestamp"),
        ]
        return raw.select(*cols)
