"""File-backed mock broker: executes the Kafka reader-option contract.

The env has no broker and no spark-sql-kafka jar, so `KafkaTable`'s
pushdown translation (sources/kafka.py, the KafkaScanTrimmer analog —
ref: kafka-handler/src/java/org/apache/hadoop/hive/kafka/
KafkaScanTrimmer.java:64) could previously only be contract-tested: the
OPTIONS were asserted, never executed. This module closes that loop with
a consumer that honors the exact option surface the real connector
consumes — `assign` / `subscribe`, `startingOffsets`, `endingOffsets`,
`startingOffsetsByTimestamp` (Kafka offsetsForTimes semantics: first
offset whose timestamp >= the bound) — against a file-backed topic log,
producing the same kafka-shaped frame (key/value binary, partition int,
offset long, timestamp) `KafkaTable.project` expects.

End-to-end path under test:
    filters -> KafkaTable.reader_options() -> OPTIONS DICT
            -> FileBackedBroker.consume(options)  (this module)
            -> KafkaTable.project()               (Hive column surface)
so a translation bug (wrong JSON shape, off-by-one bounds) now fails a
read, not just a dict comparison.

Storage: one JSONL file per (topic, partition) under a root dir —
append-only, offset = line number, like a log segment. This is a test
double for plan verification; a production deployment points the SAME
`KafkaTable` at the real connector jar, whose option parsing this mock
mirrors.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

_KAFKA_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset long, timestamp timestamp, timestampType int"
)


class FileBackedBroker:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _log(self, topic: str, partition: int) -> str:
        return os.path.join(self.root, f"{topic}-{partition}.jsonl")

    def create_topic(self, topic: str, partitions: int) -> None:
        for p in range(partitions):
            open(self._log(topic, p), "a").close()

    def partitions(self, topic: str) -> list[int]:
        pre = f"{topic}-"
        return sorted(
            int(f[len(pre) : -6])
            for f in os.listdir(self.root)
            if f.startswith(pre) and f.endswith(".jsonl")
        )

    def produce(
        self,
        topic: str,
        partition: int,
        key: str | None,
        value: str,
        timestamp_ms: int,
    ) -> int:
        """Append one record; returns its offset (= line count so far)."""
        path = self._log(topic, partition)
        with open(path, "a") as f:
            offset = sum(1 for _ in open(path))
            f.write(json.dumps({"k": key, "v": value, "ts": timestamp_ms}) + "\n")
        return offset

    def _records(self, topic: str, partition: int) -> list[dict]:
        with open(self._log(topic, partition)) as f:
            return [json.loads(line) for line in f if line.strip()]

    # -- the consumer: interprets reader options like the connector --------

    def consume(self, spark: SparkSession, options: dict[str, str]) -> DataFrame:
        """Batch-consume per the option contract; returns a kafka-shaped
        DataFrame. Bounded test data — rows build driver-side, exactly
        like a unit-test broker; the real connector parallelizes one
        task per TopicPartition with the same seek semantics."""
        if "assign" in options:
            assign = json.loads(options["assign"])
            topic_parts = {t: ps for t, ps in assign.items()}
        elif "subscribe" in options:
            t = options["subscribe"]
            topic_parts = {t: self.partitions(t)}
        else:
            raise ValueError("options need 'assign' or 'subscribe'")

        def bound(opt: str, topic: str, p: int, default: int) -> int:
            raw = options.get(opt)
            if raw is None:
                return default
            return int(json.loads(raw).get(topic, {}).get(str(p), default))

        rows = []
        for topic, parts in topic_parts.items():
            for p in parts:
                recs = self._records(topic, p)
                start = bound("startingOffsets", topic, p, 0)
                end = bound("endingOffsets", topic, p, len(recs))
                ts_raw = options.get("startingOffsetsByTimestamp")
                if ts_raw is not None:
                    ts_min = int(json.loads(ts_raw).get(topic, {}).get(str(p), 0))
                    # offsetsForTimes: first offset with timestamp >= bound
                    start = next(
                        (i for i, r in enumerate(recs) if r["ts"] >= ts_min),
                        len(recs),
                    )
                for off in range(start, min(end, len(recs))):
                    r = recs[off]
                    rows.append(
                        (
                            r["k"].encode() if r["k"] is not None else None,
                            r["v"].encode(),
                            topic,
                            p,
                            off,
                            # timestamp column: epoch seconds w/ ms precision
                            __import__("datetime").datetime.fromtimestamp(
                                r["ts"] / 1000.0,
                                tz=__import__("datetime").timezone.utc,
                            ).replace(tzinfo=None),
                            0,
                        )
                    )
        return spark.createDataFrame(rows, _KAFKA_SCHEMA)


    # -- streaming: segmented log + file-stream consumer -------------------

    def _seg_dir(self, topic: str, partition: int) -> str:
        return os.path.join(self.root, "stream", topic, f"p={partition}")

    def produce_segment(
        self,
        topic: str,
        partition: int,
        records: list[tuple[str | None, str, int]],
    ) -> int:
        """Append one CLOSED log segment — the ingestion unit a streaming
        consumer picks up (Kafka's segment roll). `records` are
        (key, value, timestamp_ms); offsets continue from the partition's
        current end. Returns the first offset of the segment."""
        d = self._seg_dir(topic, partition)
        os.makedirs(d, exist_ok=True)
        segs = sorted(f for f in os.listdir(d) if f.endswith(".jsonl"))
        base = 0
        for s in segs:
            with open(os.path.join(d, s)) as f:
                base += sum(1 for _ in f)
        path = os.path.join(d, f"segment-{len(segs):05d}.jsonl")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            for i, (k, v, ts) in enumerate(records):
                f.write(
                    json.dumps(
                        {
                            "k": k,
                            "v": v,
                            "ts": ts,
                            "partition": partition,
                            "offset": base + i,
                        }
                    )
                    + "\n"
                )
        os.replace(tmp, path)  # atomic: the stream never sees half a segment
        return base

    def consume_stream(self, spark: SparkSession, topic: str) -> DataFrame:
        """`readStream` over the topic's segment log, emitting the SAME
        kafka-shaped frame as batch `consume` — the structured-streaming
        analog of the kafka source (new segments = new micro-batch
        input; pair with a checkpointed sink for exactly-once)."""
        from pyspark.sql import functions as F

        raw = (
            spark.readStream.schema(
                "k string, v string, ts long, partition int, offset long"
            )
            .option("maxFilesPerTrigger", 1)
            .json(os.path.join(self.root, "stream", topic, "*"))
        )
        return raw.select(
            F.col("k").cast("binary").alias("key"),
            F.col("v").cast("binary").alias("value"),
            F.lit(topic).alias("topic"),
            F.col("partition").cast("int"),
            F.col("offset").cast("long"),
            F.timestamp_millis(F.col("ts")).alias("timestamp"),
            F.lit(0).alias("timestampType"),
        )
