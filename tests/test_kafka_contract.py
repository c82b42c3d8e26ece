"""Kafka-handler contract tests — no broker needed (option building and
projection are plan-side; the consumer scan itself is env-blocked and
documented in COVERAGE.md §2.1)."""

import json

from pyspark.sql import functions as F

from hive_spark.sources.kafka import METADATA_COLUMNS, KafkaTable


def _t(**kw):
    return KafkaTable(
        topic="events",
        bootstrap_servers="broker:9092",
        **kw,
    )


def test_partition_offset_trimming():
    """__partition = p plus an __offset range becomes assign +
    starting/endingOffsets (KafkaScanTrimmer.buildScanFromOffsetPredicate:
    half-open [start, end) splits)."""
    opts = _t().reader_options(
        [("__partition", "=", 3), ("__offset", ">=", 100), ("__offset", "<", 200)]
    )
    assert json.loads(opts["assign"]) == {"events": [3]}
    assert json.loads(opts["startingOffsets"]) == {"events": {"3": 100}}
    assert json.loads(opts["endingOffsets"]) == {"events": {"3": 200}}
    assert "subscribe" not in opts


def test_offset_equality_is_single_row_scan():
    """__offset = o scans exactly [o, o+1) (trimmer EQUALS case)."""
    opts = _t().reader_options([("__partition", "=", 0), ("__offset", "=", 42)])
    assert json.loads(opts["startingOffsets"]) == {"events": {"0": 42}}
    assert json.loads(opts["endingOffsets"]) == {"events": {"0": 43}}


def test_timestamp_pushdown_and_full_scan_fallback():
    """__timestamp >= t becomes startingOffsetsByTimestamp; predicates the
    trimmer can't push (no partition pin) fall back to subscribe —
    exactly Hive's full-scan fallback."""
    opts = _t().reader_options(
        [("__partition", "=", 1), ("__timestamp", ">=", 1700000000000)]
    )
    assert json.loads(opts["startingOffsetsByTimestamp"]) == {
        "events": {"1": 1700000000000}
    }
    full = _t().reader_options([("__key", "=", 7)])
    assert full["subscribe"] == "events"
    assert "startingOffsets" not in full and "assign" not in full


def test_projection_decodes_value_and_metadata(spark):
    """KafkaSerDe row shape: JSON payload columns ++ __key/__partition/
    __offset/__timestamp, built from a kafka-shaped frame (the schema the
    connector yields) without a broker."""
    raw = spark.createDataFrame(
        [
            (
                b"k1",
                json.dumps({"user": 7, "action": "click"}).encode(),
                "events",
                0,
                100,
            ),
        ],
        "key binary, value binary, topic string, partition int, offset long",
    ).withColumn("timestamp", F.timestamp_millis(F.lit(1700000000123)))
    table = _t(value_schema="user bigint, action string")
    out = table.project(raw)
    assert set(out.columns) == {"user", "action", *METADATA_COLUMNS}
    row = out.collect()[0]
    assert (row.user, row.action) == (7, "click")
    assert row["__partition"] == 0 and row["__offset"] == 100
    assert row["__timestamp"] == 1700000000123
    assert bytes(row["__key"]) == b"k1"


def test_reader_builds_unstarted(spark):
    """The reader constructs with trimmed options; only .load() needs the
    connector jar (asserted not to raise at build time)."""
    r = _t().reader(spark, streaming=True, filters=[("__partition", "=", 0)])
    assert r is not None


def _broker(tmp_path, n=10):
    """Two-partition topic: partition 0 has n records at ts 1000*i,
    partition 1 has n records at ts 500+1000*i."""
    from hive_spark.sources.kafka_mock import FileBackedBroker

    b = FileBackedBroker(str(tmp_path / "broker"))
    b.create_topic("events", 2)
    for i in range(n):
        b.produce("events", 0, f"k{i}", json.dumps({"user": i, "action": "a"}),
                  1_000 * i)
        b.produce("events", 1, None, json.dumps({"user": 100 + i, "action": "b"}),
                  500 + 1_000 * i)
    return b


def test_mock_broker_executes_offset_pushdown(spark, tmp_path):
    """End-to-end: filters -> reader_options -> mock consume -> project.
    The option JSON produced by the trimmer analog is EXECUTED, so a
    wrong bound shape fails the read, not just a dict assertion."""
    b = _broker(tmp_path)
    table = _t(value_schema="user bigint, action string")
    opts = table.reader_options(
        [("__partition", "=", 1), ("__offset", ">=", 3), ("__offset", "<", 7)]
    )
    out = table.project(b.consume(spark, opts)).orderBy("__offset")
    rows = out.collect()
    assert [r["__offset"] for r in rows] == [3, 4, 5, 6]
    assert all(r["__partition"] == 1 for r in rows)
    assert [r.user for r in rows] == [103, 104, 105, 106]


def test_mock_broker_executes_timestamp_pushdown(spark, tmp_path):
    """startingOffsetsByTimestamp seeks the first offset with ts >= bound
    (offsetsForTimes semantics) — partition 1's records are shifted 500ms
    so the seek lands on a different offset than a naive ts/1000."""
    b = _broker(tmp_path)
    table = _t()
    opts = table.reader_options(
        [("__partition", "=", 1), ("__timestamp", ">=", 4_000)]
    )
    rows = table.project(b.consume(spark, opts)).orderBy("__offset").collect()
    # partition 1 ts: 500, 1500, ..., offset i has ts 500+1000i;
    # first ts >= 4000 is offset 4 (ts 4500)
    assert [r["__offset"] for r in rows] == [4, 5, 6, 7, 8, 9]
    assert rows[0]["__timestamp"] == 4_500


def test_mock_broker_subscribe_full_scan(spark, tmp_path):
    """No pushable predicate -> subscribe -> every partition, earliest to
    latest (Hive's full-scan fallback), metadata intact."""
    b = _broker(tmp_path, n=4)
    table = _t()
    opts = table.reader_options([("__key", "=", 1)])  # not pushable
    out = table.project(b.consume(spark, opts))
    assert out.count() == 8
    assert {r["__partition"] for r in out.collect()} == {0, 1}


def test_mock_broker_streaming_ingest_incremental(spark, tmp_path):
    """Streaming consumption of the kafka-shaped surface: segments land,
    a checkpointed stream ingests them exactly-once, NEW segments after
    a restart are the only rows processed (incremental resume), and the
    final table equals a batch read of the same records projected
    through KafkaTable."""
    import time

    from hive_spark.sources.kafka import KafkaTable
    from hive_spark.sources.kafka_mock import FileBackedBroker

    broker = FileBackedBroker(str(tmp_path / "broker"))
    ckpt = str(tmp_path / "ckpt")
    t0 = 1_700_000_000_000

    broker.produce_segment(
        "events", 0, [("a", '{"n":1}', t0), ("b", '{"n":2}', t0 + 10)]
    )
    broker.produce_segment("events", 1, [("c", '{"n":3}', t0 + 20)])

    kt = KafkaTable(
        topic="events", bootstrap_servers="mock:9092", value_schema="n INT"
    )
    out = str(tmp_path / "sink")

    def run_until_idle():
        q = (
            kt.project(broker.consume_stream(spark, "events"))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)

    run_until_idle()
    assert spark.read.parquet(out).count() == 3

    # restart with the same checkpoint after new segments land: ONLY the
    # new records flow (exactly-once resume over the segment log)
    broker.produce_segment(
        "events", 0, [("d", '{"n":4}', t0 + 30), ("e", '{"n":5}', t0 + 40)]
    )
    run_until_idle()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 5

    # parity with the Hive column surface: decoded payload + metadata,
    # per-partition offsets contiguous from 0
    assert sorted(r.n for r in rows) == [1, 2, 3, 4, 5]
    offs = sorted((r["__partition"], r["__offset"]) for r in rows)
    assert offs == [(0, 0), (0, 1), (0, 2), (0, 3), (1, 0)]
