"""Hive storage formats (RCFile / SequenceFile / Avro / TextFile).

The STORED AS round trips need a hive-catalog session, and
catalogImplementation is fixed per JVM at first-session creation — so the
round trip runs in a SUBPROCESS with its own JVM, keeping this suite's
in-memory-catalog session intact. The SequenceFile RDD bridge needs no
catalog and runs in-process."""

import subprocess
import sys
import textwrap

from pyspark.sql import functions as F

from hive_spark.sources.hive_formats import (
    read_sequencefile_kv,
    write_sequencefile_kv,
)

_SUBPROC = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, "/root/repo")
    from hive_spark.sources.hive_formats import (
        hive_session, write_stored_as, read_table,
    )
    spark = hive_session(warehouse=sys.argv[1])
    base = (
        spark.read.parquet("%(sf)s/lineitem.parquet")
        .selectExpr("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(500)
    )
    want = sorted(map(tuple, base.collect()))
    for fmt in ("rcfile", "sequencefile", "textfile", "avro"):
        write_stored_as(spark, base, f"rt_{fmt}", fmt)
        got = sorted(map(tuple, read_table(spark, f"rt_{fmt}").collect()))
        assert got == want, f"{fmt}: {len(got)} rows vs {len(want)}"
        fmt_info = spark.sql(f"DESCRIBE FORMATTED rt_{fmt}").collect()
        serde = [r.data_type for r in fmt_info if r.col_name == "InputFormat"]
        print(fmt, "OK", serde[0] if serde else "?")
    print("ALL_FORMATS_OK")
    """
)


def test_stored_as_round_trips(sf_dir, tmp_path):
    out = subprocess.run(
        [sys.executable, "-c", _SUBPROC % {"sf": sf_dir}, str(tmp_path / "wh")],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(tmp_path),  # derby metastore_db lands in cwd, not the repo
    )
    assert "ALL_FORMATS_OK" in out.stdout, out.stdout + out.stderr[-2000:]
    # the hive formats actually engaged their Hive input formats
    assert "RCFileInputFormat" in out.stdout
    assert "SequenceFileInputFormat" in out.stdout


def test_sequencefile_rdd_bridge(spark, sf_dir, tmp_path):
    df = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(100)
    )
    path = str(tmp_path / "seq")
    write_sequencefile_kv(df, path)
    back = read_sequencefile_kv(spark, path, "doc_id", "text")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_kv_bridge_rejects_wide_frames(spark, sf_dir, tmp_path):
    df = spark.read.parquet(f"{sf_dir}/nation.parquet")
    try:
        write_sequencefile_kv(df, str(tmp_path / "bad"))
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
