"""Triage candidate reference .q scripts through run_script.

Builds the same qverbatim fixtures tests/test_qtest_verbatim.py uses,
then attempts each candidate script and reports OK(last-rowcount) or
the first error line — a scouting tool for widening the verbatim
conformance corpus (nothing here ships; passing scripts get promoted
into SMOKE_SCRIPTS with their fixture-determined counts).

Usage: python scripts/qtest_triage.py file1.q file2.q ...
       python scripts/qtest_triage.py --glob 'join*.q'
"""

import fnmatch
import os
import shutil
import sys
import traceback

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

QDIR = "/root/reference/ql/src/test/queries/clientpositive"
SCRATCH = "/tmp/hive_spark_qtriage"
REF_ROOT = "/root/reference/ql/src"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hive_spark.hqlscript import LOAD_DATA_BASES, run_script  # noqa: E402
from hive_spark.session import get_session  # noqa: E402


def build_fixtures(spark):
    spark.sql("DROP DATABASE IF EXISTS qtriage CASCADE")
    shutil.rmtree(SCRATCH, ignore_errors=True)
    spark.sql(f"CREATE DATABASE qtriage LOCATION '{SCRATCH}/warehouse'")
    spark.catalog.setCurrentDatabase("qtriage")
    src = spark.range(500).select(
        ((F.col("id") * 7) % 499).cast("string").alias("key"),
        F.concat(F.lit("val_"), ((F.col("id") * 7) % 499).cast("string")).alias(
            "value"
        ),
    )
    src.write.saveAsTable("src")
    parts = spark.createDataFrame(
        [("2008-04-08", "11"), ("2008-04-08", "12"),
         ("2008-04-09", "11"), ("2008-04-09", "12")],
        "ds string, hr string",
    )
    src.crossJoin(parts).write.partitionBy("ds", "hr").saveAsTable("srcpart")
    src.limit(25).write.saveAsTable("src1")
    src.write.saveAsTable("src_cbo")
    cbo_schema = ("key string, value string, c_int int, c_float float,"
                  " c_boolean boolean")
    for t in ("cbo_t1", "cbo_t2", "cbo_t3"):
        df = spark.read.csv(
            f"/root/reference/data/files/{t}.txt", schema=cbo_schema
        )
        df.withColumn("dt", F.lit("2014")).write.saveAsTable(t)
    spark.read.parquet("/root/reference/data/files/part.parquet") \
        .write.saveAsTable("part")
    build_extra_datasets(spark)
    if REF_ROOT not in LOAD_DATA_BASES:
        LOAD_DATA_BASES.append(REF_ROOT)


def build_extra_datasets(spark):
    """lineitem / srcbucket / alltypesorc from the reference's own data
    files (data/files/datasets/*/load.hive.sql schemas)."""
    for v in ("lineitem", "part"):  # testdata temp views would shadow
        spark.catalog.dropTempView(v)
    lineitem_schema = (
        "l_orderkey int, l_partkey int, l_suppkey int, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate string, l_commitdate string, l_receiptdate string,"
        " l_shipinstruct string, l_shipmode string, l_comment string"
    )
    spark.read.csv(
        "/root/reference/data/files/tpch/tiny/lineitem.tbl.bz2",
        schema=lineitem_schema, sep="|",
    ).write.saveAsTable("lineitem")
    spark.read.csv(
        [
            "/root/reference/data/files/bucketed_files/000000_0",
            "/root/reference/data/files/bucketed_files/000001_0",
        ],
        schema="key int, value string", sep="\x01",
    ).write.bucketBy(2, "key").sortBy("key").saveAsTable("srcbucket")
    spark.read.orc(
        "/root/reference/data/files/alltypesorc"
    ).write.saveAsTable("alltypesorc")


def main():
    args = sys.argv[1:]
    if args and args[0] == "--glob":
        names = sorted(
            f
            for f in os.listdir(QDIR)
            if any(fnmatch.fnmatch(f, g) for g in args[1:])
        )
    else:
        names = args
    spark = get_session()
    build_fixtures(spark)
    fixture_tables = {t.name for t in spark.catalog.listTables()}
    for fname in names:
        path = os.path.join(QDIR, fname)
        if not os.path.isfile(path):
            print(f"{fname}\tMISSING")
            continue
        try:
            res = run_script(spark, open(path).read())
            n = res.results[-1].count() if res.results else -1
            print(f"{fname}\tOK\t{n}")
        except Exception as e:
            first = str(e).replace("\n", " ")[:160]
            print(f"{fname}\tFAIL\t{type(e).__name__}: {first}")
        finally:
            # QTestUtil.clearTablesCreatedDuringTests analog: drop what
            # the script created so scripts can't collide on names;
            # reset the database pointer (scripts may USE other dbs)
            try:
                spark.catalog.setCurrentDatabase("qtriage")
                for t in spark.catalog.listTables():
                    if t.name not in fixture_tables:
                        kind = "VIEW" if t.tableType == "VIEW" else "TABLE"
                        spark.sql(f"DROP {kind} IF EXISTS `{t.name}`")
            except Exception:
                build_fixtures(spark)
                fixture_tables = {t.name for t in spark.catalog.listTables()}


if __name__ == "__main__":
    main()
