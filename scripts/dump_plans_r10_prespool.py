"""Dump .explain("formatted") of the PRE-SPOOL child plan for queries
whose public plan is a `Scan ExistingRDD` stub behind the lazy
localCheckpoint spool (operators.spool_sort / inline localCheckpoint):
localCheckpoint is patched to identity for the dump only, so the file
shows the full plan that actually executes to produce the spooled rows.
"""
import io
import os
import sys
from contextlib import redirect_stdout

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
NAMES = sys.argv[1:]

from pyspark.sql import DataFrame
from pyspark.sql.classic.dataframe import DataFrame as _ClassicDF

# dump-only patch (Spark 4: sessions hand out the classic subclass,
# which overrides localCheckpoint — patch both)
DataFrame.localCheckpoint = lambda self, eager=True: self
_ClassicDF.localCheckpoint = lambda self, eager=True: self

from hive_spark.session import get_session
from hive_spark.operators import full_registry

spark = get_session(
    app_name="plans_r10_prespool",
    master=f"local[{CPUS}]",
    shuffle_partitions=int(CPUS),
)
registry = full_registry()
out_dir = os.path.join(_REPO, "plans", "r10")
os.makedirs(out_dir, exist_ok=True)
for name in NAMES:
    df = registry[name].fn(spark, SF_DIR)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(out_dir, f"{name}_after_prespool.txt"), "w") as f:
        f.write(buf.getvalue())
    print("wrote", name, "after_prespool")
