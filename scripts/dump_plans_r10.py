"""Dump .explain("formatted") for the named queries to plans/r10/."""
import io
import os
import sys
from contextlib import redirect_stdout

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SUFFIX = sys.argv[1] if len(sys.argv) > 1 else "before"
NAMES = sys.argv[2:]

from hive_spark.session import get_session
from hive_spark.operators import full_registry

spark = get_session(
    app_name="plans_r10", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
)
registry = full_registry()
out_dir = os.path.join(_REPO, "plans", "r10")
os.makedirs(out_dir, exist_ok=True)
for name in NAMES:
    df = registry[name].fn(spark, SF_DIR)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(out_dir, f"{name}_{SUFFIX}.txt"), "w") as f:
        f.write(buf.getvalue())
    print("wrote", name, SUFFIX)
