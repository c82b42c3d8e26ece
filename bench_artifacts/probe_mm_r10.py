"""r10 probe: where does mm_features spend time at 32 vs 8 cores (sf0.1)?

Hypothesis set (VERDICT r9 "What's wrong" #2):
  (a) the final orderBy triggers a RangePartitioning sample job that
      RE-EXECUTES the MapInArrow stage (python boundary paid twice);
  (b) per-task Python worker overhead scales with core count (32 tiny
      Arrow batches of ~150 docs each);
  (c) something else (measure, don't guess).

Run: SPARK_GRAFT_CPUS=32 python bench_artifacts/probe_mm_r10.py
"""
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

from hive_spark.session import get_session
from hive_spark.operators import views
from hive_spark.operators.multimodal import mm_features, _binary_docs

spark = get_session(
    app_name="probe_mm", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
)
views(spark, SF_DIR)


def t(label, df, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:45s} {best:.3f}s")
    return best


# full query (with orderBy)
t("mm_features full", mm_features(spark, SF_DIR))

# same without the final orderBy (isolates the sort + its sample pass)
from pyspark.sql import functions as F

full = mm_features(spark, SF_DIR)
no_sort = full.sortWithinPartitions("doc_id")  # keeps all columns computed
# cleaner: rebuild without orderBy
docs = _binary_docs(spark).select("doc_id", "payload")
import hive_spark.operators.multimodal as mm

q = mm.mm_features(spark, SF_DIR)
# strip the outer Sort by re-deriving: mm_features always ends in orderBy,
# so time the child via a fresh pipeline
import inspect

# time just the map stage (no sort): replicate the body
def map_only():
    d = _binary_docs(spark).select("doc_id", "payload")
    def extract(batches):
        import numpy as np
        import pyarrow as pa
        for rb in batches:
            arr = rb.column(rb.schema.get_field_index("payload"))
            o = arr.offset
            offs = (
                np.frombuffer(arr.buffers()[1], np.int32)[o : o + len(arr) + 1]
                .astype(np.int64)
            )
            data = np.frombuffer(arr.buffers()[2], np.uint8)
            n = offs[1:] - offs[:-1]
            cs = np.zeros(len(data) + 1, dtype=np.int64)
            np.cumsum(data, dtype=np.int64, out=cs[1:])
            sums = cs[offs[1:]] - cs[offs[:-1]]
            if len(data):
                heads = data[np.clip(offs[:-1], 0, len(data) - 1)].astype(np.int32)
            else:
                heads = np.zeros(len(arr), dtype=np.int32)
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column(rb.schema.get_field_index("doc_id")),
                    pa.array(n, type=pa.int64()),
                    pa.array(heads, type=pa.int32(), mask=(n == 0)),
                    pa.array(sums, type=pa.int64()),
                ],
                names=["doc_id", "n_bytes", "head_byte", "byte_sum"],
            )
    return d.mapInArrow(
        extract, "doc_id bigint, n_bytes bigint, head_byte int, byte_sum bigint"
    )

t("map stage only (no sort)", map_only())
t("map + orderBy", map_only().orderBy("doc_id"))
t("map + coalesce(8) + orderBy", map_only().coalesce(8).orderBy("doc_id"))
t("scan+encode only (no python)", _binary_docs(spark).select("doc_id", "payload"))

# how many input partitions does the scan produce?
print("scan partitions:", _binary_docs(spark).select("doc_id", "payload").rdd.getNumPartitions())

print("--- localCheckpoint variant ---")
t("map + localCkpt(lazy) + orderBy",
  map_only().localCheckpoint(eager=False).orderBy("doc_id"))
t("map + orderBy (again)", map_only().orderBy("doc_id"))
t("map + localCkpt(lazy) + orderBy (rep)",
  map_only().localCheckpoint(eager=False).orderBy("doc_id"))
