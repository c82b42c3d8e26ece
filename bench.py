"""Headline benchmark: run the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized via a count-style action so the timing
covers scan → shuffle → result, not just plan construction. A warm-up
query absorbs JVM/codegen startup so numbers reflect steady-state
throughput (what a long-lived cluster session sees).
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Headline set: the TPC-H core (scan/filter/agg/join/window shapes) plus
# the scale-critical training-pipeline ops (dedup sketching, ANN search,
# sessionization). Keys must exist in full_registry().
HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q9",
    "tpch_q13",
    "tpch_q18",
    "tpch_q21",
    "window_rank",
    "agg_rollup",
    "events_session",
    "events_tumbling",
    "text_stats",
    "text_tfidf_topk",
    "text_inverted_index",
    "dedup_minhash_lsh",
    "knn_lsh_bucketed",
    "mm_features",
    "training_data_pipeline",
]


def main() -> None:
    from hive_spark.session import get_session
    from hive_spark.operators import full_registry

    spark = get_session(
        app_name="hive_spark_bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    registry = full_registry()

    # Warm-up: touch every table once (file listing + footer reads + codegen).
    from hive_spark.operators import views

    for df in views(spark, SF_DIR).values():
        df.limit(1).count()

    # best-of-2 per query: the first run pays one-time costs (plan
    # compile, codegen, scratch writes); the min is the steady-state
    # number a long-lived session sees, and damps co-tenant noise
    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = registry[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            spec.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_query_suite_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
