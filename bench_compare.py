"""Side-by-side wall-clock: this engine (Spark, local[N]) vs DuckDB
running the SAME queries (the oracle SQL) on the SAME parquet.

Read this correctly: DuckDB is the CORRECTNESS oracle, not the throughput
reference (the reference is Hive, whose per-query job-launch overhead on
MR/Tez dwarfs Spark's). At sf0.1 the inputs are ~10 MB, so Spark times are
dominated by fixed per-query overhead (scheduler + codegen + py4j, ~0.3-0.5 s
— reported separately as spark_fixed_overhead_sec, measured on a 1-row
query). That overhead amortizes to zero at the 100 TB design point, where an
embedded single-node engine stops being runnable at all; per-row throughput
after subtracting it is the comparable quantity at small SF.

Not part of the driver contract (bench.py is). Prints one JSON line:
{"sf":..., "spark_total_sec":..., "duckdb_total_sec":...,
 "spark_fixed_overhead_sec":..., "per_query": {...}}
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

from bench import HEADLINE  # same query set as the contract bench


def main() -> None:
    import duckdb

    from hive_spark.operators import full_registry, views
    from hive_spark.session import TESTDATA_TABLES, get_session

    spark = get_session(
        app_name="hive_spark_bench_compare",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    registry = full_registry()

    con = duckdb.connect()
    con.execute(f"SET threads = {CPUS}")
    for t in TESTDATA_TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )

    for df in views(spark, SF_DIR).values():  # warm both engines
        df.limit(1).count()
    con.sql("SELECT count(*) FROM lineitem").fetchall()

    # fixed per-query cost: a 1-row query through the same action path
    t0 = time.perf_counter()
    spark.range(1).write.format("noop").mode("overwrite").save()
    overhead = round(time.perf_counter() - t0, 3)

    per_query: dict[str, dict[str, float]] = {}
    for name in HEADLINE:
        spec = registry[name]
        if spec.oracle is None:
            continue
        t0 = time.perf_counter()
        spec.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        t_spark = time.perf_counter() - t0
        t0 = time.perf_counter()
        con.sql(spec.oracle).fetchall()
        t_duck = time.perf_counter() - t0
        per_query[name] = {"spark": round(t_spark, 3), "duckdb": round(t_duck, 3)}

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "spark_total_sec": round(
                    sum(v["spark"] for v in per_query.values()), 3
                ),
                "duckdb_total_sec": round(
                    sum(v["duckdb"] for v in per_query.values()), 3
                ),
                "spark_fixed_overhead_sec": overhead,
                "per_query": per_query,
            }
        )
    )


if __name__ == "__main__":
    main()
