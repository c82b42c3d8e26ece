"""r10 experiment: cold star-build variants (VERDICT r9 #5 — cold ETL
should approach ~15s at the sf1 tier with the date-clustered layout
intact).

The suspect cost: each of the 6 facts is written
`repartitionByRange(date_sk).sortWithinPartitions(date_sk)`, and the
range exchange's bound-sampling job RE-EXECUTES the fact derivation
(the lineitem joins/projections) before the real pass — the same
double-execution spool_sort fixes for query-side sorts. r9's
localCheckpoint A/B was rejected (MEMORY_AND_DISK thrash under the
8-wide pool); these variants avoid the memory pressure:

  A  current: direct repartitionByRange (derivation runs twice)
  B  persist(DISK_ONLY) below the range exchange, unpersist after write
  C  hash pre-shuffle on the date key below the range exchange
     (sampler then reads shuffle files instead of re-deriving) —
     only valid if CollapseRepartition doesn't merge the exchanges

Usage: python bench_artifacts/star_build_ab_r10.py [rounds]
"""
import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from hive_spark.session import get_session  # noqa: E402
from hive_spark.operators import views  # noqa: E402
from hive_spark.operators import tpcds  # noqa: E402

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SF1_DIR = os.path.expanduser(
    "~/.hive_spark_scratch/engine/benchscale/sf0.1_x10"
)
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 2

spark = get_session(
    app_name="star_ab", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
)
views(spark, SF1_DIR)
sqls, _dst = tpcds._star_plan(spark, SF1_DIR)


def build(variant: str, tag: str) -> float:
    """One full cold build into a throwaway dir, 8-wide pool (mirrors
    _register_star's scheduler, layout per `variant`)."""
    import re as _re
    from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor, wait

    build_dir = os.path.join("/tmp", f"star_ab_{tag}")
    shutil.rmtree(build_dir, ignore_errors=True)
    os.makedirs(build_dir)
    all_names = {n for n, _ in sqls}
    dep_of = {
        n: {m for m in all_names if m != n and _re.search(rf"\b{m}\b", s)}
        for n, s in sqls
    }
    done: set[str] = set()
    pending = dict(sqls)

    def _build_one(name: str, sql: str) -> str:
        out = os.path.join(build_dir, name)
        df = spark.sql(sql)
        datecol = tpcds._FACT_LAYOUT.get(name)
        cached = None
        if datecol is not None:
            if variant == "A":
                df = df.repartitionByRange(datecol).sortWithinPartitions(datecol)
            elif variant == "B":
                from pyspark import StorageLevel

                cached = df.persist(StorageLevel.DISK_ONLY)
                df = cached.repartitionByRange(datecol).sortWithinPartitions(
                    datecol
                )
            elif variant == "C":
                df = (
                    df.repartition(int(CPUS), F.col(datecol))
                    .repartitionByRange(datecol)
                    .sortWithinPartitions(datecol)
                )
        df.write.mode("overwrite").parquet(out)
        if cached is not None:
            cached.unpersist()
        # mirror the real build: dependents read the materialized parquet
        # (this is a throwaway session, registration pollution is fine)
        spark.read.parquet(out).createOrReplaceTempView(name)
        return name

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=8) as pool:
        futures = set()
        while pending or futures:
            ready = [n for n in list(pending) if dep_of[n] <= done]
            for n in ready:
                futures.add(pool.submit(_build_one, n, pending.pop(n)))
            finished, futures = wait(futures, return_when=FIRST_COMPLETED)
            for f in finished:
                done.add(f.result())
    dt = time.perf_counter() - t0
    shutil.rmtree(build_dir, ignore_errors=True)
    return dt


# sanity: does variant C keep two exchanges? (CollapseRepartition check)
fact_sql = dict(sqls)["store_sales"]
probe = (
    spark.sql(fact_sql)
    .repartition(int(CPUS), F.col("ss_sold_date_sk"))
    .repartitionByRange("ss_sold_date_sk")
)
import io
from contextlib import redirect_stdout

buf = io.StringIO()
with redirect_stdout(buf):
    probe.explain("formatted")
n_ex = buf.getvalue().count("Exchange")
print(f"variant C exchanges in plan: {n_ex} (needs 2 to be meaningful)")

results: dict[str, list[float]] = {"A": [], "B": [], "C": []}
order = ["A", "B", "C"] if n_ex >= 2 else ["A", "B"]
for r in range(ROUNDS):
    for v in order:
        dt = build(v, f"{v}{r}")
        results[v].append(dt)
        print(f"round {r} variant {v}: {dt:.2f}s", flush=True)

for v, ts in results.items():
    if ts:
        print(f"variant {v}: best {min(ts):.2f}s  all {[round(t,2) for t in ts]}")
