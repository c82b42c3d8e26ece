"""r9 probe: does AQE sort-merge->shuffled-hash conversion help
tpcds_q25_sales_returns (the one bench query that keeps an SMJ at the
sf1 tier after the q75 rewrite)?

Interleaved best-of-N A/B in ONE session (the threshold conf is
runtime-settable), with a row-identity check and an executed-plan read
so the conversion is confirmed, not assumed.

Usage: python scripts/q25_shj_probe_r9.py [reps]
"""
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from hive_spark.session import get_session  # noqa: E402
from hive_spark.operators import full_registry  # noqa: E402

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
KNOB = "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold"
QUERIES = ("tpcds_q25_sales_returns",)


def main() -> None:
    spark = get_session(
        app_name="q25_shj_probe",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    from bench import _build_scaled_dir

    sf1 = _build_scaled_dir(spark, SF, 10)
    reg = full_registry()

    def timed(name: str, thresh: str) -> float:
        spark.conf.set(KNOB, thresh)
        spark.sparkContext.setJobDescription(f"{name} {KNOB}={thresh}")
        t0 = time.perf_counter()
        df = reg[name].fn(spark, sf1)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        plan = df._jdf.queryExecution().executedPlan().toString()
        smj = plan.count("SortMergeJoin")
        shj = plan.count("ShuffledHashJoin")
        print(f"  {name} thresh={thresh}: {dt:.3f}s SMJ={smj} SHJ={shj}")
        return dt

    for name in QUERIES:
        # warm-up both paths once (codegen, scratch)
        timed(name, "0")
        timed(name, "134217728")
        a = [];  b = []
        for _ in range(REPS):
            a.append(timed(name, "0"))
            b.append(timed(name, "134217728"))
        # row identity: same rows under both settings
        spark.conf.set(KNOB, "0")
        rows_a = sorted(map(str, reg[name].fn(spark, sf1).collect()))
        spark.conf.set(KNOB, "134217728")
        rows_b = sorted(map(str, reg[name].fn(spark, sf1).collect()))
        spark.conf.set(KNOB, "0")
        print(
            f"{name}: SMJ best={min(a):.3f} SHJ best={min(b):.3f} "
            f"rows_identical={rows_a == rows_b} n={len(rows_a)}"
        )


if __name__ == "__main__":
    main()
