"""Scan-level evidence for the r9 date-clustered star layout: time a
scan-bound aggregate over the materialized store_sales fact, with and
without the November-1996 date range (the q19 predicate), on the OLD
(unsorted) vs NEW (repartitionByRange + sortWithinPartitions on
ss_sold_date_sk) layout dirs. The aggregate sums every money column so
column pruning cannot hide the I/O. Row-group skipping only exists when
the pushed range meets clustered min/max stats — i.e. on the new layout.

Usage: python scripts/datesort_probe_r9.py <old_star_dir> <new_star_dir>
"""
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from hive_spark.session import get_session  # noqa: E402

old_dir, new_dir = sys.argv[1], sys.argv[2]
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_session(
    app_name="datesort_probe",
    master=f"local[{CPUS}]",
    shuffle_partitions=int(CPUS),
)

AGG = (
    "count(*) AS n, sum(ss_ext_sales_price) AS a, sum(ss_ext_list_price)"
    " AS b, sum(ss_ext_tax) AS c, sum(ss_coupon_amt) AS d,"
    " sum(ss_quantity) AS e, sum(ss_net_profit) AS f"
)


def best3(df):
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


for label, d in (("old-unsorted", old_dir), ("new-datesorted", new_dir)):
    ss = spark.read.parquet(os.path.join(d, "store_sales"))
    ss.createOrReplaceTempView("probe_ss")
    full = spark.sql(f"SELECT {AGG} FROM probe_ss")
    rng = spark.sql(
        f"SELECT {AGG} FROM probe_ss"
        " WHERE ss_sold_date_sk BETWEEN 19961101 AND 19961130"
    )
    # warm (footers + codegen)
    full.write.format("noop").mode("overwrite").save()
    rng.write.format("noop").mode("overwrite").save()
    tf, tr = best3(full), best3(rng)
    nrows = rng.collect()[0][0]
    size = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(os.path.join(d, "store_sales"))
        for f in fs
    )
    print(
        f"{label}: bytes={size/1e6:.1f}MB full-scan={tf:.3f}s"
        f" nov96-range={tr:.3f}s range-rows={nrows}"
    )
