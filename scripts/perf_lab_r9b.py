"""r9 optimization-round lab, session 2: interleaved best-of-N A/B of
candidate rewrites vs the current registry implementation, with a
row-identity check so a faster-but-wrong variant can never win.

This session's hypothesis family: the star date_dim is DERIVED with
d_date_sk = yyyyMMdd over a fixed 1992-01-01..1998-12-31 calendar, so
every contiguous dim date predicate (d_year/*_month_seq/d_date ranges)
is a CLOSED-FORM range on the fact's *_sold_date_sk column — a literal
BETWEEN the optimizer cannot infer across the join, but we can (guide
§8 "use what you know that the optimizer does not"). The dim join stays
(exact membership); the injected range is a provable superset filter,
so results are identical — and it reaches PushedFilters at the parquet
scan, where a date-clustered file layout can skip row groups wholesale.

Usage: python scripts/perf_lab_r9b.py <experiment> [sf_dir] [reps]
Experiments: q19 | q25 | q98 | q38 | q75 | q68 | q4 |
             events_repart | events_localmerge

NOTE (post-decision): the q19/q25/q98/q38/q75 injections were SHIPPED
into the registry after these A/Bs (operators/tpcds.py
_DATE_RANGE_INJECTIONS, tpcds2.py), so re-running those experiments now
compares injected vs injected — the historical numbers live in
OPTIMIZATION_r09.md and bench_artifacts/datesort_probe_r9.md. The
events_* variants were rejected on measurement and remain variants.
"""
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from hive_spark.session import get_session  # noqa: E402
from hive_spark.operators import full_registry, views  # noqa: E402

SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 4
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _inject(body: str, marker: str, extra: str, n: int = 1) -> str:
    """Insert `extra` right after every `marker` occurrence; assert the
    marker count so a drifted body fails loudly instead of silently
    skipping the filter."""
    assert body.count(marker) == n, (marker, body.count(marker), n)
    return body.replace(marker, marker + extra)


def q19_variant(spark, sf_dir):
    from hive_spark.operators.tpcds import _Q19, _register_star

    _register_star(spark, sf_dir)
    body = _inject(
        _Q19,
        "WHERE d_date_sk = ss_sold_date_sk",
        "\n  AND ss_sold_date_sk BETWEEN 19961101 AND 19961130",
    )
    return spark.sql(body)


def q25_variant(spark, sf_dir):
    from hive_spark.operators.tpcds import _Q25, _register_star

    _register_star(spark, sf_dir)
    body = _inject(
        _Q25,
        "AND d1.d_moy = 4 AND d1.d_year = 1996",
        "\n    AND ss_sold_date_sk BETWEEN 19960401 AND 19960430",
    )
    body = _inject(
        body,
        "AND d2.d_moy BETWEEN 4 AND 10 AND d2.d_year = 1996",
        "\n          AND sr_returned_date_sk BETWEEN 19960401 AND 19961031",
    )
    return spark.sql(body)


def q98_variant(spark, sf_dir):
    from hive_spark.operators.tpcds import _Q98, _register_star

    _register_star(spark, sf_dir)
    body = _inject(
        _Q98,
        "AND d_date BETWEEN DATE '1996-01-12' AND DATE '1996-02-11'",
        "\n  AND ss_sold_date_sk BETWEEN 19960112 AND 19960211",
    )
    return spark.sql(body)


def q38_variant(spark, sf_dir):
    from hive_spark.operators.tpcds import _register_star

    _register_star(spark, sf_dir)
    date_f = spark.table("date_dim").filter(
        "d_month_seq BETWEEN 49 AND 60"
    ).select("d_date_sk")
    chans = [
        ("store_sales", "ss_sold_date_sk", "ss_customer_sk"),
        ("web_sales", "ws_sold_date_sk", "ws_bill_customer_sk"),
        ("catalog_sales", "cs_sold_date_sk", "cs_bill_customer_sk"),
    ]
    parts = [
        spark.table(tbl)
        # month_seq 49..60 == calendar year 1996 (d_month_seq =
        # (year-1992)*12 + month, d_date_sk = yyyyMMdd)
        .filter(F.col(datecol).between(19960101, 19961231))
        .join(F.broadcast(date_f), F.col(datecol) == F.col("d_date_sk"))
        .select(F.col(cust).alias("customer_sk"),
                F.lit(1 << i).alias("ch_bit"))
        for i, (tbl, datecol, cust) in enumerate(chans)
    ]
    u = parts[0].unionAll(parts[1]).unionAll(parts[2])
    mask = (
        u.groupBy("customer_sk")
        .agg(F.expr("bit_or(ch_bit)").alias("mask"))
        .filter("mask = 7")
    )
    return mask.agg(F.count(F.lit(1)).alias("cnt"))


def q75_variant(spark, sf_dir):
    from hive_spark.operators.tpcds import _register_star
    from hive_spark.operators.tpcds2 import _Q75_ONEPASS

    _register_star(spark, sf_dir)
    body = _Q75_ONEPASS
    for dc in ("cs_sold_date_sk", "ss_sold_date_sk", "ws_sold_date_sk"):
        body = _inject(
            body,
            f"JOIN date_dim ON d_date_sk = {dc}",
            f" AND {dc} BETWEEN 19960101 AND 19971231",
        )
    return spark.sql(body)


def q68_variant(spark, sf_dir):
    from hive_spark.operators.tpcds import _Q68, _register_star

    _register_star(spark, sf_dir)
    body = _inject(
        _Q68,
        "WHERE ss_sold_date_sk = d_date_sk",
        "\n        AND ss_sold_date_sk BETWEEN 19950101 AND 19971231",
    )
    return spark.sql(body)


def q4_variant(spark, sf_dir):
    from hive_spark.operators.tpcds import _register_star
    from hive_spark.operators import tpcds3

    _register_star(spark, sf_dir)
    cte = tpcds3._Q4_CTE
    for dc in ("ss_sold_date_sk", "cs_sold_date_sk", "ws_sold_date_sk"):
        cte = _inject(
            cte,
            f"WHERE {dc} = d_date_sk AND d_year IN (1996, 1997)",
            f"\n    AND {dc} BETWEEN 19960101 AND 19971231",
        )
    yt = spark.sql(cte)
    yt.persist()
    yt.createOrReplaceTempView("yt4_spool_lab")
    return spark.sql(tpcds3._Q4_OUTER.format(yt="yt4_spool_lab"))


def events_repart_variant(spark, sf_dir):
    """Exchange RAW (ts,user,value) rows by user_id BEFORE the
    session_window aggregation: the native plan's pre-exchange partial
    agg keys on the per-row session struct (nothing collapses), so the
    exchange ships struct+partial-agg rows ~2x the size of the raw ones
    (guide §2.3 'project before the exchange' / shuffle fewer bytes)."""
    views(spark, sf_dir)
    df = spark.table("events").select("ts", "user_id", "value")
    return (
        df.repartition("user_id")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_millis(F.col("w.start").cast("timestamp")).alias("session_start"),
            "n_events",
            F.col("sum_value").cast("decimal(28,4)").alias("sum_value"),
        )
        .orderBy("user_id", "session_start")
    )


_LOCAL_MERGE = "spark.sql.streaming.sessionWindow.merge.sessions.in.local.partition"


def events_localmerge_variant(spark, sf_dir):
    """Native plan but with local session merging before the shuffle:
    the partial side sorts and MERGES sessions per map partition, so the
    exchange ships ~sessions instead of ~events (guide §2.3 'aggregate
    before you shuffle')."""
    spark.conf.set(_LOCAL_MERGE, "true")
    try:
        reg = full_registry()
        return reg["events_session"].fn(spark, sf_dir)
    finally:
        pass  # conf reset handled by the runner after the action


VARIANTS = {
    "q19": ("tpcds_q19", q19_variant),
    "q25": ("tpcds_q25_sales_returns", q25_variant),
    "q98": ("tpcds_q98_class_ratio", q98_variant),
    "q38": ("tpcds_q38_channel_intersect", q38_variant),
    "q75": ("tpcds_q75_prior_year_delta", q75_variant),
    "q68": ("tpcds_q68", q68_variant),
    "q4": ("tpcds_q4_three_channel_growth", q4_variant),
    "events_repart": ("events_session", events_repart_variant),
    "events_localmerge": ("events_session", events_localmerge_variant),
}


def canon_rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(x) for x in r) for r in df.select(*cols).collect())


def main():
    exp = sys.argv[1]
    name, variant = VARIANTS[exp]
    spark = get_session(
        app_name=f"perf_lab_r9b_{exp}",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    reg = full_registry()
    base_fn = reg[name].fn

    def run_b(sf):
        df = variant(spark, sf)
        df.write.format("noop").mode("overwrite").save()
        if exp == "events_localmerge":
            spark.conf.unset(_LOCAL_MERGE)

    # warm-up both
    for df in views(spark, SF).values():
        df.limit(1).count()
    base_fn(spark, SF).write.format("noop").mode("overwrite").save()
    run_b(SF)
    # row identity
    a = canon_rows(base_fn(spark, SF))
    if exp == "events_localmerge":
        spark.conf.set(_LOCAL_MERGE, "true")
    b = canon_rows(variant(spark, SF))
    if exp == "events_localmerge":
        spark.conf.unset(_LOCAL_MERGE)
    assert a == b, f"ROWS DIFFER: base={len(a)} variant={len(b)}"
    print(f"rows identical: {len(a)}")
    ta, tb = [], []
    for _ in range(REPS):
        if exp == "q4":
            # q4 persists its CTE; without clearing, every rep after the
            # first measures the cache read, not the fact legs under test
            spark.catalog.clearCache()
        t0 = time.perf_counter()
        base_fn(spark, SF).write.format("noop").mode("overwrite").save()
        ta.append(time.perf_counter() - t0)
        if exp == "q4":
            spark.catalog.clearCache()
        t0 = time.perf_counter()
        run_b(SF)
        tb.append(time.perf_counter() - t0)
    fmt = lambda xs: "[" + ", ".join(f"{x:.3f}" for x in xs) + f"] best={min(xs):.3f}"
    print(f"base    {name}: {fmt(ta)}")
    print(f"variant {name}: {fmt(tb)}")


if __name__ == "__main__":
    main()
