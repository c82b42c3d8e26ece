"""Property-based checks (hypothesis) for the engine's algebraic
components: transformations that claim result-equivalence must hold it on
arbitrary data, not just the fixtures — the same invariants that make
them safe at any partitioning/scale.

Kept intentionally small (few examples, tiny frames): each example pays
Spark job overhead, and the properties are about algebra, not volume."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

KEYS = st.one_of(st.none(), st.sampled_from(["a", "b", "c", "d"]))
ROWS = st.lists(st.tuples(KEYS, st.integers(-10**6, 10**6)), min_size=1, max_size=40)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(rows=ROWS, salt=st.sampled_from([1, 3, 16]))
@settings(**_SETTINGS)
def test_salted_agg_equals_direct(spark, rows, salt):
    from hive_spark.plans import salted_agg_count

    df = spark.createDataFrame(rows, "k string, v long")
    got = {
        (r.k,): (r.n, r.sum_v)
        for r in salted_agg_count(df, "k", salt=salt, agg_col="v").collect()
    }
    want = {
        (r.k,): (r.n, r.s)
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(30,4)")).cast("decimal(38,4)").alias("s"),
        )
        .collect()
    }
    assert got == want


@given(rows=ROWS, roll_to=st.sampled_from(["k1", "k2"]))
@settings(**_SETTINGS)
def test_mv_rollup_equals_direct(spark, tmp_path_factory, rows, roll_to):
    from hive_spark.plans import AggregateMV

    df = spark.createDataFrame(
        [(k, ("x" if v % 2 else "y"), v) for k, v in rows], "k1 string, k2 string, v long"
    )
    mv = AggregateMV(
        spark,
        "prop_mv",
        df,
        ["k1", "k2"],
        {"s": ("sum", "v"), "c": ("count", "v"), "n": ("count", "*"),
         "mn": ("min", "v"), "mx": ("max", "v")},
        root=str(tmp_path_factory.mktemp("prop_aggmv")),
    )
    got = {
        tuple(r)[:1]: tuple(r)[1:]
        for r in mv.answer(
            [roll_to],
            {"s": ("sum", "v"), "n": ("count", "*"),
             "mn": ("min", "v"), "mx": ("max", "v")},
        ).collect()
    }
    want = {
        tuple(r)[:1]: tuple(r)[1:]
        for r in df.groupBy(roll_to)
        .agg(
            F.sum("v").alias("s"),
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    assert got == want
