"""Aggregate-MV containment rewrite (Hive MaterializedViewAggregateRule
family, ref ql/.../optimizer/calcite/rules/views/HiveMaterializedViewRule
.java): rollup answers from the MV must equal direct aggregation over the
base table, and non-derivable queries must be rejected, not silently
answered wrong."""

import pytest
from pyspark.sql import functions as F

from hive_spark.operators import views
from hive_spark.plans import AggregateMV


@pytest.fixture(scope="module")
def mv(spark, sf_dir, tmp_path_factory):
    base = views(spark, sf_dir)["lineitem"].select(
        "l_returnflag",
        "l_linestatus",
        F.col("l_quantity").cast("decimal(18,2)").alias("qty"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
    )
    return base, AggregateMV(
        spark,
        "t_lineitem",
        base,
        ["l_returnflag", "l_linestatus"],
        {
            "s_qty": ("sum", "qty"),
            "c_qty": ("count", "qty"),
            "n": ("count", "*"),
            "mn_price": ("min", "price"),
            "mx_price": ("max", "price"),
        },
        root=str(tmp_path_factory.mktemp("aggmv")),
    )


def _rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


def test_rollup_matches_base(mv):
    base, m = mv
    got = m.answer(
        ["l_returnflag"],
        {"sum_qty": ("sum", "qty"), "n_rows": ("count", "*"),
         "mx": ("max", "price")},
    )
    want = base.groupBy("l_returnflag").agg(
        F.sum("qty").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
        F.max("price").alias("mx"),
    )
    assert _rows(got.select("l_returnflag", "sum_qty", "n_rows", "mx"),
                 "l_returnflag") == _rows(want, "l_returnflag")


def test_avg_derived_from_sum_and_count(mv):
    base, m = mv
    got = _rows(m.answer(["l_linestatus"], {"avg_qty": ("avg", "qty")}),
                "l_linestatus")
    want = _rows(
        base.groupBy("l_linestatus").agg(
            (F.sum("qty").cast("double") / F.count("qty")).alias("avg_qty")
        ),
        "l_linestatus",
    )
    assert got == want


def test_group_key_filter_commutes(mv):
    base, m = mv
    got = m.answer(
        ["l_returnflag"],
        {"n_rows": ("count", "*")},
        where=F.col("l_linestatus") == "F",
    )
    want = (
        base.filter(F.col("l_linestatus") == "F")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    assert _rows(got, "l_returnflag") == _rows(want, "l_returnflag")


def test_rejects_uncontained_queries(mv):
    _, m = mv
    # group key outside the MV's keys
    assert not m.can_answer(["l_shipmode"], {"n": ("count", "*")})
    # aggregate with no stored partial
    assert not m.can_answer(["l_returnflag"], {"s": ("sum", "price")})
    # avg needs BOTH sum and count partials; price has min/max only
    assert not m.can_answer(["l_returnflag"], {"a": ("avg", "price")})
    # non-derivable aggregate function
    assert not m.can_answer(["l_returnflag"], {"d": ("count_distinct", "qty")})
    with pytest.raises(ValueError, match="not contained"):
        m.answer(["l_shipmode"], {"n": ("count", "*")})


def test_rejects_filter_on_collapsed_column(mv):
    _, m = mv
    with pytest.raises(ValueError, match="non-group-key"):
        m.answer(
            ["l_returnflag"],
            {"n_rows": ("count", "*")},
            where=F.col("s_qty") > 0,
        )


def test_registry_query_runs(spark, sf_dir):
    from hive_spark.operators.misc import mv_rollup_containment

    out = mv_rollup_containment(spark, sf_dir).collect()
    assert len(out) == 3  # A / N / R
    assert {r.l_returnflag for r in out} == {"A", "N", "R"}


def test_try_rewrite_plain_rollup(spark, mv):
    base, m = mv
    q = base.groupBy("l_returnflag").agg(
        F.sum("qty").alias("sq"), F.count(F.lit(1)).alias("n")
    )
    rewritten = m.try_rewrite(q)
    assert rewritten is not None
    assert _rows(rewritten.select("l_returnflag", "sq", "n"), "l_returnflag") == _rows(
        q, "l_returnflag"
    )
    # and it actually reads the MV relation (partial columns s_qty/n),
    # not the base lineitem scan
    plan = rewritten._jdf.queryExecution().optimizedPlan().toString()
    assert "s_qty" in plan and "l_quantity" not in plan


def test_try_rewrite_filtered_and_avg(spark, mv):
    base, m = mv
    q = (
        base.filter(F.col("l_linestatus") == "O")
        .groupBy("l_returnflag")
        .agg(F.avg("qty").alias("aq"), F.max("price").alias("mx"))
    )
    rewritten = m.try_rewrite(q)
    assert rewritten is not None
    want = (
        base.filter(F.col("l_linestatus") == "O")
        .groupBy("l_returnflag")
        .agg(
            (F.sum("qty").cast("double") / F.count("qty")).alias("aq"),
            F.max("price").alias("mx"),
        )
    )
    assert _rows(rewritten.select("l_returnflag", "aq", "mx"), "l_returnflag") == _rows(
        want, "l_returnflag"
    )


def test_try_rewrite_distinct_and_filter_rejected(spark, mv):
    """r6 ADVICE high (AggregateMV flavor): DISTINCT aggregates and
    FILTER clauses are not derivable from plain partials — must miss."""
    base, m = mv
    assert m.try_rewrite(
        base.groupBy("l_returnflag").agg(F.sum_distinct("qty").alias("s"))
    ) is None
    assert m.try_rewrite(
        base.groupBy("l_returnflag").agg(
            F.expr("sum(qty) FILTER (WHERE l_linestatus = 'F')").alias("s")
        )
    ) is None


def test_try_rewrite_declines_uncontained(spark, sf_dir, mv):
    base, m = mv
    # filter on a non-group-key column
    assert m.try_rewrite(
        base.filter(F.col("qty") > 10).groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("n")
        )
    ) is None
    # aggregate with no stored partial (sum of price)
    assert m.try_rewrite(
        base.groupBy("l_returnflag").agg(F.sum("price").alias("sp"))
    ) is None
    # different base relation entirely
    other = views(spark, sf_dir)["orders"].select(
        F.col("o_orderstatus").alias("l_returnflag"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("qty"),
    )
    assert m.try_rewrite(
        other.groupBy("l_returnflag").agg(F.sum("qty").alias("s"))
    ) is None
    # not an aggregate at all
    assert m.try_rewrite(base.select("qty")) is None


def test_incremental_refresh_equals_full_rebuild(spark, sf_dir, tmp_path):
    base = views(spark, sf_dir)["lineitem"].select(
        "l_returnflag",
        F.col("l_quantity").cast("decimal(18,2)").alias("qty"),
        "l_orderkey",
    )
    old = base.filter("l_orderkey % 4 != 0").drop("l_orderkey")
    delta = base.filter("l_orderkey % 4 = 0").drop("l_orderkey")
    measures = {
        "s": ("sum", "qty"), "c": ("count", "qty"), "n": ("count", "*"),
        "mn": ("min", "qty"), "mx": ("max", "qty"),
    }
    inc = AggregateMV(spark, "inc", old, ["l_returnflag"], measures,
                      root=str(tmp_path))
    inc.refresh_incremental(delta)
    full = AggregateMV(spark, "full", base.drop("l_orderkey"),
                       ["l_returnflag"], measures, root=str(tmp_path))
    q = {"s": ("sum", "qty"), "n": ("count", "*"), "a": ("avg", "qty"),
         "mn": ("min", "qty"), "mx": ("max", "qty")}
    got = _rows(inc.answer(["l_returnflag"], q), "l_returnflag")
    want = _rows(full.answer(["l_returnflag"], q), "l_returnflag")
    assert got == want
    # a second refresh on an already-refreshed MV stays exact (type
    # widening is capped, merge rules are idempotent over new deltas)
    inc.refresh_incremental(delta.limit(0))
    assert _rows(inc.answer(["l_returnflag"], q), "l_returnflag") == want


# ---------------------------------------------------------------------------
# Star-join MV (r5): join-containment rewrite
# (HiveMaterializedViewRule join derivability + residual dimensions)


@pytest.fixture(scope="module")
def star_mv(spark, sf_dir, tmp_path_factory):
    from hive_spark.operators.tpcds import _register_star
    from hive_spark.plans.star_mv import StarJoinMV

    _register_star(spark, sf_dir)
    mv = StarJoinMV(
        spark,
        "t_star",
        spark.table("store_sales"),
        [(spark.table("date_dim"), "ss_sold_date_sk", "d_date_sk"),
         (spark.table("item"), "ss_item_sk", "i_item_sk")],
        ["d_year", "d_moy", "i_brand", "i_brand_id", "i_manufact_id",
         "ss_store_sk"],
        {"sum_cents": ("sum",
                       "CAST(round(ss_ext_sales_price * 100) AS BIGINT)"),
         "n": ("count", "*")},
        root=str(tmp_path_factory.mktemp("starmv")),
    )
    return mv


def test_star_mv_q3_family_hit(spark, star_mv):
    """Same joins + dim filters + coarser GROUP BY: answered from the MV
    with NO fact relation in the executed plan."""
    q = spark.sql("""
        SELECT dt.d_year, item.i_brand_id AS brand_id,
               SUM(CAST(round(ss_ext_sales_price * 100) AS BIGINT)) AS s
        FROM date_dim dt, store_sales, item
        WHERE dt.d_date_sk = store_sales.ss_sold_date_sk
          AND store_sales.ss_item_sk = item.i_item_sk
          AND dt.d_moy = 12
        GROUP BY dt.d_year, item.i_brand_id
    """)
    hit = star_mv.try_rewrite(q)
    assert hit is not None
    assert sorted(map(tuple, hit.collect())) == sorted(map(tuple, q.collect()))
    plan = hit._jdf.queryExecution().executedPlan().toString()
    # the MV-only schema column proves the MV parquet scan (the path
    # itself can be elided from toString under long tmp roots)
    assert "sum_cents" in plan
    assert "lineitem" not in plan  # the fact's backing relation is gone


def test_star_mv_residual_dim_rejoin(spark, star_mv):
    """A query joining an EXTRA dim (store, not in the MV) through an MV
    group key is answered by re-joining store onto the rolled-up MV."""
    q = spark.sql("""
        SELECT d_year, s_county,
               SUM(CAST(round(ss_ext_sales_price * 100) AS BIGINT)) AS s,
               COUNT(*) AS n
        FROM store_sales, date_dim, item, store
        WHERE ss_sold_date_sk = d_date_sk AND ss_item_sk = i_item_sk
          AND ss_store_sk = s_store_sk
        GROUP BY d_year, s_county
    """)
    hit = star_mv.try_rewrite(q)
    assert hit is not None
    assert sorted(map(tuple, hit.collect())) == sorted(map(tuple, q.collect()))
    plan = hit._jdf.queryExecution().executedPlan().toString()
    assert "sum_cents" in plan and "lineitem" not in plan


def test_star_mv_rejections(spark, star_mv):
    """Filters on collapsed fact columns and non-derivable aggregates
    must MISS (run from base), never be answered wrong."""
    # filter on a non-group-key fact column the MV collapsed
    q1 = spark.sql("""
        SELECT d_year, SUM(CAST(round(ss_ext_sales_price * 100) AS BIGINT)) AS s
        FROM store_sales, date_dim, item
        WHERE ss_sold_date_sk = d_date_sk AND ss_item_sk = i_item_sk
          AND ss_quantity > 10
        GROUP BY d_year
    """)
    assert star_mv.try_rewrite(q1) is None
    # non-derivable aggregate (no avg partials stored for this input)
    q2 = spark.sql("""
        SELECT d_year, MAX(ss_net_profit) AS m
        FROM store_sales, date_dim, item
        WHERE ss_sold_date_sk = d_date_sk AND ss_item_sk = i_item_sk
        GROUP BY d_year
    """)
    assert star_mv.try_rewrite(q2) is None
    # missing one of the MV's joins (query over fact x date only): the
    # MV's item join could DROP fact rows -> must not answer
    q3 = spark.sql("""
        SELECT d_year, SUM(CAST(round(ss_ext_sales_price * 100) AS BIGINT)) AS s
        FROM store_sales, date_dim
        WHERE ss_sold_date_sk = d_date_sk
        GROUP BY d_year
    """)
    assert star_mv.try_rewrite(q3) is None


def test_star_mv_survives_view_reregistration(spark, star_mv):
    """r5/r6 red, fixed: re-registering a source view with the SAME
    definition (which stacks View/SubqueryAlias wrappers — exactly what
    security.py's enable/disable cycle does to every view mid-session)
    must not turn the rewrite into a silent miss. Matching now uses
    sameResult against materialization-time plan handles, the analog of
    Hive re-resolving MV definitions against current metastore state
    (ql/.../calcite/rules/views/HiveMaterializedViewsRegistry.java)."""
    for t in ("date_dim", "item", "store_sales"):
        spark.table(t).createOrReplaceTempView(t)
    q = spark.sql("""
        SELECT d_year, SUM(CAST(round(ss_ext_sales_price * 100) AS BIGINT)) AS s
        FROM store_sales, date_dim, item
        WHERE ss_sold_date_sk = d_date_sk AND ss_item_sk = i_item_sk
        GROUP BY d_year
    """)
    hit = star_mv.try_rewrite(q)
    assert hit is not None
    assert sorted(map(tuple, hit.collect())) == sorted(map(tuple, q.collect()))
    plan = hit._jdf.queryExecution().executedPlan().toString()
    assert "sum_cents" in plan and "lineitem" not in plan


def test_star_mv_stale_source_misses(spark, sf_dir, star_mv):
    """A source re-registered with a DIFFERENT definition (half of item)
    must make the rewrite MISS — never answer from now-stale MV rows
    (Hive gates rewrite on materialization staleness)."""
    import hive_spark.operators.tpcds as tpcds

    try:
        spark.table("item").filter(
            "i_item_sk % 2 = 0"
        ).createOrReplaceTempView("item")
        q = spark.sql("""
            SELECT d_year,
                   SUM(CAST(round(ss_ext_sales_price * 100) AS BIGINT)) AS s
            FROM store_sales, date_dim, item
            WHERE ss_sold_date_sk = d_date_sk AND ss_item_sk = i_item_sk
            GROUP BY d_year
        """)
        assert star_mv.try_rewrite(q) is None
    finally:
        tpcds._ACTIVE_STAR.pop(id(spark), None)
        tpcds._register_star(spark, sf_dir)


def test_star_mv_distinct_and_filter_agg_rejected(spark, star_mv):
    """r6 ADVICE high: a DISTINCT or FILTER aggregate whose input text
    matches a stored partial must MISS — plain partials cannot answer it,
    and the plain result provably differs from the distinct one."""
    tpl = """
        SELECT d_year,
               SUM({d}CAST(round(ss_ext_sales_price * 100) AS BIGINT)){f} AS s
        FROM store_sales, date_dim, item
        WHERE ss_sold_date_sk = d_date_sk AND ss_item_sk = i_item_sk
        GROUP BY d_year
    """
    q_distinct = spark.sql(tpl.format(d="DISTINCT ", f=""))
    assert star_mv.try_rewrite(q_distinct) is None
    q_filter = spark.sql(
        tpl.format(d="", f=" FILTER (WHERE ss_store_sk > 2)")
    )
    assert star_mv.try_rewrite(q_filter) is None
    # the guard matters: the old code would have merged NON-distinct
    # partials, whose result differs from the true distinct sum
    q_plain = spark.sql(tpl.format(d="", f=""))
    assert sorted(map(tuple, q_distinct.collect())) != sorted(
        map(tuple, q_plain.collect())
    )


def test_star_mv_duplicate_dim_rejected(spark, star_mv):
    """r6 ADVICE low: referencing an MV dimension twice must fail the
    (multiset) containment check, not collapse onto one leaf with the
    duplicate's filter misapplied to MV rows."""
    q = spark.sql("""
        SELECT d1.d_year,
               SUM(CAST(round(ss_ext_sales_price * 100) AS BIGINT)) AS s
        FROM store_sales, date_dim d1, date_dim d2, item
        WHERE ss_sold_date_sk = d1.d_date_sk
          AND ss_sold_date_sk = d2.d_date_sk
          AND ss_item_sk = i_item_sk AND d2.d_moy = 12
        GROUP BY d1.d_year
    """)
    assert star_mv.try_rewrite(q) is None


def test_star_mv_registry_query(spark, sf_dir):
    """The registry entry transparently hits the MV (plan check) and its
    result survives the rewrite (oracle parity is the driver's check)."""
    from hive_spark.operators.misc import mv_star_join

    out = mv_star_join(spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "q3_family_" in plan and "lineitem" not in plan
    assert out.columns == ["d_year", "brand_id", "brand", "sum_agg"]
    out.collect()
