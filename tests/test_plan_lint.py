"""Registry-wide physical-plan lint.

Every registered query's plan is checked for the anti-patterns that break
at 100 TB. A query may only exhibit one if it is explicitly whitelisted
(with the reason documented here):

- CartesianProduct / BroadcastNestedLoopJoin: quadratic — only the
  deliberate cross-join demos and the ANN brute-force baseline (bounded
  query side) may contain one.
- BatchEvalPython (row-at-a-time Python UDF): only the documented
  cold-path compat functions (field/likeany/likeall demo) may use it;
  Arrow paths (ArrowEvalPython / mapInPandas / FlatMapGroupsInPandas)
  are the sanctioned Python lanes and are allowed.
"""

import contextlib
import io

import pytest

from hive_spark.operators import full_registry

# queries allowed to contain a quadratic join operator
CARTESIAN_OK = {
    "join_cross",        # deliberate CROSS JOIN demo
    "join_nonequi",      # theta join: range predicate -> BNLJ by design
    "knn_brute_force",   # exact ANN baseline: bounded query side x table
    "values_inline",     # literal VALUES cross with 1-row subquery
    "subquery_scalar",   # scalar subquery joined broadcast-nested-loop
    "tpch_q11",          # scalar subquery threshold (1-row side)
    "tpch_q15",          # scalar MAX subquery (1-row side)
    "tpch_q17",          # correlated avg: decorrelated scalar join
    "tpch_q22",          # scalar avg subquery (1-row side)
    "edge_exact_percentile",  # percentile literal array cross
    "text_tfidf_topk",   # corpus-size scalar (1-row n_docs) cross
    "knn_ivf_assign",    # K tiny centroids broadcast against the scan
    "knn_ivf_probe",     # same K-centroid broadcast, assign + probe sides
    "kmeans_one_round",  # same centroid-broadcast shape, twice
    "text_decontaminate",  # tiny denylist broadcast, contains-join
    "sketch_hll_cross_table_union",  # 1-row estimate x 1-row exact count
    "sketch_theta_set_algebra",  # two 1-row sketches crossed for algebra
    "sketch_kll_quantiles",  # <=2*groups quantile rows NLJ'd over the fact
    "sketch_freq_items",  # 1-row residual bound crossed with top-10
    "tpcds_q88_time_bands",  # q88 shape: 1-row time-band counts crossed
    "tpcds_q61_promo_ratio",  # q61 shape: two 1-row star aggs crossed
    "sketch_tuple_sum",  # 1-row estimators crossed with 1-row exact
    "tpcds_q90_am_pm_ratio",  # q90 shape: two 1-row band counts crossed
    "edge_outer_join_filter",  # two 1-row ON/WHERE count rows crossed
    "tpcds_q23_frequent_best",  # 1-row MAX(csales) threshold crossed
    # The next three touch the derived `inventory` star view, whose
    # DEFINITION is a part x month grid generator (a deliberate cross
    # producing the table itself, linear in its output size). The query
    # shapes on top are equi-joins; a stored inventory table would show
    # no cartesian.
    "tpcds_q21_inventory_split",
    "tpcds_q72_low_inventory",
    "tpcds_q82_inventory_price",
    "tpcds_q39_inventory_cov",
    "tpcds_q22_inventory_rollup",
    "tpcds_q37_catalog_inventory_price",
    # q9/q28 shape: N single-row scalar subqueries crossed into one row
    "tpcds_q9_quantity_buckets",
    "tpcds_q28_price_band_crosses",
}

# queries allowed a row-at-a-time Python UDF
PY_UDF_OK = {
    "func_string",  # demos the registered compat UDFs (field/likeany/likeall)
}


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    out = {}
    for name, spec in full_registry().items():
        if name.startswith(("stream_", "dml_")) or name in (
            "training_data_pipeline",
        ):
            # side-effecting pipelines execute on build; lint their final
            # read-back separately via their own tests
            continue
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            spec.fn(spark, sf_dir).explain("formatted")
        out[name] = buf.getvalue()
    return out


def test_no_unexpected_cartesian(plans):
    offenders = [
        n
        for n, p in plans.items()
        if ("CartesianProduct" in p or "BroadcastNestedLoopJoin" in p)
        and n not in CARTESIAN_OK
    ]
    assert not offenders, f"quadratic joins outside whitelist: {offenders}"


def test_no_unexpected_python_row_udfs(plans):
    offenders = [
        n for n, p in plans.items() if "BatchEvalPython" in p and n not in PY_UDF_OK
    ]
    assert not offenders, f"row-at-a-time Python UDFs outside whitelist: {offenders}"


def test_scans_prune_columns(plans):
    """Lineitem scans must never read all 11 columns — every registry
    query projects a subset, so ReadSchema must too."""
    for name, p in plans.items():
        for seg in p.split("ReadSchema: ")[1:]:
            schema_line = seg.splitlines()[0]
            if "l_orderkey" in schema_line or "l_partkey" in schema_line:
                n_cols = schema_line.count(":")
                assert n_cols < 11, f"{name} scans full lineitem: {schema_line}"
