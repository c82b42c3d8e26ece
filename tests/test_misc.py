"""Approx sketches / virtual columns / uniontype emulation."""

import pytest

from hive_spark.operators import misc
from tests.oracle_check import compare


@pytest.mark.parametrize(
    "name", sorted(k for k, v in misc.REGISTRY.items() if v.oracle)
)
def test_misc_oracle(spark, sf_dir, name):
    spec = misc.REGISTRY[name]
    compare(spec.fn(spark, sf_dir), spec.oracle, sf_dir)


def test_approx_sketches_bounded_error(spark, sf_dir):
    rows = {r.l_returnflag: r for r in misc.approx_sketches(spark, sf_dir).collect()}
    exact = {
        r.l_returnflag: r
        for r in spark.sql(
            """SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS n,
                      percentile(l_quantity, 0.5) AS med
               FROM lineitem GROUP BY l_returnflag"""
        ).collect()
    }
    for flag, r in rows.items():
        assert abs(r.approx_orders - exact[flag].n) / exact[flag].n < 0.05
        assert abs(r.approx_median_qty - exact[flag].med) <= 2.0
