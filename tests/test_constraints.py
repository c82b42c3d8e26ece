"""Constraint surface: informational metadata + on-demand validation
(Hive ALTER TABLE ADD CONSTRAINT ... RELY NOVALIDATE). Checks are
single-scan aggregations / broadcast anti-joins — the shapes that hold
on a 100 TB fact table."""

import pytest

from hive_spark.ddl import Constraint, ConstraintRegistry
from hive_spark.operators import views


@pytest.fixture(scope="module")
def tables(spark, sf_dir):
    return views(spark, sf_dir)


def test_valid_constraints_report_zero(spark, tables):
    reg = ConstraintRegistry()
    reg.add(Constraint("primary_key", "nation", ("n_nationkey",), rely=True))
    reg.add(Constraint("unique", "region", ("r_name",)))
    reg.add(Constraint("not_null", "orders", ("o_orderkey",)))
    reg.add(Constraint("check", "lineitem", ("l_quantity",),
                       check_expr="l_quantity >= 0"))
    reg.add(
        Constraint(
            "foreign_key", "lineitem", ("l_orderkey",),
            ref_table="orders", ref_cols=("o_orderkey",),
        )
    )
    result = reg.validate(spark, tables)
    assert set(result.values()) == {0}, result


def test_violations_are_counted(spark, tables):
    reg = ConstraintRegistry()
    # l_orderkey is NOT unique in lineitem (multi-line orders)
    reg.add(Constraint("primary_key", "lineitem", ("l_orderkey",)))
    # no customer has a negative account balance check that fails broadly
    reg.add(Constraint("check", "customer", ("c_acctbal",),
                       check_expr="c_acctbal > 99999999"))
    result = reg.validate(spark, tables)
    assert all(v > 0 for v in result.values()), result


def test_fk_orphans_detected(spark, tables):
    from pyspark.sql import functions as F

    bad_child = tables["lineitem"].select("l_orderkey").limit(10).withColumn(
        "l_orderkey", F.col("l_orderkey") + 10_000_000_000
    )
    reg = ConstraintRegistry()
    reg.add(
        Constraint(
            "foreign_key", "bad_child", ("l_orderkey",),
            ref_table="orders", ref_cols=("o_orderkey",),
        )
    )
    result = reg.validate(spark, {**tables, "bad_child": bad_child})
    assert list(result.values()) == [10]


def test_unknown_kind_rejected():
    with pytest.raises(ValueError):
        ConstraintRegistry().add(Constraint("exotic", "t", ("c",)))
