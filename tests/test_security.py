"""Policy-driven masking / row filtering (SemanticAnalyzer
applyRowFilterAndColumnMasking analog)."""

from pyspark.sql import functions as F

from hive_spark.operators import views
from hive_spark.security import (
    TablePolicy,
    disable,
    drop_policy,
    enable_for_user,
    register_policy,
)


def _policy():
    return TablePolicy(
        table="customer",
        column_masks={"c_name": "concat('XXXX', substr({col}, -2))"},
        row_filter="c_nationkey % 5 = 0",
        users={"analyst"},
    )


def test_policy_masks_for_governed_user_only(spark, sf_dir):
    views(spark, sf_dir)
    register_policy(_policy())
    try:
        n_all = spark.table("customer").count()
        enable_for_user(spark, "analyst")
        governed = spark.table("customer")
        assert governed.count() < n_all  # row filter applied
        assert governed.filter(~F.col("c_name").startswith("XXXX")).count() == 0
        assert governed.columns == spark.table("customer__unmasked").columns

        # an exempt user sees the pristine relation
        enable_for_user(spark, "admin")
        assert spark.table("customer").count() == n_all
        assert (
            spark.table("customer")
            .filter(F.col("c_name").startswith("XXXX"))
            .count()
            == 0
        )
    finally:
        disable(spark)
        drop_policy("customer")
    assert spark.table("customer").count() == n_all  # restored


def test_row_filter_reaches_scan(spark, sf_dir):
    """The rewrite's row filter must behave like ordinary predicate
    pushdown: it appears as a Filter directly over the relation, before
    any downstream operator a user query adds."""
    views(spark, sf_dir)
    register_policy(_policy())
    try:
        enable_for_user(spark, "analyst")
        plan = spark.sql(
            "SELECT COUNT(*) AS n FROM customer"
        )._jdf.queryExecution().executedPlan().toString()
        assert "c_nationkey" in plan  # filter present in the physical plan
    finally:
        disable(spark)
        drop_policy("customer")


def test_disable_restores_after_policy_dropped(spark):
    """drop_policy while masking is enabled must not strand the masked
    view: disable() restores from the enable-time record, not the live
    policy dict."""
    from hive_spark import security

    spark.createDataFrame(
        [(1, "alice"), (2, "bob")], "id int, name string"
    ).createOrReplaceTempView("gov_drop_demo")
    security.register_policy(
        security.TablePolicy(
            table="gov_drop_demo",
            column_masks={"name": "concat('XXX', substr({col}, -1))"},
        )
    )
    try:
        security.enable_for_user(spark, "analyst")
        assert spark.table("gov_drop_demo").collect()[0].name.startswith("XXX")
        security.drop_policy("gov_drop_demo")  # dropped WHILE enabled
        security.disable(spark)
        names = {r.name for r in spark.table("gov_drop_demo").collect()}
        assert names == {"alice", "bob"}  # pristine relation restored
        # stash view cleaned up too
        assert not any(
            t.name == "gov_drop_demo__unmasked"
            for t in spark.catalog.listTables()
        )
    finally:
        security.drop_policy("gov_drop_demo")
        security.disable(spark)
        spark.catalog.dropTempView("gov_drop_demo")
