"""Scheduled queries (ScheduledQueryExecutionService analog)."""

from datetime import datetime

import pytest

from hive_spark.operators import views
from hive_spark.scheduled import (
    ScheduledQueryRegistry,
    cron_matches,
    normalize_cron,
)


def test_cron_normalization_and_matching():
    # Quartz 7-field (Hive's native spelling) -> standard 5
    assert normalize_cron("0 */10 * * * ? *") == "*/10 * * * *"
    assert normalize_cron("0 30 2 * * ?") == "30 2 * * *"
    with pytest.raises(ValueError):
        normalize_cron("* *")

    ts = datetime(2026, 8, 13, 2, 30)  # a Thursday
    assert cron_matches("30 2 * * *", ts)
    assert cron_matches("*/10 * * * *", ts)
    assert not cron_matches("31 2 * * *", ts)
    assert cron_matches("30 2 13 8 *", ts)
    assert cron_matches("* * * * 4", ts)  # Thursday = 4
    assert not cron_matches("* * * * 0", ts)
    assert cron_matches("0-45/15 2 * * *", ts)
    assert cron_matches("15,30,45 * * * *", ts)


def test_registry_lifecycle_and_due(spark, sf_dir):
    views(spark, sf_dir)
    reg = ScheduledQueryRegistry(spark)
    reg.drop("sq_demo")
    reg.create(
        "sq_demo",
        "0 */10 * * * ? *",
        "CREATE OR REPLACE TEMPORARY VIEW sq_out AS "
        "SELECT COUNT(*) AS n FROM region",
    )
    try:
        ts = datetime(2026, 8, 13, 4, 20)
        assert [q.name for q in reg.due(ts)] == ["sq_demo"]
        assert reg.run_due(ts) == ["sq_demo"]
        assert spark.table("sq_out").collect()[0].n == 5
        # at-most-once per matched minute
        assert reg.run_due(ts) == []
        # next matching minute fires again
        assert reg.run_due(datetime(2026, 8, 13, 4, 30)) == ["sq_demo"]
        # disabled schedules never run
        reg.set_enabled("sq_demo", False)
        assert reg.run_due(datetime(2026, 8, 13, 4, 40)) == []
        # persisted: a NEW registry instance sees it (metastore analog)
        assert ScheduledQueryRegistry(spark).get("sq_demo").enabled is False
    finally:
        reg.drop("sq_demo")


def test_sql_text_surface(spark, sf_dir):
    """The Hive 4 statement grammar runs through hqlscript: CREATE
    SCHEDULED QUERY ... CRON ... AS, ALTER ... EXECUTE / DISABLE,
    DROP."""
    from hive_spark.hqlscript import run_script

    views(spark, sf_dir)
    reg = ScheduledQueryRegistry(spark)
    reg.drop("sq_text")
    try:
        run_script(
            spark,
            "CREATE SCHEDULED QUERY sq_text CRON '0 0 3 * * ? *' AS "
            "SELECT r_name FROM region ORDER BY r_regionkey;",
        )
        sq = reg.get("sq_text")
        assert sq is not None and sq.cron == "0 3 * * *" and sq.enabled
        out = run_script(spark, "ALTER SCHEDULED QUERY sq_text EXECUTE;")
        assert [r.r_name for r in out.results[-1].collect()][0] == "AFRICA"
        run_script(spark, "ALTER SCHEDULED QUERY sq_text DISABLE;")
        assert reg.get("sq_text").enabled is False
        run_script(spark, "DROP SCHEDULED QUERY sq_text;")
        assert reg.get("sq_text") is None
    finally:
        reg.drop("sq_text")
