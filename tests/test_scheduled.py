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
    for q in reg.list():  # isolate from registry leftovers on disk
        reg.drop(q.name)
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


def test_quartz_dow_numbering_remapped():
    """Quartz uses 1=SUN..7=SAT; the matcher uses cron 0=SUN..6=SAT. A
    Quartz '... ? * 2' (Monday) must fire on Monday, not Tuesday; and
    standard-cron dow '7' is a Sunday alias."""
    from datetime import datetime

    from hive_spark.scheduled import cron_matches, normalize_cron

    # Quartz 6-field, dow=2 -> Monday
    q = normalize_cron("0 0 12 ? * 2")
    assert q.split()[4] == "1"
    mon = datetime(2026, 8, 10, 12, 0)  # a Monday
    tue = datetime(2026, 8, 11, 12, 0)
    assert cron_matches(q, mon) and not cron_matches(q, tue)

    # Quartz range 2-6 (MON-FRI) -> cron 1-5
    assert normalize_cron("0 30 8 ? * 2-6").split()[4] == "1-5"
    # Quartz 1 (SUN) -> 0; Quartz 7 (SAT) -> 6
    assert normalize_cron("0 0 0 ? * 1").split()[4] == "0"
    assert normalize_cron("0 0 0 ? * 7").split()[4] == "6"
    # names map regardless of dialect
    assert normalize_cron("0 0 0 ? * MON").split()[4] == "1"
    assert normalize_cron("0 0 9 * * FRI").split()[4] == "5"

    # standard 5-field: dow 7 == Sunday
    sun = datetime(2026, 8, 9, 9, 0)  # a Sunday
    std = normalize_cron("0 9 * * 7")
    assert cron_matches(std, sun)
    # step divisor untouched
    assert normalize_cron("0 0 * * */2").split()[4] == "*/2"
