"""Event-stream analytics vs DuckDB oracle."""

import pytest

from hive_spark.operators import events
from tests.oracle_check import compare


@pytest.mark.parametrize("name", sorted(events.REGISTRY))
def test_events_oracle(spark, sf_dir, name):
    spec = events.REGISTRY[name]
    assert spec.oracle is not None
    compare(spec.fn(spark, sf_dir), spec.oracle, sf_dir)


def test_hypertable_rollup_single_scan(spark, sf_dir):
    """The grouping-sets rollup must read events exactly once."""
    import contextlib
    import io

    from hive_spark.operators import events as ev_mod

    df = ev_mod.events_hypertable_rollup(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    scans = [
        line for line in plan.splitlines()
        if line.strip().startswith("(") and "Scan parquet" in line
    ]
    assert len(scans) == 1, scans  # one scan feeds all three grains
    assert "Expand" in plan  # grouping-sets expansion, not a union of reads
