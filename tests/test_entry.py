"""Driver-contract smoke tests for __spark_entry__.py."""

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "__spark_entry__",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "__spark_entry__.py"),
)
entry_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry_mod)


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == df.columns  # stable schema accessor


def test_queries_and_oracles_aligned():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert len(q) >= 120, f"registry too small: {len(q)}"
    assert set(o) <= set(q)
    missing = set(q) - set(o)
    # only probabilistic sketch ops may skip the oracle
    assert all(
        "minhash" in m or "simhash" in m or "lsh" in m or "approx" in m
        for m in missing
    ), missing
