"""Local replica of the driver's correctness gate: run the Spark query and
its DuckDB oracle side-by-side, canonicalize, and compare values.

Mirrors the driver contract (order-insensitive, column-name aligned) but
stricter: we require value equality after canonicalization, because the
engine's outputs are designed to be bit-reproducible (decimal aggregates,
date/epoch-ms outputs — see hive_spark/operators/__init__.py).
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb

from hive_spark.session import TESTDATA_TABLES

_CONS: dict[str, duckdb.DuckDBPyConnection] = {}


def duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    if sf_dir not in _CONS:
        con = duckdb.connect()
        for t in TESTDATA_TABLES:
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        _CONS[sf_dir] = con
    return _CONS[sf_dir]


def _canon(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, (datetime.datetime,)):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _rows(records, columns) -> list[tuple[str, ...]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_canon(rec[i]) for i in order) for rec in records)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> None:
    """Assert the Spark result and the DuckDB oracle result match."""
    sp_cols = spark_df.columns
    sp_recs = [tuple(r) for r in spark_df.collect()]

    cur = duck(sf_dir).sql(oracle_sql)
    du_cols = cur.columns
    du_recs = cur.fetchall()

    assert sorted(sp_cols) == sorted(du_cols), (
        f"column mismatch: spark={sorted(sp_cols)} duckdb={sorted(du_cols)}"
    )
    sp_rows = _rows(sp_recs, sp_cols)
    du_rows = _rows(du_recs, du_cols)
    assert len(sp_rows) == len(du_rows), (
        f"row count mismatch: spark={len(sp_rows)} duckdb={len(du_rows)}"
    )
    for i, (a, b) in enumerate(zip(sp_rows, du_rows)):
        assert a == b, f"row {i} mismatch:\n  spark : {a}\n  duckdb: {b}"
