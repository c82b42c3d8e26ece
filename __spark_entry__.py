"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship TPC-H Q1 pipeline at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 (plus
the training-data-pipeline extensions); ``oracle_sql()`` gives the DuckDB
twin for each SQL-expressible one. Registry lives in
hive_spark/operators/__init__.py::full_registry().
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _registry():
    from hive_spark.operators import full_registry

    return full_registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    from hive_spark.operators import tpch

    return tpch.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def _normalized(fn):
    """Driver output protocol: final DECIMAL->DOUBLE, DATE->TIMESTAMP so
    spark toPandas() and DuckDB .df() hash identically (internal math
    stays decimal-exact; see hive_spark.operators.normalize_spark_output)."""
    from hive_spark.operators import normalize_spark_output

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        return normalize_spark_output(fn(spark, sf_dir))

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _normalized(spec.fn) for name, spec in _registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; sketch-based ops (murmur-hash
    minhash/simhash, LSH buckets) are intentionally omitted → rows-only.

    Each oracle is wrapped with the same output normalization as the
    Spark side (DECIMAL->DOUBLE, HUGEINT->BIGINT, DATE->TIMESTAMP) via a
    schema-only DESCRIBE against the smallest testdata scale."""
    import duckdb

    from hive_spark.operators import normalize_oracle_sql
    from hive_spark.session import TESTDATA_TABLES

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    return {
        name: normalize_oracle_sql(spec.oracle, con)
        for name, spec in _registry().items()
        if spec.oracle is not None
    }
