"""hive_spark — a PySpark-native analytics engine with Hive's query surface.

A from-scratch engine built on the Spark DataFrame / SQL / Catalyst stack,
providing the query and data-processing capabilities of Apache Hive
(reference: /root/reference, apache/hive) plus large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal).

Architecture (SURVEY.md §7): Spark *is* the parser, optimizer, shuffle and
vectorized executor — this package is the thin capability layer on top:

- ``session``     — tuned SparkSession factory + testdata catalog bootstrap
- ``operators``   — relational operator surface (Hive §2 inventory) expressed
                    as DataFrame pipelines, each with a DuckDB oracle
- ``functions``   — Hive function gap-fill (registered into Spark SQL)
- ``streaming``   — Structured Streaming surface for the events table
- ``dml``         — Hive DML emulation (multi-insert, UPDATE/DELETE/MERGE)
"""

from hive_spark.session import get_session, load_tables, register_views

__all__ = ["get_session", "load_tables", "register_views"]
__version__ = "0.1.0"
