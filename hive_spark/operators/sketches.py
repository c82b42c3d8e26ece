"""DataSketches HLL sketch-object LIFECYCLE — sketches as storable,
mergeable values, not just the folded ``estimate(sketch(x))`` composition.

Hive registers the DataSketches family as first-class UDFs whose sketch
values can be persisted per partition and unioned across tables later
(ref: ql/src/java/org/apache/hadoop/hive/ql/exec/DataSketchesFunctions.java,
registered FunctionRegistry.java:581). Spark 3.5+ ships the same Apache
DataSketches HLL implementation natively — ``hll_sketch_agg`` (build,
binary result), ``hll_union_agg`` (merge), ``hll_sketch_estimate`` — so
the lifecycle maps to JVM-side built-in aggregates: no UDF, no Python.
The HiveQL text spellings (``ds_hll_sketch``/``ds_hll_union``/
``ds_hll_estimate`` over stored sketch columns) fold to these natives in
hqlscript.rewrite_statement.

Scale shape: building per-group sketches is one partial/final hash
aggregate (each partial is a fixed ~2-4 KB register set, so the shuffle
carries K sketches, not N rows); merging M stored sketches moves M
binary blobs. This is exactly the "sketch once per partition, merge at
query time" pattern a 100 TB rollup pipeline needs.

Oracle protocol: HLL estimates are implementation-specific, so the
oracled output emits (group, exact_count, within_bound) — the engine
computes its own exact count AND checks its estimate against it
(|est - exact| / exact <= 0.05; lgK=12 gives ~1.6% rse, so 5% ~ 3
sigma); DuckDB emits the exact counts with literal TRUE. A hash match
therefore certifies both the exact counts and the sketch pipeline's
error bound. The sketch is a register-max structure, so the estimate is
identical at any partitioning/merge order — the boolean is stable.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_spark.operators import QuerySpec, views


def sketch_hll_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build per-returnflag HLL sketches of l_orderkey, PERSIST them to a
    parquet table (binary sketch column), read them back, estimate per
    group, and fold all stored sketches into a '~TOTAL' row via
    hll_union_agg — the store/load/merge path a user of Hive's ds_*
    family exercises."""
    views(spark, sf_dir)
    path = os.path.join(
        tempfile.gettempdir(),
        f"hive_spark_hll_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    (
        spark.table("lineitem")
        .groupBy("l_returnflag")
        .agg(F.expr("hll_sketch_agg(l_orderkey)").alias("sk"))
        .write.mode("overwrite")
        .parquet(path)
    )
    stored = spark.read.parquet(path)
    est = stored.selectExpr(
        "l_returnflag", "hll_sketch_estimate(sk) AS est"
    ).unionAll(
        stored.agg(F.expr("hll_union_agg(sk)").alias("m")).selectExpr(
            "'~TOTAL' AS l_returnflag", "hll_sketch_estimate(m) AS est"
        )
    )
    exact = spark.sql(
        """
        SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS exact_orders
        FROM lineitem GROUP BY l_returnflag
        UNION ALL
        SELECT '~TOTAL', COUNT(DISTINCT l_orderkey) FROM lineitem
        """
    )
    return (
        est.join(exact, "l_returnflag")
        .selectExpr(
            "l_returnflag",
            "exact_orders",
            "CAST(abs(est - exact_orders) / exact_orders <= 0.05 AS BOOLEAN)"
            " AS within_bound",
        )
        .orderBy("l_returnflag")
    )


_LIFECYCLE_SQL = """
SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS exact_orders,
       TRUE AS within_bound
FROM lineitem GROUP BY l_returnflag
UNION ALL
SELECT '~TOTAL', COUNT(DISTINCT l_orderkey), TRUE FROM lineitem
ORDER BY l_returnflag
"""


def sketch_hll_cross_table_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ds_hll_union ACROSS TABLES: custkey sketches built independently
    over orders and customer, merged into one union-cardinality estimate
    (Hive's `SELECT ds_hll_estimate(ds_hll_union_f(a.sk, b.sk))` shape).
    Each side is a linear scan producing one ~KB sketch row."""
    views(spark, sf_dir)
    merged = (
        spark.sql("SELECT hll_sketch_agg(o_custkey) AS sk FROM orders")
        .unionAll(spark.sql("SELECT hll_sketch_agg(c_custkey) AS sk FROM customer"))
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"))
    )
    exact = spark.sql(
        """
        SELECT COUNT(DISTINCT k) AS exact_keys FROM (
            SELECT o_custkey AS k FROM orders
            UNION SELECT c_custkey FROM customer)
        """
    )
    return merged.crossJoin(exact).selectExpr(
        "exact_keys",
        "CAST(abs(est - exact_keys) / exact_keys <= 0.05 AS BOOLEAN)"
        " AS within_bound",
    )


_CROSS_UNION_SQL = """
SELECT COUNT(DISTINCT k) AS exact_keys, TRUE AS within_bound
FROM (SELECT o_custkey AS k FROM orders UNION SELECT c_custkey FROM customer) t
"""


REGISTRY: dict[str, QuerySpec] = {
    "sketch_hll_lifecycle": QuerySpec(
        sketch_hll_lifecycle,
        _LIFECYCLE_SQL,
        "persist per-group sketches, read back, merge; error-bound vs exact",
    ),
    "sketch_hll_cross_table_union": QuerySpec(
        sketch_hll_cross_table_union,
        _CROSS_UNION_SQL,
        "sketches from two tables merged via hll_union_agg; bound vs exact",
    ),
}
