"""End-to-end training-data pipeline: the north-star composition.

One linear DataFrame pipeline over `documents`, the shape a 100 TB
pretraining-data curation job takes:

  1. quality gate  — length / stopword-ratio / non-alpha thresholds
     (pure whole-stage-codegen expressions)
  2. language gate — keep the dominant langs
  3. exact dedup   — md5 digest, keep min doc_id per digest (one shuffle)
  4. token stats   — per-doc token counts
  5. partitioned sink — write survivors partitioned by lang (the layout
     the next job's partition pruning wants)
  6. summary       — per-lang survivor counts + token totals (returned)

Every stage is declarative; Catalyst fuses 1-2-4 into the scan projection
and the only shuffles are the dedup digest groupBy and the final summary
agg. The DuckDB oracle recomputes the whole pipeline (it is exactly
SQL-expressible because the dedup keep-rule is deterministic min-id)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_spark.operators import QuerySpec, views

_SCRATCH = f"/tmp/hive_spark_pipeline_{os.getpid()}"  # pid-unique: concurrent sessions must not collide

_STOPWORDS = ("the", "a", "of", "and", "to")


def training_data_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    docs = spark.table("documents")

    toks = F.filter(F.split("text", " "), lambda x: x != "")
    n_tokens = F.size(toks)
    stop_hits = F.size(
        F.filter(toks, lambda x: F.lower(x).isin(*_STOPWORDS))
    )
    quality = (
        (F.length("text") >= 50)
        & (n_tokens >= 10)
        & ((stop_hits / n_tokens) <= 0.5)
    )

    gated = (
        docs.withColumn("n_tokens", n_tokens)
        .filter(quality)
        .filter(F.col("lang").isin("en", "de", "fr"))
    )

    deduped = (
        gated.withColumn("digest", F.md5("text"))
        .withColumn(
            "keep_id",
            F.min("doc_id").over(Window.partitionBy("digest")),
        )
        .filter(F.col("doc_id") == F.col("keep_id"))
        .drop("keep_id")
    )

    out = os.path.join(_SCRATCH, f"out_{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(out, ignore_errors=True)
    deduped.write.partitionBy("lang").parquet(out)

    return (
        spark.read.parquet(out)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_tokens").cast("bigint")).alias("total_tokens"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .orderBy("lang")
    )


_PIPELINE_SQL = """
WITH toks AS (
    SELECT doc_id, lang, text,
           list_filter(string_split(text, ' '), x -> x != '') AS t
    FROM documents
),
gated AS (
    SELECT doc_id, lang, text, len(t) AS n_tokens
    FROM toks
    WHERE length(text) >= 50
      AND len(t) >= 10
      AND CAST(len(list_filter(t, x -> lower(x) IN ('the','a','of','and','to')))
               AS DOUBLE) / len(t) <= 0.5
      AND lang IN ('en', 'de', 'fr')
),
deduped AS (
    SELECT * FROM (
        SELECT doc_id, lang, n_tokens,
               MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
        FROM gated
    ) WHERE doc_id = keep_id
)
SELECT lang, COUNT(*) AS n_docs,
       SUM(CAST(n_tokens AS BIGINT)) AS total_tokens,
       MIN(doc_id) AS min_doc_id
FROM deduped
GROUP BY lang ORDER BY lang
"""


REGISTRY: dict[str, QuerySpec] = {
    "training_data_pipeline": QuerySpec(training_data_pipeline, _PIPELINE_SQL),
}
