"""End-to-end training-data pipeline vs DuckDB oracle."""

from hive_spark.operators import pipeline
from tests.oracle_check import compare


def test_training_pipeline_oracle(spark, sf_dir):
    spec = pipeline.REGISTRY["training_data_pipeline"]
    df = spec.fn(spark, sf_dir)
    assert {r.lang for r in df.collect()} == {"en", "de", "fr"}
    compare(spec.fn(spark, sf_dir), spec.oracle, sf_dir)


def test_regexp_stop_gate_equals_token_filter(spark, sf_dir):
    """The codegen'd regexp stop-hit count must equal the token-list
    formulation (the oracle's spec) for EVERY document — the regex
    ` stopword ` occurrence count is exactly the count of split-on-space
    tokens equal to a stopword."""
    from pyspark.sql import functions as F

    from hive_spark.operators import views
    from hive_spark.operators.pipeline import _STOP_RE, _STOPWORDS

    views(spark, sf_dir)
    docs = spark.table("documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    hof = F.size(F.filter(toks, lambda x: F.lower(x).isin(*_STOPWORDS)))
    rex = F.regexp_count(F.lower("text"), F.lit(_STOP_RE))
    assert (
        docs.withColumn("a", hof).withColumn("b", rex).filter("a <> b").count()
        == 0
    )
    # adversarial shapes: consecutive stopwords, doubled spaces, edges
    edge = spark.createDataFrame(
        [
            ("a a a",),
            ("the  of",),
            ("x the",),
            ("of x",),
            ("to\na",),
            ("THE A",),
            ("athe thea",),
            ("",),
        ],
        "text string",
    )
    assert (
        edge.withColumn("a", hof).withColumn("b", rex).filter("a <> b").count()
        == 0
    )


def test_pipeline_dedup_is_hash_agg_not_window(spark, sf_dir):
    """Plan pin: the dedup stage must be a partial/final hash aggregate
    (map-side combine collapses duplicates before the exchange), with no
    window sort in the curate plan."""
    import os
    import shutil

    from hive_spark.operators import pipeline, views

    views(spark, sf_dir)
    from pyspark.sql import functions as F

    gated = pipeline.gated_documents(spark.table("documents")).withColumn(
        "digest", F.md5("text")
    )
    row = F.struct(*[F.col(c) for c in gated.columns if c != "digest"])
    deduped = (
        gated.groupBy("digest")
        .agg(F.min_by(row, F.col("doc_id")).alias("_r"))
        .select("digest", "_r.*")
    )
    plan = deduped._jdf.queryExecution().executedPlan().toString()
    # no window operator; dedup is an aggregate with a MAP-SIDE partial
    # (partial_min_by before the exchange collapses duplicates early —
    # the shuffle carries ~unique digests at scale, which a window can
    # never do), and exactly one exchange
    assert "Window" not in plan
    assert "partial_min_by" in plan
    assert plan.count("Exchange") == 1  # the digest shuffle, nothing else
