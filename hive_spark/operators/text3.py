"""Corpus indexing operators over `documents`: TF-IDF keyword extraction
and inverted-index construction — the retrieval-side half of a
training-data pipeline (Hive ships Rank/TF-IDF-style examples as
contrib UDAFs + GenericUDTFGetSplits retrieval surface; here they are
first-class shuffles).

Scale design (the point at 100 TB):
- tokenize via explode — linear, no driver state, whole-stage codegen'd
- document frequency = agg over (doc, term) pairs, shuffled on term;
  the resulting vocab table is orders of magnitude smaller than the
  corpus, so it BROADCASTs back onto the term-frequency table (hinted)
- top-k per doc via ROW_NUMBER window: rank-filter pushdown
  (WindowGroupLimit) keeps a size-k heap per partition instead of
  materializing the full sorted postings
- the inverted index groups on the SAME key its window partitioned on,
  so Catalyst reuses the exchange: one shuffle total.

Cross-engine parity: scoring uses integer-exact tf·(N/df) ranking —
`(tf * n_docs) DIV df` — not float `tf·ln(N/df)`: libm `ln` is not
bit-identical across engines, and one boundary-crossing ulp would break
the value-hash gate. The integer score is monotone in tf/df (log damping
omitted), deterministic at any parallelism, and ties break on the term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hive_spark.operators import QuerySpec, views

_TOKS_SPARK = """
  SELECT doc_id, tok
  FROM documents
  LATERAL VIEW explode(filter(split(text, ' '), x -> x != '')) t AS tok
"""

_TOKS_DUCK = """
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x != '')) AS tok
  FROM documents
"""


def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 keywords per document by integer-exact tf·(N/df) score."""
    views(spark, sf_dir)
    return spark.sql(
        f"""
        WITH toks AS ({_TOKS_SPARK}),
        tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
        df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
          SELECT /*+ BROADCAST(df) */ tf.doc_id, tf.tok, tf.tf, df.df,
                 (tf.tf * n.n_docs) DIV df.df AS score
          FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
        ),
        ranked AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY score DESC, tok) AS rk
          FROM scored
        )
        SELECT doc_id, tok, tf, df, score, rk
        FROM ranked WHERE rk <= 5
        ORDER BY doc_id, rk
        """
    )


_TFIDF_SQL = f"""
WITH toks AS ({_TOKS_DUCK}),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.tok, tf.tf, df.df,
         CAST(tf.tf * n.n_docs AS BIGINT) // df.df AS score
  FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, tok) AS rk
  FROM scored
)
SELECT doc_id, tok, tf, df, score, rk
FROM ranked WHERE rk <= 5
ORDER BY doc_id, rk
"""


def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index: per term, document frequency, total term frequency,
    and the head (first 8 doc_ids) of the postings list. The full postings
    list per term is unbounded at corpus scale, so the operator ranks
    postings inside the term partition and keeps a fixed-size head —
    the groupBy then rides the window's exchange (one shuffle total)."""
    views(spark, sf_dir)
    return spark.sql(
        f"""
        WITH toks AS ({_TOKS_SPARK}),
        tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
        rn AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY tok ORDER BY doc_id) AS rn
          FROM tf
        )
        SELECT tok,
               COUNT(*) AS doc_freq,
               SUM(tf) AS total_tf,
               concat_ws(',', transform(
                 sort_array(collect_list(CASE WHEN rn <= 8 THEN doc_id END)),
                 x -> CAST(x AS STRING))) AS postings_head
        FROM rn
        GROUP BY tok
        ORDER BY tok
        """
    )


_INVIDX_SQL = f"""
WITH toks AS ({_TOKS_DUCK}),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
rn AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY tok ORDER BY doc_id) AS rn
  FROM tf
)
SELECT tok,
       COUNT(*) AS doc_freq,
       SUM(tf) AS total_tf,
       COALESCE(string_agg(CASE WHEN rn <= 8 THEN CAST(doc_id AS VARCHAR) END,
                           ',' ORDER BY doc_id), '') AS postings_head
FROM rn
GROUP BY tok
ORDER BY tok
"""


REGISTRY: dict[str, QuerySpec] = {
    "text_tfidf_topk": QuerySpec(
        text_tfidf_topk,
        _TFIDF_SQL,
        "top-5 keywords/doc, integer-exact tf·(N/df), WindowGroupLimit top-k",
    ),
    "text_inverted_index": QuerySpec(
        text_inverted_index,
        _INVIDX_SQL,
        "term -> (df, total_tf, postings head); groupBy reuses window exchange",
    ),
}
