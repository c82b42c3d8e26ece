"""Training-data sampling & selection over `documents` — the curation
ops between "corpus" and "training set" (beyond Hive's TABLESAMPLE,
ref ql/.../parse/SplitSample.java + TableSample.java, which samples
blocks/buckets for query speed, not dataset construction).

All three are DETERMINISTIC — reproducible dataset builds are a hard
requirement (same corpus + same config => bit-identical training set,
regardless of cluster size or partitioning):

- hash sampling: keep a doc iff a multiplicative integer hash of its id
  lands under the rate threshold. Pure per-row integer math — embarrassly
  parallel, no RNG state, no shuffle; exact enough to oracle.
- stratified rates: per-language thresholds (upsample low-resource,
  downsample dominant) — the mixture-weighting step of corpus building.
- token budget: per language, take docs in a deterministic order until a
  token budget is hit — one window cumulative sum, shuffled once on the
  stratum key. (Hive analog: none; this is ORDER BY + running total.)

The Knuth multiplicative constant spreads sequential ids uniformly; the
modulus is 2^32 so thresholds are exact integers (rate 0.15 ->
floor(0.15 * 2^32)), and every op (multiply, mod, compare) is exact
int64 in both engines — no float RNG to diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hive_spark.operators import QuerySpec, views

_KNUTH = 2654435761
_MOD = 4294967296  # 2^32


def _threshold(rate: float) -> int:
    return int(rate * _MOD)


def sample_hash_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% deterministic sample; aggregated so the oracle checks both
    membership (n_docs) and identity (sum of sampled ids)."""
    views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT lang,
               COUNT(*) AS n_docs,
               SUM(doc_id) AS id_sum,
               SUM(n_chars) AS chars_kept
        FROM documents
        WHERE (doc_id * {_KNUTH}) % {_MOD} < {_threshold(0.10)}
        GROUP BY lang ORDER BY lang
        """
    )


_HASH_SAMPLE_SQL = f"""
SELECT lang, COUNT(*) AS n_docs, SUM(doc_id) AS id_sum, SUM(n_chars) AS chars_kept
FROM documents
WHERE (doc_id * {_KNUTH}) % {_MOD} < {_threshold(0.10)}
GROUP BY lang ORDER BY lang
"""

_RATES = {"en": 0.05, "de": 0.50, "fr": 0.50}  # downsample en, keep the rest


def _rate_case(col: str = "lang") -> str:
    cases = " ".join(
        f"WHEN {col} = '{k}' THEN {_threshold(v)}" for k, v in _RATES.items()
    )
    return f"CASE {cases} ELSE {_MOD} END"


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language sampling rates (mixture weighting): one scan, the
    threshold is a per-row CASE over the stratum key."""
    views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT lang, COUNT(*) AS n_docs, SUM(doc_id) AS id_sum
        FROM documents
        WHERE (doc_id * {_KNUTH}) % {_MOD} < {_rate_case()}
        GROUP BY lang ORDER BY lang
        """
    )


_STRATIFIED_SQL = f"""
SELECT lang, COUNT(*) AS n_docs, SUM(doc_id) AS id_sum
FROM documents
WHERE (doc_id * {_KNUTH}) % {_MOD} < {_rate_case()}
GROUP BY lang ORDER BY lang
"""

_BUDGET = 100_000  # chars per language


def sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted selection: per language, docs in doc_id order until the
    cumulative size crosses the budget (the doc that crosses it is kept —
    budgets are floors, not ceilings). One shuffle on lang + one window."""
    views(spark, sf_dir)
    return spark.sql(
        f"""
        WITH running AS (
          SELECT lang, doc_id, n_chars,
                 SUM(n_chars) OVER (PARTITION BY lang ORDER BY doc_id) AS cum
          FROM documents
        )
        SELECT lang,
               COUNT(*) AS n_docs,
               MAX(cum) AS chars_taken,
               MAX(doc_id) AS last_doc
        FROM running
        WHERE cum - n_chars < {_BUDGET}
        GROUP BY lang ORDER BY lang
        """
    )


_BUDGET_SQL = f"""
WITH running AS (
  SELECT lang, doc_id, n_chars,
         SUM(n_chars) OVER (PARTITION BY lang ORDER BY doc_id) AS cum
  FROM documents
)
SELECT lang, COUNT(*) AS n_docs, MAX(cum) AS chars_taken, MAX(doc_id) AS last_doc
FROM running
WHERE cum - n_chars < {_BUDGET}
GROUP BY lang ORDER BY lang
"""


_BIN = 8192  # chars per packed training sequence


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing plan: assign each doc to the fixed-size training
    bin its running offset falls in (per language, deterministic doc_id
    order) — the step between a curated corpus and fixed-context training
    batches. A doc whose span crosses the boundary belongs to its START
    bin (the consumer pads or splits; this op computes the partition
    plan). One window + one groupBy, both on the stratum key; integer
    DIV keeps bin ids exact (offsets are non-negative, so Spark's
    truncating DIV and DuckDB's flooring // agree)."""
    views(spark, sf_dir)
    return spark.sql(
        f"""
        WITH r AS (
          SELECT lang, doc_id, n_chars,
                 SUM(n_chars) OVER (PARTITION BY lang ORDER BY doc_id) - n_chars
                   AS start_off
          FROM documents
        )
        SELECT lang, start_off DIV {_BIN} AS bin,
               COUNT(*) AS n_docs,
               SUM(n_chars) AS chars_packed,
               MIN(doc_id) AS first_doc,
               MAX(doc_id) AS last_doc
        FROM r
        GROUP BY lang, start_off DIV {_BIN}
        ORDER BY lang, bin
        """
    )


_PACK_SQL = f"""
WITH r AS (
  SELECT lang, doc_id, n_chars,
         SUM(n_chars) OVER (PARTITION BY lang ORDER BY doc_id) - n_chars AS start_off
  FROM documents
)
SELECT lang, start_off // {_BIN} AS bin,
       COUNT(*) AS n_docs,
       SUM(n_chars) AS chars_packed,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM r
GROUP BY lang, start_off // {_BIN}
ORDER BY lang, bin
"""


REGISTRY: dict[str, QuerySpec] = {
    "sample_hash_deterministic": QuerySpec(
        sample_hash_deterministic,
        _HASH_SAMPLE_SQL,
        "RNG-free 10% sample via multiplicative integer hash",
    ),
    "sample_stratified": QuerySpec(
        sample_stratified,
        _STRATIFIED_SQL,
        "per-language mixture rates as a CASE threshold, one scan",
    ),
    "sample_token_budget": QuerySpec(
        sample_token_budget,
        _BUDGET_SQL,
        "take docs per language until the size budget is crossed",
    ),
    "pack_sequences": QuerySpec(
        pack_sequences,
        _PACK_SQL,
        "fixed-size training-bin assignment from running offsets",
    ),
}
