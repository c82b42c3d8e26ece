"""Hive's n-gram estimators + remaining string-table functions.

SURVEY §2.12 names `ngrams` and `context_ngrams` as the two genuinely
missing UDAFs (ref: ql/src/java/org/apache/hadoop/hive/ql/udf/generic/
GenericUDAFnGrams.java, GenericUDAFContextNGrams.java — top-k n-gram
frequency estimation). Hive's versions are lossy sketches with a
precision knob; at Spark scale the same contract is served EXACTLY by
explode -> count -> top-k (two shuffles, both on small keys), so the
engine implements the exact form — strictly stronger, still linear.

Also: `parse_url_tuple` (UDTF, ref GenericUDTFParseUrlTuple.java) composed
from Spark's scalar parse_url, and `str_to_map` (ref GenericUDFStringToMap)
— both native-expression compositions, zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hive_spark.operators import QuerySpec, views

_TOKS = "filter(split(text, ' '), x -> x != '')"


def text_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ngrams(sentences(text), 2, 20): top-20 bigrams by frequency
    (exact; ties broken lexically so the result is deterministic)."""
    views(spark, sf_dir)
    return spark.sql(
        f"""
        WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        grams AS (
            SELECT concat(t[i - 1], ' ', t[i]) AS gram
            FROM toks LATERAL VIEW explode(sequence(1, size(t) - 1)) s AS i
        )
        SELECT gram, COUNT(*) AS freq
        FROM grams
        GROUP BY gram
        ORDER BY freq DESC, gram
        LIMIT 20
        """
    )


_NGRAMS_SQL = """
WITH toks AS (
    SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS t
    FROM documents
),
grams AS (
    SELECT t[i] || ' ' || t[i + 1] AS gram
    FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks)
)
SELECT gram, COUNT(*) AS freq
FROM grams
GROUP BY gram
ORDER BY freq DESC, gram
LIMIT 20
"""


def text_context_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """context_ngrams(..., array('the', null), 15): the top tokens that
    follow 'the' (Hive's context-pattern estimation, exact)."""
    views(spark, sf_dir)
    return spark.sql(
        f"""
        WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        nxt AS (
            SELECT t[i] AS follower
            FROM toks LATERAL VIEW explode(sequence(1, size(t) - 1)) s AS i
            WHERE t[i - 1] = 'the'
        )
        SELECT follower, COUNT(*) AS freq
        FROM nxt
        GROUP BY follower
        ORDER BY freq DESC, follower
        LIMIT 15
        """
    )


_CONTEXT_SQL = """
WITH toks AS (
    SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS t
    FROM documents
),
nxt AS (
    SELECT t[i + 1] AS follower
    FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks)
    WHERE t[i] = 'the'
)
SELECT follower, COUNT(*) AS freq
FROM nxt
GROUP BY follower
ORDER BY freq DESC, follower
LIMIT 15
"""


def func_parse_url_tuple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_url_tuple: N url parts in one pass (Hive UDTF) — composed
    from scalar parse_url calls over synthesized urls."""
    views(spark, sf_dir)
    return spark.sql(
        """
        WITH urls AS (
            SELECT n_nationkey,
                   concat('https://example.com/', n_name, '/detail?region=',
                          CAST(n_regionkey AS STRING), '&key=', CAST(n_nationkey AS STRING))
                       AS url
            FROM nation
        )
        SELECT n_nationkey,
               parse_url(url, 'HOST') AS host,
               parse_url(url, 'PATH') AS path,
               parse_url(url, 'QUERY') AS query,
               parse_url(url, 'QUERY', 'region') AS region_param
        FROM urls ORDER BY n_nationkey
        """
    )


_PARSE_URL_SQL = """
WITH urls AS (
    SELECT n_nationkey,
           'https://example.com/' || n_name || '/detail?region=' ||
           CAST(n_regionkey AS VARCHAR) || '&key=' || CAST(n_nationkey AS VARCHAR) AS url
    FROM nation
)
SELECT n_nationkey,
       'example.com' AS host,
       '/' || split_part(split_part(url, 'example.com/', 2), '?', 1) AS path,
       split_part(url, '?', 2) AS query,
       regexp_extract(url, 'region=([^&]*)', 1) AS region_param
FROM urls ORDER BY n_nationkey
"""


def func_str_to_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """str_to_map round-trip: build 'k=v,...' strings, parse to a map,
    extract values (GenericUDFStringToMap — native in Spark)."""
    views(spark, sf_dir)
    return spark.sql(
        """
        WITH kv AS (
            SELECT n_nationkey,
                   concat('name=', n_name, ',region=', CAST(n_regionkey AS STRING)) AS s
            FROM nation
        )
        SELECT n_nationkey,
               str_to_map(s, ',', '=')['name'] AS name_val,
               CAST(str_to_map(s, ',', '=')['region'] AS INT) AS region_val,
               size(str_to_map(s, ',', '=')) AS n_entries
        FROM kv ORDER BY n_nationkey
        """
    )


_STR_TO_MAP_SQL = """
SELECT n_nationkey,
       n_name AS name_val,
       n_regionkey AS region_val,
       2 AS n_entries
FROM nation ORDER BY n_nationkey
"""


def text_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking for training pipelines: fixed-size character
    windows with overlap (width 200, stride 150), emitted per doc with a chunk
    index. Pure generate/substring — one narrow projection, no shuffle
    until the final ORDER BY (driver-facing only); at 100 TB this is a
    map-only stage feeding the tokenizer."""
    views(spark, sf_dir)
    return spark.sql(
        """
        WITH chunks AS (
            SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
                   substr(text, i * 150 + 1, 200) AS chunk
            FROM documents
            LATERAL VIEW explode(
                sequence(0, greatest(
                    CAST(ceil((length(text) - 200) / 150) AS INT), 0))
            ) s AS i
            WHERE length(text) > 0
        )
        SELECT doc_id, chunk_idx, CAST(length(chunk) AS BIGINT) AS chunk_len,
               substr(chunk, 1, 16) AS chunk_head
        FROM chunks
        WHERE length(chunk) > 0
        ORDER BY doc_id, chunk_idx
        """
    )


_CHUNK_SQL = """
WITH idx AS (
    SELECT doc_id, text,
           unnest(generate_series(0,
               greatest(CAST(ceil((length(text) - 200) / 150.0) AS INT), 0)))
             AS chunk_idx
    FROM documents
    WHERE length(text) > 0
),
chunks AS (
    SELECT doc_id, chunk_idx,
           substr(text, chunk_idx * 150 + 1, 200) AS chunk
    FROM idx
)
SELECT doc_id, chunk_idx, length(chunk) AS chunk_len,
       substr(chunk, 1, 16) AS chunk_head
FROM chunks
WHERE length(chunk) > 0
ORDER BY doc_id, chunk_idx
"""


def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (training-data hygiene): email / phone / 9-digit-id
    patterns replaced with typed placeholder tokens, JVM-side
    regexp_replace chain (no Python in the data path); reports per-doc
    redaction counts so the pipeline can quarantine PII-dense documents."""
    views(spark, sf_dir)
    return spark.sql(
        r"""
        WITH red AS (
            SELECT doc_id,
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(text,
                         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>'),
                       '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>'),
                     '\b\d{9}\b', '<ID>') AS clean
            FROM documents
        )
        SELECT doc_id,
               CAST(length(clean) AS BIGINT) AS clean_len,
               CAST((length(clean) - length(replace(clean, '<EMAIL>', ''))) / 7
                    AS BIGINT) AS n_emails,
               CAST((length(clean) - length(replace(clean, '<PHONE>', ''))) / 7
                    AS BIGINT) AS n_phones
        FROM red
        ORDER BY doc_id
        """
    )


_PII_SQL = r"""
WITH red AS (
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\d{3}-\d{3}-\d{4}', '<PHONE>', 'g'),
             '\d{9}', '<ID>', 'g') AS clean
    FROM documents
)
SELECT doc_id,
       length(clean) AS clean_len,
       CAST((length(clean) - length(replace(clean, '<EMAIL>', ''))) / 7
            AS BIGINT) AS n_emails,
       CAST((length(clean) - length(replace(clean, '<PHONE>', ''))) / 7
            AS BIGINT) AS n_phones
FROM red
ORDER BY doc_id
"""



REGISTRY: dict[str, QuerySpec] = {
    "text_ngrams": QuerySpec(text_ngrams, _NGRAMS_SQL),
    "text_context_ngrams": QuerySpec(text_context_ngrams, _CONTEXT_SQL),
    "func_parse_url_tuple": QuerySpec(func_parse_url_tuple, _PARSE_URL_SQL),
    "func_str_to_map": QuerySpec(func_str_to_map, _STR_TO_MAP_SQL),
    "text_chunk_sliding": QuerySpec(text_chunk_sliding, _CHUNK_SQL),
    "text_pii_redact": QuerySpec(text_pii_redact, _PII_SQL),
}
