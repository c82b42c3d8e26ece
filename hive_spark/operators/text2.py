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


REGISTRY: dict[str, QuerySpec] = {
    "text_ngrams": QuerySpec(text_ngrams, _NGRAMS_SQL),
    "text_context_ngrams": QuerySpec(text_context_ngrams, _CONTEXT_SQL),
    "func_parse_url_tuple": QuerySpec(func_parse_url_tuple, _PARSE_URL_SQL),
    "func_str_to_map": QuerySpec(func_str_to_map, _STR_TO_MAP_SQL),
}
