"""Similarity search over the `embeddings` table (array<float>, 64-dim).

Training-pipeline requirement: approximate-nearest-neighbor over an
embedding column. Two strategies:

- brute-force cosine top-k — the correctness baseline. O(Q·N); fine for a
  bounded query set, never for all-pairs at scale.
- LSH-bucketed top-k — the 100 TB path: deterministic sign-projection
  buckets (8 bits → 256 buckets) computed in a linear scan, then top-k
  only *within* a bucket. The shuffle is on the bucket id; no cross join
  ever materializes N².

Determinism for the DuckDB oracle: per-element products are quantized to
BIGINT via floor(x*y*1e12). float→double widening and double multiply are
bit-identical IEEE in every engine, floor is exact, and integer sums are
associative → the same dot product at any parallelism, with no dependence
on either engine's double→decimal rounding algorithm. Cross-row sums are
carried as DECIMAL(38,0) so they cannot overflow at 100 TB row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hive_spark.operators import QuerySpec, views

# quantized dot(a,b): sum of floor(x*y*1e12) as BIGINT (exact, associative)
_DOTQ = (
    "aggregate(zip_with({a}, {b}, (x, y) -> "
    "CAST(floor(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1e12) AS BIGINT)), "
    "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
)


def _spark_knn(spark: SparkSession, with_buckets: bool) -> DataFrame:
    dot_qt = _DOTQ.format(a="q.embedding", b="t.embedding")
    norm = _DOTQ.format(a="embedding", b="embedding")
    bucket_expr = " + ".join(
        f"(CASE WHEN aggregate(slice(embedding, {8 * i + 1}, 8), "
        f"CAST(0 AS BIGINT), (acc, v) -> "
        f"acc + CAST(floor(CAST(v AS DOUBLE) * 1e6) AS BIGINT)) > 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i in range(8)
    )
    spark.sql(
        f"""
        CREATE OR REPLACE TEMPORARY VIEW _emb AS
        SELECT vec_id, embedding, {norm} AS norm2q, CAST({bucket_expr} AS INT) AS bucket
        FROM embeddings
        """
    )
    join_cond = "q.vec_id != t.vec_id" + (
        " AND q.bucket = t.bucket" if with_buckets else ""
    )
    return spark.sql(
        f"""
        WITH scored AS (
            SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
                   CAST({dot_qt} AS DOUBLE)
                     / (SQRT(CAST(q.norm2q AS DOUBLE)) * SQRT(CAST(t.norm2q AS DOUBLE)))
                     AS cosine
            FROM (SELECT * FROM _emb WHERE vec_id < 5) q
            JOIN _emb t ON {join_cond}
        )
        SELECT query_id, neighbor_id, CAST(cosine AS DECIMAL(18,9)) AS cosine, rnk
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                           ORDER BY cosine DESC, neighbor_id) AS rnk
              FROM scored)
        WHERE rnk <= 3
        ORDER BY query_id, rnk
        """
    )


def knn_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-3 for query vectors vec_id<5 vs the full table."""
    views(spark, sf_dir)
    return _spark_knn(spark, with_buckets=False)


def knn_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via deterministic sign-projection buckets: neighbors ranked only
    within the query's bucket (recall<1, cost ~1/256 of brute force)."""
    views(spark, sf_dir)
    return _spark_knn(spark, with_buckets=True)


# DuckDB twin: list_zip + list_transform + list_sum replicate the same
# quantized-integer dot; slicing l[a:b] is 1-based inclusive.
_DUCK_DOTQ = (
    "list_sum(list_transform(list_zip({a}, {b}), z -> "
    "CAST(floor(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) * 1e12) AS BIGINT)))"
)


def _duck_knn(with_buckets: bool) -> str:
    bucket_expr = " + ".join(
        f"(CASE WHEN list_sum(list_transform(embedding[{8 * i + 1}:{8 * i + 8}], "
        f"v -> CAST(floor(CAST(v AS DOUBLE) * 1e6) AS BIGINT))) > 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i in range(8)
    )
    dot_qt = _DUCK_DOTQ.format(a="q.embedding", b="t.embedding")
    norm = _DUCK_DOTQ.format(a="embedding", b="embedding")
    join_cond = "q.vec_id != t.vec_id" + (
        " AND q.bucket = t.bucket" if with_buckets else ""
    )
    return f"""
WITH emb AS (
    SELECT vec_id, embedding, {norm} AS norm2q, CAST({bucket_expr} AS INT) AS bucket
    FROM embeddings
),
scored AS (
    SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
           CAST({dot_qt} AS DOUBLE)
             / (SQRT(CAST(q.norm2q AS DOUBLE)) * SQRT(CAST(t.norm2q AS DOUBLE))) AS cosine
    FROM (SELECT * FROM emb WHERE vec_id < 5) q
    JOIN emb t ON {join_cond}
)
SELECT query_id, neighbor_id, CAST(cosine AS DECIMAL(18,9)) AS cosine, CAST(rnk AS BIGINT) AS rnk
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM scored)
WHERE rnk <= 3
ORDER BY query_id, rnk
"""


def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector math surface: quantized squared-norm totals per label group.
    Per-row dots widen to DECIMAL(38,0) before the cross-row sum so the
    total cannot overflow at any realistic row count."""
    views(spark, sf_dir)
    norm = _DOTQ.format(a="embedding", b="embedding")
    return spark.sql(
        f"""
        SELECT label, COUNT(*) AS n,
               SUM(CAST({norm} AS DECIMAL(38,0))) AS sum_norm2q
        FROM embeddings GROUP BY label ORDER BY label
        """
    )


_EMB_NORMS_SQL = f"""
SELECT label, COUNT(*) AS n,
       SUM(CAST({_DUCK_DOTQ.format(a="embedding", b="embedding")} AS DECIMAL(38,0)))
           AS sum_norm2q
FROM embeddings
GROUP BY label ORDER BY label
"""


_COS_T = 0.9  # near-dup threshold


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup dedup: per-vector cluster assignment =
    min vec_id among same-bucket vectors with cosine >= threshold
    (including itself). O(N) output; candidate pairs only within sign
    buckets (identical/near-identical vectors share buckets by
    construction, so exact dups always merge). Quantized-integer dots ->
    fully DuckDB-oracle-checked. The synthetic corpus has no near-dups
    (max pairwise cosine ~0.44), so on raw data every vector keeps itself
    — the merge path is exercised by the constructed-duplicates test."""
    views(spark, sf_dir)
    _spark_knn(spark, with_buckets=True)  # registers _emb with norm2q+bucket
    dot = _DOTQ.format(a="a.embedding", b="b.embedding")
    return spark.sql(
        f"""
        SELECT a.vec_id,
               MIN(CASE WHEN CAST({dot} AS DOUBLE)
                             / (SQRT(CAST(a.norm2q AS DOUBLE))
                                * SQRT(CAST(b.norm2q AS DOUBLE))) >= {_COS_T}
                        THEN b.vec_id END) AS cluster_id,
               CAST(a.vec_id = MIN(CASE WHEN CAST({dot} AS DOUBLE)
                             / (SQRT(CAST(a.norm2q AS DOUBLE))
                                * SQRT(CAST(b.norm2q AS DOUBLE))) >= {_COS_T}
                        THEN b.vec_id END) AS BOOLEAN) AS kept
        FROM _emb a JOIN _emb b ON a.bucket = b.bucket
        GROUP BY a.vec_id
        ORDER BY a.vec_id
        """
    )


def _duck_dedup_cosine() -> str:
    bucket_expr = " + ".join(
        f"(CASE WHEN list_sum(list_transform(embedding[{8 * i + 1}:{8 * i + 8}], "
        f"v -> CAST(floor(CAST(v AS DOUBLE) * 1e6) AS BIGINT))) > 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i in range(8)
    )
    dot = _DUCK_DOTQ.format(a="a.embedding", b="b.embedding")
    norm = _DUCK_DOTQ.format(a="embedding", b="embedding")
    return f"""
WITH emb AS (
    SELECT vec_id, embedding, {norm} AS norm2q, CAST({bucket_expr} AS INT) AS bucket
    FROM embeddings
)
SELECT a.vec_id,
       MIN(CASE WHEN CAST({dot} AS DOUBLE)
                     / (SQRT(CAST(a.norm2q AS DOUBLE))
                        * SQRT(CAST(b.norm2q AS DOUBLE))) >= {_COS_T}
                THEN b.vec_id END) AS cluster_id,
       a.vec_id = MIN(CASE WHEN CAST({dot} AS DOUBLE)
                     / (SQRT(CAST(a.norm2q AS DOUBLE))
                        * SQRT(CAST(b.norm2q AS DOUBLE))) >= {_COS_T}
                THEN b.vec_id END) AS kept
FROM emb a JOIN emb b ON a.bucket = b.bucket
GROUP BY a.vec_id
ORDER BY a.vec_id
"""


_N_CENTROIDS = 8


def knn_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse quantizer: partition the vector space by assigning every
    embedding to its nearest centroid (inner-product metric, FAISS
    IndexIVFFlat/METRIC_INNER_PRODUCT shape). Centroids here are the
    first K vectors — the training-free seed a k-means refinement would
    iterate from (each refinement round = this same assignment + a
    centroid-mean groupBy); the ASSIGNMENT is the operator that must
    scale, and it is one broadcast of K tiny centroids against a linear
    scan — no N² anywhere. Downstream ANN probes then search only the
    target cell (see knn_lsh_bucketed for the bucketed-search analog).

    Inner-product comparisons stay in quantized integers (exact at any
    parallelism); argmax ties break on centroid id."""
    views(spark, sf_dir)
    dq = _DOTQ.format(a="e.embedding", b="c.cemb")
    return spark.sql(
        f"""
        WITH c AS (SELECT vec_id AS cid, embedding AS cemb
                   FROM embeddings WHERE vec_id < {_N_CENTROIDS}),
        assign AS (
          SELECT e.vec_id, c.cid, {dq} AS dq,
                 ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                    ORDER BY {dq} DESC, c.cid) AS rk
          FROM embeddings e CROSS JOIN c
        )
        SELECT cid AS centroid,
               COUNT(*) AS n_vectors,
               MIN(vec_id) AS min_vec,
               CAST(SUM(CAST(dq AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS dot_sum
        FROM assign WHERE rk = 1
        GROUP BY cid ORDER BY cid
        """
    )


def _duck_ivf_assign() -> str:
    dq = _DUCK_DOTQ.format(a="e.embedding", b="c.cemb")
    return f"""
WITH c AS (SELECT vec_id AS cid, embedding AS cemb
           FROM embeddings WHERE vec_id < {_N_CENTROIDS}),
assign AS (
  SELECT e.vec_id, c.cid, {dq} AS dq,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
                            ORDER BY {dq} DESC, c.cid) AS rk
  FROM embeddings e CROSS JOIN c
)
SELECT cid AS centroid,
       COUNT(*) AS n_vectors,
       MIN(vec_id) AS min_vec,
       CAST(SUM(CAST(dq AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS dot_sum
FROM assign WHERE rk = 1
GROUP BY cid ORDER BY cid
"""


def kmeans_one_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One FULL k-means refinement round (E-step -> quantized M-step ->
    E-step) inside the oracle gate: centroid components are integer
    means of 1e-6-quantized values with explicit floor division (Spark
    DIV truncates toward zero while DuckDB // floors — on negative sums
    they differ, so neither is used), and both E-steps compare quantized
    integer dots. Everything is exact at any parallelism, which is what
    lets a clustering ROUND — not just the assignment — hash-match across
    engines. The iterated float version is `kmeans_refine`."""
    views(spark, sf_dir)
    return spark.sql(
        f"""
        WITH c0 AS (SELECT vec_id AS cid, embedding AS cemb
                    FROM embeddings WHERE vec_id < {_N_CENTROIDS}),
        a1 AS (
          SELECT vec_id, cid, embedding FROM (
            SELECT e.vec_id, c.cid, e.embedding,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                     aggregate(zip_with(e.embedding, c.cemb, (x, y) ->
                       CAST(floor(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1e12) AS BIGINT)),
                       CAST(0 AS BIGINT), (acc, v) -> acc + v) DESC, c.cid) AS rk
            FROM embeddings e CROSS JOIN c0 c) t WHERE rk = 1
        ),
        dims AS (
          SELECT cid, pos AS dim,
                 CAST(floor(CAST(SUM(CAST(floor(CAST(val AS DOUBLE) * 1e6) AS BIGINT)) AS DOUBLE)
                            / COUNT(*)) AS BIGINT) AS cq
          FROM a1 LATERAL VIEW posexplode(embedding) t AS pos, val
          GROUP BY cid, pos
        ),
        c1 AS (SELECT cid, transform(array_sort(collect_list(struct(dim, cq))), x -> x.cq) AS cq
               FROM dims GROUP BY cid),
        a2 AS (
          SELECT vec_id, cid, dq2 FROM (
            SELECT e.vec_id, c.cid,
                   aggregate(zip_with(e.embedding, c.cq, (x, y) ->
                     CAST(floor(CAST(x AS DOUBLE) * y) AS BIGINT)),
                     CAST(0 AS BIGINT), (acc, v) -> acc + v) AS dq2,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                     aggregate(zip_with(e.embedding, c.cq, (x, y) ->
                       CAST(floor(CAST(x AS DOUBLE) * y) AS BIGINT)),
                       CAST(0 AS BIGINT), (acc, v) -> acc + v) DESC, c.cid) AS rk
            FROM embeddings e CROSS JOIN c1 c) t WHERE rk = 1
        )
        SELECT cid AS centroid, COUNT(*) AS n_vectors, MIN(vec_id) AS min_vec,
               CAST(SUM(CAST(dq2 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS dot_sum
        FROM a2 GROUP BY cid ORDER BY cid
        """
    )


_KMEANS_ROUND_SQL = f"""
WITH c0 AS (SELECT vec_id AS cid, embedding AS cemb
            FROM embeddings WHERE vec_id < {_N_CENTROIDS}),
a1 AS (
  SELECT vec_id, cid, embedding FROM (
    SELECT e.vec_id, c.cid, e.embedding,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
             list_sum(list_transform(list_zip(e.embedding, c.cemb), z ->
               CAST(floor(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) * 1e12) AS BIGINT))) DESC,
             c.cid) AS rk
    FROM embeddings e CROSS JOIN c0 c) t WHERE rk = 1
),
dims AS (
  SELECT cid, g.i AS dim,
         CAST(floor(CAST(SUM(CAST(floor(CAST(embedding[g.i] AS DOUBLE) * 1e6) AS BIGINT)) AS DOUBLE)
                    / COUNT(*)) AS BIGINT) AS cq
  FROM a1, LATERAL (SELECT unnest(generate_series(1, len(a1.embedding))) AS i) g
  GROUP BY cid, g.i
),
c1 AS (SELECT cid, list(cq ORDER BY dim) AS cq FROM dims GROUP BY cid),
a2 AS (
  SELECT vec_id, cid, dq2 FROM (
    SELECT e.vec_id, c.cid,
           list_sum(list_transform(list_zip(e.embedding, c.cq), z ->
             CAST(floor(CAST(z[1] AS DOUBLE) * z[2]) AS BIGINT))) AS dq2,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
             list_sum(list_transform(list_zip(e.embedding, c.cq), z ->
               CAST(floor(CAST(z[1] AS DOUBLE) * z[2]) AS BIGINT))) DESC, c.cid) AS rk
    FROM embeddings e CROSS JOIN c1 c) t WHERE rk = 1
)
SELECT cid AS centroid, COUNT(*) AS n_vectors, MIN(vec_id) AS min_vec,
       CAST(SUM(CAST(dq2 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS dot_sum
FROM a2 GROUP BY cid ORDER BY cid
"""


def kmeans_refine(
    spark: SparkSession, sf_dir: str, k: int = _N_CENTROIDS, rounds: int = 5
) -> DataFrame:
    """SPHERICAL k-means over the embedding table — the refinement loop
    the IVF quantizer seeds (`knn_ivf_assign` is exactly one E-step).
    Each round: assignment (broadcast K centroids x linear scan,
    integer-exact argmax of x·c) then new centroids as per-cell means
    normalized to unit length (one groupBy over exploded dimensions;
    the normalized mean is argmax of the within-cell dot objective under
    ||c||=1, which is what makes the loop monotone — unnormalized means
    would shrink the dots and break Lloyd's guarantee for the
    inner-product metric). Centroid means are float averages, so this is
    NOT cross-engine oracle-able — correctness is pinned by the
    convergence property instead (objective non-decreasing round over
    round; see tests). Returns the final (vec_id, centroid) assignment."""
    import math

    from pyspark.sql import functions as F

    views(spark, sf_dir)
    emb = spark.table("embeddings").select("vec_id", "embedding")

    def _unit(vec: list[float]) -> list[float]:
        n = math.sqrt(sum(v * v for v in vec)) or 1.0
        return [v / n for v in vec]

    centroids = [
        _unit(list(r.embedding))
        for r in emb.filter(F.col("vec_id") < k).orderBy("vec_id").collect()
    ]
    assign = None
    for _ in range(rounds):
        c_df = spark.createDataFrame(
            [(i, c) for i, c in enumerate(centroids)], "cid int, cemb array<double>"
        )
        dq = _DOTQ.format(a="e.embedding", b="c.cemb")
        e = emb.alias("e")
        c = F.broadcast(c_df).alias("c")
        scored = e.crossJoin(c).select(
            "e.vec_id", "c.cid", F.expr(dq).alias("dq"), "e.embedding"
        )
        w = __import__("pyspark.sql", fromlist=["Window"]).Window.partitionBy(
            "vec_id"
        ).orderBy(F.desc("dq"), F.asc("cid"))
        assign = (
            scored.withColumn("rk", F.row_number().over(w))
            .filter("rk = 1")
            .select("vec_id", "cid", "dq", "embedding")
        )
        new_c = (
            assign.select("cid", F.posexplode("embedding").alias("dim", "val"))
            .groupBy("cid", "dim")
            .agg(F.avg("val").alias("m"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select("cid", F.expr("transform(dm, x -> x.m)").alias("cemb"))
            .orderBy("cid")
            .collect()
        )
        centroids = [_unit(list(r.cemb)) for r in new_c]
    return assign.select("vec_id", F.col("cid").alias("centroid"), "dq")


REGISTRY: dict[str, QuerySpec] = {
    "dedup_embedding_cosine": QuerySpec(dedup_embedding_cosine, _duck_dedup_cosine()),
    "knn_ivf_assign": QuerySpec(
        knn_ivf_assign,
        _duck_ivf_assign(),
        "IVF cell assignment: broadcast K centroids x linear scan, exact argmax",
    ),
    "kmeans_one_round": QuerySpec(
        kmeans_one_round,
        _KMEANS_ROUND_SQL,
        "full E-M-E clustering round, integer-quantized, bit-exact",
    ),
    "knn_brute_force": QuerySpec(knn_brute_force, _duck_knn(False)),
    "knn_lsh_bucketed": QuerySpec(knn_lsh_bucketed, _duck_knn(True)),
    "embedding_norms": QuerySpec(embedding_norms, _EMB_NORMS_SQL),
}
