"""r9 optimization-round experiment lab: interleaved best-of-N A/B of
candidate rewrites vs the current registry implementation, with a
row-identity check so a faster-but-wrong variant can never win.

Usage: python scripts/perf_lab_r9.py <experiment> [sf_dir] [reps]
Experiments: events_session | tfidf | invidx | q9
"""
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from hive_spark.session import get_session  # noqa: E402
from hive_spark.operators import full_registry, views  # noqa: E402

SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 4
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def events_session_variant(spark, sf_dir):
    """Gaps-and-islands twin of the native session_window aggregation:
    lag + running-sum session ids in ONE window sort, groupBy rides the
    same user_id partitioning."""
    views(spark, sf_dir)
    df = spark.table("events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = (
        F.when(
            F.col("ts").cast("timestamp")
            - F.lag(F.col("ts").cast("timestamp")).over(w)
            < F.expr("INTERVAL 30 MINUTES"),
            0,
        )
        .otherwise(1)
    )
    sid = F.sum(brk).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("_sid", sid)
        .groupBy("user_id", "_sid")
        .agg(
            F.unix_millis(F.min("ts").cast("timestamp")).alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("decimal(28,4)")
            .alias("sum_value"),
        )
        .select("user_id", "session_start", "n_events", "sum_value")
        .orderBy("user_id", "session_start")
    )


def tfidf_variant(spark, sf_dir):
    """Single doc_id exchange feeding tf + window (hash(doc_id) satisfies
    the (doc_id, tok) clustering), df rides its own tok exchange."""
    views(spark, sf_dir)
    return spark.sql(
        """
        WITH toks AS (
          SELECT /*+ REPARTITION(doc_id) */ doc_id, tok
          FROM documents
          LATERAL VIEW explode(filter(split(text, ' '), x -> x != '')) t AS tok
        ),
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
        SELECT doc_id, tok, tf, df, score, CAST(rk AS BIGINT) AS rk
        FROM ranked WHERE rk <= 5
        ORDER BY doc_id, rk
        """
    )


def invidx_variant(spark, sf_dir):
    """Single tok exchange: repartition raw token rows by tok; the
    (doc_id, tok) tf aggregation, the tok window and the tok groupBy all
    ride that one partitioning."""
    views(spark, sf_dir)
    return spark.sql(
        """
        WITH toks AS (
          SELECT /*+ REPARTITION(tok) */ doc_id, tok
          FROM documents
          LATERAL VIEW explode(filter(split(text, ' '), x -> x != '')) t AS tok
        ),
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


VARIANTS = {
    "events_session": ("events_session", events_session_variant),
    "tfidf": ("text_tfidf_topk", tfidf_variant),
    "invidx": ("text_inverted_index", invidx_variant),
    "q9": ("tpch_q9", None),  # new impl already in registry; B = SQL text
    "q75": ("tpcds_q75_prior_year_delta", None),  # B = self-join SQL text
}


def q9_sql_text(spark, sf_dir):
    from hive_spark.operators.tpch2 import _Q9

    views(spark, sf_dir)
    return spark.sql(_Q9)


def q75_sql_text(spark, sf_dir):
    from hive_spark.operators.tpcds2 import _Q75
    from hive_spark.operators.tpcds import _register_star

    _register_star(spark, sf_dir)
    return spark.sql(_Q75)


def canon_rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(x) for x in r) for r in df.select(*cols).collect())


def main():
    exp = sys.argv[1]
    name, variant = VARIANTS[exp]
    spark = get_session(
        app_name=f"perf_lab_{exp}",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    reg = full_registry()
    base_fn = reg[name].fn
    if exp == "q9":
        variant = base_fn          # A = new registry impl
        base_fn = q9_sql_text      # B = old SQL text
    elif exp == "q75":
        variant = base_fn          # A = one-pass conditional agg
        base_fn = q75_sql_text     # B = old self-join SQL text
    # warm-up both
    for df in views(spark, SF).values():
        df.limit(1).count()
    base_fn(spark, SF).write.format("noop").mode("overwrite").save()
    variant(spark, SF).write.format("noop").mode("overwrite").save()
    # row identity
    a = canon_rows(base_fn(spark, SF))
    b = canon_rows(variant(spark, SF))
    assert a == b, f"ROWS DIFFER: base={len(a)} variant={len(b)}"
    print(f"rows identical: {len(a)}")
    ta, tb = [], []
    for _ in range(REPS):
        t0 = time.perf_counter()
        base_fn(spark, SF).write.format("noop").mode("overwrite").save()
        ta.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        variant(spark, SF).write.format("noop").mode("overwrite").save()
        tb.append(time.perf_counter() - t0)
    fmt = lambda xs: "[" + ", ".join(f"{x:.3f}" for x in xs) + f"] best={min(xs):.3f}"
    print(f"base    {name}: {fmt(ta)}")
    print(f"variant {name}: {fmt(tb)}")


if __name__ == "__main__":
    main()
