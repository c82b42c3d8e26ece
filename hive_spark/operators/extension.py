"""UDF/UDAF/UDTF/PTF extension surface + SCRIPT TRANSFORM.

Hive's extension points (SURVEY §2.13) and their Spark-native analogs,
each demonstrated as an oracle-checked query:

- SCRIPT TRANSFORM (`TRANSFORM ... USING 'cmd'`, ScriptOperator ref:
  ql/.../exec/ScriptOperator.java:61) → RDD pipe() through a real external
  process (awk), tab-separated rows both ways.
- MatchPath PTF (row-sequence pattern over an ordered partition, ref:
  ql/.../udf/ptf/MatchPath.java, registered FunctionRegistry.java:684)
  → applyInPandas per partition key with an ordered scan.
- Python UDTF (1 row → N rows; GenericUDTF ref ql/.../udf/generic/
  GenericUDTF.java:40) → Spark Python UDTF emitting token bigrams.
- pandas GROUPED_AGG UDAF (GenericUDAFEvaluator ref ql/.../udf/generic/
  GenericUDAFEvaluator.java:87) → grouped-agg pandas_udf (median).

Scale notes: pipe() and applyInPandas are per-partition streams (no
driver loop); grouped-agg pandas UDFs are Arrow-batched per group. These
are the designated slow paths — everything that CAN be a builtin
expression elsewhere in the engine is one.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_spark.operators import QuerySpec, views


def ext_script_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRANSFORM (n_nationkey, n_name) USING 'awk ...': the external
    process doubles the key and upper-cases the name."""
    views(spark, sf_dir)
    nation = spark.table("nation").select("n_nationkey", "n_name").orderBy("n_nationkey")
    piped = (
        nation.rdd.map(lambda r: f"{r.n_nationkey}\t{r.n_name}")
        .pipe("awk -F'\\t' '{print $1*2 \"\\t\" toupper($2)}'")
        .map(lambda line: line.split("\t"))
        .map(lambda p: (int(p[0]), p[1]))
    )
    return spark.createDataFrame(piped, "doubled_key int, upper_name string").orderBy(
        "doubled_key"
    )


_SCRIPT_SQL = """
SELECT n_nationkey * 2 AS doubled_key, upper(n_name) AS upper_name
FROM nation ORDER BY doubled_key
"""


def ext_matchpath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MatchPath analog: per user (ordered by ts), find every occurrence of
    the pattern signup -> purchase (immediately consecutive) and emit the
    pair with the conversion lag."""
    views(spark, sf_dir)
    ev = spark.table("events").select(
        "user_id", "event_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )

    def match(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        out = {"user_id": [], "signup_event": [], "purchase_event": [], "lag_us": []}
        for i in range(len(pdf) - 1):
            if (
                pdf.event_type[i] == "signup"
                and pdf.event_type[i + 1] == "purchase"
            ):
                out["user_id"].append(pdf.user_id[i])
                out["signup_event"].append(pdf.event_id[i])
                out["purchase_event"].append(pdf.event_id[i + 1])
                # Timedelta.value is exact nanoseconds -> exact micros
                out["lag_us"].append((pdf.ts[i + 1] - pdf.ts[i]).value // 1000)
        return pd.DataFrame(out)

    return (
        ev.groupBy("user_id")
        .applyInPandas(
            match,
            "user_id bigint, signup_event bigint, purchase_event bigint, lag_us bigint",
        )
        .orderBy("user_id", "signup_event")
    )


_MATCHPATH_SQL = """
SELECT user_id, signup_event, purchase_event, lag_us
FROM (
    SELECT user_id, event_id AS signup_event,
           lead(event_id) OVER w AS purchase_event,
           event_type,
           lead(event_type) OVER w AS next_type,
           epoch_us(lead(ts) OVER w) - epoch_us(ts) AS lag_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
WHERE event_type = 'signup' AND next_type = 'purchase'
ORDER BY user_id, signup_event
"""


def ext_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF: one document row -> N bigram rows (GenericUDTF shape:
    process() forwards many rows per input)."""
    from pyspark.sql.functions import udtf

    views(spark, sf_dir)

    @udtf(returnType="doc_id: bigint, pos: int, bigram: string", useArrow=True)
    class Bigrams:
        def eval(self, doc_id: int, text: str):
            toks = [t for t in text.split(" ") if t]
            for i in range(len(toks) - 1):
                yield doc_id, i, f"{toks[i]} {toks[i + 1]}"

    spark.udtf.register("ext_bigrams", Bigrams)
    return spark.sql(
        """
        SELECT b.doc_id, b.pos, b.bigram
        FROM documents d, LATERAL ext_bigrams(d.doc_id, d.text) b
        WHERE d.doc_id < 50
        ORDER BY b.doc_id, b.pos
        """
    )


_UDTF_SQL = """
WITH toks AS (
    SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS t
    FROM documents WHERE doc_id < 50
)
SELECT doc_id, CAST(i - 1 AS INT) AS pos, t[i] || ' ' || t[i + 1] AS bigram
FROM toks, unnest(generate_series(1, len(t) - 1)) g(i)
ORDER BY doc_id, pos
"""


def ext_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDAF: median order price per status (exact
    median is deterministic for a fixed multiset — no float accumulation)."""
    from pyspark.sql.functions import pandas_udf

    views(spark, sf_dir)

    @pandas_udf("double")
    def median_udaf(v: pd.Series) -> float:
        return float(v.median())

    return (
        spark.table("orders")
        .select("o_orderstatus", F.col("o_totalprice").cast("double").alias("p"))
        .groupBy("o_orderstatus")
        .agg(median_udaf("p").alias("median_price"))
        .orderBy("o_orderstatus")
    )


_UDAF_SQL = """
SELECT o_orderstatus, median(CAST(o_totalprice AS DOUBLE)) AS median_price
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


REGISTRY: dict[str, QuerySpec] = {
    "ext_script_transform": QuerySpec(ext_script_transform, _SCRIPT_SQL),
    "ext_matchpath": QuerySpec(ext_matchpath, _MATCHPATH_SQL),
    "ext_python_udtf": QuerySpec(ext_python_udtf, _UDTF_SQL),
    "ext_pandas_udaf": QuerySpec(ext_pandas_udaf, _UDAF_SQL),
}
