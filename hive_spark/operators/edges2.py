"""Semantic-edge conformance queries, part 2 — the null-logic traps.

Hive's qtest corpus leans hard on three-valued-logic and outer-join
filter-placement semantics (ref: ql/src/test/queries/clientpositive/
subquery_notin.q, join_filters.q, lateral_view_outer.q; NULL-on-error
arithmetic per Hive's non-ANSI evaluation — the engine runs
spark.sql.ansi.enabled=false to match, see hive_spark/session.py).
Each shape here is a classic silent-wrong-answer generator, pinned by
the DuckDB oracle:

- NOT IN whose subquery yields a NULL: never-TRUE for non-members
  (result 0 rows), vs the same set without NULLs (plain anti join).
- LEFT JOIN dimension filter in ON (keeps unmatched rows) vs in WHERE
  (implicitly converts to inner) — counted side by side.
- x / 0 and x % 0 return NULL (Hive NULL-on-error; DuckDB agrees, so
  the SQL is shared verbatim).
- LATERAL VIEW OUTER explode of an empty array preserves the parent
  row with NULL (DuckDB twin: unnest of [NULL]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hive_spark.operators import QuerySpec, views


def _mk(sql: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        views(spark, sf_dir)
        return spark.sql(sql)

    return run


# NOT IN vs a NULL-bearing set: `k NOT IN (s)` is NULL (not TRUE) for
# every k not literally in s, so the with-null count MUST be 0 while the
# null-free count is a plain anti join. Shared SQL — both engines
# implement ANSI 3VL here.
_NOT_IN_NULLS = """
WITH probe AS (SELECT n_nationkey AS k FROM nation),
     withnull AS (SELECT NULLIF(r_regionkey, 3) AS k FROM region),
     nonull AS (SELECT r_regionkey AS k FROM region WHERE r_regionkey <> 3)
SELECT
  (SELECT COUNT(*) FROM probe
   WHERE k NOT IN (SELECT k FROM withnull)) AS cnt_with_null,
  (SELECT COUNT(*) FROM probe
   WHERE k NOT IN (SELECT k FROM nonull)) AS cnt_no_null
"""

# LEFT JOIN filter placement: in ON the filter only gates WHICH right
# rows match (unmatched customers survive with NULLs); in WHERE it
# filters the joined result (NULL fails the predicate -> inner join).
_OUTER_JOIN_FILTER = """
WITH on_filter AS (
  SELECT COUNT(*) AS total,
         SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS unmatched
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_totalprice > 200000),
where_filter AS (
  SELECT COUNT(*) AS total,
         SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS unmatched
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  WHERE o_totalprice > 200000)
SELECT on_filter.total AS total_on, on_filter.unmatched AS unmatched_on,
       where_filter.total AS total_where,
       where_filter.unmatched AS unmatched_where
FROM on_filter, where_filter
"""

# Hive NULL-on-error arithmetic (non-ANSI): /0 and %0 yield NULL, never
# an exception; aggregate over a column where every fifth row divides by
# zero. DuckDB's default semantics agree, so one SQL serves both.
_DIV_BY_ZERO = """
SELECT l_returnflag,
       COUNT(*) AS n,
       COUNT(l_quantity / NULLIF(1, 1)) AS all_null_probe,
       COUNT(l_quantity / (l_linenumber % 5)) AS n_defined_div,
       COUNT(CAST(l_quantity AS BIGINT) % (l_linenumber % 5)) AS n_defined_mod
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

# LATERAL VIEW OUTER explode() of an empty array: the parent row
# survives with x = NULL (Hive LateralViewJoinOperator outer mode).
_LATERAL_OUTER_SPARK = """
SELECT n_nationkey, x
FROM nation
LATERAL VIEW OUTER explode(
  CASE WHEN n_nationkey % 5 = 0 THEN array()
       ELSE array(n_nationkey, n_nationkey * 2) END) t AS x
ORDER BY n_nationkey, x
"""

_LATERAL_OUTER_DUCK = """
SELECT n_nationkey,
       unnest(CASE WHEN n_nationkey % 5 = 0 THEN [NULL]
                   ELSE [n_nationkey, n_nationkey * 2] END) AS x
FROM nation
ORDER BY n_nationkey, x
"""

REGISTRY: dict[str, QuerySpec] = {
    "edge_not_in_nulls": QuerySpec(_mk(_NOT_IN_NULLS), _NOT_IN_NULLS),
    "edge_outer_join_filter": QuerySpec(
        _mk(_OUTER_JOIN_FILTER), _OUTER_JOIN_FILTER
    ),
    "edge_div_by_zero": QuerySpec(_mk(_DIV_BY_ZERO), _DIV_BY_ZERO),
    "edge_lateral_outer_empty": QuerySpec(
        _mk(_LATERAL_OUTER_SPARK), _LATERAL_OUTER_DUCK
    ),
}
