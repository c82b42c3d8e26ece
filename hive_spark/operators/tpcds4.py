"""TPC-DS query-shape coverage, part 4 — the channel twins.

Completes the 99-query corpus (ref: ql/src/test/queries/
clientpositive/perf/query*.q) with the queries that are structural
twins of already-ported shapes on a DIFFERENT channel or dimension —
ported outright so the disposition table needs no analogy rows:

  q11  q74's growth self-join with the list-minus-discount formula
  q16  q94's multi-warehouse EXISTS / NOT-EXISTS returns, on catalog
  q26  q7's demographic star, on catalog
  q30  q1's above-average returns, on web returns by state
  q37  q82's inventory price-band report, on catalog
  q81  q1's above-average returns, on catalog returns by state
  q92  q32's excess-discount scalar threshold, on web
  q99  q62's ship-delay buckets, on catalog x warehouse x call center

Engine-neutral shared SQL, money in exact integer cents throughout
(see tpcds.py). Same star schema; no new derived tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hive_spark.operators import QuerySpec
from hive_spark.operators.tpcds import _oracle, _register_star


def _cents(col: str) -> str:
    return f"CAST(round({col} * 100) AS BIGINT)"


# ref: perf/query11.q — q74's four-way year_total self-join with the
# (list - discount) net formula instead of raw sales price
_Q11 = f"""
WITH year_total AS (
  SELECT ss_customer_sk AS customer_sk, d_year AS yr,
         SUM({_cents("ss_ext_list_price - ss_coupon_amt")}) AS year_total,
         's' AS sale_type
  FROM store_sales, date_dim
  WHERE ss_sold_date_sk = d_date_sk AND d_year IN (1996, 1997)
  GROUP BY ss_customer_sk, d_year
  UNION ALL
  SELECT ws_bill_customer_sk, d_year,
         SUM({_cents("ws_ext_list_price - ws_ext_discount_amt")}), 'w'
  FROM web_sales, date_dim
  WHERE ws_sold_date_sk = d_date_sk AND d_year IN (1996, 1997)
  GROUP BY ws_bill_customer_sk, d_year)
SELECT ts2.customer_sk
FROM year_total ts1, year_total ts2, year_total tw1, year_total tw2
WHERE ts1.customer_sk = ts2.customer_sk
  AND ts1.customer_sk = tw1.customer_sk
  AND ts1.customer_sk = tw2.customer_sk
  AND ts1.sale_type = 's' AND ts2.sale_type = 's'
  AND tw1.sale_type = 'w' AND tw2.sale_type = 'w'
  AND ts1.yr = 1996 AND ts2.yr = 1997
  AND tw1.yr = 1996 AND tw2.yr = 1997
  AND ts1.year_total > 0 AND tw1.year_total > 0
  AND CAST(tw2.year_total AS DOUBLE) / tw1.year_total >
      CAST(ts2.year_total AS DOUBLE) / ts1.year_total
ORDER BY ts2.customer_sk
LIMIT 100"""

# ref: perf/query16.q — catalog orders shipped from >1 warehouse with
# no returns (the q94 shape on the catalog channel, call-center dim)
_Q16 = f"""
SELECT COUNT(DISTINCT cs1.cs_order_number) AS order_count,
       CAST(SUM({_cents("cs1.cs_ext_ship_cost")}) AS DOUBLE) / 100
         AS total_shipping_cost,
       CAST(SUM({_cents("cs1.cs_net_profit")}) AS DOUBLE) / 100
         AS total_net_profit
FROM catalog_sales cs1, date_dim, warehouse
WHERE cs1.cs_ship_date_sk = d_date_sk
  AND d_year = 1996 AND d_moy BETWEEN 2 AND 3
  AND cs1.cs_warehouse_sk = w_warehouse_sk
  AND w_state IN ('ST_2', 'ST_4', 'ST_6')
  AND cs1.cs_call_center_sk <= 10
  AND EXISTS (SELECT 1 FROM catalog_sales cs2
              WHERE cs1.cs_order_number = cs2.cs_order_number
                AND cs1.cs_warehouse_sk <> cs2.cs_warehouse_sk)
  AND NOT EXISTS (SELECT 1 FROM catalog_returns cr1
                  WHERE cs1.cs_order_number = cr1.cr_order_number)"""

# ref: perf/query26.q — q7's demographic/promotion star on catalog
_Q26 = f"""
SELECT i_item_id,
       CAST(SUM(CAST(cs_quantity AS BIGINT)) AS DOUBLE) / COUNT(*)
         AS agg1,
       CAST(SUM({_cents("cs_ext_list_price")}) AS DOUBLE) / 100
         / COUNT(*) AS agg2,
       CAST(SUM({_cents("cs_ext_discount_amt")}) AS DOUBLE) / 100
         / COUNT(*) AS agg3,
       CAST(SUM({_cents("cs_sales_price")}) AS DOUBLE) / 100
         / COUNT(*) AS agg4
FROM catalog_sales, customer_ds c, customer_demographics, date_dim,
     item
WHERE cs_sold_date_sk = d_date_sk AND cs_item_sk = i_item_sk
  AND c.c_customer_sk = cs_bill_customer_sk
  AND c.c_current_cdemo_sk = cd_demo_sk
  AND cd_gender = 'M' AND cd_marital_status = 'S'
  AND cd_education_status = 'College'
  AND d_year = 1996
GROUP BY i_item_id
ORDER BY i_item_id
LIMIT 100"""


def _returns_above_avg(ret: str, cust: str, date: str, amt: str) -> str:
    """q1/q30/q81 family body: per-(customer, state) returns vs 1.2x
    the state average, reported with the customer dimension."""
    return f"""
WITH customer_total_return AS (
  SELECT {cust} AS ctr_customer_sk, ca_state AS ctr_state,
         SUM({_cents(amt)}) AS ctr_total_return
  FROM {ret}, date_dim, customer_ds c0, customer_address
  WHERE {date} = d_date_sk AND d_year = 1996
    AND {cust} = c0.c_customer_sk
    AND c0.c_current_addr_sk = ca_address_sk
  GROUP BY {cust}, ca_state)
SELECT c_customer_sk AS customer_sk, ctr1.ctr_state AS state,
       CAST(ctr1.ctr_total_return AS DOUBLE) / 100 AS total_return
FROM customer_total_return ctr1, customer_ds
WHERE ctr1.ctr_total_return > (
        SELECT AVG(ctr_total_return) * 1.2
        FROM customer_total_return ctr2
        WHERE ctr1.ctr_state = ctr2.ctr_state)
  AND ctr1.ctr_customer_sk = c_customer_sk
ORDER BY customer_sk, state, total_return
LIMIT 100"""


# ref: perf/query30.q — web returns above 1.2x the state average
_Q30 = _returns_above_avg(
    "web_returns", "wr_returning_customer_sk", "wr_returned_date_sk",
    "wr_return_amt")

# ref: perf/query81.q — catalog returns above 1.2x the state average
_Q81 = _returns_above_avg(
    "catalog_returns", "cr_returning_customer_sk", "cr_returned_date_sk",
    "cr_return_amount")

# ref: perf/query37.q — q82's inventory price-band report driven by the
# catalog channel
_Q37 = """
SELECT i_item_id, i_item_desc, i_current_price
FROM item, inventory, catalog_sales
WHERE i_current_price BETWEEN 900 AND 1100
  AND inv_item_sk = i_item_sk
  AND inv_month_seq BETWEEN 49 AND 52
  AND inv_quantity_on_hand BETWEEN 100 AND 500
  AND cs_item_sk = i_item_sk
GROUP BY i_item_id, i_item_desc, i_current_price
ORDER BY i_item_id
LIMIT 100"""

# ref: perf/query92.q — web discounts exceeding 1.3x the item's window
# average (the q32 excess-discount scalar-threshold shape on web)
_Q92 = f"""
SELECT CAST(SUM({_cents("ws_ext_discount_amt")}) AS DOUBLE) / 100
         AS excess_discount_amount
FROM web_sales ws, item, date_dim
WHERE i_item_sk = ws_item_sk
  AND i_manufact_id = 3
  AND d_date_sk = ws_sold_date_sk
  AND d_year = 1996 AND d_qoy = 1
  AND CAST({_cents("ws_ext_discount_amt")} AS DOUBLE) > (
        SELECT 1.3 * AVG({_cents("ws2.ws_ext_discount_amt")})
        FROM web_sales ws2, date_dim d2
        WHERE ws2.ws_item_sk = i_item_sk
          AND d2.d_date_sk = ws2.ws_sold_date_sk
          AND d2.d_year = 1996 AND d2.d_qoy = 1)"""

# ref: perf/query99.q — q62's ship-delay buckets on the catalog
# channel, broken out by warehouse and call center
_Q99_LAT = "d2.d_day_seq - d1.d_day_seq"
_Q99 = f"""
SELECT w_warehouse_name, cs_call_center_sk AS call_center,
  SUM(CASE WHEN {_Q99_LAT} <= 30 THEN 1 ELSE 0 END) AS d30,
  SUM(CASE WHEN {_Q99_LAT} > 30 AND {_Q99_LAT} <= 60 THEN 1 ELSE 0 END)
    AS d31_60,
  SUM(CASE WHEN {_Q99_LAT} > 60 AND {_Q99_LAT} <= 90 THEN 1 ELSE 0 END)
    AS d61_90,
  SUM(CASE WHEN {_Q99_LAT} > 90 AND {_Q99_LAT} <= 120 THEN 1 ELSE 0 END)
    AS d91_120,
  SUM(CASE WHEN {_Q99_LAT} > 120 THEN 1 ELSE 0 END) AS d_over_120
FROM catalog_sales, warehouse, date_dim d1, date_dim d2
WHERE cs_sold_date_sk = d1.d_date_sk
  AND cs_ship_date_sk = d2.d_date_sk
  AND cs_warehouse_sk = w_warehouse_sk
  AND d2.d_year = 1996
GROUP BY w_warehouse_name, cs_call_center_sk
ORDER BY w_warehouse_name, call_center
LIMIT 100"""

# ref: perf/query10.q — q35's EXISTS-combo with the full demographic
# breakdown and a city gate
_Q10 = """
SELECT cd_gender, cd_marital_status, cd_education_status, COUNT(*) AS cnt
FROM customer_ds c, customer_address ca, customer_demographics
WHERE c.c_current_addr_sk = ca.ca_address_sk
  AND ca_city IN ('City_2', 'City_5', 'City_8', 'City_11', 'City_14')
  AND cd_demo_sk = c.c_current_cdemo_sk
  AND EXISTS (SELECT 1 FROM store_sales, date_dim
              WHERE c.c_customer_sk = ss_customer_sk
                AND ss_sold_date_sk = d_date_sk
                AND d_year = 1996 AND d_moy BETWEEN 1 AND 4)
  AND (EXISTS (SELECT 1 FROM web_sales, date_dim
               WHERE c.c_customer_sk = ws_bill_customer_sk
                 AND ws_sold_date_sk = d_date_sk
                 AND d_year = 1996 AND d_moy BETWEEN 1 AND 4)
    OR EXISTS (SELECT 1 FROM catalog_sales, date_dim
               WHERE c.c_customer_sk = cs_bill_customer_sk
                 AND cs_sold_date_sk = d_date_sk
                 AND d_year = 1996 AND d_moy BETWEEN 1 AND 4))
GROUP BY cd_gender, cd_marital_status, cd_education_status
ORDER BY cd_gender, cd_marital_status, cd_education_status
LIMIT 100"""


def _rev_share(fact: str, item: str, datecol: str, amt: str) -> str:
    """q12/q20/q98 family: revenue share of each item within its class
    over one month (window SUM over grouped aggregate)."""
    return f"""
SELECT i_item_id, i_category, i_class, i_current_price,
       CAST(SUM({_cents(amt)}) AS DOUBLE) / 100 AS itemrevenue,
       CAST(SUM({_cents(amt)}) AS DOUBLE) * 100.0
         / SUM(SUM({_cents(amt)})) OVER (PARTITION BY i_class)
         AS revenueratio
FROM {fact}, item, date_dim
WHERE {item} = i_item_sk
  AND i_category IN ('STANDARD', 'SMALL', 'LARGE')
  AND {datecol} = d_date_sk
  AND d_year = 1996 AND d_moy = 6
GROUP BY i_item_id, i_category, i_class, i_current_price
ORDER BY i_category, i_class, i_item_id
LIMIT 100"""


# ref: perf/query12.q — web revenue share per class
_Q12 = _rev_share("web_sales", "ws_item_sk", "ws_sold_date_sk",
                  "ws_ext_sales_price")

# ref: perf/query20.q — catalog revenue share per class
_Q20 = _rev_share("catalog_sales", "cs_item_sk", "cs_sold_date_sk",
                  "cs_ext_sales_price")


def _vs_window_avg(key: str, bucket: str, pred: str) -> str:
    """q53/q63 family (q89's deviation on a different hierarchy):
    per-(key, bucket) sales vs the key's average over the year."""
    return f"""
WITH m AS (
  SELECT {key} AS k, {bucket} AS b,
         SUM({_cents("ss_ext_sales_price")}) AS sum_sales
  FROM store_sales, item, date_dim
  WHERE ss_item_sk = i_item_sk AND ss_sold_date_sk = d_date_sk
    AND d_year = 1996 AND {pred}
  GROUP BY {key}, {bucket})
SELECT k, b,
       CAST(sum_sales AS DOUBLE) / 100 AS sum_sales,
       avg_sales / 100 AS avg_sales
FROM (SELECT *, AVG(sum_sales) OVER (PARTITION BY k) AS avg_sales
      FROM m) t
WHERE avg_sales > 0
  AND ABS(sum_sales - avg_sales) / avg_sales > 0.1
ORDER BY k, b
LIMIT 100"""


# ref: perf/query53.q — quarterly manufacturer sales vs yearly average
_Q53 = _vs_window_avg(
    "i_manufact_id", "d_qoy",
    "i_class IN ('CLASS_0', 'CLASS_1', 'CLASS_2')")

# ref: perf/query63.q — monthly manager sales vs yearly average
_Q63 = _vs_window_avg(
    "i_manager_id", "d_moy",
    "i_category IN ('STANDARD', 'ECONOMY')")


def _union_by_item(pred: str) -> str:
    """q33/q56/q60 family: three channel subqueries summed per item
    attribute, gated by an item subquery."""
    parts = []
    for fact, item, datecol, addr, amt in (
        ("store_sales", "ss_item_sk", "ss_sold_date_sk", "ss_addr_sk",
         "ss_ext_sales_price"),
        ("catalog_sales", "cs_item_sk", "cs_sold_date_sk",
         "cs_bill_addr_sk", "cs_ext_sales_price"),
        ("web_sales", "ws_item_sk", "ws_sold_date_sk", "ws_bill_addr_sk",
         "ws_ext_sales_price"),
    ):
        parts.append(f"""
  SELECT i_item_id, SUM({_cents(amt)}) AS total_sales
  FROM {fact}, date_dim, customer_address, item
  WHERE i_item_id IN (SELECT i_item_id FROM item WHERE {pred})
    AND {item} = i_item_sk AND {datecol} = d_date_sk
    AND d_year = 1996 AND d_moy = 5
    AND {addr} = ca_address_sk AND ca_state = 'ST_3'
  GROUP BY i_item_id""")
    return (
        "WITH ss AS (" + parts[0] + "),\ncs AS (" + parts[1]
        + "),\nws AS (" + parts[2] + """)
SELECT i_item_id,
       CAST(SUM(total_sales) AS DOUBLE) / 100 AS total_sales
FROM (SELECT * FROM ss UNION ALL SELECT * FROM cs
      UNION ALL SELECT * FROM ws) tmp1
GROUP BY i_item_id
ORDER BY total_sales DESC, i_item_id
LIMIT 100"""
    )


# ref: perf/query56.q — 3-channel item union gated by an item-class set
_Q56 = _union_by_item("i_class IN ('CLASS_1', 'CLASS_3')")

# ref: perf/query60.q — 3-channel item union gated by a category
_Q60 = _union_by_item("i_category = 'SMALL'")

# ref: perf/query57.q — q47's monthly deviation on the catalog channel,
# partitioned by call center
_Q57 = f"""
WITH v1 AS (
  SELECT i_brand, cs_call_center_sk AS cc, d_year, d_moy,
         SUM({_cents("cs_ext_sales_price")}) AS sum_sales,
         AVG(SUM({_cents("cs_ext_sales_price")}))
           OVER (PARTITION BY i_brand, cs_call_center_sk, d_year)
           AS avg_monthly_sales,
         LAG(SUM({_cents("cs_ext_sales_price")}))
           OVER (PARTITION BY i_brand, cs_call_center_sk
                 ORDER BY d_year, d_moy) AS psum,
         LEAD(SUM({_cents("cs_ext_sales_price")}))
           OVER (PARTITION BY i_brand, cs_call_center_sk
                 ORDER BY d_year, d_moy) AS nsum
  FROM catalog_sales, item, date_dim
  WHERE cs_item_sk = i_item_sk AND cs_sold_date_sk = d_date_sk
    AND d_year IN (1995, 1996, 1997)
  GROUP BY i_brand, cs_call_center_sk, d_year, d_moy),
v2 AS (
  SELECT i_brand, cc, d_year, d_moy,
         CAST(sum_sales AS DOUBLE) / 100 AS sum_sales,
         avg_monthly_sales / 100 AS avg_monthly_sales,
         CAST(psum AS DOUBLE) / 100 AS prev_sales,
         CAST(nsum AS DOUBLE) / 100 AS next_sales,
         (sum_sales - avg_monthly_sales) / 100 AS deviation
  FROM v1
  WHERE d_year = 1996 AND avg_monthly_sales > 0
    AND ABS(sum_sales - avg_monthly_sales) / avg_monthly_sales > 0.1)
SELECT i_brand, cc, d_year, d_moy, sum_sales, avg_monthly_sales,
       prev_sales, next_sales
FROM v2
ORDER BY deviation, i_brand, cc, d_moy
LIMIT 100"""

# ref: perf/query86.q — web ROLLUP with rank inside each hierarchy
# level (RANK partitioned by the GROUPING mask + parent category)
_Q86 = f"""
SELECT CAST(SUM({_cents("ws_ext_sales_price")}) AS DOUBLE) / 100
         AS total_sum,
       i_category, i_class,
       CAST(GROUPING(i_category) + GROUPING(i_class) AS INT)
         AS lochierarchy,
       CAST(RANK() OVER (
         PARTITION BY GROUPING(i_category) + GROUPING(i_class),
                      CASE WHEN GROUPING(i_class) = 0
                           THEN i_category END
         ORDER BY SUM({_cents("ws_ext_sales_price")}) DESC,
                  i_category ASC NULLS FIRST,
                  i_class ASC NULLS FIRST) AS INT)
         AS rank_within_parent
FROM web_sales, date_dim, item
WHERE d_month_seq BETWEEN 49 AND 60
  AND d_date_sk = ws_sold_date_sk
  AND i_item_sk = ws_item_sk
GROUP BY ROLLUP (i_category, i_class)
ORDER BY lochierarchy DESC, i_category, i_class
LIMIT 100"""

_BODIES = {
    "tpcds_q10_demographic_exists": _Q10,
    "tpcds_q12_web_revenue_share": _Q12,
    "tpcds_q20_catalog_revenue_share": _Q20,
    "tpcds_q53_manufact_vs_avg": _Q53,
    "tpcds_q56_class_union": _Q56,
    "tpcds_q57_catalog_deviation": _Q57,
    "tpcds_q60_category_union": _Q60,
    "tpcds_q63_manager_vs_avg": _Q63,
    "tpcds_q86_web_rollup_rank": _Q86,
    "tpcds_q11_two_channel_growth": _Q11,
    "tpcds_q16_catalog_multi_warehouse": _Q16,
    "tpcds_q26_catalog_demographics": _Q26,
    "tpcds_q30_web_returns_above_avg": _Q30,
    "tpcds_q37_catalog_inventory_price": _Q37,
    "tpcds_q81_catalog_returns_above_avg": _Q81,
    "tpcds_q92_web_excess_discount": _Q92,
    "tpcds_q99_catalog_ship_delay": _Q99,
}


def _mk(body: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        _register_star(spark, sf_dir)
        return spark.sql(body)

    return fn


REGISTRY: dict[str, QuerySpec] = {
    name: QuerySpec(_mk(body), _oracle(body)) for name, body in _BODIES.items()
}
