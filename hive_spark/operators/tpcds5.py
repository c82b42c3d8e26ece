"""TPC-DS query-shape coverage, part 5 — completing all 99.

The final queries of the corpus (ref: ql/src/test/queries/
clientpositive/perf/query*.q), ported onto the derived star schema:

  q5   per-channel sales+returns profit ROLLUP (returns as union rows)
  q8   store profit gated by a derived-INTERSECT zip list
  q9   five bucket CASEs from scalar count/avg subqueries
  q15  catalog zip report with zip-OR-state-OR-price disjunction
  q18  catalog demographic averages under ROLLUP (NULLS-pinned order)
  q22  inventory quantity-on-hand ROLLUP over the item hierarchy
  q28  six price-band (avg, count-distinct) single-row crosses
  q29  q17's chain with quantity sums over three month windows
  q46  per-ticket city-change report (coupon amt + profit)
  q48  conjunctive-band quantity sum (demographics x address bands)
  q77  per-channel sales & returns & profit ROLLUP via per-id joins
  q79  per-ticket city report (q46's weekend twin)
  q83  3-channel returned-quantity parity with percentage deviations
  q91  call-center catalog returns by demographic bands

Engine-neutral shared SQL; money in exact integer cents; averages are
AVG over exact BIGINT (sum/count both exact) rounded to 4 decimals
where emitted. Catalog returns derive the call center the same way
catalog_sales does (1 + order % 20) since the returns fact carries no
cc key of its own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hive_spark.operators import QuerySpec
from hive_spark.operators.tpcds import _oracle, _register_star


def _cents(col: str) -> str:
    return f"CAST(round({col} * 100) AS BIGINT)"


# ref: perf/query5.q — sales and returns as one unioned row stream per
# channel (returns negate profit), aggregated per id, ROLLUPed across
# channels. Web returns recover their warehouse by joining back to the
# sale line (the reference joins web_returns to web_sales the same way).
_Q5 = f"""
WITH ssr AS (
  SELECT s_store_name AS id,
         SUM(sales_cents) AS sales, SUM(return_cents) AS returns_,
         SUM(profit_cents) AS profit
  FROM (SELECT ss_store_sk AS store_sk, ss_sold_date_sk AS date_sk,
               {_cents("ss_ext_sales_price")} AS sales_cents,
               CAST(0 AS BIGINT) AS return_cents,
               {_cents("ss_net_profit")} AS profit_cents
        FROM store_sales
        UNION ALL
        SELECT sr_store_sk, sr_returned_date_sk, CAST(0 AS BIGINT),
               {_cents("sr_return_amt")}, -{_cents("sr_net_loss")}
        FROM store_returns) sal, date_dim, store
  WHERE date_sk = d_date_sk AND d_year = 1996 AND store_sk = s_store_sk
  GROUP BY s_store_name),
csr AS (
  SELECT concat('cc_', cc) AS id,
         SUM(sales_cents) AS sales, SUM(return_cents) AS returns_,
         SUM(profit_cents) AS profit
  FROM (SELECT cs_call_center_sk AS cc, cs_sold_date_sk AS date_sk,
               {_cents("cs_ext_sales_price")} AS sales_cents,
               CAST(0 AS BIGINT) AS return_cents,
               {_cents("cs_net_profit")} AS profit_cents
        FROM catalog_sales
        UNION ALL
        SELECT CAST(1 + (cr_order_number % 20) AS INT),
               cr_returned_date_sk, CAST(0 AS BIGINT),
               {_cents("cr_return_amount")}, -{_cents("cr_net_loss")}
        FROM catalog_returns) sal, date_dim
  WHERE date_sk = d_date_sk AND d_year = 1996
  GROUP BY cc),
wsr AS (
  SELECT concat('wh_', wh) AS id,
         SUM(sales_cents) AS sales, SUM(return_cents) AS returns_,
         SUM(profit_cents) AS profit
  FROM (SELECT ws_warehouse_sk AS wh, ws_sold_date_sk AS date_sk,
               {_cents("ws_ext_sales_price")} AS sales_cents,
               CAST(0 AS BIGINT) AS return_cents,
               {_cents("ws_net_profit")} AS profit_cents
        FROM web_sales
        UNION ALL
        SELECT ws.ws_warehouse_sk, wr.wr_returned_date_sk,
               CAST(0 AS BIGINT), {_cents("wr.wr_return_amt")},
               -{_cents("wr.wr_net_loss")}
        FROM web_returns wr JOIN web_sales ws
          ON wr.wr_order_number = ws.ws_order_number
         AND wr.wr_item_sk = ws.ws_item_sk) sal, date_dim
  WHERE date_sk = d_date_sk AND d_year = 1996
  GROUP BY wh)
SELECT channel, id,
       CAST(SUM(sales) AS DOUBLE) / 100 AS sales,
       CAST(SUM(returns_) AS DOUBLE) / 100 AS returns_,
       CAST(SUM(profit) AS DOUBLE) / 100 AS profit
FROM (SELECT 'store channel' AS channel, id, sales, returns_, profit
      FROM ssr
      UNION ALL
      SELECT 'catalog channel', id, sales, returns_, profit FROM csr
      UNION ALL
      SELECT 'web channel', id, sales, returns_, profit FROM wsr) x
GROUP BY ROLLUP (channel, id)
ORDER BY channel ASC NULLS FIRST, id ASC NULLS FIRST
LIMIT 100"""

# ref: perf/query8.q — store net profit for stores whose zip prefix is
# in a list derived by INTERSECTing high-preferred-customer zips with a
# second zip set
_Q8 = f"""
WITH zip_list AS (
  SELECT substr(ca_zip, 1, 2) AS zip2
  FROM customer_address, customer_ds
  WHERE ca_address_sk = c_current_addr_sk
    AND c_preferred_cust_flag = 'Y'
  GROUP BY substr(ca_zip, 1, 2)
  HAVING COUNT(*) > 5
  INTERSECT
  SELECT DISTINCT substr(ca_zip, 1, 2)
  FROM customer_address
  WHERE substr(ca_zip, 5, 1) IN ('1', '3', '5', '7', '9'))
SELECT s_store_name,
       CAST(SUM({_cents("ss_net_profit")}) AS DOUBLE) / 100
         AS net_profit
FROM store_sales, date_dim, store
WHERE d_date_sk = ss_sold_date_sk
  AND d_qoy = 2 AND d_year = 1996
  AND s_store_sk = ss_store_sk
  AND substr(s_zip, 1, 2) IN (SELECT zip2 FROM zip_list)
GROUP BY s_store_name
ORDER BY s_store_name"""


def _q9_bucket(i: int, lo: int, hi: int, thresh: int) -> str:
    return f"""
       CASE WHEN (SELECT COUNT(*) FROM store_sales
                  WHERE ss_quantity BETWEEN {lo} AND {hi}) > {thresh}
            THEN (SELECT ROUND(AVG({_cents("ss_coupon_amt")}), 4)
                  FROM store_sales
                  WHERE ss_quantity BETWEEN {lo} AND {hi})
            ELSE (SELECT ROUND(AVG({_cents("ss_net_profit")}), 4)
                  FROM store_sales
                  WHERE ss_quantity BETWEEN {lo} AND {hi})
       END AS bucket{i}"""


# ref: perf/query9.q — five quantity-band bucket CASEs, each choosing
# between two averages based on a scalar count (all 1-row subqueries,
# anchored on a 1-row dimension scan)
_Q9 = (
    "SELECT"
    + ",".join(
        _q9_bucket(i, lo, hi, t)
        for i, (lo, hi, t) in enumerate(
            [(1, 10, 4000), (11, 20, 3000), (21, 30, 2500),
             (31, 40, 2000), (41, 50, 1500)], start=1)
    )
    + "\nFROM region WHERE r_regionkey = 1"
)

# ref: perf/query15.q — catalog revenue by customer zip admitted by a
# zip-prefix list OR a state list OR a big-ticket price
_Q15 = f"""
SELECT ca_zip,
       CAST(SUM({_cents("cs_sales_price")}) AS DOUBLE) / 100
         AS total_sales
FROM catalog_sales, customer_ds, customer_address, date_dim
WHERE cs_bill_customer_sk = c_customer_sk
  AND c_current_addr_sk = ca_address_sk
  AND (substr(ca_zip, 1, 5) IN ('00017', '00034', '00051', '00068')
    OR ca_state IN ('ST_1', 'ST_5')
    OR cs_sales_price > 60000)
  AND cs_sold_date_sk = d_date_sk
  AND d_qoy = 2 AND d_year = 1996
GROUP BY ca_zip
ORDER BY ca_zip
LIMIT 100"""

# ref: perf/query18.q — catalog demographic averages ROLLUPed over
# (item, state); ORDER BY pins NULL position explicitly because LIMIT
# makes the selected row set order-sensitive
_Q18 = f"""
SELECT i_item_id, ca_state,
       ROUND(AVG(CAST(cs_quantity AS BIGINT)), 4) AS agg1,
       ROUND(AVG({_cents("cs_ext_list_price")}) / 100, 4) AS agg2,
       ROUND(AVG({_cents("cs_ext_sales_price")}) / 100, 4) AS agg3,
       ROUND(AVG({_cents("cs_net_profit")}) / 100, 4) AS agg4
FROM catalog_sales, customer_demographics cd, customer_ds c,
     customer_address ca, date_dim, item
WHERE cs_sold_date_sk = d_date_sk AND cs_item_sk = i_item_sk
  AND cs_bill_customer_sk = c.c_customer_sk
  AND c.c_current_cdemo_sk = cd.cd_demo_sk
  AND c.c_current_addr_sk = ca.ca_address_sk
  AND d_year = 1996
  AND cd.cd_gender = 'F' AND cd.cd_education_status = 'College'
GROUP BY ROLLUP (i_item_id, ca_state)
ORDER BY i_item_id ASC NULLS FIRST, ca_state ASC NULLS FIRST
LIMIT 100"""

# ref: perf/query22.q — average inventory level ROLLUPed over the item
# hierarchy
_Q22 = """
SELECT i_category, i_class, i_brand,
       ROUND(AVG(CAST(inv_quantity_on_hand AS BIGINT)), 4) AS qoh
FROM inventory, item
WHERE inv_item_sk = i_item_sk AND inv_month_seq BETWEEN 49 AND 60
GROUP BY ROLLUP (i_category, i_class, i_brand)
ORDER BY qoh, i_category ASC NULLS FIRST, i_class ASC NULLS FIRST,
         i_brand ASC NULLS FIRST
LIMIT 100"""


def _q28_band(i: int, lo: int, hi: int, plo: int, phi: int) -> str:
    return f"""
 (SELECT ROUND(AVG({_cents("ss_ext_list_price")}), 4) AS avg{i},
         COUNT(DISTINCT {_cents("ss_ext_list_price")}) AS cntd{i}
  FROM store_sales
  WHERE ss_quantity BETWEEN {lo} AND {hi}
    AND (ss_ext_list_price BETWEEN {plo} AND {phi}
      OR ss_coupon_amt BETWEEN {plo * 2} AND {phi * 2}
      OR ss_ext_wholesale_cost BETWEEN {plo * 3} AND {phi * 3})) b{i}"""


# ref: perf/query28.q — six quantity/price-band (avg, count distinct)
# single-row subqueries crossed into one row
_Q28 = (
    "SELECT b1.avg1, b1.cntd1, b2.avg2, b2.cntd2, b3.avg3, b3.cntd3,"
    " b4.avg4, b4.cntd4, b5.avg5, b5.cntd5, b6.avg6, b6.cntd6\nFROM"
    + ",".join(
        _q28_band(i, lo, hi, plo, phi)
        for i, (lo, hi, plo, phi) in enumerate(
            [(0, 5, 1000, 50000), (6, 10, 2000, 60000),
             (11, 15, 3000, 70000), (16, 20, 4000, 80000),
             (21, 25, 5000, 90000), (26, 30, 6000, 100000)], start=1)
    )
)

# ref: perf/query29.q — q17's sold->returned->repurchased chain with
# quantity SUMS over three widening windows
_Q29 = """
SELECT i_item_id, s_store_name,
       SUM(CAST(ss_quantity AS BIGINT)) AS store_sales_quantity,
       SUM(CAST(sr_return_quantity AS BIGINT)) AS store_returns_quantity,
       SUM(CAST(cs_quantity AS BIGINT)) AS catalog_sales_quantity
FROM store_sales, store_returns, catalog_sales, date_dim d1, date_dim d2,
     date_dim d3, store, item
WHERE d1.d_moy = 4 AND d1.d_year = 1996
  AND d1.d_date_sk = ss_sold_date_sk
  AND i_item_sk = ss_item_sk
  AND s_store_sk = ss_store_sk
  AND ss_customer_sk = sr_customer_sk
  AND ss_item_sk = sr_item_sk
  AND ss_ticket_number = sr_ticket_number
  AND sr_returned_date_sk = d2.d_date_sk
  AND d2.d_moy BETWEEN 4 AND 7 AND d2.d_year = 1996
  AND sr_customer_sk = cs_bill_customer_sk
  AND sr_item_sk = cs_item_sk
  AND cs_sold_date_sk = d3.d_date_sk
  AND d3.d_year IN (1996, 1997, 1998)
GROUP BY i_item_id, s_store_name
ORDER BY i_item_id, s_store_name
LIMIT 100"""


def _city_change(day_pred: str, hd_pred: str, cities: str) -> str:
    """q46/q79 family: per-ticket coupon/profit sums where the bought
    city differs from the customer's current city."""
    return f"""
SELECT c_last_name, c_first_name, ca_city, bought_city,
       ss_ticket_number, amt, profit
FROM (SELECT ss_ticket_number, ss_customer_sk, ca_city AS bought_city,
             CAST(SUM({_cents("ss_coupon_amt")}) AS DOUBLE) / 100
               AS amt,
             CAST(SUM({_cents("ss_net_profit")}) AS DOUBLE) / 100
               AS profit
      FROM store_sales, date_dim, store, household_demographics,
           customer_address
      WHERE ss_sold_date_sk = d_date_sk
        AND ss_store_sk = s_store_sk
        AND ss_hdemo_sk = hd_demo_sk
        AND ss_addr_sk = ca_address_sk
        AND ({hd_pred})
        AND {day_pred}
        AND d_year IN (1995, 1996, 1997)
        AND s_city IN ({cities})
      GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, ca_city
     ) dn, customer_ds, customer_address current_addr
WHERE ss_customer_sk = c_customer_sk
  AND c_current_addr_sk = current_addr.ca_address_sk
  AND current_addr.ca_city <> bought_city
ORDER BY c_last_name, c_first_name, ca_city, bought_city,
         ss_ticket_number
LIMIT 100"""


# ref: perf/query46.q — weekend city-change tickets
_Q46 = _city_change(
    "d_day_name IN ('Saturday', 'Sunday')",
    "hd_dep_count = 5 OR hd_vehicle_count = 3",
    "'City_0', 'City_3', 'City_5', 'City_8', 'City_10'")

# ref: perf/query79.q — q46's weekday twin with a dependents filter
_Q79 = _city_change(
    "d_dom BETWEEN 1 AND 2",
    "hd_dep_count = 8 OR hd_vehicle_count > 2",
    "'City_1', 'City_2', 'City_4', 'City_7', 'City_12'")

# ref: perf/query48.q — one conjunctive sum over paired demographic and
# address/profit bands (the q13 disjunction shape without grouping)
_Q48 = """
SELECT SUM(CAST(ss_quantity AS BIGINT)) AS total_quantity
FROM store_sales, store, customer_demographics, customer_address,
     date_dim
WHERE s_store_sk = ss_store_sk
  AND ss_sold_date_sk = d_date_sk AND d_year = 1996
  AND ((cd_demo_sk = ss_cdemo_sk
        AND cd_marital_status = 'M'
        AND cd_education_status = '4 yr Degree'
        AND ss_sales_price BETWEEN 10000.0 AND 80000.0)
    OR (cd_demo_sk = ss_cdemo_sk
        AND cd_marital_status = 'D'
        AND cd_education_status = '2 yr Degree'
        AND ss_sales_price BETWEEN 5000.0 AND 60000.0)
    OR (cd_demo_sk = ss_cdemo_sk
        AND cd_marital_status = 'S'
        AND cd_education_status = 'College'
        AND ss_sales_price BETWEEN 2500.0 AND 50000.0))
  AND ((ss_addr_sk = ca_address_sk
        AND ca_state IN ('ST_0', 'ST_2', 'ST_4')
        AND ss_net_profit BETWEEN 0 AND 20000)
    OR (ss_addr_sk = ca_address_sk
        AND ca_state IN ('ST_1', 'ST_3', 'ST_5')
        AND ss_net_profit BETWEEN 1000 AND 30000)
    OR (ss_addr_sk = ca_address_sk
        AND ca_state IN ('ST_6', 'ST_8', 'ST_9')
        AND ss_net_profit BETWEEN 2000 AND 40000))"""

# ref: perf/query77.q — per-channel sales and returns aggregated
# SEPARATELY per id, LEFT JOINed, then ROLLUPed (q5 reaches the same
# report through a unioned row stream; q77 through per-id join)
_Q77 = f"""
WITH ss_agg AS (
  SELECT ss_store_sk AS id, SUM({_cents("ss_ext_sales_price")}) AS sales,
         SUM({_cents("ss_net_profit")}) AS profit
  FROM store_sales, date_dim
  WHERE ss_sold_date_sk = d_date_sk AND d_year = 1996
  GROUP BY ss_store_sk),
sr_agg AS (
  SELECT sr_store_sk AS id, SUM({_cents("sr_return_amt")}) AS returns_,
         SUM({_cents("sr_net_loss")}) AS profit_loss
  FROM store_returns, date_dim
  WHERE sr_returned_date_sk = d_date_sk AND d_year = 1996
  GROUP BY sr_store_sk),
cs_agg AS (
  SELECT cs_call_center_sk AS id,
         SUM({_cents("cs_ext_sales_price")}) AS sales,
         SUM({_cents("cs_net_profit")}) AS profit
  FROM catalog_sales, date_dim
  WHERE cs_sold_date_sk = d_date_sk AND d_year = 1996
  GROUP BY cs_call_center_sk),
cr_agg AS (
  SELECT CAST(1 + (cr_order_number % 20) AS INT) AS id,
         SUM({_cents("cr_return_amount")}) AS returns_,
         SUM({_cents("cr_net_loss")}) AS profit_loss
  FROM catalog_returns, date_dim
  WHERE cr_returned_date_sk = d_date_sk AND d_year = 1996
  GROUP BY CAST(1 + (cr_order_number % 20) AS INT)),
ws_agg AS (
  SELECT ws_warehouse_sk AS id,
         SUM({_cents("ws_ext_sales_price")}) AS sales,
         SUM({_cents("ws_net_profit")}) AS profit
  FROM web_sales, date_dim
  WHERE ws_sold_date_sk = d_date_sk AND d_year = 1996
  GROUP BY ws_warehouse_sk),
wr_agg AS (
  SELECT ws.ws_warehouse_sk AS id,
         SUM({_cents("wr.wr_return_amt")}) AS returns_,
         SUM({_cents("wr.wr_net_loss")}) AS profit_loss
  FROM web_returns wr JOIN web_sales ws
    ON wr.wr_order_number = ws.ws_order_number
   AND wr.wr_item_sk = ws.ws_item_sk
  JOIN date_dim ON wr.wr_returned_date_sk = d_date_sk
  WHERE d_year = 1996
  GROUP BY ws.ws_warehouse_sk)
SELECT channel, id,
       CAST(SUM(sales) AS DOUBLE) / 100 AS sales,
       CAST(SUM(returns_) AS DOUBLE) / 100 AS returns_,
       CAST(SUM(profit) AS DOUBLE) / 100 AS profit
FROM (
  SELECT 'store channel' AS channel, ss_agg.id AS id, sales,
         COALESCE(returns_, 0) AS returns_,
         profit - COALESCE(profit_loss, 0) AS profit
  FROM ss_agg LEFT JOIN sr_agg ON ss_agg.id = sr_agg.id
  UNION ALL
  SELECT 'catalog channel', cs_agg.id, sales,
         COALESCE(returns_, 0), profit - COALESCE(profit_loss, 0)
  FROM cs_agg LEFT JOIN cr_agg ON cs_agg.id = cr_agg.id
  UNION ALL
  SELECT 'web channel', ws_agg.id, sales,
         COALESCE(returns_, 0), profit - COALESCE(profit_loss, 0)
  FROM ws_agg LEFT JOIN wr_agg ON ws_agg.id = wr_agg.id) x
GROUP BY ROLLUP (channel, id)
ORDER BY channel ASC NULLS FIRST, id ASC NULLS FIRST
LIMIT 100"""

# ref: perf/query83.q — returned quantities for items returned through
# ALL three channels in one month, with percentage deviations
_Q83 = """
WITH sr_items AS (
  SELECT i_item_id AS item_id,
         SUM(CAST(sr_return_quantity AS BIGINT)) AS sr_qty
  FROM store_returns, item, date_dim
  WHERE sr_item_sk = i_item_sk AND sr_returned_date_sk = d_date_sk
    AND d_moy = 7 AND d_year = 1996
  GROUP BY i_item_id),
cr_items AS (
  SELECT i_item_id AS item_id,
         SUM(CAST(cr_return_quantity AS BIGINT)) AS cr_qty
  FROM catalog_returns, item, date_dim
  WHERE cr_item_sk = i_item_sk AND cr_returned_date_sk = d_date_sk
    AND d_moy = 7 AND d_year = 1996
  GROUP BY i_item_id),
wr_items AS (
  SELECT i_item_id AS item_id,
         SUM(CAST(wr_return_quantity AS BIGINT)) AS wr_qty
  FROM web_returns, item, date_dim
  WHERE wr_item_sk = i_item_sk AND wr_returned_date_sk = d_date_sk
    AND d_moy = 7 AND d_year = 1996
  GROUP BY i_item_id)
SELECT sr_items.item_id, sr_qty, cr_qty, wr_qty,
       ROUND(CAST(sr_qty AS DOUBLE) * 100
             / (sr_qty + cr_qty + wr_qty), 4) AS sr_dev,
       ROUND(CAST(cr_qty AS DOUBLE) * 100
             / (sr_qty + cr_qty + wr_qty), 4) AS cr_dev,
       ROUND(CAST(wr_qty AS DOUBLE) * 100
             / (sr_qty + cr_qty + wr_qty), 4) AS wr_dev,
       ROUND(CAST(sr_qty + cr_qty + wr_qty AS DOUBLE) / 3.0, 4)
         AS average
FROM sr_items, cr_items, wr_items
WHERE sr_items.item_id = cr_items.item_id
  AND sr_items.item_id = wr_items.item_id
ORDER BY sr_items.item_id
LIMIT 100"""

# ref: perf/query91.q — catalog returns routed to call centers, broken
# down by customer demographic bands (cc derived as in catalog_sales)
_Q91 = f"""
SELECT CAST(1 + (cr_order_number % 20) AS INT) AS call_center,
       cd_marital_status, cd_education_status,
       CAST(SUM({_cents("cr_net_loss")}) AS DOUBLE) / 100 AS net_loss
FROM catalog_returns, date_dim, customer_ds c, customer_demographics,
     household_demographics, customer_address
WHERE cr_returned_date_sk = d_date_sk
  AND d_year = 1996 AND d_moy = 11
  AND cr_returning_customer_sk = c.c_customer_sk
  AND cd_demo_sk = c.c_current_cdemo_sk
  AND hd_demo_sk = c.c_current_hdemo_sk
  AND ca_address_sk = c.c_current_addr_sk
  AND ((cd_marital_status = 'S' AND cd_education_status = 'Secondary')
    OR (cd_marital_status = 'M' AND cd_education_status = 'College'))
  AND hd_buy_potential = '>10000'
GROUP BY CAST(1 + (cr_order_number % 20) AS INT),
         cd_marital_status, cd_education_status
ORDER BY call_center, cd_marital_status, cd_education_status"""

_BODIES = {
    "tpcds_q5_channel_profit_rollup": _Q5,
    "tpcds_q8_preferred_zip_profit": _Q8,
    "tpcds_q9_quantity_buckets": _Q9,
    "tpcds_q15_catalog_zip_report": _Q15,
    "tpcds_q18_catalog_demo_rollup": _Q18,
    "tpcds_q22_inventory_rollup": _Q22,
    "tpcds_q28_price_band_crosses": _Q28,
    "tpcds_q29_quantity_chain": _Q29,
    "tpcds_q46_city_change_weekend": _Q46,
    "tpcds_q48_band_quantity_sum": _Q48,
    "tpcds_q77_channel_profit_joins": _Q77,
    "tpcds_q79_city_change_weekday": _Q79,
    "tpcds_q83_returned_parity": _Q83,
    "tpcds_q91_cc_returns_demo": _Q91,
}


def _mk(body: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        _register_star(spark, sf_dir)
        return spark.sql(body)

    return fn


REGISTRY: dict[str, QuerySpec] = {
    name: QuerySpec(_mk(body), _oracle(body)) for name, body in _BODIES.items()
}
