"""Oracle SQL — tpch domain (entries mechanically moved from oracles.py, values verbatim)."""


from __future__ import annotations
from .common import *  # noqa: F401,F403

ORACLES: dict[str, str] = {
    "heavy_hitters_cms": """
SELECT event_type, CAST(count(*) AS BIGINT) AS true_cnt, TRUE AS est_ok
FROM events GROUP BY 1
""",
    "join_enrichment_dims": """
SELECT r_name AS region, count(*) AS n_customers,
       floor((avg(c_acctbal)) * 100.0 + 0.5) / 100.0 AS avg_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1
""",
    "join_semi_anti": """
SELECT c_mktsegment,
       CAST(sum(CASE WHEN has_o THEN 1 ELSE 0 END) AS BIGINT) AS n_with_orders,
       CAST(sum(CASE WHEN has_o THEN 0 ELSE 1 END) AS BIGINT)
         AS n_without_orders
FROM (SELECT c_mktsegment,
             EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) AS has_o
      FROM customer)
GROUP BY 1
""",
    "pivot_status": """
SELECT o_orderpriority,
       CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS n_f,
       CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS n_o,
       CAST(count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS n_p
FROM orders GROUP BY 1
""",
    "grouping_sets": """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                        (o_orderstatus), ())
""",
    "agg_rollup": """
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
    "agg_cube": """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       round(sum(l_quantity), 2) AS qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    "set_ops": """
SELECT
  (SELECT count(*) FROM
    (SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate < '1998-01-01'
     INTERSECT
     SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= '1998-01-01'))
    AS n_both,
  (SELECT count(*) FROM
    (SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate < '1998-01-01'
     EXCEPT
     SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= '1998-01-01'))
    AS n_only_early
""",
    "topk_orders": """
SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice, o_orderstatus
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
""",
    "pricing_summary": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       floor((CAST(sum(CAST(l_extendedprice AS DECIMAL(30,8))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS sum_base_price,
       floor((CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS sum_disc_price,
       floor((CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(30,8))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS sum_charge,
       floor((avg(l_quantity)) * 10000.0 + 0.5) / 10000.0 AS avg_qty,
       floor((CAST(sum(CAST(l_extendedprice AS DECIMAL(30,8))) AS DOUBLE) / count(*)) * 10000.0 + 0.5) / 10000.0 AS avg_price,
       floor((CAST(sum(CAST(l_discount AS DECIMAL(30,8))) AS DOUBLE) / count(*)) * 10000.0 + 0.5) / 10000.0 AS avg_disc,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= '1998-09-02' GROUP BY 1, 2
""",
    "q3_shipping_priority": """
SELECT o_orderkey,
       floor((CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS revenue,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < '1998-01-01' AND l_shipdate > '1998-01-01'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
""",
    "q5_nation_revenue": """
SELECT n_name AS nation,
       floor((CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= '1996-01-01' AND o_orderdate < '1998-01-01'
GROUP BY 1
""",
    "q13_order_count_distribution": """
SELECT c_count, count(*) AS n_customers
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY 1)
GROUP BY 1
""",
    "q17_small_qty_revenue": """
WITH pa AS (SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_lim
            FROM lineitem GROUP BY 1)
SELECT floor((CAST(sum(CAST(l_extendedprice AS DECIMAL(30,8))) AS DOUBLE)
              / 7.0) * 100.0 + 0.5) / 100.0 AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN pa USING (l_partkey)
WHERE p_brand = 'Brand#4' AND l_quantity < qty_lim
""",
    "q18_big_spenders": """
WITH big AS (SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
             FROM lineitem GROUP BY 1 HAVING round(sum(l_quantity), 2) > 300)
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
       round(o_totalprice, 2) AS o_totalprice, total_qty
FROM orders
JOIN big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
""",
    "skew_salted_agg": """
SELECT event_type, count(*) AS n_events,
       floor((CAST(sum(CAST(value AS DECIMAL(30,8))) AS DOUBLE))
             * 100.0 + 0.5) / 100.0 AS sum_value
FROM events GROUP BY 1
""",
    "skew_replicated_join": """
SELECT c_mktsegment, count(*) AS n_events,
       floor((CAST(sum(CAST(value AS DECIMAL(30,8))) AS DOUBLE))
             * 100.0 + 0.5) / 100.0 AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1
""",
    "q22_idle_customers": """
WITH ab AS (SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0)
SELECT c_mktsegment, count(*) AS n_custs,
       floor((CAST(sum(CAST(c_acctbal AS DECIMAL(30,8))) AS DOUBLE))
             * 100.0 + 0.5) / 100.0 AS total_bal
FROM customer, ab
WHERE c_acctbal > ab
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= '1998-06-01')
GROUP BY 1
""",
    "sql_surface": """
WITH yearly AS (
  SELECT o_custkey, year(o_orderdate) AS yr,
         count(*) AS n_orders,
         floor(CAST(sum(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE)
               * 100.0 + 0.5) / 100.0 AS spend
  FROM orders GROUP BY 1, 2
)
SELECT o_custkey, CAST(yr AS BIGINT) AS yr, n_orders,
       CAST(spend AS DOUBLE) AS spend,
       CAST(rank() OVER (PARTITION BY yr ORDER BY spend DESC,
                         o_custkey ASC) AS BIGINT) AS spend_rank
FROM yearly
WHERE yr = 1997
ORDER BY spend_rank LIMIT 25
""",
    "array_funcs": """
WITH a AS (
  SELECT l_orderkey,
         list_sort(list(round(l_quantity, 2))) AS qtys
  FROM lineitem GROUP BY 1)
SELECT l_orderkey,
       CAST(len(qtys) AS BIGINT) AS n_items,
       qtys[1] AS min_qty,
       CAST(len(list_filter(qtys, q -> q > 25)) AS BIGINT) AS n_large,
       floor((list_sum(list_transform(qtys, q -> q * 2.0)))
             * 100.0 + 0.5) / 100.0 AS double_total
FROM a
""",
    "q6_forecast_revenue": """
SELECT floor((CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(30,8))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS revenue
FROM lineitem
WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
""",
    "q7_nation_volume": """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       floor((CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS volume
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
""",
    "q10_returned_items": """
SELECT c_custkey, c_name,
       floor((CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS revenue,
       round(c_acctbal, 2) AS c_acctbal, n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= '1997-01-01' AND o_orderdate < '1997-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC LIMIT 20
""",
    "q12_priority_lines": """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
GROUP BY 1
""",
    "q14_promo_revenue": """
SELECT floor((100.0
        * CAST(sum(CASE WHEN p_type = 'PROMO'
                        THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))
                        ELSE CAST(0 AS DECIMAL(30,8)) END) AS DOUBLE)
        / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS DOUBLE))
       * 10000.0 + 0.5) / 10000.0 AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= '1997-03-01' AND l_shipdate < '1997-04-01'
""",
    "q16_supplier_count": """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#4'
  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
""",
    "q19_disjunctive_revenue": """
SELECT floor((CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50
       AND l_quantity BETWEEN 20 AND 30)
""",
    "q20_promo_shippers": """
SELECT s_suppkey, s_name, round(s_acctbal, 2) AS s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'PROMO'
    AND l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
  GROUP BY l_suppkey
  HAVING round(sum(l_quantity), 2) > 300)
""",
    "join_cardinality_estimate": """
WITH
ol AS (
  SELECT 'orders_lineitem' AS join_name,
         (SELECT count(*) FROM orders) AS n_left,
         (SELECT count(*) FROM lineitem) AS n_right,
         (SELECT count(DISTINCT o_orderkey) FROM orders) AS ndv_left,
         (SELECT count(DISTINCT l_orderkey) FROM lineitem) AS ndv_right,
         (SELECT sum(cl * cr) FROM
            (SELECT o_orderkey AS k, count(*) AS cl FROM orders GROUP BY 1) a
            JOIN
            (SELECT l_orderkey AS k, count(*) AS cr FROM lineitem GROUP BY 1) b
            USING (k)) AS actual_rows),
co AS (
  SELECT 'customer_orders' AS join_name,
         (SELECT count(*) FROM customer) AS n_left,
         (SELECT count(*) FROM orders) AS n_right,
         (SELECT count(DISTINCT c_custkey) FROM customer) AS ndv_left,
         (SELECT count(DISTINCT o_custkey) FROM orders) AS ndv_right,
         (SELECT sum(cl * cr) FROM
            (SELECT c_custkey AS k, count(*) AS cl FROM customer GROUP BY 1) a
            JOIN
            (SELECT o_custkey AS k, count(*) AS cr FROM orders GROUP BY 1) b
            USING (k)) AS actual_rows),
cs AS (
  SELECT 'customer_supplier_nation' AS join_name,
         (SELECT count(*) FROM customer) AS n_left,
         (SELECT count(*) FROM supplier) AS n_right,
         (SELECT count(DISTINCT c_nationkey) FROM customer) AS ndv_left,
         (SELECT count(DISTINCT s_nationkey) FROM supplier) AS ndv_right,
         (SELECT sum(cl * cr) FROM
            (SELECT c_nationkey AS k, count(*) AS cl
             FROM customer GROUP BY 1) a
            JOIN
            (SELECT s_nationkey AS k, count(*) AS cr
             FROM supplier GROUP BY 1) b
            USING (k)) AS actual_rows),
u AS (SELECT * FROM ol UNION ALL SELECT * FROM co UNION ALL SELECT * FROM cs)
SELECT join_name,
       CAST(n_left AS BIGINT) AS n_left,
       CAST(n_right AS BIGINT) AS n_right,
       CAST(ndv_left AS BIGINT) AS ndv_left,
       CAST(ndv_right AS BIGINT) AS ndv_right,
       CAST(floor(CAST(n_left AS DOUBLE) * CAST(n_right AS DOUBLE)
                  / CAST(greatest(ndv_left, ndv_right) AS DOUBLE))
         AS BIGINT) AS est_rows,
       CAST(actual_rows AS BIGINT) AS actual_rows,
       floor((CAST(floor(CAST(n_left AS DOUBLE) * CAST(n_right AS DOUBLE)
                         / CAST(greatest(ndv_left, ndv_right) AS DOUBLE))
                AS DOUBLE) - actual_rows)
             / actual_rows * 100.0 * 100.0 + 0.5) / 100.0 AS err_pct
FROM u
""",
    "q4_late_ship_orders": """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= '1997-01-01' AND o_orderdate < '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY 1
""",
    "q8_market_share": """
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       floor((CAST(sum(CASE WHEN n1.n_name = 'NATION_1'
                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))
                 ELSE CAST(0 AS DECIMAL(30,8)) END) AS DOUBLE)
              / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS DOUBLE))
             * 1000000.0 + 0.5) / 1000000.0 AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region ON n2.n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY 1
""",
    "q15_top_supplier": """
WITH rev AS (
  SELECT l_suppkey,
         floor((CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1997-04-01'
  GROUP BY 1)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
""",
    "q21_sole_returner": """
WITH l1 AS (SELECT l_orderkey, l_suppkey FROM lineitem
            WHERE l_returnflag = 'R')
SELECT s_name, count(*) AS numwait
FROM l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_1'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY 1
""",
    "map_props": """
SELECT event_id,
       CAST(len(json_keys(props)) AS INT) AS n_props,
       array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
       CAST(props->>'k' AS BIGINT) AS k_val
FROM events
""",
    "variant_props": """
SELECT event_id,
       CAST(props->>'k' AS BIGINT) AS k_val,
       (props->>'k') IS NOT NULL AS has_k
FROM events
""",
    "listagg_statuses": """
SELECT o_custkey,
       string_agg(o_orderstatus, ','
                  ORDER BY o_orderdate, o_orderkey) AS status_seq
FROM orders GROUP BY 1
""",
    "unpivot_status_counts": """
SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders
FROM orders
WHERE o_orderstatus IN ('F', 'O', 'P')
GROUP BY 1, 2
""",
    "q2_min_cost_supplier": """
WITH eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'),
psel AS (SELECT p_partkey, p_type FROM part
         WHERE p_type = 'LARGE' AND p_size < 26),
cost AS (
  SELECT p_partkey, s_suppkey, min(l_extendedprice) AS cost
  FROM lineitem
  JOIN eu ON l_suppkey = s_suppkey
  JOIN psel ON l_partkey = p_partkey
  GROUP BY 1, 2),
best AS (SELECT p_partkey, min(cost) AS mn FROM cost GROUP BY 1)
SELECT eu.s_acctbal, eu.s_name, eu.n_name, c.p_partkey, psel.p_type,
       floor(c.cost * 100.0 + 0.5) / 100.0 AS supply_cost
FROM cost c
JOIN best b ON c.p_partkey = b.p_partkey AND c.cost = b.mn
JOIN eu ON c.s_suppkey = eu.s_suppkey
JOIN psel ON c.p_partkey = psel.p_partkey
""",
    "q9_product_profit": """
SELECT n_name AS nation, CAST(year(l_shipdate) AS INT) AS o_year,
       floor(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(30,8))) AS DOUBLE)
             * 100.0 + 0.5) / 100.0 AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
""",
    "q11_part_value": """
WITH nat AS (
  SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_9'),
val AS (
  SELECT l_partkey,
         sum(CAST(l_extendedprice * l_quantity AS DECIMAL(30,8))) AS v
  FROM lineitem WHERE l_suppkey IN (SELECT s_suppkey FROM nat)
  GROUP BY 1),
tot AS (SELECT CAST(sum(v) AS DOUBLE) AS t FROM val)
SELECT l_partkey,
       floor(CAST(v AS DOUBLE) * 100.0 + 0.5) / 100.0 AS part_value
FROM val, tot
WHERE CAST(v AS DOUBLE) > t * 0.0001
""",
    "lateral_topn": """
SELECT n.n_name, x.c_name,
       floor(x.c_acctbal * 100.0 + 0.5) / 100.0 AS acctbal
FROM nation n, LATERAL (
  SELECT c_name, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name ASC LIMIT 3) x
""",
    "recursive_cte": """
WITH RECURSIVE anc AS (
  SELECT n_nationkey AS node, n_nationkey AS root, 0 AS depth
  FROM nation WHERE n_nationkey < 5
  UNION ALL
  SELECT n.n_nationkey, a.root, a.depth + 1
  FROM nation n JOIN anc a ON n.n_nationkey - 5 = a.node
)
SELECT node, root, CAST(depth AS INT) AS depth FROM anc
""",
    "qualify_window_filter": """
SELECT n.n_name, s.s_name,
       floor(CAST(r.revenue AS DOUBLE) * 100.0 + 0.5) / 100.0
         AS revenue,
       CAST(row_number() OVER (
              PARTITION BY n.n_name
              ORDER BY r.revenue DESC, s.s_name ASC) AS INT) AS rn
FROM (
  SELECT l_suppkey,
         sum(CAST(l_extendedprice * (1 - l_discount)
                  AS DECIMAL(38,6))) AS revenue
  FROM lineitem GROUP BY 1) r
JOIN supplier s ON s.s_suppkey = r.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
QUALIFY rn <= 2
""",
    "correlated_scalar_subquery": """
SELECT p_partkey, p_brand,
       floor(p_retailprice * 100.0 + 0.5) / 100.0 AS price,
       floor((SELECT CAST(sum(CAST(p2.p_retailprice AS DECIMAL(38,6)))
                          AS DOUBLE) / count(*)
              FROM part p2 WHERE p2.p_brand = p.p_brand)
             * 100.0 + 0.5) / 100.0 AS brand_avg_price,
       CASE WHEN p_retailprice >
                 (SELECT CAST(sum(CAST(p2.p_retailprice
                                       AS DECIMAL(38,6)))
                              AS DOUBLE) / count(*)
                  FROM part p2 WHERE p2.p_brand = p.p_brand)
            THEN 1 ELSE 0 END AS above_avg
FROM part p
""",
    "sql_unpivot": """
WITH wide AS (
  SELECT n.n_name,
         CAST(count(*) AS DOUBLE) AS n_customers,
         CAST(sum(CAST(c.c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
           AS total_balance,
         CAST(max(c.c_acctbal) AS DOUBLE) AS max_balance
  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1)
SELECT n_name, metric, floor(val * 100.0 + 0.5) / 100.0 AS value
FROM (UNPIVOT wide
      ON n_customers, total_balance, max_balance
      INTO NAME metric VALUE val)
""",
    "collated_group": """
WITH mixed AS (
  SELECT CASE WHEN event_id % 2 = 0 THEN upper(event_type)
              ELSE event_type END AS type_mixed,
         value
  FROM events)
SELECT lower(type_mixed) AS event_type,
       CAST(count(*) AS BIGINT) AS n,
       floor(CAST(sum(CAST(value AS DECIMAL(30,8))) AS DOUBLE)
             * 100.0 + 0.5) / 100.0 AS total_value
FROM mixed GROUP BY 1
""",
    "approx_topk_types": """
SELECT event_type, CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1
""",
    "join_skew_report": " UNION ALL ".join(
        _skew_family_sql(lbl, t, k)
        for lbl, t, k in [
            ("orders.o_custkey", "orders", "o_custkey"),
            ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
            ("lineitem.l_partkey", "lineitem", "l_partkey"),
            ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
            ("events.user_id", "events", "user_id"),
        ]
    ),
    "revenue_concentration": """
WITH rev AS (
  SELECT c.c_mktsegment, o.o_custkey AS c_custkey,
         sum(CAST(o.o_totalprice AS DECIMAL(38,12))) AS r
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2),
ranked AS (
  SELECT c_mktsegment, r,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY r DESC, c_custkey) AS rk,
         count(*) OVER (PARTITION BY c_mktsegment) AS n_cust,
         sum(r) OVER (PARTITION BY c_mktsegment) AS tot,
         sum(r) OVER (PARTITION BY c_mktsegment
                      ORDER BY r DESC, c_custkey
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS cum
  FROM rev)
SELECT c_mktsegment AS segment,
       CAST(max(n_cust) AS BIGINT) AS n_customers,
       floor(CAST(max(tot) AS DOUBLE) * 100.0 + 0.5) / 100.0
         AS total_revenue,
       floor(CAST(sum(CASE WHEN rk <= ceil(n_cust / 10.0) THEN r END)
                  AS DOUBLE)
             / CAST(max(tot) AS DOUBLE) * 10000.0 + 0.5) / 10000.0
         AS top_decile_share,
       CAST(min(CASE WHEN cum * 5 >= tot * 4 THEN rk END) AS BIGINT)
         AS n_for_80pct
FROM ranked GROUP BY 1
""",
    "share_of_parent": """
WITH dim AS (
  SELECT s_suppkey, n_name AS nation, r_name AS region
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey),
leaf AS (
  SELECT region, nation,
         sum(CAST(l_extendedprice * (1.0 - l_discount)
                  AS DECIMAL(38,12))) AS rev
  FROM lineitem JOIN dim ON l_suppkey = s_suppkey
  GROUP BY 1, 2)
SELECT region, nation,
       floor(CAST(rev AS DOUBLE) * 100.0 + 0.5) / 100.0 AS revenue,
       floor(CAST(rev AS DOUBLE)
             / CAST(sum(rev) OVER (PARTITION BY region) AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS share_of_region,
       floor(CAST(rev AS DOUBLE)
             / CAST(sum(rev) OVER () AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS share_of_total
FROM leaf
""",
    "drill_across": """
WITH seg AS (SELECT c_custkey, c_mktsegment AS segment FROM customer),
fo AS (
  SELECT segment, CAST(count(*) AS BIGINT) AS n_orders,
         floor(CAST(sum(CAST(o_totalprice AS DECIMAL(30,8)))
                    AS DOUBLE) * 100.0 + 0.5) / 100.0
           AS order_revenue
  FROM orders JOIN seg ON o_custkey = c_custkey GROUP BY 1),
fe AS (
  SELECT segment, CAST(count(*) AS BIGINT) AS n_events,
         floor(CAST(sum(CAST(COALESCE(value, 0.0) AS DECIMAL(30,8)))
                    AS DOUBLE) * 100.0 + 0.5) / 100.0
           AS event_value
  FROM events JOIN seg ON user_id = c_custkey GROUP BY 1)
SELECT segment,
       COALESCE(n_orders, 0) AS n_orders,
       COALESCE(order_revenue, 0.0) AS order_revenue,
       COALESCE(n_events, 0) AS n_events,
       COALESCE(event_value, 0.0) AS event_value,
       floor(COALESCE(order_revenue, 0.0)
             / nullif(CAST(COALESCE(n_events, 0) AS DOUBLE), 0.0)
             * 100.0 + 0.5) / 100.0 AS revenue_per_event
FROM fo FULL OUTER JOIN fe USING (segment)
""",
    "price_volume_mix": """
WITH facts AS (
  SELECT p.p_brand, year(l.l_shipdate) AS yr, l.l_quantity,
         l.l_extendedprice * (1.0 - l.l_discount) AS net
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
y0 AS (
  SELECT p_brand,
         CAST(sum(CAST(l_quantity AS DECIMAL(38,12))) AS DOUBLE) AS q0,
         CAST(sum(CAST(net AS DECIMAL(38,12))) AS DOUBLE) AS r0
  FROM facts WHERE yr = 1996 GROUP BY 1),
y1 AS (
  SELECT p_brand,
         CAST(sum(CAST(l_quantity AS DECIMAL(38,12))) AS DOUBLE) AS q1,
         CAST(sum(CAST(net AS DECIMAL(38,12))) AS DOUBLE) AS r1
  FROM facts WHERE yr = 1997 GROUP BY 1)
SELECT p_brand,
       floor(r0 * 100.0 + 0.5) / 100.0 AS rev_1996,
       floor(r1 * 100.0 + 0.5) / 100.0 AS rev_1997,
       floor((r1 / q1 - r0 / q0) * q0 * 100.0 + 0.5) / 100.0
         AS price_effect,
       floor((r0 / q0) * (q1 - q0) * 100.0 + 0.5) / 100.0
         AS volume_effect,
       floor((r1 / q1 - r0 / q0) * (q1 - q0) * 100.0 + 0.5) / 100.0
         AS mix_effect
FROM y0 JOIN y1 USING (p_brand)
""",
    "topn_with_other": """
WITH brands AS (
  SELECT p_brand,
         sum(CAST(l_extendedprice * (1.0 - l_discount)
                  AS DECIMAL(38,12))) AS rev
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1),
lab AS (
  SELECT CASE WHEN row_number()
                   OVER (ORDER BY rev DESC, p_brand ASC) <= 5
              THEN p_brand ELSE 'OTHER' END AS brand, rev
  FROM brands),
rolled AS (
  SELECT brand, sum(rev) AS rev, CAST(count(*) AS BIGINT) AS n_brands
  FROM lab GROUP BY 1)
SELECT brand, n_brands,
       floor(CAST(rev AS DOUBLE) * 100.0 + 0.5) / 100.0 AS revenue,
       floor(CAST(rev AS DOUBLE) / CAST(sum(rev) OVER () AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS share
FROM rolled
""",
}
