"""Oracle SQL — lakehouse domain (entries mechanically moved from oracles.py, values verbatim)."""


from __future__ import annotations
from .common import *  # noqa: F401,F403

ORACLES: dict[str, str] = {
    # the cross-store RTBF audit capstone (r12 task 4): every count a
    # from-scratch pre-/post-delete rebuild, every visibility column a
    # genuine subject-membership sum over the post-delete rebuild
    "rtbf_audit_report": _rtbf_audit_sql(25),
    "merge_on_read": """
SELECT c_custkey, c_name, c_nationkey,
       floor((CASE WHEN c_nationkey = 5 AND c_custkey % 3 = 0 THEN -1.0
                   WHEN c_nationkey = 5 THEN c_acctbal * 1.1
                   ELSE c_acctbal END) * 100.0 + 0.5) / 100.0 AS c_acctbal
FROM customer
WHERE NOT (c_custkey % 97 = 0
           AND NOT (c_nationkey = 5 AND c_custkey % 3 = 0))
""",
    "gated_publish": """
WITH bad AS (SELECT CAST(count(*) AS BIGINT) AS n
             FROM orders WHERE o_orderkey % 50 = 0)
SELECT 'attempt_bad' AS attempt, 'key_present' AS rule,
       CAST(0 AS BIGINT) AS n_violations, FALSE AS published,
       CAST(0 AS INT) AS version_after
UNION ALL
SELECT 'attempt_bad', 'no_synthetic_keys', (SELECT n FROM bad),
       FALSE, CAST(0 AS INT)
UNION ALL
SELECT 'attempt_bad', 'positive_price', CAST(0 AS BIGINT),
       FALSE, CAST(0 AS INT)
UNION ALL
SELECT 'attempt_clean', 'key_present', CAST(0 AS BIGINT),
       TRUE, CAST(0 AS INT)
UNION ALL
SELECT 'attempt_clean', 'no_synthetic_keys', CAST(0 AS BIGINT),
       TRUE, CAST(0 AS INT)
UNION ALL
SELECT 'attempt_clean', 'positive_price', CAST(0 AS BIGINT),
       TRUE, CAST(0 AS INT)
""",
    "snapshot_schema_evolution": """
SELECT CAST(0 AS INT) AS version, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_null_segment,
       CAST(0 AS BIGINT) AS n_segments
FROM customer
UNION ALL
SELECT CAST(1 AS INT), CAST(count(*) AS BIGINT), CAST(0 AS BIGINT),
       CAST(count(DISTINCT c_mktsegment) AS BIGINT)
FROM customer
""",
    "snapshot_blame": """
WITH fv AS (
  SELECT o_orderkey, o_totalprice,
         CASE WHEN o_orderdate < DATE '1997-01-01' THEN 0
              WHEN o_orderdate < DATE '1999-01-01' THEN 1
              ELSE 2 END AS first_version
  FROM orders)
SELECT CAST(first_version AS INT) AS first_version,
       CAST(count(*) AS BIGINT) AS n_keys,
       floor((CAST(sum(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE))
             * 100.0 + 0.5) / 100.0 AS value_introduced
FROM fv GROUP BY 1
""",
    "cdf_to_scd2": """
WITH base AS (SELECT o_orderkey AS k, o_totalprice AS p, o_orderdate AS d
              FROM orders),
lat AS (
  SELECT k, 0 AS v, p FROM base WHERE d < DATE '1997-01-01'
  UNION ALL
  SELECT k, 1, CASE WHEN k % 7 = 0 THEN p * 1.05 ELSE p END
  FROM base WHERE d < DATE '1999-01-01'
  UNION ALL
  SELECT k, 2, CASE WHEN k % 11 = 0 THEN p * 0.9
                    WHEN k % 7 = 0 THEN p * 1.05 ELSE p END
  FROM base),
ch AS (SELECT *, lag(p) OVER (PARTITION BY k ORDER BY v) AS prev
       FROM lat),
kept AS (SELECT k, v, p FROM ch WHERE prev IS NULL OR prev <> p),
iv AS (SELECT k, v AS valid_from,
              lead(v) OVER (PARTITION BY k ORDER BY v) AS valid_to, p
       FROM kept)
SELECT k AS o_orderkey, CAST(valid_from AS INT) AS valid_from,
       CAST(coalesce(valid_to, -1) AS INT) AS valid_to,
       floor(p * 100.0 + 0.5) / 100.0 AS o_totalprice,
       valid_to IS NULL AS is_current
FROM iv
""",
    "fd_profile": """
WITH pairs AS (
  SELECT 'orders.o_orderkey' AS antecedent, 'orders.o_custkey' AS consequent,
         a, ndv
  FROM (SELECT o_orderkey AS a, count(DISTINCT o_custkey) AS ndv
        FROM orders GROUP BY 1)
  UNION ALL
  SELECT 'orders.o_custkey', 'orders.o_orderpriority', a, ndv
  FROM (SELECT o_custkey AS a, count(DISTINCT o_orderpriority) AS ndv
        FROM orders GROUP BY 1)
  UNION ALL
  SELECT 'orders.o_orderdate', 'orders.o_orderstatus',
         CAST(a AS BIGINT), ndv
  FROM (SELECT epoch(o_orderdate) AS a,
               count(DISTINCT o_orderstatus) AS ndv
        FROM orders GROUP BY 1)
  UNION ALL
  SELECT 'customer.c_custkey', 'customer.c_nationkey', a, ndv
  FROM (SELECT c_custkey AS a, count(DISTINCT c_nationkey) AS ndv
        FROM customer GROUP BY 1)
  UNION ALL
  SELECT 'customer.c_nationkey', 'customer.c_mktsegment',
         CAST(a AS BIGINT), ndv
  FROM (SELECT c_nationkey AS a, count(DISTINCT c_mktsegment) AS ndv
        FROM customer GROUP BY 1))
SELECT antecedent, consequent,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(count(*) FILTER (WHERE ndv > 1) AS BIGINT)
         AS n_violating_groups,
       CAST(sum(ndv - 1) AS BIGINT) AS n_surplus_images,
       count(*) FILTER (WHERE ndv > 1) = 0 AS fd_holds
FROM pairs GROUP BY 1, 2
""",
    "dq_observe": """
SELECT 'n_rows' AS metric, CAST(count(*) AS DOUBLE) AS value FROM orders
UNION ALL
SELECT 'n_nonpositive_price',
       CAST(count(*) FILTER (WHERE o_totalprice <= 0) AS DOUBLE)
FROM orders
UNION ALL
SELECT 'n_bad_status',
       CAST(count(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P'))
            AS DOUBLE)
FROM orders
UNION ALL
SELECT 'sum_price',
       floor(CAST(sum(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE)
             * 100.0 + 0.5) / 100.0
FROM orders
""",
    "ref_integrity": """
SELECT 'orders.o_custkey' AS fk, 'customer.c_custkey' AS parent,
       (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_child,
       (SELECT CAST(count(*) AS BIGINT) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey))
         AS n_orphans,
       (SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)) = 0
         AS fk_holds
UNION ALL
SELECT 'lineitem.l_orderkey', 'orders.o_orderkey',
       (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
       (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)),
       (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)) = 0
UNION ALL
SELECT 'lineitem.l_partkey', 'part.p_partkey',
       (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
       (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM part p
                          WHERE p.p_partkey = l.l_partkey)),
       (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM part p
                          WHERE p.p_partkey = l.l_partkey)) = 0
UNION ALL
SELECT 'lineitem.l_suppkey', 'supplier.s_suppkey',
       (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
       (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM supplier s
                          WHERE s.s_suppkey = l.l_suppkey)),
       (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM supplier s
                          WHERE s.s_suppkey = l.l_suppkey)) = 0
UNION ALL
SELECT 'events.user_id', 'customer.c_custkey',
       (SELECT CAST(count(*) AS BIGINT) FROM events),
       (SELECT CAST(count(*) AS BIGINT) FROM events e
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = e.user_id)),
       (SELECT count(*) FROM events e
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = e.user_id)) = 0
""",
    "scd2_history": """
SELECT user_id, event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
       strftime(lead(ts) OVER w, '%Y-%m-%d %H:%M:%S') AS valid_to,
       lead(ts) OVER w IS NULL AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
""",
    "bucketed_join_rollup": """
SELECT o_orderstatus, count(*) AS n_lines,
       round(sum(l_quantity), 2) AS sum_qty
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY 1
""",
    "deletion_vector_read": """
SELECT o_orderstatus, count(*) AS n,
       floor((CAST(sum(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE))
             * 100.0 + 0.5) / 100.0 AS total
FROM orders
WHERE NOT (o_orderkey % 7 = 0)
  AND NOT (o_orderstatus = 'F' AND o_orderkey % 5 = 0)
GROUP BY 1
""",
    "incremental_rollup": """
SELECT l_partkey,
       count(*) AS n_items,
       floor((CAST(sum(CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS sum_qty,
       floor((CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS revenue
FROM lineitem GROUP BY 1
""",
    "incremental_rollup_retract": """
SELECT l_partkey,
       count(*) AS n_items,
       floor(CAST(sum(CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE)
             * 100.0 + 0.5) / 100.0 AS sum_qty
FROM lineitem
WHERE l_returnflag <> 'R'
GROUP BY 1
""",
    "ivm_join_orphans": """
WITH facts AS (
  SELECT o_orderkey, o_custkey, o_orderdate,
         CASE WHEN o_orderdate < DATE '1998-06-01'
                   AND o_orderkey % 89 = 0 AND o_orderkey % 97 <> 0
              THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice
  FROM orders
  WHERE NOT (o_orderdate < DATE '1998-06-01' AND o_orderkey % 97 = 0)
)
SELECT o_orderkey, o_custkey, o_orderdate,
       floor(CAST(o_totalprice AS DOUBLE) * 100.0 + 0.5) / 100.0
         AS o_totalprice,
       c_name, c_mktsegment,
       floor(CAST(c_acctbal AS DOUBLE) * 100.0 + 0.5) / 100.0
         AS c_acctbal
FROM facts JOIN customer ON o_custkey = c_custkey
WHERE c_custkey % 100 <> 13
""",
    "ivm_join_rollup": """
WITH facts AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderdate < DATE '1998-06-01'
                   AND o_orderkey % 89 = 0 AND o_orderkey % 97 <> 0
              THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice
  FROM orders
  WHERE NOT (o_orderdate < DATE '1998-06-01' AND o_orderkey % 97 = 0)
)
SELECT c_mktsegment,
       count(*) AS n_orders,
       floor(CAST(sum(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE)
             * 100.0 + 0.5) / 100.0 AS revenue
FROM facts JOIN customer ON o_custkey = c_custkey
GROUP BY 1
""",
    "ivm_join": """
WITH facts AS (
  SELECT o_orderkey, o_custkey, o_orderdate,
         CASE WHEN o_orderdate < DATE '1998-06-01'
                   AND o_orderkey % 89 = 0 AND o_orderkey % 97 <> 0
              THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice
  FROM orders
  WHERE NOT (o_orderdate < DATE '1998-06-01' AND o_orderkey % 97 = 0)
)
SELECT o_orderkey, o_custkey, o_orderdate,
       floor(CAST(o_totalprice AS DOUBLE) * 100.0 + 0.5) / 100.0
         AS o_totalprice,
       c_name, c_mktsegment,
       floor(CAST(c_acctbal AS DOUBLE) * 100.0 + 0.5) / 100.0
         AS c_acctbal
FROM facts JOIN customer ON o_custkey = c_custkey
WHERE c_custkey % 100 <> 7
""",
    "cdf_join_maintenance": """
WITH facts AS (
  SELECT o_orderkey, o_custkey, o_orderdate,
         CASE WHEN o_orderdate < DATE '1998-06-01'
                   AND o_orderkey % 89 = 0 AND o_orderkey % 97 <> 0
              THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice
  FROM orders
  WHERE NOT (o_orderdate < DATE '1998-06-01' AND o_orderkey % 97 = 0)
)
SELECT o_orderkey, o_custkey, o_orderdate,
       floor(CAST(o_totalprice AS DOUBLE) * 100.0 + 0.5) / 100.0
         AS o_totalprice,
       c_name, c_mktsegment,
       floor(CAST(c_acctbal AS DOUBLE) * 100.0 + 0.5) / 100.0
         AS c_acctbal
FROM facts JOIN customer ON o_custkey = c_custkey
""",
    "zorder_pruned_scan": """
SELECT l_orderkey, l_linenumber, l_partkey,
       floor(CAST(l_quantity AS DOUBLE) * 100.0 + 0.5) / 100.0
         AS l_quantity
FROM lineitem
WHERE l_orderkey <= 3000 AND l_partkey <= 500
""",
    "table_diff": """
WITH old AS (
  SELECT o_orderkey,
         md5(concat_ws('|', o_orderstatus,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR))) AS h
  FROM orders WHERE o_orderdate < '1998-01-01'),
new AS (
  SELECT o_orderkey,
         md5(concat_ws('|',
             CASE WHEN o_orderdate >= '1997-01-01' THEN 'O'
                  ELSE o_orderstatus END,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR))) AS h
  FROM orders WHERE o_orderdate < '1999-01-01')
SELECT diff_status, count(*) AS n_keys FROM (
  SELECT CASE WHEN a.o_orderkey IS NULL THEN 'added'
              WHEN b.o_orderkey IS NULL THEN 'deleted'
              WHEN a.h = b.h THEN 'unchanged'
              ELSE 'changed' END AS diff_status
  FROM old a FULL OUTER JOIN new b ON a.o_orderkey = b.o_orderkey)
GROUP BY 1
""",
    "dq_checks": """
SELECT 'custkey_not_null' AS rule,
       CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violations FROM orders
UNION ALL
SELECT 'status_accepted_values',
       CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END)
            AS BIGINT) FROM orders
UNION ALL
SELECT 'totalprice_positive',
       CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'priority_format',
       CAST(sum(CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-')
                THEN 1 ELSE 0 END) AS BIGINT) FROM orders
UNION ALL
SELECT 'orderkey_unique', CAST(count(*) AS BIGINT)
FROM (SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1)
UNION ALL
SELECT 'custkey_fk', CAST(count(*) AS BIGINT)
FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
""",
    "scd2_pit_join": """
WITH states AS (
  SELECT user_id, event_type, ts, event_id FROM events
  WHERE event_type IN ('signup', 'error')),
hist AS (
  SELECT user_id AS s_user, event_type AS state, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id
                        ORDER BY ts ASC, event_id ASC) AS valid_to
  FROM states),
facts AS (
  SELECT event_id, user_id, ts, value FROM events
  WHERE event_type = 'purchase')
SELECT f.event_id, f.user_id,
       strftime(f.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       floor(f.value * 100.0 + 0.5) / 100.0 AS value,
       h.state
FROM facts f LEFT JOIN hist h
  ON f.user_id = h.s_user
 AND h.valid_from <= f.ts
 AND f.ts < coalesce(h.valid_to, TIMESTAMP '9999-12-31')
""",
    "dynamic_overwrite": """
WITH staged AS (
  SELECT year(o_orderdate) AS order_year,
         CASE WHEN year(o_orderdate) = 1997
              THEN o_totalprice * 0.9 ELSE o_totalprice END AS price
  FROM orders)
SELECT order_year, CAST(count(*) AS BIGINT) AS n,
       floor(CAST(sum(CAST(price AS DECIMAL(30,8))) AS DOUBLE)
             * 100.0 + 0.5) / 100.0 AS total
FROM staged GROUP BY 1
""",
    "k_anonymity": """
WITH qi AS (
  SELECT c_mktsegment AS seg, CAST(c_nationkey AS VARCHAR) AS nat
  FROM customer),
c AS (
  SELECT seg, nat, count(*) OVER (PARTITION BY seg, nat) AS grp_n
  FROM qi),
m AS (
  SELECT CASE WHEN grp_n >= 10 THEN seg ELSE '*' END AS segment,
         CASE WHEN grp_n >= 10 THEN nat ELSE '*' END AS nation
  FROM c)
SELECT segment, nation, CAST(count(*) AS BIGINT) AS n_rows
FROM m GROUP BY 1, 2
""",
    "record_linkage": """
WITH c AS (
  SELECT c_custkey, c_nationkey AS nk, c_acctbal,
         CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS cnum
  FROM customer),
s AS (
  SELECT s_suppkey, s_nationkey AS nk, s_acctbal,
         CAST(regexp_extract(s_name, '([0-9]+)', 1) AS BIGINT) AS snum
  FROM supplier),
p AS (
  SELECT c.c_custkey, s.s_suppkey,
         CAST(
           CASE WHEN abs(c.c_acctbal - s.s_acctbal) < 500
                THEN 2.5 ELSE -0.5 END
         + CASE WHEN c.cnum % 10 = s.snum % 10 THEN 1.5 ELSE -0.3 END
         + CASE WHEN c.cnum % 7 = s.snum % 7 THEN 1.0 ELSE -0.2 END
         AS DOUBLE) AS score
  FROM c JOIN s ON c.nk = s.nk),
f AS (
  SELECT p.*, row_number() OVER (
           PARTITION BY c_custkey ORDER BY score DESC, s_suppkey) AS rn
  FROM p WHERE score >= 3.0)
SELECT c_custkey, s_suppkey, floor(score * 10.0 + 0.5) / 10.0 AS score
FROM f WHERE rn = 1
""",
    "l_diversity_audit": """
SELECT CAST(c_nationkey AS INT) AS nation,
       CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_band,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS distinct_segments,
       CAST(CASE WHEN count(DISTINCT c_mktsegment) >= 3
                 THEN 1 ELSE 0 END AS INT) AS is_diverse
FROM customer GROUP BY 1, 2
""",
    "forget_user_cascade": """
WITH ev AS (
  SELECT count(*) AS n_before,
         sum(CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 4)
                       < '0800' THEN 1 ELSE 0 END) AS n_del
  FROM events),
o AS (
  SELECT count(*) AS n_before,
         sum(CASE WHEN substring(md5(CAST(o_custkey AS VARCHAR)), 1, 4)
                       < '0800' THEN 1 ELSE 0 END) AS n_del
  FROM orders),
l AS (
  SELECT count(*) AS n_before,
         sum(CASE WHEN substring(md5(CAST(ord.o_custkey AS VARCHAR)),
                                 1, 4) < '0800' THEN 1 ELSE 0 END)
           AS n_del
  FROM lineitem li JOIN orders ord ON ord.o_orderkey = li.l_orderkey)
SELECT 'events' AS table_name, CAST(n_before AS BIGINT) AS n_before,
       CAST(n_del AS BIGINT) AS n_deleted,
       CAST(n_before - n_del AS BIGINT) AS n_after,
       CAST(0 AS BIGINT) AS n_subject_still_visible
FROM ev
UNION ALL
SELECT 'orders', CAST(n_before AS BIGINT), CAST(n_del AS BIGINT),
       CAST(n_before - n_del AS BIGINT), CAST(0 AS BIGINT) FROM o
UNION ALL
SELECT 'lineitem', CAST(n_before AS BIGINT), CAST(n_del AS BIGINT),
       CAST(n_before - n_del AS BIGINT), CAST(0 AS BIGINT) FROM l
""",
    "compaction_plan": """
WITH manifest AS (
  SELECT CAST(ts AS DATE) AS day, user_id % 20 AS file_id,
         CAST(128 + sum(length(event_type) + 24) AS BIGINT) AS bytes
  FROM events GROUP BY 1, 2),
planned AS (
  SELECT day, file_id, bytes,
         COALESCE(sum(bytes) OVER (
             PARTITION BY day ORDER BY bytes DESC, file_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM manifest)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(floor(cum_before / 4096.0) AS INT) AS bin,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(bytes) AS BIGINT) AS bytes_total,
       count(*) > 1 AS is_merge
FROM planned GROUP BY 1, 2
""",
    "reconciliation_report": """
WITH lt AS (
  SELECT l_orderkey,
         CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                       * (1.0 + l_tax) AS DECIMAL(38,12)))
              AS DOUBLE) AS computed
  FROM lineitem GROUP BY 1),
j AS (
  SELECT o.o_orderstatus, o.o_totalprice, lt.computed,
         abs(o.o_totalprice - lt.computed) AS ad
  FROM orders o LEFT JOIN lt ON o.o_orderkey = lt.l_orderkey)
SELECT o_orderstatus AS status,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count(computed) AS BIGINT) AS n_with_lines,
       CAST(sum(CASE WHEN ad <= 0.01 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_reconciled,
       floor(CAST(sum(CAST(ad AS DECIMAL(38,12))) AS DOUBLE)
             / count(computed) * 100.0 + 0.5) / 100.0
         AS mean_abs_diff,
       floor(max(ad) * 100.0 + 0.5) / 100.0 AS max_abs_diff
FROM j GROUP BY 1
""",
    "scd2_audit": """
WITH h AS (
  SELECT user_id, ts AS valid_from, lead(ts) OVER w AS valid_to,
         CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END AS cur
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
m AS (
  SELECT user_id, valid_from, valid_to, cur,
         lead(valid_from) OVER (PARTITION BY user_id
                                ORDER BY valid_from ASC) AS next_from
  FROM h),
pk AS (
  SELECT user_id, count(*) AS n_rows, sum(cur) AS n_current,
         sum(CASE WHEN next_from IS NOT NULL AND valid_to > next_from
             THEN 1 ELSE 0 END) AS n_overlap,
         sum(CASE WHEN next_from IS NOT NULL AND valid_to < next_from
             THEN 1 ELSE 0 END) AS n_gap,
         sum(CASE WHEN valid_to IS NULL AND next_from IS NOT NULL
             THEN 1 ELSE 0 END) AS n_open_not_last
  FROM m GROUP BY 1)
SELECT CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(n_rows) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN n_current != 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_keys_bad_current,
       CAST(sum(n_overlap) AS BIGINT) AS n_overlaps,
       CAST(sum(n_gap) AS BIGINT) AS n_gaps,
       CAST(sum(n_open_not_last) AS BIGINT) AS n_open_not_last,
       sum(CASE WHEN n_current != 1 THEN 1 ELSE 0 END) = 0
       AND sum(n_overlap) = 0 AND sum(n_gap) = 0
       AND sum(n_open_not_last) = 0 AS audit_ok
FROM pk
""",
    "survivorship_golden": """
WITH c AS (
  SELECT c_custkey, c_name, c_mktsegment, c_acctbal,
         CAST(c_nationkey AS BIGINT) * 50
           + CAST(regexp_extract(c_name, '(\\d+)', 1) AS BIGINT) % 50
           AS cluster_id
  FROM customer),
base AS (
  SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_records,
         max(c_acctbal) AS acctbal_max
  FROM c GROUP BY 1),
nm AS (
  SELECT cluster_id, c_name AS name_golden FROM (
    SELECT cluster_id, c_name,
           row_number() OVER (PARTITION BY cluster_id
             ORDER BY length(c_name) DESC, c_name DESC) AS rn
    FROM c) WHERE rn = 1),
ph AS (
  SELECT cluster_id,
         floor(c_acctbal * 100.0 + 0.5) / 100.0 AS acctbal_primary
  FROM (
    SELECT cluster_id, c_acctbal,
           row_number() OVER (PARTITION BY cluster_id
             ORDER BY c_custkey ASC) AS rn
    FROM c) WHERE rn = 1),
sm AS (
  SELECT cluster_id, c_mktsegment AS segment_mode FROM (
    SELECT cluster_id, c_mktsegment,
           row_number() OVER (PARTITION BY cluster_id
             ORDER BY cnt DESC, c_mktsegment DESC) AS rn
    FROM (SELECT cluster_id, c_mktsegment, count(*) AS cnt
          FROM c GROUP BY 1, 2)) WHERE rn = 1)
SELECT base.cluster_id, n_records, name_golden, acctbal_primary,
       segment_mode,
       floor(acctbal_max * 100.0 + 0.5) / 100.0 AS acctbal_max
FROM base
JOIN nm USING (cluster_id) JOIN ph USING (cluster_id)
JOIN sm USING (cluster_id)
""",
    "backfill_plan": """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
span AS (SELECT date_trunc('month', min(day)) AS lo,
                last_day(max(day)) AS hi FROM daily),
spine AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
           AS day
  FROM span),
grid AS (
  SELECT t.event_type, s.day
  FROM (SELECT DISTINCT event_type FROM daily) t, spine s),
med AS (
  SELECT event_type,
         min(CASE WHEN rk * 2 >= nd THEN n END) AS median_n
  FROM (SELECT event_type, n,
               count(*) OVER (PARTITION BY event_type ORDER BY n, day
                              ROWS BETWEEN UNBOUNDED PRECEDING AND
                              CURRENT ROW) AS rk,
               count(*) OVER (PARTITION BY event_type) AS nd
        FROM daily)
  GROUP BY 1),
audit AS (
  SELECT g.event_type, g.day, d.n, m.median_n,
         CASE WHEN d.n IS NULL THEN 'missing'
              WHEN d.n * 4 < m.median_n * 3 THEN 'low_volume' END
           AS issue
  FROM grid g
  LEFT JOIN daily d ON g.event_type = d.event_type AND g.day = d.day
  JOIN med m ON g.event_type = m.event_type)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, issue,
       CAST(COALESCE(n, 0) AS BIGINT) AS observed_n, median_n
FROM audit WHERE issue IS NOT NULL
""",
    "scd6_view": """
SELECT user_id, event_type,
       last_value(event_type) OVER (PARTITION BY user_id
           ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS event_type_current,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
       strftime(lead(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id),
                '%Y-%m-%d %H:%M:%S') AS valid_to,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         IS NULL AS is_current
FROM events
""",
}
