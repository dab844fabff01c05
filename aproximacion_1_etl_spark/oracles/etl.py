"""Oracle SQL — etl domain (entries mechanically moved from oracles.py, values verbatim)."""


from __future__ import annotations
from .common import *  # noqa: F401,F403

ORACLES: dict[str, str] = {
    "flagship_order_lifecycle": _WORK_SQL
    + """
SELECT o_orderstatus, latest_event_type, count(*) AS n_orders,
       floor((CAST(sum(CAST(revenue AS DECIMAL(30,8))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS total_revenue,
       floor((avg(n_items)) * 10000.0 + 0.5) / 10000.0 AS avg_items
FROM work GROUP BY 1, 2
""",
    "m1_dedup_latest": """
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS latest_orderdate,
       o_orderstatus
FROM (SELECT *, row_number() OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) rn
      FROM orders)
WHERE rn = 1
""",
    "m2_merge_upsert": """
WITH base AS (SELECT o_orderkey, o_orderstatus,
                     round(o_totalprice, 2) AS totalprice FROM orders),
m AS (SELECT * FROM base WHERE o_orderkey % 3 != 0),
u AS (SELECT o_orderkey, 'U' AS o_orderstatus,
             round(totalprice + 1.0, 2) AS totalprice
      FROM base WHERE o_orderkey % 2 = 0)
SELECT coalesce(m.o_orderkey, u.o_orderkey) AS o_orderkey,
       coalesce(u.o_orderstatus, m.o_orderstatus) AS o_orderstatus,
       coalesce(u.totalprice, m.totalprice) AS totalprice
FROM m FULL OUTER JOIN u ON m.o_orderkey = u.o_orderkey
""",
    "m4_latest_status": """
SELECT user_id, event_type AS latest_event_type,
       floor((value) * 100.0 + 0.5) / 100.0 AS latest_value
FROM (SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
      FROM events)
WHERE rn = 1
""",
    "m5_child_rollup": """
SELECT l_orderkey, count(*) AS n_items,
       round(sum(l_quantity), 2) AS sum_qty,
       floor((CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS revenue,
       CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_returned
FROM lineitem GROUP BY 1
""",
    "m6_case_derivation": """
SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
            WHEN o_totalprice < 150000 THEN 'mid'
            ELSE 'high' END AS price_band,
       o_orderpriority, count(*) AS n_orders,
       floor((CAST(sum(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE) / count(*)) * 100.0 + 0.5) / 100.0 AS avg_price
FROM orders GROUP BY 1, 2
""",
    "m8_nth_event": """
SELECT user_id, event_id, event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_ts
FROM (SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts ASC, event_id ASC) rn FROM events)
WHERE rn = 2
""",
    "m8_last_event": """
SELECT user_id, event_id, event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_ts
FROM (SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn FROM events)
WHERE rn = 1
""",
    "m10_first_scheduled": """
SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS scheduled_ts
FROM events GROUP BY 1
""",
    "m11_visit_order": """
SELECT user_id, event_id, visit_rank,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS visit_ts
FROM (SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS visit_rank
      FROM events)
WHERE visit_rank <= 3
""",
    "f2_explode_roundtrip": """
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem
""",
    "p3_p5_cleaning": """
WITH dirty AS (
  SELECT c_custkey, c_name,
         CASE WHEN c_custkey % 5 = 0 THEN '' ELSE c_mktsegment END AS seg
  FROM customer)
SELECT c_custkey,
       regexp_replace(c_name, '[0-9]', '', 'g') AS clean_name,
       nullif(seg, '') AS seg_or_null,
       coalesce(nullif(seg, ''), 'NONE') AS seg_filled
FROM dirty
""",
    "p6_cast_ddl": """
SELECT CAST(l_orderkey AS VARCHAR) AS l_orderkey,
       CAST(l_linenumber AS BIGINT) AS l_linenumber,
       round(l_tax, 2) AS l_tax
FROM lineitem
""",
    "p7_try_timestamp": """
SELECT event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS parsed_ts,
       try_strptime(props, '%Y-%m-%dT%H:%M:%S.%f') IS NULL AS bad_parse_null
FROM events
""",
    "p8_lenient_dates": """
SELECT o_orderkey,
       strftime(CASE WHEN o_orderkey % 4 = 2
                     THEN CAST(o_orderdate AS TIMESTAMP) - INTERVAL 3 HOUR
                     ELSE CAST(o_orderdate AS TIMESTAMP) END,
                '%Y-%m-%d %H:%M:%S') AS parsed_date
FROM orders
""",
    "p12_json_props": """
SELECT event_type,
       count(CAST(props->>'$.k' AS BIGINT)) AS n,
       CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
       floor((avg(CAST(props->>'$.k' AS BIGINT))) * 10000.0 + 0.5) / 10000.0 AS avg_k
FROM events GROUP BY 1
""",
    "s1_rest_fetch": """
SELECT d || '#p' || p || '#r' || i AS order_id,
       CAST(p * 100 + i AS DOUBLE) AS amount
FROM (SELECT unnest(['2024-01-01', '2024-01-02', '2024-01-03']) AS d),
     (SELECT unnest(generate_series(1, 2)) AS p),
     (SELECT unnest(generate_series(0, 4)) AS i)
""",
    "s3_s6_json_roundtrip": """
SELECT strftime(o_orderdate, '%Y-%m-%d') AS ingest_date,
       count(*) AS n_orders,
       floor((CAST(sum(CAST(round(o_totalprice, 2) AS DECIMAL(30,8))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS day_total
FROM orders WHERE o_orderkey < 1000 GROUP BY 1
""",
    "s9_enrichment_lookup": """
SELECT c_custkey, c_nationkey AS destination_structure_id,
       CASE WHEN c_nationkey IN (1, 2, 3) THEN n.n_name END AS segmentation
FROM customer LEFT JOIN nation n ON c_nationkey = n.n_nationkey
""",
    "work_table_build": _WORK_SQL + "SELECT * FROM work",
    "m9_visit_columns": """
WITH r AS (
  SELECT user_id, ts, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts ASC, event_id ASC) AS rn
  FROM events
)
SELECT user_id,
  strftime(max(CASE WHEN rn = 1 THEN ts END), '%Y-%m-%d %H:%M:%S') AS visit_1_ts,
  max(CASE WHEN rn = 1 THEN event_type END) AS visit_1_event_type,
  strftime(max(CASE WHEN rn = 2 THEN ts END), '%Y-%m-%d %H:%M:%S') AS visit_2_ts,
  max(CASE WHEN rn = 2 THEN event_type END) AS visit_2_event_type,
  strftime(max(CASE WHEN rn = 3 THEN ts END), '%Y-%m-%d %H:%M:%S') AS visit_3_ts,
  max(CASE WHEN rn = 3 THEN event_type END) AS visit_3_event_type
FROM r WHERE rn <= 3 GROUP BY user_id
""",
    "s8_union_schema_drift": """
SELECT o_orderkey, o_orderstatus, CAST(NULL AS DOUBLE) AS totalprice
FROM orders WHERE o_orderkey % 2 = 0
UNION ALL
SELECT o_orderkey, CAST(NULL AS VARCHAR), round(o_totalprice, 2)
FROM orders WHERE o_orderkey % 2 = 1
""",
    "s4_metadata_sidecar": """
SELECT strftime(o_orderdate, '%Y-%m-%d') AS ingest_date,
       CAST(count(CASE WHEN o_orderkey % 97 != 0 THEN 1 END) AS BIGINT)
         AS total_ordenes,
       CAST(count(CASE WHEN o_orderkey % 97 = 0 THEN 1 END) AS BIGINT)
         AS fallos
FROM orders WHERE o_orderdate >= '2001-06-01' GROUP BY 1
""",
    "s3_partitioned_pruned": """
SELECT CAST(month(o_orderdate) AS BIGINT) AS order_month,
       count(*) AS n_orders,
       floor((CAST(sum(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE))
             * 100.0 + 0.5) / 100.0 AS month_total
FROM orders WHERE year(o_orderdate) = 1997 GROUP BY 1
""",
    "csv_roundtrip": """
SELECT o_orderstatus, count(*) AS n,
       floor((CAST(sum(CAST(round(o_totalprice, 2) AS DECIMAL(30,8)))
                   AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS total,
       strftime(min(o_orderdate), '%Y-%m-%d') AS first_date
FROM orders GROUP BY 1
""",
    "orc_roundtrip": """
SELECT l_returnflag, count(*) AS n,
       round(sum(l_quantity), 2) AS qty
FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1
""",
    "m2_merge_evolution": """
WITH master AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderdate < '1999-01-01'
), updates AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice,
         o_orderpriority IN ('1-URGENT', '2-HIGH') AS is_priority
  FROM orders WHERE o_orderdate >= '1998-01-01'
)
SELECT coalesce(u.o_orderkey, m.o_orderkey) AS o_orderkey,
       coalesce(u.o_orderstatus, m.o_orderstatus) AS o_orderstatus,
       round(coalesce(u.o_totalprice, m.o_totalprice), 2) AS o_totalprice,
       u.is_priority
FROM master m FULL OUTER JOIN updates u ON m.o_orderkey = u.o_orderkey
""",
    "pii_scrub": """
SELECT doc_id,
       md5(regexp_replace(
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}',
               '[REDACTED]', 'g'),
             '[0-9][0-9 ()+.-]{6,}[0-9]', '[REDACTED]', 'g'))
         AS scrubbed_md5,
       CAST(len(regexp_extract_all(text,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}'))
            + len(regexp_extract_all(text,
                '[0-9][0-9 ()+.-]{6,}[0-9]')) AS BIGINT) AS n_pii
FROM documents
""",
    "m2_merge_delete": """
WITH master AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderdate < '1999-01-01'
), changes AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice,
         CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op
  FROM orders WHERE o_orderdate >= '1998-01-01'
)
SELECT coalesce(u.o_orderkey, m.o_orderkey) AS o_orderkey,
       coalesce(u.o_orderstatus, m.o_orderstatus) AS o_orderstatus,
       round(coalesce(u.o_totalprice, m.o_totalprice), 2) AS o_totalprice
FROM master m FULL OUTER JOIN changes u ON m.o_orderkey = u.o_orderkey
WHERE u.op IS NULL OR u.op <> 'D'
""",
    "binary_file_source": """
SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
       md5(text) AS content_md5
FROM documents WHERE doc_id < 200
""",
    "rest_datasource": """
SELECT '2024-01-0' || CAST(d AS VARCHAR) || '#p' || CAST(p AS VARCHAR)
         || '#r' || CAST(i AS VARCHAR) AS order_id,
       '2024-01-0' || CAST(d AS VARCHAR) AS fetch_date,
       CAST(p AS INT) AS page,
       floor(CAST(p * 100 + i AS DOUBLE) * 100.0 + 0.5) / 100.0 AS amount
FROM (SELECT unnest(generate_series(1, 3)) AS d),
     (SELECT unnest(generate_series(1, 2)) AS p),
     (SELECT unnest(generate_series(0, 4)) AS i)
""",
    "log_parse": """
WITH lines AS (
  SELECT printf('evt=%d ts=%s user=%d type=%s cents=%d',
                event_id, strftime(ts, '%Y-%m-%d %H:%M:%S'),
                user_id, event_type,
                CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS value
  FROM events),
parsed AS (
  SELECT CAST(regexp_extract(value,
              'evt=(\\d+) ts=(.+) user=(\\d+) type=(\\w+) cents=(-?\\d+)',
              1) AS BIGINT) AS event_id,
         regexp_extract(value,
              'evt=(\\d+) ts=(.+) user=(\\d+) type=(\\w+) cents=(-?\\d+)',
              4) AS event_type,
         CAST(regexp_extract(value,
              'evt=(\\d+) ts=(.+) user=(\\d+) type=(\\w+) cents=(-?\\d+)',
              5) AS BIGINT) AS cents
  FROM lines)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       min(event_id) AS first_event
FROM parsed GROUP BY 1
""",
    "url_canonicalize": """
SELECT source || '.example.com' AS host,
       CAST(count(*) AS BIGINT) AS n_docs,
       min('https://' || source || '.example.com/docs/' || doc_id
           || '?id=' || doc_id) AS first_url
FROM documents GROUP BY 1
""",
    "sql_script_chain": """
WITH t AS (SELECT avg(c_acctbal) AS avg_bal FROM customer
           WHERE c_acctbal > 0)
SELECT n.n_name,
       CAST(count(*) AS BIGINT) AS n_rich,
       floor(CAST(sum(CAST(c.c_acctbal AS DECIMAL(30,8))) AS DOUBLE)
             * 100.0 + 0.5) / 100.0 AS total_bal
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey, t
WHERE c.c_acctbal > t.avg_bal
GROUP BY n.n_name
""",
    "execute_immediate_param": """
SELECT o_custkey,
       CAST(count(*) AS BIGINT) AS n_orders,
       min(o_orderkey) AS sample_order
FROM (SELECT *, row_number() OVER (
        PARTITION BY o_custkey
        ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
      FROM orders WHERE o_orderstatus = 'F')
WHERE rn <= 2 GROUP BY 1
""",
    "auto_flatten": """
SELECT o.o_orderkey,
       c.c_name AS customer_name,
       c.c_mktsegment AS customer_segment,
       c.c_nationkey AS nation,
       floor(c.c_acctbal * 100.0 + 0.5) / 100.0 AS customer_account_balance,
       floor(o.o_totalprice * 100.0 + 0.5) / 100.0 AS total
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE floor(c.c_acctbal * 100.0 + 0.5) / 100.0 > 9000.0
""",
    "xml_roundtrip": """
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
            AS BIGINT) AS total_cents,
       min(o_orderkey) AS first_key
FROM orders GROUP BY 1
""",
    "date_dim_gen": """
SELECT strftime(d, '%Y-%m-%d') AS day,
       CAST(year(d) AS INT) AS year,
       CAST(quarter(d) AS INT) AS quarter,
       CAST(month(d) AS INT) AS month,
       CAST(weekofyear(d) AS INT) AS iso_week,
       CAST(isodow(d) AS INT) AS iso_dow,
       isodow(d) >= 6 AS is_weekend,
       last_day(d) = d AS is_month_end
FROM (SELECT CAST(unnest(generate_series(DATE '2024-01-01',
                                         DATE '2024-12-31',
                                         INTERVAL 1 DAY)) AS DATE)
        AS d)
""",
}
