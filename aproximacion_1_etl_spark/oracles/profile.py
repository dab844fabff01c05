"""Oracle SQL — profile domain (entries mechanically moved from oracles.py, values verbatim)."""


from __future__ import annotations
from .common import *  # noqa: F401,F403

ORACLES: dict[str, str] = {
    "approx_distinct": """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
       TRUE AS est_ok
FROM events GROUP BY 1
""",
    "hll_sketch_union": """
WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS tok
              FROM documents),
per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(count(DISTINCT tok) AS BIGINT) AS n_exact
        FROM toks GROUP BY 1)
SELECT source, n_tokens, n_exact, TRUE AS est_ok FROM per
UNION ALL
SELECT 'ALL' AS source,
       CAST((SELECT count(*) FROM toks) AS BIGINT) AS n_tokens,
       CAST((SELECT count(DISTINCT tok) FROM toks) AS BIGINT) AS n_exact,
       TRUE AS est_ok
""",
    "hll_sliding_distinct": """
WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day, user_id FROM events),
d AS (SELECT DISTINCT event_type, day FROM e)
SELECT d.event_type,
       strftime(d.day, '%Y-%m-%d') AS day,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_exact,
       TRUE AS est_ok
FROM d JOIN e ON e.event_type = d.event_type
             AND e.day BETWEEN d.day - 6 AND d.day
GROUP BY d.event_type, d.day
""",
    "segment_overlap_sketch": """
WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
seg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM du GROUP BY 1),
inter AS (SELECT x.event_type AS ta, y.event_type AS tb,
                 CAST(count(*) AS BIGINT) AS ni
          FROM du x JOIN du y
            ON x.user_id = y.user_id AND x.event_type < y.event_type
          GROUP BY 1, 2)
SELECT i.ta AS type_a, i.tb AS type_b, a.n AS n_a, b.n AS n_b,
       i.ni AS n_inter,
       floor((CAST(i.ni AS DOUBLE) / (a.n + b.n - i.ni)) * 10000.0 + 0.5)
         / 10000.0 AS jaccard,
       TRUE AS est_ok
FROM inter i
JOIN seg a ON a.event_type = i.ta
JOIN seg b ON b.event_type = i.tb
""",
    "grouped_quantiles": """
SELECT event_type, 0.5 AS q,
       floor(quantile_cont(value, 0.5) * 10000.0 + 0.5) / 10000.0
         AS exact_value,
       TRUE AS est_ok
FROM events GROUP BY event_type
UNION ALL
SELECT event_type, 0.9,
       floor(quantile_cont(value, 0.9) * 10000.0 + 0.5) / 10000.0, TRUE
FROM events GROUP BY event_type
UNION ALL
SELECT event_type, 0.99,
       floor(quantile_cont(value, 0.99) * 10000.0 + 0.5) / 10000.0, TRUE
FROM events GROUP BY event_type
""",
    # the non-invertible-sketch deletion policy: affected (subject-
    # touched) daily cells rebuild from surviving facts, untouched
    # cells pass through — counts recomputed from scratch; est_ok is
    # the established engine-side bound flag (TRUE expected)
    "sketch_forget_rebuild": """
WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day, user_id,
                  substring(md5(CAST(user_id AS VARCHAR)), 1, 4)
                    < '0800' AS subj
           FROM events),
aff AS (SELECT DISTINCT event_type, day FROM e WHERE subj),
aft AS (SELECT event_type, day,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
        FROM e WHERE NOT subj GROUP BY 1, 2)
SELECT aft.event_type, strftime(aft.day, '%Y-%m-%d') AS day,
       (aff.event_type IS NOT NULL) AS rebuilt, aft.n_exact,
       TRUE AS est_ok
FROM aft LEFT JOIN aff
  ON aft.event_type = aff.event_type AND aft.day = aff.day
""",
    # the LINEAR-sketch deletion edge: by CMS linearity, subtracting
    # the subject's own sketch equals a from-scratch sketch of the
    # post-delete facts — the oracle IS that rebuild, bit-exact
    # integer cells (md5-prefix hashing mirrored)
    "cms_forget_subtract": """
WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day
           FROM events
           WHERE substring(md5(CAST(user_id AS VARCHAR)), 1, 4)
                 >= '0800')
SELECT strftime(day, '%Y-%m-%d') AS day, CAST(j AS INT) AS j,
       substring(md5(j || ':' || event_type), 1, 2) AS cell,
       CAST(count(*) AS BIGINT) AS cnt
FROM e, (SELECT unnest([0, 1, 2, 3]) AS j)
GROUP BY 1, 2, 3
""",
    "hll_rollup": """
WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day, user_id
           FROM events)
SELECT 'by_type' AS level, event_type, 'ALL' AS day,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
       TRUE AS est_ok
FROM e GROUP BY event_type
UNION ALL
SELECT 'by_day', 'ALL', strftime(day, '%Y-%m-%d'),
       CAST(count(DISTINCT user_id) AS BIGINT), TRUE
FROM e GROUP BY day
UNION ALL
SELECT 'grand', 'ALL', 'ALL',
       CAST(count(DISTINCT user_id) AS BIGINT), TRUE
FROM e
""",
    "event_value_quantiles": """
SELECT event_type,
       floor((quantile_cont(value, 0.5)) * 10000.0 + 0.5) / 10000.0 AS p50,
       floor((quantile_cont(value, 0.9)) * 10000.0 + 0.5) / 10000.0 AS p90,
       floor((quantile_cont(value, 0.99)) * 10000.0 + 0.5) / 10000.0 AS p99
FROM events GROUP BY 1
""",
    "deterministic_sample": """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_sampled,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '0ccd'  -- 5% = 3277/65536
GROUP BY lang
""",
    "train_test_split": """
SELECT CASE
         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccd' THEN 'train'  -- 80%
         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' THEN 'val'    -- 90%
         ELSE 'test'
       END AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY 1
""",
    "stratified_sample": """
SELECT lang, CAST(count(*) AS BIGINT) AS n_sampled
FROM documents
WHERE (lang = 'en' AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '3333')  -- 20%
   OR (lang = 'es' AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '8000')  -- 50%
GROUP BY lang
""",
    "incremental_quantiles": """
SELECT 0.5 AS q,
       floor(quantile_cont(value, 0.5) * 10000.0 + 0.5) / 10000.0
         AS exact_value,
       TRUE AS est_ok
FROM events
UNION ALL
SELECT 0.9,
       floor(quantile_cont(value, 0.9) * 10000.0 + 0.5) / 10000.0,
       TRUE
FROM events
UNION ALL
SELECT 0.99,
       floor(quantile_cont(value, 0.99) * 10000.0 + 0.5) / 10000.0,
       TRUE
FROM events
""",
    "column_profile": """
SELECT 'o_orderkey' AS column_name, count(*) AS n_rows,
       count(*) - count(o_orderkey) AS n_nulls,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct
FROM orders
UNION ALL
SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
       CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders
UNION ALL
SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
       CAST(count(DISTINCT o_orderstatus) AS BIGINT) FROM orders
UNION ALL
SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
       CAST(count(DISTINCT o_orderpriority) AS BIGINT) FROM orders
""",
    "skyline_pareto": """
WITH pairs AS (
  SELECT p_brand, p_retailprice AS price, p_size AS size,
         count(*) AS n_parts
  FROM part GROUP BY 1, 2, 3)
SELECT p_brand,
       floor(price * 100.0 + 0.5) / 100.0 AS price,
       CAST(size AS INT) AS size,
       CAST(n_parts AS BIGINT) AS n_parts
FROM pairs a
WHERE NOT EXISTS (
  SELECT 1 FROM pairs b
  WHERE b.p_brand = a.p_brand
    AND b.price <= a.price AND b.size >= a.size
    AND (b.price < a.price OR b.size > a.size))
""",
    "skyline_pareto_3d": """
WITH pairs AS (
  SELECT p_type, p_retailprice AS price, CAST(p_size AS INT) AS size,
         CAST(length(p_name) AS INT) AS name_len, count(*) AS n_parts
  FROM part GROUP BY 1, 2, 3, 4)
SELECT p_type,
       floor(price * 100.0 + 0.5) / 100.0 AS price,
       size, name_len,
       CAST(n_parts AS BIGINT) AS n_parts
FROM pairs a
WHERE NOT EXISTS (
  SELECT 1 FROM pairs b
  WHERE b.p_type = a.p_type
    AND b.price <= a.price AND b.size >= a.size
    AND b.name_len >= a.name_len
    AND (b.price < a.price OR b.size > a.size
         OR b.name_len > a.name_len))
""",
    "incremental_skyline": """
WITH pairs AS (
  SELECT p_type, p_retailprice AS price, CAST(p_size AS INT) AS size,
         CAST(length(p_name) AS INT) AS name_len, count(*) AS n_parts
  FROM part GROUP BY 1, 2, 3, 4)
SELECT p_type,
       floor(price * 100.0 + 0.5) / 100.0 AS price,
       size, name_len,
       CAST(n_parts AS BIGINT) AS n_parts
FROM pairs a
WHERE NOT EXISTS (
  SELECT 1 FROM pairs b
  WHERE b.p_type = a.p_type
    AND b.price <= a.price AND b.size >= a.size
    AND b.name_len >= a.name_len
    AND (b.price < a.price OR b.size > a.size
         OR b.name_len > a.name_len))
""",
    "weighted_sample": """
WITH s AS (
  SELECT lang, doc_id,
         pow((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER) + 1)
               / 65537.0,
             1.0 / greatest(CAST(n_chars AS DOUBLE), 1.0)) AS sample_score
  FROM documents)
SELECT lang, doc_id,
       floor(sample_score * 1000000.0 + 0.5) / 1000000.0 AS score
FROM (SELECT *, row_number() OVER (
        PARTITION BY lang ORDER BY sample_score DESC, doc_id ASC) AS rn
      FROM s)
WHERE rn <= 25
""",
    # maintained-sample fold must equal the one-shot sample - the
    # oracle IS that rebuild (weighted_sample SQL verbatim)
    "incremental_weighted_sample": """
WITH s AS (
  SELECT lang, doc_id,
         pow((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER) + 1)
               / 65537.0,
             1.0 / greatest(CAST(n_chars AS DOUBLE), 1.0)) AS sample_score
  FROM documents)
SELECT lang, doc_id,
       floor(sample_score * 1000000.0 + 0.5) / 1000000.0 AS score
FROM (SELECT *, row_number() OVER (
        PARTITION BY lang ORDER BY sample_score DESC, doc_id ASC) AS rn
      FROM s)
WHERE rn <= 25
""",
    # sample-store deletion must equal the one-shot sample over the
    # POST-DELETE corpus — the oracle IS that from-scratch rebuild
    # (the weighted_sample SQL rebased onto doc_id % 9 != 0): the
    # engine evicts the wave from the persisted top-(k+reserve) store
    # and reads the visible top-25 off the survivors, which by
    # score-purity equals this rebuild (forget == rebuild)
    "weighted_sample_forget": """
WITH s AS (
  SELECT lang, doc_id,
         pow((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER) + 1)
               / 65537.0,
             1.0 / greatest(CAST(n_chars AS DOUBLE), 1.0)) AS sample_score
  FROM documents WHERE doc_id % 9 != 0)
SELECT lang, doc_id,
       floor(sample_score * 1000000.0 + 0.5) / 1000000.0 AS score
FROM (SELECT *, row_number() OVER (
        PARTITION BY lang ORDER BY sample_score DESC, doc_id ASC) AS rn
      FROM s)
WHERE rn <= 25
""",
    "robust_stats": """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       quantile_disc(value, 0.25) AS p25,
       quantile_disc(value, 0.5)  AS p50,
       quantile_disc(value, 0.9)  AS p90,
       min(value) AS vmin, max(value) AS vmax
FROM events GROUP BY event_type
""",
    "table_profile": """
WITH w AS (
  SELECT count(*) AS _n,
         sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS nn1,
         count(DISTINCT o_orderkey) AS nd1,
         CAST(min(o_orderkey) AS VARCHAR) AS mn1,
         CAST(max(o_orderkey) AS VARCHAR) AS mx1,
         sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS nn2,
         count(DISTINCT o_custkey) AS nd2,
         CAST(min(o_custkey) AS VARCHAR) AS mn2,
         CAST(max(o_custkey) AS VARCHAR) AS mx2,
         sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS nn3,
         count(DISTINCT o_orderstatus) AS nd3,
         CAST(min(o_orderstatus) AS VARCHAR) AS mn3,
         CAST(max(o_orderstatus) AS VARCHAR) AS mx3,
         sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS nn4,
         count(DISTINCT o_totalprice) AS nd4,
         CAST(min(o_totalprice) AS VARCHAR) AS mn4,
         CAST(max(o_totalprice) AS VARCHAR) AS mx4,
         sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS nn5,
         count(DISTINCT o_orderdate) AS nd5,
         CAST(min(o_orderdate) AS VARCHAR) AS mn5,
         CAST(max(o_orderdate) AS VARCHAR) AS mx5,
         sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS nn6,
         count(DISTINCT o_orderpriority) AS nd6,
         CAST(min(o_orderpriority) AS VARCHAR) AS mn6,
         CAST(max(o_orderpriority) AS VARCHAR) AS mx6
  FROM orders)
SELECT 'o_orderkey' AS column_name, CAST(_n AS BIGINT) AS n_rows,
       CAST(nn1 AS BIGINT) AS n_null, CAST(nd1 AS BIGINT) AS n_distinct,
       mn1 AS min_str, mx1 AS max_str FROM w
UNION ALL SELECT 'o_custkey', CAST(_n AS BIGINT), CAST(nn2 AS BIGINT),
       CAST(nd2 AS BIGINT), mn2, mx2 FROM w
UNION ALL SELECT 'o_orderstatus', CAST(_n AS BIGINT), CAST(nn3 AS BIGINT),
       CAST(nd3 AS BIGINT), mn3, mx3 FROM w
UNION ALL SELECT 'o_totalprice', CAST(_n AS BIGINT), CAST(nn4 AS BIGINT),
       CAST(nd4 AS BIGINT), mn4, mx4 FROM w
UNION ALL SELECT 'o_orderdate', CAST(_n AS BIGINT), CAST(nn5 AS BIGINT),
       CAST(nd5 AS BIGINT), mn5, mx5 FROM w
UNION ALL SELECT 'o_orderpriority', CAST(_n AS BIGINT), CAST(nn6 AS BIGINT),
       CAST(nd6 AS BIGINT), mn6, mx6 FROM w
""",
    "numeric_histogram": """
WITH b AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
           FROM orders),
a AS (SELECT least(20, CAST(floor((o_totalprice - b.lo)
                                  / ((b.hi - b.lo) / 20.0)) AS INT) + 1)
               AS bucket, b.lo, b.hi
      FROM orders, b)
SELECT bucket,
       floor((lo + (bucket - 1) * ((hi - lo) / 20.0)) * 10000.0 + 0.5)
         / 10000.0 AS bucket_lo,
       floor((lo + bucket * ((hi - lo) / 20.0)) * 10000.0 + 0.5)
         / 10000.0 AS bucket_hi,
       CAST(count(*) AS BIGINT) AS n
FROM a GROUP BY 1, 2, 3 ORDER BY 1
""",
    "incremental_profile": """
WITH w AS (
  SELECT count(*) AS _n,
         sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS nn1,
         count(DISTINCT o_orderkey) AS nd1,
         CAST(min(o_orderkey) AS VARCHAR) AS mn1,
         CAST(max(o_orderkey) AS VARCHAR) AS mx1,
         sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS nn2,
         count(DISTINCT o_custkey) AS nd2,
         CAST(min(o_custkey) AS VARCHAR) AS mn2,
         CAST(max(o_custkey) AS VARCHAR) AS mx2,
         sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS nn3,
         count(DISTINCT o_orderstatus) AS nd3,
         CAST(min(o_orderstatus) AS VARCHAR) AS mn3,
         CAST(max(o_orderstatus) AS VARCHAR) AS mx3,
         sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS nn4,
         count(DISTINCT o_totalprice) AS nd4,
         CAST(min(o_totalprice) AS VARCHAR) AS mn4,
         CAST(max(o_totalprice) AS VARCHAR) AS mx4,
         sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS nn5,
         count(DISTINCT o_orderdate) AS nd5,
         CAST(min(o_orderdate) AS VARCHAR) AS mn5,
         CAST(max(o_orderdate) AS VARCHAR) AS mx5,
         sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS nn6,
         count(DISTINCT o_orderpriority) AS nd6,
         CAST(min(o_orderpriority) AS VARCHAR) AS mn6,
         CAST(max(o_orderpriority) AS VARCHAR) AS mx6
  FROM orders)
SELECT 'o_orderkey' AS column_name, CAST(_n AS BIGINT) AS n_rows,
       CAST(nn1 AS BIGINT) AS n_null, CAST(nd1 AS BIGINT) AS n_distinct,
       mn1 AS min_str, mx1 AS max_str, TRUE AS matches_full FROM w
UNION ALL SELECT 'o_custkey', CAST(_n AS BIGINT), CAST(nn2 AS BIGINT),
       CAST(nd2 AS BIGINT), mn2, mx2, TRUE FROM w
UNION ALL SELECT 'o_orderstatus', CAST(_n AS BIGINT), CAST(nn3 AS BIGINT),
       CAST(nd3 AS BIGINT), mn3, mx3, TRUE FROM w
UNION ALL SELECT 'o_totalprice', CAST(_n AS BIGINT), CAST(nn4 AS BIGINT),
       CAST(nd4 AS BIGINT), mn4, mx4, TRUE FROM w
UNION ALL SELECT 'o_orderdate', CAST(_n AS BIGINT), CAST(nn5 AS BIGINT),
       CAST(nd5 AS BIGINT), mn5, mx5, TRUE FROM w
UNION ALL SELECT 'o_orderpriority', CAST(_n AS BIGINT), CAST(nn6 AS BIGINT),
       CAST(nd6 AS BIGINT), mn6, mx6, TRUE FROM w
""",
    "weighted_quantiles": """
WITH t AS (
  SELECT l_returnflag AS flag, l_extendedprice AS v,
         sum(CAST(l_quantity AS DECIMAL(38,12)))
           OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cw,
         sum(CAST(l_quantity AS DECIMAL(38,12)))
           OVER (PARTITION BY l_returnflag) AS tw
  FROM lineitem)
SELECT flag, CAST(count(*) AS BIGINT) AS n_lines,
       CAST(max(tw) AS BIGINT) AS total_qty,
       floor(min(CASE WHEN cw * 2 >= tw * 1 THEN v END)
             * 100.0 + 0.5) / 100.0 AS wp50,
       floor(min(CASE WHEN cw * 10 >= tw * 9 THEN v END)
             * 100.0 + 0.5) / 100.0 AS wp90
FROM t GROUP BY flag
""",
    "winsorized_stats": """
WITH ev AS (
  SELECT event_type, CAST(value AS DOUBLE) AS v FROM events
  WHERE value IS NOT NULL),
counts AS (
  SELECT event_type, v, CAST(count(*) AS BIGINT) AS c
  FROM ev GROUP BY 1, 2),
cum AS (
  SELECT event_type, v,
         sum(c) OVER (PARTITION BY event_type ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND
                      CURRENT ROW) AS cw,
         sum(c) OVER (PARTITION BY event_type) AS tw
  FROM counts),
cuts AS (
  SELECT event_type,
         min(CASE WHEN cw * 20 >= tw * 1 THEN v END) AS lo_cut,
         min(CASE WHEN cw * 20 >= tw * 19 THEN v END) AS hi_cut
  FROM cum GROUP BY 1),
clamped AS (
  SELECT ev.event_type, lo_cut, hi_cut,
         least(greatest(v, lo_cut), hi_cut) AS cv
  FROM ev JOIN cuts ON ev.event_type = cuts.event_type),
g AS (
  SELECT event_type, lo_cut, hi_cut,
         CAST(count(*) AS DOUBLE) AS nn,
         CAST(sum(CAST(cv AS DECIMAL(38,18))) AS DOUBLE) AS s,
         CAST(sum(CAST(cv * cv AS DECIMAL(38,18))) AS DOUBLE) AS q
  FROM clamped GROUP BY 1, 2, 3)
SELECT event_type, CAST(nn AS BIGINT) AS n,
       floor(lo_cut * 10000.0 + 0.5) / 10000.0 AS lo_cut,
       floor(hi_cut * 10000.0 + 0.5) / 10000.0 AS hi_cut,
       floor(s / nn * 10000.0 + 0.5) / 10000.0 AS wins_mean,
       floor(sqrt((q / nn - (s / nn) * (s / nn)) * (nn / (nn - 1.0)))
             * 10000.0 + 0.5) / 10000.0 AS wins_std
FROM g
""",
}
