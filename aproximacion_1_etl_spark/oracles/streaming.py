"""Oracle SQL — streaming domain (entries mechanically moved from oracles.py, values verbatim)."""


from __future__ import annotations
from .common import *  # noqa: F401,F403

ORACLES: dict[str, str] = {
    "streaming_ivf_append": _ivf_index_append_sql(),
    # streaming twin of incremental_weighted_sample: the store after
    # the last wave's guarded fold must equal the one-shot A-ES
    # sample over the full corpus (scores are pure row functions, so
    # fold order cannot matter) — the weighted_sample SQL verbatim
    "streaming_weighted_sample": """
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
    # the streamed fold must equal the from-scratch rebuild — same SQL
    # as the batch key (both maintain the identical full-graph store)
    "streaming_graph_stats": _graph_stats_rebuild_sql(),
    # streaming twin of incremental_dup_clusters: the final persisted
    # cluster store must equal the from-scratch clustering over the
    # full corpus whatever the wave boundaries - same rebuild SQL as
    # the batch twin and dup_clusters
    "streaming_dup_clusters": "WITH RECURSIVE "
    + _SHINGLES_SQL.strip()
    + ","
    + _CLUSTER_CTES
    + """
SELECT id AS doc_id, min(r) AS cluster_id, (id = min(r)) AS keep
FROM reach GROUP BY id
""",
    "streaming_sliding_counts": """
WITH b AS (SELECT min(ts) AS mn, max(ts) AS mx FROM events),
wins AS (SELECT unnest(generate_series(date_trunc('day', mn) - INTERVAL 1 DAY,
                                       date_trunc('day', mx),
                                       INTERVAL 1 DAY)) AS ws FROM b)
SELECT strftime(w.ws, '%Y-%m-%d %H:%M:%S') AS window_start, e.event_type,
       count(*) AS n_events,
       floor((CAST(sum(CAST(e.value AS DECIMAL(30,8))) AS DOUBLE))
             * 100.0 + 0.5) / 100.0 AS sum_value
FROM events e JOIN wins w
  ON e.ts >= w.ws AND e.ts < w.ws + INTERVAL 2 DAY
GROUP BY 1, 2
""",
    "streaming_stateful_sessions": """
WITH x AS (
  SELECT user_id,
         epoch(ts) AS sec,
         lag(epoch(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_sec
  FROM events)
SELECT user_id,
       CAST(sum(CASE WHEN prev_sec IS NULL OR sec - prev_sec > 7200
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM x GROUP BY 1
""",
    "streaming_dedup_keys": """
SELECT DISTINCT user_id, event_type FROM events
""",
    "streaming_interval_join": """
SELECT a.event_id AS click_id, b.event_id AS purchase_id, a.user_id
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_type = 'click' AND b.event_type = 'purchase'
 AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 24 HOURS
""",
    "streaming_interval_join_outer": """
WITH c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
           FROM events WHERE event_type = 'click'),
p AS (SELECT event_id AS purchase_id, user_id AS p_user_id,
             ts AS purchase_ts
      FROM events WHERE event_type = 'purchase'),
wm AS (SELECT least((SELECT max(click_ts) FROM c),
                    (SELECT max(purchase_ts) FROM p))
              - INTERVAL 1 HOUR AS w),
matched AS (SELECT c.click_id, p.purchase_id, c.user_id
            FROM c JOIN p ON c.user_id = p.p_user_id
             AND p.purchase_ts >= c.click_ts
             AND p.purchase_ts < c.click_ts + INTERVAL 6 HOURS)
SELECT click_id, purchase_id, user_id FROM matched
UNION ALL
SELECT c.click_id, CAST(NULL AS BIGINT) AS purchase_id, c.user_id
FROM c
WHERE c.click_id NOT IN (SELECT click_id FROM matched)
  AND c.click_ts + INTERVAL 6 HOURS < (SELECT w FROM wm)
""",
    "streaming_interval_join_full": """
WITH c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
           FROM events WHERE event_type = 'click'),
p AS (SELECT event_id AS purchase_id, user_id AS p_user_id,
             ts AS purchase_ts
      FROM events WHERE event_type = 'purchase'),
wm AS (SELECT least((SELECT max(click_ts) FROM c),
                    (SELECT max(purchase_ts) FROM p))
              - INTERVAL 1 HOUR AS w),
matched AS (SELECT c.click_id, p.purchase_id, c.user_id
            FROM c JOIN p ON c.user_id = p.p_user_id
             AND p.purchase_ts >= c.click_ts
             AND p.purchase_ts < c.click_ts + INTERVAL 6 HOURS)
SELECT click_id, purchase_id, user_id FROM matched
UNION ALL
-- left flush: a click's window closes when the watermark passes
-- click_ts + 6h (same rule as the left-outer form)
SELECT c.click_id, CAST(NULL AS BIGINT) AS purchase_id, c.user_id
FROM c
WHERE c.click_id NOT IN (SELECT click_id FROM matched)
  AND c.click_ts + INTERVAL 6 HOURS < (SELECT w FROM wm)
UNION ALL
-- right flush: a purchase only matches clicks with click_ts <=
-- purchase_ts, and new clicks arrive at >= w, so it is provably
-- unmatched once purchase_ts < w
SELECT CAST(NULL AS BIGINT) AS click_id, p.purchase_id,
       p.p_user_id AS user_id
FROM p
WHERE p.purchase_id NOT IN (SELECT purchase_id FROM matched)
  AND p.purchase_ts < (SELECT w FROM wm)
""",
    "streaming_session_window": """
WITH l AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   IS NULL
              OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL 2 HOURS
              THEN 1 ELSE 0 END AS nf
  FROM events),
s AS (SELECT user_id, ts,
             sum(nf) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
      FROM l),
g AS (SELECT user_id, sid, min(ts) AS st, max(ts) AS en,
             count(*) AS n
      FROM s GROUP BY 1, 2)
SELECT user_id,
       strftime(st, '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(en + INTERVAL 2 HOURS, '%Y-%m-%d %H:%M:%S')
         AS session_end,
       CAST(n AS BIGINT) AS n_events
FROM g
WHERE en + INTERVAL 2 HOURS
      < (SELECT max(ts) FROM events) - INTERVAL 1 HOUR
""",
    # TTL-windowed twin: a collision survives iff the OLD doc's event
    # day (doc_id % 30) lies inside the NEW doc's wave watermark
    # window (wmax − 15, wmax]; waves are 10-day blocks, the watermark
    # is each wave's max PRESENT day, and only strictly-earlier waves
    # are in the store when a wave screens (monotone eviction = the
    # latest filter, so the batch mirror is per-wave exact).
    "streaming_ttl_dedup": "WITH "
    + _SHINGLES_SQL
    + """,
sig AS (
  SELECT doc_id, b,
         min(substr(md5(CAST(b // 4 AS VARCHAR) || ':' || shingle),
                    1 + 8 * (b % 4), 8)) AS s
  FROM shingles, (SELECT unnest(generate_series(0, 7)) AS b)
  GROUP BY 1, 2),
lab AS (
  SELECT doc_id, CAST(doc_id % 30 AS BIGINT) AS day,
         CAST((doc_id % 30) // 10 AS BIGINT) AS wave
  FROM documents),
wm AS (SELECT wave, max(day) AS wmax FROM lab GROUP BY 1)
SELECT a.doc_id AS doc_new, b.doc_id AS doc_old,
       CAST(count(*) AS BIGINT) AS matching_bands,
       floor((count(*) / 8.0) * 10000.0 + 0.5) / 10000.0 AS est_jaccard
FROM sig a JOIN sig b ON a.b = b.b AND a.s = b.s
JOIN lab la ON la.doc_id = a.doc_id
JOIN lab lb ON lb.doc_id = b.doc_id
JOIN wm ON wm.wave = la.wave
WHERE lb.wave < la.wave AND lb.day > wm.wmax - 15
GROUP BY 1, 2 HAVING count(*) >= 2
""",
    "streaming_incremental_dedup": "WITH "
    + _SHINGLES_SQL
    + """,
sig AS (
  SELECT doc_id, b,
         min(substr(md5(CAST(b // 4 AS VARCHAR) || ':' || shingle),
                    1 + 8 * (b % 4), 8)) AS s
  FROM shingles, (SELECT unnest(generate_series(0, 7)) AS b)
  GROUP BY 1, 2)
SELECT a.doc_id AS doc_new, b.doc_id AS doc_old,
       CAST(count(*) AS BIGINT) AS matching_bands,
       floor((count(*) / 8.0) * 10000.0 + 0.5) / 10000.0 AS est_jaccard
FROM sig a JOIN sig b ON a.b = b.b AND a.s = b.s
WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
GROUP BY 1, 2 HAVING count(*) >= 2
""",
    "streaming_windowed_counts": """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(*) AS n_events,
       floor((CAST(sum(CAST(value AS DECIMAL(30,8))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS sum_value
FROM events GROUP BY 1, 2
""",
    "streaming_quantiles": """
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
    "streaming_ivm_join": """
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
    "streaming_max_concurrency": """
WITH iv AS (
  SELECT event_type, ts AS s,
         ts + (60 + event_id % 240) * INTERVAL 1 SECOND AS e
  FROM events),
d AS (
  SELECT event_type, t, sum(delta) AS delta FROM (
    SELECT event_type, s AS t, 1 AS delta FROM iv
    UNION ALL SELECT event_type, e AS t, -1 AS delta FROM iv)
  GROUP BY 1, 2),
r AS (
  SELECT event_type, t,
         CAST(sum(delta) OVER (PARTITION BY event_type ORDER BY t
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS running
  FROM d),
p AS (SELECT event_type, max(running) AS peak FROM r GROUP BY 1),
n AS (SELECT event_type, count(*) AS n_intervals FROM iv GROUP BY 1)
SELECT r.event_type,
       CAST(n.n_intervals AS BIGINT) AS n_intervals,
       CAST(p.peak AS BIGINT) AS peak_concurrency,
       strftime(min(r.t), '%Y-%m-%d %H:%M:%S') AS peak_at
FROM r
JOIN p ON r.event_type = p.event_type AND r.running = p.peak
JOIN n ON n.event_type = r.event_type
GROUP BY 1, 2, 3
ORDER BY 1
""",
    "streaming_dedup_watermarked": """
SELECT DISTINCT user_id, event_type FROM events
""",
    "streaming_static_enrich": """
SELECT c_mktsegment, count(*) AS n_events,
       floor((CAST(sum(CAST(value AS DECIMAL(30,8))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1
""",
    "rest_stream_ingest": """
SELECT '2024-01-0' || CAST(d AS VARCHAR) AS fetch_date,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(floor(CAST(p * 100 + i AS DOUBLE) * 100.0 + 0.5)
                     AS BIGINT)) AS BIGINT) AS sum_amount_cents
FROM (SELECT unnest(generate_series(1, 3)) AS d),
     (SELECT unnest(generate_series(1, 2)) AS p),
     (SELECT unnest(generate_series(0, 4)) AS i)
GROUP BY 1
""",
    "streaming_dedup_watermark": """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_value_cents
FROM events GROUP BY 1
""",
    "streaming_fingerprint_maintenance": """
WITH h AS (SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS prefix,
                  sha256(concat_ws(chr(1), CAST(doc_id AS VARCHAR), text,
                                   lang, source,
                                   CAST(n_chars AS VARCHAR))) AS h
           FROM documents)
SELECT prefix,
       sha256(string_agg(h, '' ORDER BY h)) AS digest,
       CAST(count(*) AS BIGINT) AS n_rows
FROM h GROUP BY 1
""",
    "streaming_cusum_monitor": """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS x
  FROM events GROUP BY 1, 2),
base AS (
  SELECT event_type,
         CAST(sum(CAST(x AS DECIMAL(38,18)))
                FILTER (WHERE day < DATE '2024-01-16') AS DOUBLE)
           / nullif(count(*) FILTER (WHERE day < DATE '2024-01-16'), 0)
           AS mu_base,
         CAST(sum(CAST(x AS DECIMAL(38,18))) AS DOUBLE) / count(*)
           AS mu_all
  FROM daily GROUP BY 1),
mu AS (
  SELECT event_type, coalesce(mu_base, mu_all) AS mu FROM base),
devs AS (
  SELECT d.event_type, d.day,
         CAST(d.x AS DOUBLE) - m.mu AS dev, m.mu
  FROM daily d JOIN mu m ON m.event_type = d.event_type),
pre AS (
  SELECT event_type, day, mu,
         sum(dev) OVER (
           PARTITION BY event_type ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix
  FROM devs),
run AS (
  SELECT event_type, day, mu, prefix,
         min(prefix) OVER (
           PARTITION BY event_type ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmin
  FROM pre),
drifted AS (
  SELECT event_type, day, mu,
         floor((prefix - least(runmin, 0.0)) * 1000000.0 + 0.5)
           / 1000000.0 AS drift
  FROM run),
ranked AS (
  SELECT event_type, day, mu, drift,
         row_number() OVER (
           PARTITION BY event_type ORDER BY drift DESC, day) AS rn
  FROM drifted)
SELECT event_type,
       strftime(day, '%Y-%m-%d') AS peak_day,
       floor(drift * 10000.0 + 0.5) / 10000.0 AS max_drift,
       floor(mu * 10000.0 + 0.5) / 10000.0 AS mean_daily
FROM ranked WHERE rn = 1
""",
    "streaming_profile": """
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
    "streaming_forget_user": """
WITH ev AS (SELECT event_id, ts, event_type, user_id FROM events),
reg AS (SELECT DISTINCT user_id FROM ev
        WHERE CAST(ts AS DATE) < DATE '2024-01-21'
          AND substring(md5(CAST(user_id AS VARCHAR)), 1, 4) < '0800'),
tagged AS (SELECT ev.*,
                  CASE WHEN reg.user_id IS NULL THEN 0 ELSE 1 END AS fg
           FROM ev LEFT JOIN reg ON ev.user_id = reg.user_id)
SELECT event_type,
       CAST(sum(1 - fg) AS BIGINT) AS n_visible,
       CAST(sum(fg) AS BIGINT) AS n_forgotten,
       CAST(0 AS BIGINT) AS n_registry_still_visible
FROM tagged GROUP BY 1
""",
}
