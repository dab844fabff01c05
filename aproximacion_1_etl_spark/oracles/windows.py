"""Oracle SQL — windows domain (entries mechanically moved from oracles.py, values verbatim)."""


from __future__ import annotations
from .common import *  # noqa: F401,F403

ORACLES: dict[str, str] = {
    "multi_window_features": """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n,
         sum(CAST(value AS DECIMAL(30,8))) AS sv
  FROM events GROUP BY 1, 2)
SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
       n AS n_1d,
       CAST(sum(n) OVER w7 AS BIGINT) AS n_7d,
       CAST(sum(n) OVER w28 AS BIGINT) AS n_28d,
       floor(CAST(sum(sv) OVER w7 AS DOUBLE) * 100.0 + 0.5) / 100.0
         AS v_7d,
       floor(CAST(sum(sv) OVER w28 AS DOUBLE) * 100.0 + 0.5) / 100.0
         AS v_28d
FROM daily
WINDOW w7 AS (PARTITION BY user_id ORDER BY day
              RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW),
       w28 AS (PARTITION BY user_id ORDER BY day
               RANGE BETWEEN INTERVAL 27 DAY PRECEDING AND CURRENT ROW)
""",
    "new_users_daily": """
WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
            FROM events),
days AS (SELECT DISTINCT day FROM du)
SELECT strftime(d.day, '%Y-%m-%d') AS day,
       CAST(count(DISTINCT u.user_id) AS BIGINT) AS n_new_exact,
       TRUE AS est_ok
FROM days d
JOIN du u ON u.day = d.day
WHERE NOT EXISTS (
  SELECT 1 FROM du p
  WHERE p.user_id = u.user_id
    AND p.day BETWEEN d.day - 7 AND d.day - 1)
GROUP BY d.day
""",
    "asof_latest_event": """
WITH j AS (
  SELECT e.event_id, e.user_id,
         strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
         o.o_orderkey, o.o_orderdate,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC NULLS LAST,
                                     o.o_orderkey DESC NULLS LAST) AS rn
  FROM events e
  LEFT JOIN orders o
    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
)
SELECT event_id, user_id, event_ts,
       o_orderkey AS asof_orderkey,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS asof_ts
FROM j WHERE rn = 1
""",
    "range_join_events": """
SELECT a.event_id, a.user_id,
       strftime(a.ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
       CAST(count(b.ts) AS BIGINT) AS n_events_24h,
       floor((CAST(coalesce(sum(CAST(b.value AS DECIMAL(30,8))),
                            CAST(0 AS DECIMAL(30,8))) AS DOUBLE))
             * 100.0 + 0.5) / 100.0 AS sum_value_24h
FROM events a
LEFT JOIN events b
  ON a.user_id = b.user_id
 AND b.ts >= a.ts
 AND b.ts < a.ts + INTERVAL 1 DAY
GROUP BY 1, 2, 3
""",
    "window_running_sum": """
SELECT o_custkey, o_orderkey,
       floor((sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 100.0 + 0.5) / 100.0 AS running_spend
FROM orders
""",
    "sessionize": """
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
    "trailing_range_avg": """
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
       floor((CAST(sum(CAST(value AS DECIMAL(30,8))) OVER w AS DOUBLE)
              / count(value) OVER w) * 10000.0 + 0.5) / 10000.0 AS avg_7d
FROM events
WINDOW w AS (PARTITION BY user_id
             ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
""",
    "ntile_quartiles": """
WITH q AS (
  SELECT c_mktsegment, o_totalprice, o_orderkey,
         ntile(4) OVER (PARTITION BY c_mktsegment
                        ORDER BY o_totalprice ASC, o_orderkey ASC)
           AS quartile
  FROM orders JOIN customer ON o_custkey = c_custkey)
SELECT c_mktsegment, CAST(quartile AS INT) AS quartile,
       count(*) AS n_orders,
       round(min(o_totalprice), 2) AS min_price,
       round(max(o_totalprice), 2) AS max_price
FROM q GROUP BY 1, 2
""",
    "window_lag_lead": """
SELECT event_id, user_id,
       floor((value - lag(value) OVER w) * 10000.0 + 0.5) / 10000.0
         AS value_delta,
       lead(CAST(floor(epoch(ts)) AS BIGINT)) OVER w
         - CAST(floor(epoch(ts)) AS BIGINT) AS gap_sec
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
""",
    "window_percent_rank": """
SELECT o_orderkey, c_mktsegment,
       floor(percent_rank() OVER w * 1000000.0 + 0.5) / 1000000.0
         AS pct_rank,
       floor(cume_dist() OVER w * 1000000.0 + 0.5) / 1000000.0
         AS cum_dist
FROM orders JOIN customer ON o_custkey = c_custkey
WINDOW w AS (PARTITION BY c_mktsegment
             ORDER BY o_totalprice ASC, o_orderkey ASC)
""",
    "window_ignore_nulls": """
SELECT event_id, user_id,
       floor(last_value(CASE WHEN value > 500 THEN value END IGNORE NULLS)
               OVER w * 10000.0 + 0.5) / 10000.0 AS last_big_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
    "max_concurrency": """
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
    "interpolate_missing": """
WITH known AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events,
         CAST(sum(CAST(value AS DECIMAL(38,18))) AS DOUBLE) / count(*) AS mv
  FROM events GROUP BY 1, 2),
span AS (SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
         FROM events),
days AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
           AS day FROM span),
spine AS (SELECT t.event_type, d.day
          FROM (SELECT DISTINCT event_type FROM known) t CROSS JOIN days d),
g AS (
  SELECT s.event_type, s.day, k.n_events, k.mv,
         last_value(CASE WHEN k.n_events IS NOT NULL THEN s.day END
                    IGNORE NULLS) OVER wp AS pd,
         last_value(CASE WHEN k.n_events IS NOT NULL THEN k.mv END
                    IGNORE NULLS) OVER wp AS pv,
         first_value(CASE WHEN k.n_events IS NOT NULL THEN s.day END
                     IGNORE NULLS) OVER wn AS nd,
         first_value(CASE WHEN k.n_events IS NOT NULL THEN k.mv END
                     IGNORE NULLS) OVER wn AS nv
  FROM spine s LEFT JOIN known k
    ON s.event_type = k.event_type AND s.day = k.day
  WINDOW wp AS (PARTITION BY s.event_type ORDER BY s.day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY s.event_type ORDER BY s.day
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
SELECT event_type,
       strftime(day, '%Y-%m-%d') AS day,
       CAST(coalesce(n_events, 0) AS BIGINT) AS n_events,
       floor((CASE WHEN n_events IS NOT NULL THEN mv
                   WHEN pd IS NULL THEN nv
                   WHEN nd IS NULL THEN pv
                   ELSE pv + (nv - pv)
                        * (CAST(date_diff('day', pd, day) AS DOUBLE)
                           / CAST(date_diff('day', pd, nd) AS DOUBLE))
              END) * 10000.0 + 0.5) / 10000.0 AS mean_value,
       n_events IS NULL AS is_interpolated
FROM g
""",
    "session_window_rollup": """
WITH x AS (
  SELECT user_id, ts, event_id, epoch(ts) AS sec,
         lag(epoch(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), y AS (
  SELECT user_id, ts,
         sum(CASE WHEN prev IS NULL OR sec - prev >= 7200
                  THEN 1 ELSE 0 END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM x)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*) AS n_events
FROM y GROUP BY user_id, sid
""",
    "gap_fill_daily": """
WITH ev AS (SELECT * FROM events WHERE user_id < 20),
daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_events
  FROM ev GROUP BY 1, 2),
lastt AS (
  SELECT user_id, day, event_type AS last_type FROM (
    SELECT user_id, CAST(ts AS DATE) AS day, event_type,
           row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM ev) WHERE rn = 1),
span AS (SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1 FROM ev),
days AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
         FROM span),
spine AS (SELECT u.user_id, d.day
          FROM (SELECT DISTINCT user_id FROM ev) u CROSS JOIN days d)
SELECT s.user_id,
       strftime(s.day, '%Y-%m-%d') AS day,
       CAST(coalesce(dd.n_events, 0) AS BIGINT) AS n_events,
       last_value(l.last_type IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried_type
FROM spine s
LEFT JOIN daily dd ON s.user_id = dd.user_id AND s.day = dd.day
LEFT JOIN lastt l ON s.user_id = l.user_id AND s.day = l.day
""",
    "cohort_retention": """
WITH o AS (
  SELECT o_custkey, date_trunc('month', o_orderdate) AS om FROM orders),
first AS (SELECT o_custkey, min(om) AS cohort FROM o GROUP BY 1)
SELECT strftime(cohort, '%Y-%m') AS cohort_month,
       CAST(datediff('month', cohort, om) AS INT) AS months_since,
       CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_customers
FROM o JOIN first ON o.o_custkey = first.o_custkey
WHERE datediff('month', cohort, om) <= 6
GROUP BY 1, 2
""",
    "event_funnel": """
WITH v AS (
  SELECT user_id, min(ts) AS v_ts FROM events
  WHERE event_type = 'view' GROUP BY 1),
c AS (
  SELECT e.user_id, min(ts) AS c_ts FROM events e JOIN v USING (user_id)
  WHERE event_type = 'click' AND ts > v_ts GROUP BY 1),
p AS (
  SELECT e.user_id, min(ts) AS p_ts FROM events e JOIN c USING (user_id)
  WHERE event_type = 'purchase' AND ts > c_ts GROUP BY 1)
SELECT '1_view' AS stage, count(*) AS n_users FROM v
UNION ALL SELECT '2_click', count(*) FROM c
UNION ALL SELECT '3_purchase', count(*) FROM p
""",
    "decayed_user_value": """
WITH t AS (SELECT max(ts) AS t0 FROM events),
aged AS (SELECT user_id, value,
                CAST(datediff('day', CAST(ts AS DATE), CAST(t0 AS DATE))
                     // 7 AS INT) AS wk
         FROM events, t)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       floor(CAST(sum(CAST(value * pow(0.5, wk) AS DECIMAL(38,18)))
                  AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
         AS decayed_value
FROM aged GROUP BY 1
""",
    "sequence_pattern_match": """
WITH seqs AS (
  SELECT user_id,
         string_agg(substring(event_type, 1, 1), ''
                    ORDER BY ts, event_id) AS seq
  FROM events GROUP BY 1),
counts AS (
  SELECT 'browse_to_buy' AS pattern,
         len(regexp_extract_all(seq, 'v[vc]*p')) AS k FROM seqs
  UNION ALL
  SELECT 'error_recovery',
         len(regexp_extract_all(seq, 'e[ev]*p')) FROM seqs
  UNION ALL
  SELECT 'signup_to_purchase',
         len(regexp_extract_all(seq, 's[cev]*p')) FROM seqs)
SELECT pattern,
       CAST(sum(CASE WHEN k > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_users,
       CAST(sum(k) AS BIGINT) AS n_matches
FROM counts GROUP BY 1
""",
    "asof_forward_tolerance": """
WITH c AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
p AS (
  SELECT event_id AS p_id, user_id, ts AS p_ts, value
  FROM events WHERE event_type = 'purchase'),
cand AS (
  SELECT c.event_id, p.p_id, p.p_ts, p.value,
         row_number() OVER (
           PARTITION BY c.event_id
           ORDER BY p.p_ts ASC, p.p_id DESC) AS rn
  FROM c JOIN p ON p.user_id = c.user_id AND p.p_ts >= c.ts),
best AS (SELECT * FROM cand WHERE rn = 1),
tol AS (
  SELECT c.event_id, c.user_id, c.ts, b.p_id, b.p_ts, b.value,
         (b.p_ts IS NOT NULL AND
          CAST(floor(epoch(b.p_ts)) AS BIGINT)
          - CAST(floor(epoch(c.ts)) AS BIGINT) <= 172800) AS ok
  FROM c LEFT JOIN best b ON c.event_id = b.event_id)
SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
       CASE WHEN ok THEN p_id END AS purchase_id,
       CASE WHEN ok THEN floor(value * 100.0 + 0.5) / 100.0 END
         AS purchase_value,
       CASE WHEN ok THEN strftime(p_ts, '%Y-%m-%d %H:%M:%S') END
         AS purchase_ts
FROM tol
""",
    "funnel_conversion_time": """
WITH c AS (
  SELECT event_id, user_id, ts FROM events
  WHERE event_type = 'click'),
p AS (
  SELECT event_id AS p_id, user_id, ts AS p_ts FROM events
  WHERE event_type = 'purchase'),
cand AS (
  SELECT c.event_id, c.ts, p.p_ts,
         row_number() OVER (PARTITION BY c.event_id
                            ORDER BY p.p_ts ASC, p.p_id DESC) AS rn
  FROM c JOIN p ON p.user_id = c.user_id AND p.p_ts >= c.ts),
best AS (SELECT event_id, ts, p_ts FROM cand WHERE rn = 1),
lagged AS (
  SELECT c.event_id,
         CASE WHEN b.p_ts IS NOT NULL
                   AND CAST(floor(epoch(b.p_ts)) AS BIGINT)
                       - CAST(floor(epoch(c.ts)) AS BIGINT) <= 604800
              THEN CAST(floor(epoch(b.p_ts)) AS BIGINT)
                   - CAST(floor(epoch(c.ts)) AS BIGINT) END AS lag_s
  FROM c LEFT JOIN best b ON c.event_id = b.event_id),
vals AS (
  SELECT lag_s, CAST(count(*) AS BIGINT) AS cnt
  FROM lagged WHERE lag_s IS NOT NULL GROUP BY 1),
cum AS (
  SELECT lag_s,
         sum(cnt) OVER (ORDER BY lag_s ROWS BETWEEN UNBOUNDED
                        PRECEDING AND CURRENT ROW) AS cw,
         sum(cnt) OVER () AS tw
  FROM vals),
st AS (
  SELECT CAST(max(tw) AS BIGINT) AS n_converted,
         CAST(min(CASE WHEN cw * 2 >= tw * 1 THEN lag_s END)
              AS BIGINT) AS p50_lag_s,
         CAST(min(CASE WHEN cw * 10 >= tw * 9 THEN lag_s END)
              AS BIGINT) AS p90_lag_s
  FROM cum),
nc AS (SELECT CAST(count(*) AS BIGINT) AS n_clicks FROM c)
SELECT n_clicks, n_converted,
       floor(CAST(n_converted AS DOUBLE) / CAST(n_clicks AS DOUBLE)
             * 10000.0 + 0.5) / 10000.0 AS conversion_rate,
       p50_lag_s, p90_lag_s
FROM st, nc
""",
    "cycle_time_stages": """
WITH per_order AS (
  SELECT l_orderkey, min(l_shipdate) AS first_ship,
         max(l_shipdate) AS last_ship
  FROM lineitem GROUP BY 1),
j AS (
  SELECT p.*, o.o_orderdate
  FROM per_order p JOIN orders o ON p.l_orderkey = o.o_orderkey),
lagged AS (
  SELECT 'order_to_first_ship' AS stage,
         date_diff('day', o_orderdate, first_ship) AS lag_d FROM j
  UNION ALL
  SELECT 'order_to_last_ship',
         date_diff('day', o_orderdate, last_ship) FROM j
  UNION ALL
  SELECT 'ship_spread',
         date_diff('day', first_ship, last_ship) FROM j),
counts AS (
  SELECT stage, lag_d, CAST(count(*) AS BIGINT) AS c
  FROM lagged GROUP BY 1, 2),
cum AS (
  SELECT stage, lag_d,
         sum(c) OVER (PARTITION BY stage ORDER BY lag_d
                      ROWS BETWEEN UNBOUNDED PRECEDING AND
                      CURRENT ROW) AS cw,
         sum(c) OVER (PARTITION BY stage) AS tw
  FROM counts)
SELECT stage, CAST(max(tw) AS BIGINT) AS n_orders,
       CAST(min(CASE WHEN cw * 2 >= tw * 1 THEN lag_d END) AS INT)
         AS p50_days,
       CAST(min(CASE WHEN cw * 10 >= tw * 9 THEN lag_d END) AS INT)
         AS p90_days
FROM cum GROUP BY 1
""",
}
