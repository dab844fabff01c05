"""Oracle SQL — graph domain (entries mechanically moved from oracles.py, values verbatim)."""


from __future__ import annotations
from .common import *  # noqa: F401,F403

ORACLES: dict[str, str] = {
    "pagerank_suppliers": _pagerank_sql(),
    "personalized_pagerank": _ppr_sql([1, 2, 3], iterations=4, eps=1e-4),
    # From-scratch rebuild of the maintained (degree, n_triangles)
    # store: hash equality against the Spark fold IS the proof that
    # fold == rebuild. ONE builder shared verbatim with the streaming
    # twin (oracles/common.py::_graph_stats_rebuild_sql).
    "incremental_graph_stats": _graph_stats_rebuild_sql(),
    # RTBF edge: rebuild over the SURVIVING edges (both endpoints
    # outside the product-forget wave)
    "graph_stats_forget": _graph_stats_rebuild_sql(
        edge_where="u % 10 != 0 AND v % 10 != 0"
    ),
    "graph_kcore": _kcore_sql(k=3, rounds=14),
    "event_bigrams": """
WITH p AS (
  SELECT user_id,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type,
         event_type AS next_type
  FROM events),
cm AS (SELECT prev_type, next_type, count(*) AS n
       FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2),
t AS (SELECT prev_type, sum(n) AS n_prev FROM cm GROUP BY 1)
SELECT cm.prev_type, cm.next_type, CAST(cm.n AS BIGINT) AS n,
       floor(CAST(cm.n AS DOUBLE) / t.n_prev * 10000.0 + 0.5) / 10000.0
         AS p_next_given_prev
FROM cm JOIN t ON cm.prev_type = t.prev_type
""",
    "type_cooccurrence": """
WITH b AS (SELECT user_id, list_sort(list_distinct(list(event_type)))
                    AS types
           FROM events GROUP BY 1),
nu AS (SELECT count(*) AS n_users FROM b),
pr AS (SELECT user_id, a.t AS type_a, c.t AS type_b
       FROM b, unnest(types) AS a(t), unnest(types) AS c(t)
       WHERE a.t < c.t),
pc AS (SELECT type_a, type_b, count(*) AS n_both FROM pr GROUP BY 1, 2),
s AS (SELECT t, count(*) AS n_t FROM (
        SELECT user_id, unnest(types) AS t FROM b) GROUP BY 1)
SELECT pc.type_a, pc.type_b, CAST(pc.n_both AS BIGINT) AS n_both,
       floor(CAST(pc.n_both AS DOUBLE) / nu.n_users * 10000.0 + 0.5)
         / 10000.0 AS support,
       floor(((CAST(pc.n_both AS DOUBLE) / nu.n_users)
              / ((CAST(sa.n_t AS DOUBLE) / nu.n_users)
                 * (CAST(sb.n_t AS DOUBLE) / nu.n_users)))
             * 10000.0 + 0.5) / 10000.0 AS lift
FROM pc
JOIN s sa ON pc.type_a = sa.t
JOIN s sb ON pc.type_b = sb.t, nu
""",
    "triangle_cooccurrence": """
WITH e AS (
  SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
  FROM lineitem l1
  JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey),
t AS (
  SELECT e1.a AS u, e1.b AS v, e2.b AS w
  FROM e e1
  JOIN e e2 ON e1.b = e2.a
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
nodes AS (
  SELECT unnest([u, v, w]) AS node FROM t),
c AS (
  SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
  FROM nodes GROUP BY 1),
r AS (
  SELECT node, n_triangles,
         row_number() OVER (ORDER BY n_triangles DESC, node) AS rank
  FROM c)
SELECT node AS l_partkey, n_triangles, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 20
""",
    "basket_rules": """
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
item_n AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_item
           FROM items GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
pair_n AS (
  SELECT p1, p2, CAST(count(*) AS BIGINT) AS n_pair
  FROM pairs GROUP BY 1, 2 HAVING count(*) >= 3),
nb AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS _nb
       FROM items),
rules AS (
  SELECT p1 AS antecedent, p2 AS consequent, n_pair FROM pair_n
  UNION ALL
  SELECT p2, p1, n_pair FROM pair_n)
SELECT r.antecedent, r.consequent, r.n_pair, a.n_item AS n_ante,
       floor(CAST(r.n_pair AS DOUBLE) / a.n_item * 1000000.0 + 0.5)
         / 1000000.0 AS confidence,
       floor(CAST(r.n_pair AS DOUBLE) * nb._nb
             / (a.n_item * c.n_item) * 1000000.0 + 0.5)
         / 1000000.0 AS lift
FROM rules r
JOIN item_n a ON r.antecedent = a.l_partkey
JOIN item_n c ON r.consequent = c.l_partkey
CROSS JOIN nb
""",
    "adamic_adar_linkpred": """
WITH e AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
deg AS (SELECT l_partkey, count(*) AS d FROM e GROUP BY 1),
wedge AS (
  SELECT a.l_suppkey AS s1, b.l_suppkey AS s2, deg.d
  FROM e a
  JOIN e b ON a.l_partkey = b.l_partkey
          AND a.l_suppkey < b.l_suppkey
  JOIN deg ON deg.l_partkey = a.l_partkey
  WHERE deg.d <= 256),
scored AS (
  SELECT s1, s2, CAST(count(*) AS BIGINT) AS common_parts,
         CAST(sum(CAST(1.0 / ln(CAST(d AS DOUBLE))
                       AS DECIMAL(30,15))) AS DOUBLE) AS _aa
  FROM wedge GROUP BY 1, 2),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY _aa DESC, s1, s2) AS rn
  FROM scored)
SELECT s1, s2, common_parts,
       floor(_aa * 10000.0 + 0.5) / 10000.0 AS aa_score,
       CAST(rn AS INT) AS rank
FROM ranked WHERE rn <= 50
""",
    "bfs_hop_distance": """
WITH RECURSIVE op0 AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
op AS (
  SELECT * FROM op0 WHERE l_orderkey IN (
    SELECT l_orderkey FROM op0 GROUP BY 1 HAVING count(*) <= 64)),
edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey <> b.l_partkey),
bfs(pk, d) AS (
  SELECT p_partkey, 0 FROM part WHERE p_brand = 'Brand#11'
  UNION
  SELECT e.dst, bfs.d + 1 FROM bfs JOIN edges e ON e.src = bfs.pk
  WHERE bfs.d < 3)
SELECT CAST(pk AS BIGINT) AS p_partkey, CAST(min(d) AS INT) AS dist
FROM bfs GROUP BY 1
""",
    "graph_components": """
WITH RECURSIVE op0 AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
op AS (
  SELECT * FROM op0 WHERE l_orderkey IN (
    SELECT l_orderkey FROM op0 GROUP BY 1 HAVING count(*) <= 64)),
e AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                     AND a.l_partkey <> b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2),
reach(node, lbl) AS (
  SELECT u, u FROM e
  UNION
  SELECT e.u, reach.lbl FROM reach JOIN e ON e.v = reach.node)
SELECT CAST(node AS BIGINT) AS p_partkey,
       CAST(min(lbl) AS BIGINT) AS component
FROM reach GROUP BY 1
""",
    "graph_degree_cap_report": """
WITH ps AS (
  SELECT 'part_supplier' AS graph, d FROM (
    SELECT l_partkey, count(*) AS d
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    GROUP BY 1)),
bk AS (
  SELECT 'co_order' AS graph, d FROM (
    SELECT l_orderkey, count(*) AS d
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    GROUP BY 1)),
hist AS (
  SELECT graph, d, count(*) AS n
  FROM (SELECT * FROM ps UNION ALL SELECT * FROM bk) GROUP BY 1, 2),
caps AS (SELECT unnest([8, 16, 32, 64, 128, 256]) AS cap)
SELECT graph, CAST(cap AS INT) AS cap,
       CAST(sum(n) AS BIGINT) AS pivots_total,
       CAST(sum(CASE WHEN d > cap THEN n ELSE 0 END) AS BIGINT)
         AS pivots_dropped,
       CAST(sum(n * (d * (d - 1) // 2)) AS BIGINT) AS wedges_total,
       CAST(sum(CASE WHEN d <= cap THEN n * (d * (d - 1) // 2)
                     ELSE 0 END) AS BIGINT) AS wedges_kept,
       floor(CAST(sum(CASE WHEN d <= cap THEN n * (d * (d - 1) // 2)
                           ELSE 0 END) AS DOUBLE)
             / CAST(sum(n * (d * (d - 1) // 2)) AS DOUBLE)
             * 10000.0 + 0.5) / 10000.0 AS kept_frac
FROM hist CROSS JOIN caps
GROUP BY 1, 2
""",
    "frequent_triples": """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
fi AS (
  SELECT l_partkey FROM op GROUP BY 1 HAVING count(*) >= 3),
fb AS (
  SELECT op.l_orderkey, op.l_partkey
  FROM op JOIN fi ON op.l_partkey = fi.l_partkey),
tr AS (
  SELECT a.l_partkey AS a, b.l_partkey AS b, c.l_partkey AS c
  FROM fb a JOIN fb b ON a.l_orderkey = b.l_orderkey
            AND a.l_partkey < b.l_partkey
       JOIN fb c ON b.l_orderkey = c.l_orderkey
            AND b.l_partkey < c.l_partkey),
counts AS (
  SELECT a, b, c, CAST(count(*) AS BIGINT) AS support
  FROM tr GROUP BY 1, 2, 3),
top AS (
  SELECT *, row_number() OVER (ORDER BY support DESC, a, b, c)
              AS rank
  FROM counts)
SELECT a, b, c, support, CAST(rank AS INT) AS rank
FROM top WHERE rank <= 20
""",
}
