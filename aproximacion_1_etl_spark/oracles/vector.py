"""Oracle SQL — vector domain (entries mechanically moved from oracles.py, values verbatim)."""


from __future__ import annotations
from .common import *  # noqa: F401,F403

ORACLES: dict[str, str] = {
    "semantic_dedup": _semantic_dedup_sql(target_cell=8),
    "ann_topk_ivf": _ann_topk_ivf_sql(),
    "ivf_nprobe_plan": _ivf_nprobe_plan_sql(),
    "ivf_retrain_plan": _ivf_retrain_plan_sql(),
    "ivf_index_forget": _ivf_index_forget_sql(),
    "ivf_retrain_execute": _ivf_retrain_execute_sql(),
    "pq_retrain_execute": _pq_retrain_execute_sql(),
    "pq_retrain_plan": _pq_retrain_plan_sql(),
    "retrieval_eval_report": _retrieval_eval_sql(),
    "ivf_index_append": _ivf_index_append_sql(),
    "ann_topk_pq": _ann_topk_pq_sql(),
    "ann_topk_ivfpq": _ann_topk_ivfpq_sql(),
    "ann_cosine_topk": _ann_brute_sql(),
    "ann_topk_lsh": _lsh_sql(),
    "embedding_near_dup_lsh": _near_dup_lsh_sql(),
    "embedding_near_dup": _near_dup_lsh_sql(
        threshold=0.4, planes=4, tables=4
    ),
    "multimodal_features": """
SELECT doc_id,
       (['image', 'audio', 'video'])[CAST(doc_id % 3 AS INT) + 1]
         AS media_type,
       CAST(strlen(text) AS BIGINT) AS byte_len,
       CAST(unicode(substr(text, 1, 1)) AS INT) AS first_byte,
       CAST(list_sum(list_transform(regexp_extract_all(text, '.'),
                                    x -> unicode(x))) % 997 AS BIGINT)
         AS checksum
FROM documents
""",
    "multimodal_decode": """
WITH p AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
           FROM documents),
px AS (SELECT doc_id, w, h, x, unnest(generate_series(0, h - 1)) AS y
       FROM (SELECT doc_id, w, h, unnest(generate_series(0, w - 1)) AS x
             FROM p))
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'ppm' ELSE 'bmp' END AS fmt,
       CAST(max(w) AS INT) AS width,
       CAST(max(h) AS INT) AS height,
       CAST(count(*) AS BIGINT) AS n_px,
       floor((CAST(sum((doc_id + x + y + 0) % 256) AS DOUBLE) / count(*))
             * 10000.0 + 0.5) / 10000.0 AS mean_r,
       floor((CAST(sum((doc_id + x + y + 1) % 256) AS DOUBLE) / count(*))
             * 10000.0 + 0.5) / 10000.0 AS mean_g,
       floor((CAST(sum((doc_id + x + y + 2) % 256) AS DOUBLE) / count(*))
             * 10000.0 + 0.5) / 10000.0 AS mean_b
FROM px GROUP BY 1, 2
""",
    "multimodal_audio": """
WITH p AS (SELECT doc_id, 50 + doc_id % 40 AS n,
                  8000 + 100 * (doc_id % 3) AS rate
           FROM documents),
s AS (SELECT doc_id, n, rate, i,
             greatest(-32768, least(32767,
               ((doc_id * 31 + i * 17) % 98304) - 49152)) AS v
      FROM (SELECT doc_id, n, rate,
                   unnest(generate_series(0, n - 1)) AS i
            FROM p)),
w AS (SELECT *, lead(v) OVER (PARTITION BY doc_id ORDER BY i) AS nxt
      FROM s),
feat AS (
  SELECT doc_id, max(n) AS n, max(rate) AS rate,
         sum(v * v) AS sum_sq,
         sum(CASE WHEN nxt IS NOT NULL AND v * nxt < 0
                  THEN 1 ELSE 0 END) AS zc,
         sum(CASE WHEN v >= 32767 OR v <= -32768
                  THEN 1 ELSE 0 END) AS clip
  FROM w GROUP BY 1)
SELECT doc_id, CAST(rate AS INT) AS sample_rate,
       CAST(n AS BIGINT) AS n_frames,
       floor(n * 1000.0 / rate * 10000.0 + 0.5) / 10000.0 AS duration_ms,
       floor(sqrt(CAST(sum_sq AS DOUBLE) / n) * 10000.0 + 0.5)
         / 10000.0 AS rms,
       CAST(zc AS BIGINT) AS n_zero_cross,
       floor(CAST(clip AS DOUBLE) / n * 10000.0 + 0.5) / 10000.0
         AS clip_frac
FROM feat
""",
    "embedding_quantize_int8": """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
s AS (SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
      FROM e),
q AS (SELECT vec_id, v, scale,
             CASE WHEN scale = 0
                  THEN list_transform(v, x -> CAST(0 AS BIGINT))
                  ELSE list_transform(
                         v, x -> CAST(floor(x / scale + 0.5) AS BIGINT))
             END AS qv
      FROM s),
flat AS (SELECT vec_id, v[i] - qv[i] * scale AS err
         FROM (SELECT vec_id, v, qv, scale,
                      unnest(generate_series(1, len(v))) AS i
               FROM q)),
mse AS (SELECT vec_id,
               CAST(sum(CAST(err * err AS DECIMAL(38,18))) AS DOUBLE)
                 / count(*) AS mse
        FROM flat GROUP BY 1),
st AS (SELECT vec_id, scale,
              CAST(list_sum(qv) AS BIGINT) AS q_sum,
              CAST(len(list_filter(qv, x -> abs(x) >= 127)) AS BIGINT)
                AS n_saturated
       FROM q)
SELECT st.vec_id,
       floor(st.scale * 1000000000.0 + 0.5) / 1000000000.0 AS scale,
       st.q_sum, st.n_saturated,
       floor((m.mse * 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS mse_ppm
FROM st JOIN mse m ON st.vec_id = m.vec_id
""",
    "frame_sample": """
SELECT doc_id, CAST(i AS INT) AS frame_no,
       md5(substr(text, i * 16 + 1, 16)) AS frame_md5
FROM (SELECT doc_id, text,
             unnest(generate_series(
               0, CAST(floor(strlen(text) / 16) AS INT) - 1, 10)) AS i
      FROM documents WHERE doc_id % 3 = 2)
""",
    "haversine_nearest": """
WITH fac AS (
  SELECT n_name AS f_name,
         -60.0 + n_nationkey * 4.8 AS f_lat,
         -170.0 + n_nationkey * 13.7 AS f_lon
  FROM nation),
cust AS (
  SELECT c_custkey,
         -55.0 + CAST(c_custkey % 110 AS DOUBLE) AS c_lat,
         -180.0 + CAST((c_custkey * 7) % 360 AS DOUBLE) AS c_lon
  FROM customer WHERE c_custkey % 10 = 0),
d AS (
  SELECT c_custkey, f_name,
         floor(12742.0 * asin(sqrt(
           sin(radians(f_lat - c_lat) / 2) * sin(radians(f_lat - c_lat) / 2)
           + cos(radians(c_lat)) * cos(radians(f_lat))
             * sin(radians(f_lon - c_lon) / 2) * sin(radians(f_lon - c_lon) / 2)
         )) * 10.0 + 0.5) / 10.0 AS dist_km
  FROM cust CROSS JOIN fac)
SELECT c_custkey, f_name, dist_km FROM (
  SELECT *, row_number() OVER (PARTITION BY c_custkey
                               ORDER BY dist_km ASC, f_name ASC) AS rn
  FROM d) WHERE rn = 1
""",
    "hybrid_rrf_retrieval": _rrf_sql(),
    "ann_recall_at_k": _ann_recall_sql(),
    "hard_negative_mining": """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN (0, 1, 2, 3, 4)),
s AS (SELECT qid AS query_id, e.vec_id,
             floor((list_dot_product(qv, v) /
                   (sqrt(list_dot_product(qv, qv)) *
                    sqrt(list_dot_product(v, v)))) * 1000000000.0 + 0.5) / 1000000000.0 AS cos_sim
      FROM e CROSS JOIN q WHERE e.vec_id != qid),
f AS (SELECT * FROM s WHERE cos_sim >= 0.10 AND cos_sim < 0.95),
r AS (SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
      FROM f)
SELECT query_id, vec_id,
       floor((cos_sim) * 10000.0 + 0.5) / 10000.0 AS cos_sim, rank
FROM r WHERE rank <= 10
""",
    "embedding_dim_stats": """
WITH ex AS (
  SELECT generate_subscripts(embedding, 1) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings),
a AS (
  SELECT dim, count(*) AS n,
         sum(CAST(v AS DECIMAL(38,18))) AS s1,
         sum(CAST(v * v AS DECIMAL(38,18))) AS s2,
         min(v) AS vmin, max(v) AS vmax
  FROM ex GROUP BY 1)
SELECT CAST(dim AS INT) AS dim,
       CAST(n AS BIGINT) AS n,
       floor((CAST(s1 AS DOUBLE) / n) * 1000000.0 + 0.5) / 1000000.0
         AS mean,
       floor(sqrt(greatest(CAST(s2 AS DOUBLE) / n
                           - (CAST(s1 AS DOUBLE) / n)
                             * (CAST(s1 AS DOUBLE) / n), 0.0))
             * 1000000.0 + 0.5) / 1000000.0 AS std,
       floor((vmin) * 1000000.0 + 0.5) / 1000000.0 AS vmin,
       floor((vmax) * 1000000.0 + 0.5) / 1000000.0 AS vmax
FROM a
""",
    "kmeans_cluster_profile": _kmeans_profile_sql(),
    "ann_topk_multiprobe": _lsh_multiprobe_sql(),
    "rerank_crossencoder": _rerank_sql(),
    "embedding_pca_power": _pca_power_sql(),
    "item_similarity_topk": """
WITH po AS (
  SELECT l_orderkey, list_sort(list(DISTINCT l_partkey)) AS ps
  FROM lineitem GROUP BY 1),
ex AS (
  SELECT l_orderkey, generate_subscripts(ps, 1) AS i,
         unnest(ps) AS part
  FROM po),
pairs AS (
  SELECT e1.part AS a, e2.part AS b
  FROM ex e1 JOIN ex e2
    ON e1.l_orderkey = e2.l_orderkey AND e1.i < e2.i),
cab AS (SELECT a, b, count(*) AS c_ab FROM pairs GROUP BY 1, 2),
item_n AS (
  SELECT part AS p, count(*) AS c_p
  FROM po, unnest(ps) AS u(part) GROUP BY 1),
sym AS (
  SELECT a, b, c_ab FROM cab
  UNION ALL SELECT b AS a, a AS b, c_ab FROM cab),
scored AS (
  SELECT s.a, s.b, s.c_ab,
         floor(CAST(s.c_ab AS DOUBLE)
               / sqrt(CAST(ca.c_p AS DOUBLE) * CAST(cb.c_p AS DOUBLE))
               * 10000.0 + 0.5) / 10000.0 AS cosine
  FROM sym s
  JOIN item_n ca ON ca.p = s.a
  JOIN item_n cb ON cb.p = s.b
  WHERE s.c_ab >= 2),
topk AS (
  SELECT a, b, c_ab, cosine,
         row_number() OVER (PARTITION BY a ORDER BY cosine DESC, b) AS rn
  FROM scored)
SELECT a AS l_partkey, b AS rec_partkey,
       CAST(c_ab AS BIGINT) AS n_coorders, cosine,
       CAST(rn AS BIGINT) AS rank
FROM topk WHERE rn <= 5
""",
    "geo_grid_knn": """
WITH cust AS (
  SELECT c_custkey,
         -55.0 + CAST(c_custkey % 110 AS DOUBLE) AS c_lat,
         -180.0 + CAST((c_custkey * 7) % 360 AS DOUBLE) AS c_lon
  FROM customer WHERE c_custkey % 10 = 0),
supp AS (
  SELECT s_suppkey,
         -55.0 + CAST(s_suppkey % 110 AS DOUBLE) AS s_lat,
         -180.0 + CAST((s_suppkey * 11) % 360 AS DOUBLE) AS s_lon
  FROM supplier),
cand AS (
  SELECT c_custkey, s_suppkey,
         floor(12742.0 * asin(sqrt(
             sin(radians(s_lat - c_lat) / 2)
               * sin(radians(s_lat - c_lat) / 2)
             + cos(radians(c_lat)) * cos(radians(s_lat))
               * sin(radians(s_lon - c_lon) / 2)
               * sin(radians(s_lon - c_lon) / 2)))
           * 10.0 + 0.5) / 10.0 AS dist_km
  FROM cust, supp),
r AS (
  SELECT *, row_number() OVER (PARTITION BY c_custkey
                               ORDER BY dist_km, s_suppkey) AS rn
  FROM cand WHERE dist_km <= 500.0)
SELECT c_custkey, s_suppkey, dist_km FROM r WHERE rn = 1
""",
}
