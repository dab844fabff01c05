"""DuckDB oracle SQL for every declared query (driver contract).

Each SQL string must produce, on the same parquet tables, exactly the
rows/columns of the Spark query with the same column names — the driver
compares row-count + schema + order-insensitive value hash (columns
sorted by name). Engine-parity rules used throughout:

- md5/sha256 hex output is identical across engines;
- integer aggregates CAST to BIGINT (DuckDB sum(int) is HUGEINT);
- timestamps via strftime; doubles via round(x, n) with both engines
  computing the same sequential expression;
- the simhash / LSH oracles are *generated* from the same constants the
  Spark implementation uses, so the two stay in lockstep by
  construction.
"""

from __future__ import annotations

from aproximacion_1_etl_spark.text.analysis import (
    BM25_QUERIES as _BM25_QUERIES,
)
from aproximacion_1_etl_spark.text.vector import _hyperplane

# --- shared fragments ---------------------------------------------------

_WORK_SQL = """
WITH items AS (
  SELECT l_orderkey, count(*) AS n_items,
         round(sum(l_quantity), 2) AS sum_qty,
         floor((CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS revenue
  FROM lineitem GROUP BY 1
), latest AS (
  SELECT user_id, event_type AS latest_event_type, value AS latest_value
  FROM (SELECT *, row_number() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) WHERE rn = 1
), sched AS (
  SELECT user_id, min(ts) AS scheduled_ts FROM events GROUP BY 1
), work AS (
  SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus,
         round(o.o_totalprice, 2) AS o_totalprice,
         coalesce(i.n_items, 0) AS n_items,
         coalesce(i.sum_qty, 0.0) AS sum_qty,
         coalesce(i.revenue, 0.0) AS revenue,
         l.latest_event_type,
         floor((l.latest_value) * 100.0 + 0.5) / 100.0 AS latest_value,
         strftime(s.scheduled_ts, '%Y-%m-%d %H:%M:%S') AS first_event_ts
  FROM orders o
  LEFT JOIN items i ON o.o_orderkey = i.l_orderkey
  LEFT JOIN latest l ON o.o_custkey = l.user_id
  LEFT JOIN sched s ON o.o_custkey = s.user_id
)
"""

_SHINGLES_SQL = """
shingles AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
    FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks)-2)) AS i
          FROM (SELECT doc_id, string_split(text, ' ') AS toks
                FROM documents WHERE len(string_split(text, ' ')) >= 3))
  )
)
"""


def _simhash_sql(bits: int = 16) -> str:
    """Generated mirror of text/dedup.py::simhash (same bit math)."""
    bit_cols = []
    for j in range(bits):
        div = 2 ** (3 - j % 4)
        bit_cols.append(
            f"CASE WHEN ((strpos('0123456789abcdef', substr(h, {j // 4 + 1}, 1)) - 1)"
            f" // {div}) % 2 = 1 THEN 1 ELSE -1 END AS b{j}"
        )
    sums = ", ".join(f"CAST(sum(b{j}) AS BIGINT) AS s{j}" for j in range(bits))
    sig = " + ".join(
        f"CASE WHEN s{j} >= 0 THEN {2**j} ELSE 0 END" for j in range(bits)
    )
    return f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
h AS (SELECT doc_id, md5(tok) AS h FROM tok),
bits AS (SELECT doc_id, {', '.join(bit_cols)} FROM h),
s AS (SELECT doc_id, {sums} FROM bits GROUP BY 1)
SELECT doc_id, CAST({sig} AS BIGINT) AS simhash FROM s
"""


def _plane_literal(table: int, plane: int, dim: int) -> str:
    return "[" + ", ".join(repr(_hyperplane(table, plane, d)) for d in range(dim)) + "]"


def _near_dup_lsh_sql(
    threshold: float = 0.4, planes: int = 4, tables: int = 2, dim: int = 64
) -> str:
    """Generated mirror of text/vector.py::embedding_near_dup_lsh."""
    per_table = []
    for t in range(tables):
        terms = " + ".join(
            f"CASE WHEN list_dot_product(v, {_plane_literal(t, p, dim)}) >= 0 "
            f"THEN {2**p} ELSE 0 END"
            for p in range(planes)
        )
        per_table.append(
            f"SELECT vec_id, nv, {t} AS tbl, ({terms}) AS bucket FROM e"
        )
    buckets = " UNION ALL ".join(per_table)
    return f"""
WITH raw AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
e AS (SELECT vec_id, v,
             list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS nv
      FROM raw),
bk AS ({buckets}),
cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
         FROM bk a JOIN bk b
           ON a.tbl = b.tbl AND a.bucket = b.bucket
          AND a.vec_id < b.vec_id),
p AS (SELECT c.vec_a, c.vec_b,
             floor(list_dot_product(ea.nv, eb.nv) * 1000000.0 + 0.5)
               / 1000000.0 AS cos_sim
      FROM cand c
      JOIN e ea ON c.vec_a = ea.vec_id
      JOIN e eb ON c.vec_b = eb.vec_id)
SELECT vec_a, vec_b, floor((cos_sim) * 10000.0 + 0.5) / 10000.0 AS cos_sim
FROM p WHERE cos_sim >= {threshold}
"""


def _lsh_sql(
    query_ids: str = "0, 1, 2, 3, 4",
    k: int = 10,
    planes: int = 4,
    tables: int = 2,
    dim: int = 64,
) -> str:
    """Generated mirror of text/vector.py::ann_topk_lsh — identical
    hyperplane constants, bucketing, candidate dedup, and ranking."""
    per_table = []
    for t in range(tables):
        terms = " + ".join(
            f"CASE WHEN list_dot_product(v, {_plane_literal(t, p, dim)}) >= 0 "
            f"THEN {2**p} ELSE 0 END"
            for p in range(planes)
        )
        per_table.append(
            f"SELECT vec_id, v, {t} AS tbl, ({terms}) AS bucket FROM e"
        )
    buckets = " UNION ALL ".join(per_table)
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
bk AS ({buckets}),
q AS (SELECT vec_id AS qid, v AS qv, tbl, bucket FROM bk
      WHERE vec_id IN ({query_ids})),
cand AS (SELECT DISTINCT q.qid, b.vec_id
         FROM bk b JOIN q ON b.tbl = q.tbl AND b.bucket = q.bucket
         WHERE b.vec_id != q.qid),
s AS (SELECT c.qid AS query_id, c.vec_id,
             floor((list_dot_product(qe.v, ce.v) /
                   (sqrt(list_dot_product(qe.v, qe.v)) *
                    sqrt(list_dot_product(ce.v, ce.v)))) * 1000000000.0 + 0.5) / 1000000000.0 AS cos_sim
      FROM cand c
      JOIN e ce ON c.vec_id = ce.vec_id
      JOIN e qe ON c.qid = qe.vec_id),
r AS (SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
      FROM s)
SELECT query_id, vec_id, floor((cos_sim) * 10000.0 + 0.5) / 10000.0 AS cos_sim, rank
FROM r WHERE rank <= {k}
"""


def _bm25_sql(
    queries: dict[int, list[str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """Generated mirror of text/analysis.py::bm25_topk. Floating-point
    literals are emitted with repr() of the SAME Python arithmetic the
    Spark plan bakes in (k1+1.0, 1.0-b), and the idf / length-norm
    expressions are parenthesized operand-for-operand, so both engines
    compute bit-identical doubles; the per-doc contribution sum is
    decimal-cast in both."""
    vals = ", ".join(
        f"({qid}, '{t}')"
        for qid, terms in sorted(queries.items())
        for t in sorted(set(terms))
    )
    return f"""
WITH q(query_id, term) AS (SELECT * FROM (VALUES {vals})),
toks AS (SELECT doc_id, len(string_split(text, ' ')) AS dl,
                unnest(string_split(text, ' ')) AS term
         FROM documents),
tf AS (SELECT doc_id, term, max(dl) AS dl, count(*) AS tf
       FROM toks GROUP BY 1, 2),
qtf AS (SELECT * FROM tf WHERE term IN (SELECT DISTINCT term FROM q)),
df0 AS (SELECT term, count(*) AS df FROM qtf GROUP BY 1),
st AS (SELECT count(*) AS n_docs,
              avg(len(string_split(text, ' '))) AS avgdl
       FROM documents),
contrib AS (
  SELECT q.query_id, qtf.doc_id,
         ln(1.0 + (st.n_docs - df0.df + 0.5) / (df0.df + 0.5))
         * (qtf.tf * {k1 + 1.0!r})
         / (qtf.tf + {k1!r} * ({1.0 - b!r} + ({b!r} * qtf.dl) / st.avgdl))
           AS c
  FROM qtf JOIN q USING (term) JOIN df0 USING (term), st),
score AS (SELECT query_id, doc_id,
                 CAST(sum(CAST(c AS DECIMAL(38,18))) AS DOUBLE) AS s
          FROM contrib GROUP BY 1, 2),
r AS (SELECT query_id, doc_id, s,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY s DESC, doc_id ASC) AS rank
      FROM score)
SELECT CAST(query_id AS INT) AS query_id, doc_id,
       floor(s * 10000.0 + 0.5) / 10000.0 AS score,
       CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k}
"""


def _pagerank_sql(iterations: int = 5) -> str:
    """Generated mirror of operators/graph.py::pagerank over the
    customer->supplier bipartite graph (q_pagerank_suppliers): the
    damped fixed-iteration recurrence unrolled into one CTE per
    iteration. The contribution sums are decimal-cast in BOTH engines
    (same convention as _dsum), so every iteration's ranks are
    bit-identical regardless of partitioning/summation order — which is
    what makes a value oracle possible for an iterative algorithm.
    Literals mirror the Spark plan exactly: (1.0 - 0.85) so both
    engines compute the same IEEE double for the teleport term."""
    teleport = "(1.0 - 0.85) / nn.n"
    parts = [
        """
WITH e AS (
  SELECT DISTINCT o_custkey AS src, 1000000 + l_suppkey AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
nodes AS (SELECT src AS node FROM e UNION SELECT dst AS node FROM e),
nn AS (SELECT count(*) AS n FROM nodes),
deg AS (SELECT src, count(*) AS out_deg FROM e GROUP BY 1),
nr AS (SELECT node FROM nodes WHERE node NOT IN (SELECT dst FROM e)),
it0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes, nn)"""
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f""",
it{i} AS (
  SELECT c.node,
         {teleport} + 0.85 * CAST(c.received AS DOUBLE) AS rank
  FROM (SELECT e.dst AS node,
               sum(CAST(r.rank / deg.out_deg AS DECIMAL(38,20))) AS received
        FROM e JOIN deg USING (src) JOIN it{i - 1} r ON r.node = e.src
        GROUP BY 1) c, nn
  UNION ALL
  SELECT nr.node, {teleport} AS rank FROM nr, nn)"""
        )
    parts.append(
        f"""
SELECT node - 1000000 AS supplier,
       floor((rank * 1000000.0) * 100.0 + 0.5) / 100.0 AS rank_ppm
FROM it{iterations} WHERE node >= 1000000
ORDER BY rank_ppm DESC, supplier LIMIT 20"""
    )
    return "".join(parts)


def _ivf_cent_ctes(
    iterations: int = 3,
    dim: int = 64,
    min_c: int = 16,
    where: str = "",
) -> str:
    """Mirror of text/vector.py::train_ivf_centroids — Lloyd's k-means
    unrolled one (assign, mean, coalesce) CTE trio per iteration, so the
    trained codebook is recomputed IN-ENGINE and the downstream IVF
    queries stay fully value-checked. Parity levers: codebook size is
    greatest(min, ceiling(sqrt(count(*)))) == derive_n_centroids —
    IEEE sqrt of an exact integer < 2^52 is correctly rounded, so the
    SQL ceiling equals Python's isqrt(n-1)+1 for every practical n;
    assignment rounds the dot-product-identity distance to 9 dp with a
    (d, cid) lexicographic tie-break, and the per-dimension means are
    exact DECIMAL(38,18) sums divided in one double division —
    order-independent in both engines, so the recurrence is
    bit-reproducible. Empty cells keep their previous centroid
    (coalesce), mirroring the Spark dict update."""
    wh = f" WHERE {where}" if where else ""
    parts = [
        f"e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings{wh})",
        f"nc AS (SELECT greatest({min_c}, CAST(ceiling(sqrt(CAST(count(*)"
        f" AS DOUBLE))) AS BIGINT)) AS n FROM e)",
        "cent0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1"
        " AS INT) AS cid, v AS cv\n"
        "          FROM e WHERE vec_id < (SELECT n FROM nc))",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"""asg{i} AS (SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             floor((list_dot_product(e.v, e.v) + list_dot_product(c.cv, c.cv)
                    - 2.0 * list_dot_product(e.v, c.cv)) * 1000000000.0 + 0.5)
               / 1000000000.0 ASC, c.cid ASC) AS rn
    FROM e CROSS JOIN cent{i - 1} c) WHERE rn = 1)"""
        )
        dims = ",\n    ".join(
            f"CAST(sum(CAST(v[{d + 1}] AS DECIMAL(38,18))) AS DOUBLE)"
            f" / count(*)"
            for d in range(dim)
        )
        parts.append(
            f"mean{i} AS (SELECT cid, [\n    {dims}] AS cv"
            f" FROM asg{i} GROUP BY cid)"
        )
        parts.append(
            f"cent{i} AS (SELECT p.cid, coalesce(m.cv, p.cv) AS cv\n"
            f"            FROM cent{i - 1} p"
            f" LEFT JOIN mean{i} m ON p.cid = m.cid)"
        )
    parts.append(
        "cent AS (SELECT cid, cv, list_dot_product(cv, cv) AS cc"
        f" FROM cent{iterations})"
    )
    return ",\n".join(parts)


def _pq_cent_ctes(
    m: int = 8,
    d_sub: int = 8,
    iterations: int = 3,
    n_centroids: int = 16,
    include_e: bool = True,
) -> str:
    """Mirror of text/vector.py::train_pq_codebooks: the per-subspace
    k-means recurrence unrolled like _ivf_cent_ctes, once per
    subspace (same 9-dp rounded assignment, exact decimal means,
    coalesce for empty cells) — all m codebooks recomputed in-engine
    bit-for-bit."""
    parts = (
        ["e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)"]
        if include_e
        else []
    )
    for s in range(m):
        sl = f"list_slice(v, {s * d_sub + 1}, {s * d_sub + d_sub})"
        parts.append(f"sub{s} AS (SELECT vec_id, {sl} AS sv FROM e)")
        parts.append(
            f"c{s}_0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id)"
            f" - 1 AS INT) AS cid, sv AS cv FROM sub{s}"
            f" WHERE vec_id < {n_centroids})"
        )
        for i in range(1, iterations + 1):
            parts.append(
                f"""a{s}_{i} AS (SELECT vec_id, sv, cid FROM (
    SELECT t.vec_id, t.sv, c.cid,
           row_number() OVER (PARTITION BY t.vec_id ORDER BY
             floor((list_dot_product(t.sv, t.sv)
                    + list_dot_product(c.cv, c.cv)
                    - 2.0 * list_dot_product(t.sv, c.cv))
                   * 1000000000.0 + 0.5) / 1000000000.0 ASC,
             c.cid ASC) AS rn
    FROM sub{s} t CROSS JOIN c{s}_{i - 1} c) WHERE rn = 1)"""
            )
            dims = ", ".join(
                f"CAST(sum(CAST(sv[{d + 1}] AS DECIMAL(38,18)))"
                f" AS DOUBLE) / count(*)"
                for d in range(d_sub)
            )
            parts.append(
                f"m{s}_{i} AS (SELECT cid, [{dims}] AS cv"
                f" FROM a{s}_{i} GROUP BY cid)"
            )
            parts.append(
                f"c{s}_{i} AS (SELECT p.cid, coalesce(mm.cv, p.cv) AS cv"
                f" FROM c{s}_{i - 1} p"
                f" LEFT JOIN m{s}_{i} mm ON p.cid = mm.cid)"
            )
        parts.append(
            f"cent_s{s} AS (SELECT cid, cv FROM c{s}_{iterations})"
        )
    return ",\n".join(parts)


def _ann_topk_pq_sql(
    m: int = 8,
    d_sub: int = 8,
    k: int = 10,
    query_ids: tuple = (0, 1, 2, 3, 4),
) -> str:
    """Mirror of text/vector.py::ann_topk_pq: in-engine PQ encode
    (6-dp assignment per subspace) + the same 6-dp distance table +
    exact-decimal ADC sum."""
    d6 = (
        "floor((list_dot_product({q}, {q}) + list_dot_product(c.cv, c.cv)"
        " - 2.0 * list_dot_product({q}, c.cv)) * 1000000.0 + 0.5)"
        " / 1000000.0"
    )
    code_branches = " UNION ALL ".join(
        f"""SELECT vec_id, {s} AS s, cell FROM (
  SELECT t.vec_id, c.cid AS cell,
         row_number() OVER (PARTITION BY t.vec_id ORDER BY
           {d6.format(q='t.sv')} ASC, c.cid ASC) AS rn
  FROM sub{s} t CROSS JOIN cent_s{s} c) WHERE rn = 1"""
        for s in range(m)
    )
    ids = ", ".join(str(i) for i in query_ids)
    qdt_branches = " UNION ALL ".join(
        f"""SELECT {s} AS s, t.vec_id AS query_id, c.cid,
       {d6.format(q='t.sv')} AS d
FROM (SELECT vec_id, sv FROM sub{s} WHERE vec_id IN ({ids})) t
CROSS JOIN cent_s{s} c"""
        for s in range(m)
    )
    return f"""
WITH {_pq_cent_ctes(m=m, d_sub=d_sub)},
codes AS ({code_branches}),
qdt AS ({qdt_branches}),
approx AS (
  SELECT qdt.query_id, codes.vec_id,
         CAST(sum(CAST(qdt.d AS DECIMAL(38,18))) AS DOUBLE) AS ad
  FROM codes JOIN qdt ON codes.s = qdt.s AND codes.cell = qdt.cid
  WHERE codes.vec_id != qdt.query_id
  GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY ad ASC, vec_id ASC) AS rank
      FROM approx)
SELECT CAST(query_id AS INT) AS query_id, vec_id,
       floor(ad * 10000.0 + 0.5) / 10000.0 AS approx_dist,
       CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k}
"""


def _ann_topk_ivfpq_sql(
    m: int = 8,
    d_sub: int = 8,
    k: int = 10,
    nprobe: int = 4,
    query_ids: tuple = (0, 1, 2, 3, 4),
) -> str:
    """Mirror of text/vector.py::ann_topk_ivfpq: the IVF coarse chain
    (_ivf_cent_ctes) supplies cell assignment + probes; the PQ chains
    (_pq_cent_ctes) supply codes + distance tables; ADC runs only
    inside probed cells."""
    d6 = (
        "floor((list_dot_product({q}, {q}) + list_dot_product(c.cv, c.cv)"
        " - 2.0 * list_dot_product({q}, c.cv)) * 1000000.0 + 0.5)"
        " / 1000000.0"
    )
    ids = ", ".join(str(i) for i in query_ids)
    code_branches = " UNION ALL ".join(
        f"""SELECT vec_id, {s} AS s, cell FROM (
  SELECT t.vec_id, c.cid AS cell,
         row_number() OVER (PARTITION BY t.vec_id ORDER BY
           {d6.format(q='t.sv')} ASC, c.cid ASC) AS rn
  FROM sub{s} t CROSS JOIN cent_s{s} c) WHERE rn = 1"""
        for s in range(m)
    )
    qdt_branches = " UNION ALL ".join(
        f"""SELECT {s} AS s, t.vec_id AS query_id, c.cid,
       {d6.format(q='t.sv')} AS d
FROM (SELECT vec_id, sv FROM sub{s} WHERE vec_id IN ({ids})) t
CROSS JOIN cent_s{s} c"""
        for s in range(m)
    )
    return f"""
WITH {_ivf_cent_ctes()},
{_pq_cent_ctes(m=m, d_sub=d_sub, include_e=False)},
cd AS (SELECT e.vec_id, e.v, c.cid,
             floor((list_dot_product(e.v, e.v) + c.cc
                    - 2.0 * list_dot_product(e.v, c.cv)) * 1000000.0 + 0.5)
               / 1000000.0 AS d6
      FROM e CROSS JOIN cent c),
assign AS (SELECT vec_id, cid AS cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY d6 ASC, cid ASC) AS rn FROM cd)
  WHERE rn = 1),
probes AS (SELECT vec_id AS query_id, cid AS cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY d6 ASC, cid ASC) AS rn
    FROM cd WHERE vec_id IN ({ids}))
  WHERE rn <= {nprobe}),
codes AS ({code_branches}),
qdt AS ({qdt_branches}),
cand AS (SELECT DISTINCT p.query_id, a.vec_id
         FROM assign a JOIN probes p
           ON a.cell = p.cell AND a.vec_id != p.query_id),
approx AS (
  SELECT cand.query_id, cand.vec_id,
         CAST(sum(CAST(qdt.d AS DECIMAL(38,18))) AS DOUBLE) AS ad
  FROM cand
  JOIN codes ON codes.vec_id = cand.vec_id
  JOIN qdt ON qdt.s = codes.s AND qdt.cid = codes.cell
          AND qdt.query_id = cand.query_id
  GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY ad ASC, vec_id ASC) AS rank
      FROM approx)
SELECT query_id, vec_id,
       floor(ad * 10000.0 + 0.5) / 10000.0 AS approx_dist,
       CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k}
"""


def _semantic_dedup_sql(
    threshold: float = 0.4,
    leaf_tables: int = 2,
    target_cell: int = 32,
    max_planes: int = 8,
    dim: int = 64,
) -> str:
    """Mirror of text/vector.py::semantic_dedup over the TRAINED
    codebook (threshold 0.4) WITH in-cell sign-LSH banding: training
    recurrence from _ivf_cent_ctes, the same 6-dp dist2 +
    lexicographic argmin assignment, then the derive_leaf_planes
    integer CASE chain computed IN-SQL from count(*) (cell_pop <=
    target << p — exact integer comparisons on both engines), the
    identical md5-derived hyperplane literals as Spark's lsh_bucket
    (each of max_planes sign terms masked by p < planes so the bucket
    uses exactly the derived band count), and the rounded-cosine
    keep-lowest-id drop rule over pairs sharing (table, cell,
    bucket)."""
    plane_cases = " ".join(
        f"WHEN cp <= {target_cell << p} THEN {p}" for p in range(max_planes)
    )
    per_table = []
    for t in range(leaf_tables):
        terms = " + ".join(
            f"CASE WHEN {p} < (SELECT p FROM nleaf) AND "
            f"list_dot_product(v, {_plane_literal(t, p, dim)}) >= 0 "
            f"THEN {2**p} ELSE 0 END"
            for p in range(max_planes)
        )
        per_table.append(
            f"SELECT vec_id, nv, cell, {t} AS tbl, ({terms}) AS bucket"
            " FROM assign"
        )
    buckets = " UNION ALL ".join(per_table)
    return f"""
WITH {_ivf_cent_ctes()},
nleaf AS (SELECT CASE {plane_cases} ELSE {max_planes} END AS p FROM (
            SELECT ((SELECT count(*) FROM e) + (SELECT n FROM nc) - 1)
                     // (SELECT n FROM nc) AS cp)),
d AS (SELECT e.vec_id, e.v, c.cid,
             floor((list_dot_product(e.v, e.v) + c.cc
                    - 2.0 * list_dot_product(e.v, c.cv)) * 1000000.0 + 0.5)
               / 1000000.0 AS d6
      FROM e CROSS JOIN cent c),
assign AS (SELECT vec_id, v,
                  list_transform(v, x -> x / sqrt(list_dot_product(v, v)))
                    AS nv,
                  CAST(cid AS INT) AS cell
           FROM (SELECT *, row_number() OVER (
                     PARTITION BY vec_id ORDER BY d6 ASC, cid ASC) AS rn
                 FROM d)
           WHERE rn = 1),
bk AS ({buckets}),
tot AS (SELECT cell, count(*) AS n_vectors FROM assign GROUP BY 1),
drp AS (SELECT cell, count(*) AS n_dropped FROM (
          SELECT DISTINCT b.cell, b.vec_id
          FROM bk a JOIN bk b
            ON a.tbl = b.tbl AND a.cell = b.cell AND a.bucket = b.bucket
           AND a.vec_id < b.vec_id
          WHERE floor(list_dot_product(a.nv, b.nv) * 1000000.0 + 0.5)
                  / 1000000.0 >= {threshold})
        GROUP BY 1)
SELECT t.cell, CAST(t.n_vectors AS BIGINT) AS n_vectors,
       CAST(coalesce(d.n_dropped, 0) AS BIGINT) AS n_dropped,
       CAST(t.n_vectors - coalesce(d.n_dropped, 0) AS BIGINT) AS n_kept
FROM tot t LEFT JOIN drp d ON t.cell = d.cell
"""


def _ivf_index_append_sql() -> str:
    """Mirror of q_ivf_index_append: codebook trained on the
    historical slice only (vec_id % 4 != 0 — the _ivf_cent_ctes
    recurrence over the filtered corpus), then ONE 6-dp argmin
    assignment relation over the full corpus split into baseline/new
    counts, a full-outer merge, and the two exact-integer policy
    flags (hot: n_total * n_cells > 2 * grand_total; retrain_due:
    2 * total_new >= total_baseline)."""
    return f"""
WITH {_ivf_cent_ctes(where="vec_id % 4 != 0")},
eall AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
d AS (SELECT eall.vec_id, c.cid,
             floor((list_dot_product(eall.v, eall.v) + c.cc
                    - 2.0 * list_dot_product(eall.v, c.cv)) * 1000000.0
                   + 0.5) / 1000000.0 AS d6
      FROM eall CROSS JOIN cent c),
asg AS (SELECT vec_id, CAST(cid AS INT) AS cell FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id
                                       ORDER BY d6 ASC, cid ASC) AS rn
          FROM d) WHERE rn = 1),
base AS (SELECT cell, count(*) AS n_baseline FROM asg
         WHERE vec_id % 4 != 0 GROUP BY 1),
newc AS (SELECT cell, count(*) AS n_new FROM asg
         WHERE vec_id % 4 = 0 GROUP BY 1),
merged AS (SELECT coalesce(b.cell, n.cell) AS cell,
                  coalesce(b.n_baseline, 0) AS n_baseline,
                  coalesce(n.n_new, 0) AS n_new
           FROM base b FULL OUTER JOIN newc n ON b.cell = n.cell),
tot AS (SELECT sum(n_baseline) AS tb, sum(n_new) AS tn,
               sum(n_baseline + n_new) AS ta FROM merged),
k AS (SELECT count(*) AS n_cells FROM cent)
SELECT cell,
       CAST(n_baseline AS BIGINT) AS n_baseline,
       CAST(n_new AS BIGINT) AS n_new,
       CAST(n_baseline + n_new AS BIGINT) AS n_total,
       ((n_baseline + n_new) * (SELECT n_cells FROM k))
         > 2 * (SELECT ta FROM tot) AS hot,
       (2 * (SELECT tn FROM tot)) >= (SELECT tb FROM tot) AS retrain_due
FROM merged
"""


def _ann_topk_ivf_sql() -> str:
    """Mirror of text/vector.py::ann_topk_ivf over the TRAINED codebook:
    training recurrence from _ivf_cent_ctes, then 6-dp assignment,
    nprobe=4 nearest cells per query, exact cosine within probed
    cells."""
    return f"""
WITH {_ivf_cent_ctes()},
d AS (SELECT e.vec_id, e.v, c.cid,
             floor((list_dot_product(e.v, e.v) + c.cc
                    - 2.0 * list_dot_product(e.v, c.cv)) * 1000000.0 + 0.5)
               / 1000000.0 AS d6
      FROM e CROSS JOIN cent c),
assign AS (SELECT vec_id, v, cid AS cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY d6 ASC, cid ASC) AS rn FROM d)
  WHERE rn = 1),
probes AS (SELECT vec_id AS query_id, v AS qv, cid AS cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY d6 ASC, cid ASC) AS rn
    FROM d WHERE vec_id IN (0, 1, 2, 3, 4))
  WHERE rn <= 4),
cand AS (SELECT p.query_id, a.vec_id, p.qv, a.v
         FROM assign a JOIN probes p
           ON a.cell = p.cell AND a.vec_id != p.query_id),
s AS (SELECT query_id, vec_id,
             floor((list_dot_product(qv, v) /
                    (sqrt(list_dot_product(qv, qv)) *
                     sqrt(list_dot_product(v, v)))) * 1000000000.0 + 0.5)
               / 1000000000.0 AS cos_sim
      FROM cand),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, vec_id ASC) AS rank
      FROM s)
SELECT query_id, vec_id,
       floor((cos_sim) * 10000.0 + 0.5) / 10000.0 AS cos_sim, rank
FROM r WHERE rank <= 10
"""


def _ann_brute_sql(query_ids: str = "0, 1, 2, 3, 4", k: int = 10) -> str:
    """Generated mirror of text/vector.py::ann_topk_bruteforce."""
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN ({query_ids})),
s AS (SELECT qid AS query_id, e.vec_id,
             floor((list_dot_product(qv, v) /
                   (sqrt(list_dot_product(qv, qv)) *
                    sqrt(list_dot_product(v, v)))) * 1000000000.0 + 0.5) / 1000000000.0 AS cos_sim
      FROM e CROSS JOIN q WHERE e.vec_id != qid),
r AS (SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
      FROM s)
SELECT query_id, vec_id, floor((cos_sim) * 10000.0 + 0.5) / 10000.0 AS cos_sim, rank
FROM r WHERE rank <= {k}
"""


def _rrf_sql(k: int = 10, depth: int = 20, rrf_k: int = 60) -> str:
    """Generated mirror of q_hybrid_rrf_retrieval: the _bm25_sql and
    _ann_brute_sql mirrors as nested CTEs, fused with the same
    1/(rrf_k + rank) two-term double sum the Spark plan computes
    (one division of exact integers per system + one IEEE addition,
    bit-identical on both engines)."""
    ids = ", ".join(str(q) for q in sorted(_BM25_QUERIES))
    return f"""
WITH lex AS ({_bm25_sql(_BM25_QUERIES, k=depth)}),
sem AS ({_ann_brute_sql(ids, k=depth)}),
f AS (
  SELECT coalesce(l.query_id, s.query_id) AS query_id,
         coalesce(l.doc_id, s.vec_id) AS doc_id,
         l.rank AS lex_rank, s.rank AS sem_rank
  FROM lex l FULL OUTER JOIN sem s
    ON l.query_id = s.query_id AND l.doc_id = s.vec_id),
sc AS (
  SELECT query_id, doc_id,
         coalesce(CAST(1.0 AS DOUBLE) / ({rrf_k} + lex_rank), CAST(0.0 AS DOUBLE))
       + coalesce(CAST(1.0 AS DOUBLE) / ({rrf_k} + sem_rank), CAST(0.0 AS DOUBLE)) AS s,
         lex_rank, sem_rank
  FROM f),
r AS (SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY s DESC, doc_id ASC) AS rank
      FROM sc)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(doc_id AS BIGINT) AS doc_id,
       floor(s * 1000000.0 + 0.5) / 1000000.0 AS rrf_score,
       CAST(lex_rank AS BIGINT) AS lex_rank,
       CAST(sem_rank AS BIGINT) AS sem_rank,
       CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k}
"""


def _ann_recall_sql(k: int = 10) -> str:
    """Generated mirror of text/vector.py::ann_recall_at_k: the exact
    and LSH mirrors intersected per query."""
    return f"""
WITH exact AS ({_ann_brute_sql(k=k)}),
approx AS ({_lsh_sql(k=k)}),
hits AS (SELECT e.query_id, count(*) AS n_hit
         FROM exact e JOIN approx a
           ON e.query_id = a.query_id AND e.vec_id = a.vec_id
         GROUP BY 1),
pq AS (SELECT query_id, count(*) AS n_exact FROM exact GROUP BY 1)
SELECT pq.query_id,
       CAST(n_exact AS BIGINT) AS n_exact,
       CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit,
       CAST(coalesce(n_hit, 0) AS DOUBLE) / {k} AS recall
FROM pq LEFT JOIN hits ON pq.query_id = hits.query_id
"""


# MinHash-LSH candidate pairs closed under transitivity (shared by the
# dup_clusters and cluster_safe_split oracles): recursive reachability
# mirror of text/dedup.py::dedup_clusters' min-label propagation.
_CLUSTER_CTES = """
sig AS (
  SELECT doc_id, b,
         min(substr(md5(CAST(b // 4 AS VARCHAR) || ':' || shingle),
                    1 + 8 * (b % 4), 8)) AS s
  FROM shingles, (SELECT unnest(generate_series(0, 7)) AS b)
  GROUP BY 1, 2),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sig a JOIN sig b ON a.b = b.b AND a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2 HAVING count(*) >= 2),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM cand
  UNION ALL
  SELECT doc_b, doc_a FROM cand),
reach(id, r) AS (
  SELECT src, src FROM edges GROUP BY 1, 2
  UNION
  SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.id)
"""


def _cluster_split_sql(fractions: dict[str, float]) -> str:
    """Generated mirror of text/dedup.py::cluster_safe_split: the
    dup_clusters reachability CTEs, then the same md5-prefix range
    assignment functions/sampling.py::split_column bakes into the
    Spark plan (thresholds derived from the SAME cumulative-fraction
    arithmetic)."""
    from aproximacion_1_etl_spark.functions.sampling import rate_threshold

    key = "CAST(coalesce(cl.cluster_id, d.doc_id) AS VARCHAR)"
    names = list(fractions)
    cases, cum = [], 0.0
    for name in names[:-1]:
        cum += fractions[name]
        cases.append(
            f"WHEN substr(md5({key}), 1, 4) < '{rate_threshold(cum)}' "
            f"THEN '{name}'"
        )
    case = "CASE " + " ".join(cases) + f" ELSE '{names[-1]}' END"
    return (
        "WITH RECURSIVE "
        + _SHINGLES_SQL.strip()
        + ","
        + _CLUSTER_CTES
        + f""",
cl AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id)
SELECT d.doc_id,
       CAST(coalesce(cl.cluster_id, d.doc_id) AS BIGINT) AS group_key,
       {case} AS split
FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id
"""
    )


def _bpe_train_sql(n_merges: int = 8) -> str:
    """Generated mirror of text/analysis.py::bpe_train_merges: the
    training loop unrolled into one CTE chain per round — pair counts
    over the frequency-weighted distinct-word relation, deterministic
    top-1, and the same greedy left-to-right merge fold (list_reduce
    over singleton-wrapped symbols == F.aggregate from an empty
    accumulator, verified element-for-element). Counts are exact
    integer sums, so the whole training trajectory value-checks."""
    parts = [
        """
WITH w0 AS (
  SELECT list_transform(generate_series(1, len(word)),
                        i -> substr(word, i, 1)) AS syms,
         cnt
  FROM (SELECT word, count(*) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS word
              FROM documents)
        WHERE len(word) >= 2 GROUP BY 1))"""
    ]
    for i in range(1, n_merges + 1):
        prev = f"w{i - 1}"
        parts.append(f""",
pc{i} AS (
  SELECT syms[i] AS p1, syms[i+1] AS p2, sum(cnt) AS n
  FROM (SELECT syms, cnt, unnest(generate_series(1, len(syms) - 1)) AS i
        FROM {prev} WHERE len(syms) >= 2)
  GROUP BY 1, 2),
top{i} AS (
  SELECT p1, p2, n FROM (
    SELECT *, row_number() OVER (ORDER BY n DESC, p1 ASC, p2 ASC) AS rn
    FROM pc{i}) WHERE rn = 1),
w{i} AS (
  SELECT list_reduce(list_transform(syms, s -> [s]),
           (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = t.p1
                                 AND x[1] = t.p2
                            THEN list_append(
                                   list_slice(acc, 1, len(acc) - 1),
                                   t.p1 || t.p2)
                            ELSE list_concat(acc, x) END) AS syms,
         cnt
  FROM {prev}, top{i} t WHERE len(syms) >= 2)""")
    union = "\nUNION ALL\n".join(
        f"SELECT {i} AS step, p1, p2, n FROM top{i}"
        for i in range(1, n_merges + 1)
    )
    parts.append(f"""
SELECT CAST(step AS INT) AS step, p1, p2, CAST(n AS BIGINT) AS n
FROM ({union})
""")
    return "".join(parts)


def _bpe_encode_sql(n_merges: int = 8) -> str:
    """Generated mirror of text/analysis.py::bpe_encode composed with
    its trainer: re-derives the same merge table (the training CTE
    chain), then applies each rule to EVERY word of the corpus with the
    same greedy fold, and rolls token budgets up per document. The
    merge rules the Spark plan bakes in as literals are recomputed
    in-engine here, so a drift anywhere in the train->apply pipeline
    breaks value parity."""
    train = _bpe_train_sql(n_merges)
    ctes = train[: train.rindex("\nSELECT CAST(step AS INT)")]
    parts = [
        ctes,
        """,
e0 AS (
  SELECT doc_id, len(word) AS wlen,
         list_transform(generate_series(1, len(word)),
                        i -> substr(word, i, 1)) AS syms
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents)
  WHERE len(word) >= 1)""",
    ]
    for i in range(1, n_merges + 1):
        parts.append(f""",
e{i} AS (
  SELECT doc_id, wlen,
         list_reduce(list_transform(syms, s -> [s]),
           (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = t.p1
                                 AND x[1] = t.p2
                            THEN list_append(
                                   list_slice(acc, 1, len(acc) - 1),
                                   t.p1 || t.p2)
                            ELSE list_concat(acc, x) END) AS syms
  FROM e{i - 1} LEFT JOIN top{i} t ON TRUE)""")
    parts.append(f"""
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(wlen) AS BIGINT) AS n_chars,
       CAST(sum(len(syms)) AS BIGINT) AS n_tokens,
       floor(CAST(sum(wlen) AS DOUBLE) / sum(len(syms)) * 10000.0 + 0.5)
         / 10000.0 AS compression
FROM e{n_merges} GROUP BY 1
""")
    return "".join(parts)


# quality_score mirror, shared by the funnel and outlier oracles
# (copied operand-for-operand from the text_profile mirror, incl. the
# floor-round that precedes any threshold comparison)
_QUALITY_SQL = """floor((0.25 * (CASE WHEN length(text) BETWEEN 100 AND 20000
                     THEN 1.0 ELSE 0.0 END)
      + 0.25 * (1.0 - len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) * 1.0
                 / greatest(length(text), 1))
      + 0.25 * (len(regexp_extract_all(text, '[A-Za-z]')) * 1.0
                 / greatest(length(text), 1))
      + 0.25 * (CASE WHEN length(text) * 1.0 /
                       greatest(len(regexp_split_to_array(trim(text),
                                                          '\\s+')), 1)
                       BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.0 END))
        * 10000.0 + 0.5) / 10000.0"""


def _lang_hits_sql() -> str:
    """Language-marker hit columns generated from the SAME LANG_MARKERS
    constant the Spark lang_id() bakes in (shared by the funnel and
    confusion-matrix oracles)."""
    from aproximacion_1_etl_spark.text.analysis import LANG_MARKERS

    hits = []
    for lang, words in LANG_MARKERS.items():
        terms = " +\n     ".join(
            "CASE WHEN contains(' ' || lower(text) || ' ', ' "
            + w
            + " ') THEN 1 ELSE 0 END"
            for w in words
        )
        hits.append(f"({terms}) AS {lang}_h")
    return ",\n    ".join(hits)


# the lang_id() CASE mirror over the *_h hit columns
_LANG_PRED_SQL = """CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
       WHEN greatest(es_h, de_h, fr_h, en_h) >= 1
            AND es_h = greatest(es_h, de_h, fr_h, en_h) THEN 'es'
       WHEN greatest(es_h, de_h, fr_h, en_h) >= 1
            AND de_h = greatest(es_h, de_h, fr_h, en_h) THEN 'de'
       WHEN greatest(es_h, de_h, fr_h, en_h) >= 1
            AND fr_h = greatest(es_h, de_h, fr_h, en_h) THEN 'fr'
       WHEN greatest(es_h, de_h, fr_h, en_h) >= 1
            AND en_h = greatest(es_h, de_h, fr_h, en_h) THEN 'en'
       ELSE 'und' END"""


def _lang_confusion_sql() -> str:
    """Generated mirror of queries.q_lang_confusion."""
    return f"""
WITH base AS (
  SELECT lang, text,
    {_lang_hits_sql()}
  FROM documents),
p AS (SELECT lang AS true_lang,
             {_LANG_PRED_SQL} AS pred_lang
      FROM base),
cm AS (SELECT true_lang, pred_lang, count(*) AS n FROM p GROUP BY 1, 2),
t AS (SELECT true_lang, sum(n) AS n_true FROM cm GROUP BY 1)
SELECT cm.true_lang, cm.pred_lang, CAST(cm.n AS BIGINT) AS n,
       floor(CAST(cm.n AS DOUBLE) / t.n_true * 10000.0 + 0.5) / 10000.0
         AS frac_of_true
FROM cm JOIN t ON cm.true_lang = t.true_lang
"""


def _quality_outliers_sql() -> str:
    """Generated mirror of queries.q_quality_outliers (quantile_disc ==
    percentile_disc for exact engine parity)."""
    return f"""
WITH d AS (SELECT doc_id, source, {_QUALITY_SQL} AS q FROM documents),
med AS (SELECT source, quantile_disc(q, 0.5) AS med FROM d GROUP BY 1),
dev AS (SELECT doc_id, d.source, q, med, abs(q - med) AS adev
        FROM d JOIN med ON d.source = med.source),
mad AS (SELECT source, quantile_disc(adev, 0.5) AS mad
        FROM dev GROUP BY 1)
SELECT doc_id, dev.source,
       floor(q * 10000.0 + 0.5) / 10000.0 AS q,
       floor(med * 10000.0 + 0.5) / 10000.0 AS source_median,
       floor(adev * 10000.0 + 0.5) / 10000.0 AS abs_dev
FROM dev JOIN mad ON dev.source = mad.source
WHERE adev > 3.0 * greatest(mad, 0.0001)
"""


def _funnel_sql() -> str:
    """Generated mirror of queries.q_corpus_funnel (shares
    _lang_hits_sql and _QUALITY_SQL with the confusion/outlier
    oracles)."""
    hits_sql = _lang_hits_sql()
    quality = _QUALITY_SQL
    return f"""
WITH base AS (
  SELECT doc_id, text,
    {hits_sql}
  FROM documents),
fl AS (
  SELECT (length(text) >= 100) AS len_ok,
         (regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]')
          OR greatest(es_h, de_h, fr_h, en_h) >= 1) AS lang_ok,
         ({quality} >= 0.5) AS quality_ok,
         (row_number() OVER (
            PARTITION BY sha256(trim(regexp_replace(lower(text),
                                                    '\\s+', ' ', 'g')))
            ORDER BY doc_id) = 1) AS first_of_content
  FROM base),
a AS (
  SELECT count(*) AS raw,
         sum(CASE WHEN len_ok THEN 1 ELSE 0 END) AS s1,
         sum(CASE WHEN len_ok AND lang_ok THEN 1 ELSE 0 END) AS s2,
         sum(CASE WHEN len_ok AND lang_ok AND quality_ok
                  THEN 1 ELSE 0 END) AS s3,
         sum(CASE WHEN len_ok AND lang_ok AND quality_ok
                       AND first_of_content THEN 1 ELSE 0 END) AS s4
  FROM fl)
SELECT 'raw' AS stage, CAST(raw AS BIGINT) AS n_docs FROM a
UNION ALL SELECT 'length_band', CAST(s1 AS BIGINT) FROM a
UNION ALL SELECT 'known_lang', CAST(s2 AS BIGINT) FROM a
UNION ALL SELECT 'quality_floor', CAST(s3 AS BIGINT) FROM a
UNION ALL SELECT 'content_unique', CAST(s4 AS BIGINT) FROM a
"""


def _kmeans_profile_sql() -> str:
    """Mirror of q_kmeans_cluster_profile: the in-engine training
    recurrence (_ivf_cent_ctes), the same 6-dp argmin assignment, then
    decimal-mean distance and deterministic dominant label per cell."""
    return f"""
WITH {_ivf_cent_ctes()},
d AS (SELECT e.vec_id, c.cid,
             floor((list_dot_product(e.v, e.v) + c.cc
                    - 2.0 * list_dot_product(e.v, c.cv)) * 1000000.0 + 0.5)
               / 1000000.0 AS d6
      FROM e CROSS JOIN cent c),
assign AS (SELECT vec_id, cid AS cell, d6 FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY d6 ASC, cid ASC) AS rn FROM d)
  WHERE rn = 1),
al AS (SELECT a.vec_id, a.cell, a.d6, em.label
       FROM assign a JOIN embeddings em ON a.vec_id = em.vec_id),
st AS (SELECT cell, count(*) AS n,
              CAST(sum(CAST(d6 AS DECIMAL(38,18))) AS DOUBLE) / count(*)
                AS md
       FROM al GROUP BY 1),
lb AS (SELECT cell, label AS top_label, n_l AS top_label_n FROM (
    SELECT cell, label, count(*) AS n_l,
           row_number() OVER (PARTITION BY cell
                              ORDER BY count(*) DESC, label ASC) AS rn
    FROM al GROUP BY 1, 2) WHERE rn = 1)
SELECT CAST(st.cell AS INT) AS cell,
       CAST(st.n AS BIGINT) AS n,
       floor(st.md * 1000000.0 + 0.5) / 1000000.0 AS mean_dist,
       lb.top_label,
       CAST(lb.top_label_n AS BIGINT) AS top_label_n
FROM st JOIN lb ON st.cell = lb.cell
"""


def _lsh_multiprobe_sql(
    query_ids: str = "0, 1, 2, 3, 4",
    k: int = 10,
    planes: int = 4,
    tables: int = 1,
    dim: int = 64,
) -> str:
    """Generated mirror of text/vector.py::ann_topk_lsh_multiprobe —
    the _lsh_sql bucketing plus the query-side 1-bit-flip probe set
    (xor against {0, 1, 2, 4, ...})."""
    per_table = []
    for t in range(tables):
        terms = " + ".join(
            f"CASE WHEN list_dot_product(v, {_plane_literal(t, p, dim)}) >= 0 "
            f"THEN {2**p} ELSE 0 END"
            for p in range(planes)
        )
        per_table.append(
            f"SELECT vec_id, v, {t} AS tbl, ({terms}) AS bucket FROM e"
        )
    buckets = " UNION ALL ".join(per_table)
    flips = ", ".join(["0"] + [str(2**p) for p in range(planes)])
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
bk AS ({buckets}),
q AS (SELECT vec_id AS qid, v AS qv, tbl,
             xor(bucket, f.flip) AS bucket
      FROM bk, (SELECT unnest([{flips}]) AS flip) f
      WHERE vec_id IN ({query_ids})),
cand AS (SELECT DISTINCT q.qid, b.vec_id
         FROM bk b JOIN q ON b.tbl = q.tbl AND b.bucket = q.bucket
         WHERE b.vec_id != q.qid),
s AS (SELECT c.qid AS query_id, c.vec_id,
             floor((list_dot_product(qe.v, ce.v) /
                   (sqrt(list_dot_product(qe.v, qe.v)) *
                    sqrt(list_dot_product(ce.v, ce.v)))) * 1000000000.0 + 0.5) / 1000000000.0 AS cos_sim
      FROM cand c
      JOIN e ce ON c.vec_id = ce.vec_id
      JOIN e qe ON c.qid = qe.vec_id),
r AS (SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
      FROM s)
SELECT query_id, vec_id, floor((cos_sim) * 10000.0 + 0.5) / 10000.0 AS cos_sim, rank
FROM r WHERE rank <= {k}
"""


def _rerank_sql() -> str:
    """Generated mirror of q_rerank_crossencoder: the _rrf_sql mirror
    as a CTE, joined to text, re-scored by the same md5 stand-in the
    pandas UDF computes (identical input string construction), ranked
    by (key desc, doc asc)."""
    return f"""
WITH fused AS ({_rrf_sql()}),
j AS (SELECT f.query_id, f.doc_id,
             substr(md5(CAST(f.query_id AS VARCHAR) || ':' ||
                        CAST(f.doc_id AS VARCHAR) || ':' ||
                        substr(coalesce(d.text, ''), 1, 16)), 1, 8)
               AS ce_key
      FROM fused f LEFT JOIN documents d ON f.doc_id = d.doc_id)
SELECT query_id, doc_id, ce_key,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY ce_key DESC, doc_id ASC)
            AS BIGINT) AS rank
FROM j
"""


def _corpus_release_sql(fractions: dict[str, float]) -> str:
    """Generated mirror of queries.q_corpus_release: the funnel-stage
    predicates (shared _lang_hits_sql / _QUALITY_SQL), exact-dedup
    keep-first window, the recursive cluster CTEs REBASED onto the
    clean survivor set (shingle fragment retargeted from documents to
    clean), the same md5-threshold split ranges, and the per-split
    manifest aggregation."""
    from aproximacion_1_etl_spark.functions.sampling import rate_threshold

    key = "CAST(coalesce(cl.cluster_id, c.doc_id) AS VARCHAR)"
    names = list(fractions)
    cases, cum = [], 0.0
    for name in names[:-1]:
        cum += fractions[name]
        cases.append(
            f"WHEN substr(md5({key}), 1, 4) < '{rate_threshold(cum)}' "
            f"THEN '{name}'"
        )
    case = "CASE " + " ".join(cases) + f" ELSE '{names[-1]}' END"
    shingles_clean = _SHINGLES_SQL.strip().replace(
        "FROM documents", "FROM clean"
    )
    return (
        f"""WITH RECURSIVE base AS (
  SELECT doc_id, text, n_chars,
    {_lang_hits_sql()}
  FROM documents),
fl AS (
  SELECT doc_id, text, n_chars,
         (length(text) >= 100) AS len_ok,
         (regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]')
          OR greatest(es_h, de_h, fr_h, en_h) >= 1) AS lang_ok,
         ({_QUALITY_SQL} >= 0.5) AS quality_ok,
         (row_number() OVER (
            PARTITION BY sha256(trim(regexp_replace(lower(text),
                                                    '\\s+', ' ', 'g')))
            ORDER BY doc_id) = 1) AS first_of_content
  FROM base),
clean AS (
  SELECT doc_id, text, n_chars FROM fl
  WHERE len_ok AND lang_ok AND quality_ok AND first_of_content),
"""
        + shingles_clean
        + ","
        + _CLUSTER_CTES
        + f""",
cl AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
sp AS (
  SELECT c.doc_id, c.text, c.n_chars, {case} AS split
  FROM clean c LEFT JOIN cl ON c.doc_id = cl.doc_id)
SELECT split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)
         AS n_tokens,
       CAST(sum(n_chars) AS BIGINT) AS n_chars
FROM sp GROUP BY 1
"""
    )


def _pca_power_sql(dim: int = 64, iterations: int = 64) -> str:
    """Unrolled power-iteration replay of text/vector.pca_top_component:
    decimal-summed Gram, then per-iteration matvec + IEEE normalize
    with the same 9-dp snap, so both engines walk the identical
    recurrence (summation-order differences vanish at each snap)."""
    ctes = [
        f"""g AS MATERIALIZED (
  SELECT s.i, s.j, CAST(sum(CAST(s.p AS DECIMAL(38,18))) AS DOUBLE) AS g
  FROM (SELECT CAST(a.i AS INT) AS i, CAST(b.j AS INT) AS j,
               CAST(embedding[a.i + 1] AS DOUBLE)
               * CAST(embedding[b.j + 1] AS DOUBLE) AS p
        FROM embeddings, range({dim}) a(i), range({dim}) b(j)) s
  GROUP BY 1, 2)""",
        f"v0 AS (SELECT CAST(t.i AS INT) AS j, CAST(0.125 AS DOUBLE) AS v"
        f" FROM range({dim}) t(i))",
    ]
    prev = "v0"
    for k in range(1, iterations + 1):
        ctes.append(
            f"w{k} AS MATERIALIZED (SELECT g.i AS j, sum(g.g * {prev}.v) AS w"
            f" FROM g JOIN {prev} ON g.j = {prev}.j GROUP BY 1)"
        )
        ctes.append(f"n{k} AS MATERIALIZED (SELECT sqrt(sum(w * w)) AS nrm FROM w{k})")
        ctes.append(
            f"v{k} AS MATERIALIZED (SELECT j, floor(w / nrm * 1000000000.0 + 0.5)"
            f" / 1000000000.0 AS v FROM w{k}, n{k})"
        )
        prev = f"v{k}"
    ctes.append(
        f"wf AS MATERIALIZED (SELECT g.i AS j, sum(g.g * {prev}.v) AS w"
        f" FROM g JOIN {prev} ON g.j = {prev}.j GROUP BY 1)"
    )
    ctes.append(
        f"eig AS (SELECT sum({prev}.v * wf.w) AS ev"
        f" FROM {prev} JOIN wf ON {prev}.j = wf.j)"
    )
    ctes.append("tr AS (SELECT sum(g) AS t FROM g WHERE i = j)")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT CAST({prev}.j + 1 AS INT) AS dim,
       floor({prev}.v * 1000000.0 + 0.5) / 1000000.0 AS loading,
       floor(eig.ev * 10000.0 + 0.5) / 10000.0 AS eigenvalue,
       floor(eig.ev / tr.t * 1000000.0 + 0.5) / 1000000.0 AS var_share
FROM {prev}, eig, tr
"""
    )


def _ols_event_sql() -> str:
    """Mirror of q_ols_event_model: identical det3 expression
    structure so the Cramer solve is bit-for-bit IEEE-equal."""
    det = (
        "(nd*(shhd*sddd - shdd*shdd) - shd_*(shd_*sddd - shdd*sdd_)"
        " + sdd_*(shd_*shdd - shhd*sdd_))"
    )
    det0 = (
        "(syd*(shhd*sddd - shdd*shdd) - shd_*(shyd*sddd - shdd*sdyd)"
        " + sdd_*(shyd*shdd - shhd*sdyd))"
    )
    det1 = (
        "(nd*(shyd*sddd - shdd*sdyd) - syd*(shd_*sddd - shdd*sdd_)"
        " + sdd_*(shd_*sdyd - shyd*sdd_))"
    )
    det2 = (
        "(nd*(shhd*sdyd - shyd*shdd) - shd_*(shd_*sdyd - shyd*sdd_)"
        " + syd*(shd_*shdd - shhd*sdd_))"
    )
    return f"""
WITH f AS (
  SELECT value AS y, hour(ts) AS h,
         ((datediff('day', DATE '1970-01-05', CAST(ts AS DATE)) % 7) + 7)
           % 7 AS d
  FROM events),
a AS (
  SELECT count(*) AS n, sum(h) AS sh, sum(d) AS sd,
         sum(h * h) AS shh, sum(d * d) AS sdd, sum(h * d) AS shd,
         sum(CAST(y AS DECIMAL(38,18))) AS sy,
         sum(CAST(y * h AS DECIMAL(38,18))) AS shy,
         sum(CAST(y * d AS DECIMAL(38,18))) AS sdy,
         sum(CAST(y * y AS DECIMAL(38,18))) AS syy
  FROM f),
m AS (
  SELECT CAST(n AS BIGINT) AS n,
         CAST(n AS DOUBLE) AS nd, CAST(sh AS DOUBLE) AS shd_,
         CAST(sd AS DOUBLE) AS sdd_, CAST(shh AS DOUBLE) AS shhd,
         CAST(sdd AS DOUBLE) AS sddd, CAST(shd AS DOUBLE) AS shdd,
         CAST(sy AS DOUBLE) AS syd, CAST(shy AS DOUBLE) AS shyd,
         CAST(sdy AS DOUBLE) AS sdyd, CAST(syy AS DOUBLE) AS syyd
  FROM a),
s AS (
  SELECT n, syd, shyd, sdyd, syyd, nd,
         {det0} / {det} AS w0,
         {det1} / {det} AS w1,
         {det2} / {det} AS w2
  FROM m)
SELECT n,
       floor(w0 * 1000000.0 + 0.5) / 1000000.0 AS w_intercept,
       floor(w1 * 1000000.0 + 0.5) / 1000000.0 AS w_hour,
       floor(w2 * 1000000.0 + 0.5) / 1000000.0 AS w_dow,
       floor((1.0 - (syyd - w0*syd - w1*shyd - w2*sdyd)
              / (syyd - syd*syd/nd)) * 1000000.0 + 0.5) / 1000000.0 AS r2,
       floor(sqrt((syyd - w0*syd - w1*shyd - w2*sdyd) / nd)
             * 10000.0 + 0.5) / 10000.0 AS rmse
FROM s
"""


def _logreg_ctes(iterations: int = 12) -> tuple[str, str]:
    """The shared feature + GD-weight CTE chain (f, w0i, g1..wN):
    returns (ctes_sql, final_weight_cte_name). Used by the training
    oracle and both model-evaluation oracles so all three replay the
    identical recurrence."""
    zexpr = (
        "(0.0 + w.w0 * x0 + w.w1 * x1 + w.w2 * x2 + w.w3 * x3)"
    )
    ctes = [
        """f AS MATERIALIZED (
  SELECT vec_id,
         CASE WHEN label < 5 THEN 1.0 ELSE 0.0 END AS y,
         CAST(1.0 AS DOUBLE) AS x0,
         CAST(embedding[1] AS DOUBLE) AS x1,
         CAST(embedding[2] AS DOUBLE) AS x2,
         CAST(embedding[3] AS DOUBLE) AS x3
  FROM embeddings)""",
        "w0i AS (SELECT CAST(0.0 AS DOUBLE) AS w0, CAST(0.0 AS DOUBLE)"
        " AS w1, CAST(0.0 AS DOUBLE) AS w2, CAST(0.0 AS DOUBLE) AS w3)",
    ]
    prev = "w0i"
    for k in range(1, iterations + 1):
        gsum = ", ".join(
            f"CAST(sum(CAST(((1.0 / (1.0 + exp(-{zexpr}))) - y) * x{j}"
            f" AS DECIMAL(38,18))) AS DOUBLE) / count(*) AS g{j}"
            for j in range(4)
        )
        ctes.append(
            f"g{k} AS MATERIALIZED (SELECT {gsum} FROM f, {prev} w)"
        )
        wup = ", ".join(
            f"floor((w.w{j} - 2.0 * g.g{j}) * 1e9 + 0.5) / 1e9 AS w{j}"
            for j in range(4)
        )
        ctes.append(
            f"w{k} AS MATERIALIZED (SELECT {wup} FROM {prev} w, g{k} g)"
        )
        prev = f"w{k}"
    return ",\n".join(ctes), prev


def _logreg_sql(iterations: int = 12) -> str:
    """Unrolled-CTE replay of operators/ml.logistic_regression_gd +
    the scoring pass of q_logreg_label_model: per iteration one
    decimal-summed gradient aggregate over the materialized feature
    relation and a 9-dp-snapped weight update (lr = 2.0). MATERIALIZED
    throughout — the weight CTE chain would otherwise inline
    exponentially (each g{k} references f and w{k-1})."""
    zexpr = (
        "(0.0 + w.w0 * x0 + w.w1 * x1 + w.w2 * x2 + w.w3 * x3)"
    )
    ctes = [
        """f AS MATERIALIZED (
  SELECT CASE WHEN label < 5 THEN 1.0 ELSE 0.0 END AS y,
         CAST(1.0 AS DOUBLE) AS x0,
         CAST(embedding[1] AS DOUBLE) AS x1,
         CAST(embedding[2] AS DOUBLE) AS x2,
         CAST(embedding[3] AS DOUBLE) AS x3
  FROM embeddings)""",
        "w0i AS (SELECT CAST(0.0 AS DOUBLE) AS w0, CAST(0.0 AS DOUBLE)"
        " AS w1, CAST(0.0 AS DOUBLE) AS w2, CAST(0.0 AS DOUBLE) AS w3)",
    ]
    prev = "w0i"
    for k in range(1, iterations + 1):
        gsum = ", ".join(
            f"CAST(sum(CAST(((1.0 / (1.0 + exp(-{zexpr}))) - y) * x{j}"
            f" AS DECIMAL(38,18))) AS DOUBLE) / count(*) AS g{j}"
            for j in range(4)
        )
        ctes.append(
            f"g{k} AS MATERIALIZED (SELECT {gsum} FROM f, {prev} w)"
        )
        wup = ", ".join(
            f"floor((w.w{j} - 2.0 * g.g{j}) * 1e9 + 0.5) / 1e9 AS w{j}"
            for j in range(4)
        )
        ctes.append(
            f"w{k} AS MATERIALIZED (SELECT {wup} FROM {prev} w, g{k} g)"
        )
        prev = f"w{k}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
sc AS (
  SELECT y, {zexpr} AS z FROM f, {prev} w),
m AS (
  SELECT count(*) AS n,
         CAST(sum(CASE WHEN (z >= 0) = (y = 1.0) THEN 1 ELSE 0 END)
              AS DOUBLE) / count(*) AS acc_raw,
         CAST(sum(CAST(ln(1.0 + exp(-z)) + (1.0 - y) * z
                       AS DECIMAL(38,18))) AS DOUBLE) / count(*)
           AS ll_raw
  FROM sc)
SELECT CAST(n AS BIGINT) AS n,
       floor(w.w0 * 1000000.0 + 0.5) / 1000000.0 AS w0,
       floor(w.w1 * 1000000.0 + 0.5) / 1000000.0 AS w1,
       floor(w.w2 * 1000000.0 + 0.5) / 1000000.0 AS w2,
       floor(w.w3 * 1000000.0 + 0.5) / 1000000.0 AS w3,
       floor(acc_raw * 10000.0 + 0.5) / 10000.0 AS accuracy,
       floor(ll_raw * 10000.0 + 0.5) / 10000.0 AS logloss
FROM m, {prev} w
"""
    )


def _bootstrap_sql(B: int = 64) -> str:
    """Mirror of q_bootstrap_ci_mean: identical Poisson(1) CDF hex
    thresholds (same Python float arithmetic generates both sides),
    md5 string comparisons, decimal replicate sums, nearest-rank CI."""
    import math as _math

    cdf, acc, k = [], 0.0, 0
    while acc < 0.99999 and k < 8:
        acc += _math.exp(-1.0) / _math.factorial(k)
        cdf.append(min(acc, 1.0))
        k += 1
    th = [format(int(c * 2**32), "08x") for c in cdf]
    cases = " ".join(
        f"WHEN h < '{t}' THEN {i}" for i, t in enumerate(th)
    )
    lo_rk = max(1, _math.ceil(0.025 * B))
    hi_rk = _math.ceil(0.975 * B)
    return f"""
WITH fan AS (
  SELECT o.o_orderkey, o.o_totalprice, t.b,
         substring(md5(concat_ws(':', o.o_orderkey, t.b)), 1, 8) AS h
  FROM orders o, range({B}) t(b)),
wtd AS (
  SELECT b, o_totalprice,
         CASE {cases} ELSE {len(th)} END AS w
  FROM fan),
reps AS (
  SELECT b,
         CAST(sum(CAST(w * o_totalprice AS DECIMAL(38,18))) AS DOUBLE)
           / sum(w) AS mean_b
  FROM wtd GROUP BY b),
ranked AS (
  SELECT mean_b,
         row_number() OVER (ORDER BY mean_b, b) AS rk
  FROM reps),
point AS (
  SELECT count(*) AS n,
         CAST(sum(CAST(o_totalprice AS DECIMAL(38,18))) AS DOUBLE)
           / count(*) AS mean_raw
  FROM orders)
SELECT CAST(p.n AS BIGINT) AS n,
       floor(p.mean_raw * 10000.0 + 0.5) / 10000.0 AS mean_value,
       floor(lo.mean_b * 10000.0 + 0.5) / 10000.0 AS ci_lo,
       floor(hi.mean_b * 10000.0 + 0.5) / 10000.0 AS ci_hi,
       CAST({B} AS BIGINT) AS n_replicates
FROM point p,
     (SELECT mean_b FROM ranked WHERE rk = {lo_rk}) lo,
     (SELECT mean_b FROM ranked WHERE rk = {hi_rk}) hi
"""


def _skew_family_sql(label: str, table: str, key: str) -> str:
    return f"""
SELECT '{label}' AS join_key,
       CAST(sum(c) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(max(c) AS BIGINT) AS max_key_rows,
       floor(CAST(max(c) AS DOUBLE)
             / (CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE))
             * 100.0 + 0.5) / 100.0 AS skew_ratio,
       floor(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS top_key_share,
       CAST(CASE WHEN CAST(max(c) AS DOUBLE)
                      / (CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE))
                      > 10.0
                 THEN 1 ELSE 0 END AS INT) AS is_skewed
FROM (SELECT {key}, count(*) AS c FROM {table} GROUP BY 1)
"""



def _logreg_eval_scored_sql() -> tuple[str, str]:
    """WITH-prefix producing `scored(vec_id, y, p)` from the shared
    GD chain, p snapped to 9 dp exactly like queries._logreg_scored."""
    ctes, wlast = _logreg_ctes()
    zexpr = "(0.0 + w.w0 * x0 + w.w1 * x1 + w.w2 * x2 + w.w3 * x3)"
    scored = (
        f"scored AS (SELECT vec_id, y, floor((1.0 / (1.0 + exp(-{zexpr})))"
        f" * 1000000000.0 + 0.5) / 1000000000.0 AS p FROM f, {wlast} w)"
    )
    return ctes, scored


def _ece_sql() -> str:
    ctes, scored = _logreg_eval_scored_sql()
    return f"""
WITH {ctes},
{scored},
ranked AS (
  SELECT y, p, row_number() OVER (ORDER BY p, vec_id) AS r FROM scored),
n_tot AS (SELECT count(*) AS n_all FROM scored),
binned AS (
  SELECT y, p, CAST(((r - 1) * 10) // n_all AS INT) AS bin
  FROM ranked, n_tot),
per_bin AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n_b,
         CAST(sum(CAST(p AS DECIMAL(38,18))) AS DOUBLE) AS sp,
         CAST(sum(CAST(y AS DECIMAL(38,18))) AS DOUBLE) AS sy
  FROM binned GROUP BY 1),
tot AS (SELECT sum(n_b) AS n FROM per_bin)
SELECT bin, n_b,
       floor(sp / n_b * 10000.0 + 0.5) / 10000.0 AS confidence,
       floor(sy / n_b * 10000.0 + 0.5) / 10000.0 AS accuracy,
       floor(abs(sy / n_b - sp / n_b) * CAST(n_b AS DOUBLE)
             / CAST(n AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
         AS ece_contrib
FROM per_bin, tot
"""


def _auc_sql() -> str:
    ctes, scored = _logreg_eval_scored_sql()
    return f"""
WITH {ctes},
{scored},
ranked AS (
  SELECT y, p, row_number() OVER (ORDER BY p, vec_id) AS r
  FROM scored),
avg_ranked AS (
  SELECT y,
         CAST(min(r) OVER (PARTITION BY p)
              + max(r) OVER (PARTITION BY p) AS DOUBLE) / 2.0 AS ar
  FROM ranked),
agg AS (
  SELECT sum(CASE WHEN y = 1.0 THEN ar END) AS rs,
         sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS np,
         sum(CASE WHEN y = 0.0 THEN 1 ELSE 0 END) AS nn
  FROM avg_ranked)
SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
       floor((rs - CAST(np AS DOUBLE) * (CAST(np AS DOUBLE) + 1.0) / 2.0)
             / (CAST(np AS DOUBLE) * CAST(nn AS DOUBLE))
             * 1000000.0 + 0.5) / 1000000.0 AS auc
FROM agg
"""


def _gboost_sql(rounds: int = 3) -> str:
    """Unrolled replay of q_gradient_boost_stumps: per round, the
    conditional-sum split search over the current residuals, the
    9-dp-snapped means / 6-dp-snapped scores, the lr=0.5 ensemble
    update, and the reported train SSE — all MATERIALIZED so the CTE
    chain cannot inline exponentially."""

    def snap9(e: str) -> str:
        return f"floor(({e}) * 1000000000.0 + 0.5) / 1000000000.0"

    ctes = [
        "feat AS MATERIALIZED (SELECT value AS y,"
        " CAST(hour(ts) AS INT) AS h FROM events)",
        "m0 AS MATERIALIZED (SELECT "
        + snap9(
            "CAST(sum(CAST(y AS DECIMAL(38,18))) AS DOUBLE) / count(*)"
        )
        + " AS f0 FROM feat)",
    ]
    model_tables = ["m0"]
    pred = "m0.f0"
    selects = []
    for r in range(1, rounds + 1):
        joins = ", ".join(model_tables)
        resid = f"(y - ({pred}))"
        ctes.append(
            f"tot{r} AS MATERIALIZED (SELECT count(*) AS n, "
            f"CAST(sum(CAST({resid} AS DECIMAL(38,18))) AS DOUBLE) AS s, "
            f"CAST(sum(CAST({resid} * {resid} AS DECIMAL(38,18))) "
            f"AS DOUBLE) AS q FROM feat, {joins})"
        )
        ctes.append(
            f"sides{r} AS MATERIALIZED (SELECT CAST(t.c AS INT) AS c, "
            f"CAST(sum(CASE WHEN h <= t.c THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS nl, "
            f"CAST(sum(CASE WHEN h <= t.c THEN CAST({resid} AS "
            f"DECIMAL(38,18)) ELSE CAST(0.0 AS DECIMAL(38,18)) END) "
            f"AS DOUBLE) AS sl FROM feat, range(23) t(c), {joins} "
            f"GROUP BY 1)"
        )
        ctes.append(
            f"scored{r} AS MATERIALIZED (SELECT s.c, s.nl, s.sl, "
            f"t.n, t.s AS sg, t.q, "
            f"floor((t.q - (s.sl * s.sl) / CAST(s.nl AS DOUBLE) "
            f"- ((t.s - s.sl) * (t.s - s.sl)) "
            f"/ CAST(t.n - s.nl AS DOUBLE)) * 1000000.0 + 0.5) "
            f"/ 1000000.0 AS sse FROM sides{r} s, tot{r} t "
            f"WHERE s.nl > 0 AND s.nl < t.n)"
        )
        ml = snap9("sl / CAST(nl AS DOUBLE)")
        mr = snap9("(sg - sl) / CAST(n - nl AS DOUBLE)")
        ctes.append(
            f"b{r} AS MATERIALIZED (SELECT c, {ml} AS ml, {mr} AS mr "
            f"FROM (SELECT *, row_number() OVER (ORDER BY sse, c) AS rn"
            f" FROM scored{r}) WHERE rn = 1)"
        )
        model_tables.append(f"b{r}")
        pred = (
            f"{pred} + 0.5 * (CASE WHEN h <= b{r}.c THEN b{r}.ml "
            f"ELSE b{r}.mr END)"
        )
        joins_r = ", ".join(model_tables)
        ctes.append(
            f"sse{r} AS MATERIALIZED (SELECT "
            f"CAST(sum(CAST((y - ({pred})) * (y - ({pred})) "
            f"AS DECIMAL(38,18))) AS DOUBLE) AS v FROM feat, {joins_r})"
        )
        selects.append(
            f"SELECT CAST({r} AS INT) AS round, "
            f"CAST(b{r}.c AS INT) AS split_hour, "
            f"floor(b{r}.ml * 10000.0 + 0.5) / 10000.0 AS mean_left, "
            f"floor(b{r}.mr * 10000.0 + 0.5) / 10000.0 AS mean_right, "
            f"floor(sse{r}.v * 100.0 + 0.5) / 100.0 AS train_sse "
            f"FROM b{r}, sse{r}"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\n"
        + "\nUNION ALL\n".join(selects)
    )


def _als_rank1_sql(iterations: int = 3) -> str:
    """Unrolled replay of q_als_rank1's alternating closed-form
    updates: per iteration a scalar v'v, the per-user factor as a
    decimal-summed aggregate, and the 9-dp-snapped item update."""

    def snap9(e: str) -> str:
        return f"floor(({e}) * 1000000000.0 + 0.5) / 1000000000.0"

    ctes = [
        "ratings AS MATERIALIZED (SELECT user_id AS u, event_type AS t,"
        " CAST(count(*) AS DOUBLE) AS r FROM events GROUP BY 1, 2)",
        "v0 AS MATERIALIZED (SELECT t, CAST(1.0 AS DOUBLE) AS v"
        " FROM (SELECT DISTINCT t FROM ratings))",
    ]
    prev = "v0"
    for k in range(1, iterations + 1):
        ctes.append(
            f"vv{k} AS (SELECT sum(v * v) AS s FROM {prev})"
        )
        ctes.append(
            f"u{k} AS MATERIALIZED (SELECT r.u, "
            f"CAST(sum(CAST(r.r * v.v AS DECIMAL(38,18))) AS DOUBLE)"
            f" / max(vv.s) AS uf "
            f"FROM ratings r JOIN {prev} v ON v.t = r.t, vv{k} vv "
            f"GROUP BY r.u)"
        )
        ctes.append(
            f"num{k} AS (SELECT r.t, "
            f"CAST(sum(CAST(r.r * u.uf AS DECIMAL(38,18))) AS DOUBLE)"
            f" AS num FROM ratings r JOIN u{k} u ON u.u = r.u GROUP BY 1)"
        )
        ctes.append(
            f"den{k} AS (SELECT CAST(sum(CAST(uf * uf AS "
            f"DECIMAL(38,18))) AS DOUBLE) AS den FROM u{k})"
        )
        ctes.append(
            f"v{k} AS MATERIALIZED (SELECT n.t, "
            + snap9("n.num / d.den")
            + f" AS v FROM num{k} n, den{k} d)"
        )
        prev = f"v{k}"
    ctes.append(
        f"vvf AS (SELECT sum(v * v) AS s FROM {prev})"
    )
    ctes.append(
        "uf AS MATERIALIZED (SELECT r.u, "
        "CAST(sum(CAST(r.r * v.v AS DECIMAL(38,18))) AS DOUBLE)"
        f" / max(vv.s) AS uf FROM ratings r JOIN {prev} v ON v.t = r.t,"
        " vvf vv GROUP BY r.u)"
    )
    ctes.append(
        f"sse AS (SELECT count(*) AS n, "
        f"CAST(sum(CAST((r.r - u.uf * v.v) * (r.r - u.uf * v.v) "
        f"AS DECIMAL(38,18))) AS DOUBLE) AS sse "
        f"FROM ratings r JOIN uf u ON u.u = r.u "
        f"JOIN {prev} v ON v.t = r.t)"
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT v.t AS event_type,
       floor(v.v * 10000.0 + 0.5) / 10000.0 AS v_factor,
       floor(sqrt(sse.sse / sse.n) * 10000.0 + 0.5) / 10000.0 AS rmse
FROM {prev} v, sse
"""
    )


def _isotonic_sql() -> str:
    """Replay of q_isotonic_calibration: the shared scored relation,
    rank-decile table, and the minimax closed form
    iso_i = max_{j<=i} min_{k>=i} wmean(j..k) from prefix sums."""
    ctes, scored = _logreg_eval_scored_sql()
    return f"""
WITH {ctes},
{scored},
ranked AS (
  SELECT y, p, row_number() OVER (ORDER BY p, vec_id) AS r FROM scored),
n_tot AS (SELECT count(*) AS n_all FROM scored),
deciles AS (
  SELECT CAST(((r - 1) * 10) // n_all AS INT) AS bin,
         CAST(count(*) AS BIGINT) AS n_b,
         CAST(sum(CAST(p AS DECIMAL(38,18))) AS DOUBLE) AS sp,
         CAST(sum(CAST(y AS DECIMAL(38,18))) AS DOUBLE) AS sy
  FROM ranked, n_tot GROUP BY 1),
pre AS (
  SELECT bin, n_b, sp, sy,
         sum(n_b) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS cn,
         CAST(sum(CAST(sy AS DECIMAL(38,18))) OVER (
           ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
           AND CURRENT ROW) AS DOUBLE) AS cy
  FROM deciles),
rng AS (
  SELECT l.bin AS j, h.bin AS k,
         (h.cy - (l.cy - l.sy))
         / CAST(h.cn - (l.cn - l.n_b) AS DOUBLE) AS wmean
  FROM pre l, pre h WHERE l.bin <= h.bin),
inner_min AS (
  SELECT d.bin, d.n_b, d.sp, d.sy, r.j, min(r.wmean) AS mn
  FROM deciles d JOIN rng r ON r.j <= d.bin AND r.k >= d.bin
  GROUP BY 1, 2, 3, 4, 5),
iso AS (
  SELECT bin, n_b, sp, sy, max(mn) AS iso_raw
  FROM inner_min GROUP BY 1, 2, 3, 4)
SELECT bin, n_b,
       floor(sp / n_b * 10000.0 + 0.5) / 10000.0 AS confidence,
       floor(sy / n_b * 10000.0 + 0.5) / 10000.0 AS accuracy,
       floor(iso_raw * 10000.0 + 0.5) / 10000.0 AS calibrated
FROM iso
"""


ALL_ORACLES: dict[str, str] = {
    "pagerank_suppliers": _pagerank_sql(),
    "bm25_topk": _bm25_sql(_BM25_QUERIES),
    # mirror of text/analysis.py::lm_trigram_score: same conditional
    # trigram model (prefix marginal re-aggregated from the trigram
    # counts), same decimal-cast mean
    "lm_trigram_score": """
WITH dtc AS (SELECT doc_id, lang, tri, count(*) AS cnt
             FROM (SELECT doc_id, lang, substr(text, i, 3) AS tri
                   FROM (SELECT doc_id, lang, text,
                                unnest(generate_series(1, len(text) - 2))
                                  AS i
                         FROM documents))
             GROUP BY 1, 2, 3),
c3 AS (SELECT lang, tri, sum(cnt) AS c3 FROM dtc GROUP BY 1, 2),
c2 AS (SELECT lang, substr(tri, 1, 2) AS bi, sum(c3) AS c2
       FROM c3 GROUP BY 1, 2),
model AS (SELECT c3.lang, c3.tri, ln(c3.c3 / c2.c2) AS lp
          FROM c3 JOIN c2
            ON c3.lang = c2.lang AND substr(c3.tri, 1, 2) = c2.bi)
SELECT dtc.doc_id, dtc.lang, CAST(sum(dtc.cnt) AS BIGINT) AS n_tri,
       floor((CAST(sum(CAST(m.lp AS DECIMAL(38,18)) * dtc.cnt) AS DOUBLE)
              / sum(dtc.cnt)) * 10000.0 + 0.5) / 10000.0 AS avg_logp
FROM dtc JOIN model m ON dtc.lang = m.lang AND dtc.tri = m.tri
GROUP BY 1, 2
""",
    # mirror of text/vector.py::semantic_dedup over the TRAINED IVF
    # codebook (threshold 0.4): Lloyd's recurrence unrolled in-engine
    # (_ivf_cent_ctes), then the same dist2 rounding + lexicographic
    # argmin and rounded-cosine drop rule as ann_topk_ivf
    # leaf target 8 so in-cell banding is ACTIVE at the oracle SF
    # (mirrors q_semantic_dedup's derive_leaf_planes target)
    "semantic_dedup": _semantic_dedup_sql(target_cell=8),
    # Approximate-sketch queries: the estimate is engine-specific, so
    # the Spark side hashes the EXACT value plus a bound-check boolean;
    # the oracle computes the same exact value and expects the bound to
    # hold (TRUE). A sketch drifting out of tolerance fails the gate.
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
    "prefix_filter_join": """
WITH toks AS (
  SELECT DISTINCT doc_id, lang, source, tok
  FROM (SELECT doc_id, lang, source,
               unnest(string_split(lower(text), ' ')) AS tok
        FROM documents)
  WHERE tok <> ''),
sizes AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY 1),
inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ni
          FROM toks a JOIN toks b
            ON a.tok = b.tok AND a.lang = b.lang
           AND a.source = b.source AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT da AS doc_a, db AS doc_b,
       floor(CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) * 10000.0 + 0.5)
         / 10000.0 AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = da
JOIN sizes sb ON sb.doc_id = db
WHERE CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) >= 0.9
""",
    "attribution_time_decay": """
WITH touches AS (SELECT user_id, ts, event_type FROM events
                 WHERE event_type IN ('click', 'view')),
buys AS (SELECT user_id, ts AS p_ts, event_id AS p_id FROM events
         WHERE event_type = 'purchase'),
j AS (SELECT t.event_type, b.p_id,
             1.0 / (1.0 + CAST(floor(
               (floor(epoch(b.p_ts)) - floor(epoch(t.ts))) / 86400.0)
               AS INT)) AS w
      FROM touches t JOIN buys b
        ON t.user_id = b.user_id AND t.ts < b.p_ts
       AND t.ts >= b.p_ts - INTERVAL 7 DAY),
c AS (SELECT event_type, p_id, w,
             CAST(sum(CAST(w AS DECIMAL(30,15)))
                  OVER (PARTITION BY p_id) AS DOUBLE) AS tot
      FROM j)
SELECT event_type,
       floor(CAST(sum(CAST(w / tot AS DECIMAL(30,15))) AS DOUBLE)
             * 10000.0 + 0.5) / 10000.0 AS total_credit,
       CAST(count(DISTINCT p_id) AS BIGINT) AS n_purchases
FROM c GROUP BY 1
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
    "heavy_hitters_cms": """
SELECT event_type, CAST(count(*) AS BIGINT) AS true_cnt, TRUE AS est_ok
FROM events GROUP BY 1
""",
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
    # mirror of text/vector.py::ann_topk_ivf over the TRAINED codebook
    # (training recurrence unrolled in-engine; see _ivf_cent_ctes)
    "ann_topk_ivf": _ann_topk_ivf_sql(),
    # incremental ANN index maintenance: historical-slice codebook,
    # new-batch-only assignment, exact-integer skew/growth flags
    "ivf_index_append": _ivf_index_append_sql(),
    # the streamed append must equal the one-shot batch append
    "streaming_ivf_append": _ivf_index_append_sql(),
    # mirror of text/vector.py::ann_topk_pq (PQ/ADC over per-subspace
    # trained codebooks; see _pq_cent_ctes)
    "ann_topk_pq": _ann_topk_pq_sql(),
    # mirror of text/vector.py::ann_topk_ivfpq (coarse probe + ADC)
    "ann_topk_ivfpq": _ann_topk_ivfpq_sql(),
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
    "window_running_sum": """
SELECT o_custkey, o_orderkey,
       floor((sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 100.0 + 0.5) / 100.0 AS running_spend
FROM orders
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
    "grouped_pandas_stats": """
SELECT user_id, count(*) AS n,
       floor((median(value)) * 10000.0 + 0.5) / 10000.0 AS median_value,
       floor((max(value) - min(value)) * 10000.0 + 0.5) / 10000.0 AS spread
FROM events GROUP BY 1
""",
    "s3_partitioned_pruned": """
SELECT CAST(month(o_orderdate) AS BIGINT) AS order_month,
       count(*) AS n_orders,
       floor((CAST(sum(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE))
             * 100.0 + 0.5) / 100.0 AS month_total
FROM orders WHERE year(o_orderdate) = 1997 GROUP BY 1
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
    "event_value_quantiles": """
SELECT event_type,
       floor((quantile_cont(value, 0.5)) * 10000.0 + 0.5) / 10000.0 AS p50,
       floor((quantile_cont(value, 0.9)) * 10000.0 + 0.5) / 10000.0 AS p90,
       floor((quantile_cont(value, 0.99)) * 10000.0 + 0.5) / 10000.0 AS p99
FROM events GROUP BY 1
""",
    "top_tokens_per_lang": """
WITH toks AS (
  SELECT lang, unnest(regexp_split_to_array(lower(trim(text)), '\\s+'))
           AS token
  FROM documents),
c AS (SELECT lang, token, count(*) AS n FROM toks
      WHERE token != '' GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (
        PARTITION BY lang ORDER BY n DESC, token ASC) AS rank FROM c)
SELECT lang, token, n, rank FROM r WHERE rank <= 5
""",
    "udtf_sentences": """
WITH parts AS (
  SELECT doc_id, string_split(text, '. ') AS ps FROM documents)
SELECT doc_id, i AS sent_idx, ps[i] AS sentence
FROM parts, (SELECT unnest(generate_series(1, 10000)) AS i)
WHERE i <= len(ps) AND ps[i] != ''
""",
    "streaming_dedup_keys": """
SELECT DISTINCT user_id, event_type FROM events
""",
    "pandas_udf_norm": """
SELECT vec_id, CAST(len(embedding) AS BIGINT) AS n_dims,
       floor(sqrt(list_dot_product(embedding::DOUBLE[],
                                   embedding::DOUBLE[]))
             * 10000.0 + 0.5) / 10000.0 AS l2_norm
FROM embeddings
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
    "streaming_interval_join": """
SELECT a.event_id AS click_id, b.event_id AS purchase_id, a.user_id
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_type = 'click' AND b.event_type = 'purchase'
 AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 24 HOURS
""",
    # left-outer flush rule: matched pairs always emit; an unmatched
    # click emits only once the watermark passes the end of its join
    # window (click_ts + 6h < min(max click, max purchase) - 1h) —
    # clicks whose window is still open at stream end are withheld,
    # exactly what the streaming state eviction does
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
    # native streaming session windows: gap sessionization replayed
    # relationally (new session iff gap >= 2h — end-exclusive, an
    # event exactly at the boundary opens a new session) + the
    # watermark flush rule (only sessions whose end+gap the final
    # watermark passed were emitted in append mode)
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
    "rolling_hash_fingerprint": """
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(regexp_extract_all(text, '[\\s\\S]'),
                          c -> CAST(unicode(c) AS BIGINT))),
         (a, b) -> (a * 31 + b) % 1000000007) AS rolling_hash,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
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
    "corpus_clean": """
WITH scored AS (
  SELECT doc_id, lang,
    floor((0.25 * (CASE WHEN length(text) BETWEEN 100 AND 20000
                       THEN 1.0 ELSE 0.0 END)
        + 0.25 * (1.0 - len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) * 1.0
                   / greatest(length(text), 1))
        + 0.25 * (len(regexp_extract_all(text, '[A-Za-z]')) * 1.0
                   / greatest(length(text), 1))
        + 0.25 * (CASE WHEN length(text) * 1.0 /
                         greatest(len(regexp_split_to_array(trim(text),
                                                            '\\s+')), 1)
                         BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.0 END))
          * 10000.0 + 0.5) / 10000.0 AS quality,
    sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
      AS content_hash
  FROM documents
), good AS (
  SELECT * FROM scored WHERE quality >= 0.5
), surv AS (
  SELECT *, min(doc_id) OVER (PARTITION BY content_hash) AS keep_id
  FROM good
)
SELECT CASE
         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccd' THEN 'train'
         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
         ELSE 'test'
       END AS split,
       lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       floor(CAST(sum(CAST(quality AS DECIMAL(30,8))) AS DOUBLE)
             * 10000.0 + 0.5) / 10000.0 AS sum_quality
FROM surv
WHERE doc_id = keep_id
GROUP BY 1, 2
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
    "dedup_exact": """
SELECT sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
         AS content_hash,
       min(doc_id) AS keep_id, count(*) AS dup_count
FROM documents GROUP BY 1
""",
    "dedup_minhash_lsh": "WITH "
    + _SHINGLES_SQL
    + """,
sig AS (
  SELECT doc_id, b,
         min(substr(md5(CAST(b // 4 AS VARCHAR) || ':' || shingle),
                    1 + 8 * (b % 4), 8)) AS s
  FROM shingles, (SELECT unnest(generate_series(0, 7)) AS b)
  GROUP BY 1, 2)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS matching_bands
FROM sig a JOIN sig b ON a.b = b.b AND a.s = b.s AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 2
""",
    # batch mirror of queries.q_streaming_incremental_dedup: wave 2
    # (odd ids) screened against wave 1's (even ids) signature store —
    # the stream is deterministic (mtime-pinned wave order), so its
    # result equals this one-shot join
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
    # mirror of text/dedup.py::incremental_minhash_dedup over the
    # same split (new = doc_id%4=0 vs corpus = rest): identical band
    # hashing, est_jaccard = matching/8 (exact in binary, so the 4-dp
    # rounding is engine-portable)
    "incremental_near_dup": "WITH "
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
WHERE a.doc_id % 4 = 0 AND b.doc_id % 4 != 0
GROUP BY 1, 2 HAVING count(*) >= 2
""",
    "dedup_simhash": _simhash_sql(16),
    "ngram_jaccard": "WITH "
    + _SHINGLES_SQL
    + """,
sz AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM shingles a JOIN shingles b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
       floor((i * 1.0 / (sa.sz + sb.sz - i)) * 1000000.0 + 0.5) / 1000000.0 AS jaccard
FROM inter
JOIN sz sa ON doc_a = sa.doc_id
JOIN sz sb ON doc_b = sb.doc_id
WHERE floor((i * 1.0 / (sa.sz + sb.sz - i)) * 1000000.0 + 0.5) / 1000000.0 >= 0.3
""",
    # directional containment |inner∩outer|/|inner| from one unordered
    # intersection, both directions unioned — same shingle CTE
    "containment_dedup": "WITH "
    + _SHINGLES_SQL
    + """,
sz AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM shingles a JOIN shingles b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
directed AS (
  SELECT doc_a AS doc_inner, doc_b AS doc_outer, i, sa.sz AS den
  FROM inter JOIN sz sa ON doc_a = sa.doc_id
  UNION ALL
  SELECT doc_b AS doc_inner, doc_a AS doc_outer, i, sb.sz AS den
  FROM inter JOIN sz sb ON doc_b = sb.doc_id)
SELECT doc_inner, doc_outer,
       floor(i * 1.0 / den * 1000000.0 + 0.5) / 1000000.0
         AS containment
FROM directed
WHERE floor(i * 1.0 / den * 1000000.0 + 0.5) / 1000000.0 >= 0.9
""",
    "text_profile": """
SELECT doc_id,
  CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
       AS BIGINT) AS n_bpe_tokens,
  CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
       WHEN greatest(es_h, de_h, fr_h, en_h) >= 1
            AND es_h = greatest(es_h, de_h, fr_h, en_h) THEN 'es'
       WHEN greatest(es_h, de_h, fr_h, en_h) >= 1
            AND de_h = greatest(es_h, de_h, fr_h, en_h) THEN 'de'
       WHEN greatest(es_h, de_h, fr_h, en_h) >= 1
            AND fr_h = greatest(es_h, de_h, fr_h, en_h) THEN 'fr'
       WHEN greatest(es_h, de_h, fr_h, en_h) >= 1
            AND en_h = greatest(es_h, de_h, fr_h, en_h) THEN 'en'
       ELSE 'und' END AS lang_pred,
  floor((0.25 * (CASE WHEN length(text) BETWEEN 100 AND 20000
                     THEN 1.0 ELSE 0.0 END)
      + 0.25 * (1.0 - len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) * 1.0
                 / greatest(length(text), 1))
      + 0.25 * (len(regexp_extract_all(text, '[A-Za-z]')) * 1.0
                 / greatest(length(text), 1))
      + 0.25 * (CASE WHEN length(text) * 1.0 /
                       greatest(len(regexp_split_to_array(trim(text),
                                                          '\\s+')), 1)
                       BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.0 END))
        * 10000.0 + 0.5) / 10000.0
    AS quality,
  md5(array_to_string(list_sort(list_distinct(
        string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                     ' '))), chr(1))) AS fingerprint
FROM (
  SELECT *,
    (CASE WHEN contains(' ' || lower(text) || ' ', ' el ') THEN 1 ELSE 0 END +
     CASE WHEN contains(' ' || lower(text) || ' ', ' la ') THEN 1 ELSE 0 END +
     CASE WHEN contains(' ' || lower(text) || ' ', ' de ') THEN 1 ELSE 0 END +
     CASE WHEN contains(' ' || lower(text) || ' ', ' que ') THEN 1 ELSE 0 END +
     CASE WHEN contains(' ' || lower(text) || ' ', ' los ') THEN 1 ELSE 0 END +
     CASE WHEN contains(' ' || lower(text) || ' ', ' una ') THEN 1 ELSE 0 END)
      AS es_h,
    (CASE WHEN contains(' ' || lower(text) || ' ', ' der ') THEN 1 ELSE 0 END +
     CASE WHEN contains(' ' || lower(text) || ' ', ' die ') THEN 1 ELSE 0 END +
     CASE WHEN contains(' ' || lower(text) || ' ', ' und ') THEN 1 ELSE 0 END +
     CASE WHEN contains(' ' || lower(text) || ' ', ' das ') THEN 1 ELSE 0 END +
     CASE WHEN contains(' ' || lower(text) || ' ', ' ist ') THEN 1 ELSE 0 END +
     CASE WHEN contains(' ' || lower(text) || ' ', ' nicht ') THEN 1 ELSE 0 END)
      AS de_h,
    (CASE WHEN contains(' ' || lower(text) || ' ', ' le ') THEN 1 ELSE 0 END +
     CASE WHEN contains(' ' || lower(text) || ' ', ' les ') THEN 1 ELSE 0 END +
     CASE WHEN contains(' ' || lower(text) || ' ', ' des ') THEN 1 ELSE 0 END +
     CASE WHEN contains(' ' || lower(text) || ' ', ' est ') THEN 1 ELSE 0 END +
     CASE WHEN contains(' ' || lower(text) || ' ', ' une ') THEN 1 ELSE 0 END +
     CASE WHEN contains(' ' || lower(text) || ' ', ' dans ') THEN 1 ELSE 0 END)
      AS fr_h,
    (CASE WHEN contains(' ' || lower(text) || ' ', ' the ') THEN 1 ELSE 0 END +
     CASE WHEN contains(' ' || lower(text) || ' ', ' and ') THEN 1 ELSE 0 END +
     CASE WHEN contains(' ' || lower(text) || ' ', ' of ') THEN 1 ELSE 0 END +
     CASE WHEN contains(' ' || lower(text) || ' ', ' is ') THEN 1 ELSE 0 END +
     CASE WHEN contains(' ' || lower(text) || ' ', ' that ') THEN 1 ELSE 0 END +
     CASE WHEN contains(' ' || lower(text) || ' ', ' with ') THEN 1 ELSE 0 END)
      AS en_h
  FROM documents)
""",
    "ann_cosine_topk": _ann_brute_sql(),
    "ann_topk_lsh": _lsh_sql(),
    "embedding_near_dup_lsh": _near_dup_lsh_sql(),
    # high-recall verified composition: same generated LSH mirror as
    # the _lsh key, but over 4 hash tables (recall ~0.99 at cos>=0.95)
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
    # analytic mirror of queries.q_multimodal_decode: the image corpus
    # is a pure function of doc_id (pixel (x,y,c) = (doc_id+x+y+c)%256
    # in a (4+id%5) x (3+id%4) frame), so the DECODED statistics are
    # computable in closed form — any header/stride/channel-order bug
    # in the pure-Python PPM/BMP parser breaks value parity here
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
    # analytic mirror of queries.q_multimodal_audio: clip d's frame i
    # is clamp(((d*31 + i*17) % 98304) - 49152, int16) over
    # n = 50 + d%40 frames at 8000 + 100*(d%3) Hz — duration/RMS/
    # zero-crossings/clipping computable in closed form (sqrt is
    # IEEE-exact-rounded, so the engines agree bit-for-bit)
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
    # mirror of text/analysis.py::bpe_merge_pairs: pair counts over
    # distinct words weighted by word frequency, same >=2-char filter,
    # same (count desc, pair asc) tie-break
    "bpe_merge_pairs": """
WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
wc AS (SELECT word, count(*) AS cnt FROM w WHERE len(word) >= 2 GROUP BY 1),
p AS (SELECT substr(word, i, 2) AS pair, cnt
      FROM (SELECT word, cnt,
                   unnest(generate_series(1, len(word) - 1)) AS i
            FROM wc)),
agg AS (SELECT pair, CAST(sum(cnt) AS BIGINT) AS n FROM p GROUP BY 1)
SELECT pair, n, CAST(rank AS INT) AS rank
FROM (SELECT *, row_number() OVER (ORDER BY n DESC, pair ASC) AS rank
      FROM agg)
WHERE rank <= 30
""",
    # mirror of text/vector.py::embedding_quantize_int8: same
    # scale = max|x|/127, same floor(x/scale + 0.5) quantizer, exact
    # decimal sums for the reconstruction error
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
    # mirror of queries.q_deletion_vector_read: the two delete
    # predicates applied as plain filters (both run against the BASE
    # version, matching delete_rows' read_snapshot semantics)
    "deletion_vector_read": """
SELECT o_orderstatus, count(*) AS n,
       floor((CAST(sum(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE))
             * 100.0 + 0.5) / 100.0 AS total
FROM orders
WHERE NOT (o_orderkey % 7 = 0)
  AND NOT (o_orderstatus = 'F' AND o_orderkey % 5 = 0)
GROUP BY 1
""",
    "streaming_windowed_counts": """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(*) AS n_events,
       floor((CAST(sum(CAST(value AS DECIMAL(30,8))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS sum_value
FROM events GROUP BY 1, 2
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
    "zorder_pruned_scan": """
SELECT l_orderkey, l_linenumber, l_partkey,
       floor(CAST(l_quantity AS DOUBLE) * 100.0 + 0.5) / 100.0
         AS l_quantity
FROM lineitem
WHERE l_orderkey <= 3000 AND l_partkey <= 500
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
    # the streamed sweep line must equal the batch sweep line —
    # identical oracle, so any drift in the incremental state
    # maintenance fails the hash gate
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
    # merged per-batch frontiers must equal the full-table frontier
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
    "streaming_dedup_watermarked": """
SELECT DISTINCT user_id, event_type FROM events
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
    "length_histogram": """
SELECT CAST(floor(n_chars / 100.0) AS BIGINT) AS bucket,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM documents GROUP BY 1
""",
    "map_props": """
SELECT event_id,
       CAST(len(json_keys(props)) AS INT) AS n_props,
       array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
       CAST(props->>'k' AS BIGINT) AS k_val
FROM events
""",
    "near_dup_verified": "WITH "
    + _SHINGLES_SQL
    + """,
sig AS (
  SELECT doc_id, b,
         min(substr(md5(CAST(b // 4 AS VARCHAR) || ':' || shingle),
                    1 + 8 * (b % 4), 8)) AS s
  FROM shingles, (SELECT unnest(generate_series(0, 7)) AS b)
  GROUP BY 1, 2),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sig a JOIN sig b ON a.b = b.b AND a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2 HAVING count(*) >= 2),
sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY 1),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
  FROM cand c
  JOIN shingles sa ON sa.doc_id = c.doc_a
  JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
       floor(floor(n_inter / CAST(za.sz + zb.sz - n_inter AS DOUBLE)
                   * 1000000.0 + 0.5) / 1000000.0 * 10000.0 + 0.5)
         / 10000.0 AS jaccard
FROM inter
JOIN sizes za ON inter.doc_a = za.doc_id
JOIN sizes zb ON inter.doc_b = zb.doc_id
WHERE floor(n_inter / CAST(za.sz + zb.sz - n_inter AS DOUBLE)
            * 1000000.0 + 0.5) / 1000000.0 >= 0.6
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
    "repetition_profile": """
WITH sh AS (
  SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks)-2)) AS i
        FROM (SELECT doc_id, string_split(text, ' ') AS toks
              FROM documents
              WHERE len(string_split(text, ' ')) >= 3)))
SELECT doc_id, count(*) AS n_grams,
       CAST(count(DISTINCT shingle) AS BIGINT) AS n_distinct,
       floor((1 - count(DISTINCT shingle) / CAST(count(*) AS DOUBLE))
             * 10000.0 + 0.5) / 10000.0 AS dup_ratio
FROM sh GROUP BY 1
""",
    "decontaminate": """
WITH g AS (
  SELECT DISTINCT doc_id, source,
         toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
           || toks[i+3] || ' ' || toks[i+4] AS shingle
  FROM (SELECT doc_id, source, toks,
               unnest(generate_series(1, len(toks)-4)) AS i
        FROM (SELECT doc_id, source, string_split(text, ' ') AS toks
              FROM documents
              WHERE len(string_split(text, ' ')) >= 5))
), b AS (SELECT DISTINCT shingle FROM g WHERE source = 'src0')
SELECT g.doc_id, count(*) AS n_shared
FROM g JOIN b ON g.shingle = b.shingle
WHERE g.source <> 'src0'
GROUP BY 1 HAVING count(*) >= 3
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
    "streaming_static_enrich": """
SELECT c_mktsegment, count(*) AS n_events,
       floor((CAST(sum(CAST(value AS DECIMAL(30,8))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1
""",
    "frame_sample": """
SELECT doc_id, CAST(i AS INT) AS frame_no,
       md5(substr(text, i * 16 + 1, 16)) AS frame_md5
FROM (SELECT doc_id, text,
             unnest(generate_series(
               0, CAST(floor(strlen(text) / 16) AS INT) - 1, 10)) AS i
      FROM documents WHERE doc_id % 3 = 2)
""",
    "tfidf_top_terms": """
WITH term_doc AS (
  SELECT lang, doc_id, t.term, count(*) AS tf
  FROM (SELECT lang, doc_id,
               unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
        FROM documents) t
  GROUP BY 1, 2, 3
), term_stats AS (
  SELECT lang, term, CAST(sum(tf) AS BIGINT) AS total_tf,
         CAST(count(*) AS BIGINT) AS df
  FROM term_doc GROUP BY 1, 2
), nd AS (
  SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1
), scored AS (
  SELECT s.lang, term, total_tf, df,
         floor(total_tf * ln((n_docs + 1.0) / (df + 1.0)) * 10000.0 + 0.5)
           / 10000.0 AS tfidf
  FROM term_stats s JOIN nd ON s.lang = nd.lang
)
SELECT lang, term, total_tf, df, tfidf, CAST(rank AS INT) AS rank
FROM (SELECT *, row_number() OVER (
        PARTITION BY lang ORDER BY tfidf DESC, term ASC) AS rank
      FROM scored)
WHERE rank <= 5
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
    "dup_clusters": "WITH RECURSIVE "
    + _SHINGLES_SQL.strip()
    + ","
    + _CLUSTER_CTES
    + """
SELECT id AS doc_id, min(r) AS cluster_id, (id = min(r)) AS keep
FROM reach GROUP BY id
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
    "anomaly_zscore": """
WITH stats AS (
  SELECT user_id,
         CAST(sum(CAST(value AS DECIMAL(30,8))) AS DOUBLE) / count(*) AS mu0,
         CAST(sum(CAST(value * value AS DECIMAL(30,8))) AS DOUBLE) / count(*) AS m2
  FROM events GROUP BY 1),
s2 AS (SELECT user_id, mu0 AS mu, sqrt(m2 - mu0 * mu0) AS sigma FROM stats)
SELECT event_id, e.user_id,
       floor(value * 100.0 + 0.5) / 100.0 AS value,
       floor((value - mu) / sigma * 1000.0 + 0.5) / 1000.0 AS z
FROM events e JOIN s2 ON e.user_id = s2.user_id
WHERE abs(floor((value - mu) / sigma * 1000.0 + 0.5) / 1000.0) > 2.0
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
    "inverted_index": """
WITH toks AS (
  SELECT DISTINCT doc_id, t.token
  FROM (SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        FROM documents) t
  WHERE length(token) >= 3)
SELECT token,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
       array_to_string(list_sort(list(DISTINCT doc_id))[1:10], ',') AS postings
FROM toks GROUP BY 1
HAVING count(DISTINCT doc_id) >= 50
""",
    "chunk_documents": """
WITH grid AS (
  SELECT doc_id, lang, text,
         CAST(unnest(generate_series(0,
           CAST(greatest(ceil((n_chars - 400) / 300.0), 0) AS INT))) AS INT)
           AS chunk_id
  FROM documents)
SELECT doc_id, lang, chunk_id,
       CAST(chunk_id * 300 AS BIGINT) AS chunk_start,
       CAST(length(substr(text, chunk_id * 300 + 1, 400)) AS BIGINT) AS chunk_len,
       md5(substr(text, chunk_id * 300 + 1, 400)) AS chunk_hash
FROM grid
WHERE length(substr(text, chunk_id * 300 + 1, 400)) > 0
""",
    "pack_sequences": """
WITH d AS (
  SELECT doc_id, lang,
         CAST(length(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents),
b AS (
  SELECT doc_id, lang, n_tokens,
         CAST(floor(coalesce(sum(n_tokens) OVER (
             PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           / 4096.0) AS BIGINT) AS bin_id
  FROM d)
SELECT lang, bin_id,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM b GROUP BY 1, 2
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
    "token_entropy": """
WITH toks AS (
  SELECT doc_id, t.tok
  FROM (SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        FROM documents) t),
tf AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM tf GROUP BY 1),
ent AS (
  SELECT tf.doc_id,
         CAST(max(n) AS BIGINT) AS n_tokens,
         floor(CAST(sum(CAST(-(c / n) * log2(c / n) AS DECIMAL(30,8)))
                    AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS entropy
  FROM tf JOIN tot ON tf.doc_id = tot.doc_id
  GROUP BY 1)
SELECT doc_id, n_tokens, entropy FROM ent WHERE entropy < 4.5
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
    "bigram_pmi": """
WITH toks AS (
  SELECT doc_id,
         generate_subscripts(regexp_extract_all(lower(text), '[a-z]+'), 1)
           AS pos,
         unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
  FROM documents),
pairs AS (
  SELECT tok AS tok_a,
         lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS tok_b
  FROM toks),
c_ab AS (
  SELECT tok_a, tok_b, count(*) AS n_ab FROM pairs
  WHERE tok_b IS NOT NULL GROUP BY 1, 2 HAVING count(*) >= 5),
uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM toks)
SELECT tok_a, tok_b, CAST(n_ab AS BIGINT) AS n_ab,
       floor(log2(n_ab * n_total / (a.n * b.n)) * 10000.0 + 0.5) / 10000.0
         AS pmi
FROM c_ab JOIN uni a ON c_ab.tok_a = a.tok
          JOIN uni b ON c_ab.tok_b = b.tok
          CROSS JOIN tot
ORDER BY pmi DESC, tok_a ASC, tok_b ASC
LIMIT 20
""",
    "corpus_to_sequences": """
WITH gated AS (SELECT * FROM documents WHERE n_chars >= 200),
grid AS (
  SELECT doc_id, lang, text,
         CAST(unnest(generate_series(0,
           CAST(greatest(ceil((n_chars - 400) / 300.0), 0) AS INT))) AS INT)
           AS chunk_id
  FROM gated),
chunks AS (
  SELECT doc_id, lang, chunk_id,
         CAST(length(substr(text, chunk_id * 300 + 1, 400)) AS BIGINT)
           AS chunk_len,
         md5(substr(text, chunk_id * 300 + 1, 400)) AS chunk_hash
  FROM grid
  WHERE length(substr(text, chunk_id * 300 + 1, 400)) >= 50),
uniq AS (
  SELECT doc_id, lang, chunk_id, chunk_len FROM (
    SELECT *, row_number() OVER (PARTITION BY chunk_hash
                                 ORDER BY doc_id ASC, chunk_id ASC) AS rn
    FROM chunks) WHERE rn = 1),
binned AS (
  SELECT lang, doc_id, chunk_len,
         CAST(floor(coalesce(sum(chunk_len) OVER (
             PARTITION BY lang ORDER BY doc_id, chunk_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           / 4096.0) AS BIGINT) AS bin_id
  FROM uniq)
SELECT lang, bin_id,
       count(*) AS n_chunks,
       CAST(sum(chunk_len) AS BIGINT) AS bin_chars,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM binned GROUP BY 1, 2
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
    # streaming ingest of the same deterministic page arithmetic,
    # aggregated per fetch day
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
    # literal QUALIFY form (DuckDB has the keyword; Spark runs the
    # canonical filter-on-window rewrite) — same decimal revenue, same
    # (revenue desc, name) tiebreak
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
    # identical correlated scalar subquery (DuckDB decorrelates too)
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
    # DuckDB's native UNPIVOT syntax over the identical wide aggregate
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
    # bucket = #breakpoints <= price (bisect_right), as a CASE ladder
    "pandas_iter_udf": """
WITH b AS (
  SELECT CAST((o_totalprice >= 50000.0)::INT
              + (o_totalprice >= 100000.0)::INT
              + (o_totalprice >= 200000.0)::INT
              + (o_totalprice >= 400000.0)::INT AS INT) AS bucket,
         o_totalprice AS p
  FROM orders)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(p * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM b GROUP BY 1
""",
    # exact integer cents per nation — order-independent sums
    "grouped_arrow_stats": """
WITH c AS (SELECT c_nationkey,
                  CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)
                    AS cents
           FROM customer)
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(cents) AS BIGINT) AS sum_cents,
       CAST(min(cents) AS BIGINT) AS min_cents,
       CAST(max(cents) AS BIGINT) AS max_cents
FROM c GROUP BY 1
""",
    # the dedup of a verbatim replay is batch DISTINCT == the table
    "streaming_dedup_watermark": """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_value_cents
FROM events GROUP BY 1
""",
    "sentence_dedup": """
WITH docs AS (SELECT * FROM documents WHERE doc_id < 200),
sents AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, '. '), 1) AS pos,
         unnest(string_split(text, '. ')) AS sent
  FROM docs),
f AS (SELECT * FROM sents WHERE length(sent) > 0),
kept AS (
  SELECT doc_id, pos, sent FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(sent)
                                 ORDER BY doc_id, pos) AS rn
    FROM f) WHERE rn = 1)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_kept,
       md5(string_agg(sent, '. ' ORDER BY pos)) AS clean_hash,
       CAST(length(string_agg(sent, '. ' ORDER BY pos)) AS BIGINT)
         AS clean_len
FROM kept GROUP BY 1
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
    "approx_topk_types": """
SELECT event_type, CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1
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
    "c4_boilerplate_filter": """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
chunks AS (
  SELECT doc_id,
         unnest(generate_series(0,
             CAST(floor((len(t) - 1) / 10) AS INT))) AS pos,
         t
  FROM toks),
lines AS (
  SELECT doc_id, pos, list_slice(t, pos * 10 + 1, pos * 10 + 10) AS line
  FROM chunks),
kept AS (
  SELECT * FROM lines
  WHERE len(line) = 10
    AND len(list_filter(line, x -> length(x) <= 1)) <= 2)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_lines_kept,
       md5(string_agg(array_to_string(line, ' '), ' ' ORDER BY pos))
         AS clean_hash
FROM kept GROUP BY 1
HAVING count(*) >= 2
""",
    "cogrouped_pandas_join": """
WITH o AS (
  SELECT o_custkey AS key,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
              AS DOUBLE) / 100.0 AS spend
  FROM orders GROUP BY 1),
e AS (
  SELECT user_id AS key, CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1)
SELECT coalesce(o.key, e.key) AS key,
       coalesce(o.n_orders, 0) AS n_orders,
       coalesce(e.n_events, 0) AS n_events,
       coalesce(o.spend, 0.0) AS spend
FROM o FULL OUTER JOIN e ON o.key = e.key
""",
    "arrow_map_batches": """
WITH t AS (
  SELECT lang, len(string_split(text, ' ')) AS n_tokens FROM documents)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(max(n_tokens) AS BIGINT) AS max_tokens
FROM t GROUP BY 1
""",
    "xml_roundtrip": """
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
            AS BIGINT) AS total_cents,
       min(o_orderkey) AS first_key
FROM orders GROUP BY 1
""",
    "fuzzy_dedup_blocked": """
SELECT a.c_nationkey AS nation,
       CAST(count(*) AS BIGINT) AS n_fuzzy_pairs,
       min(a.c_custkey) AS first_left
FROM customer a JOIN customer b
  ON a.c_nationkey = b.c_nationkey
 AND substring(a.c_name, 1, 12) = substring(b.c_name, 1, 12)
 AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 2
GROUP BY 1
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
    "domain_mix_resample": """
WITH c AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY 1),
t AS (SELECT sum(n_lang) AS total, count(*) AS n_l FROM c),
r AS (SELECT lang, n_lang,
             least(1.0, (CAST(total AS DOUBLE) / n_l) / n_lang) AS rate
      FROM c, t),
rr AS (SELECT lang, n_lang, rate,
              CASE WHEN rate >= 1.0 THEN 'g'
                   ELSE printf('%04x',
                        least(65535,
                              CAST(floor(rate * 65536.0 + 0.5) AS INT)))
              END AS thr
       FROM r)
SELECT d.lang,
       CAST(max(rr.n_lang) AS BIGINT) AS n_before,
       CAST(count(*) AS BIGINT) AS n_kept,
       floor(max(rr.rate) * 10000.0 + 0.5) / 10000.0 AS rate
FROM documents d JOIN rr ON d.lang = rr.lang
WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < rr.thr
GROUP BY 1
""",
    "hybrid_rrf_retrieval": _rrf_sql(),
    "cluster_safe_split": _cluster_split_sql(
        {"train": 0.8, "val": 0.1, "test": 0.1}
    ),
    "ann_recall_at_k": _ann_recall_sql(),
    "bpe_train_merges": _bpe_train_sql(8),
    "bpe_encode_corpus": _bpe_encode_sql(8),
    # mirror of functions/sampling.py::pack_training_batches: a plain
    # global sort window here — the Spark side's two-phase bucket
    # ranking is provably identical because the bucket is a PREFIX of
    # the ordering hash
    "training_batch_pack": """
WITH r AS (SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS h
           FROM documents),
i AS (SELECT doc_id, lang,
             row_number() OVER (ORDER BY h ASC, doc_id ASC) - 1 AS gi
      FROM r)
SELECT doc_id, lang,
       CAST(gi AS BIGINT) AS global_idx,
       CAST(gi // 32 AS BIGINT) AS batch_id,
       CAST(gi % 32 AS BIGINT) AS position
FROM i
""",
    # mirror of functions/profile.py::corpus_fingerprint: same row
    # hash (concat_ws skips NULLs in both engines), same hex-prefix
    # tree (6 -> 3 -> root), digests sorted by VALUE inside each node
    "corpus_fingerprint": """
WITH r AS (
  SELECT sha256(concat_ws(chr(1), CAST(doc_id AS VARCHAR), text, lang,
                          source, CAST(n_chars AS VARCHAR))) AS h
  FROM documents),
a6 AS (SELECT substr(h, 1, 6) AS p,
       sha256(string_agg(h, '' ORDER BY h)) AS d,
       count(*) AS n
       FROM r GROUP BY 1),
a3 AS (SELECT substr(p, 1, 3) AS p,
       sha256(string_agg(d, '' ORDER BY d)) AS d,
       sum(n) AS n
       FROM a6 GROUP BY 1)
SELECT CAST(sum(n) AS BIGINT) AS n_rows,
       sha256(string_agg(d, '' ORDER BY d)) AS fingerprint
FROM a3
""",
    # mirror of functions/profile.py::fingerprint_diff over the same
    # deterministic mutation the Spark key applies
    "fingerprint_diff": """
WITH lt AS (SELECT doc_id, text, lang, source, n_chars FROM documents),
rt AS (SELECT doc_id,
              CASE WHEN doc_id = 117 THEN 'tampered' ELSE text END AS text,
              lang, source, n_chars
       FROM documents WHERE doc_id != 3),
lh AS (SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS prefix,
              sha256(concat_ws(chr(1), CAST(doc_id AS VARCHAR), text, lang,
                               source, CAST(n_chars AS VARCHAR))) AS h
       FROM lt),
rh AS (SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS prefix,
              sha256(concat_ws(chr(1), CAST(doc_id AS VARCHAR), text, lang,
                               source, CAST(n_chars AS VARCHAR))) AS h
       FROM rt),
ll AS (SELECT prefix, sha256(string_agg(h, '' ORDER BY h)) AS d,
              count(*) AS n
       FROM lh GROUP BY 1),
rl AS (SELECT prefix, sha256(string_agg(h, '' ORDER BY h)) AS d,
              count(*) AS n
       FROM rh GROUP BY 1)
SELECT coalesce(ll.prefix, rl.prefix) AS prefix,
       CASE WHEN ll.d IS NULL THEN 'only_right'
            WHEN rl.d IS NULL THEN 'only_left'
            ELSE 'changed' END AS status,
       CAST(coalesce(ll.n, 0) AS BIGINT) AS n_left,
       CAST(coalesce(rl.n, 0) AS BIGINT) AS n_right
FROM ll FULL OUTER JOIN rl ON ll.prefix = rl.prefix
WHERE ll.d IS NULL OR rl.d IS NULL OR ll.d != rl.d
""",
    # mirror of functions/sampling.py::length_bucketed_batches: plain
    # per-band sort window here; the Spark side's per-(band, hash-
    # bucket) two-phase ranking is identical because the bucket is a
    # prefix of the ordering hash
    "length_bucketed_batches": """
WITH d AS (SELECT doc_id,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           FROM documents),
b AS (SELECT doc_id, n_tokens,
             CAST(n_tokens // 64 AS BIGINT) AS len_bucket,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM d),
i AS (SELECT doc_id, n_tokens, len_bucket,
             row_number() OVER (PARTITION BY len_bucket
                                ORDER BY h ASC, doc_id ASC) - 1 AS gi
      FROM b)
SELECT doc_id, n_tokens, len_bucket,
       CAST(gi // 16 AS BIGINT) AS batch_id,
       CAST(gi % 16 AS BIGINT) AS position
FROM i
""",
    # mirror of text/dedup.py::repeated_substrings (same gram length,
    # same content-defined md5-prefix sample, per-doc distinct)
    "repeated_substrings": """
WITH g AS (
  SELECT doc_id, md5(substr(text, i, 40)) AS h
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, len(text) - 39)) AS i
        FROM documents WHERE len(text) >= 40)),
s AS (SELECT DISTINCT doc_id, h FROM g WHERE substr(h, 1, 1) < '4')
SELECT h AS gram_hash,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS first_doc
FROM s GROUP BY 1 HAVING count(*) >= 2
""",
    # BATCH mirror of the streamed incremental Merkle maintenance: one
    # digest pass over the whole corpus at the same prefix level — if
    # the touched-bucket-only recompute path diverges from a full
    # rebuild in any way, the digests cannot match
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
    # sqrt is IEEE-correctly-rounded in both engines, so the alpha=0.5
    # temperature rates are bit-identical (pow would not guarantee it)
    "temperature_mix_resample": """
WITH c AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY 1),
t AS (SELECT sum(n_lang) AS total,
             sum(sqrt(CAST(n_lang AS DOUBLE))) AS sum_sqrt
      FROM c),
r AS (SELECT lang, n_lang,
             least(1.0, (sqrt(CAST(n_lang AS DOUBLE)) / sum_sqrt
                         * CAST(total AS DOUBLE)) / n_lang) AS rate
      FROM c, t),
rr AS (SELECT lang, n_lang, rate,
              CASE WHEN rate >= 1.0 THEN 'g'
                   ELSE printf('%04x',
                        least(65535,
                              CAST(floor(rate * 65536.0 + 0.5) AS INT)))
              END AS thr
       FROM r)
SELECT d.lang,
       CAST(max(rr.n_lang) AS BIGINT) AS n_before,
       CAST(count(*) AS BIGINT) AS n_kept,
       floor(max(rr.rate) * 10000.0 + 0.5) / 10000.0 AS rate
FROM documents d JOIN rr ON d.lang = rr.lang
WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < rr.thr
GROUP BY 1
""",
    # banded exact-cosine mirror of q_hard_negative_mining
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
    "doc_novelty": "WITH "
    + _SHINGLES_SQL.strip()
    + """,
dfc AS (SELECT shingle, count(*) AS df FROM shingles GROUP BY 1)
SELECT s.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN dfc.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unique,
       floor(CAST(sum(CASE WHEN dfc.df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) * 10000.0 + 0.5) / 10000.0 AS novelty
FROM shingles s JOIN dfc USING (shingle) GROUP BY 1
""",
    "corpus_funnel": _funnel_sql(),
    # mirror of text/dedup.py::winnowed_fingerprints (same gram length,
    # same window minima; list_slice end is INCLUSIVE in DuckDB, hence
    # j + 7 for the 8-wide window)
    "winnowed_duplicates": """
WITH g AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(text) - 29),
                        i -> md5(substr(text, i, 30))) AS ha
  FROM documents WHERE len(text) >= 37),
w AS (
  SELECT doc_id,
         unnest(list_distinct(
           list_transform(generate_series(1, len(ha) - 7),
                          j -> list_min(list_slice(ha, j, j + 7)))))
           AS fingerprint
  FROM g)
SELECT fingerprint,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS first_doc
FROM w GROUP BY 1 HAVING count(*) >= 2
""",
    # mirror of q_domain_blocklist_filter: same label-boundary suffix
    # chain, same sorted-first-match rule
    "domain_blocklist_filter": """
WITH d AS (
  SELECT doc_id, source || '.example.com' AS host FROM documents),
sx AS (
  SELECT doc_id, host,
         list_sort(list_intersect(
           list_transform(
             generate_series(0, len(string_split(host, '.')) - 1),
             i -> array_to_string(
                    list_slice(string_split(host, '.'), i + 1,
                               len(string_split(host, '.'))), '.')),
           ['bad.example.org', 'src3.example.com', 'src7.example.com']))
           AS matched
  FROM d)
SELECT doc_id, host,
       (len(matched) > 0) AS blocked,
       CASE WHEN len(matched) > 0 THEN matched[1] END AS matched_rule
FROM sx
""",
    # mirror of q_embedding_dim_stats: decimal sums -> one double
    # division; sqrt correctly rounded in both engines
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
    "vocab_growth": "WITH "
    + _SHINGLES_SQL.strip()
    + """,
f AS (SELECT shingle, min(doc_id) AS first_doc FROM shingles GROUP BY 1),
pd AS (SELECT first_doc AS doc_id, count(*) AS new_grams
       FROM f GROUP BY 1)
SELECT d.doc_id,
       CAST(coalesce(pd.new_grams, 0) AS BIGINT) AS new_grams,
       CAST(sum(coalesce(pd.new_grams, 0)) OVER (
              ORDER BY d.doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_vocab
FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
""",
    "kmeans_cluster_profile": _kmeans_profile_sql(),
    "ann_topk_multiprobe": _lsh_multiprobe_sql(),
    "lang_confusion": _lang_confusion_sql(),
    "quality_outliers": _quality_outliers_sql(),
    # 2^-k decay with INTEGER k is exact in IEEE doubles, so the decay
    # factors (and the decimal-cast weighted sum) are bit-identical
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
    "rerank_crossencoder": _rerank_sql(),
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
    "dedup_rate_by_source": "WITH RECURSIVE "
    + _SHINGLES_SQL.strip()
    + ","
    + _CLUSTER_CTES
    + """,
cl AS (SELECT id AS doc_id FROM reach GROUP BY id
       HAVING id != min(r)),
ex AS (SELECT doc_id, source,
              count(*) OVER (
                PARTITION BY sha256(trim(regexp_replace(lower(text),
                                                        '\\s+', ' ', 'g')))
              ) > 1 AS is_exact_dup
       FROM documents)
SELECT ex.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN ex.is_exact_dup THEN 1 ELSE 0 END) AS BIGINT)
         AS n_exact_dup,
       CAST(sum(CASE WHEN cl.doc_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_near_dup_dropped
FROM ex LEFT JOIN cl ON ex.doc_id = cl.doc_id
GROUP BY 1
""",
    "corpus_release": _corpus_release_sql(
        {"train": 0.8, "val": 0.1, "test": 0.1}
    ),
    "embedding_pca_power": _pca_power_sql(),
    "ols_event_model": _ols_event_sql(),
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
    "token_budget_plan": """
WITH per AS (
  SELECT source,
         CAST(sum(len(regexp_split_to_array(trim(text), '\\s+')))
              AS BIGINT) AS tokens
  FROM documents GROUP BY 1),
tot AS (
  SELECT sum(tokens) AS total,
         CAST(sum(CAST(sqrt(CAST(tokens AS DOUBLE)) AS DECIMAL(38,18)))
              AS DOUBLE) AS sum_sqrt
  FROM per),
st AS (
  SELECT source, tokens, (total - (total % 2)) AS b2,
         sqrt(CAST(tokens AS DOUBLE)) AS sq, sum_sqrt
  FROM per, tot),
f1 AS (
  SELECT source, tokens, b2,
         least(CAST(tokens AS DOUBLE), sq / sum_sqrt * (b2 / 2)) AS alloc1
  FROM st),
f1h AS (SELECT f1.*, CAST(tokens AS DOUBLE) - alloc1 AS headroom FROM f1),
t2 AS (
  SELECT CAST(sum(CAST(alloc1 AS DECIMAL(38,18))) AS DOUBLE) AS sum_a1,
         CAST(sum(CAST(headroom AS DECIMAL(38,18))) AS DOUBLE) AS sum_hr
  FROM f1h),
fin AS (
  SELECT source, tokens,
         least(CAST(tokens AS DOUBLE),
               alloc1 + (b2 / 2 - sum_a1) * headroom / sum_hr) AS alloc2
  FROM f1h, t2)
SELECT source, tokens,
       CAST(floor(floor(alloc2 * 1000000.0 + 0.5) / 1000000.0) AS BIGINT)
         AS alloc_tokens,
       floor(CAST(floor(floor(alloc2 * 1000000.0 + 0.5) / 1000000.0)
                  AS DOUBLE) / CAST(tokens AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS epochs
FROM fin
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
    "quantile_normalize_scores": f"""
WITH sc AS (
  SELECT doc_id, source, {_QUALITY_SQL} AS score FROM documents),
g AS (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score, doc_id) AS grank
  FROM sc),
gn AS (SELECT count(*) AS n_g FROM sc),
s AS (
  SELECT doc_id, source, score,
         row_number() OVER (
           PARTITION BY source ORDER BY score, doc_id) AS rs,
         count(*) OVER (PARTITION BY source) AS ns
  FROM sc),
t AS (
  SELECT s.doc_id, s.source, s.score,
         CAST(floor(
           (CASE WHEN s.ns = 1 THEN 0.5
                 ELSE CAST(s.rs - 1 AS DOUBLE) / CAST(s.ns - 1 AS DOUBLE)
            END) * CAST(gn.n_g - 1 AS DOUBLE) + 0.5
         ) AS BIGINT) + 1 AS ti
  FROM s, gn)
SELECT t.doc_id, t.source,
       floor(t.score * 10000.0 + 0.5) / 10000.0 AS score,
       floor(g.score * 10000.0 + 0.5) / 10000.0 AS norm_score
FROM t JOIN g ON g.grank = t.ti
""",
    "logreg_label_model": _logreg_sql(),
    "naive_bayes_lang": """
WITH toks AS MATERIALIZED (
  SELECT doc_id, lang AS true_lang,
         unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
  FROM documents),
tk AS (SELECT * FROM toks WHERE length(tok) > 0),
model AS MATERIALIZED (
  SELECT true_lang AS l, tok, count(*) AS c FROM tk GROUP BY 1, 2),
lang_tot AS (SELECT l, sum(c) AS t FROM model GROUP BY 1),
vocab AS (SELECT count(DISTINCT tok) AS v FROM model),
priors AS (SELECT lang AS l, count(*) AS nd FROM documents GROUP BY 1),
n_docs AS (SELECT count(*) AS n_all FROM documents),
lstats AS (
  SELECT lt.l,
         ln(CAST(p.nd AS DOUBLE) / n.n_all) AS lprior,
         ln(CAST(lt.t + v.v AS DOUBLE)) AS ldenom
  FROM lang_tot lt JOIN priors p ON p.l = lt.l, vocab v, n_docs n),
ntok AS (
  SELECT doc_id, true_lang, count(*) AS nt FROM tk GROUP BY 1, 2),
ssum AS (
  SELECT tk.doc_id, m.l,
         CAST(sum(CAST(ln(CAST(m.c + 1 AS DOUBLE)) AS DECIMAL(38,18)))
              AS DOUBLE) AS s
  FROM tk JOIN model m ON m.tok = tk.tok
  GROUP BY 1, 2),
scored AS (
  SELECT ntok.doc_id, ntok.true_lang, ls.l,
         floor((ls.lprior - CAST(ntok.nt AS DOUBLE) * ls.ldenom
                + coalesce(ss.s, 0.0)) * 1000000000.0 + 0.5)
           / 1000000000.0 AS score
  FROM ntok CROSS JOIN lstats ls
  LEFT JOIN ssum ss ON ss.doc_id = ntok.doc_id AND ss.l = ls.l),
pred AS (
  SELECT true_lang, l AS pred_lang,
         row_number() OVER (
           PARTITION BY doc_id ORDER BY score DESC, l) AS rn
  FROM scored)
SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n
FROM pred WHERE rn = 1 GROUP BY 1, 2
""",
    "chi2_feature_selection": """
WITH dtok AS MATERIALIZED (
  SELECT DISTINCT doc_id, lang AS l,
         unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
  FROM documents),
tk AS (SELECT * FROM dtok WHERE length(tok) > 0),
a_df AS (SELECT l, tok, count(*) AS a FROM tk GROUP BY 1, 2),
t_df AS (SELECT tok, sum(a) AS df_t FROM a_df GROUP BY 1),
n_l AS (SELECT lang AS l, count(*) AS nl FROM documents GROUP BY 1),
n_all AS (SELECT count(*) AS n_all FROM documents),
cells AS (
  SELECT a_df.l, a_df.tok,
         CAST(a_df.a AS DOUBLE) AS ad,
         CAST(t_df.df_t - a_df.a AS DOUBLE) AS bd,
         CAST(n_l.nl - a_df.a AS DOUBLE) AS cd,
         CAST(n_all.n_all - n_l.nl - t_df.df_t + a_df.a AS DOUBLE) AS dd,
         CAST(n_all.n_all AS DOUBLE) AS nn,
         CAST(a_df.a AS BIGINT) AS df_in_lang
  FROM a_df
  JOIN t_df ON t_df.tok = a_df.tok
  JOIN n_l ON n_l.l = a_df.l, n_all
  WHERE t_df.df_t >= 5),
ranked AS (
  SELECT l, tok, df_in_lang,
         floor((nn * (ad * dd - bd * cd) * (ad * dd - bd * cd)
                / ((ad + bd) * (cd + dd) * (ad + cd) * (bd + dd)))
               * 10000.0 + 0.5) / 10000.0 AS chi2
  FROM cells),
topk AS (
  SELECT l, tok, df_in_lang, chi2,
         row_number() OVER (
           PARTITION BY l ORDER BY chi2 DESC, tok) AS rn
  FROM ranked)
SELECT l AS lang, tok, df_in_lang, chi2, CAST(rn AS BIGINT) AS rank
FROM topk WHERE rn <= 10
""",
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
    "l_diversity_audit": """
SELECT CAST(c_nationkey AS INT) AS nation,
       CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_band,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS distinct_segments,
       CAST(CASE WHEN count(DISTINCT c_mktsegment) >= 3
                 THEN 1 ELSE 0 END AS INT) AS is_diverse
FROM customer GROUP BY 1, 2
""",
    "attribution_last_touch": """
WITH conv AS (
  SELECT event_id, user_id, ts, value FROM events
  WHERE event_type = 'purchase'),
touch AS (
  SELECT event_id, user_id, ts, event_type AS touch_type FROM events
  WHERE event_type != 'purchase'),
cand AS (
  SELECT c.event_id AS conv_id, c.value, t.touch_type,
         row_number() OVER (
           PARTITION BY c.event_id
           ORDER BY t.ts DESC, t.event_id DESC) AS rn
  FROM conv c
  JOIN touch t
    ON t.user_id = c.user_id AND t.ts <= c.ts),
best AS (SELECT conv_id, touch_type FROM cand WHERE rn = 1),
attr AS (
  SELECT coalesce(b.touch_type, '(direct)') AS touch_type, c.value
  FROM conv c LEFT JOIN best b ON b.conv_id = c.event_id)
SELECT touch_type,
       CAST(count(*) AS BIGINT) AS n_conversions,
       floor(CAST(sum(CAST(value AS DECIMAL(38,18))) AS DOUBLE)
             * 100.0 + 0.5) / 100.0 AS attributed_value
FROM attr GROUP BY 1
""",
    "cusum_drift": """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS x
  FROM events GROUP BY 1, 2),
mu AS (
  SELECT event_type,
         CAST(sum(CAST(x AS DECIMAL(38,18))) AS DOUBLE) / count(*) AS mu
  FROM daily GROUP BY 1),
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
    "bootstrap_ci_mean": _bootstrap_sql(),
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
    "survival_km": """
WITH su AS (
  SELECT user_id, min(ts) AS signup_ts FROM events
  WHERE event_type = 'signup' GROUP BY 1),
fp AS (
  SELECT su.user_id, su.signup_ts, min(e.ts) AS event_ts
  FROM su
  LEFT JOIN events e
    ON e.user_id = su.user_id
   AND e.event_type = 'purchase'
   AND e.ts > su.signup_ts
  GROUP BY 1, 2),
hz AS (SELECT max(CAST(ts AS DATE)) AS hday FROM events),
durations AS (
  SELECT user_id,
         CAST(CASE WHEN event_ts IS NOT NULL
              THEN datediff('day', CAST(signup_ts AS DATE),
                            CAST(event_ts AS DATE))
              ELSE datediff('day', CAST(signup_ts AS DATE), hday)
              END AS INT) AS t,
         CASE WHEN event_ts IS NOT NULL THEN 1 ELSE 0 END AS is_event
  FROM fp, hz),
day_level AS (
  SELECT t, CAST(sum(is_event) AS BIGINT) AS d,
         CAST(sum(1 - is_event) AS BIGINT) AS c,
         CAST(count(*) AS BIGINT) AS n_t
  FROM durations GROUP BY 1),
tot AS (SELECT count(*) AS n_total FROM durations),
risk AS (
  SELECT t, d, c,
         CAST(n_total - coalesce(sum(n_t) OVER (
           ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
           AND 1 PRECEDING), 0) AS BIGINT) AS at_risk
  FROM day_level, tot),
surv AS (
  SELECT t, d, c, at_risk,
         CASE WHEN max(CASE WHEN d = at_risk THEN 1 ELSE 0 END)
                   OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) = 1
              THEN 0.0
              ELSE exp(sum(ln(
                     CASE WHEN 1.0 - CAST(d AS DOUBLE)
                               / CAST(at_risk AS DOUBLE) > 0
                          THEN 1.0 - CAST(d AS DOUBLE)
                               / CAST(at_risk AS DOUBLE)
                          ELSE 1.0 END))
                   OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW))
         END AS s_raw
  FROM risk)
SELECT t AS day, at_risk AS n_at_risk, d AS n_events, c AS n_censored,
       floor(s_raw * 1000000.0 + 0.5) / 1000000.0 AS survival
FROM surv
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
    # Bloom-pruned join: the filter is conservative and the exact join
    # removes false positives, so the oracle is simply the PLAIN join —
    # row-identical by construction, which is the point of the check.
    "bloom_prune_join": """
SELECT substring(CAST(o.o_orderdate AS VARCHAR), 1, 7) AS order_month,
       CAST(count(*) AS BIGINT) AS n_items,
       floor((CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                            AS DECIMAL(30,8))) AS DOUBLE)) * 100.0 + 0.5)
         / 100.0 AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY 1
""",
    # column-level profile: native-type min/max rendered to string
    # AFTER aggregation (no lexicographic min over numerics)
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
    # equi-width histogram: identical IEEE bucket arithmetic both sides
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
    # the streamed fold must equal the full recompute — same oracle
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
    # mergeable incremental profile: merged state must equal a full
    # recompute, so the oracle IS the full profile with TRUE pinned
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
    # seasonality-aware anomaly: per-(type, weekday-slot) baseline,
    # weekday by pure integer date arithmetic, identical z expressions
    "seasonal_anomaly": """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS x
  FROM events GROUP BY 1, 2),
wk AS (SELECT *, (day - DATE '2024-01-01') % 7 AS wd FROM daily),
base AS (
  SELECT event_type, wd, CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CAST(x AS DECIMAL(38,18))) AS DOUBLE) AS s,
         CAST(sum(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE) AS q
  FROM wk GROUP BY 1, 2),
j AS (SELECT w.event_type, w.day, w.x, b.n, b.s, b.q
      FROM wk w JOIN base b
        ON w.event_type = b.event_type AND w.wd = b.wd),
z AS (SELECT event_type, day, x,
             CASE WHEN (q / n - (s / n) * (s / n)) <= 0 THEN 0.0
                  ELSE (x - s / n) / sqrt(q / n - (s / n) * (s / n))
             END AS zv
      FROM j)
SELECT event_type, CAST(day AS VARCHAR) AS day,
       CAST(x AS BIGINT) AS n_events,
       floor(zv * 10000.0 + 0.5) / 10000.0 AS z,
       abs(floor(zv * 10000.0 + 0.5) / 10000.0) > 2.0 AS is_anomaly
FROM z
""",
    # many-models: per-segment closed-form OLS from one moment
    # aggregation; identical decimal sums + IEEE double algebra
    "per_group_ols": """
WITH d AS (
  SELECT c.c_mktsegment AS segment, c.c_acctbal AS x,
         o.o_totalprice AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
m AS (
  SELECT segment, CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CAST(x AS DECIMAL(38,18))) AS DOUBLE) AS sx,
         CAST(sum(CAST(y AS DECIMAL(38,18))) AS DOUBLE) AS sy,
         CAST(sum(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(x * y AS DECIMAL(38,18))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(y * y AS DECIMAL(38,18))) AS DOUBLE) AS syy
  FROM d GROUP BY 1)
SELECT segment, CAST(n AS BIGINT) AS n,
       floor(((n * sxy - sx * sy) / (n * sxx - sx * sx)) * 1000000.0
             + 0.5) / 1000000.0 AS slope,
       floor(((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
              / n) * 100.0 + 0.5) / 100.0 AS intercept,
       floor(((n * sxy - sx * sy) * (n * sxy - sx * sy)
              / ((n * sxx - sx * sx) * (n * syy - sy * sy)))
             * 1000000.0 + 0.5) / 1000000.0 AS r2
FROM m
""",
    # RTBF under concurrent appends: registry = banded subjects seen
    # before wave 3; visible = rows whose user never entered the
    # registry (waves 1-2 erased via DV, wave 3 filtered on append).
    # A banded user FIRST seen in wave 3 stays visible — the registry,
    # not the hash band, is the erasure authority.
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
    "ab_test_report": """
WITH pu AS (
  SELECT user_id,
         CAST(sum(CAST(value AS DECIMAL(38,18))) AS DOUBLE)
           AS user_value,
         CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 4)
                   < '8000' THEN 'A' ELSE 'B' END AS arm
  FROM events WHERE event_type = 'purchase' GROUP BY 1),
arms AS (
  SELECT arm, count(*) AS n,
         CAST(sum(CAST(user_value AS DECIMAL(38,18))) AS DOUBLE) AS s1,
         CAST(sum(CAST(user_value * user_value AS DECIMAL(38,18)))
              AS DOUBLE) AS s2
  FROM pu GROUP BY 1),
j AS (
  SELECT a.n AS na, a.s1 AS sa, a.s2 AS qa,
         b.n AS nb, b.s1 AS sb, b.s2 AS qb
  FROM (SELECT * FROM arms WHERE arm = 'A') a,
       (SELECT * FROM arms WHERE arm = 'B') b),
m AS (
  SELECT na, nb,
         sa / na AS mean_a, sb / nb AS mean_b,
         (qa / na - (sa / na) * (sa / na)) * (na / (na - 1.0)) AS va,
         (qb / nb - (sb / nb) * (sb / nb)) * (nb / (nb - 1.0)) AS vb
  FROM j)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       floor(mean_a * 10000.0 + 0.5) / 10000.0 AS mean_a,
       floor(mean_b * 10000.0 + 0.5) / 10000.0 AS mean_b,
       floor((mean_b - mean_a) * 10000.0 + 0.5) / 10000.0 AS lift,
       floor((mean_a - mean_b) / sqrt(va / na + vb / nb)
             * 10000.0 + 0.5) / 10000.0 AS welch_t
FROM m
""",
    "psi_drift_report": f"""
WITH scored AS (
  SELECT source,
         (substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '8000')
           AS is_ref,
         least(CAST(floor(({_QUALITY_SQL}) * 10) AS INT), 9) AS bkt
  FROM documents),
cells AS (
  SELECT source, is_ref, bkt, count(*) AS c
  FROM scored GROUP BY 1, 2, 3),
tots AS (
  SELECT source, is_ref, sum(c) AS n FROM cells GROUP BY 1, 2),
grid AS (
  SELECT s.source, b.b AS bkt, r.r AS is_ref
  FROM (SELECT DISTINCT source FROM cells) s,
       range(10) b(b), (VALUES (TRUE), (FALSE)) r(r)),
dense AS (
  SELECT g.source, g.is_ref, g.bkt,
         greatest(CAST(coalesce(c.c, 0) AS DOUBLE)
                  / CAST(t.n AS DOUBLE), 0.0001) AS p
  FROM grid g
  LEFT JOIN cells c
    ON c.source = g.source AND c.is_ref = g.is_ref AND c.bkt = g.bkt
  JOIN tots t ON t.source = g.source AND t.is_ref = g.is_ref)
SELECT r.source,
       floor(CAST(sum(CAST((c.p - r.p) * ln(c.p / r.p)
                           AS DECIMAL(38,18))) AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS psi
FROM (SELECT * FROM dense WHERE is_ref) r
JOIN (SELECT * FROM dense WHERE NOT is_ref) c
  ON c.source = r.source AND c.bkt = r.bkt
GROUP BY 1
""",
    "model_calibration_ece": _ece_sql(),
    "model_auc": _auc_sql(),
    "holt_forecast": """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS x
  FROM events GROUP BY 1, 2),
series AS (
  SELECT event_type, list(CAST(x AS DOUBLE) ORDER BY day) AS xs
  FROM daily GROUP BY 1),
ok AS (SELECT * FROM series WHERE len(xs) >= 3),
folded AS (
  SELECT event_type, CAST(len(xs) AS BIGINT) AS n_days,
         list_reduce(
           list_prepend([xs[1], xs[2] - xs[1]],
                        list_transform(xs[3:], x -> [x, 0.0])),
           (acc, x) -> [
             0.5 * x[1] + (1.0 - 0.5) * (acc[1] + acc[2]),
             0.25 * ((0.5 * x[1] + (1.0 - 0.5) * (acc[1] + acc[2]))
                     - acc[1]) + (1.0 - 0.25) * acc[2]
           ]) AS st
  FROM ok)
SELECT event_type, n_days,
       floor(CAST(st[1] AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS level,
       floor(CAST(st[2] AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS trend,
       floor((CAST(st[1] AS DOUBLE) + 7.0 * CAST(st[2] AS DOUBLE))
             * 10000.0 + 0.5) / 10000.0 AS forecast_7d
FROM folded
""",
    "conformal_interval": """
WITH feat AS (
  SELECT event_id, value AS y, hour(ts) AS h,
         ((datediff('day', DATE '1970-01-05', CAST(ts AS DATE)) % 7) + 7)
           % 7 AS d,
         (substring(md5(CAST(event_id AS VARCHAR)), 1, 4) < '8000')
           AS is_train
  FROM events),
a AS (
  SELECT count(*) AS n, sum(h) AS sh, sum(d) AS sd,
         sum(h * h) AS shh, sum(d * d) AS sdd, sum(h * d) AS shd,
         sum(CAST(y AS DECIMAL(38,18))) AS sy,
         sum(CAST(y * h AS DECIMAL(38,18))) AS shy,
         sum(CAST(y * d AS DECIMAL(38,18))) AS sdy
  FROM feat WHERE is_train),
m AS (
  SELECT CAST(n AS DOUBLE) AS nd, CAST(sh AS DOUBLE) AS shd_,
         CAST(sd AS DOUBLE) AS sdd_, CAST(shh AS DOUBLE) AS shhd,
         CAST(sdd AS DOUBLE) AS sddd, CAST(shd AS DOUBLE) AS shdd,
         CAST(sy AS DOUBLE) AS syd, CAST(shy AS DOUBLE) AS shyd,
         CAST(sdy AS DOUBLE) AS sdyd
  FROM a),
w AS (
  SELECT
    (syd*(shhd*sddd - shdd*shdd) - shd_*(shyd*sddd - shdd*sdyd)
     + sdd_*(shyd*shdd - shhd*sdyd))
    / (nd*(shhd*sddd - shdd*shdd) - shd_*(shd_*sddd - shdd*sdd_)
       + sdd_*(shd_*shdd - shhd*sdd_)) AS w0,
    (nd*(shyd*sddd - shdd*sdyd) - syd*(shd_*sddd - shdd*sdd_)
     + sdd_*(shd_*sdyd - shyd*sdd_))
    / (nd*(shhd*sddd - shdd*shdd) - shd_*(shd_*sddd - shdd*sdd_)
       + sdd_*(shd_*shdd - shhd*sdd_)) AS w1,
    (nd*(shhd*sdyd - shyd*shdd) - shd_*(shd_*sdyd - shyd*sdd_)
     + syd*(shd_*shdd - shhd*sdd_))
    / (nd*(shhd*sddd - shdd*shdd) - shd_*(shd_*sddd - shdd*sdd_)
       + sdd_*(shd_*shdd - shhd*sdd_)) AS w2
  FROM m),
scored AS (
  SELECT f.event_id, f.is_train,
         floor(abs(f.y - (w.w0 + w.w1 * CAST(f.h AS DOUBLE)
                          + w.w2 * CAST(f.d AS DOUBLE)))
               * 1000000000.0 + 0.5) / 1000000000.0 AS ar
  FROM feat f, w),
cal AS (SELECT * FROM scored WHERE NOT is_train),
ranked AS (
  SELECT ar, row_number() OVER (ORDER BY ar, event_id) AS r FROM cal),
nc AS (SELECT count(*) AS n_cal FROM cal),
qh AS (
  SELECT r.ar AS q_hat, nc.n_cal
  FROM ranked r, nc
  WHERE r.r = least(CAST(ceil(0.9 * CAST(nc.n_cal + 1 AS DOUBLE))
                         AS BIGINT), nc.n_cal))
SELECT CAST(count(*) AS BIGINT) AS n_train,
       CAST(max(qh.n_cal) AS BIGINT) AS n_cal,
       floor(max(qh.q_hat) * 10000.0 + 0.5) / 10000.0 AS q_hat,
       floor(CAST(sum(CASE WHEN s.ar <= qh.q_hat THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*) * 10000.0 + 0.5) / 10000.0
         AS coverage_train
FROM scored s, qh WHERE s.is_train
""",
    "gradient_boost_stumps": _gboost_sql(),
    "als_rank1": _als_rank1_sql(),
    "isotonic_calibration": _isotonic_sql(),
    "drift_fdr_control": f"""
WITH scored AS (
  SELECT source, doc_id,
         (substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '8000')
           AS is_ref,
         {_QUALITY_SQL} AS score
  FROM documents),
tot AS (
  SELECT source,
         sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS n_ref,
         sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS n_cur
  FROM scored GROUP BY 1),
cum AS (
  SELECT source,
         sum(CASE WHEN is_ref THEN 1 ELSE 0 END) OVER (
           PARTITION BY source ORDER BY score, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_ref,
         sum(CASE WHEN is_ref THEN 0 ELSE 1 END) OVER (
           PARTITION BY source ORDER BY score, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_cur
  FROM scored),
ks AS (
  SELECT c.source, t.n_ref, t.n_cur,
         max(abs(CAST(c.c_ref AS DOUBLE) / CAST(t.n_ref AS DOUBLE)
                 - CAST(c.c_cur AS DOUBLE) / CAST(t.n_cur AS DOUBLE)))
           AS ks
  FROM cum c JOIN tot t ON t.source = c.source
  GROUP BY 1, 2, 3),
lamd AS (
  SELECT source, ks,
         ks * sqrt(CAST(n_ref AS DOUBLE) * CAST(n_cur AS DOUBLE)
                   / CAST(n_ref + n_cur AS DOUBLE)) AS lam
  FROM ks),
tested AS (
  SELECT source,
         floor(ks * 1000000.0 + 0.5) / 1000000.0 AS ks_stat,
         least(greatest(floor((
             2.0 * exp(-2.0 * lam * lam)
             + -2.0 * exp(-8.0 * lam * lam)
             + 2.0 * exp(-18.0 * lam * lam)
             + -2.0 * exp(-32.0 * lam * lam)
             + 2.0 * exp(-50.0 * lam * lam)
           ) * 1000000000.0 + 0.5) / 1000000000.0, 0.0), 1.0) AS p9
  FROM lamd),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY p9, source) AS rank
  FROM tested),
m AS (SELECT count(*) AS m FROM ranked),
flagged AS (
  SELECT r.*, m.m,
         CASE WHEN r.p9 <= CAST(r.rank AS DOUBLE) * 0.1
                           / CAST(m.m AS DOUBLE)
              THEN r.rank ELSE 0 END AS qual
  FROM ranked r, m),
km AS (SELECT max(qual) AS kmax FROM flagged)
SELECT f.source, f.ks_stat,
       floor(f.p9 * 1000000.0 + 0.5) / 1000000.0 AS p_value,
       CAST(f.rank AS BIGINT) AS rank,
       CAST(CASE WHEN f.rank <= km.kmax THEN 1 ELSE 0 END AS INT)
         AS drift_flagged
FROM flagged f, km
""",
    "score_correlation": f"""
WITH xy AS (
  SELECT {_QUALITY_SQL} AS x, CAST(n_chars AS DOUBLE) AS y
  FROM documents),
a AS (
  SELECT count(*) AS n,
         CAST(sum(CAST(x AS DECIMAL(38,18))) AS DOUBLE) AS sx,
         CAST(sum(CAST(y AS DECIMAL(38,18))) AS DOUBLE) AS sy,
         CAST(sum(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(y * y AS DECIMAL(38,18))) AS DOUBLE) AS syy,
         CAST(sum(CAST(x * y AS DECIMAL(38,18))) AS DOUBLE) AS sxy
  FROM xy)
SELECT CAST(n AS BIGINT) AS n,
       floor((sxy - sx * sy / CAST(n AS DOUBLE))
             / sqrt((sxx - sx * sx / CAST(n AS DOUBLE))
                    * (syy - sy * sy / CAST(n AS DOUBLE)))
             * 1000000.0 + 0.5) / 1000000.0 AS pearson_r
FROM a
""",
    "vocab_gini": """
WITH toks AS (
  SELECT lang,
         unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
  FROM documents),
tk AS (SELECT * FROM toks WHERE length(tok) > 0),
counts AS (SELECT lang, tok, count(*) AS c FROM tk GROUP BY 1, 2),
ranked AS (
  SELECT lang, c,
         row_number() OVER (PARTITION BY lang ORDER BY c, tok) AS i
  FROM counts)
SELECT lang,
       CAST(count(*) AS BIGINT) AS vocab,
       floor((2.0 * CAST(sum(CAST(i * c AS DECIMAL(38,18))) AS DOUBLE)
              / (CAST(count(*) AS DOUBLE)
                 * CAST(sum(CAST(c AS DECIMAL(38,18))) AS DOUBLE))
              - CAST(count(*) + 1 AS DOUBLE) / CAST(count(*) AS DOUBLE))
             * 1000000.0 + 0.5) / 1000000.0 AS gini
FROM ranked GROUP BY 1
""",
    "spearman_correlation": f"""
WITH base AS (
  SELECT doc_id, {_QUALITY_SQL} AS x, CAST(n_chars AS DOUBLE) AS y
  FROM documents),
rx0 AS (
  SELECT doc_id, x, row_number() OVER (ORDER BY x, doc_id) AS r
  FROM base),
rx AS (
  SELECT doc_id,
         CAST(min(r) OVER (PARTITION BY x)
              + max(r) OVER (PARTITION BY x) AS DOUBLE) / 2.0 AS rx
  FROM rx0),
ry0 AS (
  SELECT doc_id, y, row_number() OVER (ORDER BY y, doc_id) AS r
  FROM base),
ry AS (
  SELECT doc_id,
         CAST(min(r) OVER (PARTITION BY y)
              + max(r) OVER (PARTITION BY y) AS DOUBLE) / 2.0 AS ry
  FROM ry0),
pairs AS (
  SELECT rx.rx, ry.ry FROM rx JOIN ry ON ry.doc_id = rx.doc_id),
a AS (
  SELECT count(*) AS n,
         CAST(sum(CAST(rx AS DECIMAL(38,18))) AS DOUBLE) AS sx,
         CAST(sum(CAST(ry AS DECIMAL(38,18))) AS DOUBLE) AS sy,
         CAST(sum(CAST(rx * rx AS DECIMAL(38,18))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(ry * ry AS DECIMAL(38,18))) AS DOUBLE) AS syy,
         CAST(sum(CAST(rx * ry AS DECIMAL(38,18))) AS DOUBLE) AS sxy
  FROM pairs)
SELECT CAST(n AS BIGINT) AS n,
       floor((sxy - sx * sy / CAST(n AS DOUBLE))
             / sqrt((sxx - sx * sx / CAST(n AS DOUBLE))
                    * (syy - sy * sy / CAST(n AS DOUBLE)))
             * 1000000.0 + 0.5) / 1000000.0 AS spearman_rho
FROM a
""",
    "benford_audit": """
WITH digits AS (
  SELECT CAST(floor(abs(o_totalprice)
              / pow(10.0, floor(log10(abs(o_totalprice))))) AS INT)
           AS d
  FROM orders WHERE abs(o_totalprice) > 0),
per AS (SELECT d, CAST(count(*) AS BIGINT) AS n FROM digits GROUP BY 1),
tot AS (SELECT sum(n) AS n_all FROM per)
SELECT d, n,
       floor(CAST(n AS DOUBLE) / CAST(n_all AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS observed_freq,
       floor(log10(1.0 + 1.0 / CAST(d AS DOUBLE))
             * 1000000.0 + 0.5) / 1000000.0 AS benford_freq,
       floor((CAST(n AS DOUBLE) - CAST(n_all AS DOUBLE)
              * log10(1.0 + 1.0 / CAST(d AS DOUBLE)))
             * (CAST(n AS DOUBLE) - CAST(n_all AS DOUBLE)
                * log10(1.0 + 1.0 / CAST(d AS DOUBLE)))
             / (CAST(n_all AS DOUBLE)
                * log10(1.0 + 1.0 / CAST(d AS DOUBLE)))
             * 10000.0 + 0.5) / 10000.0 AS chi2_contrib
FROM per, tot
""",
    "markov_prediction_accuracy": """
WITH p AS (
  SELECT user_id,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type,
         event_type AS next_type
  FROM events),
pairs AS (SELECT * FROM p WHERE prev_type IS NOT NULL),
cm AS (
  SELECT prev_type, next_type, count(*) AS n
  FROM pairs GROUP BY 1, 2),
model AS (
  SELECT prev_type, next_type AS predicted_next
  FROM (SELECT *, row_number() OVER (
          PARTITION BY prev_type ORDER BY n DESC, next_type) AS rn
        FROM cm) WHERE rn = 1)
SELECT pr.prev_type, m.predicted_next,
       CAST(count(*) AS BIGINT) AS n_transitions,
       floor(CAST(sum(CASE WHEN pr.next_type = m.predicted_next
                      THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
             * 10000.0 + 0.5) / 10000.0 AS accuracy
FROM pairs pr JOIN model m ON m.prev_type = pr.prev_type
GROUP BY 1, 2
""",
    "ks_drift_report": f"""
WITH scored AS (
  SELECT source, doc_id,
         (substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '8000')
           AS is_ref,
         {_QUALITY_SQL} AS score
  FROM documents),
tot AS (
  SELECT source,
         sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS n_ref,
         sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS n_cur
  FROM scored GROUP BY 1),
cum AS (
  SELECT source,
         sum(CASE WHEN is_ref THEN 1 ELSE 0 END) OVER (
           PARTITION BY source ORDER BY score, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_ref,
         sum(CASE WHEN is_ref THEN 0 ELSE 1 END) OVER (
           PARTITION BY source ORDER BY score, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_cur
  FROM scored),
diffs AS (
  SELECT c.source,
         abs(CAST(c.c_ref AS DOUBLE) / CAST(t.n_ref AS DOUBLE)
             - CAST(c.c_cur AS DOUBLE) / CAST(t.n_cur AS DOUBLE)) AS d
  FROM cum c JOIN tot t ON t.source = c.source)
SELECT source, floor(max(d) * 1000000.0 + 0.5) / 1000000.0 AS ks_stat
FROM diffs GROUP BY 1
""",
    "decision_stump": """
WITH feat AS (
  SELECT value AS y, CAST(hour(ts) AS INT) AS h FROM events),
tot AS (
  SELECT count(*) AS n,
         CAST(sum(CAST(y AS DECIMAL(38,18))) AS DOUBLE) AS sd,
         CAST(sum(CAST(y * y AS DECIMAL(38,18))) AS DOUBLE) AS qd
  FROM feat),
sides AS (
  SELECT CAST(t.c AS INT) AS c,
         CAST(sum(CASE WHEN f.h <= t.c THEN 1 ELSE 0 END) AS BIGINT)
           AS nl,
         CAST(sum(CASE WHEN f.h <= t.c
                  THEN CAST(f.y AS DECIMAL(38,18))
                  ELSE CAST(0.0 AS DECIMAL(38,18)) END) AS DOUBLE)
           AS sl
  FROM feat f, range(23) t(c) GROUP BY 1),
scored AS (
  SELECT tot.n, tot.sd, tot.qd, s.c, s.nl, s.sl,
         floor((tot.qd - (s.sl * s.sl) / CAST(s.nl AS DOUBLE)
                - ((tot.sd - s.sl) * (tot.sd - s.sl))
                  / CAST(tot.n - s.nl AS DOUBLE))
               * 1000000.0 + 0.5) / 1000000.0 AS sse
  FROM sides s, tot
  WHERE s.nl > 0 AND s.nl < tot.n),
best AS (
  SELECT *, row_number() OVER (ORDER BY sse, c) AS rn FROM scored)
SELECT CAST(c AS INT) AS split_hour,
       CAST(nl AS BIGINT) AS n_left,
       CAST(n - nl AS BIGINT) AS n_right,
       floor(sl / CAST(nl AS DOUBLE) * 10000.0 + 0.5) / 10000.0
         AS mean_left,
       floor((sd - sl) / CAST(n - nl AS DOUBLE) * 10000.0 + 0.5)
         / 10000.0 AS mean_right,
       floor(((qd - sd * sd / CAST(n AS DOUBLE)) - sse)
             * 10000.0 + 0.5) / 10000.0 AS sse_reduction
FROM best WHERE rn = 1
""",
    # Market-basket rules: the oracle takes the naive road the engine
    # avoids (distinct-item self-join per order) — identical pair
    # counts, both directions, exact integer ratios.
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
    # Leave-one-out target encoding: closed-form per-category stats of
    # the row-level (S - y_i)/(n - 1) encodings from one moment pass —
    # the oracle replays the identical algebra.
    "target_encode_loo": """
WITH d AS (
  SELECT c.c_mktsegment AS segment, o.o_totalprice AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
g AS (
  SELECT segment, CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS s,
         CAST(sum(CAST(y * y AS DECIMAL(38,12))) AS DOUBLE) AS q,
         min(y) AS y_min, max(y) AS y_max
  FROM d GROUP BY 1),
pr AS (
  SELECT CAST(sum(CAST(y AS DECIMAL(38,12))) AS DOUBLE) / count(*)
           AS _prior
  FROM d)
SELECT segment, CAST(n AS BIGINT) AS n,
       floor((s + 20.0 * _prior) / (n + 20.0) * 10000.0 + 0.5)
         / 10000.0 AS enc_smoothed,
       floor((s - y_max) / (n - 1) * 10000.0 + 0.5) / 10000.0
         AS loo_min,
       floor((s - y_min) / (n - 1) * 10000.0 + 0.5) / 10000.0
         AS loo_max,
       floor(((n - 2) * s * s + q) / (((n - 1) * (n - 1)) * n)
             * 10000.0 + 0.5) / 10000.0 AS loo_sq_mean
FROM g CROSS JOIN pr
""",
    # WOE / IV screening: ntile over the identical total order is
    # deterministic in both engines; +0.5 Laplace cells keep empty
    # bins finite; ln at 6 dp (log2-family precedent: bigram_pmi).
    "woe_iv_binning": """
WITH lab AS (
  SELECT o_custkey,
         max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
           AS pos
  FROM orders GROUP BY 1),
t AS (
  SELECT c.c_custkey, c.c_acctbal, COALESCE(lab.pos, 0) AS pos
  FROM customer c LEFT JOIN lab ON c.c_custkey = lab.o_custkey),
b AS (
  SELECT c_acctbal, pos,
         ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS bin
  FROM t),
g AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(pos) AS BIGINT) AS n_pos,
         CAST(sum(1 - pos) AS BIGINT) AS n_neg,
         floor(min(c_acctbal) * 100.0 + 0.5) / 100.0 AS bin_lo,
         floor(max(c_acctbal) * 100.0 + 0.5) / 100.0 AS bin_hi
  FROM b GROUP BY 1),
tot AS (
  SELECT CAST(sum(pos) AS DOUBLE) AS _pt,
         CAST(sum(1 - pos) AS DOUBLE) AS _nt
  FROM t)
SELECT bin, n, n_pos, n_neg, bin_lo, bin_hi,
       floor(ln(((n_pos + 0.5) / _pt) / ((n_neg + 0.5) / _nt))
             * 1000000.0 + 0.5) / 1000000.0 AS woe,
       floor((n_pos / _pt - n_neg / _nt)
             * ln(((n_pos + 0.5) / _pt) / ((n_neg + 0.5) / _nt))
             * 1000000.0 + 0.5) / 1000000.0 AS iv_contrib
FROM g CROSS JOIN tot
""",
    # Compaction planner: same deterministic manifest, same
    # (bytes DESC, file) running-sum bin assignment — integer math.
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
    # k-fold CV OLS: per-(segment, fold) decimal moments sum exactly
    # to segment totals; train = total - fold; held-out SSE unfolds
    # from the fold's own moments. Identical double algebra.
    "kfold_cv_ols": """
WITH d AS (
  SELECT c.c_mktsegment AS segment,
         CAST(o.o_orderkey % 5 AS INT) AS fold,
         c.c_acctbal AS x, o.o_totalprice AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
fm AS (
  SELECT segment, fold,
         CAST(count(*) AS DECIMAL(38,12)) AS n,
         sum(CAST(x AS DECIMAL(38,12))) AS sx,
         sum(CAST(y AS DECIMAL(38,12))) AS sy,
         sum(CAST(x * x AS DECIMAL(38,12))) AS sxx,
         sum(CAST(x * y AS DECIMAL(38,12))) AS sxy,
         sum(CAST(y * y AS DECIMAL(38,12))) AS syy
  FROM d GROUP BY 1, 2),
tot AS (
  SELECT segment, sum(n) AS t_n, sum(sx) AS t_sx, sum(sy) AS t_sy,
         sum(sxx) AS t_sxx, sum(sxy) AS t_sxy, sum(syy) AS t_syy
  FROM fm GROUP BY 1),
pf AS (
  SELECT fm.segment, CAST(tot.t_n AS DOUBLE) AS n_tot,
         ((CAST(t_n - n AS DOUBLE) * CAST(t_sxy - sxy AS DOUBLE)
           - CAST(t_sx - sx AS DOUBLE) * CAST(t_sy - sy AS DOUBLE))
          / (CAST(t_n - n AS DOUBLE) * CAST(t_sxx - sxx AS DOUBLE)
             - CAST(t_sx - sx AS DOUBLE) * CAST(t_sx - sx AS DOUBLE)))
           AS _slope,
         CAST(t_sy - sy AS DOUBLE) AS tr_sy,
         CAST(t_sx - sx AS DOUBLE) AS tr_sx,
         CAST(t_n - n AS DOUBLE) AS tr_n,
         CAST(n AS DOUBLE) AS f_n, CAST(sx AS DOUBLE) AS f_sx,
         CAST(sy AS DOUBLE) AS f_sy, CAST(sxx AS DOUBLE) AS f_sxx,
         CAST(sxy AS DOUBLE) AS f_sxy, CAST(syy AS DOUBLE) AS f_syy
  FROM fm JOIN tot ON fm.segment = tot.segment),
scored AS (
  SELECT segment, n_tot, _slope,
         (tr_sy - _slope * tr_sx) / tr_n AS _icept,
         f_n, f_sx, f_sy, f_sxx, f_sxy, f_syy
  FROM pf),
sse AS (
  SELECT segment, n_tot, _slope,
         (f_syy - 2 * _icept * f_sy - 2 * _slope * f_sxy
          + 2 * _icept * _slope * f_sx + _icept * _icept * f_n
          + _slope * _slope * f_sxx) AS _sse
  FROM scored)
SELECT segment, CAST(max(n_tot) AS BIGINT) AS n,
       floor(sqrt(CAST(sum(CAST(_sse AS DECIMAL(38,6))) AS DOUBLE)
                  / max(n_tot)) * 10000.0 + 0.5) / 10000.0 AS cv_rmse,
       floor(min(_slope) * 1000000.0 + 0.5) / 1000000.0 AS slope_lo,
       floor(max(_slope) * 1000000.0 + 0.5) / 1000000.0 AS slope_hi
FROM sse GROUP BY 1
""",
    # Zipf fit: identical tokenization, identical (n DESC, tok) rank
    # order, decimal-cast ln sums -> order-independent 100-term OLS.
    "zipf_fit": """
WITH toks AS (
  SELECT lang,
         unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
  FROM documents),
counts AS (
  SELECT lang, tok, CAST(count(*) AS BIGINT) AS n
  FROM toks GROUP BY 1, 2),
ranked AS (
  SELECT lang, n,
         row_number() OVER (PARTITION BY lang ORDER BY n DESC, tok)
           AS rank
  FROM counts),
g AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(CASE WHEN rank <= 100 THEN 1 ELSE 0 END) AS DOUBLE)
           AS m,
         CAST(sum(CASE WHEN rank <= 100
                  THEN CAST(ln(CAST(rank AS DOUBLE)) AS DECIMAL(38,18))
                  END) AS DOUBLE) AS sx,
         CAST(sum(CASE WHEN rank <= 100
                  THEN CAST(ln(CAST(n AS DOUBLE)) AS DECIMAL(38,18))
                  END) AS DOUBLE) AS sy,
         CAST(sum(CASE WHEN rank <= 100
                  THEN CAST(ln(CAST(rank AS DOUBLE))
                            * ln(CAST(rank AS DOUBLE))
                            AS DECIMAL(38,18)) END) AS DOUBLE) AS sxx,
         CAST(sum(CASE WHEN rank <= 100
                  THEN CAST(ln(CAST(rank AS DOUBLE))
                            * ln(CAST(n AS DOUBLE))
                            AS DECIMAL(38,18)) END) AS DOUBLE) AS sxy,
         CAST(sum(CASE WHEN rank <= 100
                  THEN CAST(ln(CAST(n AS DOUBLE))
                            * ln(CAST(n AS DOUBLE))
                            AS DECIMAL(38,18)) END) AS DOUBLE) AS syy
  FROM ranked GROUP BY 1)
SELECT lang, n_types,
       floor((m * sxy - sx * sy) / (m * sxx - sx * sx)
             * 10000.0 + 0.5) / 10000.0 AS zipf_slope,
       floor((m * sxy - sx * sy) * (m * sxy - sx * sy)
             / ((m * sxx - sx * sx) * (m * syy - sy * sy))
             * 10000.0 + 0.5) / 10000.0 AS r2
FROM g
""",
    # Forward as-of with tolerance: the oracle takes the naive
    # correlated route (all following purchases, rank, filter) the
    # engine's union-window plan avoids. Tolerance mirrors the
    # engine's floor-to-seconds arithmetic on BOTH endpoints.
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
    # Position-based attribution: identical window rank / count per
    # purchase, identical exact-literal weights, decimal credit sums.
    "attribution_position": """
WITH ev AS (SELECT user_id, ts, event_type, event_id FROM events),
touches AS (SELECT * FROM ev WHERE event_type IN ('click', 'view')),
buys AS (SELECT user_id, ts AS p_ts, event_id AS p_id FROM ev
         WHERE event_type = 'purchase'),
joined AS (
  SELECT t.event_type, b.p_id, t.ts, t.event_id
  FROM touches t JOIN buys b
    ON t.user_id = b.user_id AND t.ts < b.p_ts
   AND t.ts >= b.p_ts - INTERVAL 7 DAY),
pos AS (
  SELECT event_type, p_id,
         row_number() OVER (PARTITION BY p_id
                            ORDER BY ts, event_id) AS rk,
         count(*) OVER (PARTITION BY p_id) AS n
  FROM joined),
credited AS (
  SELECT event_type, p_id,
         CASE WHEN n = 1 THEN 1.0
              WHEN n = 2 THEN 0.5
              WHEN rk = 1 THEN 0.4
              WHEN rk = n THEN 0.4
              ELSE 0.2 / (n - 2) END AS credit
  FROM pos)
SELECT event_type,
       floor(CAST(sum(CAST(credit AS DECIMAL(30,15))) AS DOUBLE)
             * 10000.0 + 0.5) / 10000.0 AS total_credit,
       CAST(count(DISTINCT p_id) AS BIGINT) AS n_purchases
FROM credited GROUP BY 1
""",
    # Ridge path CV: same fold moments, same RELATIVE penalty grid
    # (lambda = alpha * centered train Sxx), same centered closed form
    # and held-out SSE algebra; best pick by (cv_rmse, alpha).
    "ridge_path_cv": """
WITH d AS (
  SELECT c.c_mktsegment AS segment,
         CAST(o.o_orderkey % 5 AS INT) AS fold,
         c.c_acctbal AS x, o.o_totalprice AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
fm AS (
  SELECT segment, fold,
         CAST(count(*) AS DECIMAL(38,12)) AS n,
         sum(CAST(x AS DECIMAL(38,12))) AS sx,
         sum(CAST(y AS DECIMAL(38,12))) AS sy,
         sum(CAST(x * x AS DECIMAL(38,12))) AS sxx,
         sum(CAST(x * y AS DECIMAL(38,12))) AS sxy,
         sum(CAST(y * y AS DECIMAL(38,12))) AS syy
  FROM d GROUP BY 1, 2),
tot AS (
  SELECT segment, sum(n) AS t_n, sum(sx) AS t_sx, sum(sy) AS t_sy,
         sum(sxx) AS t_sxx, sum(sxy) AS t_sxy, sum(syy) AS t_syy
  FROM fm GROUP BY 1),
grid AS (SELECT unnest([0.0, 0.25, 1.0, 4.0]) AS alpha),
j AS (
  SELECT fm.segment, grid.alpha,
         CAST(t_n - n AS DOUBLE) AS tr_n,
         CAST(t_sx - sx AS DOUBLE) AS tr_sx,
         CAST(t_sy - sy AS DOUBLE) AS tr_sy,
         CAST(t_sxx - sxx AS DOUBLE) AS tr_sxx,
         CAST(t_sxy - sxy AS DOUBLE) AS tr_sxy,
         CAST(t_n AS DOUBLE) AS n_tot,
         CAST(n AS DOUBLE) AS f_n, CAST(sx AS DOUBLE) AS f_sx,
         CAST(sy AS DOUBLE) AS f_sy, CAST(sxx AS DOUBLE) AS f_sxx,
         CAST(sxy AS DOUBLE) AS f_sxy, CAST(syy AS DOUBLE) AS f_syy
  FROM fm JOIN tot ON fm.segment = tot.segment CROSS JOIN grid),
modeled AS (
  SELECT segment, alpha, n_tot,
         ((tr_sxy - tr_sx * tr_sy / tr_n)
          / ((tr_sxx - tr_sx * tr_sx / tr_n) * (1.0 + alpha)))
           AS _slope,
         tr_sy, tr_sx, tr_n,
         f_n, f_sx, f_sy, f_sxx, f_sxy, f_syy
  FROM j),
sse AS (
  SELECT segment, alpha, n_tot,
         (f_syy
          - 2 * ((tr_sy - _slope * tr_sx) / tr_n) * f_sy
          - 2 * _slope * f_sxy
          + 2 * ((tr_sy - _slope * tr_sx) / tr_n) * _slope * f_sx
          + ((tr_sy - _slope * tr_sx) / tr_n)
            * ((tr_sy - _slope * tr_sx) / tr_n) * f_n
          + _slope * _slope * f_sxx) AS _sse
  FROM modeled),
per_alpha AS (
  SELECT segment, alpha,
         floor(sqrt(CAST(sum(CAST(_sse AS DECIMAL(38,6))) AS DOUBLE)
                    / max(n_tot)) * 10000.0 + 0.5) / 10000.0
           AS cv_rmse
  FROM sse GROUP BY 1, 2)
SELECT segment, alpha, cv_rmse,
       row_number() OVER (PARTITION BY segment
                          ORDER BY cv_rmse, alpha) = 1 AS is_best
FROM per_alpha
""",
    # Purged temporal CV: same literal fold spec, same embargo
    # arithmetic (floor-to-seconds on both endpoints).
    "purged_time_split": """
WITH folds(fold, f_start, f_end) AS (
  VALUES ('f1', TIMESTAMP '2024-01-08', TIMESTAMP '2024-01-15'),
         ('f2', TIMESTAMP '2024-01-15', TIMESTAMP '2024-01-22'),
         ('f3', TIMESTAMP '2024-01-22', TIMESTAMP '2024-01-29')),
g AS (
  SELECT f.fold,
         count(CASE WHEN e.ts < f.f_start - INTERVAL 2 DAY THEN 1 END)
           AS n_train,
         count(CASE WHEN e.ts >= f.f_start AND e.ts < f.f_end THEN 1
               END) AS n_test,
         max(CASE WHEN e.ts < f.f_start - INTERVAL 2 DAY THEN e.ts
             END) AS mtr,
         min(CASE WHEN e.ts >= f.f_start AND e.ts < f.f_end THEN e.ts
             END) AS mte
  FROM folds f CROSS JOIN events e GROUP BY 1)
SELECT fold, CAST(n_train AS BIGINT) AS n_train,
       CAST(n_test AS BIGINT) AS n_test,
       strftime(mtr, '%Y-%m-%d %H:%M:%S') AS max_train_ts,
       strftime(mte, '%Y-%m-%d %H:%M:%S') AS min_test_ts,
       CAST(floor(epoch(mte)) AS BIGINT)
       - CAST(floor(epoch(mtr)) AS BIGINT) >= 172800 AS gap_ok
FROM g
""",
    # Change-point: same daily decimal moments, same cumulative
    # prefix algebra, same (sse, day) argmin.
    "changepoint_detect": """
WITH ev AS (
  SELECT event_type, CAST(ts AS DATE) AS day, value FROM events
  WHERE value IS NOT NULL),
daily AS (
  SELECT event_type, day,
         CAST(count(*) AS DECIMAL(38,12)) AS n,
         sum(CAST(value AS DECIMAL(38,12))) AS s,
         sum(CAST(value * value AS DECIMAL(38,12))) AS q
  FROM ev GROUP BY 1, 2),
cum AS (
  SELECT event_type, day,
         CAST(sum(n) OVER w AS DOUBLE) AS cn,
         CAST(sum(s) OVER w AS DOUBLE) AS cs,
         CAST(sum(q) OVER w AS DOUBLE) AS cq,
         CAST(sum(n) OVER wt AS DOUBLE) AS tn,
         CAST(sum(s) OVER wt AS DOUBLE) AS ts_,
         CAST(sum(q) OVER wt AS DOUBLE) AS tq
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wt AS (PARTITION BY event_type)),
scored AS (
  SELECT event_type, day, cn, cs, tn, ts_,
         (cq - cs * cs / cn)
         + ((tq - cq) - (ts_ - cs) * (ts_ - cs) / (tn - cn)) AS _sse,
         tq - ts_ * ts_ / tn AS _base
  FROM cum WHERE cn < tn),
best AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY _sse, day) AS rn
  FROM scored)
SELECT event_type, strftime(day, '%Y-%m-%d') AS split_day,
       CAST(cn AS BIGINT) AS n_before,
       CAST(tn - cn AS BIGINT) AS n_after,
       floor(cs / cn * 10000.0 + 0.5) / 10000.0 AS mean_before,
       floor((ts_ - cs) / (tn - cn) * 10000.0 + 0.5) / 10000.0
         AS mean_after,
       floor((_base - _sse) * 10000.0 + 0.5) / 10000.0
         AS sse_reduction
FROM best WHERE rn = 1
""",
    # Adamic-Adar: the oracle takes the naive edge self-join road the
    # engine's per-part array iterator avoids — identical wedge set,
    # identical 1/ln(deg) weights (decimal-summed), identical
    # (score DESC, s1, s2) top-50 cut.
    # max_degree=256 frequent-prune mirrored from the Spark side:
    # parts with more than 256 distinct suppliers emit no wedges.
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
    # Daily-mean ACF: identical daily state, identical lag joins on
    # (type, day + lag), identical decimal Pearson moments.
    "acf_daily": """
WITH ev AS (
  SELECT event_type, CAST(ts AS DATE) AS day, value FROM events
  WHERE value IS NOT NULL),
daily AS (
  SELECT event_type, day,
         CAST(sum(CAST(value AS DECIMAL(38,12))) AS DOUBLE)
           / count(*) AS m
  FROM ev GROUP BY 1, 2),
lags AS (SELECT unnest([1, 2, 7]) AS lag),
pairs AS (
  SELECT a.event_type, lags.lag, a.m AS x, b.m AS y
  FROM daily a CROSS JOIN lags
  JOIN daily b ON b.event_type = a.event_type
              AND b.day = a.day + CAST(lags.lag AS INT)),
g AS (
  SELECT event_type, lag, CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sx,
         CAST(sum(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS sy,
         CAST(sum(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(x * y AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(y * y AS DECIMAL(38,12))) AS DOUBLE) AS syy
  FROM pairs GROUP BY 1, 2)
SELECT event_type, CAST(lag AS INT) AS lag,
       CAST(n AS BIGINT) AS n_pairs,
       floor((n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
             * 10000.0 + 0.5) / 10000.0 AS acf
FROM g
""",
    # Revenue concentration: identical customer-grain decimal revenue,
    # identical (r DESC, custkey) rank, EXACT-decimal 80% boundary.
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
    # Positional phrase search: same tokenization, adjacency by
    # position self-join (offsets are relative, so 0- vs 1-based
    # indexing cancels), same (count DESC, a, b) top-5.
    "phrase_search": """
WITH post AS (
  SELECT doc_id,
         generate_subscripts(regexp_extract_all(lower(text), '[a-z]+'),
                             1) AS pos,
         unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
  FROM documents),
big AS (
  SELECT a.tok AS tok_a, b.tok AS tok_b, a.doc_id
  FROM post a JOIN post b
    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
counts AS (
  SELECT tok_a, tok_b,
         CAST(count(*) AS BIGINT) AS n_occurrences,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM big GROUP BY 1, 2),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY n_occurrences DESC,
                               tok_a, tok_b) AS rank
  FROM counts)
SELECT tok_a || ' ' || tok_b AS phrase, n_docs, n_occurrences,
       CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
""",
    # Double-entry reconciliation: identical per-line derivation and
    # decimal sums; NULL ad contributes 0 either way (CASE ELSE 0 vs
    # sum-skips-NULL).
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
    # SCD2 validity audit: same lead-window build as scd2_history,
    # same tiling invariants. valid_from is unique per key here
    # ((user_id, ts) has no duplicates), so the audit's single-column
    # window order is total on both engines.
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
    # Ratio-to-parent hierarchy report: same leaf decimal aggregate,
    # same parent/grand window sums, one IEEE division per share.
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
    # Drill-across: each fact aggregated separately to the conformed
    # segment grain, merged by FULL OUTER ... USING (coalesced key).
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
    # Largest-remainder apportionment: identical quotas (one division
    # off exact decimal revenue), identical (frac DESC, segment) rank.
    "budget_apportion": """
WITH rev AS (
  SELECT c_mktsegment AS segment,
         sum(CAST(o_totalprice AS DECIMAL(38,12))) AS rev
  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1),
based AS (
  SELECT segment,
         CAST(rev AS DOUBLE) / CAST(sum(rev) OVER () AS DOUBLE)
           * 10000.0 AS quota
  FROM rev),
b2 AS (
  SELECT segment, quota, CAST(floor(quota) AS BIGINT) AS base,
         quota - floor(quota) AS frac
  FROM based),
r2 AS (
  SELECT *, row_number() OVER (ORDER BY frac DESC, segment) AS rn,
         10000 - sum(base) OVER () AS leftover
  FROM b2)
SELECT segment, floor(quota * 10000.0 + 0.5) / 10000.0 AS quota,
       CAST(base + CASE WHEN rn <= leftover THEN 1 ELSE 0 END
            AS BIGINT) AS alloc
FROM r2
""",
    # Generated calendar dimension: engine-neutral ISO weekday via
    # explicit arithmetic on the Spark side == DuckDB's isodow.
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
    # Weighted quantiles: decimal cumulative weights, cross-multiplied
    # rational thresholds — the crossing row is engine-exact.
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
    # Theil-Sen: pairwise slopes of the decimal-exact daily aggregate,
    # exact two-middle median under a total (slope, d1, d2) order.
    "theilsen_trend": """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(sum(CAST(value AS DECIMAL(38,18))) AS DOUBLE) AS rev
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
pairs AS (
  SELECT a.event_type, a.day AS d1, b.day AS d2,
         (b.rev - a.rev)
           / CAST(date_diff('day', a.day, b.day) AS DOUBLE) AS slope
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.day < b.day),
ranked AS (
  SELECT event_type, slope,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY slope, d1, d2) AS rn,
         count(*) OVER (PARTITION BY event_type) AS m
  FROM pairs),
med AS (
  SELECT event_type, sum(slope) / count(*) AS sen,
         CAST(max(m) AS BIGINT) AS n_pairs
  FROM ranked
  WHERE rn = floor((m + 1) / 2) OR rn = floor(m / 2) + 1
  GROUP BY 1)
SELECT event_type,
       CAST(floor((1.0 + sqrt(1.0 + 8.0 * CAST(n_pairs AS DOUBLE)))
                  / 2.0) AS BIGINT) AS n_days,
       n_pairs,
       floor(sen * 10000.0 + 0.5) / 10000.0 AS sen_slope
FROM med
""",
    # Mann-Whitney U: per-VALUE rank aggregation (no per-row ranks),
    # everything through 2U exact integers; z is the only IEEE step.
    "mann_whitney_ab": """
WITH pu AS (
  SELECT user_id, sum(CAST(value AS DECIMAL(38,18))) AS uv,
         CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 4)
                   < '8000' THEN 'A' ELSE 'B' END AS arm
  FROM events WHERE event_type = 'purchase' GROUP BY 1),
vals AS (
  SELECT uv, CAST(count(*) AS DECIMAL(38,0)) AS t,
         CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END)
              AS DECIMAL(38,0)) AS ta
  FROM pu GROUP BY 1),
ranked AS (
  SELECT t, ta,
         CAST(COALESCE(sum(t) OVER (ORDER BY uv
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              0) AS DECIMAL(38,0)) AS cb
  FROM vals),
agg AS (
  SELECT CAST(sum(t) AS DECIMAL(38,0)) AS n,
         CAST(sum(ta) AS DECIMAL(38,0)) AS na,
         CAST(sum(ta * (2 * cb + t + 1)) AS DECIMAL(38,0)) AS ra2,
         CAST(sum(t * t * t - t) AS DECIMAL(38,0)) AS tie3
  FROM ranked),
m AS (
  SELECT CAST(na AS BIGINT) AS n_a, CAST(n - na AS BIGINT) AS n_b,
         CAST(ra2 - na * (na + 1) AS DOUBLE) AS u2,
         CAST(n AS DOUBLE) AS nd, CAST(na AS DOUBLE) AS nad,
         CAST(n - na AS DOUBLE) AS nbd, CAST(tie3 AS DOUBLE) AS tied
  FROM agg),
sig AS (
  SELECT *, (nad * nbd / 12.0)
            * ((nd + 1) - tied / (nd * (nd - 1.0))) AS sigma2
  FROM m)
SELECT n_a, n_b, u2 / 2.0 AS u_a,
       floor((u2 - nad * nbd) / (2.0 * sqrt(sigma2))
             * 10000.0 + 0.5) / 10000.0 AS z,
       floor((1.0 - u2 / (nad * nbd)) * 10000.0 + 0.5) / 10000.0
         AS rank_biserial
FROM sig
""",
    # Difference-in-differences: 4-cell conditional aggregation,
    # decimal moments, identical scalar algebra on both engines.
    "diff_in_diff": """
WITH d AS (
  SELECT CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 4)
                   < '8000' THEN 1 ELSE 0 END AS treat,
         CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END
           AS post,
         value AS y
  FROM events
  WHERE event_type = 'purchase' AND value IS NOT NULL),
g AS (
  SELECT
    CAST(sum(CASE WHEN treat = 0 AND post = 0
                  THEN CAST(1 AS DECIMAL(38,18)) END) AS DOUBLE)
      AS n_c0,
    CAST(sum(CASE WHEN treat = 0 AND post = 0
                  THEN CAST(y AS DECIMAL(38,18)) END) AS DOUBLE)
      AS s_c0,
    CAST(sum(CASE WHEN treat = 0 AND post = 0
                  THEN CAST(y * y AS DECIMAL(38,18)) END) AS DOUBLE)
      AS q_c0,
    CAST(sum(CASE WHEN treat = 0 AND post = 1
                  THEN CAST(1 AS DECIMAL(38,18)) END) AS DOUBLE)
      AS n_c1,
    CAST(sum(CASE WHEN treat = 0 AND post = 1
                  THEN CAST(y AS DECIMAL(38,18)) END) AS DOUBLE)
      AS s_c1,
    CAST(sum(CASE WHEN treat = 0 AND post = 1
                  THEN CAST(y * y AS DECIMAL(38,18)) END) AS DOUBLE)
      AS q_c1,
    CAST(sum(CASE WHEN treat = 1 AND post = 0
                  THEN CAST(1 AS DECIMAL(38,18)) END) AS DOUBLE)
      AS n_t0,
    CAST(sum(CASE WHEN treat = 1 AND post = 0
                  THEN CAST(y AS DECIMAL(38,18)) END) AS DOUBLE)
      AS s_t0,
    CAST(sum(CASE WHEN treat = 1 AND post = 0
                  THEN CAST(y * y AS DECIMAL(38,18)) END) AS DOUBLE)
      AS q_t0,
    CAST(sum(CASE WHEN treat = 1 AND post = 1
                  THEN CAST(1 AS DECIMAL(38,18)) END) AS DOUBLE)
      AS n_t1,
    CAST(sum(CASE WHEN treat = 1 AND post = 1
                  THEN CAST(y AS DECIMAL(38,18)) END) AS DOUBLE)
      AS s_t1,
    CAST(sum(CASE WHEN treat = 1 AND post = 1
                  THEN CAST(y * y AS DECIMAL(38,18)) END) AS DOUBLE)
      AS q_t1
  FROM d),
mm AS (
  SELECT *,
         s_c0 / n_c0 AS m_c0, s_c1 / n_c1 AS m_c1,
         s_t0 / n_t0 AS m_t0, s_t1 / n_t1 AS m_t1
  FROM g),
vv AS (
  SELECT *,
         (q_c0 / n_c0 - m_c0 * m_c0) * (n_c0 / (n_c0 - 1.0)) AS v_c0,
         (q_c1 / n_c1 - m_c1 * m_c1) * (n_c1 / (n_c1 - 1.0)) AS v_c1,
         (q_t0 / n_t0 - m_t0 * m_t0) * (n_t0 / (n_t0 - 1.0)) AS v_t0,
         (q_t1 / n_t1 - m_t1 * m_t1) * (n_t1 / (n_t1 - 1.0)) AS v_t1,
         (m_t1 - m_t0) - (m_c1 - m_c0) AS did_raw
  FROM mm),
fin AS (
  SELECT *,
         sqrt(((0 + v_c0 / n_c0) + v_c1 / n_c1) + v_t0 / n_t0
              + v_t1 / n_t1) AS se_raw
  FROM vv)
SELECT CAST(n_c0 AS BIGINT) AS n_c0, CAST(n_c1 AS BIGINT) AS n_c1,
       CAST(n_t0 AS BIGINT) AS n_t0, CAST(n_t1 AS BIGINT) AS n_t1,
       floor(m_c0 * 10000.0 + 0.5) / 10000.0 AS mean_c0,
       floor(m_c1 * 10000.0 + 0.5) / 10000.0 AS mean_c1,
       floor(m_t0 * 10000.0 + 0.5) / 10000.0 AS mean_t0,
       floor(m_t1 * 10000.0 + 0.5) / 10000.0 AS mean_t1,
       floor(did_raw * 10000.0 + 0.5) / 10000.0 AS did,
       floor(se_raw * 10000.0 + 0.5) / 10000.0 AS se,
       floor(did_raw / se_raw * 10000.0 + 0.5) / 10000.0 AS t_stat
FROM fin
""",
    # EWMA control chart: exact power-of-two weights via << (never
    # libm pow); EWMA is one division of exact integers.
    "ewma_control_chart": """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2),
idx AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY day) AS i
  FROM daily),
pairs AS (
  SELECT a.event_type, a.day, a.x,
         CAST(b.x * (CAST(1 AS BIGINT)
                     << CAST(15 - (a.i - 1 - b.i) AS INT))
              AS DECIMAL(38,0)) AS term,
         CAST((CAST(1 AS BIGINT)
               << CAST(15 - (a.i - 1 - b.i) AS INT))
              AS DECIMAL(38,0)) AS wt
  FROM idx a JOIN idx b ON a.event_type = b.event_type
  WHERE b.i >= a.i - 16 AND b.i <= a.i - 1),
ew AS (
  SELECT event_type, day, x, sum(term) AS s, sum(wt) AS den
  FROM pairs GROUP BY 1, 2, 3),
mo AS (
  SELECT event_type, CAST(count(*) AS DOUBLE) AS nn,
         CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
         CAST(sum(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE) AS qx
  FROM daily GROUP BY 1),
sd AS (
  SELECT event_type,
         sqrt((qx / nn - (sx / nn) * (sx / nn))
              * (nn / (nn - 1.0))) AS sigma
  FROM mo)
SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day, d.x,
       floor(CAST(e.s AS DOUBLE) / CAST(e.den AS DOUBLE)
             * 10000.0 + 0.5) / 10000.0 AS ewma_prior,
       COALESCE(abs(CAST(d.x AS DOUBLE)
                    - CAST(e.s AS DOUBLE) / CAST(e.den AS DOUBLE))
                > 3.0 * sd.sigma, FALSE) AS alarm
FROM daily d
LEFT JOIN ew e ON d.event_type = e.event_type AND d.day = e.day
JOIN sd ON d.event_type = sd.event_type
""",
    # Grid-kNN oracle is the BRUTE-FORCE radius-nearest join the
    # engine's 3x3 cell neighborhood must reproduce exactly (the grid
    # is candidate-complete by the coverage proof in the docstring).
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
    # Price-volume-mix: per-period decimal brand aggregates, identical
    # scalar decomposition algebra.
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
    # STL-lite: decimal daily sums, 7-full-window trend, decimal-cast
    # seasonal means, engine-neutral ISO weekday.
    "stl_decompose_lite": """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         sum(CAST(value AS DECIMAL(38,12))) AS rev_d
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
t AS (
  SELECT event_type, day, CAST(rev_d AS DOUBLE) AS x,
         CASE WHEN count(*) OVER w7 = 7
              THEN CAST(sum(rev_d) OVER w7 AS DOUBLE) / 7.0 END
           AS trend,
         CAST(isodow(day) AS INT) AS dow
  FROM daily
  WINDOW w7 AS (PARTITION BY event_type ORDER BY day
                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
d AS (SELECT *, x - trend AS detrended FROM t),
s AS (
  SELECT *,
         CAST(sum(CAST(detrended AS DECIMAL(38,12)))
                OVER (PARTITION BY event_type, dow) AS DOUBLE)
           / CAST(count(detrended)
                OVER (PARTITION BY event_type, dow) AS DOUBLE)
           AS seasonal
  FROM d)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
       floor(x * 100.0 + 0.5) / 100.0 AS revenue,
       floor(trend * 100.0 + 0.5) / 100.0 AS trend,
       floor(seasonal * 100.0 + 0.5) / 100.0 AS seasonal,
       floor((x - trend - seasonal) * 100.0 + 0.5) / 100.0 AS residual
FROM s
""",
    # Conversion-lag percentiles: the forward-asof NULL-outside-
    # tolerance convention (asof_forward_tolerance's oracle), then the
    # exact crossing-row quantile on integer-second lag counts.
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
    # Survivorship: struct-max/min rules rendered as deterministic
    # rank windows (identical total orders).
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
    # RFM: ntile quintiles under TOTAL orders (key tiebreak) so bucket
    # boundaries are engine-identical; standard first-buckets-bigger
    # ntile semantics on both engines.
    "rfm_segmentation": """
WITH pc AS (
  SELECT o_custkey, max(o_orderdate) AS last_order,
         CAST(count(*) AS BIGINT) AS freq,
         sum(CAST(o_totalprice AS DECIMAL(38,12))) AS mon
  FROM orders GROUP BY 1),
an AS (SELECT max(o_orderdate) AS anchor FROM orders),
rfm AS (
  SELECT o_custkey,
         CAST(date_diff('day', last_order, anchor) AS INT) AS recency_d,
         freq, mon
  FROM pc, an),
sc AS (
  SELECT *,
         CAST(ntile(5) OVER (ORDER BY recency_d DESC, o_custkey ASC)
              AS INT) AS r_score,
         CAST(ntile(5) OVER (ORDER BY freq ASC, o_custkey ASC)
              AS INT) AS f_score,
         CAST(ntile(5) OVER (ORDER BY mon ASC, o_custkey ASC)
              AS INT) AS m_score
  FROM rfm),
lab AS (
  SELECT *,
         CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
                THEN 'champion'
              WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
              WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
              WHEN r_score >= 4 AND f_score <= 2 THEN 'new'
              ELSE 'regular' END AS segment
  FROM sc)
SELECT segment, CAST(count(*) AS BIGINT) AS n_customers,
       floor(CAST(sum(mon) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             * 100.0 + 0.5) / 100.0 AS avg_monetary,
       floor(CAST(sum(CAST(recency_d AS DECIMAL(38,0))) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) * 100.0 + 0.5) / 100.0
         AS avg_recency_d
FROM lab GROUP BY 1
""",
    # Gains/lift: decile ntile under a total order; exact integer
    # counts, cumulative window over 10 rows.
    "gains_lift_table": """
WITH resp AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= DATE '1998-01-01'),
sc AS (
  SELECT c.c_custkey, c.c_acctbal,
         CASE WHEN r.o_custkey IS NOT NULL THEN 1 ELSE 0 END AS label
  FROM customer c LEFT JOIN resp r ON c.c_custkey = r.o_custkey),
dec AS (
  SELECT label,
         CAST(ntile(10) OVER (ORDER BY c_acctbal DESC, c_custkey ASC)
              AS INT) AS decile
  FROM sc),
pd AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(label) AS BIGINT) AS n_resp
  FROM dec GROUP BY 1)
SELECT decile, n, n_resp,
       floor(CAST(n_resp AS DOUBLE) / CAST(n AS DOUBLE)
             * 10000.0 + 0.5) / 10000.0 AS resp_rate,
       floor(CAST(sum(n_resp) OVER (ORDER BY decile ROWS BETWEEN
                     UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / CAST(sum(n_resp) OVER () AS DOUBLE)
             * 10000.0 + 0.5) / 10000.0 AS cum_gain,
       floor((CAST(n_resp AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(sum(n_resp) OVER () AS DOUBLE)
                / CAST(sum(n) OVER () AS DOUBLE))
             * 10000.0 + 0.5) / 10000.0 AS lift
FROM pd
""",
    # Backfill planner: generated date spine x type dim, exact lower
    # median threshold via integer cross-multiplication.
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
    # BFS: bounded-depth recursion; min(d) per node == the engine's
    # frontier labels by BFS order.
    # max_basket=64 mirrored from the Spark side: orders with more
    # than 64 distinct parts emit no co-order edges.
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
    # Connected components of the strong co-order graph: the oracle is
    # the FULL min-label transitive closure (recursive CTE; UNION
    # dedups, so recursion halts at the reachable-pair fixpoint) — it
    # checks the iterative Spark loop actually converged, not merely
    # produced plausible labels. Same max_basket=64 + min_orders=2
    # edge build.
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
    # Wedge-volume cap ladder: identical degree histograms, identical
    # exact-integer wedge arithmetic (d(d-1) is even; // 2).
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
    # Tokenizer fertility: the SAME generated train->encode SQL as
    # bpe_encode_corpus, aggregated per language.
    "bpe_fertility_stats": f"""
SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(enc.n_words) AS BIGINT) AS total_words,
       CAST(sum(enc.n_tokens) AS BIGINT) AS total_tokens,
       floor(CAST(sum(enc.n_tokens) AS DOUBLE)
             / CAST(sum(enc.n_words) AS DOUBLE) * 10000.0 + 0.5)
         / 10000.0 AS fertility,
       floor(CAST(sum(enc.n_chars) AS DOUBLE)
             / CAST(sum(enc.n_tokens) AS DOUBLE) * 10000.0 + 0.5)
         / 10000.0 AS chars_per_token
FROM ({_bpe_encode_sql(8)}) enc
JOIN documents d USING (doc_id)
GROUP BY 1
""",
    # Padding-waste report over the same per-doc token budgets.
    "padding_efficiency_report": f"""
WITH b AS (
  SELECT CAST(CASE WHEN n_tokens <= 64 THEN 64
                   WHEN n_tokens <= 128 THEN 128
                   WHEN n_tokens <= 256 THEN 256
                   WHEN n_tokens <= 512 THEN 512
                   ELSE 1024 END AS INT) AS bucket_cap,
         least(n_tokens, 1024) AS kept,
         CAST(CASE WHEN n_tokens <= 64 THEN 64
                   WHEN n_tokens <= 128 THEN 128
                   WHEN n_tokens <= 256 THEN 256
                   WHEN n_tokens <= 512 THEN 512
                   ELSE 1024 END
              - least(n_tokens, 1024) AS BIGINT) AS pad
  FROM ({_bpe_encode_sql(8)}) enc)
SELECT bucket_cap, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(kept) AS BIGINT) AS total_tokens,
       CAST(sum(pad) AS BIGINT) AS total_padding,
       floor(CAST(sum(kept) AS DOUBLE)
             / CAST(sum(kept) + sum(pad) AS DOUBLE)
             * 10000.0 + 0.5) / 10000.0 AS efficiency
FROM b GROUP BY 1
""",
    # Cycle-time stages: unpivoted integer day lags, crossing-row
    # percentiles on the per-(stage, lag) aggregate.
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
    # Per-class P/R/F1 over the SAME generated lang-id confusion.
    "classifier_prf_report": f"""
WITH base AS (
  SELECT lang, text,
    {_lang_hits_sql()}
  FROM documents),
p AS (SELECT lang AS true_lang, {_LANG_PRED_SQL} AS pred_lang
      FROM base),
cm AS (SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n
       FROM p GROUP BY 1, 2),
pt AS (SELECT true_lang AS lang, CAST(sum(n) AS BIGINT) AS n_true,
              CAST(sum(CASE WHEN pred_lang = true_lang THEN n END)
                   AS BIGINT) AS tp_t
       FROM cm GROUP BY 1),
pp AS (SELECT pred_lang AS lang, CAST(sum(n) AS BIGINT) AS n_pred
       FROM cm GROUP BY 1),
jj AS (
  SELECT pt.lang, COALESCE(tp_t, 0) AS tp,
         CAST(COALESCE(n_pred, 0) - COALESCE(tp_t, 0) AS BIGINT)
           AS fp,
         CAST(n_true - COALESCE(tp_t, 0) AS BIGINT) AS fn
  FROM pt LEFT JOIN pp ON pt.lang = pp.lang),
r AS (
  SELECT *,
         CAST(tp AS DOUBLE)
           / nullif(CAST(tp + fp AS DOUBLE), 0.0) AS prec,
         CAST(tp AS DOUBLE)
           / nullif(CAST(tp + fn AS DOUBLE), 0.0) AS rec
  FROM jj)
SELECT lang, tp, fp, fn,
       floor(prec * 10000.0 + 0.5) / 10000.0 AS "precision",
       floor(rec * 10000.0 + 0.5) / 10000.0 AS recall,
       floor(2.0 * prec * rec / nullif(prec + rec, 0.0)
             * 10000.0 + 0.5) / 10000.0 AS f1
FROM r
""",
    # Empirical-Bayes shrinkage: identical method-of-moments prior and
    # shrinkage algebra.
    "eb_shrunk_rates": """
WITH dim AS (
  SELECT c_custkey, c_mktsegment AS segment, n_name AS nation
  FROM customer JOIN nation ON c_nationkey = n_nationkey),
cells AS (
  SELECT segment, nation, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS x
  FROM events e JOIN dim d ON e.user_id = d.c_custkey
  GROUP BY 1, 2),
rated AS (
  SELECT *, CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS p FROM cells),
mom AS (
  SELECT CAST(count(*) AS DOUBLE) AS k,
         CAST(sum(CAST(p AS DECIMAL(38,18))) AS DOUBLE) AS s,
         CAST(sum(CAST(p * p AS DECIMAL(38,18))) AS DOUBLE) AS q
  FROM rated),
mm AS (SELECT k, q, s / k AS m FROM mom),
vv AS (SELECT *, (q / k - m * m) * (k / (k - 1.0)) AS v FROM mm),
cc AS (SELECT *, greatest(m * (1.0 - m) / v - 1.0, 1.0) AS com
       FROM vv),
pri AS (SELECT m * com AS alpha, (1.0 - m) * com AS beta FROM cc)
SELECT segment, nation, n, x,
       floor(p * 1000000.0 + 0.5) / 1000000.0 AS raw_rate,
       floor((CAST(x AS DOUBLE) + alpha)
             / (CAST(n AS DOUBLE) + alpha + beta)
             * 1000000.0 + 0.5) / 1000000.0 AS shrunk_rate
FROM rated, pri
""",
    # Top-N + OTHER: rank window over the brand aggregate, relabel,
    # re-aggregate; decimal revenue end to end.
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
    # Vocabulary overlap: the oracle joins the distinct (source, token)
    # relation pairwise; the engine generates pairs map-side from each
    # token's sorted source set — same multiset by construction.
    "source_vocab_overlap": """
WITH toks AS (
  SELECT DISTINCT source,
         unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
  FROM documents),
sizes AS (
  SELECT source, CAST(count(*) AS BIGINT) AS vocab
  FROM toks GROUP BY 1),
pairs AS (
  SELECT a.source AS src_a, b.source AS src_b
  FROM toks a JOIN toks b
    ON a.tok = b.tok AND a.source < b.source),
inter AS (
  SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_common
  FROM pairs GROUP BY 1, 2)
SELECT src_a, src_b, n_common,
       CAST(sa.vocab + sb.vocab - n_common AS BIGINT) AS n_union,
       floor(CAST(n_common AS DOUBLE)
             / CAST(sa.vocab + sb.vocab - n_common AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS jaccard
FROM inter
JOIN sizes sa ON src_a = sa.source
JOIN sizes sb ON src_b = sb.source
""",
    # SCD type-6: lead interval close + whole-partition current
    # overlay under one total (ts, event_id) order.
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
    # Winsorized moments: crossing-row exact p05/p95 cuts, decimal
    # moments of the clamped column.
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
    # Frequent triples: the oracle is the 3-way self-join the engine's
    # map-side iterator avoids; same frequent-item prune, same total
    # order on the top-20.
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
    # Sequential A/B: cumulative daily Welch-z path vs the
    # c/sqrt(t/T) boundary — identical moment and boundary algebra.
    "ab_sequential_monitor": """
WITH d AS (
  SELECT CAST(ts AS DATE) AS day,
         CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 4)
                   < '8000' THEN 'A' ELSE 'B' END AS arm,
         value AS y
  FROM events
  WHERE event_type = 'purchase' AND value IS NOT NULL),
daily AS (
  SELECT day, arm, CAST(count(*) AS DECIMAL(38,6)) AS n,
         sum(CAST(y AS DECIMAL(38,12))) AS s,
         sum(CAST(y * y AS DECIMAL(38,12))) AS q
  FROM d GROUP BY 1, 2),
cum AS (
  SELECT day, arm,
         CAST(sum(n) OVER w AS DOUBLE) AS cn,
         CAST(sum(s) OVER w AS DOUBLE) AS cs,
         CAST(sum(q) OVER w AS DOUBLE) AS cq
  FROM daily
  WINDOW w AS (PARTITION BY arm ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
paired AS (
  SELECT day,
         max(CASE WHEN arm = 'A' THEN cn END) AS na,
         max(CASE WHEN arm = 'A' THEN cs END) AS sa,
         max(CASE WHEN arm = 'A' THEN cq END) AS qa,
         max(CASE WHEN arm = 'B' THEN cn END) AS nb,
         max(CASE WHEN arm = 'B' THEN cs END) AS sb,
         max(CASE WHEN arm = 'B' THEN cq END) AS qb
  FROM cum GROUP BY 1
  HAVING max(CASE WHEN arm = 'A' THEN cn END) > 1
     AND max(CASE WHEN arm = 'B' THEN cn END) > 1),
zz AS (
  SELECT day, na, nb,
         (sa / na - sb / nb)
           / sqrt(((qa / na - (sa / na) * (sa / na))
                   * (na / (na - 1.0))) / na
                  + ((qb / nb - (sb / nb) * (sb / nb))
                     * (nb / (nb - 1.0))) / nb) AS z,
         row_number() OVER (ORDER BY day) AS t,
         count(*) OVER () AS big_t
  FROM paired)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       floor(z * 10000.0 + 0.5) / 10000.0 AS z,
       floor(2.5 / sqrt(CAST(t AS DOUBLE) / CAST(big_t AS DOUBLE))
             * 10000.0 + 0.5) / 10000.0 AS boundary,
       abs(z) > 2.5 / sqrt(CAST(t AS DOUBLE) / CAST(big_t AS DOUBLE))
         AS crossed
FROM zz
""",
    # CUPED: identical per-user partials, theta moments, adjusted
    # metric, and Welch algebra on raw vs adjusted.
    "cuped_adjusted_ab": """
WITH pu AS (
  SELECT user_id,
         CAST(COALESCE(sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
                  THEN CAST(value AS DECIMAL(38,12)) END), 0)
              AS DOUBLE) AS x,
         CAST(COALESCE(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                  THEN CAST(value AS DECIMAL(38,12)) END), 0)
              AS DOUBLE) AS y,
         CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 4)
                   < '8000' THEN 'A' ELSE 'B' END AS arm
  FROM events
  WHERE event_type = 'purchase' AND value IS NOT NULL
  GROUP BY user_id),
mom AS (
  SELECT CAST(count(*) AS DOUBLE) AS k,
         CAST(sum(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sx,
         CAST(sum(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS sy,
         CAST(sum(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(x * y AS DECIMAL(38,12))) AS DOUBLE) AS sxy
  FROM pu),
pri AS (
  SELECT (sxy / k - (sx / k) * (sy / k))
           / (sxx / k - (sx / k) * (sx / k)) AS theta,
         sx / k AS mean_x
  FROM mom),
adj AS (
  SELECT arm, y, y - theta * (x - mean_x) AS y_adj, theta
  FROM pu, pri),
arms AS (
  SELECT arm, CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS s1,
         CAST(sum(CAST(y * y AS DECIMAL(38,12))) AS DOUBLE) AS q1,
         CAST(sum(CAST(y_adj AS DECIMAL(38,12))) AS DOUBLE) AS s2,
         CAST(sum(CAST(y_adj * y_adj AS DECIMAL(38,12))) AS DOUBLE)
           AS q2,
         max(theta) AS theta
  FROM adj GROUP BY arm),
j AS (
  SELECT a.n AS na, a.s1 AS sa1, a.q1 AS qa1, a.s2 AS sa2,
         a.q2 AS qa2, a.theta,
         b.n AS nb, b.s1 AS sb1, b.q1 AS qb1, b.s2 AS sb2,
         b.q2 AS qb2
  FROM (SELECT * FROM arms WHERE arm = 'A') a,
       (SELECT * FROM arms WHERE arm = 'B') b),
w AS (
  SELECT *,
         (qa1 / na - (sa1 / na) * (sa1 / na)) * (na / (na - 1.0))
           AS va1,
         (qb1 / nb - (sb1 / nb) * (sb1 / nb)) * (nb / (nb - 1.0))
           AS vb1,
         (qa2 / na - (sa2 / na) * (sa2 / na)) * (na / (na - 1.0))
           AS va2,
         (qb2 / nb - (sb2 / nb) * (sb2 / nb)) * (nb / (nb - 1.0))
           AS vb2
  FROM j)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       floor(theta * 1000000.0 + 0.5) / 1000000.0 AS theta,
       floor((sa1 / na - sb1 / nb) / sqrt(va1 / na + vb1 / nb)
             * 10000.0 + 0.5) / 10000.0 AS z_raw,
       floor((sa2 / na - sb2 / nb) / sqrt(va2 / na + vb2 / nb)
             * 10000.0 + 0.5) / 10000.0 AS z_cuped,
       floor((1.0 - (va2 + vb2) / (va1 + vb1)) * 10000.0 + 0.5)
         / 10000.0 AS var_reduction
FROM w
""",
    # Sample-size planner: identical per-user variance and the
    # in-engine (1.96 + 0.84)² literal on both sides.
    "ab_sample_size_plan": """
WITH pu AS (
  SELECT user_id,
         CAST(sum(CAST(value AS DECIMAL(38,12))) AS DOUBLE) AS y
  FROM events
  WHERE event_type = 'purchase' AND value IS NOT NULL
  GROUP BY 1),
mom AS (
  SELECT CAST(count(*) AS DOUBLE) AS k,
         CAST(sum(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS s,
         CAST(sum(CAST(y * y AS DECIMAL(38,12))) AS DOUBLE) AS q
  FROM pu),
base AS (
  SELECT k AS n_users, s / k AS mean_y,
         (q / k - (s / k) * (s / k)) * (k / (k - 1.0)) AS var_y
  FROM mom),
grid AS (
  SELECT n_users, mean_y, var_y,
         unnest([0.01, 0.02, 0.05, 0.1]) AS mde_frac
  FROM base),
calc AS (
  SELECT *, mde_frac * mean_y AS delta,
         ceil(2.0 * var_y * ((1.96 + 0.84) * (1.96 + 0.84))
              / ((mde_frac * mean_y) * (mde_frac * mean_y)))
           AS n_req
  FROM grid)
SELECT floor(mde_frac * 100.0 + 0.5) / 100.0 AS mde_frac,
       floor(delta * 10000.0 + 0.5) / 10000.0 AS delta,
       CAST(n_req AS BIGINT) AS n_required_per_arm,
       CAST(n_users / 2.0 AS BIGINT) AS n_have_per_arm,
       n_users / 2.0 >= CAST(CAST(n_req AS BIGINT) AS DOUBLE)
         AS powered
FROM calc
""",
}

# Streaming maintenance keys whose final render is DEFINED to equal an
# existing batch key's oracle (the stream folds state; the oracle is the
# from-scratch batch equivalent) — aliased, not duplicated, so the two
# can never drift.
ALL_ORACLES["streaming_merge_on_read"] = ALL_ORACLES["merge_on_read"]
ALL_ORACLES["streaming_hll_maintenance"] = ALL_ORACLES[
    "hll_sliding_distinct"
]
ALL_ORACLES["streaming_cms_maintenance"] = ALL_ORACLES[
    "heavy_hitters_cms"
]
ALL_ORACLES["streaming_changepoint"] = ALL_ORACLES["changepoint_detect"]
ALL_ORACLES["streaming_ewma_monitor"] = ALL_ORACLES["ewma_control_chart"]

# Geo keys: both sides consume the SAME generated integer-arithmetic
# expressions (functions/geo.py) — bit interleave and unrolled
# ray-cast edges are identical by construction.
from aproximacion_1_etl_spark.functions.geo import (  # noqa: E402
    diamond as _diamond,
    morton_sql as _morton_sql,
    point_in_polygon_sql as _pip_sql,
)

_GEO_PTS_SQL = """
pts AS (
  SELECT c_custkey,
         CAST(-180 + (c_custkey * 7) % 360 AS BIGINT) AS px,
         CAST(-55 + c_custkey % 110 AS BIGINT) AS py
  FROM customer)
"""

ALL_ORACLES["morton_cells"] = f"""
WITH {_GEO_PTS_SQL},
q AS (SELECT px + 180 AS qx, py + 90 AS qy FROM pts),
c AS (SELECT {_morton_sql("qx", "qy", 9)} AS code FROM q)
SELECT CAST(code >> 6 AS BIGINT) AS cell6,
       CAST(code >> 12 AS BIGINT) AS cell3,
       CAST(count(*) AS BIGINT) AS n_points,
       CAST(min(code) AS BIGINT) AS min_code,
       CAST(max(code) AS BIGINT) AS max_code
FROM c GROUP BY 1, 2
"""

ALL_ORACLES["point_in_polygon_join"] = "WITH " + _GEO_PTS_SQL + (
    " SELECT * FROM ("
    + " UNION ALL ".join(
        f"""
SELECT CAST({j} AS INT) AS polygon_id,
       CAST(sum(CASE WHEN {_pip_sql("px", "py", _diamond(cx, cy, r))}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_points,
       CAST(sum(CASE WHEN {_pip_sql("px", "py", _diamond(cx, cy, r))}
                     THEN c_custkey ELSE 0 END) AS BIGINT) AS sum_keys
FROM pts"""
        for j, (cx, cy, r) in [
            (j, (j * 60 - 90, j * 20 - 30, 20 + 10 * j)) for j in range(4)
        ]
    )
    + ")"
)
