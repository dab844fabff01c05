"""Exact-arithmetic geospatial expression builders (SURVEY.md §2.10).

Both builders emit ONE SQL-arithmetic string consumed verbatim by the
Spark side (``F.expr``) and the DuckDB oracle — the drift-proof
shared-builder pattern the BPE oracle established: there is exactly one
definition of the bit math / edge tests, so the two engines cannot
disagree by construction. Everything is integer arithmetic (shifts,
masks, cross-multiplied comparisons) — no trig, no doubles, no libm.

- ``morton_sql``: Z-order (Morton) cell id by bit-interleaving two
  quantized coordinates. The same space-filling curve Z-order layout
  clustering uses (sources/layout zorder), surfaced as a queryable
  cell id: one integer names a spatial cell at every resolution
  (coarser level = drop 2 trailing bits per level), so multi-level
  spatial rollups are prefix arithmetic, not re-bucketing.
- ``point_in_polygon_sql``: even-odd ray casting unrolled over a
  FIXED vertex list with the division-free crossing test: for edge
  (x1,y1)-(x2,y2), the ray from (px,py) crosses iff the edge spans
  py and px sits left of the intersection — compared cross-multiplied
  with a sign flip on dy < 0, exact on integer coordinates.
"""

from __future__ import annotations


def morton_sql(x: str, y: str, bits: int = 10) -> str:
    """SQL expression interleaving the low ``bits`` bits of integer
    expressions ``x`` (even positions) and ``y`` (odd positions) into
    a Morton / Z-order code. Valid Spark SQL and DuckDB verbatim."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def point_in_polygon_sql(
    px: str, py: str, vertices: list[tuple[int, int]]
) -> str:
    """SQL boolean: even-odd (ray-casting) point-in-polygon test for
    integer point expressions against a FIXED integer vertex ring,
    unrolled per edge and division-free (cross-multiplied with the
    dy-sign flip), so Spark and DuckDB evaluate identical exact
    integer comparisons. Points on an edge follow the half-open
    crossing rule consistently in both engines."""
    edges = []
    n = len(vertices)
    for i in range(n):
        x1, y1 = vertices[i]
        x2, y2 = vertices[(i + 1) % n]
        spans = f"(({y1} > {py}) != ({y2} > {py}))"
        dy = y2 - y1
        lhs = f"(({px}) - {x1}) * {dy}"
        rhs = f"{x2 - x1} * (({py}) - {y1})"
        cmp_ = f"({lhs}) < ({rhs})" if dy > 0 else f"({lhs}) > ({rhs})"
        edges.append(f"(CASE WHEN {spans} AND {cmp_} THEN 1 ELSE 0 END)")
    return "((" + " + ".join(edges) + ") % 2 = 1)"


def diamond(cx: int, cy: int, r: int) -> list[tuple[int, int]]:
    """Convex 4-gon (diamond) vertex ring around an integer center."""
    return [(cx + r, cy), (cx, cy + r), (cx - r, cy), (cx, cy - r)]
