"""Distributed model fitting as DataFrame aggregation loops
(SURVEY.md §2.10 extensions).

Two fitting regimes cover the whole fixed-width-model space:

- **closed form** (queries.q_ols_event_model): one aggregation pass,
  solve in-plan — no loop at all.
- **full-batch gradient descent** (here): the general pattern for any
  differentiable loss. Each iteration is ONE distributed aggregation
  (the gradient is a sum over rows — map-side partial aggregation does
  the heavy lifting), the driver holds only the weight vector (it IS
  the model, same bounded-collect rule as the IVF codebook /
  PCA Gram), and the feature relation is cached once and reused by
  every pass.

Determinism / engine portability (the train_ivf_centroids recipe):
gradients are exact decimal sums of per-row double terms, the weight
update `w - lr * g` is IEEE arithmetic, and each new weight snaps to
9 decimals — so the recurrence stays in lockstep with the DuckDB
oracle's unrolled-CTE replay even though `exp()` is only
faithfully-rounded (not correctly-rounded) on either engine: sub-ulp
exp differences perturb the decimal-summed gradient by ~1e-14, far
inside the snap.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _snap9(x: float) -> float:
    return math.floor(x * 1e9 + 0.5) / 1e9


def logistic_regression_gd(
    features: DataFrame,
    feature_cols: list[str],
    label_col: str = "y",
    iterations: int = 12,
    lr: float = 2.0,
) -> list[float]:
    """Full-batch gradient descent for L2-free logistic regression.

    ``features`` must have double feature columns and a 0/1 double
    label. Returns the trained weight vector [w_bias, w_1, ...] after
    ``iterations`` steps from the zero vector:

        p_i   = 1 / (1 + exp(-(w . [1, x_i])))
        g_j   = sum_i (p_i - y_i) * x_ij / n      (decimal sum, /n in-engine)
        w_j  <- snap9(w_j - lr * g_j)

    One aggregation job per iteration; the cached feature relation is
    the only corpus-sized state and the driver never sees a row.
    """
    cols = ["__one__"] + list(feature_cols)
    feats = features.select(
        F.col(label_col).alias("__y__"),
        F.lit(1.0).alias("__one__"),
        *[F.col(c) for c in feature_cols],
    )
    dp = feats.sparkSession.sparkContext.defaultParallelism
    feats = feats.repartition(dp).cache()
    try:
        w = [0.0] * len(cols)
        for _ in range(iterations):
            z = F.lit(0.0)
            for wj, c in zip(w, cols):
                z = z + F.lit(wj) * F.col(c)
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
            resid = p - F.col("__y__")
            agg = feats.agg(
                F.count("*").alias("n"),
                *[
                    (
                        F.sum(
                            (resid * F.col(c)).cast("decimal(38,18)")
                        ).cast("double")
                        / F.count("*")
                    ).alias(f"g{j}")
                    for j, c in enumerate(cols)
                ],
            ).collect()[0]
            w = [
                _snap9(wj - lr * float(agg[f"g{j}"]))
                for j, wj in enumerate(w)
            ]
        return w
    finally:
        feats.unpersist()


def fit_stump(
    df,
    y_expr,
    h_col: str = "h",
    candidates: range = range(23),
    extra_aggs: dict | None = None,
) -> dict:
    """One-pass depth-1 regression split for ``y_expr ~ h_col``: every
    candidate's left-count and left-sum ride generated conditional
    aggregates (exact decimal sums), so the relation is scanned ONCE
    per fitted node regardless of candidate count — the histogram-GBDT
    per-node structure. The returned split (c, meanL, meanR, sse) is
    driver-held model state (bounded: one struct per node); means and
    the argmin score are snapped (9 dp / 6 dp) so a DuckDB replay of
    the same sums picks the identical split.

    ``extra_aggs``: caller-supplied {name: aggregate Column} that RIDE
    the same one-pass aggregation (e.g. the boosting loop's previous-
    round ensemble SSE — both depend only on state known before this
    pass, so fusing them halves the loop's driver-blocking actions);
    their values come back under ``extras`` keyed by name, computed by
    the byte-identical expressions a separate .agg() would have run."""
    import pyspark.sql.functions as F

    aggs = [
        F.count("*").cast("bigint").alias("n"),
        F.sum(y_expr.cast("decimal(38,18)")).alias("s"),
        F.sum((y_expr * y_expr).cast("decimal(38,18)")).alias("q"),
    ]
    for c in candidates:
        cond = F.col(h_col) <= c
        aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(f"nl{c}")
        )
        aggs.append(
            F.sum(
                F.when(cond, y_expr).otherwise(0.0).cast("decimal(38,18)")
            ).alias(f"sl{c}")
        )
    for name, col in (extra_aggs or {}).items():
        aggs.append(col.alias(name))
    row = df.agg(*aggs).collect()[0]
    n, s, q = int(row["n"]), float(row["s"]), float(row["q"])

    def snap(x: float, p: float) -> float:
        return math.floor(x * p + 0.5) / p

    best = None
    for c in candidates:
        nl, sl = int(row[f"nl{c}"]), float(row[f"sl{c}"])
        if nl == 0 or nl == n:
            continue
        sse = snap(
            q - (sl * sl) / nl - ((s - sl) * (s - sl)) / (n - nl), 1e6
        )
        if best is None or sse < best["sse"]:
            best = {
                "c": c,
                "nl": nl,
                "sse": sse,
                "mean_l": snap(sl / nl, 1e9),
                "mean_r": snap((s - sl) / (n - nl), 1e9),
            }
    if best is None:
        # every candidate split was degenerate (all rows on one side
        # for all cut points — e.g. a single-valued feature column):
        # return an explicit no-split sentinel instead of crashing on
        # best["n"] below; callers see c=None and keep the root mean.
        best = {
            "c": None,
            "nl": 0,
            "sse": snap(q - s * s / n, 1e6),
            "mean_l": snap(s / n, 1e9),
            "mean_r": snap(s / n, 1e9),
        }
    best["n"] = n
    best["mean_all"] = snap(s / n, 1e9)
    best["total_sse"] = snap(q - s * s / n, 1e6)
    if extra_aggs:
        best["extras"] = {name: row[name] for name in extra_aggs}
    return best
