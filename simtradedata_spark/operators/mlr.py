"""In-engine model training: full-batch logistic regression as DataFrame
aggregations.

The quality-classifier pipeline so far ships INFERENCE as columnar exprs
(textstats.logit_quality_score — coefficients trained offline). This
module closes the loop: train those coefficients in the engine itself,
the way a 100 TB curation run would — full-batch gradient descent where
each step is ONE scan with a map-side-combined (d+1)-value gradient
aggregate; the weight vector is bounded driver state (d+1 floats, the
same class of sequential global state as the BPE merge table or the IVF
training sample). No per-row Python anywhere: the sigmoid, residual and
per-feature products are column expressions inside whole-stage codegen.

Determinism (the kmeans discipline, queries.py::_sql_logit_ctes replays
it): features are rounded to ``dp`` decimals before entering the model;
the dot product is written as an explicit left-to-right chain (identical
association order in SQL); per-step gradient SUMS are rounded at ``dp``
before the weight update, and the updated weights re-round at ``dp`` —
so every step's weights are cross-engine exact and the whole trajectory
is value-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def logistic_regression(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    steps: int = 3,
    lr: float = 1.0,
    dp: int = 6,
) -> list[list[float]]:
    """Train logistic regression by full-batch GD; returns the weight
    trajectory [[w0, w1..wd] after each step] (w0 = bias). Feature
    columns must already be the model's inputs (round them upstream if
    they are derived floats — see q_logit_training)."""
    d = len(feature_cols)
    w = [0.0] * (d + 1)
    n = None
    out: list[list[float]] = []
    for _ in range(steps):
        z: Column = F.lit(w[0])
        for i, c in enumerate(feature_cols):
            z = z + F.lit(w[i + 1]) * F.col(c)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        resid = p - F.col(label_col).cast("double")
        aggs = [F.round(F.sum(resid), dp).alias("g0")] + [
            F.round(F.sum(resid * F.col(c)), dp).alias(f"g{i + 1}")
            for i, c in enumerate(feature_cols)
        ]
        if n is None:
            aggs.append(F.count(F.lit(1)).alias("n"))
        row = df.agg(*aggs).first()
        if n is None:
            n = row["n"]
        w = [
            round(w[i] - lr * row[f"g{i}"] / n, dp)
            for i in range(d + 1)
        ]
        out.append(list(w))
    return out


def predict(z_weights: list[float], feature_cols: list[str]) -> Column:
    """Columnar scorer for trained weights: P(y=1 | x) as a pure
    expression (the logit_quality_score inference shape)."""
    z: Column = F.lit(z_weights[0])
    for i, c in enumerate(feature_cols):
        z = z + F.lit(z_weights[i + 1]) * F.col(c)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
