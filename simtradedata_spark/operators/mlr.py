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
    they are derived floats — see q_logit_training). Rows with a null
    feature or label are dropped up front: F.sum skips nulls but the row
    count wouldn't, so keeping them would silently mis-scale every
    gradient by the wrong denominator."""
    d = len(feature_cols)
    df = df.na.drop(subset=[*feature_cols, label_col])
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
            if not n:
                raise ValueError(
                    "logistic_regression: no trainable rows (empty input "
                    "or every row has a null feature/label)"
                )
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


def classifier_eval(
    df: DataFrame,
    weights: list[float],
    feature_cols: list[str],
    label_col: str,
    dp: int = 6,
) -> DataFrame:
    """Distributed classifier evaluation, engine-exact: confusion counts
    at the z>0 decision boundary plus rank-based AUC (the Mann-Whitney U
    statistic with average ranks for ties).

    Everything stays in exact arithmetic: the margin z is the same
    fixed-order double chain as training (no sigmoid needed — p>0.5 ⇔
    z>0, and AUC only needs z's ORDER), tie groups collapse to one row
    per distinct margin, and the rank sum is integer/half-integer math —
    so AUC is a rational number both engines compute bit-identically
    before one terminal rounding. Plan: one scan → groupBy(z, y) counts
    → a window over the DISTINCT-margin frame (bounded by feature
    cardinality, not corpus size) → 1-row reduce.
    """
    z: Column = F.lit(weights[0])
    for i, c in enumerate(feature_cols):
        z = z + F.lit(weights[i + 1]) * F.col(c)
    y = F.col(label_col).cast("int")
    per = (
        df.select(z.alias("__z"), y.alias("__y"))
        .groupBy("__z")
        .agg(
            F.sum("__y").alias("__pos"),
            F.sum(1 - F.col("__y")).alias("__neg"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.orderBy("__z").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per.select(
        "__z",
        "__pos",
        "__neg",
        F.coalesce(F.sum(F.col("__pos") + F.col("__neg")).over(w), F.lit(0)).alias(
            "__before"
        ),
    )
    agg = ranked.agg(
        F.sum("__pos").alias("n_pos"),
        F.sum("__neg").alias("n_neg"),
        F.sum(F.when(F.col("__z") > 0, F.col("__pos")).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("__z") > 0, F.col("__neg")).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("__z") <= 0, F.col("__pos")).otherwise(0)).alias("fn"),
        F.sum(F.when(F.col("__z") <= 0, F.col("__neg")).otherwise(0)).alias("tn"),
        F.sum(
            F.col("__pos")
            * (
                F.col("__before").cast("double")
                + (F.col("__pos") + F.col("__neg") + 1) / 2.0
            )
        ).alias("__rank_sum_pos"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        "tp",
        "fp",
        "fn",
        "tn",
        F.round((F.col("tp") + F.col("tn")) / (F.col("n_pos") + F.col("n_neg")), dp).alias(
            "accuracy"
        ),
        F.round(
            (
                F.col("__rank_sum_pos")
                - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0
            )
            / (F.col("n_pos") * F.col("n_neg")),
            dp,
        ).alias("auc"),
    )
