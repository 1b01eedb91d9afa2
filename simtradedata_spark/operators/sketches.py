"""Approximate sketch aggregations — the bounded-memory scale path for
cardinality and quantile questions where exact answers need a full shuffle
of the key space.

Spark's built-ins are already distributed mergeable sketches (map-side
partial sketch -> merge), so these operators are thin, *named* wrappers that
pin down the engine's accuracy contract and keep call sites declarative:

  - ``hll_distinct_by``: HyperLogLog++ (`approx_count_distinct`), relative
    error ``rsd`` (default 5%), O(1) memory per group vs O(distinct) for
    exact count-distinct.
  - ``approx_quantiles_by``: Greenwald-Khanna (`percentile_approx`),
    rank error ``1/accuracy`` — exact percentiles need a per-group sort.

Both verified against exact answers within tolerance (tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_distinct_by(
    df: DataFrame, keys: list[str], col: str, rsd: float = 0.05
) -> DataFrame:
    """(keys..., approx_distinct) per group via HLL++."""
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(col, rsd=rsd).alias("approx_distinct")
    )


def approx_quantiles_by(
    df: DataFrame,
    keys: list[str],
    col: str,
    probabilities: list[float],
    accuracy: int = 10000,
) -> DataFrame:
    """(keys..., quantiles array) per group via Greenwald-Khanna."""
    return df.groupBy(*keys).agg(
        F.percentile_approx(
            col, F.array(*[F.lit(p) for p in probabilities]), F.lit(accuracy)
        ).alias("quantiles")
    )
