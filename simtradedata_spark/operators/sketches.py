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
from pyspark.sql.window import Window


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


def exact_quantiles_sorted(
    df: DataFrame,
    keys: list[str],
    col: str,
    probabilities: list[float],
) -> DataFrame:
    """Exact continuous quantiles via distributed sort — the 100 TB path.

    ``percentile()`` is exact but buffers EVERY group value inside one
    aggregation buffer (OOM once a group outgrows an executor); sketches are
    bounded but approximate. This computes the same continuous quantile
    (linear interpolation at rank h = (n-1)·q, identical to SQL
    ``percentile_cont`` / DuckDB ``quantile_cont``) from a per-key sort:
    row_number and count share ONE window spec (single exchange + sort),
    each quantile reduces to the ≤2 bounding ranks, and the final groupBy
    combines map-side. Nothing is ever buffered per group.

    Output: keys + one ``q_<p>`` column per probability (dots → '_').
    """
    w = Window.partitionBy(*keys).orderBy(col)
    wall = Window.partitionBy(*keys).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # percentile()/percentile_cont exclude NULLs; row_number would order
    # them first and count() would include them, silently shifting every
    # interpolation rank — filter up front so the semantics match.
    df = df.filter(F.col(col).isNotNull())
    ranked = df.select(
        *keys,
        F.col(col).cast("double").alias("__v"),
        (F.row_number().over(w) - 1).alias("__rn"),
        F.count(F.lit(1)).over(wall).alias("__n"),
    )
    aggs = []
    for p in probabilities:
        h = (F.col("__n") - 1) * F.lit(float(p))
        lo = F.floor(h).cast("long")
        frac = h - lo
        # weight of this row toward quantile p: (1-frac) at rank lo,
        # frac at rank lo+1 (zero when frac == 0), else 0.
        weight = (
            F.when(F.col("__rn") == lo, 1.0 - frac)
            .when((F.col("__rn") == lo + 1) & (frac > 0), frac)
            .otherwise(F.lit(0.0))
        )
        name = f"q_{str(p).replace('.', '_')}"
        aggs.append(F.sum(F.col("__v") * weight).alias(name))
    return ranked.groupBy(*keys).agg(*aggs)
