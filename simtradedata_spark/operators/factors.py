"""Cross-sectional factor operators — the data-side of the spec's ranking
surface (`get_sort_msg`, PTrade_API_mini_Reference.md:2320) and the "top 20
by factor" strategy pattern (:6253): standardize a factor within each date's
cross-section, rank it, select top-N.

Scale: every transform is a window partitioned by the date column — the
cross-section. Dates are numerous and balanced (one partition per trading
day), so the shuffle is even; no global window, no driver collect. At 100 TB
the same plan holds: one exchange on date, then in-partition sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def cross_sectional(
    df: DataFrame,
    date_col: str,
    factor_col: str,
    tiebreaks: list[str | Column] | None = None,
) -> DataFrame:
    """Append per-date cross-sectional features for ``factor_col``:

      - ``cs_zscore``  = (x − mean_date(x)) / stddev_pop_date(x) (null when
        the cross-section is degenerate: <2 rows or zero variance),
      - ``cs_rank``    = dense descending rank (1 = best; equal factor
        values share a rank — ordered by the factor ALONE, so ranks are
        deterministic without tiebreaks),
      - ``cs_pct``     = percent_rank in [0, 1], descending.

    One exchange on ``date_col``; the aggregate moments and the rank share
    the same window partitioning. ``tiebreaks`` is unused here (rank
    semantics don't want it) and kept for signature symmetry with
    ``top_n_by_factor``.
    """
    del tiebreaks
    wd = Window.partitionBy(date_col)
    wr = Window.partitionBy(date_col).orderBy(F.col(factor_col).desc())
    mean = F.mean(factor_col).over(wd)
    std = F.stddev_pop(factor_col).over(wd)
    return (
        df.withColumn(
            "cs_zscore",
            F.when(std > 0, (F.col(factor_col) - mean) / std),
        )
        .withColumn("cs_rank", F.dense_rank().over(wr))
        .withColumn("cs_pct", F.percent_rank().over(wr))
    )


def top_n_by_factor(
    df: DataFrame,
    date_col: str,
    factor_col: str,
    n: int,
    tiebreaks: list[str | Column] | None = None,
) -> DataFrame:
    """Per-date top-``n`` rows by descending factor (row_number, total order
    required via ``tiebreaks`` for determinism)."""
    order = [F.col(factor_col).desc()] + [
        c if isinstance(c, Column) else F.col(c) for c in (tiebreaks or [])
    ]
    w = Window.partitionBy(date_col).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def winsorize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    p: float = 0.05,
    out_col: str | None = None,
) -> DataFrame:
    """Clip ``value_col`` to its per-group [p, 1−p] percentile band — the
    standard outlier guard before cross-sectional z-scores (a fat-fingered
    tick would otherwise own the whole z-scale). The exact interpolated
    percentiles ride the SAME group window as any later moments: one
    exchange on ``group_col`` total."""
    w = Window.partitionBy(group_col)
    lo = F.percentile(F.col(value_col), F.lit(p)).over(w)
    hi = F.percentile(F.col(value_col), F.lit(1 - p)).over(w)
    return df.withColumn(
        out_col or f"{value_col}_wins",
        F.least(F.greatest(F.col(value_col), lo), hi),
    )
