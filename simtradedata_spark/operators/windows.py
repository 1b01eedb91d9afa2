"""Window / time-series operators — A1, W1-W3 (SURVEY §2.6-2.7).

  - moving_avg: trailing-N mean (MA signals, ``strategies/simple/backtest.py:66-67``)
  - trailing_n: last N rows per key before a cutoff, exclusive-of-today rule
    (``docs/PTrade_API_mini_Reference.md:1777-1823,1977``)
  - cumulative_product: per-key running product (adjust-factor linking,
    ``docs/DATA_MAPPING.md:536-575``) via exp(sum(log)) — a single window sum,
    numerically stable for positive ratios, instead of a non-existent cumprod.

All are single-shuffle window plans (partition by key, sort by time).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def moving_avg(
    df: DataFrame,
    value_col: str,
    n: int,
    partition_by: list[str],
    order_by: list[str],
    out_col: str | None = None,
    min_periods: int | None = None,
) -> DataFrame:
    """Trailing-N mean including the current row. Rows earlier than
    ``min_periods`` (default n) get null — pandas ``rolling(n)`` parity."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    wn = w.rowsBetween(-(n - 1), 0)
    mp = n if min_periods is None else min_periods
    avg = F.avg(value_col).over(wn)
    cnt = F.count(value_col).over(wn)
    return df.withColumn(out_col or f"ma{n}", F.when(cnt >= mp, avg))


def trailing_n(
    df: DataFrame,
    n: int,
    partition_by: list[str],
    order_by: list[Column],
) -> DataFrame:
    """Last N rows per key under the given (ascending-time) order — executed as
    a descending row_number ≤ N. Callers apply the exclusive-of-today cutoff
    as a filter BEFORE this (so it pushes down to the scan)."""
    w = Window.partitionBy(*partition_by).orderBy(*[c.desc() for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def cumulative_product(
    df: DataFrame,
    ratio_col: str,
    partition_by: list[str],
    order_by: list[str],
    out_col: str = "cumprod",
) -> DataFrame:
    """Running product of a positive ratio column per key:
    exp(sum(ln(ratio)) over (rows unbounded preceding .. current))."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(out_col, F.exp(F.sum(F.log(ratio_col)).over(w)))
