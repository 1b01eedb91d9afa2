"""Time-based OHLC resampling — operator W4 (SURVEY §2.7).

Reference semantics: "周线…由日线数据进行合成" — weekly/monthly/quarterly/yearly
bars synthesized from daily: open = first, high = max, low = min,
close = last, volume/money = sum (``docs/PTrade_API_mini_Reference.md:1798,
1983,1995``; mootdx native freqs ``mootdx_fetcher.py:104-107``).

first/last are expressed as ``min_by``/``max_by`` on the date — order-insensitive
aggregates that survive any partitioning (a bare ``first()`` after a shuffle is
non-deterministic, which is the classic Spark resampling bug). One shuffle on
(symbol, bucket); partial aggregation happens map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TRUNC = {"W": "week", "M": "month", "Q": "quarter", "Y": "year"}


def resample_ohlc(
    bars: DataFrame,
    freq: str = "W",
    symbol_col: str = "symbol",
    date_col: str = "trade_date",
    open_col: str = "open",
    high_col: str = "high",
    low_col: str = "low",
    close_col: str = "close",
    sum_cols: tuple[str, ...] = ("volume", "money"),
) -> DataFrame:
    """Daily bars → freq ∈ {W, M, Q, Y} bars. Output one row per
    (symbol, period_start) with OHLC + summed volume columns + bar count."""
    unit = _TRUNC[freq.upper()]
    bucket = F.date_trunc(unit, F.col(date_col)).cast("date").alias("period_start")
    aggs = [
        F.min_by(open_col, date_col).alias(open_col),
        F.max(high_col).alias(high_col),
        F.min(low_col).alias(low_col),
        F.max_by(close_col, date_col).alias(close_col),
        *[F.sum(c).alias(c) for c in sum_cols],
        F.count(F.lit(1)).alias("n_bars"),
    ]
    return bars.groupBy(F.col(symbol_col), bucket).agg(*aggs)
