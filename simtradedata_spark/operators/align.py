"""Calendar alignment + suspension forward-fill — operators J6 / W2 (SURVEY §2.5, §2.7).

Reference semantics: bar series are reindexed onto the trade-day axis and
suspended days are forward-filled with volume=0
(``docs/PTrade_API_mini_Reference.md:1792,1975``; provider behavior
``docs/reference/baostock_api/BaoStock_API_Reference.md:330``).

Scale notes: the calendar is tiny (250 rows/year) → the calendar×universe
scaffold is built with a **broadcast** join, so the only shuffle is the final
left join against bars on (symbol, date) — and even that disappears if bars
are bucketed by symbol. The forward-fill window is a single per-symbol sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def forward_fill(
    df: DataFrame,
    cols: list[str],
    partition_by: list[str],
    order_by: list[str],
) -> DataFrame:
    """Per-partition forward fill: each null in ``cols`` takes the latest
    preceding non-null value (last(ignoreNulls) over an unbounded-preceding
    window) — pandas ``fillna(method='pre')`` / PTrade ``fill='pre'`` parity."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def align_to_calendar(
    bars: DataFrame,
    trading_days: DataFrame,
    symbol_col: str = "symbol",
    date_col: str = "trade_date",
    fill_cols: tuple[str, ...] = ("close",),
    zero_cols: tuple[str, ...] = ("volume", "money"),
) -> DataFrame:
    """Reindex per-symbol bars onto the full trading-day axis.

    Missing (suspended) days get: price columns forward-filled from the prior
    close, volume/money = 0, ``trade_status`` = 0. The symbol axis is each
    symbol's [min(date), max(date)] span so pre-IPO / post-delisting rows are
    not fabricated.
    """
    days = trading_days.select(F.col(date_col))
    span = bars.groupBy(symbol_col).agg(
        F.min(date_col).alias("__d0"), F.max(date_col).alias("__d1")
    )
    scaffold = span.join(
        F.broadcast(days),
        (F.col(date_col) >= F.col("__d0")) & (F.col(date_col) <= F.col("__d1")),
    ).select(symbol_col, date_col)

    out = scaffold.join(bars, [symbol_col, date_col], "left")
    filled = forward_fill(out, list(fill_cols), [symbol_col], [date_col])
    for c in zero_cols:
        filled = filled.withColumn(c, F.coalesce(F.col(c), F.lit(0.0)))
    if "trade_status" in bars.columns:
        filled = filled.withColumn(
            "trade_status", F.coalesce(F.col("trade_status"), F.lit(0))
        )
    return filled
