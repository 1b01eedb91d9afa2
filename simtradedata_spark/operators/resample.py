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


def _session_minute(hhmm):
    """A-share session clock hhmm (0930-1129, 1300-1459) → contiguous
    session minute 0..239 (lunch gap removed), so fixed-width buckets never
    straddle the break. Boundary prints clamp into the ADJACENT session
    bucket — real feeds emit trades at exactly 11:30:00 (morning close
    auction → last morning bar, NOT the 13:00 bar), 15:00:00 (closing
    call auction → last afternoon bar) and 09:25 (opening auction →
    first bar)."""
    hh, mm = F.floor(hhmm / 100), hhmm % 100
    morning = F.least(F.greatest((hh - 9) * 60 + mm - 30, F.lit(0)), F.lit(119))
    afternoon = F.least(
        F.greatest((hh - 13) * 60 + mm + 120, F.lit(120)), F.lit(239)
    )
    return F.when(hh < 12, morning).otherwise(afternoon)


def _session_minute_to_hhmm(m):
    """Inverse of ``_session_minute`` (same mapping as the tick generator,
    sources/synthetic.py::ticks)."""
    morning = (9 + F.floor((m + 30) / 60)) * 100 + (m + 30) % 60
    afternoon = (13 + F.floor((m - 120) / 60)) * 100 + (m - 120) % 60
    return F.when(m < 120, morning).otherwise(afternoon)


def time_bars_from_ticks(
    ticks: DataFrame,
    minutes: int = 1,
    symbol_col: str = "symbol",
    date_col: str = "trade_date",
    ts_col: str = "ts_ms",
    price_col: str = "price",
    qty_col: str = "qty",
    order_col: str = "seq",
    with_state: bool = False,
) -> DataFrame:
    """Tick stream → fixed-width intraday OHLCV bars (the spec's minute
    frequencies, ``docs/PTrade_API_mini_Reference.md:521-694`` — tick/minute
    modes the reference declares but never implements).

    ``bar_time`` labels the bucket START as an hhmm int (0930 = the
    09:30:00-09:3x bar). open/close resolve by ``order_col`` via
    min_by/max_by — order-insensitive under any partitioning (the same
    determinism rule as resample_ohlc). ``money`` is summed in integer
    1e-4 units (exchange prices are at most 4-decimal-quantized) so the
    total is EXACT and engine/association-order independent, then
    rescaled; ``vwap`` derives from the same integers. One shuffle on
    (symbol, day, bucket) with map-side partial aggregation — at 100 TB
    of ticks this is a single all-map-reduce pass, no windows, no
    per-day collect.

    ``with_state=True`` additionally emits the DECOMPOSABLE aggregate
    state (``open_ord``, ``close_ord``, ``money_e4``) that lets
    ``refresh_time_bars`` fold later tick batches into an existing bar
    table without re-reading history — the continuous-aggregate form for
    a live tick ingest.
    """
    hhmm = F.floor((F.col(ts_col) % F.lit(10**9)) / F.lit(10**5))
    bucket = F.floor(_session_minute(hhmm) / minutes).cast("int")
    pe4 = F.round(F.col(price_col) * 10000).cast("long") * F.col(qty_col)
    state_aggs = (
        [
            F.min(order_col).alias("open_ord"),
            F.max(order_col).alias("close_ord"),
        ]
        if with_state
        else []
    )
    out = (
        ticks.withColumn("__pe4", pe4)
        .groupBy(
            F.col(symbol_col),
            F.col(date_col),
            _session_minute_to_hhmm(bucket * minutes).cast("int").alias("bar_time"),
        )
        .agg(
            F.min_by(price_col, order_col).alias("open"),
            F.max(price_col).alias("high"),
            F.min(price_col).alias("low"),
            F.max_by(price_col, order_col).alias("close"),
            F.sum(qty_col).alias("volume"),
            (F.sum("__pe4") / 10000.0).alias("money"),
            F.sum("__pe4").alias("money_e4"),
            F.count(F.lit(1)).alias("n_ticks"),
            *state_aggs,
        )
        # vwap to 6dp by INTEGER half-up division — the exact integer sums
        # make half-ties at the 7th decimal common, where double round()
        # differs across engines (HALF_UP vs half-even). The numerator can
        # exceed 2^53, so this must be bigint `div`, not double floor.
        .withColumn(
            "vwap",
            F.expr("((2 * money_e4 * 100 + volume) div (2 * volume)) / 1e6"),
        )
    )
    return out if with_state else out.drop("money_e4")


def refresh_time_bars(
    state: DataFrame,
    new_ticks: DataFrame,
    minutes: int = 1,
    symbol_col: str = "symbol",
    date_col: str = "trade_date",
    ts_col: str = "ts_ms",
    price_col: str = "price",
    qty_col: str = "qty",
    order_col: str = "seq",
) -> DataFrame:
    """Fold a batch of NEW ticks into an existing stateful bar table
    (``time_bars_from_ticks(..., with_state=True)`` output) — the
    hypertable continuous-aggregate pattern applied to minute bars: only
    the delta's buckets re-aggregate, history is never re-read and the
    result is EXACTLY what a flat recompute over all ticks would produce
    (OHLC folds via the order state, money via the integer sums).
    ``order_col`` must be globally comparable within a (symbol, day) —
    tick sequence numbers or event timestamps both qualify."""
    delta = time_bars_from_ticks(
        new_ticks, minutes, symbol_col, date_col, ts_col,
        price_col, qty_col, order_col, with_state=True,
    )
    merged = state.select(delta.columns).unionByName(delta)
    return (
        merged.groupBy(symbol_col, date_col, "bar_time")
        .agg(
            F.min_by("open", "open_ord").alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", "close_ord").alias("close"),
            F.sum("volume").alias("volume"),
            (F.sum("money_e4") / 10000.0).alias("money"),
            F.sum("money_e4").alias("money_e4"),
            F.sum("n_ticks").alias("n_ticks"),
            F.min("open_ord").alias("open_ord"),
            F.max("close_ord").alias("close_ord"),
        )
        .withColumn(
            "vwap",
            F.expr("((2 * money_e4 * 100 + volume) div (2 * volume)) / 1e6"),
        )
    )


def rebucket_minute_bars(mb: DataFrame, minutes: int) -> DataFrame:
    """1-minute bars → N-minute bars (the hypertable-rollup shape: coarser
    bars fold from the finest materialized level without re-reading ticks).
    OHLC-of-OHLC by bar_time; vwap re-derived from the summed money/volume
    so it stays volume-weighted, not bar-averaged.

    When the input carries the decomposable state
    (``time_bars_from_ticks(..., with_state=True)`` — how the warehouse
    materializes `minute_bars`), money and vwap fold through the EXACT
    integer sums with the same half-up division as the tick path, so any
    fold width returns bit-identical money/vwap to a direct
    ``time_bars_from_ticks(ticks, minutes)``. Without state (external 1m
    data) money folds as doubles and vwap re-rounds — documented
    last-ulp-weaker."""
    stateful = "money_e4" in mb.columns
    sm = _session_minute(F.col("bar_time"))
    bucket = F.floor(sm / minutes).cast("int")
    money_aggs = (
        [
            (F.sum("money_e4") / 10000.0).alias("money"),
            F.sum("money_e4").alias("__c"),
        ]
        if stateful
        else [F.sum("money").alias("money")]
    )
    out = mb.groupBy(
        "symbol",
        "trade_date",
        _session_minute_to_hhmm(bucket * minutes).cast("int").alias("bar_time"),
    ).agg(
        F.min_by("open", "open_ord" if stateful else "bar_time").alias("open"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max_by("close", "close_ord" if stateful else "bar_time").alias("close"),
        F.sum("volume").alias("volume"),
        *money_aggs,
        F.sum("n_ticks").alias("n_ticks"),
    )
    if stateful:
        return out.withColumn(
            "vwap",
            F.expr("((2 * __c * 100 + volume) div (2 * volume)) / 1e6"),
        ).drop("__c")
    return out.withColumn(
        "vwap", F.round(F.col("money") / F.col("volume"), 6)
    )
