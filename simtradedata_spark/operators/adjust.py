"""Ex-rights price adjustment — operator W1 (SURVEY §2.7), the correctness
heart of the reference's query surface.

Semantics (``docs/DATA_MAPPING.md:536-575``, ``PTrade_API_mini_Reference.md:
2968-3002``, BaoStock direction note ``BaoStock_API_Reference.md:326``):

  - ``fq='post'`` (后复权, adjustflag=1): price × back_adj, where back_adj is
    the cumulative product of per-event ratios up to the date — historical
    prices stay fixed, post-event prices are scaled up.
  - ``fq='pre'``  (前复权, adjustflag=2): price × fore_adj where
    fore_adj(t) = back_adj(t) / back_adj(latest) — today's price stays fixed,
    history is scaled down.
  - ``fq=None``   (不复权, adjustflag=3): raw prices.

The reference's fetcher docstring has the flag direction backwards
(``unified_fetcher.py:102``); we follow the BaoStock docs and the API map at
``ptrade_data_api.py:68-69`` (none→3, pre→2, post→1).

Plan shape: bars ⋈ adjust_factor is an equi-join on (symbol, trade_date) —
both sides partitioned/bucketed the same way in the warehouse, so at scale
this is a co-located join; the multiply is codegen'd. Volume is adjusted by
the inverse factor (share counts scale opposite to price).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PRICE_COLS = ("open", "high", "low", "close", "preclose")
FQ_TO_ADJUSTFLAG = {None: "3", "none": "3", "pre": "2", "post": "1"}


def adjust_bars(
    bars: DataFrame,
    adjust_factor: DataFrame,
    fq: str | None = None,
    price_cols: tuple[str, ...] = PRICE_COLS,
) -> DataFrame:
    """Return bars with price columns adjusted per ``fq``; rows without a
    factor row (index series — ``baostock_fetcher.py:98-104``) pass through
    unadjusted (factor defaults to 1).

    ``preclose`` deliberately uses the SAME-day factor, not the previous
    day's: BaoStock's 涨跌幅复权 (pct-change linking,
    ``BaoStock_API_Reference.md:334-340``) defines factors so that
    adjusted_close(t)/adjusted_preclose(t) reproduces the raw pctChg, which
    requires preclose scaled by factor(t) — on an ex-date this equals the
    exchange's event-adjusted reference price, not the prior adjusted
    close."""
    if fq in (None, "none"):
        return bars
    if fq not in ("pre", "post"):
        raise ValueError(f"fq must be None/'pre'/'post', got {fq!r}")
    fcol = "fore_adj" if fq == "pre" else "back_adj"
    af = adjust_factor.select("symbol", "trade_date", fcol)
    joined = bars.join(af, ["symbol", "trade_date"], "left")
    factor = F.coalesce(F.col(fcol), F.lit(1.0))
    # Decimal-exact multiply: prices are 1e-4-quantized and factors
    # 1e-6-quantized, so price×factor is an EXACT 10-decimal value — a plain
    # round(x*f, 6) on doubles then hits exact .5 ties (1 in 10^4 values)
    # where engines disagree within an ulp. Scale both to integers, add the
    # half, integer-divide: bit-identical everywhere (incl. the DuckDB
    # oracle). Magnitudes: price·1e4 ≈ 1e6, factor·1e6 ≈ 1e7 → product
    # ≈ 1e13, safely inside int64 under ANSI.
    factor_i = F.round(factor * 1e6).cast("long")
    out = joined
    for c in price_cols:
        if c in bars.columns:
            price_i = F.round(F.col(c) * 1e4).cast("long")
            out = out.withColumn(
                c, ((price_i * factor_i + 5000) / 10000).cast("long") / 1e6
            )
    if "volume" in bars.columns:
        # Division of integer-valued volume by an irrational-ish factor never
        # lands on an exact decimal half — float rounding is tie-free here.
        out = out.withColumn("volume", F.round(F.col("volume") / factor, 2))
    return out.drop(fcol)


def densify_adjust_factors(
    events: DataFrame,
    dates: DataFrame,
) -> DataFrame:
    """Provider EVENT rows → the warehouse's DAILY adjust-factor table.

    A provider's ``query_adjust_factor`` answers with one row per ex-rights
    event (``baostock_fetcher.py:85-119``: ``dividOperateDate`` keyed, the
    post-step cumulative factors), while ``adjust_bars`` and the warehouse's
    ``adjust_factor`` table are DAILY (synthetic.adjust_factor's step
    function sampled on every trading day). This bridges the two:

      - ``events``: (symbol, trade_date, fore_adj, back_adj) — the factor
        values IN FORCE from that date forward (post-step).
      - ``dates``:  (symbol, trade_date) — the trading-day spine to sample
        on (usually ``bars.select("symbol", "trade_date")``).

    Backward as-of join per symbol; days before a symbol's first event get
    back_adj = 1 and fore_adj = 1 / max(back_adj) — the same cumprod
    identity the synthetic generator satisfies, so densifying the
    generator's own event rows reproduces its daily table exactly (tested).
    Symbols with NO events (index series) come back all-1/1 — ``adjust_bars``
    then leaves them untouched, the reference's documented index behavior
    (``baostock_fetcher.py:96-104``).

    Plan: one union+window as-of pass (operators/asof.py) plus a per-symbol
    broadcast-joined max over the EVENTS frame — no cross join,
    daily-spine-sized output. The fore normalizer deliberately comes from
    the events, not from the spine-sampled rows: a provider's fore factors
    are normalized against its LATEST event, which may fall outside the
    sampled date range — deriving the max from the sampled rows would give
    pre-first-event days a different normalization than the event rows
    carry, a spurious jump in fore-adjusted prices."""
    from simtradedata_spark.operators.asof import asof_join

    ev = events.select("symbol", "trade_date", "fore_adj", "back_adj")
    joined = asof_join(
        dates.select("symbol", "trade_date"),
        ev,
        on="trade_date",
        by=["symbol"],
        right_cols=["fore_adj", "back_adj"],
    )
    norm = ev.groupBy("symbol").agg(F.max("back_adj").alias("__final_back"))
    return (
        joined.join(F.broadcast(norm), "symbol", "left")
        .select(
            "symbol",
            "trade_date",
            F.round(
                F.coalesce(
                    F.col("fore_adj"),
                    F.lit(1.0) / F.coalesce("__final_back", F.lit(1.0)),
                ),
                6,
            ).alias("fore_adj"),
            F.round(F.coalesce(F.col("back_adj"), F.lit(1.0)), 6).alias("back_adj"),
        )
    )
