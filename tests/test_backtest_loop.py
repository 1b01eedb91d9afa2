"""End-to-end backtest consumer loop (SURVEY §3.3): the engine's job is to
answer N sequential point-in-time ``get_history`` calls cheaply and
consistently. A dual-MA crossover strategy (the reference's
``strategies/simple/backtest.py:57-67`` pattern) is driven day by day through
the API, and every daily signal must equal the one computed by the batch
path — a single vectorized window query over the warehouse — so the
pointwise and set-oriented paths can never disagree."""

import bisect

from pyspark.sql import functions as F

from simtradedata_spark.operators.windows import moving_avg

SHORT_N, LONG_N = 3, 6


def test_backtest_consumer_loop_matches_batch_signals(api, warehouse):
    sym = "600000.SS"
    days = api.get_trade_days("2022-03-01", "2022-12-31")
    sample = days[20:32]

    # --- pointwise path: one exclusive-of-today get_history per bar day ----
    loop_signals = {}
    for d in sample:
        h = api.get_history(
            LONG_N, field="close", security_list=[sym], is_dict=True, current_date=d
        )[sym]
        closes = h["close"]
        assert len(closes) == LONG_N
        assert str(h.index.max()) < d  # no lookahead
        ma_s, ma_l = closes.iloc[-SHORT_N:].mean(), closes.mean()
        if abs(ma_s - ma_l) < 1e-9:  # don't assert a coin-flip comparison
            continue
        loop_signals[d] = ma_s > ma_l

    # --- batch path: one window query computing every day's MAs at once ----
    bars = warehouse.read("bars").filter(F.col("symbol") == sym)
    ma = moving_avg(bars, "close", SHORT_N, ["symbol"], ["trade_date"], "ma_s")
    ma = moving_avg(ma, "close", LONG_N, ["symbol"], ["trade_date"], "ma_l")
    pdf = ma.select("trade_date", "ma_s", "ma_l").toPandas()
    pdf["trade_date"] = pdf["trade_date"].astype(str)
    pdf = pdf.sort_values("trade_date").set_index("trade_date")
    bar_dates = list(pdf.index)

    assert loop_signals, "every sampled day was a tie — generator is degenerate"
    for d, sig in loop_signals.items():
        # the strategy acting on day d sees bars strictly before d: its MA
        # state is the window row of the last bar date < d
        prev = bar_dates[bisect.bisect_left(bar_dates, d) - 1]
        row = pdf.loc[prev]
        assert (row.ma_s > row.ma_l) == sig, f"signal mismatch on {d} (state {prev})"


def test_minute_backtest_loop_matches_batch_signals(warehouse):
    """The same loop ≡ batch law at MINUTE frequency: a dual-MA strategy
    stepping bar by bar through get_history(frequency='30m') on the
    point-cache client must reproduce the signals of one vectorized
    window query over the folded 30-minute bars."""
    from simtradedata_spark.api.ptrade import PTradeDataAPI

    api = PTradeDataAPI(warehouse, point_cache=True)
    sym = "600000.SS"
    days = api.get_trade_days("2022-03-01", "2022-03-31")

    loop_signals = {}
    for d in days[2:8]:
        h = api.get_history(
            LONG_N, frequency="30m", field="close",
            security_list=[sym], current_date=d,
        )
        closes = h["close"]
        assert len(closes) == LONG_N
        assert h.index.max().strftime("%Y-%m-%d") < d  # no lookahead
        ma_s, ma_l = closes.iloc[-SHORT_N:].mean(), closes.mean()
        if abs(ma_s - ma_l) < 1e-9:
            continue
        loop_signals[d] = ma_s > ma_l

    # batch path: fold the materialized 1m store to 30m, one window query
    from simtradedata_spark.operators.resample import rebucket_minute_bars
    from simtradedata_spark.operators.windows import moving_avg

    mb = rebucket_minute_bars(
        warehouse.read("minute_bars").filter(F.col("symbol") == sym), 30
    )
    ma = moving_avg(mb, "close", SHORT_N, ["symbol"], ["trade_date", "bar_time"], "ma_s")
    ma = moving_avg(ma, "close", LONG_N, ["symbol"], ["trade_date", "bar_time"], "ma_l")
    pdf = (
        ma.select("trade_date", "bar_time", "ma_s", "ma_l")
        .orderBy("trade_date", "bar_time")
        .toPandas()
    )
    pdf["d"] = pdf["trade_date"].astype(str)

    assert loop_signals, "every sampled day was a tie"
    for d, sig in loop_signals.items():
        # strategy on day d sees bars strictly before d: the last bar row
        prev = pdf[pdf["d"] < d].iloc[-1]
        assert (prev.ma_s > prev.ma_l) == sig, f"minute signal mismatch on {d}"
