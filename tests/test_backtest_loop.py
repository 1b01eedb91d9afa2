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
