"""Synthetic market generator invariants (FIXTURES.md §§1-8)."""

from pyspark.sql import functions as F


def test_calendar_weekends_and_holidays(market):
    cal = market.trade_calendar().toPandas()
    trading = cal[cal.is_trading_day]
    assert all(d.weekday() < 5 for d in trading.calendar_date)
    jan2 = [d for d in trading.calendar_date if d.month == 1 and d.day <= 3]
    assert jan2 == []


def test_ohlc_invariants(market):
    bars = market.bars()
    bad = bars.filter(
        ~(
            (F.col("low") <= F.least("open", "close"))
            & (F.greatest("open", "close") <= F.col("high"))
            & (F.col("volume") >= 0)
        )
    ).count()
    assert bad == 0


def test_suspension_rows(market):
    bars = market.bars().filter(
        (F.col("sym_idx") == 3) & (F.col("day_idx") >= 100) & (F.col("day_idx") < 110)
    )
    pdf = bars.toPandas()
    assert len(pdf) == 10
    assert (pdf.volume == 0).all()
    assert (pdf.trade_status == 0).all()
    assert (pdf[["open", "high", "low", "close"]].nunique(axis=1) == 1).all()
    # flat at prior close
    assert (pdf.close == pdf.preclose).all()


def test_ipo_and_delist_spans(market):
    bars = market.bars()
    n_days = market.trading_days().count()
    ipo = bars.filter(F.col("sym_idx") == market.ipo_idx).agg(
        F.min("day_idx"), F.max("day_idx")
    ).first()
    assert ipo[0] == n_days // 3 and ipo[1] == n_days - 1
    dl = bars.filter(F.col("sym_idx") == market.delist_idx).agg(
        F.min("day_idx"), F.max("day_idx")
    ).first()
    assert dl[0] == 0 and dl[1] == (2 * n_days) // 3 - 1


def test_determinism_across_partitionings(spark, market):
    """Hash-derived randomness ⇒ identical data under any parallelism."""
    a = market.bars().filter(F.col("sym_idx") == 1).orderBy("day_idx").toPandas()
    b = (
        market.bars()
        .repartition(17)
        .filter(F.col("sym_idx") == 1)
        .orderBy("day_idx")
        .toPandas()
    )
    assert a.equals(b)


def test_adjust_factor_cumprod_relation(market):
    """back_adj must be the running product of (1+bonus_ps) per symbol, and
    fore_adj(last) == 1 (DATA_MAPPING.md:536-575)."""
    af = market.adjust_factor().toPandas()
    ev = market.exrights().toPandas()
    for sym, g in af.groupby("symbol"):
        g = g.sort_values("trade_date")
        evs = ev[ev.symbol == sym].sort_values("ex_date")
        expect = 1.0
        assert abs(g.iloc[0].back_adj - 1.0) < 1e-6 or len(evs[evs.ex_date <= g.iloc[0].trade_date])
        assert abs(g.iloc[-1].fore_adj - 1.0) < 1e-6
        for _, e in evs.iterrows():
            expect *= 1 + e.bonus_ps
        assert abs(g.iloc[-1].back_adj - expect) < 1e-4


def test_fundamentals_restatement_and_ttm(market):
    f = market.fundamentals().toPandas()
    restated = f[f.merge_seq == 1]
    assert len(restated) == market.n_symbols
    assert (restated.end_date.astype(str) == "2022-12-31").all()
    firsts = f[f.merge_seq == 0].sort_values(["symbol", "end_date"])
    g = firsts.groupby("symbol").head(3)
    assert g.roe_ttm.isna().all()
