"""W7 indicators vs an independent pandas computation."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from simtradedata_spark.operators.indicators import compute_indicators


def test_macd_matches_pandas(spark, market):
    bars = market.bars().filter(F.col("sym_idx") == 1)
    got = compute_indicators(bars).orderBy("trade_date").toPandas()
    pdf = bars.orderBy("trade_date").toPandas()
    close = pdf.close
    ema12 = close.ewm(span=12, adjust=False).mean()
    ema26 = close.ewm(span=26, adjust=False).mean()
    dif = ema12 - ema26
    dea = dif.ewm(span=9, adjust=False).mean()
    assert np.allclose(got.dif.values, dif.values, rtol=1e-9)
    assert np.allclose(got.dea.values, dea.values, rtol=1e-9)
    assert np.allclose(got.macd.values, (2 * (dif - dea)).values, rtol=1e-9)


def test_kdj_rsi_bounds(spark, market):
    bars = market.bars().filter(F.col("sym_idx").isin(0, 1))
    got = compute_indicators(bars).toPandas()
    assert got.k.between(0, 100).all()
    assert got.d.between(0, 100).all()
    assert got.rsi.between(0, 100).all()
    assert got.groupby("symbol").size().nunique() == 1


def test_indicators_parallel_groups_consistent(spark, market):
    """Per-symbol grouped-map must give identical results regardless of the
    number of input partitions."""
    bars = market.bars().filter(F.col("sym_idx") == 2)
    a = compute_indicators(bars).orderBy("trade_date").toPandas()
    b = compute_indicators(bars.repartition(13)).orderBy("trade_date").toPandas()
    pd.testing.assert_frame_equal(a, b)


def test_rsi_series_matches_pandas(spark):
    from simtradedata_spark.operators.indicators import rsi_series

    rng = np.random.RandomState(9)
    pdf = pd.DataFrame(
        {"k": ["a"] * 60 + ["b"] * 60, "t": list(range(60)) * 2,
         "x": rng.rand(120).round(4) * 100}
    )
    got = (
        rsi_series(spark.createDataFrame(pdf), "x", ["k"], "t", n=6)
        .orderBy("k", "t")
        .toPandas()
    )
    for k, grp in pdf.groupby("k"):
        delta = grp.sort_values("t")["x"].diff()
        gain = delta.clip(lower=0).fillna(0.0)
        loss = (-delta).clip(lower=0).fillna(0.0)
        ag = gain.ewm(alpha=1 / 6, adjust=False).mean()
        al = loss.ewm(alpha=1 / 6, adjust=False).mean()
        expect = (100 * ag / (ag + al).replace(0, np.nan)).fillna(50.0)
        np.testing.assert_allclose(
            got[got.k == k].rsi.values, expect.values, rtol=1e-9
        )


def test_rsi_flat_series_is_50(spark):
    from simtradedata_spark.operators.indicators import rsi_series

    df = spark.createDataFrame(
        [("a", t, 7.5) for t in range(10)], "k string, t int, x double"
    )
    vals = rsi_series(df, "x", ["k"], "t").select("rsi").toPandas()["rsi"]
    assert (vals == 50.0).all()


def test_cci_series_matches_pandas_and_stays_jvm(spark):
    from simtradedata_spark.operators.indicators import cci_series

    rng = np.random.RandomState(10)
    pdf = pd.DataFrame(
        {"k": ["a"] * 50, "t": range(50), "x": rng.rand(50).round(4) * 10}
    )
    sdf = spark.createDataFrame(pdf)
    out = cci_series(sdf, "x", ["k"], "t", n=14)
    # no Python in the plan: pure window aggregates
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    got = out.orderBy("t").toPandas()["cci"]
    tp = pdf["x"]
    sma = tp.rolling(14, min_periods=1).mean()
    md = (tp - sma).abs().rolling(14, min_periods=1).mean().replace(0, np.nan)
    expect = (tp - sma) / (0.015 * md)
    np.testing.assert_allclose(got.values, expect.values, rtol=1e-9)


def test_minute_frequency_macd(api):
    """get_MACD(frequency='30m') runs the same EMA recursion over
    post-adjusted minute bars; cross-checked against pandas ewm on the
    client's own minute closes."""
    got = api.get_MACD("600000.SS", start_date="2022-03-01",
                       end_date="2022-03-04", frequency="30m")
    closes = api.get_price("600000.SS", end_date="2022-03-04", count=10**6,
                           frequency="30m", fq="post")["close"]
    import pandas as pd

    dif = (closes.ewm(span=12, adjust=False).mean()
           - closes.ewm(span=26, adjust=False).mean())
    dea = dif.ewm(span=9, adjust=False).mean()
    expect = pd.DataFrame({"dif": dif, "dea": dea, "macd": 2 * (dif - dea)})
    expect = expect[(expect.index >= "2022-03-01") & (expect.index < "2022-03-05")]
    assert len(got) == len(expect) > 0
    for c in ("dif", "dea", "macd"):
        assert abs(got[c].to_numpy() - expect[c].to_numpy()).max() < 1e-9
