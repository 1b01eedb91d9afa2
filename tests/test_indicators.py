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
