"""Technical indicators MACD/KDJ/RSI/CCI — operator W7 (SURVEY §2.7).

Declared in the PTrade spec (``docs/PTrade_API_mini_Reference.md:5031-5213``)
but never implemented by the reference. The EMA recurrences are inherently
sequential per symbol, so the idiomatic Spark shape is a grouped-map pandas
UDF (``applyInPandas``): each symbol's series is one Arrow batch, vectorized
inside pandas, parallel across symbols — the standard pattern for per-key
recursive time series. Window functions cover the rolling min/max/mean parts
only; the recursion itself cannot be a window function.

Formulas follow the standard Chinese-market conventions (ewm adjust=False):
  MACD: DIF = EMA12(close) − EMA26(close); DEA = EMA9(DIF); MACD = 2(DIF−DEA)
  KDJ(9,3,3): RSV = 100(C−LLV9)/(HHV9−LLV9); K = EMA(RSV, α=1/3);
              D = EMA(K, α=1/3); J = 3K − 2D
  RSI(n): 100 · EMA(gain, α=1/n) / (EMA(gain, α=1/n) + EMA(loss, α=1/n))
  CCI(n): (TP − SMA(TP,n)) / (0.015 · MD),  TP = (H+L+C)/3
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

OUT_SCHEMA = (
    "symbol string, trade_date date, close double, "
    "dif double, dea double, macd double, "
    "k double, d double, j double, rsi double, cci double"
)


def _compute_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("trade_date").reset_index(drop=True)
    close, high, low = pdf["close"], pdf["high"], pdf["low"]

    ema12 = close.ewm(span=12, adjust=False).mean()
    ema26 = close.ewm(span=26, adjust=False).mean()
    dif = ema12 - ema26
    dea = dif.ewm(span=9, adjust=False).mean()
    macd = 2 * (dif - dea)

    llv = low.rolling(9, min_periods=1).min()
    hhv = high.rolling(9, min_periods=1).max()
    rng = (hhv - llv).replace(0, np.nan)
    rsv = (100 * (close - llv) / rng).fillna(50.0).astype(float)
    k = rsv.ewm(alpha=1 / 3, adjust=False).mean()
    d = k.ewm(alpha=1 / 3, adjust=False).mean()
    j = 3 * k - 2 * d

    delta = close.diff()
    gain = delta.clip(lower=0).fillna(0.0)
    loss = (-delta).clip(lower=0).fillna(0.0)
    n = 6
    avg_gain = gain.ewm(alpha=1 / n, adjust=False).mean()
    avg_loss = loss.ewm(alpha=1 / n, adjust=False).mean()
    denom = (avg_gain + avg_loss).replace(0, np.nan)
    rsi = (100 * avg_gain / denom).fillna(50.0).astype(float)

    tp = (high + low + close) / 3
    sma_tp = tp.rolling(14, min_periods=1).mean()
    md = (tp - sma_tp).abs().rolling(14, min_periods=1).mean().replace(0, np.nan)
    cci = ((tp - sma_tp) / (0.015 * md)).astype(float)

    out = pd.DataFrame(
        {
            "symbol": pdf["symbol"],
            "trade_date": pdf["trade_date"],
            "close": close,
            "dif": dif,
            "dea": dea,
            "macd": macd,
            "k": k,
            "d": d,
            "j": j,
            "rsi": rsi,
            "cci": cci,
        }
    )
    return out


def compute_indicators(bars: DataFrame, ts_type: str = "date") -> DataFrame:
    """bars(symbol, trade_date, high, low, close, …) → per-bar indicator
    table. One Arrow batch per symbol; scales across symbols.
    ``ts_type="timestamp"`` serves intraday bars (minute-frequency
    trade_date values); the recursion is the same."""
    schema = OUT_SCHEMA.replace("trade_date date", f"trade_date {ts_type}")
    return (
        bars.select("symbol", "trade_date", "high", "low", "close")
        .groupBy("symbol")
        .applyInPandas(_compute_group, schema)
    )


def macd_series(
    df: DataFrame,
    value_col: str,
    partition_cols: list[str],
    order_col: str,
    spans: tuple[int, int, int] = (12, 26, 9),
) -> DataFrame:
    """MACD over any keyed series (not just bars): appends dif/dea/macd to
    the input columns. Same grouped-map shape as compute_indicators — the
    EMA recursion runs sequentially inside each key's Arrow batch, parallel
    across keys. SQL-checkable: the adjust=False recurrence has the closed
    form e_i = Σ_j w_ij·x_j with w = α(1−α)^(i−j) (j>1) and (1−α)^(i−1)
    for j=1, which a DuckDB self-join computes exactly (see
    queries.py::SQL_MACD_ORDERS)."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    s_fast, s_slow, s_sig = spans
    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("dif", DoubleType()),
            StructField("dea", DoubleType()),
            StructField("macd", DoubleType()),
        ]
    )

    def _grp(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        x = pdf[value_col]
        dif = (
            x.ewm(span=s_fast, adjust=False).mean()
            - x.ewm(span=s_slow, adjust=False).mean()
        )
        dea = dif.ewm(span=s_sig, adjust=False).mean()
        pdf["dif"], pdf["dea"], pdf["macd"] = dif, dea, 2 * (dif - dea)
        return pdf

    return df.groupBy(*partition_cols).applyInPandas(_grp, out_schema)


def kdj_series(
    df: DataFrame,
    value_col: str,
    partition_cols: list[str],
    order_col: str,
    n: int = 9,
) -> DataFrame:
    """KDJ(n,3,3) over a single-value keyed series (llv/hhv of the value
    itself): RSV = 100(x−LLVn)/(HHVn−LLVn) (50 when flat), K = EMA(RSV,
    α=1/3), D = EMA(K, α=1/3), J = 3K−2D. Same grouped-map shape as
    macd_series; SQL-checkable the same way (rolling extremes are plain
    window frames, both EMAs get the closed-form self-join —
    queries.py::SQL_KDJ_ORDERS)."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("k", DoubleType()),
            StructField("d", DoubleType()),
            StructField("j", DoubleType()),
        ]
    )

    def _grp(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        x = pdf[value_col]
        llv = x.rolling(n, min_periods=1).min()
        hhv = x.rolling(n, min_periods=1).max()
        rng = (hhv - llv).replace(0, np.nan)
        rsv = (100 * (x - llv) / rng).fillna(50.0).astype(float)
        k = rsv.ewm(alpha=1 / 3, adjust=False).mean()
        d = k.ewm(alpha=1 / 3, adjust=False).mean()
        pdf["k"], pdf["d"], pdf["j"] = k, d, 3 * k - 2 * d
        return pdf

    return df.groupBy(*partition_cols).applyInPandas(_grp, out_schema)


def rsi_series(
    df: DataFrame,
    value_col: str,
    partition_cols: list[str],
    order_col: str,
    n: int = 6,
) -> DataFrame:
    """RSI(n) over a keyed series (``get_RSI(close, 6)``,
    ``PTrade_API_mini_Reference.md:5135-5170``): gains/losses from the
    first difference, each Wilder-smoothed with EMA(α=1/n, adjust=False),
    RSI = 100·ag/(ag+al) (50 when the series is flat — ag=al=0). Same
    grouped-map shape and closed-form SQL checkability as macd_series
    (queries.py::SQL_RSI_ORDERS)."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    out_schema = StructType(
        list(df.schema.fields) + [StructField("rsi", DoubleType())]
    )

    def _grp(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        delta = pdf[value_col].diff()
        gain = delta.clip(lower=0).fillna(0.0)
        loss = (-delta).clip(lower=0).fillna(0.0)
        ag = gain.ewm(alpha=1 / n, adjust=False).mean()
        al = loss.ewm(alpha=1 / n, adjust=False).mean()
        denom = (ag + al).replace(0, np.nan)
        pdf["rsi"] = (100 * ag / denom).fillna(50.0).astype(float)
        return pdf

    return df.groupBy(*partition_cols).applyInPandas(_grp, out_schema)


def cci_series(
    df: DataFrame,
    value_col: str,
    partition_cols: list[str],
    order_col: str,
    n: int = 14,
) -> DataFrame:
    """CCI(n) over a keyed series (``get_CCI(close, 14)``,
    ``PTrade_API_mini_Reference.md:5174-5213``): CCI = (x − SMAₙ(x)) /
    (0.015 · MDₙ), MD = rolling mean of |x − SMA|. Unlike the EMA
    indicators this has NO recursion — it is pure bounded-frame window
    aggregates, so it stays entirely JVM-side (whole-stage codegen, no
    Python), one shuffle on the partition key. Null where MD = 0 (flat
    window)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(order_col)
        .rowsBetween(-(n - 1), 0)
    )
    x = F.col(value_col)
    with_sma = df.withColumn("_sma", F.avg(value_col).over(w)).withColumn(
        "_dev", F.abs(x - F.col("_sma"))
    )
    md = F.avg("_dev").over(w)
    return (
        with_sma.withColumn("_md", md)
        .withColumn(
            "cci",
            F.when(
                F.col("_md") != 0, (x - F.col("_sma")) / (0.015 * F.col("_md"))
            ),
        )
        .drop("_sma", "_dev", "_md")
    )
