"""applyInPandasWithState running VWAP vs batch computation."""

from pyspark.sql import functions as F

from simtradedata_spark.streaming.stateful import streaming_vwap


def test_streaming_vwap_matches_batch(spark, market, tmp_path):
    src = str(tmp_path / "bars_stream")
    bars = (
        market.bars()
        .filter(F.col("sym_idx").isin(0, 1))
        .select("symbol", "trade_date", "volume", "money")
    )
    # two files -> two micro-batches (state must carry across batches)
    bars.repartition(2).write.mode("overwrite").parquet(src)

    schema = spark.read.parquet(src).schema
    q = streaming_vwap(spark, src, schema, query_name="t_vwap")
    try:
        q.processAllAvailable()
        got = {
            r["symbol"]: r
            for r in spark.sql(
                """SELECT symbol, n_rows, cum_volume, vwap FROM (
                     SELECT *, row_number() OVER (
                       PARTITION BY symbol ORDER BY n_rows DESC) AS rn
                     FROM t_vwap) WHERE rn = 1"""
            ).collect()
        }
    finally:
        q.stop()

    expect = {
        r["symbol"]: r
        for r in bars.groupBy("symbol")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("volume").alias("v"),
            (F.sum("money") / F.sum("volume")).alias("vwap"),
        )
        .collect()
    }
    assert set(got) == set(expect)
    for sym, e in expect.items():
        g = got[sym]
        assert g["n_rows"] == e["n"]
        assert abs(g["cum_volume"] - e["v"]) < 1e-6
        assert abs(g["vwap"] - e["vwap"]) < 1e-9
