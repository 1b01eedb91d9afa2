"""N1/N2/J4 incremental-merge semantics + streaming window agg."""

import os

from pyspark.sql import functions as F

from simtradedata_spark.streaming.incremental import (
    incremental_merge,
    incremental_refresh,
    streaming_window_counts,
)


def test_updates_win(spark):
    existing = spark.createDataFrame(
        [("a", 1, 10.0), ("b", 1, 20.0)], "symbol string, d int, v double"
    )
    updates = spark.createDataFrame(
        [("a", 1, 11.0), ("c", 1, 30.0)], "symbol string, d int, v double"
    )
    got = {
        (r["symbol"], r["d"]): r["v"]
        for r in incremental_merge(existing, updates, ["symbol", "d"]).collect()
    }
    assert got == {("a", 1): 11.0, ("b", 1): 20.0, ("c", 1): 30.0}


def test_refresh_only_existing_symbols(spark):
    existing = spark.createDataFrame(
        [("a", 1, 10.0)], "symbol string, d int, v double"
    )
    window = spark.createDataFrame(
        [("a", 2, 12.0), ("zz", 2, 99.0)], "symbol string, d int, v double"
    )
    got = incremental_refresh(existing, window, ["symbol", "d"]).collect()
    syms = {r["symbol"] for r in got}
    assert syms == {"a"}  # 'zz' is not an existing symbol (N2 resume rule)
    assert len(got) == 2


def test_streaming_window_counts_match_batch(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    from simtradedata_spark.catalog import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    events.coalesce(2).write.mode("overwrite").parquet(src)

    schema = spark.read.parquet(src).schema
    q = streaming_window_counts(spark, src, schema, query_name="t_stream")
    try:
        q.processAllAvailable()
        got = spark.sql(
            "SELECT sum(n_events) AS n FROM t_stream"
        ).first()["n"]
    finally:
        q.stop()
    # append mode emits only windows older than the final watermark (2h);
    # compare against the batch count over the same closed windows.
    batch = (
        events.groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    maxts = events.agg(F.max("ts")).first()[0]
    import datetime

    cutoff = maxts - datetime.timedelta(hours=2)
    closed = batch.filter(F.col("window.end") <= cutoff).agg(F.sum("n")).first()[0]
    assert got == closed


def test_streaming_dedup_drops_redeliveries(spark, tmp_path):
    from simtradedata_spark.streaming.incremental import streaming_dedup

    src = str(tmp_path / "dup_src")
    from simtradedata_spark.catalog import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events").limit(200)
    # simulate at-least-once redelivery: the same rows written twice
    events.coalesce(1).write.mode("overwrite").parquet(src)
    events.coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    q = streaming_dedup(spark, src, schema, ["event_id"], query_name="t_dedup")
    try:
        q.processAllAvailable()
        out = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM t_dedup").first()
    finally:
        q.stop()
    assert out["n"] == out["d"] == 200
