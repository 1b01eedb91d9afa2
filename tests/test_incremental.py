"""N1/N2/J4 incremental-merge semantics + streaming window agg."""

import os

import pandas as pd
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


def test_streaming_minute_bars_match_batch(spark, tmp_path):
    """The N3 minute-bar aggregator: stream result == batch result on every
    window closed by the final watermark."""
    import datetime

    import numpy as np

    from simtradedata_spark.streaming.incremental import (
        minute_bar_agg,
        streaming_minute_bars,
    )

    rng = np.random.RandomState(7)
    base = datetime.datetime(2024, 1, 2, 9, 30)
    rows = [
        (
            sym,
            base + datetime.timedelta(seconds=int(i * 2.7 + k)),
            float(100 + rng.randn()),
            float(rng.randint(1, 10) * 100),
        )
        for k, sym in enumerate(["600000.SS", "000001.SZ"])
        for i in range(400)
    ]
    ticks = spark.createDataFrame(
        rows, "symbol string, ts timestamp, price double, qty double"
    )
    src = str(tmp_path / "ticks")
    # the real ticks span ~18 min; a 30-min watermark means no arrival order
    # of these files can make any of them late. The flush file (written
    # later, so a later mod-time ⇒ a later micro-batch) advances the
    # watermark far past the real data and closes every real window.
    ticks.coalesce(3).write.mode("overwrite").parquet(src)
    import time

    time.sleep(1.1)  # distinct mtime so the source orders it after the data
    flush = spark.createDataFrame(
        [("FLUSH", base + datetime.timedelta(hours=10), 1.0, 1.0)],
        ticks.schema,
    )
    flush.coalesce(1).write.mode("append").parquet(src)

    q = streaming_minute_bars(
        spark, src, ticks.schema, watermark="30 minutes", query_name="t_bars"
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM t_bars WHERE symbol != 'FLUSH'").toPandas()
    finally:
        q.stop()

    # every real window is closed by the flush ⇒ stream ≡ batch exactly
    batch = minute_bar_agg(ticks).toPandas()
    key = ["symbol", "minute_start"]
    got = got.sort_values(key).reset_index(drop=True)
    batch = batch.sort_values(key).reset_index(drop=True)
    assert len(batch) > 10
    pd.testing.assert_frame_equal(
        got[batch.columns], batch, check_exact=False, rtol=1e-12
    )


def test_streaming_upsert_foreachbatch_last_writer_wins(spark, tmp_path):
    """N1 streaming form: each micro-batch merges into the snapshot store;
    the final _CURRENT snapshot equals applying the batches sequentially
    with updates-win semantics."""
    import time

    from simtradedata_spark.streaming.incremental import (
        read_current,
        streaming_upsert,
    )

    src = str(tmp_path / "upsert_src")
    tgt = str(tmp_path / "upsert_tgt")
    os.makedirs(src)
    schema = "symbol string, d int, v double"
    b1 = spark.createDataFrame(
        [("a", 1, 10.0), ("b", 1, 20.0), ("b", 1, 21.0)], schema
    )
    b2 = spark.createDataFrame([("a", 1, 99.0), ("c", 1, 30.0)], schema)
    # one file per batch; file-source order = modification time, pinned
    b1.coalesce(1).write.mode("overwrite").parquet(src + "/f1")
    b2.coalesce(1).write.mode("overwrite").parquet(src + "/f2")
    files = sorted(
        os.path.join(d, f)
        for d in (src + "/f1", src + "/f2")
        for f in os.listdir(d)
        if f.endswith(".parquet")
    )
    flat = []
    for i, f in enumerate(files):
        dst = os.path.join(src, f"batch{i}.parquet")
        os.rename(f, dst)
        t = time.time() - 100 + i * 10
        os.utime(dst, (t, t))
        flat.append(dst)
    assert len(flat) == 2

    q = streaming_upsert(
        spark,
        src,
        spark.createDataFrame([], schema).schema,
        tgt,
        keys=["symbol", "d"],
        order_by=[F.col("v")],
        query_name="t_upsert",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    final = read_current(spark, tgt)
    got = {(r["symbol"], r["d"]): r["v"] for r in final.collect()}
    # b1 inner dup (b,21 beats b,20 via order_by); b2 overwrites a, adds c
    assert got == {("a", 1): 99.0, ("b", 1): 21.0, ("c", 1): 30.0}


def test_streaming_session_windows_match_batch(spark, tmp_path):
    """Native session_window: the stream (append mode, watermark-closed
    sessions) must equal the batch run of the SAME session_agg function
    restricted to sessions that closed before the final watermark."""
    import datetime

    from simtradedata_spark.catalog import load_table
    from simtradedata_spark.streaming.incremental import (
        session_agg,
        streaming_session_counts,
    )

    src = str(tmp_path / "sess_src")
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    events.coalesce(2).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    q = streaming_session_counts(spark, src, schema, query_name="t_sessions")
    try:
        q.processAllAvailable()
        got = {
            (r["user_id"], r["session_start"], r["n_events"])
            for r in spark.sql("SELECT * FROM t_sessions").collect()
        }
    finally:
        q.stop()

    maxts = events.agg(F.max("ts")).first()[0]
    cutoff = maxts - datetime.timedelta(hours=2)
    closed = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in session_agg(events).filter(F.col("session_end") <= cutoff).collect()
    }
    assert closed, "watermark cut everything — fixture too small"
    assert got == closed


def test_streaming_rollup_matches_batch(spark, tmp_path):
    """Stream-folded hypertable state == one-shot batch rollup, and the
    replay guard makes re-folding a committed batch a no-op."""
    from simtradedata_spark.catalog import load_table
    from simtradedata_spark.operators.hypertable import rollup_read, time_rollup
    from simtradedata_spark.streaming.incremental import (
        read_current,
        rollup_batch,
        streaming_rollup,
    )

    src = str(tmp_path / "roll_src")
    target = str(tmp_path / "roll_state")
    events = load_table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "vc", F.round(F.col("value") * 100).cast("long")
    )
    events.select("ts", "event_type", "vc").coalesce(3).write.mode(
        "overwrite"
    ).parquet(src)

    schema = spark.read.parquet(src).schema
    q = streaming_rollup(
        spark, src, schema, target, ["event_type"], "ts", "vc", "hour"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["event_type"], str(r["bucket"])): (r["total"], r["n"], r["low"], r["high"])
        for r in rollup_read(read_current(spark, target)).collect()
    }
    want = {
        (r["event_type"], str(r["bucket"])): (r["total"], r["n"], r["low"], r["high"])
        for r in rollup_read(
            time_rollup(
                spark.read.parquet(src), ["event_type"], "ts", "vc", "hour"
            )
        ).collect()
    }
    assert got == want and len(got) > 10

    # replaying an already-committed batch must not double-count
    before = got
    rollup_batch(
        spark.read.parquet(src), 0, target, ["event_type"], "ts", "vc", "hour"
    )
    after = {
        (r["event_type"], str(r["bucket"])): (r["total"], r["n"], r["low"], r["high"])
        for r in rollup_read(read_current(spark, target)).collect()
    }
    assert after == before


def test_snapshot_time_travel(spark, tmp_path):
    """read_version resolves the greatest committed version <= batch_id;
    earlier snapshots stay readable after later commits (time travel)."""
    from simtradedata_spark.streaming.incremental import (
        list_versions,
        read_version,
        upsert_batch,
    )

    target = str(tmp_path / "tt_store")
    b0 = spark.createDataFrame([("a", 1, 10.0)], "symbol string, d int, v double")
    b1 = spark.createDataFrame(
        [("a", 1, 11.0), ("b", 1, 20.0)], "symbol string, d int, v double"
    )
    upsert_batch(b0, 0, target, ["symbol", "d"])
    upsert_batch(b1, 3, target, ["symbol", "d"])
    assert list_versions(target) == [0, 3]

    v0 = {(r["symbol"], r["v"]) for r in read_version(spark, target, 0).collect()}
    assert v0 == {("a", 10.0)}
    # ids 1/2 were never committed: resolve to the state as of batch 0
    v2 = {(r["symbol"], r["v"]) for r in read_version(spark, target, 2).collect()}
    assert v2 == v0
    v3 = {(r["symbol"], r["v"]) for r in read_version(spark, target, 3).collect()}
    assert v3 == {("a", 11.0), ("b", 20.0)}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        read_version(spark, target, -1)
