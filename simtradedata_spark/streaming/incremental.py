"""Incremental / streaming ingest — operators N1-N4 (SURVEY §2.10).

The reference's incremental semantics (``download_efficient.py:204-230,
277-285,464-474``): re-pull the last N days for EXISTING symbols, then
upsert-merge with last-writer-wins (J4, ``:330-331,356-358``); resume skips
symbols already present (N2, ``h5_writer.py:466-509``).

Without a Delta/Iceberg jar in this image, MERGE is emulated with the
standard anti-join + union + window-dedup plan — identical semantics, one
shuffle on the merge key. ``streaming_window_counts`` shows the same
tumbling-window aggregation the batch query ``hourly_event_stats`` runs,
executed as a Structured Streaming query with a watermark (late rows beyond
the watermark are dropped, N4); ``streaming_dedup`` suppresses at-least-once
redeliveries with watermark-bounded state (``dropDuplicatesWithinWatermark``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from simtradedata_spark.operators.dedup import keep_last


def incremental_merge(
    existing: DataFrame,
    updates: DataFrame,
    keys: list[str],
    order_by: list[Column] | None = None,
) -> DataFrame:
    """Upsert: rows from ``updates`` win over ``existing`` on key collision
    (J4 last-writer-wins). ``order_by`` breaks ties WITHIN updates; across
    the two sides a source tag guarantees updates-win regardless of values —
    the deterministic tie-break the reference got implicitly from sequential
    execution (SURVEY §7 watch-list item 7)."""
    tagged = existing.withColumn("__src", F.lit(0)).unionByName(
        updates.withColumn("__src", F.lit(1))
    )
    order = [F.col("__src")] + (order_by or [])
    return keep_last(tagged, keys, order).drop("__src")


def incremental_refresh(
    existing: DataFrame,
    fetch_window: DataFrame,
    keys: list[str],
    symbol_col: str = "symbol",
) -> DataFrame:
    """N1+N2: restrict the refetched window to symbols already present
    (left_semi against existing — the reference's ``existing_stocks`` check),
    then merge."""
    known = existing.select(symbol_col).distinct()
    updates = fetch_window.join(known, symbol_col, "left_semi")
    return incremental_merge(existing, updates, keys)


def streaming_window_counts(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    query_name: str = "stream_counts",
):
    """Tumbling-window event counts over a file stream (N3 cadence model):
    readStream → watermark → window agg → memory sink. Returns the started
    query; callers use ``processAllAvailable()`` + ``spark.sql`` to read the
    result synchronously in tests."""
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(source_dir)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def minute_bar_agg(ticks, window: str = "1 minute", watermark: str = "2 minutes"):
    """W4 over a tick stream (the minute/3-second modes the PTrade spec
    declares, ``PTrade_API_mini_Reference.md:521-694``, which the reference
    never implements): tumbling-window OHLCV synthesis with a watermark for
    late trades. open/close are event-time ``min_by``/``max_by`` — exact
    under any arrival order, unlike first/last. Works identically on a batch
    frame (tested: stream ≡ batch on closed windows)."""
    return (
        ticks.withWatermark("ts", watermark)
        .groupBy("symbol", F.window("ts", window).alias("w"))
        .agg(
            F.min_by("price", "ts").alias("open"),
            F.max("price").alias("high"),
            F.min("price").alias("low"),
            F.max_by("price", "ts").alias("close"),
            F.sum("qty").alias("volume"),
            F.sum(F.col("price") * F.col("qty")).alias("money"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        .select(
            "symbol", F.col("w.start").alias("minute_start"),
            "open", "high", "low", "close", "volume", "money", "n_ticks",
        )
    )


def streaming_minute_bars(
    spark: SparkSession,
    source_dir: str,
    schema,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    query_name: str = "stream_bars",
):
    """minute_bar_agg over a file tick stream → memory sink (same harness
    shape as streaming_window_counts)."""
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(source_dir)
    )
    bars = minute_bar_agg(stream, window, watermark)
    return (
        bars.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def streaming_dedup(
    spark: SparkSession,
    source_dir: str,
    schema,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
    query_name: str = "stream_dedup",
):
    """N4 duplicate-delivery suppression: at-least-once sources redeliver
    rows; keep the FIRST arrival per key. ``dropDuplicatesWithinWatermark``
    bounds the dedup state by the watermark (keys older than it are evicted),
    unlike plain ``dropDuplicates`` on a stream whose state grows forever —
    the only posture that survives an unbounded 100 TB/day feed."""
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(source_dir)
    )
    deduped = stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )
    return (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
