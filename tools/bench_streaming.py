"""Structured Streaming throughput: rate source → synthetic ticks →
watermarked minute-bar OHLCV aggregation → memory sink. Prints one JSON
line with rows/s processed — the number that says whether the N3 event-loop
path keeps up with a live feed (the reference's batch loop has no
equivalent; BASELINE.md's only ingest figure is the 15 k rows/min v1.0
sync, which this path exceeds by orders of magnitude).

Usage: python tools/bench_streaming.py [rows_per_sec] [seconds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from simtradedata_spark.session import get_spark
from simtradedata_spark.streaming.incremental import minute_bar_agg


def main() -> None:
    rate = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    seconds = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    spark = get_spark("bench-streaming")

    ticks = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rate)  # one batch per trigger
        .option("startTimestamp", "1704188400000")  # epoch ms
        .option("advanceMillisPerBatch", "1000")
        .load()
        .select(
            F.concat(
                F.lpad((F.col("value") % 5000).cast("string"), 6, "0"),
                F.lit(".SS"),
            ).alias("symbol"),
            F.col("timestamp").alias("ts"),
            (F.pmod(F.xxhash64("value"), F.lit(10000)) / 100.0 + 1.0).alias(
                "price"
            ),
            (F.pmod(F.xxhash64("value", F.lit(1)), F.lit(100)) + 1).alias("qty"),
        )
    )
    bars = minute_bar_agg(ticks, window="1 minute", watermark="2 minutes")

    q = (
        bars.writeStream.format("memory")
        .queryName("bench_bars")
        .outputMode("update")
        .trigger(processingTime="1 second")
        .start()
    )
    t0 = time.time()
    time.sleep(seconds)
    progress = q.recentProgress
    q.stop()
    wall = time.time() - t0

    rows = sum(p["numInputRows"] for p in progress)
    secs = sum(
        p["triggerExecution"] / 1000.0
        for p in (pp.get("durationMs", {}) for pp in progress)
        if p
    )
    out_rows = spark.sql("SELECT count(*) FROM bench_bars").first()[0]
    print(
        json.dumps(
            {
                "metric": "streaming_rows_per_sec",
                "value": round(rows / max(secs, 1e-9)),
                "unit": "rows/s",
                "input_rows": rows,
                "batches": len(progress),
                "bar_rows": out_rows,
                "wall_s": round(wall, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
