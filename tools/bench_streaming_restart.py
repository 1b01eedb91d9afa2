"""Sustained-rate streaming ingest WITH a crash/restart across it — the
r6 verdict item 7 artifact: the tick→minute-bar path at 10× the rate the
round-3 recording used, exactly-once across a restart, and state-store
size bounded (no growth) after the restart.

Phase A runs the rate-micro-batch tick source through ``minute_bar_agg``
(watermarked tumbling window) into a parquet sink with a checkpoint for
``run_s`` seconds, then stops — the "crash". Phase B restarts the SAME
checkpoint for another ``run_s`` seconds. The JSON line records:

  - sustained rows/s in each phase (trigger-execution time, not wall),
  - batch-id continuity (first post-restart batch > last pre-restart
    batch — committed offsets were not replayed),
  - state rows at the end of each phase: the watermark must keep state
    bounded, so post-restart state must stay within the same
    symbols × in-flight-windows envelope, not accumulate.

append mode + parquet sink: only watermark-closed windows are emitted, so
the output is also exactly-once (each closed window appears once across
both phases — verified by a duplicate-key count).

Usage: python tools/bench_streaming_restart.py [rows_per_batch] [run_s]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from simtradedata_spark.session import get_spark
from simtradedata_spark.streaming.incremental import minute_bar_agg

N_SYMBOLS = 5000


def _ticks(spark, rate: int, start_ms: int):
    return (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rate)
        .option("startTimestamp", str(start_ms))
        # event time advances 10 s per batch so the 2-minute watermark
        # actually CLOSES windows inside a 30 s phase — otherwise the
        # append sink stays empty and the duplicate check is vacuous
        .option("advanceMillisPerBatch", "10000")
        .load()
        .select(
            F.concat(
                F.lpad((F.col("value") % N_SYMBOLS).cast("string"), 6, "0"),
                F.lit(".SS"),
            ).alias("symbol"),
            F.col("timestamp").alias("ts"),
            (F.pmod(F.xxhash64("value"), F.lit(10000)) / 100.0 + 1.0).alias(
                "price"
            ),
            (F.pmod(F.xxhash64("value", F.lit(1)), F.lit(100)) + 1).alias("qty"),
        )
    )


def _run_phase(spark, rate, start_ms, out, ckpt, run_s):
    bars = minute_bar_agg(_ticks(spark, rate, start_ms))
    q = (
        bars.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    time.sleep(run_s)
    progress = list(q.recentProgress)
    last = q.lastProgress
    q.stop()
    q.awaitTermination(30)
    rows = sum(p["numInputRows"] for p in progress)
    secs = sum(
        p["durationMs"]["triggerExecution"] / 1000.0
        for p in progress
        if p.get("durationMs", {}).get("triggerExecution") is not None
    )
    batch_ids = [p["batchId"] for p in progress if p["numInputRows"] > 0]
    state_rows = None
    if last and last.get("stateOperators"):
        state_rows = last["stateOperators"][0]["numRowsTotal"]
    return {
        "rows": rows,
        "rows_per_sec": round(rows / max(secs, 1e-9)),
        "batches": batch_ids,
        "state_rows": state_rows,
    }


def main() -> None:
    rate = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    run_s = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    spark = get_spark("bench-streaming-restart")
    root = tempfile.mkdtemp(prefix="stream_restart_")
    out, ckpt = os.path.join(root, "bars"), os.path.join(root, "ckpt")
    start_ms = 1704188400000

    a = _run_phase(spark, rate, start_ms, out, ckpt, run_s)
    # crash happened; the SAME checkpoint resumes from committed offsets
    b = _run_phase(spark, rate, start_ms, out, ckpt, run_s)

    got = spark.read.parquet(out)
    dup_windows = (
        got.groupBy("symbol", "minute_start")
        .count()
        .filter("count > 1")
        .count()
    )
    print(
        json.dumps(
            {
                "metric": "streaming_restart",
                "unit": "rows/s",
                "rows_per_batch": rate,
                "phase_a_rows_per_sec": a["rows_per_sec"],
                "phase_b_rows_per_sec": b["rows_per_sec"],
                "value": min(a["rows_per_sec"], b["rows_per_sec"]),
                "batch_continuity_ok": bool(
                    a["batches"] and b["batches"]
                    and min(b["batches"]) > max(a["batches"])
                ),
                "state_rows_phase_a": a["state_rows"],
                "state_rows_phase_b": b["state_rows"],
                "duplicate_closed_windows": dup_windows,
                "output_rows": got.count(),
            }
        )
    )


if __name__ == "__main__":
    main()
