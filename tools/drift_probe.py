"""Intra-session drift probe — the r9 verdict item-1 instrument.

At the 1000x point (sf100 replica) back-to-back repeats of the heavy twins
degraded up to 2x within one session (bloom_decontam@xxh64 run-1 125 s →
run-2 252 s) even with scratch release + GC, making the recorded medians
session-accumulation artifacts. Suspects were named but unconfirmed:
broadcast block accumulation (the r9 bloom shape held k ~0.7 GB
HashedRelations per probe) vs old-gen fragmentation.

This tool runs named queries/twins N times back-to-back in ONE session and
records, AFTER each run (post scratch-release + System.gc, i.e. the state
the NEXT run inherits):

  - wall seconds
  - JVM heap used (Runtime total-free) and per-pool usage (old gen,
    humongous-feeding G1 regions) via ManagementFactory
  - Spark local-dir disk bytes (blockmgr + spill dirs)
  - persistent-RDD count (scratch-release effectiveness)
  - memoryStore/diskStore bytes via BlockManager (package-private in
    Scala, public in bytecode — py4j reaches it; best-effort)

Usage: python tools/drift_probe.py SF_DIR NAME [NAME ...] [--runs N]

Prints one JSON line per (name, run) plus a summary line. Compare run-1
vs run-N pool/disk numbers to attribute drift: heap-resident growth →
block/broadcast accumulation; flat heap + growing wall → JIT/GC or host.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simtradedata_spark.functions.caching import release_scratch
from simtradedata_spark.queries import QUERIES
from simtradedata_spark.session import get_spark
from tools.prod_variants import prod_variants


def jvm_stats(spark) -> dict:
    jvm = spark.sparkContext._jvm
    rt = jvm.java.lang.Runtime.getRuntime()
    stats = {
        "heap_used_mb": round(
            (rt.totalMemory() - rt.freeMemory()) / (1 << 20), 1
        ),
        "heap_total_mb": round(rt.totalMemory() / (1 << 20), 1),
    }
    try:
        beans = jvm.java.lang.management.ManagementFactory.getMemoryPoolMXBeans()
        for i in range(beans.size()):
            b = beans.get(i)
            name = b.getName()
            if "Old" in name or "Eden" in name or "Survivor" in name:
                u = b.getUsage()
                stats[
                    name.lower().replace(" ", "_") + "_used_mb"
                ] = round(u.getUsed() / (1 << 20), 1)
    except Exception as e:  # instrumentation must never kill the run
        stats["pools_error"] = str(e)
    try:
        bm = jvm.org.apache.spark.SparkEnv.get().blockManager()
        stats["memory_store_mb"] = round(
            bm.memoryStore().blocksMemoryUsed() / (1 << 20), 1
        )
    except Exception as e:
        stats["memory_store_error"] = str(e)
    return stats


def local_dir_bytes(spark) -> int:
    """Bytes under the Spark local dirs (blockmgr + spills)."""
    total = 0
    try:
        jvm = spark.sparkContext._jvm
        dbm = (
            jvm.org.apache.spark.SparkEnv.get()
            .blockManager()
            .diskBlockManager()
        )
        dirs = [str(d.getAbsolutePath()) for d in dbm.localDirs()]
    except Exception:
        import glob

        dirs = glob.glob("/tmp/blockmgr-*")
    for d in dirs:
        for root, _dirs, files in os.walk(d):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark("drift_probe", input_dir=args.sf_dir)
    variants = prod_variants(spark, args.sf_dir)
    records = []
    for name in args.names:
        if name in QUERIES:
            thunk = lambda: QUERIES[name][0](spark, args.sf_dir)  # noqa: E731
        elif name in variants:
            thunk = variants[name]
        else:
            sys.exit(f"unknown query {name}")
        for run in range(1, args.runs + 1):
            t0 = time.time()
            err = None
            try:
                thunk().write.format("noop").mode("overwrite").save()
            except Exception as e:
                err = str(e)[:300]
            wall = round(time.time() - t0, 3)
            freed = release_scratch(spark)
            spark.sparkContext._jvm.System.gc()
            time.sleep(1)  # let the ContextCleaner drain
            rec = {
                "name": name,
                "run": run,
                "wall_s": wall,
                "freed_rdds": freed,
                "local_dir_mb": round(local_dir_bytes(spark) / (1 << 20), 1),
                **jvm_stats(spark),
            }
            if err:
                rec["error"] = err
            records.append(rec)
            print(json.dumps(rec), flush=True)
    by_name: dict[str, list] = {}
    for r in records:
        by_name.setdefault(r["name"], []).append(r["wall_s"])
    print(
        json.dumps(
            {
                "metric": "drift_probe",
                "sf_dir": args.sf_dir,
                "runs": args.runs,
                "heap": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
                "walls": by_name,
                "spread_ratio": {
                    n: round(max(w) / min(w), 3) if min(w) > 0 else None
                    for n, w in by_name.items()
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
