"""Serving-latency benchmark: p50/p99 per point query through the PTrade
client edge (``point_cache=True``) under N concurrent client threads —
the per-round artifact behind the "4 ms p50 vs the reference v1.0's 30 ms
SQLite lookups" claim (r6 verdict item 6: track it like the bench, don't
re-assert it).

Builds the synthetic warehouse once (the serving fixture every PTrade test
uses), warms the per-symbol cache through the normal Spark path, then runs
N client threads × M ``get_price(symbol, end_date, count)`` point queries
each and reports the latency distribution plus aggregate QPS. The COLD
path (one uncached query through Spark) is measured too so the artifact
records both sides of the designed trade.

Usage: python tools/bench_serving.py [n_threads] [queries_per_thread]
       python tools/bench_serving.py --procs N [queries_per_proc]

``--procs`` measures the DEPLOYMENT shape the thread numbers document
around: the in-process point cache is GIL-bound pandas slicing, so one
process saturates one core — concurrent serving at scale is N client
PROCESSES, each owning its own cache against the shared parquet store.
Each worker is a spawned process with its own small SparkSession (the
cluster-client analog), warms its cache through the normal Spark path,
then times its query loop; the artifact records per-process p50 (should
sit near the ~2 ms single-thread number — no GIL contention across
processes) and aggregate QPS (should scale ~linearly in processes, vs
the v1.0 reference's 1,500 QPS SQLite ceiling in BASELINE.md).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import statistics
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simtradedata_spark.api.ptrade import PTradeDataAPI
from simtradedata_spark.session import get_spark
from simtradedata_spark.sources.synthetic import SyntheticMarket
from simtradedata_spark.sources.tables import build_warehouse

SYMBOLS = [f"{600000 + i}.SS" for i in range(0, 10, 2)]


def _proc_worker(args: tuple) -> dict:
    """One serving process: own JVM (small — a client, not the warehouse
    builder), own point cache, timed query loop. Runs under spawn, so
    everything it needs arrives via ``args``."""
    root, per_proc, proc_id = args
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "4g")
    from simtradedata_spark.api.ptrade import PTradeDataAPI as API
    from simtradedata_spark.session import get_spark as gs
    from simtradedata_spark.sources.tables import Warehouse

    spark = gs(f"serving-proc-{proc_id}", cpus=4)
    api = API(Warehouse(spark, root), point_cache=True)
    days = api.get_trade_days("2022-02-01", "2022-11-30")
    for s in SYMBOLS:  # warm the per-symbol cache through the Spark path
        api.get_price(s, end_date=days[60], count=5)
    lat = []
    t0 = time.time()
    for i in range(per_proc):
        sym = SYMBOLS[(proc_id + i) % len(SYMBOLS)]
        day = days[(proc_id * 37 + i * 7) % len(days)]
        q0 = time.perf_counter()
        api.get_price(sym, end_date=day, count=5)
        lat.append(time.perf_counter() - q0)
    wall = time.time() - t0
    lat.sort()
    q = lambda p: lat[min(len(lat) - 1, int(p * len(lat)))]  # noqa: E731
    return {
        "proc": proc_id,
        "p50_ms": round(q(0.50) * 1000, 2),
        "p99_ms": round(q(0.99) * 1000, 2),
        "qps": round(len(lat) / wall, 1),
        "wall_s": round(wall, 2),
        "n": len(lat),
    }


def main_procs(n_procs: int, per_proc: int) -> None:
    spark = get_spark("bench-serving-build")
    root = tempfile.mkdtemp(prefix="serving_wh_")
    build_warehouse(spark, root, SyntheticMarket(spark))
    # free the builder's cores before the clients start: the workers are
    # the measurement, the builder JVM would just steal cycles
    spark.stop()
    ctx = mp.get_context("spawn")
    t0 = time.time()
    with ctx.Pool(n_procs) as pool:
        results = pool.map(
            _proc_worker, [(root, per_proc, i) for i in range(n_procs)]
        )
    wall = time.time() - t0  # includes per-proc JVM boot + cache warm
    serve_wall = max(r["wall_s"] for r in results)  # timed loops overlap
    total = sum(r["n"] for r in results)
    print(
        json.dumps(
            {
                "metric": "serving_point_query_latency_procs",
                "unit": "ms",
                "n_procs": n_procs,
                "n_queries": total,
                "per_proc_p50_ms": [r["p50_ms"] for r in results],
                "per_proc_p99_ms": [r["p99_ms"] for r in results],
                "per_proc_qps": [r["qps"] for r in results],
                "aggregate_qps": round(total / serve_wall, 1),
                "serve_wall_s": round(serve_wall, 2),
                "total_wall_s": round(wall, 1),
            }
        )
    )


USAGE = (
    "usage: bench_serving.py [n_threads] [queries_per_thread]\n"
    "       bench_serving.py --procs N [queries_per_proc]"
)


def _pos_int(s: str, what: str) -> int:
    try:
        v = int(s)
    except ValueError:
        sys.exit(f"{what} must be an integer, got {s!r}\n{USAGE}")
    if v < 1:
        sys.exit(f"{what} must be >= 1, got {v}\n{USAGE}")
    return v


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--procs":
        if len(sys.argv) < 3:
            sys.exit(f"--procs requires a process count\n{USAGE}")
        main_procs(
            _pos_int(sys.argv[2], "n_procs"),
            _pos_int(sys.argv[3], "queries_per_proc")
            if len(sys.argv) > 3
            else 2000,
        )
        return
    n_threads = _pos_int(sys.argv[1], "n_threads") if len(sys.argv) > 1 else 8
    per_thread = (
        _pos_int(sys.argv[2], "queries_per_thread") if len(sys.argv) > 2 else 200
    )
    spark = get_spark("bench-serving")
    root = tempfile.mkdtemp(prefix="serving_wh_")
    wh = build_warehouse(spark, root, SyntheticMarket(spark))
    api = PTradeDataAPI(wh, point_cache=True)

    days = api.get_trade_days("2022-02-01", "2022-11-30")
    symbols = SYMBOLS

    # cold: first query per symbol goes through Spark (fq path included)
    cold = []
    for s in symbols:
        t0 = time.perf_counter()
        api.get_price(s, end_date=days[60], count=5)
        cold.append(time.perf_counter() - t0)

    def client(tid: int) -> list[float]:
        lat = []
        for i in range(per_thread):
            sym = symbols[(tid + i) % len(symbols)]
            day = days[(tid * 37 + i * 7) % len(days)]
            t0 = time.perf_counter()
            api.get_price(sym, end_date=day, count=5)
            lat.append(time.perf_counter() - t0)
        return lat

    t0 = time.time()
    with ThreadPoolExecutor(max_workers=n_threads) as pool:
        lats = [v for chunk in pool.map(client, range(n_threads)) for v in chunk]
    wall = time.time() - t0

    lats.sort()
    q = lambda p: lats[min(len(lats) - 1, int(p * len(lats)))]
    print(
        json.dumps(
            {
                "metric": "serving_point_query_latency",
                "unit": "ms",
                "n_threads": n_threads,
                "n_queries": len(lats),
                "p50_ms": round(q(0.50) * 1000, 2),
                "p99_ms": round(q(0.99) * 1000, 2),
                "qps": round(len(lats) / wall, 1),
                "cold_p50_ms": round(
                    statistics.median(cold) * 1000, 1
                ),
                "wall_s": round(wall, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
