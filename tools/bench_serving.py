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
"""

from __future__ import annotations

import json
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


def main() -> None:
    n_threads = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    per_thread = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    spark = get_spark("bench-serving")
    root = tempfile.mkdtemp(prefix="serving_wh_")
    wh = build_warehouse(spark, root, SyntheticMarket(spark))
    api = PTradeDataAPI(wh, point_cache=True)

    days = api.get_trade_days("2022-02-01", "2022-11-30")
    symbols = [f"{600000 + i}.SS" for i in range(0, 10, 2)]

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
