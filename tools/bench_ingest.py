"""ETL + point-query throughput vs the reference's published numbers.

Builds a reference-sized warehouse (5,000 symbols × 2 years ≈ the
"4,815 stocks × 8 y ≈ 1.5 GB" dataset scaled to the same order of rows),
then times PTrade point queries against it. Prints one JSON line.

Reference baselines (BASELINE.md):
  - full ETL: ~8–10 h for 5,000 stocks (network-bound BaoStock, sequential)
  - v1.0 sync throughput: 15,000 rows/min
  - v1.0 avg query latency: 30 ms (SQLite + LRU cache, point lookups)

Usage: python tools/bench_ingest.py [n_symbols] [out_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simtradedata_spark.api.ptrade import PTradeDataAPI
from simtradedata_spark.session import get_spark
from simtradedata_spark.sources.synthetic import SyntheticMarket
from simtradedata_spark.sources.tables import Warehouse, build_warehouse


def main() -> None:
    n_symbols = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    out_dir = sys.argv[2] if len(sys.argv) > 2 else None
    root = out_dir or tempfile.mkdtemp(prefix="bench_wh_")
    spark = get_spark("bench-ingest")
    market = SyntheticMarket(spark, n_symbols=n_symbols)

    t0 = time.time()
    wh: Warehouse = build_warehouse(spark, root, market)
    build_s = time.time() - t0

    n_rows = {t: wh.read(t).count() for t in wh.tables()}
    total_rows = sum(n_rows.values())

    def point_latencies(api: PTradeDataAPI) -> list[float]:
        days = api.get_trade_days("2023-06-01", "2023-08-31")
        lat = []
        for d in days[:20]:
            t1 = time.time()
            api.get_history(20, field="close", security_list=["600000.SS"],
                            current_date=d)
            lat.append(time.time() - t1)
        return sorted(lat)

    cold = point_latencies(PTradeDataAPI(wh))
    hot_api = PTradeDataAPI(wh, cache_tables=True)
    point_latencies(hot_api)  # first pass materializes the cache
    hot = point_latencies(hot_api)

    # the batch path the engine is built around: one vectorized window query
    # computing every (symbol, day) MA state at once — this, not the 300 ms
    # scheduler-bound single point query, is the per-day unit cost a backtest
    # actually pays (tests/test_backtest_loop.py proves loop ≡ batch)
    from pyspark.sql import functions as F

    from simtradedata_spark.operators.windows import moving_avg

    bars = wh.read("bars")
    t2 = time.time()
    ma = moving_avg(
        moving_avg(bars, "close", 5, ["symbol"], ["trade_date"], "ma_s"),
        "close", 20, ["symbol"], ["trade_date"], "ma_l",
    )
    n_signal_rows = ma.filter(F.col("ma_s") > F.col("ma_l")).count()
    batch_s = time.time() - t2

    ms = lambda xs: round(sum(xs) / len(xs) * 1000, 1)
    print(
        json.dumps(
            {
                "metric": "ingest_and_point_query",
                "n_symbols": n_symbols,
                "build_sec": round(build_s, 2),
                "total_rows": total_rows,
                "rows_per_min": int(total_rows / build_s * 60),
                "query_avg_ms": ms(cold),
                "query_p50_ms": round(cold[len(cold) // 2] * 1000, 1),
                "query_cached_avg_ms": ms(hot),
                "query_cached_p50_ms": round(hot[len(hot) // 2] * 1000, 1),
                "batch_signal_sec": round(batch_s, 2),
                "batch_us_per_symbol_day": round(
                    batch_s / n_rows["bars"] * 1e6, 2
                ),
                "n_signal_rows": n_signal_rows,
                "rows": n_rows,
            }
        )
    )
    if out_dir is None:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
