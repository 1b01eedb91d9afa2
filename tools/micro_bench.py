"""Time individual registered queries (or @variants) with bench.py's exact
methodology — warm-up, noop sink, release_scratch + GC nudge between runs —
so single-query before/after numbers are comparable to the artifact medians.

Usage: python tools/micro_bench.py [--repeats N] <name> [name ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simtradedata_spark.functions.caching import release_scratch
from simtradedata_spark.queries import QUERIES
from simtradedata_spark.session import get_spark


def main() -> None:
    argv = sys.argv[1:]
    repeats = 3
    if "--repeats" in argv:
        i = argv.index("--repeats")
        repeats = int(argv[i + 1])
        del argv[i : i + 2]
    names = argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("micro_bench", input_dir=sf_dir)

    # same warm-up family as bench.py so JIT state matches
    warm_names = sorted(QUERIES)[:3] + [
        "active_nations", "supplier_moving_avg", "quality_classifier",
        "dup_gram_coverage",
    ]
    for warm in dict.fromkeys(n for n in warm_names if n in QUERIES):
        QUERIES[warm][0](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        release_scratch(spark)

    variants = None
    for name in names:
        if name in QUERIES:
            thunk = lambda: QUERIES[name][0](spark, sf_dir)
        else:
            if variants is None:
                from tools.prod_variants import prod_variants

                variants = prod_variants(spark, sf_dir)
            if name not in variants:
                print(f"SKIP unknown query: {name}", file=sys.stderr)
                continue
            thunk = variants[name]
        runs = []
        tracker = spark.sparkContext._jsc.sc().statusTracker()
        n_jobs = n_stages = 0
        for r in range(repeats):
            spark.sparkContext.setJobDescription(f"micro: {name}")
            jobs0 = len(tracker.getJobIdsForGroup(None))
            t0 = time.time()
            thunk().write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
            if r == 0:
                jobs1 = tracker.getJobIdsForGroup(None)
                n_jobs = len(jobs1) - jobs0
                n_stages = sum(
                    len(tracker.getJobInfo(j).get().stageIds())
                    for j in jobs1[-n_jobs:]
                    if tracker.getJobInfo(j).isDefined()
                ) if n_jobs else 0
            release_scratch(spark)
            spark.sparkContext._jvm.System.gc()
        print(
            f"{name}: median={statistics.median(runs):.3f} "
            f"min={min(runs):.3f} max={max(runs):.3f} "
            f"jobs={n_jobs} stages={n_stages} runs={runs}"
        )


if __name__ == "__main__":
    main()
