"""Selective scale-point benchmark: run a fixed set of LINEAR-path
registry queries at an arbitrary replica directory and print one JSON
line — the tool behind SCALE.md's two-decade (sf0.1 → sf1.0 → sf10)
scaling table.

bench.py runs the FULL registry and is the per-round artifact; at 100×
volume the documented quadratic oracle-exact baselines (exact cosine,
exact SemDeDup, all-pairs clustering) would dominate the wall-clock by
design, so this tool runs only the production-shaped families whose cost
the 100 TB story depends on. The subset is pinned below — extend it when
a new linear family lands.

Usage: python tools/bench_scale_point.py SF_DIR [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simtradedata_spark.functions.caching import release_scratch
from simtradedata_spark.queries import QUERIES
from simtradedata_spark.session import get_spark

# Linear production families, one representative per plan shape.
LINEAR_SET = [
    # relational core
    "pricing_summary",        # TPC-H Q1 map-side agg
    "region_revenue",         # broadcast-dim multi-join
    "supplier_moving_avg",    # keyed window
    "top_customers",          # global top-k (TakeOrdered)
    "dedup_lineitem_first",   # keyed window dedup
    "purchases_within_7d",    # decomposed range join
    "region_daily_ffill",     # calendar densify + ffill
    "hourly_event_stats",     # time-bucket agg
    # text / dedup stack (md5-certified forms)
    "minhash_near_dups",      # banded LSH self-join
    "simhash_signatures",     # packed bit-count agg
    "token_jaccard_pairs",    # inverted-index posting join
    "cross_doc_dup_coverage", # gram-keyed shuffles
    "exact_substr_trim",      # gram shuffles + rebuild
    "dup_gram_coverage",      # single-scan repetition
    "boilerplate_lines",      # line-frequency broadcast
    "bloom_decontam",         # fixed-size bitset
    "cms_token_frequency",    # bounded counter grid
    "dsir_selection",         # bucket LMs + broadcast ratio
    "bpe_token_counts",       # broadcast vocab join
    "sequence_packing",       # two-pass global cumsum
    "pipeline_funnel",        # composed flags, one pass
    "full_curation_funnel",   # the whole chain (all stages linear)
    # embeddings (bounded-candidate forms)
    "lsh_ann_top5",
    "ivf_ann_top5",
    "pq_ann_top5",
    "kmeans_clusters",
    # in-engine ML
    "logit_training",
]


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:] or LINEAR_SET
    spark = get_spark("bench_scale_point")
    # warm the JVM/codegen paths on the cheapest entries
    for w in names[:2]:
        QUERIES[w][0](spark, sf_dir).write.format("noop").mode("overwrite").save()
        release_scratch(spark)
    timings = {}
    for name in names:
        t0 = time.time()
        try:
            QUERIES[name][0](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:
            timings[name] = -1.0
            print(f"error in {name}: {e}", file=sys.stderr)
        release_scratch(spark)
    print(
        json.dumps(
            {
                "metric": "scale_point",
                "sf_dir": sf_dir,
                "value": round(sum(t for t in timings.values() if t >= 0), 3),
                "unit": "sec",
                "queries": timings,
            }
        )
    )


if __name__ == "__main__":
    main()
