"""ANN quality/cost sweep: recall@k of the approximate paths vs exact
brute-force cosine, with candidate-scan cost, at the given sf dir.

Equivalence in exhaustive mode (n_probe == n_lists, probes == all buckets)
is already TESTED; this records the actual recall/cost trade-off of the
configurations a user would run at scale — the number FAISS users tune by.

Usage: python tools/ann_recall.py [sf_dir] [k]
Prints one JSON line per configuration.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from simtradedata_spark.catalog import load_table
from simtradedata_spark.operators.dedup import cosine_near_dups
from simtradedata_spark.operators.similarity import (
    cosine_top_k,
    ivf_top_k,
    lsh_bucket_top_k,
)
from simtradedata_spark.session import get_spark


def _pairs(df) -> set[tuple]:
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ann-recall")
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < 50)
    dim = len(emb.select("embedding").first()[0])

    t0 = time.time()
    truth = _pairs(cosine_top_k(emb, queries, k=k))
    brute_s = round(time.time() - t0, 2)
    # The curation operating point: truth pairs that are GENUINE near-dups
    # (cosine >= 0.45 — the planted-duplicate band), where recall is what
    # decides whether a duplicate escapes the filter. Random-sphere pairs
    # (the bulk of top-k on this synthetic table) are LSH's worst case and
    # mostly interchangeable — missing one of those costs nothing.
    nd = {
        (r["id_a"], r["id_b"])
        for r in cosine_near_dups(
            emb, "vec_id", "embedding", threshold=0.45,
            # the TRUTH set must be the exact all-pairs answer — the
            # bits="auto" LSH default drops cross-bucket pairs by design,
            # which would make the recall measurement self-referential
            bits=0, exact=True,
        ).collect()
    }
    nd |= {(b, a) for a, b in nd}
    must_find = truth & nd
    print(json.dumps({"config": "brute_force", "k": k, "n": n,
                      "sec": brute_s, "recall": 1.0,
                      "near_dup_pairs": len(must_find)}))

    configs = []
    for bits in (4, 6, 8):
        configs.append((f"lsh bits={bits}", dict(bits=bits)))
        configs.append(
            (f"lsh bits={bits} probe={bits}", dict(bits=bits, multi_probe=bits))
        )
    for name, kw in configs:
        t0 = time.time()
        got = _pairs(lsh_bucket_top_k(emb, queries, dim=dim, k=k, **kw))
        sec = round(time.time() - t0, 2)
        # expected candidate fraction: (1 + probes)/2^bits of the corpus
        frac = (1 + kw.get("multi_probe", 0)) / (1 << kw["bits"])
        print(json.dumps({
            "config": name, "k": k, "sec": sec,
            "recall": round(len(got & truth) / len(truth), 4),
            "near_dup_recall": round(len(got & must_find) / len(must_find), 4)
            if must_find else None,
            "scan_frac": round(frac, 4),
        }))

    for n_lists, n_probe in ((16, 1), (16, 2), (16, 4), (32, 4)):
        t0 = time.time()
        got = _pairs(
            ivf_top_k(emb, queries, k=k, n_lists=n_lists, n_probe=n_probe)
        )
        sec = round(time.time() - t0, 2)
        print(json.dumps({
            "config": f"ivf lists={n_lists} probe={n_probe}", "k": k,
            "sec": sec,
            "recall": round(len(got & truth) / len(truth), 4),
            "near_dup_recall": round(len(got & must_find) / len(must_find), 4)
            if must_find else None,
            "scan_frac": round(n_probe / n_lists, 4),
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
