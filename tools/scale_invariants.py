"""Engine-side linear invariants at scale for the quadratic-oracle family
(round-3 verdict item 6).

Ten queries were excluded from the 30× DuckDB sweep because their oracles
are QUADRATIC recomputations (all-pairs jaccard / GEMM / recursive CTE) —
the oracle, not the engine, is what can't scale. This closes the gap
without DuckDB, using the replica construction's algebraic guarantees
(tools/make_scaled_sf.py): replicas are key-offset, replica texts are
word-tagged so cross-replica shingle overlap is ZERO, and replica
embeddings get orthogonal ±1 diagonal transforms so cross-replica cosines
collapse. Therefore, for every query in the family:

  1. |answer(N×)| == N · |answer(1×)|  (answer sets scale exactly N×), and
  2. the replica-0 slice of answer(N×) — rows whose key columns are below
     the 1× key-domain size — equals answer(1×) EXACTLY (replica 0 is
     byte-identical input, so per-row outputs must match bit-for-bit;
     verified with a two-sided exceptAll, fully distributed).

A violation of (1) means cross-replica leakage (the engine found pairs the
construction forbids) or dropped answers; a violation of (2) means the
engine's output depends on corpus composition where it must not.

Usage: python tools/scale_invariants.py [SMALL_DIR BIG_DIR N]
Defaults: /root/testdata/sf0.01 /tmp/sf0.01x30 30
Prints one JSON line per query and a final PASS/FAIL summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from simtradedata_spark.catalog import load_table
from simtradedata_spark.queries import QUERIES
from simtradedata_spark.session import get_spark

# query -> (key columns bounding the replica-0 slice, key domain)
FAMILY = {
    "token_jaccard_pairs": (["id_a", "id_b"], "doc"),
    "benchmark_contamination": (["doc_id"], "doc"),
    "char_contamination": (["doc_id"], "doc"),
    "minhash_near_dups": (["id_a", "id_b"], "doc"),
    "simhash_signatures": (["doc_id"], "doc"),
    "dedup_clusters": (["doc_id", "cluster_id"], "doc"),
    "cosine_near_dups": (["id_a", "id_b"], "vec"),
    "embedding_dup_clusters": (["vec_id", "cluster_id"], "vec"),
    "cluster_representatives": (["cluster_id", "rep_doc"], "doc"),
    "dup_chunks": (["first_doc"], "doc"),
}


def main() -> int:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf0.01x30"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    spark = get_spark("scale-invariants")
    domain = {
        "doc": load_table(spark, small, "documents")
        .agg(F.max("doc_id") + 1)
        .first()[0],
        "vec": load_table(spark, small, "embeddings")
        .agg(F.max("vec_id") + 1)
        .first()[0],
    }
    failures = 0
    for name, (key_cols, dom) in FAMILY.items():
        fn, _sql = QUERIES[name]
        t0 = time.time()
        small_df = fn(spark, small).localCheckpoint(eager=True)
        rows1 = small_df.count()
        big_df = fn(spark, big).localCheckpoint(eager=True)
        rowsn = big_df.count()
        pred = None
        for c in key_cols:
            p = F.col(c) < domain[dom]
            pred = p if pred is None else (pred & p)
        slice0 = big_df.filter(pred)
        extra = slice0.exceptAll(small_df).count()
        missing = small_df.exceptAll(slice0).count()
        ok = (rowsn == n * rows1) and extra == 0 and missing == 0
        failures += 0 if ok else 1
        print(
            json.dumps(
                {
                    "query": name,
                    "rows_1x": rows1,
                    f"rows_{n}x": rowsn,
                    "count_linear": rowsn == n * rows1,
                    "slice_extra": extra,
                    "slice_missing": missing,
                    "ok": ok,
                    "sec": round(time.time() - t0, 1),
                }
            ),
            flush=True,
        )
    print(f"FAILURES: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
