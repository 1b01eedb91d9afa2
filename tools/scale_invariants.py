"""Engine-side linear invariants at scale for the quadratic-oracle family
(round-3 verdict item 6).

Ten queries were excluded from the 30× DuckDB sweep because their oracles
are QUADRATIC recomputations (all-pairs jaccard / GEMM / recursive CTE) —
the oracle, not the engine, is what can't scale. This closes the gap
without DuckDB, using the replica construction's algebraic guarantees
(tools/make_scaled_sf.py): replicas are key-offset, replica texts are
word-tagged so cross-replica shingle overlap is ZERO, and replica
embeddings get orthogonal ±1 diagonal transforms so cross-replica cosines
collapse. For every TEXT-family query:

  1. |answer(N×)| == N · |answer(1×)|  (answer sets scale exactly N×), and
  2. the replica-0 slice of answer(N×) — rows whose key columns are below
     the 1× key-domain size — equals answer(1×) EXACTLY (replica 0 is
     byte-identical input, so per-row outputs must match bit-for-bit;
     verified with a two-sided exceptAll, fully distributed).

A violation of (1) means cross-replica leakage (the engine found pairs the
construction forbids) or dropped answers; a violation of (2) means the
engine's output depends on corpus composition where it must not. The
EMBEDDING family gets the adjusted invariants described at the FAMILY
table below — the ±1-diagonal construction leaves a Gaussian tail of
genuine cross-replica cosine pairs, so count-linearity holds only for the
within-replica sub-answer (measured: 13,096 data-true cross pairs at 30×,
replica-0 slice still exact).

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
    "cluster_representatives": (["cluster_id", "rep_doc"], "doc"),
    "dup_chunks": (["first_doc"], "doc"),
    # ExactSubstr family: replica texts are word-tagged, so cross-replica
    # 8-gram overlap is zero — every replica's dup grams (and owners) stay
    # internal to it. One output row per doc -> exact N x counts; replica-0
    # slice byte-identical.
    "cross_doc_dup_coverage": (["doc_id"], "doc"),
    "exact_substr_trim": (["doc_id"], "doc"),
}

# The cosine-threshold family needs a WEAKER count invariant: the replica
# construction's ±1-diagonal transform makes cross-replica cosines
# ~N(0, 1/sqrt(64)), and at 30x there are ~1.1e8 cross pairs, so the
# P[cos >= 0.45] ~ 1.6e-4 Gaussian tail yields thousands of GENUINE
# cross-replica near-dups — answers the engine MUST report (text replicas
# have exactly-zero shingle overlap, so the doc family has no analogue).
# The correct algebraic invariants here: (a) replica-0 slice is bit-exact,
# (b) the WITHIN-replica sub-answer, keys folded mod the 1x domain, is
# exactly 30 identical copies of the 1x answer (the orthogonal transform
# preserves within-replica dot products bit-for-bit); cross-replica pairs
# are counted and reported as a data property. embedding_dup_clusters is
# verified by clustering the within-replica edge subset (its registered
# form inherits the cross edges, which legitimately merge clusters).


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
    # -- cosine-threshold family (see module comment) ----------------------
    from simtradedata_spark.operators.dedup import cosine_near_dups
    from simtradedata_spark.operators.graph import dedup_clusters

    d = domain["vec"]
    emb_small = load_table(spark, small, "embeddings")
    emb_big = load_table(spark, big, "embeddings")
    t0 = time.time()
    # the EXACT all-pairs form (bits=0, exact=True): these invariants state
    # the exact answer's algebra; the bits="auto" LSH default (r5 advisory
    # fix) deliberately drops cross-bucket pairs and is gated by the recall
    # floors in tests/test_ann_recall.py instead
    pairs1 = cosine_near_dups(
        emb_small, "vec_id", "embedding", threshold=0.45, bits=0, exact=True
    ).localCheckpoint(eager=True)
    pairsn = cosine_near_dups(
        emb_big, "vec_id", "embedding", threshold=0.45, bits=0, exact=True
    ).localCheckpoint(eager=True)
    same_rep = F.floor(F.col("id_a") / d) == F.floor(F.col("id_b") / d)
    within = pairsn.filter(same_rep)
    cross = pairsn.count() - within.count()
    # cos_sim rounded to 9dp on BOTH sides: the blocked-GEMM BLAS kernels
    # may accumulate in different orders at different matrix shapes, so
    # bit-identity across scale factors is not guaranteed — 1e-9 is.
    folded = within.select(
        (F.col("id_a") % d).alias("id_a"),
        (F.col("id_b") % d).alias("id_b"),
        F.round("cos_sim", 9).alias("cos_sim"),
    )
    pairs1 = pairs1.select(
        "id_a", "id_b", F.round("cos_sim", 9).alias("cos_sim")
    ).localCheckpoint(eager=True)
    rows1 = pairs1.count()
    # exactly n bit-identical copies of the 1x answer
    copies_ok = (
        folded.count() == n * rows1
        and folded.distinct().exceptAll(pairs1).count() == 0
        and pairs1.exceptAll(folded.distinct()).count() == 0
        and folded.groupBy("id_a", "id_b", "cos_sim")
        .count()
        .filter(F.col("count") != n)
        .count()
        == 0
    )
    slice0 = pairsn.filter((F.col("id_a") < d) & (F.col("id_b") < d)).select(
        "id_a", "id_b", F.round("cos_sim", 9).alias("cos_sim")
    )
    slice_ok = (
        slice0.exceptAll(pairs1).count() == 0
        and pairs1.exceptAll(slice0).count() == 0
    )
    ok = copies_ok and slice_ok
    failures += 0 if ok else 1
    print(
        json.dumps(
            {
                "query": "cosine_near_dups",
                "rows_1x": rows1,
                f"within_replica_rows_{n}x": n * rows1 if copies_ok else -1,
                "within_replica_exact_copies": copies_ok,
                "slice_exact": slice_ok,
                "cross_replica_pairs_datatrue": cross,
                "ok": ok,
                "sec": round(time.time() - t0, 1),
            }
        ),
        flush=True,
    )
    # clustering verified on the within-replica edge subset: known answer
    t0 = time.time()
    cl1 = dedup_clusters(pairs1).localCheckpoint(eager=True)
    cln = dedup_clusters(within).localCheckpoint(eager=True)
    r1 = cl1.count()
    rn = cln.count()
    # dedup_clusters labels its node column doc_id regardless of domain
    sl = cln.filter((F.col("doc_id") < d) & (F.col("cluster_id") < d))
    ok = (
        rn == n * r1
        and sl.exceptAll(cl1).count() == 0
        and cl1.exceptAll(sl).count() == 0
    )
    failures += 0 if ok else 1
    print(
        json.dumps(
            {
                "query": "embedding_dup_clusters[within-replica edges]",
                "rows_1x": r1,
                f"rows_{n}x": rn,
                "count_linear": rn == n * r1,
                "slice_exact": ok,
                "ok": ok,
                "sec": round(time.time() - t0, 1),
            }
        ),
        flush=True,
    )
    # -- hard-negative IVF variant at scale --------------------------------
    # The production hard_negative_top_k_ivf is checked directly against
    # its own brute-force form ON THE N× CORPUS (brute is cheap here: the
    # query set is small by contract, so N×·|corpus|·|queries| sims is a
    # few million). Two gates: exhaustive probe (n_probe == n_lists) must
    # REPRODUCE brute force exactly — proves the only approximation is the
    # probe cut — and the production 16/4 setting must keep recall above
    # the floor measured at 1× (tests/test_ann_recall.py), i.e. recall
    # must not collapse as the corpus grows 30×.
    from simtradedata_spark.operators.similarity import (
        hard_negative_top_k,
        hard_negative_top_k_ivf,
    )

    t0 = time.time()
    q_big = emb_big.filter(F.col("vec_id") < 50)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in hard_negative_top_k(
            emb_big, q_big, k=5, max_sim=0.45
        ).collect()
    }
    exhaustive = {
        (r["query_id"], r["neighbor_id"])
        for r in hard_negative_top_k_ivf(
            emb_big, q_big, k=5, max_sim=0.45, n_lists=16, n_probe=16
        ).collect()
    }
    probed = {
        (r["query_id"], r["neighbor_id"])
        for r in hard_negative_top_k_ivf(
            emb_big, q_big, k=5, max_sim=0.45, n_lists=16, n_probe=4
        ).collect()
    }
    # empty truth set: probed ⊆ truth vacuously — recall 1.0, not a failure
    recall = len(probed & truth) / len(truth) if truth else 1.0
    ok = exhaustive == truth and recall >= 0.5
    failures += 0 if ok else 1
    print(
        json.dumps(
            {
                "query": f"hard_negatives@ivf[{n}x corpus]",
                "truth_pairs": len(truth),
                "exhaustive_probe_equals_brute": exhaustive == truth,
                "probe4_recall": round(recall, 3),
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
