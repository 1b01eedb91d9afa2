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
    return dt


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

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

    # Production-backend variants: the registered dedup-family queries run
    # with hash_fn="md5" ONLY so the DuckDB oracle can recompute them; real
    # callers get xxhash64 (JVM-native, ~2x cheaper). Bench both so the
    # recorded numbers state production cost, not verification cost.
    from simtradedata_spark.catalog import load_table
    from simtradedata_spark.operators.dedup import (
        minhash_lsh_candidates,
        simhash,
    )
    from simtradedata_spark.operators.graph import dedup_clusters

    docs = load_table(spark, sf_dir, "documents")

    def _prod(name, df_fn):
        try:
            t0 = time.time()
            df_fn().write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:
            timings[name] = -1.0
            print(f"bench error in {name}: {e}", file=sys.stderr)

    _prod(
        "minhash_near_dups@xxh64",
        lambda: minhash_lsh_candidates(
            docs, "doc_id", "text", num_hashes=64, bands=16,
            jaccard_threshold=0.5,
        ),
    )
    _prod("simhash_signatures@xxh64", lambda: simhash(docs, "doc_id", "text"))
    from simtradedata_spark.operators.dedup import minhash_index, minhash_probe_index

    def _incr_prod():
        corpus = docs.filter("doc_id % 10 != 0")
        batch = docs.filter("doc_id % 10 = 0")
        idx = minhash_index(corpus, "doc_id", "text", num_hashes=64, bands=16)
        return minhash_probe_index(
            batch, idx, "doc_id", "text", num_hashes=64, bands=16,
            jaccard_threshold=0.5,
        )

    _prod("incremental_dedup@xxh64", _incr_prod)
    from simtradedata_spark.operators.decontam import char_ngram_overlap

    _prod(
        "char_contamination@xxh64",
        lambda: char_ngram_overlap(
            docs.filter("source <> 'src0'"),
            docs.filter("source = 'src0'"),
            "text",
            "doc_id",
            n=50,
        ),
    )
    # The registered cosine_near_dups is the oracle-exact GEMM path —
    # quadratic in corpus size by definition (measured 64x at a 10x scale-up).
    # The production 100 TB path is the LSH-bucketed per-bucket-GEMM variant
    # with occupancy-scaled bits; bench it so the scale story is a recorded
    # number, not a docstring claim (measured 1.1 s / 2.3 s / 3.7 s at
    # 1x / 10x / 30x where the exact path is 0.5 s / 33 s / 168 s).
    from simtradedata_spark.operators.dedup import cosine_near_dups

    emb = load_table(spark, sf_dir, "embeddings")
    _prod(
        "cosine_near_dups@lsh",
        lambda: cosine_near_dups(
            emb, "vec_id", "embedding", threshold=0.45, bits="auto", dim=64
        ),
    )
    _prod(
        "embedding_dup_clusters@lsh",
        lambda: dedup_clusters(
            cosine_near_dups(
                emb, "vec_id", "embedding", threshold=0.45, bits="auto", dim=64
            )
        ),
    )
    _prod(
        "dedup_clusters@xxh64",
        lambda: dedup_clusters(
            minhash_lsh_candidates(
                docs, "doc_id", "text", num_hashes=64, bands=16,
                jaccard_threshold=0.5,
            )
        ),
    )
    # The registered hard_negatives query is the brute-force oracle-exact
    # form (corpus × broadcast-queries). The production variant probes the
    # queries' nearest IVF cells instead — corpus-side cost drops by
    # ~n_probe/n_lists and stays linear in corpus size (recall floor pinned
    # in tests/test_ann_recall.py).
    from simtradedata_spark.operators.similarity import hard_negative_top_k_ivf

    _prod(
        "hard_negatives@ivf",
        lambda: hard_negative_top_k_ivf(
            emb, emb.filter("vec_id < 10"), k=3, max_sim=0.45,
            n_lists=16, n_probe=4,
        ),
    )
    # The registered semantic_dedup pins k=8 cells so the DuckDB oracle's
    # CTE replay stays tractable — with k FIXED, within-cell pairs grow
    # ~N^2/k (measured 13.8x at a 10x scale-up). The production form is
    # semantic_dedup_gemm: sample-trained coarse quantizer, Arrow-GEMM
    # cell assignment, per-cell blocked-GEMM pair scoring with n_cells ∝ N
    # (~64 rows/cell) — bench it so the scale story is a recorded number.
    from simtradedata_spark.operators.clustering import semantic_dedup_gemm

    _prod(
        "semantic_dedup@gemm",
        lambda: semantic_dedup_gemm(emb, n_cells="auto", threshold=0.45),
    )
    # The registered ExactSubstr queries keep raw n-gram strings as join
    # keys so DuckDB can replay them; production hashes each gram to 64
    # bits before the two gram-keyed exchanges (8-byte shuffle keys instead
    # of n-token text).
    from simtradedata_spark.operators.substrings import strip_cross_doc_spans

    _prod(
        "exact_substr_trim@xxh64",
        lambda: strip_cross_doc_spans(
            docs, "doc_id", "text", n=8, hash_grams=True
        ),
    )
    # Sketch production backends: the registered queries run md5 so DuckDB
    # can rebuild the tables; production is xxhash64 (JVM-native — the md5
    # conv() path dominated cms_token_frequency at sf1.0: 12.5 s -> 2.7 s).
    # bloom_decontam additionally sizes m from the data (bloom_sizing)
    # instead of the oracle's pinned 16384 bits, which saturate once the
    # benchmark's gram count approaches m/k. At sf1.0 that saturation costs
    # PRECISION (~50% of corpus grams flag as might-contain), not runtime —
    # gram construction dominates both forms equally — so the variant's
    # point is the restored FP rate, recorded here so the sizing rule has a
    # benched form.
    from pyspark.sql import functions as FB

    from simtradedata_spark.operators.dedup import shingles_of, tokens
    from simtradedata_spark.operators.sketches import (
        bloom_build,
        bloom_might_contain,
        bloom_sizing,
        cms_estimate,
        count_min_sketch,
    )

    def _cms_prod():
        toks = docs.select(FB.explode(tokens("text")).alias("tok"))
        sketch = count_min_sketch(toks, "tok", depth=3, width=512)
        counts = toks.groupBy("tok").agg(FB.count(FB.lit(1)).alias("n"))
        total = toks.agg(FB.count(FB.lit(1)).alias("_total"))
        heavy = (
            counts.crossJoin(FB.broadcast(total))
            .filter(FB.col("n") * 500 > FB.col("_total"))
            .select("tok", "n")
        )
        return heavy.join(
            cms_estimate(sketch, heavy, "tok", depth=3, width=512), "tok"
        )

    _prod("cms_token_frequency@xxh64", _cms_prod)

    def _bloom_prod():
        g = docs.select(
            "doc_id", "source", shingles_of(tokens("text"), 5).alias("gs")
        )
        bench_g = (
            g.filter(FB.col("source") == "src0")
            .select(FB.explode("gs").alias("gram"))
            .distinct()
        )
        m = bloom_sizing(bench_g.count())
        corpus = g.filter(FB.col("source") != "src0").select(
            "doc_id", FB.explode("gs").alias("gram")
        )
        sketch = bloom_build(bench_g, "gram", m_bits=m, k=4)
        probed = bloom_might_contain(
            sketch, corpus.select("gram"), "gram", m_bits=m, k=4
        )
        return (
            corpus.join(probed.filter("might_contain"), "gram")
            .groupBy("doc_id")
            .agg(FB.count(FB.lit(1)).alias("bloom_hits"))
        )

    _prod("bloom_decontam@xxh64", _bloom_prod)
    # The registered pq_ann_top5 certifies the ADC algebra with init-only
    # codebooks; production is the composed IVF-PQ stack (Lloyd-trained
    # codebooks, n_probe cell pruning, shortlist re-rank).
    from simtradedata_spark.operators.pq import ivfpq_top_k

    _prod(
        "pq_ann_top5@ivfpq",
        lambda: ivfpq_top_k(
            emb, emb.filter("vec_id < 10"), k=5, n_lists=16, n_probe=4,
            shortlist=100,
        ),
    )
    # The registered full_curation_funnel runs the composed chain on the
    # md5 oracle backend with a pinned oracle-size bloom; production is
    # xxhash64 throughout + the auto-sized bloom (the CLI's defaults).
    from simtradedata_spark.operators.pipeline import (
        full_curation,
        full_funnel_report,
    )

    _prod(
        "full_curation_funnel@xxh64",
        lambda: full_funnel_report(
            full_curation(
                docs, jaccard_threshold=0.5, strip_n=8, contam_n=5,
                select_top=50, seq_len=4096,
            )
        ),
    )

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
