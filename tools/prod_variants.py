"""Production-backend variant definitions, shared by bench.py and
tools/bench_scale_point.py (r6 verdict item 1: the twins must be measured
at every scale point, so they need ONE definition, not two drifting
copies).

The registry queries run md5 / pinned sizes ONLY so the DuckDB oracle can
recompute them; real callers get xxhash64 (JVM-native), data-sized blooms,
LSH-bucketed cosine, IVF-pruned ANN, and GEMM SemDeDup. ``prod_variants``
returns ``{name: thunk}`` where each thunk builds the variant's DataFrame
against the given sf_dir; names carry the ``base@backend`` convention the
bench sub-totals key on.
"""

from __future__ import annotations

from typing import Callable

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simtradedata_spark.functions.caching import scratch_persist


def prod_variants(
    spark: SparkSession, sf_dir: str
) -> dict[str, Callable[[], DataFrame]]:
    from simtradedata_spark.catalog import load_table
    from simtradedata_spark.operators.clustering import semantic_dedup_gemm
    from simtradedata_spark.operators.decontam import char_ngram_overlap
    from simtradedata_spark.operators.dedup import (
        cosine_near_dups,
        minhash_index,
        minhash_lsh_candidates,
        minhash_probe_index,
        shingles_of,
        simhash,
        tokens,
    )
    from simtradedata_spark.operators.graph import dedup_clusters
    from simtradedata_spark.operators.pipeline import (
        full_curation,
        full_funnel_report,
    )
    from simtradedata_spark.operators.pq import ivfpq_top_k
    from simtradedata_spark.operators.similarity import hard_negative_top_k_ivf
    from simtradedata_spark.operators.sketches import (
        bloom_build,
        bloom_flag_col,
        bloom_sizing,
        cms_estimate,
        count_min_sketch,
    )
    from simtradedata_spark.operators.substrings import strip_cross_doc_spans

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    def _incr_prod() -> DataFrame:
        corpus = docs.filter("doc_id % 10 != 0")
        batch = docs.filter("doc_id % 10 = 0")
        # Persisted: minhash_probe_index reads the index TWICE (slim
        # postings for the band join, (id, minhash) for the verify) — in
        # production the index is a STORED table and the two reads are two
        # column-pruned scans; an in-memory index must be materialized or
        # the whole corpus signature pipeline recomputes per consumer.
        idx = scratch_persist(minhash_index(
            corpus, "doc_id", "text", num_hashes=64, bands=16
        ), StorageLevel.MEMORY_AND_DISK)
        return minhash_probe_index(
            batch, idx, "doc_id", "text", num_hashes=64, bands=16,
            jaccard_threshold=0.5,
        )

    def _cms_prod() -> DataFrame:
        # SCRATCH persist (released by the harness's release_scratch, same
        # lifecycle as the certified query's staging): the token frame
        # feeds the sketch build, the exact counts, the total, and the
        # probe join — unstaged, tokenization runs 4x
        toks = scratch_persist(
            docs.select(F.explode(tokens("text")).alias("tok")),
            StorageLevel.MEMORY_AND_DISK,  # serialized: deser token rows OOM at 1000x
        )
        sketch = count_min_sketch(toks, "tok", depth=3, width=512)
        counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
        total = toks.agg(F.count(F.lit(1)).alias("_total"))
        heavy = (
            counts.crossJoin(F.broadcast(total))
            .filter(F.col("n") * 500 > F.col("_total"))
            .select("tok", "n")
        )
        return heavy.join(
            cms_estimate(sketch, heavy, "tok", depth=3, width=512), "tok"
        )

    def _bloom_prod() -> DataFrame:
        # auto-sized bloom (bloom_sizing from the ACTUAL benchmark gram
        # count) — the oracle's pinned 16384 bits saturate at 10x data.
        # SCRATCH persist, mirroring the certified query's staging: this
        # frame feeds the sizing count, the bitset build, the probe set,
        # AND the hits join — unstaged, the tokenize+shingle construction
        # (the dominant CPU) ran ~4x and the twin measured SLOWER than its
        # md5 sibling at 100x (79-119 s vs 46 s) for staging reasons, not
        # hash-backend reasons
        g = scratch_persist(
            docs.select(
                "doc_id", "source", shingles_of(tokens("text"), 5).alias("gs")
            ),
            StorageLevel.MEMORY_AND_DISK,
        )
        bench_g = (
            g.filter(F.col("source") == "src0")
            .select(F.explode("gs").alias("gram"))
            .distinct()
        )
        m = bloom_sizing(bench_g.count())
        corpus = g.filter(F.col("source") != "src0").select(
            "doc_id", F.explode("gs").alias("gram")
        )
        # No checkpoint: bloom_flag_col packs the bitset driver-side in ONE
        # collect of the sparse word table, so the build agg runs once.
        sketch = bloom_build(bench_g, "gram", m_bits=m, k=4)
        # Map-side probe (bloom_flag_col): the distinct → probe →
        # join-back shape shuffles the corpus gram strings twice for
        # near-zero dedup benefit — at the 5M-doc point that stage
        # overflowed the scratch disk. Per-occurrence verdicts are
        # bit-identical, so the hit counts are unchanged.
        return (
            bloom_flag_col(sketch, corpus, "gram", m_bits=m, k=4)
            .filter("might_contain")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("bloom_hits"))
        )

    return {
        # xxhash64 backends of the md5-oracled dedup/text family
        "minhash_near_dups@xxh64": lambda: minhash_lsh_candidates(
            docs, "doc_id", "text", num_hashes=64, bands=16,
            jaccard_threshold=0.5,
        ),
        "simhash_signatures@xxh64": lambda: simhash(docs, "doc_id", "text"),
        "incremental_dedup@xxh64": _incr_prod,
        "char_contamination@xxh64": lambda: char_ngram_overlap(
            docs.filter("source <> 'src0'"),
            docs.filter("source = 'src0'"),
            "text", "doc_id", n=50,
        ),
        # LSH-bucketed per-bucket-GEMM cosine (the registered query is the
        # oracle-exact quadratic GEMM; this is the linear 100 TB path)
        "cosine_near_dups@lsh": lambda: cosine_near_dups(
            emb, "vec_id", "embedding", threshold=0.45, bits="auto", dim=64
        ),
        "embedding_dup_clusters@lsh": lambda: dedup_clusters(
            cosine_near_dups(
                emb, "vec_id", "embedding", threshold=0.45, bits="auto",
                dim=64,
            )
        ),
        "dedup_clusters@xxh64": lambda: dedup_clusters(
            minhash_lsh_candidates(
                docs, "doc_id", "text", num_hashes=64, bands=16,
                jaccard_threshold=0.5,
            )
        ),
        # IVF-pruned hard negatives (registered query is brute-force exact;
        # recall floor pinned in tests/test_ann_recall.py). n_lists="auto"
        # = ceil(N/256): cells ∝ corpus so candidate volume per anchor
        # stays ~n_probe x 256 at any scale — pinned-16 was linear-in-N
        # per anchor, quadratic once anchors scale with the corpus.
        "hard_negatives@ivf": lambda: hard_negative_top_k_ivf(
            emb, emb.filter("vec_id < 10"), k=3, max_sim=0.45,
            n_lists="auto", n_probe=4,
        ),
        # n_cells ∝ N SemDeDup (registered query pins k=8 for the oracle,
        # which makes within-cell pairs grow ~N^2/k)
        "semantic_dedup@gemm": lambda: semantic_dedup_gemm(
            emb, n_cells="auto", threshold=0.45
        ),
        # 64-bit hashed gram keys instead of raw n-gram strings
        "exact_substr_trim@xxh64": lambda: strip_cross_doc_spans(
            docs, "doc_id", "text", n=8, hash_grams=True
        ),
        "cms_token_frequency@xxh64": _cms_prod,
        "bloom_decontam@xxh64": _bloom_prod,
        # composed IVF-PQ (Lloyd-trained codebooks, cell pruning, re-rank;
        # auto-sized coarse quantizer — same rationale as @ivf above)
        "pq_ann_top5@ivfpq": lambda: ivfpq_top_k(
            emb, emb.filter("vec_id < 10"), k=5, n_lists="auto", n_probe=4,
            shortlist=100,
        ),
        # the CLI's defaults: xxhash64 throughout + auto-sized bloom
        "full_curation_funnel@xxh64": lambda: full_funnel_report(
            full_curation(
                docs, jaccard_threshold=0.5, strip_n=8, contam_n=5,
                select_top=50, seq_len=4096,
            )
        ),
    }
