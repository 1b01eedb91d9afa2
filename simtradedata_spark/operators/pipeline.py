"""Composed training-data pipeline (LLM-pipeline extension, BASELINE.json):
quality filter → exact dedup → benchmark decontamination → deterministic
sample, reported as a per-source funnel.

This is the end-to-end shape a 100 TB curation run takes — each stage is an
operator already verified in isolation (textstats / dedup / decontam /
sampling); composing them costs exactly the shuffles the stages need and no
more:

  stage                plan cost
  ------------------   -----------------------------------------------
  quality features     scan-local column exprs (no shuffle)
  exact dedup          one shuffle on fingerprint (window row_number)
  decontamination      corpus explode + broadcast benchmark grams + one
                       shuffle on doc id (inverted index, no doc×doc)
  hash sample          scan-local filter (pure function of the key)
  funnel report        one shuffle on source (final groupBy)

Every stage is a FLAG on the row, not a filter, so one pass produces the
entire funnel — n_docs → n_quality → n_unique → n_clean → n_sampled — per
source, plus the surviving token budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from simtradedata_spark.functions.caching import scratch_persist
from simtradedata_spark.operators.decontam import ngram_overlap
from simtradedata_spark.operators.sampling import hash_bucket
from simtradedata_spark.operators.textstats import char_stats, fingerprint


def curate_flags(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    benchmark_source: str = "src0",
    min_tokens: int = 5,
    max_punct: float = 0.3,
    max_digit: float = 0.3,
    contam_n: int = 5,
    sample_pct: int = 50,
) -> DataFrame:
    """The curation pipeline as ROW FLAGS (__q/__unique/__clean/__sampled)
    over the corpus — one pass, each stage implying the previous; shared by
    the funnel report and the corpus exporter so the two can never
    disagree about which rows survive.

    Funnel semantics:
      quality  — n_tokens ≥ min_tokens, punct/digit density ≤ thresholds
      unique   — first doc (by id) per canonical-form fingerprint among
                 quality passers
      clean    — unique and sharing NO distinct word ``contam_n``-gram with
                 the benchmark
      sampled  — clean and md5(id) mod 100 < sample_pct
    """
    corpus = docs.filter(F.col(source_col) != benchmark_source)
    bench = docs.filter(F.col(source_col) == benchmark_source)

    feat = char_stats(corpus, text_col).withColumn("__fp", fingerprint(text_col))
    quality = (
        (F.col("n_tokens") >= min_tokens)
        & (F.col("punct_ratio") <= max_punct)
        & (F.col("digit_ratio") <= max_digit)
    )
    # row_number within (fingerprint, quality) keeps ranking among quality
    # passers only — one window, no second pass over rejected rows.
    w = Window.partitionBy("__fp", "__q").orderBy(id_col)
    flagged = (
        feat.withColumn("__q", quality)
        .withColumn("__unique", F.col("__q") & (F.row_number().over(w) == 1))
    )

    hits = ngram_overlap(corpus, bench, text_col, id_col, n=contam_n).select(
        id_col, F.lit(True).alias("__hit")
    )
    flagged = flagged.join(hits, id_col, "left").withColumn(
        "__clean", F.col("__unique") & F.col("__hit").isNull()
    )
    return flagged.withColumn(
        "__sampled",
        F.col("__clean") & (hash_bucket([id_col], buckets=100) < sample_pct),
    )


def training_mix_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    benchmark_source: str = "src0",
    min_tokens: int = 5,
    max_punct: float = 0.3,
    max_digit: float = 0.3,
    contam_n: int = 5,
    sample_pct: int = 50,
) -> DataFrame:
    """Per-source curation funnel over ``docs``; rows from
    ``benchmark_source`` act as the held-out benchmark (decontamination
    target) and are excluded from the corpus. See ``curate_flags`` for the
    stage semantics."""
    flagged = curate_flags(
        docs, id_col, text_col, source_col, benchmark_source,
        min_tokens, max_punct, max_digit, contam_n, sample_pct,
    )
    return funnel_report(flagged, source_col)


def funnel_report(flagged: DataFrame, source_col: str = "source") -> DataFrame:
    """Aggregate the per-source funnel from an ALREADY-FLAGGED frame — the
    shared tail of the report and the exporter, so the exporter can run the
    expensive stages once and derive both artifacts from one frame."""
    n_if = lambda c: F.sum(F.col(c).cast("long"))
    return flagged.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        n_if("__q").alias("n_quality"),
        n_if("__unique").alias("n_unique"),
        n_if("__clean").alias("n_clean"),
        n_if("__sampled").alias("n_sampled"),
        F.sum(F.when(F.col("__sampled"), F.col("n_tokens")).otherwise(0)).alias(
            "sampled_tokens"
        ),
    )


def full_curation(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    benchmark_source: str = "src0",
    min_tokens: int = 5,
    max_punct: float = 0.3,
    max_digit: float = 0.3,
    num_hashes: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.5,
    strip_n: int = 8,
    contam_n: int = 5,
    bloom_bits: int | None = None,
    bloom_k: int = 4,
    select_top: int | None = None,
    seq_len: int = 4096,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """The COMPLETE curation release chain (r5 verdict item 7), every stage
    the standalone-certified operator applied to the previous stage's
    survivors:

      stage        operator (its certified registry query)         flag
      -----------  ----------------------------------------------  ----------
      quality      textstats.char_stats thresholds (quality_scores) __q
      exact dedup  fingerprint keep-first (dedup_docs_exact)        __unique
      near-dup     minhash_lsh_candidates → graph.dedup_clusters
                   keep cluster canonical (minhash_near_dups,
                   dedup_clusters)                                  __canonical
      x-doc strip  substrings.strip_cross_doc_spans rewrites text
                   (exact_substr_trim); empty survivors drop        __nonempty
      decontam     sketches.bloom_build/might_contain over the
                   benchmark's word n-grams (bloom_decontam)        __clean
      DSIR select  textstats.dsir_importance, top-k by
                   (round(log_ratio,6) desc, id) (dsir_selection)   __selected
      pack         packing.pack_sequences over kept tokens —
                   bin_id on selected rows (sequence_packing)

    Returns the enriched corpus frame: the original columns plus the stage
    flags, ``text_clean``/``kept_tokens`` (post-strip), ``bin_id`` (null on
    non-selected rows), and — only when ``select_top`` is set, since the
    DSIR scoring stage is skipped otherwise — ``log_ratio`` on the selected
    rows. Each flag implies the previous,
    so ONE aggregation yields the whole funnel (see full_funnel_report) and
    the invariant test can compare every stage count against the standalone
    operators run independently.

    Scale: no stage is quadratic — the chain is the per-stage certified
    plans applied to monotonically shrinking frames; the benchmark bitset
    and the DSIR bucket LMs are fixed-size broadcasts; packing's cumsum is
    the two-pass range-bucket scheme (no single-partition window).
    ``select_top=None`` keeps every clean doc (selection off).

    Caching: stages persist scratch frames internally (the stage barriers
    plus the two gram frames). The returned frame depends on them lazily,
    so they must stay alive until the caller's final action — wrap the
    call AND that action in ``functions.caching.scratch_scope(spark)`` to
    free exactly these frames afterwards without touching caches the
    caller owns (``export_curated_release`` does this).

    Concurrency: SINGLE-OWNER-THREAD assumption. The stage barriers sweep
    finished-stage scratch by RDD-id diff against a snapshot taken at call
    entry — that diff is session-global, so a CONCURRENT query on the same
    SparkSession that persists (recomputable — merely re-cached) or
    localCheckpoints (NOT recomputable — that query fails) a frame while
    this chain runs would be swept mid-flight. Run one curation chain per
    session at a time, or give concurrent work its own SparkSession.
    """
    from simtradedata_spark.operators.dedup import (
        minhash_lsh_candidates,
        shingles_of,
        tokens,
    )
    from simtradedata_spark.operators.graph import dedup_clusters
    from simtradedata_spark.operators.packing import pack_sequences
    from simtradedata_spark.operators.sketches import bloom_build
    from simtradedata_spark.operators.substrings import strip_cross_doc_spans
    from simtradedata_spark.operators.textstats import dsir_importance

    corpus = docs.filter(F.col(source_col) != benchmark_source)
    bench = docs.filter(F.col(source_col) == benchmark_source)

    # Each stage below FILTERS the running `flagged` frame for its input
    # AND joins its verdict back onto it — two consumers per stage. Without
    # a materialization barrier Spark recomputes the whole prefix for both
    # branches of every stage, compounding to ~2^stages recomputes of the
    # quality/dedup base by the packing stage (measured: the sf0.01 funnel
    # did not finish in 10 min unpersisted, 1.5 min with barriers). SCRATCH
    # blocks — released by functions.caching.release_scratch / the
    # scratch_scope in export_curated_release.
    #
    # The barrier TRUNCATES LINEAGE (localCheckpoint, not persist): a
    # persist keeps every upstream ShuffleDependency referenced for
    # recompute-on-eviction, so the chain holds EVERY stage's shuffle
    # files on disk simultaneously — at the 1000x point (5M docs) four
    # live ~13 GB gram shuffles plus the caches overflowed the disk twice.
    # Checkpointing drops the upstream graph, and the GC nudge lets the
    # ContextCleaner delete the finished stage's shuffle files NOW rather
    # than at an eventual full GC. The barrier ALSO releases every frame
    # persisted inside this call since the previous barrier (the finished
    # stage's scratch: the prior barrier's blocks, minhash signatures, CC
    # round checkpoints, gram frames) — each stage re-reads only the
    # NEWEST barrier, so once stage N+1 is materialized stage N's blocks
    # are garbage; without the sweep the live barrier copies alone are
    # ~6x one corpus at the 1000x point (the second disk wall the r9 run
    # hit). Scoped via snapshot ids — a CALLER's persists/localCheckpoints
    # predate `start` and are never touched (the r6 wrong-#1 contract).
    # Trade (same one graph.py's CC rounds make): a barrier partition
    # lost on a cluster is not recomputable — the job restarts from
    # source instead; for a batch release chain that is the right side of
    # the trade.
    from simtradedata_spark.functions.caching import (
        release_new,
        snapshot,
    )

    spark = docs.sparkSession
    start = snapshot(spark)

    # SERIALIZED barrier storage (MEMORY_AND_DISK, not the _DESER default):
    # a barrier carries the full corpus text — deserialized row objects are
    # ~4-6x the serialized+zstd bytes (spark.rdd.compress), and at the
    # 1000x point caching 260 MB deserialized partitions concurrently with
    # the stage's own execution memory OOM'd a 16 GiB heap (measured).
    # Reading a barrier back pays one deserialization pass — each barrier
    # is read ~2x, noise next to the stages themselves.
    from pyspark import StorageLevel

    # The per-barrier System.gc() nudge runs UNCONDITIONALLY. It exists so
    # the ContextCleaner deletes the finished stage's shuffle files NOW —
    # at the 1000x point those are ~13 GB per stage and letting them pile
    # up overflowed the disk twice (r8/r9). Round 10 gated it on the
    # big-input session signal to save ~0.1 s x barriers at certification
    # scale, which backfired: on a cold 32-core pass mid-bench-suite the
    # heap carries ~60 queries of garbage, and the strip/decontam stages
    # then run 3-5x slower without the per-barrier compaction (r11 in-suite
    # A/B at sf0.1/local[32]: funnel 40.1/22.4 s nudge-off vs 20.1/16.4 s
    # nudge-on; the driver's r10 cold run measured the same regression,
    # 18.3 -> 41.3 s round-over-round). The ~1 s small-scale cost is noise
    # next to that failure mode at BOTH ends of the scale axis.

    def barrier(df: DataFrame) -> DataFrame:
        pre = snapshot(spark)
        out = df.localCheckpoint(
            eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK
        )
        keep = snapshot(spark) - pre  # the new barrier's own blocks
        release_new(spark, start, keep=keep)
        spark.sparkContext._jvm.System.gc()
        return out

    # 1-2: quality flags + exact dedup (curate_flags' first two stages)
    feat = char_stats(corpus, text_col).withColumn("__fp", fingerprint(text_col))
    quality = (
        (F.col("n_tokens") >= min_tokens)
        & (F.col("punct_ratio") <= max_punct)
        & (F.col("digit_ratio") <= max_digit)
    )
    w = Window.partitionBy("__fp", "__q").orderBy(id_col)
    flagged = barrier(
        feat.withColumn("__q", quality).withColumn(
            "__unique", F.col("__q") & (F.row_number().over(w) == 1)
        )
    )

    # 3: near-dup clustering among exact-unique survivors
    uniq = flagged.filter(F.col("__unique"))
    pairs = minhash_lsh_candidates(
        uniq, id_col, text_col,
        num_hashes=num_hashes, bands=bands,
        jaccard_threshold=jaccard_threshold, hash_fn=hash_fn,
    )
    clusters = dedup_clusters(pairs).select(
        F.col("doc_id").alias(id_col), "is_canonical"
    )
    flagged = barrier(
        flagged.join(clusters, id_col, "left").withColumn(
            "__canonical",
            F.col("__unique") & F.coalesce("is_canonical", F.lit(True)),
        ).drop("is_canonical")
    )

    # 4: cross-document exact-substring strip rewrites the surviving text
    stripped = strip_cross_doc_spans(
        flagged.filter(F.col("__canonical")).select(id_col, text_col),
        key_col=id_col, text_col=text_col, n=strip_n,
        hash_grams=(hash_fn != "md5"),
    ).select(id_col, "kept_tokens", "text_clean")
    flagged = barrier(
        flagged.join(stripped, id_col, "left").withColumn(
            "__nonempty", F.col("__canonical") & (F.col("kept_tokens") > 0)
        )
    )

    # 5: Bloom decontamination of the POST-STRIP text against the benchmark.
    # bloom_bits=None sizes the bitset to the ACTUAL benchmark gram count
    # (bloom_sizing) — a pinned m saturates when the benchmark grows (at 10×
    # data a 16-Kbit filter flagged 100% of the corpus, r6 measurement);
    # the count is one tiny distinct-aggregate job over the benchmark side.
    from simtradedata_spark.operators.sketches import bloom_flag_col, bloom_sizing

    # SCRATCH persist: bench_grams feeds the sizing count + the bitset
    # build — unstaged, the benchmark tokenize+shingle construction runs
    # twice (the exact pattern the standalone bloom_decontam query stages
    # for the same reason, queries.py).
    bench_grams = scratch_persist(
        bench.select(
            F.explode(shingles_of(tokens(text_col), contam_n)).alias("gram")
        ).distinct(),
        StorageLevel.MEMORY_AND_DISK,
    )
    if bloom_bits is None:
        bloom_bits = bloom_sizing(max(bench_grams.count(), 1))
    # bloom_flag_col packs the bitset driver-side (one collect of the
    # sparse word table) and ships it exactly once — sc.broadcast bytes
    # when small, SparkFiles+memmap (one page-cache copy per NODE, zero
    # JVM heap) at the 1000x auto-sized point. The r9 shape (k
    # broadcast-hash joins; Spark does not reuse the exchange across
    # them — measured) held k ~0.7 GB HashedRelations per executor and
    # was the chain's 16 GiB OOM cause.
    sketch = bloom_build(
        bench_grams, "gram", m_bits=bloom_bits, k=bloom_k, hash_fn=hash_fn
    )
    # The DOC side probes IN PLACE (bloom_flag_col: JVM-side hashing, one
    # Arrow-batched bitset probe, zero shuffle) instead of the
    # distinct → bloom_might_contain → join-back shape the standalone
    # query uses: per-occurrence grams are near-unique here, so the
    # distinct and the join-back were two corpus-sized gram-string
    # shuffles (plus a persisted occurrence frame) buying nothing — at
    # 5M docs (1000x) that stage alone overflowed the scratch disk. The
    # verdict per gram is bit-identical (same seed strings, same bit
    # layout), so the funnel's __clean flags are unchanged.
    doc_grams = flagged.filter(F.col("__nonempty")).select(
        id_col,
        F.explode(shingles_of(tokens("text_clean"), contam_n)).alias("gram"),
    )
    bloom_res: list = []
    hit_docs = (
        bloom_flag_col(
            sketch, doc_grams, "gram",
            m_bits=bloom_bits, k=bloom_k, hash_fn=hash_fn,
            resources=bloom_res,
        )
        .filter(F.col("might_contain"))
        .select(id_col).distinct().withColumn("__hit", F.lit(True))
    )
    flagged = barrier(
        flagged.join(hit_docs, id_col, "left").withColumn(
            "__clean", F.col("__nonempty") & F.col("__hit").isNull()
        ).drop("__hit")
    )
    # The decontam barrier above is eager — the bitset was consumed; free
    # the broadcast blocks NOW instead of letting them accumulate across
    # stages/runs (the r9 intra-session drift suspect). File-shipped
    # bitsets are cleaned at sc.stop.
    for h in bloom_res:
        if hasattr(h, "destroy"):
            h.destroy()

    # 6: DSIR importance selection over the clean pool (target = benchmark
    # domain, the certified dsir_selection policy: round-6dp score desc, id)
    # NO barrier after stage 5 (r11): the selection layer over the
    # decontam barrier is either a pure projection (select_top=None) or a
    # broadcast join with a <= select_top-row frame — packing's two
    # consumers re-derive that layer from the cached decontam barrier for
    # the cost of re-reading its blocks, which is exactly what reading a
    # stage-5 barrier twice would have cost, minus one full-corpus
    # checkpoint job and one live corpus copy. The expensive part of the
    # select_top path (DSIR scoring + top-k) is shared via a scratch
    # persist of the tiny `picked` frame instead.
    clean = flagged.filter(F.col("__clean"))
    if select_top is None:
        flagged = flagged.withColumn("__selected", F.col("__clean"))
    else:
        scores = dsir_importance(
            clean.select(id_col, F.col("text_clean").alias(text_col)),
            bench.select(id_col, text_col),
            hash_fn=hash_fn,
        ).select(
            id_col, F.round("log_ratio", 6).alias("log_ratio")
        )
        # exact top-k by ascending (-score, id) == (score desc, id asc).
        # Bounded k executes as TakeOrderedAndProject — per-partition
        # k-heaps merged once (k·p rows), no full sort, no rank pass: the
        # bucketed global-rank path spent a persist + split-point sample +
        # bucket-count job (9 jobs, ~1.3 s of the sf0.1 funnel) to compute
        # ranks it immediately discarded via `rank <= k`. The two-pass
        # global rank stays for large k, where k·p rows would strain the
        # single merge task.
        if select_top <= 65536:
            picked = (
                scores.withColumn("__neg", -F.col("log_ratio"))
                .orderBy("__neg", id_col)
                .limit(select_top)
                .select(id_col, "log_ratio")
                .withColumn("__selected", F.lit(True))
            )
        else:
            from simtradedata_spark.operators.topk import global_rank

            picked = (
                global_rank(
                    scores.withColumn("__neg", -F.col("log_ratio")),
                    ["__neg", id_col],
                    rank_col="__rk",
                )
                .filter(F.col("__rk") <= select_top)
                .select(id_col, "log_ratio")
                .withColumn("__selected", F.lit(True))
            )
        # scratch persist so the DSIR scoring + top-k runs once across
        # packing's two consumers; bounded by select_top rows. For small k
        # the broadcast hint keeps the corpus side unshuffled regardless
        # of size estimates; the large-k path lets the planner choose.
        picked = scratch_persist(picked)
        if select_top <= 65536:
            picked = F.broadcast(picked)
        flagged = flagged.join(picked, id_col, "left").withColumn(
            "__selected",
            F.col("__clean") & F.coalesce("__selected", F.lit(False)),
        )

    # 7: sequence packing over the selected docs' kept tokens
    packed = pack_sequences(
        flagged.filter(F.col("__selected")).select(id_col, "kept_tokens"),
        key_cols=[id_col], token_col="kept_tokens", seq_len=seq_len,
    ).select(id_col, "bin_id")
    return flagged.join(packed, id_col, "left")


def full_funnel_report(flagged: DataFrame, source_col: str = "source") -> DataFrame:
    """Per-source funnel over a ``full_curation`` frame — every stage's
    survivor count in one aggregation.

    ``n_bins`` counts GLOBALLY-assigned packing bin ids per source: a bin
    holding docs from two sources appears in both rows, so per-source
    ``n_bins`` values are NOT additive — take ``countDistinct(bin_id)``
    over the whole frame for a total (as ``export_curated_release`` does)."""
    n_if = lambda c: F.sum(F.col(c).cast("long"))
    return flagged.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        n_if("__q").alias("n_quality"),
        n_if("__unique").alias("n_unique"),
        n_if("__canonical").alias("n_canonical"),
        n_if("__nonempty").alias("n_nonempty"),
        n_if("__clean").alias("n_clean"),
        n_if("__selected").alias("n_selected"),
        F.sum(F.when(F.col("__selected"), F.col("kept_tokens")).otherwise(0)).alias(
            "selected_tokens"
        ),
        F.countDistinct(F.when(F.col("__selected"), F.col("bin_id"))).alias("n_bins"),
    )


def export_curated_release(
    docs: DataFrame,
    out_dir: str,
    n_shards: int = 4,
    **curation_kw,
) -> dict:
    """One-command FULL curation release (`export-corpus --full-curation`):
    run the complete chain (quality → exact dedup → near-dup → cross-doc
    strip → bloom decontam → DSIR select → pack) and ship the surviving
    documents — post-strip text, packed ``bin_id`` — as compressed JSONL
    shards plus a ``_datacard.json`` with the per-source stage funnel.
    Returns the datacard dict.

    Concurrency caveat (inherited from ``scratch_scope``, see
    functions/caching.py): the scope sweep assumes a single-threaded
    driver — a frame persisted by a CONCURRENT driver thread during this
    call is swept with the scratch, and if that frame is a
    localCheckpoint its data is unrecoverable. Don't run this
    concurrently with other persist-issuing work on the same session."""
    import json
    import os

    from simtradedata_spark.functions.caching import scratch_scope
    from simtradedata_spark.sources.jsonl import write_jsonl

    id_col = curation_kw.get("id_col", "doc_id")
    source_col = curation_kw.get("source_col", "source")
    # scratch_scope frees ONLY what this call persists (the curation
    # barriers + the flagged frame below) — a caller's own persists and
    # localCheckpoints survive the library call (r6 verdict, wrong #1)
    with scratch_scope(docs.sparkSession):
        flagged = scratch_persist(full_curation(docs, **curation_kw))
        selected = flagged.filter(F.col("__selected")).select(
            id_col, source_col,
            F.col("text_clean").alias("text"),
            F.col("kept_tokens").alias("n_tokens"),
            "bin_id",
        )
        write_jsonl(selected, os.path.join(out_dir, "shards"), n_shards=n_shards)
        report = full_funnel_report(flagged, source_col).collect()
        # bins are GLOBAL (packing runs over all selected docs), so the
        # total is a distinct count, not the sum of per-source distincts
        n_bins_total = (
            flagged.filter(F.col("__selected"))
            .agg(F.countDistinct("bin_id"))
            .first()[0]
        )
    keys = (
        "n_docs", "n_quality", "n_unique", "n_canonical", "n_nonempty",
        "n_clean", "n_selected", "selected_tokens", "n_bins",
    )
    card = {
        "per_source": {r[source_col]: {k: r[k] for k in keys} for r in report},
        "totals": {
            k: sum(r[k] for r in report)
            for k in keys
            if k != "n_bins"
        },
    }
    card["totals"]["n_bins"] = n_bins_total
    with open(os.path.join(out_dir, "_datacard.json"), "w") as fh:
        json.dump(card, fh, indent=2, sort_keys=True)
    return card


def export_training_corpus(
    docs: DataFrame,
    out_dir: str,
    n_shards: int = 4,
    **curate_kw,
) -> dict:
    """One-command corpus release: curate (quality → dedup → decontam →
    sample) and write the surviving documents as compressed JSONL shards
    plus a ``_datacard.json`` manifest (per-source funnel + totals) beside
    them — the artifact an LLM data drop actually ships. Returns the
    datacard dict.

    The exporter reuses ``curate_flags`` verbatim, so what lands in the
    shards is BY CONSTRUCTION the set the funnel report counts as
    ``n_sampled``. The datacard is driver-side but bounded by the number
    of sources, not the corpus."""
    import json
    import os

    from simtradedata_spark.sources.jsonl import write_jsonl

    # One pass over the expensive stages: persist the flagged frame, derive
    # BOTH the shards and the datacard from it, then release.
    flagged = scratch_persist(curate_flags(docs, **curate_kw))
    try:
        keep_cols = [c for c in docs.columns]
        selected = flagged.filter(F.col("__sampled")).select(*keep_cols)
        write_jsonl(selected, os.path.join(out_dir, "shards"), n_shards=n_shards)
        src = curate_kw.get("source_col", "source")
        report = funnel_report(flagged, src).collect()
    finally:
        flagged.unpersist()
    card = {
        "per_source": {
            r["source"]: {
                k: r[k]
                for k in (
                    "n_docs", "n_quality", "n_unique", "n_clean",
                    "n_sampled", "sampled_tokens",
                )
            }
            for r in report
        },
    }
    card["totals"] = {
        k: sum(src[k] for src in card["per_source"].values())
        for k in ("n_docs", "n_quality", "n_unique", "n_clean",
                  "n_sampled", "sampled_tokens")
    }
    with open(os.path.join(out_dir, "_datacard.json"), "w") as fh:
        json.dump(card, fh, indent=2, sort_keys=True)
    return card
