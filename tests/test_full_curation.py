"""End-to-end curation release (r5 verdict item 7): the one-command chain
must agree stage-by-stage with the standalone certified operators composed
independently — the funnel invariant — and the CLI must ship shards whose
contents are exactly the funnel's selected set."""

from __future__ import annotations

import glob
import json

import pytest
from pyspark.sql import functions as F

from simtradedata_spark.catalog import load_table
from simtradedata_spark.functions.caching import release_scratch
from simtradedata_spark.operators.pipeline import full_curation, full_funnel_report

SF_DIR = "/root/testdata/sf0.001"
# bloom_bits pinned so the standalone stage-5 reproduction below builds the
# byte-identical filter (the default auto-sizes to the benchmark gram count)
KW = dict(jaccard_threshold=0.5, strip_n=8, contam_n=5, select_top=40,
          bloom_bits=1 << 14)


@pytest.fixture(scope="module")
def flagged(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = full_curation(docs, **KW).persist()
    yield out
    out.unpersist()
    release_scratch(spark)


def _stage_ids(flagged, flag):
    return {r["doc_id"] for r in flagged.filter(F.col(flag)).select("doc_id").collect()}


def test_flags_are_monotone(flagged):
    """Each stage implies the previous (survivors only shrink)."""
    chain = ["__q", "__unique", "__canonical", "__nonempty", "__clean", "__selected"]
    ids = [_stage_ids(flagged, f) for f in chain]
    for prev, cur in zip(ids, ids[1:]):
        assert cur <= prev
    assert len(ids[-1]) == KW["select_top"]


def test_funnel_matches_standalone_operators(spark, flagged):
    """THE invariant: every stage's survivor set equals the standalone
    certified operator applied to the previous stage's survivors."""
    from simtradedata_spark.operators.dedup import (
        minhash_lsh_candidates,
        shingles_of,
        tokens,
    )
    from simtradedata_spark.operators.graph import dedup_clusters
    from simtradedata_spark.operators.sketches import bloom_build, bloom_might_contain
    from simtradedata_spark.operators.substrings import strip_cross_doc_spans
    from simtradedata_spark.operators.textstats import char_stats, dsir_importance

    docs = load_table(spark, SF_DIR, "documents")
    corpus = docs.filter(F.col("source") != "src0")
    bench = docs.filter(F.col("source") == "src0")

    # stage 1: quality (quality_scores' thresholds)
    feat = char_stats(corpus, "text")
    q = feat.filter(
        (F.col("n_tokens") >= 5)
        & (F.col("punct_ratio") <= 0.3)
        & (F.col("digit_ratio") <= 0.3)
    )
    assert {r["doc_id"] for r in q.select("doc_id").collect()} == _stage_ids(
        flagged, "__q"
    )

    # stage 2: exact dedup keep-first among quality passers (dedup_docs_exact)
    from simtradedata_spark.operators.dedup import dedup_exact
    from simtradedata_spark.operators.textstats import fingerprint

    uniq = dedup_exact(
        q.withColumn("__fp", fingerprint("text")), ["__fp"], order_by=["doc_id"]
    )
    uniq_ids = {r["doc_id"] for r in uniq.select("doc_id").collect()}
    assert uniq_ids == _stage_ids(flagged, "__unique")

    # stage 3: near-dup canonical via LSH pairs + min-label CC
    pairs = minhash_lsh_candidates(
        uniq, "doc_id", "text", num_hashes=64, bands=16, jaccard_threshold=0.5
    )
    clus = dedup_clusters(pairs)
    non_canon = {r["doc_id"] for r in clus.filter(~F.col("is_canonical")).collect()}
    assert uniq_ids - non_canon == _stage_ids(flagged, "__canonical")

    # stage 4: cross-doc strip on canonical survivors; empty docs drop
    canon = uniq.filter(~F.col("doc_id").isin(list(non_canon)))
    stripped = strip_cross_doc_spans(
        canon.select("doc_id", "text"), n=8, hash_grams=True
    )
    nonempty = stripped.filter(F.col("kept_tokens") > 0)
    nonempty_ids = {r["doc_id"] for r in nonempty.select("doc_id").collect()}
    assert nonempty_ids == _stage_ids(flagged, "__nonempty")

    # stage 5: bloom decontamination of the POST-STRIP text
    bench_g = bench.select(
        F.explode(shingles_of(tokens("text"), 5)).alias("gram")
    ).distinct()
    sk = bloom_build(bench_g, "gram", m_bits=1 << 14, k=4)
    dg = nonempty.select(
        "doc_id", F.explode(shingles_of(tokens("text_clean"), 5)).alias("gram")
    )
    hits = (
        dg.join(
            bloom_might_contain(sk, dg.select("gram"), "gram", m_bits=1 << 14, k=4)
            .filter(F.col("might_contain")),
            "gram",
        )
        .select("doc_id")
        .distinct()
    )
    hit_ids = {r["doc_id"] for r in hits.collect()}
    clean_ids = nonempty_ids - hit_ids
    assert clean_ids == _stage_ids(flagged, "__clean")

    # stage 6: DSIR top-k on the clean pool (dsir_selection's rank policy)
    scores = dsir_importance(
        nonempty.filter(F.col("doc_id").isin(list(clean_ids))).select(
            "doc_id", F.col("text_clean").alias("text")
        ),
        bench.select("doc_id", "text"),
    )
    top = (
        scores.select("doc_id", F.round("log_ratio", 6).alias("lr"))
        .orderBy(F.col("lr").desc(), "doc_id")
        .limit(KW["select_top"])
    )
    assert {r["doc_id"] for r in top.collect()} == _stage_ids(flagged, "__selected")


def test_packing_covers_selected_tokens(flagged):
    """bin_id is present on exactly the selected rows and bins are the
    ceiling of total kept tokens / seq_len (greedy boundary-spanning)."""
    sel = flagged.filter(F.col("__selected"))
    assert sel.filter(F.col("bin_id").isNull()).count() == 0
    assert flagged.filter(~F.col("__selected") & F.col("bin_id").isNotNull()).count() == 0
    total = sel.agg(F.sum("kept_tokens")).first()[0]
    n_bins = sel.agg(F.countDistinct("bin_id")).first()[0]
    # every doc here is far shorter than seq_len, so no doc can span an
    # entire bin and every bin 0..ceil-1 contains at least one doc START:
    # the distinct-bin count must be EXACTLY ceil(total/seq_len)
    assert sel.agg(F.max("kept_tokens")).first()[0] < 4096
    assert n_bins == -(-total // 4096)


def test_cli_full_curation_release(spark, tmp_path):
    from pyspark.sql import types as T

    from simtradedata_spark.__main__ import main
    from simtradedata_spark.sources.jsonl import read_jsonl, split_corrupt

    release_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("source", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("n_tokens", T.LongType()),
            T.StructField("bin_id", T.LongType()),
        ]
    )

    out = str(tmp_path / "release")
    rc = main(
        ["export-corpus", "--sf-dir", SF_DIR, "--out", out,
         "--full-curation", "--select-top", "40", "--shards", "2"]
    )
    assert rc == 0
    card = json.load(open(f"{out}/_datacard.json"))
    t = card["totals"]
    # funnel is monotone and the release is the selected set
    assert (
        t["n_docs"] >= t["n_quality"] >= t["n_unique"] >= t["n_canonical"]
        >= t["n_nonempty"] >= t["n_clean"] >= t["n_selected"] == 40
    )
    assert "src0" not in card["per_source"]
    assert len(glob.glob(f"{out}/shards/part-*.json.gz")) == 2
    back, bad = split_corrupt(read_jsonl(spark, f"{out}/shards", schema=release_schema))
    assert bad.count() == 0
    assert back.count() == 40
    assert back.filter("source = 'src0'").count() == 0
    # shipped text is the POST-STRIP text with its packed bin
    row = back.orderBy("doc_id").first()
    assert row["n_tokens"] > 0 and row["bin_id"] is not None


def test_library_call_preserves_caller_caches(spark, tmp_path):
    """r6 verdict wrong #1: export_curated_release must free ONLY its own
    scratch. A frame the CALLER persisted — and, critically, a caller
    localCheckpoint, whose truncated lineage cannot be recomputed — must
    survive the library call; the call's own barriers must all be gone."""
    from simtradedata_spark.functions.caching import snapshot
    from simtradedata_spark.operators.pipeline import export_curated_release

    docs = load_table(spark, SF_DIR, "documents")
    caller_persist = docs.limit(5).persist()
    assert caller_persist.count() == 5
    caller_ckpt = docs.limit(3).localCheckpoint()
    before = snapshot(spark)

    export_curated_release(docs, str(tmp_path / "rel"), n_shards=1, **KW)

    # the call's own scratch (stage barriers, gram frames, flagged) is gone
    assert snapshot(spark) <= before
    # caller's persist is still registered and usable
    assert caller_persist.storageLevel.useMemory
    assert caller_persist.count() == 5
    # caller's localCheckpoint was NOT destroyed (would raise if its
    # blocks had been unpersisted — there is no lineage to recompute)
    assert caller_ckpt.count() == 3
    caller_persist.unpersist()
