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
    flagged = curate_flags(docs, **curate_kw).persist()
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
