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
    target) and are excluded from the corpus.

    Funnel semantics (each stage implies the previous):
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
    flagged = flagged.withColumn(
        "__sampled",
        F.col("__clean") & (hash_bucket([id_col], buckets=100) < sample_pct),
    )

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
