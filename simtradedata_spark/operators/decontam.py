"""Benchmark decontamination — n-gram overlap between a training corpus and
an evaluation/benchmark set (LLM-pipeline extension; same family as the
dedup operators in ``operators/dedup.py``).

Standard practice for training-data hygiene: a document is *contaminated*
if it shares at least one word n-gram (n≈8-13 in published pipelines; the
operator takes n as a parameter) with any benchmark document. The scalable
plan is an inverted-index join, never a doc×doc comparison:

  benchmark → distinct n-grams                  (small: eval sets are MBs)
  corpus    → explode distinct n-grams          (the only large relation)
  broadcast hash join on gram → per-doc hit counts

The corpus relation is touched once, shuffled once (the groupBy on doc id);
the benchmark gram set rides broadcast, so a 100 TB corpus streams through
map-side joins. If the benchmark outgrows broadcast, drop the hint and
Catalyst falls back to a shuffle join on ``gram`` — same semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simtradedata_spark.operators.dedup import shingles_of, tokens


def ngram_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-corpus-document overlap stats vs the benchmark n-gram set:
    ``(id_col, n_hits, n_grams, hit_ratio)`` — only documents with ≥1 hit
    appear (inner join; the clean majority never leaves the map side)."""
    from simtradedata_spark.functions.partitioning import spread

    corpus = spread(corpus)  # shingle explode is the hot map
    corp_tok = corpus.select(id_col, tokens(text_col).alias("_tok"))
    corp = corp_tok.select(id_col, shingles_of(F.col("_tok"), n).alias("_g"))
    posts = corp.select(
        id_col, F.size("_g").alias("_sz"), F.explode("_g").alias("gram")
    )
    bench_tok = benchmark.select(tokens(text_col).alias("_tok"))
    bench = (
        bench_tok.select(F.explode(shingles_of(F.col("_tok"), n)).alias("gram"))
        .distinct()
    )
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    return (
        posts.join(bench, "gram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.min("_sz").alias("n_grams"),
        )
        .withColumn(
            "hit_ratio", F.round(F.col("n_hits") / F.col("n_grams"), 6)
        )
    )


def remove_contaminated(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_hits: int = 1,
) -> DataFrame:
    """The filtering form: corpus minus documents with ≥ ``min_hits``
    overlapping n-grams (left_anti on the hit list)."""
    hits = ngram_overlap(corpus, benchmark, text_col, id_col, n).filter(
        F.col("n_hits") >= min_hits
    )
    return corpus.join(hits.select(id_col), id_col, "left_anti")


def char_ngram_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 50,
    hash_fn: str = "xxhash64",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Exact-substring decontamination: flag corpus documents sharing at
    least one length-``n`` CHARACTER window with any benchmark document —
    the stricter check published pipelines (Dolma-style) run after
    word-gram overlap, immune to tokenization differences.

    Every window is HASHED at the generator (``_hash64``) so the exploded
    relation carries 8-byte longs, never the substrings themselves — a
    50 k-char document explodes to 50 k longs, not 2.5 MB of strings. Same
    inverted-index shape as ``ngram_overlap``: benchmark window-hash set
    broadcast (distinct, eval-set-sized), corpus exploded once, one
    shuffle on the doc id. md5 backend for oracle parity.

    Both inputs are ``spread`` first: the per-character window hashing is
    the hot map, and a single-row-group corpus file would otherwise run it
    in one task (measured 3.4 s → sub-second at sf0.1, 32 cores)."""
    from simtradedata_spark.functions.partitioning import spread
    from simtradedata_spark.operators.dedup import _hash64

    corpus = spread(corpus)
    benchmark = spread(benchmark)

    def windows(col):
        return F.expr(
            f"transform(sequence(1, greatest(length({col}) - {n} + 1, 1)),"
            f" i -> substring({col}, i, {n}))"
        )

    posts = corpus.select(
        id_col,
        F.explode(
            F.array_distinct(
                F.transform(windows(text_col), lambda s: _hash64(s, hash_fn))
            )
        ).alias("wh"),
    )
    bench = (
        benchmark.select(
            F.explode(
                F.transform(windows(text_col), lambda s: _hash64(s, hash_fn))
            ).alias("wh")
        )
        .distinct()
    )
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    return (
        posts.join(bench, "wh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_windows_hit"))
    )
