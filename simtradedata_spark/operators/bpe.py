"""BPE tokenizer-vocabulary learning over a distributed corpus.

The tokenizer-training stage of an LLM data pipeline (Sennrich et al.
2016; the GPT-2 byte-level variant shares the same merge loop): learn the
first N byte-pair merges from corpus statistics.

Structure (what makes this feasible at 100 TB): the corpus is reduced
ONCE to the (word, count) vocabulary — the only corpus-sized shuffle.
Every merge iteration then operates on the VOCAB relation (distinct
words; millions of rows where the corpus is billions): adjacent-pair
counts come from a scan-local zip-explode with map-side-combined sums,
and the argmax pair is a bounded 1-row TakeOrdered to the driver — the
merge decision is inherently global sequential state, exactly like the
IVF coarse-quantizer training sample (similarity.py). Applying a merge
rewrites the symbol arrays with a JVM higher-order fold (no Python, no
UDF), and the vocab is localCheckpoint'd per round so the plan stays
O(1) across merges.

Determinism: integer pair counts, ties broken by (count desc, left,
right) under binary string collation — partition-, retry- and
engine-invariant; the DuckDB oracle (queries.py::_sql_bpe_merges)
replays the identical merge sequence with list_reduce.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from simtradedata_spark.operators.dedup import tokens

END_OF_WORD = "</w>"


def apply_merge(sym: Column, left: str, right: str) -> Column:
    """Rewrite one symbol array with a learned merge: every adjacent
    (left, right) occurrence becomes the fused symbol, scanning left to
    right non-overlapping ("a a a" under (a,a) → ["aa","a"]) — the
    classic BPE application order, as a JVM aggregate fold."""
    merged = left + right

    def step(acc, t):
        # F.get is null-safe out of bounds (no ANSI error on empty acc)
        prev = F.coalesce(F.get(acc, F.size(acc) - 1), F.lit(""))
        return F.when(
            (prev == left) & (t == right),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(t)))

    return F.aggregate(sym, F.array().cast("array<string>"), step)


def word_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (word, count, symbol array) — chars plus the end-of-word
    marker. The single corpus-sized aggregation of the whole learner."""
    return (
        df.select(F.explode(tokens(text_col)).alias("__w"))
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__c"))
        .select(
            "__w",
            "__c",
            F.concat(
                F.split("__w", ""), F.array(F.lit(END_OF_WORD))
            ).alias("__sym"),
        )
    )


def pair_counts(vocab: DataFrame) -> DataFrame:
    """Word-frequency-weighted adjacent symbol-pair counts:
    (left, right, pair_count)."""
    la = F.slice("__sym", 1, F.size("__sym") - 1)
    ra = F.slice("__sym", 2, F.size("__sym") - 1)
    return (
        vocab.select("__c", la.alias("__la"), ra.alias("__ra"))
        .select("__c", F.explode(F.arrays_zip("__la", "__ra")).alias("__p"))
        .select(
            F.col("__p.__la").alias("left"),
            F.col("__p.__ra").alias("right"),
            F.col("__c"),
        )
        .groupBy("left", "right")
        .agg(F.sum("__c").alias("pair_count"))
    )


def bpe_learn(
    df: DataFrame, num_merges: int = 8, text_col: str = "text"
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn the first ``num_merges`` BPE merges from the corpus.

    Returns (merges, vocab): ``merges`` is [(rank, left, right,
    pair_count)] in learned order — the tokenizer's merge table;
    ``vocab`` is the final (word, count, symbols) frame, useful for
    inspecting the induced segmentation. Stops early if the corpus runs
    out of adjacent pairs.
    """
    # LAZY checkpoints: each round's argmax (.first() → TakeOrdered, which
    # computes EVERY partition, so the cache fills completely in that same
    # job) materializes the vocab as a side effect — an eager checkpoint
    # here was one extra full job per merge round for the same blocks.
    # Lineage is still truncated once materialized, so the plan stays O(1)
    # across merges.
    vocab = word_vocab(df, text_col).localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, num_merges + 1):
        top = (
            pair_counts(vocab)
            .orderBy(F.col("pair_count").desc(), "left", "right")
            .first()
        )
        if top is None:
            break
        merges.append((rank, top["left"], top["right"], top["pair_count"]))
        vocab = vocab.withColumn(
            "__sym", apply_merge(F.col("__sym"), top["left"], top["right"])
        ).localCheckpoint(eager=False)
    return merges, vocab


def segment_word(word: str, merges: list[tuple[int, str, str, int]]) -> list[str]:
    """Driver-side reference segmentation of one word under a learned
    merge table (test/debug aid — the distributed form is apply_merge)."""
    sym = list(word) + [END_OF_WORD]
    for _, left, right, _cnt in merges:
        out: list[str] = []
        for t in sym:
            if out and out[-1] == left and t == right:
                out[-1] = left + right
            else:
                out.append(t)
        sym = out
    return sym


def bpe_apply(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize a corpus under a LEARNED vocabulary: per doc, the word
    stream joined against the trained (word → symbols) table. This is the
    scalable application form — segmentation was already computed once
    per DISTINCT word during training, so applying the tokenizer is a
    broadcast (vocab-sized) hash join plus one doc-id shuffle, never a
    per-token fold over the corpus. Out-of-vocabulary words (absent from
    the training corpus) fall back to character symbols via apply-less
    char split + end-of-word marker, matching what zero learned merges
    would produce for them.

    Returns (id_col, n_words, n_bpe_tokens): the sequence-length
    accounting a packing/budgeting stage consumes.
    """
    w = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("__w"))
    seg = vocab.select("__w", F.size("__sym").alias("__len"))
    fallback = F.size(F.split("__w", "")) + 1
    return (
        w.join(F.broadcast(seg), "__w", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.coalesce("__len", fallback)).alias("n_bpe_tokens"),
        )
    )
