"""Cross-document exact-substring deduplication (the ExactSubstr family).

Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better") showed web corpora carry long byte-identical spans repeated
ACROSS documents — licence boilerplate, quoted passages, templated
headers — that whole-document exact dedup and MinHash near-dup both
miss. Their single-machine tool builds a suffix array; the distributed
re-expression used here is the standard n-gram-anchor approximation:
a duplicated span of length ≥ n tokens contains only duplicated
length-n token windows, so the union of positions covered by token
n-grams occurring in ≥ 2 distinct documents is exactly the set of
positions inside cross-document duplicated spans of length ≥ n
(mirroring the suffix-array minimum-match-length cutoff — spans
shorter than n are below threshold by construction).

Relationship to the neighbouring families in this package:

- ``textstats.dup_gram_coverage`` — WITHIN-document repetition (Gopher).
- ``dedup.*`` — whole-document exact / near duplicates.
- this module — cross-document duplicated SPANS, and their removal.

Plan shape (both operators): tokenize once per row (let-bound), emit
(start, gram) occurrences, then two gram-keyed shuffles — the
distinct-doc count and the occurrence join — followed by ONE doc-keyed
aggregation that collects each document's duplicated-gram START
positions into a sorted array. Everything positional after that is
closed-form array math on that per-doc array (interval-union length,
gap slicing — see ``_union_len``): n-gram intervals all have width
``n``, so the union of [s, s+n-1] over sorted starts needs no
position-level explode, no position distinct, and no token-level
re-join. (The pre-r10 shape exploded every covered POSITION — an
``n``-fold row amplification — distinct-ed it corpus-wide, and for
strip posexploded every token back against an anti-join; at the
5M-doc/1000x point those position-grain shuffles were the chain's
peak-memory stage. The array form moves one row per doc.)
Gram keys are near-unique (no skew); at 100 TB the gram
string is hashed to 64 bits before the exchange (``hash_grams=True``,
the ``@xxh64`` production variant) so the shuffle carries 8-byte keys
instead of full n-gram text; the oracled form keeps the raw string so
DuckDB can replay it exactly.

Matching is case-sensitive by default: exact-substring dedup is
byte-exact in the reference formulation, and ``strip_cross_doc_spans``
re-emits the surviving tokens, which must preserve the original case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from simtradedata_spark.functions.caching import scratch_persist

from simtradedata_spark.operators.dedup import _hash64, let, tokens


def _occurrences(
    df: DataFrame,
    key_col: str,
    text_col: str,
    n: int,
    lowercase: bool,
    with_tokens: bool,
    hash_grams: bool = False,
) -> DataFrame:
    """(key, __s struct) where __s carries n_tokens, the (s, gram)
    occurrence list (1-based starts), and optionally the token array for
    text reconstruction. Tokenization happens ONCE per row: the token
    array is let-bound so the per-start slice lambdas reference a bound
    variable Catalyst cannot inline back into a per-element regex split.

    ``hash_grams`` hashes each gram to 64 bits INSIDE the struct (the
    same xxhash64 value formerly applied post-explode — hashing
    commutes with the explode): an n=8 word gram is ~50 bytes of string,
    so the persisted frame and every gram-keyed shuffle downstream shrink
    ~4-6x — at the 5M-doc (1000x) point that is the difference between
    the strip stage fitting its scratch disk or not. The md5/oracle path
    (hash_grams=False) keeps gram strings, bit-identical to before."""

    def occ_struct(t: Column) -> Column:
        idx = F.when(
            F.size(t) >= n, F.sequence(F.lit(1), F.size(t) - (n - 1))
        ).otherwise(F.array().cast("array<int>"))

        def gram_of(i: Column) -> Column:
            g = F.concat_ws(" ", F.slice(t, i, n))
            return _hash64(g) if hash_grams else g

        fields = [
            F.size(t).alias("n_tokens"),
            F.transform(
                idx,
                lambda i: F.struct(i.alias("s"), gram_of(i).alias("gram")),
            ).alias("occ"),
        ]
        if with_tokens:
            fields.append(t.alias("toks"))
        return F.struct(*fields)

    # SCRATCH persist (released between queries by release_scratch, the
    # minhash-signature lifecycle): this frame feeds the per-doc lengths,
    # BOTH sides of the dup-gram self-aggregation, and (for strip) the
    # posexplode rebuild — without it the tokenize+slice+concat gram
    # construction, the dominant CPU cost, runs 3-4x per query (measured
    # 38 s for exact_substr_trim at sf1.0 pre-persist). SERIALIZED level
    # (MEMORY_AND_DISK, not _DESER): the struct carries every gram (or
    # gram hash) plus the token array per doc — deserialized it is ~4-6x
    # the zstd-serialized bytes, enough to OOM a 16 GiB heap at the
    # 5M-doc point while the consuming stages execute.
    from pyspark import StorageLevel

    return scratch_persist(df.select(
        key_col, let(tokens(text_col, lowercase=lowercase), occ_struct).alias("__s")
    ), StorageLevel.MEMORY_AND_DISK)


def _union_len(ss: Column, n: int) -> Column:
    """Total length of ⋃ᵢ [sᵢ, sᵢ+n-1] for a SORTED array of starts ``ss``
    — every interval has the same width ``n``, so the union length is
    closed-form over consecutive gaps: n (the last interval) plus
    Σ min(sᵢ₊₁ − sᵢ, n) over adjacent pairs (a pair overlapping or
    touching contributes only its fresh prefix). 0 for empty/null."""
    pair_sum = F.aggregate(
        F.zip_with(
            F.slice(ss, 2, F.greatest(F.size(ss) - 1, F.lit(0))),
            F.slice(ss, 1, F.greatest(F.size(ss) - 1, F.lit(0))),
            lambda nxt, prv: F.least(nxt - prv, F.lit(n)),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return F.when(F.size(ss) > 0, pair_sum + n).otherwise(F.lit(0))


def _dup_starts(
    occ: DataFrame, dup: DataFrame, key_col: str, exclude_owner: bool = False
) -> DataFrame:
    """(key, ss) — each document's duplicated-gram start positions as a
    SORTED array: the single doc-keyed aggregation the positional math
    runs on. (key, s) is unique in ``occ`` (the start determines the
    gram), so collect_list would suffice; collect_set also absorbs any
    hash_grams collision duplicates. Cardinality is one row per doc with
    ≥ 1 duplicated gram, array length ≤ n_tokens − n + 1.
    ``exclude_owner`` drops occurrences in the gram's owner document
    (strip semantics: the owner keeps its copy)."""
    j = occ.join(dup, "gram")
    if exclude_owner:
        j = j.filter(F.col(key_col) != F.col("owner"))
    return j.groupBy(key_col).agg(F.array_sort(F.collect_set("s")).alias("ss"))


def cross_doc_dup_coverage(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    lowercase: bool = False,
    hash_grams: bool = False,
) -> DataFrame:
    """Per-document fraction of token positions inside a cross-document
    duplicated span: position p in doc D is covered when some n-gram
    occurrence spanning p also occurs in ANOTHER document. Symmetric —
    every document sharing the span is covered, including the one an
    eventual strip pass would keep — so it is the diagnostic/filter
    signal (drop or down-weight docs above a coverage threshold), while
    ``strip_cross_doc_spans`` is the surgical variant.

    Returns (key, n_tokens, cross_dup_tokens, cross_dup_frac); interval
    UNION semantics, so overlapping duplicated grams count each position
    once and the fraction is capped at 1.0.

    PRECONDITION: ``key_col`` must be unique per input row. The per-row
    ``array_distinct`` that replaced the corpus-wide (key, gram) distinct
    counts a gram once per ROW — with duplicate keys, a gram spanning two
    rows of the same key would inflate ``n_docs`` (and flip owner
    selection in ``strip_cross_doc_spans``), where the old distinct-based
    shape was robust. Both certified callers feed keyed frames (the doc
    table's primary key; the funnel's exact-dedup survivors).

    Caching: the staged gram frame is ``persist()``-ed for the duration of
    the query (it feeds multiple downstream branches). Library callers in
    a long-lived session should call ``functions.caching.release_scratch``
    after consuming the result, or the cached partitions accumulate."""
    toked = _occurrences(
        df, key_col, text_col, n, lowercase, with_tokens=False,
        hash_grams=hash_grams,
    )
    per_doc = toked.select(key_col, F.col("__s.n_tokens").alias("n_tokens"))
    occ = toked.select(key_col, F.explode("__s.occ").alias("o")).select(
        key_col, F.col("o.s").alias("s"), F.col("o.gram").alias("gram")
    )
    # distinct-docs-per-gram WITHOUT the corpus-wide (key, gram) distinct
    # exchange: a doc's duplicate grams are deduplicated locally with
    # array_distinct inside the row, so the exploded pairs are already
    # unique and ONE gram-keyed shuffle counts documents (two shuffles
    # before — the distinct moved the full occurrence set a second time).
    dup = (
        toked.select(
            key_col, F.explode(F.array_distinct("__s.occ.gram")).alias("gram")
        )
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select("gram")
    )
    covered = _dup_starts(occ, dup, key_col).select(
        key_col, _union_len(F.col("ss"), n).alias("cross_dup_tokens")
    )
    return per_doc.join(covered, key_col, "left").select(
        key_col,
        "n_tokens",
        F.coalesce("cross_dup_tokens", F.lit(0)).cast("long").alias(
            "cross_dup_tokens"
        ),
        F.when(
            F.col("n_tokens") > 0,
            F.coalesce("cross_dup_tokens", F.lit(0)) / F.col("n_tokens"),
        )
        .otherwise(F.lit(0.0))
        .alias("cross_dup_frac"),
    )


def strip_cross_doc_spans(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    lowercase: bool = False,
    hash_grams: bool = False,
) -> DataFrame:
    """ExactSubstr REMOVAL: excise every cross-document duplicated span,
    keeping the copy in the gram's OWNER document (the minimum key among
    documents containing it — deterministic, engine-invariant). A pair of
    byte-identical documents therefore collapses to one surviving text and
    one empty one, exactly the degenerate case where ExactSubstr meets
    whole-document dedup; within-owner repeats are untouched (that is
    within-doc repetition — ``textstats.dup_gram_coverage``'s job).

    Returns (key, n_tokens, kept_tokens, removed_tokens, text_clean).
    ``text_clean`` is the ordered concatenation of surviving tokens —
    whitespace-NORMALIZED relative to the input (original token order and
    case preserved, runs of whitespace collapsed to one space), the same
    contract as the reference tool, which re-emits the byte ranges it
    keeps. Caching: the staged gram frame is ``persist()``-ed for the
    query's duration; long-lived sessions should
    ``functions.caching.release_scratch`` after consuming the result.
    Reconstruction is gap slicing over each doc's sorted removed-start
    array (see the plan-shape note in the module docstring) — token
    order is the array order, no window, no collect_list rebuild.

    PRECONDITION: ``key_col`` unique per input row — same contract (and
    same reason) as ``cross_doc_dup_coverage``."""
    toked = _occurrences(
        df, key_col, text_col, n, lowercase, with_tokens=True,
        hash_grams=hash_grams,
    )
    occ = toked.select(key_col, F.explode("__s.occ").alias("o")).select(
        key_col, F.col("o.s").alias("s"), F.col("o.gram").alias("gram")
    )
    # per-doc array_distinct replaces the corpus-wide (key, gram) distinct
    # exchange — see cross_doc_dup_coverage; min(key) owner and the
    # distinct-doc count are unchanged because the pairs are already
    # unique per document.
    dup = (
        toked.select(
            key_col, F.explode(F.array_distinct("__s.occ.gram")).alias("gram")
        )
        .groupBy("gram")
        .agg(F.min(key_col).alias("owner"), F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select("gram", "owner")
    )
    removed = _dup_starts(occ, dup, key_col, exclude_owner=True)

    # Rebuild by GAP SLICING, one row per doc: the removed region is the
    # union of fixed-width intervals [sᵢ, sᵢ+n-1] over the sorted starts
    # ``ss``, so the kept tokens are exactly the head before s₁, the
    # between-interval gaps where sᵢ₊₁ − sᵢ > n, and the tail after
    # s_last+n-1 — each a single ``slice`` of the let-bound token array.
    # No token explode, no position anti-join, no collect_list rebuild:
    # the corpus moves through the join as one array row per doc.
    toks = F.col("__s.toks")
    nt = F.col("__s.n_tokens")
    ss = F.col("ss")
    k1 = F.greatest(F.size(ss) - 1, F.lit(0))  # adjacent-pair count
    gaps = F.filter(
        F.zip_with(
            F.slice(ss, 2, k1),
            F.slice(ss, 1, k1),
            lambda nxt, prv: F.struct(
                (prv + n).alias("a"), (nxt - prv - n).alias("l")
            ),
        ),
        lambda g: g["l"] > 0,
    )
    last = F.element_at(ss, -1)
    kept_arr = F.when(ss.isNull(), toks).otherwise(
        F.concat(
            F.slice(toks, 1, F.element_at(ss, 1) - 1),
            F.flatten(F.transform(gaps, lambda g: F.slice(toks, g["a"], g["l"]))),
            F.slice(toks, last + n, F.greatest(nt - (last + n) + 1, F.lit(0))),
        )
    )
    return (
        toked.join(removed, key_col, "left")
        .select(key_col, nt.alias("n_tokens"), kept_arr.alias("__kept"))
        .select(
            key_col,
            "n_tokens",
            F.size("__kept").cast("long").alias("kept_tokens"),
            (F.col("n_tokens") - F.size("__kept")).cast("long").alias(
                "removed_tokens"
            ),
            F.concat_ws(" ", "__kept").alias("text_clean"),
        )
    )
