"""Entity-resolution fuzzy join — approximate string matching at scale
(beyond-reference; the record-linkage step a data integration pipeline
runs between dirty registries).

The quadratic compare-everything join is the naive plan; this module uses
the standard two-phase shape:

  1. BLOCK: candidate pairs from a q-gram inverted-index posting join
     (the same skeleton as token_jaccard_pairs — explode distinct q-grams,
     equi-join on the gram, no |L|×|R| surface) plus a length prefilter
     (edit distance ≤ d ⇒ length difference ≤ d).
  2. VERIFY: exact Levenshtein (JVM built-in, whole-stage codegen) on the
     candidates only.

Losslessness: a pair within edit distance d must share at least one
q-gram whenever min_len − q + 1 > q·d (each edit destroys at most q
grams). Pairs where EITHER side is too short for that bound are routed through
a symmetric length-proximity block instead (one side explodes its
length ±d — a bounded 2d+1 expansion), so no pair is missed at any
length combination. The oracle for the certifying query is the QUADRATIC
ground truth, which is exactly the losslessness claim under test.

Selectivity (measured — tools/fuzzy_selectivity.py, SCALE.md): blocking
discriminates by gram RARITY, so the corpus vocabulary decides the
asymptotics. On a realistic registry profile (22-char names, 64-char
alphabet → 64³-gram space; the certified `fuzzy_match_realistic`
fixture) candidate growth is EXACTLY LINEAR: 3,044 → 31,506 candidates
across a 100× cross-size growth (10× rows/side), scan fraction 0.61% →
0.063%, a constant ~6 candidates per true pair. The synthetic documents
table (~60 words, 375 distinct 3-grams) is the saturated-vocabulary
worst case — postings hundreds long, candidates near-quadratic
(scan fraction ~30%) — where the banded threshold-Levenshtein verify
keeps cost linear-per-candidate; no gram blocker is sub-quadratic once
every gram's posting is O(corpus), and real registries are not shaped
like that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from simtradedata_spark.functions.caching import scratch_persist


def qgrams(col: Column | str, q: int = 3) -> Column:
    """Distinct character q-grams of a string as array<string> (empty for
    strings shorter than q)."""
    c = F.col(col) if isinstance(col, str) else col
    # guard: sequence(1, 0) would generate DESCENDING [1, 0] for too-short
    # strings, not an empty list
    return F.when(
        F.length(c) >= q,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(c) - q + 1),
                lambda i: c.substr(i, F.lit(q)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def fuzzy_candidates(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_col: str,
    right_id: str,
    right_col: str,
    max_dist: int = 2,
    q: int = 3,
    _freq_out: list | None = None,
) -> DataFrame:
    """BLOCK phase only: the candidate pairs (``__lid, __ls, __rid, __rs``,
    with per-shared-prefix-gram duplicates) that ``fuzzy_join`` verifies.
    Public so the blocking SELECTIVITY is measurable — candidate count vs
    true pair count is the number that decides whether the join is
    sub-quadratic on a given vocabulary (see tools/fuzzy_selectivity.py
    and SCALE.md). The vocabulary-sized gram-frequency table is persisted
    as SCRATCH (released between queries by functions/caching.py::
    release_scratch, like the minhash signatures); ``_freq_out`` lets a
    measurement tool take ownership and unpersist it early."""
    min_safe_len = q * (max_dist + 1) + q - 1  # min_len − q + 1 > q·d

    l = left.select(
        F.col(left_id).alias("__lid"),
        F.col(left_col).alias("__ls"),
        F.length(left_col).alias("__ll"),
    )
    r = right.select(
        F.col(right_id).alias("__rid"),
        F.col(right_col).alias("__rs"),
        F.length(right_col).alias("__rl"),
    )

    # long stratum: PREFIX-FILTERED q-gram posting join (Ed-Join / AllPairs
    # principle). Joining on ALL grams is lossless but floods the posting
    # lists of frequent grams ("the", "e s", …) and goes quadratic inside
    # them; instead each string contributes only its q·max_dist+1 rarest
    # grams under ONE global frequency order. Losslessness: ed ≤ d destroys
    # ≤ q·d grams, so overlap(G_a, G_b) ≥ max(|G_a|,|G_b|) − q·d, and two
    # sets meeting that overlap must intersect within their
    # (|G| − overlap + 1 = q·d + 1)-length prefixes of a shared canonical
    # order. Strings below min_safe_len have |G| ≤ q·d (no guarantee) and
    # take the short stratum below.
    prefix_k = q * max_dist + 1
    lg = l.filter(F.col("__ll") >= min_safe_len).select(
        "__lid", "__ls", "__ll", F.explode(qgrams(F.col("__ls"), q)).alias("__g")
    )
    rg = r.filter(F.col("__rl") >= min_safe_len).select(
        "__rid", "__rs", "__rl", F.explode(qgrams(F.col("__rs"), q)).alias("__g")
    )
    # one global gram order: document frequency over BOTH sides (the gram
    # dictionary is vocabulary-sized — broadcast back)
    # persisted: consumed by BOTH prefix joins — without it the full
    # explode+union+groupBy lineage runs twice (vocabulary-sized to hold)
    freq = scratch_persist(
        lg.select("__g")
        .unionByName(rg.select("__g"))
        .groupBy("__g")
        .agg(F.count(F.lit(1)).alias("__df"))
    )
    from pyspark.sql.window import Window as _W

    def _prefix(side, id_col, str_col):
        # partition by (id, string): a duplicated id must not mix two
        # strings' grams into one ranking and push rare grams past the
        # prefix
        w = _W.partitionBy(id_col, str_col).orderBy("__df", "__g")
        return (
            side.join(F.broadcast(freq), "__g")
            .withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= prefix_k)
            .drop("__df", "__rk")
        )

    # verify BEFORE deduplicating: a candidate appears once per shared
    # prefix gram (≤ prefix_k² dups), and re-running the cheap codegen'd
    # levenshtein on duplicates costs far less than shuffling the full
    # candidate set (with both strings) through a distinct — survivors are
    # answer-sized, so the final distinct is trivial.
    cand_long = (
        _prefix(lg, "__lid", "__ls")
        .join(_prefix(rg, "__rid", "__rs"), "__g")
        .filter(F.abs(F.col("__ll") - F.col("__rl")) <= max_dist)
        .select("__lid", "__ls", "__rid", "__rs")
    )

    # short stratum: length-proximity block covering every pair where
    # EITHER side is below min_safe_len (the gram stratum requires BOTH
    # sides long — a long-left/short-right pair is in neither without the
    # mirror). Each block explodes ONE side's length ±d (bounded 2d+1) and
    # equi-joins the other side's short stratum on exact length; the
    # both-short overlap is deduplicated by the final distinct.
    ls_all = l.select(
        "__lid",
        "__ls",
        F.explode(
            F.sequence(F.col("__ll") - max_dist, F.col("__ll") + max_dist)
        ).alias("__rl"),
    )
    cand_right_short = ls_all.join(
        r.filter(F.col("__rl") < min_safe_len), "__rl"
    ).select("__lid", "__ls", "__rid", "__rs")
    rs_all = r.select(
        "__rid",
        "__rs",
        F.explode(
            F.sequence(F.col("__rl") - max_dist, F.col("__rl") + max_dist)
        ).alias("__ll"),
    )
    cand_left_short = rs_all.join(
        l.filter(F.col("__ll") < min_safe_len), "__ll"
    ).select("__lid", "__ls", "__rid", "__rs")
    cand_short = cand_right_short.unionByName(cand_left_short)

    cands = cand_long.unionByName(cand_short)
    if _freq_out is not None:
        _freq_out.append(freq)
    return cands


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_col: str,
    right_id: str,
    right_col: str,
    max_dist: int = 2,
    q: int = 3,
) -> DataFrame:
    """All (left, right) pairs with ``levenshtein ≤ max_dist``, without the
    quadratic join. Returns (left_id, right_id, dist). See module doc for
    the blocking scheme and the losslessness argument."""
    cands = fuzzy_candidates(
        left, right, left_id, left_col, right_id, right_col, max_dist, q
    )
    # 3-arg levenshtein = banded O(d·n) DP with early exit (returns -1 past
    # the threshold) — ~5x cheaper than the full O(n²) matrix at d=2, and
    # the verify dominates when blocking selectivity is poor (tiny gram
    # vocabularies — see module note).
    # The result stays LAZY (a checkpoint here would execute the join at
    # plan-build time — blinding plan_lint and every EXPLAIN consumer, and
    # truncating lineage so an executor loss becomes unrecoverable). The
    # persisted gram-frequency table is SCRATCH under the session cache
    # policy (functions/caching.py): vocabulary-sized, lazily re-cached if
    # freed, released between queries by release_scratch — the same
    # lifecycle as minhash_lsh_candidates' persisted signatures.
    return (
        cands.withColumn(
            "dist", F.levenshtein("__ls", "__rs", max_dist)
        )
        .filter(F.col("dist") >= 0)
        .select(
            F.col("__lid").alias(left_id),
            F.col("__rid").alias(right_id),
            "dist",
        )
        .distinct()
    )
