"""Cross-document exact-substring dedup (operators/substrings.py):
coverage semantics, owner-keeps removal, interval-union arithmetic,
edge cases, and partitioning invariance."""

from __future__ import annotations

import pytest

from simtradedata_spark.operators.substrings import (
    cross_doc_dup_coverage,
    strip_cross_doc_spans,
)

SHARED = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 tokens


@pytest.fixture(scope="module")
def corpus(spark):
    # doc 1: shared 8-token span + 4 unique tokens (12 total)
    # doc 2: 3 unique + the same shared span + 2 unique (13 total)
    # doc 3: fully unique (10 tokens)
    # doc 4: empty
    # doc 5: shorter than n (3 tokens), even though its text is a
    #        substring of the shared span it cannot form an 8-gram
    # doc 6/7: byte-identical pair (9 tokens)
    rows = [
        (1, f"{SHARED} unique1a unique1b unique1c unique1d"),
        (2, f"u2a u2b u2c {SHARED} u2d u2e"),
        (3, "n1 n2 n3 n4 n5 n6 n7 n8 n9 n10"),
        (4, ""),
        (5, "alpha bravo charlie"),
        (6, "same1 same2 same3 same4 same5 same6 same7 same8 same9"),
        (7, "same1 same2 same3 same4 same5 same6 same7 same8 same9"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_coverage_symmetric_and_exact(spark, corpus):
    got = {
        r["doc_id"]: r.asDict()
        for r in cross_doc_dup_coverage(corpus, n=8).collect()
    }
    # docs 1 and 2 each have the 8-token shared span covered — including
    # the would-be owner (coverage is the symmetric diagnostic signal)
    assert got[1]["n_tokens"] == 12 and got[1]["cross_dup_tokens"] == 8
    assert got[2]["n_tokens"] == 13 and got[2]["cross_dup_tokens"] == 8
    assert got[1]["cross_dup_frac"] == pytest.approx(8 / 12)
    # unique doc untouched; empty doc 0/0 -> 0.0; sub-n doc has no grams
    assert got[3]["cross_dup_tokens"] == 0
    assert got[4] == {
        "doc_id": 4,
        "n_tokens": 0,
        "cross_dup_tokens": 0,
        "cross_dup_frac": 0.0,
    }
    assert got[5]["cross_dup_tokens"] == 0
    # identical pair: both fully covered (9 tokens = two overlapping
    # 8-grams whose union is 9 positions, not 16 — interval union)
    assert got[6]["cross_dup_tokens"] == 9
    assert got[7]["cross_dup_frac"] == pytest.approx(1.0)


def test_strip_keeps_owner_copy(spark, corpus):
    got = {
        r["doc_id"]: r.asDict()
        for r in strip_cross_doc_spans(corpus, n=8).collect()
    }
    # doc 1 owns the shared span (min doc_id) — untouched
    assert got[1]["removed_tokens"] == 0
    assert got[1]["text_clean"] == f"{SHARED} unique1a unique1b unique1c unique1d"
    # doc 2 loses exactly the shared span, keeps its unique flanks in order
    assert got[2]["removed_tokens"] == 8
    assert got[2]["text_clean"] == "u2a u2b u2c u2d u2e"
    # identical pair: owner survives byte-for-byte, the other empties —
    # the degenerate case where ExactSubstr meets whole-document dedup
    assert got[6]["removed_tokens"] == 0
    assert got[7] == {
        "doc_id": 7,
        "n_tokens": 9,
        "kept_tokens": 0,
        "removed_tokens": 9,
        "text_clean": "",
    }
    # untouched docs re-emit their token stream verbatim
    assert got[3]["text_clean"] == "n1 n2 n3 n4 n5 n6 n7 n8 n9 n10"
    assert got[4]["text_clean"] == ""
    assert got[5]["text_clean"] == "alpha bravo charlie"


def test_interval_union_of_overlapping_grams(spark):
    # a 10-token shared run = three overlapping 8-grams; covered positions
    # are the union (10), never the sum (24)
    run = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"
    df = spark.createDataFrame(
        [(1, f"{run} tail1 tail2"), (2, f"head1 {run}")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r for r in cross_doc_dup_coverage(df, n=8).collect()
    }
    assert got[1]["cross_dup_tokens"] == 10
    assert got[2]["cross_dup_tokens"] == 10
    stripped = {
        r["doc_id"]: r for r in strip_cross_doc_spans(df, n=8).collect()
    }
    assert stripped[1]["removed_tokens"] == 0
    assert stripped[2]["text_clean"] == "head1"


def test_case_sensitive_by_default(spark):
    up = SHARED.upper()
    df = spark.createDataFrame(
        [(1, f"{SHARED} x1"), (2, f"{up} x2")], ["doc_id", "text"]
    )
    assert (
        cross_doc_dup_coverage(df, n=8)
        .agg({"cross_dup_tokens": "sum"})
        .first()[0]
        == 0
    )
    got = {
        r["doc_id"]: r
        for r in cross_doc_dup_coverage(df, n=8, lowercase=True).collect()
    }
    assert got[1]["cross_dup_tokens"] == 8 and got[2]["cross_dup_tokens"] == 8


def test_hashed_gram_variant_matches(spark, corpus):
    """@xxh64 production form (8-byte shuffle keys) computes the identical
    answer on a collision-free corpus."""
    base = sorted(
        map(tuple, cross_doc_dup_coverage(corpus, n=8).collect())
    )
    hashed = sorted(
        map(
            tuple,
            cross_doc_dup_coverage(corpus, n=8, hash_grams=True).collect(),
        )
    )
    assert base == hashed
    assert sorted(
        map(tuple, strip_cross_doc_spans(corpus, n=8).collect())
    ) == sorted(
        map(
            tuple,
            strip_cross_doc_spans(corpus, n=8, hash_grams=True).collect(),
        )
    )


def test_partitioning_invariance(spark, corpus):
    one = sorted(
        map(tuple, strip_cross_doc_spans(corpus.coalesce(1), n=8).collect())
    )
    many = sorted(
        map(
            tuple,
            strip_cross_doc_spans(corpus.repartition(7), n=8).collect(),
        )
    )
    assert one == many
