"""BPE merge learning (operators/bpe.py) vs an independent pure-python
reference (the textbook Sennrich merge loop over a dict vocabulary). The
DuckDB oracle (query bpe_merges) certifies the full sequence cross-engine;
these tests pin the semantics on hand data and the determinism contract.
"""

from __future__ import annotations

from collections import Counter

from simtradedata_spark.operators.bpe import (
    END_OF_WORD,
    apply_merge,
    bpe_learn,
    segment_word,
)


def _py_bpe(texts, num_merges):
    vocab = Counter()
    for t in texts:
        for w in t.lower().split():
            if w:
                vocab[tuple(list(w) + [END_OF_WORD])] += 1
    merges = []
    for rank in range(1, num_merges + 1):
        pairs = Counter()
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        # max count, ties to the lexicographically smallest (left, right)
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, cnt))
        new = Counter()
        for sym, c in vocab.items():
            out = []
            for t in sym:
                if out and out[-1] == l and t == r:
                    out[-1] = l + r
                else:
                    out.append(t)
            new[tuple(out)] += c
        vocab = new
    return merges


TEXTS = [
    "low lower lowest low low",
    "new newer newest new newly",
    "wide wider widest new low",
    "slow slower slowest slowly slow",
]


def _df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_bpe_learn_matches_python_reference(spark):
    merges, _ = bpe_learn(_df(spark), num_merges=10)
    assert merges == _py_bpe(TEXTS, 10)


def test_bpe_learn_partitioning_invariant(spark):
    a, _ = bpe_learn(_df(spark), num_merges=5)
    b, _ = bpe_learn(_df(spark).repartition(7), num_merges=5)
    assert a == b


def test_apply_merge_left_to_right_nonoverlapping(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["x", "a", "a", "a", "a"],)],
        "sym array<string>",
    )
    got = [
        r["m"]
        for r in df.select(apply_merge(F.col("sym"), "a", "a").alias("m")).collect()
    ]
    assert got == [["aa", "a"], ["x", "aa", "aa"]]


def test_segment_word_follows_learned_merges(spark):
    merges, vocab = bpe_learn(_df(spark), num_merges=10)
    # the distributed fold and the driver-side reference segmentation
    # must agree on every vocab word
    for row in vocab.collect():
        assert segment_word(row["__w"], merges) == row["__sym"]


def test_bpe_stops_when_pairs_exhausted(spark):
    df = spark.createDataFrame([(0, "ab ab")], "doc_id long, text string")
    # "ab</w>" has 2 pairs; after both merge into one symbol there is
    # nothing left — the learner must stop early, not loop or crash
    merges, _ = bpe_learn(df, num_merges=10)
    assert len(merges) == 2
    assert merges[0][1:3] in {("a", "b"), ("b", END_OF_WORD)}


def test_bpe_apply_matches_reference_segmentation(spark):
    from simtradedata_spark.operators.bpe import bpe_apply

    df = _df(spark)
    merges, vocab = bpe_learn(df, num_merges=6)
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_apply(df, vocab).collect()
    }
    for i, t in enumerate(TEXTS):
        words = [w for w in t.lower().split() if w]
        want = sum(len(segment_word(w, merges)) for w in words)
        assert got[i] == (len(words), want)


def test_bpe_apply_oov_falls_back_to_chars(spark):
    from simtradedata_spark.operators.bpe import bpe_apply

    train = _df(spark)
    _, vocab = bpe_learn(train, num_merges=6)
    new = spark.createDataFrame(
        [(99, "zzqq low")], "doc_id long, text string"
    )
    row = bpe_apply(new, vocab).collect()[0]
    # "zzqq" never trained: chars + </w> = 5 symbols; "low" uses its
    # trained segmentation
    low_len = len(segment_word("low", bpe_learn(train, num_merges=6)[0]))
    assert row["n_words"] == 2 and row["n_bpe_tokens"] == 5 + low_len


def test_token_counts_oracle_survives_merge_exhaustion(spark):
    """The SQL_BPE_TOKEN_COUNTS final-vocab chain must keep the vocabulary
    when merges exhaust before num_merges: an empty m{i} joined with a
    LEFT JOIN leaves sym unchanged (the engine's early-break behavior);
    the old CROSS JOIN emptied v{i}..v8 and the oracle returned 0 rows."""
    import duckdb

    from simtradedata_spark.operators.bpe import bpe_apply
    from simtradedata_spark.queries import SQL_BPE_TOKEN_COUNTS

    docs = spark.createDataFrame(
        [(1, "ab ab"), (2, "ab")], "doc_id long, text string"
    )
    _merges, vocab = bpe_learn(docs, num_merges=8)  # exhausts after 2
    got = sorted(map(tuple, bpe_apply(docs, vocab).collect()))

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "(VALUES (1, 'ab ab'), (2, 'ab')) t(doc_id, text)"
    )
    want = sorted(con.execute(SQL_BPE_TOKEN_COUNTS).fetchall())
    assert got == want and len(want) == 2
