"""Training-pipeline operators: decontamination, deterministic sampling."""

from pyspark.sql import functions as F

from simtradedata_spark.operators.decontam import ngram_overlap, remove_contaminated
from simtradedata_spark.operators.sampling import hash_bucket, hash_sample


def _docs(spark):
    rows = [
        # benchmark doc
        (0, "the quick brown fox jumps over the lazy dog tonight", "bench"),
        # contaminated: contains the 5-gram "quick brown fox jumps over"
        (1, "intro words then the quick brown fox jumps over fences", "train"),
        # clean: shares words but no 5-gram
        (2, "quick dog and brown fox never jump over anything lazy", "train"),
        # exact copy of the benchmark text
        (3, "the quick brown fox jumps over the lazy dog tonight", "train"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, split string")


def test_ngram_overlap_flags_planted_contamination(spark):
    docs = _docs(spark)
    bench = docs.filter(F.col("split") == "bench")
    corpus = docs.filter(F.col("split") == "train")
    hits = {r["doc_id"]: r for r in ngram_overlap(corpus, bench, n=5).collect()}
    assert set(hits) == {1, 3}
    assert hits[3]["hit_ratio"] == 1.0  # exact copy: every gram overlaps
    assert 0 < hits[1]["hit_ratio"] < 1.0
    clean = remove_contaminated(corpus, bench, n=5)
    assert {r["doc_id"] for r in clean.collect()} == {2}


def test_ngram_overlap_short_doc_fallback(spark):
    """Docs shorter than n tokens fall back to token overlap (shingles_of
    contract) — they must not vanish from the check."""
    bench = spark.createDataFrame([(0, "zebra", "b")], "doc_id long, text string, s string")
    corpus = spark.createDataFrame(
        [(1, "a zebra", "t"), (2, "plain words", "t")],
        "doc_id long, text string, s string",
    )
    hits = {r["doc_id"] for r in ngram_overlap(corpus, bench, n=5).collect()}
    assert hits == {1}


def test_hash_sample_deterministic_monotone_and_unbiased(spark):
    df = spark.range(10_000).withColumnRenamed("id", "k")
    s10a = {r["k"] for r in hash_sample(df, ["k"], 10).collect()}
    s10b = {r["k"] for r in hash_sample(df, ["k"], 10).collect()}
    s25 = {r["k"] for r in hash_sample(df, ["k"], 25).collect()}
    assert s10a == s10b                      # deterministic
    assert s10a <= s25                       # monotone in rate
    assert 800 <= len(s10a) <= 1200          # ~10% of 10k
    # salt decorrelates: a different salt picks a materially different set
    salted = {r["k"] for r in hash_sample(df, ["k"], 10, salt="v2").collect()}
    assert len(s10a & salted) < len(s10a) / 2


def test_hash_bucket_range_and_partition_invariance(spark):
    df = spark.range(1000).withColumnRenamed("id", "k")
    b = df.select(hash_bucket(["k"], buckets=7).alias("b"))
    vals = {r["b"] for r in b.collect()}
    assert vals <= set(range(7))
    one = {
        r["k"]: r["b"]
        for r in df.repartition(1).select("k", hash_bucket(["k"]).alias("b")).collect()
    }
    many = {
        r["k"]: r["b"]
        for r in df.repartition(16).select("k", hash_bucket(["k"]).alias("b")).collect()
    }
    assert one == many
