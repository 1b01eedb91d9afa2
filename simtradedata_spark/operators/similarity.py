"""Similarity search over embedding columns (LLM-pipeline extension,
BASELINE.json north star).

  - cosine_top_k: brute-force cosine top-k. The query set is broadcast
    (it is small by construction); the corpus is never shuffled — each corpus
    partition scores its rows against every query locally, and the global
    top-k per query is a TakeOrdered-style aggregation. Dot products use
    built-in higher-order functions (zip_with + aggregate) in double
    precision — JVM-side, no Python.
  - lsh_bucket_top_k: random-hyperplane LSH variant — corpus and queries are
    bucketed by sign-pattern prefix; only same-bucket candidates are scored.
    Trades recall for a ~2^bits reduction in scored pairs; the scale path when
    the corpus no longer fits a per-partition scan per query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_top_k(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """For each query vector, the k nearest corpus vectors by cosine.

    Returns (query_id, neighbor_id, rank) — rank 1 = nearest; the query row
    itself (same id) is excluded. Ties broken by neighbor id (deterministic).
    """
    qid = query_id_col or id_col
    q = queries.select(
        F.col(qid).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
    )
    scored = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("__qvec"), F.col("__cvec")).alias("__sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _hyperplanes(dim: int, bits: int, seed: int = 11) -> list[list[float]]:
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]


def lsh_bucket_key(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id from fixed random hyperplanes (deterministic)."""
    bits = []
    for i, p in enumerate(planes):
        proj = _dot(vec, F.array(*[F.lit(x) for x in p]))
        bits.append(
            F.when(proj >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def lsh_bucket_top_k(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.
    Same output shape as cosine_top_k; recall < 1 by design."""
    planes = _hyperplanes(dim, bits, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        lsh_bucket_key(F.col(vec_col), planes).alias("__bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        lsh_bucket_key(F.col(vec_col), planes).alias("__bucket"),
    )
    scored = c.join(F.broadcast(q), ["__bucket"]).filter(
        F.col("neighbor_id") != F.col("query_id")
    ).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("__qvec"), F.col("__cvec")).alias("__sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
