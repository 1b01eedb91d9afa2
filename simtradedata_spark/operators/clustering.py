"""Distributed k-means (Lloyd's) and SemDeDup-style semantic dedup.

The clustering primitives an embedding-curation pipeline runs between
featurization and dedup/selection:

  - ``kmeans``: full Lloyd iteration as DataFrame ops. Unlike the bounded
    driver-side k-means that trains the IVF coarse quantizer on a SAMPLE
    (operators/similarity.py::_train_centroids), this one assigns and
    re-estimates over the ENTIRE corpus, distributed: per round, one
    broadcast of the k×d centroid table (tiny by construction) against the
    never-shuffled corpus for assignment, then one (cluster, dim) shuffle
    with map-side partial sums for the mean update. Lineage is truncated
    with an eager localCheckpoint on the k-row centroid frame each round,
    so the plan stays O(1) across iterations — the same discipline as
    operators/graph.py::connected_components.

  - ``semantic_dedup``: SemDeDup (Abbas et al., 2023, arXiv:2303.09540) —
    k-means cells as the blocking structure for embedding-cosine near-dup
    detection: pairs are scored only WITHIN a cell, so the candidate count
    is sum(n_c^2) ~ N^2/k instead of N^2; choosing k ∝ N bounds the
    expected cell size and keeps the stage linear in the corpus. The
    epsilon-similar groups are transitively closed with the same
    min-label-propagation components used for MinHash clusters, and the
    keep policy (min id per group is canonical) matches dedup_clusters.

Determinism (the property every retention decision here inherits):
seeding picks the k vectors with the smallest ids (TakeOrdered — no
window, no single partition) and labels each cell by its seed's id;
distances and means are rounded at ``dp`` decimals before any argmin or
reuse, so assignment is partitioning-, retry-, and engine-invariant —
the DuckDB oracle (queries.py::_sql_kmeans_ctes) replays the identical
rounded iteration and must match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simtradedata_spark.functions.caching import scratch_persist


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def kmeans(
    df: DataFrame,
    k: int = 8,
    iters: int | str = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dp: int = 6,
    max_iters: int = 25,
) -> DataFrame:
    """Lloyd's k-means over an embedding column, deterministic end-to-end.

    Init: centroids are the vectors of the ``k`` smallest ids; each cell is
    labeled by its seed's id (stable labels, no rank window). Each round
    assigns every vector to the nearest centroid (Euclidean, rounded to
    ``dp`` decimals, ties to the smallest cell label) and re-estimates
    centroids as the per-dimension mean (rounded to ``dp``); a cell that
    loses all members keeps its previous centroid.

    ``iters``: a fixed round count (the oracle-replayable form the
    registered query uses), or ``"auto"`` — iterate until the ROUNDED
    centroid table reaches a fixed point (then the returned assignment is
    Lloyd-stable: one more round would change nothing), capped at
    ``max_iters``. Convergence is detected on the k-row centroid frame
    (one bounded count per round, the connected_components discipline),
    never by comparing corpus-sized assignments.

    Returns the LAST round's assignment: (id_col, cluster, dist) where
    ``dist`` is the rounded Euclidean distance to the assigned centroid.
    The corpus is scanned once per round and never shuffled for
    assignment; only the (cluster, dim) mean update exchanges, with
    map-side combine — the 100 TB-safe Lloyd shape.
    """
    auto = iters == "auto"
    if not auto and (not isinstance(iters, int) or iters < 1):
        # the loop's only non-auto exit is `it == iters`; anything else
        # (0, negatives, a typo'd string) would spin Spark jobs forever
        raise ValueError(f"iters must be a positive int or 'auto', got {iters!r}")
    corpus = df.select(
        F.col(id_col),
        F.transform(vec_col, lambda x: x.cast("double")).alias("__v"),
    )
    cent = (
        corpus.orderBy(id_col)
        .limit(k)
        .select(F.col(id_col).alias("cluster"), F.col("__v").alias("__c"))
        .localCheckpoint(eager=True)
    )
    it = 0
    while True:
        it += 1
        d = F.round(F.sqrt(_sq_dist(F.col("__v"), F.col("__c"))), dp)
        assigned = (
            corpus.join(F.broadcast(cent))
            .select(id_col, "__v", "cluster", d.alias("__d"))
            .groupBy(id_col)
            .agg(
                F.min(F.struct("__d", "cluster")).alias("__m"),
                F.first("__v").alias("__v"),
            )
            .select(
                id_col,
                F.col("__m.cluster").alias("cluster"),
                F.col("__m.__d").alias("dist"),
                "__v",
            )
        )
        if (not auto and it == iters) or (auto and it >= max_iters):
            break
        means = (
            assigned.select("cluster", F.posexplode("__v").alias("__dim", "__x"))
            .groupBy("cluster", "__dim")
            .agg(F.round(F.avg("__x"), dp).alias("__mu"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__dim", "__mu"))
                    ),
                    lambda s: s["__mu"],
                ).alias("__new")
            )
        )
        cent_next = (
            cent.join(means, "cluster", "left")
            .select(
                "cluster", F.coalesce("__new", "__c").alias("__c")
            )
            .localCheckpoint(eager=True)
        )
        if auto:
            changed = (
                cent.join(
                    cent_next.withColumnRenamed("__c", "__c2"), "cluster"
                )
                .filter(F.col("__c") != F.col("__c2"))
                .count()
            )
            if changed == 0:
                # centroids are a fixed point: `assigned` (computed under
                # them) is the stable assignment — one more round would
                # reproduce it exactly
                break
        cent = cent_next
    return assigned.select(id_col, "cluster", "dist")


def semantic_dedup(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dp: int = 6,
) -> DataFrame:
    """SemDeDup: embedding-cosine near-dup retention with k-means cells as
    the candidate blocker (see module docstring for the paper and the
    linearity argument).

    Pipeline: ``kmeans`` assignment → within-cell pairs with rounded
    cosine ≥ ``threshold`` → transitive closure (min-label components) →
    (id_col, group_id, is_canonical). Only vectors in at least one
    ε-similar pair appear; everything else is trivially canonical. A
    keep-canonical filter implements the paper's dedup; joining quality
    scores instead reproduces the cluster_representatives policy.
    """
    from simtradedata_spark.operators.graph import dedup_clusters

    assign = kmeans(df, k=k, iters=iters, id_col=id_col, vec_col=vec_col, dp=dp)
    vecs = (
        df.select(
            F.col(id_col),
            F.transform(vec_col, lambda x: x.cast("double")).alias("__v"),
        )
        .join(assign.select(id_col, "cluster"), id_col)
    )
    # SCRATCH persist (released between queries by release_scratch,
    # the minhash-signature lifecycle): both sides of the within-cell
    # self-join consume this frame — without it the whole Lloyd
    # iteration runs twice inside the pairs job.
    vecs = scratch_persist(vecs)
    a = vecs.select(
        F.col("cluster"),
        F.col(id_col).alias("id_a"),
        F.col("__v").alias("__va"),
    )
    b = vecs.select(
        F.col("cluster"),
        F.col(id_col).alias("id_b"),
        F.col("__v").alias("__vb"),
    )
    dot = F.aggregate(
        F.zip_with("__va", "__vb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    nrm = lambda c: F.sqrt(
        F.aggregate(
            F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )
    cos = F.round(dot / (nrm(F.col("__va")) * nrm(F.col("__vb"))), dp)
    pairs = (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )
    out = dedup_clusters(pairs)
    return out.select(
        F.col("doc_id").alias(id_col),
        F.col("cluster_id").alias("group_id"),
        "is_canonical",
    )


def semantic_dedup_gemm(
    df: DataFrame,
    n_cells: int | str = "auto",
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
) -> DataFrame:
    """The PRODUCTION form of SemDeDup — what the paper actually runs at
    scale: the coarse quantizer trains driver-side on a bounded sample
    (similarity._train_centroids, the IVF discipline — quantizers never
    train on the corpus), the full corpus is cell-assigned by ONE
    Arrow-batched numpy GEMM per batch (no shuffle), and each cell's
    pairs are scored by one blocked GEMM inside applyInPandas
    (dedup.grouped_cosine_pairs — the quadratic candidate set never
    exists as Spark rows). Groups close transitively via min-label
    components, min id canonical — same output contract as
    semantic_dedup.

    ``n_cells`` ∝ N keeps the expected cell size (and so per-cell pair
    work) bounded — "auto" targets ~64 rows/cell; assignment cost is
    N·k·d FLOPs but inside BLAS, which is the constant FAISS pays too.
    Unlike the oracle-exact `semantic_dedup` (whose tiny fixed k keeps
    the DuckDB CTE replay tractable but makes within-cell pairs ~N²/k),
    this form is the one to run on a 100 TB corpus; its recall relative
    to exact all-pairs depends on near-dups sharing a cell — by
    construction near-identical vectors quantize together unless they
    straddle a cell boundary (the paper accepts this; multi-probe is the
    refinement if measured recall matters).
    """
    from simtradedata_spark.operators.dedup import grouped_cosine_pairs
    from simtradedata_spark.operators.graph import dedup_clusters
    from simtradedata_spark.operators.similarity import (
        _cell_udf,
        _train_centroids,
    )

    if n_cells == "auto":
        n_cells = max(8, df.count() // 64)
    cent = _train_centroids(df, vec_col, n_cells, seed, max_iter=5)
    bucketed = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).withColumn("__bucket", _cell_udf(df, cent)(F.col("v")))
    pairs = grouped_cosine_pairs(
        bucketed, threshold, df.schema[id_col].dataType.simpleString()
    )
    out = dedup_clusters(pairs)
    return out.select(
        F.col("doc_id").alias(id_col),
        F.col("cluster_id").alias("group_id"),
        "is_canonical",
    )
