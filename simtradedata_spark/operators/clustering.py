"""Distributed k-means (Lloyd's) and SemDeDup-style semantic dedup.

The clustering primitives an embedding-curation pipeline runs between
featurization and dedup/selection:

  - ``kmeans``: full Lloyd iteration as DataFrame ops. Unlike the bounded
    driver-side k-means that trains the IVF coarse quantizer on a SAMPLE
    (operators/similarity.py::_train_centroids), this one assigns and
    re-estimates over the ENTIRE corpus, distributed: the k×d centroid
    table is bounded driver state, so per round the assignment is a
    scan-local argmin EXPRESSION over centroid literals (no join, no
    corpus shuffle, nothing to checkpoint) and the only exchange is the
    (cluster, dim) mean update with map-side partial sums. The plan stays
    O(k·d) across iterations because each round's centroids are collected
    (k rows) rather than chained.

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
from simtradedata_spark.functions.lits import fast_lit


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
    The corpus is scanned once per round and NEVER shuffled or joined for
    assignment: the k×d centroid table is bounded driver state (the same
    class as similarity._train_centroids' sample-trained quantizer), so
    each round's argmin is a scan-local literal expression — k distance
    structs, ``array_min`` picks (dist, cluster) — and the ONLY exchange
    per round is the map-side-combined (cluster, dim) mean update. The
    r9 shape (broadcast centroid join + corpus-wide groupBy(id) argmin,
    eagerly checkpointed per round) paid one full corpus shuffle per
    iteration plus a recompute in every downstream consumer; the literal
    form's FP arithmetic and (dist, cluster) struct-min tie-break are
    identical, so assignments are unchanged. The O(k·d) expression tree
    is the small-k regime this operator serves (blocking cells, label
    spines); corpus-scale cell counts train driver-side on a sample
    (similarity._train_centroids) instead.
    """
    auto = iters == "auto"
    if not auto and (not isinstance(iters, int) or iters < 1):
        # the loop's only non-auto exit is `it == iters`; anything else
        # (0, negatives, a typo'd string) would spin Spark jobs forever
        raise ValueError(f"iters must be a positive int or 'auto', got {iters!r}")
    if k > 256:
        # soft cap on the scan-local literal path (r10 ADVICE): the
        # assignment is an O(k·d) expression evaluated per row — fine for
        # the documented small-k regime (blocking cells, label spines),
        # but a large k silently trades the old broadcast-join shape for
        # a huge expression/codegen blowup. Warn rather than fail:
        # results stay correct, just slow.
        import warnings

        warnings.warn(
            f"kmeans(k={k}): the scan-local argmin builds an O(k*d)"
            " literal expression per round — beyond a few hundred"
            " centroids, expression/codegen size dominates; train on a"
            " sample (similarity._train_centroids) or reduce k.",
            stacklevel=2,
        )
    corpus = df.select(
        F.col(id_col),
        F.transform(vec_col, lambda x: x.cast("double")).alias("__v"),
    )
    id_type = df.schema[id_col].dataType
    # seeds: the k smallest-id vectors, labels = seed id (bounded collect,
    # k rows — the _train_centroids discipline)
    cent: list[tuple] = [
        (r["cluster"], list(r["__c"]))
        for r in corpus.orderBy(id_col)
        .limit(k)
        .select(F.col(id_col).alias("cluster"), F.col("__v").alias("__c"))
        .collect()
    ]

    def assigned_under(cents: list[tuple]) -> DataFrame:
        if not cents:
            return corpus.select(
                F.col(id_col),
                F.lit(None).cast(id_type).alias("cluster"),
                F.lit(None).cast("double").alias("dist"),
                "__v",
            ).where(F.lit(False))
        # ONE-call nested-array literal for the centroid table
        # (functions/lits.py — F.lit(list) expands per element over py4j,
        # ~k·d round trips PER ROUND here; see the pq.py note). The argmin
        # lambda is written once and indexes into it. Labels keep F.lit:
        # they are k scalars of caller-typed ids.
        cvecs = fast_lit([[float(x) for x in cvec] for _, cvec in cents])
        labels = F.lit([cl for cl, _ in cents])
        pick = F.array_min(
            F.transform(
                F.sequence(F.lit(0), F.lit(len(cents) - 1)),
                lambda i: F.struct(
                    F.round(
                        F.sqrt(
                            _sq_dist(F.col("__v"), F.element_at(cvecs, i + 1))
                        ),
                        dp,
                    ).alias("__d"),
                    F.element_at(labels, i + 1).cast(id_type).alias("cluster"),
                ),
            )
        )
        return corpus.select(
            F.col(id_col),
            pick["cluster"].alias("cluster"),
            pick["__d"].alias("dist"),
            "__v",
        )

    it = 0
    while True:
        it += 1
        assigned = assigned_under(cent)
        if (not auto and it == iters) or (auto and it >= max_iters):
            break
        means = {
            r["cluster"]: list(r["__new"])
            for r in (
                assigned.select(
                    "cluster", F.posexplode("__v").alias("__dim", "__x")
                )
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
                .collect()
            )
        }
        # a cell that loses all members keeps its previous centroid
        cent_next = [(cl, means.get(cl, cvec)) for cl, cvec in cent]
        if auto and cent_next == cent:
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
    nrm = lambda c: F.sqrt(
        F.aggregate(
            F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )
    # Per-vector L2 norm computed ONCE here (and persisted with the frame):
    # the within-cell pair filter needs ||a||·||b|| for every candidate
    # pair, and an inline nrm() in the pair expression re-folds the d-term
    # sum per PAIR per side — O(sum n_c²·d) redundant arithmetic that this
    # column makes O(N·d). Same expression on the same doubles, so the
    # rounded cosine is bit-identical.
    vecs = (
        df.select(
            F.col(id_col),
            F.transform(vec_col, lambda x: x.cast("double")).alias("__v"),
        )
        .join(assign.select(id_col, "cluster"), id_col)
        .withColumn("__n", nrm(F.col("__v")))
    )
    # SCRATCH persist (released between queries by release_scratch,
    # the minhash-signature lifecycle): both sides of the within-cell
    # self-join consume this frame — without it the whole Lloyd
    # iteration runs twice inside the pairs job.
    #
    # spread() first: the scan-local kmeans assignment removed every
    # exchange upstream of this frame, so unspread it inherits the
    # PARQUET SPLIT COUNT (2 partitions on the 10x replica — one file),
    # and because the pair join below broadcast-builds its right side,
    # no exchange ever re-spreads it: the quadratic in-cell pair scan
    # ran as 2 tasks on 32 cores (measured at 10x: 294 s median vs 66 s
    # before the kmeans change; the r9 cosine_near_dups file-split bug
    # in its join form). One tiny round-robin exchange of the N slim
    # rows buys full-parallelism pair scans; the pair set and cosines
    # are partition-invariant.
    from simtradedata_spark.functions.partitioning import spread

    vecs = scratch_persist(spread(vecs))
    # The self-join key has only k distinct values, so unsalted it caps the
    # quadratic pair stage at k tasks no matter the cluster size (guide
    # §2.5: synthetic keys need many more distinct values than partitions).
    # Salt the probe side by a deterministic hash of its id and explode the
    # build side across the salt domain: every (a, b) same-cell pair still
    # meets exactly once — at b's salt — while the pair work spreads over
    # k·n_salt tasks. n_salt derives from the session's parallelism (pure
    # distribution knob: the pair SET is salt-invariant).
    n_salt = max(1, df.sparkSession.sparkContext.defaultParallelism // k)
    a = vecs.select(
        F.col("cluster"),
        F.col(id_col).alias("id_a"),
        F.col("__v").alias("__va"),
        F.col("__n").alias("__na"),
        F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))).alias("__salt"),
    )
    b = vecs.select(
        F.col("cluster"),
        F.col(id_col).alias("id_b"),
        F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salt)).alias("__salt"),
    )
    dot = F.aggregate(
        F.zip_with("__va", "__vb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    cos = F.round(dot / (F.col("__na") * F.col("__nb")), dp)
    pairs = (
        a.join(b, ["cluster", "__salt"])
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
