"""Product quantization (Jégou, Douze & Schmid 2011, "Product
Quantization for Nearest Neighbor Search"): split each d-dim vector into
``m`` subvectors, vector-quantize each subspace against its own
``k``-centroid codebook, and store m small codes instead of d floats —
64-dim float64 (512 B) → int8 (64 B, similarity.quantize_int8) → PQ m=8
codes (8 B). Queries are answered with Asymmetric Distance Computation
(ADC): the query stays EXACT, and each corpus vector's distance is the
sum of m query-to-centroid sub-distances read off its codes, so search
cost is O(m) lookups per corpus row over data that fits ~64× more per
executor. This is the compression rung production ANN systems (IVF-PQ)
pair with the coarse quantizer in similarity.build_ivf_index.

Scale shape: training is driver-side Lloyd per subspace on a bounded
sample (PQ codebooks, like IVF quantizers, always train on a sample —
same contract as similarity._train_centroids); encode is a narrow
column-expression pass (no shuffle, no UDF — the m×k distance evaluations
are unrolled into codegen'd array expressions); ADC search broadcasts the
query set and ranks with one window, the cosine_top_k plan shape on
8-byte rows instead of 512-byte vectors.

Metric: squared L2, PQ's native metric. On unit-normalized inputs L2
ranking equals cosine ranking (||a-b||² = 2-2cosθ), which is how the
recall gate in tests/test_pq.py compares against brute-force cosine.

Sub-distance folds are written index-ascending and left-associative in
BOTH engines, so the certified query's scores match DuckDB bit-for-bit
(no tolerance needed even at equal-score rank ties).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from simtradedata_spark.functions.lits import fast_lit


def pq_train(
    corpus: DataFrame,
    vec_col: str,
    m: int = 8,
    k: int = 16,
    seed: int = 7,
    max_iter: int = 8,
    train_cap: int = 4096,
) -> list[list[list[float]]]:
    """Per-subspace Lloyd's on a bounded deterministic sample; returns
    codebooks[m][k][d/m] (plain floats — broadcastable as plan literals).

    The sample is the ``train_cap`` vectors with the smallest xxhash64 —
    a TakeOrderedAndProject (distributed top-k, no full sort), and unlike
    a bare ``limit`` it does not depend on the physical partition layout,
    so a fixed ``seed`` reproduces the same codebooks across repartitions
    (r5 advisory)."""
    import numpy as np

    mat = np.stack(
        corpus.select(vec_col)
        .orderBy(F.xxhash64(vec_col))
        .limit(train_cap)
        .toPandas()[vec_col]
        .to_numpy()
    ).astype(np.float64)
    d = mat.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    rng = np.random.default_rng(seed)
    books = []
    for j in range(m):
        s = mat[:, j * sub : (j + 1) * sub]
        k_eff = min(k, len(s))
        cent = s[rng.choice(len(s), size=k_eff, replace=False)]
        for _ in range(max_iter):
            assign = np.argmin(
                -2.0 * (s @ cent.T) + (cent * cent).sum(axis=1), axis=1
            )
            for c in range(k_eff):
                members = s[assign == c]
                cent[c] = members.mean(axis=0) if len(members) else s[
                    rng.integers(len(s))
                ]
        books.append([[float(x) for x in row] for row in cent])
    return books


def pq_encode(
    df: DataFrame,
    vec_col: str,
    codebooks: list[list[list[float]]],
    out_col: str = "codes",
) -> DataFrame:
    """Append ``out_col``: array<int> of m codes, code j = argmin over the
    subspace-j codebook of squared L2 (ties → lowest code, via array_min
    on (dist, code) structs). Narrow column expressions, no shuffle — and
    deliberately HIGHER-ORDER, not unrolled: the codebook is an
    array-of-structs literal walked by one transform/zip_with/aggregate
    lambda, so the generated code is a short loop instead of m×k×(d/m)
    inlined terms (the unrolled form compiled ~10 s of Janino per plan —
    measured on the 64-dim/m=8/k=16 shape — for identical runtime after
    compile). Fold order is index-ascending with a 0.0 seed; 0.0+x is
    bit-exact x for the non-negative squared terms, so the DuckDB
    oracle's seedless left fold matches exactly."""
    m = len(codebooks)
    k = len(codebooks[0])
    sub = len(codebooks[0][0])
    v = F.col(vec_col)
    # ONE py4j call for all m codebooks (functions/lits.py): F.lit of a
    # nested list ALSO expands to m·k·(d/m) lit nodes py4j-call-by-call
    # (r10 ADVICE correction — it is not one literal node until constant
    # folding), which measured ~1 s of driver time per build on this
    # shape; the SQL-literal form parses JVM-side in ~1 ms and folds to
    # the identical single Literal.
    cb_lit = fast_lit(
        [[[float(x) for x in row] for row in cbj] for cbj in codebooks]
    )
    codes = []
    for j in range(m):
        cb_j = F.element_at(cb_lit, j + 1)
        subv = F.slice(v, j * sub + 1, sub)

        def dist(cent: Column, subv: Column = subv) -> Column:
            return F.aggregate(
                F.zip_with(
                    subv, cent, lambda a, b: (a.cast("double") - b) ** 2
                ),
                F.lit(0.0),
                lambda acc, t: acc + t,
            )

        def make_cand(cb_j: Column, dist):
            # factory closure: the lambda handed to F.transform must take
            # exactly ONE parameter (a second would be read as the index)
            def cand(c: Column) -> Column:
                return F.struct(
                    dist(F.element_at(cb_j, c + 1)).alias("d"), c.alias("c")
                )

            return cand

        cands = F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)), make_cand(cb_j, dist)
        )
        codes.append(F.array_min(cands)["c"])
    return df.withColumn(out_col, F.array(*codes))


def _adc_lut(
    qvec_col: str,
    codebooks: list[list[list[float]]],
) -> Column:
    """Per-QUERY ADC lookup table: array<array<double>> where
    ``lut[j][code] = ||q_subj − codebook_j[code]||²``. Computed once per
    query row on the (bounded, broadcast) query side, so the per-candidate
    distance collapses to m table lookups — the classic PQ ADC shape —
    instead of re-folding m·(d/m) squared-difference terms per
    (query, candidate) pair through interpreted lambda evaluation.

    Each entry is the SAME expression the per-pair fold used (aggregate
    over zip_with, (a−b)**2 terms, 0.0 seed — bit-exact x for the
    non-negative squares), so every looked-up value is bit-identical to
    the inline form and the DuckDB oracle's left-associative chain."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    cb_lit = fast_lit(
        [[[float(x) for x in row] for row in cbj] for cbj in codebooks]
    )

    # one-parameter lambda per subspace: a default-arg j on the lambda
    # itself would change its arity and make transform() pass the array
    # index as the second argument
    def _sub_dist(j: int):
        return lambda cent: F.aggregate(
            F.zip_with(
                F.slice(qvec_col, j * sub + 1, sub),
                cent,
                lambda a, b: (a - b) ** 2,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return F.array(
        *(
            F.transform(F.element_at(cb_lit, j + 1), _sub_dist(j))
            for j in range(m)
        )
    )


def _adc_dist_lut(codes_col: str, lut_col: str, m: int) -> Column:
    """Σ_j ``lut[j][code_j]`` — index-ascending, left-associative, the
    exact float-add order of the fold it replaces (and of the DuckDB
    oracle)."""
    dist = None
    for j in range(m):
        t = F.element_at(
            F.element_at(lut_col, j + 1), F.element_at(codes_col, j + 1) + 1
        )
        dist = t if dist is None else dist + t
    return dist


def pq_adc_top_k(
    codes_df: DataFrame,
    id_col: str,
    queries: DataFrame,
    qid_col: str,
    qvec_col: str,
    codebooks: list[list[list[float]]],
    k: int = 5,
    codes_col: str = "codes",
) -> DataFrame:
    """ADC top-k: for each (broadcast) query, approximate squared-L2 to
    every corpus row as Σ_j ||q_subj − codebook_j[code_j]||², rank
    ascending (ties → lowest neighbor id). Returns (query_id, neighbor_id,
    rank, adc_dist2). The corpus side carries only (id, m codes); the
    decode is an element_at chain into the broadcast codebook literals —
    no vectors move, no UDF runs."""
    c = codes_df.select(
        F.col(id_col).alias("neighbor_id"), F.col(codes_col).alias("__codes")
    )
    # the LUT is projected BEFORE the broadcast exchange, so it is
    # materialized once per query row, not re-derived per candidate
    q = queries.select(
        F.col(qid_col).alias("query_id"),
        _adc_lut(qvec_col, codebooks).alias("__lut"),
    )
    scored = c.join(
        F.broadcast(q), F.col("neighbor_id") != F.col("query_id")
    ).select(
        "query_id",
        "neighbor_id",
        _adc_dist_lut("__codes", "__lut", len(codebooks)).alias("adc_dist2"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist2").asc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "adc_dist2")
    )


def pq_shortlist_rerank(
    codes_df: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    queries: DataFrame,
    qid_col: str,
    qvec_col: str,
    codebooks: list[list[list[float]]],
    k: int = 10,
    shortlist: int = 100,
) -> DataFrame:
    """The production PQ serving pattern: ADC over the 8-byte codes
    produces a ``shortlist`` of candidates per query, then ONLY those rows'
    full vectors are fetched and re-ranked exactly (cosine). Quantization
    error costs shortlist membership, not final ordering — measured on the
    worst-case isotropic-Gaussian corpus, direct ADC top-10 recall 0.27
    becomes 0.86 through a 100-candidate re-rank (tests/test_pq.py pins
    the floor). The exact pass touches shortlist×|queries| vectors instead
    of the corpus."""
    from simtradedata_spark.operators.similarity import cosine

    cand = pq_adc_top_k(
        codes_df, id_col, queries, qid_col, qvec_col, codebooks, k=shortlist
    ).select("query_id", "neighbor_id")
    withv = cand.join(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__nvec")
        ),
        "neighbor_id",
    )
    q = queries.select(
        F.col(qid_col).alias("query_id"), F.col(qvec_col).alias("__qvec")
    )
    scored = withv.join(F.broadcast(q), "query_id").select(
        "query_id",
        "neighbor_id",
        cosine(F.col("__qvec"), F.col("__nvec")).alias("__sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ivfpq_top_k(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int | str = "auto",
    n_probe: int = 4,
    m: int = 8,
    codebook_k: int = 16,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
    max_iter: int = 5,
) -> DataFrame:
    """The full FAISS-style IVF-PQ serving stack, composed from this
    package's tested pieces: the coarse quantizer
    (similarity._train_centroids + Arrow-GEMM cell assignment) restricts
    the scan to the queries' ``n_probe`` nearest cells; PQ codes answer
    ADC *within* the probed cells; an exact cosine re-rank over the
    per-query ``shortlist`` repairs quantization error. Cost per query:
    ~(n_probe/n_lists) of the corpus touched as 8-byte codes, plus
    ``shortlist`` full vectors — the 100 TB serving shape where neither
    the vectors nor the scan fit a per-query budget on their own.

    With ``n_probe == n_lists`` and ``shortlist >= |corpus|`` this is
    EXACTLY brute-force cosine top-k (tested): both approximations are
    pure candidate pruning, never scoring error.

    Output: (query_id, neighbor_id, rank) — the cosine_top_k shape."""
    from simtradedata_spark.operators.similarity import (
        _auto_train_cap,
        _cell_udf,
        _probes_frame,
        _resolve_n_lists,
        _train_centroids,
        cosine,
    )

    n_lists = _resolve_n_lists(corpus, n_lists)
    cent = _train_centroids(
        corpus, vec_col, n_lists, seed, max_iter,
        train_cap=_auto_train_cap(n_lists),
    )
    _cell = _cell_udf(corpus, cent)
    books = pq_train(corpus, vec_col, m=m, k=codebook_k, seed=seed)
    c = pq_encode(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("__cvec"),
            _cell(F.col(vec_col)).alias("__cell"),
        ),
        "__cvec",
        books,
        out_col="__codes",
    ).select("neighbor_id", "__cell", "__codes")
    probes = _probes_frame(
        queries, id_col, vec_col, cent, n_probe, "__cell"
    ).withColumn("__lut", _adc_lut("__qvec", books))
    cand = (
        c.join(F.broadcast(probes), ["__cell"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            _adc_dist_lut("__codes", "__lut", m).alias("__adc"),
        )
    )
    w_short = Window.partitionBy("query_id").orderBy(
        F.col("__adc").asc(), F.col("neighbor_id")
    )
    short = (
        cand.withColumn("__r", F.row_number().over(w_short))
        .filter(F.col("__r") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    withv = short.join(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__nvec")
        ),
        "neighbor_id",
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    scored = withv.join(F.broadcast(q), "query_id").select(
        "query_id",
        "neighbor_id",
        cosine(F.col("__qvec"), F.col("__nvec")).alias("__sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def pq_codebooks_from_rows(
    corpus: DataFrame, id_col: str, vec_col: str, m: int, k: int
) -> list[list[list[float]]]:
    """Init-only codebooks: subspace j's codebook is the j-th subvectors of
    the k lowest-id rows — a deterministic, SQL-replayable rule. The
    certified query (queries.py::pq_ann_top5) uses THIS so the DuckDB
    oracle can rebuild the identical codebooks from the table alone;
    Lloyd-trained codebooks (pq_train) change quality, not algebra, and
    are gated by the recall test instead."""
    rows = (
        corpus.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    d = len(rows[0][vec_col])
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    return [
        [
            [float(x) for x in r[vec_col][j * sub : (j + 1) * sub]]
            for r in rows
        ]
        for j in range(m)
    ]
