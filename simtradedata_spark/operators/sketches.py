"""Approximate sketch aggregations — the bounded-memory scale path for
cardinality and quantile questions where exact answers need a full shuffle
of the key space.

Spark's built-ins are already distributed mergeable sketches (map-side
partial sketch -> merge), so these operators are thin, *named* wrappers that
pin down the engine's accuracy contract and keep call sites declarative:

  - ``hll_distinct_by``: HyperLogLog++ (`approx_count_distinct`), relative
    error ``rsd`` (default 5%), O(1) memory per group vs O(distinct) for
    exact count-distinct.
  - ``approx_quantiles_by``: Greenwald-Khanna (`percentile_approx`),
    rank error ``1/accuracy`` — exact percentiles need a per-group sort.

Plus two sketches Spark has no user-facing built-in for, assembled from
declarative aggregation (and therefore still merge-distributed):

  - ``count_min_sketch`` / ``cms_estimate``: Count-Min frequency sketch —
    fixed depth×width counter table, upward-biased point estimates,
    counter-wise mergeable across corpora.
  - ``bloom_build`` / ``bloom_might_contain``: Bloom membership filter —
    fixed m-bit packed-word table, false-positives-only, OR-mergeable;
    the broadcast-able decontamination bitset.

All verified against exact answers within tolerance (tests); the CMS and
Bloom additionally have an md5 backend whose tables a DuckDB oracle
rebuilds byte-identically (queries.py::cms_token_frequency /
bloom_decontam).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from simtradedata_spark.operators.dedup import _hash64


def hll_distinct_by(
    df: DataFrame, keys: list[str], col: str, rsd: float = 0.05
) -> DataFrame:
    """(keys..., approx_distinct) per group via HLL++."""
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(col, rsd=rsd).alias("approx_distinct")
    )


def approx_quantiles_by(
    df: DataFrame,
    keys: list[str],
    col: str,
    probabilities: list[float],
    accuracy: int = 10000,
) -> DataFrame:
    """(keys..., quantiles array) per group via Greenwald-Khanna."""
    return df.groupBy(*keys).agg(
        F.percentile_approx(
            col, F.array(*[F.lit(p) for p in probabilities]), F.lit(accuracy)
        ).alias("quantiles")
    )


def count_min_sketch(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of a column's value
    frequencies: ``depth`` hash rows × ``width`` counters, returned as the
    sparse counter table (d, bucket, cnt) — absent (d, bucket) pairs are 0.

    The 100 TB shape: buckets are computed row-side (``depth`` hashes per
    row) and ONE groupBy(d, bucket) aggregates them, so every task's
    map-side partial state is bounded by depth×width counters no matter how
    many distinct values pass through — unlike an exact groupBy(value),
    whose hash-aggregate state grows with the live key space. The result is
    a fixed-size, MERGEABLE summary (sketches over two corpora add
    counter-wise), which is what you persist beside a 100 TB corpus to
    answer "roughly how often does token X appear" without rescanning.

    ``hash_fn='md5'`` uses the 60-bit md5-prefix hash (dedup._hash64) so a
    DuckDB oracle reproduces the identical table; xxhash64 is the
    JVM-native production path. Estimates are upward-biased only:
    est(v) = min_d counter[d][h_d(v)] ≥ true(v), within εN with probability
    1-δ for width=⌈e/ε⌉, depth=⌈ln 1/δ⌉.

    NULL values are dropped before hashing (``concat_ws`` would otherwise
    silently skip them and count the bare seed string into a real bucket,
    while the DuckDB md5 oracle propagates NULL and drops the row — the
    r5 advisory's cross-engine divergence)."""
    ids = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("d")
    return (
        df.select(F.col(col).cast("string").alias("__v"))
        .where(F.col("__v").isNotNull())
        .select("__v", ids)
        .select(
            "d",
            F.pmod(
                _hash64(
                    F.concat_ws("|", F.col("d").cast("string"), F.col("__v")),
                    hash_fn,
                ),
                F.lit(width),
            ).alias("bucket"),
        )
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    depth: int,
    width: int,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Point-query a Count-Min sketch: (col, cms_count) per distinct item,
    cms_count = min over the ``depth`` rows of the addressed counter.

    The sketch is ≤ depth×width rows by construction, so the probe join is
    BROADCAST — estimating any number of items never shuffles the corpus
    (the sketch was the only pass over it). Buckets an item never hashed
    into during build are absent from the sparse table → coalesce to 0,
    which keeps the estimator exact for never-seen items."""
    ids = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("d")
    probes = (
        items.select(F.col(col).cast("string").alias(col))
        .where(F.col(col).isNotNull())  # build drops NULLs; probe must too
        .distinct()
        .select(col, ids)
        .select(
            col,
            "d",
            F.pmod(
                _hash64(
                    F.concat_ws("|", F.col("d").cast("string"), F.col(col)),
                    hash_fn,
                ),
                F.lit(width),
            ).alias("bucket"),
        )
    )
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_count"))
    )


def bloom_sizing(n_items: int, bits_per_item: int = 16) -> int:
    """Production m_bits for an expected element count: 16 bits/element at
    k=4 gives FP ≈ (1-e^{-k/16})^k ≈ 0.24%, rounded up to a power of two
    (min 1024). The certified query pins m so DuckDB replays the identical
    bit pattern; production sizes m from a (bounded, one-job) distinct
    count — a fixed m saturates once n approaches m/k and the filter
    degrades toward all-positive (still correct, never false-negative,
    but the probe join stops pruning; measured in the sf1.0 bench before
    this helper existed)."""
    m = max(1024, n_items * bits_per_item)
    return 1 << (m - 1).bit_length()


def bloom_build(
    df: DataFrame,
    col: str,
    m_bits: int = 1 << 20,
    k: int = 5,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Bloom filter over a column's values: ``m_bits`` bit positions, ``k``
    hash functions, returned as the sparse packed-word table
    (word_idx, word) — absent words are 0.

    Words pack 63 bits (positions ``word_idx*63 .. word_idx*63+62``), NOT
    64: both engines' BIGINT ``1 << 63`` is the sign bit (DuckDB raises an
    overflow), and the word split is internal packing, not semantics. The
    build is one bounded groupBy — map-side ``bit_or`` partials never
    exceed ⌈m_bits/63⌉ words per task no matter how many values stream
    through, and two filters over different corpora merge by OR-ing words.

    This is the 100 TB decontamination shape: a benchmark's n-gram set as
    a ~KB-to-MB bitset BROADCAST to every executor, instead of a
    broadcast-joined gram dimension whose size tracks the benchmark.
    ``hash_fn='md5'`` makes the bit pattern DuckDB-reproducible
    (queries.py::bloom_decontam); xxhash64 is the production backend.
    False positives only (rate ≈ (1-e^{-kn/m})^k); never false negatives.
    NULL values are dropped before hashing (see count_min_sketch — same
    concat_ws NULL-skip divergence)."""
    seeds = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("seed")
    return (
        df.select(F.col(col).cast("string").alias("__v"))
        .where(F.col("__v").isNotNull())
        .select("__v", seeds)
        .select(
            F.pmod(
                _hash64(
                    F.concat_ws("|", F.col("seed").cast("string"), F.col("__v")),
                    hash_fn,
                ),
                F.lit(m_bits),
            ).alias("pos")
        )
        .select(
            F.floor(F.col("pos") / 63).cast("long").alias("word_idx"),
            F.pmod(F.col("pos"), F.lit(63)).cast("int").alias("bit"),
        )
        .selectExpr("word_idx", "shiftleft(CAST(1 AS BIGINT), bit) AS mask")
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_might_contain(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    m_bits: int,
    k: int,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Probe a Bloom filter: (col, might_contain) per distinct item —
    true iff ALL ``k`` addressed bits are set. The sketch is ≤ ⌈m_bits/63⌉
    rows, so the probe join is BROADCAST: membership testing any number of
    items costs one map-side pass, no corpus shuffle. Missing words
    coalesce to 0, keeping never-seen items exact (false)."""
    seeds = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("seed")
    probes = (
        items.select(F.col(col).cast("string").alias(col))
        .where(F.col(col).isNotNull())  # build drops NULLs; probe must too
        .distinct()
        .select(col, seeds)
        .select(
            col,
            F.pmod(
                _hash64(
                    F.concat_ws("|", F.col("seed").cast("string"), F.col(col)),
                    hash_fn,
                ),
                F.lit(m_bits),
            ).alias("pos"),
        )
        .select(
            col,
            F.floor(F.col("pos") / 63).cast("long").alias("word_idx"),
            F.pmod(F.col("pos"), F.lit(63)).cast("int").alias("bit"),
        )
    )
    return (
        probes.join(F.broadcast(sketch), ["word_idx"], "left")
        .selectExpr(
            col,
            "CAST(shiftright(coalesce(word, CAST(0 AS BIGINT)), bit) & 1"
            " AS INT) AS present",
        )
        .groupBy(col)
        .agg((F.min("present") == 1).alias("might_contain"))
    )


def bloom_pack(sketch: DataFrame, m_bits: int) -> bytes:
    """Collect the sparse (word_idx, word) Bloom table into the DENSE packed
    bitset: ⌈m_bits/63⌉ little-endian int64 words (absent words 0) as one
    ``bytes`` blob. Bounded by m_bits, not by corpus size — the driver-side
    materialization step for shipping a filter to every executor exactly
    once. At the auto-sized 1000x point (~2^31 bits) this is ~272 MB."""
    import numpy as np

    n_words = (m_bits + 62) // 63
    arr = np.zeros(n_words, dtype=np.int64)
    pdf = sketch.select("word_idx", "word").toPandas()
    if len(pdf):
        arr[pdf["word_idx"].to_numpy(dtype=np.int64)] = pdf[
            "word"
        ].to_numpy(dtype=np.int64)
    return arr.tobytes()


# Above this packed size the bitset ships via SparkFiles + read-only memmap
# (ONE page-cache copy per node, zero heap) instead of sc.broadcast (one
# deserialized copy per Python worker process).
BLOOM_FILES_THRESHOLD = 32 << 20

# (appId, sha256) -> shipped SparkFiles name. addFile'd bitsets live until
# sc.stop, so repeated calls with the SAME filter (bench repeats, chain
# re-runs in one session) must reuse one file instead of accumulating a
# corpus-bitset per call.
_SHIPPED_BITSETS: dict[tuple[str, str], str] = {}


def bloom_flag_col(
    sketch: DataFrame,
    df: DataFrame,
    col: str,
    m_bits: int,
    k: int,
    hash_fn: str = "xxhash64",
    out_col: str = "might_contain",
    resources: list | None = None,
) -> DataFrame:
    """Append ``out_col`` (the Bloom membership verdict for ``col``) to
    EVERY row of ``df`` — the zero-shuffle probe shape.

    ``bloom_might_contain`` probes a DISTINCT item set and callers join the
    verdict back; when the probe side is a per-occurrence fact (the
    curation chain's exploded (doc, gram) frame — hundreds of millions of
    rows at the 1000x point), that distinct + join-back is two
    corpus-sized string shuffles for near-zero dedup benefit. This probes
    IN PLACE: the ``k`` positions are hashed JVM-side (same seed strings /
    bit layout / NULL handling as ``bloom_might_contain`` — NULL items
    probe false, bit-identical verdicts), then ONE Arrow-batched pandas
    UDF tests all k bits against the packed bitset. Rows flow through with
    no shuffle, no distinct, no join-back, and the sketch ships exactly
    ONCE (the r9 shape built it as k broadcast-hash joins; Spark does NOT
    reuse the exchange across them — measured at 1000x as k separate
    ~0.7 GB HashedRelations per executor, the chain's 16 GiB OOM cause).

    Shipping: the dense bitset (``bloom_pack``, ⌈m_bits/63⌉ int64 words)
    goes out as ``sc.broadcast`` bytes when small, or via ``sc.addFile`` +
    read-only ``np.memmap`` above ``BLOOM_FILES_THRESHOLD`` — the memmap
    is served from the OS page cache, so every worker process on a node
    shares ONE resident copy and the JVM heap holds none of it. Arrow
    transfer is ~8·k bytes/row in, 1 bool/row back.

    ``resources``: optional list the shipped handle is appended to —
    ``Broadcast`` (call ``.destroy()`` when the result is materialized) or
    the bitset file path (cleaned up at ``sc.stop``)."""
    import os
    import tempfile
    import uuid

    from pyspark.sql.functions import pandas_udf

    spark = df.sparkSession
    sc = spark.sparkContext
    packed = bloom_pack(sketch, m_bits)

    if len(packed) >= BLOOM_FILES_THRESHOLD:
        import hashlib

        key = (sc.applicationId, hashlib.sha256(packed).hexdigest())
        if key in _SHIPPED_BITSETS:
            name = _SHIPPED_BITSETS[key]
        else:
            name = f"bloom_bits_{uuid.uuid4().hex}.bin"
            src = os.path.join(tempfile.gettempdir(), name)
            with open(src, "wb") as fh:
                fh.write(packed)
            sc.addFile(src)
            # The SOURCE must outlive the app: executors fetch lazily and
            # validate their copy against it (deleting it here broke the
            # first task fetch in local mode). Remove at interpreter exit.
            import atexit

            atexit.register(
                lambda p=src: os.path.exists(p) and os.remove(p)
            )
            _SHIPPED_BITSETS[key] = name

        @pandas_udf("boolean")
        def _probe(positions: pd.Series) -> pd.Series:
            import numpy as np
            from pyspark import SparkFiles

            if not len(positions):
                return pd.Series([], dtype=bool)
            words = np.memmap(
                SparkFiles.get(name), dtype=np.int64, mode="r"
            )
            mat = np.vstack(positions.to_numpy())
            hit = ((words[mat // 63] >> (mat % 63)) & 1).all(axis=1)
            return pd.Series(hit)

        if resources is not None:
            resources.append(name)
    else:
        bc = sc.broadcast(packed)

        @pandas_udf("boolean")
        def _probe(positions: pd.Series) -> pd.Series:
            import numpy as np

            if not len(positions):
                return pd.Series([], dtype=bool)
            words = np.frombuffer(bc.value, dtype=np.int64)
            mat = np.vstack(positions.to_numpy())
            hit = ((words[mat // 63] >> (mat % 63)) & 1).all(axis=1)
            return pd.Series(hit)

        if resources is not None:
            resources.append(bc)

    pos = F.array(
        *[
            F.pmod(
                _hash64(
                    F.concat_ws(
                        "|", F.lit(str(i)), F.col(col).cast("string")
                    ),
                    hash_fn,
                ),
                F.lit(m_bits),
            )
            for i in range(k)
        ]
    )
    verdict = F.when(F.col(col).isNull(), F.lit(False)).otherwise(
        _probe(pos)
    )
    return df.withColumn(out_col, verdict)


def exact_quantiles_sorted(
    df: DataFrame,
    keys: list[str],
    col: str,
    probabilities: list[float],
) -> DataFrame:
    """Exact continuous quantiles via distributed sort — the 100 TB path.

    ``percentile()`` is exact but buffers EVERY group value inside one
    aggregation buffer (OOM once a group outgrows an executor); sketches are
    bounded but approximate. This computes the same continuous quantile
    (linear interpolation at rank h = (n-1)·q, identical to SQL
    ``percentile_cont`` / DuckDB ``quantile_cont``) from a per-key sort:
    row_number and count share ONE window spec (single exchange + sort),
    each quantile reduces to the ≤2 bounding ranks, and the final groupBy
    combines map-side. Nothing is ever buffered per group.

    Output: keys + one ``q_<p>`` column per probability (dots → '_').
    """
    w = Window.partitionBy(*keys).orderBy(col)
    wall = Window.partitionBy(*keys).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # percentile()/percentile_cont exclude NULLs; row_number would order
    # them first and count() would include them, silently shifting every
    # interpolation rank — filter up front so the semantics match.
    df = df.filter(F.col(col).isNotNull())
    ranked = df.select(
        *keys,
        F.col(col).cast("double").alias("__v"),
        (F.row_number().over(w) - 1).alias("__rn"),
        F.count(F.lit(1)).over(wall).alias("__n"),
    )
    aggs = []
    for p in probabilities:
        h = (F.col("__n") - 1) * F.lit(float(p))
        lo = F.floor(h).cast("long")
        frac = h - lo
        # weight of this row toward quantile p: (1-frac) at rank lo,
        # frac at rank lo+1 (zero when frac == 0), else 0.
        weight = (
            F.when(F.col("__rn") == lo, 1.0 - frac)
            .when((F.col("__rn") == lo + 1) & (frac > 0), frac)
            .otherwise(F.lit(0.0))
        )
        name = f"q_{str(p).replace('.', '_')}"
        aggs.append(F.sum(F.col("__v") * weight).alias(name))
    return ranked.groupBy(*keys).agg(*aggs)
