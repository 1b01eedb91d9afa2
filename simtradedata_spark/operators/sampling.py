"""Deterministic, engine-independent sampling (LLM-pipeline extension).

``DataFrame.sample`` is Bernoulli per task attempt: the selected set changes
with partitioning, retries, and engine version — unacceptable for training
mixes that must be reproducible and auditable. Hash-mod sampling fixes the
selection as a pure function of the row KEY:

    keep  ⇔  md5(key) mod buckets < rate·buckets

Properties the random sampler lacks:
  - reproducible across runs, partitionings, engines (md5 is universal —
    the DuckDB oracle computes the identical set, see queries.py);
  - stable under re-ingest: a re-downloaded row lands on the same side;
  - join-compatible: every table sampled on the same key keeps the same
    entities, so a sampled fact still finds its sampled dimensions;
  - monotone in rate: the 5% sample is a subset of the 10% sample.

Pure column expressions — whole-stage codegen, no shuffle, pushes through
scans like any filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(cols: list[Column | str], buckets: int = 100, salt: str = "") -> Column:
    """Uniform bucket in [0, buckets) from md5 of the '|'-joined key columns
    (first 8 hex chars → 32-bit int; exact in a long). ``salt`` derives
    independent bucketings from the same key."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    if salt:
        cs = [F.lit(salt)] + cs
    h = F.conv(F.substring(F.md5(F.concat_ws("|", *cs)), 1, 8), 16, 10)
    return (h.cast("long") % buckets).cast("int")


def hash_sample(
    df: DataFrame,
    key_cols: list[str],
    rate_pct: int,
    buckets: int = 100,
    salt: str = "",
) -> DataFrame:
    """Keep rows whose key hashes below ``rate_pct`` of ``buckets`` —
    a deterministic ~rate_pct% sample."""
    return df.filter(hash_bucket(key_cols, buckets, salt) < rate_pct)


def weighted_mixture(
    df: DataFrame,
    key_cols: list[str],
    weight: Column,
    buckets: int = 100,
) -> DataFrame:
    """Epoch-weighted replication/sampling for training mixes: each row is
    emitted ``floor(w)`` times plus one extra copy with probability
    ``frac(w)`` — so a source weighted 2.5 contributes ~2.5 epochs, one
    weighted 0.3 a ~30% sample. The fractional decision is hash-of-
    (copy_idx, key): deterministic, partition/retry-invariant, and
    cross-engine reproducible like hash_sample. Output gains ``copy_idx``
    (0-based) so downstream shuffles can spread the copies.

    Scale shape: explode of a ceil(w)-long sequence + a codegen filter —
    no shuffle; output volume is exactly the mixture target."""
    w = weight.cast("double")
    n_full = F.floor(w).cast("int")
    frac = w - F.floor(w)
    exploded = df.withColumn(
        "copy_idx", F.explode(F.sequence(F.lit(0), n_full))
    )
    # copies below floor(w) always survive; the copy AT floor(w) survives
    # with probability frac(w), keyed by (copy_idx, key).
    keep_frac = (
        hash_bucket(
            [F.col("copy_idx").cast("string")]
            + [F.col(c) for c in key_cols],
            buckets,
        )
        < frac * buckets
    )
    return exploded.filter((F.col("copy_idx") < n_full) | keep_frac)


def weighted_sample(
    df: DataFrame,
    key_cols: list[str],
    weight: Column,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement, size k
    (Efraimidis–Spirakis A-ES): each row draws a seeded uniform u from its
    key and competes with key ``-ln(u)/w``; the k smallest win, which
    selects each row with probability proportional to its weight. Executes
    as TakeOrdered (per-partition k-heap, driver merge of k·p rows) — no
    global sort, and the seeded u makes the sample partition/retry/
    engine-invariant, the property ``rand()``-based sampling lacks at
    100 TB."""
    cs = [F.col(c) for c in key_cols]
    if salt:
        cs = [F.lit(salt)] + cs
    h = F.conv(F.substring(F.md5(F.concat_ws("|", *cs)), 1, 8), 16, 10).cast(
        "long"
    )
    u = (h + 1.0) / (F.lit(float(2**32)) + 1.0)  # (0, 1], never ln(0)
    es_key = -F.log(u) / weight
    return (
        df.withColumn("__esk", es_key)
        .orderBy("__esk", *key_cols)
        .limit(k)
        .drop("__esk")
    )


def stratified_sample_k(
    df: DataFrame,
    group_cols: list[str],
    key_cols: list[str],
    k: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic EXACT-k-per-group sample: within each group, rows
    compete on a seeded md5 of their key and the k smallest win — the
    stratified counterpart of ``weighted_sample`` (equal weights), giving
    every stratum the same budget regardless of its size (a training-mix
    "cap each source at k docs" / "k docs per language" primitive).

    One shuffle on the group columns (rank window); the hash order makes
    the selection partition/retry/engine-invariant, and a group with fewer
    than k rows keeps them all. Returns the input columns unchanged."""
    from pyspark.sql.window import Window

    cs = [F.col(c) for c in key_cols]
    if salt:
        cs = [F.lit(salt)] + cs
    # 15 hex chars = 60 bits: exact in an int64 under ANSI (16 would
    # overflow the cast), same convention as the generator RNG
    h = F.conv(F.substring(F.md5(F.concat_ws("|", *cs)), 1, 15), 16, 10).cast(
        "long"
    )
    w = Window.partitionBy(*group_cols).orderBy(h.asc(), *key_cols)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def negative_samples(
    df: DataFrame,
    id_col: str,
    k: int = 3,
    salt: str = "neg",
) -> DataFrame:
    """k deterministic pseudo-uniform NEGATIVE partners per row — the
    contrastive-training pair primitive (random in-batch negatives, made
    reproducible): over a dense 0..N-1 id domain,

        neg_j = (id + 1 + h(salt, id, j) mod (N-1)) mod N

    is uniform over every id EXCEPT the anchor itself, a pure function of
    the key (partition/retry/engine-invariant, same md5 convention as
    hash_sample), sampled with replacement across the k draws. N comes
    from max(id)+1 — one scalar broadcast, no shuffle on the fact side.
    Returns the input rows exploded to (``id_col``, draw, neg_id)."""
    n = df.agg((F.max(F.col(id_col)) + 1).alias("__n"))
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col), F.col("draw"))),
            1, 15,
        ),
        16, 10,
    ).cast("long")
    return (
        df.select(F.col(id_col))
        .withColumn("draw", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        .join(F.broadcast(n))
        # N <= 1: no valid negative exists — empty result, and the filter
        # must precede the pmod or ANSI mode raises DIVIDE_BY_ZERO on N=1
        .filter(F.col("__n") > 1)
        .withColumn(
            "neg_id",
            F.pmod(
                F.col(id_col) + 1 + F.pmod(h, F.col("__n") - 1), F.col("__n")
            ),
        )
        .drop("__n")
    )
