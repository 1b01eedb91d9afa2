"""Scratch-cache bookkeeping.

Several operators pin intermediates for the duration of one query —
minhash signatures before the self-join, the per-customer RFM frame, the
connected-components edge list (localCheckpoint per round). Spark has no
"persist until this query's action finishes" scope, so in a long-lived
session those blocks accumulate: a 120-query bench run measurably slowed
its tail queries by seconds once storage memory filled.

``release_scratch`` frees every persistent RDD that is NOT registered as a
session-lifetime cache. Long-lived caches (the memoized synthetic-market
bars, the PTrade client's pinned tables) call ``protect_current`` right
after materializing, which snapshots their RDD ids; everything else is, by
definition, scratch. Harness/bench code calls ``release_scratch`` between
queries; library callers may call it after a batch job.

Freeing is safe for ``persist()`` frames (they lazily re-cache on reuse)
but DESTROYS ``localCheckpoint`` data (lineage is truncated — there is
nothing to recompute from), which is exactly why checkpointed memos must
be protected and why scratch checkpoints must never be reused across
queries.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_PROTECTED: set[int] = set()


def _jmap(spark: SparkSession):
    return spark.sparkContext._jsc.getPersistentRDDs()


def snapshot(spark: SparkSession) -> set[int]:
    """Current persistent RDD ids — take one BEFORE materializing a
    session-lifetime cache, pass it to ``protect_new`` after."""
    return {int(k) for k in _jmap(spark).keySet().toArray()}


def protect_new(spark: SparkSession, before: set[int]) -> None:
    """Mark RDDs persisted since ``before`` as session-lifetime. The diff
    form protects exactly the memo being built, never scratch that happens
    to be alive at the same moment."""
    _PROTECTED.update(snapshot(spark) - before)


def protect_current(spark: SparkSession) -> None:
    """Mark every currently-persistent RDD as session-lifetime (called by
    memo creators immediately after materializing their cache)."""
    m = _jmap(spark)
    _PROTECTED.update(int(k) for k in m.keySet().toArray())


def release_scratch(spark: SparkSession) -> int:
    """Unpersist all non-protected persistent RDDs; returns how many.

    Session-wide: frees OTHER owners' scratch too, so only harness/bench
    code that owns the whole session should call this. Library code must
    use ``scratch_scope``/``release_new`` instead — they free only the
    frames persisted inside the scope, leaving caller persists (and,
    critically, caller ``localCheckpoint`` data, which CANNOT be
    recomputed) untouched."""
    m = _jmap(spark)
    freed = 0
    for k in list(m.keySet().toArray()):
        if int(k) not in _PROTECTED:
            m.get(k).unpersist(False)
            freed += 1
    return freed


def release_new(
    spark: SparkSession, before: set[int], keep: set[int] | None = None
) -> int:
    """Unpersist only the non-protected RDDs persisted since ``before``
    (a ``snapshot``). The scoped dual of ``protect_new`` — an operator
    frees exactly its own scratch, never a caller's persists or
    localCheckpoints. ``keep`` exempts specific RDD ids (a stage barrier
    that later stages still read — the curation chain frees each finished
    stage's scratch while its newest barrier stays live). Returns how many
    were freed."""
    m = _jmap(spark)
    freed = 0
    for k in list(m.keySet().toArray()):
        kid = int(k)
        if kid not in before and kid not in _PROTECTED and not (
            keep and kid in keep
        ):
            m.get(k).unpersist(False)
            freed += 1
    return freed


class scratch_scope:
    """Context manager: everything persisted inside the ``with`` block that
    is not ``protect_*``-ed is unpersisted on exit. Wrap a library call to
    a persist-heavy operator (``full_curation``) PLUS the final action that
    consumes its result::

        with scratch_scope(spark):
            flagged = full_curation(docs, ...)
            flagged.write.parquet(out)   # action runs while barriers live

    Single-threaded driver assumption: frames a concurrent thread persists
    during the scope would be swept too."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.freed = 0

    def __enter__(self) -> "scratch_scope":
        self._before = snapshot(self.spark)
        return self

    def __exit__(self, *exc) -> None:
        self.freed = release_new(self.spark, self._before)
