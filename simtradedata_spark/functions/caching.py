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
    """Unpersist all non-protected persistent RDDs; returns how many."""
    m = _jmap(spark)
    freed = 0
    for k in list(m.keySet().toArray()):
        if int(k) not in _PROTECTED:
            m.get(k).unpersist(False)
            freed += 1
    return freed
