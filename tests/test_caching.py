"""Scratch-cache lifecycle: the release helpers must free SQL-cached
frames THROUGH the Dataset API so Spark's CacheManager entry dies with the
blocks. Unpersisting only the underlying RDD (the pre-r10 shape) left the
entry alive, and a later persist() of a logically-IDENTICAL plan looked it
up, declared the frame "already cached", and silently cached nothing —
every consumer then recomputed from source. That no-op is the measured r9
1000x intra-session drift (bench run-2 of a twin re-persisted the same
staging plan after release_scratch and re-tokenized the corpus once per
consumer: 125 s -> 252 s, with clean heap/broadcast telemetry)."""

from __future__ import annotations

from pyspark.sql import functions as F

from simtradedata_spark.functions.caching import (
    _jmap,
    release_new,
    release_scratch,
    scratch_persist,
    snapshot,
)


def _frame(spark):
    # fresh DataFrame object, IDENTICAL logical plan each call — the bench
    # repeat shape (thunk re-invoked per run)
    return spark.range(100_000).select("id", (F.col("id") * 2).alias("y"))


def test_scratch_persist_survives_release_and_recaches(spark):
    release_scratch(spark)
    base = len(_jmap(spark))

    d1 = scratch_persist(_frame(spark))
    d1.count()
    assert len(_jmap(spark)) == base + 1
    assert release_scratch(spark) >= 1

    # the regression: an identical plan persisted AFTER release must cache
    # again (pre-fix this was a CacheManager no-op -> 0 persistent RDDs)
    d2 = scratch_persist(_frame(spark))
    d2.count()
    assert len(_jmap(spark)) == base + 1
    release_scratch(spark)


def test_release_new_scopes_registered_frames_by_snapshot(spark):
    release_scratch(spark)
    caller = scratch_persist(
        spark.range(1000).select((F.col("id") + 1).alias("v"))
    )
    caller.count()
    before = snapshot(spark)

    inner = scratch_persist(_frame(spark))
    inner.count()
    freed = release_new(spark, before)
    assert freed == 1  # only the frame registered after the snapshot

    # caller's frame is still genuinely cached (blocks alive)
    ids = {int(k) for k in _jmap(spark).keySet().toArray()}
    assert ids == set(before)
    release_scratch(spark)
