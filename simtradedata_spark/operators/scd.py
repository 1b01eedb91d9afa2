"""SCD Type-2 interval builder: change log → validity intervals.

The PTrade surface is full of point-in-time lookups (constituents at a
date, status at a date, fundamentals as-of — SURVEY §2.12); the natural
storage for all of them at scale is a slowly-changing-dimension table with
``valid_from``/``valid_to`` ranges built from the raw change log. The
reference keeps per-date JSON snapshots instead
(``download_efficient.py:367-414``) — intervals are the scalable form: a
lookup at date d is a range predicate, not a scan of every snapshot.

Scale: one shuffle on the key. Both windows (change detection via lag,
interval close via lead) share the same (partitionBy key, orderBy ts)
spec, so Catalyst reuses a single Exchange+Sort; the filter between them
is narrow.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_intervals(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreaks: Sequence[str | Column] = (),
) -> DataFrame:
    """Collapse a change log into SCD2 validity intervals per key.

    Consecutive rows whose ``attr_cols`` are unchanged (null-safe) merge
    into one interval; each emitted row carries ``valid_from`` (inclusive),
    ``valid_to`` (exclusive, null = still current) and ``is_current``.
    ``tiebreaks`` must make the per-key order total when ``ts_col`` ties.
    """
    w = Window.partitionBy(*keys).orderBy(ts_col, *tiebreaks)
    # First row always opens an interval; later rows only on a (null-safe)
    # attribute change. eqNullSafe alone would swallow a first row whose
    # attributes are all null — hence the explicit row_number guard.
    change = F.lit(False)
    for a in attr_cols:
        change = change | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    opens = (F.row_number().over(w) == 1) | change
    changes = df.withColumn("__scd_open", opens).filter("__scd_open")
    return changes.select(
        *keys,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def at_time(intervals: DataFrame, ts) -> DataFrame:
    """Point-in-time slice of an SCD2 table: rows whose interval contains
    ``ts`` (``valid_from <= ts < valid_to``, open current intervals match).
    On a table partitioned/sorted by key this is a pruned range filter —
    the whole point of interval storage over snapshots."""
    t = F.lit(ts)
    return intervals.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )
