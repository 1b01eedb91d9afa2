"""Partition-shape helpers.

``spread`` fixes the coarse-scan/hot-map mismatch: a compute-dense per-row
transform (per-character hashing, minhash permutations, GEMM batches)
inherits the SCAN's partitioning, and a small parquet file — one row group,
under ``maxPartitionBytes`` — arrives as ONE task, serializing the expensive
map while every other core idles. At warehouse scale the same scan has
thousands of splits and needs no help, so the widening is CONDITIONAL on the
actual partition count: small inputs pay one cheap shuffle of raw rows to
unlock N-way compute, large inputs are untouched (no 100-TB re-shuffle
hidden in an operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` up to the cluster's default
    parallelism — only if it currently has fewer partitions."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
