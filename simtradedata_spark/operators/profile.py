"""Table profiling — the completeness/cardinality summary a warehouse
integrity check (K6 family) publishes per ingest: one row per column with
row/null/distinct counts.

One Spark job: a single aggregate row carrying (count, non-null count,
distinct count) per column, unpivoted with ``stack``. Multiple exact
``count_distinct`` aggregates in one pass plan as an Expand (one replay of
the scan per distinct column) — acceptable for scheduled profiling; pass
``approx=True`` at 100 TB to swap in ``approx_count_distinct`` (HLL,
single-pass, no Expand), which is the same report with ±2% cardinalities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, columns: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """→ (column, n_rows, n_null, n_distinct), one row per profiled column."""
    cols = columns or df.columns
    distinct = (
        (lambda c: F.approx_count_distinct(c))
        if approx
        else (lambda c: F.count_distinct(F.col(c)))
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(distinct(c).alias(f"__nd_{c}"))
    row = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}" for c in cols
    )
    return row.select(
        F.expr(
            f"stack({len(cols)}, {stacked}) AS (column, __nn, n_distinct)"
        ),
        F.col("__n").alias("n_rows"),
    ).select(
        "column",
        "n_rows",
        (F.col("n_rows") - F.col("__nn")).alias("n_null"),
        "n_distinct",
    )
