"""Top-k operators (SURVEY §2.8; declared surface ``get_sort_msg``,
``docs/PTrade_API_mini_Reference.md:2320,6253`` — "top 20 by factor").

Global top-k uses ``orderBy().limit(k)`` which Spark executes as TakeOrdered —
each partition keeps a k-heap, the driver merges k·p rows: no full sort, no
single-node shuffle, safe at any scale. Per-group top-k is a rank window
(one shuffle on the group key). Always pass a deterministic tie-break.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def top_k(df: DataFrame, k: int, *order: Column) -> DataFrame:
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame, group: list[str], k: int, *order: Column, rank_col: str = "rk"
) -> DataFrame:
    w = Window.partitionBy(*group).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
