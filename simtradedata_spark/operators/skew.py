"""Skew-mitigation operators — the manual fallback when AQE's skew-join
splitting isn't enough (a single hot key bigger than executor memory;
SCALE.md §3 recipe, materialized here).

``salted_join`` replicates the SMALL side S ways and scatters the big side's
hot keys across S salt buckets: every (key, salt) partition holds ~1/S of the
hot key's rows. Exact same rows out as a plain inner join (tested) — the
cost is S× the small side's shuffle volume, which is why you salt only when
the small side is modest and the big side is skewed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Inner/left join ``big ⋈ small`` on ``on`` with hot-key salting."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left")
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*on, F.monotonically_increasing_id()), F.lit(n_salts))
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    salted_small = small.select("*", salts).withColumn(
        "__salt", F.col("__salt").cast("long")
    )
    return salted_big.join(salted_small, on + ["__salt"], how).drop("__salt")
