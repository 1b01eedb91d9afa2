"""asof_join vs pandas merge_asof (the reference oracle for J5)."""

import pandas as pd
import numpy as np
from pyspark.sql import functions as F

from simtradedata_spark.operators.asof import asof_join


def _mk(spark, n_left=200, n_right=60, seed=1):
    rng = np.random.RandomState(seed)
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 5, n_left),
            "t": rng.randint(0, 1000, n_left),
            "lid": np.arange(n_left),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.randint(0, 5, n_right),
            "t": rng.choice(np.arange(0, 1000, 7), n_right, replace=False),
            "payload": rng.rand(n_right).round(6),
        }
    )
    return left, right


def test_asof_matches_pandas(spark):
    left, right = _mk(spark)
    lsdf = spark.createDataFrame(left)
    rsdf = spark.createDataFrame(right)
    got = (
        asof_join(lsdf, rsdf, on="t", by=["k"])
        .select("lid", "payload")
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    expect = pd.merge_asof(
        left.sort_values("t"),
        right.sort_values("t"),
        on="t",
        by="k",
    ).sort_values("lid").reset_index(drop=True)
    pd.testing.assert_series_equal(got["payload"], expect["payload"], check_names=False)


def test_asof_strict_excludes_equal_ts(spark):
    left = spark.createDataFrame([(1, 10)], "k int, t int")
    right = spark.createDataFrame([(1, 10, 99.0), (1, 5, 55.0)], "k int, t int, v double")
    inclusive = asof_join(left, right, on="t", by=["k"]).select("v").first()[0]
    strict = asof_join(left, right, on="t", by=["k"], strict=True).select("v").first()[0]
    assert inclusive == 99.0
    assert strict == 55.0


def test_asof_no_match_is_null(spark):
    left = spark.createDataFrame([(1, 1)], "k int, t int")
    right = spark.createDataFrame([(1, 10, 99.0)], "k int, t int, v double")
    row = asof_join(left, right, on="t", by=["k"]).first()
    assert row["v"] is None


def test_asof_forward_matches_pandas(spark):
    """direction='forward' == pandas merge_asof(direction='forward') on
    random keyed series (nearest FUTURE row, per key)."""
    # right (k, t) uniqueness comes from _mk's rng.choice(replace=False) —
    # duplicates would make the Spark payload tie-break diverge from
    # pandas' row-order tie-break
    left, right = _mk(spark, seed=7)
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="t",
            by=["k"],
            direction="forward",
        )
        .select("lid", "payload")
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    expect = pd.merge_asof(
        left.sort_values("t"),
        right.sort_values("t"),
        on="t",
        by="k",
        direction="forward",
    ).sort_values("lid").reset_index(drop=True)
    pd.testing.assert_series_equal(
        got["payload"], expect["payload"], check_names=False
    )


def test_asof_forward_strict_and_equal_ts(spark):
    left = spark.createDataFrame([(1, 10)], "k int, t int")
    right = spark.createDataFrame(
        [(1, 10, 99.0), (1, 15, 55.0)], "k int, t int, v double"
    )
    inclusive = asof_join(
        left, right, on="t", by=["k"], direction="forward"
    ).select("v").first()[0]
    strict = asof_join(
        left, right, on="t", by=["k"], direction="forward", strict=True
    ).select("v").first()[0]
    assert inclusive == 99.0   # equal ts matches
    assert strict == 55.0      # strict skips to the next future row


def test_asof_null_timestamp_never_matches_either_direction(spark):
    left = spark.createDataFrame([(1, None)], "k int, t int")
    right = spark.createDataFrame([(1, 10, 99.0)], "k int, t int, v double")
    for d in ("backward", "forward"):
        got = asof_join(left, right, on="t", by=["k"], direction=d)
        assert got.select("v").first()[0] is None, d
    import pytest

    with pytest.raises(ValueError):
        asof_join(left, right, on="t", by=["k"], direction="nearest")


def test_asof_null_right_timestamp_never_matches(spark):
    """A right row with a NULL `on` value has no as-of position (pandas
    merge_asof / DuckDB ASOF drop null keys): it must never be carried as
    a phantom match, in either direction (r3 advisor finding)."""
    left = spark.createDataFrame([(1, 5), (1, 20)], "k int, t int")
    right = spark.createDataFrame(
        [(1, None, 111.0), (1, 10, 99.0)], "k int, t int, v double"
    )
    back = {r["t"]: r["v"] for r in
            asof_join(left, right, on="t", by=["k"]).collect()}
    assert back[5] is None          # nothing at or before 5
    assert back[20] == 99.0         # the real row, not the null-ts payload
    fwd = {r["t"]: r["v"] for r in
           asof_join(left, right, on="t", by=["k"],
                     direction="forward").collect()}
    assert fwd[5] == 99.0
    assert fwd[20] is None          # nothing at or after 20
