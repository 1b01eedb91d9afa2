"""SCD2 interval builder: collapse change logs into validity ranges."""

from datetime import datetime

from pyspark.sql import functions as F

from simtradedata_spark.operators.scd import at_time, scd2_intervals


def _log(spark):
    rows = [
        # user 1: A A B A — consecutive dup collapses, A reappears later
        (1, datetime(2024, 1, 1), "A"),
        (1, datetime(2024, 1, 2), "A"),
        (1, datetime(2024, 1, 3), "B"),
        (1, datetime(2024, 1, 5), "A"),
        # user 2: single row
        (2, datetime(2024, 1, 4), "X"),
        # user 3: null attr first, then value, then null again
        (3, datetime(2024, 1, 1), None),
        (3, datetime(2024, 1, 2), "C"),
        (3, datetime(2024, 1, 3), None),
    ]
    return spark.createDataFrame(rows, "k long, ts timestamp, attr string")


def test_scd2_hand_oracle(spark):
    iv = scd2_intervals(_log(spark), ["k"], "ts", ["attr"]).collect()
    got = {
        (r["k"], r["attr"], r["valid_from"].day, r["valid_to"].day if r["valid_to"] else None)
        for r in iv
    }
    assert got == {
        (1, "A", 1, 3),
        (1, "B", 3, 5),
        (1, "A", 5, None),
        (2, "X", 4, None),
        (3, None, 1, 2),   # first-row-with-null-attr still opens an interval
        (3, "C", 2, 3),
        (3, None, 3, None),
    }
    currents = {r["k"] for r in iv if r["is_current"]}
    assert currents == {1, 2, 3}


def test_scd2_intervals_tile_without_overlap(spark):
    """Per key: sorted intervals must chain exactly — each valid_to equals
    the next valid_from (no gaps, no overlaps), one open interval per key."""
    iv = scd2_intervals(_log(spark), ["k"], "ts", ["attr"])
    rows = sorted(
        iv.collect(), key=lambda r: (r["k"], r["valid_from"])
    )
    by_key = {}
    for r in rows:
        by_key.setdefault(r["k"], []).append(r)
    for k, seq in by_key.items():
        for a, b in zip(seq, seq[1:]):
            assert a["valid_to"] == b["valid_from"], (k, a, b)
        assert seq[-1]["valid_to"] is None
        assert all(r["valid_to"] is not None for r in seq[:-1])


def test_scd2_at_time_point_lookup(spark):
    iv = scd2_intervals(_log(spark), ["k"], "ts", ["attr"])
    snap = {
        r["k"]: r["attr"] for r in at_time(iv, datetime(2024, 1, 3, 12)).collect()
    }
    # Jan 3 noon: user1 in B-interval [3,5), user3 back to null, user2 not yet... 
    # user2 starts Jan 4 → absent.
    assert snap == {1: "B", 3: None}
    snap2 = {r["k"]: r["attr"] for r in at_time(iv, datetime(2024, 1, 6)).collect()}
    assert snap2 == {1: "A", 2: "X", 3: None}


def test_scd2_single_exchange(spark):
    iv = scd2_intervals(_log(spark), ["k"], "ts", ["attr"])
    p = iv._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange hashpartitioning") == 1
