"""P1/P2 routing + J2 quarterly assembly."""

from pyspark.sql import functions as F

from simtradedata_spark.sources.splitter import (
    CANONICAL_ORDER,
    assemble_quarterly,
    split_unified,
)


def test_split_routes_and_renames(spark):
    unified = spark.createDataFrame(
        [("600000.SS", "2024-01-02", 10.0, 11.0, 9.0, 10.5, 1e5, 2e6,
          12.0, 1.5, 2.0, 8.0, 1.2, 0, 1)],
        "symbol string, trade_date string, open double, high double, low double, "
        "close double, volume double, amount double, peTTM double, pbMRQ double, "
        "psTTM double, pcfNcfTTM double, turn double, isST tinyint, tradestatus tinyint",
    )
    parts = split_unified(unified)
    assert set(parts) == {"market", "valuation", "status"}
    m = parts["market"]
    assert m.columns == CANONICAL_ORDER["market"]
    assert m.first()["money"] == 2e6  # amount -> money rename (P1)
    v = parts["valuation"]
    assert v.columns == CANONICAL_ORDER["valuation"]
    row = v.first()
    assert row["pe_ttm"] == 12.0 and row["turnover_rate"] == 1.2
    assert row["total_shares"] is None  # absent column -> typed null (P2)
    s = parts["status"].first()
    assert s["is_st"] == 0 and s["trade_status"] == 1


def test_assemble_quarterly_outer_join(spark):
    profit = spark.createDataFrame(
        [("a", "2024-03-31", 10.0)], "symbol string, end_date string, roe double"
    )
    growth = spark.createDataFrame(
        [("a", "2024-03-31", 5.0), ("a", "2024-06-30", 6.0)],
        "symbol string, end_date string, grow double",
    )
    balance = spark.createDataFrame(
        [("a", "2024-06-30", 1.5, 99.0)],
        "symbol string, end_date string, current_ratio double, roe double",  # dup roe
    )
    out = assemble_quarterly([profit, growth, balance]).orderBy("end_date")
    rows = out.collect()
    assert out.columns == ["symbol", "end_date", "roe", "grow", "current_ratio"]
    assert len(rows) == 2
    q1, q2 = rows
    assert q1["roe"] == 10.0 and q1["grow"] == 5.0 and q1["current_ratio"] is None
    assert q2["roe"] is None and q2["grow"] == 6.0 and q2["current_ratio"] == 1.5
