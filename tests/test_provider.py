"""Distributed ingest connector (S1/S2/S9 + fixed C6 retry)."""

import datetime

import pandas as pd
import pytest

from simtradedata_spark.sources.provider import (
    fetch_unified,
    paginated,
    with_retry,
)


def test_fetch_unified_fans_out_and_isolates_failures(spark):
    # Defined inside the test so cloudpickle ships it by VALUE — test modules
    # are not importable on executor workers.
    def fake_provider(symbol: str, start: str, end: str) -> pd.DataFrame:
        if symbol == "FAIL.SZ":
            raise ConnectionError("provider down")
        d0 = datetime.date.fromisoformat(start)
        rows = [
            dict(
                symbol=symbol,
                trade_date=d0 + datetime.timedelta(days=i),
                open=10.0 + i, high=11.0 + i, low=9.0 + i, close=10.5 + i,
                volume=1e5, money=1e6, pe_ttm=12.0, pb=1.5, ps_ttm=2.0,
                pcf=8.0, turnover_rate=1.2, is_st=0, trade_status=1,
            )
            for i in range(3)
        ]
        return pd.DataFrame(rows)

    symbols = spark.createDataFrame(
        [("600000.SS",), ("000001.SZ",), ("FAIL.SZ",)], ["symbol"]
    )
    got = fetch_unified(
        symbols, fake_provider, "2024-01-02", "2024-01-04", fetch_partitions=2
    ).toPandas()
    assert set(got.symbol) == {"600000.SS", "000001.SZ"}  # FAIL isolated
    assert len(got) == 6
    assert str(got.dtypes["trade_date"]) == "object" or got.trade_date.notna().all()


def test_with_retry_eventually_succeeds():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise TimeoutError("transient")
        return pd.DataFrame({"x": [1]})

    out = with_retry(flaky, max_retries=3, sleep=lambda s: None)
    assert calls["n"] == 3 and len(out) == 1


def test_with_retry_exhausts():
    def dead():
        raise TimeoutError("always")

    with pytest.raises(TimeoutError):
        with_retry(dead, max_retries=2, sleep=lambda s: None)


def test_paginated_stops_at_start_and_filters():
    full = pd.DataFrame(
        {
            "trade_date": [f"2024-01-{d:02d}" for d in range(31, 0, -1)],
            "close": range(31),
        }
    )

    pages_fetched = []

    def fetch_page(symbol, offset, limit):
        pages_fetched.append(offset)
        return full.iloc[offset : offset + limit]

    fetch = paginated(fetch_page, page_size=10)
    out = fetch("x", "2024-01-18", "2024-01-25")
    assert sorted(out.trade_date) == [f"2024-01-{d:02d}" for d in range(18, 26)]
    assert len(pages_fetched) == 2  # stopped once oldest <= start
