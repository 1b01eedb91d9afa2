"""Real-provider integration seam: a recorded BaoStock-shaped CSV fixture
(native column names, all-string values, '' = missing, as the real
``query_history_k_data_plus`` returns) flows through EVERY ingest stage —
``fetch_unified`` fan-out, the ``simtrade_provider`` DataSource with
pushdown, ``split_unified`` routing, a Warehouse write, and a PTrade
``get_price`` read — proving a non-synthetic provider slots in with zero
downstream changes (reference ``unified_fetcher.py:20-34`` field contract,
``baostock_fetcher.py:69-266`` rename/coerce behavior)."""

import datetime as dt
import os

import pytest

from simtradedata_spark.sources.adapters import (
    baostock_code_to_ptrade,
    make_baostock_csv_provider,
    ptrade_code_to_baostock,
)
from simtradedata_spark.sources.provider import fetch_unified

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "baostock_daily.csv")


def test_code_round_trip():
    assert baostock_code_to_ptrade("sh.600000") == "600000.SS"
    assert baostock_code_to_ptrade("sz.000001") == "000001.SZ"
    assert ptrade_code_to_baostock("600000.SS") == "sh.600000"
    assert ptrade_code_to_baostock("000001.SZ") == "sz.000001"


def test_fixture_through_fetch_unified(spark):
    symbols = spark.createDataFrame(
        [("600000.SS",), ("000001.SZ",), ("999999.SS",)], ["symbol"]
    )
    unified = fetch_unified(
        symbols,
        make_baostock_csv_provider(FIXTURE),
        "2023-01-03",
        "2023-01-09",
        fetch_partitions=2,
    )
    rows = {(r.symbol, str(r.trade_date)): r for r in unified.collect()}
    assert len(rows) == 10  # absent symbol contributes nothing, no error
    r = rows[("600000.SS", "2023-01-03")]
    assert r.close == 7.30 and r.money == 206834512.34 and r.trade_status == 1
    halt = rows[("000001.SZ", "2023-01-05")]
    # suspension row: empty strings coerced to NULL, status 0 (P3 coercion)
    assert halt.open is None and halt.trade_status == 0 and halt.volume == 0.0


def test_fixture_through_datasource_with_pushdown(spark):
    from simtradedata_spark.sources.pyds import ProviderDataSource

    try:
        spark.dataSource.register(ProviderDataSource)
    except Exception:
        pass  # already registered by another test
    df = (
        spark.read.format("simtrade_provider")
        .option("symbols", "600000.SS,000001.SZ")
        .option("start", "2023-01-03")
        .option("end", "2023-01-09")
        .option(
            "provider_factory",
            "simtradedata_spark.sources.adapters:make_baostock_csv_provider",
        )
        .option("provider_arg", FIXTURE)
        .load()
    )
    # date pushdown narrows the provider call, symbol pushdown prunes a
    # whole partition's fetches
    out = df.filter(
        (df.trade_date >= dt.date(2023, 1, 5)) & (df.symbol == "600000.SS")
    ).collect()
    assert sorted(str(r.trade_date) for r in out) == [
        "2023-01-05",
        "2023-01-06",
        "2023-01-09",
    ]
    assert {r.close for r in out} == {7.33, 7.37, 7.50}


def test_fixture_to_warehouse_to_get_price(spark, tmp_path):
    from simtradedata_spark.api.ptrade import PTradeDataAPI
    from simtradedata_spark.sources.splitter import split_unified
    from simtradedata_spark.sources.tables import Warehouse

    symbols = spark.createDataFrame([("600000.SS",), ("000001.SZ",)], ["symbol"])
    unified = fetch_unified(
        symbols, make_baostock_csv_provider(FIXTURE), "2023-01-03", "2023-01-09"
    )
    parts = split_unified(unified)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.write("bars", parts["market"])
    wh.write("valuation", parts["valuation"])
    wh.write("stock_status", parts["status"])

    api = PTradeDataAPI(wh)
    px = api.get_price(
        "600000.SS", start_date="2023-01-04", end_date="2023-01-06"
    )
    assert list(px["close"]) == [7.39, 7.33, 7.37]
    # valuation routed with provider→PTrade renames intact
    val = wh.read("valuation").filter("symbol = '000001.SZ'").toPandas()
    assert val["pe_ttm"].notna().sum() == 4  # suspension day is NULL
