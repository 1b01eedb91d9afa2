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


# ---------------------------------------------------------------------------
# Second provider dialect: mootdx (reference mootdx_fetcher.py:89-217 —
# numeric columns, 'vol' is the share volume and 'volume' a DIFFERENT
# field to drop, no symbol column, OHLCV only) + the unified_fetcher
# posture of BaoStock-primary / mootdx-fallback and the column-level
# valuation merge.
# ---------------------------------------------------------------------------

MOOTDX_FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "mootdx_daily.csv"
)


def test_mootdx_adapter_dialect(spark):
    from simtradedata_spark.sources.adapters import make_mootdx_csv_provider

    symbols = spark.createDataFrame([("600000.SS",)], ["symbol"])
    unified = fetch_unified(
        symbols, make_mootdx_csv_provider(MOOTDX_FIXTURE),
        "2023-01-03", "2023-01-09",
    )
    rows = {str(r.trade_date): r for r in unified.collect()}
    assert len(rows) == 5
    r = rows["2023-01-03"]
    # 'vol' (share volume) won, the misleading 'volume' column dropped
    assert r.volume == 28451200.0 and r.money == 206834512.34
    # OHLCV-only provider: valuation/status columns are typed nulls
    assert r.pe_ttm is None and r.is_st is None and r.trade_status is None


def test_fallback_provider_per_symbol(spark):
    """BaoStock-primary, mootdx-secondary: 000001.SZ exists in both (the
    primary wins, valuation present); a symbol the primary errors on is
    served by the secondary (OHLCV-only) instead of failing the batch."""
    from simtradedata_spark.sources.adapters import (
        make_baostock_csv_provider,
        make_fallback_provider,
        make_mootdx_csv_provider,
    )

    primary = make_baostock_csv_provider(FIXTURE)
    secondary = make_mootdx_csv_provider(MOOTDX_FIXTURE)
    both = make_fallback_provider(primary, secondary)

    symbols = spark.createDataFrame([("000001.SZ",), ("600000.SS",)], ["symbol"])
    unified = fetch_unified(symbols, both, "2023-01-03", "2023-01-04")
    rows = {(r.symbol, str(r.trade_date)): r for r in unified.collect()}
    # primary covers both symbols on these dates → valuation populated
    assert rows[("000001.SZ", "2023-01-03")].pe_ttm is not None

    def broken_for_600000(symbol, start, end):
        if symbol == "600000.SS":
            raise RuntimeError("provider outage")
        return primary(symbol, start, end)

    patched = make_fallback_provider(broken_for_600000, secondary)
    unified2 = fetch_unified(symbols, patched, "2023-01-03", "2023-01-04")
    rows2 = {(r.symbol, str(r.trade_date)): r for r in unified2.collect()}
    # 600000.SS fell through to mootdx: bars present, valuation null
    assert rows2[("600000.SS", "2023-01-03")].close == 7.30
    assert rows2[("600000.SS", "2023-01-03")].pe_ttm is None
    # 000001.SZ still came from the primary
    assert rows2[("000001.SZ", "2023-01-03")].pe_ttm is not None


def test_merge_unified_fills_valuation_from_secondary(spark):
    """Column-level provider merge: mootdx bars as primary + BaoStock as
    secondary → the valuation block fills in from BaoStock while the
    primary's OHLCV wins where both cover; days only one side has
    survive the full outer join."""
    from simtradedata_spark.sources.adapters import (
        make_baostock_csv_provider,
        make_mootdx_csv_provider,
    )
    from simtradedata_spark.sources.provider import merge_unified

    symbols = spark.createDataFrame([("000001.SZ",)], ["symbol"])
    md = fetch_unified(
        symbols, make_mootdx_csv_provider(MOOTDX_FIXTURE),
        "2023-01-03", "2023-01-09",
    )
    bs = fetch_unified(
        symbols, make_baostock_csv_provider(FIXTURE),
        "2023-01-03", "2023-01-09",
    )
    merged = merge_unified(md, bs)
    rows = {str(r.trade_date): r for r in merged.collect()}
    # mootdx skips 2023-01-05 (suspension day): BaoStock's row survives
    assert set(rows) == {
        "2023-01-03", "2023-01-04", "2023-01-05", "2023-01-06", "2023-01-09"
    }
    r = rows["2023-01-03"]
    assert r.volume == 98123400.0          # primary's OHLCV
    assert r.pe_ttm is not None            # secondary's valuation filled
    assert rows["2023-01-05"].trade_status == 0  # secondary-only day kept
