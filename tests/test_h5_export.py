"""HDF5 export edge — layout parity with writers/h5_writer.py:26-360.

The layout builder is asserted shape-for-shape without PyTables; the actual
HDFStore write (and a get_price round-trip through the exported file) runs
only where PyTables is installed."""

import pandas as pd
import pytest

from simtradedata_spark.sources.h5_export import (
    ADJ_FILE,
    DATA_FILE,
    FUND_FILE,
    export_ptrade_h5,
    ptrade_h5_layout,
)


@pytest.fixture(scope="module")
def layout(warehouse):
    return list(ptrade_h5_layout(warehouse))


def test_layout_files_and_keys(layout, warehouse):
    keys = {(f, k) for f, k, _, _ in layout}
    syms = [
        r.symbol
        for r in warehouse.read("stock_metadata").select("symbol").collect()
    ]
    sym = sorted(syms)[0]
    assert (DATA_FILE, f"stock_data/{sym}") in keys
    assert (DATA_FILE, "benchmark") in keys
    assert (DATA_FILE, "metadata") in keys
    assert (DATA_FILE, "stock_metadata") in keys
    assert (DATA_FILE, "trade_days") in keys
    assert (FUND_FILE, f"valuation/{sym}") in keys
    assert (FUND_FILE, f"fundamentals/{sym}") in keys
    assert (ADJ_FILE, sym) in keys
    # benchmark must never appear as a stock
    assert (DATA_FILE, "stock_data/000300.SS") not in keys


def test_layout_payload_shapes(layout):
    by_key = {(f, k): (fmt, p) for f, k, fmt, p in layout}
    fmt, meta = by_key[(DATA_FILE, "metadata")]
    assert fmt == "fixed" and isinstance(meta, pd.Series)
    assert meta["format_version"] == 3 and meta["stock_count"] > 0

    (fmt, bars) = next(
        v for (f, k), v in by_key.items() if k.startswith("stock_data/")
    )
    assert fmt == "table"
    assert list(bars.columns) == ["open", "high", "low", "close", "volume", "money"]
    assert isinstance(bars.index, pd.DatetimeIndex)
    assert bars.index.is_monotonic_increasing

    fmt, sm = by_key[(DATA_FILE, "stock_metadata")]
    assert fmt == "table" and sm.index.name == "symbol"
    assert all(sm[c].dtype == object for c in sm.columns)  # all-string cast

    (fmt, adj) = next(v for (f, k), v in by_key.items() if f == ADJ_FILE)
    assert fmt == "table" and isinstance(adj, pd.Series)
    assert adj.name == "backward_a" and isinstance(adj.index, pd.DatetimeIndex)


def test_exrights_frames_present_for_event_symbols(layout):
    ex_keys = [k for f, k, _, _ in layout if k.startswith("exrights/")]
    assert ex_keys, "symbols with exrights events must get a frame"
    for f, k, fmt, p in layout:
        if k.startswith("exrights/"):
            assert fmt == "fixed" and "exer_backward_a" in p.columns


def test_export_requires_pytables_or_roundtrips(warehouse, tmp_path):
    try:
        import tables  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="PyTables"):
            export_ptrade_h5(warehouse, str(tmp_path))
        return
    counts = export_ptrade_h5(warehouse, str(tmp_path))
    assert counts[DATA_FILE] > 0
    sym = sorted(
        r.symbol
        for r in warehouse.read("stock_metadata").select("symbol").collect()
    )[0]
    out = pd.read_hdf(tmp_path / DATA_FILE, f"stock_data/{sym}")
    wh_rows = (
        warehouse.read("bars").filter(f"symbol = '{sym}'").count()
    )
    assert len(out) == wh_rows
