"""PTrade HDF5 export edge: warehouse → the ``ptrade_data.h5`` /
``ptrade_fundamentals.h5`` / ``ptrade_adj_pre.h5`` store layout that
SimTradeLab consumes (reference ``writers/h5_writer.py:26-360``):

  ptrade_data.h5          stock_data/{symbol}  (table)   OHLCV+money, date idx
                          benchmark            (table)
                          metadata             (fixed)   Series, format_version 3
                          exrights/{symbol}    (fixed)
                          stock_metadata       (table)   all-string, code idx
                          trade_days           (fixed)
  ptrade_fundamentals.h5  fundamentals/{symbol}(fixed)
                          valuation/{symbol}   (table)
  ptrade_adj_pre.h5       {symbol}             (table)   Series 'backward_a'

The layout builder is pure (yields ``(file, key, format, payload)``) so the
shape is testable without PyTables; ``export_ptrade_h5`` writes it with
``pd.HDFStore`` when PyTables is installed (not in this sandbox — the
writer is import-gated, the layout is fully tested).

Scale note: this is a CLIENT-EDGE export — the reference's full store is
~1.5 GB (BASELINE.md), so one bounded ``toPandas`` per table then a pandas
groupby split is the honest plan; HDF5 itself is a single-writer format, so
a distributed write would serialize on the file lock anyway. For bigger
universes, call with symbol batches and ``mode='a'``.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from datetime import datetime

import pandas as pd

from simtradedata_spark.sources.tables import Warehouse

BENCHMARK = "000300.SS"

DATA_FILE = "ptrade_data.h5"
FUND_FILE = "ptrade_fundamentals.h5"
ADJ_FILE = "ptrade_adj_pre.h5"

_BAR_COLS = ["open", "high", "low", "close", "volume", "money"]


def _dated(pdf: pd.DataFrame, date_col: str) -> pd.DataFrame:
    pdf = pdf.sort_values(date_col)
    pdf.index = pd.to_datetime(pdf[date_col])
    pdf.index.name = None
    return pdf.drop(columns=[date_col])


def ptrade_h5_layout(
    wh: Warehouse, symbols: list[str] | None = None
) -> Iterator[tuple[str, str, str, object]]:
    """Yield ``(file, key, hdf_format, payload)`` in the reference's store
    layout. ``symbols=None`` exports every non-benchmark symbol present."""
    bars = wh.read("bars").toPandas()
    stock_bars = bars[bars["symbol"] != BENCHMARK]
    if symbols is not None:
        stock_bars = stock_bars[stock_bars["symbol"].isin(symbols)]
    all_syms = sorted(stock_bars["symbol"].unique())

    for sym, g in stock_bars.groupby("symbol"):
        yield DATA_FILE, f"stock_data/{sym}", "table", _dated(
            g[["trade_date", *_BAR_COLS]], "trade_date"
        )

    bench = bars[bars["symbol"] == BENCHMARK]
    if len(bench):
        yield DATA_FILE, "benchmark", "table", _dated(
            bench[["trade_date", *_BAR_COLS]], "trade_date"
        )

    start = str(bars["trade_date"].min())
    end = str(bars["trade_date"].max())
    # metadata Series matching h5_writer.py:125-139 (format_version 3; the
    # reference writes empty-dict placeholders for the two json fields)
    yield DATA_FILE, "metadata", "fixed", pd.Series(
        {
            "download_date": datetime.now().strftime("%Y-%m-%d %H:%M:%S"),
            "start_date": start,
            "end_date": end,
            "stock_count": len(all_syms),
            "sample_count": 0,
            "format_version": 3,
            "index_constituents": json.dumps({}),
            "stock_status_history": json.dumps({}),
        }
    )

    if wh.exists("exrights"):
        ex = wh.read("exrights").toPandas()
        ex = ex[ex["symbol"].isin(all_syms)]
        for sym, g in ex.groupby("symbol"):
            yield DATA_FILE, f"exrights/{sym}", "fixed", _dated(
                g.drop(columns=["symbol"]), "ex_date"
            )

    if wh.exists("stock_metadata"):
        meta = wh.read("stock_metadata").toPandas()
        meta = meta[meta["symbol"].isin(all_syms)].set_index("symbol")
        # all-string cast mirrors h5_writer.py:192-196 (PyTables mixed-type)
        yield DATA_FILE, "stock_metadata", "table", meta.astype(str)

    if wh.exists("trade_calendar"):
        cal = wh.read("trade_calendar").toPandas()
        days = cal[cal["is_trading_day"]][["calendar_date"]].rename(
            columns={"calendar_date": "trade_days"}
        )
        days["trade_days"] = pd.to_datetime(days["trade_days"])
        yield DATA_FILE, "trade_days", "fixed", days.reset_index(drop=True)

    if wh.exists("fundamentals"):
        fund = wh.read("fundamentals").toPandas()
        fund = fund[fund["symbol"].isin(all_syms)]
        date_col = "end_date" if "end_date" in fund.columns else "report_date"
        for sym, g in fund.groupby("symbol"):
            yield FUND_FILE, f"fundamentals/{sym}", "fixed", _dated(
                g.drop(columns=["symbol"]), date_col
            )

    if wh.exists("valuation"):
        val = wh.read("valuation").toPandas()
        val = val[val["symbol"].isin(all_syms)]
        for sym, g in val.groupby("symbol"):
            yield FUND_FILE, f"valuation/{sym}", "table", _dated(
                g.drop(columns=["symbol"]), "trade_date"
            )

    if wh.exists("adjust_factor"):
        adj = wh.read("adjust_factor").toPandas()
        adj = adj[adj["symbol"].isin(all_syms)]
        for sym, g in adj.groupby("symbol"):
            s = _dated(g[["trade_date", "back_adj"]], "trade_date")["back_adj"]
            s.name = "backward_a"  # h5_writer.py:296
            yield ADJ_FILE, sym, "table", s


def export_ptrade_h5(
    wh: Warehouse,
    output_dir: str,
    symbols: list[str] | None = None,
    mode: str = "w",
) -> dict[str, int]:
    """Write the layout with pandas/PyTables. Returns {file: keys_written}.
    Raises ImportError when PyTables is absent (this sandbox)."""
    try:
        import tables  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "export_ptrade_h5 needs PyTables (`pip install tables`); "
            "the store layout itself is available via ptrade_h5_layout()"
        ) from e
    import os

    os.makedirs(output_dir, exist_ok=True)
    counts: dict[str, int] = {}
    modes: dict[str, str] = {}
    for fname, key, fmt, payload in ptrade_h5_layout(wh, symbols):
        path = os.path.join(output_dir, fname)
        m = modes.get(fname, mode)
        with pd.HDFStore(path, mode=m) as store:
            # reference compresses everything except the metadata Series
            kw = (
                {}
                if key == "metadata"
                else {"complevel": 9, "complib": "blosc"}
            )
            store.put(key, payload, format=fmt, **kw)
        modes[fname] = "a"  # first touch truncates, rest append
        counts[fname] = counts.get(fname, 0) + 1
    return counts
