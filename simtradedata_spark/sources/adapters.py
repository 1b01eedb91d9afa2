"""Provider adapters: native provider row shapes → the unified 14-field row.

The reference's ``unified_fetcher.py:20-34`` defines the field contract every
provider must emit; its BaoStock fetcher (``baostock_fetcher.py:69-266``)
renames/coerces BaoStock's all-string k-data rows into it. This module is
that edge for THIS engine: pure-pandas, picklable functions usable both as a
``fetch_unified`` provider (mapInPandas fan-out) and as the ``provider``
option of the ``simtrade_provider`` Python DataSource.

No network client ships here (sandbox): a real BaoStock integration wraps
``bs.query_history_k_data_plus`` and hands its result_frame to
``baostock_to_unified`` unchanged — the adapter is the seam, the transport is
the user's. ``make_baostock_csv_provider`` binds the same adapter to a
recorded CSV fixture, which is how the integration test proves a
non-synthetic provider slots into every downstream stage.
"""

from __future__ import annotations

import functools

import pandas as pd

# BaoStock query_history_k_data_plus (d-frequency) native columns → unified
# names — the same map the reference applies (baostock_fetcher.py:137-170 /
# data_splitter.py:17-42: amount→money, turn→turnover_rate, peTTM→pe_ttm,
# pbMRQ→pb, psTTM→ps_ttm, pcfNcfTTM→pcf, isST→is_st, tradestatus→trade_status).
BAOSTOCK_RENAMES = {
    "date": "trade_date",
    "code": "symbol",
    "open": "open",
    "high": "high",
    "low": "low",
    "close": "close",
    "volume": "volume",
    "amount": "money",
    "turn": "turnover_rate",
    "peTTM": "pe_ttm",
    "pbMRQ": "pb",
    "psTTM": "ps_ttm",
    "pcfNcfTTM": "pcf",
    "isST": "is_st",
    "tradestatus": "trade_status",
}

UNIFIED_COLUMNS = [
    "symbol", "trade_date", "open", "high", "low", "close", "volume",
    "money", "pe_ttm", "pb", "ps_ttm", "pcf", "turnover_rate", "is_st",
    "trade_status",
]

_NUMERIC = [
    "open", "high", "low", "close", "volume", "money", "pe_ttm", "pb",
    "ps_ttm", "pcf", "turnover_rate",
]


def baostock_code_to_ptrade(code: str) -> str:
    """``sh.600000`` → ``600000.SS``; ``sz.000001`` → ``000001.SZ``
    (code_utils.py's market-prefix convention, pandas-side)."""
    market, _, num = code.partition(".")
    return f"{num}.{'SS' if market.lower() == 'sh' else 'SZ'}"


def ptrade_code_to_baostock(code: str) -> str:
    num, _, suffix = code.partition(".")
    return f"{'sh' if suffix == 'SS' else 'sz'}.{num}"


def baostock_to_unified(pdf: pd.DataFrame) -> pd.DataFrame:
    """BaoStock result_frame (ALL columns are strings, '' = missing) →
    unified wide frame: rename (P1), string→numeric coercion (P3), date
    normalize (P4), code conversion (C1), canonical order + typed null
    fill (P2). Extra provider columns (preclose, pctChg, adjustflag) drop;
    absent ones materialize as nulls."""
    present = {src: dst for src, dst in BAOSTOCK_RENAMES.items() if src in pdf.columns}
    out = pdf[list(present)].rename(columns=present)
    if "symbol" in out.columns:
        out["symbol"] = out["symbol"].map(baostock_code_to_ptrade)
    if "trade_date" in out.columns:
        out["trade_date"] = pd.to_datetime(out["trade_date"]).dt.date
    for c in _NUMERIC:
        if c in out.columns:
            out[c] = pd.to_numeric(out[c], errors="coerce")
    for c in ("is_st", "trade_status"):
        if c in out.columns:
            out[c] = (
                pd.to_numeric(out[c], errors="coerce").fillna(0).astype("int8")
            )
    for c in UNIFIED_COLUMNS:
        if c not in out.columns:
            out[c] = pd.Series([None] * len(out), dtype="float64")
    return out[UNIFIED_COLUMNS]


def _csv_provider(symbol: str, start: str, end: str, path: str) -> pd.DataFrame:
    """Recorded-fixture provider: the CSV holds BaoStock-native rows; each
    call slices one symbol's date range, exactly as the RPC would."""
    raw = pd.read_csv(path, dtype=str)
    code = ptrade_code_to_baostock(symbol)
    sliced = raw[(raw["code"] == code) & (raw["date"] >= start) & (raw["date"] <= end)]
    return baostock_to_unified(sliced)


def make_baostock_csv_provider(path: str):
    """Provider factory for ``fetch_unified`` / the DataSource ``provider``
    option — a partial of a module-level function, so it pickles to
    executors."""
    return functools.partial(_csv_provider, path=path)


# BaoStock query_adjust_factor native columns → the warehouse adjust-factor
# names (reference ``baostock_fetcher.py:85-119``: the RPC returns EVENT rows
# keyed by ``dividOperateDate`` — not daily rows — with string factors).
BAOSTOCK_ADJUST_RENAMES = {
    "code": "symbol",
    "dividOperateDate": "trade_date",
    "foreAdjustFactor": "fore_adj",
    "backAdjustFactor": "back_adj",
}

ADJUST_EVENT_COLUMNS = ["symbol", "trade_date", "fore_adj", "back_adj"]


def baostock_adjust_to_unified(pdf: pd.DataFrame) -> pd.DataFrame:
    """BaoStock adjust-factor result_frame → typed event rows
    (symbol, trade_date, fore_adj, back_adj). An EMPTY input returns an
    empty frame with the full column set — the reference treats an empty
    answer for an index code as expected, not an error
    (``baostock_fetcher.py:96-104``), and downstream ``adjust_bars``
    defaults missing factors to 1 (index series pass through unadjusted)."""
    if pdf.empty:
        return pd.DataFrame({c: pd.Series(dtype="object") for c in ADJUST_EVENT_COLUMNS})
    present = {s: d for s, d in BAOSTOCK_ADJUST_RENAMES.items() if s in pdf.columns}
    out = pdf[list(present)].rename(columns=present)
    out["symbol"] = out["symbol"].map(baostock_code_to_ptrade)
    out["trade_date"] = pd.to_datetime(out["trade_date"]).dt.date
    for c in ("fore_adj", "back_adj"):
        out[c] = pd.to_numeric(out[c], errors="coerce")
    return out[ADJUST_EVENT_COLUMNS]


def _adjust_csv_provider(symbol: str, start: str, end: str, path: str) -> pd.DataFrame:
    """Recorded adjust-factor fixture provider: slices one symbol's event
    rows, as ``bs.query_adjust_factor`` would. Index codes are simply
    absent from the fixture → empty frame, the RPC's documented answer."""
    raw = pd.read_csv(path, dtype=str)
    code = ptrade_code_to_baostock(symbol)
    sliced = raw[
        (raw["code"] == code)
        & (raw["dividOperateDate"] >= start)
        & (raw["dividOperateDate"] <= end)
    ]
    return baostock_adjust_to_unified(sliced)


def make_baostock_adjust_csv_provider(path: str):
    return functools.partial(_adjust_csv_provider, path=path)


# Mootdx client.bars native columns → unified names. The reference's
# mootdx_fetcher.py:89-217 documents the dialect: numeric (not string)
# columns, 'vol' is the share volume ('volume' there is a different
# field and is dropped), 'amount' is the money column, the date lives in
# a 'datetime' column/index, the frame carries NO symbol column, and the
# provider serves OHLCV ONLY — valuation/status fields come from
# BaoStock ("Use BaoStockFetcher for those fields").
MOOTDX_RENAMES = {
    "datetime": "trade_date",
    "date": "trade_date",
    "open": "open",
    "high": "high",
    "low": "low",
    "close": "close",
    "vol": "volume",
    "amount": "money",
}


def mootdx_to_unified(pdf: pd.DataFrame, symbol: str) -> pd.DataFrame:
    """Mootdx bars frame → unified wide frame: rename (vol→volume,
    amount→money), date normalize, inject the PTrade symbol (mootdx rows
    carry none), numeric coercion, canonical order with the valuation /
    status columns as typed nulls — exactly the OHLCV-only contract the
    reference's mootdx path produces before the BaoStock merge."""
    pdf = pdf.reset_index() if "datetime" not in pdf.columns and "date" not in pdf.columns else pdf
    present = {src: dst for src, dst in MOOTDX_RENAMES.items() if src in pdf.columns}
    out = pdf[list(present)].rename(columns=present)
    out = out.loc[:, ~out.columns.duplicated()]
    out["symbol"] = symbol
    if "trade_date" in out.columns:
        out["trade_date"] = pd.to_datetime(out["trade_date"]).dt.date
    for c in _NUMERIC:
        if c in out.columns:
            out[c] = pd.to_numeric(out[c], errors="coerce")
    for c in UNIFIED_COLUMNS:
        if c not in out.columns:
            if c in ("is_st", "trade_status"):
                out[c] = pd.Series([None] * len(out), dtype="object")
            else:
                out[c] = pd.Series([None] * len(out), dtype="float64")
    return out[UNIFIED_COLUMNS]


def _mootdx_csv_provider(symbol: str, start: str, end: str, path: str) -> pd.DataFrame:
    """Recorded-fixture mootdx provider: the CSV holds mootdx-native bars
    per simple code; slices one symbol's range like the client would
    (newest-first pagination is the caller's concern — provider.paginated
    reproduces the 800-bar chunking the reference walks)."""
    raw = pd.read_csv(path)
    num = symbol.partition(".")[0]
    sliced = raw[
        (raw["code"].astype(str).str.zfill(6) == num)
        & (raw["datetime"] >= start)
        & (raw["datetime"] <= end)
    ].drop(columns=["code"])
    return mootdx_to_unified(sliced, symbol)


def make_mootdx_csv_provider(path: str):
    return functools.partial(_mootdx_csv_provider, path=path)


def _fallback(symbol: str, start: str, end: str, primary, secondary) -> pd.DataFrame:
    """Provider-level fallback (the unified_fetcher posture: BaoStock
    primary, mootdx secondary): a primary failure or empty answer for
    THIS symbol falls through to the secondary — per-symbol, so one
    provider's outage never blanks the batch."""
    try:
        out = primary(symbol, start, end)
        if len(out):
            return out
    except Exception:
        pass
    return secondary(symbol, start, end)


def make_fallback_provider(primary, secondary):
    """Compose two providers into one ``fetch_unified``-compatible
    callable. Both args must be picklable (module-level functions or
    partials of them) so the composition ships to executors."""
    return functools.partial(_fallback, primary=primary, secondary=secondary)
