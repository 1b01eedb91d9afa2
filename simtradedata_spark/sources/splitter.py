"""Declarative column routing — operators P1/P2/J2 (SURVEY §2.3, §2.5).

The reference routes the unified 14-field fetch row into three datasets via
the ``DATA_ROUTING`` config table (``processors/data_splitter.py:17-42``) and
assembles quarterly fundamentals by index-aligned outer join of five provider
tables (``converters/data_converter.py:206-223``). Both are kept as *data*
driving generated ``select``s — the reference's one genuinely good
architectural idea (SURVEY §4 "routing config as data"), which ports to
Spark as-is.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# target dataset -> {source column -> target column}
# (rename maps from data_splitter.py:17-42 / data_converter.py:26-69:
#  amount→money, peTTM→pe_ttm, pbMRQ→pb, psTTM→ps_ttm, pcfNcfTTM→pcf,
#  turn→turnover_rate; our unified schema already uses target names, so the
#  maps here are identity-with-selection plus the documented aliases.)
DATA_ROUTING: dict[str, dict[str, str]] = {
    "market": {
        "symbol": "symbol",
        "trade_date": "trade_date",
        "open": "open",
        "high": "high",
        "low": "low",
        "close": "close",
        "volume": "volume",
        "amount": "money",       # provider name → PTrade name
        "money": "money",
    },
    "valuation": {
        "symbol": "symbol",
        "trade_date": "trade_date",
        "peTTM": "pe_ttm",
        "pe_ttm": "pe_ttm",
        "pbMRQ": "pb",
        "pb": "pb",
        "psTTM": "ps_ttm",
        "ps_ttm": "ps_ttm",
        "pcfNcfTTM": "pcf",
        "pcf": "pcf",
        "turn": "turnover_rate",
        "turnover_rate": "turnover_rate",
    },
    "status": {
        "symbol": "symbol",
        "trade_date": "trade_date",
        "isST": "is_st",
        "is_st": "is_st",
        "tradestatus": "trade_status",
        "trade_status": "trade_status",
    },
}

# canonical output order per dataset (P2: reference reindex(columns=...),
# data_converter.py:104-106 — absent columns materialize as typed nulls)
CANONICAL_ORDER: dict[str, list[str]] = {
    "market": ["symbol", "trade_date", "close", "open", "high", "low", "volume", "money"],
    "valuation": [
        "symbol", "trade_date", "pe_ttm", "pb", "ps_ttm", "pcf",
        "turnover_rate", "total_shares", "total_value", "float_value",
    ],
    "status": ["symbol", "trade_date", "is_st", "trade_status"],
}


def split_unified(unified: DataFrame) -> dict[str, DataFrame]:
    """Unified wide rows → {market, valuation, status} projections.

    One scan feeds all three (the reference's −33%-API-calls fusion,
    ``README.md:110-136``); inside Spark the three selects share the scan via
    plan reuse, and column pruning trims each branch independently."""
    out: dict[str, DataFrame] = {}
    for target, colmap in DATA_ROUTING.items():
        present = {src: dst for src, dst in colmap.items() if src in unified.columns}
        dedup: dict[str, str] = {}
        for src, dst in present.items():
            dedup.setdefault(dst, src)
        projected = unified.select(
            *[F.col(src).alias(dst) for dst, src in dedup.items()]
        )
        order = CANONICAL_ORDER[target]
        cols = [
            F.col(c) if c in projected.columns else F.lit(None).cast("double").alias(c)
            for c in order
        ]
        out[target] = projected.select(*cols)
    return out


def assemble_quarterly(tables: list[DataFrame], keys=("symbol", "end_date")) -> DataFrame:
    """J2: index-aligned outer join of per-category quarterly tables
    (profit/operation/growth/balance/cashflow), dropping duplicate columns —
    chained ``outer`` equi-joins instead of pandas axis-1 concat."""
    def join2(a: DataFrame, b: DataFrame) -> DataFrame:
        dup = [c for c in b.columns if c in a.columns and c not in keys]
        return a.join(b.drop(*dup), list(keys), "outer")

    return reduce(join2, tables)
