"""Symbol-code conversion column expressions (operator C1, SURVEY §2.9).

Semantics match the reference's ``convert_to_ptrade_code`` /
``convert_from_ptrade_code`` (``simtradedata/utils/code_utils.py:9-94``):

  - BaoStock form ``sh.600000`` / ``sz.000001``  ⇄  PTrade form
    ``600000.SS`` / ``000001.SZ``.
  - Bare 6-digit codes are classified by first digit: ``6`` or ``5`` → ``.SS``
    (Shanghai), ``0`` or ``3`` → ``.SZ`` (Shenzhen); ``.SH`` is accepted as an
    alias of ``.SS``.

Implemented as pure Column expressions (``when``/``concat``/``split``) so they
stay inside whole-stage codegen — this is the most frequently applied function
in the reference codebase, so it must never be a Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_ptrade_code(col: Column | str) -> Column:
    """``sh.600000``/``sz.000001``/bare ``600000``/``600000.SH`` → ``600000.SS``."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(F.trim(c))
    num_dot = F.regexp_extract(c, r"^(?:sh|sz)\.(\d{6})$", 1)  # sh.600000
    num_suf = F.regexp_extract(c, r"^(\d{6})\.(?:ss|sh|sz)$", 1)  # 600000.SS/.SH
    num_bare = F.regexp_extract(c, r"^(\d{6})$", 1)
    num = F.when(num_dot != "", num_dot).when(num_suf != "", num_suf).otherwise(num_bare)
    explicit = F.when(
        c.rlike(r"^sh\.\d{6}$") | c.rlike(r"^\d{6}\.(ss|sh)$"), F.lit("SS")
    ).when(c.rlike(r"^sz\.\d{6}$") | c.rlike(r"^\d{6}\.sz$"), F.lit("SZ"))
    by_prefix = F.when(F.substring(num, 1, 1).isin("6", "5"), F.lit("SS")).otherwise(
        F.lit("SZ")
    )
    market = F.coalesce(explicit, by_prefix)
    return F.when(num == "", F.lit(None)).otherwise(F.concat_ws(".", num, market))


def is_index_code(col: Column | str) -> Column:
    """F3 stock-vs-index partition predicate: Shanghai ``000xxx.SS`` and
    Shenzhen ``399xxx.SZ`` codes are indices (``ptrade_data_api.py:121-122``,
    same rule ``baostock_fetcher.py:99-102``)."""
    c = F.upper(F.trim(F.col(col) if isinstance(col, str) else col))
    return (c.rlike(r"^000\d{3}\.SS$")) | (c.rlike(r"^399\d{3}\.SZ$"))


def split_stock_index(df, code_col: str = "symbol"):
    """F3 as a two-frame split: (stocks_df, indices_df)."""
    pred = is_index_code(code_col)
    return df.filter(~pred), df.filter(pred)


def from_ptrade_code(col: Column | str) -> Column:
    """``600000.SS`` → ``sh.600000``; ``000001.SZ`` → ``sz.000001``."""
    c = F.upper(F.trim(F.col(col) if isinstance(col, str) else col))
    num = F.regexp_extract(c, r"^(\d{6})\.(?:SS|SH|SZ)$", 1)
    market = F.when(c.endswith(".SZ"), F.lit("sz")).otherwise(F.lit("sh"))
    return F.when(num == "", F.lit(None)).otherwise(
        F.concat(market, F.lit("."), num)
    )
