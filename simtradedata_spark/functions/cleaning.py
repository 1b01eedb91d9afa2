"""Scalar cleaning/coercion expressions (operators C2-C5, P3-P5; SURVEY §2.9).

Reference semantics:
  - percent-string handling for ``turnover_rate`` ("带%的字符串",
    ``docs/PTrade_API_mini_Reference.md:6215-6216``) → strip ``%``, /100.
  - string→numeric coercion with invalid→null
    (``unified_fetcher.py:139-143``) → plain ``cast`` (same null semantics).
  - date ⇄ int yyyymmdd keys (``data_converter.py:356``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_percent(col: Column | str) -> Column:
    """``"1.23%"`` → 0.0123; plain numeric strings pass through /100-free?
    No — reference stores turnover as percent units; this helper returns the
    numeric percent value (``"1.23%"`` → 1.23), invalid → null."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(c), "%$", "").cast("double")


def yyyymmdd_int(col: Column | str) -> Column:
    """DATE → int64 yyyymmdd key (exrights surface, ``data_converter.py:356``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyyMMdd").cast("long")


def to_numeric(col: Column | str) -> Column:
    """String → double, invalid → null (pd.to_numeric(errors='coerce') parity)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("double")
