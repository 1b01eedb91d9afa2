"""Unit tests for the local correctness comparator (tools/check_correctness.py).

The comparator is the local stand-in for the driver's byte-hash gate, so its
blind spots become driver-only REDs (r5: macd_indicators signed zero). These
tests pin the divergence classes it must flag.
"""

from __future__ import annotations

import importlib.util
import os

import pandas as pd

_SPEC = importlib.util.spec_from_file_location(
    "check_correctness",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools", "check_correctness.py"),
)
cc = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(cc)


def test_flags_signed_zero_divergence():
    # -0.0 == 0.0 numerically, but the driver byte-hashes: must be flagged.
    a = pd.DataFrame({"x": [0.0, 1.5, -2.0]})
    b = pd.DataFrame({"x": [-0.0, 1.5, -2.0]})
    problems = cc.compare("t", a, b)
    assert any("signed-zero" in p for p in problems), problems


def test_equal_negative_zeros_pass():
    # Same multiset of -0.0 cells on both engines hashes identically: no flag.
    a = pd.DataFrame({"x": [-0.0, 1.5]})
    b = pd.DataFrame({"x": [1.5, -0.0]})
    assert cc.compare("t", a, b) == []


def test_flags_dtype_kind_mismatch():
    a = pd.DataFrame({"n": pd.Series([1, 2], dtype="int64")})
    b = pd.DataFrame({"n": pd.Series([1.0, 2.0], dtype="float64")})
    problems = cc.compare("t", a, b)
    assert any("dtype-kind" in p for p in problems), problems


def test_flags_value_difference():
    a = pd.DataFrame({"x": [1.0, 2.0]})
    b = pd.DataFrame({"x": [1.0, 2.0000001]})
    # differs beyond the 6dp canonical rounding? 2.0000001 rounds to 2.0 — equal.
    assert cc.compare("t", a, b) == []
    b2 = pd.DataFrame({"x": [1.0, 2.001]})
    assert any("values differ" in p for p in cc.compare("t", a, b2))
