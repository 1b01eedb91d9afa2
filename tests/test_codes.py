"""C1 symbol-code conversion round-trips (reference semantics:
``simtradedata/utils/code_utils.py:9-94``)."""

from pyspark.sql import functions as F

from simtradedata_spark.functions.codes import from_ptrade_code, to_ptrade_code

CASES = [
    ("sh.600000", "600000.SS"),
    ("sz.000001", "000001.SZ"),
    ("600000", "600000.SS"),
    ("000001", "000001.SZ"),
    ("300750", "300750.SZ"),
    ("510300", "510300.SS"),
    ("600519.SH", "600519.SS"),  # .SH alias
    ("000001.SZ", "000001.SZ"),
    ("688981.ss", "688981.SS"),
    ("garbage", None),
    ("12345", None),
]


def test_to_ptrade_code(spark):
    df = spark.createDataFrame([(c,) for c, _ in CASES], ["raw"])
    got = {
        r["raw"]: r["out"]
        for r in df.select("raw", to_ptrade_code("raw").alias("out")).collect()
    }
    for raw, expect in CASES:
        assert got[raw] == expect, f"{raw}: {got[raw]} != {expect}"


def test_from_ptrade_roundtrip(spark):
    codes = [c for _, c in CASES if c]
    df = spark.createDataFrame([(c,) for c in codes], ["ptrade"])
    rows = df.select(
        "ptrade",
        from_ptrade_code("ptrade").alias("bao"),
        to_ptrade_code(from_ptrade_code("ptrade")).alias("back"),
    ).collect()
    for r in rows:
        assert r["bao"].startswith(("sh.", "sz."))
        assert r["back"] == r["ptrade"], f"roundtrip {r['ptrade']} -> {r['back']}"
