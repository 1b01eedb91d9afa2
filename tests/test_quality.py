"""Row-level data-quality gates over bars."""

from pyspark.sql import functions as F

from simtradedata_spark.operators.quality import bar_checks, quarantine, validate_bars


def test_synthetic_bars_pass_all_checks(spark, market):
    bars = market.bars()
    out = validate_bars(bars).collect()
    assert all(r["n_violations"] == 0 for r in out), out
    assert out[0]["n_rows"] == bars.count()


def test_validate_and_quarantine_catch_violations(spark):
    rows = [
        # symbol, date, open, high, low, close, preclose, volume, money, susp
        ("a", "2022-01-03", 10.0, 11.0, 9.0, 10.5, 10.0, 100.0, 1000.0, False),
        ("a", "2022-01-04", 12.0, 11.0, 9.0, 10.5, 10.5, 100.0, 1000.0, False),  # open>high
        ("a", "2022-01-05", 10.0, 11.0, 9.0, 10.5, 10.5, -5.0, 1000.0, False),   # volume<0
        ("a", "2022-01-06", 10.0, 11.0, 9.0, 10.5, 10.0, 50.0, 500.0, True),     # susp not flat
    ]
    df = spark.createDataFrame(
        rows,
        "symbol string, trade_date string, open double, high double, low double,"
        " close double, preclose double, volume double, money double, suspended boolean",
    )
    got = {r["check"]: r["n_violations"] for r in validate_bars(df).collect()}
    assert got["open_le_high"] == 1
    assert got["nonneg_volume"] == 1
    assert got["suspended_flat"] == 1
    assert got["low_le_open"] == 0

    clean, bad = quarantine(df, bar_checks(df))
    assert clean.count() == 1
    labels = {r["trade_date"]: set(r["failed_checks"]) for r in bad.collect()}
    assert labels["2022-01-04"] == {"open_le_high"}
    assert labels["2022-01-05"] == {"nonneg_volume"}
    assert labels["2022-01-06"] == {"suspended_flat"}


def test_anomaly_flags_planted(spark):
    """§5.3 anomaly rules (DATA_MAPPING.md:643-647) on planted cases."""
    from simtradedata_spark.operators.quality import anomaly_flags

    rows = [
        ("a", "2022-01-03", 10.0, 100.0),
        ("a", "2022-01-04", 10.5, 100.0),   # +5% — normal
        ("a", "2022-01-05", 13.0, 100.0),   # +23.8% — jump
        ("a", "2022-01-06", 13.0, 0.0),     # zero volume
        ("a", "2022-01-07", 13.0, 900.0),   # 9x median — extreme
        ("b", "2022-01-03", 50.0, 100.0),   # first row of key: never a jump
    ]
    df = spark.createDataFrame(
        rows, "symbol string, trade_date string, close double, volume double"
    )
    got = {
        (r["symbol"], r["trade_date"]): r
        for r in anomaly_flags(df, ["symbol"], "trade_date").collect()
    }
    assert got[("a", "2022-01-05")]["is_price_jump"]
    assert not got[("a", "2022-01-04")]["is_price_jump"]
    assert not got[("b", "2022-01-03")]["is_price_jump"]  # lag is null
    assert got[("a", "2022-01-06")]["is_zero_volume"]
    assert got[("a", "2022-01-07")]["is_extreme_volume"]
    assert not got[("a", "2022-01-03")]["is_extreme_volume"]


def test_frame_diff_reconciliation(spark):
    """Warehouse-vs-provider recon: missing rows on either side and
    per-column mismatches surface; agreeing keys (incl. null-for-null)
    don't."""
    from simtradedata_spark.operators.quality import frame_diff

    wh = spark.createDataFrame(
        [
            ("S1", "2022-01-03", 10.0, 100.0),
            ("S1", "2022-01-04", 11.0, None),    # null matches null
            ("S2", "2022-01-03", 20.0, 200.0),   # provider disagrees on volume
            ("S3", "2022-01-03", 30.0, 300.0),   # provider lost this row
        ],
        "symbol string, trade_date string, close double, volume double",
    )
    prov = spark.createDataFrame(
        [
            ("S1", "2022-01-03", 10.0, 100.0),
            ("S1", "2022-01-04", 11.0, None),
            ("S2", "2022-01-03", 20.0, 999.0),
            ("S4", "2022-01-03", 40.0, 400.0),   # warehouse never ingested
        ],
        "symbol string, trade_date string, close double, volume double",
    )
    out = {
        (r["symbol"], r["trade_date"]): r
        for r in frame_diff(wh, prov, ["symbol", "trade_date"]).collect()
    }
    assert set(out) == {
        ("S2", "2022-01-03"), ("S3", "2022-01-03"), ("S4", "2022-01-03")
    }
    assert out[("S2", "2022-01-03")]["_status"] == "mismatch"
    assert out[("S2", "2022-01-03")]["_diff_cols"] == ["volume"]
    assert out[("S3", "2022-01-03")]["_status"] == "missing_right"
    assert out[("S4", "2022-01-03")]["_status"] == "missing_left"
