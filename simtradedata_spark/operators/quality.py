"""Data-quality gates for bar pipelines — the row-level complement to the
reference's file-level integrity check (``h5_writer.py:511-537``, K6).

Each check is a named boolean Column over a bar frame; ``validate_bars``
evaluates them all in ONE aggregation pass (no per-check scans) and returns
a tall (check, n_violations) frame. At 100 TB this is a single map-side
combined groupBy-less agg — cost is one scan of the columns involved.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bar_checks(df: DataFrame | None = None) -> dict[str, Column]:
    """OHLC + suspension invariants (BaoStock suspension semantics: flat OHLC
    at preclose, zero volume — ``BaoStock_API_Reference.md:330``). Pass the
    frame to adapt the suspension indicator to its schema (`suspended`
    boolean or `trade_status` 0/1) and skip checks whose columns are absent."""
    c = F.col
    checks = {
        "low_le_open": c("low") <= c("open"),
        "low_le_close": c("low") <= c("close"),
        "open_le_high": c("open") <= c("high"),
        "close_le_high": c("close") <= c("high"),
        "positive_prices": (c("low") > 0) & (c("high") > 0),
        "nonneg_volume": c("volume") >= 0,
        "nonneg_money": c("money") >= 0,
    }
    cols = set(df.columns) if df is not None else {"suspended", "preclose"}
    susp = None
    if "suspended" in cols:
        susp = c("suspended")
    elif "trade_status" in cols:
        susp = c("trade_status") == 0
    if susp is not None and "preclose" in cols:
        checks["suspended_flat"] = ~susp | (
            (c("open") == c("preclose"))
            & (c("close") == c("preclose"))
            & (c("volume") == 0)
        )
    return checks


def validate_bars(
    bars: DataFrame, checks: dict[str, Column] | None = None
) -> DataFrame:
    """(check, n_violations, n_rows) — all checks in one pass."""
    checks = checks or bar_checks(bars)
    aggs = [
        F.sum(F.when(~expr, 1).otherwise(0)).alias(name)
        for name, expr in checks.items()
    ] + [F.count(F.lit(1)).alias("__n")]
    row = bars.agg(*aggs)
    stack_expr = ", ".join(f"'{name}', {name}" for name in checks)
    return row.selectExpr(
        f"stack({len(checks)}, {stack_expr}) AS (check, n_violations)",
        "__n AS n_rows",
    )


def anomaly_flags(
    df: DataFrame,
    by: list[str],
    order_col: str,
    price_col: str = "close",
    vol_col: str = "volume",
    jump_threshold: float = 0.20,
    vol_multiple: float = 5.0,
) -> DataFrame:
    """The reference's §5.3 anomaly rules (``DATA_MAPPING.md:643-647``) as
    window flags: ``is_price_jump`` — |day-over-day change| beyond ±20%;
    ``is_zero_volume``; ``is_extreme_volume`` — volume above ``vol_multiple``
    × the per-key median. One shuffle on the key serves both the lag and the
    median (exact ``percentile``; swap for ``approx_percentile`` at 100 TB
    where exact per-key sort is not worth it)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*by).orderBy(order_col)
    whole = Window.partitionBy(*by)
    prev = F.lag(price_col).over(w)
    med = F.expr(f"percentile({vol_col}, 0.5)").over(whole)
    return (
        df.withColumn(
            "is_price_jump",
            F.when(
                prev.isNotNull(),
                F.abs(F.col(price_col) / prev - 1) > jump_threshold,
            ).otherwise(F.lit(False)),
        )
        .withColumn("is_zero_volume", F.col(vol_col) == 0)
        .withColumn("is_extreme_volume", F.col(vol_col) > vol_multiple * med)
    )


def quarantine(
    df: DataFrame, checks: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Split (clean, quarantined) in one predicate: quarantined rows carry a
    ``failed_checks`` array naming every violated invariant."""
    failed = F.array_compact(
        F.array(
            *[F.when(~expr, F.lit(name)) for name, expr in checks.items()]
        )
    )
    tagged = df.withColumn("failed_checks", failed)
    clean = tagged.filter(F.size("failed_checks") == 0).drop("failed_checks")
    bad = tagged.filter(F.size("failed_checks") > 0)
    return clean, bad


def frame_diff(
    left,
    right,
    keys: list[str],
    compare_cols: list[str] | None = None,
):
    """Reconciliation between two relations sharing a key (warehouse vs a
    provider re-fetch, two store versions, primary vs replica): one
    full-outer join on the keys, per-column null-safe comparison. Returns
    only the disagreeing keys with ``_status`` ∈ missing_left /
    missing_right / mismatch and ``_diff_cols`` naming the fields that
    differ — the audit a K6-style nightly integrity job runs after an
    incremental ingest. Cost is O(|L|+|R|) with column pruning to
    keys + compared columns."""
    from pyspark.sql import functions as F

    cols = compare_cols or [
        c for c in left.columns if c in right.columns and c not in keys
    ]
    # presence can't be read off nullable value columns alone when a row is
    # legitimately all-null — tag each side explicitly before the join
    l = left.select(*keys, *cols, F.lit(1).alias("__lp")).alias("__l")
    r = right.select(*keys, *cols, F.lit(1).alias("__rp")).alias("__r")
    j = l.join(r, keys, "full_outer")
    diff_cols = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(f"__l.{c}").eqNullSafe(F.col(f"__r.{c}")), F.lit(c)
                )
                for c in cols
            ]
        )
    )
    status = (
        F.when(F.col("__l.__lp").isNull(), F.lit("missing_left"))
        .when(F.col("__r.__rp").isNull(), F.lit("missing_right"))
        .when(F.size(diff_cols) > 0, F.lit("mismatch"))
    )
    # _diff_cols only means something for mismatches — for missing rows
    # every populated column on the present side "differs" from null, which
    # would poison any per-column mismatch aggregation downstream.
    return (
        j.withColumn("_status", status)
        .filter(F.col("_status").isNotNull())
        .select(
            *keys,
            "_status",
            F.when(F.col("_status") == "mismatch", diff_cols)
            .otherwise(F.array().cast("array<string>"))
            .alias("_diff_cols"),
        )
    )
