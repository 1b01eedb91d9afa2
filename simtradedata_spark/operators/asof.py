"""As-of (point-in-time) join — operator J5 in SURVEY §2.5.

Reference semantics: ``get_fundamentals(..., date=...)`` must return the most
recent report *published* on or before the query date
(``docs/PTrade_API_mini_Reference.md:3316,3384-3394,6219``) — i.e. a backward
as-of join on publication date, never looking ahead.

Spark lacks a native as-of join. The naive range-join
(``l.ts >= r.ts`` + ``row_number() = 1``) explodes to |L|×|R| per key before
filtering, which is catastrophic at 100 TB. This implementation uses the
scalable **union + last(ignoreNulls) window** formulation instead:

    1. tag right rows, union left and right on (keys, ts, tag);
    2. one window per key ordered by (ts, tag) carries the latest right
       payload forward via ``last(struct, ignoreNulls=True)`` — a single
       struct so the newest right row is taken atomically even when some of
       its payload fields are null;
    3. keep only left rows.

Cost: ONE shuffle of |L|+|R| rows (sort within key), no intermediate blow-up,
no skew amplification — the same shape as a sort-merge join, which is optimal
for this operator. Works for both inclusive (right.ts <= left.ts, the
pd.merge_asof default) and strict (right.ts < left.ts) matching.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | None = None,
    right_cols: list[str] | None = None,
    strict: bool = False,
    tolerance: Column | None = None,
    suffix: str = "",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right[on] <= left[on]`` (or ``<`` when ``strict``), per ``by`` keys.
    ``direction="forward"`` attaches the NEAREST FUTURE right row instead
    (``right[on] >= left[on]``, or ``>`` when strict) — the same single
    union+window plan with the time ordering reversed; within-timestamp
    tag semantics are direction-invariant.

    Output = all left columns + the chosen ``right_cols`` (suffixed with
    ``suffix`` on name collision) + ``__asof_matched_<on>`` (the matched right
    timestamp; null when no match). Right-side ties on ``on`` resolve to the
    row that sorts last by the payload columns (deterministic).

    tolerance: optional Column over the output (may reference left columns and
    ``__asof_matched_<on>``); when false the match is nulled out, e.g.
    ``F.col(on) <= F.expr("__asof_matched_ts + interval 30 days")``.
    """
    by = by or []
    # A null-timestamped right row has no as-of position — pandas merge_asof
    # and DuckDB ASOF JOIN both exclude null keys. Without this filter the
    # nulls-first ordering below would sort such a row ahead of every real
    # row and carry its payload into left rows that have no true match.
    right = right.filter(F.col(on).isNotNull())
    payload = right_cols or [c for c in right.columns if c != on and c not in by]
    out_names = {
        c: (c + suffix if (c in left.columns and c != on and c not in by) else c)
        for c in payload
    }
    matched_col = f"__asof_matched_{on}"

    l_tag, r_tag = (0, 1) if strict else (1, 0)
    rstruct = F.struct(
        F.col(on).alias("__ts"), *[F.col(c).alias(c) for c in payload]
    )
    lhs = left.select(
        *by,
        F.col(on).alias("__asof_on"),
        F.lit(l_tag).alias("__tag"),
        F.monotonically_increasing_id().alias("__seq"),
        F.struct(*left.columns).alias("__left"),
        F.lit(None).cast(
            "struct<__ts:" + right.schema[on].dataType.simpleString() + ","
            + ",".join(
                f"{c}:{right.schema[c].dataType.simpleString()}" for c in payload
            )
            + ">"
        ).alias("__right"),
    )
    rhs = right.select(
        *by,
        F.col(on).alias("__asof_on"),
        F.lit(r_tag).alias("__tag"),
        F.monotonically_increasing_id().alias("__seq"),
        F.lit(None).cast(lhs.schema["__left"].dataType).alias("__left"),
        rstruct.alias("__right"),
    )
    unioned = lhs.unionByName(rhs)

    # Secondary sort on the payload struct makes equal-ts right rows resolve
    # deterministically; __seq breaks exact full ties.
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward or forward, got {direction!r}")
    # desc_nulls_FIRST mirrors backward's asc-nulls-first placement: a left
    # row with a NULL as-of time must match nothing in either direction
    # (desc's default nulls-last would hand it the earliest right row).
    order_ts = (
        F.col("__asof_on").desc_nulls_first()
        if direction == "forward"
        else F.col("__asof_on").asc()
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(order_ts, "__tag", "__right", "__seq")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "__tag",
        "__left",
        F.last("__right", ignorenulls=True).over(w).alias("__match"),
    )
    out = carried.filter(F.col("__tag") == l_tag).select(
        F.col("__left.*"),
        *[F.col(f"__match.{c}").alias(out_names[c]) for c in payload],
        F.col("__match.__ts").alias(matched_col),
    )
    if tolerance is not None:
        keep = tolerance
        out = out.select(
            *[c for c in left.columns],
            *[
                F.when(keep, F.col(out_names[c])).alias(out_names[c])
                for c in payload
            ],
            F.when(keep, F.col(matched_col)).alias(matched_col),
        )
    return out
