"""Incremental view maintenance (IVM) for JOIN views.

``hypertable.refresh_rollup`` maintains AGGREGATE views incrementally; this
module does the same for join views under insert-only deltas — the textbook
delta rule:

    V       = A ⋈ B
    V'      = V  ∪  (ΔA ⋈ B)  ∪  (A ⋈ ΔB)  ∪  (ΔA ⋈ ΔB)

so a refresh touches O(Δ · matched rows), never the full A ⋈ B recompute.
This is the incremental-ETL shape a 100 TB nightly pipeline needs: the big
sides A and B are the retained base tables (already in the warehouse —
IVM's auxiliary state is the warehouse itself), the deltas are the day's
arrivals, and each delta join is a small-probe join where the delta side
broadcasts when it fits.

Insert-only by design: updates/deletes need retraction (counted bags /
z-sets); with last-writer-wins keyed tables, model an update as
``incremental_merge`` on the base THEN a keyed overwrite of affected view
rows instead. Equivalence with a full recompute is oracle-checked
(queries.py::ivm_join_view) and property-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def delta_join_refresh(
    view: DataFrame,
    a_old: DataFrame,
    delta_a: DataFrame,
    b_old: DataFrame,
    delta_b: DataFrame,
    on: list[str] | str,
    broadcast_deltas: bool = True,
) -> DataFrame:
    """Maintain ``view = a ⋈ b`` (inner, bag semantics) under inserts.

    ``broadcast_deltas`` hints the usual asymmetry (deltas ≪ bases); pass
    False when a day's delta is itself huge and should shuffle."""
    da = F.broadcast(delta_a) if broadcast_deltas else delta_a
    db = F.broadcast(delta_b) if broadcast_deltas else delta_b
    # unionByName aligns the differing join output orders (a⋈Δb vs Δa⋈b)
    return (
        view.unionByName(a_old.join(db, on))
        .unionByName(da.join(b_old, on))
        .unionByName(da.join(db, on))
    )
