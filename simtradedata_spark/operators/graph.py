"""Near-dup clustering: connected components over a candidate-pair graph.

The step AFTER candidate generation in a dedup pipeline: MinHash/SimHash
emit near-dup PAIRS, but retention decisions need CLUSTERS (keep one doc
per group of mutual near-dups, even when A~B and B~C but A!~C).

Algorithm: min-label propagation (a.k.a. hash-to-min) — every node starts
labeled with its own id; each round, every node takes the min label among
itself and its neighbors; converges to the component minimum in
O(graph diameter) rounds. This is the standard Spark-native connected
components (GraphX/GraphFrames use the same small-step iteration), chosen
over union-find because it is pure joins + aggregations:

  per round: one shuffle join (labels onto the symmetric edge list) +
  one groupBy(node) min + one join back. Near-dup graphs are forests of
  tiny cliques (diameter 2-4), so 3-5 rounds close real corpora.

Driver-side loop notes (the part that bites at 100 TB):
  - `localCheckpoint` each round truncates the lineage — without it the
    plan doubles per iteration and the job eventually dies in the planner;
  - convergence is detected with a count of changed labels (one extra
    action per round, bounded by the label table);
  - `max_iter` caps the walk for adversarial chains (a 100 TB corpus with
    a diameter-20 dup chain is data corruption, not dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(src, dst) pairs → (id, component) where component = min node id
    reachable — deterministic, partitioning-invariant canonical labels."""
    # Materialize the edge list ONCE: `edges` is lazy, and without this the
    # whole upstream pipeline (e.g. minhash signature + band join) re-executes
    # on every propagation round (measured 3x the total runtime).
    # sym and the init labels stay EAGER: each has TWO consumers inside
    # round 1's first job (labels' groupBy + the two joins), and a lazy
    # checkpoint with concurrent consumers races to compute the expensive
    # upstream (minhash banding) in parallel stages before the cache
    # fills — measured 4.0 -> 15.6 s median with 6-23 s spread on
    # dedup_clusters at sf0.1 when these two were lazy. Only the
    # per-round new_labels checkpoint is safe to defer (single consumer:
    # its own changed-count materializes it immediately, before the next
    # round's joins read it twice).
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    # Round 1 fused into label init: after one propagation round every
    # node's label is min(own id, min neighbor id), which the symmetric
    # edge list yields with ONE groupBy — no join, no separate identity
    # label table, and (since sym is symmetric) the same node set the old
    # distinct-u init produced. Saves a full join+checkpoint+changed-count
    # round; the propagated trajectory from here is identical.
    labels = (
        sym.groupBy("u")
        .agg(F.min("v").alias("__nmin"))
        .select(
            F.col("u").alias("id"),
            F.least(F.col("u"), F.col("__nmin")).alias("comp"),
        )
        .localCheckpoint()
    )
    for _ in range(max_iter - 1):
        neigh_min = (
            sym.join(labels, sym.v == labels.id)
            .groupBy("u")
            .agg(F.min("comp").alias("ncomp"))
        )
        # The changed flag rides INSIDE the checkpointed frame (new label
        # differs iff a neighbor's label beats the own one), so detecting
        # convergence is a scan-and-count of the blocks this round just
        # materialized — the old shape re-joined new labels against old
        # (an extra shuffle join per round, ~2x the round's job count).
        new_labels = (
            labels.join(neigh_min, labels.id == neigh_min.u, "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce(F.col("ncomp"), F.col("comp"))
                ).alias("comp"),
                F.coalesce(
                    F.col("ncomp") < F.col("comp"), F.lit(False)
                ).alias("__chg"),
            )
            .localCheckpoint(eager=False)
        )
        # This count MATERIALIZES the lazy checkpoint (same job) — it must
        # stay even if a caller never reads `changed`.
        changed = new_labels.filter("__chg").count()
        labels = new_labels.drop("__chg")
        if changed == 0:
            break
    return labels


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Near-dup pairs → (doc_id, cluster_id, is_canonical): cluster_id is
    the min doc id of the component; the canonical doc (the one a keep-first
    policy retains) is the cluster minimum. Only docs appearing in at least
    one pair are returned — the unpaired majority is trivially canonical."""
    cc = connected_components(pairs, id_a, id_b)
    return cc.select(
        F.col("id").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        (F.col("id") == F.col("comp")).alias("is_canonical"),
    )
