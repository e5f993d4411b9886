"""Iterative graph operators (the engine's iterative-algorithm class).

connected_components: min-label propagation — the standard scalable CC
for dedup clustering (each superstep is a JOIN + groupBy-min at edge
cardinality; converges in O(diameter) supersteps, and duplicate clusters
are near-cliques so real diameters are tiny). The driver-side loop's only
action per superstep is an O(1) changed-row COUNT (convergence test), not
a collect.

Lineage MUST be truncated every superstep (``localCheckpoint``): with
plain persist() the logical plan doubles per iteration and Catalyst
re-analysis dominates wall time after ~10 supersteps (measured: a
10-superstep chain fixture went from minutes of planner time to seconds).
On a cluster use reliable ``checkpoint()`` instead of localCheckpoint for
fault tolerance — same seam, one-line swap."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_CC_ITERS = 20  # runaway guard only — convergence is detected, not assumed


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    max_iters: int = MAX_CC_ITERS,
) -> DataFrame:
    """vertices: one column ``id``; edges: columns ``src``, ``dst``
    (either orientation; symmetrized internally). Returns (id, component)
    where component = the smallest id in the vertex's component."""
    sym = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    labels = vertices.select("id").distinct().withColumn(
        "comp", F.col("id")
    ).localCheckpoint(eager=True)
    for _ in range(max_iters):
        nbr_min = (
            sym.join(labels, sym.dst == labels.id)
            .groupBy(F.col("src").alias("id"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)  # truncate superstep lineage
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("id", F.col("comp").alias("component"))
