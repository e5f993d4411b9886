"""Iterative graph operators (the engine's iterative-algorithm class).

connected_components: min-label propagation AUGMENTED WITH POINTER
JUMPING — the scalable CC for dedup clustering. Each superstep does

  1. neighbor-min: comp(v) <- min(comp(v), min over neighbors' comp)
     (one JOIN + groupBy-min at edge cardinality), then
  2. pointer jump: comp(v) <- min(comp(v), comp(comp(v)))
     (one self-join at vertex cardinality).

Step 1 alone converges in O(diameter) supersteps — fine for near-clique
duplicate clusters but O(n) on a pathological chain. Step 2 halves the
pointer-chain depth every superstep (classic pointer doubling, the same
device as Hash-to-Min / large-star–small-star contraction in "Connected
Components in MapReduce and Beyond", Kiveris et al. 2014), so the
combination converges in O(log n) supersteps on ANY topology — measured:
a 100-vertex chain closes in <=10 supersteps vs 99 for propagation alone
(tests/test_graph.py). The driver-side loop's only action per superstep
is an O(1) changed-row COUNT (convergence test), not a collect.

Invariant that makes the jump safe: comp(v) always holds the id of some
vertex in v's own component (init comp=id; neighbor-min adopts a
neighbor's label; the jump adopts comp(comp(v)), and comp(v) is in the
same component by induction). Labels are monotone non-increasing and
bounded below by the component's min id, so the unique fixed point —
labels constant across every edge — is exactly component = min id.

Lineage MUST be truncated every superstep (``localCheckpoint``): with
plain persist() the logical plan doubles per iteration and Catalyst
re-analysis dominates wall time after ~10 supersteps (measured: a
10-superstep chain fixture went from minutes of planner time to seconds).
On a cluster use reliable ``checkpoint()`` instead of localCheckpoint for
fault tolerance — same seam, one-line swap.

If the loop hits ``max_iters`` without the changed-count reaching zero it
RAISES rather than returning silently-truncated (wrong) labels (ADVICE
r4) — with pointer jumping the default cap of 20 covers any component up
to ~2^20 vertices, so a raise means a genuinely pathological input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_CC_ITERS = 20  # runaway guard only — convergence is detected, not assumed


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    max_iters: int = MAX_CC_ITERS,
    return_stats: bool = False,
) -> DataFrame:
    """vertices: one column ``id``; edges: columns ``src``, ``dst``
    (either orientation; symmetrized internally). Returns (id, component)
    where component = the smallest id in the vertex's component; with
    ``return_stats=True`` returns (df, supersteps_used). Raises
    RuntimeError if ``max_iters`` supersteps pass without convergence —
    never silently returns truncated labels."""
    sym = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    labels = vertices.select("id").distinct().withColumn(
        "comp", F.col("id")
    ).localCheckpoint(eager=True)
    converged = False
    steps = 0
    for _ in range(max_iters):
        steps += 1
        nbr_min = (
            sym.join(labels, sym.dst == labels.id)
            .groupBy(F.col("src").alias("id"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        hop = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)  # jump self-join needs a cut plan
        )
        # pointer jump: comp <- comp(comp). Every comp value is a live
        # vertex id (invariant), so the lookup always matches; left join
        # only as belt-and-braces against degenerate vertex inputs.
        ptr = hop.select(
            F.col("id").alias("p_id"), F.col("comp").alias("p_comp")
        )
        new_labels = (
            hop.join(ptr, hop.comp == ptr.p_id, "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce("p_comp", F.col("comp"))
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
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within {max_iters} "
            f"supersteps (last superstep still changed labels). With "
            f"pointer jumping this needs roughly log2(component size) "
            f"supersteps — raise max_iters only if the input really has "
            f"components beyond ~2^{max_iters} vertices."
        )
    out = labels.select("id", F.col("comp").alias("component"))
    if return_stats:
        return out, steps
    return out
