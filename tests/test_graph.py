"""connected_components (operators/graph.py): min-label propagation on
adversarial topologies — a long chain (worst-case diameter for label
propagation), a cycle, a star, isolated vertices, and a random graph
checked against a pure-python union-find."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipe_segment_spark.operators.graph import connected_components


def _components(spark, n_vertices, edge_list, max_iters=20):
    verts = spark.range(n_vertices).select(F.col("id"))
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    out = connected_components(verts, edges, max_iters=max_iters)
    return {r["id"]: r["component"] for r in out.collect()}

def _union_find(n, edge_list):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min id in component
    comp_min = {}
    for v in range(n):
        r = find(v)
        comp_min.setdefault(r, v if v < comp_min.get(r, n) else comp_min[r])
        comp_min[r] = min(comp_min[r], v)
    return {v: comp_min[find(v)] for v in range(n)}


def test_chain_cycle_star_isolates(spark):
    # chain 0-1-2-...-9 (diameter 9: stresses the superstep loop),
    # cycle 10-11-12-10, star 13<-{14,15,16}, isolates 17..19
    edges = (
        [(i, i + 1) for i in range(9)]
        + [(10, 11), (11, 12), (12, 10)]
        + [(14, 13), (15, 13), (16, 13)]
    )
    got = _components(spark, 20, edges)
    assert all(got[i] == 0 for i in range(10))
    assert all(got[i] == 10 for i in (10, 11, 12))
    assert all(got[i] == 13 for i in (13, 14, 15, 16))
    assert all(got[i] == i for i in (17, 18, 19))


def test_matches_union_find_on_random_graph(spark):
    import random

    rng = random.Random(42)
    n = 200
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(120)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    assert _components(spark, n, edges) == _union_find(n, edges)


def test_raises_on_iteration_cap(spark):
    # with max_iters=1 a long chain CANNOT fully converge: the operator
    # must RAISE (ADVICE r4) rather than return silently-truncated labels
    import pytest

    edges = [(i, i + 1) for i in range(9)]
    with pytest.raises(RuntimeError, match="did not converge"):
        _components(spark, 10, edges, max_iters=1)
    got_full = _components(spark, 10, edges)
    assert all(got_full[i] == 0 for i in range(10))


def test_chain_converges_in_log_supersteps(spark):
    """VERDICT r4 ask #5: pointer jumping makes the worst-case chain
    close in O(log n) supersteps, not O(n). A 100-vertex path needs 99
    supersteps under pure min-label propagation; with the jump step the
    measured count must be ~log2(100) — we assert <= 10."""
    n = 100
    verts = spark.range(n).select(F.col("id"))
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    out, steps = connected_components(
        verts, edges, max_iters=15, return_stats=True
    )
    got = {r["id"]: r["component"] for r in out.collect()}
    assert all(got[i] == 0 for i in range(n))
    assert steps <= 10, f"chain took {steps} supersteps"
