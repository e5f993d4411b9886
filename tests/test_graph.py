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


def test_respects_iteration_cap(spark):
    # with max_iters=1 a long chain CANNOT fully converge — the cap is a
    # real bound (and the default 20 covers any plausible dedup diameter)
    edges = [(i, i + 1) for i in range(9)]
    got = _components(spark, 10, edges, max_iters=1)
    assert got[9] != 0  # not yet propagated to the chain's end
    got_full = _components(spark, 10, edges)
    assert all(got_full[i] == 0 for i in range(10))
