"""Connected-components tests: union-find oracle, pathological chains,
idempotence / permutation invariance."""

from __future__ import annotations

import random

import pytest

from bigmatch_utilities_spark.operators.closure import (
    cluster_accepted_pairs,
    connected_components,
)


def union_find(edges, nodes=None):
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for n in nodes or []:
        find(n)
    out = {}
    for n in parent:
        out[n] = find(n)
    return out


def _run(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {r["id"]: r["cluster_id"] for r in connected_components(df).collect()}


def test_simple_components(spark):
    edges = [(1, 2), (2, 3), (10, 11), (20, 20)]
    got = _run(spark, edges)
    want = {k: v for k, v in union_find(edges).items() if k != v or k in (1, 10)}
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == 10
    # self-loop-only node is dropped (no real edge)
    assert 20 not in got


def test_long_chain(spark):
    """Pathological chain — worst case for naive propagation; large/small
    star must converge in O(log^2 n) rounds, not O(n)."""
    n = 200
    edges = [(i, i + 1) for i in range(n)]
    got = _run(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == n + 1


def test_random_graphs_match_union_find(spark):
    rng = random.Random(99)
    for trial in range(3):
        nodes = list(range(rng.randint(10, 60)))
        edges = [
            (rng.choice(nodes), rng.choice(nodes))
            for _ in range(rng.randint(5, 80))
        ]
        edges = [e for e in edges if e[0] != e[1]]
        if not edges:
            continue
        got = _run(spark, edges)
        uf = union_find(edges)
        # same partition: roots must agree exactly (both use min-id labels)
        for n_, root in uf.items():
            assert got[n_] == root, (trial, n_, got.get(n_), root)


def test_permutation_invariance(spark):
    edges = [(5, 9), (9, 2), (7, 8), (3, 7)]
    a = _run(spark, edges)
    b = _run(spark, list(reversed([(b_, a_) for a_, b_ in edges])))
    assert a == b


def test_cluster_accepted_pairs_with_singletons(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["id_rec", "id_mem"])
    ids = spark.createDataFrame([(i,) for i in range(6)], ["id"])
    got = {
        r["id"]: r["cluster_id"]
        for r in cluster_accepted_pairs(pairs, all_ids=ids).collect()
    }
    assert got == {0: 0, 1: 1, 2: 1, 3: 1, 4: 4, 5: 5}


def test_string_ids(spark):
    """Record ids are strings in the legacy model — closure must not assume
    numerics."""
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], ["id_rec", "id_mem"]
    )
    got = {
        r["id"]: r["cluster_id"]
        for r in connected_components(pairs, "id_rec", "id_mem").collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}
