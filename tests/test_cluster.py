"""Connected-components cluster resolution (operators/cluster.py).

Correctness is pinned three ways: topology cases with known answers
(paths, stars, cliques, disjoint unions), randomized graphs against an
independent union-find oracle, and a plan assertion that the iteration
is equi-join-only (no cartesian). The registered dedup_clusters query
additionally hash-matches an offline union-find golden at sf0.01."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from langid_py_spark.operators.cluster import (
    _large_star,
    _small_star,
    connected_components,
    dedup_clusters,
    near_dedup_keep,
)


def _uf_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Independent oracle: union-find, min-id representative."""
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        for n in (a, b):
            parent.setdefault(n, n)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {n: find(n) for n in parent}


def _pairs_df(spark, edges):
    return spark.createDataFrame(
        pd.DataFrame(edges, columns=["id_a", "id_b"]).astype(np.int64)
    )


def _cc_dict(spark, edges) -> dict[int, int]:
    out = connected_components(_pairs_df(spark, edges)).collect()
    return {r["node"]: r["cluster_id"] for r in out}


def test_path_star_clique_topologies(spark):
    # long path (worst case for naive propagation: O(n) rounds; star
    # alternation must do it in O(log n) — max_iter=25 enforces that)
    path = [(i, i + 1) for i in range(40)]
    assert _cc_dict(spark, path) == {i: 0 for i in range(41)}
    # star rooted high (forces re-rooting to the min)
    star = [(100, i) for i in (3, 7, 9, 50)]
    assert _cc_dict(spark, star) == {100: 3, 3: 3, 7: 3, 9: 3, 50: 3}
    # clique + disjoint pair + reversed/duplicate edges
    clique = [(a, b) for a in (5, 6, 7, 8) for b in (5, 6, 7, 8) if a < b]
    extra = [(2, 1), (1, 2), (2, 1)]
    got = _cc_dict(spark, clique + extra)
    assert got == {5: 5, 6: 5, 7: 5, 8: 5, 1: 1, 2: 1}


def test_random_graphs_match_union_find(spark):
    rng = np.random.RandomState(7)
    for trial in range(4):
        n = int(rng.randint(10, 60))
        m = int(rng.randint(5, 3 * n))
        ids = rng.choice(10_000, size=n, replace=False)
        edges = [
            (int(ids[rng.randint(n)]), int(ids[rng.randint(n)])) for _ in range(m)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        assert _cc_dict(spark, edges) == _uf_components(edges), (trial, edges)


def test_empty_pairs(spark):
    import pyspark.sql.types as T

    empty = spark.createDataFrame(
        [], T.StructType([T.StructField("id_a", T.LongType()), T.StructField("id_b", T.LongType())])
    )
    assert connected_components(empty).count() == 0


def test_dedup_clusters_and_survivors(spark):
    edges = [(1, 2), (2, 3), (10, 11)]
    dc = {r["doc_id"]: (r["cluster_id"], r["is_rep"]) for r in
          dedup_clusters(_pairs_df(spark, edges)).collect()}
    assert dc == {1: (1, True), 2: (1, False), 3: (1, False),
                  10: (10, True), 11: (10, False)}
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3, 10, 11, 99], "text": ["x"] * 6})
    )
    keep = sorted(
        r["doc_id"] for r in near_dedup_keep(docs, _pairs_df(spark, edges)).collect()
    )
    # reps survive, non-reps drop, the singleton 99 survives untouched
    assert keep == [1, 10, 99]


def test_star_iteration_plan_is_equijoin_only(spark):
    """One large-star + small-star round over a pair scan must compile to
    hash/sort-merge equi-joins — a cartesian in the iteration would be
    quadratic at every round."""
    from pyspark.sql import functions as F

    pairs = _pairs_df(spark, [(1, 2), (2, 3)])
    edges = pairs.select(
        F.greatest("id_a", "id_b").alias("u"), F.least("id_a", "id_b").alias("v")
    ).distinct()
    plan = _small_star(_large_star(edges))._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_nonconvergence_guard(spark):
    with pytest.raises(RuntimeError, match="no convergence"):
        connected_components(_pairs_df(spark, [(i, i + 1) for i in range(300)]), max_iter=1)
