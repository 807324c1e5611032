"""Near-duplicate PAIR → CLUSTER resolution: connected components.

The dedup operators (minhash/simhash/winnow/SRP/brute) emit near-dup
PAIRS; a production pipeline (CCNet, Gopher, RefinedWeb) then needs ONE
survivor per transitive near-dup cluster — i.e. connected components
over the pair graph, the step between "pairs" and "drop list".
saffsd/langid.py has no join machinery at all, so there is no upstream
counterpart; this is a training-data-pipeline operator (SURVEY.md §2
addendum / VERDICT r03 item 2).

Algorithm: alternating large-star / small-star (Kiveris et al. 2014,
"Connected Components in MapReduce and Beyond") — the standard
shuffle-bounded CC for graphs too big for a driver:

* large-star: every node links its LARGER neighbors to the minimum of
  its closed neighborhood;
* small-star: every node links its smaller-or-equal neighbors (and
  itself) to that minimum.

Each operation is one groupBy(min) + one equi-join on node id — no
cartesian anywhere; edges only ever re-point toward smaller ids, and
the edge set converges to a forest of stars rooted at each component's
minimum id in O(log n) rounds (provably; ~5 rounds in practice for
web-dedup graphs whose components are near-cliques of boilerplate).

Scale story per iteration: shuffle volume is O(|E|) slim (long, long)
rows; the min-aggregation is partial+final (map-side combine), so a
hot node (a giant boilerplate cluster) contributes one row per map
partition, not one per edge; AQE handles residual join skew. Lineage
is truncated every round with localCheckpoint — an iterative plan
otherwise doubles per round and chokes the optimizer long before the
data chokes the cluster (at 10^12 edges, swap localCheckpoint for a
reliable checkpoint dir / a parquet round-trip: same plan, restartable).

Convergence detection: the canonical edge set's (count, bit_xor of two
independent xxhash64 mixes) fingerprint — cheap aggregates riding the
same job that materializes the round's edges, order-independent over
the distinct edge set. An exact exceptAll would cost one more shuffle
per round; a simultaneous 128-bit collision that ALSO preserves the
count across consecutive rounds of a monotonically-improving iteration
is not a realistic failure mode (and the pytest property suite
cross-checks final outputs against a union-find oracle exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """Link every node's LARGER neighbors to min(closed neighborhood)."""
    bidir = edges.select("u", "v").union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = bidir.groupBy("u").agg(F.min("v").alias("_mv")).select(
        "u", F.least(F.col("_mv"), F.col("u")).alias("m")
    )
    return (
        bidir.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Link every node's smaller neighbors AND itself to the minimum.

    Input edges are (u, v) with u > v (large-star emits that orientation;
    the initial canonicalization enforces it), so grouping by u sees
    exactly the smaller neighborhood."""
    mins = edges.groupBy("u").agg(F.min("v").alias("m"))
    relink = (
        edges.join(mins, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    selfe = mins.select("u", F.col("m").alias("v"))
    return relink.union(selfe).distinct()


def _fingerprint(edges: DataFrame) -> tuple:
    # bit_xor, not sum: order-independent over the distinct edge set and
    # immune to ANSI-mode long overflow (xxhash64 spans the full int64
    # range, so summing it overflows on the second row in the worst case)
    row = edges.agg(
        F.count("*").alias("n"),
        F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        F.expr("bit_xor(xxhash64(v, u))").alias("h2"),
    ).collect()[0]
    return (row["n"], row["h"], row["h2"])


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, cluster_id) for every node appearing in `pairs`, where
    cluster_id is the MINIMUM node id of its connected component — the
    deterministic cluster representative (the same keep-lowest-id rule
    as exact_dedup_keep).

    `pairs` is any near-dup pair table: minhash_lsh_pairs, simhash
    candidates, winnow_pairs, srp_dup_pairs, or a union of several.
    Raises RuntimeError if not converged within max_iter alternations
    (provable bound is O(log n); 25 covers n beyond any corpus size).
    """
    edges = (
        pairs.select(
            F.greatest(F.col(a_col), F.col(b_col)).cast("long").alias("u"),
            F.least(F.col(a_col), F.col(b_col)).cast("long").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    edges = edges.localCheckpoint(eager=True)
    fp = _fingerprint(edges)
    for _ in range(max_iter):
        new_edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        new_fp = _fingerprint(new_edges)
        edges, fp_prev, fp = new_edges, fp, new_fp
        if new_fp == fp_prev:
            break
    else:
        raise RuntimeError(f"connected_components: no convergence in {max_iter} iterations")
    roots = edges.select(F.col("v").alias("node")).distinct().select(
        "node", F.col("node").alias("cluster_id")
    )
    members = edges.select(F.col("u").alias("node"), F.col("v").alias("cluster_id"))
    return members.union(roots).distinct()


def dedup_clusters(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Cluster table with survivor marking: (doc_id, cluster_id, is_rep).

    is_rep = this doc is the cluster's keeper (lowest id); the drop list
    is simply `WHERE NOT is_rep` — what makes the pair operators
    actionable at 10^12 docs."""
    cc = connected_components(pairs, a_col=a_col, b_col=b_col, max_iter=max_iter)
    return cc.select(
        F.col("node").alias("doc_id"),
        "cluster_id",
        (F.col("node") == F.col("cluster_id")).alias("is_rep"),
    )


def near_dedup_keep(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Survivors after near-dup cluster resolution: every doc that is not
    a non-representative member of some cluster (singletons, never seen
    in a pair, survive by definition). The drop list is tiny relative to
    the corpus, so the anti-join broadcasts under AQE."""
    cc = connected_components(pairs, a_col=a_col, b_col=b_col)
    drop = cc.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias(id_col)
    )
    return docs.join(drop, id_col, "left_anti")
