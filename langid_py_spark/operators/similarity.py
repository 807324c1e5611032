"""Similarity search over embedding columns (array<float>).

Three paths:

* brute-force cosine top-k — the correctness baseline. JVM-side only:
  dot product via `F.zip_with` + `F.aggregate`, ranking via a window.
  O(Q x N); used directly when the query side is small enough to
  broadcast (it is, by construction: queries are a tiny dim table).
* LSH-bucketed (random hyperplane / signed random projection) — a scale
  path: each vector maps to a B-bit signature; candidates share a
  signature band, so the join is an equi-join on a spread key instead of
  a cross join. Recall vs brute force is property-tested.
* IVF (inverted-file, coarse spherical k-means quantizer) — the other
  standard scale path: centroids are trained driver-side on a BOUNDED
  sample (the classic FAISS recipe — at 100 TB you sample ~1M vectors,
  still driver-feasible), every vector is assigned to its nearest
  centroid by a vectorized Arrow UDF (one matmul per batch), and a
  query probes its `n_probe` nearest centroids: candidates come from an
  equi-join on cluster_id (bounded-cardinality key; AQE handles the
  residual skew of unbalanced clusters), then exact cosine re-rank.

Embeddings fixture: /root/testdata/sf*/embeddings.parquet
(vec_id bigint, embedding array<float>, label int).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def cosine_topk_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Top-k most-cosine-similar vectors per query (excluding self-id).

    The query side is broadcast (small dim table) → the 'cross' is a
    BroadcastNestedLoopJoin over one pass of the big side: shuffle-free
    until the final per-query top-k window, whose key (qid) has
    cardinality |Q| — repartition-by-qid keeps it parallel.
    """
    v = vectors.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    q = queries.select(
        F.col(qid_col).alias("qid"),
        F.col(qvec_col).cast("array<double>").alias("qv"),
    )
    sim = F.round(
        _dot(F.col("v"), F.col("qv"))
        / F.greatest(_norm(F.col("v")) * _norm(F.col("qv")), F.lit(1e-12)),
        6,
    )
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("vid") != F.col("qid"))
        .withColumn("cos_sim", sim)
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("vid"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("qid", F.col("vid").alias("vec_id"), "cos_sim", "rk")
    )


def cosine_topk_oracle_sql(
    table: str = "embeddings", n_queries: int = 5, k: int = 5
) -> str:
    """DuckDB twin: first n_queries vec_ids are the query set."""
    return f"""
    WITH q AS (
        SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
        FROM {table} WHERE vec_id < {n_queries}
    ), scored AS (
        SELECT q.qid, v.vec_id,
               round(list_dot_product(CAST(v.embedding AS DOUBLE[]), q.qv)
                     / greatest(sqrt(list_dot_product(CAST(v.embedding AS DOUBLE[]),
                                                      CAST(v.embedding AS DOUBLE[])))
                                * sqrt(list_dot_product(q.qv, q.qv)), 1e-12),
                     6) AS cos_sim
        FROM {table} v, q WHERE v.vec_id != q.qid
    )
    SELECT qid, vec_id, cos_sim, rk FROM (
        SELECT qid, vec_id, cos_sim,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY cos_sim DESC, vec_id ASC) AS rk
        FROM scored
    ) WHERE rk <= {k}
    """


# ------------------------------------------------- LSH (scale path)
# 32 sign bits, banded as 8 x 4 bits: for a pair with per-bit agreement
# p = 1 - theta/pi, candidate probability = 1-(1-p^4)^8 — ~0.87 at
# p=0.69 (cos~0.55), ~0.998 at p=0.86 (cos~0.9). Exact cosine re-rank
# downstream removes false positives; the knob trades shuffle volume
# for recall and should widen (more bands) as embedding similarity of
# true neighbors drops.
N_PLANES = 32
BAND_BITS = 4
N_BANDS = N_PLANES // BAND_BITS


def _planes(dim: int, n_planes: int = N_PLANES, seed: int = 4242) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(dim, n_planes)


def srp_signature_udf(dim: int, n_planes: int = N_PLANES):
    """Signed-random-projection signature: n_planes sign bits -> int."""
    planes = _planes(dim, n_planes)

    @pandas_udf(T.LongType())
    def _sig(vecs: pd.Series) -> pd.Series:
        mat = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (mat @ planes) > 0  # (B, n_planes)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series(bits @ weights)

    return _sig


def srp_bucketed_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """ANN: candidates = vectors whose SRP signature matches the query's
    in ≥1 of two 8-bit bands; exact cosine re-rank on candidates only.
    Equi-join on (band, band_bits) — linear shuffle, no cross join."""
    sig = srp_signature_udf(dim)
    v = vectors.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
        sig(F.col(vec_col)).alias("sig"),
    )
    q = queries.select(
        F.col(qid_col).alias("qid"),
        F.col(qvec_col).cast("array<double>").alias("qv"),
        sig(F.col(qvec_col)).alias("qsig"),
    )

    def bandize(df, sig_col, out):
        mask = (1 << BAND_BITS) - 1
        return df.select(
            "*",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.shiftright(F.col(sig_col), BAND_BITS * b)
                            .bitwiseAND(F.lit(mask))
                            .alias(out),
                        )
                        for b in range(N_BANDS)
                    ]
                )
            ).alias("bb"),
        ).select("*", "bb.band", f"bb.{out}").drop("bb")

    vb = bandize(v, "sig", "bbits")
    qb = bandize(q, "qsig", "bbits")
    cand = (
        vb.join(F.broadcast(qb), ["band", "bbits"])
        .filter(F.col("vid") != F.col("qid"))
        .dropDuplicates(["qid", "vid"])
    )
    sim = F.round(
        _dot(F.col("v"), F.col("qv"))
        / F.greatest(_norm(F.col("v")) * _norm(F.col("qv")), F.lit(1e-12)),
        6,
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("vid"))
    return (
        cand.withColumn("cos_sim", sim)
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("qid", F.col("vid").alias("vec_id"), "cos_sim", "rk")
    )


# ------------------------------------------------- IVF (scale path #2)
def _l2_normalize(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    return mat / np.maximum(n, 1e-12)


def spherical_kmeans(
    mat: np.ndarray, n_centroids: int, seed: int = 123, n_iter: int = 15
) -> np.ndarray:
    """Deterministic spherical k-means (cosine Lloyd's): seeded init from
    sample rows, fixed iteration count, empty clusters keep their previous
    centroid. Returns L2-normalized (n_centroids, dim) float64."""
    x = _l2_normalize(np.asarray(mat, dtype=np.float64))
    rng = np.random.RandomState(seed)
    init = rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)
    c = x[np.sort(init)].copy()
    for _ in range(n_iter):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(len(c)):
            members = x[assign == j]
            if len(members):
                c[j] = members.mean(axis=0)
        c = _l2_normalize(c)
    return c


def fit_ivf_centroids(
    vectors: DataFrame,
    n_centroids: int = 16,
    sample_rows: int = 10_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 123,
) -> np.ndarray:
    """Train the coarse quantizer on a bounded, DETERMINISTIC sample (first
    `sample_rows` by id — not rand(), so goldens/retries agree). This is
    the only driver-side step; assignment and search stay distributed."""
    pdf = (
        vectors.orderBy(F.asc(id_col))
        .limit(sample_rows)
        .select(vec_col)
        .toPandas()
    )
    mat = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    return spherical_kmeans(mat, n_centroids, seed=seed)


def ivf_assign_udf(centroids: np.ndarray):
    """cluster_id = argmax(normalized_vec @ centroids.T) — one matmul per
    Arrow batch. Centroids ride the UDF closure (tiny: K x dim floats),
    the pickled-closure analogue of an explicit broadcast."""
    c = np.ascontiguousarray(centroids, dtype=np.float64)

    @pandas_udf(T.LongType())
    def _assign(vecs: pd.Series) -> pd.Series:
        mat = _l2_normalize(
            np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        )
        return pd.Series(np.argmax(mat @ c.T, axis=1).astype(np.int64))

    return _assign


def ivf_probe_udf(centroids: np.ndarray, n_probe: int):
    """Array of the query's n_probe nearest centroid ids (dot desc,
    centroid id asc tie-break — deterministic)."""
    c = np.ascontiguousarray(centroids, dtype=np.float64)

    @pandas_udf(T.ArrayType(T.LongType()))
    def _probe(vecs: pd.Series) -> pd.Series:
        mat = _l2_normalize(
            np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        )
        sims = mat @ c.T  # (B, K)
        # stable argsort on -sims == (dot desc, centroid id asc) tie-break
        order = np.argsort(-sims, axis=1, kind="stable")
        return pd.Series(list(order[:, :n_probe].astype(np.int64)))

    return _probe


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """IVF ANN: candidates = vectors in the query's n_probe nearest
    clusters; exact cosine re-rank. Every vector lives in EXACTLY one
    cluster and a query's probe list is distinct, so (qid, vid) candidates
    are already unique — no dropDuplicates shuffle. Plan: two maps
    (assign/probe UDFs) -> explode (n_probe rows/query) -> equi-join on
    cluster_id -> window top-k per qid."""
    assign = ivf_assign_udf(centroids)
    probe = ivf_probe_udf(centroids, n_probe)
    v = vectors.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
        assign(F.col(vec_col)).alias("cluster_id"),
    )
    q = queries.select(
        F.col(qid_col).alias("qid"),
        F.col(qvec_col).cast("array<double>").alias("qv"),
        F.explode(probe(F.col(qvec_col))).alias("cluster_id"),
    )
    sim = F.round(
        _dot(F.col("v"), F.col("qv"))
        / F.greatest(_norm(F.col("v")) * _norm(F.col("qv")), F.lit(1e-12)),
        6,
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("vid"))
    return (
        v.join(F.broadcast(q), "cluster_id")
        .filter(F.col("vid") != F.col("qid"))
        .withColumn("cos_sim", sim)
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("qid", F.col("vid").alias("vec_id"), "cos_sim", "rk")
    )
