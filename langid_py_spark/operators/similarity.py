"""Similarity search over embedding columns (array<float>).

Two paths:

* brute-force cosine top-k — the correctness baseline. JVM-side only:
  dot product via `F.zip_with` + `F.aggregate`, ranking via a window.
  O(Q x N); used directly when the query side is small enough to
  broadcast (it is, by construction: queries are a tiny dim table).
* LSH-bucketed (random hyperplane / signed random projection) — the
  scale path: each vector maps to a B-bit signature; candidates share a
  signature band, so the join is an equi-join on a spread key instead of
  a cross join. Recall vs brute force is property-tested.

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
