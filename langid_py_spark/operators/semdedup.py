"""SemDeDup — semantic deduplication via k-means cluster pruning
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication" — public method description).

Completes the dedup ladder's semantic rung: exact (hash) → line/span →
MinHash/SimHash/winnowing (lexical near-dup) → SRP pair join
(embedding-cosine near-dup) → THIS (embedding near-dup resolved
per-semantic-cluster, the way the paper prunes LAION/C4). Upstream
saffsd/langid.py has no dedup surface — this is a driver-mandate
training-data extra.

Method: vectors are assigned to spherical k-means centroids (the IVF
coarse quantizer the ANN family already trains —
`similarity.fit_ivf_centroids`); within each cluster, any vector whose
cosine to an already-kept vector reaches `eps` is a duplicate. Kept
representatives are chosen in (centroid-similarity ASC, id ASC) order —
the paper's "keep the example farthest from the centroid" choice (§3.1:
low-similarity extremes generalize better), made deterministic with the
id tie-break.

Scale story (100 TB):

* assignment is the zero-shuffle IVF pattern: centroids ride the Arrow
  UDF closure, one GEMM per batch;
* the ONLY corpus-scale shuffle is the groupBy(cluster_id) feeding
  applyInPandas — fixed-width key, bounded cardinality K;
* per-cluster work is O(n_c · kept · dim) greedy with chunked GEMMs —
  the paper's recipe scales K with the corpus (they use 50k clusters
  for LAION-440M) so n_c stays ~10^4; a cluster above `max_cluster`
  RAISES with that instruction rather than silently degrading recall
  or building an unbounded sim matrix (the bounded-pull precedent:
  similarity.MAX_DRIVER_QUERIES);
* both the kernel's chunked GEMMs and the assignment run through
  `rowwise_gemm`, so per-row bits are independent of chunk/batch shape
  and the golden twin (scripts/make_golden.py imports THIS kernel)
  agrees bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from langid_py_spark.operators.similarity import (
    _l2_normalize,
    _to_mat,
    ivf_assign_udf,
    rowwise_gemm,
)

# Greedy chunk size: each step is a (chunk x kept) + (chunk x chunk)
# GEMM — big enough to amortize the einsum loop, small enough that the
# in-block matrix stays L2-resident.
_CHUNK = 512


def semdedup_cluster(
    ids: np.ndarray, mat: np.ndarray, centroid: np.ndarray, eps: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Greedy semantic dedup of ONE cluster. Deterministic in the input
    ROW ORDER (rows are id-sorted internally) and in chunking
    (rowwise_gemm). Returns (dropped_ids, dup_of_ids, cos) where `cos`
    is the dropped row's max cosine to any kept row (ties on cos break
    to the smallest keeper id).

    ids: (n,) array (int or str); mat: (n, dim) float64 raw vectors;
    centroid: (dim,) L2-normalized.
    """
    n = len(ids)
    if n == 0:
        return ids[:0], ids[:0], np.empty(0, dtype=np.float64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    mat = np.asarray(mat, dtype=np.float64)[order]
    nm = _l2_normalize(mat)
    csim = rowwise_gemm(nm, centroid.reshape(-1, 1))[:, 0]
    # processing order = (centroid similarity ASC, id ASC): rows are
    # id-sorted, so a stable argsort on csim alone gives the tie-break.
    proc = np.argsort(csim, kind="stable")

    kept: list[int] = []
    drop_rows: list[int] = []
    drop_of: list[int] = []
    drop_cos: list[float] = []
    for start in range(0, n, _CHUNK):
        blk = proc[start : start + _CHUNK]
        kept_arr = np.asarray(kept, dtype=np.int64)
        if kept:
            # (b, |kept|). rowwise_gemm's per-element value is the
            # j-ordered dot of one a-row with one w-column, independent
            # of how many rows/columns ride the call — so the cheaper
            # orientation (fewer einsum column loops) gives identical
            # bits; the chunk-boundary test varies _CHUNK and would
            # catch any divergence.
            if len(kept) > len(blk):
                base = rowwise_gemm(nm[kept], nm[blk].T).T
            else:
                base = rowwise_gemm(nm[blk], nm[kept].T)
            base_max = base.max(axis=1)  # vectorized: max is exact
        else:
            base = np.empty((len(blk), 0), dtype=np.float64)
            base_max = np.full(len(blk), -np.inf)
        inblk = rowwise_gemm(nm[blk], nm[blk].T)  # (b, b)
        newly: list[int] = []  # positions within blk kept so far
        for bi, row in enumerate(blk):
            # best = max over (all kept, kept-so-far-in-block) — same
            # value as the concatenated max (max is exact), without
            # building a |kept|-wide array per row
            best = base_max[bi]
            if newly:
                sb = inblk[bi, newly]
                sbm = sb.max()
                if sbm > best:
                    best = sbm
            if best >= eps:
                # tie set: every candidate whose cos equals best;
                # keeper = smallest id among them (ids are unique)
                parts = []
                if len(kept_arr):
                    m = base[bi] == best
                    if m.any():
                        parts.append(kept_arr[m])
                if newly:
                    m = sb == best
                    if m.any():
                        parts.append(blk[np.asarray(newly)][m])
                tied = np.concatenate(parts)
                keeper = tied[np.argsort(ids[tied], kind="stable")[0]]
                drop_rows.append(int(row))
                drop_of.append(int(keeper))
                drop_cos.append(float(best))
            else:
                newly.append(bi)
        kept.extend(int(r) for r in blk[newly])
    dr = np.asarray(drop_rows, dtype=np.int64)
    do = np.asarray(drop_of, dtype=np.int64)
    return ids[dr], ids[do], np.asarray(drop_cos, dtype=np.float64)


def semdedup_drops(
    vectors: DataFrame,
    centroids: np.ndarray,
    eps: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int = 65_536,
) -> DataFrame:
    """(id, dup_of, cluster_id, cos_sim) — rows SemDeDup would remove.

    Plan: one Arrow assignment map (centroids in the closure, zero
    shuffle) → ONE groupBy(cluster_id) shuffle → per-cluster greedy
    kernel. cos_sim is rounded to 6dp Spark-side (F.round HALF_UP; the
    golden twin replicates via Decimal — CLAUDE.md rounding rule).
    """
    id_field = next(f for f in vectors.schema.fields if f.name == id_col)
    cc = np.ascontiguousarray(centroids, dtype=np.float64)
    out_schema = T.StructType(
        [
            id_field,
            T.StructField("dup_of", id_field.dataType),
            T.StructField("cluster_id", T.LongType()),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    def _one_cluster(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        cid = int(key[0])
        if len(pdf) > max_cluster:
            raise ValueError(
                f"semdedup cluster {cid} has {len(pdf)} rows > max_cluster="
                f"{max_cluster}: raise n_centroids so clusters stay bounded "
                "(SemDeDup scales K with the corpus), or raise max_cluster "
                "explicitly if the quadratic per-cluster cost is acceptable"
            )
        ids = pdf[id_col].to_numpy()
        mat = _to_mat(pdf[vec_col])
        d_ids, d_of, d_cos = semdedup_cluster(ids, mat, cc[cid], eps)
        return pd.DataFrame(
            {
                id_col: d_ids,
                "dup_of": d_of,
                "cluster_id": np.full(len(d_ids), cid, dtype=np.int64),
                "cos_sim": d_cos,
            }
        )

    assign = ivf_assign_udf(cc)
    assigned = vectors.select(
        F.col(id_col), F.col(vec_col), assign(F.col(vec_col)).alias("cluster_id")
    )
    drops = assigned.groupBy("cluster_id").applyInPandas(_one_cluster, out_schema)
    return drops.select(
        id_col, "dup_of", "cluster_id", F.round("cos_sim", 6).alias("cos_sim")
    )


def semdedup_keep(
    vectors: DataFrame, drops: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """Survivor view: vectors minus the dropped ids (left_anti on the
    fixed-width id key — the exact-dedup survivors pattern)."""
    return vectors.join(
        drops.select(F.col(id_col)), on=id_col, how="left_anti"
    )
