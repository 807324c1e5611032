"""Deduplication operators for large-scale training-data pipelines.

Four families, each with its scale story:

* exact_dedup       — hash-groupBy on md5(text). One shuffle on a
                      uniformly distributed 128-bit key; at 100 TB the
                      canonical first pass.
* jaccard_pairs     — EXACT word-set Jaccard over candidate pairs.
                      Brute-force O(n²) twin kept ONLY as the DuckDB-
                      checkable correctness oracle at tiny SF.
* minhash_lsh       — MinHash signatures + banded LSH bucketing: the
                      scale path. Candidates come from an equi-join on
                      (band, bucket-hash) — a shuffle join on a spread
                      key, never a cross join. Recall vs exact Jaccard
                      is property-tested (tests/test_dedup.py).
* simhash           — 64-bit SimHash fingerprints; near-dup candidates
                      share one of 4 16-bit bands (Hamming ≤ 3 within
                      band scheme); verification by popcount distance.

MinHash/SimHash signature computation is a vectorized Arrow UDF (hash
mixing in NumPy, no per-row Python); candidate generation and
verification are pure DataFrame joins/aggs so Catalyst handles
partitioning, AQE handles skew.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# ---------------------------------------------------------------- exact
def exact_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(text_hash, n_dups, keep_id): groups with >1 identical docs."""
    return (
        df.groupBy(F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("text_hash"))
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_dups") > 1)
    )


def exact_dedup_groups_oracle_sql(table: str = "documents", id_col: str = "doc_id") -> str:
    return f"""
    SELECT md5(coalesce(text, '')) AS text_hash,
           count(*) AS n_dups,
           min({id_col}) AS keep_id
    FROM {table}
    GROUP BY 1 HAVING count(*) > 1
    """


def exact_dedup_keep(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Survivors after exact dedup: lowest id per identical text."""
    w = Window.partitionBy(F.md5(F.coalesce(F.col(text_col), F.lit("")))).orderBy(
        F.asc(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ------------------------------------------------------------- jaccard
def word_sets(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return df.select(
        F.col(id_col),
        F.array_distinct(
            F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), F.lit(0))
        ).alias("words"),
    )


def jaccard_pairs_exact(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All id pairs (a < b) with word-set Jaccard >= threshold.

    Brute force (cross join) — correctness oracle for tiny SF only; the
    production path is minhash_lsh_pairs below.
    """
    ws = word_sets(df, text_col, id_col)
    a = ws.select(F.col(id_col).alias("id_a"), F.col("words").alias("wa"))
    b = ws.select(F.col(id_col).alias("id_b"), F.col("words").alias("wb"))
    inter = F.size(F.array_intersect(F.col("wa"), F.col("wb")))
    union = F.size(F.array_union(F.col("wa"), F.col("wb")))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard", F.round(inter / F.greatest(union, F.lit(1)), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def jaccard_pairs_oracle_sql(table: str = "documents", threshold: float = 0.8, id_col: str = "doc_id") -> str:
    return f"""
    WITH ws AS (
        SELECT {id_col} AS id,
               list_distinct(regexp_extract_all(text, '\\S+')) AS words
        FROM {table}
    )
    SELECT a.id AS id_a, b.id AS id_b,
           round(len(list_intersect(a.words, b.words))
                 / greatest(len(list_distinct(list_concat(a.words, b.words))), 1),
                 6) AS jaccard
    FROM ws a JOIN ws b ON a.id < b.id
    WHERE len(list_intersect(a.words, b.words))
          / greatest(len(list_distinct(list_concat(a.words, b.words))), 1)
          >= {threshold}
    """


# ------------------------------------------------------------- minhash
N_HASHES = 64
N_BANDS = 16  # 4 rows/band → s-curve threshold ~ (1/16)^(1/4) ≈ 0.5
_MERSENNE = (1 << 61) - 1


def _hash_params(n: int, seed: int = 1234) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=n, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=n, dtype=np.int64).astype(np.uint64)
    return a, b


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Hashes of k-word shingles (uint64), vectorized: crc32 per word
    (zlib, C-speed, deterministic across workers — unlike builtin hash()
    under randomized PYTHONHASHSEED), then a rolling polynomial combine
    across the k window in NumPy. Word shingles are robust to formatting;
    k=5 is the common web-dedup choice."""
    import zlib

    words = text.split()
    if not words:
        return np.array([0xCBF29CE484222325], dtype=np.uint64)
    crcs = np.fromiter(
        (zlib.crc32(w.encode("utf-8")) for w in words),
        dtype=np.uint64,
        count=len(words),
    )
    P = np.uint64(1099511628211)
    if len(words) < k:
        h = np.uint64(0xCBF29CE484222325)
        for c in crcs:
            h = h * P + c
        return np.array([h], dtype=np.uint64)
    n = len(crcs) - k + 1
    with np.errstate(over="ignore"):
        h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
        for j in range(k):
            h = h * P + crcs[j : j + n]
    return h


def minhash_signature_udf(n_hashes: int = N_HASHES, shingle_k: int = 5):
    a, b = _hash_params(n_hashes)

    @pandas_udf(T.ArrayType(T.LongType()))
    def _sig(texts: pd.Series) -> pd.Series:
        sigs = []
        for t in texts.fillna(""):
            sh = _shingle_hashes(t, k=shingle_k)
            # (a*x + b) mod p, min over shingles, per hash function
            x = sh[:, None]  # (S, 1)
            hv = (x * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)
            sigs.append(hv.min(axis=0).astype(np.int64).tolist())
        return pd.Series(sigs)

    return _sig


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = N_HASHES,
    n_bands: int = N_BANDS,
    shingle_k: int = 5,
) -> DataFrame:
    """Candidate pairs via banded LSH, verified by signature similarity.

    Plan shape: map (signatures) → explode to (band, band_hash) →
    self-equi-join on (band, band_hash) → distinct pairs → verify.
    The join key spreads uniformly (hash values), so no skew; at 100 TB
    the band join is a plain shuffle join AQE can size.
    """
    rows_per_band = n_hashes // n_bands
    sig = minhash_signature_udf(n_hashes, shingle_k=shingle_k)
    with_sig = df.select(F.col(id_col).alias("id"), sig(F.col(text_col)).alias("sig"))
    bands = with_sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            F.slice(F.col("sig"), bi * rows_per_band + 1, rows_per_band)
                        ).alias("bhash"),
                    )
                    for bi in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", "bb.band", "bb.bhash")
    left = bands.select(
        F.col("band"), F.col("bhash"), F.col("id").alias("id_a"), F.col("sig").alias("sig_a")
    )
    right = bands.select(
        F.col("band"), F.col("bhash"), F.col("id").alias("id_b"), F.col("sig").alias("sig_b")
    )
    cand = (
        left.join(right, ["band", "bhash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    sim = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
            lambda eq: eq,
        )
    ) / F.lit(float(N_HASHES if n_hashes is None else n_hashes))
    return (
        cand.withColumn("est_jaccard", F.round(sim, 6))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


# -------------------------------------------------------------- simhash
def simhash_udf(ngram: int = 3):
    """64-bit SimHash over character n-grams (vectorized per batch)."""
    a, b = _hash_params(64, seed=777)

    @pandas_udf(T.LongType())
    def _simhash(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts.fillna("")):
            data = t.encode("utf-8")
            if len(data) < ngram:
                grams = np.array([hash(data) & 0x7FFFFFFFFFFFFFFF], dtype=np.uint64)
            else:
                arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
                g = arr[: len(arr) - ngram + 1].copy()
                for j in range(1, ngram):
                    g = g * np.uint64(257) + arr[j : len(arr) - ngram + 1 + j]
                grams = g
            # per-bit votes: bit k of mixed hash
            mixed = (grams[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)
            bits = (mixed >> np.uint64(13)) & np.uint64(1)  # (G, 64)
            votes = bits.sum(axis=0) * 2 > len(grams)
            h = np.uint64(0)
            for k in range(64):
                if votes[k]:
                    h |= np.uint64(1) << np.uint64(k)
            out[i] = np.int64(h.astype(np.int64))
        return pd.Series(out)

    return _simhash


def simhash_candidates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash: band on 4×16-bit chunks (any pair with
    Hamming distance ≤ 3 over 64 bits must agree on ≥1 chunk), verify by
    popcount of XOR."""
    sh = simhash_udf()
    base = df.select(F.col(id_col).alias("id"), sh(F.col(text_col)).alias("sh"))
    chunks = base.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("sh"), 16 * c).bitwiseAND(F.lit(0xFFFF)).alias("cval"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cc"),
    ).select("id", "sh", "cc.chunk", "cc.cval")
    l = chunks.select("chunk", "cval", F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    r = chunks.select("chunk", "cval", F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        l.join(r, ["chunk", "cval"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
