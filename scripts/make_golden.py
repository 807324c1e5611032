"""Generate golden parquet oracles for the UDF-scored driver queries.

The driver's DuckDB oracle can't express the langid DFA walk, the LM
lookup, or the LSH kernels in SQL — but every one of those queries is
DETERMINISTIC, so we pre-compute the expected output with the NumPy
cores (the same functions the Arrow UDFs call, driven here WITHOUT
Spark) plus a faithful pandas re-implementation of the DataFrame-side
logic (banding, windows, joins). oracle_sql() then reads these files
via read_parquet(), upgrading the driver check for the hot operators
from rows-only to full row+schema+value-hash.

Independence note: the VALUE oracle is the shared NumPy core by design
(CLAUDE.md "Oracle = UDF code"); what this golden independently checks
is everything Spark-side — Arrow round-trips, batch boundaries, join/
window/banding logic, dtype handling — plus regression over time.

Rounding matches Spark's F.round (BigDecimal HALF_UP on the shortest
decimal repr), NOT numpy's banker's rounding.

Usage:  python scripts/make_golden.py [sf]      (default 0.01)
Output: langid_py_spark/data/golden/sf{sf}/<query>.parquet

Regenerate whenever a kernel or a golden-covered query changes, then
re-run scripts/check_oracles.py.
"""

from __future__ import annotations

import sys
from decimal import ROUND_HALF_UP, Decimal
from itertools import combinations
from pathlib import Path

import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from langid_py_spark import config as C  # noqa: E402
from langid_py_spark.core.lm import TrigramLM  # noqa: E402
from langid_py_spark.core.model import NBModel  # noqa: E402
from langid_py_spark.operators import dedup  # noqa: E402
from langid_py_spark.operators.similarity import N_BANDS as SRP_BANDS  # noqa: E402
from langid_py_spark.operators.similarity import (  # noqa: E402
    BAND_BITS,
    _planes,
    cos_pairwise,
    rowwise_gemm,
)


def round_half_up(x: float, nd: int) -> float:
    """Replicates Spark F.round: BigDecimal.valueOf(double) (shortest
    decimal repr) → setScale(nd, HALF_UP) → double."""
    q = Decimal(1).scaleb(-nd)
    return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))


def rhu(arr, nd: int) -> np.ndarray:
    return np.array([round_half_up(v, nd) for v in arr], dtype=np.float64)


# ------------------------------------------------------------- queries
def g_langid_documents(docs: pd.DataFrame) -> pd.DataFrame:
    m = NBModel.load()
    lang, _raw, norm, _nb = m.classify_batch(
        docs["text"].fillna("").tolist(), max_bytes=C.SCORE_MAX_BYTES
    )
    return pd.DataFrame(
        {"doc_id": docs["doc_id"].to_numpy(), "lang": lang, "conf_norm": rhu(norm, 6)}
    )


def g_perplexity_documents(docs: pd.DataFrame) -> pd.DataFrame:
    lm = TrigramLM.load()
    ppl = lm.perplexity_batch(
        docs["text"].fillna("").tolist(), max_bytes=C.SCORE_MAX_BYTES
    )
    return pd.DataFrame({"doc_id": docs["doc_id"].to_numpy(), "ppl": rhu(ppl, 4)})


def g_rank_languages(docs: pd.DataFrame) -> pd.DataFrame:
    m = NBModel.load()
    fv = m.batch_fv(docs["text"].fillna("").tolist(), max_bytes=4096)
    probs = m.norm_probs(m.nb_classprobs(fv))
    order = np.argsort(-probs, axis=1)  # same tie-break as rank_udf
    cls = np.array(m.nb_classes)
    i = np.arange(len(docs))
    return pd.DataFrame(
        {
            "doc_id": docs["doc_id"].to_numpy(),
            "lang1": cls[order[:, 0]],
            "prob1": rhu(probs[i, order[:, 0]], 6),
            "lang2": cls[order[:, 1]],
            "prob2": rhu(probs[i, order[:, 1]], 6),
        }
    )


def _minhash_sigs(texts: pd.Series) -> np.ndarray:
    a, b = dedup._hash_params(dedup.N_HASHES)
    crcs, lens = dedup._word_crcs_batch(texts)
    hashes, counts = dedup._rolling_hashes_batch(
        crcs, lens, k=5, prime=dedup._FNV_PRIME, init=dedup._FNV_OFFSET
    )
    seg = np.concatenate(([0], np.cumsum(counts)[:-1]))
    sig = np.empty((len(lens), dedup.N_HASHES), dtype=np.int64)
    M = np.uint64(dedup._MERSENNE)
    with np.errstate(over="ignore"):
        for hi in range(dedup.N_HASHES):
            hv = (hashes * a[hi] + b[hi]) % M
            sig[:, hi] = np.minimum.reduceat(hv, seg).astype(np.int64)
    return sig


def _band_pairs(
    ids: np.ndarray, band_keys: list[np.ndarray], max_bucket: int | None = None
) -> set[tuple[int, int]]:
    """Distinct (id_a < id_b) pairs sharing >= 1 band value. Spark hashes
    the band slice with xxhash64; equality of the slice == equality of the
    hash up to negligible 64-bit collisions. `max_bucket` mirrors the
    operators' stop-fingerprint guard (_drop_hot_buckets): buckets larger
    than the cap contribute no pairs."""
    pairs: set[tuple[int, int]] = set()
    for keys in band_keys:
        # group doc indices by band key (1-D structured view or tuple)
        order = np.argsort(keys, axis=0, kind="stable") if keys.ndim == 1 else None
        if keys.ndim == 1:
            srt = keys[order]
            idx = ids[order]
            bounds = np.flatnonzero(np.diff(srt) != 0) + 1
            groups = np.split(idx, bounds)
        else:  # 2-D slice: group via void view
            v = np.ascontiguousarray(keys).view(
                np.dtype((np.void, keys.dtype.itemsize * keys.shape[1]))
            ).ravel()
            order = np.argsort(v, kind="stable")
            srt = v[order]
            idx = ids[order]
            bounds = np.flatnonzero(srt[1:] != srt[:-1]) + 1
            groups = np.split(idx, bounds)
        for g in groups:
            if len(g) > 1 and (max_bucket is None or len(g) <= max_bucket):
                for x, y in combinations(sorted(map(int, g)), 2):
                    pairs.add((x, y))
    return pairs


def g_minhash_pairs(docs: pd.DataFrame, threshold: float = 0.5) -> pd.DataFrame:
    sig = _minhash_sigs(docs["text"])
    ids = docs["doc_id"].to_numpy()
    rows_per_band = dedup.N_HASHES // dedup.N_BANDS
    band_keys = [
        sig[:, b * rows_per_band : (b + 1) * rows_per_band]
        for b in range(dedup.N_BANDS)
    ]
    id_to_row = {int(i): r for r, i in enumerate(ids)}
    out = []
    for ia, ib in sorted(_band_pairs(ids, band_keys, max_bucket=500)):
        est = (sig[id_to_row[ia]] == sig[id_to_row[ib]]).sum() / float(dedup.N_HASHES)
        est = round_half_up(est, 6)
        if est >= threshold:
            out.append((ia, ib, est))
    return pd.DataFrame(out, columns=["id_a", "id_b", "est_jaccard"]).astype(
        {"id_a": np.int64, "id_b": np.int64, "est_jaccard": np.float64}
    )


def g_minhash_cross_pairs(
    docs: pd.DataFrame, threshold: float = 0.5, max_bucket: int = 500
) -> pd.DataFrame:
    """Bipartite twin: corpus = documents, ref = doc_id % 10 == 7 (the
    deterministic eval-set analogue the driver query uses). Pairs from
    shared band keys (corpus-side hot buckets dropped, matching
    _drop_hot_buckets on the corpus band table only), estimate from
    positional signature agreement — same arithmetic as the self-join
    golden."""
    from collections import defaultdict

    ref = docs[docs["doc_id"] % 10 == 7].reset_index(drop=True)
    sig_c = _minhash_sigs(docs["text"])
    sig_r = _minhash_sigs(ref["text"])
    ids_c = docs["doc_id"].to_numpy()
    ids_r = ref["doc_id"].to_numpy()
    rows_per_band = dedup.N_HASHES // dedup.N_BANDS
    cand: set[tuple[int, int]] = set()
    for b in range(dedup.N_BANDS):
        sl = slice(b * rows_per_band, (b + 1) * rows_per_band)
        gc: dict[bytes, list[int]] = defaultdict(list)
        gr: dict[bytes, list[int]] = defaultdict(list)
        for i, row in zip(ids_c, sig_c[:, sl]):
            gc[row.tobytes()].append(int(i))
        for i, row in zip(ids_r, sig_r[:, sl]):
            gr[row.tobytes()].append(int(i))
        for key, rids in gr.items():
            cids = gc.get(key, [])
            if max_bucket is not None and len(cids) > max_bucket:
                continue  # corpus-side stop-fingerprint guard
            for c in cids:
                for r in rids:
                    cand.add((c, r))
    row_c = {int(i): k for k, i in enumerate(ids_c)}
    row_r = {int(i): k for k, i in enumerate(ids_r)}
    out = []
    for c, r in sorted(cand):
        est = round_half_up(
            (sig_c[row_c[c]] == sig_r[row_r[r]]).sum() / float(dedup.N_HASHES), 6
        )
        if est >= threshold:
            out.append((c, r, est))
    return pd.DataFrame(out, columns=["doc_id", "ref_id", "est_jaccard"]).astype(
        {"doc_id": np.int64, "ref_id": np.int64, "est_jaccard": np.float64}
    )


def g_simhash_candidates(docs: pd.DataFrame, max_hamming: int = 3) -> pd.DataFrame:
    a, b = dedup._hash_params(64, seed=777)
    sh = dedup.simhash_batch(docs["text"].fillna("").tolist(), 3, a, b)
    ids = docs["doc_id"].to_numpy()
    shu = sh.astype(np.uint64)
    band_keys = [((shu >> np.uint64(16 * c)) & np.uint64(0xFFFF)) for c in range(4)]
    id_to_row = {int(i): r for r, i in enumerate(ids)}
    out = []
    for ia, ib in sorted(_band_pairs(ids, band_keys, max_bucket=500)):
        ham = int(bin(int(shu[id_to_row[ia]] ^ shu[id_to_row[ib]])).count("1"))
        if ham <= max_hamming:
            out.append((ia, ib, ham))
    return pd.DataFrame(out, columns=["id_a", "id_b", "hamming"]).astype(
        {"id_a": np.int64, "id_b": np.int64, "hamming": np.int64}
    )


def g_winnow_pairs(
    docs: pd.DataFrame,
    min_shared: int = 2,
    k: int = 20,
    window: int = 12,
    max_bucket: int = 200,
) -> pd.DataFrame:
    """Twin of winnow_pairs (same kernels, pandas join logic, incl. the
    stop-fingerprint max_bucket guard)."""
    from collections import Counter, defaultdict

    texts = docs["text"].fillna("").tolist()
    datas = [t.encode("utf-8") for t in texts]
    lens = np.fromiter((len(x) for x in datas), dtype=np.int64, count=len(datas))
    buf = np.frombuffer(b"".join(datas), dtype=np.uint8).astype(np.uint64)
    grams, counts = dedup._rolling_hashes_batch(
        buf, lens, k=k, prime=dedup._FNV_PRIME, init=dedup._FNV_OFFSET
    )
    fps = dedup._window_min_batch(grams, counts, window)
    ids = docs["doc_id"].to_numpy()
    n_fps = {int(ids[i]): len(f) for i, f in enumerate(fps)}
    docs_by_fp = defaultdict(list)
    for i, f in enumerate(fps):
        for v in f.tolist():
            docs_by_fp[v].append(int(ids[i]))
    shared: Counter = Counter()
    for _, ds in docs_by_fp.items():
        if len(ds) > max_bucket:  # mirrors _drop_hot_buckets
            continue
        ds = sorted(ds)
        for x in range(len(ds)):
            for y in range(x + 1, len(ds)):
                shared[(ds[x], ds[y])] += 1
    out = []
    for (ia, ib), n in sorted(shared.items()):
        if n >= min_shared:
            score = round_half_up(n / (n_fps[ia] + n_fps[ib] - n), 6)
            out.append((ia, ib, n, score))
    return pd.DataFrame(
        out, columns=["id_a", "id_b", "n_shared", "fp_jaccard"]
    ).astype(
        {"id_a": np.int64, "id_b": np.int64, "n_shared": np.int64, "fp_jaccard": np.float64}
    )


def g_srp_ann_topk(emb: pd.DataFrame, dim: int = 64, k: int = 5) -> pd.DataFrame:
    mat32 = np.vstack([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    planes = _planes(dim)
    bits = rowwise_gemm(mat32, planes) > 0  # same kernel as the sig UDF
    weights = (1 << np.arange(planes.shape[1])).astype(np.int64)
    sig = (bits @ weights).astype(np.uint64)
    ids = emb["vec_id"].to_numpy()
    qmask = ids < 5
    mask = np.uint64((1 << BAND_BITS) - 1)
    out = []
    for qrow in np.flatnonzero(qmask):
        qid = int(ids[qrow])
        qsig = sig[qrow]
        cand = np.zeros(len(ids), dtype=bool)
        for bnd in range(SRP_BANDS):
            sh = np.uint64(BAND_BITS * bnd)
            cand |= ((sig >> sh) & mask) == ((qsig >> sh) & mask)
        cand[ids == qid] = False
        qv = mat32[qrow]
        rows = np.flatnonzero(cand)
        # SAME kernel as cos_pairwise_udf (row-independent einsum) — golden
        # and Spark agree bit-for-bit before the 6dp HALF_UP round
        cos = rhu(
            cos_pairwise(
                np.ascontiguousarray(mat32[rows]),
                np.repeat(qv[None, :], len(rows), axis=0),
            ),
            6,
        )
        vid = ids[rows]
        order = np.lexsort((vid, -cos))[:k]
        for rk, j in enumerate(order, start=1):
            out.append((qid, int(vid[j]), float(cos[j]), rk))
    return pd.DataFrame(out, columns=["qid", "vec_id", "cos_sim", "rk"]).astype(
        {"qid": np.int64, "vec_id": np.int64, "cos_sim": np.float64, "rk": np.int64}
    )


def g_srp_dup_pairs(
    emb: pd.DataFrame,
    dim: int = 64,
    threshold: float = 0.45,
    max_bucket: int = 500,
    n_planes: int | None = None,
    band_bits: int = BAND_BITS,
) -> pd.DataFrame:
    """Twin of srp_dup_pairs: same planes/banding (incl. hot-bucket guard),
    same cos_pairwise kernel on the candidate pairs. Banding params mirror
    the operator's (defaults = the module constants the fixture query
    uses); the uint64 weight formulation is the sig UDF's own — at 64
    planes the top bit wraps identically in both int64 and uint64 views."""
    mat = np.vstack([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    planes = _planes(dim) if n_planes is None else _planes(dim, n_planes)
    bits = rowwise_gemm(mat, planes) > 0  # same kernel as the sig UDF
    weights = np.uint64(1) << np.arange(planes.shape[1], dtype=np.uint64)
    sig = bits.astype(np.uint64) @ weights
    ids = emb["vec_id"].to_numpy()
    n_bands = planes.shape[1] // band_bits
    mask = np.uint64((1 << band_bits) - 1)
    band_keys = [
        ((sig >> np.uint64(band_bits * b)) & mask) for b in range(n_bands)
    ]
    id_to_row = {int(i): r for r, i in enumerate(ids)}
    cand = sorted(_band_pairs(ids, band_keys, max_bucket=max_bucket))
    if not cand:
        return pd.DataFrame(columns=["id_a", "id_b", "cos_sim"]).astype(
            {"id_a": np.int64, "id_b": np.int64, "cos_sim": np.float64}
        )
    ra = np.array([id_to_row[a] for a, _ in cand])
    rb = np.array([id_to_row[b] for _, b in cand])
    cos = rhu(
        cos_pairwise(np.ascontiguousarray(mat[ra]), np.ascontiguousarray(mat[rb])), 6
    )
    keep = cos >= threshold
    return pd.DataFrame(
        {
            "id_a": np.array([a for a, _ in cand], dtype=np.int64)[keep],
            "id_b": np.array([b for _, b in cand], dtype=np.int64)[keep],
            "cos_sim": cos[keep],
        }
    )


def _tfidf_emb32(docs: pd.DataFrame, dim: int) -> np.ndarray:
    """Hashed TF-IDF embeddings via the SAME kernels the Arrow map calls
    (embedding._batch_tf_matrix / idf_vector; batch-composition
    independence is property-tested, so one full-corpus batch == Spark's
    arbitrary batching), same float order of ops as doc_embeddings.emit
    (float64 tf → *= idf → rowwise L2 → float32 cast). Returns the
    (n, dim) float32 matrix in docs row order."""
    from langid_py_spark.operators.embedding import _batch_tf_matrix, idf_vector

    texts = docs["text"].tolist()
    tf = _batch_tf_matrix(texts, dim).astype(np.float64)
    dfreq = [
        (b, int((tf[:, b] > 0).sum())) for b in range(dim) if (tf[:, b] > 0).any()
    ]
    idf = idf_vector(dfreq, len(texts), dim)
    mat = tf
    mat *= idf
    norms = np.sqrt((mat * mat).sum(axis=1))
    nz = norms > 0
    mat[nz] /= norms[nz, None]
    return mat.astype(np.float32)


def g_text_dup_pairs(
    docs: pd.DataFrame,
    dim: int = 256,
    threshold: float = 0.9,
    n_planes: int = 64,
    band_bits: int = 8,
) -> pd.DataFrame:
    """Twin of q_text_dup_pairs — the COMPOSED text → hashed-TF-IDF →
    SRP near-dup query: `_tfidf_emb32` embeddings, then the parametrized
    SRP twin at the operator's production 64/8 banding."""
    m32 = _tfidf_emb32(docs, dim)
    emb = pd.DataFrame(
        {
            "vec_id": docs["doc_id"].to_numpy(),
            "embedding": [row for row in m32],
        }
    )
    return g_srp_dup_pairs(
        emb, dim=dim, threshold=threshold, n_planes=n_planes, band_bits=band_bits
    )


def g_semdedup_drops(
    docs: pd.DataFrame, dim: int = 256, n_centroids: int = 16, eps: float = 0.9
) -> pd.DataFrame:
    """Twin of q_semdedup_drops — text → hashed-TF-IDF → spherical
    k-means clusters → within-cluster greedy semantic dedup. Every
    float-bearing step runs the operator's own kernels: `_tfidf_emb32`
    (embedding kernels), `spherical_kmeans` on the id-sorted float32→
    float64 matrix (== fit_ivf_centroids' orderBy(id).limit(sample)
    pull at fixture scale), assignment = argmax(rowwise_gemm(nm, C.T))
    (== ivf_assign_udf's formula, same `_l2_normalize`), and
    `semdedup.semdedup_cluster` per cluster — so the only thing this
    golden trusts Spark for is the groupBy/applyInPandas plumbing it
    exists to pin."""
    from langid_py_spark.operators.semdedup import semdedup_cluster
    from langid_py_spark.operators.similarity import (
        _l2_normalize,
        spherical_kmeans,
    )

    m32 = _tfidf_emb32(docs, dim)
    ids = docs["doc_id"].to_numpy()
    fit_order = np.argsort(ids, kind="stable")
    fitmat = np.vstack([m32[i].astype(np.float64) for i in fit_order])
    cents = spherical_kmeans(fitmat, n_centroids)
    full = np.vstack([r.astype(np.float64) for r in m32])
    assign = np.argmax(rowwise_gemm(_l2_normalize(full), cents.T), axis=1)
    out: list[pd.DataFrame] = []
    for cid in range(n_centroids):
        m = assign == cid
        if not m.any():
            continue
        d_ids, d_of, d_cos = semdedup_cluster(ids[m], full[m], cents[cid], eps)
        if len(d_ids):
            out.append(
                pd.DataFrame(
                    {
                        "doc_id": d_ids,
                        "dup_of": d_of,
                        "cluster_id": np.full(len(d_ids), cid, dtype=np.int64),
                        "cos_sim": rhu(d_cos, 6),
                    }
                )
            )
    if not out:
        return pd.DataFrame(
            {
                "doc_id": np.empty(0, dtype=ids.dtype),
                "dup_of": np.empty(0, dtype=ids.dtype),
                "cluster_id": np.empty(0, dtype=np.int64),
                "cos_sim": np.empty(0, dtype=np.float64),
            }
        )
    return (
        pd.concat(out, ignore_index=True)
        .sort_values(["doc_id", "dup_of"])
        .reset_index(drop=True)
    )


def g_ivf_ann_topk(
    emb: pd.DataFrame, n_centroids: int = 16, n_probe: int = 4, k: int = 5
) -> pd.DataFrame:
    """Twin of q_ivf_ann_topk: same sample (first 2000 by vec_id), same
    spherical_kmeans function, same assign/probe/re-rank logic in numpy."""
    from langid_py_spark.operators.similarity import _l2_normalize, spherical_kmeans

    e = emb.sort_values("vec_id").reset_index(drop=True)
    mat = np.vstack([np.asarray(v, dtype=np.float64) for v in e["embedding"]])
    c = spherical_kmeans(mat[:2000], n_centroids)
    norm = _l2_normalize(mat)
    # same rowwise kernel as ivf_assign_udf / ivf_probe_udf
    assign = np.argmax(rowwise_gemm(norm, c.T), axis=1)
    ids = e["vec_id"].to_numpy()
    out = []
    for qrow in np.flatnonzero(ids < 5):
        qid = int(ids[qrow])
        sims_c = rowwise_gemm(norm[qrow : qrow + 1], c.T)[0]
        probes = np.argsort(-sims_c, kind="stable")[:n_probe]
        cand = np.isin(assign, probes)
        cand[ids == qid] = False
        rows = np.flatnonzero(cand)
        qv = mat[qrow]
        cos = rhu(
            cos_pairwise(
                np.ascontiguousarray(mat[rows]),
                np.repeat(qv[None, :], len(rows), axis=0),
            ),
            6,
        )
        vid = ids[rows]
        order = np.lexsort((vid, -cos))[:k]
        for rk, j in enumerate(order, start=1):
            out.append((qid, int(vid[j]), float(cos[j]), rk))
    return pd.DataFrame(out, columns=["qid", "vec_id", "cos_sim", "rk"]).astype(
        {"qid": np.int64, "vec_id": np.int64, "cos_sim": np.float64, "rk": np.int64}
    )


def g_cluster_safe_split(
    docs: pd.DataFrame,
    clusters: pd.DataFrame,
    weights: dict[str, float],
    salt: str = "split42",
) -> pd.DataFrame:
    """Twin of sampling.leakage_safe_split over the union-find golden:
    key = str(cluster_id or own doc_id), split = cumulative md5
    hex-prefix thresholds — the exact string-compare map the Spark CASE
    chain evaluates (no float at row scope on either side)."""
    import hashlib

    cmap = dict(
        zip(clusters["doc_id"].astype(int), clusters["cluster_id"].astype(int))
    )
    names = list(weights)
    cum, ths = 0.0, []
    for name in names[:-1]:
        cum += weights[name]
        ths.append((format(int(cum * (1 << 24)), "06x"), name))
    rows = []
    for did in docs["doc_id"].astype(int):
        key = str(cmap.get(did, did))
        prefix = hashlib.md5((key + salt).encode()).hexdigest()[:6]
        split = next((n for th, n in ths if prefix < th), names[-1])
        rows.append((did, split))
    return pd.DataFrame(rows, columns=["doc_id", "split"]).astype(
        {"doc_id": np.int64}
    )


def g_dedup_clusters(pair_frames: list[pd.DataFrame]) -> pd.DataFrame:
    """Twin of operators/cluster.dedup_clusters over the UNION of the
    near-dup pair tables: plain union-find (path-halving) with the min
    node id as the component representative — an INDEPENDENT algorithm
    from the Spark side's large-star/small-star iteration, so agreement
    here pins the distributed CC logic, not just shared kernels."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for frame in pair_frames:
        for a, b in zip(frame["id_a"].astype(int), frame["id_b"].astype(int)):
            for n in (a, b):
                if n not in parent:
                    parent[n] = n
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by MIN id so the root IS the representative
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
    rows = sorted((n, find(n)) for n in parent)
    return pd.DataFrame(
        [(n, r, n == r) for n, r in rows],
        columns=["doc_id", "cluster_id", "is_rep"],
    ).astype({"doc_id": np.int64, "cluster_id": np.int64, "is_rep": bool})


def g_substring_spans_winnowed(
    docs: pd.DataFrame, k: int = 30, window: int = 8
) -> pd.DataFrame:
    """Winnowed sub-document dup spans: SAME anchor kernel as the Spark
    UDF (codepoint rolling hashes + window-argmin — both per-doc
    independent, so Arrow batch composition cannot shift a value) +
    pandas twin of the gram-count / gaps-and-islands DataFrame logic."""
    from collections import Counter
    from itertools import groupby

    from langid_py_spark.operators.spandedup import (
        _codepoints_batch,
        _winnow_anchor_positions,
    )

    texts = docs["text"].fillna("").tolist()
    ids = docs["doc_id"].tolist()
    buf, lens = _codepoints_batch(texts)
    grams, counts = dedup._rolling_hashes_batch(
        buf, lens, k, dedup._FNV_PRIME, dedup._FNV_OFFSET
    )
    sel = _winnow_anchor_positions(grams, counts, window)
    gram_count: Counter = Counter()
    anchor_rows: list[tuple[int, int, str]] = []
    for i, t in enumerate(texts):
        if lens[i] < k:
            continue
        for p in sel[i]:
            g = t[p : p + k]
            anchor_rows.append((ids[i], int(p), g))
            gram_count[g] += 1
    flagged = sorted((d, p) for d, p, g in anchor_rows if gram_count[g] >= 2)
    gap = k + window
    out = []
    for d, grp in groupby(flagged, key=lambda r: r[0]):
        poss = [p for _, p in grp]
        start = prev = poss[0]
        n = 1
        for p in poss[1:]:
            if p - prev <= gap:
                prev = p
                n += 1
            else:
                out.append((d, start, prev + k, n))
                start = prev = p
                n = 1
        out.append((d, start, prev + k, n))
    return pd.DataFrame(
        out, columns=["doc_id", "span_start", "span_end", "n_grams"]
    ).astype(
        {
            "doc_id": np.int64,
            "span_start": np.int64,
            "span_end": np.int64,
            "n_grams": np.int64,
        }
    )


def g_ccnet_ppl_buckets(docs: pd.DataFrame, approx: bool = False) -> pd.DataFrame:
    """Twin of quality.ccnet_ppl_buckets: same LM kernel, per-lang tercile
    thresholds via linear-interpolated percentile (Spark F.percentile and
    np.percentile(method='linear') use the same definition; bucket
    assignment is robust to last-ulp threshold drift — see the operator
    docstring).

    approx=True models percentile_approx(_, p, 10000): the t-digest-
    style summary's rank error is n/accuracy rows, which is < 1 row for
    every group smaller than the accuracy — so at oracle SF the approx
    path is RANK-EXACT and deterministic: the sorted value at 0-indexed
    rank ceil(p*n)-1 (verified against Spark on every fixture group).
    At production group sizes it is genuinely approximate, which CCNet
    tolerates (the cut is a tuning knob, not a contract)."""
    from langid_py_spark.core.lm import MultiTrigramLM

    d = docs.reset_index(drop=True)
    # NULL lang -> 'und' sentinel, mirroring the operator's coalesce;
    # per-lang LM selection keyed by the same column ('und' -> fallback)
    d = d.assign(lang=d["lang"].fillna("und"))
    mlm = MultiTrigramLM.load()
    ppl = mlm.perplexity_batch_by_lang(
        d["text"].fillna("").tolist(), d["lang"].tolist(), max_bytes=4096
    )
    rows = []
    for _lang, idx in d.groupby("lang").groups.items():
        ii = np.asarray(idx)
        vals = ppl[ii]
        if approx:
            v = np.sort(vals)
            n = len(v)
            # same float p the operator passes to percentile_approx
            t1 = v[int(np.ceil((1 / 3) * n)) - 1]
            t2 = v[int(np.ceil((2 / 3) * n)) - 1]
        else:
            t1 = np.percentile(vals, 100 / 3, method="linear")
            t2 = np.percentile(vals, 200 / 3, method="linear")
        for i in ii:
            b = "head" if ppl[i] <= t1 else ("middle" if ppl[i] <= t2 else "tail")
            rows.append((int(d["doc_id"][i]), d["lang"][i], round_half_up(ppl[i], 4), b))
    return (
        pd.DataFrame(rows, columns=["doc_id", "lang", "ppl", "bucket"])
        .astype({"doc_id": np.int64, "ppl": np.float64})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def g_media_features(n: int = 64) -> pd.DataFrame:
    """Twin of multimodal.synth_media + decode_media — calls the SAME
    functions (no inlined constants, so a multimodal.py change cannot
    silently desync this golden; ADVICE r02). Since r06 the payloads
    are real BMP/PPM/WAV files and the dimensions come from the parsed
    headers."""
    from langid_py_spark.operators.multimodal import decode_media, synth_payload

    rows = []
    for i in range(n):
        mime, nb, payload = synth_payload(i)
        w, h, _feat = decode_media(payload, mime)
        rows.append((i, mime, nb, w, h, 8))
    return pd.DataFrame(
        rows, columns=["media_id", "mime", "nbytes", "width", "height", "feat_dim"]
    ).astype(
        {
            "media_id": np.int64,
            "nbytes": np.int64,
            "width": np.int64,
            "height": np.int64,
            "feat_dim": np.int64,
        }
    )


def g_byte_ngram_df_topk(
    docs: pd.DataFrame, n_docs: int = 200, max_order: int = 2, k: int = 50
) -> pd.DataFrame:
    """Twin of explode_byte_ngrams(limit 200) → df_feature_select(50)."""
    from collections import Counter

    # orderBy(doc_id).limit mirrors the query's deterministic subset
    sub = docs.sort_values("doc_id").head(n_docs)
    df_tally: Counter = Counter()
    for t in sub["text"].fillna(""):
        data = t.encode("utf-8")
        grams = set()
        for i in range(len(data)):
            for o in range(1, min(max_order, len(data) - i) + 1):
                grams.add(data[i : i + o].hex())
        df_tally.update(grams)
    rows = []
    items = sorted(df_tally.items())
    for order in range(1, max_order + 1):
        of = [(f, c) for f, c in items if len(f) == 2 * order]
        of.sort(key=lambda fc: (-fc[1], fc[0]))  # df desc, feature asc
        for rk, (f, c) in enumerate(of[:k], start=1):
            rows.append((f, order, c, rk))
    return pd.DataFrame(rows, columns=["feature", "ord", "df", "rk"]).astype(
        {"ord": np.int64, "df": np.int64, "rk": np.int64}
    )


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "0.01"
    sf_dir = Path(f"/root/testdata/sf{sf}")
    out_dir = REPO / "langid_py_spark" / "data" / "golden" / f"sf{sf}"
    out_dir.mkdir(parents=True, exist_ok=True)
    docs = pd.read_parquet(sf_dir / "documents.parquet")
    emb = pd.read_parquet(sf_dir / "embeddings.parquet")

    mh = g_minhash_pairs(docs)
    sh = g_simhash_candidates(docs)
    wp = g_winnow_pairs(docs)
    goldens = {
        "langid_documents": g_langid_documents(docs),
        "perplexity_documents": g_perplexity_documents(docs),
        "rank_languages": g_rank_languages(docs),
        "minhash_pairs": mh,
        "simhash_candidates": sh,
        "winnow_pairs": wp,
        "dedup_clusters": (dc := g_dedup_clusters([mh, sh, wp])),
        "cluster_safe_split": g_cluster_safe_split(
            docs, dc, {"train": 0.8, "val": 0.1, "test": 0.1}
        ),
        "srp_ann_topk": g_srp_ann_topk(emb),
        "srp_dup_pairs": g_srp_dup_pairs(emb),
        "text_dup_pairs": g_text_dup_pairs(docs),
        "semdedup_drops": g_semdedup_drops(docs),
        "ivf_ann_topk": g_ivf_ann_topk(emb),
        "substring_spans_winnowed": g_substring_spans_winnowed(docs),
        "minhash_cross_pairs": g_minhash_cross_pairs(docs),
        "ccnet_ppl_buckets": g_ccnet_ppl_buckets(docs),
        "ccnet_ppl_buckets_approx": g_ccnet_ppl_buckets(docs, approx=True),
        "media_features": g_media_features(),
        "byte_ngram_df_topk": g_byte_ngram_df_topk(docs),
    }
    for name, frame in goldens.items():
        p = out_dir / f"{name}.parquet"
        frame.to_parquet(p, index=False)
        print(f"{name}: {len(frame)} rows -> {p}")


if __name__ == "__main__":
    main()
