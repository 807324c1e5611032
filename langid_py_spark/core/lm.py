"""Char (byte) n-gram language model for perplexity scoring.

langid.py itself has no perplexity scorer; BASELINE.json::north_rule
mandates "KenLM-style perplexity scoring" for the quality filter. This is
an interpolated byte-trigram model (Jelinek-Mercer smoothing over
trigram/bigram/unigram/uniform — the public CCNet/Wenzek-2020 pattern at
small scale), stored as sorted uint32 key arrays + log-prob arrays so
batch lookup is two `np.searchsorted` calls — fully vectorizable inside
an Arrow UDF with zero per-row Python.

Key packing: trigram (b0<<16)|(b1<<8)|b2, bigram (b0<<8)|b1.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np

DEFAULT_LM_PATH = str(Path(__file__).resolve().parent.parent / "data" / "lm.npz")

LAMBDAS = (0.65, 0.25, 0.09, 0.01)  # tri, bi, uni, uniform


@dataclass
class TrigramLM:
    tri_keys: np.ndarray  # uint32 sorted
    tri_logp: np.ndarray  # float64 log P(b2 | b0 b1)  (conditional)
    bi_keys: np.ndarray  # uint32 sorted
    bi_logp: np.ndarray  # float64 log P(b1 | b0)
    uni_logp: np.ndarray  # float64[256] log P(b)

    def __post_init__(self) -> None:
        # Dense direct-address bigram table (2^16 floats, 512 KB): one
        # fancy index replaces a searchsorted over the sorted keys. Built
        # FROM (bi_keys, bi_logp) with -inf holes, so values are
        # bit-identical to the sorted-lookup path (goldens unchanged).
        # The trigram space (2^24) stays searchsorted — a dense table
        # there would cost 128 MB per Python worker.
        dense = np.full(1 << 16, -np.inf)
        if len(self.bi_keys):
            dense[self.bi_keys.astype(np.int64)] = self.bi_logp
        self._bi_dense = dense

    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            tri_keys=self.tri_keys,
            tri_logp=self.tri_logp,
            bi_keys=self.bi_keys,
            bi_logp=self.bi_logp,
            uni_logp=self.uni_logp,
        )

    @classmethod
    def load(cls, path: str = DEFAULT_LM_PATH) -> "TrigramLM":
        z = np.load(path, allow_pickle=False)
        return cls(
            tri_keys=z["tri_keys"],
            tri_logp=z["tri_logp"],
            bi_keys=z["bi_keys"],
            bi_logp=z["bi_logp"],
            uni_logp=z["uni_logp"],
        )

    def _lookup(self, keys: np.ndarray, table_k: np.ndarray, table_v: np.ndarray) -> np.ndarray:
        """Vectorized sorted-array lookup; missing keys → -inf."""
        if len(table_k) == 0:  # tiny corpora + min_count can empty a table
            return np.full(len(keys), -np.inf)
        pos = np.searchsorted(table_k, keys)
        pos_c = np.minimum(pos, len(table_k) - 1)
        hit = table_k[pos_c] == keys
        out = np.full(len(keys), -np.inf)
        out[hit] = table_v[pos_c[hit]]
        return out

    def logprob_bytes(self, data: np.ndarray) -> float:
        """Mean per-byte log-prob of one byte array (interpolated)."""
        n = len(data)
        if n == 0:
            return 0.0
        b = data.astype(np.uint32)
        p_uni = np.exp(self.uni_logp[b])
        probs = LAMBDAS[2] * p_uni + LAMBDAS[3] / 256.0
        if n >= 2:
            bi = (b[:-1] << 8) | b[1:]
            p_bi = np.exp(self._bi_dense[bi])
            probs[1:] += LAMBDAS[1] * p_bi
        if n >= 3:
            tri = (b[:-2] << 16) | (b[1:-1] << 8) | b[2:]
            p_tri = np.exp(self._lookup(tri, self.tri_keys, self.tri_logp))
            probs[2:] += LAMBDAS[0] * p_tri
        return float(np.log(probs).mean())

    def perplexity_batch(self, texts: list[str], max_bytes: int = 4096) -> np.ndarray:
        """exp(-mean log-prob) per doc; empty docs → ppl 1.0.

        Fully vectorized across the batch: all docs concatenate into one
        byte buffer; bigram/trigram keys are computed over the whole
        buffer with cross-document positions masked out; the two sorted-
        table lookups run once per batch; per-doc means come from one
        bincount. No per-row Python in the UDF hot path."""
        B = len(texts)
        out = np.ones(B, dtype=np.float64)
        if B == 0:
            return out
        datas = [
            t.encode("utf-8", "surrogatepass")[:max_bytes] for t in texts
        ]
        lens = np.fromiter((len(d) for d in datas), dtype=np.int64, count=B)
        total = int(lens.sum())
        if total == 0:
            return out
        buf = np.frombuffer(b"".join(datas), dtype=np.uint8).astype(np.uint32)
        doc_id = np.repeat(np.arange(B), lens)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        pos = np.arange(total) - starts[doc_id]

        probs = LAMBDAS[2] * np.exp(self.uni_logp[buf]) + LAMBDAS[3] / 256.0
        prev1 = np.empty_like(buf)
        prev1[0] = 0
        prev1[1:] = buf[:-1]
        m_bi = pos >= 1
        bi_keys = (prev1[m_bi] << 8) | buf[m_bi]
        probs[m_bi] += LAMBDAS[1] * np.exp(self._bi_dense[bi_keys])
        prev2 = np.empty_like(buf)
        prev2[:2] = 0
        prev2[2:] = buf[:-2]
        m_tri = pos >= 2
        tri_keys = (prev2[m_tri] << 16) | (prev1[m_tri] << 8) | buf[m_tri]
        probs[m_tri] += LAMBDAS[0] * np.exp(
            self._lookup(tri_keys, self.tri_keys, self.tri_logp)
        )
        sums = np.bincount(doc_id, weights=np.log(probs), minlength=B)
        nz = lens > 0
        out[nz] = np.exp(-(sums[nz] / lens[nz]))
        return out


DEFAULT_MULTI_LM_PATH = str(
    Path(__file__).resolve().parent.parent / "data" / "lm_by_lang.npz"
)

_GLOBAL_KEY = "__global__"


@dataclass
class MultiTrigramLM:
    """Per-LANGUAGE trigram LMs + a global fallback — the CCNet contract
    (Wenzek 2020 scores each document with ITS language's LM; a single
    global LM conflates script frequency with quality and systematically
    over-penalizes whichever languages dominate the byte space least).

    All tables live in ONE npz (langs are enumerable and each table is
    small); per executor the artifact is loaded once and the dict rides
    the UDF closure — the broadcast-analogue pattern of the NB model.
    """

    lms: dict[str, TrigramLM]
    fallback: TrigramLM

    def save(self, path: str) -> None:
        arrays: dict[str, np.ndarray] = {}
        for lang, lm in {**self.lms, _GLOBAL_KEY: self.fallback}.items():
            for field in ("tri_keys", "tri_logp", "bi_keys", "bi_logp", "uni_logp"):
                arrays[f"{lang}::{field}"] = getattr(lm, field)
        np.savez_compressed(path, **arrays)

    @classmethod
    def load(cls, path: str = DEFAULT_MULTI_LM_PATH) -> "MultiTrigramLM":
        z = np.load(path, allow_pickle=False)
        if not any("::" in k for k in z.files):
            # A flat TrigramLM npz (tri_keys/bi_keys/...) is the LEGACY
            # global-LM artifact; loading it here would die with an
            # opaque KeyError on 'lang::field' (ADVICE r04). Promote it
            # to a MultiTrigramLM with zero per-lang tables instead —
            # every doc then scores under the global fallback, which is
            # exactly the legacy semantics the caller asked for.
            if "tri_keys" in z.files:
                return cls(lms={}, fallback=TrigramLM.load(path))
            raise ValueError(
                f"{path} is neither a MultiTrigramLM npz ('lang::field' "
                "keys) nor a flat TrigramLM npz (tri_keys/bi_keys/...): "
                f"found keys {sorted(z.files)[:5]}..."
            )
        langs = sorted({k.split("::", 1)[0] for k in z.files})
        if _GLOBAL_KEY not in langs:
            raise ValueError(
                f"{path} has per-lang keys but no '{_GLOBAL_KEY}' fallback "
                "tables — not a valid MultiTrigramLM artifact"
            )
        lms = {
            lang: TrigramLM(
                tri_keys=z[f"{lang}::tri_keys"],
                tri_logp=z[f"{lang}::tri_logp"],
                bi_keys=z[f"{lang}::bi_keys"],
                bi_logp=z[f"{lang}::bi_logp"],
                uni_logp=z[f"{lang}::uni_logp"],
            )
            for lang in langs
        }
        fallback = lms.pop(_GLOBAL_KEY)
        return cls(lms=lms, fallback=fallback)

    def perplexity_batch_by_lang(
        self, texts: list[str], langs: list[str | None], max_bytes: int = 4096
    ) -> np.ndarray:
        """Per-doc perplexity under the doc's OWN language LM (global
        fallback for unknown/None langs). Batch-size-independent like
        perplexity_batch: each doc is scored only against its own bytes
        within its language sub-batch, so Arrow batch boundaries cannot
        change a value — golden-safe."""
        B = len(texts)
        out = np.empty(B, dtype=np.float64)
        keys = np.array(
            [l if (l is not None and l in self.lms) else _GLOBAL_KEY for l in langs],
            dtype=object,
        )
        for lang in np.unique(keys):
            lm = self.fallback if lang == _GLOBAL_KEY else self.lms[str(lang)]
            idx = np.flatnonzero(keys == lang)
            sub = lm.perplexity_batch([texts[i] for i in idx], max_bytes=max_bytes)
            out[idx] = sub
        return out


def train_lm(texts: list[str], min_count: int = 2) -> TrigramLM:
    """Estimate the interpolated byte-trigram LM from clean training text."""
    uni = np.zeros(256, dtype=np.float64)
    bi_c: dict[int, int] = {}
    tri_c: dict[int, int] = {}
    bi_ctx: dict[int, int] = {}
    tri_ctx: dict[int, int] = {}
    for t in texts:
        b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint32)
        if len(b) == 0:
            continue
        uni += np.bincount(b, minlength=256)
        if len(b) >= 2:
            keys = (b[:-1] << 8) | b[1:]
            for k, c in zip(*np.unique(keys, return_counts=True)):
                bi_c[int(k)] = bi_c.get(int(k), 0) + int(c)
                bi_ctx[int(k) >> 8] = bi_ctx.get(int(k) >> 8, 0) + int(c)
        if len(b) >= 3:
            keys = (b[:-2] << 16) | (b[1:-1] << 8) | b[2:]
            for k, c in zip(*np.unique(keys, return_counts=True)):
                tri_c[int(k)] = tri_c.get(int(k), 0) + int(c)
                tri_ctx[int(k) >> 8] = tri_ctx.get(int(k) >> 8, 0) + int(c)

    uni_logp = np.log((uni + 0.5) / (uni.sum() + 128.0))

    bi_items = sorted((k, c) for k, c in bi_c.items() if c >= min_count)
    bi_keys = np.array([k for k, _ in bi_items], dtype=np.uint32)
    bi_logp = np.array(
        [np.log(c / bi_ctx[k >> 8]) for k, c in bi_items], dtype=np.float64
    )
    tri_items = sorted((k, c) for k, c in tri_c.items() if c >= min_count)
    tri_keys = np.array([k for k, _ in tri_items], dtype=np.uint32)
    tri_logp = np.array(
        [np.log(c / tri_ctx[k >> 8]) for k, c in tri_items], dtype=np.float64
    )
    return TrigramLM(
        tri_keys=tri_keys, tri_logp=tri_logp, bi_keys=bi_keys, bi_logp=bi_logp, uni_logp=uni_logp
    )
