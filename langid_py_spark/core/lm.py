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
            p_bi = np.exp(self._lookup(bi, self.bi_keys, self.bi_logp))
            probs[1:] += LAMBDAS[1] * p_bi
        if n >= 3:
            tri = (b[:-2] << 16) | (b[1:-1] << 8) | b[2:]
            p_tri = np.exp(self._lookup(tri, self.tri_keys, self.tri_logp))
            probs[2:] += LAMBDAS[0] * p_tri
        return float(np.log(probs).mean())

    def perplexity_batch(self, texts: list[str], max_bytes: int = 4096) -> np.ndarray:
        """exp(-mean log-prob) per doc; empty docs → ppl 1.0."""
        out = np.empty(len(texts), dtype=np.float64)
        for i, t in enumerate(texts):
            data = np.frombuffer(
                t.encode("utf-8", "surrogatepass")[:max_bytes], dtype=np.uint8
            )
            out[i] = np.exp(-self.logprob_bytes(data))
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
