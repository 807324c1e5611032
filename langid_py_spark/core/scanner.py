"""Aho-Corasick automaton compiled to dense NumPy transition arrays.

Re-derivation of the reference's core algorithmic asset
(saffsd/langid.py ``langid/train/scanner.py :: Scanner``): build the
goto/fail trie over the selected feature byte strings, then flatten it
into a TRUE DFA so inference is one array lookup per input byte:

    state = tk_nextmove[(state << 8) + byte]      # langid.py instance2fv

Outputs (features ending at a state, including via the fail chain) are
stored CSR-style — ``out_indptr``/``out_feats`` — instead of the
reference's ``tk_output`` dict, so batch expansion is pure NumPy
(SURVEY.md §4 "state-visit counting").

Implementation is from first principles (Aho & Corasick 1975); no
reference code was available or copied (SURVEY.md §0).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass

import numpy as np


@dataclass
class DFA:
    """Dense byte-level DFA over a feature set."""

    nextmove: np.ndarray  # uint32[nstates * 256], index (state << 8) | byte
    out_indptr: np.ndarray  # int64[nstates + 1]
    out_feats: np.ndarray  # int32[nnz] feature indices
    nstates: int

    def features_of_state(self, s: int) -> np.ndarray:
        return self.out_feats[self.out_indptr[s] : self.out_indptr[s + 1]]


def build_dfa(features: list[bytes]) -> DFA:
    """Build the flattened Aho-Corasick DFA for `features`.

    Feature index i corresponds to features[i]; caller fixes ordering.
    """
    if not features:
        raise ValueError("empty feature set")

    # --- trie (goto function) ---
    # children[state] : dict byte -> state
    children: list[dict[int, int]] = [{}]
    ends: list[list[int]] = [[]]  # feature indices terminating exactly here
    for fi, feat in enumerate(features):
        s = 0
        for b in feat:
            nxt = children[s].get(b)
            if nxt is None:
                nxt = len(children)
                children[s][b] = nxt
                children.append({})
                ends.append([])
            s = nxt
        ends[s].append(fi)

    nstates = len(children)
    fail = np.zeros(nstates, dtype=np.int64)
    nextmove = np.zeros(nstates * 256, dtype=np.uint32)
    # outputs as python lists first (output(s) = ends(s) + output(fail(s)))
    outputs: list[list[int]] = [list(e) for e in ends]

    # --- BFS: fail links + DFA flattening in one pass ---
    q: deque[int] = deque()
    for b in range(256):
        c = children[0].get(b)
        if c is None:
            nextmove[b] = 0
        else:
            nextmove[b] = c
            fail[c] = 0
            q.append(c)
    while q:
        s = q.popleft()
        f = fail[s]
        if outputs[f]:
            outputs[s] = outputs[s] + outputs[f]
        base = s << 8
        fbase = int(f) << 8
        for b in range(256):
            c = children[s].get(b)
            if c is None:
                nextmove[base + b] = nextmove[fbase + b]
            else:
                nextmove[base + b] = c
                fail[c] = nextmove[fbase + b]
                q.append(c)

    indptr = np.zeros(nstates + 1, dtype=np.int64)
    for s in range(nstates):
        indptr[s + 1] = indptr[s] + len(outputs[s])
    feats = np.empty(indptr[-1], dtype=np.int32)
    pos = 0
    for s in range(nstates):
        for fi in outputs[s]:
            feats[pos] = fi
            pos += 1
    return DFA(nextmove=nextmove, out_indptr=indptr, out_feats=feats, nstates=nstates)


def walk_states_single(dfa: DFA, data: bytes) -> np.ndarray:
    """State sequence for one document (test oracle; batch path in model.py)."""
    states = np.empty(len(data), dtype=np.int64)
    s = 0
    nm = dfa.nextmove
    for i, b in enumerate(data):
        s = int(nm[(s << 8) + b])
        states[i] = s
    return states
