"""Local (single-process) trainer for the fallback NB model.

Mirrors the SEMANTICS of the reference training pipeline
(saffsd/langid.py ``langid/train/``: tokenize → DFfeatureselect →
IGweight → LDfeatureselect → scanner → NBtrain) in plain NumPy so a
model with the reference's exact shape exists before /root/reference
mounts (SURVEY.md §7 Milestone 0 Path B). The Spark re-expression of the
same stages lives in ``operators/train_pipeline.py``; this local version
doubles as its small-scale oracle.

Stages:
  1. DF tally: document frequency of every byte 1-4-gram
     (ref: train/DFfeatureselect.py :: tally)
  2. top-k candidates per n-gram order by DF
     (ref: DFfeatureselect.py :: ngram_select)
  3. per-language information gain of candidate presence, one-vs-rest
     binarized (ref: train/IGweight.py :: ig)
  4. top-m features per language by IG, union → final feature set
     (ref: train/LDfeatureselect.py; with a single synthetic "domain",
     LD = IG_lang − IG_domain degenerates to IG_lang)
  5. Aho-Corasick DFA over the final set (ref: train/scanner.py)
  6. NB sufficient statistics via the DFA itself + Laplace smoothing
     (ref: train/NBtrain.py: nb_ptc = log P(t|c), nb_pc = log doc prior)
"""

from __future__ import annotations

from collections import Counter

import numpy as np

from .corpora import LANGS, training_corpus
from .model import NBModel
from .ngrams import MAX_ORDER, ngram_counts
from .scanner import build_dfa


def entropy(counts: np.ndarray) -> float:
    tot = counts.sum()
    if tot == 0:
        return 0.0
    p = counts[counts > 0] / tot
    return float(-(p * np.log2(p)).sum())


def ig_binarized(present: np.ndarray, labels: np.ndarray, n_classes: int) -> float:
    """Information gain of a boolean feature w.r.t. class labels
    (ref: IGweight.py lang-binarized path, summed over one-vs-rest)."""
    n = len(labels)
    h_c = entropy(np.bincount(labels, minlength=n_classes))
    gain = 0.0
    for val in (True, False):
        sel = labels[present == val]
        w = len(sel) / n
        if w:
            gain += w * entropy(np.bincount(sel, minlength=n_classes))
    return h_c - gain


def train_fallback_model(
    docs_per_lang: int = 300,
    candidates_per_order: int = 500,
    feats_per_lang: int = 150,
    seed: int = 42,
) -> NBModel:
    pairs = training_corpus(docs_per_lang=docs_per_lang, seed=seed)
    langs = LANGS
    lang_idx = {l: i for i, l in enumerate(langs)}
    labels = np.array([lang_idx[l] for l, _ in pairs], dtype=np.int64)
    docs = [t.encode("utf-8") for _, t in pairs]
    n_docs, n_classes = len(docs), len(langs)

    # 1. per-doc n-gram counts + global document frequency
    doc_counters: list[Counter] = [ngram_counts(d) for d in docs]
    df: Counter = Counter()
    for c in doc_counters:
        df.update(c.keys())

    # 2. top-k per order by DF (ties broken lexically for determinism)
    candidates: list[bytes] = []
    for order in range(1, MAX_ORDER + 1):
        feats = [(f, n) for f, n in df.items() if len(f) == order]
        feats.sort(key=lambda fn: (-fn[1], fn[0]))
        candidates.extend(f for f, _ in feats[:candidates_per_order])

    # 3. IG of presence per candidate
    cand_idx = {f: i for i, f in enumerate(candidates)}
    presence = np.zeros((n_docs, len(candidates)), dtype=bool)
    for di, c in enumerate(doc_counters):
        for f in c:
            j = cand_idx.get(f)
            if j is not None:
                presence[di, j] = True
    ig = np.array(
        [ig_binarized(presence[:, j], labels, n_classes) for j in range(len(candidates))]
    )

    # 4. per-language top-m by IG among features over-represented in that
    #    language; union = final set, sorted for determinism
    final: set[bytes] = set()
    for ci in range(n_classes):
        in_c = presence[labels == ci].mean(axis=0)
        out_c = presence[labels != ci].mean(axis=0)
        affinity = in_c - out_c
        score = ig * np.sign(affinity)
        order = np.argsort(-score, kind="stable")
        final.update(candidates[j] for j in order[:feats_per_lang])
    features = sorted(final)

    # 5. DFA over the final feature set
    dfa = build_dfa(features)

    # 6. NB parameters, counting features WITH the DFA (self-consistent
    #    with inference, including substring double-counting semantics)
    model_tmp = NBModel.from_dfa(
        dfa,
        nb_ptc=np.zeros((len(features), n_classes)),
        nb_pc=np.zeros(n_classes),
        classes=list(langs),
        features=features,
    )
    term_class = np.zeros((len(features), n_classes), dtype=np.float64)
    B = 256
    for s in range(0, n_docs, B):
        fv = model_tmp.batch_fv(docs[s : s + B])
        for ci in range(n_classes):
            sel = labels[s : s + B] == ci
            if sel.any():
                term_class[:, ci] += fv[sel].sum(axis=0)
    ptc = np.log((term_class + 1.0) / (term_class + 1.0).sum(axis=0, keepdims=True))
    doc_counts = np.bincount(labels, minlength=n_classes).astype(np.float64)
    pc = np.log(doc_counts / doc_counts.sum())
    return NBModel.from_dfa(dfa, nb_ptc=ptc, nb_pc=pc, classes=list(langs), features=features)
