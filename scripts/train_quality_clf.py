"""Train the committed quality-classifier weights DETERMINISTICALLY.

Generates a multilingual corpus from the engine's own deterministic
language generator (core/corpora.py::make_doc — the same generator the
fallback langid model trains on; NOT the sf documents table, whose text
is a language-free keyword soup with `lang` as a random label — no
signal to learn), computes the classifier features with the NumPy twin
(quality_classifier.feature_py — value-identical to the Catalyst and
DuckDB feature expressions, pinned by tests), trains fixed-iteration
full-batch logistic GD (fit_numpy — bit-reproducible), and writes
langid_py_spark/data/quality_clf.json.

Label (r06, de-circularized per VERDICT r05 item 6): reference-like
clean prose in ALL 18 languages (make_doc) = positive vs crawl-like
junk (make_crawl_doc: unicode soup, digit dumps, nav chrome, unbroken
identifier runs, boilerplate walls) = negative. This mirrors the real
CCNet/GPT-3 contrast (Wikipedia/books vs raw crawl) and no longer
leans on the langid model's own signal (the old label was lang=='en',
making the quality tier partially a restatement of language ID).

Usage: python scripts/train_quality_clf.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from langid_py_spark.core.corpora import LANGS, make_crawl_doc, make_doc  # noqa: E402
from langid_py_spark.operators.quality_classifier import (  # noqa: E402
    DEFAULT_CLF_PATH,
    FEATURE_NAMES,
    feature_py,
    fit_numpy,
)

N_PER_LANG = 120
SEED = 20260817


def build_corpus(
    n_per_lang: int = N_PER_LANG, seed: int = SEED
) -> tuple[list[str], np.ndarray]:
    """Balanced reference-like (1) vs crawl-like (0) pair; the junk
    side matches the clean side's size so the fit is not base-rate
    dominated. Shared by the trainer and the held-out test (different
    seeds)."""
    rng = np.random.RandomState(seed)
    texts, labels = [], []
    for lang in sorted(LANGS):
        for _ in range(n_per_lang):
            texts.append(make_doc(rng, lang, int(rng.randint(2, 7))))
            labels.append(1.0)
    for _ in range(n_per_lang * len(LANGS)):
        texts.append(make_crawl_doc(rng))
        labels.append(0.0)
    return texts, np.array(labels)


def main() -> None:
    texts, y = build_corpus()
    X = np.vstack([feature_py(t) for t in texts])
    bias, w = fit_numpy(X, y)
    z = X @ w + bias
    acc = float(((z > 0) == (y > 0.5)).mean())
    art = {
        "features": FEATURE_NAMES,
        "bias": float(bias),
        "weights": [float(x) for x in w],
        "label": "reference-like prose (all langs) vs crawl-like junk",
        "train_corpus": (
            f"make_doc x {N_PER_LANG}/lang + make_crawl_doc x "
            f"{N_PER_LANG}*|LANGS|, seed {SEED}"
        ),
        "train_rows": int(len(texts)),
        "train_accuracy": acc,
    }
    with open(DEFAULT_CLF_PATH, "w") as f:
        json.dump(art, f, indent=1)
    print(f"wrote {DEFAULT_CLF_PATH}: acc={acc:.4f} bias={bias:.4f}")
    print({n: round(float(x), 4) for n, x in zip(FEATURE_NAMES, w)})


if __name__ == "__main__":
    main()
