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

Label: lang == 'en' — the stand-in for "is reference-corpus text" (the
CCNet recipe classifies reference-corpus vs crawl; in production the
positive class is Wikipedia/books text, the negative raw crawl — same
features, same trainer).

Usage: python scripts/train_quality_clf.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from langid_py_spark.core.corpora import LANGS, make_doc  # noqa: E402
from langid_py_spark.operators.quality_classifier import (  # noqa: E402
    DEFAULT_CLF_PATH,
    FEATURE_NAMES,
    feature_py,
    fit_numpy,
)

N_PER_LANG = 120
SEED = 20260817


def build_corpus() -> tuple[list[str], np.ndarray]:
    rng = np.random.RandomState(SEED)
    texts, labels = [], []
    for lang in sorted(LANGS):
        for _ in range(N_PER_LANG):
            texts.append(make_doc(rng, lang, int(rng.randint(2, 7))))
            labels.append(1.0 if lang == "en" else 0.0)
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
        "label": "lang == 'en' (reference-corpus stand-in)",
        "train_corpus": f"make_doc x {N_PER_LANG}/lang, seed {SEED}",
        "train_rows": int(len(texts)),
        "train_accuracy": acc,
    }
    with open(DEFAULT_CLF_PATH, "w") as f:
        json.dump(art, f, indent=1)
    print(f"wrote {DEFAULT_CLF_PATH}: acc={acc:.4f} bias={bias:.4f}")
    print({n: round(float(x), 4) for n, x in zip(FEATURE_NAMES, w)})


if __name__ == "__main__":
    main()
