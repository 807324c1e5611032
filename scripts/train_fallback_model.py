#!/usr/bin/env python3
"""Train the deterministic fallback model + char-trigram LM and write them
to langid_py_spark/data/{model.npz,lm.npz} (SURVEY.md §7 Milestone 0 Path B).

Re-running always produces identical artifacts (seed=42 end-to-end).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from langid_py_spark.core.corpora import training_corpus  # noqa: E402
from langid_py_spark.core.lm import MultiTrigramLM, train_lm  # noqa: E402
from langid_py_spark.core.trainer import train_fallback_model  # noqa: E402


def main() -> None:
    out_dir = REPO / "langid_py_spark" / "data"
    out_dir.mkdir(parents=True, exist_ok=True)

    t0 = time.time()
    model = train_fallback_model()
    model.save(str(out_dir / "model.npz"))
    print(
        f"model.npz: {model.nb_numfeats} feats, {len(model.nb_classes)} langs, "
        f"{model.nstates} DFA states, {time.time() - t0:.1f}s"
    )

    t0 = time.time()
    corpus = training_corpus()
    lm = train_lm([t for _, t in corpus])
    lm.save(str(out_dir / "lm.npz"))
    print(f"lm.npz: {len(lm.tri_keys)} trigrams, {time.time() - t0:.1f}s")

    # per-language LMs (CCNet scores each doc with ITS language's LM);
    # the global LM above rides along as the unknown-lang fallback
    t0 = time.time()
    by_lang: dict[str, list[str]] = {}
    for lang, text in corpus:
        by_lang.setdefault(lang, []).append(text)
    multi = MultiTrigramLM(
        lms={lang: train_lm(texts) for lang, texts in sorted(by_lang.items())},
        fallback=lm,
    )
    multi.save(str(out_dir / "lm_by_lang.npz"))
    sizes = {lang: len(m.tri_keys) for lang, m in multi.lms.items()}
    print(
        f"lm_by_lang.npz: {len(multi.lms)} langs, "
        f"tri tables {min(sizes.values())}-{max(sizes.values())}, "
        f"{time.time() - t0:.1f}s"
    )


if __name__ == "__main__":
    main()
