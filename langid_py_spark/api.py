"""Module-level convenience API mirroring saffsd/langid.py's public
surface (langid/__init__.py re-exports: classify, rank, set_languages;
module-level lazy singleton in langid/langid.py ~L480-L510).

Single-process (NumPy core) — the Spark pipeline is the distributed
path; this exists for API parity and driver-side use.

>>> import langid_py_spark.api as langid
>>> langid.classify("the quick brown fox")
('en', 0.99...)
"""

from __future__ import annotations

import threading

from langid_py_spark.core.model import DEFAULT_MODEL_PATH, NBModel

_lock = threading.Lock()
_identifier: NBModel | None = None
_identifier_path: str | None = None
_langs: list[str] | None = None


def load_model(path: str = DEFAULT_MODEL_PATH) -> NBModel:
    """Lazy global identifier (reference: load_model ~L480). The cache is
    keyed by `path` so a call with a different model path reloads instead
    of silently returning the previously loaded model."""
    global _identifier, _identifier_path
    with _lock:
        if _identifier is None or _identifier_path != path:
            _identifier = NBModel.load(path)
            _identifier_path = path
            if _langs:
                _identifier = _identifier.set_languages(_langs)
    return _identifier


def set_languages(langs: list[str] | None) -> None:
    """Restrict classification to `langs` (slices the model — reference
    set_languages ~L180 semantics; pass None to reset)."""
    global _identifier, _langs
    with _lock:
        _langs = list(langs) if langs else None
        _identifier = None  # re-slice lazily from the full model


def classify(text: str | bytes) -> tuple[str, float]:
    """(lang, normalized confidence) — reference classify (~L500)."""
    return load_model().classify(text)


def rank(text: str | bytes) -> list[tuple[str, float]]:
    """All languages sorted by normalized probability (~L270)."""
    return load_model().rank(text)
