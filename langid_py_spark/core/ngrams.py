"""Byte n-gram extraction (training side).

Reference semantics: saffsd/langid.py ``langid/train/tokenize.py ::
Tokenizer.__call__`` — every byte substring of length 1..MAX_ORDER of the
UTF-8 encoded document is a candidate feature. Used only by the trainer
and by tests (the inference path never enumerates n-grams; it walks the
compiled DFA instead — see scanner.py).
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterable

MAX_ORDER = 4


def byte_ngrams(data: bytes, max_order: int = MAX_ORDER) -> Iterable[bytes]:
    """Yield every byte n-gram of length 1..max_order (with repeats)."""
    n = len(data)
    for i in range(n):
        for order in range(1, min(max_order, n - i) + 1):
            yield data[i : i + order]


def ngram_counts(data: bytes, max_order: int = MAX_ORDER) -> Counter:
    return Counter(byte_ngrams(data, max_order))


def count_features_naive(data: bytes, features: list[bytes]) -> list[int]:
    """Occurrence count of each feature as a substring (sliding window).

    O(len(data) * len(features)) — test oracle for the DFA walk only.
    """
    out = []
    for f in features:
        k, cnt, start = len(f), 0, 0
        while True:
            j = data.find(f, start)
            if j < 0:
                break
            cnt += 1
            start = j + 1
        out.append(cnt)
    return out
