"""Perplexity LM: clean text scores lower perplexity than noise."""

import numpy as np

from langid_py_spark.core.corpora import make_doc
from langid_py_spark.core.lm import TrigramLM, train_lm


def test_clean_vs_garbage():
    lm = TrigramLM.load()
    rng = np.random.RandomState(5)
    clean = make_doc(rng, "en", 5)
    garbage = "".join(chr(rng.randint(33, 1200)) for _ in range(300))
    ppl_clean = lm.perplexity_batch([clean])[0]
    ppl_garbage = lm.perplexity_batch([garbage])[0]
    assert ppl_clean < ppl_garbage / 3


def test_empty_and_tiny_total():
    lm = TrigramLM.load()
    out = lm.perplexity_batch(["", "a", "ab", "abc"])
    assert np.isfinite(out).all()
    assert out[0] == 1.0


def test_train_roundtrip(tmp_path):
    lm = train_lm(["hello world hello world", "the quick brown fox"] * 3, min_count=1)
    p = str(tmp_path / "lm.npz")
    lm.save(p)
    lm2 = TrigramLM.load(p)
    np.testing.assert_array_equal(lm.tri_keys, lm2.tri_keys)
    a = lm.perplexity_batch(["hello world"])
    b = lm2.perplexity_batch(["hello world"])
    np.testing.assert_allclose(a, b)
