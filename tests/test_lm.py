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


def test_multi_lm_selects_per_language():
    """Per-lang LM (CCNet contract): each doc scored under ITS language's
    LM must equal that single LM's score exactly; unknown/None langs use
    the global fallback; a doc in its OWN language scores lower ppl
    under its own LM than most foreign LMs (that's the point)."""
    from langid_py_spark.core.lm import MultiTrigramLM

    mlm = MultiTrigramLM.load()
    assert len(mlm.lms) == 18
    rng = np.random.RandomState(9)
    en, de = make_doc(rng, "en", 4), make_doc(rng, "de", 4)
    texts = [en, de, en, ""]
    langs = ["en", "de", None, "xx"]
    got = mlm.perplexity_batch_by_lang(texts, langs)
    np.testing.assert_array_equal(got[0], mlm.lms["en"].perplexity_batch([en])[0])
    np.testing.assert_array_equal(got[1], mlm.lms["de"].perplexity_batch([de])[0])
    np.testing.assert_array_equal(got[2], mlm.fallback.perplexity_batch([en])[0])
    assert got[3] == 1.0  # empty doc under fallback
    # own-language LM fits better than a distant one
    assert mlm.lms["en"].perplexity_batch([en])[0] < mlm.lms["zh"].perplexity_batch([en])[0]


def test_multi_lm_batch_independent_and_roundtrip(tmp_path):
    """Golden-safety: per-doc values must not depend on batch composition
    (docs are grouped by lang internally — regrouping must not shift a
    bit), and save/load round-trips bit-exactly."""
    from langid_py_spark.core.lm import MultiTrigramLM

    mlm = MultiTrigramLM.load()
    rng = np.random.RandomState(3)
    texts = [make_doc(rng, l, 2) for l in ("en", "de", "zh", "en", "ru", "fr")]
    langs = ["en", "de", "zh", "ru", None, "fr"]  # deliberate mismatches too
    full = mlm.perplexity_batch_by_lang(texts, langs)
    for cut in (1, 3, 5):
        parts = np.concatenate(
            [
                mlm.perplexity_batch_by_lang(texts[:cut], langs[:cut]),
                mlm.perplexity_batch_by_lang(texts[cut:], langs[cut:]),
            ]
        )
        np.testing.assert_array_equal(parts, full)
    p = str(tmp_path / "mlm.npz")
    mlm.save(p)
    back = MultiTrigramLM.load(p)
    np.testing.assert_array_equal(back.perplexity_batch_by_lang(texts, langs), full)


def test_multi_lm_load_detects_flat_npz(tmp_path):
    """A legacy flat TrigramLM npz given to MultiTrigramLM.load must NOT
    die with an opaque 'lang::field' KeyError (ADVICE r04): it loads as
    an all-fallback MultiTrigramLM with identical scores; junk npz files
    raise a descriptive ValueError."""
    import pytest

    from langid_py_spark.core.lm import MultiTrigramLM

    lm = train_lm(["hello world hello world", "the quick brown fox"] * 3, min_count=1)
    p = str(tmp_path / "flat.npz")
    lm.save(p)
    mlm = MultiTrigramLM.load(p)
    assert mlm.lms == {}
    texts = ["hello world", "zzz"]
    np.testing.assert_array_equal(
        mlm.perplexity_batch_by_lang(texts, ["en", None]),
        lm.perplexity_batch(texts),
    )
    junk = str(tmp_path / "junk.npz")
    np.savez(junk, foo=np.arange(3))
    with pytest.raises(ValueError, match="neither"):
        MultiTrigramLM.load(junk)
    # per-lang keys but no __global__ fallback: also a clear error
    partial = str(tmp_path / "partial.npz")
    np.savez(
        partial,
        **{f"en::{f}": getattr(lm, f)
           for f in ("tri_keys", "tri_logp", "bi_keys", "bi_logp", "uni_logp")},
    )
    with pytest.raises(ValueError, match="fallback"):
        MultiTrigramLM.load(partial)
