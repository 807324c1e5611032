"""NB model semantics: scoring, normalization, language slicing, totality."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from langid_py_spark.core.corpora import LANGS, make_doc
from langid_py_spark.core.model import NBModel


@pytest.fixture(scope="module")
def model() -> NBModel:
    return NBModel.load()


def test_shapes(model):
    assert model.nb_ptc.shape == (model.nb_numfeats, len(model.nb_classes))
    assert model.nb_pc.shape == (len(model.nb_classes),)
    assert model.nb_classes == LANGS


def test_norm_probs_equals_reference_formula(model):
    """Stable softmax == langid.py norm_probs (~L115):
    1 / np.exp(pd[None, :] - pd[:, None]).sum(1)."""
    rng = np.random.RandomState(0)
    for _ in range(20):
        pd = rng.randn(len(model.nb_classes)) * 50
        ref = 1.0 / np.exp(pd[None, :] - pd[:, None]).sum(1)
        got = NBModel.norm_probs(pd)
        np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-300)


def test_batch_equals_single(model):
    rng = np.random.RandomState(3)
    docs = [make_doc(rng, l, 3) for l in ("en", "de", "zh", "ru")] + ["", "x"]
    batch = model.batch_fv(docs)
    for i, d in enumerate(docs):
        np.testing.assert_array_equal(batch[i], model.instance2fv(d))


def test_classify_heldout_accuracy(model):
    correct = total = 0
    for li, lang in enumerate(LANGS):
        rng = np.random.RandomState(9999 + li)
        docs = [make_doc(rng, lang, 4) for _ in range(20)]
        langs, _, _, _ = model.classify_batch(docs)
        correct += (langs == lang).sum()
        total += len(docs)
    assert correct / total >= 0.99


def test_empty_input_prior_argmax(model):
    """Reference: zero count vector → pd == nb_pc (FIXTURES.md inv. 5)."""
    lang, conf = model.classify("")
    assert lang == model.nb_classes[int(np.argmax(model.nb_pc))]
    assert 0.0 < conf <= 1.0


def test_set_languages_slices_and_renormalizes(model):
    sub = model.set_languages(["en", "de", "fr"])
    assert sub.nb_classes == ["en", "de", "fr"]
    assert sub.nb_ptc.shape[1] == 3
    # a Swedish doc must now map into the subset, and conf renormalizes
    rng = np.random.RandomState(11)
    doc = make_doc(rng, "sv", 4)
    lang, conf = sub.classify(doc)
    assert lang in ("en", "de", "fr")
    with pytest.raises(ValueError):
        model.set_languages(["xx"])


def test_rank_sorted_and_sums_to_one(model):
    r = model.rank("hello world this is a test of the ranking api")
    assert [x[0] for x in r][0] == "en"
    probs = [x[1] for x in r]
    assert probs == sorted(probs, reverse=True)
    assert abs(sum(probs) - 1.0) < 1e-9
    assert len(r) == len(model.nb_classes)


def test_max_bytes_truncation(model):
    doc = "the and of " * 500
    full = model.batch_fv([doc])[0]
    trunc = model.batch_fv([doc], max_bytes=64)[0]
    assert trunc.sum() < full.sum()
    np.testing.assert_array_equal(trunc, model.batch_fv([doc[:64]])[0])


@settings(max_examples=40, deadline=None)
@given(st.text(max_size=300))
def test_classify_total_on_arbitrary_unicode(text):
    model = NBModel.load()
    lang, conf = model.classify(text)
    assert lang in model.nb_classes
    assert np.isfinite(conf)


def test_fv_additivity(model):
    """fv(a+b) == fv(a)+fv(b) when no n-gram spans the boundary — construct
    with a 4-byte separator absent from the feature alphabet."""
    a, b = "the quick brown fox", "der schnelle braune fuchs"
    sep = "\x00\x00\x00\x00"  # NUL never occurs in any trained feature
    fvab = model.instance2fv(a + sep + b)
    np.testing.assert_array_equal(fvab, model.instance2fv(a) + model.instance2fv(b))


def test_classprobs_batch_independent(model):
    """The scorer golden-hash argument rests on this (ADVICE r03): the
    same document's log class scores must be BITWISE identical whatever
    Arrow batch it lands in — `fv @ nb_ptc` (BLAS dgemm) was falsified
    (row-blocking by batch size shifts last-ulp bits), so nb_classprobs
    routes through a fixed-j-order einsum. Assert equality across many
    split points on real feature vectors."""
    rng = np.random.RandomState(11)
    docs = [make_doc(rng, LANGS[i % len(LANGS)], 2 + i % 4) for i in range(97)]
    fv = model.batch_fv(docs)
    full = model.nb_classprobs(fv)
    for cut in (1, 2, 31, 48, 96):
        parts = np.vstack(
            [
                model.nb_classprobs(np.ascontiguousarray(fv[:cut])),
                model.nb_classprobs(np.ascontiguousarray(fv[cut:])),
            ]
        )
        assert np.array_equal(parts, full), cut
    # end-to-end: classify_batch conf values equally batch-independent
    _, raw_f, norm_f, _ = model.classify_batch(docs)
    _, raw_a, norm_a, _ = model.classify_batch(docs[:31])
    _, raw_b, norm_b, _ = model.classify_batch(docs[31:])
    assert np.array_equal(np.concatenate([raw_a, raw_b]), raw_f)
    assert np.array_equal(np.concatenate([norm_a, norm_b]), norm_f)


def test_npz_roundtrip_narrow_dtypes(model, tmp_path):
    """save() narrows nextmove->uint32 / out_feats->int32 on the wire
    (the in-memory int64 is a walk-speed choice, not a format change —
    serializing it as-is would silently double the artifact, ADVICE r03);
    load() re-widens and the model behaves identically."""
    import zipfile

    p = str(tmp_path / "m.npz")
    model.save(p)
    z = np.load(p)
    assert z["nextmove"].dtype == np.uint32
    assert z["out_feats"].dtype == np.int32
    with zipfile.ZipFile(p) as zf:
        assert {"nextmove.npy", "out_feats.npy"} <= set(zf.namelist())
    back = NBModel.load(p)
    assert back.nextmove.dtype == np.int64  # re-widened for the walk
    docs = ["the quick brown fox", "der schnelle braune fuchs", ""]
    for a, b in zip(model.classify_batch(docs), back.classify_batch(docs)):
        np.testing.assert_array_equal(a, b)
