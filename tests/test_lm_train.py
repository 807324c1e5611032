"""Distributed LM trainer (operators/lm_train.py).

The load-bearing claim is BIT-IDENTITY to core/lm.py::train_lm — two
genuinely independent count paths (per-doc dict loops on the driver vs
Arrow-map partials + a groupBy shuffle) must agree on every integer,
and the shared array build then produces byte-identical npz artifacts.
"""

from __future__ import annotations

import numpy as np
import pytest

from langid_py_spark.core.lm import MultiTrigramLM, TrigramLM, train_lm
from langid_py_spark.operators import lm_train

_FIELDS = ("tri_keys", "tri_logp", "bi_keys", "bi_logp", "uni_logp")

# multibyte UTF-8, \x0b, newlines, length-0/1/2 docs — the per-doc
# n-gram edge cases the masked concat buffer must reproduce
HOSTILE = [
    "",
    "a",
    "ab",
    "abc",
    "naïve — café über",
    "日本語のテキストです",
    "tab\tand\x0bvertical",
    "line\nbreaks\n\nrepeated repeated repeated",
    "ASCII filler the quick brown fox " * 4,
]


def _assert_same_lm(a: TrigramLM, b: TrigramLM, ctx: str = "") -> None:
    for f in _FIELDS:
        x, y = getattr(a, f), getattr(b, f)
        assert x.dtype == y.dtype, (ctx, f, x.dtype, y.dtype)
        assert np.array_equal(x, y), (ctx, f)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_bit_identity_global(spark, docs):
    texts = [r.text for r in docs.select("text").collect()]
    _assert_same_lm(
        train_lm(texts, min_count=2),
        lm_train.train_lm_distributed(docs, min_count=2),
    )


def test_bit_identity_min_count_1(spark, docs):
    texts = [r.text for r in docs.select("text").collect()]
    _assert_same_lm(
        train_lm(texts, min_count=1),
        lm_train.train_lm_distributed(docs, min_count=1),
    )


def test_bit_identity_hostile_and_partition_invariance(spark):
    # 1 vs 7 partitions: partials differ per batch, sums must not
    loc = train_lm(HOSTILE, min_count=2)
    for nparts in (1, 7):
        df = spark.createDataFrame(
            [(t,) for t in HOSTILE], "text string"
        ).repartition(nparts)
        _assert_same_lm(loc, lm_train.train_lm_distributed(df), f"parts={nparts}")


def test_bit_identity_multi_lm_with_null_lang(spark):
    rows = [
        ("en", "the quick brown fox jumps over the lazy dog " * 3),
        ("en", "another english document with common words"),
        ("de", "der schnelle braune fuchs springt über den faulen hund"),
        ("de", "noch ein deutsches dokument mit worten"),
        (None, "unlabeled text still feeds the global fallback"),
    ]
    df = spark.createDataFrame(rows, "lang string, text string")
    dist = lm_train.train_multi_lm_distributed(df)
    texts_all = [t for _, t in rows]
    loc = MultiTrigramLM(
        lms={
            lang: train_lm([t for l, t in rows if l == lang])
            for lang in ("en", "de")
        },
        fallback=train_lm(texts_all),
    )
    assert set(dist.lms) == {"en", "de"}  # NULL lang gets no per-lang LM
    for lang in loc.lms:
        _assert_same_lm(loc.lms[lang], dist.lms[lang], lang)
    _assert_same_lm(loc.fallback, dist.fallback, "fallback")


def test_max_langs_guard(spark):
    df = spark.createDataFrame(
        [(f"l{i}", "text") for i in range(lm_train.MAX_LANGS + 1)],
        "lang string, text string",
    )
    with pytest.raises(ValueError, match="distinct values"):
        lm_train.train_multi_lm_distributed(df)


def test_artifact_round_trip_scores(spark, docs, tmp_path):
    """Trained-on-Spark model → npz → loaded → scores — the full loop."""
    dist = lm_train.train_lm_distributed(docs)
    p = str(tmp_path / "lm_dist.npz")
    dist.save(p)
    loaded = TrigramLM.load(p)
    _assert_same_lm(dist, loaded, "round-trip")
    ppl = loaded.perplexity_batch(["the quick brown fox", ""])
    assert ppl.shape == (2,) and ppl[0] > 1.0 and ppl[1] == 1.0


def test_multi_artifact_round_trip(spark, docs, tmp_path):
    dist = lm_train.train_multi_lm_distributed(docs)
    p = str(tmp_path / "lm_by_lang_dist.npz")
    dist.save(p)
    loaded = MultiTrigramLM.load(p)
    assert set(loaded.lms) == set(dist.lms)
    for lang in dist.lms:
        _assert_same_lm(dist.lms[lang], loaded.lms[lang], lang)
    ppl = loaded.perplexity_batch_by_lang(
        ["some text", "mehr text"], [sorted(loaded.lms)[0], None]
    )
    assert ppl.shape == (2,) and (ppl > 0).all()


def test_empty_corpus(spark):
    df = spark.createDataFrame([], "text string")
    lm = lm_train.train_lm_distributed(df)
    assert len(lm.tri_keys) == 0 and len(lm.bi_keys) == 0
    # all-uniform unigram smoothing, same as train_lm([])
    _assert_same_lm(train_lm([]), lm, "empty")


def test_cli_train_lm_mode(spark, tmp_path):
    """--train-lm IN OUT.npz writes a loadable artifact bit-identical
    to the driver-local trainer; --per-lang writes the lm_by_lang
    shape."""
    import pandas as pd

    from langid_py_spark.cli import main

    pdf = pd.DataFrame(
        {
            "doc_id": range(20),
            "lang": ["en", "de"] * 10,
            "text": [
                f"document number {i} with some repeated english words"
                if i % 2 == 0
                else f"dokument nummer {i} mit einigen deutschen worten"
                for i in range(20)
            ],
        }
    )
    src = str(tmp_path / "in.parquet")
    pdf.to_parquet(src, index=False)

    out = str(tmp_path / "lm.npz")
    assert main(["--train-lm", src, out, "--cores", "4"]) == 0
    _assert_same_lm(
        train_lm(pdf["text"].tolist(), min_count=2), TrigramLM.load(out), "cli"
    )

    out_ml = str(tmp_path / "lm_by_lang.npz")
    assert main(["--train-lm", src, out_ml, "--per-lang", "--cores", "4"]) == 0
    multi = MultiTrigramLM.load(out_ml)
    assert set(multi.lms) == {"en", "de"}
    _assert_same_lm(
        train_lm(pdf["text"].tolist(), min_count=2), multi.fallback, "cli-fallback"
    )


def test_counts_min_count_vs_ctx_semantics(spark):
    """min_count drops keys from the TABLE but not from the context
    denominators — the train_lm contract the distributed path must
    keep (pulling only cnt>=min_count rows would inflate every
    conditional probability)."""
    texts = ["abcab", "abx"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    _assert_same_lm(
        train_lm(texts, min_count=2),
        lm_train.train_lm_distributed(df, min_count=2),
        "ctx-semantics",
    )
    loc = train_lm(texts, min_count=2)
    # 'ab' occurs 3 times (kept); every bigram weights the 'a' context
    ab = (ord("a") << 8) | ord("b")
    i = int(np.searchsorted(loc.bi_keys, ab))
    assert loc.bi_keys[i] == ab
    # P(b|a) = 3/4: three 'ab' out of four a-context bigrams? a appears
    # followed by b 3x; 'a' context total = count of bigrams starting
    # with 'a' = 3 — while 'ca'/'xa' don't start with a. Assert against
    # the independently-computed value instead of prose:
    expected = np.log(3 / 3)
    assert loc.bi_logp[i] == expected
