"""Hot-key window guard (dedup.hot_keys + guarded line/span dedup —
VERDICT r05 'What's wrong #1': a line/gram repeated ~10^8 times makes
one multi-GB window-sort straggler that AQE cannot split).

The guard must be invisible in results (routing only) and visible in
the plan (hot keys go through broadcast-join hash-agg paths, the tail
window's per-key input stays bounded by the threshold).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from langid_py_spark.operators.dedup import (
    hot_keys,
    line_dedup_drops,
    line_dedup_keep,
)
from langid_py_spark.operators.spandedup import (
    substring_dup_spans,
    substring_dup_spans_winnowed,
)

HOT_LINE = "Accept cookies to continue | Privacy | Terms"
HOT_BLOCK = "x" * 10 + "THIS LICENSE BLOCK IS REPEATED VERBATIM EVERYWHERE" + "y" * 10


@pytest.fixture(scope="module")
def hot_line_corpus(spark):
    """60 docs x 500 copies of one boilerplate line = 30k copies of a
    single line_hash, plus unique tail lines (some duplicated twice so
    the tail window path has real work too)."""
    rows = []
    for d in range(60):
        lines = [HOT_LINE] * 500 + [f"unique line {d}-{j}" for j in range(5)]
        if d % 2 == 0:
            lines.append("a twice-duplicated tail line")
        rows.append((d, "\n".join(lines)))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


@pytest.fixture(scope="module")
def hot_gram_corpus(spark):
    """400 docs sharing one boilerplate block (400 copies of each of its
    k-grams — 'hot' at a test-scale threshold), plus a pair of docs
    sharing a normal-duplication block for the tail path, plus clean
    docs."""
    rows = []
    for d in range(400):
        rows.append((d, f"doc {d} prefix text. {HOT_BLOCK} doc {d} suffix."))
    rows.append((1000, "tailpair SHARED-ONLY-TWICE-" + "z" * 40 + " end a"))
    rows.append((1001, "other   SHARED-ONLY-TWICE-" + "z" * 40 + " end b"))
    rows.append((1002, "a perfectly unique document with no duplication"))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


# ------------------------------------------------------------ hot_keys
def test_hot_keys_exact_and_sampled(hot_line_corpus):
    lines = hot_line_corpus.select(
        "doc_id",
        F.posexplode(F.split("text", "\n")).alias("line_idx", "line"),
    ).withColumn("line_hash", F.md5("line"))
    hot_hash = lines.filter(F.col("line") == HOT_LINE).select("line_hash").first()[0]
    exact = {
        r["line_hash"]
        for r in hot_keys(lines, "line_hash", 1000, ["doc_id", "line_idx"], 1).collect()
    }
    assert exact == {hot_hash}  # 30k copies caught, 2-copy lines not
    sampled = {
        r["line_hash"]
        for r in hot_keys(lines, "line_hash", 1000, ["doc_id", "line_idx"], 8).collect()
    }
    # recall: 30k copies => ~3750 expected samples vs cutoff 31
    assert hot_hash in sampled


# ------------------------------------------------------- line dedup
def test_line_dedup_hot_guard_identical_results(hot_line_corpus):
    base = _rows(
        line_dedup_drops(hot_line_corpus, hot_threshold=None),
        ["doc_id", "line_idx", "line_hash"],
    )
    guarded = _rows(
        line_dedup_drops(hot_line_corpus, hot_threshold=1000, hot_sample=1),
        ["doc_id", "line_idx", "line_hash"],
    )
    sampled = _rows(
        line_dedup_drops(hot_line_corpus, hot_threshold=1000, hot_sample=8),
        ["doc_id", "line_idx", "line_hash"],
    )
    assert guarded == base
    assert sampled == base
    # and the hot line really did lose all non-first occurrences
    assert len(base) >= 60 * 500 - 1


def test_line_dedup_keep_with_guard(hot_line_corpus):
    base = _rows(
        line_dedup_keep(hot_line_corpus, hot_threshold=None), ["doc_id", "text"]
    )
    guarded = _rows(
        line_dedup_keep(hot_line_corpus, hot_threshold=1000, hot_sample=1),
        ["doc_id", "text"],
    )
    assert guarded == base


def test_line_guard_routes_hot_key_around_window(hot_line_corpus):
    """The straggler assertion: with the guard on, the tail window's
    input contains ZERO rows of the hot key (its sort partitions are
    bounded by the threshold), and the physical plan shows the
    broadcast routing."""
    lines = hot_line_corpus.select(
        "doc_id",
        F.posexplode(F.split("text", "\n")).alias("line_idx", "line"),
    ).filter(F.col("line") != "").withColumn("line_hash", F.md5("line"))
    hot = hot_keys(lines, "line_hash", 1000, ["doc_id", "line_idx"], 1)
    tail = lines.join(F.broadcast(hot), "line_hash", "left_anti")
    max_tail_key = (
        tail.groupBy("line_hash").count().agg(F.max("count")).first()[0]
    )
    assert max_tail_key < 1000  # bounded window partitions
    plan = line_dedup_drops(
        hot_line_corpus, hot_threshold=1000, hot_sample=1
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Union" in plan


# ------------------------------------------------------- span dedup
def test_substring_spans_hot_guard_identical_results(hot_gram_corpus):
    cols = ["doc_id", "span_start", "span_end", "n_grams"]
    base = _rows(substring_dup_spans(hot_gram_corpus, k=20, hot_threshold=None), cols)
    guarded = _rows(
        substring_dup_spans(hot_gram_corpus, k=20, hot_threshold=100, hot_sample=1),
        cols,
    )
    sampled = _rows(
        substring_dup_spans(hot_gram_corpus, k=20, hot_threshold=100, hot_sample=4),
        cols,
    )
    assert guarded == base
    assert sampled == base
    # the boilerplate block was actually found in every doc, and the
    # tail-only pair was found by the (unguarded-key) window path
    by_doc = {r[0] for r in base}
    assert set(range(400)) <= by_doc
    assert {1000, 1001} <= by_doc
    assert 1002 not in by_doc


def test_substring_spans_guard_plan_routes_hot(hot_gram_corpus):
    plan = (
        substring_dup_spans(hot_gram_corpus, k=20, hot_threshold=100, hot_sample=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "Union" in plan


def test_winnowed_spans_hot_guard_identical_results(hot_gram_corpus):
    cols = ["doc_id", "span_start", "span_end", "n_grams"]
    base = _rows(
        substring_dup_spans_winnowed(
            hot_gram_corpus, k=20, window=6, hot_threshold=None
        ),
        cols,
    )
    guarded = _rows(
        substring_dup_spans_winnowed(
            hot_gram_corpus, k=20, window=6, hot_threshold=100, hot_sample=1
        ),
        cols,
    )
    sampled = _rows(
        substring_dup_spans_winnowed(
            hot_gram_corpus, k=20, window=6, hot_threshold=100, hot_sample=4
        ),
        cols,
    )
    assert guarded == base
    assert sampled == base
    assert len(base) > 0


def test_guard_defaults_never_trigger_on_small_corpora(hot_gram_corpus):
    """Default thresholds (100k copies) must leave small-corpus results
    bit-identical THROUGH the guarded code path (driver oracles rely on
    this)."""
    cols = ["doc_id", "span_start", "span_end", "n_grams"]
    assert _rows(substring_dup_spans(hot_gram_corpus, k=20), cols) == _rows(
        substring_dup_spans(hot_gram_corpus, k=20, hot_threshold=None), cols
    )


# ------------------------------------------------------- exact dedup
def test_exact_dedup_keep_hot_guard(spark):
    """30k byte-identical docs (the empty-string/boilerplate crawl
    case): guarded survivors == unguarded survivors, hot key routed
    around the window, plan shows the broadcast path."""
    import numpy as np

    rows = [(i, "the same boilerplate page body") for i in range(30_000)]
    rows += [(100_000 + i, f"unique doc {i}") for i in range(50)]
    rows += [(200_000, "dup-pair"), (200_001, "dup-pair")]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    docs = spark.createDataFrame(pdf)
    from langid_py_spark.operators.dedup import exact_dedup_keep

    base = _rows(exact_dedup_keep(docs, hot_threshold=None), ["doc_id", "text"])
    guarded = _rows(
        exact_dedup_keep(docs, hot_threshold=1000, hot_sample=1), ["doc_id", "text"]
    )
    sampled = _rows(
        exact_dedup_keep(docs, hot_threshold=1000, hot_sample=8), ["doc_id", "text"]
    )
    assert guarded == base
    assert sampled == base
    assert (0, "the same boilerplate page body") in base  # lowest id kept
    assert len(base) == 52
    plan = (
        exact_dedup_keep(docs, hot_threshold=1000, hot_sample=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "Union" in plan
