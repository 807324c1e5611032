"""Composed corpus pipeline: the materialized (table-per-tier) form
must equal the in-session form, resume per tier without touching
completed tiers, and refuse stale-parameter resumes."""

from __future__ import annotations

import json
import os

import pytest

from langid_py_spark.operators.corpus_pipeline import (
    _TIER_NAMES,
    corpus_pipeline,
    run_corpus_pipeline,
)

SF_DIR = "/root/testdata/sf0.001"
NEEDLES = ["scan slow", "hash join", "customer query", "zzz-canary"]


@pytest.fixture(scope="module")
def line_docs(spark):
    import __spark_entry__ as e

    return e._line_corpus(spark, SF_DIR)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_materialized_equals_in_session(spark, line_docs, tmp_path):
    out = str(tmp_path / "cp")
    got = run_corpus_pipeline(
        spark, line_docs, out, NEEDLES, k_span=40, floor=0.3
    )
    want = corpus_pipeline(line_docs, NEEDLES, k_span=40, floor=0.3)
    assert _rows(got) == _rows(want)
    # all tiers written + recorded
    man = json.load(open(os.path.join(out, "_manifest.json")))
    assert man["completed_tiers"] == _TIER_NAMES
    for t in _TIER_NAMES:
        assert os.path.exists(os.path.join(out, t, "_SUCCESS")), t


def test_resume_skips_completed_tiers(spark, line_docs, tmp_path):
    import shutil

    out = str(tmp_path / "cp")
    first = _rows(
        run_corpus_pipeline(spark, line_docs, out, NEEDLES, k_span=40, floor=0.3)
    )
    man_path = os.path.join(out, "_manifest.json")
    man = json.load(open(man_path))

    # knock out the last three tiers (decontam onwards), keep 1-4
    for t in _TIER_NAMES[4:]:
        shutil.rmtree(os.path.join(out, t))
        man["completed_tiers"].remove(t)
    json.dump(man, open(man_path, "w"))

    mtimes = {
        t: os.path.getmtime(os.path.join(out, t, "_SUCCESS"))
        for t in _TIER_NAMES[:4]
    }
    again = _rows(run_corpus_pipeline(spark, line_docs, out, NEEDLES, k_span=40, floor=0.3))
    assert again == first
    for t, m in mtimes.items():  # completed tiers untouched by the resume
        assert os.path.getmtime(os.path.join(out, t, "_SUCCESS")) == m, t
    man2 = json.load(open(man_path))
    assert man2["completed_tiers"] == _TIER_NAMES


def test_stale_parameter_resume_raises(spark, line_docs, tmp_path):
    out = str(tmp_path / "cp")
    run_corpus_pipeline(spark, line_docs, out, NEEDLES, k_span=40, floor=0.3)
    with pytest.raises(ValueError, match="different"):
        run_corpus_pipeline(spark, line_docs, out, NEEDLES, k_span=30, floor=0.3)
    # resume=False rebuilds instead
    got = run_corpus_pipeline(
        spark, line_docs, out, NEEDLES, k_span=30, floor=0.3, resume=False
    )
    assert len(_rows(got)) > 0
