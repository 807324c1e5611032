"""End-to-end pipeline: golden-label F1, byte-exact scrub, determinism,
resume-from-manifest semantics (FIXTURES.md invariants 1-3)."""

import json
import shutil
from pathlib import Path

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from langid_py_spark import config as C
from langid_py_spark.core.lm import TrigramLM
from langid_py_spark.core.model import NBModel
from langid_py_spark.spark.pipeline import full_pipeline, read_manifest, run_pipeline
from langid_py_spark.spark.rules import python_rule_oracle
from langid_py_spark.spark.scrub import python_scrub_oracle


def golden_labels(pdf: pd.DataFrame) -> pd.DataFrame:
    """Single-process oracle: same model + rules + scrub, no Spark."""
    from langid_py_spark.core.lm import MultiTrigramLM

    model = NBModel.load()
    mlm = MultiTrigramLM.load()
    texts = pdf["text"].fillna("").tolist()
    langs, raw, norm, nbytes = model.classify_batch(texts, max_bytes=C.SCORE_MAX_BYTES)
    # per-lang LM keyed by the PREDICTED lang — mirrors the fused scorer
    ppl = mlm.perplexity_batch_by_lang(texts, list(langs), max_bytes=C.SCORE_MAX_BYTES)
    rules = [python_rule_oracle(t) for t in texts]
    keep = [
        r["keep_heuristic"] and norm[i] >= C.MIN_LANG_CONF and ppl[i] <= C.MAX_PERPLEXITY
        for i, r in enumerate(rules)
    ]
    return pd.DataFrame(
        {
            "conv_id": pdf["conv_id"].values,
            "turn_idx": pdf["turn_idx"].values,
            "lang": langs,
            "conf_norm": norm,
            "keep": keep,
            "scrubbed_text": [python_scrub_oracle(t) for t in texts],
        }
    )


@pytest.fixture(scope="module")
def result(spark, fixture_path) -> pd.DataFrame:
    out = full_pipeline(spark.read.parquet(fixture_path))
    return out.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def golden(spark, fixture_path) -> pd.DataFrame:
    pdf = (
        spark.read.parquet(fixture_path)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    return golden_labels(pdf)


def test_keep_f1_vs_golden(result, golden):
    y, g = result["keep"].values, np.array(golden["keep"].values)
    tp = (y & g).sum()
    fp = (y & ~g).sum()
    fn = (~y & g).sum()
    f1 = 2 * tp / (2 * tp + fp + fn)
    assert f1 >= 0.99, f"keep/drop F1 {f1} < 0.99"


def test_scrub_byte_exact_vs_golden(result, golden):
    mism = (result["scrubbed_text"].values != golden["scrubbed_text"].values).sum()
    assert mism == 0


def test_lang_exact_vs_golden(result, golden):
    assert (result["lang"].values == golden["lang"].values).all()
    np.testing.assert_allclose(
        result["conf_norm"].values, golden["conf_norm"].values, rtol=1e-12
    )


def test_conv_lang_consistency(result):
    # every turn of a conversation carries the same conv_lang
    n = result.groupby("conv_id")["conv_lang"].nunique()
    assert (n == 1).all()


def test_run_twice_identical(spark, fixture_path, tmp_path):
    out1, out2 = str(tmp_path / "o1"), str(tmp_path / "o2")
    run_pipeline(spark, fixture_path, out1)
    run_pipeline(spark, fixture_path, out2)
    a = (
        spark.read.parquet(out1)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    b = (
        spark.read.parquet(out2)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_resume_skips_completed_buckets(spark, fixture_path, tmp_path):
    out = str(tmp_path / "resume")
    m1 = run_pipeline(spark, fixture_path, out)
    assert sorted(m1["completed_buckets"]) == list(range(C.LANG_BUCKETS))

    # simulate a partial failure: mark two buckets incomplete, delete them
    full = (
        spark.read.parquet(out)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    manifest = read_manifest(out)
    manifest["completed_buckets"] = [b for b in manifest["completed_buckets"] if b not in (0, 1)]
    (Path(out) / "_manifest.json").write_text(json.dumps(manifest))
    for b in (0, 1):
        shutil.rmtree(Path(out) / f"lang_bucket={b}", ignore_errors=True)

    # record mtimes of untouched bucket files
    untouched = {
        p: p.stat().st_mtime_ns
        for p in Path(out).glob("lang_bucket=[2-7]/*.parquet")
    }
    m2 = run_pipeline(spark, fixture_path, out, resume=True)
    assert sorted(m2["completed_buckets"]) == list(range(C.LANG_BUCKETS))
    # untouched partitions were NOT recomputed/rewritten
    for p, t in untouched.items():
        assert p.stat().st_mtime_ns == t, f"{p} was rewritten"
    # final table identical to the clean run
    after = (
        spark.read.parquet(out)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(after, full)


def test_output_sorted_within_partitions(spark, fixture_path, tmp_path):
    out = str(tmp_path / "sorted")
    run_pipeline(spark, fixture_path, out)
    files = list(Path(out).glob("lang_bucket=*/*.parquet"))
    assert files
    for f in files[:4]:
        pdf = pd.read_parquet(f)[["conv_id", "turn_idx"]]
        assert pdf.equals(pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))


def test_sink_format_orc(spark, fixture_path, tmp_path):
    """The writer honors sink_format: an ORC run produces ORC files that
    read back identical to the parquet run (same rows, same manifest)."""
    out_p, out_o = str(tmp_path / "fmt_parquet"), str(tmp_path / "fmt_orc")
    mp = run_pipeline(spark, fixture_path, out_p)
    mo = run_pipeline(spark, fixture_path, out_o, sink_format="orc")
    assert mp["observed"] == mo["observed"]
    orc_files = list(Path(out_o).glob("lang_bucket=*/*.orc"))
    assert orc_files, "no ORC files written"
    assert not list(Path(out_o).glob("lang_bucket=*/*.parquet"))
    a = (
        spark.read.parquet(out_p)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    b = (
        spark.read.orc(out_o)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b[a.columns], check_dtype=False)


def test_sink_format_iceberg_plumbing(spark, fixture_path, tmp_path):
    """sink_format='iceberg' routes through DataFrameWriterV2.writeTo(...)
    .using('iceberg'). The sandbox has no iceberg runtime/catalog, so the
    write must fail at Spark's CATALOG ANALYSIS step (proving the request
    reached the V2 writer) — not with a Python-side error. sink_table is
    required."""
    import pytest
    from pyspark.errors import AnalysisException

    with pytest.raises(ValueError, match="sink_table"):
        run_pipeline(
            spark, fixture_path, str(tmp_path / "ice"), sink_format="iceberg"
        )
    with pytest.raises(AnalysisException):
        run_pipeline(
            spark,
            fixture_path,
            str(tmp_path / "ice"),
            sink_format="iceberg",
            sink_table="lake.db.transcripts_clean",
        )


def test_metrics_ride_the_write_job(spark, fixture_path, tmp_path):
    """Per-bucket lineage metrics (now observe() columns on the write job,
    not a second pass) must match a direct aggregation of the output."""
    out = str(tmp_path / "metrics_out")
    m = run_pipeline(spark, fixture_path, out)
    got = (
        spark.read.parquet(f"{out}/_metrics")
        .toPandas()
        .set_index("lang_bucket")
        .sort_index()
    )
    outdf = spark.read.parquet(out).toPandas()
    for b, grp in outdf.groupby("lang_bucket"):
        assert got.loc[b, "n_turns"] == len(grp)
        assert got.loc[b, "n_kept"] == int(grp["keep"].sum())
        assert got.loc[b, "total_bytes"] == int(grp["nbytes"].sum())
        # HLL estimate (default rsd 0.05): allow a few counts of slack on
        # small buckets
        exact = grp["conv_id"].nunique()
        assert abs(got.loc[b, "n_convs"] - exact) <= max(5, 0.1 * exact)
    # manifest mirrors the table
    man = read_manifest(out)
    assert {int(k) for k in man["metrics"]} == set(got.index)
    assert man["observed"]["n_turns"] == len(outdf)


def test_entry_output_full_twin(result, golden, spark, fixture_path):
    """EVERY column of the flagship output vs a single-process twin —
    completes the per-column oracles (keep/scrub/lang/conf_norm above)
    with the ones previously only spot-checked: per-rule booleans,
    conf_raw, ppl, nbytes, and the conversation vote VALUES end-to-end
    (test_vote pins the operator in isolation; this pins it through the
    pipeline), plus lang_bucket well-formedness."""
    src = (
        spark.read.parquet(fixture_path)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    texts = src["text"].fillna("").tolist()
    from langid_py_spark.core.lm import MultiTrigramLM

    model = NBModel.load()
    mlm = MultiTrigramLM.load()
    langs, raw, norm, nbytes = model.classify_batch(texts, max_bytes=C.SCORE_MAX_BYTES)
    ppl = mlm.perplexity_batch_by_lang(texts, list(langs), max_bytes=C.SCORE_MAX_BYTES)

    # per-rule booleans (python oracle is the frozen-config twin)
    rules = [python_rule_oracle(t) for t in texts]
    for rname in C.RULE_NAMES:
        want = np.array([r[rname] for r in rules])
        got = result[rname].values
        assert (got == want).all(), rname

    np.testing.assert_allclose(result["conf_raw"].values, raw, rtol=1e-12)
    np.testing.assert_allclose(result["ppl"].values, ppl, rtol=1e-12)
    assert (result["nbytes"].values == nbytes).all()
    assert (
        result["r_low_conf"].values == (norm < C.MIN_LANG_CONF)
    ).all()
    assert (result["r_high_ppl"].values == (ppl > C.MAX_PERPLEXITY)).all()

    # conversation vote twin: per conv, nbytes-weighted lang sums (exact
    # integer arithmetic), argmax with (weight desc, lang asc) tie-break
    tw = pd.DataFrame(
        {"conv_id": src["conv_id"].values, "lang": langs, "w": nbytes}
    )
    sums = tw.groupby(["conv_id", "lang"], as_index=False)["w"].sum()
    sums = sums.sort_values(
        ["conv_id", "w", "lang"], ascending=[True, False, True]
    )
    want_vote = sums.groupby("conv_id").first()["lang"]
    got_vote = result.groupby("conv_id")["conv_lang"].first()
    assert (got_vote.sort_index() == want_vote.sort_index()).all()

    # lang_bucket: pure function of lang, in range
    assert result["lang_bucket"].between(0, C.LANG_BUCKETS - 1).all()
    assert (result.groupby("lang")["lang_bucket"].nunique() == 1).all()
