"""Spark Arrow-UDF scorer == single-process NumPy oracle, and the scoring
stage is shuffle-free (SURVEY.md §4 physical plan)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from langid_py_spark import config as C
from langid_py_spark.core.model import NBModel
from langid_py_spark.spark.scorer import with_language


def test_spark_classify_equals_oracle(spark, fixture_path):
    df = spark.read.parquet(fixture_path)
    got = (
        with_language(df, max_bytes=C.SCORE_MAX_BYTES)
        .select("conv_id", "turn_idx", "text", "ld.*")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    model = NBModel.load()
    langs, raw, norm, nbytes = model.classify_batch(
        got["text"].fillna("").tolist(), max_bytes=C.SCORE_MAX_BYTES
    )
    assert (got["lang"].values == langs).all()
    np.testing.assert_allclose(got["conf_raw"].values, raw, rtol=1e-12)
    np.testing.assert_allclose(got["conf_norm"].values, norm, rtol=1e-12)
    np.testing.assert_array_equal(got["nbytes"].values, nbytes)


def test_language_subset_slices(spark):
    pdf = pd.DataFrame({"text": ["och i att det som en på är av för med till den har"]})
    df = spark.createDataFrame(pdf)
    full = with_language(df).select("ld.lang").first()[0]
    sub = with_language(df, langs=["en", "de"]).select("ld.lang").first()[0]
    assert full == "sv"
    assert sub in ("en", "de")


def test_scoring_stage_is_shuffle_free(spark, fixture_path):
    from langid_py_spark.spark.pipeline import score_turns

    df = score_turns(spark.read.parquet(fixture_path))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_null_text_handled(spark):
    df = spark.createDataFrame(pd.DataFrame({"text": pd.array([None, "hello world the of and"], dtype=object)}))
    rows = with_language(df).select("ld.lang", "ld.nbytes").collect()
    assert rows[0]["nbytes"] == 0
    assert rows[1]["lang"] == "en"
