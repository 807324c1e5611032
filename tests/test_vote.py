"""Salted conversation vote == unsalted == pandas groupby oracle
(FIXTURES.md invariant 4), deterministic under ties."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from langid_py_spark.spark.pipeline import score_turns
from langid_py_spark.spark.vote import conversation_vote, conversation_vote_unsalted


@pytest.fixture(scope="module")
def scored(spark, fixture_path):
    return score_turns(spark.read.parquet(fixture_path)).select(
        "conv_id", "turn_idx", "lang", "nbytes"
    ).cache()


def _as_pdf(df) -> pd.DataFrame:
    return df.toPandas().sort_values("conv_id").reset_index(drop=True)


def test_salted_equals_unsalted(scored):
    a = _as_pdf(conversation_vote(scored))
    b = _as_pdf(conversation_vote_unsalted(scored))
    pd.testing.assert_frame_equal(a, b)


def test_vote_equals_pandas_oracle(scored):
    got = _as_pdf(conversation_vote(scored))
    pdf = scored.toPandas()
    grp = pdf.groupby(["conv_id", "lang"], as_index=False)["nbytes"].sum()
    grp = grp.sort_values(
        ["conv_id", "nbytes", "lang"], ascending=[True, False, True]
    )
    top = grp.groupby("conv_id", as_index=False).first()
    assert (got["conv_id"].values == top["conv_id"].values).all()
    assert (got["conv_lang"].values == top["lang"].values).all()
    assert (got["conv_lang_weight"].values == top["nbytes"].values).all()
    totals = pdf.groupby("conv_id")["nbytes"].sum().sort_index()
    assert (got.sort_values("conv_id")["conv_total_weight"].values == totals.values).all()


def test_tie_break_deterministic(spark):
    pdf = pd.DataFrame(
        {
            "conv_id": ["c1"] * 2 + ["c2"] * 2,
            "turn_idx": [0, 1, 0, 1],
            "lang": ["en", "de", "zh", "fr"],
            "nbytes": [10, 10, 7, 7],
        }
    )
    out = _as_pdf(conversation_vote(spark.createDataFrame(pdf)))
    # equal weight → lexicographically smallest lang wins
    assert out.loc[out.conv_id == "c1", "conv_lang"].item() == "de"
    assert out.loc[out.conv_id == "c2", "conv_lang"].item() == "fr"
