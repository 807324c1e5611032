"""Conversation-level language vote — the pipeline's ONE shuffle.

Document language = length-weighted vote over its turns' predicted
languages (BASELINE.json::north_star). Mega-conversations (~1% of convs
with 100x the median turn count — FIXTURES.md F1) make `conv_id` a skewed
aggregation key at 10^12-turn scale, so the aggregation is EXPLICITLY
two-stage salted (SURVEY.md §2.4 A6 — AQE does not salt groupBy):

  stage 1: groupBy(conv_id, lang, salt)  -> partial weight sums
           salt = pmod(hash(turn_idx), SALT_BUCKETS) spreads one hot
           conversation over SALT_BUCKETS reducers
  stage 2: groupBy(conv_id, lang)        -> merge partials (small)
  stage 3: row_number over (weight desc, lang asc) per conv -> argmax,
           deterministic under ties

Map-side partial aggregation makes stage 1 cheap; stages 2-3 operate on
|convs| x |langs| rows only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from langid_py_spark import config as C


def conversation_vote(
    turns: DataFrame,
    lang_col: str = "lang",
    weight_col: str = "nbytes",
    salt_buckets: int = C.VOTE_SALT_BUCKETS,
) -> DataFrame:
    """(conv_id, conv_lang, conv_lang_weight, conv_total_weight)."""
    salted = turns.withColumn(
        "_salt", F.pmod(F.hash(F.col("turn_idx")), F.lit(salt_buckets))
    )
    partial = salted.groupBy("conv_id", lang_col, "_salt").agg(
        F.sum(F.col(weight_col)).alias("_w_partial")
    )
    merged = partial.groupBy("conv_id", lang_col).agg(
        F.sum("_w_partial").alias("lang_weight")
    )
    w = Window.partitionBy("conv_id").orderBy(
        F.desc("lang_weight"), F.asc(lang_col)
    )
    totals = Window.partitionBy("conv_id")
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .withColumn("conv_total_weight", F.sum("lang_weight").over(totals))
        .filter(F.col("_rn") == 1)
        .select(
            "conv_id",
            F.col(lang_col).alias("conv_lang"),
            F.col("lang_weight").alias("conv_lang_weight"),
            "conv_total_weight",
        )
    )


def conversation_vote_unsalted(
    turns: DataFrame, lang_col: str = "lang", weight_col: str = "nbytes"
) -> DataFrame:
    """Direct single-stage version — test oracle for salted == unsalted."""
    merged = turns.groupBy("conv_id", lang_col).agg(
        F.sum(F.col(weight_col)).alias("lang_weight")
    )
    w = Window.partitionBy("conv_id").orderBy(F.desc("lang_weight"), F.asc(lang_col))
    totals = Window.partitionBy("conv_id")
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .withColumn("conv_total_weight", F.sum("lang_weight").over(totals))
        .filter(F.col("_rn") == 1)
        .select(
            "conv_id",
            F.col(lang_col).alias("conv_lang"),
            F.col("lang_weight").alias("conv_lang_weight"),
            "conv_total_weight",
        )
    )
