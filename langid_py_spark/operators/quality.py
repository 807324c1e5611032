"""Corpus-level quality operators (beyond per-row rules).

ccnet_ppl_buckets: the CCNet head/middle/tail split (Wenzek et al. 2020,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
Data") — per LANGUAGE, rank documents by LM perplexity and cut the
distribution at the 1/3 and 2/3 percentiles; 'head' (lowest ppl) is the
cleanest training data. This is the standard corpus-level companion to
the per-row heuristic rules in spark/rules.py.

Per-language LMs (r04): perplexity is scored under the document's OWN
language LM (core/lm.py::MultiTrigramLM, one npz of 18 per-lang trigram
tables + the global fallback) — CCNet's actual contract; a single
global LM conflates script frequency with quality. per_lang_lm=False
keeps the global LM for ablation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ccnet_ppl_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    lm_path: str | None = None,
    max_bytes: int = 4096,
    exact: bool = True,
    per_lang_lm: bool = True,
) -> DataFrame:
    """(doc_id, lang, ppl, bucket) with bucket in head|middle|tail by the
    per-language ppl tercile thresholds. NULL lang is coalesced to the
    'und' sentinel BEFORE the groupBy/backjoin, so every input row gets
    a bucket (an inner join on a raw NULL key would silently drop the
    unlabeled rows — ADVICE r03; 'und' rows form their own tercile
    distribution, which is exactly CCNet's per-language contract applied
    to the unknown-language bucket).

    Plan: one Arrow-UDF ppl map → per-language percentile aggregation
    (|langs| rows — tiny) → broadcast join back → codegen'd bucketing.

    `exact=True` uses F.percentile (exact: per-group sort) — right for
    the oracle gate and up to ~10^9 rows/lang. At 100 TB pass
    exact=False for percentile_approx (t-digest sketch, one pass,
    mergeable): identical plan shape, epsilon-boundary docs may move one
    bucket — CCNet itself treats the cut as a tuning knob, not a
    contract.

    Boundary robustness of the golden oracle: when a tercile falls
    between two distinct ppl values, a last-ulp difference in the
    interpolated threshold cannot flip any document (no data point lies
    strictly between the two engines' thresholds); when it lands ON a
    data value the interpolation is exact in both. So the bucket column
    hash-matches even if Spark's and numpy's interpolation differ in the
    final bit.
    """
    from langid_py_spark.core.lm import DEFAULT_LM_PATH, DEFAULT_MULTI_LM_PATH
    from langid_py_spark.spark.perplexity import perplexity_by_lang_udf, perplexity_udf

    lang = F.coalesce(F.col(lang_col), F.lit("und")).alias("lang")
    if per_lang_lm:
        # the CCNet contract proper: each doc scored by ITS language's LM
        # ('und'/unknown falls back to the global LM); per_lang_lm=False
        # keeps the single global LM for ablation/debug
        ppl_by_lang = perplexity_by_lang_udf(
            multi_lm_path=lm_path or DEFAULT_MULTI_LM_PATH, max_bytes=max_bytes
        )
        scored = df.select(
            F.col(id_col), lang, F.col(text_col).alias("_t")
        ).select(
            F.col(id_col), "lang", ppl_by_lang(F.col("_t"), F.col("lang")).alias("_ppl")
        )
    else:
        ppl_udf = perplexity_udf(lm_path=lm_path or DEFAULT_LM_PATH, max_bytes=max_bytes)
        scored = df.select(
            F.col(id_col), lang, ppl_udf(F.col(text_col)).alias("_ppl")
        )
    pct = F.percentile if exact else (
        lambda c, p: F.percentile_approx(c, p, 10_000)
    )
    cuts = scored.groupBy("lang").agg(
        pct(F.col("_ppl"), F.lit(1 / 3)).alias("_t1"),
        pct(F.col("_ppl"), F.lit(2 / 3)).alias("_t2"),
    )
    bucket = (
        F.when(F.col("_ppl") <= F.col("_t1"), "head")
        .when(F.col("_ppl") <= F.col("_t2"), "middle")
        .otherwise("tail")
    )
    return (
        scored.join(F.broadcast(cuts), "lang")
        .select(
            F.col(id_col),
            "lang",
            F.round(F.col("_ppl"), 4).alias("ppl"),
            bucket.alias("bucket"),
        )
    )
