"""Distributed byte-n-gram LM training — the missing half of the
train→artifact→score loop.

`core/lm.py::train_lm` estimates the interpolated byte-trigram LM on
the DRIVER from a Python list of texts; the scorers
(`spark/perplexity.py`, the fused scorer's per-lang ppl) then consume
the resulting npz artifact cluster-wide. This operator estimates the
SAME model from a DataFrame, so the clean-corpus → LM → quality-filter
loop runs end-to-end on Spark (the CCNet workflow: Wenzek 2020 trains
its KenLM models on Wikipedia, then filters Common Crawl with them —
reference scope note: upstream saffsd/langid.py ships a pre-trained
model and has no LM trainer; this is a training-data-pipeline extra).

Scale story (why this survives 100 TB):

* The Arrow map PRE-AGGREGATES within each batch (`np.unique` over a
  masked concat buffer — the `perplexity_batch` layout), so the map
  emits at most `distinct-keys-in-batch` rows per batch, already
  summed. The ONE corpus-scale shuffle carries fixed-width
  (ord, key, cnt) rows — map-side combine then finishes the sum.
* The aggregated table is bounded by the KEY SPACE — at most
  256 + 2^16 + 2^24 ≈ 16.8M rows — INDEPENDENT of corpus size. Model
  size does not grow with data (the same reason langid.py can ship its
  model as a fixed embedded string), so the driver pull in
  `train_lm_distributed` is bounded by construction, not by hope.
* Context totals (the denominators of the conditional probabilities)
  derive from the aggregated counts by a second groupBy over the
  already-key-space-bounded table — never a second corpus scan. For
  ord=1 the context is empty, and `key >> 8 == 0` for every byte key,
  so one uniform `groupBy(ord, key >> 8)` yields the total-byte
  denominator for free.

Bit-identity contract: `train_lm_distributed(df) == train_lm(texts)`
EXACTLY (integer counts are associative, and the array build below
repeats train_lm's comprehensions verbatim — same scalar np.log, same
int/int division order). Property-tested in tests/test_lm_train.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from langid_py_spark.core.lm import MultiTrigramLM, TrigramLM

_COUNT_SCHEMA = T.StructType(
    [
        T.StructField("ord", T.IntegerType()),
        T.StructField("key", T.LongType()),
        T.StructField("cnt", T.LongType()),
    ]
)

_LANG_COUNT_SCHEMA = T.StructType(
    [T.StructField("lang", T.StringType())] + list(_COUNT_SCHEMA.fields)
)

# 1000 languages × the 2^24-bounded trigram space is still a bounded
# pull, but far past anything the npz artifact format is meant to hold —
# fail loudly rather than assemble a multi-GB model on the driver.
MAX_LANGS = 512


def _batch_ngram_counts(texts: list) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(ord, key, cnt) partials for one Arrow batch, pre-summed.

    Same masked-concat-buffer layout as TrigramLM.perplexity_batch: all
    docs join one byte buffer; bigram/trigram keys are formed over the
    whole buffer with cross-document positions masked out, so per-doc
    length-< n edge cases match train_lm's per-doc loops exactly.
    """
    datas = [(t or "").encode("utf-8") for t in texts]
    lens = np.fromiter((len(d) for d in datas), dtype=np.int64, count=len(datas))
    total = int(lens.sum())
    if total == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, e
    buf = np.frombuffer(b"".join(datas), dtype=np.uint8).astype(np.uint32)
    doc_id = np.repeat(np.arange(len(datas)), lens)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    pos = np.arange(total) - starts[doc_id]

    uni = np.bincount(buf, minlength=256)
    u_nz = np.flatnonzero(uni)
    ords = [np.ones(len(u_nz), dtype=np.int64)]
    keys = [u_nz.astype(np.int64)]
    cnts = [uni[u_nz].astype(np.int64)]

    prev1 = np.empty_like(buf)
    prev1[0] = 0
    prev1[1:] = buf[:-1]
    m_bi = pos >= 1
    bk, bc = np.unique((prev1[m_bi].astype(np.int64) << 8) | buf[m_bi], return_counts=True)
    ords.append(np.full(len(bk), 2, dtype=np.int64))
    keys.append(bk)
    cnts.append(bc.astype(np.int64))

    prev2 = np.empty_like(buf)
    prev2[:2] = 0
    prev2[2:] = buf[:-2]
    m_tri = pos >= 2
    tk, tc = np.unique(
        (prev2[m_tri].astype(np.int64) << 16)
        | (prev1[m_tri].astype(np.int64) << 8)
        | buf[m_tri],
        return_counts=True,
    )
    ords.append(np.full(len(tk), 3, dtype=np.int64))
    keys.append(tk)
    cnts.append(tc.astype(np.int64))
    return np.concatenate(ords), np.concatenate(keys), np.concatenate(cnts)


def ngram_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-wide byte n-gram counts: (ord ∈ {1,2,3}, key, cnt).

    Key packing matches core/lm.py: trigram (b0<<16)|(b1<<8)|b2, bigram
    (b0<<8)|b1, unigram the byte itself. ONE shuffle, fixed-width rows,
    result bounded by the key space (≤ 2^24 + 2^16 + 256 rows) at any
    corpus size.
    """

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            o, k, c = _batch_ngram_counts(b[text_col].tolist())
            yield pd.DataFrame(
                {
                    "ord": o.astype(np.int32),
                    "key": k,
                    "cnt": c,
                }
            )

    partials = df.select(text_col).mapInPandas(emit, schema=_COUNT_SCHEMA)
    return partials.groupBy("ord", "key").agg(F.sum("cnt").alias("cnt"))


def ngram_counts_by_lang(
    df: DataFrame, text_col: str = "text", lang_col: str = "lang"
) -> DataFrame:
    """Per-language byte n-gram counts: (lang, ord, key, cnt).

    NULL langs keep a NULL lang key — they contribute to the global
    fallback (which sums over every group) but get no per-lang LM.
    """

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            langs = b[lang_col]
            texts = b[text_col]
            # sub-batch per lang: counts are per-group sums, so batch
            # composition cannot change any value (golden-safe)
            keys = langs.fillna("\x00__null__").to_numpy(dtype=object)
            for lang in np.unique(keys):
                idx = np.flatnonzero(keys == lang)
                o, k, c = _batch_ngram_counts([texts.iloc[i] for i in idx])
                out_lang = None if lang == "\x00__null__" else str(lang)
                yield pd.DataFrame(
                    {
                        "lang": pd.Series([out_lang] * len(o), dtype=object),
                        "ord": o.astype(np.int32),
                        "key": k,
                        "cnt": c,
                    }
                )

    partials = df.select(lang_col, text_col).mapInPandas(
        emit, schema=_LANG_COUNT_SCHEMA
    )
    return partials.groupBy("lang", "ord", "key").agg(F.sum("cnt").alias("cnt"))


def _build_lm(
    uni: np.ndarray,
    bi_c: dict[int, int],
    tri_c: dict[int, int],
    bi_ctx: dict[int, int],
    tri_ctx: dict[int, int],
    min_count: int,
) -> TrigramLM:
    """Assemble a TrigramLM from exact integer counts.

    Deliberately repeats core/lm.py::train_lm's expressions VERBATIM
    (scalar np.log inside the comprehension, int/int division) so the
    distributed trainer is bit-identical to the driver-local one — the
    same "Oracle = UDF code" discipline as the scorer, except here the
    two count paths (dict loops vs groupBy shuffle) are genuinely
    independent computations of the same integers.
    """
    uni_logp = np.log((uni + 0.5) / (uni.sum() + 128.0))

    bi_items = sorted((k, c) for k, c in bi_c.items() if c >= min_count)
    bi_keys = np.array([k for k, _ in bi_items], dtype=np.uint32)
    bi_logp = np.array(
        [np.log(c / bi_ctx[k >> 8]) for k, c in bi_items], dtype=np.float64
    )
    tri_items = sorted((k, c) for k, c in tri_c.items() if c >= min_count)
    tri_keys = np.array([k for k, _ in tri_items], dtype=np.uint32)
    tri_logp = np.array(
        [np.log(c / tri_ctx[k >> 8]) for k, c in tri_items], dtype=np.float64
    )
    return TrigramLM(
        tri_keys=tri_keys,
        tri_logp=tri_logp,
        bi_keys=bi_keys,
        bi_logp=bi_logp,
        uni_logp=uni_logp,
    )


def _counts_to_model(rows, min_count: int) -> TrigramLM:
    """(ord, key, cnt) rows → TrigramLM via _build_lm."""
    uni = np.zeros(256, dtype=np.float64)
    bi_c: dict[int, int] = {}
    tri_c: dict[int, int] = {}
    bi_ctx: dict[int, int] = {}
    tri_ctx: dict[int, int] = {}
    for o, k, c in rows:
        if o == 1:
            uni[k] = float(c)
        elif o == 2:
            bi_c[k] = c
            bi_ctx[k >> 8] = bi_ctx.get(k >> 8, 0) + c
        else:
            tri_c[k] = c
            tri_ctx[k >> 8] = tri_ctx.get(k >> 8, 0) + c
    return _build_lm(uni, bi_c, tri_c, bi_ctx, tri_ctx, min_count)


def train_lm_distributed(
    df: DataFrame, text_col: str = "text", min_count: int = 2
) -> TrigramLM:
    """Estimate the interpolated byte-trigram LM from a corpus DataFrame.

    == core/lm.py::train_lm(texts) bit-for-bit. The driver pull is the
    aggregated count table — bounded by the key space (≤ 16.8M
    fixed-width rows ≈ a few hundred MB worst case, the size of the
    model itself), never by the corpus. min_count filtering happens
    AFTER the context totals are taken (train_lm semantics: rare keys
    drop out of the table but still weight their context denominator),
    so the pull keeps sub-threshold keys — they are part of the model
    estimate, not noise.
    """
    rows = [
        (r["ord"], r["key"], r["cnt"])
        for r in ngram_counts(df, text_col).toLocalIterator()
    ]
    return _counts_to_model(rows, min_count)


def train_multi_lm_distributed(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    min_count: int = 2,
) -> MultiTrigramLM:
    """Per-language LMs + global fallback from one corpus scan.

    == MultiTrigramLM(lms={lang: train_lm(texts_of_lang)},
                      fallback=train_lm(all_texts)) bit-for-bit:
    integer counts are associative, so the global fallback's counts are
    the exact sum of the per-group counts (NULL-lang docs included) —
    no second scan. One corpus-scale shuffle total.
    """
    by_key: dict[str | None, list[tuple[int, int, int]]] = {}
    glob: dict[tuple[int, int], int] = {}
    n_langs = 0
    for r in ngram_counts_by_lang(df, text_col, lang_col).toLocalIterator():
        lang, o, k, c = r["lang"], r["ord"], r["key"], r["cnt"]
        if lang not in by_key:
            n_langs += 1
            if n_langs > MAX_LANGS:
                raise ValueError(
                    f"train_multi_lm_distributed: more than {MAX_LANGS} "
                    f"distinct values in {lang_col!r} — a per-lang LM "
                    "artifact at that cardinality is almost certainly a "
                    "mis-keyed column; pass the real language column or "
                    "raise lm_train.MAX_LANGS deliberately"
                )
            by_key[lang] = []
        by_key[lang].append((o, k, c))
        glob[(o, k)] = glob.get((o, k), 0) + c
    lms = {
        str(lang): _counts_to_model(rows, min_count)
        for lang, rows in by_key.items()
        if lang is not None
    }
    fallback = _counts_to_model(
        [(o, k, c) for (o, k), c in glob.items()], min_count
    )
    return MultiTrigramLM(lms=lms, fallback=fallback)


def lm_ngram_topk(df: DataFrame, text_col: str = "text", k: int = 50) -> DataFrame:
    """Driver-facing query: top-k byte n-grams per order with their
    context totals — the integer heart of the LM estimate (logp is just
    log(cnt/ctx_total); keeping the query integer-valued keeps the
    DuckDB oracle engine-exact with no float or libm concerns).

    Columns: ord, key, cnt, ctx_total — ctx_total is the conditional-
    probability denominator (for ord=1, key>>8 ≡ 0, so the "context" is
    the corpus byte total).

    Plan: scan → Arrow map (pre-summed partials) → ONE corpus-scale
    groupBy shuffle → ctx agg over the key-space-bounded table →
    BROADCAST backjoin (ctx ≤ 2^16+2 rows) → per-ord window. The window
    has 3 partitions, but each holds at most the key space — an
    absolute bound, not a corpus-dependent one.
    """
    counts = ngram_counts(df, text_col)
    # ctx derives FROM counts, and Spark aggregates keep the grouping
    # column's expression id — joining counts["ord"] == ctx["ord"] would
    # be an ambiguous self-reference. Renamed columns sidestep it.
    ctx = (
        counts.groupBy(
            F.col("ord").alias("ctx_ord"),
            F.shiftright("key", 8).alias("ctx_key"),
        )
        .agg(F.sum("cnt").alias("ctx_total"))
    )
    joined = counts.join(
        F.broadcast(ctx),
        (F.col("ord") == F.col("ctx_ord"))
        & (F.shiftright(F.col("key"), 8) == F.col("ctx_key")),
    ).select("ord", "key", "cnt", "ctx_total")
    w = Window.partitionBy("ord").orderBy(F.desc("cnt"), F.asc("key"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(
            F.col("ord").cast("long").alias("ord"),
            F.col("key").cast("long").alias("key"),
            F.col("cnt").cast("long").alias("cnt"),
            F.col("ctx_total").cast("long").alias("ctx_total"),
        )
    )


def lm_ngram_topk_oracle_sql(table: str = "documents", k: int = 50) -> str:
    """Fully independent DuckDB twin of lm_ngram_topk: bytes come from
    hex(encode(text)) decoded two nibbles at a time (RE2/DuckDB has no
    byte subscripting), n-grams from lead() windows — a completely
    different computation path from the Arrow map, over exact integers.
    """
    return f"""
WITH hx AS (
  SELECT doc_id, lower(hex(encode(text))) AS h,
         octet_length(encode(text)) AS n
  FROM {table}
),
posn AS (
  SELECT doc_id, h, unnest(range(0, n)) AS i FROM hx
),
bytes AS (
  SELECT doc_id, i,
    CAST((strpos('0123456789abcdef', substring(h, CAST(2*i+1 AS INT), 1)) - 1) * 16
       + (strpos('0123456789abcdef', substring(h, CAST(2*i+2 AS INT), 1)) - 1)
       AS BIGINT) AS bv
  FROM posn
),
grams AS (
  SELECT bv,
         lag(bv, 1) OVER w AS p1,
         lag(bv, 2) OVER w AS p2
  FROM bytes WINDOW w AS (PARTITION BY doc_id ORDER BY i)
),
keyed AS (
  SELECT CAST(1 AS BIGINT) AS ord, bv AS key FROM grams
  UNION ALL
  SELECT CAST(2 AS BIGINT), p1 * 256 + bv FROM grams WHERE p1 IS NOT NULL
  UNION ALL
  SELECT CAST(3 AS BIGINT), p2 * 65536 + p1 * 256 + bv
  FROM grams WHERE p2 IS NOT NULL
),
counts AS (
  SELECT ord, key, count(*) AS cnt FROM keyed GROUP BY ord, key
),
ctx AS (
  SELECT ord, key // 256 AS ctx_key, CAST(sum(cnt) AS BIGINT) AS ctx_total
  FROM counts GROUP BY ord, key // 256
),
ranked AS (
  SELECT c.ord, c.key, c.cnt, x.ctx_total,
         row_number() OVER (PARTITION BY c.ord
                            ORDER BY c.cnt DESC, c.key ASC) AS rn
  FROM counts c JOIN ctx x ON c.ord = x.ord AND c.key // 256 = x.ctx_key
)
SELECT ord, key, cnt, ctx_total FROM ranked WHERE rn <= {k}
"""
