"""Gopher-style repetition statistics (Rae et al. 2021, "Scaling
Language Models: ... Gopher", Table A1 repetition filters).

Web-crawl boilerplate shows up as REPETITION — duplicated lines
(navigation chrome, cookie banners) and degenerate token loops. Gopher
drops documents whose duplicate-line fraction / duplicate-line
character fraction / top-n-gram character fraction exceed thresholds;
this operator computes the per-document statistics, leaving thresholds
to the caller (they are corpus-tuning knobs, like the CCNet tercile).

Semantics (shared verbatim by the DuckDB oracle — every count is an
exact integer and every fraction one IEEE double division, so the two
engines agree bit-for-bit before the 6dp round):

* lines   — text split on '\\n', EMPTY LINES EXCLUDED.
* words   — maximal runs of [^\\t\\n\\f\\r ] (an explicit 5-char
  whitespace class, NOT the \\S shorthand: Java, RE2 and Python re
  disagree about \\x0b and unicode spaces — CLAUDE.md dialect rule).
* bigrams — adjacent word pairs joined by one space.
* dup_line_frac      = (n_lines - n_distinct_lines) / n_lines
* dup_line_char_frac = Σ len(line)·(count-1) / Σ len(line)·count
  (characters in repeat occurrences / all line characters)
* top_word_frac      = max word count / n_words
* top_bigram_frac    = max bigram count / n_bigrams
  All fractions are 0 when the denominator is empty.

Plan shape: ONE Arrow-UDF map over the scan — no explode, no shuffle
(the explode+groupBy(doc_id) formulation shuffles every line/word of
the corpus; at 100 TB that shuffle IS the job. Per-doc counting inside
the batch needs no cross-doc state, so it belongs in the map). The
DuckDB oracle uses the explode formulation precisely because it is an
independent computation path.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_WORD_RE = re.compile(r"[^\t\n\f\r ]+")

_SCHEMA = T.StructType(
    [
        T.StructField("n_lines", T.LongType()),
        T.StructField("dup_line_frac", T.DoubleType()),
        T.StructField("dup_line_char_frac", T.DoubleType()),
        T.StructField("n_words", T.LongType()),
        T.StructField("top_word_frac", T.DoubleType()),
        T.StructField("top_bigram_frac", T.DoubleType()),
    ]
)


def _doc_stats(t: str) -> tuple:
    lines = [l for l in t.split("\n") if l]
    n_lines = len(lines)
    if n_lines:
        uniq, cnt = np.unique(np.array(lines, dtype=object), return_counts=True)
        lens = np.fromiter((len(u) for u in uniq), dtype=np.int64, count=len(uniq))
        total_chars = int((lens * cnt).sum())
        dup_chars = int((lens * (cnt - 1)).sum())
        dup_line_frac = (n_lines - len(uniq)) / n_lines
        dup_line_char_frac = dup_chars / total_chars if total_chars else 0.0
    else:
        dup_line_frac = dup_line_char_frac = 0.0
    words = _WORD_RE.findall(t)
    n_words = len(words)
    if n_words:
        _, wc = np.unique(np.array(words, dtype=object), return_counts=True)
        top_word_frac = int(wc.max()) / n_words
    else:
        top_word_frac = 0.0
    if n_words >= 2:
        # bounded per-doc pairing loop (O(words), like the multimodal
        # decode loop) — the counting itself is one vectorized np.unique
        bigrams = np.array(
            [words[i] + " " + words[i + 1] for i in range(n_words - 1)], dtype=object
        )
        _, bc = np.unique(bigrams, return_counts=True)
        top_bigram_frac = int(bc.max()) / (n_words - 1)
    else:
        top_bigram_frac = 0.0
    return (
        n_lines,
        dup_line_frac,
        dup_line_char_frac,
        n_words,
        top_word_frac,
        top_bigram_frac,
    )


def _batch_stats(texts: list) -> pd.DataFrame:
    """Batched twin of _doc_stats over the whole Arrow batch (VERDICT
    r04: the per-row loop was the one bulk-map operator off the repo's
    concat-buffer discipline). Tokenization stays per-doc (str.split /
    findall are per-string by nature) but ALL counting is batch-level:
    one pd.factorize + np.unique per feature family, with (doc, code)
    composite integer keys — the perplexity_batch pattern. Every count
    is the same integer and every fraction the same single IEEE division
    as _doc_stats, so outputs are bit-identical (property-tested)."""
    B = len(texts)
    line_lists = [[l for l in t.split("\n") if l] for t in texts]
    word_lists = [_WORD_RE.findall(t) for t in texts]
    n_lines = np.fromiter((len(x) for x in line_lists), np.int64, count=B)
    n_words = np.fromiter((len(x) for x in word_lists), np.int64, count=B)

    dup_line_frac = np.zeros(B)
    dup_line_char_frac = np.zeros(B)
    flat_lines = [l for ls in line_lists for l in ls]
    if flat_lines:
        codes, uniq = pd.factorize(np.array(flat_lines, dtype=object))
        L = len(uniq)
        doc_of = np.repeat(np.arange(B), n_lines)
        ukey, cnt = np.unique(doc_of * L + codes, return_counts=True)
        udoc, ucode = ukey // L, ukey % L
        lens_by_code = np.fromiter((len(u) for u in uniq), np.int64, count=L)
        ulen = lens_by_code[ucode]
        n_distinct = np.bincount(udoc, minlength=B)
        # integer sums via float64 bincount weights — exact below 2^53
        total_chars = np.bincount(
            udoc, weights=(ulen * cnt).astype(np.float64), minlength=B
        ).astype(np.int64)
        dup_chars = np.bincount(
            udoc, weights=(ulen * (cnt - 1)).astype(np.float64), minlength=B
        ).astype(np.int64)
        nz = n_lines > 0
        dup_line_frac[nz] = (n_lines[nz] - n_distinct[nz]) / n_lines[nz]
        cz = total_chars > 0
        dup_line_char_frac[cz] = dup_chars[cz] / total_chars[cz]

    top_word_frac = np.zeros(B)
    top_bigram_frac = np.zeros(B)
    flat_words = [w for ws in word_lists for w in ws]
    if flat_words:
        codes, uniq = pd.factorize(np.array(flat_words, dtype=object))
        W = len(uniq)
        doc_of = np.repeat(np.arange(B), n_words)
        ukey, cnt = np.unique(doc_of * W + codes, return_counts=True)
        top = np.zeros(B, np.int64)
        np.maximum.at(top, ukey // W, cnt)
        nzw = n_words > 0
        top_word_frac[nzw] = top[nzw] / n_words[nzw]

        # bigrams: adjacent same-doc code pairs. Words contain no space
        # (the class excludes it), so 'w1 + " " + w2' is injective over
        # code pairs — counting pairs == counting bigram strings. The
        # pair key is re-factorized before mixing in the doc id to keep
        # the composite key overflow-safe at any batch vocabulary.
        same_doc = doc_of[:-1] == doc_of[1:]
        if same_doc.any():
            pair_key = codes[:-1][same_doc].astype(np.int64) * W + codes[1:][same_doc]
            d = doc_of[:-1][same_doc]
            pcodes, puniq = pd.factorize(pair_key)
            ukey2, cnt2 = np.unique(d * len(puniq) + pcodes, return_counts=True)
            topb = np.zeros(B, np.int64)
            np.maximum.at(topb, ukey2 // len(puniq), cnt2)
            m = n_words >= 2
            top_bigram_frac[m] = topb[m] / (n_words[m] - 1)

    return pd.DataFrame(
        {
            "n_lines": n_lines,
            "dup_line_frac": dup_line_frac,
            "dup_line_char_frac": dup_line_char_frac,
            "n_words": n_words,
            "top_word_frac": top_word_frac,
            "top_bigram_frac": top_bigram_frac,
        }
    )


def repetition_stats_udf():
    @pandas_udf(_SCHEMA)
    def _stats(texts: pd.Series) -> pd.DataFrame:
        return _batch_stats(texts.fillna("").tolist())

    return _stats


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    u = repetition_stats_udf()
    return df.select(F.col(id_col), u(F.col(text_col)).alias("_r")).select(
        id_col,
        F.col("_r.n_lines").alias("n_lines"),
        F.round("_r.dup_line_frac", 6).alias("dup_line_frac"),
        F.round("_r.dup_line_char_frac", 6).alias("dup_line_char_frac"),
        F.col("_r.n_words").alias("n_words"),
        F.round("_r.top_word_frac", 6).alias("top_word_frac"),
        F.round("_r.top_bigram_frac", 6).alias("top_bigram_frac"),
    )


def repetition_stats_oracle_sql(table: str = "documents") -> str:
    """Independent explode+aggregate formulation in DuckDB (ANSI-ish).
    Integer counts + one double division per fraction == the UDF's
    arithmetic bit-for-bit; round(…, 6) on both sides."""
    return f"""
    WITH base AS (
        SELECT doc_id, coalesce(text, '') AS t FROM {table}
    ), per_line AS (
        SELECT doc_id, l, count(*) AS c, length(l) AS len FROM (
            SELECT doc_id, unnest(string_split(t, chr(10))) AS l FROM base
        ) WHERE l <> '' GROUP BY doc_id, l
    ), line_stats AS (
        SELECT doc_id,
               sum(c) AS n_lines,
               count(*) AS n_distinct,
               sum(len * c) AS total_chars,
               sum(len * (c - 1)) AS dup_chars
        FROM per_line GROUP BY doc_id
    ), per_word AS (
        SELECT doc_id, w, count(*) AS c FROM (
            SELECT doc_id,
                   unnest(regexp_extract_all(t, '[^\\t\\n\\f\\r ]+')) AS w
            FROM base
        ) GROUP BY doc_id, w
    ), word_stats AS (
        SELECT doc_id, sum(c) AS n_words, max(c) AS top_word
        FROM per_word GROUP BY doc_id
    ), per_bg AS (
        SELECT doc_id, bg, count(*) AS c FROM (
            SELECT doc_id, unnest(
                list_transform(
                    range(2, len(words) + 1),
                    i -> words[i - 1] || ' ' || words[i]
                )
            ) AS bg
            FROM (SELECT doc_id,
                         regexp_extract_all(t, '[^\\t\\n\\f\\r ]+') AS words
                  FROM base)
        ) GROUP BY doc_id, bg
    ), bg_stats AS (
        SELECT doc_id, sum(c) AS n_bg, max(c) AS top_bg
        FROM per_bg GROUP BY doc_id
    )
    SELECT b.doc_id,
           CAST(coalesce(ls.n_lines, 0) AS BIGINT) AS n_lines,
           round(coalesce((ls.n_lines - ls.n_distinct) / ls.n_lines, 0.0), 6)
               AS dup_line_frac,
           round(CASE WHEN coalesce(ls.total_chars, 0) = 0 THEN 0.0
                      ELSE ls.dup_chars / ls.total_chars END, 6)
               AS dup_line_char_frac,
           CAST(coalesce(ws.n_words, 0) AS BIGINT) AS n_words,
           round(coalesce(ws.top_word / ws.n_words, 0.0), 6) AS top_word_frac,
           round(coalesce(bg.top_bg / bg.n_bg, 0.0), 6) AS top_bigram_frac
    FROM base b
    LEFT JOIN line_stats ls USING (doc_id)
    LEFT JOIN word_stats ws USING (doc_id)
    LEFT JOIN bg_stats bg USING (doc_id)
    """
