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


def repetition_stats_udf():
    @pandas_udf(_SCHEMA)
    def _stats(texts: pd.Series) -> pd.DataFrame:
        rows = [_doc_stats(t) for t in texts.fillna("")]
        return pd.DataFrame(rows, columns=[f.name for f in _SCHEMA.fields])

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
