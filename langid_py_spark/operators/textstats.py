"""Text-analysis operators for training-data pipelines.

All pure Catalyst expressions (JVM-side, codegen'd) except fingerprinting
options documented per function. Each has a matching DuckDB-oracle SQL
builder so the driver's correctness gate covers it end-to-end.

At 100 TB these are embarrassingly parallel map stages — no shuffle, full
predicate pushdown/column pruning preserved.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_PATTERN = r"\S+"
# BPE-ish token regex: letter runs, digit runs, or single non-space symbol
TOKEN_PATTERN = r"\p{L}+|[0-9]+|[^\p{L}0-9\s]"
TOKEN_PATTERN_RE2 = r"\p{L}+|[0-9]+|[^\p{L}0-9\s]"


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace + BPE-ish token counts, char stats, quality ratios."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.length(t)
    n_words = F.regexp_count(t, F.lit(WORD_PATTERN))
    n_tokens = F.regexp_count(t, F.lit(TOKEN_PATTERN))
    n_alpha = F.regexp_count(t, F.lit(r"\p{L}"))
    n_digit = F.regexp_count(t, F.lit("[0-9]"))
    n_lines = F.size(F.split(t, "\n"))
    # cast counts to long: DuckDB oracles produce BIGINT for length/len
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        n_tokens.cast("long").alias("n_tokens"),
        n_lines.cast("long").alias("n_lines"),
        F.round(n_alpha / F.greatest(n_chars, F.lit(1)), 6).alias("alpha_ratio"),
        F.round(n_digit / F.greatest(n_chars, F.lit(1)), 6).alias("digit_ratio"),
        F.round(
            (n_chars - n_words + 1).cast("double") / F.greatest(n_words, F.lit(1)), 6
        ).alias("mean_word_len"),
    )


def token_stats_oracle_sql(table: str = "documents", id_col: str = "doc_id") -> str:
    t = "coalesce(text, '')"
    n_chars = f"length({t})"
    n_words = f"len(regexp_extract_all({t}, '\\S+'))"
    n_tokens = f"len(regexp_extract_all({t}, '{TOKEN_PATTERN_RE2}'))"
    n_alpha = f"len(regexp_extract_all({t}, '\\p{{L}}'))"
    n_digit = f"len(regexp_extract_all({t}, '[0-9]'))"
    n_lines = f"len(string_split({t}, chr(10)))"
    return f"""
    SELECT {id_col},
           {n_chars} AS n_chars,
           {n_words} AS n_words,
           {n_tokens} AS n_tokens,
           {n_lines} AS n_lines,
           round({n_alpha} / greatest({n_chars}, 1), 6) AS alpha_ratio,
           round({n_digit} / greatest({n_chars}, 1), 6) AS digit_ratio,
           round(CAST({n_chars} - {n_words} + 1 AS DOUBLE) / greatest({n_words}, 1), 6)
               AS mean_word_len
    FROM {table}
    """


def doc_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic document fingerprints: full-text md5 + a content-
    normalized md5 (lowercase, collapse whitespace) — the standard exact /
    near-exact dedup keys. crc32 included as a cheap rolling-hash-style
    checksum. All JVM-side built-ins."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    norm = F.regexp_replace(F.lower(t), r"\s+", " ")
    return df.select(
        F.col(id_col),
        F.md5(t).alias("fp_md5"),
        F.md5(norm).alias("fp_norm_md5"),
        F.crc32(t.cast("binary")).alias("fp_crc32"),
    )


def doc_fingerprint_oracle_sql(table: str = "documents", id_col: str = "doc_id") -> str:
    t = "coalesce(text, '')"
    norm = f"regexp_replace(lower({t}), '\\s+', ' ', 'g')"
    # DuckDB has no crc32 → oracle covers md5 columns; crc32 is unit-tested
    return f"""
    SELECT {id_col}, md5({t}) AS fp_md5, md5({norm}) AS fp_norm_md5
    FROM {table}
    """


def word_df_tally(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document frequency per word (reference A2: DFfeatureselect tally —
    count DISTINCT docs containing each feature). Partial+final hash agg;
    the distinct is per (doc, word) so the shuffle key is well-spread."""
    words = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(WORD_PATTERN), F.lit(0))
        ).alias("word"),
    )
    return (
        words.distinct()
        .groupBy("word")
        .agg(F.count("*").alias("df"))
    )


def word_df_tally_oracle_sql(table: str = "documents", id_col: str = "doc_id") -> str:
    return f"""
    SELECT word, count(*) AS df FROM (
        SELECT DISTINCT {id_col},
               unnest(regexp_extract_all(text, '\\S+')) AS word
        FROM {table}
    ) GROUP BY word
    """


def topk_words_per_group(
    df: DataFrame,
    group_col: str = "lang",
    k: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Top-k words per group by total occurrences (reference W1/W2 top-k-
    per-order / per-language window pattern). Deterministic tie-break
    (count desc, word asc)."""
    from pyspark.sql import Window

    counts = (
        df.select(
            F.col(group_col),
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(WORD_PATTERN), F.lit(0))
            ).alias("word"),
        )
        .groupBy(group_col, "word")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy(group_col).orderBy(F.desc("n"), F.asc("word"))
    return (
        counts.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select(group_col, "word", "n", "rk")
    )


def topk_words_oracle_sql(table: str = "documents", group_col: str = "lang", k: int = 5) -> str:
    return f"""
    SELECT {group_col}, word, n, rk FROM (
        SELECT {group_col}, word, n,
               row_number() OVER (PARTITION BY {group_col}
                                  ORDER BY n DESC, word ASC) AS rk
        FROM (
            SELECT {group_col}, word, count(*) AS n FROM (
                SELECT {group_col},
                       unnest(regexp_extract_all(text, '\\S+')) AS word
                FROM {table}
            ) GROUP BY 1, 2
        )
    ) WHERE rk <= {k}
    """


# ----------------------------------------------------- lang heuristic
# Cheap Catalyst-only language guess (charset fractions + ASCII stopword
# hits) — the n-gram-heuristic pre-filter tier of a 100 TB pipeline: at
# scale you run THIS first (pure codegen, no UDF) and reserve the full
# NB model for the survivors. Dialect note: these patterns target the
# Java-regex (Spark) ∩ RE2 (DuckDB) pair — both treat \b as an ASCII
# word boundary, so the two driver engines agree byte-for-byte. \b is
# deliberately OUTSIDE the stricter three-engine dialect used by
# rules/scrub (Python re's \b is Unicode-aware: 'laïcité' would split
# differently there); this operator has no Python-re oracle, so the
# stricter invariant does not apply. Char counting uses
# length(x) - length(regexp_replace(x, class, '')) instead of
# regexp_extract_all so no per-char array is materialized.
_CJK_CLASS = "[一-鿿぀-ヿ가-힯]"
_CYR_CLASS = "[Ѐ-ӿ]"
_AR_CLASS = "[؀-ۿ]"
_STOPWORDS = {
    "en": "(the|and|of|to|is)",
    "de": "(der|die|und|ist|das)",
    "fr": "(le|la|les|et|est)",
    "es": "(el|los|las|es|y)",
}


def lang_heuristic(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    t = F.coalesce(F.col(text_col), F.lit(""))
    n = F.greatest(F.length(t), F.lit(1)).cast("double")

    def class_frac(cls: str):
        return (F.length(t) - F.length(F.regexp_replace(t, cls, ""))) / n

    low = F.lower(t)
    sw = {
        lang: F.size(
            F.regexp_extract_all(low, F.lit(f"\\b{words}\\b"), F.lit(0))
        ).cast("long")
        for lang, words in _STOPWORDS.items()
    }
    c_en, c_de, c_fr, c_es = sw["en"], sw["de"], sw["fr"], sw["es"]
    guess = (
        F.when(class_frac(_CJK_CLASS) > 0.3, "cjk")
        .when(class_frac(_CYR_CLASS) > 0.3, "ru")
        .when(class_frac(_AR_CLASS) > 0.3, "ar")
        .when((c_en >= c_de) & (c_en >= c_fr) & (c_en >= c_es) & (c_en > 0), "en")
        .when((c_de >= c_fr) & (c_de >= c_es) & (c_de > 0), "de")
        .when((c_fr >= c_es) & (c_fr > 0), "fr")
        .when(c_es > 0, "es")
        .otherwise("und")
    )
    return df.select(
        F.col(id_col),
        guess.alias("lang_guess"),
        c_en.alias("sw_en"),
        c_de.alias("sw_de"),
        c_fr.alias("sw_fr"),
        c_es.alias("sw_es"),
    )


def lang_heuristic_oracle_sql(table: str = "documents", id_col: str = "doc_id") -> str:
    t = "coalesce(text, '')"
    n = f"greatest(length({t}), 1)"

    def frac(cls: str) -> str:
        return f"(length({t}) - length(regexp_replace({t}, '{cls}', '', 'g'))) / CAST({n} AS DOUBLE)"

    sw = {
        lang: (
            f"CAST(len(regexp_extract_all(lower({t}), '\\b{words}\\b')) AS BIGINT)"
        )
        for lang, words in _STOPWORDS.items()
    }
    return f"""
    SELECT {id_col},
           CASE
             WHEN {frac(_CJK_CLASS)} > 0.3 THEN 'cjk'
             WHEN {frac(_CYR_CLASS)} > 0.3 THEN 'ru'
             WHEN {frac(_AR_CLASS)} > 0.3 THEN 'ar'
             WHEN {sw['en']} >= {sw['de']} AND {sw['en']} >= {sw['fr']}
                  AND {sw['en']} >= {sw['es']} AND {sw['en']} > 0 THEN 'en'
             WHEN {sw['de']} >= {sw['fr']} AND {sw['de']} >= {sw['es']}
                  AND {sw['de']} > 0 THEN 'de'
             WHEN {sw['fr']} >= {sw['es']} AND {sw['fr']} > 0 THEN 'fr'
             WHEN {sw['es']} > 0 THEN 'es'
             ELSE 'und'
           END AS lang_guess,
           {sw['en']} AS sw_en, {sw['de']} AS sw_de,
           {sw['fr']} AS sw_fr, {sw['es']} AS sw_es
    FROM {table}
    """
