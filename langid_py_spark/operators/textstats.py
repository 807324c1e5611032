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

from langid_py_spark import config as C

WORD_PATTERN = C.WORD_RUN_PATTERN  # explicit ws class, not \S (ADVICE r05)
# BPE-ish token regex: letter runs, digit runs, or single non-space symbol
# (explicit ws chars in the negated class — in-class \s has the same
# Java/RE2 \x0B divergence as bare \S)
TOKEN_PATTERN = r"\p{L}+|[0-9]+|[^\p{L}0-9 \t\n\f\r\x0b]"
TOKEN_PATTERN_RE2 = TOKEN_PATTERN


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
    n_words = f"len(regexp_extract_all({t}, '{WORD_PATTERN}'))"
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
    norm = F.regexp_replace(F.lower(t), C.WS_RUN_PATTERN, " ")
    return df.select(
        F.col(id_col),
        F.md5(t).alias("fp_md5"),
        F.md5(norm).alias("fp_norm_md5"),
        F.crc32(t.cast("binary")).alias("fp_crc32"),
    )


def doc_fingerprint_oracle_sql(table: str = "documents", id_col: str = "doc_id") -> str:
    t = "coalesce(text, '')"
    norm = f"regexp_replace(lower({t}), '{C.WS_RUN_PATTERN}', ' ', 'g')"
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
               unnest(regexp_extract_all(text, '{WORD_PATTERN}')) AS word
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
                       unnest(regexp_extract_all(text, '{WORD_PATTERN}')) AS word
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
# Script-class tiers, checked in order: (guess, char class, threshold).
# Kana first at a LOW threshold — Japanese text mixes han + kana, so any
# real kana share is decisive before the han tier claims it for zh.
_SCRIPT_TIERS = [
    ("ja", "[぀-ヿ]", 0.05),  # hiragana + katakana U+3040-30FF
    ("ko", "[가-힯]", 0.30),  # hangul syllables   U+AC00-D7AF
    ("zh", "[一-鿿]", 0.30),  # CJK unified han    U+4E00-9FFF
    ("he", "[֐-׿]", 0.30),  # hebrew             U+0590-05FF
    ("ar", "[؀-ۿ]", 0.30),  # arabic             U+0600-06FF
    ("hi", "[ऀ-ॿ]", 0.30),  # devanagari         U+0900-097F
]
# Cyrillic splits ru/uk on uk-specific letters (і ї є ґ — absent in ru)
_CYR_CLASS = "[Ѐ-ӿ]"
_UK_CLASS = "[іїєґІЇЄҐ]"
# Latin-script languages: ASCII stopword sets, dict order = tie-break
# priority (earlier language wins equal counts). Covers every latin-
# script language of the fallback model (core/model.py, 18 classes).
_STOPWORDS = {
    "en": "(the|and|of|to|is)",
    "de": "(der|die|und|ist|das)",
    "fr": "(le|la|les|et|est)",
    "es": "(el|los|las|es|y)",
    "it": "(il|che|di|per|non)",
    "pt": "(uma|para|mais|como|dos)",
    "nl": "(het|een|van|niet|zijn)",
    "pl": "(nie|jest|czy|tylko|bardzo)",
    "sv": "(och|att|det|som|inte)",
    "tr": "(bir|ve|bu|olarak|ama)",
}
_LATIN_LANGS = list(_STOPWORDS)


def lang_heuristic(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic tier covering all 18 fallback-model languages: script
    tiers (ja/ko/zh/he/ar/hi, ru-vs-uk cyrillic split) then a stopword
    argmax over the 10 latin-script languages. The decision chain is
    generated from ONE spec (_SCRIPT_TIERS/_STOPWORDS) that the DuckDB
    oracle builder below consumes too — the two engines cannot drift."""
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
    guess = None
    for lang, cls, thr in _SCRIPT_TIERS:
        cond = class_frac(cls) > thr
        guess = F.when(cond, lang) if guess is None else guess.when(cond, lang)
    guess = guess.when(
        class_frac(_CYR_CLASS) > 0.3,
        F.when(class_frac(_UK_CLASS) > 0, "uk").otherwise("ru"),
    )
    for i, lang in enumerate(_LATIN_LANGS):
        cond = sw[lang] > 0
        for other in _LATIN_LANGS[i + 1 :]:
            cond = cond & (sw[lang] >= sw[other])
        guess = guess.when(cond, lang)
    guess = guess.otherwise("und")
    return df.select(
        F.col(id_col),
        guess.alias("lang_guess"),
        *[sw[lang].alias(f"sw_{lang}") for lang in _LATIN_LANGS],
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
    whens = [
        f"WHEN {frac(cls)} > {thr} THEN '{lang}'"
        for lang, cls, thr in _SCRIPT_TIERS
    ]
    whens.append(
        f"WHEN {frac(_CYR_CLASS)} > 0.3 THEN "
        f"(CASE WHEN {frac(_UK_CLASS)} > 0 THEN 'uk' ELSE 'ru' END)"
    )
    for i, lang in enumerate(_LATIN_LANGS):
        conds = [f"{sw[lang]} > 0"] + [
            f"{sw[lang]} >= {sw[other]}" for other in _LATIN_LANGS[i + 1 :]
        ]
        whens.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case = "CASE\n             " + "\n             ".join(whens) + "\n             ELSE 'und' END"
    sw_cols = ",\n           ".join(f"{sw[lang]} AS sw_{lang}" for lang in _LATIN_LANGS)
    return f"""
    SELECT {id_col},
           {case} AS lang_guess,
           {sw_cols}
    FROM {table}
    """
