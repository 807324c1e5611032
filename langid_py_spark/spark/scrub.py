"""Deterministic PII/toxicity scrubbing as a Catalyst regexp_replace chain.

Ordered rule list frozen in ``config.SCRUB_RULES`` — rule i's output feeds
rule i+1, so the transformation is a pure function of the input string and
byte-exact reproducible (BASELINE.json::north_star). All patterns live in
the Java-regex ∩ RE2 ∩ Python-re common dialect (config.py docstring), so
the Spark column expression, the DuckDB oracle SQL, and the Python golden
oracle are the SAME function — verified on the full fixture in
tests/test_rules_scrub.py.

Catalyst-native (`regexp_replace`), zero UDFs: the whole chain runs inside
WholeStageCodegen in one pass per rule over the string.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from langid_py_spark import config as C

_ALL_RULES: list[tuple[str, str, str]] = list(C.SCRUB_RULES) + [
    ("tox", C.TOX_PATTERN, C.TOX_REPLACEMENT)
]


def scrub_expr(text: Column) -> Column:
    """text -> scrubbed text (chained regexp_replace, frozen order)."""
    out = F.coalesce(text, F.lit(""))
    for _name, pat, repl in _ALL_RULES:
        out = F.regexp_replace(out, pat, repl)
    return out


def with_scrubbed(df: DataFrame, text_col: str = "text", out_col: str = "scrubbed_text") -> DataFrame:
    return df.withColumn(out_col, scrub_expr(F.col(text_col)))


def duckdb_scrub_sql(text_expr: str = "text") -> str:
    """Equivalent DuckDB expression (regexp_replace with 'g' = replace-all,
    matching Spark's replace-all default)."""
    out = f"coalesce({text_expr}, '')"
    for _name, pat, repl in _ALL_RULES:
        p = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{repl}', 'g')"
    return out


_COMPILED = [(re.compile(pat), repl) for _n, pat, repl in _ALL_RULES]


def python_scrub_oracle(text: str | None) -> str:
    """Single-process golden oracle — same ordered chain via Python re."""
    out = text or ""
    for rx, repl in _COMPILED:
        out = rx.sub(repl, out)
    return out
