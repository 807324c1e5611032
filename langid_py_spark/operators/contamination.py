"""Benchmark-contamination scanning: multi-pattern substring search.

A web-scale training pipeline must drop documents containing evaluation
data (benchmark prompts, canary strings, held-out answers). Scanning T
bytes for N needles naively costs N passes (N regexes / N `contains`
exprs); this operator reuses the engine's core algorithmic asset — the
Aho-Corasick DFA that the langid tokenizer compiles
(core/scanner.py::build_dfa, re-derivation of saffsd/langid.py
``langid/train/scanner.py :: Scanner``) — to match EVERY needle in one
O(bytes) walk per document, with the same batched NumPy kernel the
scorer uses (core/model.py::dfa_feature_counts). The DFA arrays ride
the UDF closure (needle lists are small relative to the corpus; a
10^5-needle DFA is a few MB).

Semantics: byte-exact, case-sensitive, overlapping occurrences — n_hits
is the Aho-Corasick count; containment (n_hits > 0) is what matters for
decontamination and what the ANSI-SQL oracle checks (DuckDB
``instr(text, needle) > 0``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def contamination_scan(
    df: DataFrame,
    needles: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bytes: int | None = None,
) -> DataFrame:
    """(doc_id, needle, n_hits) for every document containing a needle.

    Plan: scan → one Arrow UDF walk per batch emitting the per-needle
    count vector → posexplode → filter n_hits > 0. Pure map until the
    (tiny) result — no shuffle, pushdown/pruning preserved.
    """
    if not needles:
        raise ValueError("empty needle list")
    if len(set(needles)) != len(needles):
        raise ValueError("duplicate needles")
    from langid_py_spark.core.model import dfa_feature_counts
    from langid_py_spark.core.scanner import build_dfa

    needle_bytes = [n.encode("utf-8", "surrogatepass") for n in needles]
    dfa = build_dfa(needle_bytes)
    nm = dfa.nextmove.astype(np.int64)  # int64 once: no per-step cast
    indptr, feats, nstates = dfa.out_indptr, dfa.out_feats, dfa.nstates
    n_needles = len(needles)

    @pandas_udf(T.ArrayType(T.LongType()))
    def _hits(texts: pd.Series) -> pd.Series:
        counts = dfa_feature_counts(
            nm, indptr, feats, nstates, n_needles,
            texts.fillna("").tolist(), max_bytes=max_bytes,
        ).astype(np.int64)
        return pd.Series(list(counts))

    needle_arr = F.array(*[F.lit(n) for n in needles])
    return (
        df.select(F.col(id_col), F.posexplode(_hits(F.col(text_col))).alias("pos", "n_hits"))
        .filter(F.col("n_hits") > 0)
        .select(
            F.col(id_col),
            F.element_at(needle_arr, F.col("pos") + 1).alias("needle"),
            "n_hits",
        )
    )


def contamination_oracle_sql(needles: list[str], table: str = "documents") -> str:
    """DuckDB containment twin: tiny needle VALUES list cross-checked
    with instr(). Counts are overlap-semantics (AC), not SQL-expressible
    — the oracle checks the (doc, needle) containment set."""
    vals = ", ".join("(" + "'" + n.replace("'", "''") + "')" for n in needles)
    return f"""
    SELECT d.doc_id, n.needle
    FROM {table} d JOIN (VALUES {vals}) AS n(needle)
      ON instr(d.text, n.needle) > 0
    """
