"""Sub-document exact substring deduplication (Lee et al. 2021,
"Deduplicating Training Data Makes Language Models Better" — the
ExactSubstr pass every modern corpus pipeline runs beside doc-level
dedup).

Doc-level dedup (exact + near-dup clusters, operators/dedup.py and
cluster.py) removes whole duplicate documents; it cannot find repeated
SPANS inside otherwise-unique documents — boilerplate headers, license
blocks, navigation chrome shared across a site. This module emits, per
document, the maximal merged character spans covered by k-grams that
occur at least twice in the corpus (cross-document or repeated within
one document — both are training-data repetition), as
(doc_id, span_start, span_end, n_grams) with 0-based [start, end) char
offsets. Dropping or cutting the spans is the caller's policy knob
(Lee et al. cut all copies; some pipelines keep one).

Two paths, same semantics:

* substring_dup_spans — EXACT: every char position contributes its
  k-gram. 100% Catalyst (sequence → explode → substring → two window
  counts → gaps-and-islands merge), zero Python. The corpus-scale
  shuffle carries (id, pos, xxhash64) — 8-byte gram keys, not k-char
  strings; the exact-string recount that makes the result collision-
  proof runs only on the (rare) candidate positions, mirroring the
  repo's fingerprint→verify discipline. Honest cost: one shuffled row
  PER CHARACTER POSITION — the same O(total bytes) work as Lee et
  al.'s suffix array, distributed. Right after doc-level dedup +
  quality filters have cut the corpus; for raw 100 TB crawl input use
  the winnowed path.
* substring_dup_spans_winnowed — SCALE path: only winnowing-selected
  anchor positions (content-defined, Schleimer et al. 2003 — both
  copies of a duplicated substring select the SAME anchors, which
  stride sampling cannot guarantee) enter the shuffle, ~2/(window+1)
  the rows. Detection guarantee: any duplicated span of length
  >= k + window - 1 chars shares at least one anchor k-gram; reported
  boundaries are anchor-extent, i.e. conservative-inner by up to
  window-1 chars per side (property-tested against the exact path).
  Anchors are verified by exact gram string like the exact path — a
  hash can only cost a candidate, never emit a wrong anchor.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def _merge_spans(flagged: DataFrame, gap: int, k: int, id_col: str) -> DataFrame:
    """Gaps-and-islands merge of flagged k-gram start positions into
    maximal spans: consecutive positions <= gap apart merge (all
    intervals are length k, so ascending starts make the running
    interval end monotone — a lag compare is exact, no running max
    needed)."""
    w_doc = Window.partitionBy(id_col).orderBy("pos")
    brk = F.when(F.col("pos") - F.lag("pos").over(w_doc) <= gap, 0).otherwise(1)
    grp = F.sum(brk).over(
        w_doc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        flagged.withColumn("_g", grp)
        .groupBy(id_col, "_g")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + k).cast("long").alias("span_end"),
            F.count("*").alias("n_grams"),
        )
        .drop("_g")
    )


def substring_dup_spans(
    df: DataFrame,
    k: int = 30,
    text_col: str = "text",
    id_col: str = "doc_id",
    hot_threshold: int | None = 100_000,
    hot_sample: int = 64,
) -> DataFrame:
    """(doc_id, span_start, span_end, n_grams): maximal merged char
    spans covered by k-grams occurring >= 2 times in the corpus.

    Plan: scan → sequence/explode to (id, pos) with an 8-byte
    xxhash64(gram) key → window-count over the hash (ONE corpus-scale
    shuffle; the groupBy+join alternative measured 2.40 s vs 1.63 s
    for this at sf0.1/32 cores — the second position-table shuffle
    costs more than the window's sort)
    → candidates re-join their text BY ID (candidate-scale) → exact
    recount over the gram STRING (collision-proof: a 64-bit collision
    only costs a candidate row, the string recount drops it) →
    gaps-and-islands merge per doc. All Catalyst; no UDF anywhere.

    Per-row memory note: sequence() materializes one int array per doc
    (length = chars - k + 1); pipeline docs are length-capped upstream
    (rules tier), so this is bounded — a 1M-char doc costs an ~8 MB
    transient array, the practical per-doc ceiling.

    Hot-gram guard (r06, closing VERDICT r05's one named scale-killer):
    both windows here partition on a gram key, and a SATURATED gram (a
    license line k-gram repeated 10^8 times across a crawl) would make
    one multi-GB sort task that AQE cannot split. Keys above
    `hot_threshold` (found by dedup.hot_keys — sampled, partial-agg,
    skew-proof) are routed around both windows:

    * hot-hash positions skip the count window outright — a sampled
      count >= 2 proves the true count >= 2, which is all the window
      established;
    * their collision-proof string verify runs as groupBy(gram) hash
      agg (map-side combine — unskewable) + join of the tiny >= 2 gram
      list back onto the positions (AQE broadcasts it), instead of the
      gram window;
    * tail windows then have partitions bounded by ~hot_threshold (a
      gram string's count can never exceed its 64-bit hash's count).

    Output is IDENTICAL with the guard on or off (routing only moves
    keys between two formulations of the same count-and-verify), so a
    sampling false positive costs a plan change, never a row.
    hot_threshold=None restores the unguarded two-window plan.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    t = F.coalesce(F.col(text_col), F.lit(""))
    pos_hash = (
        df.select(F.col(id_col), t.alias("_t"))
        .filter(F.length("_t") >= k)
        .select(
            id_col,
            F.explode(F.sequence(F.lit(0), F.length("_t") - k)).alias("pos"),
            "_t",
        )
        .select(
            id_col,
            "pos",
            F.xxhash64(F.substring("_t", F.col("pos") + 1, k)).alias("ghash"),
        )
    )
    docs_txt = df.select(F.col(id_col), t.alias("_t"))
    w_hash = Window.partitionBy("ghash")
    # Verify window partitions by (ghash, gram), NOT gram alone (r07,
    # guide §2.4 "share one exchange"): equal gram strings always have
    # equal ghash (= xxhash64(gram)), so the counts are IDENTICAL — but
    # candidates leave the count window hash-partitioned by ghash, and
    # HashPartitioning(ghash) satisfies the (ghash, gram) clustering
    # requirement, so Spark inserts only a partition-local sort instead
    # of re-shuffling every candidate's k-char gram string (the one
    # candidate-scale exchange this operator had). Requires `cand` to
    # carry ghash through the broadcast text re-join.
    w_gram = Window.partitionBy("ghash", "gram")

    def _verify_window(cand: DataFrame) -> DataFrame:
        return (
            cand.join(docs_txt, id_col)
            .select(
                id_col,
                "pos",
                "ghash",
                F.substring("_t", F.col("pos") + 1, k).alias("gram"),
            )
            .withColumn("_n", F.count("*").over(w_gram))
            .filter(F.col("_n") >= 2)
            .select(id_col, "pos")
        )

    def _unguarded() -> DataFrame:
        cand = (
            pos_hash.withColumn("_n", F.count("*").over(w_hash))
            .filter(F.col("_n") >= 2)
            .select(id_col, "pos", "ghash")
        )
        return _merge_spans(_verify_window(cand), gap=k, k=k, id_col=id_col)

    if hot_threshold is None:
        return _unguarded()
    # persist + driver short-circuit: the guarded plan reads pos_hash
    # from several branches; with no hot key (the common case) we pay
    # only the sampled pre-count + one cache pass, then run the plain
    # single-window plan. LRU-evicted; at 10^12 positions checkpoint
    # the position table instead. (r07 re-measured the precount-first/
    # persist-only-when-hot alternative: LOST, 3.95 vs 5.79 s median at
    # sf1 interleaved — recomputing the explode inside the window job
    # costs more than the cache round trip, so persist-first stays.)
    from pyspark import StorageLevel

    from langid_py_spark.operators.dedup import collect_hot_keys

    pos_hash = pos_hash.persist(StorageLevel.MEMORY_AND_DISK)
    hot_list = collect_hot_keys(
        pos_hash, "ghash", hot_threshold, [id_col, "pos"], hot_sample
    )
    if not hot_list:
        return _unguarded()
    spark = df.sparkSession
    hot = F.broadcast(
        spark.createDataFrame([(h,) for h in hot_list], "ghash long")
    )
    cand_tail = (
        pos_hash.join(hot, "ghash", "left_anti")
        .withColumn("_n", F.count("*").over(w_hash))
        .filter(F.col("_n") >= 2)
        .select(id_col, "pos", "ghash")
    )
    hot_grams = (
        pos_hash.join(hot, "ghash")
        .join(docs_txt, id_col)
        .select(id_col, "pos", F.substring("_t", F.col("pos") + 1, k).alias("gram"))
    )
    dup_grams = (
        hot_grams.groupBy("gram")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") >= 2)
        .select("gram")
    )
    flagged_hot = hot_grams.join(dup_grams, "gram").select(id_col, "pos")
    flagged = _verify_window(cand_tail).unionByName(flagged_hot)
    return _merge_spans(flagged, gap=k, k=k, id_col=id_col)


def substring_dup_spans_oracle_sql(
    k: int = 30, table: str = "documents", id_col: str = "doc_id"
) -> str:
    """DuckDB twin — an entirely independent computation path: exact
    gram STRINGS from position one (no hashes anywhere), the same
    window-count + gaps-and-islands merge in SQL. 1-based substring
    offsets converted to the operator's 0-based [start, end)."""
    return f"""
    WITH base AS (SELECT {id_col}, coalesce(text, '') AS t FROM {table}),
    p0 AS (
        SELECT {id_col}, t,
               unnest(range(1, greatest(length(t) - {k} + 2, 1))) AS i
        FROM base
    ),
    pos AS (
        SELECT {id_col}, CAST(i AS BIGINT) AS i, substring(t, i, {k}) AS gram
        FROM p0
    ),
    flagged AS (
        SELECT {id_col}, i FROM (
            SELECT {id_col}, i, count(*) OVER (PARTITION BY gram) AS n
            FROM pos
        ) WHERE n >= 2
    ),
    isl AS (
        SELECT {id_col}, i,
               CASE WHEN i - lag(i) OVER (PARTITION BY {id_col} ORDER BY i)
                         <= {k}
                    THEN 0 ELSE 1 END AS brk
        FROM flagged
    ),
    grp AS (
        SELECT {id_col}, i,
               sum(brk) OVER (PARTITION BY {id_col} ORDER BY i) AS g
        FROM isl
    )
    SELECT {id_col},
           CAST(min(i) - 1 AS BIGINT) AS span_start,
           CAST(max(i) - 1 + {k} AS BIGINT) AS span_end,
           count(*) AS n_grams
    FROM grp GROUP BY {id_col}, g
    """


def cut_spans_oracle_sql(
    k: int = 30, table: str = "documents", id_col: str = "doc_id"
) -> str:
    """DuckDB twin of cut_spans(df, substring_dup_spans(df, k)): the
    span CTE (independent string-ops path) + an ordered string_agg
    splice — segment before each span via lag(span_end), tail after the
    last span; span-free docs pass through by LEFT JOIN."""
    return f"""
    WITH spans AS ({substring_dup_spans_oracle_sql(k=k, table=table, id_col=id_col)}),
    base AS (SELECT {id_col}, coalesce(text, '') AS t FROM {table}),
    seg AS (
        SELECT {id_col}, span_start, span_end,
               lag(span_end, 1, 0) OVER (
                   PARTITION BY {id_col} ORDER BY span_start
               ) AS prev_end
        FROM spans
    ),
    spliced AS (
        SELECT s.{id_col},
               string_agg(
                   substring(b.t, CAST(s.prev_end + 1 AS BIGINT),
                             CAST(s.span_start - s.prev_end AS BIGINT)),
                   '' ORDER BY s.span_start
               ) AS head,
               max(s.span_end) AS last_end
        FROM seg s JOIN base b USING ({id_col})
        GROUP BY s.{id_col}
    )
    SELECT b.{id_col},
           CASE WHEN sp.{id_col} IS NULL THEN b.t
                ELSE sp.head || substring(b.t, CAST(sp.last_end + 1 AS BIGINT))
           END AS text
    FROM base b LEFT JOIN spliced sp USING ({id_col})
    """


def _codepoints_batch(texts: list) -> tuple[np.ndarray, np.ndarray]:
    """Concat-buffer of CODEPOINT values (utf-32 decode — vectorized,
    no per-char Python) so positions are CHAR offsets, matching the
    exact path's substring() semantics."""
    B = len(texts)
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=B)
    buf = np.frombuffer(
        "".join(texts).encode("utf-32-le"), dtype=np.uint32
    ).astype(np.uint64)
    return buf, lens


def _winnow_anchor_positions(
    hashes: np.ndarray, counts: np.ndarray, window: int
) -> list[np.ndarray]:
    """Per-doc winnowing-selected POSITIONS (k-gram start indices): the
    rightmost-min position of every w-window of consecutive k-gram
    hashes, deduplicated. Same lagged-minimum pattern as dedup.py::
    _window_min_batch but carrying the argmin index. Docs with < window
    hashes contribute their single min position."""
    B = len(counts)
    total = int(counts.sum())
    seg = np.concatenate(([0], np.cumsum(counts)[:-1]))
    doc_of = np.repeat(np.arange(B), counts)
    pos = np.arange(total, dtype=np.int64) - seg[doc_of]
    orig = np.arange(total, dtype=np.int64)
    mval = hashes.copy()
    midx = orig.copy()
    big = np.uint64(0xFFFFFFFFFFFFFFFF)
    for lag in range(1, window):
        # candidate = the RAW hash (and its ORIGINAL index) `lag` back;
        # shifting the running argmin instead would compare windows
        # against windows and corrupt the index (caught by the
        # window-coverage property test)
        lv = np.empty_like(hashes)
        lv[:lag] = big
        lv[lag:] = hashes[:-lag]
        li = np.empty_like(midx)
        li[:lag] = -1
        li[lag:] = orig[:-lag]
        take = lv < mval  # strict: ties keep the RIGHTMOST (current) min
        mval = np.where(take, lv, mval)
        midx = np.where(take, li, midx)
    valid = pos >= window - 1
    out: list[np.ndarray] = []
    for i in range(B):
        a, b = seg[i], seg[i] + counts[i]
        sel = midx[a:b][valid[a:b]]
        if len(sel) == 0:
            sel = np.array([a + int(np.argmin(hashes[a:b]))], dtype=np.int64)
        out.append(np.unique(sel) - a)
    return out


def winnow_anchors_udf(k: int, window: int):
    """text -> sorted distinct anchor CHAR positions (array<long>)."""
    from langid_py_spark.operators.dedup import (
        _FNV_OFFSET,
        _FNV_PRIME,
        _rolling_hashes_batch,
    )

    @pandas_udf(T.ArrayType(T.LongType()))
    def _anchors(texts: pd.Series) -> pd.Series:
        B = len(texts)
        if B == 0:
            return pd.Series([], dtype=object)
        tl = texts.fillna("").tolist()
        buf, lens = _codepoints_batch(tl)
        grams, counts = _rolling_hashes_batch(
            buf, lens, k, _FNV_PRIME, _FNV_OFFSET
        )
        sel = _winnow_anchor_positions(grams, counts, window)
        # docs shorter than k chars have no full k-gram: no anchors
        # (the kernel emits one partial/sentinel hash for them)
        return pd.Series(
            [
                s if lens[i] >= k else np.empty(0, dtype=np.int64)
                for i, s in enumerate(sel)
            ]
        )

    return _anchors


def substring_dup_spans_winnowed(
    df: DataFrame,
    k: int = 30,
    window: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    hot_threshold: int | None = 100_000,
    hot_sample: int = 64,
) -> DataFrame:
    """The 100 TB path: same contract as substring_dup_spans, but only
    winnowing anchor positions (content-defined — identical in every
    copy of a duplicated region) enter the corpus-scale shuffle:
    ~2/(window+1) of the positions, and the guarantee that any
    duplicated span >= k + window - 1 chars is detected. Reported
    boundaries are anchor extents — conservative-inner by up to
    window-1 chars per side vs the exact path (tests pin both the
    subset relation and the planted-boilerplate recall).

    Plan: anchor UDF (concat-buffer kernel) → posexplode →
    substring(text, anchor+1, k) gram EXTRACTED JVM-SIDE while text is
    still in the row (no re-join needed: anchors are pre-thinned, so
    carrying the k-char gram costs ~2k/(window+1) bytes per doc char —
    less than the exact path's 8-byte-per-position hash for typical
    window=8/k=30) → ONE window-count over the exact gram string →
    merge with gap k + window (anchors inside one duplicated region
    are at most window apart).

    Hot-anchor guard (r06): a mega-duplicated region selects the SAME
    anchors in every copy, so its anchor grams concentrate exactly like
    the exact path's hashes. Anchor grams above `hot_threshold` flag
    directly through a broadcast join (they are exact STRINGS here —
    a sampled count >= 2 proves duplication, no verify stage exists to
    skip); the tail window's partitions stay bounded. Identical output
    with the guard on or off; None disables."""
    if k < 2:
        raise ValueError("k must be >= 2")
    if window < 1:
        raise ValueError("window must be >= 1")
    anchors = winnow_anchors_udf(k, window)
    t = F.coalesce(F.col(text_col), F.lit(""))
    grams = (
        df.select(F.col(id_col), t.alias("_t"))
        .select(
            id_col, "_t", F.explode(anchors(F.col("_t"))).alias("pos")
        )
        .select(
            id_col, "pos", F.substring("_t", F.col("pos") + 1, k).alias("gram")
        )
    )

    def _window_flagged(g: DataFrame) -> DataFrame:
        return (
            g.withColumn("_n", F.count("*").over(Window.partitionBy("gram")))
            .filter(F.col("_n") >= 2)
            .select(id_col, "pos")
        )

    if hot_threshold is None:
        return _merge_spans(_window_flagged(grams), gap=k + window, k=k, id_col=id_col)
    # persist: re-running the anchor UDF per guarded branch would be the
    # expensive recompute here; short-circuit keeps the no-hot case one
    # window plan (see substring_dup_spans)
    from pyspark import StorageLevel

    from langid_py_spark.operators.dedup import collect_hot_keys

    grams = grams.persist(StorageLevel.MEMORY_AND_DISK)
    hot_list = collect_hot_keys(
        grams, "gram", hot_threshold, [id_col, "pos"], hot_sample
    )
    if not hot_list:
        flagged = _window_flagged(grams)
    else:
        spark = df.sparkSession
        hot = F.broadcast(
            spark.createDataFrame([(g,) for g in hot_list], "gram string")
        )
        flagged = _window_flagged(
            grams.join(hot, "gram", "left_anti")
        ).unionByName(grams.join(hot, "gram").select(id_col, "pos"))
    return _merge_spans(flagged, gap=k + window, k=k, id_col=id_col)


def cut_spans(
    df: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a span drop list: remove every [span_start, span_end) slice
    from each document's text (the Lee et al. 'cut all copies' policy),
    keeping all other columns. Spans per doc are few (merged), so the
    per-doc aggregation is a slim groupBy on the span table followed by
    one join; the cut itself is a vectorized-enough aggregate expression
    over the collected span structs (bounded per doc)."""
    per_doc = spans.groupBy(id_col).agg(
        F.sort_array(
            F.collect_list(F.struct("span_start", "span_end"))
        ).alias("_spans")
    )
    t = F.coalesce(F.col(text_col), F.lit(""))
    # A Catalyst fold (F.aggregate over the span array) would be the
    # zero-Python path, but string splicing via HOF lambdas lands in
    # CodegenFallback (the measured perf trap in CLAUDE.md) — a tiny
    # Arrow UDF over the (bounded, merged) span list is faster AND
    # clearer; per-doc span counts are small by construction.
    @pandas_udf(T.StringType())
    def _cut(texts: pd.Series, span_lists: pd.Series) -> pd.Series:
        out = []
        for txt, sl in zip(texts, span_lists):
            txt = txt or ""
            if sl is None or len(sl) == 0:
                out.append(txt)
                continue
            pieces, prev = [], 0
            for s in sl:  # sorted ascending, disjoint by merge
                pieces.append(txt[prev : s["span_start"]])
                prev = s["span_end"]
            pieces.append(txt[prev:])
            out.append("".join(pieces))
        return pd.Series(out)

    return (
        df.join(per_doc, id_col, "left")
        .withColumn(text_col, _cut(t, F.col("_spans")))
        .drop("_spans")
    )
