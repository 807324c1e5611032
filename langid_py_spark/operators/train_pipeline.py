"""The reference training pipeline re-expressed as Spark DataFrame jobs.

saffsd/langid.py's ``langid/train/`` is a hand-rolled disk-backed
map-reduce: multiprocessing pools over document chunks, features hashed
into 64 bucket directories, marshal spill files between stages
(train/tokenize.py, train/common.py::MapPool). Every one of those
boundaries is just a Spark shuffle (SURVEY.md §2 D6):

  reference stage                     here
  ---------------------------------   ----------------------------------
  index.py  CorpusIndexer             labeled DataFrame (lang, domain)
  tokenize.py bucket spill            explode n-grams -> shuffle by feature
  DFfeatureselect.py tally+select     groupBy(feature).count + window top-k
  IGweight.py (lang & domain)         pivot counts + entropy column math
  LDfeatureselect.py                  IG_lang ⋈ IG_domain (broadcast) - diff,
                                      window top-k per lang
  scanner.py                          driver-side DFA build (collect the
                                      final ~10^3 features - tiny)
  NBtrain.py                          groupBy(feature, lang).sum -> collect
                                      (F x C) matrix to driver

Scale note: token explosion is the heavy stage — 4 n-gram orders x
doc_bytes rows. The groupBys below are partial-aggregated map-side by
Catalyst, so shuffle volume is |distinct features| per partition, not
|tokens|. At 100 TB one would add a `.filter(df >= min_df)` pre-pass
(frequency pruning) before the IG stage — included here as `min_df`.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from langid_py_spark.core.model import NBModel
from langid_py_spark.core.scanner import build_dfa
from langid_py_spark.core.trainer import entropy


def explode_byte_ngrams(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_order: int = 4,
    extra_cols: tuple[str, ...] = ("lang", "source"),
) -> DataFrame:
    """(doc, feature, count) tokens — reference tokenize.py semantics
    (every byte n-gram of order 1..max_order), emitted via an Arrow-batched
    mapInPandas. Fully batch-vectorized (the core/lm.py concat-buffer
    pattern): all docs of a batch become ONE uint8 buffer; per order the
    n-gram keys are packed big-endian into a uint64 via lagged adds masked
    to full in-doc windows; per-(doc, gram) counts come from one np.unique
    over (doc_idx<<32 | key). Zero per-byte Python — the only Python-level
    work is proportional to the number of OUTPUT rows (hex slicing)."""
    if max_order > 4:
        raise ValueError("max_order > 4 would overflow the uint32 key packing")
    cols = [id_col, *extra_cols, text_col]
    schema = ", ".join(
        [f"{id_col} long"]
        + [f"{c} string" for c in extra_cols]
        + ["feature string", "count long"]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            B = len(b)
            if B == 0:
                continue
            datas = [(t or "").encode("utf-8") for t in b[text_col]]
            lens = np.fromiter((len(d) for d in datas), dtype=np.int64, count=B)
            total = int(lens.sum())
            if total == 0:
                continue
            buf = np.frombuffer(b"".join(datas), dtype=np.uint8).astype(np.uint64)
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            doc_idx = np.repeat(np.arange(B, dtype=np.uint64), lens)
            pos = np.arange(total, dtype=np.int64) - starts[doc_idx.astype(np.int64)]
            frames = []
            key = np.zeros(total, dtype=np.uint64)
            for order in range(1, max_order + 1):
                # big-endian packing: key at end-pos e = bytes[e-order+1..e],
                # oldest byte in the highest position — each step ORs the
                # next-older byte (lag m) into byte slot m
                m = order - 1
                lagged = np.zeros(total, dtype=np.uint64)
                if m:
                    lagged[m:] = buf[:-m]
                else:
                    lagged = buf
                key = key | (lagged << np.uint64(8 * m))
                valid = pos >= m
                combo = (doc_idx[valid] << np.uint64(32)) | (
                    key[valid] & np.uint64(0xFFFFFFFF)
                )
                uniq, cnt = np.unique(combo, return_counts=True)
                d = (uniq >> np.uint64(32)).astype(np.int64)
                k = (uniq & np.uint64(0xFFFFFFFF)).astype(np.uint32)
                # vectorized hex: big-endian 4-byte dump, keep last `order`
                # bytes of each key, hexlify the whole buffer, slice per row
                kb = k.astype(">u4").tobytes()
                hx = kb.hex()
                w = 8  # hex chars per uint32
                feats = [hx[i * w + (w - 2 * order) : (i + 1) * w] for i in range(len(k))]
                frame = pd.DataFrame(
                    {
                        id_col: b[id_col].to_numpy()[d],
                        "feature": feats,
                        "count": cnt.astype(np.int64),
                    }
                )
                for c in extra_cols:
                    frame[c] = b[c].to_numpy()[d]
                frames.append(frame[[id_col, *extra_cols, "feature", "count"]])
            yield pd.concat(frames, ignore_index=True)

    return df.select(*cols).mapInPandas(run, schema=schema)


def df_feature_select(
    tokens: DataFrame, candidates_per_order: int = 400, id_col: str = "doc_id"
) -> DataFrame:
    """DFfeatureselect: document frequency tally + top-k per n-gram order.
    feature is hex-encoded, so order = length/2. Deterministic tie-break."""
    tally = tokens.select(id_col, "feature").distinct().groupBy("feature").agg(
        F.count("*").alias("df")
    )
    tally = tally.withColumn("ord", (F.length("feature") / 2).cast("long"))
    w = Window.partitionBy("ord").orderBy(F.desc("df"), F.asc("feature"))
    return (
        tally.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= candidates_per_order)
        .select("feature", "ord", "df", "rk")
    )


def ig_weights(
    tokens: DataFrame,
    docs: DataFrame,
    label_col: str,
    candidates: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """IGweight: information gain of feature PRESENCE w.r.t. `label_col`
    (lang or domain), computed with DataFrame aggregations only.

    IG(f) = H(C) - [P(f) H(C|f) + P(!f) H(C|!f)], entropies from
    per-(feature,label) distinct-doc counts vs global label counts.
    The candidate set is broadcast (small by construction: top-k/order).

    Flat-aggregation form (no collect_list / higher-order functions —
    HOFs are CodegenFallback and drag the whole Project into interpreted
    eval, per CLAUDE.md): materialize the dense (candidate × label) grid
    (tiny: top-k features × |labels|), left-join presence counts, and use
    the identity  Σ_l -(c_l/n) log2(c_l/n) = log2(n) - (Σ_l c_l log2 c_l)/n
    so both conditional entropies reduce to plain groupBy sums.
    """
    n_docs_total = docs.count()
    label_counts = docs.groupBy(label_col).agg(F.count("*").alias("n_label"))

    present = (
        tokens.join(F.broadcast(candidates.select("feature")), "feature", "left_semi")
        .select("feature", id_col, label_col)
        .distinct()
        .groupBy("feature", label_col)
        .agg(F.count("*").alias("n_fl"))
    )
    grid = candidates.select("feature").crossJoin(F.broadcast(label_counts))
    g = grid.join(present, ["feature", label_col], "left").fillna(0, subset=["n_fl"])

    xlogx = lambda c: F.when(c > 0, c * F.log2(c)).otherwise(F.lit(0.0))  # noqa: E731
    nfl = F.col("n_fl").cast("double")
    absent = (F.col("n_label") - F.col("n_fl")).cast("double")
    per_feature = g.groupBy("feature").agg(
        F.sum(nfl).alias("n_f"),
        F.sum(xlogx(nfl)).alias("s_p"),
        F.sum(xlogx(absent)).alias("s_a"),
    )

    totals = {r[label_col]: r["n_label"] for r in label_counts.collect()}
    h_c = entropy(np.array(list(totals.values()), dtype=np.float64))
    n_tot = F.lit(float(n_docs_total))
    n_f = F.col("n_f")
    n_a = n_tot - n_f
    h_cond_present = F.when(
        n_f > 0, F.log2(n_f) - F.col("s_p") / n_f
    ).otherwise(F.lit(0.0))
    h_cond_absent = F.when(
        n_a > 0, F.log2(n_a) - F.col("s_a") / n_a
    ).otherwise(F.lit(0.0))
    ig = F.lit(h_c) - (n_f / n_tot) * h_cond_present - (n_a / n_tot) * h_cond_absent
    return (
        per_feature.filter(n_f > 0)  # same contract as before: only
        .select("feature", F.round(ig, 10).alias("ig"))  # present features
    )


def ld_feature_select(
    ig_lang: DataFrame, ig_domain: DataFrame, tokens_by_lang: DataFrame, feats_per_lang: int = 100
) -> DataFrame:
    """LDfeatureselect: LD = IG_lang - IG_domain (broadcast join J2),
    then top-k per language among features present in that language."""
    ld = ig_lang.alias("l").join(
        F.broadcast(ig_domain.alias("d")), "feature", "inner"
    ).select("feature", (F.col("l.ig") - F.col("d.ig")).alias("ld"))
    per_lang = tokens_by_lang.select("feature", "lang").distinct().join(ld, "feature")
    w = Window.partitionBy("lang").orderBy(F.desc("ld"), F.asc("feature"))
    return (
        per_lang.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= feats_per_lang)
        .select("feature", "lang", "ld", "rk")
    )


def nb_sufficient_stats(tokens: DataFrame, selected: DataFrame) -> DataFrame:
    """NBtrain A3: per-(feature, lang) term counts, restricted to the
    selected feature set (left-semi broadcast join J3)."""
    return (
        tokens.join(F.broadcast(selected.select("feature").distinct()), "feature", "left_semi")
        .groupBy("feature", "lang")
        .agg(F.sum("count").alias("n"))
    )


def train_nb_on_spark(
    docs: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    domain_col: str = "source",
    id_col: str = "doc_id",
    candidates_per_order: int = 300,
    feats_per_lang: int = 80,
    max_order: int = 4,
) -> NBModel:
    """End-to-end Spark training (reference train.py driver): returns an
    NBModel whose DFA/matrices are built on the driver from collected
    sufficient statistics (F x C is tiny; the data-sized work is all
    distributed)."""
    tokens = explode_byte_ngrams(
        docs, text_col=text_col, id_col=id_col, max_order=max_order,
        extra_cols=(lang_col, domain_col),
    ).cache()
    cand = df_feature_select(tokens, candidates_per_order, id_col=id_col).cache()
    igl = ig_weights(tokens, docs, lang_col, cand, id_col=id_col)
    igd = ig_weights(tokens, docs, domain_col, cand, id_col=id_col)
    sel = ld_feature_select(igl, igd, tokens, feats_per_lang)
    stats = nb_sufficient_stats(tokens, sel).collect()
    doc_counts = {
        r[lang_col]: r["n"] for r in docs.groupBy(lang_col).agg(F.count("*").alias("n")).collect()
    }
    tokens.unpersist()

    features = sorted({bytes.fromhex(r["feature"]) for r in stats})
    classes = sorted(doc_counts)
    fidx = {f.hex(): i for i, f in enumerate(features)}
    cidx = {c: i for i, c in enumerate(classes)}
    tc = np.zeros((len(features), len(classes)), dtype=np.float64)
    for r in stats:
        tc[fidx[r["feature"]], cidx[r["lang"]]] += r["n"]
    ptc = np.log((tc + 1.0) / (tc + 1.0).sum(axis=0, keepdims=True))
    dc = np.array([doc_counts[c] for c in classes], dtype=np.float64)
    pc = np.log(dc / dc.sum())
    dfa = build_dfa(features)
    return NBModel.from_dfa(dfa, nb_ptc=ptc, nb_pc=pc, classes=classes, features=features)
