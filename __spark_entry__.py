"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship quality-filter pipeline on the sf0.001
                 transcript fixture (deterministic, self-generated).
queries()      — one entry per implemented operator (SURVEY.md §2 +
                 training-data ops); each callable (spark, sf_dir) -> DF.
oracle_sql()   — DuckDB-checkable SQL for EVERY query (driver cross-checks
                 row count + schema + value hash at sf0.01). SQL-expressible
                 ops get an ANSI-SQL twin over the shared parquet tables;
                 UDF-scored ops (langid, perplexity, minhash, simhash,
                 SRP-ANN, media decode, byte-ngram DF) get golden-parquet
                 oracles pre-computed WITHOUT Spark by scripts/
                 make_golden.py (NumPy cores + pandas twins of the
                 DataFrame logic), read back via read_parquet().

Column names are aliased identically on both sides; float columns are
rounded to 6 (money 2/4) decimals on both sides so value hashes match.
"""

from __future__ import annotations

from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from langid_py_spark import config as C
from langid_py_spark.operators import (
    contamination,
    corpus_pipeline as corpus_pipeline_mod,
    dedup,
    embedding as embedding_mod,
    lm_train,
    packing,
    quality_classifier,
    repetition,
    sampling,
    semdedup as semdedup_mod,
    similarity,
    spandedup,
    textstats,
)
from langid_py_spark.spark.rules import duckdb_rule_sql, rule_columns
from langid_py_spark.spark.scrub import duckdb_scrub_sql, scrub_expr


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _estimate_scan_tasks(spark: SparkSession, df: DataFrame) -> int | None:
    """Upper bound on the scan's non-empty task count from CATALOG facts
    (file sizes + parquet row-group counts via local metadata), not from
    df.rdd — the RDD conversion materializes a Python-RDD plan on the
    driver per call (VERDICT r03 nit). Mirrors Spark's FilePartition
    sizing: maxSplitBytes = min(maxPartitionBytes, max(openCostInBytes,
    totalBytes / defaultParallelism)); a parquet file additionally cannot
    split below a row group. Returns None when the files are not local /
    stat-able (a real cluster against an object store) — callers treat
    that as 'plenty of splits', making the helper a guaranteed no-op at
    production scale."""
    import os
    from urllib.parse import urlparse

    files = df.inputFiles()
    if not files:
        return None
    sizes, row_groups = [], 0
    try:
        import pyarrow.parquet as pq

        for uri in files:
            u = urlparse(uri)
            if u.scheme not in ("file", ""):
                return None
            path = u.path
            sizes.append(os.stat(path).st_size)
            row_groups += pq.ParquetFile(path).metadata.num_row_groups
    except Exception:
        # advisory-only helper: a corrupt footer (pyarrow ArrowInvalid),
        # permission error, or anything else degrades to "plenty of
        # splits" rather than crashing the query (ADVICE r04)
        return None
    def _bytes_conf(key: str, default: int) -> int:
        # conf values arrive as "134217728b", "128m", "2m", "1g", ...
        v = str(spark.conf.get(key, str(default))).strip().lower().removesuffix("b")
        mult = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}.get(v[-1:], 1)
        try:
            return int(float(v[:-1]) * mult) if mult != 1 else int(v)
        except ValueError:
            return default

    max_part = _bytes_conf("spark.sql.files.maxPartitionBytes", 128 << 20)
    open_cost = _bytes_conf("spark.sql.files.openCostInBytes", 4 << 20)
    total = sum(sizes)
    p = spark.sparkContext.defaultParallelism
    max_split = min(max_part, max(open_cost, total // max(p, 1) + 1))
    byte_splits = sum(-(-s // max_split) for s in sizes)
    return min(byte_splits, row_groups)


def _spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Rebalance a scan BEFORE a compute-heavy Arrow-UDF stage when the
    source has fewer splits than cores. The sf fixtures are single-row-
    group parquet files — Spark cannot split below a row group, so a
    heavy UDF over them runs as ONE task on one core (measured: the whole
    r02 'langid_score regression' was this single task landing on cold
    Python workers, paying the ~0.6 s first-allocation cost of the
    (B x nfeats) score matrices per run). At 100 TB the scan already has
    thousands of splits — or lives on an object store, where the split
    probe returns None — and this is a no-op; the condition, not the
    shuffle, is the scale story."""
    analyzed = df._jdf.queryExecution().analyzed().toString()
    if any(
        node in analyzed
        for node in ("Repartition", "Join", "Aggregate", "Sort", "Window")
    ):
        return df  # not a narrow scan: something already sized/spread it
    p = spark.sparkContext.defaultParallelism
    est = _estimate_scan_tasks(spark, df)
    if est is not None and est < p:
        df = df.repartition(p)
    return df


# --------------------------------------------------------------- entry
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full langid + quality-filter pipeline, sf0.001 fixture."""
    from langid_py_spark.fixtures.transcripts import ensure_transcripts
    from langid_py_spark.spark.pipeline import full_pipeline

    path = ensure_transcripts(spark, 0.001)
    return full_pipeline(spark.read.parquet(path))


# ------------------------------------------------------------- queries
def q_rules_keepdrop(spark: SparkSession, sf_dir: str) -> DataFrame:
    # _spread: the rule block is ~7 regexp passes of pure JVM work and the
    # fixture is a single-row-group parquet file — without the rebalance
    # the whole corpus regexes on ONE core (measured sf1: 2.91 s -> 0.87 s
    # at local[32]); at production split counts _spread is a no-op.
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    cols = rule_columns(F.col("text"))
    out = docs.select("doc_id", *[c.alias(n) for n, c in cols.items()])
    keep = F.lit(True)
    for n in C.RULE_NAMES:
        keep = keep & ~F.col(n)
    return out.withColumn("keep_heuristic", keep)


def q_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    # _spread: six chained regexp_replace rewrites, single-split scan —
    # same serialization trap as q_rules_keepdrop (guide §2: the fix is
    # parallelism, not the expression).
    return _spread(spark, _t(spark, sf_dir, "documents")).select(
        "doc_id", scrub_expr(F.col("text")).alias("scrubbed_text")
    )


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # _spread on the regex/UDF-heavy document queries (r07): the fixture
    # is a single-row-group parquet file, so without the rebalance the
    # whole corpus's per-row work runs on ONE core (measured pattern —
    # see q_rules_keepdrop); no-op at production split counts.
    return textstats.token_stats(_spread(spark, _t(spark, sf_dir, "documents")))


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.doc_fingerprint(
        _spread(spark, _t(spark, sf_dir, "documents"))
    ).select("doc_id", "fp_md5", "fp_norm_md5")


def q_lang_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheap Catalyst-only language guess (charset fractions + stopword
    hits) — the pre-filter tier that runs BEFORE the NB model at scale."""
    return textstats.lang_heuristic(_spread(spark, _t(spark, sf_dir, "documents")))


def q_word_df_tally(spark: SparkSession, sf_dir: str) -> DataFrame:
    # _spread: the tokenize/explode/distinct map side of the tally is
    # corpus-scale JVM work that serializes on the fixture's single
    # row group (the substring_dup_spans precedent).
    return textstats.word_df_tally(_spread(spark, _t(spark, sf_dir, "documents")))


def q_topk_words_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.topk_words_per_group(
        _spread(spark, _t(spark, sf_dir, "documents")), group_col="lang", k=5
    )


def q_topk_words_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.topk_words_per_group(
        _spread(spark, _t(spark, sf_dir, "documents")), group_col="source", k=3
    )


def q_exact_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups over a SELF-DUPLICATED input (documents
    UNION ALL documents): the raw fixture has zero byte-identical texts,
    which made this driver check a vacuous 0 == 0 in rounds 1-2 — the
    union makes every text a real group (n_dups >= 2) so the value hash
    carries rows. The operator itself is unchanged; dedup_survivors still
    runs it over the raw table."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.exact_dedup_groups(docs.unionByName(docs))


def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup_keep(_t(spark, sf_dir, "documents")).select("doc_id")


def q_prefix_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-fingerprint near-dup groups: md5 of the first 40 chars.
    A cheap first-pass near-dup heuristic (boilerplate/template detection)
    AND the non-vacuous twin of exact_dedup_groups — the sf0.01 fixture has
    no byte-identical docs but 23 shared-prefix groups, so this check has
    real rows behind it."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy(
            F.md5(F.substring(F.coalesce(F.col("text"), F.lit("")), 1, 40)).alias(
                "prefix_hash"
            )
        )
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("keep_id"))
        .filter(F.col("n_dups") > 1)
    )


def _line_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-structured corpus derived from the shared table (the fixture
    documents contain no newlines, which would make a line-dedup check
    vacuous): doc i = text_i + '\\n' + text_{i+1}, so every interior
    text appears as a line in TWO synthetic docs — real cross-document
    line duplication with non-trivial first-occurrence semantics,
    constructible identically in the SQL twin."""
    docs = _t(spark, sf_dir, "documents")
    a = docs.select(F.col("doc_id"), F.col("text").alias("_ta"))
    b = docs.select((F.col("doc_id") - 1).alias("doc_id"), F.col("text").alias("_tb"))
    return a.join(b, "doc_id").select(
        "doc_id", F.concat("_ta", F.lit("\n"), "_tb").alias("text")
    )


_LINE_CORPUS_SQL = (
    "(SELECT a.doc_id AS doc_id, a.text || chr(10) || b.text AS text "
    "FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1)"
)


def q_minhash_cross_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy cross-corpus decontamination (query 56): MinHash BIPARTITE
    band join of the corpus against an eval-set analogue (docs with
    id % 10 == 7) — catches paraphrased/re-wrapped benchmark leakage
    that exact containment and n-gram overlap miss. The ref side is
    broadcast (eval suites are small); the corpus never shuffles except
    the candidate-scale dedup. Completes the decontamination ladder:
    exact containment → n-gram overlap → shingle-Jaccard similarity."""
    docs = _t(spark, sf_dir, "documents")
    ref = docs.filter(F.col("doc_id") % 10 == 7).select(
        F.col("doc_id").alias("ref_id"), "text"
    )
    return dedup.minhash_cross_pairs(docs, ref, threshold=0.5)


def q_line_dedup_drops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line-level dedup drop list (query 53; Raffel 2020 §2.2 'we
    removed any line that appeared more than once in the corpus'): the
    dedup tier between whole-doc hashing and char-level span dedup.
    One corpus-scale shuffle carrying (doc_id, line_idx, md5) — one row
    per LINE; count + first-occurrence rank ride the same window
    partition."""
    return dedup.line_dedup_drops(_line_corpus(spark, sf_dir))


def q_line_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The applied form of C4 line dedup (query 54): every non-first
    duplicated line spliced out, kept lines re-joined in order. The
    reconstruct is an anti-join on (doc_id, line_idx) + per-doc ordered
    array_join; byte-exact compare over the full rebuilt text."""
    return dedup.line_dedup_keep(_line_corpus(spark, sf_dir))


def q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed end-to-end training-data DAG (query 57, VERDICT r05
    item 2): exact dedup → C4 line dedup → span cut → decontamination →
    rules → classifier importance sampling → packing, over the line
    corpus (the neighbor-concat derivation that gives the line tier
    real cross-document duplication — raw fixture docs have no
    newlines). Pins the cross-tier column contracts and byte-exact text
    composition that 56 isolated checks cannot: the output's pack
    offsets shift if any upstream tier drops, keeps, or rewrites one
    row differently. Oracle = the same seven stages as chained CTEs of
    each tier's independent DuckDB twin.

    Parameter choices keep EVERY stage non-vacuous at sf0.01 (measured:
    499 -> 425 decontam -> 378 rules -> 270 sampled/packed): the rarer
    needle sublist (the full list's 'scan'/'vector' hit 80% of fixture
    docs and annihilated the chain), k_span=40 (k=30 cut keyword-soup
    texts below the rules' word floor), sampler floor 0.3."""
    return corpus_pipeline_mod.corpus_pipeline(
        _line_corpus(spark, sf_dir),
        _PIPELINE_NEEDLES,
        k_span=40,
        floor=0.3,
    )


def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.jaccard_pairs_exact(_t(spark, sf_dir, "documents"), threshold=0.6)


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return similarity.cosine_topk_bruteforce(emb, queries_df, k=5)


def q_embedding_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (dedup family): vec pairs with
    cosine >= threshold among the first 1000 vectors. Brute-force ORACLE
    TWIN (SQL-checkable, hard-capped at 1000 vecs so the cross join is
    bounded); the scale path is srp_bucketed_topk's banded join. The
    fixture's embeddings are near-orthogonal (max pairwise cos ~0.51), so
    the driver check uses 0.45 to be NON-vacuous (14 pairs at sf0.01); a
    production near-dup pass would run the same operator at 0.95+. The
    exact cosine is the vectorized einsum UDF (one batch per Arrow
    chunk), not the round-1 zip_with/aggregate HOF that fell back to
    interpreted eval."""
    from langid_py_spark.operators.similarity import cos_pairwise_udf

    threshold = 0.45
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 1000)
    a = emb.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").cast("array<double>").alias("va"),
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").cast("array<double>").alias("vb"),
    )
    cos = cos_pairwise_udf()
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(cos(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite 0-1 quality score per document: weighted rule signals +
    clamped length ratio (quality-scoring operator, SQL-checkable)."""
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    cols = rule_columns(F.col("text"))
    t = F.coalesce(F.col("text"), F.lit(""))
    n_chars = F.length(t)
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    penalty = (
        cols["r_too_short"].cast("int") * 0.4
        + cols["r_non_alpha"].cast("int") * 0.3
        + cols["r_digit_heavy"].cast("int") * 0.2
        + cols["r_long_word"].cast("int") * 0.1
    )
    score = F.greatest(
        F.lit(0.0), F.round(0.5 * len_score + 0.5 - penalty, 6)
    )
    return docs.select("doc_id", score.alias("quality_score"))


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition filters (Rae et al. 2021): duplicate-line and
    top-n-gram statistics per document — ONE Arrow-UDF map, no shuffle
    (the oracle uses the independent explode+aggregate formulation)."""
    from langid_py_spark.operators.repetition import repetition_stats

    return repetition_stats(_spread(spark, _t(spark, sf_dir, "documents")))


def q_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: exactly min(40, |group|) docs
    per language in content-hash order (no rand() — training-data
    lineage requires the same sample on every retry/engine; md5 keeps
    the oracle engine bit-compatible). The temperature-resampling and
    Bernoulli variants live in operators/sampling.py with pytest
    coverage."""
    from langid_py_spark.operators.sampling import balanced_sample

    docs = _t(spark, sf_dir, "documents")
    return balanced_sample(docs, "lang", 40).select("doc_id", "lang", "source")


def q_substring_dedup_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actionable end of sub-document dedup (query 51; the Lee et
    al. cut-all-copies policy): every duplicated span spliced out of
    every document's text — what near_dedup_keep is to dedup_clusters.
    Oracle: the span CTE + an ordered string_agg splice in DuckDB; the
    compare is byte-exact over the full reconstructed text column."""
    from langid_py_spark.operators.spandedup import (
        cut_spans,
        substring_dup_spans,
    )

    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    spans = substring_dup_spans(docs, k=30)
    return cut_spans(docs, spans).select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text")
    )


def q_substring_spans_winnowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB sub-document-dedup path (query 50): only winnowing-
    selected anchor positions (content-defined — identical in every
    copy of a duplicated region, which stride sampling cannot
    guarantee) enter the shuffle, ~2/(w+1) of the positions, with
    detection guaranteed for spans >= k+w-1 chars. Golden oracle: the
    SAME anchor kernel driven without Spark + a pandas twin of the
    count/merge logic — the driver pins the two paths the way it pins
    contamination_scan vs contamination_scan_join."""
    from langid_py_spark.operators.spandedup import substring_dup_spans_winnowed

    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    return substring_dup_spans_winnowed(docs, k=30, window=8)


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-classifier tier (query 48; CCNet §4.4 / GPT-3 App. A
    reference-corpus classifier): frozen logistic-regression weights
    (committed artifact, trained deterministically offline by
    scripts/train_quality_clf.py on the engine's own multilingual
    generator — 98.9% train acc, en_stop_rate the dominant signal) over
    PURE Catalyst features: one codegen'd dot product per doc, no UDF,
    no shuffle. Emits the linear score z (bit-reproducible across
    engines — multiply/add only) and its sign; sigmoid is available via
    with_quality_probability but is not oracle-compared (libm vs
    java.lang.Math exp differ in the last ulp)."""
    from langid_py_spark.operators.quality_classifier import (
        score_quality_classifier,
    )

    # _spread: the feature block is a dozen regexp_count passes fused in
    # one codegen'd Project — single-split scan means one core does the
    # whole corpus (measured sf1: 2.76 s -> 0.61 s at local[32]).
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    return score_quality_classifier(docs)


def q_classifier_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance sampling by classifier score (query 49; GPT-3 App. A
    'sampled in proportion to score'): deterministic per-id acceptance
    under a piecewise-LINEAR score→probability map (sigmoid would put a
    cross-engine exp() ulp into a row-keep decision) with the md5
    hex-threshold draw of hash_sample. One fused codegen map — no UDF,
    no RNG, no shuffle; same rows on every engine and retry."""
    from langid_py_spark.operators.quality_classifier import (
        classifier_importance_sample,
    )

    docs = _t(spark, sf_dir, "documents")
    return classifier_importance_sample(docs).select("doc_id", "lang", "accept_p")


def q_substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document EXACT substring dedup (query 47; Lee et al. 2021
    ExactSubstr): maximal merged char spans covered by 30-grams that
    occur >= 2 times in the corpus — repeated boilerplate INSIDE
    otherwise-unique documents, the one dedup stage doc-level
    exact/near-dup passes cannot express. 100% Catalyst: sequence
    explode → 8-byte xxhash64 window-count (one corpus-scale shuffle)
    → exact gram-string recount on candidates (collision-proof) →
    gaps-and-islands merge. DuckDB twin computes exact gram strings
    from position one — no hashes, fully independent. _spread: the
    sequence explode is corpus-scale JVM work that would serialize on
    the fixture's single-row-group scan (measured 3.11 → 1.66 s at
    sf0.1); at production split counts it is a no-op."""
    from langid_py_spark.operators.spandedup import substring_dup_spans

    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    return substring_dup_spans(docs, k=30)


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Bernoulli-style ~30% sample (query 45): keep rows
    whose md5(id||salt) hex prefix compares below the fraction threshold
    — a pure codegen'd filter (composes with pushdown; no RNG state, so
    the sample is identical on every retry/engine). Nested-by-
    construction: a smaller fraction is always a subset of a larger one
    with the same salt (scaling-ablation sampling)."""
    from langid_py_spark.operators.sampling import hash_sample

    docs = _t(spark, sf_dir, "documents")
    return hash_sample(docs, 0.3).select("doc_id", "lang", "source")


_TEMP_ALPHA, _TEMP_TOTAL = 0.5, 250


def _temperature_quotas(sf_dir: str) -> dict[str, int]:
    """Replay of the operator's own bounded driver pull (group histogram
    → temperature_targets) for the oracle side, computed WITHOUT Spark
    from the shared parquet table."""
    import pandas as pd

    from langid_py_spark.operators.sampling import temperature_targets

    counts = (
        pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang"])["lang"]
        .value_counts(dropna=False)  # NULL is a group, not a gap — a
        # dropped NULL would silently redistribute its quota (review r05)
        .to_dict()
    )
    return temperature_targets(
        {
            (None if pd.isna(k) else str(k)): int(v)
            for k, v in counts.items()
        },
        _TEMP_ALPHA,
        _TEMP_TOTAL,
    )


def _temperature_oracle_sql() -> str:
    """Quota replay for the oracle side — at the SF the check harness is
    actually running (LANGID_ORACLE_SF_DIR, exported by
    scripts/check_oracles.py; the driver's gate runs at its default,
    sf0.01 — the golden-parquet convention). A missing/unreadable table
    degrades to a guaranteed-mismatch marker query for THIS entry only,
    instead of crashing oracle_sql() for every query (review r05)."""
    import os

    sf_dir = os.environ.get("LANGID_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    try:
        quotas = _temperature_quotas(sf_dir)
    except Exception as exc:  # lazy, per-query failure
        return (
            f"SELECT 'temperature quotas unavailable: {type(exc).__name__}' "
            "AS err WHERE 1 = 0"
        )
    return sampling.temperature_sample_oracle_sql(
        "documents", "lang", quotas, ["doc_id", "lang"]
    )


def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multilingual temperature resampling (Conneau & Lample; query 46):
    per-language quotas ∝ n^alpha rescaled to a total budget (alpha<1
    upweights low-resource languages), rows chosen in deterministic
    content-hash order. Quota computation is a |groups|-row driver pull
    by design; the selection is one window over the data."""
    from langid_py_spark.operators.sampling import temperature_sample

    docs = _t(spark, sf_dir, "documents")
    return temperature_sample(docs, "lang", _TEMP_ALPHA, _TEMP_TOTAL).select(
        "doc_id", "lang"
    )


_MIXTURE_BUDGETS = {
    # cuts mid-source (src0/src1/src9), keeps a source whole (src5),
    # zero-budget edge (src7 — only zero-token docs survive), and every
    # unlisted source is excluded by the spec
    "src0": 800,
    "src1": 1200,
    "src5": 5000,
    "src7": 0,
    "src9": 700,
}


def q_token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted mixture sampling (query 63): fill per-source TOKEN
    budgets in deterministic hash order — the "N billion tokens, X% per
    domain" mixture builder between filtering and the trainer.
    Integer-exact semantics (inclusive per-source cumsum <= budget over
    (md5 ASC, id ASC)); distributed as the packing-style two-level
    prefix sum keyed by (source, md5-first-byte bucket) so no
    single-task per-source sort exists at any corpus size. Oracle: the
    naive per-source global-window formulation in DuckDB."""
    from langid_py_spark.operators.sampling import token_budget_sample

    docs = _t(spark, sf_dir, "documents")
    return token_budget_sample(docs, _MIXTURE_BUDGETS)


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (query 55): concat-then-chunk the corpus into
    2048-token training bins in deterministic hash order. Distributed
    two-level prefix sum (256 hash buckets windowed in parallel, one
    256-row driver pull for the bucket bases, broadcast back); the
    oracle is the naive single-window global cumsum — an independent
    formulation that only works at oracle scale, which is the point."""
    from langid_py_spark.operators.packing import pack_sequences

    return pack_sequences(_t(spark, sf_dir, "documents"), budget=2048)


def q_user_top_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vote-aggregation shape (A6) in SQL-checkable form: per user, the
    event_type with the highest count (count desc, type asc tie-break)."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n_events"))
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"), F.asc("event_type"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("user_id", F.col("event_type").alias("top_event_type"), "n_events")
    )


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: partial+final hash agg over lineitem."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-join + agg + deterministic top-10."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spent"))
        .orderBy(F.desc("total_spent"), F.asc("c_custkey"))
        .limit(10)
    )


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (query 52): the canonical 3-way star join —
    filtered dim (customer segment) broadcast into orders, the
    surviving order keys joined into the fact (lineitem), revenue agg,
    deterministic top-10. Catalyst pushes both date filters to the
    scans; AQE picks broadcast for the filtered orders side against
    lineitem when it shrinks enough — the exact plan a 100 TB
    fact-table query needs."""
    cut = "1996-06-15"
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(cut).cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(cut).cast("timestamp")
    )
    return (
        li.join(
            orders.join(
                F.broadcast(cust), orders.o_custkey == cust.c_custkey
            ).select("o_orderkey", "o_orderdate", "o_orderpriority"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (lag + conditional cumsum windows): per
    user, number of sessions with a 30-minute inactivity gap, session
    span stats. Classic streaming-adjacent batch op; fully window-based."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    secs = F.unix_timestamp(F.col("ts"))  # session tz pinned to UTC
    gap = secs - F.lag(secs).over(w_user)
    with_new = ev.withColumn(
        "is_new", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    )
    with_sess = with_new.withColumn(
        "session_id",
        F.sum("is_new").over(
            w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_sess.groupBy("user_id")
        .agg(
            F.max("session_id").alias("n_sessions"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


def q_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate windows over a keyed ordered stream (top-3 rows
    per user by ts, with running sum + rank)."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = (
        ev.withColumn(
            "running_value",
            F.round(
                F.sum("value").over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                ),
                4,
            ),
        )
        .withColumn("rn", F.row_number().over(w).cast("long"))
    )
    return run.filter(F.col("rn") <= 3).select(
        "user_id", "event_id", "rn", "running_value"
    )


def q_union_distinct_top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op (W2 shape): union of per-language top-20 word sets →
    distinct words with the number of languages that ranked them."""
    topk = textstats.topk_words_per_group(
        _spread(spark, _t(spark, sf_dir, "documents")), group_col="lang", k=20
    )
    return topk.select("word", "lang").distinct().groupBy("word").agg(
        F.count("*").alias("n_langs")
    )


def q_lang_source_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets family (CUBE): per-(lang, source) doc counts with
    all rollup margins in ONE pass — Spark expands the grouping sets
    map-side, so the corpus is scanned once however many margins are
    requested (vs one job per breakdown). NULL margin keys are coalesced
    to '(all)' and the grouping bitmask is emitted explicitly so the
    oracle comparison is unambiguous."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.cube("lang", "source")
        .agg(
            F.grouping_id("lang", "source").cast("long").alias("gid"),
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .select(
            "gid",
            F.coalesce(F.col("lang"), F.lit("(all)")).alias("lang"),
            F.coalesce(F.col("source"), F.lit("(all)")).alias("source"),
            "n_docs",
            "total_chars",
        )
    )


def q_lang_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline-metrics shape (A7): per (lang, source) doc counts + size."""
    return (
        _t(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


# ---- UDF-scored / non-SQL ops (rows-only driver check; NumPy-oracle
# equivalence is pinned by the pytest suite instead)
def q_langid_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from langid_py_spark.spark.scorer import with_language

    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    return with_language(docs, max_bytes=C.SCORE_MAX_BYTES).select(
        "doc_id", "ld.lang", F.round("ld.conf_norm", 6).alias("conf_norm")
    )


def q_hashed_tf_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed TF-IDF embedding generation, integer-exact sparse surface
    (operators/embedding.py): (doc_id, bucket, tf, df_bucket) — the
    idf/normalize float tail lives in doc_embeddings (pytest-pinned,
    cross-engine ln()/sqrt ulp stays out of the oracle compare)."""
    from langid_py_spark.operators import embedding

    return embedding.hashed_tf_vectors(
        _spread(spark, _t(spark, sf_dir, "documents"))
    )


def q_lm_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed-LM-trainer counts (operators/lm_train.py): top-50
    byte n-grams per order with conditional-probability denominators.
    Integer-exact, so the DuckDB twin (hex-nibble byte decode + lead()
    windows — a fully independent computation path) matches bit-for-bit
    with no golden needed."""
    from langid_py_spark.operators import lm_train

    return lm_train.lm_ngram_topk(
        _spread(spark, _t(spark, sf_dir, "documents")), k=50
    )


def q_perplexity_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from langid_py_spark.spark.perplexity import with_perplexity

    return with_perplexity(_spread(spark, _t(spark, sf_dir, "documents"))).select(
        "doc_id", F.round("ppl", 4).alias("ppl")
    )


def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NO _spread on the raw text — re-measured r07 at sf1: it made the
    # query SLOWER (2.84 -> 4.21 s median), confirming the r04 sf0.1
    # finding at 10x the rows (the full-text hop re-keys the sig cache).
    # What DOES pay is spreading the slim persisted SIGNATURE table
    # before the band explode when the scan under-splits (2.19 ->
    # 1.63 s cache-warm) — gated on the same split estimate as _spread,
    # so band_tasks=None (no-op) at production split counts.
    docs = _t(spark, sf_dir, "documents")
    p = spark.sparkContext.defaultParallelism
    est = _estimate_scan_tasks(spark, docs)
    band_tasks = p if (est is not None and est < p) else None
    return dedup.minhash_lsh_pairs(docs, threshold=0.5, band_tasks=band_tasks)


def q_simhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_candidates(_t(spark, sf_dir, "documents"), max_hamming=3)


def q_srp_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return similarity.srp_bucketed_topk(emb, queries_df, dim=64, k=5)


def q_srp_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs at SCALE: SRP-banded self-equi-join (ids
    only through the shuffle, hot-bucket guard) + exact einsum re-rank —
    the production path whose bounded brute twin is embedding_dup_pairs.
    Same 0.45 threshold as the twin (fixture embeddings are
    near-orthogonal), hence the COARSE 32/4-bit banding — at such a low
    threshold fine bands would recall nothing; production runs at 0.9+
    use the operator's 64/8-bit default (see srp_dup_pairs docstring).
    The golden twin models this exact banding; expected recall vs the
    brute twin at cos 0.45 is the SRP s-curve ~0.79."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.srp_dup_pairs(
        emb, dim=64, threshold=0.45, n_planes=32, band_bits=4
    )


def q_text_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPOSED embedding-cosine near-dup over raw TEXT (query 60): the
    two r06 tiers chained the way a real pipeline runs them — documents
    → hashed TF-IDF dense embeddings (operators/embedding.py: one
    bounded-dim dfreq pass + ONE Arrow map, zero corpus shuffle) → SRP
    banded self-join near-dup pairs (operators/similarity.py: ids-only
    band shuffle, hot-bucket guard, exact einsum re-rank). dim=256 (64
    collides same-language docs into median-0.68 cosine; 256 separates),
    threshold 0.9 with the operator's production 64-plane/8-bit banding
    (recall ≈0.94 at cos 0.9 by the SRP s-curve). Golden twin:
    make_golden.g_text_dup_pairs — same kernels end to end."""
    # _spread: same two single-split embedding passes as q_semdedup_drops
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    emb = embedding_mod.doc_embeddings(docs, dim=256)
    return similarity.srp_dup_pairs(
        emb,
        dim=256,
        threshold=0.9,
        id_col="doc_id",
        n_planes=64,
        band_bits=8,
    )


def q_semdedup_drops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (query 61, Abbas 2023): semantic dedup FROM raw text —
    documents → hashed TF-IDF embeddings (dim 256, same tier as query
    60) → spherical k-means coarse quantizer (the IVF sample fit,
    deterministic) → within-cluster greedy cosine pruning at eps 0.9
    (operators/semdedup.py: zero-shuffle Arrow assignment, ONE
    groupBy(cluster_id) shuffle, chunked rowwise_gemm kernel shared
    with the golden twin make_golden.g_semdedup_drops). The embedding
    table is persisted because BOTH the centroid fit (bounded
    orderBy-limit sample pull) and the assignment scan consume it.
    Emits the rows SemDeDup would REMOVE: (doc_id, dup_of, cluster_id,
    cos_sim) with the keep-the-farthest-from-centroid representative
    rule."""
    # _spread: BOTH embedding passes (dfreq presence scan + the embed
    # map) are heavy Arrow-UDF work over the fixture's single-row-group
    # scan — without the rebalance each runs as ONE task (the
    # langid_score precedent); per-doc embeddings are batch-composition-
    # independent (property-tested), so partitioning changes no value.
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    emb = embedding_mod.doc_embeddings(docs, dim=256).persist()
    cents = similarity.fit_ivf_centroids(emb, n_centroids=16, id_col="doc_id")
    return semdedup_mod.semdedup_drops(emb, cents, eps=0.9, id_col="doc_id")


def q_semdedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor view of SemDeDup (query 62): documents left after
    dropping query 61's semantic duplicates — the anti-join the
    training pipeline actually consumes. Oracle: documents anti-joined
    with the semdedup_drops golden (the near_dedup_keep pattern), so
    the drop list comes from the golden while the anti-join itself is
    independently re-executed by DuckDB."""
    docs = _t(spark, sf_dir, "documents")
    drops = q_semdedup_drops(spark, sf_dir)
    return semdedup_mod.semdedup_keep(docs, drops, id_col="doc_id").select(
        "doc_id"
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pair -> CLUSTER resolution: connected components
    (alternating large-star/small-star equi-join iterations, operators/
    cluster.py) over the UNION of three near-dup pair sources (minhash
    LSH, simhash, winnowing — same params as their registered queries),
    emitting (doc_id, cluster_id=component min, is_rep). The step that
    turns pair tables into an actionable drop list; golden twin is an
    INDEPENDENT union-find."""
    from langid_py_spark.operators.cluster import dedup_clusters

    docs = _t(spark, sf_dir, "documents")
    pairs = (
        dedup.minhash_lsh_pairs(docs, threshold=0.5)
        .select("id_a", "id_b")
        .unionByName(
            dedup.simhash_candidates(docs, max_hamming=3).select("id_a", "id_b")
        )
        .unionByName(
            dedup.winnow_pairs(docs, min_shared=2, k=20, window=12).select(
                "id_a", "id_b"
            )
        )
    )
    return dedup_clusters(pairs)


def q_cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split (80/10/10): the split unit is
    the near-dup CLUSTER (same three-source pair union + CC resolution
    as dedup_clusters), so no near-duplicate pair straddles train and
    eval — the within-corpus complement of benchmark decontamination.
    Singletons hash their own id. Pure Catalyst after ONE id equi-join:
    md5 hex-prefix thresholds, exact string compares (the hash_sample
    idiom). Golden twin: union-find + the same threshold map
    (make_golden.g_cluster_safe_split). Upstream n/a (training-data
    extra per the driver mandate)."""
    from langid_py_spark.operators.cluster import dedup_clusters
    from langid_py_spark.operators.sampling import leakage_safe_split

    docs = _t(spark, sf_dir, "documents")
    pairs = (
        dedup.minhash_lsh_pairs(docs, threshold=0.5)
        .select("id_a", "id_b")
        .unionByName(
            dedup.simhash_candidates(docs, max_hamming=3).select("id_a", "id_b")
        )
        .unionByName(
            dedup.winnow_pairs(docs, min_shared=2, k=20, window=12).select(
                "id_a", "id_b"
            )
        )
    )
    return leakage_safe_split(
        docs.select("doc_id"),
        dedup_clusters(pairs),
        {"train": 0.8, "val": 0.1, "test": 0.1},
        id_col="doc_id",
    ).select("doc_id", "split")


def q_near_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actionable end of the near-dup story: survivors after
    dropping every non-representative member of every near-dup cluster
    (same pair-source union as dedup_clusters). Oracle: documents
    anti-joined with the union-find golden's non-reps."""
    from langid_py_spark.operators.cluster import near_dedup_keep

    docs = _t(spark, sf_dir, "documents")
    pairs = (
        dedup.minhash_lsh_pairs(docs, threshold=0.5)
        .select("id_a", "id_b")
        .unionByName(
            dedup.simhash_candidates(docs, max_hamming=3).select("id_a", "id_b")
        )
        .unionByName(
            dedup.winnow_pairs(docs, min_shared=2, k=20, window=12).select(
                "id_a", "id_b"
            )
        )
    )
    return near_dedup_keep(docs, pairs).select("doc_id")


def q_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (the second scale path beside SRP-LSH): spherical-k-means
    coarse quantizer trained on a bounded deterministic sample, candidates
    from an equi-join on cluster_id, exact cosine re-rank."""
    emb = _t(spark, sf_dir, "embeddings")
    centroids = similarity.fit_ivf_centroids(
        emb, n_centroids=16, sample_rows=2000
    )
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return similarity.ivf_topk(emb, queries_df, centroids, k=5, n_probe=4)


_CONTAMINATION_NEEDLES = [
    "scan",  # high-frequency single word
    "scan slow",  # shares a prefix with "scan" — exercises the AC fail chain
    "hash join",
    "customer query",
    "vector",
    "zzz-held-out-canary-000",  # absent: the scan must emit nothing for it
]

# the corpus_pipeline decontam list: the rarer needles only ('scan' /
# 'vector' are in 80% of fixture docs — using them empties the chain)
_PIPELINE_NEEDLES = [
    "scan slow",
    "hash join",
    "customer query",
    "zzz-held-out-canary-000",
]


def q_contamination_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-decontamination scan: all (doc, needle) containment
    pairs, matched by ONE Aho-Corasick DFA walk per document (the langid
    tokenizer machinery pointed at a needle list) instead of |needles|
    substring passes. SQL oracle: DuckDB instr() containment over a
    VALUES list. n_hits (overlap-counted) is dropped here — AC overlap
    semantics aren't ANSI-SQL; pytest pins it against a naive counter."""
    docs = _t(spark, sf_dir, "documents")
    return contamination.contamination_scan(docs, _CONTAMINATION_NEEDLES).select(
        "doc_id", "needle"
    )


def q_contamination_scan_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LARGE-needle-list decontamination path (10^4-10^6 needles):
    rolling-hash prefix-fingerprint candidate join + byte-exact verify —
    no DFA (the dense table costs ~2 KB of worker memory per needle
    byte, measured; see operators/contamination.py), no shuffle. Same
    needle list and SQL oracle as contamination_scan, so the driver
    pins both paths to identical containment sets."""
    docs = _t(spark, sf_dir, "documents")
    return contamination.contamination_scan_join(
        docs, _CONTAMINATION_NEEDLES
    ).select("doc_id", "needle")


_NGRAM_N = 3  # word-gram order for the registered overlap query (GPT-3 uses 13; 3 keeps the small-vocab fixture check non-vacuous: 15 cross-doc rows vs 3 self-hits at 5)


def _overlap_needles(spark: SparkSession, sf_dir: str) -> list[str]:
    """Deterministic needles: the first 8 words of docs 0-2 — guaranteed
    hits, reproducible, and constructible identically in the SQL twin.
    Degenerate corpora (empty/whitespace/duplicate docs 0-2) yield
    needles the operator guards would rightly reject, so generation
    drops sub-_NGRAM_N-word needles and dedupes — mirrored by the
    length filter + DISTINCT in _OVERLAP_NEEDLES_SQL."""
    docs = _t(spark, sf_dir, "documents")
    rows = (
        docs.filter(F.col("doc_id") < 3)
        .orderBy("doc_id")
        .select(
            F.array_join(
                F.slice(
                    F.regexp_extract_all(
                        F.col("text"), F.lit("[^\t\n\f\r ]+"), F.lit(0)
                    ),
                    1,
                    8,
                ),
                " ",
            ).alias("needle")
        )
        .collect()
    )
    raw = [r["needle"] for r in rows]
    # tokens contain no spaces, so split(" ") is the exact word count
    valid = [nd for nd in raw if nd and len(nd.split(" ")) >= _NGRAM_N]
    return list(dict.fromkeys(valid))


# SQL twin of _overlap_needles / the dist query's needles_df (shared by
# both overlap oracle entries): same slice, same ≥_NGRAM_N-word filter,
# DISTINCT for the dedupe (output is keyed by needle string, so any
# dedupe strategy agrees).
_OVERLAP_NEEDLES_SQL = (
    "SELECT DISTINCT array_to_string("
    "(regexp_extract_all(text, '[^\\t\\n\\f\\r ]+'))[1:8], ' ') AS needle "
    "FROM documents WHERE doc_id < 3 "
    f"AND len(regexp_extract_all(text, '[^\\t\\n\\f\\r ]+')) >= {_NGRAM_N}"
)


def q_ngram_overlap_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3-style n-gram-overlap decontamination (query 42): documents
    sharing any word n-gram (n=_NGRAM_N — 3 at fixture scale, see the
    constant's comment; GPT-3 production uses 13) with a needle (evals
    leak reworded and partially quoted — substring containment misses
    that). Candidates by
    rolling-hash fingerprint join, rows by EXACT string verification;
    the DuckDB twin computes exact string n-grams with list ops — a
    fully independent path."""
    docs = _t(spark, sf_dir, "documents")
    needles = _overlap_needles(spark, sf_dir)
    if not needles:
        # all generated needles were degenerate (see _overlap_needles)
        return spark.createDataFrame(
            [], "doc_id bigint, needle string, n_shared bigint"
        )
    return contamination.ngram_overlap_scan(docs, needles, n=_NGRAM_N)


def q_ngram_overlap_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DISTRIBUTED n-gram-overlap path (needles as a DataFrame, gram
    table computed distributed, ids-only equi-join — the 10^6-needle
    shape where the closure path's driver-side dim build would not fit).
    Same needles and SQL oracle as ngram_overlap_scan, so the driver
    pins both paths to identical results."""
    docs = _t(spark, sf_dir, "documents")
    words = F.regexp_extract_all(
        F.col("text"), F.lit("[^\t\n\f\r ]+"), F.lit(0)
    )
    needles_df = (
        docs.filter(F.col("doc_id") < 3)
        # same degenerate-needle filter as _overlap_needles: the sliced
        # needle has min(|words|, 8) words, so |words| >= _NGRAM_N ⟺
        # the needle is long enough
        .filter(F.size(words) >= _NGRAM_N)
        .select(
            F.col("doc_id").alias("needle_id"),
            F.array_join(F.slice(words, 1, 8), " ").alias("needle"),
        )
        # dedupe identical needles (min id — output is keyed by needle
        # string, so the survivor choice is unobservable)
        .groupBy("needle")
        .agg(F.min("needle_id").alias("needle_id"))
    )
    return contamination.ngram_overlap_scan_distributed(
        docs, needles_df, n=_NGRAM_N
    )


def q_ccnet_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail split (Wenzek 2020): per LANGUAGE, cut the
    LM-perplexity distribution at its terciles — the standard corpus-
    level quality tier beside the per-row rules. Exact percentiles here
    (oracle-checkable); percentile_approx is the 100 TB path (same plan
    shape — see operators/quality.py)."""
    from langid_py_spark.operators.quality import ccnet_ppl_buckets

    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    return ccnet_ppl_buckets(docs)


def q_ccnet_ppl_buckets_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB CCNet path: percentile_approx (mergeable quantile
    sketch, one pass) instead of exact per-group percentile — same plan
    shape. Deterministic at this SF because the sketch's rank error
    (n/accuracy = 500/10000 rows) is under one row, making it
    RANK-EXACT: the golden twin models the sorted value at rank
    ceil(p*n). At production group sizes the path is genuinely
    approximate — which CCNet tolerates (the tercile cut is a tuning
    knob, not a contract)."""
    from langid_py_spark.operators.quality import ccnet_ppl_buckets

    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    return ccnet_ppl_buckets(docs, exact=False)


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from langid_py_spark.operators.multimodal import decode_features, synth_media

    return (
        decode_features(synth_media(spark, n=64))
        .drop("feat")
        .select(
            "media_id",
            "mime",
            F.col("nbytes").cast("long").alias("nbytes"),
            F.col("width").cast("long").alias("width"),
            F.col("height").cast("long").alias("height"),
            F.lit(8).cast("long").alias("feat_dim"),
        )
    )


def q_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprinting (winnowing): near-dup pairs
    sharing >= 2 fingerprints, scored by fingerprint-set Jaccard. Long
    grams (k=20, w=12) because the synthetic small-vocab fixture shares
    short grams ubiquitously; real corpora typically use k~8."""
    return dedup.winnow_pairs(
        _t(spark, sf_dir, "documents"), min_shared=2, k=20, window=12
    )


def q_rank_languages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: language ranking per doc (top-2 flattened). top_k=2 bounds the
    per-row struct building — the query reads exactly two ranks, so the
    UDF never materializes |classes|-length Python lists (VERDICT r02)."""
    from langid_py_spark.spark.scorer import rank_udf

    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    r = docs.select("doc_id", rank_udf(top_k=2)(F.col("text")).alias("r"))
    return r.select(
        "doc_id",
        F.col("r")[0]["lang"].alias("lang1"),
        F.round(F.col("r")[0]["prob"], 6).alias("prob1"),
        F.col("r")[1]["lang"].alias("lang2"),
        F.round(F.col("r")[1]["prob"], 6).alias("prob2"),
    )


def q_byte_ngram_df_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training stage W1 on real byte n-grams (hex features, rows-only:
    byte-level n-gram explosion is not expressible in ANSI SQL)."""
    from langid_py_spark.operators.train_pipeline import (
        df_feature_select,
        explode_byte_ngrams,
    )

    # orderBy before limit: a bare limit takes whatever 200 rows arrive
    # first, which depends on scan partitioning — not a stable contract
    docs = _t(spark, sf_dir, "documents").orderBy("doc_id").limit(200)
    tokens = explode_byte_ngrams(docs, extra_cols=("lang",), max_order=2)
    return df_feature_select(tokens, candidates_per_order=50)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "rules_keepdrop": q_rules_keepdrop,
        "scrub_pii": q_scrub_pii,
        "token_stats": q_token_stats,
        "doc_fingerprint": q_doc_fingerprint,
        "lang_heuristic": q_lang_heuristic,
        "word_df_tally": q_word_df_tally,
        "topk_words_per_lang": q_topk_words_per_lang,
        "topk_words_per_source": q_topk_words_per_source,
        "exact_dedup_groups": q_exact_dedup_groups,
        "prefix_dedup_groups": q_prefix_dedup_groups,
        "dedup_survivors": q_dedup_survivors,
        "line_dedup_drops": q_line_dedup_drops,
        "line_dedup_keep": q_line_dedup_keep,
        "corpus_pipeline": q_corpus_pipeline,
        "minhash_cross_pairs": q_minhash_cross_pairs,
        "jaccard_pairs": q_jaccard_pairs,
        "cosine_topk": q_cosine_topk,
        "embedding_dup_pairs": q_embedding_dup_pairs,
        "quality_score": q_quality_score,
        "repetition_stats": q_repetition_stats,
        "balanced_sample": q_balanced_sample,
        "hash_sample": q_hash_sample,
        "temperature_sample": q_temperature_sample,
        "token_budget_mixture": q_token_budget_mixture,
        "pack_sequences": q_pack_sequences,
        "lm_ngram_topk": q_lm_ngram_topk,
        "hashed_tf_vectors": q_hashed_tf_vectors,
        "substring_dup_spans": q_substring_dup_spans,
        "substring_spans_winnowed": q_substring_spans_winnowed,
        "substring_dedup_cut": q_substring_dedup_cut,
        "quality_classifier": q_quality_classifier,
        "classifier_sample": q_classifier_sample,
        "user_top_event": q_user_top_event,
        "sessionize_events": q_sessionize_events,
        "running_totals": q_running_totals,
        "union_distinct_top_words": q_union_distinct_top_words,
        "pricing_summary": q_pricing_summary,
        "top_customers": q_top_customers,
        "shipping_priority": q_shipping_priority,
        "lang_histogram": q_lang_histogram,
        "lang_source_cube": q_lang_source_cube,
        # UDF-backed (golden-parquet oracles; numpy-oracle parity in pytest)
        "langid_documents": q_langid_documents,
        "perplexity_documents": q_perplexity_documents,
        "minhash_pairs": q_minhash_pairs,
        "simhash_candidates": q_simhash_candidates,
        "winnow_pairs": q_winnow_pairs,
        "srp_ann_topk": q_srp_ann_topk,
        "srp_dup_pairs": q_srp_dup_pairs,
        "text_dup_pairs": q_text_dup_pairs,
        "semdedup_drops": q_semdedup_drops,
        "semdedup_keep": q_semdedup_keep,
        "dedup_clusters": q_dedup_clusters,
        "cluster_safe_split": q_cluster_safe_split,
        "near_dedup_keep": q_near_dedup_keep,
        "ivf_ann_topk": q_ivf_ann_topk,
        "contamination_scan": q_contamination_scan,
        "contamination_scan_join": q_contamination_scan_join,
        "ngram_overlap_scan": q_ngram_overlap_scan,
        "ngram_overlap_dist": q_ngram_overlap_dist,
        "ccnet_ppl_buckets": q_ccnet_ppl_buckets,
        "ccnet_ppl_buckets_approx": q_ccnet_ppl_buckets_approx,
        "media_features": q_media_features,
        "byte_ngram_df_topk": q_byte_ngram_df_topk,
        "rank_languages": q_rank_languages,
    }


_GOLDEN_DIR = Path(__file__).resolve().parent / "langid_py_spark" / "data" / "golden"


def _golden_sql(name: str, sf: str = "0.01") -> str:
    """Golden-parquet oracle for a deterministic UDF-scored query: expected
    output pre-computed by scripts/make_golden.py with the NumPy cores (no
    Spark) + a pandas twin of the DataFrame logic. The driver's value-hash
    check then covers the hot operators end-to-end instead of rows-only.
    Valid at sf0.01 (the driver's correctness gate SF)."""
    return f"SELECT * FROM read_parquet('{_GOLDEN_DIR / f'sf{sf}' / f'{name}.parquet'}')"


def oracle_sql() -> dict[str, str]:
    rules = duckdb_rule_sql("text")
    rule_cols = ", ".join(f"{sql} AS {name}" for name, sql in rules.items())
    keep = " AND ".join(f"NOT {rules[n]}" for n in C.RULE_NAMES)
    return {
        "rules_keepdrop": (
            f"SELECT doc_id, {rule_cols}, ({keep}) AS keep_heuristic FROM documents"
        ),
        "scrub_pii": (
            f"SELECT doc_id, {duckdb_scrub_sql('text')} AS scrubbed_text FROM documents"
        ),
        "token_stats": textstats.token_stats_oracle_sql("documents"),
        "doc_fingerprint": textstats.doc_fingerprint_oracle_sql("documents"),
        "lang_heuristic": textstats.lang_heuristic_oracle_sql("documents"),
        "word_df_tally": textstats.word_df_tally_oracle_sql("documents"),
        "topk_words_per_lang": textstats.topk_words_oracle_sql(
            "documents", group_col="lang", k=5
        ),
        "topk_words_per_source": textstats.topk_words_oracle_sql(
            "documents", group_col="source", k=3
        ),
        "exact_dedup_groups": dedup.exact_dedup_groups_oracle_sql(
            "(SELECT * FROM documents UNION ALL SELECT * FROM documents)"
        ),
        "prefix_dedup_groups": """
            SELECT md5(substring(coalesce(text, ''), 1, 40)) AS prefix_hash,
                   count(*) AS n_dups,
                   min(doc_id) AS keep_id
            FROM documents
            GROUP BY 1 HAVING count(*) > 1
        """,
        "dedup_survivors": """
            SELECT doc_id FROM (
                SELECT doc_id, row_number() OVER (
                    PARTITION BY md5(coalesce(text, '')) ORDER BY doc_id ASC
                ) AS rn FROM documents
            ) WHERE rn = 1
        """,
        "jaccard_pairs": dedup.jaccard_pairs_oracle_sql("documents", threshold=0.6),
        "line_dedup_drops": dedup.line_dedup_drops_oracle_sql(_LINE_CORPUS_SQL),
        "line_dedup_keep": dedup.line_dedup_keep_oracle_sql(_LINE_CORPUS_SQL),
        "corpus_pipeline": corpus_pipeline_mod.corpus_pipeline_oracle_sql(
            _PIPELINE_NEEDLES, table=_LINE_CORPUS_SQL, k_span=40, floor=0.3
        ),
        "cosine_topk": similarity.cosine_topk_oracle_sql("embeddings", n_queries=5, k=5),
        "embedding_dup_pairs": """
            WITH e AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings WHERE vec_id < 1000
            )
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_dot_product(a.v, b.v)
                         / greatest(sqrt(list_dot_product(a.v, a.v))
                                    * sqrt(list_dot_product(b.v, b.v)), 1e-12),
                         6) AS cos_sim
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE round(list_dot_product(a.v, b.v)
                        / greatest(sqrt(list_dot_product(a.v, a.v))
                                   * sqrt(list_dot_product(b.v, b.v)), 1e-12),
                        6) >= 0.45
        """,
        "quality_score": (
            lambda rs: f"""
            SELECT doc_id,
                   greatest(0.0, round(
                     0.5 * least(length(coalesce(text, '')) / 500.0, 1.0)
                     + 0.5
                     - (CAST({rs['r_too_short']} AS INT) * 0.4
                        + CAST({rs['r_non_alpha']} AS INT) * 0.3
                        + CAST({rs['r_digit_heavy']} AS INT) * 0.2
                        + CAST({rs['r_long_word']} AS INT) * 0.1), 6)) AS quality_score
            FROM documents
            """
        )(duckdb_rule_sql("text")),
        "repetition_stats": repetition.repetition_stats_oracle_sql("documents"),
        "balanced_sample": sampling.balanced_sample_oracle_sql(
            "documents", "lang", 40, ["doc_id", "lang", "source"]
        ),
        "hash_sample": sampling.hash_sample_oracle_sql(
            "documents", 0.3, cols=["doc_id", "lang", "source"]
        ),
        "pack_sequences": packing.pack_sequences_oracle_sql(budget=2048),
        "lm_ngram_topk": lm_train.lm_ngram_topk_oracle_sql("documents", k=50),
        "hashed_tf_vectors": embedding_mod.hashed_tf_vectors_oracle_sql(
            "documents"
        ),
        "substring_dup_spans": spandedup.substring_dup_spans_oracle_sql(k=30),
        "substring_spans_winnowed": _golden_sql("substring_spans_winnowed"),
        "substring_dedup_cut": spandedup.cut_spans_oracle_sql(k=30),
        "quality_classifier": quality_classifier.quality_classifier_oracle_sql(),
        "classifier_sample": quality_classifier.classifier_importance_sample_oracle_sql(
            cols=["doc_id", "lang"]
        ),
        "temperature_sample": _temperature_oracle_sql(),
        "token_budget_mixture": sampling.token_budget_sample_oracle_sql(
            _MIXTURE_BUDGETS
        ),
        "user_top_event": """
            SELECT user_id, event_type AS top_event_type, n_events FROM (
                SELECT user_id, event_type, count(*) AS n_events,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY count(*) DESC, event_type ASC) AS rk
                FROM events GROUP BY user_id, event_type
            ) WHERE rk = 1
        """,
        "sessionize_events": """
            WITH g AS (
                SELECT user_id, value, ts, event_id,
                       CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                                 - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w
                                 IS NULL
                              OR CAST(floor(epoch(ts)) AS BIGINT)
                                 - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w
                                 > 1800
                            THEN 1 ELSE 0 END AS is_new
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
                SELECT user_id, value,
                       sum(is_new) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS session_id
                FROM g
            )
            SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions,
                   count(*) AS n_events,
                   round(sum(value), 4) AS total_value
            FROM s GROUP BY user_id
        """,
        "running_totals": """
            SELECT user_id, event_id, rn, running_value FROM (
                SELECT user_id, event_id,
                       row_number() OVER w AS rn,
                       round(sum(value) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id
                                              ROWS UNBOUNDED PRECEDING),
                             4) AS running_value
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ) WHERE rn <= 3
        """,
        "union_distinct_top_words": f"""
            WITH topk AS (
                SELECT lang, word FROM (
                    SELECT lang, word, count(*) AS n,
                           row_number() OVER (PARTITION BY lang
                                              ORDER BY count(*) DESC, word ASC) AS rk
                    FROM (SELECT lang,
                                 unnest(regexp_extract_all(text, '{C.WORD_RUN_PATTERN}')) AS word
                          FROM documents)
                    GROUP BY lang, word
                ) WHERE rk <= 20
            )
            SELECT word, count(*) AS n_langs
            FROM (SELECT DISTINCT word, lang FROM topk)
            GROUP BY word
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "top_customers": """
            SELECT c_custkey, c_name, round(sum(o_totalprice), 2) AS total_spent
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_custkey, c_name
            ORDER BY total_spent DESC, c_custkey ASC LIMIT 10
        """,
        "shipping_priority": """
            SELECT o_orderkey, o_orderdate, o_orderpriority,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1996-06-15 00:00:00'
              AND l_shipdate > TIMESTAMP '1996-06-15 00:00:00'
            GROUP BY o_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
        """,
        "lang_histogram": """
            SELECT lang, source, count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars
            FROM documents GROUP BY lang, source
        """,
        "lang_source_cube": """
            SELECT CAST(GROUPING(lang) * 2 + GROUPING(source) AS BIGINT) AS gid,
                   coalesce(lang, '(all)') AS lang,
                   coalesce(source, '(all)') AS source,
                   count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars
            FROM documents GROUP BY CUBE (lang, source)
        """,
        # UDF-scored queries: golden-parquet oracles (deterministic expected
        # outputs, pre-computed without Spark — scripts/make_golden.py)
        "langid_documents": _golden_sql("langid_documents"),
        "perplexity_documents": _golden_sql("perplexity_documents"),
        "rank_languages": _golden_sql("rank_languages"),
        "minhash_pairs": _golden_sql("minhash_pairs"),
        "minhash_cross_pairs": _golden_sql("minhash_cross_pairs"),
        "simhash_candidates": _golden_sql("simhash_candidates"),
        "winnow_pairs": _golden_sql("winnow_pairs"),
        "srp_ann_topk": _golden_sql("srp_ann_topk"),
        "srp_dup_pairs": _golden_sql("srp_dup_pairs"),
        "text_dup_pairs": _golden_sql("text_dup_pairs"),
        "semdedup_drops": _golden_sql("semdedup_drops"),
        "semdedup_keep": f"""
            SELECT d.doc_id FROM documents d
            LEFT JOIN ({_golden_sql("semdedup_drops")}) drop_list
              ON d.doc_id = drop_list.doc_id
            WHERE drop_list.doc_id IS NULL
        """,
        "dedup_clusters": _golden_sql("dedup_clusters"),
        "cluster_safe_split": _golden_sql("cluster_safe_split"),
        "near_dedup_keep": f"""
            SELECT d.doc_id FROM documents d
            LEFT JOIN (
                SELECT doc_id FROM ({_golden_sql("dedup_clusters")})
                WHERE NOT is_rep
            ) drop_list ON d.doc_id = drop_list.doc_id
            WHERE drop_list.doc_id IS NULL
        """,
        "ivf_ann_topk": _golden_sql("ivf_ann_topk"),
        "contamination_scan": contamination.contamination_oracle_sql(
            _CONTAMINATION_NEEDLES, "documents"
        ),
        "contamination_scan_join": contamination.contamination_oracle_sql(
            _CONTAMINATION_NEEDLES, "documents"
        ),
        "ngram_overlap_dist": contamination.ngram_overlap_oracle_sql(
            needles_sql=_OVERLAP_NEEDLES_SQL,
            n=_NGRAM_N,
        ),
        "ngram_overlap_scan": contamination.ngram_overlap_oracle_sql(
            needles_sql=_OVERLAP_NEEDLES_SQL,
            n=_NGRAM_N,
        ),
        "ccnet_ppl_buckets": _golden_sql("ccnet_ppl_buckets"),
        "ccnet_ppl_buckets_approx": _golden_sql("ccnet_ppl_buckets_approx"),
        "media_features": _golden_sql("media_features"),
        "byte_ngram_df_topk": _golden_sql("byte_ngram_df_topk"),
    }
