"""Adversarial smoke over the registered query surface: every
documents/embeddings-family queries() entry must SURVIVE (no crash, no
hang, sane schema) on a corpus of nulls, empties, astral-plane chars,
exotic whitespace, huge docs and adversarial repetition — shapes the
clean synthetic fixture never exercises. Value correctness is the
oracle gate's job; this is the totality gate."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

# queries that read ONLY documents/embeddings from sf_dir (TPC-H /
# events-family entries excluded; media/fixture entries self-generate)
DOC_QUERIES = [
    "rules_keepdrop", "scrub_pii", "token_stats", "doc_fingerprint",
    "lang_heuristic", "word_df_tally", "topk_words_per_lang",
    "topk_words_per_source", "exact_dedup_groups", "prefix_dedup_groups",
    "dedup_survivors", "jaccard_pairs", "quality_score",
    "repetition_stats", "balanced_sample", "hash_sample",
    "temperature_sample", "pack_sequences", "substring_dup_spans",
    "substring_spans_winnowed", "substring_dedup_cut",
    "quality_classifier", "classifier_sample", "line_dedup_drops",
    "line_dedup_keep", "corpus_pipeline", "minhash_cross_pairs",
    "union_distinct_top_words",
    "lang_histogram", "lang_source_cube", "langid_documents",
    "perplexity_documents", "minhash_pairs", "simhash_candidates",
    "winnow_pairs", "dedup_clusters", "near_dedup_keep",
    "contamination_scan", "contamination_scan_join",
    "ccnet_ppl_buckets", "ccnet_ppl_buckets_approx", "rank_languages",
    "byte_ngram_df_topk", "lm_ngram_topk", "hashed_tf_vectors",
    "text_dup_pairs", "semdedup_drops", "semdedup_keep",
    "token_budget_mixture", "cluster_safe_split",
    # embeddings family (hostile embeddings.parquet: zero vectors, 1e6
    # magnitudes — norm-guard and overflow exercise)
    "cosine_topk", "embedding_dup_pairs", "srp_ann_topk",
    "srp_dup_pairs", "ivf_ann_topk",
    # needle-scan family (self-generated needles over hostile docs)
    "ngram_overlap_scan", "ngram_overlap_dist",
    # events family (hostile events.parquet: NULL users/types, equal
    # timestamps, NaN values, one mega-user)
    "user_top_event", "sessionize_events", "running_totals",
]


@pytest.fixture(scope="module")
def hostile_sf_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("hostile_sf")
    rng = np.random.RandomState(13)
    texts = [
        None,
        "",
        " ",
        "\n\n\n",
        "\t\v\f\r ",                      # exotic whitespace incl. \x0b
        "😀🚀 emoji déjà vu naïve 日本語テスト 中文测试 العربية עברית",
        "x" * 60_000,                      # huge single-word doc
        ("spam " * 3000).strip(),          # huge repetitive doc
        "line\n" * 2000,                   # huge line-repetition doc
        "a",                               # single char
        "the quick brown fox jumps over the lazy dog " * 40,
        "1234567890 " * 100,               # digit-heavy
        "word nbsp emsp",        # unicode spaces
        "'; DROP TABLE documents; --",     # quoting hostility
        'quote " double \' single ` back', # more quoting
    ]
    n = 60
    rows = []
    langs = ["en", "de", "zh", None]
    for i in range(n):
        t = texts[i % len(texts)]
        rows.append(
            (
                i,
                t,
                langs[i % len(langs)],
                f"src{i % 3}",
                len(t) if t else 0,
            )
        )
    docs = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).astype({"doc_id": "int64", "n_chars": "int64"})
    emb = pd.DataFrame(
        {
            "vec_id": np.arange(40, dtype=np.int64),
            "embedding": [
                # dim 64 = the fixture-table contract the SRP/IVF queries
                # configure for (srp_signature_udf raises descriptively on
                # any other dim); include zero vectors (norm guard) and
                # huge magnitudes (overflow exercise)
                (np.zeros(64) if i % 7 == 0 else rng.randn(64) * (1e6 if i % 5 == 0 else 1.0)).astype(np.float32)
                for i in range(40)
            ],
        }
    )
    docs.to_parquet(root / "documents.parquet", index=False)
    emb.to_parquet(root / "embeddings.parquet", index=False)
    # hostile events: NULL users/types/values, identical timestamps
    # (tie-break exercise), a single mega-user (window skew), NaN value
    ev = pd.DataFrame(
        {
            "event_id": np.arange(50, dtype=np.int64),
            "ts": pd.to_datetime(
                ["2026-01-01 00:00:00"] * 10          # all-equal timestamps
                + list(pd.date_range("2026-01-01", periods=40, freq="17min"))
            ),
            "user_id": pd.array(
                [None] * 5 + [1] * 35 + [2, 2, 3, 3, 3] + [None] * 5,
                dtype="Int64",
            ),
            "event_type": ["click"] * 20 + [None] * 10 + ["view"] * 20,
            "value": [np.nan] * 5 + list(np.linspace(-1e9, 1e9, 45)),
            "props": ["{}"] * 50,
        }
    )
    # microsecond units: Spark's parquet reader rejects TIMESTAMP(NANOS)
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    ev.to_parquet(root / "events.parquet", index=False)
    return str(root)


def test_all_doc_queries_survive_hostile_corpus(spark, hostile_sf_dir):
    import __spark_entry__ as e

    qs = e.queries()
    missing = [k for k in DOC_QUERIES if k not in qs]
    assert not missing, missing
    failures = []
    for name in DOC_QUERIES:
        try:
            df = qs[name](spark, hostile_sf_dir)
            n = df.count()
            assert n >= 0
            assert len(df.schema.fields) >= 1
        except Exception as exc:  # collect all, report together
            failures.append((name, f"{type(exc).__name__}: {exc}"))
    assert not failures, "\n".join(f"{n}: {m[:300]}" for n, m in failures)
