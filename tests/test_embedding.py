"""Hashed TF-IDF embedding generation (operators/embedding.py)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from langid_py_spark.operators import embedding as E

# unicode, repeated tokens, \x0b (inside a "word" under the explicit
# ws class), empty/whitespace-only, single token, hash-collision bait
HOSTILE = [
    (0, "the quick brown fox the quick"),
    (1, "naïve café — naïve café über alles"),
    (2, "日本語 テキスト 日本語"),
    (3, ""),
    (4, "   \t\n  "),
    (5, "solo"),
    (6, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
    (7, "vert\x0bical stays one token"),
    (8, "Mixed CASE mixed case MIXED Case"),
]


@pytest.fixture(scope="module")
def hostile_df(spark):
    return spark.createDataFrame(HOSTILE, "doc_id long, text string")


def test_sparse_matches_duckdb_on_hostile(spark, hostile_df, tmp_path):
    src = str(tmp_path / "hostile.parquet")
    pd.DataFrame(HOSTILE, columns=["doc_id", "text"]).to_parquet(src, index=False)
    got = (
        E.hashed_tf_vectors(hostile_df)
        .toPandas()
        .sort_values(["doc_id", "bucket"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"create view documents as select * from read_parquet('{src}')")
    exp = (
        con.execute(E.hashed_tf_vectors_oracle_sql())
        .fetchdf()
        .sort_values(["doc_id", "bucket"])
        .reset_index(drop=True)
        .astype({"doc_id": "int64", "bucket": "int64", "tf": "int64", "df_bucket": "int64"})
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=True)
    # non-vacuity: repeated tokens actually aggregate
    assert got[got.doc_id == 0].tf.max() >= 2


def test_batch_kernel_equals_naive_twin():
    texts = [t for _, t in HOSTILE]
    mat = E._batch_tf_matrix(texts, E.DEFAULT_DIM)
    for i, t in enumerate(texts):
        assert np.array_equal(mat[i], E.py_tf_vector(t)), i
    # batch-composition independence: singleton batches give same rows
    for i, t in enumerate(texts):
        assert np.array_equal(E._batch_tf_matrix([t], E.DEFAULT_DIM)[0], mat[i])


def test_dense_embeddings_match_naive(spark, hostile_df):
    emb = {
        r["doc_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in E.doc_embeddings(hostile_df).collect()
    }
    sparse = E.hashed_tf_vectors(hostile_df).toPandas()
    dfreq = sparse.drop_duplicates(["bucket"])[["bucket", "df_bucket"]]
    idf = E.idf_vector(
        list(dfreq.itertuples(index=False, name=None)), len(HOSTILE), E.DEFAULT_DIM
    )
    for did, text in HOSTILE:
        v = E.py_tf_vector(text) * idf
        n = np.sqrt((v * v).sum())
        if n > 0:
            v = v / n
        assert np.allclose(emb[did], v, atol=1e-6), did
    # empty/whitespace docs -> zero vector, present in output
    assert np.all(emb[3] == 0.0) and np.all(emb[4] == 0.0)
    # non-empty docs are unit-norm
    assert abs(np.linalg.norm(emb[0]) - 1.0) < 1e-5


def test_dense_doc_freq_matches_catalyst_path(spark, hostile_df):
    """The one-scan batch-presence dfreq (dim+1 rows per batch shuffle)
    must equal the Catalyst explode→groupBy path exactly — integer
    counts, so any divergence is a bucket-identity bug."""
    dfreq, n_docs = E.dense_doc_freq(hostile_df)
    exp = {
        (int(r["bucket"]), int(r["df_bucket"]))
        for r in E.bucket_doc_freq(E.hashed_tf(hostile_df)).collect()
    }
    assert set(dfreq) == exp
    assert n_docs == len(HOSTILE)
    # batch-boundary invariance: single-row partitions give same totals
    dfreq1, n1 = E.dense_doc_freq(hostile_df.repartition(len(HOSTILE)))
    assert sorted(dfreq1) == sorted(dfreq) and n1 == n_docs


def test_case_sensitivity_is_deliberate():
    a = E.py_tf_vector("Token")
    b = E.py_tf_vector("token")
    assert not np.array_equal(a, b)  # no cross-engine lower() trap


def test_embeddings_feed_ann(spark):
    """Generated embeddings slot into the similarity family unchanged."""
    from langid_py_spark.operators import similarity

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .orderBy("doc_id")
        .limit(60)
    )
    emb = E.doc_embeddings(docs).withColumnRenamed("doc_id", "vec_id")
    queries_df = emb.orderBy("vec_id").limit(2).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = similarity.cosine_topk_bruteforce(emb, queries_df, k=3).collect()
    assert len(out) == 6  # 2 queries x top-3 (self excluded)
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r["qid"], []).append((r["rk"], r["cos_sim"]))
    for qid, lst in by_q.items():
        lst.sort()
        sims = [s for _, s in lst]
        assert sims == sorted(sims, reverse=True)  # ranked descending
        assert all(-1.0 - 1e-9 <= s <= 1.0 + 1e-9 for s in sims)


def test_custom_dim_and_determinism(spark, hostile_df):
    a = E.hashed_tf_vectors(hostile_df, dim=16).toPandas()
    b = E.hashed_tf_vectors(hostile_df, dim=16).toPandas()
    key = ["doc_id", "bucket"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )
    assert a.bucket.max() < 16
