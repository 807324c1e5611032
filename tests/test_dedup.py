"""Dedup family: exact groups, MinHash-LSH recall vs exact Jaccard,
SimHash sanity."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from langid_py_spark.operators import dedup


@pytest.fixture(scope="module")
def near_dup_docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the rain "
        "falls on the quiet green hills of the northern valley today"
    )
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("quiet", "silent")),  # near dup
        (3, base.replace("quick", "slow").replace("rain", "snow")),  # near
        (4, "completely different text about spark query engines and shuffles here now"),
        (5, "another unrelated document mentioning parquet files and arrow batches only"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_exact_dedup(near_dup_docs):
    groups = dedup.exact_dedup_groups(near_dup_docs).collect()
    assert len(groups) == 1
    assert groups[0]["n_dups"] == 2 and groups[0]["keep_id"] == 0
    kept = {r["doc_id"] for r in dedup.exact_dedup_keep(near_dup_docs).collect()}
    assert kept == {0, 2, 3, 4, 5}


def test_minhash_recall_vs_exact(near_dup_docs):
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.jaccard_pairs_exact(near_dup_docs, threshold=0.7).collect()
    }
    assert (0, 1) in exact and (0, 2) in exact
    # shingle_k=1 → MinHash estimates WORD-set Jaccard, same quantity as
    # jaccard_pairs_exact (k=5 shingles estimate a stricter, order-aware
    # similarity by design)
    lsh = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(
            near_dup_docs, threshold=0.5, shingle_k=1
        ).collect()
    }
    assert exact <= lsh


def test_minhash_estimate_close_to_true(near_dup_docs):
    est = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in dedup.minhash_lsh_pairs(
            near_dup_docs, threshold=0.3, shingle_k=1
        ).collect()
    }
    true = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs_exact(near_dup_docs, threshold=0.0).collect()
    }
    assert est[(0, 1)] == 1.0
    for pair, e in est.items():
        # 64 hash functions → std(est) = sqrt(J(1-J)/64) <= 0.0625
        assert abs(e - true[pair]) < 0.25, (pair, e, true[pair])


def test_simhash_exact_dups_and_distance(spark, near_dup_docs):
    import pandas as _pd

    sh = dedup.simhash_udf()
    sig = {
        r["doc_id"]: r["s"]
        for r in near_dup_docs.select("doc_id", sh("text").alias("s")).collect()
    }
    ham = lambda a, b: bin((sig[a] ^ sig[b]) & ((1 << 64) - 1)).count("1")
    assert ham(0, 1) == 0  # identical docs → identical simhash
    assert ham(0, 2) < ham(0, 4)  # near dup closer than unrelated
    assert ham(0, 2) < ham(4, 5)
    # banding guarantee: hamming-0 pairs are always candidates
    cands = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_candidates(near_dup_docs, max_hamming=3).collect()
    }
    assert cands.get((0, 1)) == 0


def test_signatures_deterministic(spark, near_dup_docs):
    a = dedup.minhash_lsh_pairs(near_dup_docs, threshold=0.5).collect()
    b = dedup.minhash_lsh_pairs(near_dup_docs, threshold=0.5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_signatures_hashseed_independent():
    """Signatures must be identical across freshly spawned processes with
    different PYTHONHASHSEED — i.e. no builtin hash() anywhere in the
    kernels (two executors must agree on every fingerprint, including the
    sub-n-gram fallback path)."""
    import os
    import subprocess
    import sys

    snippet = (
        "import numpy as np, pandas as pd\n"
        "from langid_py_spark.operators import dedup\n"
        "texts = ['a', 'xy', '', 'hi there world', 'the quick brown fox jumps again']\n"
        "a, b = dedup._hash_params(64, seed=777)\n"
        "sh = dedup.simhash_batch(texts, 3, a, b)\n"
        "crcs, lens = dedup._word_crcs_batch(pd.Series(texts))\n"
        "mh, _ = dedup._rolling_hashes_batch(crcs, lens, k=5,\n"
        "    prime=dedup._FNV_PRIME, init=dedup._FNV_OFFSET)\n"
        "print(sh.tolist(), mh.tolist())\n"
    )
    outs = []
    for seed in ("1", "424242"):
        env = dict(os.environ, PYTHONHASHSEED=seed)
        r = subprocess.run(
            [sys.executable, "-c", snippet], env=env, capture_output=True, text=True
        )
        assert r.returncode == 0, r.stderr
        outs.append(r.stdout)
    assert outs[0] == outs[1]


def test_batch_matches_single_doc():
    """The batched concat-buffer path must equal the per-doc twin for every
    doc shape: empty, sub-window, exactly k, long."""
    import numpy as np

    texts = ["", "one two", "a b c d e", "many words here " * 20]
    crcs, lens = dedup._word_crcs_batch(pd.Series(texts))
    batch, counts = dedup._rolling_hashes_batch(
        crcs, lens, k=5, prime=dedup._FNV_PRIME, init=dedup._FNV_OFFSET
    )
    offs = np.concatenate(([0], np.cumsum(counts)))
    for i, t in enumerate(texts):
        single = dedup._shingle_hashes(t, k=5)
        assert batch[offs[i] : offs[i + 1]].tolist() == single.tolist(), t


def test_winnowing_guarantee(spark):
    """Winnowing guarantee: two docs sharing a substring of length
    >= k + window - 1 must share at least one fingerprint (and thus
    appear as a winnow_pairs candidate at min_shared=1)."""
    k, w = 8, 4
    shared = "a very long shared passage that exceeds the guarantee window length easily"
    rows = [
        (0, "prefix one " + shared + " suffix alpha"),
        (1, "totally different head " + shared + " other tail"),
        (2, "nothing in common with the others at all zzz qqq"),
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.winnow_pairs(docs, min_shared=1, k=k, window=w).collect()
    }
    assert (0, 1) in pairs


def test_winnow_fingerprints_deterministic_and_match_kernel(spark):
    """UDF output == direct kernel computation (batch boundaries and the
    Arrow round-trip change nothing)."""
    import numpy as np

    texts = ["hello world document", "", "ab", "hello world document"]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(4), "text": texts})
    )
    udf = dedup.winnow_fingerprints_udf(k=8, window=4)
    got = {
        r["doc_id"]: list(r["f"])
        for r in docs.select("doc_id", udf("text").alias("f")).collect()
    }
    datas = [t.encode("utf-8") for t in texts]
    lens = np.fromiter((len(d) for d in datas), dtype=np.int64, count=4)
    buf = np.frombuffer(b"".join(datas), dtype=np.uint8).astype(np.uint64)
    grams, counts = dedup._rolling_hashes_batch(
        buf, lens, k=8, prime=dedup._FNV_PRIME, init=dedup._FNV_OFFSET
    )
    want = dedup._window_min_batch(grams, counts, 4)
    for i in range(4):
        assert got[i] == want[i].astype(np.int64).tolist()
    assert got[0] == got[3]  # identical docs → identical fingerprints


def test_hot_bucket_guard(spark):
    """A fingerprint shared by everyone (boilerplate) must be dropped by
    the stop-fingerprint guard — the remaining genuine pairs survive."""
    boiler = " COMMON BOILERPLATE FOOTER TEXT REPEATED EVERYWHERE ALWAYS"
    rows = [(i, f"unique document body number {i} " * 3 + boiler) for i in range(10)]
    rows += [(100, "twin passage alpha beta gamma delta epsilon zeta eta theta" + boiler),
             (101, "twin passage alpha beta gamma delta epsilon zeta eta theta" + boiler)]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    # max_bucket=4: the boilerplate fingerprints (shared by all 12) drop,
    # the twins' unique-passage fingerprints (shared by 2) remain
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.winnow_pairs(docs, min_shared=1, k=8, window=4, max_bucket=4).collect()
    }
    assert (100, 101) in pairs
    assert all(p == (100, 101) for p in pairs), pairs


def test_rolling_hashes_property():
    """Property: the batched rolling-hash kernel equals a naive per-doc
    Python reference on arbitrary token sequences (random lengths incl.
    0, <k, ==k, >k mixed in one batch)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    K = 4
    P, INIT = dedup._FNV_PRIME, dedup._FNV_OFFSET

    def naive(tokens):
        if not tokens:
            return [int(INIT)]
        with np.errstate(over="ignore"):
            if len(tokens) < K:
                h = INIT
                for t in tokens:
                    h = h * P + np.uint64(t)
                return [int(h)]
            out = []
            for i in range(len(tokens) - K + 1):
                h = INIT
                for t in tokens[i : i + K]:
                    h = h * P + np.uint64(t)
                out.append(int(h))
            return out

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(
            st.lists(st.integers(min_value=0, max_value=2**32 - 1), max_size=12),
            min_size=1,
            max_size=8,
        )
    )
    def check(docs):
        lens = np.array([len(d) for d in docs], dtype=np.int64)
        flat = np.array([t for d in docs for t in d], dtype=np.uint64)
        got, counts = dedup._rolling_hashes_batch(flat, lens, k=K, prime=P, init=INIT)
        offs = np.concatenate(([0], np.cumsum(counts)))
        for i, d in enumerate(docs):
            assert got[offs[i] : offs[i + 1]].tolist() == naive(d), d

    check()


def test_c4_line_dedup(spark):
    """C4 line-level dedup: drops == a naive Python first-occurrence
    counter on hostile docs (shared banner lines, within-doc repeats,
    empty lines, null text); keep reconstructs the exact spliced text;
    empty lines are never dropped."""
    import hashlib

    import pandas as pd

    from langid_py_spark.operators.dedup import line_dedup_drops, line_dedup_keep

    rows = [
        (0, "unique alpha\nCOOKIE BANNER\nbody text one"),
        (1, "COOKIE BANNER\nunique beta\nCOOKIE BANNER"),   # cross-doc + within-doc
        (2, "body text one\n\nunique gamma"),                # empty line kept
        (3, None),
        (4, ""),
        (5, "COOKIE BANNER"),                                # whole doc duplicated line
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    docs = spark.createDataFrame(pdf)

    # naive twin: first occurrence by (doc_id, line_idx) survives
    seen: dict[str, tuple] = {}
    occurrences = []
    for did, t in rows:
        for idx, line in enumerate((t or "").split("\n")):
            if line == "":
                continue
            occurrences.append((did, idx, line))
    counts: dict[str, int] = {}
    for _, _, line in occurrences:
        counts[line] = counts.get(line, 0) + 1
    want_drops = set()
    for did, idx, line in sorted(occurrences):
        if counts[line] >= 2:
            if line in seen:
                want_drops.add((did, idx, hashlib.md5(line.encode()).hexdigest()))
            else:
                seen[line] = (did, idx)

    got = {
        (r.doc_id, r.line_idx, r.line_hash)
        for r in line_dedup_drops(docs).collect()
    }
    assert got == want_drops, (got, want_drops)

    kept = {r.doc_id: r.text for r in line_dedup_keep(docs).collect()}
    drop_idx = {(d, i) for d, i, _ in want_drops}
    for did, t in rows:
        lines = (t or "").split("\n")
        want = "\n".join(
            l for i, l in enumerate(lines) if (did, i) not in drop_idx
        )
        assert kept[did] == want, (did, kept[did], want)
    # doc 2's first line is a NON-first occurrence (doc 0 had it) ->
    # dropped; the empty structural line survives
    assert kept[2] == "\nunique gamma"
    assert kept[5] == ""  # only-line duplicated and non-first -> empty doc


def test_minhash_cross_pairs(spark):
    """Bipartite fuzzy decontamination: a paraphrased eval prompt (few
    words swapped) is caught against its corpus source; unrelated refs
    match nothing; the ref side is broadcast in the plan."""
    import pandas as pd

    from langid_py_spark.operators.dedup import minhash_cross_pairs

    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the fence and the birds sing in the morning sun "
        "as clouds drift across the summer sky above the quiet town"
    )
    words = base.split()
    # paraphrase: swap 3 words of ~33 (high shingle overlap remains)
    para = words[:]
    para[5], para[15], para[25] = "leaps", "observes", "float"
    corpus_rows = [(0, base), (1, "completely different text about spark query engines and shuffles " * 3)]
    ref_rows = [(100, " ".join(para)), (101, "nothing shared here at all zzz qqq www eee rrr ttt yyy uuu iii")]
    docs = spark.createDataFrame(pd.DataFrame(corpus_rows, columns=["doc_id", "text"]))
    ref = spark.createDataFrame(pd.DataFrame(ref_rows, columns=["ref_id", "text"]))

    out = minhash_cross_pairs(docs, ref, threshold=0.3)
    got = {(r.doc_id, r.ref_id): r.est_jaccard for r in out.collect()}
    assert (0, 100) in got and got[(0, 100)] >= 0.3, got
    assert not any(rid == 101 for _, rid in got), got

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan

    # determinism across invocations
    got2 = {(r.doc_id, r.ref_id): r.est_jaccard for r in minhash_cross_pairs(docs, ref, threshold=0.3).collect()}
    assert got == got2
