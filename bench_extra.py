#!/usr/bin/env python3
"""Per-query iteration harness for the r07 optimization round.

bench.py is FROZEN for measurement (driver contract); this file exists
so individual queries can be timed in isolation (guide §1.4 noop sink)
without re-running the whole suite. Same session settings, same data
dirs, same noop-sink methodology as bench.py; prints one JSON line.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py [name ...]
  names default to all bench queries. RUNS warm runs after 1 warmup,
  median reported (same as bench.py).
"""
from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

RUNS = int(os.environ.get("BENCH_EXTRA_RUNS", "3"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    only = sys.argv[1:]

    from langid_py_spark.fixtures.transcripts import ensure_transcripts
    from langid_py_spark.spark.pipeline import run_pipeline
    from langid_py_spark.spark.session import get_spark

    spark = get_spark(cores=cpus, shuffle_partitions=cpus, app_name="bench_extra")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()

    def run_noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    out_dir = str(REPO / ".cache" / "bench_out_extra")

    def bench_pipeline() -> None:
        transcripts = ensure_transcripts(spark, sf)
        shutil.rmtree(out_dir, ignore_errors=True)
        run_pipeline(spark, transcripts, out_dir, resume=False)

    import numpy as np
    import pandas as pd

    from langid_py_spark.operators.contamination import contamination_scan_join

    def build_needles():
        _docs_pdf = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        _rng = np.random.RandomState(42)
        _texts = _docs_pdf["text"].fillna("").tolist()
        _needles = []
        for _ in range(10_500):
            t = _texts[_rng.randint(len(_texts))]
            ln = _rng.randint(30, 80)
            s = _rng.randint(max(1, len(t) - ln))
            _needles.append(t[s : s + ln])
        _needles = list(dict.fromkeys(_needles))[:10_000]
        _needles += [f"zzz-canary-{i:05d}" for i in range(50)]
        return _needles

    operator_benches = {
        "pipeline_full": bench_pipeline,
        "langid_score": lambda: run_noop(qs["langid_documents"](spark, sf_dir)),
        "rules_keepdrop": lambda: run_noop(qs["rules_keepdrop"](spark, sf_dir)),
        "scrub_pii": lambda: run_noop(qs["scrub_pii"](spark, sf_dir)),
        "word_df_tally": lambda: run_noop(qs["word_df_tally"](spark, sf_dir)),
        "exact_dedup": lambda: run_noop(qs["exact_dedup_groups"](spark, sf_dir)),
        "minhash_pairs": lambda: run_noop(qs["minhash_pairs"](spark, sf_dir)),
        "cosine_topk": lambda: run_noop(qs["cosine_topk"](spark, sf_dir)),
        "pricing_summary": lambda: run_noop(qs["pricing_summary"](spark, sf_dir)),
        "top_customers": lambda: run_noop(qs["top_customers"](spark, sf_dir)),
        "contamination_10k": lambda: run_noop(
            contamination_scan_join(
                entry_mod._spread(
                    spark, spark.read.parquet(f"{sf_dir}/documents.parquet")
                ),
                build_needles.cache,
                k=16,
            )
        ),
        "ccnet_approx": lambda: run_noop(qs["ccnet_ppl_buckets_approx"](spark, sf_dir)),
        "substring_spans": lambda: run_noop(qs["substring_dup_spans"](spark, sf_dir)),
        "quality_clf": lambda: run_noop(qs["quality_classifier"](spark, sf_dir)),
        "line_dedup": lambda: run_noop(qs["line_dedup_keep"](spark, sf_dir)),
        "corpus_pipeline": lambda: (
            spark.catalog.clearCache(),
            run_noop(qs["corpus_pipeline"](spark, sf_dir)),
        )[-1],
        "semdedup": lambda: (
            spark.catalog.clearCache(),
            run_noop(qs["semdedup_drops"](spark, sf_dir)),
        )[-1],
        "token_mixture": lambda: run_noop(qs["token_budget_mixture"](spark, sf_dir)),
    }
    build_needles.cache = None
    if (not only) or ("contamination_10k" in only):
        build_needles.cache = build_needles()

    names = only or list(operator_benches)
    timings = {}
    for name in names:
        fn = operator_benches[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        fn()  # warm
        samples = []
        for _ in range(RUNS):
            t0 = time.time()
            fn()
            samples.append(time.time() - t0)
        timings[name] = {
            "median": round(statistics.median(samples), 3),
            "min": round(min(samples), 3),
            "samples": [round(s, 3) for s in samples],
        }
        print(json.dumps({name: timings[name]}), flush=True)
    print(json.dumps({"sf": sf, "cpus": cpus, "timings": timings}))


if __name__ == "__main__":
    main()
