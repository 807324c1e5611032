#!/usr/bin/env python3
"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "turns_per_sec": ..., "cpus": ...}

The flagship number is the full quality-filter pipeline
(scan→score→filter→scrub→vote→write) over the deterministic transcript
fixture at matching scale; operator queries run over the driver-provided
parquet tables. Each timing is the median of RUNS warm runs (first
iteration warms the JVM + Python UDF workers and is discarded).

Scaling evidence (north_rule N→4N): scripts/scaling_bench.py runs this
same pipeline at local[8] vs local[32] and writes BENCH/BASELINE.md.
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

RUNS = 3


def _cpu_jiffies() -> tuple[int, int]:
    """(total, steal) jiffies from /proc/stat — this sandbox VM sees
    intermittent host-side CPU steal (measured: whole-bench 2x swings
    with byte-identical code), so every bench line reports the steal
    share DURING the run; a reader comparing rounds should discount
    lines with high steal_pct rather than chase code regressions."""
    try:
        with open("/proc/stat") as f:
            vals = [int(x) for x in f.readline().split()[1:]]
        return sum(vals), vals[7] if len(vals) > 7 else 0
    except (OSError, ValueError):
        return 0, 0


def _calibrate() -> tuple[float, float, float]:
    """Fixed-work contention probes (r06, VERDICT r05 item 3): the r05
    driver bench regressed 28.4k→18.9k turns/s on UNCHANGED code while
    steal read only 0.92% — ambient memory-bandwidth/SMT contention is
    invisible to /proc/stat. Two single-threaded NumPy probes expose it:

    * calib_gflops — 256x256 einsum matmul (einsum never dispatches to
      threaded BLAS, so the probe is deterministic and single-thread):
      CPU/SMT-contention channel.
    * calib_membw_gbs — 64 MB streaming sum: DRAM-bandwidth channel.
    * calib_mt_gflops — the SAME einsum on 32 concurrent threads
      (NumPy releases the GIL), aggregate GFLOP/s at full bench width:
      host-side CPU capping/steal often only bites under multi-core
      load — measured r06: a bench with every row 2x slow read NORMAL
      single-thread calib but 4.2% steal, i.e. the single-thread
      probes alone are not sufficient.

    Run before AND after the timed section; the MIN of each pair is
    reported (contention can start mid-bench). Readers should discount
    a bench line whose calib numbers are well below the round's
    committed clean-window values instead of chasing code regressions.
    """
    import numpy as np

    rng = np.random.RandomState(0)
    a = rng.rand(256, 256)
    b = rng.rand(256, 256)
    # warm
    np.einsum("ij,jk->ik", a, b)
    t0 = time.perf_counter()
    it = 0
    while time.perf_counter() - t0 < 0.3:
        np.einsum("ij,jk->ik", a, b)
        it += 1
    gflops = it * 2 * 256**3 / (time.perf_counter() - t0) / 1e9

    big = rng.rand(8_000_000)  # 64 MB >> LLC: streams DRAM
    big.sum()
    t0 = time.perf_counter()
    it = 0
    while time.perf_counter() - t0 < 0.3:
        big.sum()
        it += 1
    membw = it * big.nbytes / (time.perf_counter() - t0) / 1e9

    import os
    import threading

    nthr = min(32, os.cpu_count() or 8)
    counts = [0] * nthr
    stop = time.perf_counter() + 0.4

    def burn(slot: int) -> None:
        aa, bb = a.copy(), b.copy()
        while time.perf_counter() < stop:
            np.einsum("ij,jk->ik", aa, bb)
            counts[slot] += 1

    threads = [threading.Thread(target=burn, args=(s,)) for s in range(nthr)]
    t0 = time.perf_counter()
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    mt = sum(counts) * 2 * 256**3 / (time.perf_counter() - t0) / 1e9
    return round(gflops, 3), round(membw, 2), round(mt, 3)


def _sf_from_dir(sf_dir: str) -> float:
    name = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_from_dir(sf_dir)

    from pyspark.sql import functions as F

    from langid_py_spark.fixtures.transcripts import ensure_transcripts
    from langid_py_spark.spark.pipeline import run_pipeline
    from langid_py_spark.spark.session import get_spark

    spark = get_spark(cores=cpus, shuffle_partitions=cpus, app_name="bench")
    transcripts = ensure_transcripts(spark, sf)
    n_turns = spark.read.parquet(transcripts).count()

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()

    def run_noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    out_dir = str(REPO / ".cache" / "bench_out")

    def bench_pipeline() -> None:
        shutil.rmtree(out_dir, ignore_errors=True)
        run_pipeline(spark, transcripts, out_dir, resume=False)

    # 10k-needle decontamination list, built deterministically from the
    # corpus itself (substrings => guaranteed hits) + absent canaries;
    # built OUTSIDE the timed region — a real list is a static artifact
    import numpy as np
    import pandas as pd

    from langid_py_spark.operators.contamination import contamination_scan_join

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

    operator_benches = {
        "pipeline_full": bench_pipeline,
        "langid_score": lambda: run_noop(
            qs["langid_documents"](spark, sf_dir)
        ),
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
                _needles,
                k=16,
            )
        ),
        "ccnet_approx": lambda: run_noop(
            qs["ccnet_ppl_buckets_approx"](spark, sf_dir)
        ),
        # r05 additions: sub-document substring dedup (pure-Catalyst
        # position explode + two window counts) and the classifier tier
        # (one codegen'd dot product — should be scan-bound)
        "substring_spans": lambda: run_noop(
            qs["substring_dup_spans"](spark, sf_dir)
        ),
        "quality_clf": lambda: run_noop(qs["quality_classifier"](spark, sf_dir)),
        "line_dedup": lambda: run_noop(qs["line_dedup_keep"](spark, sf_dir)),
        # r06: the composed seven-stage corpus DAG (dedup -> line dedup
        # -> span cut -> decontam -> rules -> clf sample -> pack). Each
        # construction persists fresh stage boundaries; clear the cache
        # first so repeated timed runs don't accumulate stale entries.
        "corpus_pipeline": lambda: (
            spark.catalog.clearCache(),
            run_noop(qs["corpus_pipeline"](spark, sf_dir)),
        )[-1],
        # r06 late additions: the embedding->semantic-dedup tier (dfreq
        # scan + Arrow embed map + k-means fit + cluster-pruning) and
        # the integer-only mixture builder (window + broadcast joins).
        # semdedup persists the embedding frame internally — clear the
        # cache so timed runs measure the full recompute.
        "semdedup": lambda: (
            spark.catalog.clearCache(),
            run_noop(qs["semdedup_drops"](spark, sf_dir)),
        )[-1],
        "token_mixture": lambda: run_noop(
            qs["token_budget_mixture"](spark, sf_dir)
        ),
    }

    calib_pre = _calibrate()
    jif0, steal0 = _cpu_jiffies()
    timings: dict[str, float] = {}
    for name, fn in operator_benches.items():
        fn()  # warm (JVM codegen + python workers + page cache)
        samples = []
        for _ in range(RUNS):
            t0 = time.time()
            fn()
            samples.append(time.time() - t0)
        timings[name] = round(statistics.median(samples), 3)

    calib_post = _calibrate()
    jif1, steal1 = _cpu_jiffies()
    steal_pct = (
        round(100.0 * (steal1 - steal0) / max(jif1 - jif0, 1), 2)
        if jif1 > jif0
        else None
    )
    total = round(sum(timings.values()), 3)
    result = {
        "metric": "quality_filter_pipeline_and_operators_median_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "transcript_turns": n_turns,
        "turns_per_sec": round(n_turns / timings["pipeline_full"], 1),
        "host_cpu_steal_pct": steal_pct,
        # clean-window reference values: see BENCH/BASELINE.md (round-6
        # calibration note). Lines with calib well below those were
        # measured under ambient contention — discount, don't diff.
        "calib_gflops": min(calib_pre[0], calib_post[0]),
        "calib_membw_gbs": min(calib_pre[1], calib_post[1]),
        "calib_mt_gflops": min(calib_pre[2], calib_post[2]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
