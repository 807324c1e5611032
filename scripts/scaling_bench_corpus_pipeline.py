#!/usr/bin/env python3
"""N→4N scaling evidence for the COMPOSED corpus pipeline (query 57):
exact dedup → line dedup → span cut → decontam → rules → classifier
sampling → packing, end to end — the north-rule two-cluster-size
criterion applied to the full training-data DAG rather than a single
operator.

Protocol identical to the other scaling scripts (tmpfs shuffle, 2 MB
splits, separate JVMs per parallelism level, median of 3 warm runs,
busy-loop hardware ceiling, idle machine — CLAUDE.md contention rules).
Input: the same pre-materialized 2-line corpus as the line-dedup row
(real cross-document line duplication at full scale). Needles are 100
deterministic substrings of the corpus itself (guaranteed hits) + 5
absent canaries, built OUTSIDE the timed region.

Usage: python scripts/scaling_bench_corpus_pipeline.py [sf] [N]
(default 1.0, 2)
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from scaling_bench import hardware_ceiling  # noqa: E402

CHILD = """
import sys, time, json, statistics, os
sys.path.insert(0, {repo!r})
os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
from pyspark.sql import functions as F
from langid_py_spark.spark.session import get_spark
from langid_py_spark.operators.corpus_pipeline import corpus_pipeline
spark = get_spark(cores={cores}, shuffle_partitions={cores}, app_name="scaling_corpus",
                  extra_conf={{"spark.sql.files.maxPartitionBytes": "2m",
                               "spark.local.dir": "/dev/shm/spark-local"}})
src = {src!r}
needles = json.load(open({needles!r}))
corpus = spark.read.parquet(src)
n = corpus.count()
samples = []
for i in range(4):  # first run = warmup, discarded
    spark.catalog.clearCache()  # fresh stage persists per run
    t0 = time.time()
    corpus_pipeline(corpus, needles).write.format("noop").mode("overwrite").save()
    samples.append(time.time() - t0)
med = statistics.median(samples[1:])
print("RESULT " + json.dumps({{"cores": {cores}, "sec": med, "docs": n}}))
"""


def run_at(cores: int, src: str, needles_path: str) -> dict:
    code = CHILD.format(repo=str(REPO), cores=cores, src=src, needles=needles_path)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=7200
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT ") :])
    raise RuntimeError(
        f"no RESULT from local[{cores}]:\n{out.stdout[-2000:]}\n{out.stderr[-3000:]}"
    )


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from langid_py_spark.fixtures.transcripts import ensure_transcripts
    from langid_py_spark.spark.session import get_spark

    # reuse (or build) the line-dedup scaling corpus
    src = str(REPO / ".cache" / f"line_corpus_sf{sf}")
    if not (Path(src) / "_SUCCESS").exists():
        from pyspark.sql import Window

        spark = get_spark(cores=16, shuffle_partitions=16, app_name="cp_gen")
        t = spark.read.parquet(ensure_transcripts(spark, sf))
        docs = t.select(
            F.xxhash64("conv_id", "turn_idx").alias("hid"), "text"
        ).select(
            F.row_number().over(Window.orderBy("hid")).alias("doc_id"), "text"
        )
        a = docs.select("doc_id", F.col("text").alias("_ta"))
        b = docs.select(
            (F.col("doc_id") - 1).alias("doc_id"), F.col("text").alias("_tb")
        )
        corpus = (
            a.join(b, "doc_id")
            .select("doc_id", F.concat("_ta", F.lit("\n"), "_tb").alias("text"))
            .repartition(64)
        )
        corpus.write.mode("overwrite").parquet(src)
        spark.stop()

    # deterministic needle list from the corpus (outside timed region)
    needles_path = str(REPO / ".cache" / f"cp_needles_sf{sf}.json")
    if not Path(needles_path).exists():
        pdf = pd.read_parquet(src, columns=["text"]).head(5000)
        rng = np.random.RandomState(42)
        texts = pdf["text"].fillna("").tolist()
        needles: list[str] = []
        for _ in range(200):
            t = texts[rng.randint(len(texts))]
            if len(t) < 40:
                continue
            ln = int(rng.randint(20, 40))
            s = int(rng.randint(max(1, len(t) - ln)))
            needles.append(t[s : s + ln])
        needles = list(dict.fromkeys(needles))[:100]
        needles += [f"zzz-canary-{i:02d}" for i in range(5)]
        json.dump(needles, open(needles_path, "w"))

    ceiling = hardware_ceiling(n)
    rn = run_at(n, src, needles_path)
    r4n = run_at(4 * n, src, needles_path)
    tpn = rn["docs"] / rn["sec"]
    tp4n = r4n["docs"] / r4n["sec"]
    eff = (tp4n / tpn) / 4
    result = {
        "op": "corpus_pipeline (7-tier composed)",
        "sf": sf,
        "docs": rn["docs"],
        "n_cores": n,
        "localN_sec": round(rn["sec"], 2),
        "local4N_sec": round(r4n["sec"], 2),
        "localN_docs_per_sec": round(tpn, 1),
        "local4N_docs_per_sec": round(tp4n, 1),
        "scaling_efficiency_n_to_4n": round(eff, 3),
        "hardware_cpu_ceiling": round(ceiling, 3),
        "efficiency_vs_ceiling": round(eff / ceiling, 3),
    }
    print(json.dumps(result))

    bench_md = REPO / "BENCH" / "BASELINE.md"
    with bench_md.open("a") as f:
        f.write(
            f"| sf{sf} corpus_pipeline (7-tier) | {result['docs']} | {n} | "
            f"{result['localN_sec']} | {result['local4N_sec']} | "
            f"{result['localN_docs_per_sec']} | {result['local4N_docs_per_sec']} | "
            f"{result['scaling_efficiency_n_to_4n']} | "
            f"{result['hardware_cpu_ceiling']} | "
            f"{result['efficiency_vs_ceiling']} |\n"
        )


if __name__ == "__main__":
    main()
