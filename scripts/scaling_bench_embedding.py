#!/usr/bin/env python3
"""N→4N scaling evidence for the embedding tier (r06):
`doc_embeddings` — text → dense hashed-TF-IDF vectors
(operators/embedding.py), the pass that feeds the ANN/SemDeDup family.

Each timed run is the operator's full contract: the one-scan
dim-bounded document-frequency pass (dim+1 shuffle rows per Arrow
batch + a ≤dim driver pull) AND the corpus-scale Arrow embedding map,
written to the noop sink. Both phases are embarrassingly parallel maps
— the only sync point is the tiny dfreq collect — so this row pins the
claim that the tier's wall-clock is scan-bound, not shuffle-bound.

Protocol mirrors scripts/scaling_bench_minhash.py exactly: same input,
local[N] vs local[4N] in separate JVMs, median of 3 warm runs (first
run discarded), tmpfs shuffle dirs, 2 MB scan splits, busy-loop CPU
ceiling measured beside the result. Machine must be otherwise idle
(CLAUDE.md bench-contention protocol).

Usage: python scripts/scaling_bench_embedding.py [sf] [N]  (default 1.0, 2)
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from scaling_bench import hardware_ceiling  # noqa: E402

DIM = 256

CHILD = """
import sys, time, json, statistics, os
sys.path.insert(0, {repo!r})
os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
from langid_py_spark.spark.session import get_spark
from langid_py_spark.operators import embedding
spark = get_spark(cores={cores}, shuffle_partitions={cores}, app_name="scaling_embed",
                  extra_conf={{"spark.sql.files.maxPartitionBytes": "2m",
                               "spark.local.dir": "/dev/shm/spark-local"}})
docs = spark.read.parquet({src!r})
n = docs.count()
samples = []
for i in range(4):  # first run = warmup, discarded
    t0 = time.time()
    emb = embedding.doc_embeddings(docs, dim={dim})
    emb.write.format("noop").mode("overwrite").save()
    samples.append(time.time() - t0)
med = statistics.median(samples[1:])
print("RESULT " + json.dumps({{"cores": {cores}, "sec": med, "docs": n}}))
"""


def run_at(cores: int, src: str) -> dict:
    code = CHILD.format(repo=str(REPO), cores=cores, src=src, dim=DIM)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
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

    from pyspark.sql import functions as F

    from langid_py_spark.fixtures.transcripts import ensure_transcripts
    from langid_py_spark.spark.session import get_spark

    src = str(REPO / ".cache" / f"minhash_docs_sf{sf}")
    if not (Path(src) / "_SUCCESS").exists():
        spark = get_spark(cores=16, shuffle_partitions=16, app_name="embed_gen")
        t = spark.read.parquet(ensure_transcripts(spark, sf))
        docs = t.select(
            F.xxhash64("conv_id", "turn_idx").alias("doc_id"), "text"
        ).repartition(64)
        docs.write.mode("overwrite").parquet(src)
        spark.stop()

    ceiling = hardware_ceiling(n)
    rn = run_at(n, src)
    r4n = run_at(4 * n, src)
    tpn = rn["docs"] / rn["sec"]
    tp4n = r4n["docs"] / r4n["sec"]
    eff = (tp4n / tpn) / 4
    result = {
        "op": f"doc_embeddings dim={DIM} (dense hashed TF-IDF)",
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
            f"| sf{sf} doc_embeddings dim{DIM} | {result['docs']} | {n} | "
            f"{result['localN_sec']} | {result['local4N_sec']} | "
            f"{result['localN_docs_per_sec']} | {result['local4N_docs_per_sec']} | "
            f"{result['scaling_efficiency_n_to_4n']} | "
            f"{result['hardware_cpu_ceiling']} | "
            f"{result['efficiency_vs_ceiling']} |\n"
        )


if __name__ == "__main__":
    main()
