#!/usr/bin/env python3
"""N→4N scaling evidence for sub-document substring dedup — the
round-5 operator with the heaviest new shuffle (one row PER CHARACTER
POSITION through the ghash window-count).

Protocol mirrors scripts/scaling_bench_minhash.py: same input, local[N]
vs local[4N] in separate JVMs, median of 3 warm runs each (first
discarded), tmpfs shuffle dirs, 2 MB splits, busy-loop ceiling beside
the result. Machine otherwise idle (CLAUDE.md bench-contention rule).

Input: the documents-shaped transcripts table at sf (shared with the
minhash/decontam scaling benches). Work per run = full exact
substring_dup_spans at k=30 to a noop sink.

Usage: python scripts/scaling_bench_spans.py [sf] [N]   (default 0.3, 4)
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
from langid_py_spark.spark.session import get_spark
from langid_py_spark.operators.spandedup import substring_dup_spans
spark = get_spark(cores={cores}, shuffle_partitions={cores}, app_name="scaling_spans",
                  extra_conf={{"spark.sql.files.maxPartitionBytes": "2m",
                               "spark.local.dir": "/dev/shm/spark-local"}})
src = {src!r}
docs = spark.read.parquet(src)
n = docs.count()
samples = []
for i in range(4):  # first run = warmup, discarded
    t0 = time.time()
    out = substring_dup_spans(docs, k=30)
    out.write.format("noop").mode("overwrite").save()
    samples.append(time.time() - t0)
med = statistics.median(samples[1:])
print("RESULT " + json.dumps({{"cores": {cores}, "sec": med, "docs": n}}))
"""


def run_at(cores: int, src: str) -> dict:
    code = CHILD.format(repo=str(REPO), cores=cores, src=src)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=5400
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT ") :])
    raise RuntimeError(
        f"no RESULT from local[{cores}]:\n{out.stdout[-2000:]}\n{out.stderr[-3000:]}"
    )


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.3
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from pyspark.sql import functions as F

    from langid_py_spark.fixtures.transcripts import ensure_transcripts
    from langid_py_spark.spark.session import get_spark

    src = str(REPO / ".cache" / f"minhash_docs_sf{sf}")
    if not (Path(src) / "_SUCCESS").exists():
        spark = get_spark(cores=16, shuffle_partitions=16, app_name="spans_gen")
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
        "op": "substring_dup_spans_k30",
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
            f"| sf{sf} substring spans k30 | {result['docs']} | {n} | "
            f"{result['localN_sec']} | {result['local4N_sec']} | "
            f"{result['localN_docs_per_sec']} | {result['local4N_docs_per_sec']} | "
            f"{result['scaling_efficiency_n_to_4n']} | "
            f"{result['hardware_cpu_ceiling']} | "
            f"{result['efficiency_vs_ceiling']} |\n"
        )


if __name__ == "__main__":
    main()
