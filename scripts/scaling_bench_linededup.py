#!/usr/bin/env python3
"""N→4N scaling evidence for C4 line-level dedup (line_dedup_drops) —
one shuffled row per corpus LINE through the md5(line) window.

Protocol identical to scripts/scaling_bench_spans.py (tmpfs shuffle,
2 MB splits, separate JVMs, median of 3 warm runs, busy-loop ceiling,
idle machine). Input: the shared documents-shaped transcripts table;
turns are single-line, so the line corpus is built as in the driver
query (neighbor concat → every interior text duplicated as a line in
two docs — real cross-doc line duplication at full scale).

Usage: python scripts/scaling_bench_linededup.py [sf] [N]  (default 1.0, 2)
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
from langid_py_spark.operators.dedup import line_dedup_drops
spark = get_spark(cores={cores}, shuffle_partitions={cores}, app_name="scaling_linededup",
                  extra_conf={{"spark.sql.files.maxPartitionBytes": "2m",
                               "spark.local.dir": "/dev/shm/spark-local"}})
src = {src!r}
corpus = spark.read.parquet(src)  # pre-materialized 2-line corpus
n = corpus.count()
samples = []
for i in range(4):  # first run = warmup, discarded
    t0 = time.time()
    line_dedup_drops(corpus).write.format("noop").mode("overwrite").save()
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
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from pyspark.sql import functions as F

    from langid_py_spark.fixtures.transcripts import ensure_transcripts
    from langid_py_spark.spark.session import get_spark

    # materialize the LINE corpus (2-line docs with real cross-doc line
    # duplication) OUTSIDE the timed region: sequential ids via a
    # one-off global row_number (the transcripts table's hash ids make
    # a doc_id+1 neighbor join vacuous — setup bug caught on first run),
    # then neighbor concat, written as a 64-split table.
    src = str(REPO / ".cache" / f"line_corpus_sf{sf}")
    if not (Path(src) / "_SUCCESS").exists():
        from pyspark.sql import Window

        spark = get_spark(cores=16, shuffle_partitions=16, app_name="ld_gen")
        t = spark.read.parquet(ensure_transcripts(spark, sf))
        docs = t.select(
            F.xxhash64("conv_id", "turn_idx").alias("hid"), "text"
        ).select(
            F.row_number().over(Window.orderBy("hid")).alias("doc_id"), "text"
        )
        a = docs.select("doc_id", F.col("text").alias("_ta"))
        b = docs.select((F.col("doc_id") - 1).alias("doc_id"), F.col("text").alias("_tb"))
        corpus = a.join(b, "doc_id").select(
            "doc_id", F.concat("_ta", F.lit("\n"), "_tb").alias("text")
        ).repartition(64)
        corpus.write.mode("overwrite").parquet(src)
        spark.stop()

    ceiling = hardware_ceiling(n)
    rn = run_at(n, src)
    r4n = run_at(4 * n, src)
    tpn = rn["docs"] / rn["sec"]
    tp4n = r4n["docs"] / r4n["sec"]
    eff = (tp4n / tpn) / 4
    result = {
        "op": "line_dedup_drops",
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
            f"| sf{sf} line dedup (2-line docs) | {result['docs']} | {n} | "
            f"{result['localN_sec']} | {result['local4N_sec']} | "
            f"{result['localN_docs_per_sec']} | {result['local4N_docs_per_sec']} | "
            f"{result['scaling_efficiency_n_to_4n']} | "
            f"{result['hardware_cpu_ceiling']} | "
            f"{result['efficiency_vs_ceiling']} |\n"
        )


if __name__ == "__main__":
    main()
