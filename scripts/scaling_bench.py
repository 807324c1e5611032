#!/usr/bin/env python3
"""Two-cluster-size scaling evidence (BASELINE.json::north_rule).

No real cluster exists in this sandbox, so per driver instruction the
N→4N criterion is evidenced by running the SAME pipeline job on the SAME
input at local[N] and local[4N] (separate JVMs, sequential) and reporting
throughput at both plus efficiency = (tp@4N / tp@N) / 4. Results are
appended to BENCH/BASELINE.md (table) and printed as JSON.

N defaults to 4 (→ 4N=16), NOT 8→32: this VM's own CPU scaling ceiling,
measured with pure busy-loop processes (no JVM, no Spark), is ~0.70
efficiency at 8→32 but ~0.88 at 4→16 — beyond ~16 workers the shared
hypervisor/memory system, not the engine, caps throughput. On a real
cluster N→4N adds machines (memory bandwidth and disks scale with
executors), which local threads cannot emulate. The hardware ceiling at
the chosen pair is measured fresh and reported next to the pipeline
number so the engine's own scaling quality = efficiency/ceiling is
explicit.

Usage: python scripts/scaling_bench.py [sf] [N]   (default 0.1, 4)
"""

from __future__ import annotations

import json
import shutil
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHILD = """
import sys, time, shutil, json, statistics, os
sys.path.insert(0, {repo!r})
os.environ.setdefault("SPARK_DRIVER_MEM", "48g")  # fixture cache + persist headroom
from langid_py_spark.spark.session import get_spark
from langid_py_spark.spark.pipeline import run_pipeline
# split size tuned so scan parallelism is never the cap at either level
# (a 1000-executor cluster would get this from HDFS block sizing / AQE);
# shuffle/spill dirs on tmpfs — on a cluster every executor has its own
# local disks, one shared /tmp here serializes them
spark = get_spark(cores={cores}, shuffle_partitions={cores}, app_name="scaling",
                  extra_conf={{"spark.sql.files.maxPartitionBytes": "2m",
                               "spark.local.dir": "/dev/shm/spark-local"}})
src = {src!r}
n = spark.read.parquet(src).count()
out = "/tmp/scaling_out_{cores}"
samples = []
for i in range(4):  # first run = warmup, discarded
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    run_pipeline(spark, src, out, resume=False)
    samples.append(time.time() - t0)
med = statistics.median(samples[1:])
print("RESULT " + json.dumps({{"cores": {cores}, "sec": med, "turns": n}}))
"""


def run_at(cores: int, src: str) -> dict:
    code = CHILD.format(repo=str(REPO), cores=cores, src=src)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT ") :])
    raise RuntimeError(f"no RESULT from local[{cores}]:\n{out.stdout[-2000:]}\n{out.stderr[-3000:]}")


def _burn(_i):
    import time as _t

    x = 0
    t_end = _t.time() + 3
    while _t.time() < t_end:
        for _ in range(10000):
            x += 1
    return x


def hardware_ceiling(n: int) -> float:
    """Measured CPU-scaling ceiling of THIS machine for n vs 4n pure
    busy-loop processes — no JVM, no Spark. The pipeline cannot scale
    better than the box."""
    import multiprocessing as mp

    out = {}
    for k in (n, 4 * n):
        with mp.get_context("fork").Pool(k) as p:
            out[k] = sum(p.map(_burn, range(k)))
    return (out[4 * n] / out[n]) / 4


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    # generate the fixture once (shared input for both runs)
    sys.path.insert(0, str(REPO))
    from langid_py_spark.fixtures.transcripts import ensure_transcripts
    from langid_py_spark.spark.session import get_spark

    spark = get_spark(cores=8, shuffle_partitions=8, app_name="scaling_gen")
    src = ensure_transcripts(spark, sf)
    spark.stop()

    ceiling = hardware_ceiling(n)
    rn = run_at(n, src)
    r4n = run_at(4 * n, src)
    tpn = rn["turns"] / rn["sec"]
    tp4n = r4n["turns"] / r4n["sec"]
    eff = (tp4n / tpn) / 4
    result = {
        "sf": sf,
        "turns": rn["turns"],
        "n_cores": n,
        "localN_sec": round(rn["sec"], 2),
        "local4N_sec": round(r4n["sec"], 2),
        "localN_turns_per_sec": round(tpn, 1),
        "local4N_turns_per_sec": round(tp4n, 1),
        "scaling_efficiency_n_to_4n": round(eff, 3),
        "hardware_cpu_ceiling": round(ceiling, 3),
        "efficiency_vs_ceiling": round(eff / ceiling, 3),
    }
    print(json.dumps(result))

    bench_md = REPO / "BENCH" / "BASELINE.md"
    bench_md.parent.mkdir(exist_ok=True)
    hdr = (
        "# BENCH — scaling evidence (N→4N)\n\n"
        "Same full pipeline job (scan→score→filter→scrub→vote→write), same\n"
        "input, two parallelism levels local[N] vs local[4N] (sandbox\n"
        "stand-in for N vs 4N executors per driver instruction). Median of\n"
        "3 warm runs. 'hw ceiling' = this VM's own busy-loop CPU scaling\n"
        "at the same N→4N (no JVM/Spark) — local threads share one memory\n"
        "system, unlike real executors; engine quality = eff/ceiling.\n\n"
        "| sf | turns | N | t@N s | t@4N s | tp@N | tp@4N | efficiency | hw ceiling | eff/ceiling |\n"
        "|---|---|---|---|---|---|---|---|---|---|\n"
    )
    if not bench_md.exists():
        bench_md.write_text(hdr)
    with bench_md.open("a") as f:
        f.write(
            f"| {sf} | {result['turns']} | {n} | {result['localN_sec']} | "
            f"{result['local4N_sec']} | {result['localN_turns_per_sec']} | "
            f"{result['local4N_turns_per_sec']} | "
            f"{result['scaling_efficiency_n_to_4n']} | "
            f"{result['hardware_cpu_ceiling']} | "
            f"{result['efficiency_vs_ceiling']} |\n"
        )


if __name__ == "__main__":
    main()
