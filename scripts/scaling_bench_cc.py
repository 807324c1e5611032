#!/usr/bin/env python3
"""N→4N scaling evidence for the ITERATIVE operator: connected
components (large-star/small-star) over a synthetic near-dup pair graph.

Protocol mirrors scripts/scaling_bench_minhash.py: same input, two
parallelism levels in separate JVMs, median of 3 warm runs (first run
discarded), tmpfs shuffle dirs, 2 MB scan splits, busy-loop hardware
ceiling measured beside the result. Nothing else may run concurrently
(BENCH/BASELINE.md contention note).

Input graph (deterministic, generated with spark.range — no Python row
code): chains of 8 nodes (path edges are the CC worst case — maximum
rounds for label propagation, and the large-star/small-star pair must
close them in O(log n)), linked by jump edges into 64-node components,
plus reversed-duplicate edges to exercise canonicalization. ~1.06 x
n_nodes edges.

Usage: python scripts/scaling_bench_cc.py [nodes_millions] [N]
       (default 2.0, 2)
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
from langid_py_spark.operators.cluster import connected_components
spark = get_spark(cores={cores}, shuffle_partitions={cores}, app_name="scaling_cc",
                  extra_conf={{"spark.sql.files.maxPartitionBytes": "2m",
                               "spark.local.dir": "/dev/shm/spark-local"}})
pairs = spark.read.parquet({src!r})
n_edges = pairs.count()
samples = []
for i in range(4):  # first run = warmup, discarded
    t0 = time.time()
    out = connected_components(pairs)
    out.write.format("noop").mode("overwrite").save()
    samples.append(time.time() - t0)
med = statistics.median(samples[1:])
print("RESULT " + json.dumps({{"cores": {cores}, "sec": med, "edges": n_edges}}))
"""


def run_at(cores: int, src: str) -> dict:
    code = CHILD.format(repo=str(REPO), cores=cores, src=src)
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
    nodes_m = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_nodes = int(nodes_m * 1_000_000)

    from pyspark.sql import functions as F

    from langid_py_spark.spark.session import get_spark

    src = str(REPO / ".cache" / f"cc_edges_{nodes_m}m")
    if not (Path(src) / "_SUCCESS").exists():
        spark = get_spark(cores=16, shuffle_partitions=16, app_name="cc_gen")
        base = spark.range(n_nodes - 1)
        path_e = base.filter((F.col("id") + 1) % 8 != 0).select(
            F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
        )
        jump_e = base.filter(
            (F.col("id") % 64 == 0) & (F.col("id") + 8 < n_nodes)
        ).select(F.col("id").alias("id_a"), (F.col("id") + 8).alias("id_b"))
        rev_dup = base.filter(F.col("id") % 10 == 0).select(
            (F.col("id") + 1).alias("id_a"), F.col("id").alias("id_b")
        )
        edges = path_e.union(jump_e).union(rev_dup).repartition(64)
        edges.write.mode("overwrite").parquet(src)
        spark.stop()

    ceiling = hardware_ceiling(n)
    rn = run_at(n, src)
    r4n = run_at(4 * n, src)
    tpn = rn["edges"] / rn["sec"]
    tp4n = r4n["edges"] / r4n["sec"]
    eff = (tp4n / tpn) / 4
    result = {
        "op": "connected_components",
        "n_nodes": n_nodes,
        "edges": rn["edges"],
        "n_cores": n,
        "localN_sec": round(rn["sec"], 2),
        "local4N_sec": round(r4n["sec"], 2),
        "localN_edges_per_sec": round(tpn, 1),
        "local4N_edges_per_sec": round(tp4n, 1),
        "scaling_efficiency_n_to_4n": round(eff, 3),
        "hardware_cpu_ceiling": round(ceiling, 3),
        "efficiency_vs_ceiling": round(eff / ceiling, 3),
    }
    print(json.dumps(result))

    bench_md = REPO / "BENCH" / "BASELINE.md"
    with bench_md.open("a") as f:
        f.write(
            f"| cc {nodes_m}M-node chain graph | {result['edges']} | {n} | "
            f"{result['localN_sec']} | {result['local4N_sec']} | "
            f"{result['localN_edges_per_sec']} | {result['local4N_edges_per_sec']} | "
            f"{result['scaling_efficiency_n_to_4n']} | "
            f"{result['hardware_cpu_ceiling']} | "
            f"{result['efficiency_vs_ceiling']} |\n"
        )


if __name__ == "__main__":
    main()
