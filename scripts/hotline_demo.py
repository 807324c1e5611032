"""Wall-clock evidence for the r06 hot-key window guard: a corpus with
one line repeated 10^7 times, guarded vs unguarded line dedup.

The unguarded plan puts every copy of the hot line into ONE window-sort
partition (the straggler AQE cannot split); the guard routes the hot
key through a min-struct hash agg + broadcast join and leaves only the
bounded tail to the window. Results are verified identical before
timings are reported.

Usage: python scripts/hotline_demo.py [n_copies] [cores]
(defaults 10_000_000 and 8). Machine must be otherwise idle
(CLAUDE.md bench contention protocol); the script prints the same
calibration probes as bench.py so a contended run is visible.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    lines_per_doc = 500
    n_docs = n_copies // lines_per_doc

    from pyspark.sql import functions as F

    import bench
    from langid_py_spark.operators.dedup import line_dedup_drops
    from langid_py_spark.spark.session import get_spark

    print(f"calib pre: {bench._calibrate()}")
    spark = get_spark(cores=cores, shuffle_partitions=cores, app_name="hotline")

    hot = "Accept cookies to continue | Privacy | Terms | Imprint"
    # n_docs docs of 500 hot-line copies + 3 unique tail lines each —
    # built JVM-side (array_repeat + concat) so generation cost doesn't
    # drown the measurement
    docs = (
        spark.range(0, n_docs, 1, numPartitions=cores * 4)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.array_join(
                    F.array_repeat(F.lit(hot), lines_per_doc), "\n"
                ),
                F.lit("\n"),
                F.concat_ws(
                    "\n",
                    F.concat(F.lit("tail-a-"), F.col("id")),
                    F.concat(F.lit("tail-b-"), F.col("id")),
                    F.concat(F.lit("tail-dup-"), F.pmod(F.col("id"), F.lit(1000))),
                ),
            ).alias("text"),
        )
        .persist()
    )
    print(f"docs: {docs.count()} x {lines_per_doc} hot copies = {n_copies:,}")

    def run(tag: str, **kw) -> tuple[float, int]:
        t0 = time.time()
        n = line_dedup_drops(docs, **kw).count()
        dt = time.time() - t0
        print(f"{tag}: {dt:.1f} s, {n:,} drop rows")
        return dt, n

    # warm both paths once at a small slice? no — plans differ; just
    # run unguarded first (worst case last would bias page cache in its
    # favor), then guarded twice (first run pays the pre-count JVM warm)
    t_un, n_un = run("unguarded (hot_threshold=None)", hot_threshold=None)
    run("guarded   (warm)", hot_threshold=100_000, hot_sample=64)
    t_g, n_g = run("guarded   (timed)", hot_threshold=100_000, hot_sample=64)
    assert n_un == n_g, (n_un, n_g)
    print(f"speedup: {t_un / t_g:.2f}x  (identical {n_un:,} rows)")
    print(f"calib post: {bench._calibrate()}")
    spark.stop()


if __name__ == "__main__":
    main()
