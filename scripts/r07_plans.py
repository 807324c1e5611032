#!/usr/bin/env python3
"""Dump .explain('formatted') for the bench queries to plans/r07/.

Usage: python scripts/r07_plans.py <suffix> [query ...]
  suffix: 'before' or 'after' (file name tail)
  query:  optional subset of bench query names; default = all.

Writes plans/r07/<name>_<suffix>.txt. Plans only — nothing executes
except the bounded driver pulls some constructions perform (centroid
sample fit, hot-key pre-counts), which is inherent to building the
DataFrame.
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])

    from langid_py_spark.spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="r07_plans")
    qs = entry_mod.queries()

    out_dir = REPO / "plans" / "r07"
    out_dir.mkdir(parents=True, exist_ok=True)

    # the bench's operator queries (bench.py names -> queries() names)
    bench_queries = {
        "langid_score": "langid_documents",
        "rules_keepdrop": "rules_keepdrop",
        "scrub_pii": "scrub_pii",
        "word_df_tally": "word_df_tally",
        "exact_dedup": "exact_dedup_groups",
        "minhash_pairs": "minhash_pairs",
        "cosine_topk": "cosine_topk",
        "pricing_summary": "pricing_summary",
        "top_customers": "top_customers",
        "ccnet_approx": "ccnet_ppl_buckets_approx",
        "substring_spans": "substring_dup_spans",
        "quality_clf": "quality_classifier",
        "line_dedup": "line_dedup_keep",
        "corpus_pipeline": "corpus_pipeline",
        "semdedup": "semdedup_drops",
        "token_mixture": "token_budget_mixture",
    }

    for bench_name, qname in bench_queries.items():
        if only and bench_name not in only:
            continue
        try:
            spark.catalog.clearCache()
            df = qs[qname](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"EXPLAIN FAILED: {type(exc).__name__}: {exc}"
        (out_dir / f"{bench_name}_{suffix}.txt").write_text(plan)
        print(f"wrote {bench_name}_{suffix}.txt ({len(plan)} chars)")

    # pipeline_full: the flagship composition (unwritten form)
    if not only or "pipeline_full" in only:
        from langid_py_spark.fixtures.transcripts import ensure_transcripts
        from langid_py_spark.spark.pipeline import full_pipeline

        path = ensure_transcripts(spark, 0.1)
        df = full_pipeline(spark.read.parquet(path))
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"pipeline_full_{suffix}.txt").write_text(plan)
        print(f"wrote pipeline_full_{suffix}.txt ({len(plan)} chars)")


if __name__ == "__main__":
    main()
