"""Bucketed tables: persisted co-location for repeated big-big joins.

At 100 TB the dominant cost of a big-big join is the exchange of both
sides. When the same join key recurs across jobs (doc_id: scores ⋈
docs, dedup drop-list ⋈ docs, embeddings ⋈ docs ...), Spark's bucketed
tables amortize that shuffle to WRITE time: both sides are written
pre-hashed into the same number of buckets on the key, and every later
equi-join on it plans with NO Exchange on either side (asserted in
tests/test_plans.py). This is the persisted-table counterpart of the
in-job `repartition` co-location the pipeline already uses.

Caveats encoded here rather than discovered in production:
* both sides must be bucketed on the SAME key with the SAME bucket
  count — mismatched counts re-shuffle one side;
* bucketed tables go through the catalog (`saveAsTable`), not bare
  parquet paths — `path=` keeps the files external/relocatable;
* bucket pruning applies to equality filters on the bucket key, so
  point lookups read 1/n_buckets of the data;
* sortBy within buckets makes the downstream sort-merge join's sort a
  no-op for the stored side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 64,
    sort: bool = True,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a bucketed (and optionally bucket-sorted) parquet
    table registered in the session catalog."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Equi-join two co-bucketed tables on their bucket key — plans
    exchange-free when both were written by write_bucketed with the
    same n_buckets."""
    return spark.table(left_table).join(spark.table(right_table), key)
