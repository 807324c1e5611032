"""Document sources mirroring the reference's scan modes (SURVEY §2.1).

S1  whole-file docs    (langid.py CLI batch mode: each file = one doc)
S2  line docs          (--line mode: each line = one doc)
S6  corpus-tree scan   (train/index.py CorpusIndexer: corpus/domain/lang/
                        doc — labels inferred from the path)

All Spark-native readers: `spark.read.text` with/without wholetext +
`input_file_name()` label extraction. No driver-side directory walking —
file listing and reading are distributed, so a corpus of 10^8 files
scales with the cluster (the reference walks the tree single-process).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_file_docs(spark: SparkSession, path: str) -> DataFrame:
    """S1: one row per FILE: (path, text)."""
    return (
        spark.read.text(path, wholetext=True)
        .select(
            F.input_file_name().alias("path"),
            F.col("value").alias("text"),
        )
    )


def read_line_docs(spark: SparkSession, path: str) -> DataFrame:
    """S2: one row per LINE: (path, line_no, text). line_no is per-file,
    assigned with a window — only needed when line identity matters."""
    from pyspark.sql import Window

    df = spark.read.text(path).select(
        F.input_file_name().alias("path"), F.col("value").alias("text")
    )
    w = Window.partitionBy("path").orderBy(F.monotonically_increasing_id())
    return df.withColumn("line_no", F.row_number().over(w) - 1)


def read_jsonl_docs(
    spark: SparkSession,
    path: str,
    text_field: str = "text",
    id_field: str | None = None,
    meta_fields: tuple[str, ...] = ("lang", "source"),
) -> DataFrame:
    """JSONL corpus reader — the de-facto distribution format of public
    training corpora (C4, The Pile, RedPajama ship as {"text": ...,
    "meta": ...} lines). Returns the engine's documents shape
    (doc_id, text, <meta...>, n_chars) so every registered operator
    runs on it unchanged.

    Corrupt lines do NOT kill a 10^12-line ingest: PERMISSIVE mode
    routes them to a `_corrupt` column, kept in the output so the
    caller can count/quarantine them (a silent drop would skew corpus
    statistics). doc_id defaults to xxhash64(file, line text) —
    deterministic and stable under re-ingest; pass `id_field` when the
    corpus carries its own ids. Schema is EXPLICIT (text + requested
    meta as strings): schema inference would scan the corpus twice and
    is banned on the ingest path.

    Note: Spark refuses queries whose pruned projection reads ONLY the
    corrupt column from raw JSON (QUERY_ONLY_CORRUPT_RECORD_COLUMN) —
    filtering on `_corrupt` therefore requires the parsed frame to be
    materialized first. A real ingest does that anyway (read → write
    the bronze parquet table → operate); in exploratory sessions,
    `.cache()` the returned frame before filtering on `_corrupt`."""
    from pyspark.sql import types as T

    fields = [T.StructField(text_field, T.StringType())]
    fields += [T.StructField(m, T.StringType()) for m in meta_fields]
    if id_field:
        fields.append(T.StructField(id_field, T.LongType()))
    fields.append(T.StructField("_corrupt", T.StringType()))
    schema = T.StructType(fields)
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )
    doc_id = (
        F.col(id_field).alias("doc_id")
        if id_field
        else F.xxhash64(F.input_file_name(), F.coalesce(F.col(text_field), F.col("_corrupt"), F.lit(""))).alias("doc_id")
    )
    t = F.coalesce(F.col(text_field), F.lit(""))
    return df.select(
        doc_id,
        F.col(text_field).alias("text"),
        *[F.col(m) for m in meta_fields],
        F.length(t).cast("long").alias("n_chars"),
        "_corrupt",
    )


def read_corpus_tree(spark: SparkSession, root: str) -> DataFrame:
    """S6: corpus/<domain>/<lang>/<doc> -> (domain, lang, doc_id, path,
    text). Reference: langid/train/index.py::CorpusIndexer (~L50-150),
    which walks directories on one machine; here the glob is pushed to
    the distributed file index and labels come from regexp on
    input_file_name — pure Catalyst."""
    df = spark.read.text(f"{root}/*/*/*", wholetext=True).select(
        F.input_file_name().alias("path"), F.col("value").alias("text")
    )
    return df.select(
        F.regexp_extract("path", r".*/([^/]+)/([^/]+)/([^/]+)$", 1).alias("domain"),
        F.regexp_extract("path", r".*/([^/]+)/([^/]+)/([^/]+)$", 2).alias("lang"),
        F.xxhash64("path").alias("doc_id"),
        "path",
        "text",
    )
