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
