#!/usr/bin/env python3
"""Smoke job for `spark-submit --py-files dist/langid_py_spark.zip`.

Run by tests/test_submit.py (and usable manually):

    python scripts/make_pyfiles_zip.py
    spark-submit --master local[4] \
        --py-files dist/langid_py_spark.zip \
        --files langid_py_spark/data/model.npz,langid_py_spark/data/lm_by_lang.npz \
        scripts/submit_smoke_job.py

`langid_py_spark` must import from the ZIP (this script's own directory
is scripts/, so the package is not otherwise importable), and the model
artifacts arrive via --files (numpy cannot open .npz inside a zip —
see scripts/make_pyfiles_zip.py). The model path is resolved with
SparkFiles.get on the driver; in local mode driver and executors share
the same resolved path. On a real cluster resolve INSIDE the UDF
factory instead (every UDF constructor takes model_path/lm_path for
exactly this reason).
"""

import json

from pyspark import SparkFiles
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = SparkSession.builder.getOrCreate()

from langid_py_spark.spark.scorer import score_udf  # noqa: E402 (from the zip)
from langid_py_spark.spark.scrub import scrub_expr  # noqa: E402

rows = [
    (0, "the cat and the dog sat by the house and the door"),
    (1, "der hund und die katze sitzen neben der tür im haus"),
    (2, "contact me at alice@example.com please"),
]
docs = spark.createDataFrame(rows, "doc_id long, text string")
sc_udf = score_udf(
    model_path=SparkFiles.get("model.npz"),
    lm_path=SparkFiles.get("lm_by_lang.npz"),  # per-lang LM dict (r04 default)
)
out = (
    docs.withColumn("sc", sc_udf(F.col("text")))
    .select("doc_id", "sc.lang", scrub_expr(F.col("text")).alias("scrubbed"))
    .orderBy("doc_id")
    .collect()
)
payload = [(r["doc_id"], r["lang"], "@" not in r["scrubbed"]) for r in out]
print("SUBMIT_OK " + json.dumps(payload))
spark.stop()
