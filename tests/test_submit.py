"""The north_rule's deployment clause, actually exercised: package the
engine with scripts/make_pyfiles_zip.py and run a classification +
scrub job via `spark-submit --py-files` from a NEUTRAL cwd, so the
package can only import from the zip and the model artifacts can only
arrive via --files."""

import json
import shutil
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_spark_submit_pyfiles_zip(tmp_path):
    spark_submit = shutil.which("spark-submit")
    assert spark_submit, "spark-submit not on PATH (ships with pip pyspark)"

    build = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "make_pyfiles_zip.py")],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert build.returncode == 0, build.stderr[-2000:]
    zip_path = REPO / "dist" / "langid_py_spark.zip"
    assert zip_path.exists()

    data = REPO / "langid_py_spark" / "data"
    run = subprocess.run(
        [
            spark_submit,
            "--master",
            "local[4]",
            "--py-files",
            str(zip_path),
            "--files",
            f"{data / 'model.npz'},{data / 'lm_by_lang.npz'}",
            str(REPO / "scripts" / "submit_smoke_job.py"),
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=tmp_path,  # neutral cwd: the repo is NOT importable from here
    )
    assert run.returncode == 0, run.stderr[-3000:]
    marker = [l for l in run.stdout.splitlines() if l.startswith("SUBMIT_OK ")]
    assert marker, run.stdout[-2000:] + run.stderr[-2000:]
    payload = json.loads(marker[0][len("SUBMIT_OK ") :])
    by_id = {doc_id: (lang, scrubbed_clean) for doc_id, lang, scrubbed_clean in payload}
    assert by_id[0][0] == "en"
    assert by_id[1][0] == "de"
    assert by_id[2][1] is True  # email scrubbed
