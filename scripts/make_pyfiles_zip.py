#!/usr/bin/env python3
"""Package langid_py_spark (code + model artifacts) for spark-submit.

    python scripts/make_pyfiles_zip.py            # -> dist/langid_py_spark.zip
    spark-submit --py-files dist/langid_py_spark.zip your_job.py

The .npz artifacts ride inside the package. NOTE: when the zip is used
directly on sys.path, `NBModel.load()`'s `__file__`-relative default
path resolves inside the zip, which numpy cannot open — executors
should either extract the zip (YARN/K8s do this for archives passed via
`--archives`) or pass an explicit `model_path` pointing at a
`SparkFiles.get(...)` location shipped with `--files`. Both paths are
plumbed: every UDF constructor takes `model_path`/`lm_path`.
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    out_dir = REPO / "dist"
    out_dir.mkdir(exist_ok=True)
    out = out_dir / "langid_py_spark.zip"
    pkg = REPO / "langid_py_spark"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted(pkg.rglob("*")):
            if p.is_dir() or "__pycache__" in p.parts:
                continue
            z.write(p, p.relative_to(REPO))
    print(f"{out} ({out.stat().st_size // 1024} KiB)")


if __name__ == "__main__":
    main()
