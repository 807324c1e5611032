"""Local twin of the driver's correctness gate: run every queries() entry
on Spark at sf0.01 AND its oracle_sql() in DuckDB, compare row count,
schema (column names + dtypes after name-sort) and exact values.

Stricter than a hash compare: on mismatch it prints the first differing
rows so the root cause (value vs dtype vs ordering) is immediately
visible.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, then rows by every column — order-insensitive
    exact compare (mirrors the driver's sort-before-hash)."""
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def dtype_sig(df: pd.DataFrame) -> dict[str, str]:
    out = {}
    for c in df.columns:
        k = df[c].dtype.kind
        out[c] = {"i": "int", "u": "int", "f": "float", "b": "bool", "O": "obj", "M": "ts"}.get(
            k, str(df[c].dtype)
        )
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # oracles whose quota/golden inputs depend on the gate SF read this
    # (e.g. temperature_sample's quota replay) — export BEFORE entry
    # import so oracle_sql() sees the harness's actual sf_dir
    import os

    os.environ["LANGID_ORACLE_SF_DIR"] = sf_dir

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .appName("check_oracles")
        .getOrCreate()
    )
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_skip = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"SKIP  {name} (no oracle)")
            n_skip += 1
            continue
        try:
            got = normalize(fn(spark, sf_dir).toPandas())
            want = normalize(con.execute(sql).df())
        except Exception as e:  # noqa: BLE001
            print(f"ERR   {name}: {e}")
            n_fail += 1
            continue
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} vs {len(want)}")
        if list(got.columns) != list(want.columns):
            problems.append(f"cols {list(got.columns)} vs {list(want.columns)}")
        elif dtype_sig(got) != dtype_sig(want):
            problems.append(f"dtypes {dtype_sig(got)} vs {dtype_sig(want)}")
        if not problems and len(got) == len(want):
            for c in got.columns:
                a, b = got[c].to_numpy(), want[c].to_numpy()
                if got[c].dtype.kind == "f":
                    bad = ~(np.isclose(a, b, rtol=0, atol=0) | (pd.isna(a) & pd.isna(b)))
                else:
                    eq = pd.Series(a).fillna("\0NULL") == pd.Series(b).fillna("\0NULL")
                    bad = ~eq.to_numpy()
                if bad.any():
                    i = int(np.flatnonzero(bad)[0])
                    problems.append(
                        f"col {c} differs at row {i}: {a[i]!r} vs {b[i]!r} "
                        f"({int(bad.sum())} rows)"
                    )
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"pass  {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} skipped")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
