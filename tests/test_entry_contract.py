"""Mirror of the driver's correctness gate: every queries() entry runs at
sf0.01; entries with oracle_sql() must match DuckDB on row count, column
names, and order-insensitive values; rows-only entries must produce a
stable schema and >= 0 rows."""

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Order-insensitive canonical form: sort columns by name, normalize
    value representations, sort rows."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


def test_every_oracle_key_has_a_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_duckdb_oracle(spark, duck, name):
    got = _canon(QUERIES[name](spark, SF_DIR).toPandas())
    want = _canon(duck.execute(ORACLES[name]).fetchdf())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    for c in got.columns:
        if str(want[c].dtype).startswith("float") or str(got[c].dtype).startswith("float"):
            a = pd.to_numeric(got[c]).round(6).to_numpy()
            b = pd.to_numeric(want[c]).round(6).to_numpy()
            bad = sum(
                0 if (x == y or (math.isnan(x) and math.isnan(y)) or abs(x - y) <= 1e-6)
                else 1
                for x, y in zip(a, b)
            )
            assert bad == 0, f"{name}.{c}: {bad} float mismatches"
        else:
            mism = (got[c].astype(str).values != want[c].astype(str).values).sum()
            assert mism == 0, f"{name}.{c}: {mism} value mismatches"


def test_every_query_has_an_oracle():
    """The rows-only class is empty by design since r02: every registered
    query carries a value-hash oracle (SQL or golden parquet)."""
    assert set(QUERIES) == set(ORACLES)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert "keep" in df.columns and "scrubbed_text" in df.columns
