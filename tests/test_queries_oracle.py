"""Every oracle-paired query compared against DuckDB at sf0.001 — a local
mirror of the driver's correctness gate (row count + sorted-column value
equality)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from routers_ray.pipelines.queries import registry

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.unsignedinteger):
            df[c] = df[c].astype("int64")
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()  # Dataset


ORACLE_PAIRS = [(n, fn, sql) for n, (fn, sql) in registry().items() if sql is not None]


@pytest.mark.parametrize("name,fn,sql", ORACLE_PAIRS, ids=[p[0] for p in ORACLE_PAIRS])
def test_query_matches_oracle(name, fn, sql, con, ray_session):
    if callable(sql):  # lazy oracle (match/match_tiles expected parquet)
        sql = sql()
    ours = _canon(_to_pandas(fn(SF_DIR)))
    theirs = _canon(con.sql(sql).df())
    assert list(ours.columns) == list(theirs.columns), f"{name}: column mismatch"
    assert len(ours) == len(theirs), f"{name}: row count {len(ours)} != {len(theirs)}"
    pd.testing.assert_frame_equal(ours, theirs, check_dtype=False, check_exact=True)


ROWS_ONLY = [(n, fn) for n, (fn, sql) in registry().items() if sql is None]


@pytest.mark.parametrize("name,fn", ROWS_ONLY, ids=[p[0] for p in ROWS_ONLY])
def test_rows_only_queries_run(name, fn, ray_session):
    df = _to_pandas(fn(SF_DIR))
    assert df is not None and len(df.columns) > 0
    assert len(df) >= 0
