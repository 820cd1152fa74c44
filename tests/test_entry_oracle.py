"""Driver-contract simulation: run each queries() entry at sf0.01 and compare
against its oracle_sql() DuckDB result (row count + schema + order-insensitive
values) — the same gate CORRECTNESS_r{N}.json applies."""

import math
import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"

_TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
           "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    import duckdb
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    try:
        from ray.data import Dataset
        if isinstance(result, Dataset):
            result = result.to_pandas()
    except ImportError:
        pass
    if isinstance(result, pa.Table):
        result = result.to_pandas()
    assert isinstance(result, pd.DataFrame)
    return result


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        elif str(df[c].dtype) == "bool":
            df[c] = df[c].astype(int)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


SQL_CHECKED = sorted(entrymod.oracle_sql().keys())
ROWS_ONLY = sorted(set(entrymod.queries().keys()) - set(SQL_CHECKED))

# strict value-hash canonicalization — the driver replica in
# tools/check_correctness.py (EXACT float reprs, no rounding; r5 session
# 1 found three latent ulp/dtype divergences the tolerant compare below
# masked, all fixed — this keeps the gate as strict as the driver's)
import importlib.util as _ilu

_cc_spec = _ilu.spec_from_file_location(
    "check_correctness",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools", "check_correctness.py"))
_cc = _ilu.module_from_spec(_cc_spec)
_cc_spec.loader.exec_module(_cc)


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(ray_session, duck, name):
    got_raw = _to_pandas(entrymod.queries()[name](SF_DIR))
    want_raw = duck.execute(entrymod.oracle_sql()[name]).fetchdf()
    got = _normalize(got_raw)
    want = _normalize(want_raw)
    assert list(got.columns) == list(want.columns), \
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    # tolerant compare first (readable diffs on gross mismatches)...
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, rtol=1e-5, atol=1e-8)
    # ...then the driver's exact value hash (bit-level float parity)
    assert _cc._hash(_cc._canon(got_raw)) == _cc._hash(_cc._canon(want_raw)), \
        f"{name}: exact value-hash mismatch (ulp-level float or dtype " \
        f"divergence the tolerant compare masked)"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(ray_session, name):
    got = _to_pandas(entrymod.queries()[name](SF_DIR))
    assert got is not None
    # deterministic across runs
    again = _to_pandas(entrymod.queries()[name](SF_DIR))
    assert len(got) == len(again)


def test_entry_smoke(ray_session):
    out = _to_pandas(entrymod.entry())
    assert len(out) >= 0
    assert {"id", "column", "type", "message"} <= set(out.columns)
