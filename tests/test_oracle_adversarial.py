"""Adversarial-text oracle agreement: the text-stage queries must stay
bit-exact against their DuckDB oracles on unicode/degenerate inputs, not
just the driver's synthetic corpus (both sides are RE2 + IEEE doubles, so
exactness is the contract, not a tolerance)."""

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod

ADVERSARIAL_TEXTS = [
    "hello the world",
    "ĉi tiu estas la unua tago de la cetera vivo",
    "的是了在我有他这中不 mixed 语言 text the",
    "emoji \U0001F600\U0001F603 stuff!!! 123",
    "\tws tabs the",
    "ALL CAPS THE AND OF",
    "punct,,,;;;:::!!!???...",
    "12345 67890 1.5e10",
    "a",
    " ",
    "rtl שלום עולם the",
    "combining áé the",
    "control\x01\x02 chars the",
    "very " + "long " * 200 + "text the",
    "nbsp joined the",          # NBSP: \S+ must agree on both engines
    "em space the",             # EM SPACE likewise
]


@pytest.fixture(scope="module")
def adversarial_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("adversarial")
    t = pa.table({
        "doc_id": list(range(len(ADVERSARIAL_TEXTS))),
        "text": ADVERSARIAL_TEXTS,
        "lang": ["en"] * len(ADVERSARIAL_TEXTS),
        "source": ["src0"] * len(ADVERSARIAL_TEXTS),
        "n_chars": [len(x) for x in ADVERSARIAL_TEXTS],
    })
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def adversarial_duck(adversarial_dir):
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{adversarial_dir}/documents.parquet'")
    return con


QUERIES = ["quality_documents", "lang_id_documents", "text_counts_documents",
           "token_count_documents", "vocab_top_words", "tokenize_documents",
           "dedup_exact_documents"]


@pytest.mark.parametrize("name", QUERIES)
def test_adversarial_text_oracle_exact(ray_session, adversarial_dir,
                                       adversarial_duck, name):
    got = entrymod.queries()[name](adversarial_dir)
    from ray.data import Dataset
    if isinstance(got, Dataset):
        got = got.to_pandas()
    if isinstance(got, pa.Table):
        got = got.to_pandas()
    want = adversarial_duck.execute(entrymod.oracle_sql()[name]).fetchdf()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    assert len(g) == len(w), (name, len(g), len(w))
    for c in cols:
        gv, wv = g[c].to_numpy(), w[c].to_numpy()
        if np.issubdtype(g[c].dtype, np.floating):
            assert np.array_equal(gv, wv), (name, c)  # bit-exact floats
        else:
            assert (gv == wv).all(), (name, c)
