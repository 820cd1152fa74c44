"""Schema-aware readers + engine-vs-engine seq-regex fuzz + wide-row edge."""

import random

import numpy as np
import pyarrow as pa
import pytest

import malli_ray as m
from malli_ray import INVALID


def test_read_csv_with_schema(ray_session, tmp_path):
    from malli_ray.sources.readers import read_csv_with_schema

    p = tmp_path / "data.csv"
    p.write_text("id,active,n\nalpha,true,1\nbeta,false,bad\ngamma,zzz,3\n")
    S = ["map", ["id", "string"], ["active", "boolean"], ["n", ["int", {"min": 0}]]]
    out = read_csv_with_schema(str(p), S, validate=True).take_all()
    by = {r["id"]: r for r in out}
    assert by["alpha"]["active"] is True and by["alpha"]["valid"]
    assert by["beta"]["n"] is None and not by["beta"]["valid"]
    assert by["gamma"]["active"] is None and not by["gamma"]["valid"]


def test_read_json_with_schema(ray_session, tmp_path):
    from malli_ray.sources.readers import read_json_with_schema

    p = tmp_path / "data.json"
    p.write_text('{"id": "a", "n": 1}\n{"id": "b", "n": -5}\n')
    S = ["map", ["id", "string"], ["n", ["int", {"min": 0}]]]
    out = read_json_with_schema(str(p), S, validate=True).take_all()
    assert {r["id"]: r["valid"] for r in out} == {"a": True, "b": False}


def test_read_parquet_for_schema_prunes(ray_session, tmp_path):
    import pyarrow.parquet as pq
    from malli_ray.sources.readers import read_parquet_for_schema

    t = pa.table({"a": [1], "b": ["x"], "c": [2.0]})
    pq.write_table(t, tmp_path / "t.parquet")
    ds = read_parquet_for_schema(str(tmp_path / "t.parquet"),
                                 ["map", ["a", "int"], ["b", "string"]])
    assert set(ds.schema().names) == {"a", "b"}  # c pruned at the read


# -- seq-regex: position engine vs backtracking engine ----------------------

REGEX_LEAVES = ["int?", "string?", "boolean?", ["=", 1], ["=", "a"]]


def random_regex(rng: random.Random, depth: int = 0):
    if depth >= 3:
        return rng.choice(REGEX_LEAVES)
    roll = rng.random()
    if roll < 0.3:
        return rng.choice(REGEX_LEAVES)
    if roll < 0.45:
        return ["*", random_regex(rng, depth + 1)]
    if roll < 0.55:
        return ["+", random_regex(rng, depth + 1)]
    if roll < 0.65:
        return ["?", random_regex(rng, depth + 1)]
    if roll < 0.75:
        return ["repeat", {"min": rng.randint(0, 2), "max": rng.randint(2, 4)},
                random_regex(rng, depth + 1)]
    if roll < 0.88:
        return ["cat", *[random_regex(rng, depth + 1)
                         for _ in range(rng.randint(1, 3))]]
    return ["alt", *[random_regex(rng, depth + 1)
                     for _ in range(rng.randint(1, 3))]]


ITEMS_POOL = [1, 2, "a", "b", True, 0]


@pytest.mark.parametrize("seed", range(20))
def test_regex_engines_agree(seed):
    """The memoized position engine (validator) and the backtracking matcher
    (parser) must accept exactly the same sequences."""
    rng = random.Random(seed)
    for _ in range(10):
        form = random_regex(rng)
        s = m.schema(form)
        valid = s.validator()
        parse = s.parser()
        for _ in range(15):
            seq = [rng.choice(ITEMS_POOL) for _ in range(rng.randint(0, 6))]
            v = valid(seq)
            p = parse(seq)
            assert v == (p is not INVALID), (form, seq, v, p)


def test_wide_row_tokens():
    """A single row with a 100k-token list streams through the vectorized
    check without materializing Python objects."""
    from malli_ray.arrow_compile import compile_table_plan
    from malli_ray.sources.sequences import SEQUENCES_DSL

    rng = np.random.default_rng(0)
    toks = rng.integers(0, 50257, 100_000, dtype=np.int32)
    t = pa.table({
        "doc_id": ["big"],
        "tokens": pa.array([toks.tolist()], type=pa.list_(pa.int32())),
        "n_tok": pa.array([100_000], type=pa.int32()),
        "source": ["web"],
    })
    plan = compile_table_plan(SEQUENCES_DSL)
    assert plan.valid_mask(t).tolist() == [True]
    # corrupt a single token at position 99_999
    toks2 = toks.copy()
    toks2[-1] = -1
    t2 = t.set_column(1, "tokens",
                      pa.array([toks2.tolist()], type=pa.list_(pa.int32())))
    assert plan.valid_mask(t2).tolist() == [False]
    v = plan.explain_table(t2, id_column="doc_id")
    assert v.num_rows == 1 and v.column("in")[0].as_py() == "/tokens/99999"
