"""Corrupt-one-field mutation tests (SURVEY.md SS5.2.3: each mutation flips
exactly the expected violation) + the coerce route pipeline."""

import pyarrow as pa
import pytest

from malli_ray.arrow_compile import compile_table_plan
from malli_ray.sources.sequences import ALLOWED_SOURCES, SEQUENCES_DSL

VALID_ROW = {"doc_id": "doc-1", "tokens": [1, 2, 3], "n_tok": 3, "source": "web"}

MUTATIONS = [
    ({"doc_id": ""}, "doc_id", None),
    ({"doc_id": None}, "doc_id", None),
    ({"tokens": []}, "tokens", "malli.core/limits"),
    ({"tokens": [1, -5, 3]}, "tokens", None),
    ({"tokens": [1, 2, 99999]}, "tokens", None),
    ({"n_tok": 0}, "n_tok", None),
    ({"n_tok": None}, "n_tok", None),
    ({"source": "bogus"}, "source", None),
    ({"source": None}, "source", None),
]


def _table(rows):
    return pa.Table.from_pylist(rows, schema=pa.schema([
        ("doc_id", pa.string()), ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()), ("source", pa.string())]))


@pytest.mark.parametrize("mutation,column,err_type", MUTATIONS)
def test_single_field_mutation_flips_expected_violation(mutation, column, err_type):
    plan = compile_table_plan(SEQUENCES_DSL)
    row = {**VALID_ROW, **mutation}
    t = _table([VALID_ROW, row])
    mask = plan.valid_mask(t)
    assert mask.tolist() == [True, False], mutation
    v = plan.explain_table(t, id_column="doc_id").to_pylist()
    assert len(v) >= 1
    assert {x["column"] for x in v} == {column}, (mutation, v)
    assert all(x["row_index"] == 1 for x in v)
    if err_type:
        assert v[0]["type"] == err_type


def test_n_tok_consistency_mutation():
    plan = compile_table_plan(
        SEQUENCES_DSL,
        table_checks=[{"kind": "list_len_eq", "list_col": "tokens",
                       "len_col": "n_tok", "name": "n_tok_consistency"}])
    t = _table([VALID_ROW, {**VALID_ROW, "n_tok": 4}])
    assert plan.valid_mask(t).tolist() == [True, False]
    v = plan.explain_table(t).to_pylist()
    assert v[0]["type"] == "engine/check-failed"


def test_coerce_route(ray_session):
    import ray.data as rd
    from malli_ray.pipelines import validation_job as vj
    from malli_ray.stages.validator import ValidationSpec

    # string-typed input, decode to typed, then route
    t = pa.table({"id": ["a", "b", "c"], "n": ["1", "bad", "-2"]})
    spec = ValidationSpec(schema=["map", ["id", "string"],
                                 ["n", ["int", {"min": 0}]]],
                          id_column="id")
    valid, violations = vj.coerce(rd.from_arrow(t), spec,
                                  decode_schema=["map", ["n", "int"]])
    v = valid.take_all()
    assert [r["id"] for r in v] == ["a"]
    assert v[0]["n"] == 1
    errs = violations.take_all()
    assert {e["id"] for e in errs} == {"b", "c"}


def test_filter_valid_invert(ray_session):
    import ray.data as rd
    from malli_ray.pipelines import validation_job as vj
    from malli_ray.stages.validator import ValidationSpec

    t = pa.table({"n": [1, -1, 2]})
    spec = ValidationSpec(schema=["map", ["n", ["int", {"min": 0}]]])
    good = vj.filter_valid(rd.from_arrow(t), spec).take_all()
    bad = vj.filter_valid(rd.from_arrow(t), spec, invert=True).take_all()
    assert [r["n"] for r in good] == [1, 2]
    assert [r["n"] for r in bad] == [-1]


def test_parser_info_identity():
    from malli_ray.core import parser_info
    assert parser_info(["map", ["x", "int"], ["v", ["vector", "string"]]]) == \
        {"identity": True}
    assert parser_info(["orn", ["a", "int"]]) == {"identity": False}
    assert parser_info(["map", ["t", ["orn", ["a", "int"]]]]) == \
        {"identity": False}
    assert parser_info(["and", "int", [">", 0]]) == {"identity": True}
    assert parser_info(["*", "int?"]) == {"identity": False}
    assert parser_info(["maybe", ["tuple", "int", "string"]]) == \
        {"identity": True}


def test_run_job_write_valid(ray_session, tmp_path):
    import glob
    import pyarrow.parquet as pq
    from malli_ray.pipelines.validation_job import run_job
    from malli_ray.sources.sequences import (
        ALLOWED_SOURCES, SEQUENCES_DSL, ensure_sequences)
    from malli_ray.stages.validator import ValidationSpec

    d = str(tmp_path / "seq")
    paths = ensure_sequences(d, 2000, rows_per_shard=1000)
    spec = ValidationSpec(
        schema=SEQUENCES_DSL,
        checks=[{"kind": "in_set", "column": "source",
                 "allowed": ALLOWED_SOURCES, "name": "ref"}],
        id_column="doc_id")
    out = str(tmp_path / "out")
    rep = run_job(paths, spec, out, write_valid=True)
    valid_files = sorted(glob.glob(out + "/valid/*.parquet"))
    assert len(valid_files) == 2
    total_valid = sum(pq.read_table(f).num_rows for f in valid_files)
    assert total_valid == rep["n_valid"]
    # routed rows all validate (token arrays intact)
    t = pq.read_table(valid_files[0])
    assert t.schema.names == ["doc_id", "tokens", "n_tok", "source"]


def test_assert_reference():
    """assert_test.cljc: m/assert raises on invalid values and invalid
    schemas, passes valid values through unchanged (top-level export)."""
    import pytest

    import malli_ray as m

    for s, v in [("int", "42"), ("int?", "42"), ("string?", 42),
                 ("int?", None), (["map", ["a", "int?"]], {"a": "42"})]:
        with pytest.raises(Exception):
            m.assert_(s, v)
    with pytest.raises(Exception):
        m.assert_("totally-invalid-schema", 42)
    assert m.assert_("int", 42) == 42
    assert m.assert_("int?", 42) == 42
    assert m.assert_("string?", "42") == "42"
    assert m.assert_("any?", None) is None
    assert m.assert_(["map", ["a", "int?"]], {"a": 42}) == {"a": 42}
