"""Vectorized path == row-engine oracle (SURVEY.md SS5.2.2 oracle tests).

For each schema x generated table, the Arrow mask must equal mapping the
row-level validator over to_pylist() — including nulls, bounds, nested lists.
"""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

import malli_ray as m
from malli_ray.arrow_compile import compile_node, compile_table_plan


def oracle_mask(schema_form, arr: pa.Array) -> np.ndarray:
    v = m.validator(schema_form)
    return np.array([v(x) for x in arr.to_pylist()], dtype=bool)


def check_equiv(schema_form, arr: pa.Array):
    s = m.schema(schema_form)
    fn = compile_node(s, arr.type)
    got = fn(arr)
    want = oracle_mask(schema_form, arr)
    assert got.tolist() == want.tolist(), (schema_form, arr.to_pylist())


INT_ARR = pa.array([1, -5, 0, None, 50257, 42], type=pa.int64())
STR_ARR = pa.array(["a", "", None, "hello", "web", "x/y"], type=pa.string())
FLT_ARR = pa.array([1.5, -0.5, None, float("nan"), 0.0], type=pa.float64())
BOOL_ARR = pa.array([True, False, None], type=pa.bool_())
LIST_ARR = pa.array([[1, 2], [], None, [0, 50257], [7]], type=pa.list_(pa.int32()))


@pytest.mark.parametrize("schema_form,arr", [
    ("int", INT_ARR),
    (["int", {"min": 0}], INT_ARR),
    (["int", {"min": 0, "max": 100}], INT_ARR),
    ("pos-int?", INT_ARR),
    ("neg-int?", INT_ARR),
    ("nat-int?", INT_ARR),
    ("string", STR_ARR),
    (["string", {"min": 1}], STR_ARR),
    (["string", {"min": 1, "max": 3}], STR_ARR),
    ("qualified-keyword", STR_ARR),
    (["enum", "web", "a"], STR_ARR),
    (["re", r"^[a-z]+$"], STR_ARR),
    ("double", FLT_ARR),
    (["double", {"min": 0.0}], FLT_ARR),
    ("boolean", BOOL_ARR),
    ("true?", BOOL_ARR),
    ("nil", STR_ARR),
    ("any", STR_ARR),
    ("some", STR_ARR),
    ([">", 0], INT_ARR),
    (["<=", 42], INT_ARR),
    (["=", 42], INT_ARR),
    (["maybe", "int"], INT_ARR),
    (["maybe", ["string", {"min": 1}]], STR_ARR),
    (["and", "int", [">", 0]], INT_ARR),
    (["or", ["=", 0], [">", 100]], INT_ARR),
    (["not", [">", 0]], INT_ARR),
    (["vector", "int"], LIST_ARR),
    (["vector", {"min": 1}, "int"], LIST_ARR),
    (["vector", {"min": 1, "max": 2}, ["int", {"min": 0, "max": 50256}]], LIST_ARR),
    # wrong-dtype cases: static False
    ("int", STR_ARR),
    ("string", INT_ARR),
    ("boolean", INT_ARR),
])
def test_node_equivalence(schema_form, arr):
    check_equiv(schema_form, arr)


def test_nan_double():
    # NaN is a valid double (Clojure double? accepts ##NaN) but fails bounds
    fn = compile_node(m.schema("double"), pa.float64())
    assert fn(FLT_ARR).tolist()[3] is True or fn(FLT_ARR).tolist()[3] == True  # noqa: E712
    fn = compile_node(m.schema(["double", {"min": 0.0}]), pa.float64())
    assert not fn(FLT_ARR).tolist()[3]


@settings(max_examples=30, deadline=None)
@given(st.lists(st.one_of(st.integers(-100, 100), st.none()), max_size=30))
def test_property_int_bounds(xs):
    arr = pa.array(xs, type=pa.int64())
    for form in (["int", {"min": -5, "max": 5}], "pos-int?",
                 ["and", "int", ["not", ["=", 0]]]):
        check_equiv(form, arr)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.one_of(st.text(max_size=6), st.none()), max_size=30))
def test_property_strings(xs):
    arr = pa.array(xs, type=pa.string())
    for form in (["string", {"min": 1, "max": 4}], ["enum", "a", "bb"],
                 ["maybe", ["string", {"min": 2}]]):
        check_equiv(form, arr)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.one_of(st.none(),
                          st.lists(st.integers(-10, 10), max_size=8)), max_size=20))
def test_property_lists(xs):
    arr = pa.array(xs, type=pa.list_(pa.int64()))
    for form in (["vector", ["int", {"min": 0}]],
                 ["vector", {"min": 1, "max": 4}, "int"],
                 ["maybe", ["vector", {"min": 1}, "int"]]):
        check_equiv(form, arr)


def test_every_bounded_prefix_parity():
    # :every checks only the first 101 elements (core.cljc:1499-1522) and
    # accepts nil; :vector checks all and rejects nil
    arr = pa.array([[1] * 150 + [999999], [1] * 50, None, [1, 2, 3]],
                   type=pa.list_(pa.int64()))
    for form in (["every", ["int", {"min": 0, "max": 1000}]],
                 ["every", {"min": 1}, ["int", {"min": 0, "max": 1000}]],
                 ["seqable", ["int", {"min": 0}]],
                 ["vector", ["int", {"min": 0, "max": 1000}]]):
        check_equiv(form, arr)


def test_fixed_size_list_tuple():
    arr = pa.array([[1.0, 2.0], [3.0, None], None],
                   type=pa.list_(pa.float64(), 2))
    fn = compile_node(m.schema(["tuple", "double", "double"]), arr.type)
    assert fn(arr).tolist() == [True, False, False]


def test_struct_map():
    t = pa.struct([("street", pa.string()), ("zip", pa.int64())])
    arr = pa.array([{"street": "s", "zip": 1}, {"street": None, "zip": 2}, None],
                   type=t)
    fn = compile_node(m.schema(["map", ["street", "string"], ["zip", "int"]]), t)
    assert fn(arr).tolist() == [True, False, False]
    # Arrow structs materialize every field, so to_pylist presents optional
    # fields as present-with-None — which must satisfy the child schema
    # (row-engine parity); use [:maybe ...] for nullable struct fields
    fn = compile_node(
        m.schema(["map", ["street", {"optional": True}, "string"], ["zip", "int"]]), t)
    got = fn(arr).tolist()
    want = [m.validator(["map", ["street", {"optional": True}, "string"],
                         ["zip", "int"]])(v) for v in arr.to_pylist()]
    assert got == want == [True, False, False]
    fn = compile_node(
        m.schema(["map", ["street", ["maybe", "string"]], ["zip", "int"]]), t)
    assert fn(arr).tolist() == [True, True, False]


def test_row_fallback_fn_schema():
    arr = pa.array([1, 2, 3, 10], type=pa.int64())
    fn = compile_node(m.schema(["fn", "x < 5"]), arr.type)
    assert fn(arr).tolist() == [True, True, True, False]


def test_sliced_arrays():
    # offsets math must hold on sliced list arrays
    arr = pa.array([[1], [2, 2], [3], [-1], [5]], type=pa.list_(pa.int64()))
    sliced = arr.slice(1, 3)
    check_equiv(["vector", ["int", {"min": 0}]], sliced)


def test_table_plan_missing_and_checks():
    plan = compile_table_plan(
        ["map", ["a", "int"], ["b", {"optional": True}, "string"], ["c", "int"]],
        table_checks=[{"kind": "col_le", "left": "a", "right": "c", "name": "a_le_c"}])
    t = pa.table({"a": [1, 5], "c": [2, 2]})
    assert plan.valid_mask(t).tolist() == [True, False]
    v = plan.explain_table(t)
    assert v.num_rows == 1 and v.column("type")[0].as_py() == "engine/check-failed"
    # missing required column -> all rows invalid with missing-key violations
    t2 = pa.table({"a": [1, 2]})
    plan2 = compile_table_plan(["map", ["a", "int"], ["c", "int"]])
    assert plan2.valid_mask(t2).tolist() == [False, False]
    v2 = plan2.explain_table(t2)
    assert set(v2.column("type").to_pylist()) == {"malli.core/missing-key"}


def test_explain_matches_row_engine_messages():
    plan = compile_table_plan(
        ["map", ["s", ["string", {"min": 2}]], ["n", ["int", {"min": 0}]]])
    t = pa.table({"s": ["ok!", "x"], "n": [-1, 3]})
    v = plan.explain_table(t)
    got = {(r["row_index"], r["column"]): r["message"] for r in v.to_pylist()}
    assert got[(1, "s")] == "should be at least 2 characters"
    assert got[(0, "n")] == "should be at least 0"


FN_INT_ARR = pa.array([1, 5, 10, None, -3, 100], type=pa.int64())


@pytest.mark.parametrize("src", [
    "x > 2", "x >= 2 and x < 50", "0 < x < 50", "not x == 5",
    "x in (1, 5, 10)", "x % 2 == 0", "abs(x) > 4", "x * 2 + 1 > 10",
    "x // 3 == 1", "x != 5", "x == 5 or x < 0",
])
def test_vectorized_fn_expressions(src):
    # :fn source strings compile to pc kernels; identical to row -safe-pred
    # semantics incl. Python null behavior (None==5 -> False, None>5 -> raise)
    check_equiv(["fn", src], FN_INT_ARR)


def test_vectorized_fn_strings_and_lists():
    sarr = pa.array(["a", "hello", None, ""], type=pa.string())
    for src in ("len(x) > 2", "len(x) == 0", "x == 'a'"):
        check_equiv(["fn", src], sarr)
    larr = pa.array([[1, 2], [1], None], type=pa.list_(pa.int64()))
    from malli_ray.arrow_compile import compile_node
    fn = compile_node(m.schema(["fn", "len(x) >= 2"]), larr.type)
    assert fn(larr).tolist() == [True, False, False]


def test_unsupported_fn_expr_falls_back():
    check_equiv(["fn", "sorted([x])[0] == x"], FN_INT_ARR)


def test_comparator_null_semantics():
    # (not= nil c) is TRUE in the row engine (Clojure not=); ordering and
    # equality on nil are false — found by the arrow-vs-row soak
    arr = pa.array([3, None, 5], type=pa.int64())
    for form in (["not=", 3], ["=", 3], [">", 3], ["<=", 3],
                 ["not", ["not=", 5]], ["maybe", ["not=", 0]]):
        check_equiv(form, arr)
    # uncomparable dtype: = -> all false, not= -> all true
    sarr = pa.array(["a", None], type=pa.string())
    for form in (["=", 3], ["not=", 3]):
        check_equiv(form, sarr)
