"""Edge-case semantic parity (SURVEY.md SS7.5 'hard parts') + retry
idempotency of the fragment processor."""

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import malli_ray as m
from malli_ray import DEFAULT_KEY, INVALID, Tag


def test_present_nil_vs_missing_key():
    # present-but-nil must validate the child; missing is ::missing-key
    S = ["map", ["x", ["maybe", "int"]], ["y", "int"]]
    assert m.validate(S, {"x": None, "y": 1})
    assert not m.validate(S, {"y": 1})
    e = m.explain(S, {"y": 1})
    assert e["errors"][0]["type"] == "malli.core/missing-key"
    S2 = ["map", ["x", "int"]]
    assert not m.validate(S2, {"x": None})  # nil fails int
    e2 = m.explain(S2, {"x": None})
    assert e2["errors"][0].get("type") != "malli.core/missing-key"


def test_closed_with_default_entry():
    # ::m/default owns the rest of the map; closed does not double-fire
    # (core.cljc:1290-1294 interplay)
    S = ["map", {"closed": True}, ["x", "int"],
         [DEFAULT_KEY, ["map-of", "string", "int"]]]
    assert m.validate(S, {"x": 1, "extra": 2})
    assert not m.validate(S, {"x": 1, "extra": "s"})


def test_multi_callable_dispatch():
    S = ["multi", {"dispatch": lambda x: "big" if x > 10 else "small"},
         ["big", [">", 10]], ["small", ["<=", 10]]]
    assert m.validate(S, 20) and m.validate(S, 5)
    assert m.parse(S, 20) == Tag("big", 20)


def test_enum_mixed_dtype_arrow():
    from malli_ray.arrow_compile import compile_node
    # int enum against a string column: all rows invalid, no crash
    arr = pa.array(["a", "b"], type=pa.string())
    fn = compile_node(m.schema(["enum", 1, 2]), arr.type)
    assert fn(arr).tolist() == [False, False]
    # unhashable enum children fall back to row engine
    assert m.validate(["enum", [1, 2], [3]], [1, 2])


def test_nested_maybe_explain_path():
    S = ["map", ["v", ["maybe", ["vector", "int"]]]]
    e = m.explain(S, {"v": [1, "bad"]})
    assert e["errors"][0]["in"] == ["v", 1]
    assert e["errors"][0]["path"] == ["v", 0, 0]


def test_or_decode_only_when_branch_validates():
    from malli_ray.transform import string_transformer
    # "x" decodes by neither branch -> original kept, invalid
    S = ["or", "int", "boolean"]
    out = m.decode(S, "x", string_transformer())
    assert out == "x" and not m.validate(S, out)


def test_transformer_enter_leave_order():
    from malli_ray.transform import Transformer
    trace = []
    t = Transformer("t", decoders={
        "map": {"enter": lambda x: (trace.append("map-enter"), x)[1],
                "leave": lambda x: (trace.append("map-leave"), x)[1]},
        "int": lambda x: (trace.append("int"), x)[1]})
    m.decode(["map", ["x", "int"]], {"x": 1}, t)
    assert trace == ["map-enter", "int", "map-leave"]


def test_every_long_tail_and_stats():
    # :every over the sequences tokens column must not scan full lists
    from malli_ray.arrow_compile import compile_node
    arr = pa.array([list(range(200))], type=pa.list_(pa.int64()))
    fn = compile_node(m.schema(["every", ["int", {"min": 0, "max": 100}]]),
                      arr.type)
    # elements 101..199 are out of bounds but beyond the check limit;
    # elements 101..150 violate -> but only first 101 are checked -> valid
    assert fn(arr).tolist() == [m.validator(
        ["every", ["int", {"min": 0, "max": 100}]])(list(range(200)))]


def test_fragment_retry_idempotent(ray_session, tmp_path):
    """Simulated task retry: processing the same fragment twice produces
    byte-identical violation files and identical lineage."""
    from malli_ray.pipelines.validation_job import _ProcessFragment
    from malli_ray.sources.sequences import generate_sequences_shard
    from malli_ray.stages.validator import ValidationSpec
    from malli_ray.sources.sequences import ALLOWED_SOURCES, SEQUENCES_DSL

    frag = tmp_path / "part-00000.parquet"
    pq.write_table(generate_sequences_shard(0, 2000, 0), frag)
    spec = ValidationSpec(
        schema=SEQUENCES_DSL,
        checks=[{"kind": "in_set", "column": "source",
                 "allowed": ALLOWED_SOURCES, "name": "ref"}],
        id_column="doc_id", hll_columns=["doc_id"], tdigest_columns=["n_tok"])
    out_dir = str(tmp_path / "out")
    proc = _ProcessFragment(spec, out_dir, rows_per_batch=512)
    r1 = proc._process(str(frag))
    vio_path = os.path.join(out_dir, "violations", "part-00000.parquet")
    bytes1 = open(vio_path, "rb").read()
    r2 = proc._process(str(frag))
    bytes2 = open(vio_path, "rb").read()
    assert r1 == r2
    assert bytes1 == bytes2


def test_violation_cap_respected():
    from malli_ray.arrow_compile import compile_table_plan
    plan = compile_table_plan(["map", ["n", ["int", {"min": 100}]]])
    t = pa.table({"n": list(range(50))})  # all 50 rows violate
    v = plan.explain_table(t, max_violations=7)
    assert v.num_rows == 7


def test_missing_column_with_checks_explain(tmp_path):
    """Regression: explain with precomputed (short-circuited) masks must not
    crash when a required column is missing but others exist (found by the
    CLI layout-mismatch probe)."""
    import pyarrow.parquet as pq
    from malli_ray.pipelines.validation_job import _ProcessFragment
    from malli_ray.sources.sequences import generate_sequences_shard
    from malli_ray.stages.validator import ValidationSpec

    frag = tmp_path / "part-0.parquet"
    pq.write_table(generate_sequences_shard(0, 100, 0), frag)
    spec = ValidationSpec(
        schema=["map", ["docid", "string"], ["n_tok", "string"]],
        checks=[{"kind": "col_eq", "left": "n_tok", "right": "n_tok",
                 "name": "self"}],
        id_column="docid")
    proc = _ProcessFragment(spec, str(tmp_path / "out"), rows_per_batch=64)
    rec = proc._process(str(frag))
    assert rec["n_valid"] == 0 and rec["row_count"] == 100
    assert rec["violation_count"] > 0


def test_review_findings_regressions():
    """Regressions for the round-1 code-review findings."""
    from malli_ray.transform import string_transformer

    # repeat min-count soundness (position engine)
    S = ["repeat", {"min": 3}, ["alt", ["cat", "int?", "int?"], "int?"]]
    assert not m.validate(S, [1, 1])
    assert m.validate(S, [1, 1, 1])

    # unparse inverse through tagged children in collections/tuples/map-of
    s = ["vector", ["orn", ["n", "int"], ["s", "string"]]]
    assert m.unparse(s, m.parse(s, [1, "a"])) == [1, "a"]
    s = ["tuple", ["orn", ["n", "int"]], "string"]
    assert m.unparse(s, m.parse(s, [1, "x"])) == [1, "x"]
    s = ["map-of", "string", ["orn", ["n", "int"]]]
    assert m.unparse(s, m.parse(s, {"a": 1})) == {"a": 1}

    # :and chains every conjunct's transformer
    assert m.decode(["and", "any", "int"], "42", string_transformer()) == 42

    # enum type-strict membership (1 != True != 1.0)
    assert not m.validate(["enum", 0, 1], True)
    assert not m.validate(["enum", 1], 1.0)
    assert m.validate(["enum", True], True)


def test_vectorized_fn_floor_semantics():
    # Arrow % and // must match Python floor semantics for negatives
    import pyarrow as _pa
    from malli_ray.arrow_compile import compile_node
    arr = _pa.array([-7, -4, -1, 0, 7], type=_pa.int64())
    for src in ("x % 2 == 1", "x // 2 == -4", "x % 3 == 2"):
        fn = compile_node(m.schema(["fn", src]), arr.type)
        got = fn(arr).tolist()
        want = [m.validator(["fn", src])(v) for v in arr.to_pylist()]
        assert got == want, (src, got, want)


def test_hll_accuracy_and_merge_determinism():
    import numpy as np
    from malli_ray.state.sketches import HyperLogLog

    rng = np.random.default_rng(7)
    # FULL 64-bit uniform hashes (hash64 guarantees this; biased hashes
    # degrade HLL since the index is the top p bits)
    def hashes(n):
        return rng.integers(0, 2**64, n, dtype=np.uint64)
    for true_n in (1_000, 50_000, 500_000):
        h = HyperLogLog()
        h.add_hashes(hashes(true_n))
        est = h.cardinality()
        assert abs(est - true_n) / true_n < 0.05, (true_n, est)
    # merge == union; digest roundtrip stable
    a, b = HyperLogLog(), HyperLogLog()
    xs = hashes(10_000)
    a.add_hashes(xs[:6000]); b.add_hashes(xs[4000:])
    merged = HyperLogLog.from_digest(a.digest()).merge(
        HyperLogLog.from_digest(b.digest()))
    whole = HyperLogLog(); whole.add_hashes(xs)
    assert merged.digest() == whole.digest()   # register-exact union


def test_round4_review_regressions():
    import pytest as _pytest
    from malli_ray.generator import generate
    from malli_ray.instrument import instrument
    from malli_ray.json_schema import parse as js_parse, transform as js_transform
    from malli_ray.registry import LazyRegistry, registry_of
    from malli_ray.dot import transform as to_dot

    # instrument passes kwargs through
    @instrument(["=>", ["cat", "int", "int"], "int"])
    def add(x, y):
        return x + y
    assert add(1, y=2) == 3

    # generator raises (never returns invalid) for unsatisfiable map-of
    with _pytest.raises(m.SchemaError):
        generate(["map-of", {"min": 3}, "boolean", "int"])

    # lazy registry works under a local {"registry": ...} subtree
    lazy = LazyRegistry(lambda name: "int" if name == "Remote" else None)
    reg = registry_of(lazy)
    S = ["map", {"registry": {"Local": "string"}},
         ["a", "Remote"], ["b", "Local"]]
    assert m.validate(S, {"a": 1, "b": "x"}, {"registry": reg})

    # json-schema parse honors exclusive bounds; maybe-nil doesn't crash
    back = js_parse(js_transform([">", 5]))
    assert m.validate(back, 6) and not m.validate(back, 5)
    assert js_parse(js_transform(["maybe", "nil"])) == "nil"

    # dot escapes quotes in edge labels
    dot = to_dot(["map", ['say "hi"', "int"]])
    assert '"say "hi""' not in dot


def test_round5_review_regressions(tmp_path, ray_session):
    import pyarrow as _pa
    from malli_ray import util as mu
    from malli_ray.arrow_compile import compile_node
    from malli_ray import Tag, INVALID
    import pytest as _pytest

    # enum arrow path is type-strict like the row engine
    fn = compile_node(m.schema(["enum", 1, 2]), _pa.float64())
    assert fn(_pa.array([1.0, 2.0])).tolist() == [False, False]
    fn = compile_node(m.schema(["enum", 1, 0]), _pa.bool_())
    assert fn(_pa.array([True, False])).tolist() == [False, False]

    # closed_schema reaches :multi branches
    c = mu.closed_schema(["multi", {"dispatch": "type"},
                          ["a", ["map", ["type", "string"], ["x", "int"]]]])
    assert m.validate(c, {"type": "a", "x": 1})
    assert not m.validate(c, {"type": "a", "x": 1, "zzz": 9})

    # :ref unparser derefs
    opts = {"registry": {**m.default_registry(), "A": ["orn", ["i", "int"]]}}
    S = m.schema(["ref", "A"], opts)
    assert S.unparser()(Tag("i", 1)) == 1

    # registry alias with props APPLIES them to the expanded schema
    # (updated to reference issue-451 semantics: the props re-bind the
    # target's top node, never silently dropped)
    reg = {**m.default_registry(), "MyInt": "int"}
    bounded = m.schema(["MyInt", {"min": 10}], {"registry": reg})
    assert m.validate(bounded, 12) and not m.validate(bounded, 5)
    assert m.validate("MyInt", 5, {"registry": reg})
    # children on an alias are still rejected
    with _pytest.raises(m.SchemaError):
        m.schema(["MyInt", "int"], {"registry": reg})

    # ::m/default entries parse THROUGH the default schema
    S = ["map", ["a", "int"],
         [m.DEFAULT_KEY, ["map-of", "string", ["orn", ["s", "string"]]]]]
    p = m.parse(S, {"a": 1, "x": "v"})
    assert p == {"a": 1, "x": Tag("s", "v")}
    assert m.unparse(S, p) == {"a": 1, "x": "v"}

    # instrument binds kwargs by declaration order
    from malli_ray.instrument import instrument

    @instrument(["=>", ["cat", "int", "string"], "any"])
    def f(x, y):
        return (x, y)
    assert f(y="s", x=1) == (1, "s")

    # duplicate basenames across dirs both get validated
    import pyarrow.parquet as _pq
    from malli_ray.pipelines.validation_job import run_job
    from malli_ray.stages.validator import ValidationSpec
    d1 = tmp_path / "a"; d2 = tmp_path / "b"
    d1.mkdir(); d2.mkdir()
    _pq.write_table(_pa.table({"n": [1, 2]}), d1 / "part-0.parquet")
    _pq.write_table(_pa.table({"n": [3, -4]}), d2 / "part-0.parquet")
    spec = ValidationSpec(schema=["map", ["n", ["int", {"min": 0}]]])
    rep = run_job([str(d1 / "part-0.parquet"), str(d2 / "part-0.parquet")],
                  spec, str(tmp_path / "out"))
    assert rep["n_rows"] == 4 and rep["n_valid"] == 3


def test_round6_review_regressions():
    import pyarrow as _pa
    from malli_ray import Tag
    from malli_ray.arrow_compile import compile_table_plan, compile_node
    from malli_ray.provider import finalize, merge_stats, _new_stats, accumulate_value
    import json as _json

    # default-entry parse replaces rest keys (no stale raw keys)
    S = ["map", ["a", "int"],
         [m.DEFAULT_KEY, ["map-of", ["orn", ["s", "string"]], "int"]]]
    p = m.parse(S, {"a": 1, "x": 2})
    assert p == {"a": 1, Tag("s", "x"): 2}
    assert m.unparse(S, p) == {"a": 1, "x": 2}

    # vectorized map validates ::default rest columns (soundness)
    plan = compile_table_plan(
        ["map", ["a", "int"], [m.DEFAULT_KEY, ["map-of", "string", "string"]]])
    t = _pa.table({"a": [1, 2], "b": [5, 6]})
    got = plan.valid_mask(t).tolist()
    want = [m.validator(plan.schema)(r) for r in t.to_pylist()]
    assert got == want == [False, False]
    t2 = _pa.table({"a": [1], "b": ["ok"]})
    assert plan.valid_mask(t2).tolist() == [True]

    # provider overflow sentinel survives a JSON-round-tripped merge
    wide = [[float(i) for i in range(30)]] * 3
    part = _new_stats()
    for v in wide:
        accumulate_value(part, v)
    rt = _json.loads(_json.dumps(part))
    merged = merge_stats(_new_stats(), rt)
    assert finalize(merged, {"tuple-threshold": 2})[0] == "vector"

    # enum with a nil member accepts nulls on the Arrow path; note
    # ["enum", None, ...] parses None as the (nil) PROPERTIES slot exactly
    # like malli, so the nil member needs explicit {} props
    arr = _pa.array(["a", None, "b"], type=_pa.string())
    form = ["enum", {}, None, "a"]
    fn = compile_node(m.schema(form), arr.type)
    got = fn(arr).tolist()
    want = [m.validator(form)(v) for v in arr.to_pylist()]
    assert got == want == [True, True, False]

    # instrument flattens *args/**kwargs
    from malli_ray.instrument import instrument

    @instrument(["=>", ["cat", "int", "int", "boolean"], "any"])
    def f(*args, flag=False):
        return (args, flag)
    assert f(1, 2, flag=True) == ((1, 2), True)
