"""Arrow schema <-> DSL conversion + describe exporter."""

import pyarrow as pa

import malli_ray as m
from malli_ray.arrow_schema import (
    from_arrow_schema, schema_compatible, to_arrow_schema, to_arrow_type,
)
from malli_ray.describe import describe
from malli_ray.sources.sequences import SEQUENCES_DSL, SEQUENCES_SCHEMA


def test_to_arrow_schema_sequences():
    got = to_arrow_schema(SEQUENCES_DSL)
    # declared layout matches the physical F1 table (int width via property)
    assert got.names == ["doc_id", "tokens", "n_tok", "source"]
    assert pa.types.is_string(got.field("doc_id").type)
    assert pa.types.is_list(got.field("tokens").type)
    assert pa.types.is_integer(got.field("n_tok").type)
    assert pa.types.is_string(got.field("source").type)


def test_arrow_type_overrides():
    assert to_arrow_type(["int", {"arrow/type": "int32"}]) == pa.int32()
    assert to_arrow_type(["vector", ["int", {"arrow/type": "int32"}]]) == \
        pa.list_(pa.int32())
    assert to_arrow_type(["enum", 1, 2]) == pa.int64()
    assert to_arrow_type(["enum", "a"]) == pa.string()
    assert to_arrow_type(["maybe", "double"]) == pa.float64()
    assert to_arrow_type(["tuple", "double", "double"]) == pa.list_(pa.float64(), 2)
    assert to_arrow_type(["tuple", "int", "string"]) == pa.struct(
        [("f0", pa.int64()), ("f1", pa.string())])
    assert to_arrow_type(["map-of", "string", "int"]) == pa.map_(pa.string(), pa.int64())


def test_from_arrow_schema_roundtrip_validates():
    form = from_arrow_schema(SEQUENCES_SCHEMA)
    # the inferred DSL accepts rows of the physical table
    from malli_ray.sources.sequences import generate_sequences_shard
    t = generate_sequences_shard(0, 50, 0)
    v = m.validator(form)
    assert all(v(row) for row in t.to_pylist())


def test_nested_struct_mapping():
    dt = pa.struct([("street", pa.string()), ("zip", pa.int64())])
    form = from_arrow_schema(pa.schema([("addr", dt)]))
    assert m.validate(form, {"addr": {"street": "s", "zip": 1}})


def test_schema_compatible():
    ok = schema_compatible(SEQUENCES_DSL, SEQUENCES_SCHEMA)
    assert ok == []
    bad = schema_compatible(SEQUENCES_DSL,
                            pa.schema([("doc_id", pa.string())]))
    assert any("missing required" in p for p in bad)
    mism = schema_compatible(["map", ["n_tok", "string"]],
                             pa.schema([("n_tok", pa.int32())]))
    assert any("expects" in p for p in mism)


def test_describe():
    assert describe("int") == "integer"
    assert describe(["string", {"min": 2, "max": 4}]) == \
        "string between 2 and 4 characters long"
    assert describe(["maybe", "int"]) == "nullable integer"
    assert describe(["enum", "a", "b"]) == "one of 'a', 'b'"
    d = describe(SEQUENCES_DSL)
    assert d.startswith("map of {doc_id: string at least 1")
    assert "vector of integer between 0 and 50256" in d
    assert describe(["vector", {"min": 1}, "int"]) == \
        "vector of integer at least 1 items"
    assert describe(["map", ["x", {"optional": True}, "int"]]) == \
        "map of {x (optional): integer}"


def test_dot_export():
    from malli_ray.dot import transform as to_dot
    dot = to_dot(["map", ["x", "boolean"], ["y", {"optional": True}, "int"],
                  ["v", ["vector", ["enum", "a", "b"]]]])
    assert dot.startswith("digraph schema {")
    assert '[label="x"]' in dot
    assert "style=dashed" in dot       # optional entry edge
    assert "enum 'a' 'b'" in dot
    assert dot.endswith("}")


def test_assert():
    import malli_ray.core as core
    assert core.assert_("int", 5) == 5
    import pytest as _pytest
    with _pytest.raises(core.SchemaError):
        core.assert_("int", "x")
    core.ASSERTS_ENABLED = False
    try:
        assert core.assert_("int", "x") == "x"
    finally:
        core.ASSERTS_ENABLED = True


def test_describe_recursive_refs():
    """Recursive :ref schemas describe by name with one expansion
    (previously RecursionError)."""
    from malli_ray.describe import describe

    CONS = ["schema", {"registry": {
        "ConsCell": ["maybe", ["tuple", "int", ["ref", "ConsCell"]]]}},
        "ConsCell"]
    out = describe(CONS)
    assert "ConsCell" in out and "nullable tuple" in out
    PP = ["schema", {"registry": {
        "Ping": ["maybe", ["tuple", ["=", "ping"], ["ref", "Pong"]]],
        "Pong": ["maybe", ["tuple", ["=", "pong"], ["ref", "Ping"]]]}}, "Ping"]
    assert "Pong" in describe(PP)


def test_arrow_schema_recursive_ref_clear_error():
    """Arrow types are non-recursive: ref cycles raise a clear ValueError
    instead of RecursionError; non-recursive refs still convert."""
    import pytest
    from malli_ray.arrow_schema import to_arrow_schema

    REC = ["map", {"registry": {
        "Tree": ["maybe", ["map", ["v", "int"],
                           ["kids", ["vector", ["ref", "Tree"]]]]]}},
        ["id", "int"], ["tree", "Tree"]]
    with pytest.raises(ValueError, match="recursive schema"):
        to_arrow_schema(REC)
    OK = ["map", {"registry": {"Point": ["map", ["x", "int"], ["y", "int"]]}},
          ["p", ["ref", "Point"]]]
    s = to_arrow_schema(OK)
    assert str(s.field("p").type).startswith("struct")
