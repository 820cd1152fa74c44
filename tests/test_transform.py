"""Transformer conformance — mirrors transform_test.cljc semantics."""

import datetime as dt
import uuid

import pytest

import malli_ray as m
from malli_ray.transform import (
    collection_transformer, default_value_transformer, json_transformer,
    key_transformer, number_to_long, string_to_boolean, string_to_date,
    string_to_double, string_to_long, string_to_uuid, string_transformer,
    strip_extra_keys_transformer, transformer,
)

ST = string_transformer()
JT = json_transformer()


def test_scalar_fns():
    # transform_test.cljc:29+ string->long
    assert string_to_long("1") == 1
    assert string_to_long("abba") == "abba"      # garbage stays -> invalid later
    assert string_to_long("1.5") == "1.5"
    assert string_to_double("1.5") == 1.5
    assert string_to_boolean("true") is True
    assert string_to_boolean("false") is False
    assert string_to_boolean("TRUE") == "TRUE"   # only exact true/false
    assert number_to_long(2.0) == 2              # integral double rounds
    assert number_to_long(2.5) == 2.5
    u = string_to_uuid("550e8400-e29b-41d4-a716-446655440000")
    assert isinstance(u, uuid.UUID)
    assert string_to_uuid("nope") == "nope"
    d = string_to_date("2020-01-01T12:00:00Z")
    assert d == dt.datetime(2020, 1, 1, 12, tzinfo=dt.timezone.utc)


def test_decode_map_string_transformer():
    S = ["map", ["x", "boolean"], ["y", {"optional": True}, "int"], ["z", "string"]]
    out = m.decode(S, {"x": "true", "y": "1", "z": "kikka"}, ST)
    assert out == {"x": True, "y": 1, "z": "kikka"}


def test_decode_failure_keeps_original():
    out = m.decode("int", "abba", ST)
    assert out == "abba"
    assert not m.validate("int", out)


def test_identity_elision():
    # nothing to transform -> decoder is identity (README.md:3767-3790)
    dec = m.decoder(["map", ["z", "string"]], JT)
    x = {"z": "s"}
    assert dec(x) is x


def test_decode_nested():
    S = ["map", ["a", ["map", ["n", "int"]]], ["v", ["vector", "int"]]]
    out = m.decode(S, {"a": {"n": "5"}, "v": ["1", "2"]}, ST)
    assert out == {"a": {"n": 5}, "v": [1, 2]}


def test_or_transformer_first_validating_branch():
    S = ["or", "int", "boolean"]
    assert m.decode(S, "1", ST) == 1
    assert m.decode(S, "true", ST) is True


def test_json_transformer_set_and_keyword():
    assert m.decode(["set", "int"], [1, 2], JT) == {1, 2}
    assert m.decode("keyword", ":abba", JT) == "abba"
    assert m.decode("int", 2.0, JT) == 2


def test_strip_extra_keys():
    S = ["map", ["x", "int"]]
    assert m.decode(S, {"x": 1, "y": 2}, strip_extra_keys_transformer()) == {"x": 1}


def test_key_transformer():
    kt = key_transformer(decode=lambda k: k.upper())
    assert m.decode(["map", ["X", "int"]], {"x": 1}, kt) == {"X": 1}


def test_default_value_transformer():
    dv = default_value_transformer()
    S = ["map", ["x", ["int", {"default": 7}]], ["y", ["string", {"default": "d"}]]]
    assert m.decode(S, {}, dv) == {"x": 7, "y": "d"}
    assert m.decode(S, {"x": 1}, dv) == {"x": 1, "y": "d"}
    # nil fill too
    assert m.decode(S, {"x": None}, dv)["x"] == 7


def test_transformer_chain():
    chain = transformer(strip_extra_keys_transformer(), string_transformer())
    S = ["map", ["x", "int"]]
    assert m.decode(S, {"x": "1", "y": 2}, chain) == {"x": 1}


def test_schema_property_override():
    S = ["map", ["x", ["int", {"decode/string": lambda v: int(v) * 10}]]]
    assert m.decode(S, {"x": "4"}, ST) == {"x": 40}


def test_encode():
    assert m.encode("int", 1, ST) == "1"
    # booleans stay booleans on string-encode (transform.cljc:371 has
    # `;:boolean -any->string` commented out; default-transformer test
    # expects {:f true :g false} through the string chain)
    assert m.encode("boolean", True, ST) is True
    S = ["map", ["x", "int"]]
    assert m.encode(S, {"x": 5}, ST) == {"x": "5"}


def test_coerce():
    S = ["map", ["x", "int"]]
    assert m.coerce(S, {"x": "5"}, ST) == {"x": 5}
    with pytest.raises(m.SchemaError):
        m.coerce(S, {"x": "bad"}, ST)
    out = m.coercer(S, ST, raise_=lambda err: ("failed", err["explain"] is not None))
    assert out({"x": "bad"}) == ("failed", True)


def test_collection_transformer():
    assert m.decode(["set", "int"], [1, 1, 2], collection_transformer()) == {1, 2}
    assert m.decode(["vector", "int"], (1, 2), collection_transformer()) == [1, 2]


def test_default_value_add_optional_keys():
    dv = default_value_transformer(add_optional_keys=True)
    S = ["map", ["x", {"optional": True}, ["int", {"default": 3}]],
         ["y", ["string", {"default": "d"}]]]
    assert m.decode(S, {}, dv) == {"x": 3, "y": "d"}
    # without the option, optional keys stay absent
    dv2 = default_value_transformer()
    assert m.decode(S, {}, dv2) == {"y": "d"}


def test_type_defaults_table():
    dv = default_value_transformer(defaults={"int": 0, "string": ""})
    S = ["map", ["a", "int"], ["b", "string"]]
    assert m.decode(S, {}, dv) == {"a": 0, "b": ""}


def test_string_number_whitespace_reference_semantics():
    """Long/parseLong rejects surrounding whitespace; Double/parseDouble
    tolerates it — row AND batch paths agree (transform.cljc:60-91)."""
    from malli_ray.transform import string_to_long, string_to_double

    assert string_to_long("  7  ") == "  7  "   # unchanged (reject)
    assert string_to_long("7") == 7
    assert string_to_long("+7") == 7
    assert string_to_double(" 1.5 ") == 1.5     # tolerated


def test_schema_hinted_transformation_reference():
    """schema-hinted-transformation (transform_test.cljc:824-878): compact
    vs full property forms, full form masks compact, named chain steps."""
    from malli_ray.transform import json_transformer, string_transformer, transformer

    up, low = str.upper, str.lower
    s1 = ["string?", {"decode/string": up, "encode/string": low}]
    s2 = ["string?", {"decode": {"string": up}, "encode": {"string": low}}]
    for s in (s1, s2):
        assert m.decode(s, "KiKkA", string_transformer()) == "KIKKA"
        assert m.encode(s, "KiKkA", string_transformer()) == "kikka"
        # undefined transformer name: untouched
        assert m.decode(s, "KiKkA", json_transformer()) == "KiKkA"
        assert m.encode(s, "KiKkA", json_transformer()) == "KiKkA"

    # full override masks the compact key (transform_test.cljc:872-878)
    t = transformer({"name": "kikka"})
    s3 = ["string", {"encode": {"kikka": {"leave": up}},
                     "encode/kikka": {"enter": lambda s: "masked" + s},
                     "decode": {"kikka": {"enter": low}},
                     "decode/kikka": {"enter": lambda s: "masked" + s}}]
    assert m.decode(s3, "KUKKA", t) == "kukka"
    assert m.encode(s3, "kukka", t) == "KUKKA"

    # named chain steps with per-name property hooks (:851-861)
    tr = transformer({"name": "before"}, string_transformer(),
                     {"decoders": {"int?": lambda x: x + 1}},
                     {"name": "after"})
    out = m.decode(["int?", {"decode/before": {"leave": lambda x: x + 1},
                             "decode/after": lambda x: x * 2}], "10", tr)
    assert out == 23


def test_transformation_targets_reference():
    """transformation-targets (transform_test.cljc:929-949) — property
    transformations apply at every schema type (keywords are strings in
    the Python DSL)."""
    from malli_ray.transform import string_transformer

    up = str.upper
    P1 = {"decode/string": up}
    PS = {"decode/string": lambda xs: [up(x) for x in xs]}
    PM = {"decode/string": lambda d: {k: up(v) for k, v in d.items()}}
    cases = [
        (["keyword?", P1], "kikka", "KIKKA"),
        (["and", P1, "keyword?"], "kikka", "KIKKA"),
        (["or", P1, "int?", "keyword?"], "kikka", "KIKKA"),
        (["map", PM, ["x", "keyword?"]],
         {"x": "kikka", "y": "kukka"}, {"x": "KIKKA", "y": "KUKKA"}),
        (["map-of", PM, "string?", "keyword?"], {"x": "kikka"}, {"x": "KIKKA"}),
        (["tuple", PS, "keyword?", "int?"], ["kikka", "1"], ["KIKKA", 1]),
        (["enum", P1, "S", "M", "L"], "s", "S"),
        (["re", P1, ".*"], "kikka", "KIKKA"),
        (["fn", P1, lambda x: isinstance(x, str)], "kikka", "KIKKA"),
        (["maybe", P1, "keyword?"], "kikka", "KIKKA"),
        (["vector", PS, "keyword?"], ["kikka"], ["KIKKA"]),
        (["sequential", PS, "keyword?"], ["kikka"], ["KIKKA"]),
        (["set", PS, "keyword?"], {"kikka"}, {"KIKKA"}),
    ]
    for s, v, want in cases:
        assert m.decode(s, v, string_transformer()) == want, s


def test_options_in_transformation_reference():
    """options-in-transformation (transform_test.cljc:951-956): a
    {"compile": f} property interceptor sees the decode-call options."""
    from malli_ray.transform import string_transformer, transformer

    def compile_inc(schema_, options):
        inc = (options or {}).get("increment") or 0
        return lambda x: x + inc

    S = ["and", "int?", ["any?", {"decode/string": {"compile": compile_inc}}]]
    tr = transformer(string_transformer())
    assert m.decode(S, "0", tr) == 0
    assert m.decode(S, "0", tr, options={"increment": 1}) == 1
    assert m.decode(S, "0", tr, options={"increment": 1000}) == 1000


def test_compile_interceptor_depth_guard():
    """*max-compile-depth* (transform.cljc:14, 26-29)."""
    import pytest
    from malli_ray.transform import string_transformer

    def self_compiling(schema_, options):
        return {"compile": self_compiling}

    S = ["any?", {"decode/string": {"compile": self_compiling}}]
    with pytest.raises(m.SchemaError):
        m.decode(S, 1, string_transformer())


def test_default_transformer_reference():
    """default-transformer (transform_test.cljc:958-1010): nil collections,
    nested defaults, default false, optional keys, default/fn, default_fn."""
    dv = default_value_transformer
    for s, want in [
        (["vector", {"default": [1, 2, 3]}, "int?"], [1, 2, 3]),
        (["map", {"default": {"x": 10}}, ["x", "int?"]], {"x": 10}),
        (["tuple", {"default": [1, 2]}, "int?", "int?"], [1, 2]),
        (["map-of", {"default": {1: 1}}, "int?", "int?"], {1: 1}),
    ]:
        assert m.decode(s, None, dv()) == want, s

    nested = ["map", {"default": {}},
              ["a", {"default": 1}, "int?"],
              ["b", ["vector", {"default": [1, 2, 3]}, "int?"]],
              ["c", ["map", {"default": {}},
                     ["x", ["int?", {"default": 42}]],
                     ["y", "int?"]]],
              ["d", ["map", ["x", ["int?", {"default": 42}]], ["y", "int?"]]],
              ["e", "int?"],
              ["f", ["boolean?", {"default": True}]],
              ["g", ["boolean?", {"default": False}]]]
    assert m.encode(nested, None, dv()) == \
        {"a": 1, "b": [1, 2, 3], "c": {"x": 42}, "f": True, "g": False}
    # booleans survive the string chain un-stringified
    assert m.encode(nested, None, transformer(dv(), string_transformer())) == \
        {"a": "1", "b": ["1", "2", "3"], "c": {"x": "42"}, "f": True, "g": False}

    assert m.decode(["and", {"default": False}, "boolean?"], None, dv()) is False
    S = ["map", ["x", "int"], ["y", {"optional": True, "default": 0}, "int"]]
    assert m.decode(S, {"x": 5}, dv()) == {"x": 5}
    assert m.decode(S, {"x": 5}, dv(add_optional_keys=True)) == {"x": 5, "y": 0}
    assert m.decode(["int", {"default/fn": lambda: 9}], None, dv()) == 9
    assert m.decode(["int", {"default": 5}], None,
                    dv(default_fn=lambda s, x: x * 2)) == 10


def test_child_inference_reference():
    """child-inference tests (transform_test.cljc:1142-1231): :enum/:= code
    literal children via the inferred child type."""
    st, jt = string_transformer(), json_transformer()
    assert m.decode(["enum", 1, 2], "1", st) == 1
    assert m.decode(["enum", 1.1, 2.2], "1.1", st) == 1.1
    assert m.encode(["enum", 1, 2], 1, st) == "1"
    assert m.decode(["=", 1], "1", st) == 1
    assert m.encode(["=", 1.1], 1.1, st) == "1.1"
    # json decodes numbers but NOT stringified numbers
    assert m.decode(["enum", 1, 2], "1", jt) == "1"
    assert m.decode(["enum", 1, 2], 1, jt) == 1
    # string children: identity
    assert m.decode(["enum", "a", "b"], "a", st) == "a"
    # mixed types: no inference, untouched
    assert m.decode(["enum", 1, "a"], "1", st) == "1"


def test_map_of_json_keys_reference():
    """map-of-json-keys-transform (transform_test.cljc:1092-1113): JSON
    :map-of keys decode via the string decoders for the key schema; only
    decoded keys that validate are replaced."""
    import uuid as _uuid

    S = ["map-of", "int?", "uuid?"]
    data = {"0": "2ac307dc-4ec8-4046-9b7e-57716b7ecfd2",
            "1": "820e5003-6fff-480b-9e2b-ec3cdc5d2f78"}
    assert m.decode(S, data, JT) == {
        0: _uuid.UUID("2ac307dc-4ec8-4046-9b7e-57716b7ecfd2"),
        1: _uuid.UUID("820e5003-6fff-480b-9e2b-ec3cdc5d2f78")}
    # invalid keys stay as-is
    assert m.decode(["map-of", "int?", "string?"],
                    {"x": "a", "2": "b"}, JT) == {"x": "a", 2: "b"}


def test_collection_transform_reference():
    """collection-transform-test (transform_test.cljc:446-466)."""
    ct = collection_transformer()
    assert m.decode(["set", "int?"], [1, 2, 3], ct) == {1, 2, 3}
    assert sorted(m.decode(["vector", "int?"], {1, 2, 3}, ct)) == [1, 2, 3]
    assert m.decode(["tuple", "int?", "int?", "int?"], (1, 2, 3), ct) == [1, 2, 3]
    # encode uses the same coders
    assert m.encode(["set", "int?"], [1, 2, 3], ct) == {1, 2, 3}
    # strings are not collections; bad input does not raise
    assert m.encode(["set", "int?"], "123", ct) == "123"
    assert m.encode(["set", "string?"], 2, ct) == 2
    # transformers may change the top-level type on :leave
    assert m.encode(["vector", {"encode/string": {"leave": lambda v: ",".join(v)}},
                     "string?"], ["a", "b", "c"], ST) == "a,b,c"


def test_regression_480_reference():
    """regression-480 (transform_test.cljc:1123-1129): partial map encode/
    decode roundtrips."""
    import uuid as _uuid
    val = {"b": _uuid.UUID("f5a54a8f-7d78-4495-9138-e810885d1cdb")}
    S = ["map", ["a", "int"], ["b", "uuid"]]
    assert m.decode(S, m.encode(S, val, ST), ST) == val


def test_composing_transformers_reference():
    """composing-transformers (transform_test.cljc:468-539): strict-json
    chain, key-transformer chains (decode on :enter, encode on :leave so
    strip sees schema keys), strip tolerates non-map values."""
    strict = transformer(None, strip_extra_keys_transformer(), json_transformer())
    assert m.decode(["map", ["x", "keyword?"]],
                    {"x": "kikka", "y": "kukka"}, strict) == {"x": "kikka"}
    assert m.encode(["map", ["x", "keyword?"]],
                    {"x": "kikka", "y": "kukka"}, strict) == {"x": "kikka"}
    assert m.encode(["map", ["x", ["map", ["a", ["map", ["b", ["map"]]]]]]],
                    {"x": {"a": {"b": {}, "c": {}}}, "additional": 1},
                    strict) == {"x": {"a": {"b": {}}}}

    kt = transformer(
        key_transformer(decode=lambda k: k[4:], encode=lambda k: "key_" + k),
        string_transformer(),
        strip_extra_keys_transformer())
    S = ["map", ["x", "int?"], ["y", "string?"],
         ["z", {"optional": True}, "boolean?"]]
    assert m.decode(S, {"key_x": "18", "key_y": "john", "key_a": "doe"},
                    kt) == {"x": 18, "y": "john"}
    assert m.encode(S, {"x": 18, "y": "john", "a": "doe"},
                    kt) == {"key_x": "18", "key_y": "john"}

    assert m.decode(["map", {"decode/string": lambda s: {"foo": s}},
                     ["foo", "string"]], "bar",
                    transformer(strip_extra_keys_transformer(),
                                string_transformer())) == {"foo": "bar"}


def test_interceptor_call_order_reference():
    """interceptor-style-transformers (transform_test.cljc:699-783): parent
    :enter wraps children, :leave runs after them, depth-first."""
    calls = []

    def rec(n):
        return {"enter": lambda x: (calls.append(("enter", n)), x)[1],
                "leave": lambda x: (calls.append(("leave", n)), x)[1]}

    tr = transformer({"name": "order",
                      "decoders": {"map": rec("map"), "map-of": rec("map-of"),
                                   "vector": rec("vector"), "multi": rec("multi"),
                                   "tuple": rec("tuple"),
                                   "int?": rec("int"), "string?": rec("string")}})
    cases = [
        (["map", ["foo", "int?"], ["bar", "string?"]], {"foo": 5, "bar": "wee"},
         [("enter", "map"), ("enter", "int"), ("leave", "int"),
          ("enter", "string"), ("leave", "string"), ("leave", "map")]),
        (["map-of", "int?", "string?"], {5: "foo"},
         [("enter", "map-of"), ("enter", "int"), ("leave", "int"),
          ("enter", "string"), ("leave", "string"), ("leave", "map-of")]),
        (["vector", "int?"], [5, 6],
         [("enter", "vector"), ("enter", "int"), ("leave", "int"),
          ("enter", "int"), ("leave", "int"), ("leave", "vector")]),
        (["tuple", "string?", "int?"], ["Foo", 5],
         [("enter", "tuple"), ("enter", "string"), ("leave", "string"),
          ("enter", "int"), ("leave", "int"), ("leave", "tuple")]),
        (["multi", {"dispatch": "kind"},
          ["person", ["map", ["name", "string?"]]],
          ["food", ["map", ["weight", "int?"]]]],
         {"kind": "food", "weight": 42},
         [("enter", "multi"), ("enter", "map"), ("enter", "int"),
          ("leave", "int"), ("leave", "map"), ("leave", "multi")]),
    ]
    for s, v, want in cases:
        calls.clear()
        m.decode(s, v, tr)
        assert calls == want, (s, calls)

    # map :enter/:leave around per-entry encoders
    tf = transformer({"name": "custom",
                      "encoders": {"map": {"enter": lambda d: {**d, "x": d["x"] + 1},
                                           "leave": lambda d: {**d, "y": d["y"] + "!"}},
                                   "keyword?": lambda k: k}})
    assert m.encode(["map", ["x", "int?"], ["y", "keyword?"]],
                    {"x": 5, "y": "foo"}, tf) == {"x": 6, "y": "foo!"}
