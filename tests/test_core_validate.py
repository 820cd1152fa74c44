"""Validator conformance — mirrors the golden-value style of
/root/reference/test/malli/core_test.cljc (SURVEY.md SS5.1/5.2)."""

import math
import uuid

import pytest

import malli_ray as m


def test_type_schemas():
    assert m.validate("int", 1)
    assert not m.validate("int", True)  # bool is not an int
    assert not m.validate("int", 1.0)
    assert not m.validate("int", None)
    assert m.validate("string", "x") and not m.validate("string", 1)
    assert m.validate("boolean", True) and not m.validate("boolean", 1)
    assert m.validate("double", 1.5) and m.validate("double", 1)
    assert m.validate("keyword", "k")
    assert m.validate("qualified-keyword", "ns/k")
    assert not m.validate("qualified-keyword", "k")
    assert m.validate("uuid", uuid.uuid4()) and not m.validate("uuid", "nope")
    assert m.validate("nil", None) and not m.validate("nil", 0)
    assert m.validate("any", object()) and m.validate("any", None)
    assert m.validate("some", 0) and not m.validate("some", None)


def test_type_properties_min_max():
    # value bounds (core.cljc:824) vs count bounds (:823)
    assert m.validate(["int", {"min": 0, "max": 10}], 5)
    assert not m.validate(["int", {"min": 0}], -1)
    assert not m.validate(["int", {"max": 10}], 11)
    assert m.validate(["string", {"min": 1, "max": 4}], "abc")
    assert not m.validate(["string", {"min": 1}], "")
    assert not m.validate(["string", {"max": 2}], "abc")


def test_predicate_schemas():
    assert m.validate("int?", 42) and not m.validate("int?", "42")
    assert m.validate("pos-int?", 1) and not m.validate("pos-int?", 0)
    assert m.validate("neg-int?", -1) and not m.validate("neg-int?", 0)
    assert m.validate("nat-int?", 0) and not m.validate("nat-int?", -1)
    assert m.validate("pos?", 0.5) and not m.validate("pos?", -0.5)
    assert m.validate("zero?", 0) and not m.validate("zero?", 1)
    assert m.validate("number?", 1.5) and m.validate("number?", 2)
    assert m.validate("coll?", [1]) and m.validate("coll?", {"a": 1})
    assert m.validate("map?", {}) and not m.validate("map?", [])
    assert m.validate("vector?", []) and not m.validate("vector?", {})
    assert m.validate("set?", set()) and not m.validate("set?", [])
    assert m.validate("nil?", None) and m.validate("some?", 1)
    assert m.validate("true?", True) and not m.validate("true?", 1)
    assert m.validate("false?", False) and not m.validate("false?", 0)
    assert m.validate("empty?", []) and not m.validate("empty?", [1])
    assert m.validate("bytes?", b"x") and not m.validate("bytes?", "x")
    assert m.validate("fn?", len) and not m.validate("fn?", 1)
    assert m.validate("seqable?", None)  # nil is seqable in Clojure


def test_comparators():
    assert m.validate([">", 5], 6) and not m.validate([">", 5], 5)
    assert m.validate([">=", 5], 5) and not m.validate([">=", 5], 4)
    assert m.validate(["<", 5], 4) and not m.validate(["<", 5], 5)
    assert m.validate(["<=", 5], 5)
    assert m.validate(["=", "a"], "a") and not m.validate(["=", "a"], "b")
    assert m.validate(["not=", "a"], "b")
    assert not m.validate([">", 5], "x")  # uncomparable -> false, no throw


def test_enum_re_fn():
    assert m.validate(["enum", 1, 2], 2) and not m.validate(["enum", 1, 2], 3)
    assert m.validate(["re", r"\d+"], "abc123")   # re-find semantics
    assert not m.validate(["re", r"^\d+$"], "abc")
    assert not m.validate(["re", r"\d"], 5)       # non-string
    assert m.validate(["fn", lambda x: x > 2], 3)
    assert not m.validate(["fn", lambda x: x > 2], 1)
    assert not m.validate(["fn", lambda x: x.undefined], 1)  # -safe-pred
    assert m.validate(["fn", "x > 2"], 3)  # restricted source-string form


def test_and_or_not_maybe():
    assert m.validate(["and", "int?", ["or", "pos-int?", "neg-int?"]], 5)
    assert not m.validate(["and", "int?", ["or", "pos-int?", "neg-int?"]], 0)
    assert m.validate(["not", "int?"], "x") and not m.validate(["not", "int?"], 1)
    assert m.validate(["maybe", "int"], None)
    assert m.validate(["maybe", "int"], 1)
    assert not m.validate(["maybe", "int"], "x")
    assert m.validate(["orn", ["pos", "pos-int?"], ["neg", "neg-int?"]], -2)


def test_map_schema():
    S = ["map", ["x", "boolean"], ["y", {"optional": True}, "int"], ["z", "string"]]
    assert m.validate(S, {"x": True, "z": "s"})
    assert m.validate(S, {"x": True, "y": 1, "z": "s"})
    assert not m.validate(S, {"x": True, "y": "bad", "z": "s"})
    assert not m.validate(S, {"x": True})                 # missing z
    assert m.validate(S, {"x": True, "z": "s", "extra": 1})  # open by default
    C = ["map", {"closed": True}, ["x", "int"]]
    assert not m.validate(C, {"x": 1, "extra": 1})
    assert not m.validate(S, [1, 2])                      # not a map


def test_map_default_entry():
    # ::m/default rest-schema (core.cljc:1237-1263)
    S = ["map", ["x", "int"],
         [m.DEFAULT_KEY, ["map-of", "string", "int"]]]
    assert m.validate(S, {"x": 1, "other": 2})
    assert not m.validate(S, {"x": 1, "other": "s"})


def test_map_of():
    S = ["map-of", "string", "int"]
    assert m.validate(S, {"a": 1}) and not m.validate(S, {"a": "x"})
    assert not m.validate(S, {1: 1})
    assert m.validate(["map-of", {"min": 1}, "string", "int"], {"a": 1})
    assert not m.validate(["map-of", {"min": 2}, "string", "int"], {"a": 1})


def test_collections():
    assert m.validate(["vector", "int"], [1, 2])
    assert not m.validate(["vector", "int"], [1, "a"])
    assert not m.validate(["vector", "int"], {1, 2})  # set is not a vector
    assert m.validate(["set", "int"], {1, 2})
    assert m.validate(["sequential", "int"], (1, 2))
    assert m.validate(["vector", {"min": 1, "max": 2}, "int"], [1])
    assert not m.validate(["vector", {"min": 1}, "int"], [])
    assert not m.validate(["vector", {"max": 2}, "int"], [1, 2, 3])
    # :every checks only a bounded prefix of LAZY iterables; countable
    # collections validate fully (core.cljc:1499-1522, -safely-countable?)
    data = [1] * 150 + ["bad"]
    assert m.validate(["every", "int"], iter(data))
    assert not m.validate(["every", "int"], data)
    assert not m.validate(["vector", "int"], data)


def test_tuple():
    S = ["tuple", "double", "double"]
    assert m.validate(S, [1.0, 2.0])
    assert not m.validate(S, [1.0])
    assert not m.validate(S, [1.0, "x"])


def test_multi():
    S = ["multi", {"dispatch": "type"},
         ["user", ["map", ["type", "string"], ["name", "string"]]],
         [m.DEFAULT_KEY, ["map", ["type", "string"]]]]
    assert m.validate(S, {"type": "user", "name": "n"})
    assert m.validate(S, {"type": "other"})     # default branch
    assert not m.validate(S, {"type": "user"})  # missing name


def test_recursive_ref():
    S = ["schema", {"registry": {
        "node": ["map", ["v", "int"],
                 ["children", {"optional": True}, ["vector", ["ref", "node"]]]]}},
         ["ref", "node"]]
    assert m.validate(S, {"v": 1, "children": [{"v": 2, "children": [{"v": 3}]}]})
    assert not m.validate(S, {"v": 1, "children": [{"v": "bad"}]})


def test_seq_regex_validate():
    assert m.validate(["*", "int?"], [1, 2, 3])
    assert m.validate(["*", "int?"], [])
    assert not m.validate(["+", "int?"], [])
    assert m.validate(["+", "int?"], [1])
    assert m.validate(["?", "int?"], []) and m.validate(["?", "int?"], [1])
    assert not m.validate(["?", "int?"], [1, 2])
    assert m.validate(["repeat", {"min": 2, "max": 3}, "int?"], [1, 2])
    assert not m.validate(["repeat", {"min": 2}, "int?"], [1])
    assert m.validate(["cat", "string?", "int?"], ["a", 1])
    assert not m.validate(["cat", "string?", "int?"], ["a"])
    assert m.validate(["alt", "string?", "int?"], ["a"])
    CLI = ["*", ["catn", ["prop", "string?"],
                 ["val", ["altn", ["s", "string?"], ["b", "boolean?"]]]]]
    assert m.validate(CLI, ["-server", "foo", "-verbose", True, "-user", "joe"])
    assert not m.validate(CLI, ["-server", "foo", "-verbose"])


def test_form_roundtrip():
    forms = [
        "int",
        ["int", {"min": 0}],
        ["map", ["x", "boolean"], ["y", {"optional": True}, "int"]],
        ["vector", {"min": 1}, "int"],
        ["enum", "a", "b"],
        ["tuple", "double", "double"],
        ["maybe", "int"],
        ["or", "int", "string"],
    ]
    for f in forms:
        assert m.form(m.schema(f)) == f


def test_ast_roundtrip():
    S = ["map", ["x", "boolean"], ["y", {"optional": True}, "int"]]
    assert m.form(m.from_ast(m.ast(S))) == S


def test_custom_type_registration():
    from malli_ray.core import SimpleSchema

    def ctor(type_, props, children, options):
        return SimpleSchema(type_, props, children, options,
                            lambda x: isinstance(x, str) and x.startswith("u-"))

    reg = dict(m.default_registry())
    reg["user-id"] = ctor
    assert m.validate("user-id", "u-1", {"registry": reg})
    assert not m.validate("user-id", "x", {"registry": reg})


def test_core_api_wrappers():
    """m/schema? into-schema type-properties options deref-all
    deref-recursive explicit-keys default-schema schema-walker
    (src/malli/core.cljc:2534-2639, 2843-2863)."""
    import malli_ray as m

    s = m.schema(["map", ["x", "int"]])
    assert m.is_schema(s) and not m.is_schema(["map"])
    s2 = m.into_schema("map", {"closed": True}, [["x", "int"]])
    assert m.validate(s2, {"x": 1}) and not m.validate(s2, {"x": 1, "y": 2})
    assert m.type_properties("int") == {}
    assert m.options(s) is None or isinstance(m.options(s), dict)

    W = ["schema", {"registry": {"X": ["int", {"min": 1}]}}, "X"]
    assert m.deref_all(W).type == "int"

    D = ["schema", {"registry": {"Pair": ["tuple", "int", "int"]}},
         ["map", ["p", "Pair"]]]
    dr = m.deref_recursive(D)
    assert dr.form == ["map", ["p", ["tuple", "int", "int"]]]
    # :ref is the recursion boundary — never loops
    CONS = ["schema", {"registry": {
        "ConsCell": ["maybe", ["tuple", "int", ["ref", "ConsCell"]]]}},
        "ConsCell"]
    assert m.validate(m.deref_recursive(CONS), [1, [2, None]])

    assert m.explicit_keys(["map", ["a", "int"], ["b", "int"]]) == ["a", "b"]
    ds = m.default_schema(["map", ["malli.core/default",
                                   ["map-of", "string", "int"]]])
    assert ds is not None and ds.type == "map-of"
    assert m.default_schema(["map", ["a", "int"]]) is None

    seen = []
    m.walk(s, m.schema_walker(lambda sc: seen.append(sc.type) or sc))
    assert seen == ["int", "map"]


def test_every_bounded_prefix_reference():
    """every-schema-test (core_test.cljc:3511-3570): countable collections
    validate fully; lazy iterables (the Python analog of uncounted seqs)
    validate only the first max(max+1, min, coll-check-limit=101) items."""
    def lazy(seq):
        return (v for v in seq)

    bad_tail = list(range(1000)) + [None]

    assert m.validate(["every", "int"], None)
    assert m.validate(["every", "int"], {1, 2, 3})
    assert m.validate(["every", "int"], [1, 2, 3])
    assert not m.validate(["every", "int"], {1, None, 3})
    # countable: EVERYTHING is validated
    assert not m.validate(["every", "int"], bad_tail)
    # lazy: only the first 101 items are checked -> the bad tail is unseen
    assert m.validate(["every", "int"], lazy(bad_tail))
    # a larger coll-check-limit option reaches the tail
    assert not m.validate(["every", "int"], lazy(bad_tail),
                          {"malli.core/coll-check-limit": 1002})
    # min/max push `bounded` out far enough to see the tail
    assert m.validate(["every", {"min": 1000}, "int"], lazy(bad_tail))
    assert not m.validate(["every", {"min": 1001}, "int"], lazy(bad_tail))
    assert not m.validate(["every", {"min": 1001}, "int"], bad_tail)
    assert m.validate(["every", {"max": 1000}, "int"], list(range(1000)))
    assert not m.validate(["every", {"max": 1000}, "int"], list(range(1001)))
    assert not m.validate(["every", {"max": 1001}, "int"], lazy(bad_tail))
    # explain mirrors the same bounds
    assert m.explain(["every", "int"], lazy(bad_tail)) is None
    exp = m.explain(["every", {"min": 1001}, "int"], lazy(bad_tail))
    assert exp is not None and exp["errors"][0]["in"] == [1000]
    # bounded parse: value passes through unchanged (identity semantics)
    good = list(range(10))
    assert m.parse(["every", "int"], good) is good
    assert m.parse(["every", "int"], bad_tail) is m.INVALID
    assert m.parse(["every", "int"], lazy(bad_tail)) is not m.INVALID


def test_seqable_lazy_reference():
    """seqable-schema-test (core_test.cljc:3482-3509): seqable accepts lazy
    iterables and traverses them FULLY (no prefix bound)."""
    def lazy(seq):
        return (v for v in seq)

    bad_tail = list(range(1000)) + [None]
    assert m.validate(["seqable", "int"], None)
    assert m.validate(["seqable", "int"], lazy(range(1000)))
    assert not m.validate(["seqable", "int"], lazy(bad_tail))
    assert not m.validate(["seqable", {"min": 1000}, "int"], lazy(bad_tail))
    assert m.parse(["seqable", "int"], lazy(range(5))) == [0, 1, 2, 3, 4]
    assert m.parse(["seqable", {"min": 6}, "int"], lazy(range(5))) is m.INVALID


def test_naked_keys_and_duplicate_entries():
    """parse-entries-test (core_test.cljc:47-106): naked keys resolve the
    key itself in the registry (bare key, [key], [key props]); duplicate
    and malformed entries raise."""
    import pytest

    reg = {"x": "int?", "y": "int?"}
    S = ["map", {"registry": reg}, "x", ["y", {"optional": True}],
         ["z", "boolean?"]]
    assert m.validate(S, {"x": 1, "z": True})
    assert m.validate(S, {"x": 1, "y": 2, "z": True})
    assert not m.validate(S, {"x": "no", "z": True})
    assert not m.validate(S, {"z": True})            # naked x is required
    with pytest.raises(m.SchemaError):
        m.schema(["map", ["x", "int?"], ["x", "boolean?"]])   # duplicate
    with pytest.raises(m.SchemaError):
        m.schema(["map", ["x"]])                      # unresolvable naked key
    with pytest.raises(m.SchemaError):
        m.schema(["map", ["x", "boolean?"], ["y"]])


def test_sequential_lazy_eduction_analog():
    """eduction-test (core_test.cljc:3594-3600): :sequential accepts lazy
    iterables (the Python analog of eductions) and counts them fully."""
    assert m.validate(["sequential", {"min": 0}, "int"],
                      (x for x in range(10)))
    assert m.validate(["sequential", {"max": 0}, "int"], iter([]))
    assert not m.validate(["sequential", {"max": 0}, "int"], iter([1]))
    assert not m.validate(["sequential", {"min": 11}, "int"],
                          (x for x in range(10)))
    assert m.explain(["sequential", {"min": 9}, "int"],
                     (x for x in range(10))) is None
    # a Schema object is not a valid schema TYPE (catch-infinitely-
    # expanding-schema, core_test.cljc:3587-3592)
    import pytest
    with pytest.raises(m.SchemaError):
        m.schema([m.schema("any")])
