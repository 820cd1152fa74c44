"""Schema algebra (malli.util semantics) + provider inference corpus
(mirrors util_test.cljc / provider_test.cljc:8-161)."""

import malli_ray as m
from malli_ray import util as mu
from malli_ray.provider import provide


def test_merge():
    a = ["map", ["x", "int"], ["y", "string"]]
    b = ["map", ["x", "string"], ["z", "boolean"]]
    merged = mu.merge(a, b)
    assert mu.keys(merged) == ["x", "y", "z"]
    assert m.validate(merged, {"x": "now-a-string", "y": "s", "z": True})  # last wins


def test_merge_deep():
    a = ["map", ["n", ["map", ["a", "int"]]]]
    b = ["map", ["n", ["map", ["b", "string"]]]]
    merged = mu.merge(a, b)
    assert m.validate(merged, {"n": {"a": 1, "b": "s"}})
    assert not m.validate(merged, {"n": {"a": 1}})


def test_union():
    a = ["map", ["x", "int"]]
    b = ["map", ["x", "string"]]
    u = mu.union(a, b)
    assert m.validate(u, {"x": 1}) and m.validate(u, {"x": "s"})


def test_union_reference_semantics():
    # equal children stay as-is (no [:or x x]) — util.cljc:110
    u = mu.union(["map", ["x", "int"]], ["map", ["x", "int"]])
    assert u.form == ["map", ["x", "int"]]
    # conflicting children become :or of both
    u = mu.union(["map", ["x", "int"]], ["map", ["x", "string"]])
    assert mu.get(u, "x").type == "or"
    # required-ness is AND-ed: optional on either side => optional
    u = mu.union(["map", ["x", {"optional": True}, "int"]],
                 ["map", ["x", "int"]])
    assert m.validate(u, {})
    u = mu.union(["map", ["x", "int"]],
                 ["map", ["x", {"optional": True}, "int"]])
    assert m.validate(u, {})
    # required on BOTH sides stays required
    u = mu.union(["map", ["x", "int"]], ["map", ["x", "int"]])
    assert not m.validate(u, {})
    # top-level non-map conflict also goes through merge-default
    u = mu.union("int", "string")
    assert m.validate(u, 1) and m.validate(u, "s")
    assert mu.union("int", "int").type == "int"
    # merge with custom hooks disables :multi distribution
    # (can-distribute? guard, util.cljc:74-76) — :multi falls to default
    multi = ["multi", {"dispatch": "type"},
             ["a", ["map", ["type", ["=", "a"]]]]]
    out = mu.merge(multi, ["map", ["x", "int"]],
                   merge_default=lambda a, b, _o: b)
    assert out.type == "map"


def test_select_dissoc_rename():
    s = ["map", ["x", "int"], ["y", "string"]]
    assert mu.keys(mu.select_keys(s, ["x"])) == ["x"]
    assert mu.keys(mu.dissoc(s, "x")) == ["y"]
    r = mu.rename_keys(s, {"x": "xx"})
    assert mu.keys(r) == ["xx", "y"]


def test_optional_required():
    s = ["map", ["x", "int"], ["y", "string"]]
    opt = mu.optional_keys(s)
    assert m.validate(opt, {})
    req = mu.required_keys(opt)
    assert not m.validate(req, {})


def test_assoc_get_in():
    s = ["map", ["x", ["map", ["y", "int"]]]]
    assert mu.get_in(s, ["x", "y"]).type == "int"
    s2 = mu.assoc_in(s, ["x", "z"], "string")
    assert m.validate(s2, {"x": {"y": 1, "z": "s"}})


def test_closed_open():
    s = ["map", ["x", ["map", ["y", "int"]]]]
    c = mu.closed_schema(s)
    assert not m.validate(c, {"x": {"y": 1}, "extra": 1})
    assert not m.validate(c, {"x": {"y": 1, "extra": 1}})
    o = mu.open_schema(c)
    assert m.validate(o, {"x": {"y": 1}, "extra": 1})


def test_wrapper_types():
    merged = ["merge", ["map", ["x", "int"]], ["map", ["y", "string"]]]
    assert m.validate(merged, {"x": 1, "y": "s"})
    sel = ["select-keys", ["map", ["x", "int"], ["y", "string"]], ["x"]]
    assert m.validate(sel, {"x": 1})
    assert mu.keys(m.deref(m.schema(sel))) == ["x"]


def test_subschemas_equals():
    s = ["map", ["x", "int"]]
    subs = mu.subschemas(s)
    assert subs[0][0] == [] and subs[0][1].type == "map"
    assert mu.equals(s, ["map", ["x", "int"]])
    assert not mu.equals(s, ["map", ["x", "string"]])


# -- provider (provider_test.cljc expectations style) -----------------------


def test_provide_scalars():
    assert provide([1, 2, 3]) == "int"
    assert provide([1.5]) == "double"
    assert provide([1, 1.5]) == "double"        # numeric widening
    assert provide(["a", "b"]) == "string"
    assert provide([True]) == "boolean"
    assert provide([None]) == "nil"
    assert provide([1, None, 2]) == ["maybe", "int"]
    assert provide([1, "a"]) == ["or", "int", "string"]


def test_provide_maps():
    assert provide([{"x": 1}, {"x": 2}]) == ["map", ["x", "int"]]
    assert provide([{"x": 1}, {}]) == ["map", ["x", {"optional": True}, "int"]]
    assert provide([{"x": 1}, None]) == ["maybe", ["map", ["x", "int"]]]
    out = provide([{"x": {"y": "s"}}])
    assert out == ["map", ["x", ["map", ["y", "string"]]]]


def test_provide_collections():
    assert provide([[1, 2], [3]]) == ["vector", "int"]
    assert provide([{1, 2}]) == ["set", "int"]
    assert provide([[{"x": 1}]]) == ["vector", ["map", ["x", "int"]]]


def test_provide_roundtrip_validates():
    samples = [{"id": "a", "n": 1, "tags": [1, 2]},
               {"id": "b", "n": 2, "tags": []}]
    s = provide(samples)
    for v in samples:
        assert m.validate(s, v)


def test_provide_map_of_threshold():
    # provider_test.cljc:60-64
    samples = [{"a": {"name": "n1"}, "b": {"name": "n2"}},
               {"c": {"name": "n3"}, "d": {"name": "n4"}, "e": {"name": "n5"}}]
    assert provide(samples, {"map-of-threshold": 2}) == \
        ["map-of", "string", ["map", ["name", "string"]]]
    # without the threshold option -> :map with optional keys
    assert provide(samples)[0] == "map"


def test_provide_tuple_threshold():
    # provider_test.cljc:66-91
    tsam = [[1, "kikka", True], [2, "kukka", False], [3, "kekka", True]]
    assert provide(tsam, {"tuple-threshold": 3}) == \
        ["tuple", "int", "string", "boolean"]
    assert provide(tsam[:2], {"tuple-threshold": 4})[0] == "vector"
    # non-coherent signatures stay a vector
    assert provide([[1, "a", True], ["b", 2, False], [3, "c", True]],
                   {"tuple-threshold": 3})[0] == "vector"


def test_provide_distributed_merge_consistency():
    # partials merged out-of-order must finalize identically
    from malli_ray.provider import accumulate_value, finalize, merge_stats, _new_stats
    samples = [[1, "a", True], [2, "b", False], [3, "c", True], [4, "d", False]]
    whole = _new_stats()
    for s in samples:
        accumulate_value(whole, s)
    p1, p2 = _new_stats(), _new_stats()
    for s in samples[:2]:
        accumulate_value(p1, s)
    for s in samples[2:]:
        accumulate_value(p2, s)
    merged = merge_stats(p2, p1)
    opts = {"tuple-threshold": 3}
    assert finalize(merged, opts) == finalize(whole, opts) == \
        ["tuple", "int", "string", "boolean"]


def test_update_properties():
    s = mu.update_properties(["int", {"min": 1}], lambda p: {**p, "max": 5})
    assert m.validate(s, 3) and not m.validate(s, 6) and not m.validate(s, 0)
    s2 = mu.update_properties(["map", ["x", "int"]],
                              lambda p: {**p, "closed": True})
    assert not m.validate(s2, {"x": 1, "y": 2})
    s3 = mu.update_properties(["int", {"min": 1}], lambda p: {})
    assert m.validate(s3, 0)


def test_find_first_distinct_by():
    # mu/find-first (util.cljc:37-52): prewalk, first non-None wins
    S = ["map", ["a", "int"], ["b", ["vector", ["string", {"tag": "hit"}]]]]
    hit = mu.find_first(S, lambda sc, path, _o:
                        (list(path), sc.type)
                        if (sc.properties or {}).get("tag") == "hit" else None)
    assert hit == (["b", 0], "string")
    assert mu.find_first(S, lambda *_: None) is None
    # mu/distinct-by (util.cljc:183-188): first occurrence wins
    assert mu.distinct_by(lambda x: x % 3, [1, 4, 2, 7, 3]) == [1, 2, 3]


def test_update_entry_properties():
    # mu/update-entry-properties (util.cljc:120-127)
    S = ["map", ["x", "int"], ["y", "string"]]
    s2 = mu.update_entry_properties(S, "x", lambda p: {**p, "optional": True})
    assert m.validate(s2, {"y": "s"})            # x is now optional
    assert not m.validate(s2, {"x": 1})          # y still required
    import pytest
    with pytest.raises(Exception):
        mu.update_entry_properties(S, "nope", lambda p: p)


def test_update_in():
    # mu/update-in (util.cljc:379-389)
    S = ["map", ["addr", ["map", ["zip", "int"]]]]
    s2 = mu.update_in(S, ["addr", "zip"], lambda _sc: "string")
    assert m.validate(s2, {"addr": {"zip": "00100"}})
    assert not m.validate(s2, {"addr": {"zip": 100}})


def test_explain_data_serializable():
    # mu/explain-data (util.cljc:209-236): forms, not Schema objects
    import json
    S = ["map", ["x", "int"]]
    e = mu.explain_data(S, {"x": "nope"})
    assert e["schema"] == ["map", ["x", "int"]]
    assert all(not isinstance(err.get("schema"), m.Schema)
               for err in e["errors"])
    json.dumps(e)  # fully serializable
    assert mu.explain_data(S, {"x": 1}) is None
    # reusable compiled form
    de = mu.data_explainer(S)
    assert de({"x": 1}) is None and de({"x": "no"})["errors"]


def test_provide_hints_and_value_decoders():
    """mp/-hinted value hints + ::value-decoders (provider.cljc:10-12,
    38-40, 50, 66, 70-81; provider_test.cljc expectations)."""
    import datetime as dt
    import uuid as uuidlib
    from malli_ray.provider import hinted
    from malli_ray.transform import string_to_date, string_to_uuid

    # :enum hint — distinct observed values become the schema
    assert provide([{"name": "Tommi", "gender": hinted("male", "enum")},
                    {"name": hinted("Tiina", "string"), "gender": "female"}]) == \
        ["map", ["name", "string"], ["gender", ["enum", "male", "female"]]]

    # :map-of hint forces map-of regardless of thresholds
    assert provide([hinted({"a": {"b": 1, "c": 2},
                            "b": {"b": 2, "c": 1},
                            "c": {"b": 3}}, "map-of")]) == \
        ["map-of", "string", ["map", ["b", "int"], ["c", {"optional": True}, "int"]]]

    # :tuple hint — homogeneous samples
    assert provide([hinted([1, "kikka", True], "tuple"),
                    [2, "kukka", True]]) == ["tuple", "int", "string", "boolean"]
    # heterogeneous positions union per position (reference collapses to
    # :some; we keep the precise :or — documented divergence)
    out = provide([hinted([1, "kikka", True], "tuple"), [2, "kukka", "true"]])
    assert out[:3] == ["tuple", "int", "string"]
    assert out[3] == ["or", "boolean", "string"]
    # invalid hinted tuple (length mismatch) -> vector
    assert provide([hinted([1, "kikka", True], "tuple"),
                    [2, "kukka", True, "invalid tuple"]])[0] == "vector"

    # value-decoders: strings that ALL parse as uuids upgrade to :uuid
    u1 = "caa71a26-5fe1-11ec-bf63-0242ac130002"
    u2 = "8aadbf5e-5fe3-11ec-bf63-0242ac130002"
    assert provide([{"id": u1}, {"id": u2}]) == ["map", ["id", "string"]]
    dec = {"string": {"uuid": string_to_uuid}}
    assert provide([{"id": u1}, {"id": u2}],
                   {"value-decoders": dec}) == ["map", ["id", "uuid"]]
    # a non-uuid string vetoes the upgrade
    assert provide([{"id": u1}, {"id": "nope"}],
                   {"value-decoders": dec}) == ["map", ["id", "string"]]
    # decoders apply to map-of KEYS too (provider_test value-decoders case)
    u3 = "15511020-5fee-11ec-bf63-0242ac130002"
    got = provide([{u1: {"id": u1}}, {u2: {"id": u2}}, {u3: {"id": u3}}],
                  {"value-decoders": dec, "map-of-threshold": 3})
    assert got == ["map-of", "uuid", ["map", ["id", "uuid"]]]
    # inst? decoder
    got2 = provide([{"1901-03-02T22:20:11.000Z": "123"},
                    {"1902-04-03T22:20:11.000Z": "234"},
                    {"1904-06-05T22:20:11.000Z": "456"}],
                   {"value-decoders": {"string": {"inst?": string_to_date}},
                    "map-of-threshold": 3})
    assert got2 == ["map-of", "inst?", "string"]


def test_provide_reference_expectations_corpus():
    """Python-expressible rows of provider_test.cljc:8-161 expectations."""
    import datetime as dt
    import uuid as uuidlib

    cases = [
        ("int", [1, 2, 3]),
        ("uuid", [uuidlib.uuid4()]),
        ("any", []),
        (["vector", "string"], [["kikka"], ["kukka", "kakka"]]),
        (["set", "string"], [{"a", "b"}, {"c"}]),
        (["vector", ["vector", ["set", "int"]]], [[[ {1} ]]]),
        (["vector", "any"], [[]]),
        (["maybe", "int"], [1, None, 2, 3]),
        (["maybe", ["map", ["x", "int"]]], [{"x": 1}, None]),
        (["maybe", ["or", ["map", ["x", "int"]], "string"]],
         [{"x": 1}, None, "1"]),
        (["map", ["a", ["map", ["b", "int"], ["c", "int"]]],
                 ["b", ["map", ["b", "int"], ["c", "int"]]],
                 ["c", ["map", ["b", "int"]]],
                 ["d", "nil"]],
         [{"a": {"b": 1, "c": 2}, "b": {"b": 2, "c": 1},
           "c": {"b": 3}, "d": None}]),
        # too few samples for :map-of stays :map
        (["map", ["1", ["map", ["name", "string"]]],
                 ["2", ["map", ["name", "string"]]]],
         [{"1": {"name": "1"}, "2": {"name": "2"}}]),
        (["inst?"], None),  # placeholder, replaced below
    ]
    cases[-1] = ("inst?", [dt.datetime.now()])
    for want, samples in cases:
        assert provide(samples) == want, (want, samples, provide(samples))


def test_merge_reference_cases():
    """mu/merge reference semantics (util.cljc:53-101; util_test merge-test):
    entry-property merge, :and head-join, :multi distribution."""
    cases = [
        ("int?", "pos-int?", "pos-int?"),
        ("int?", None, "int?"),
        (None, "pos-int?", "pos-int?"),
        # optionality of the LAST entry wins; entry props merge
        (["map", ["x", {"optional": False}, "int?"]],
         ["map", ["x", {"optional": True}, "pos-int?"]],
         ["map", ["x", {"optional": True}, "pos-int?"]]),
        # deep nested merge with entry-property union
        (["map", {"title": "parameters"},
          ["parameters", ["map",
            ["query-params", {"title": "query1", "description": "first"},
             ["map", ["x", "int?"]]]]]],
         ["map", {"description": "description"},
          ["parameters", ["map",
            ["query-params", {"title": "query2", "summary": "second"},
             ["map", ["x", "string?"], ["y", "int?"]]],
            ["body-params", ["map", ["z", "int?"]]]]]],
         ["map", {"title": "parameters", "description": "description"},
          ["parameters", ["map",
            ["query-params", {"title": "query2", "description": "first",
                              "summary": "second"},
             ["map", ["x", "string?"], ["y", "int?"]]],
            ["body-params", ["map", ["z", "int?"]]]]]]),
        # nested :schema wrappers deref before merging
        (["schema", ["schema", ["map", ["x", "int?"]]]],
         ["schema", ["schema", ["schema", ["map", ["y", "int?"]]]]],
         ["map", ["x", "int?"], ["y", "int?"]]),
        # :and head-merge: first child joins, rest kept, props merged
        (["map", {"title": "x", "x": True}, ["x", "int"]],
         ["and", {"and": "y", "y": False},
          ["map", {"title": "y", "y": True}, ["y", "int"]], "map?"],
         ["and", {"and": "y", "y": False},
          ["map", {"title": "y", "x": True, "y": True},
           ["x", "int"], ["y", "int"]], "map?"]),
    ]
    for a, b, want in cases:
        got = mu.merge(a, b)
        assert mu.equals(got, want), (m.form(got), want)
    # :multi distributes on both sides
    M = ["multi", {"dispatch": "type"},
         ["a", ["map", ["type", "string"], ["x", "int"]]],
         ["b", ["map", ["type", "string"], ["y", "int"]]]]
    EXTRA = ["map", ["z", "int"]]
    right = mu.merge(M, EXTRA)
    assert m.validate(right, {"type": "a", "x": 1, "z": 2})
    assert not m.validate(right, {"type": "a", "x": 1})  # z now required
    left = mu.merge(EXTRA, M)
    assert m.validate(left, {"type": "b", "y": 1, "z": 2})


def test_merge_reference_table():
    """The full mu/merge table from util_test.cljc:38-122."""
    cases = [
        ("int?", "int?", "int?"),
        ("int?", "pos-int?", "pos-int?"),
        ("int?", None, "int?"),
        (None, "pos-int?", "pos-int?"),
        (["map", ["x", "int?"]], ["map", ["x", {"optional": True}, "pos-int?"]],
         ["map", ["x", {"optional": True}, "pos-int?"]]),
        (["map", ["x", {"optional": True}, "int?"]], ["map", ["x", "pos-int?"]],
         ["map", ["x", "pos-int?"]]),
        (["map", {"title": "parameters"},
          ["parameters", ["map", ["query-params",
                                  {"title": "query1", "description": "first"},
                                  ["map", ["x", "int?"]]]]]],
         ["map", {"description": "description"},
          ["parameters", ["map",
                          ["query-params", {"title": "query2", "summary": "second"},
                           ["map", ["x", "string?"], ["y", "int?"]]],
                          ["body-params", ["map", ["z", "int?"]]]]]],
         ["map", {"title": "parameters", "description": "description"},
          ["parameters", ["map",
                          ["query-params",
                           {"title": "query2", "description": "first",
                            "summary": "second"},
                           ["map", ["x", "string?"], ["y", "int?"]]],
                          ["body-params", ["map", ["z", "int?"]]]]]]),
        (["schema", ["schema", ["map", ["x", "int?"]]]],
         ["schema", ["schema", ["schema", ["map", ["y", "int?"]]]]],
         ["map", ["x", "int?"], ["y", "int?"]]),
        (["map", {"title": "x", "x": True}, ["x", "int"]],
         ["map", {"title": "y", "y": True}, ["y", "int"]],
         ["map", {"title": "y", "x": True, "y": True},
          ["x", "int"], ["y", "int"]]),
        (["map", {"title": "x", "x": True}, ["x", "int"]],
         ["and", {"and": "y", "y": False},
          ["map", {"title": "y", "y": True}, ["y", "int"]], "map?"],
         ["and", {"and": "y", "y": False},
          ["map", {"title": "y", "x": True, "y": True},
           ["x", "int"], ["y", "int"]], "map?"]),
        (["and", {"and": "x", "x": False},
          ["map", {"title": "x", "x": True}, ["x", "int"]], "map?"],
         ["map", {"title": "y", "y": True}, ["y", "int"]],
         ["and", {"and": "x", "x": False},
          ["map", {"title": "y", "x": True, "y": True},
           ["x", "int"], ["y", "int"]], "map?"]),
        (["and", {"and": "x", "x": False},
          ["map", {"title": "x", "x": True}, ["x", "int"]], "map?"],
         ["and", {"and": "y", "y": False},
          ["map", {"title": "y", "y": True}, ["y", "int"]], "map?"],
         ["and", {"and": "y", "x": False, "y": False},
          ["map", {"title": "y", "x": True, "y": True},
           ["x", "int"], ["y", "int"]], "map?", "map?"]),
        (["and", {"and": "x"},
          ["map", {"title": "x", "x": True}, ["x", "int"]], "map?"],
         "map?", "map?"),
        (["and", "boolean?", "int?"], ["and", "map?"],
         ["and", "map?", "int?"]),
    ]
    for s1, s2, want in cases:
        assert mu.equals(mu.merge(s1, s2), want), (s1, s2)


def test_union_reference_table():
    """The full mu/union table from util_test.cljc:123-170."""
    cases = [
        ("int?", "int?", "int?"),
        ("int?", "pos-int?", ["or", "int?", "pos-int?"]),
        ("int?", None, "int?"),
        (None, "pos-int?", "pos-int?"),
        (["map", ["x", "int?"]],
         ["map", ["x", {"optional": True}, "pos-int?"]],
         ["map", ["x", {"optional": True}, ["or", "int?", "pos-int?"]]]),
        (["map", ["x", {"optional": True}, "int?"]],
         ["map", ["x", {"optional": True}, "pos-int?"]],
         ["map", ["x", {"optional": True}, ["or", "int?", "pos-int?"]]]),
        (["map", ["x", {"optional": False}, "int?"]],
         ["map", ["x", {"optional": True}, "pos-int?"]],
         ["map", ["x", {"optional": True}, ["or", "int?", "pos-int?"]]]),
        (["map", {"title": "parameters"},
          ["parameters", ["map", ["query-params",
                                  {"title": "query1", "description": "first"},
                                  ["map", ["x", "int?"]]]]]],
         ["map", {"description": "description"},
          ["parameters", ["map",
                          ["query-params", {"title": "query2", "summary": "second"},
                           ["map", ["x", "string?"], ["y", "int?"]]],
                          ["body-params", ["map", ["z", "int?"]]]]]],
         ["map", {"title": "parameters", "description": "description"},
          ["parameters", ["map",
                          ["query-params",
                           {"title": "query2", "description": "first",
                            "summary": "second"},
                           ["map", ["x", ["or", "int?", "string?"]],
                            ["y", "int?"]]],
                          ["body-params", ["map", ["z", "int?"]]]]]]),
        (["schema", ["schema", ["map", ["x", "int?"]]]],
         ["schema", ["schema", ["schema", ["map", ["y", "int?"]]]]],
         ["map", ["x", "int?"], ["y", "int?"]]),
    ]
    for s1, s2, want in cases:
        assert mu.equals(mu.union(s1, s2), want), (s1, s2)


def test_lens_get_reference_table():
    """basic-lens-schema-test get cases (util_test.cljc:281-340)."""
    assert mu.get("int?", 0) is None
    assert mu.get(["re", "kikka"], 0) is not None
    assert mu.get(["re", "kikka"], 1) is None
    assert mu.get(["string", {"min": 1}], 0) is None
    assert mu.get(["enum", "A", "B"], 0) == "A"
    assert mu.get(["enum", "A", "B"], 2) is None
    assert mu.get(["map", ["x", "int?"]], "x").type == "int?"
    assert mu.get(["map", ["x", "int?"]], "y") is None
    assert mu.get(["map", ["x", {"optional": True}, "int?"]], "x").type == "int?"
    # collections return the child for ANY index
    for t in ("vector", "set", "sequential"):
        assert mu.get([t, "int?"], 0).type == "int?"
        assert mu.get([t, "int?"], 1).type == "int?"
    assert mu.get(["or", "false?", "int?"], 1).type == "int?"
    assert mu.get(["or", "false?", "int?"], 2) is None
    assert mu.get(["and", "false?", "int?"], 1).type == "int?"
    assert mu.get(["tuple", "false?", "int?"], 1).type == "int?"
    assert mu.get(["tuple", "false?", "int?"], 2) is None
    assert mu.get(["map-of", "false?", "int?"], 1).type == "int?"
    # :ref exposes a pointer whose form is its key at index 0
    assert mu.get(["ref", {"registry": {"a": "int?"}}, "a"], 0).form == "a"


def test_assoc_in_creates_missing_maps_874():
    """test-874 (util_test.cljc:1071-1079): assoc-in defaults missing
    intermediate entries to :map."""
    out = mu.closed_schema(
        mu.assoc_in(mu.assoc_in(["map"], ["foo", "bar"], "int"),
                    ["foo", "baz"], "int"))
    assert out.form == ["map", {"closed": True},
                        ["foo", ["map", {"closed": True},
                                 ["bar", "int"], ["baz", "int"]]]]


def test_update_entry_properties_reference():
    """update-entry-properties-test (util_test.cljc:1081-1108): works on
    :map AND :orn entries, composes with mu/update on a vector child, and
    raises no-entry on schemas without entries."""
    import pytest

    assert mu.update_entry_properties(
        ["map", ["me", {"a": 1}, "int"]], "me",
        lambda p: {**p, "b": 1}).form == \
        ["map", ["me", {"a": 1, "b": 1}, "int"]]
    assert mu.update_entry_properties(
        ["orn", ["me", {"a": 1}, "int"]], "me",
        lambda p: {**p, "b": 1}).form == \
        ["orn", ["me", {"a": 1, "b": 1}, "int"]]
    v = mu.update(["vector", ["orn", ["me", {"a": 1}, "int"]]], 0,
                  lambda sc: mu.update_entry_properties(
                      sc, "me", lambda p: {**p, "b": 1}))
    assert v.form == ["vector", ["orn", ["me", {"a": 1, "b": 1}, "int"]]]
    with pytest.raises(m.SchemaError):
        mu.update_entry_properties("map", "invalid", lambda p: p)


def test_reducing_applying_reference():
    """-reducing/-applying (util_test.cljc:1110-1151): nested :merge/:union
    deref to the base; zero children raise; defaults flow through :merge."""
    import pytest
    from malli_ray.transform import default_value_transformer

    assert m.deref_all(m.schema(["merge", ["merge", "map"]])).type == "map"
    assert m.deref_all(m.schema(["union", ["union", "map"]])).type == "map"
    with pytest.raises(m.SchemaError):
        m.schema("merge")
    with pytest.raises(m.SchemaError):
        m.schema("union")
    got = m.decode(
        ["merge",
         ["map", ["name", ["string", {"default": "kikka"}]]],
         ["map", ["description", {"optional": True},
                  ["string", {"default": "kikka"}]]]],
        {}, default_value_transformer(add_optional_keys=True))
    assert got == {"name": "kikka", "description": "kikka"}


def test_get_in_reference_table():
    """get-in-test (util_test.cljc:417-451): deep drilling through
    collections/tuples/:maybe/:schema wrappers, :multi branches, :ref
    pointers."""
    deep = ["map", ["x", ["vector", ["set", ["sequential",
            ["tuple", "int?",
             ["map", ["y", ["maybe",
                            ["schema", ["malli.core/schema", "boolean?"]]]]]]]]]]]
    assert mu.get_in(deep, ["x", 0, 0, 0, 1, "y", 0, 0, 0]).type == "boolean?"
    assert mu.get_in(["multi", {"dispatch": "x"},
                      [True, ["map", ["x", "boolean"]]],
                      [False, ["map", ["x", "boolean"], ["y", "boolean"]]]],
                     [False]).form == \
        ["map", ["x", "boolean"], ["y", "boolean"]]
    assert mu.get_in(["maybe", ["tuple", "int?", "boolean?"]], []).form == \
        ["maybe", ["tuple", "int?", "boolean?"]]
    r = ["ref", {"registry": {"a": "int?", "b": "string?"}}, "a"]
    assert mu.get_in(r, [0]).form == "a"        # the pointer keeps the key
    assert mu.get_in(r, [0, 0]).type == "int?"  # ...and derefs one deeper


def test_distributive_multi_reference():
    """distributive_test.cljc: :merge distributes over :multi (right and
    left, through :schema wrappers, chained, multi x multi nesting) and
    parse works through the derived tree."""
    from malli_ray.core import Tag

    def dist(s):
        return m.form(m.deref(m.schema(s)))

    M_Y = ["multi", {"dispatch": "y"},
           [1, ["map", ["y", ["=", 1]]]],
           [2, ["map", ["y", ["=", 2]]]]]
    assert dist(["merge", ["map", ["x", "int"]], M_Y]) == \
        ["multi", {"dispatch": "y"},
         [1, ["map", ["x", "int"], ["y", ["=", 1]]]],
         [2, ["map", ["x", "int"], ["y", ["=", 2]]]]]
    # through a :schema wrapper
    assert dist(["merge", ["map", ["x", "int"]], ["schema", M_Y]]) == \
        dist(["merge", ["map", ["x", "int"]], M_Y])
    # left-distributive
    assert dist(["merge", M_Y, ["map", ["x", "int"]]]) == \
        ["multi", {"dispatch": "y"},
         [1, ["map", ["y", ["=", 1]], ["x", "int"]]],
         [2, ["map", ["y", ["=", 2]], ["x", "int"]]]]
    # chained merges associate
    assert dist(["merge", M_Y, ["map", ["x", "int"]], ["map", ["z", "int"]]]) == \
        dist(["merge", ["merge", M_Y, ["map", ["x", "int"]]],
              ["map", ["z", "int"]]])
    # multi x multi with different dispatch nests and merges leaves
    M_Z = ["multi", {"dispatch": "z"},
           [3, ["map", ["z", ["=", 3]]]],
           [4, ["map", ["z", ["=", 4]]]]]
    assert dist(["merge", M_Y, M_Z]) == \
        ["multi", {"dispatch": "y"},
         [1, ["multi", {"dispatch": "z"},
              [3, ["map", ["y", ["=", 1]], ["z", ["=", 3]]]],
              [4, ["map", ["y", ["=", 1]], ["z", ["=", 4]]]]]],
         [2, ["multi", {"dispatch": "z"},
              [3, ["map", ["y", ["=", 2]], ["z", ["=", 3]]]],
              [4, ["map", ["y", ["=", 2]], ["z", ["=", 4]]]]]]]
    # parse through the derived tree (parse-distributive-multi-test)
    assert m.parse(["merge", M_Y, M_Z], {"y": 1, "z": 3}) == \
        Tag(1, Tag(3, {"y": 1, "z": 3}))
