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
