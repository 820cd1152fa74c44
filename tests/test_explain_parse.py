"""Explain error-data exactness (path/in/type) + parse/unparse roundtrips —
mirrors core_test.cljc:238-261 style assertions."""

import malli_ray as m
from malli_ray import Tag, Tags, INVALID
from malli_ray.error import humanize, with_spell_checking


def errs(schema, value):
    e = m.explain(schema, value)
    return [] if e is None else [
        {"path": x["path"], "in": x["in"], "type": x.get("type"), "value": x["value"]}
        for x in e["errors"]]


def test_explain_nil_on_valid():
    assert m.explain("int", 1) is None
    assert m.explain(["map", ["x", "int"]], {"x": 1}) is None


def test_scalar_error_shape():
    assert errs("int", "x") == [{"path": [], "in": [], "type": None, "value": "x"}]


def test_map_errors():
    S = ["map", ["x", "boolean"], ["y", {"optional": True}, "int"], ["z", "string"]]
    assert errs(S, {"x": True, "y": "bad"}) == [
        {"path": ["y"], "in": ["y"], "type": None, "value": "bad"},
        {"path": ["z"], "in": ["z"], "type": "malli.core/missing-key", "value": None},
    ]
    assert errs(S, "not-a-map") == [
        {"path": [], "in": [], "type": "malli.core/invalid-type", "value": "not-a-map"}]


def test_closed_map_extra_key():
    C = ["map", {"closed": True}, ["x", "int"]]
    assert errs(C, {"x": 1, "extra": 2}) == [
        {"path": ["extra"], "in": ["extra"], "type": "malli.core/extra-key", "value": 2}]


def test_nested_in_paths():
    S = ["map", ["address", ["map", ["lonlat", ["tuple", "double", "double"]]]]]
    out = errs(S, {"address": {"lonlat": [3.0, None]}})
    assert out == [{"path": ["address", "lonlat", 1],
                    "in": ["address", "lonlat", 1], "type": None, "value": None}]


def test_vector_element_in():
    out = errs(["vector", "int"], [1, "bad", 3])
    assert out == [{"path": [0], "in": [1], "type": None, "value": "bad"}]


def test_limits_error():
    out = errs(["vector", {"min": 2}, "int"], [1])
    assert out[0]["type"] == "malli.core/limits"
    out = errs(["tuple", "int", "int"], [1])
    assert out[0]["type"] == "malli.core/tuple-size"


def test_or_drops_branch_errors_when_one_passes():
    # core.cljc:1024-1031
    assert m.explain(["or", "int", "string"], "ok") is None
    out = errs(["or", "int", "string"], None)
    assert len(out) == 2  # both branch errors reported on failure


def test_multi_invalid_dispatch():
    S = ["multi", {"dispatch": "t"}, ["a", ["map", ["t", "string"]]]]
    out = errs(S, {"t": "zzz"})
    assert out[0]["type"] == "malli.core/invalid-dispatch-value"


def test_seq_regex_errors():
    out = errs(["repeat", {"min": 1, "max": 2}, "int?"], [1, 2, 3])
    assert out[0]["type"] == "malli.core/input-remaining"
    assert out[0]["in"] == [2]
    out = errs(["cat", "string?", "int?"], ["a"])
    assert out[0]["type"] == "malli.core/end-of-input"


def test_humanize_shapes():
    S = ["map", ["x", "boolean"], ["z", "string"]]
    h = humanize(m.explain(S, {"x": 1}))
    assert h == {"x": ["should be a boolean"], "z": ["missing required key"]}
    h = humanize(m.explain(["vector", "int"], [1, "a"]))
    assert h == [None, ["should be an integer"]]
    # value-aware bound selection (error.cljc:127-139): too short reads
    # at-least, never "between"
    h = humanize(m.explain(["string", {"min": 2, "max": 4}], "a"))
    assert h == ["should be at least 2 characters"]
    h = humanize(m.explain(["int", {"min": 1}], 0))
    assert h == ["should be at least 1"]
    h = humanize(m.explain(["enum", "a", "b"], "c"))
    assert h == ["should be either 'a' or 'b'"]


def test_custom_error_message():
    S = ["int", {"error/message": "bad int!"}]
    assert humanize(m.explain(S, "x")) == ["bad int!"]
    S = ["int", {"error/message": {"en": "bad int!", "fi": "huono!"}}]
    assert humanize(m.explain(S, "x")) == ["bad int!"]
    assert humanize(m.explain(S, "x"), {"locale": "fi"}) == ["huono!"]


def test_spell_checking():
    # error_test.cljc:37-60 shape: misspelled-key type + spelled message;
    # likely-misspelling-of holds FULL paths
    C = ["map", {"closed": True}, ["street", "string"], ["other", "string"]]
    e = with_spell_checking(m.explain(C, {"streetz": "x", "other": "ok"}))
    mis = [x for x in e["errors"] if x.get("type") == "malli.error/misspelled-key"]
    assert mis[0]["likely-misspelling-of"] == [["street"]]
    assert mis[0]["message"] == "should be spelled 'street'"
    assert humanize(e) == {"streetz": ["should be spelled 'street'"]}
    # a candidate already present in the value is NOT a misspelling
    # (error.cljc:271-273 `-likely-misspelled` removes present keys)
    e2 = with_spell_checking(m.explain(C, {"streetz": "x", "street": "ok",
                                           "other": "ok"}))
    assert [x.get("type") for x in e2["errors"]] == ["malli.core/extra-key"]


def test_spell_checking_reference_shapes():
    """error_test.cljc:36-104: nested paths, missing-key stripping with
    keep-likely-misspelled-of, and :multi dispatch 'did you mean'."""
    from malli_ray import util as mu

    S = mu.closed_schema(["map", ["address", ["map", ["street1", "string?"],
                                              ["street2", "string?"]]]])
    exp = m.explain(S, {"address": {"streetz": "123"}})
    # default: missing-key errors for the likely targets are stripped
    e = with_spell_checking(exp)
    assert [(x["path"], x["type"]) for x in e["errors"]] == \
        [(["address", "streetz"], "malli.error/misspelled-key")]
    mis = e["errors"][0]
    assert mis["likely-misspelling-of"] == \
        [["address", "street1"], ["address", "street2"]]
    assert mis["message"] == "should be spelled 'street1' or 'street2'"
    # keep-likely-misspelled-of keeps them
    e2 = with_spell_checking(exp, {"keep-likely-misspelled-of": True})
    assert [x["type"] for x in e2["errors"]] == \
        ["malli.core/missing-key", "malli.core/missing-key",
         "malli.error/misspelled-key"]

    MS = ["multi", {"dispatch": "type"},
          ["plus", ["map", ["value", "int?"]]],
          ["minus", ["map", ["value", "int?"]]]]
    assert humanize(with_spell_checking(m.explain(MS, {"type": "minuz"}))) == \
        {"type": ["did you mean 'minus'"]}
    # without spell-checking: plain dispatch error AT the dispatch key
    assert humanize(m.explain(MS, {"type": "minuz"})) == \
        {"type": ["invalid dispatch value"]}
    # non-map value: error at root
    assert humanize(m.explain(["multi", {"dispatch": "x"},
                               ["y", ["map", ["x", "keyword"]]]], [])) == \
        ["invalid dispatch value"]


# -- parse / unparse --------------------------------------------------------


def test_parse_identity_for_plain():
    assert m.parse("int", 1) == 1
    assert m.parse("int", "x") is INVALID
    assert m.parse(["map", ["x", "int"]], {"x": 1}) == {"x": 1}


def test_parse_orn_tag():
    S = ["orn", ["pos", "pos-int?"], ["neg", "neg-int?"]]
    assert m.parse(S, 3) == Tag("pos", 3)
    assert m.parse(S, -3) == Tag("neg", -3)
    assert m.parse(S, 0) is INVALID
    assert m.unparse(S, Tag("pos", 3)) == 3
    assert m.unparse(S, Tag("zzz", 3)) is INVALID


def test_parse_multi_tag():
    S = ["multi", {"dispatch": "t"},
         ["a", ["map", ["t", "string"], ["n", "int"]]]]
    assert m.parse(S, {"t": "a", "n": 1}) == Tag("a", {"t": "a", "n": 1})


def test_parse_seq_regex():
    CLI = ["*", ["catn", ["prop", "string?"],
                 ["val", ["altn", ["s", "string?"], ["b", "boolean?"]]]]]
    v = ["-server", "foo", "-verbose", True]
    p = m.parse(CLI, v)
    assert p == [Tags({"prop": "-server", "val": Tag("s", "foo")}),
                 Tags({"prop": "-verbose", "val": Tag("b", True)})]
    assert m.unparse(CLI, p) == v


def test_parse_cat_alt_repeat():
    assert m.parse(["cat", "string?", "int?"], ["a", 1]) == ["a", 1]
    assert m.parse(["*", "int?"], [1, 2]) == [1, 2]
    assert m.parse(["?", "int?"], [1]) == 1
    assert m.parse(["?", "int?"], []) is None
    assert m.unparse(["?", "int?"], None) == []
    assert m.unparse(["*", "int?"], [1, 2]) == [1, 2]


def test_parse_and_uses_first_child():
    S = ["and", ["orn", ["small", ["<", 10]], ["big", [">=", 10]]], "int?"]
    assert m.parse(S, 5) == Tag("small", 5)


def test_cat_catn_unparse_reference():
    """cat-catn-unparse-test, core_test.cljc:3045-3049."""
    from malli_ray.core import INVALID, tags
    assert m.unparse(["cat", "string?", "int?", "string?"],
                     ["1", 2, "3"]) == ["1", 2, "3"]
    assert m.unparse(["cat", "string?", "int?", "string?"], [1, 2, 3]) is INVALID
    catn = ["catn", ["a", "string?"], ["b", "int?"], ["c", "string?"]]
    assert m.unparse(catn, tags({"a": "1", "b": 2, "c": "3"})) == ["1", 2, "3"]
    assert m.unparse(catn, tags({"a": 1, "b": 2, "c": 3})) is INVALID


def test_repeat_unparse_reference():
    """repeat-unparse-test, core_test.cljc:3071-3086 — unparse enforces the
    repetition bounds."""
    from malli_ray.core import INVALID
    R = ["repeat", {"min": 1, "max": 2}, ["cat", "int", "int"]]
    assert m.validate(R, [1, 2, 3, 4])
    assert m.parse(R, [1, 2, 3, 4]) == [[1, 2], [3, 4]]
    assert m.unparse(R, [[1, 2], [3, 4]]) == [1, 2, 3, 4]
    assert m.unparse(["repeat", {"min": 1, "max": 1}, ["cat", "int", "int"]],
                     [[1, 2], [3, 4]]) is INVALID
    assert m.unparse(["repeat", {"max": 1}, ["cat", "int", "int"]],
                     [[1, 2], [3, 4]]) is INVALID
    assert m.unparse(["repeat", {"min": 3}, ["cat", "int", "int"]],
                     [[1, 2], [3, 4]]) is INVALID
    assert m.parse(["repeat", ["*", "int"]], [1, 2, 3, 4]) == [[1, 2, 3, 4]]
    assert m.unparse(["repeat", ["*", "int"]], [[1, 2, 3, 4]]) == [1, 2, 3, 4]
    assert m.parse(["*", ["repeat", "int"]], [1, 2, 3, 4]) == [[1, 2, 3, 4]]
    assert m.unparse(["*", ["repeat", "int"]], [[1, 2, 3, 4]]) == [1, 2, 3, 4]
    assert m.parse(["repeat", ["repeat", "int"]], [1, None, 3, 4]) is INVALID
    assert m.unparse(["repeat", ["repeat", "int"]], [[1, None, 3, 4]]) is INVALID
    assert m.unparse(["+", "int"], []) is INVALID
    assert m.unparse(["*", "int"], []) == []


def test_coerce_cps_reference():
    """coerce CPS arity (coerce-test, core_test.cljc:3192-3208)."""
    result = {}
    m.coerce(["map", ["x", "int"]], {"x": 1},
             respond=lambda v: result.setdefault("respond", v),
             raise_=lambda e: result.setdefault("raise", e))
    assert result == {"respond": {"x": 1}}
    result = {}
    m.coerce(["map", ["x", "int"]], {"x": "1"},
             respond=lambda v: result.setdefault("respond", v),
             raise_=lambda e: result.setdefault("raise", e))
    err = result["raise"]
    assert err["value"] == {"x": "1"}
    assert err["explain"]["errors"][0]["in"] == ["x"]
    assert err["explain"]["errors"][0]["path"] == ["x"]


def test_extra_entries_default_map_reference():
    """extra-entries-in-map-test, core_test.cljc:3210-3244 — explain paths
    route extra keys through [::m/default 0/1]."""
    S = ["map", ["x", "boolean"], ["y", {"optional": True}, "int"],
         ["malli.core/default", ["map-of", "int", "int"]]]
    assert m.validate(S, {"x": True, "y": 1})
    assert m.validate(S, {"x": True, "y": 1, 123: 123, 456: 456})
    assert not m.validate(S, {"x": True, "y": 1, 42: 42, 123: "123", "456": 456})
    assert not m.validate(S, "not-a-map")
    exp = m.explain(S, {"y": "invalid", "123": "123"})
    got = [(e["path"], e["in"], e.get("type")) for e in exp["errors"]]
    assert got == [
        (["x"], ["x"], "malli.core/missing-key"),
        (["y"], ["y"], None),
        (["malli.core/default", 0], ["123"], None),
        (["malli.core/default", 1], ["123"], None)]


def test_sequence_errors_reference():
    """sequence-test (error_test.cljc:534-548): ALL errors at the furthest
    failure position — child attempt errors + input-remaining."""
    assert humanize(m.explain(["cat", "int?", "int?"], [1])) == \
        [None, ["end of input"]]
    assert humanize(m.explain(["cat", "int?", "int?"], [1, 2, 3])) == \
        [None, None, ["input remaining"]]
    assert humanize(m.explain(["cat", "int?", "int?", ["?", "int?"],
                               ["?", "string?"]], [1, 2, None])) == \
        [None, None, ["should be an int", "should be a string",
                      "input remaining"]]
    # end-of-input errors carry the failing CHILD's schema path
    exp = m.explain(["cat", "int?", "string?"], [1])
    assert [(e["path"], e["in"], e["type"]) for e in exp["errors"]] == \
        [([1], [1], "malli.core/end-of-input")]


def test_parser_info_templates_reference():
    """parser_test.cljc:20-66 template rules: containers inherit
    simple-parser-ness from the hole; :every/:->/:function are always
    simple; :orn/:multi/:andn/seqex always transform."""
    def simple(s):
        return bool(m.parser_info(s).get("identity"))

    SIMPLE, XFORM = "int", ["orn", ["a", "int"]]
    inheriting = [
        lambda H: H, lambda H: ["maybe", H], lambda H: ["schema", H],
        lambda H: ["tuple", H], lambda H: ["tuple", H, "any"],
        lambda H: ["vector", H], lambda H: ["set", H],
        lambda H: ["map", ["foo", H]],
        lambda H: ["map", ["foo", {"optional": True}, H]],
        lambda H: ["and", H], lambda H: ["and", H, "any"],
        lambda H: ["or", H, "any"],
        lambda H: ["map-of", H, "any"], lambda H: ["map-of", "any", H],
    ]
    for t in inheriting:
        assert simple(t(SIMPLE)), t(SIMPLE)
        assert not simple(t(XFORM)), t(XFORM)
    assert simple(["every", XFORM])           # bounded parse == validate
    for s in [["orn", ["a", SIMPLE]], ["andn", ["a", SIMPLE]],
              ["catn", ["a", "int?"]], ["cat", "int?"],
              ["multi", {"dispatch": "t"}, ["a", ["map", ["t", ["=", "a"]]]]]]:
        assert not simple(s), s


def test_limits_humanize_reference():
    """limits (error_test.cljc:646-668): value-aware collection-count
    messages — exact when min==max, at-least when too short, else at-most."""
    got = humanize(m.explain(
        ["map",
         ["a", ["vector", "int?"]],
         ["b", ["vector", {"min": 2}, "int?"]],
         ["c", ["vector", {"max": 5}, "int?"]],
         ["d", ["vector", ["vector", {"min": 2, "max": 5}, "int?"]]],
         ["e", ["vector", {"min": 2, "max": 5}, "int?"]],
         ["f", ["vector", {"min": 5, "max": 5}, "int?"]]],
        {"a": ["123"], "b": [1], "c": [1, 2, 3, 4, 5, 6],
         "d": [[1], [1, 2, 3, 4, 5, 6, 7]], "e": [1.2], "f": [1, 2, 3, 4]}))
    assert got == {
        "a": [["should be an int"]],
        "b": ["should have at least 2 elements"],
        "c": ["should have at most 5 elements"],
        "d": [["should have at least 2 elements"],
              ["should have at most 5 elements"]],
        "e": ["should have at least 2 elements"],
        "f": ["should have 5 elements"]}


def test_nested_not_humanize_reference():
    """nested-not-humanize-test (error_test.cljc:894-925): negation flips
    or FORWARDS to the comparator complement, double negation unwraps."""
    h = lambda s, v: humanize(m.explain(s, v))
    cases = [
        ((["=", 1], None), ["should be 1"]),
        ((["not", ["=", 1]], 1), ["should not be 1"]),
        ((["not", ["not", ["=", 1]]], None), ["should be 1"]),
        ((["not", ["not", ["not", ["=", 1]]]], 1), ["should not be 1"]),
        ((["not", ["not", ["not", ["not", ["=", 1]]]]], None), ["should be 1"]),
        (([">", 1], 0), ["should be larger than 1"]),
        ((["not", [">", 1]], 2), ["should be at most 1"]),
        ((["not", ["not", [">", 1]]], 0), ["should be larger than 1"]),
        ((["not", ["not", ["not", [">", 1]]]], 2), ["should be at most 1"]),
        (([">=", 1], 0), ["should be at least 1"]),
        ((["not", [">=", 1]], 2), ["should be smaller than 1"]),
        ((["<", 1], 2), ["should be smaller than 1"]),
        ((["not", ["<", 1]], 0), ["should be at least 1"]),
        ((["<=", 1], 2), ["should be at most 1"]),
        ((["not", ["<=", 1]], 0), ["should be larger than 1"]),
    ]
    for (s_v, want) in cases:
        assert h(*s_v) == want, s_v[0]


def test_custom_negating_reference():
    """custom-negating-test (error_test.cljc:926-945): :error/fn sees the
    ``negated`` marker; calling it disables the implicit prefix flip."""
    h = lambda s, v: humanize(m.explain(s, v))
    f3 = ["fn", {"error/message": {"en": "should be a multiple of 3"}},
          lambda x: x % 3 == 0]
    assert h(f3, 2) == ["should be a multiple of 3"]
    assert h(["not", f3], 3) == ["should not be a multiple of 3"]
    neg_fn = ["fn", {"error/fn": {"en": lambda e, _o:
                                  "should not be a multiple of 3 negated=" +
                                  str(bool(e.get("negated"))).lower()}},
              lambda x: x % 3 != 0]
    assert h(neg_fn, 0) == ["should not be a multiple of 3 negated=false"]
    neg_fn2 = ["not", ["fn", {"error/fn": {"en": lambda e, _o:
                              "should not be a multiple of 3 negating=" +
                              str(bool(e.get("negated"))).lower()}},
                       lambda x: x % 3 != 0]]
    assert h(neg_fn2, 1) == ["should be a multiple of 3 negating=true"]

    def explicit(e, _o):
        n = e.get("negated")
        if n:
            return n("should not avoid being a multiple of 3")
        return "should not be a multiple of 3"

    assert h(["not", ["fn", {"error/fn": {"en": explicit}},
              lambda x: x % 3 != 0]], 1) == \
        ["should not avoid being a multiple of 3"]


def test_not_humanize_table_reference():
    """not-humanize-test (error_test.cljc:811-893, Python-expressible
    slice): every negated message."""
    h = lambda s, v: humanize(m.explain(s, v))
    cases = [
        (["not", "any?"], True, ["should not be any"]),
        (["not", "number?"], 1, ["should not be a number"]),
        (["not", "int?"], 1, ["should not be an int"]),
        (["not", "pos-int?"], 1, ["should not be a positive int"]),
        (["not", "string?"], "", ["should not be a string"]),
        (["not", "map?"], {}, ["should not be a map"]),
        (["not", "nil?"], None, ["should not be nil"]),
        (["not", "zero?"], 0, ["should not be zero"]),
        (["not", "empty?"], [], ["should not be empty"]),
        (["not", ["re", ""]], "", ["should not match regex"]),
        (["not", "ifn?"], len, ["should not be an ifn"]),
        (["not", "fn?"], len, ["should not be a fn"]),
        (["not", ["enum", 1]], 1, ["should not be 1"]),
        (["not", ["enum", 1, 2, 3]], 1, ["should not be either 1, 2 or 3"]),
        (["not", "any"], 1, ["should not be any"]),
        (["not", "string"], "a", ["should not be a string"]),
        (["not", ["string", {"min": 1}]], "a",
         ["should not be at least 1 character"]),
        (["not", ["string", {"max": 1}]], "a",
         ["should not be at most 1 character"]),
        (["not", ["string", {"min": 1, "max": 1}]], "a",
         ["should not be 1 character"]),
        (["not", "int"], 1, ["should not be an integer"]),
        (["not", ["int", {"min": 1}]], 1, ["should not be at least 1"]),
        (["not", ["int", {"max": 1}]], 1, ["should not be at most 1"]),
        (["not", ["int", {"min": 1, "max": 1}]], 1, ["should not be 1"]),
        (["not", ["double", {"min": 1.5}]], 1.5,
         ["should not be at least 1.5"]),
        (["not", ["=>", ["cat"], "any"]], len,
         ["should not be a valid function"]),
        (["not", ["=", 1]], 1, ["should not be 1"]),
        (["not", ["not=", 1]], None, ["should be 1"]),
    ]
    for s, v, want in cases:
        assert h(s, v) == want, s
    # value-aware bounds on the POSITIVE side too (string-test shapes)
    assert h(["string", {"min": 2, "max": 4}], "abcde") == \
        ["should be at most 4 characters"]
    assert h(["string", {"min": 1, "max": 1}], "ab") == \
        ["should be 1 character"]


def test_string_int_double_humanize_tables_reference():
    """string-test / int-test / double-test (error_test.cljc:321-398)."""
    got = humanize(m.explain(
        ["map", ["a", "string"], ["b", ["string", {"min": 1}]],
         ["c", ["string", {"max": 4}]],
         ["d", ["vector", ["string", {"min": 1, "max": 4}]]],
         ["e", ["string", {"min": 1, "max": 4}]],
         ["f", ["string", {"min": 4, "max": 4}]],
         ["g", ["string", {"max": 1}]],
         ["h", ["string", {"min": 1, "max": 1}]]],
        {"a": 123, "b": "", "c": "invalid", "d": ["", "12345"],
         "e": 123, "f": "invalid", "g": "ab", "h": ""}))
    assert got == {
        "a": ["should be a string"], "b": ["should be at least 1 character"],
        "c": ["should be at most 4 characters"],
        "d": [["should be at least 1 character"],
              ["should be at most 4 characters"]],
        "e": ["should be a string"], "f": ["should be 4 characters"],
        "g": ["should be at most 1 character"], "h": ["should be 1 character"]}
    got = humanize(m.explain(
        ["map", ["a", "int"], ["b", ["int", {"min": 1}]],
         ["c", ["int", {"max": 4}]],
         ["d", ["vector", ["int", {"min": 1, "max": 4}]]],
         ["e", ["int", {"min": 1, "max": 4}]],
         ["f", ["int", {"min": 4, "max": 4}]]],
        {"a": "123", "b": 0, "c": 5, "d": [0, 5], "e": "123", "f": 5}))
    assert got == {
        "a": ["should be an integer"], "b": ["should be at least 1"],
        "c": ["should be at most 4"],
        "d": [["should be at least 1"], ["should be at most 4"]],
        "e": ["should be an integer"], "f": ["should be 4"]}
    got = humanize(m.explain(
        ["map", ["a", "double"], ["b", ["double", {"min": 1}]],
         ["e", ["double", {"min": 1, "max": 4}]],
         ["f", ["double", {"min": 4, "max": 4}]]],
        {"a": "123", "b": 0.0, "e": "123", "f": 5.0}))
    assert got == {
        "a": ["should be a double"], "b": ["should be at least 1"],
        "e": ["should be a double"], "f": ["should be 4"]}


def test_humanize_throws_1271_reference():
    """humanize-throws-test-1271 (error_test.cljc:947-957): error/path
    landing spots follow the VALUE's shape; a non-indexable key on a
    sequential accumulator degrades to ["invalid type"]; :fn has no
    catalog message."""
    h = lambda s, v: humanize(m.explain(s, v))
    fn = lambda d: isinstance(d, dict) and isinstance(d.get("foo"), int)
    cases = [
        (["fn", {"error/path": ["foo"]}, fn], {"foo": None},
         {"foo": ["unknown error"]}),
        (["fn", {"error/path": ["foo"]}, fn], {}, {"foo": ["unknown error"]}),
        (["fn", {"error/path": [5]}, fn], {}, {5: ["unknown error"]}),
        (["fn", {"error/path": [5]}, fn], [],
         [None, None, None, None, None, ["unknown error"]]),
        (["fn", {"error/path": [-1]}, fn], {}, {-1: ["unknown error"]}),
        (["fn", {"error/path": [-1]}, fn], [], ["invalid type"]),
        (["fn", fn], [], ["unknown error"]),
        (["map"], [], ["invalid type"]),
        (["vector", ["map"]], [[]], [["invalid type"]]),
        (["vector", ["fn", {"error/path": [-1]}, fn]], [[]],
         [["invalid type"]]),
    ]
    for s, v, want in cases:
        assert h(s, v) == want, (s, v)


def test_humanize_table_reference():
    """humanize-test (error_test.cljc:105-181) — the canonical shapes."""
    h = lambda s, v: humanize(m.explain(s, v))
    assert h("int?", 1) is None
    assert h("int?", "1") == ["should be an int"]
    assert h(["vector", ["vector", "int?"]], [[1, 2], [2, 2], [3, "4"]]) == \
        [None, None, [None, ["should be an int"]]]
    assert h(["set", "int?"], [1]) == ["invalid type"]
    assert h(["vector", ["map", ["x", ["vector", "int?"]]]],
             [{"x": [1, 2, 3]}, {"x": [1, "2", "3"]}, {"x": {"w"}}]) == \
        [None, {"x": [None, ["should be an int"], ["should be an int"]]},
         {"x": ["invalid type"]}]
    assert h(["map", ["data", ["vector", ["map", ["x", ["vector", "int?"]]]]]],
             {"data": [{"x": ["1", 2, "3"]}, {"x": ["1", 2, "3"]},
                       {"x": [1]}, {"x": ["1"]}, {"x": [1]}]}) == \
        {"data": [{"x": [["should be an int"], None, ["should be an int"]]},
                  {"x": [["should be an int"], None, ["should be an int"]]},
                  None, {"x": [["should be an int"]]}]}
    assert h(["map", {"closed": True}, ["x", "int?"]],
             {"x": 1, "extra": "key"}) == {"extra": ["disallowed key"]}
    assert h(["map", ["person", ["and", ["map", ["name", "string?"]],
                                 "seq?"]]], {"person": {}}) == \
        {"person": {"malli/error": ["should be a seq"],
                    "name": ["missing required key"]}}
    assert h(["map", ["person", "seq?"]], {"person": {}}) == \
        {"person": ["should be a seq"]}
    # hand-built explanations (schema forms, duplicate errors preserved)
    assert humanize({"value": {},
                     "errors": [{"in": ["x"], "schema": ["map", ["x", "int?"]],
                                 "type": "malli.core/missing-key"},
                                {"in": ["x"], "schema": ["map", ["x", "int?"]],
                                 "type": "malli.core/missing-key"}]}) == \
        {"x": ["missing required key", "missing required key"]}
    # customization + locale (error_test.cljc:182-220)
    S = ["map", ["a", "int?"],
         ["c", ["pos-int?", {"error/message": "STAY POSITIVE",
                             "error/fn": {"fi": lambda e, o: "POSITIIVINEN"}}]],
         ["d", ["map", ["f", ["int?", {"error/message":
                                       {"en": "SHOULD BE ZIP",
                                        "fi": "PITÄISI OLLA NUMERO"}}]]]]]
    v = {"a": "invalid", "c": "invalid", "d": {"f": "invalid"}}
    assert h(S, v) == {"a": ["should be an int"], "c": ["STAY POSITIVE"],
                       "d": {"f": ["SHOULD BE ZIP"]}}
    assert humanize(m.explain(S, v), {"locale": "fi"}) == \
        {"a": ["should be an int"], "c": ["POSITIIVINEN"],
         "d": {"f": ["PITÄISI OLLA NUMERO"]}}


def test_andn_unparse_leftmost_reference():
    """andn-test (core_test.cljc:3602-3631): unparse uses the LEFT-MOST
    conjunct present in the tags; the result re-validates against the rest;
    unknown or empty tags are invalid."""
    from malli_ray.core import INVALID, Tag, Tags
    s = ["andn", ["o", ["orn", ["left", "int"], ["right", "int"]]],
         ["f", ["fn", lambda x: isinstance(x, (int, float))]]]
    p = m.parse(s, 1)
    assert p == Tags({"o": Tag("left", 1), "f": 1})
    assert m.unparse(s, p) == 1
    assert m.unparse(s, Tags({"o": Tag("left", 2), "f": 1})) == 2
    assert m.unparse(s, Tags({"o": Tag("left", 1), "f": 2})) == 1
    assert m.unparse(s, Tags({"f": 2})) == 2
    assert m.unparse(s, Tags({})) is INVALID
    assert m.unparse(s, Tags({"zzz": 1})) is INVALID
    # explain error path/in (core_test.cljc:3602-3612)
    exp = m.explain(["andn", ["m", "map?"], ["v", ["vector", "any"]]], {})
    assert [(e["path"], e["in"], e["type"]) for e in exp["errors"]] == \
        [(["v"], [], "malli.core/invalid-type")]
