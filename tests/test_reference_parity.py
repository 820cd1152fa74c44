"""Assertions ported 1:1 from the reference test suite (semantics, not code).

Sources (file:line into /root/reference):
  - test/malli/core_test.cljc:226-312 (:and/:or/:orn contract)
  - test/malli/error_test.cljc:12-34 (error-message resolution)
  - src/malli/error.cljc:15-17 (min/max message shapes), :67-171 (catalog)
"""

import malli_ray as m
from malli_ray import INVALID, Tag
from malli_ray.error import error_message, humanize
from malli_ray.transform import json_transformer, string_transformer

SCHEMA = ["and", "int?", ["or", "pos-int?", "neg-int?"]]
SCHEMA_N = ["and", "int?", ["orn", ["pos", "pos-int?"], ["neg", "neg-int?"]]]


def test_and_or_validate():
    # core_test.cljc:229-235
    for s in (SCHEMA, SCHEMA_N):
        assert m.validate(s, 1) is True
        assert m.validate(s, -1) is True
        assert m.validate(s, 0) is False
        assert m.validate(s, "1") is False
        assert m.validate(s, [1]) is False


def test_and_or_explain_paths():
    # core_test.cljc:237-249: exact :path/:in for both branches
    assert m.explain(SCHEMA, 1) is None
    e = m.explain(SCHEMA, 0)
    got = [(x["path"], x["in"]) for x in e["errors"]]
    assert got == [([1, 0], []), ([1, 1], [])]
    e = m.explain(SCHEMA_N, 0)
    got = [(x["path"], x["in"]) for x in e["errors"]]
    assert got == [([1, "pos"], []), ([1, "neg"], [])]


def test_and_orn_parse_unparse():
    # core_test.cljc:251-260
    assert m.parse(SCHEMA, 1) == 1
    assert m.parse(SCHEMA, 0) is INVALID
    assert m.unparse(SCHEMA, 1) == 1
    assert m.unparse(SCHEMA, 0) is INVALID
    assert m.parse(SCHEMA_N, 1) == Tag("pos", 1)
    assert m.parse(SCHEMA_N, 0) is INVALID
    assert m.unparse(SCHEMA_N, Tag("pos", 1)) == 1
    assert m.unparse(SCHEMA_N, ["pos", 1]) is INVALID   # bare vector != Tag
    assert m.unparse(SCHEMA_N, Tag("pos", 0)) is INVALID


def test_and_decode_transformers():
    # core_test.cljc:263-265: string decodes, json leaves strings alone
    for s in (SCHEMA, SCHEMA_N):
        assert m.decode(s, "1", string_transformer()) == 1
        assert m.decode(s, "1", json_transformer()) == "1"


def test_and_enter_leave_composition():
    # core_test.cljc:267-277: :and node interceptor + per-child chains
    s = ["and", {"decode/string": {"enter": lambda x: "olipa_" + x,
                                   "leave": lambda x: x + "_avaruus"}},
         "string?"]
    assert m.decode(s, "kerran", string_transformer()) == "olipa_kerran_avaruus"
    s = ["and",
         ["string", {"decode/string": {"enter": lambda x: "1_" + x,
                                       "leave": lambda x: x + "_2"}}],
         ["string", {"decode/string": {"enter": lambda x: "3_" + x,
                                       "leave": lambda x: x + "_4"}}]]
    assert m.decode(s, "kerran", string_transformer()) == "3_1_kerran_2_4"


def test_or_decode_first_validating_branch():
    # core_test.cljc:278-289
    s = ["or",
         ["string", {"decode/string": {"enter": lambda x: "1_" + x,
                                       "leave": lambda x: x + "_2"}}],
         ["string", {"decode/string": {"enter": lambda x: "3_" + x,
                                       "leave": lambda x: x + "_4"}}]]
    assert m.decode(s, "kerran", string_transformer()) == "1_kerran_2"
    s = ["or", "map?",
         ["string", {"decode/string": {"enter": lambda x: "3_" + x,
                                       "leave": lambda x: x + "_4"}}]]
    assert m.decode(s, "kerran", string_transformer()) == "3_kerran_4"


def test_form_roundtrip_reference_shapes():
    # core_test.cljc:311-312
    assert m.form(m.schema(SCHEMA)) == SCHEMA
    assert m.form(m.schema(SCHEMA_N)) == SCHEMA_N
    # over-the-wire (core_test.cljc:292)
    from malli_ray.serialize import read_string, write_string
    for s in (SCHEMA, SCHEMA_N):
        assert m.validate(read_string(write_string(s)), 1) is True


def test_error_message_resolution_chain():
    # error_test.cljc:12-34
    msg = "should be an int"
    e = m.explain(["int?", {"error/message": msg}], "kikka")["errors"][0]
    assert error_message(e) == msg
    fn1 = lambda err, _o: f"should be an int, was {err['value']}"  # noqa: E731
    e = m.explain(["int?", {"error/fn": fn1}], "kikka")["errors"][0]
    assert error_message(e) == "should be an int, was kikka"
    # error/fn wins over error/message when both present
    e = m.explain(["int?", {"error/message": msg, "error/fn": fn1}],
                  "kikka")["errors"][0]
    assert error_message(e) == "should be an int, was kikka"


def test_catalog_messages_match_reference():
    # src/malli/error.cljc:67-171 (:en catalog)
    cases = [
        ("int?", 1.5, "should be an int"),
        ("pos-int?", -1, "should be a positive int"),
        ("neg-int?", 1, "should be a negative int"),
        ("nat-int?", -1, "should be a non-negative int"),
        ("number?", "x", "should be a number"),
        ("integer?", "x", "should be an integer"),
        ("boolean?", 1, "should be a boolean"),
        ("string?", 1, "should be a string"),
        ("keyword?", 1, "should be a keyword"),
        ("symbol?", 1, "should be a symbol"),
        ("uuid?", 1, "should be a uuid"),
        ("double?", 1, "should be a double"),
        ("pos?", -1, "should be positive"),
        ("neg?", 1, "should be negative"),
    ]
    for schema, value, message in cases:
        assert humanize(m.explain(schema, value)) == [message], schema


def test_min_max_message_shapes():
    # src/malli/error.cljc:15-17: "should be N" when min == max
    assert humanize(m.explain(["int", {"min": 5, "max": 5}], 4)) is not None
    assert humanize(m.explain(["int", {"min": 1}], 0)) == ["should be at least 1"]
    assert humanize(m.explain(["int", {"max": 2}], 3)) == ["should be at most 2"]


def test_strip_extra_keys_reference_cases():
    # transform_test.cljc:530-585
    from malli_ray.transform import (
        strip_extra_keys_transformer, string_transformer, transformer)
    import malli_ray as m
    from malli_ray import DEFAULT_KEY

    st = strip_extra_keys_transformer()
    # extra keys from :map are stripped
    assert m.decode(["map", ["x", "int"], ["y", "int"]],
                    {"x": 1, "y": 2, "z": 3}, st) == {"x": 1, "y": 2}
    # extra keys from :map-of are stripped (invalid key OR value)
    assert m.decode(["map-of", "int", "int"],
                    {1: 1, "2": 2, 3: "3", "4": "4"}, st) == {1: 1}
    # composing with string-transformer coerces first, then strips
    chain = transformer(st, string_transformer())
    assert m.decode(["map-of", "int", "int"],
                    {1: 1, "2": 2, 3: "3", "4": "4"}, chain) == \
        {1: 1, 2: 2, 3: 3, 4: 4}
    # ::m/default defines how extra keys are stripped
    value = {"x": 1, "y": 2, "z": "not-int-val", 1: 1, "2": 2, "s": "5"}
    out = m.decode(["map", ["x", "int"], ["y", "int"],
                    [DEFAULT_KEY, ["map-of", "int", "int"]]], value, st)
    assert out == {"x": 1, "y": 2, 1: 1}
    # non-map values pass through unharmed
    assert m.decode(["map", ["foo", "string"]], "bar", st) == "bar"


def test_scalar_fn_reference_cases():
    # transform_test.cljc:29-97
    from malli_ray.transform import (
        string_to_boolean, string_to_date, string_to_double, string_to_long,
        string_to_uuid)
    import datetime as dt
    import uuid as _uuid

    assert string_to_long("9007199254740993") == 9007199254740993
    assert string_to_long("abba") == "abba"
    assert string_to_double("1") == 1.0
    assert string_to_double(1) == 1            # non-strings untouched
    assert string_to_double("1.0abba") == "1.0abba"
    assert string_to_boolean("abba") == "abba"
    # uppercase uuid accepted; incomplete rejected (stays string)
    assert isinstance(string_to_uuid("B3C4E6B4-6304-4A52-99C3-CB50E737BB94"),
                      _uuid.UUID)
    assert string_to_uuid("5f60751d-9bf7-4344-97ee-48643c") == \
        "5f60751d-9bf7-4344-97ee-48643c"
    assert string_to_uuid("1-1-1-1-1") == "1-1-1-1-1"
    assert isinstance(string_to_uuid("00000000-0000-0000-0000-000000000000"),
                      _uuid.UUID)
    # ISO-8601 variants
    utc = dt.timezone.utc
    assert string_to_date("2018-04-27T18:25:37Z") == \
        dt.datetime(2018, 4, 27, 18, 25, 37, tzinfo=utc)
    assert string_to_date("2018-04-27") == \
        dt.datetime(2018, 4, 27, tzinfo=utc)
    d = string_to_date("2018-04-27T08:00:00+03:00")
    assert d.astimezone(utc) == dt.datetime(2018, 4, 27, 5, 0, 0, tzinfo=utc)
    assert string_to_date("2018-04-27T18:25:37.123456Z").microsecond == 123456
    assert string_to_date("abba") == "abba"


def test_error_path_property():
    # error_test.cljc:263-276 (#554): :error/path redirects the message
    schema = ["and",
              ["map", ["password", "string?"], ["password2", "string?"]],
              ["fn", {"error/message": "passwords don't match",
                      "error/path": ["password2"]},
               lambda m_: m_["password"] == m_["password2"]]]
    out = humanize(m.explain(schema, {"password": "secret",
                                      "password2": "faarao"}))
    assert out == {"password2": ["passwords don't match"]}


def test_round3_review_regressions():
    from malli_ray.core import parser_info
    from malli_ray.transform import (
        strip_extra_keys_transformer, string_transformer, transformer)
    from malli_ray.provider import provide
    from malli_ray import DEFAULT_KEY

    # parser_info mirrors the transforming-child :and parser
    assert parser_info(["and", "int?", ["orn", ["p", "pos-int?"]]]) == \
        {"identity": False}
    assert parser_info(["and", "int?", [">", 0]]) == {"identity": True}

    # strip on ENCODE must not drop everything (enter-stage strip)
    st = strip_extra_keys_transformer()
    chain = transformer(st, string_transformer())
    out = m.encode(["map-of", "int", "int"], {1: 1, "x": "y"}, chain)
    assert "x" not in out and len(out) == 1

    # :map ::default strips by key membership, not value validity
    S = ["map", ["x", "int"], [DEFAULT_KEY, ["map", ["extra", "int"]]]]
    out = m.decode(S, {"x": 1, "extra": "oops", "zzz": 2}, st)
    assert out == {"x": 1, "extra": "oops"}

    # provider: heterogeneous key types fall back to :map
    out = provide([{1: "a", "x": "b"}, {2: "c", "y": "d"}, {3: "e", "z": "f"}],
                  {"map-of-threshold": 2})
    assert out[0] == "map"

    # provider: wide vectors skip tuple bookkeeping but still infer :vector
    wide = [[float(i) for i in range(64)] for _ in range(5)]
    assert provide(wide, {"tuple-threshold": 2})[0] == "vector"

    # spec digests stable across processes even with callables
    import subprocess, sys
    code = (
        "from malli_ray.stages.validator import ValidationSpec, _spec_key;"
        "s = ValidationSpec(schema=['map', ['x', ['fn', 'x > 0']]],"
        "options={'cb': (lambda v: v)});"
        "print(__import__('hashlib').sha256(_spec_key(s, '').encode())"
        ".hexdigest()[:16])")
    d1 = subprocess.run([sys.executable, "-c", code], capture_output=True,
                        text=True, cwd="/root/repo").stdout.strip()
    d2 = subprocess.run([sys.executable, "-c", code], capture_output=True,
                        text=True, cwd="/root/repo").stdout.strip()
    assert d1 and d1 == d2


def test_decode_batch_int64_range():
    import pyarrow as pa
    from malli_ray.stages.transform_stage import DecodeBatch
    d = DecodeBatch(["map", ["a", "int"]])
    out = d(pa.table({"a": [5e18, 1e19, -5e18, 2.0]}))
    assert out.column("a").to_pylist() == [5000000000000000000, None,
                                           -5000000000000000000, 2]


def test_not_schema_reference_cases():
    # core_test.cljc:418-480
    s1 = ["not", "pos?"]
    s2 = ["not", "empty?"]
    assert m.validate(s1, -1) and m.explain(s1, -1) is None
    assert m.parse(s1, -1) == -1
    assert m.validate(s1, 0)
    assert m.validate(s2, "string") and not m.validate(s2, "")
    e = m.explain(s1, 1)
    assert [(x["path"], x["in"]) for x in e["errors"]] == [([0], [])]
    assert m.parse(s1, 1) is INVALID
    # as part of a complex schema: paths nest under the entry key
    schema = ["map", ["a", "int?"], ["b", ["not", "empty?"]],
              ["c", ["map", ["d", ["not", ["fn", "x == 'test'"]]]]],
              ["e", ["not", ["<", 10]]]]
    assert m.validate(schema, {"a": 1, "b": "Test", "c": {"d": "Malli"}, "e": 10})
    e = m.explain(schema, {"a": 1, "b": "", "c": {"d": "Malli"}, "e": 10})
    assert [(x["path"], x["in"]) for x in e["errors"]] == [(["b", 0], ["b"])]
    e = m.explain(schema, {"a": 1, "b": "x", "c": {"d": "test"}, "e": 10})
    assert [(x["path"], x["in"]) for x in e["errors"]] == \
        [(["c", "d", 0], ["c", "d"])]


def test_registry_alias_with_properties_issue_451():
    """[::alias {props}] re-binds the expanded schema's top-node properties
    (reference issue-451, core_test.cljc:3088-3110): derived-ref chains with
    per-alias :error/message, and bounds props through an alias."""
    from malli_ray.core import default_registry
    from malli_ray.registry import composite_registry

    opts = {"registry": composite_registry(
        {"derived": "string", "derived2": "derived",
         "derived3": ["derived", {"error/message": "bar"}],
         "derived4": ["derived2", {"error/message": "baz"}]},
        default_registry())}
    assert m.validate("derived2", "x", opts)
    assert m.validate("derived3", "y", opts)
    assert m.validate("derived4", "z", opts)
    assert m.humanize(m.explain("derived3", 1, opts)) == ["bar"]
    assert m.humanize(m.explain("derived4", 1, opts)) == ["baz"]
    # schema-property registry, alias applied with bounds props
    one = ["map", {"registry": {"my-string-like": "string"}},
           ["entry", ["my-string-like", {"min": 2}]]]
    assert m.validate(one, {"entry": "ab"})
    assert not m.validate(one, {"entry": "a"})
    # children on an alias are still rejected (target children are fixed)
    import pytest
    with pytest.raises(m.SchemaError):
        m.schema(["my-alias", "int"],
                 {"registry": composite_registry({"my-alias": ["vector", "int"]},
                                                 default_registry())})


def test_issue_regressions_925_937_unparse_confusion():
    """core_test issue-925 (catn order), issue-937 (single-child nested
    altn), unparse-confusion #1150/#1153 (parse->unparse roundtrips when a
    sibling branch could match the parsed shape)."""
    sc = ["catn", *[[c, "int"] for c in "abcdefghi"]]
    inp = list(range(1, 10))
    assert m.unparse(sc, m.parse(sc, inp)) == inp

    s = ["*", ["altn", ["a", ["=", "a"]]]]
    assert m.validate(s, ["a"]) and m.explain(s, ["a"]) is None
    p = m.parse(s, ["a"])
    assert p == [m.tag("a", "a")]
    assert m.unparse(s, p) == ["a"]

    s1 = ["or", ["tuple", "string", "keyword"], ["orn", ["any", "keyword"]]]
    assert m.unparse(s1, m.parse(s1, "k")) == "k"
    s2 = ["or", ["map", ["key", "string"], ["value", "keyword"]],
          ["orn", ["any", "keyword"]]]
    assert m.unparse(s2, m.parse(s2, "k")) == "k"
    s3 = ["or", ["map", ["s", "string"]], ["catn", ["s", "string"]]]
    assert m.unparse(s3, m.parse(s3, ["k"])) == ["k"]


def test_or_orn_transformer_reference_semantics():
    """-or-transformer (core.cljc:651-670) applies to BOTH :or and :orn
    (core.cljc:1035, 1097): decode = first branch whose decoded value
    validates (falling back to the first decode), encode = first branch
    whose validator accepts the raw value."""
    from malli_ray.transform import string_transformer
    st = string_transformer()
    assert m.decode(["or", "int", "boolean"], "true", st) is True
    assert m.decode(["or", "int", "boolean"], "7", st) == 7
    assert m.decode(["orn", ["i", "int"], ["b", "boolean"]], "true", st) is True
    assert m.decode(["orn", ["i", "int"], ["b", "boolean"]], "7", st) == 7
    # no branch validates: the first branch's decode result is kept
    assert m.decode(["or", "int", "boolean"], "zzz", st) == "zzz"
    # encode picks the branch that accepts the raw value
    assert m.encode(["or", "int", "string"], 7, st) == "7"
    assert m.encode(["orn", ["i", "int"], ["s", "string"]], 7, st) == "7"


def test_not_humanize_negation():
    """:not humanizes by flipping the child's should/should-not prefix
    (error.cljc:21-42, 123-124; error_test not-humanize-test)."""
    h = lambda s, v: m.humanize(m.explain(s, v))
    assert h(["not", "int?"], 1) == ["should not be an int"]
    assert h(["not", "integer?"], 1) == ["should not be an integer"]
    assert h(["not", "pos-int?"], 1) == ["should not be a positive int"]
    assert h(["not", "neg-int?"], -1) == ["should not be a negative int"]
    assert h(["not", "nat-int?"], 1) == ["should not be a non-negative int"]
    assert h(["not", "pos?"], 1) == ["should not be positive"]
    assert h(["not", "boolean?"], True) == ["should not be a boolean"]
    assert h(["not", "string?"], "") == ["should not be a string"]
    assert h(["not", "map?"], {}) == ["should not be a map"]
    assert h(["not", "nil?"], None) == ["should not be nil"]
    assert h(["not", "true?"], True) == ["should not be true"]
    assert h(["not", "zero?"], 0) == ["should not be zero"]
    assert h(["not", "any?"], True) == ["should not be any"]
    # double negation flips back
    assert h(["not", ["not", "int"]], "x") == ["should be an integer"]
    # nested placement
    assert h(["map", ["x", ["not", "string"]]], {"x": "s"}) == \
        {"x": ["should not be a string"]}


def test_resolve_root_error_reference_cases():
    """me/-resolve-root-error (error.cljc:315-329; error_test
    'error-definion-lookup-test'): the explicit message nearest the ROOT
    wins and relocates the humanized message."""
    from malli_ray.error import humanize, resolve_root_error

    h = lambda s, v: humanize(m.explain(s, v), resolve=resolve_root_error)
    assert h(["map", ["foo", "int"]], {"foo": "1"}) == \
        {"foo": ["should be an integer"]}
    assert h(["map", ["foo", {"error/message": "entry-failure"}, "int"]],
             {"foo": "1"}) == {"foo": ["entry-failure"]}
    # root-level message overrides the entry message (nearest root wins)
    assert h(["map", {"error/message": "map-failure"},
              ["foo", {"error/message": "entry-failure"}, "int"]],
             {"foo": "1"}) == ["map-failure"]
    # entry :error/fn sees the child schema's own properties (merged)
    fn = lambda err, _o: err["schema"].properties.get("reason")
    assert h(["map", ["foo", {"error/fn": fn}, ["int", {"reason": "failure"}]]],
             {"foo": "1"}) == {"foo": ["failure"]}
    # enum #553: no explicit ancestor message -> the error's own message
    assert h(["map", ["a", ["enum", "a", "b"]]], {"a": None}) == \
        {"a": ["should be either 'a' or 'b'"]}
    # non-map ancestors don't break the walk (find over non-maps);
    # divergence: we keep the error at its true index (reference collapses
    # to the path-derived position)
    assert h(["sequential", ["and", "int"]], [1, "2"]) == \
        [None, ["should be an integer"]]


def test_error_value_reference_cases():
    """me/error-value semantics (error.cljc:232-247, 397-408;
    error_test.cljc 'error-value' block): default missing-key suppression,
    accept-error override, mask-valid-values, wrap-error painting,
    keep-valid-values."""
    from malli_ray.error import error_value

    Address = ["map", {"closed": True},
               ["id", "string"],
               ["numbers", ["vector", "int"]],
               ["address", ["map",
                            ["street", "string"],
                            ["city", "string"],
                            ["zip", "int"],
                            ["lonlat", ["tuple", "double", "double"]]]]]
    address = {"id": "Lillan", "EXTRA": "KEY",
               "numbers": [1, "2", 3, 4, "5", 6, 7],
               "address": {"street": "Ahlmanintie 29", "zip": 33100,
                           "lonlat": [61.4858322, "23.7832851,17"]}}
    e = m.explain(Address, address)

    # defaults: error-only skeleton, missing keys suppressed
    assert error_value(e) == {
        "EXTRA": "KEY",
        "numbers": [None, "2", None, None, "5"],
        "address": {"lonlat": [None, "23.7832851,17"]}}
    # accept everything: the missing city appears
    got = error_value(e, {"accept_error": lambda _e: True})
    assert got["address"]["city"] is None and "city" in got["address"]
    # masked valid values (error_test 'masked valid values' shape)
    assert error_value(e, {"mask_valid_values": "..."}) == {
        "id": "...",
        "EXTRA": "KEY",
        "numbers": ["...", "2", "...", "...", "5", "...", "..."],
        "address": {"street": "...", "zip": "...",
                    "lonlat": ["...", "23.7832851,17"]}}
    # custom painting of errors
    painted = error_value(e, {"wrap_error":
                              lambda err: {"value": err.get("value"),
                                           "type": err.get("type")}})
    assert painted["EXTRA"] == {"value": "KEY", "type": "malli.core/extra-key"}
    assert painted["numbers"][1] == {"value": "2", "type": None}
    # keeping valid values
    kept = error_value(e, {"wrap_error": lambda err: {"value": err.get("value")},
                           "keep_valid_values": True})
    assert kept["id"] == "Lillan" and kept["numbers"][0] == 1
    assert kept["numbers"][1] == {"value": "2"}
    # sets: failing elements surface; mask marks hidden valid members
    es = m.explain(["set", "int"], {1, "a"})
    assert error_value(es) == {"a"}
    assert error_value(es, {"mask_valid_values": "..."}) == {"a", "..."}
    assert error_value(None) is None


def test_recursive_cons_cell():
    # core_test.cljc:646-679: recursion through a local registry + :ref
    ConsCell = ["schema",
                {"registry": {"cons": ["maybe", ["tuple", "int?", ["ref", "cons"]]]}},
                "cons"]
    assert m.validate(ConsCell, [1, None]) is True
    assert m.validate(ConsCell, [1, [2, None]]) is True
    assert m.validate(ConsCell, [1, [2]]) is False
    assert m.explain(ConsCell, [1, [2, None]]) is None
    e = m.explain(ConsCell, [1, [2]])
    assert e["errors"][0]["in"] == [1]
    assert e["errors"][0]["type"] == "malli.core/tuple-size"
    # over-the-wire round trip
    from malli_ray.serialize import read_string, write_string
    assert m.validate(read_string(write_string(ConsCell)), [1, [2, None]])


def test_mutual_recursion_ping_pong():
    # core_test.cljc:698-714
    registry = {"ping": ["maybe", ["tuple", ["=", "ping"], ["ref", "pong"]]],
                "pong": ["maybe", ["tuple", ["=", "pong"], ["ref", "ping"]]]}
    S = ["schema", {"registry": registry}, "ping"]
    assert m.validate(S, ["ping", ["pong", None]])
    assert m.validate(S, ["ping", ["pong", ["ping", None]]])
    assert not m.validate(S, ["ping", ["ping", None]])
    assert not m.validate(S, ["pong", None])


def test_map_of_reference_cases():
    # core_test.cljc:1309-1360 (keywords are strings here; int keys used for
    # the key/value type contrast)
    S = ["map-of", "string?", "int?"]
    assert m.validate(S, {"age": 18}) is True
    assert m.validate(S, {1: "18"}) is False
    assert m.validate(S, 1) is False
    assert m.validate(["map-of", {"min": 2}, "string?", "int?"], {"a": 1}) is False
    # explain: key errors at path [0], value errors at path [1], in [key]
    e = m.explain(S, {1: "18"})
    got = [(x["path"], x["in"]) for x in e["errors"]]
    assert got == [([0], [1]), ([1], [1])]
    # parse/unparse
    assert m.parse(S, {"age": 18}) == {"age": 18}
    assert m.parse(S, {1: "18"}) is INVALID
    assert m.unparse(S, {"age": 18}) == {"age": 18}
    assert m.unparse(S, 1) is INVALID
    # decode coerces BOTH keys and values through the child schemas
    out = m.decode(["map-of", "int?", "pos-int?"], {"1": "1"},
                   string_transformer())
    assert out == {1: 1}
    # node-level enter/leave composes around child transforms
    # (enter inc x -> child enter +2 -> child leave *3 -> leave *2)
    S2 = ["map-of",
          {"decode/string": {
              "enter": lambda d: {**d, "x": d["x"] + 1},
              "leave": lambda d: {**d, "x": d["x"] * 2}}},
          "string?", ["int?", {"decode/string": {
              "enter": lambda v: v + 2, "leave": lambda v: v * 3}}]]
    assert m.decode(S2, {"x": 1}, string_transformer()) == {"x": 24}


def test_multi_reference_cases():
    # core_test.cljc:1102-1140 (keywords -> strings)
    schema = ["multi", {"dispatch": "type"},
              ["sized", ["map", ["type", "keyword?"], ["size", "int?"]]],
              ["human", ["map", ["type", "keyword?"], ["name", "string?"],
                         ["address", ["map", ["country", "keyword?"]]]]]]
    assert m.validate(schema, {"type": "sized", "size": 10}) is True
    assert m.validate(schema, {"type": "human", "name": "inkeri",
                               "address": {"country": "PO"}}) is True
    assert m.validate(schema, {"type": "sized", "size": "size"}) is False
    assert m.validate(schema, {"type": "human", "namez": "inkeri"}) is False
    assert m.validate(schema, {"type": "worm"}) is False
    assert m.validate(schema, []) is False
    assert m.validate(schema, "xxx") is False
    # node-level decode property on the :multi schema itself
    s2 = ["multi", {"dispatch": "type",
                    "decode/string": lambda x: {**x, "type": x["type"].lower()}
                    if isinstance(x, dict) and isinstance(x.get("type"), str) else x},
          ["sized", ["map", ["type", "keyword?"], ["size", "int?"]]]]
    out = m.decode(s2, {"type": "SIZED", "size": "10"}, string_transformer())
    assert out == {"type": "sized", "size": 10}
    assert m.validate(s2, out)
    # ::m/default branch IS transformed (core_test.cljc:2795-2803)
    from malli_ray.transform import key_transformer
    kt = key_transformer(encode=lambda k: k.upper())
    s3 = ["multi", {"dispatch": "foo"},
          ["bar", ["map", ["foo", "keyword?"]]],
          [m.DEFAULT_KEY, ["map", ["foo", "keyword?"]]]]
    assert m.encode(s3, {"foo": "bar"}, kt) == {"FOO": "bar"}
    assert m.encode(s3, {"foo": "baz"}, kt) == {"FOO": "baz"}


def test_third_review_regressions():
    """Fixes from the third review pass."""
    import pytest
    import malli_ray as m
    from malli_ray.core import default_registry

    # (2) recursive branch under :or fails LOUDLY in the Arrow mapper —
    # never falls through to a sibling branch's wrong layout
    from malli_ray.arrow_schema import RecursiveSchemaError, to_arrow_schema
    REC_UNION = ["map", {"registry": {
        "Tree": ["or", ["tuple", "int", ["ref", "Tree"]], "int"]}},
        ["t", "Tree"]]
    with pytest.raises(RecursiveSchemaError):
        to_arrow_schema(REC_UNION)

    # (3) alias props with dict VALUE children (:= / :enum) — the dict
    # child must not be mistaken for properties
    reg = {**default_registry(), "C": ["=", None, {"a": 1}],
           "E": ["enum", None, {"a": 1}, "x"]}
    opts = {"registry": reg}
    s = m.schema(["C", {"error/message": "bad"}], opts)
    assert m.validate(s, {"a": 1}) and not m.validate(s, {"a": 2})
    assert m.humanize(m.explain(s, 5, opts)) == ["bad"]
    s3 = m.schema(["E", {"error/message": "nope"}], opts)
    assert m.validate(s3, {"a": 1}) and m.validate(s3, "x")
    assert not m.validate(s3, "y")

    # (4) same-named refs with different targets get distinct definitions
    from malli_ray.json_schema import parse as js_parse, transform as js_transform
    two = ["tuple",
           ["schema", {"registry": {"X": "int"}}, ["ref", "X"]],
           ["schema", {"registry": {"X": "string"}}, ["ref", "X"]]]
    js = js_transform(two)
    assert sorted(js["definitions"]) == ["X", "X.2"]
    back = js_parse(js)
    assert m.validate(back, [1, "a"]) and not m.validate(back, ["a", 1])

    # (6) underscore digit separators reject (parseLong/parseDouble parity
    # with the batch path)
    from malli_ray.transform import string_to_double, string_to_long
    assert string_to_long("1_0") == "1_0"
    assert string_to_double("1_5.5") == "1_5.5"
    assert string_to_long("10") == 10

    # (8) transform/describe/arrow refs are thread-safe (thread-local state)
    import threading
    CONS = ["schema", {"registry": {
        "C": ["maybe", ["tuple", "int", ["ref", "C"]]]}}, "C"]
    errs = []

    def work():
        for _ in range(20):
            out = js_transform(CONS)
            if "definitions" not in out or "C" not in out["definitions"]:
                errs.append(out)

    ts = [threading.Thread(target=work) for _ in range(6)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs


def test_composing_with_and_humanize_reference():
    """composing-with-and-test (error_test.cljc:248-320): map-level :fn
    errors land under malli/error; indexed child errors win over extra
    top-level ones; on scalars all errors collect."""
    from malli_ray.error import humanize

    S = ["and", ["map", ["x", "int?"], ["y", "int?"], ["z", "int?"]],
         ["fn", {"error/message": "(> x y)"}, lambda d: d["x"] > d["y"]]]
    assert humanize(m.explain(S, {"x": 1, "y": 2, "z": "1"})) == \
        {"z": ["should be an int"], "malli/error": ["(> x y)"]}

    S2 = ["and", ["map", ["password", "string?"], ["password2", "string?"]],
          ["fn", {"error/message": "passwords don't match",
                  "error/path": ["password2"]},
           lambda d: d["password"] == d["password2"]]]
    assert humanize(m.explain(S2, {"password": "secret",
                                   "password2": "faarao"})) == \
        {"password2": ["passwords don't match"]}

    S3 = ["and", ["vector", "int?"],
          ["fn", {"error/message": "error1"}, lambda v: v[0] > 0],
          ["fn", {"error/message": "error2"}, lambda v: v[0] > 0]]
    assert humanize(m.explain(S3, [-2, "1"])) == [None, ["should be an int"]]
    assert humanize(m.explain(S3, [-2, 1])) == ["error1", "error2"]

    S4 = ["and",
          ["fn", {"error/message": "should be >= 1"},
           lambda x: not isinstance(x, int) or x >= 1],
          "int?",
          ["fn", {"error/message": "should be >= 2"},
           lambda x: not isinstance(x, int) or x >= 2]]
    assert humanize(m.explain(S4, 0)) == ["should be >= 1", "should be >= 2"]
    assert humanize(m.explain(S4, "kikka")) == ["should be an int"]
    assert humanize(m.explain(S4, 1)) == ["should be >= 2"]
    assert humanize(m.explain(S4, 2)) is None


def test_predicate_message_catalog_matches_reference():
    """Every predicate message in the reference catalog (error.cljc:68-117)
    resolves identically here — generated from the reference source."""
    import re
    from malli_ray.error import error_message

    ref = open("/root/reference/src/malli/error.cljc").read()
    entries = re.findall(
        r"'([a-z?><=\-]+\??)\s+\{:error/message \{:en \"([^\"]+)\"", ref)
    assert len(entries) >= 40
    for name, want in entries:
        exp = m.explain(name, object())
        if exp is None:     # e.g. any?/some? accept anything
            continue
        assert error_message(exp["errors"][0], {}) == want, name


def test_robust_humanize_form_reference():
    """robust-humanize-form (error_test.cljc:670-712): shape-aware error
    accumulation across :and / maps / tuples."""
    from malli_ray.error import humanize

    f = lambda s: ["fn", {"error/message": s}, lambda _: False]
    cases = [
        ("any", "x", None),
        (["and", "any", "any"], "x", None),
        (["and", f("1"), "any"], "x", ["1"]),
        (["and", f("1"), f("1"), "any"], "x", ["1", "1"]),
        (["and", f("1"), f("2")], {"a": 1}, ["1", "2"]),
        (["map", ["x", ["and", ["map", ["y", "any"]], "seq?"]]], 123,
         ["invalid type"]),
        (["map", ["x", ["and", ["map", ["y", "any"]], "seq?"]]], {},
         {"x": ["missing required key"]}),
        (["map", ["x", ["and", ["map", ["y", "any"]], "seq?"]]], {"x": 123},
         {"x": ["invalid type", "should be a seq"]}),
        (["map", ["x", ["and", ["map", ["y", "any"]], "seq?", f("kosh")]]],
         {"x": {}},
         {"x": {"y": ["missing required key"],
                "malli/error": ["should be a seq", "kosh"]}}),
        (["map", ["x", ["and", "seq?", ["map", ["y", "any"]]]]], {"x": 123},
         {"x": ["should be a seq", "invalid type"]}),
        (["map", ["x", ["and", "seq?", ["map", ["y", "any"]]]]], {"x": {}},
         {"x": ["should be a seq"]}),
        (["map", ["x", ["tuple", "int", "int", "int"]]], {"x": []},
         {"x": ["invalid tuple size 0, expected 3"]}),
        (["map", ["x", ["tuple", "int", "int", "int"]]], {"x": [1, "2", "3"]},
         {"x": [None, ["should be an integer"], ["should be an integer"]]}),
        (["map", ["x", ["tuple", "int", ["and", "int", f("fails")], "int"]]],
         {"x": [1, "2", "3"]},
         {"x": [None, ["should be an integer", "fails"],
                ["should be an integer"]]}),
        (["and", ["sequential", "int"], f("1"), f("2")], [1, "2"],
         [None, ["should be an integer"]]),
        (["and", ["sequential", "int"], f("1"), f("2")], [1, 2], ["1", "2"]),
    ]
    for s, v, want in cases:
        assert humanize(m.explain(s, v)) == want, s


def test_multi_humanize_428():
    """multi-humanize-test-428: empty :multi under a map entry."""
    from malli_ray.error import humanize
    assert humanize(m.explain(["map", ["user", ["multi", {"dispatch": "type"}]]],
                              {"user": None})) == \
        {"user": ["invalid dispatch value"]}


def test_review_fixes_round2_close():
    """Regression tests for the round-2-close review findings."""
    from malli_ray import util as mu
    from malli_ray.error import humanize
    from malli_ray.swagger import transform as sw

    # 1: ast() on literal tuple children (no entry misclassification)
    assert m.ast(["enum", (1, 2, 3)]) == {"type": "enum", "value": (1, 2, 3)}
    assert m.ast(["=", (1, 2, 3)]) == {"type": "=", "value": (1, 2, 3)}

    # 2: int error keys assoc into a dict accumulator (value is a map)
    got = humanize(m.explain(["or", ["map", ["x", "int"]],
                              ["map-of", "int", "int"]], {0: "a"}))
    assert got == {"x": ["missing required key"], 0: ["should be an integer"]}

    # 3: duplicate ::m/default entries merge RECURSIVELY (util.cljc:92-101)
    merged = mu.merge(["map", [m.DEFAULT_KEY, ["map", ["x", "int"]]]],
                      ["map", [m.DEFAULT_KEY, ["map", ["y", "int"]]]])
    assert merged.form == \
        ["map", ["malli.core/default", ["map", ["x", "int"], ["y", "int"]]]]

    # 4: bare json-schema property override honored by swagger
    assert sw(["int", {"json-schema": {"type": "custom"}}]) == {"type": "custom"}


def test_review_fixes_round2_close_b():
    """Second review pass over the round-2-close diff: comparator number?
    guard, limits None-max fallthrough, unsatisfiable repeat gen bounds,
    one-shot iterator caveat."""
    import pytest
    from malli_ray.error import humanize
    from malli_ray.generator import generate

    # comparators on non-numbers read "should be a number" (error.cljc:145+)
    assert humanize(m.explain([">", 1], "abc")) == ["should be a number"]
    assert humanize(m.explain(["<=", 1], None)) == ["should be a number"]
    assert humanize(m.explain([">", 1], 0)) == ["should be larger than 1"]
    # limits with max unset and count >= min: no "at most None" nonsense
    out = humanize({"value": [1, 2],
                    "errors": [{"schema": m.schema(["vector", {"min": 1}, "any"]),
                                "type": "malli.core/limits", "value": [1, 2],
                                "in": [], "path": []}]})
    assert "None" not in str(out)
    # unsatisfiable repetition bounds raise SchemaError, not a numpy error
    with pytest.raises(m.SchemaError):
        generate(["+", {"gen/max": 0}, "int"], seed=1)
    with pytest.raises(m.SchemaError):
        generate(["repeat", {"min": 5, "gen/max": 3}, "int"], seed=1)
    # one-shot iterators are consumed by validation (documented divergence)
    gen = (x for x in [1, "a"])
    assert not m.validate(["sequential", "int"], gen)
