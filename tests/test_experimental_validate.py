"""malli.experimental.validate parity.

Mirrors test/malli/experimental/validate_test.cljc:1-107 (simple case,
nested paths, multiple errors, humanize with a custom :errors catalog).
"""

import malli_ray as m
from malli_ray.error import humanize
from malli_ray.experimental_validate import schemas

OPTS = {"registry": {**m.default_registry(), **schemas()}}


def _errs(explanation):
    return [
        {k: e.get(k) for k in ("path", "in", "schema", "value", "type")}
        for e in explanation["errors"]
    ]


def test_simple_case():
    # validate_test.cljc:8-23
    even_schema = m.schema(
        ["validate", lambda x: None if x % 2 == 0 else
         [{"in": [], "type": "not-even", "value": x}]],
        OPTS)
    assert m.validate(even_schema, 4)
    assert m.explain(even_schema, 4) is None
    assert not m.validate(even_schema, 3)
    assert _errs(m.explain(even_schema, 3)) == [
        {"path": [], "in": [], "schema": even_schema, "value": 3,
         "type": "not-even"}]


def test_type_is_fn():
    # reference quirk: (-type [_] :fn), validate.cljc:14
    s = m.schema(["validate", lambda x: None], OPTS)
    assert s.type == "fn"
    assert m.parser_info(s)["identity"] is True


def _both_even(x):
    # validate_test.cljc:25-39
    if not isinstance(x, dict):
        return [{"in": [], "type": "not-map", "value": x}]
    errs = []
    if x.get("a") % 2 != 0:
        errs.append({"in": ["a"], "type": "not-even", "value": x.get("a")})
    if x.get("b") % 2 != 0:
        errs.append({"in": ["b"], "type": "not-even", "value": x.get("b")})
    return errs or None


def test_nested_paths():
    both_even = m.schema(["validate", _both_even], OPTS)
    schema = m.schema(["map", ["value", both_even]])
    assert m.validate(schema, {"value": {"a": 2, "b": 4}})
    assert m.explain(schema, {"value": {"a": 2, "b": 4}}) is None
    assert not m.validate(schema, {"value": [2, 4]})
    assert _errs(m.explain(schema, {"value": [2, 4]})) == [
        {"path": ["value"], "in": ["value"], "schema": both_even,
         "value": [2, 4], "type": "not-map"}]
    assert not m.validate(schema, {"value": {"a": 3, "b": 4}})
    assert _errs(m.explain(schema, {"value": {"a": 3, "b": 4}})) == [
        {"path": ["value"], "in": ["value", "a"], "schema": both_even,
         "value": 3, "type": "not-even"}]
    assert not m.validate(schema, {"value": {"a": 2, "b": 3}})
    assert _errs(m.explain(schema, {"value": {"a": 2, "b": 3}})) == [
        {"path": ["value"], "in": ["value", "b"], "schema": both_even,
         "value": 3, "type": "not-even"}]
    # multiple errors (validate_test.cljc:65-77)
    assert not m.validate(schema, {"value": {"a": 3, "b": 3}})
    assert _errs(m.explain(schema, {"value": {"a": 3, "b": 3}})) == [
        {"path": ["value"], "in": ["value", "a"], "schema": both_even,
         "value": 3, "type": "not-even"},
        {"path": ["value"], "in": ["value", "b"], "schema": both_even,
         "value": 3, "type": "not-even"}]


def test_exception_in_fn():
    # validate.cljc:35-36 — errors from f become one error at the schema's
    # own path, typed from the exception's data["type"] when present
    def boom(x):
        raise m.SchemaError("boom", {"type": "custom-boom"})

    s = m.schema(["validate", boom], OPTS)
    assert not m.validate(s, 1)
    assert _errs(m.explain(s, 1)) == [
        {"path": [], "in": [], "schema": s, "value": 1,
         "type": "custom-boom"}]

    s2 = m.schema(["validate", lambda x: 1 / 0], OPTS)
    assert _errs(m.explain(s2, 7)) == [
        {"path": [], "in": [], "schema": s2, "value": 7, "type": None}]


def test_humanize_custom_errors_catalog():
    # validate_test.cljc:78-107
    two_sub_errors = m.schema(
        ["validate", lambda x: [
            {"in": ["a"], "value": x.get("a"), "type": "error-for-a"},
            {"in": ["b"], "value": x.get("b"), "type": "error-for-b"}]],
        OPTS)
    schema = m.schema(["map", ["value", two_sub_errors]])
    value = {"value": {"a": 1, "b": "x"}}
    assert not m.validate(schema, value)
    assert _errs(m.explain(schema, value)) == [
        {"path": ["value"], "in": ["value", "a"], "schema": two_sub_errors,
         "value": 1, "type": "error-for-a"},
        {"path": ["value"], "in": ["value", "b"], "schema": two_sub_errors,
         "value": "x", "type": "error-for-b"}]
    assert humanize(m.explain(schema, value)) == {
        "value": {"a": ["unknown error"], "b": ["unknown error"]}}
    assert humanize(
        m.explain(schema, value),
        {"errors": {
            "error-for-a": {"error/message": {"en": "a can not be!"}},
            "error-for-b": {"error/fn": {
                "en": lambda err, _: "b can not be " + repr(err["value"])}},
        }}) == {"value": {"a": ["a can not be!"],
                          "b": ["b can not be 'x'"]}}


def test_parse_unparse_simple():
    # -parser = -simple-parser; -unparser = -parser (validate.cljc:37-38)
    even_schema = m.schema(
        ["validate", lambda x: None if x % 2 == 0 else
         [{"in": [], "type": "not-even", "value": x}]],
        OPTS)
    assert m.parse(even_schema, 4) == 4
    assert m.parse(even_schema, 3) is m.INVALID
    assert m.unparse(even_schema, 4) == 4
    assert m.unparse(even_schema, 3) is m.INVALID
