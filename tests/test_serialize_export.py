"""serialize (edn analog), json_schema export/import, generator roundtrip,
lite sugar, :andn, function schemas, time schemas."""

import datetime as dt
import json

import pytest

import malli_ray as m
from malli_ray import Tag, Tags, INVALID
from malli_ray.generator import generate, sample
from malli_ray.json_schema import parse as js_parse, transform as js_transform
from malli_ray.lite import from_lite, optional
from malli_ray.serialize import read_string, write_string


def test_write_read_roundtrip():
    forms = [
        "int",
        ["map", ["x", "boolean"], ["y", {"optional": True}, "int"]],
        ["vector", {"min": 1}, ["int", {"min": 0, "max": 10}]],
        ["enum", "a", "b"],
        ["re", r"^\d+$"],
        ["fn", "x > 2"],
        ["orn", ["pos", "pos-int?"], ["neg", "neg-int?"]],
    ]
    for f in forms:
        s = read_string(write_string(f))
        assert m.form(s) == m.form(m.schema(f))
    # over-the-wire behavior preserved
    s = read_string(write_string(["map", ["x", ["int", {"min": 1}]]]))
    assert m.validate(s, {"x": 2}) and not m.validate(s, {"x": 0})


def test_serialize_rejects_closures():
    with pytest.raises(m.SchemaError):
        write_string(["fn", lambda x: x])


def test_json_schema_export():
    S = ["map", {"closed": True},
         ["id", ["string", {"min": 1}]],
         ["age", {"optional": True}, ["int", {"min": 0, "max": 150}]],
         ["tags", ["set", "keyword"]],
         ["status", ["enum", "a", "b"]],
         ["score", ["maybe", "double"]]]
    js = js_transform(S)
    assert js["type"] == "object"
    assert js["required"] == ["id", "tags", "status", "score"]
    assert js["additionalProperties"] is False
    assert js["properties"]["id"] == {"type": "string", "minLength": 1}
    assert js["properties"]["age"] == {"type": "integer", "minimum": 0, "maximum": 150}
    assert js["properties"]["tags"] == {"type": "array", "items": {"type": "string"},
                                        "uniqueItems": True}
    assert js["properties"]["status"] == {"type": "string", "enum": ["a", "b"]}
    assert js["properties"]["score"] == {"oneOf": [{"type": "number"},
                                                   {"type": "null"}]}
    assert js_transform(["tuple", "int", "string"])["prefixItems"] == [
        {"type": "integer"}, {"type": "string"}]
    assert js_transform([">", 5]) == {"type": "number", "exclusiveMinimum": 5}
    assert js_transform(["re", "^a+$"]) == {"type": "string", "pattern": "^a+$"}


def test_json_schema_parse_roundtrip():
    S = ["map", ["id", ["string", {"min": 1}]],
         ["age", {"optional": True}, ["int", {"min": 0}]],
         ["v", ["vector", "double"]]]
    back = js_parse(js_transform(S))
    assert m.validate(back, {"id": "x", "age": 3, "v": [1.0]})
    assert not m.validate(back, {"id": "", "v": []})
    assert not m.validate(back, {"v": []})  # id required


def test_generator_roundtrip_property():
    forms = [
        "int", ["int", {"min": 5, "max": 9}], "pos-int?", "string",
        ["string", {"min": 2, "max": 4}], "boolean", "uuid", "double",
        ["enum", "a", "b", "c"], ["maybe", "int"],
        ["vector", {"min": 1, "max": 3}, "int"],
        ["set", "int"], ["tuple", "int", "string"],
        ["map", ["x", "int"], ["y", {"optional": True}, "string"]],
        ["map-of", "string", "int"],
        ["or", "int", "string"],
        ["orn", ["i", "int"], ["s", "string"]],
        ["and", ["int", {"min": 0, "max": 100}], [">", 10]],
        ["re", r"^[a-z]{3}\d$"],
        ["fn", "x > 100"],
        [">", 10], ["<=", 5], ["=", "const"],
        ["*", "int?"], ["+", "boolean?"],
        ["cat", "string?", "int?"],
        ["catn", ["a", "string?"], ["b", "int?"]],
        ["repeat", {"min": 2, "max": 4}, "int?"],
        ["multi", {"dispatch": "t"}, ["a", ["map", ["t", ["=", "a"]]]]],
    ]
    for f in forms:
        for seed in (1, 42, 777):
            v = generate(f, seed=seed)
            assert m.validate(f, v), (f, v)


def test_generator_deterministic():
    S = ["map", ["x", "int"], ["v", ["vector", "string"]]]
    assert generate(S, seed=5) == generate(S, seed=5)
    vals = sample(S, n=5, seed=9)
    assert vals == sample(S, n=5, seed=9)
    assert all(m.validate(S, v) for v in vals)


def test_gen_properties():
    assert generate(["int", {"gen/return": 99}]) == 99
    assert generate(["string", {"gen/elements": ["a", "b"]}], seed=1) in ("a", "b")


def test_gen_fmap_schema_minmax():
    import pytest
    from malli_ray.core import SchemaError

    # :gen/fmap wraps the chosen generator (-create, generator.cljc:451-483)
    assert generate(["string", {"gen/fmap": lambda s: s.upper(),
                                "gen/elements": ["kikka"]}]) == "KIKKA"
    # fmap over the default generator; restricted source strings work too
    assert generate(["int", {"gen/fmap": "x * 0 + 7"}]) == 7
    # fmap composes with gen/return
    assert generate(["int", {"gen/return": 3, "gen/fmap": lambda v: v + 1}]) == 4
    # :gen/schema generates from the alternate schema
    v = generate(["string", {"gen/schema": ["int", {"min": 1, "max": 3}]}],
                 seed=11)
    assert v in (1, 2, 3)
    # :gen/min/:gen/max refine :min/:max...
    for seed in (1, 2, 3, 4):
        n = generate(["int", {"min": 0, "gen/min": 5, "max": 100,
                              "gen/max": 7}], seed=seed)
        assert 5 <= n <= 7
        vec = generate(["vector", {"gen/min": 2, "gen/max": 3}, "int"],
                       seed=seed)
        assert 2 <= len(vec) <= 3
    # ...and looser hints fail loudly (-min-max, generator.cljc:77-84)
    with pytest.raises(SchemaError):
        generate(["int", {"min": 5, "gen/min": 1}])
    with pytest.raises(SchemaError):
        generate(["int", {"max": 5, "gen/max": 9}])


def test_gen_double_inf_nan():
    import math
    # defaults never produce inf/NaN
    vals = sample("double", n=200, seed=3)
    assert all(math.isfinite(v) for v in vals)
    # opted in, they appear (and still validate: double? accepts them)
    inf_vals = sample(["double", {"gen/infinite?": True}], n=200, seed=3)
    assert any(math.isinf(v) for v in inf_vals)
    nan_vals = sample(["double", {"gen/NaN?": True}], n=200, seed=4)
    assert any(math.isnan(v) for v in nan_vals)
    # :gen/min/:gen/max refine double bounds too
    bounded = sample(["double", {"min": 0.0, "gen/min": 5.0, "max": 10.0}],
                     n=50, seed=5)
    assert all(5.0 <= v <= 10.0 for v in bounded)


def test_gen_recursive_ref_sized():
    """Recursive refs halve the size budget per deref: generated trees stay
    small/linear and always validate (ConsCell-style schema)."""
    CONS = ["schema", {"registry": {
        "ConsCell": ["maybe", ["tuple", "int", ["ref", "ConsCell"]]]}},
        "ConsCell"]

    def depth(v):
        d = 0
        while v is not None:
            d += 1
            v = v[1]
        return d

    for seed in range(20):
        v = generate(CONS, seed=seed, size=10)
        assert m.validate(CONS, v), v
        assert depth(v) <= 12


def test_gen_wrapper_preserves_size():
    """Non-recursive wrappers ([:schema X] / registry aliases) must NOT
    shrink the size budget — wrapped and unwrapped schemas generate the
    same value at the same seed; only :ref derefs halve (ADVICE r2,
    generator.cljc recursive sizing applies to refs)."""
    INNER = ["vector", {"min": 1}, "int"]
    WRAPPED = ["schema", INNER]
    DOUBLE = ["schema", ["schema", INNER]]
    ALIAS = ["schema", {"registry": {"Inner": INNER}}, "Inner"]
    for seed in range(10):
        base = generate(INNER, seed=seed, size=8)
        assert generate(WRAPPED, seed=seed, size=8) == base
        assert generate(DOUBLE, seed=seed, size=8) == base
        assert generate(ALIAS, seed=seed, size=8) == base


def test_old_parse_format():
    """Tag -> [k v], Tags -> plain map, postwalked (m/old-parse-format,
    src/malli/core.cljc:185-195)."""
    S = ["orn", ["pos", ["int", {"min": 0}]], ["neg", "int"]]
    assert m.old_parse_format(m.parse(S, 5)) == ["pos", 5]
    S2 = ["catn", ["a", "string?"], ["b", "int?"]]
    assert m.old_parse_format(m.parse(S2, ["x", 1])) == {"a": "x", "b": 1}
    nested = m.parse(["vector", S], [1, -2])
    assert m.old_parse_format(nested) == [["pos", 1], ["neg", -2]]
    assert m.old_parse_format({"k": m.tag("a", m.tags({"b": 1}))}) == \
        {"k": ["a", {"b": 1}]}
    assert m.old_parse_format(7) == 7


def test_plantuml_export():
    from malli_ray import plantuml

    ORDER = ["schema", {"registry": {
        "Country": ["map", ["name", ["enum", "FI", "PO"]],
                    ["neighbors", ["vector", ["ref", "Country"]]]],
        "Order": ["map", ["country", ["ref", "Country"]]]}},
        "Order"]
    out = plantuml.transform(ORDER)
    assert out.startswith("@startuml") and out.endswith("@enduml")
    assert "entity Country {" in out and "entity Order {" in out
    assert "Order o-- Country" in out and "Country o-- Country" in out
    assert "entity Schema" not in out   # root is a pointer into the registry
    # anonymous schema gets a single Schema entity
    out2 = plantuml.transform(["map", ["x", "int"]])
    assert "entity Schema {" in out2 and "x 'int'" in out2
    # deterministic
    assert plantuml.transform(ORDER) == out


def test_lite():
    S = from_lite({"name": "string", "age": optional("int"),
                   "addr": {"city": "string"}})
    assert m.validate(S, {"name": "n", "addr": {"city": "c"}})
    assert m.validate(S, {"name": "n", "age": 3, "addr": {"city": "c"}})
    assert not m.validate(S, {"name": "n", "addr": {}})


def test_andn():
    S = ["andn", ["small", ["<", 10]], ["int", "int?"]]
    assert m.validate(S, 5) and not m.validate(S, 11) and not m.validate(S, 5.5)
    p = m.parse(S, 5)
    assert p == Tags({"small": 5, "int": 5})
    assert m.unparse(S, p) == 5


def test_function_schemas():
    S = ["=>", ["cat", "int"], "int"]
    assert m.validate(S, lambda x: x + 1)
    assert not m.validate(S, 42)
    arrow = ["->", "int", "int"]
    sc = m.schema(arrow)
    assert sc.type == "=>" and m.validate(arrow, abs)
    fs = ["function", ["=>", ["cat", "int"], "int"]]
    assert m.validate(fs, abs)
    # generative checking via function-checker option
    def checker(schema_):
        out_valid = schema_.output.validator()
        return lambda f: all(out_valid(f(i)) for i in range(5))
    opts = {"function-checker": checker}
    assert m.validate(S, lambda x: x * 2, opts)
    assert not m.validate(S, lambda x: str(x), opts)


def test_time_schemas():
    now = dt.datetime.now(dt.timezone.utc)
    naive = dt.datetime(2020, 1, 1, 12)
    assert m.validate("time/instant", now) and not m.validate("time/instant", naive)
    assert m.validate("time/local-date-time", naive)
    assert m.validate("time/local-date", dt.date(2020, 1, 1))
    assert not m.validate("time/local-date", naive)
    assert m.validate("time/local-time", dt.time(10, 30))
    assert m.validate("time/duration", dt.timedelta(seconds=5))
    assert m.validate("time/zone-offset", dt.timezone.utc)
    bounded = ["time/local-date", {"min": dt.date(2020, 1, 1),
                                   "max": dt.date(2021, 1, 1)}]
    assert m.validate(bounded, dt.date(2020, 6, 1))
    assert not m.validate(bounded, dt.date(2019, 6, 1))


def test_cli(tmp_path, ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from malli_ray.cli import main

    data = pa.table({"doc_id": ["a", "b", "b", ""],
                     "n": [1, 2, -1, 3]})
    inp = tmp_path / "in"
    inp.mkdir()
    pq.write_table(data, inp / "part-0.parquet")
    schema_file = tmp_path / "schema.json"
    schema_file.write_text(json.dumps(
        ["map", ["doc_id", ["string", {"min": 1}]], ["n", ["int", {"min": 0}]]]))
    out = tmp_path / "out"
    rc = main(["validate", "--input", str(inp), "--schema", str(schema_file),
               "--out", str(out), "--id-column", "doc_id",
               "--uniqueness-key", "doc_id", "--hist", "doc_id"])
    assert rc == 1  # violations present
    meta = json.loads((out / "checkpoint" / "job.json").read_text())
    assert meta["last_report"]["n_rows"] == 4
    assert meta["last_report"]["n_valid"] == 2
    # resume: rerun is a no-op with identical verdicts
    rc2 = main(["validate", "--input", str(inp), "--schema", str(schema_file),
                "--out", str(out), "--id-column", "doc_id",
                "--uniqueness-key", "doc_id"])
    assert rc2 == 1


def test_registry_variants():
    import malli_ray as m
    from malli_ray.core import SimpleSchema
    from malli_ray.registry import (
        LazyRegistry, MutableRegistry, composite_registry, fast_registry,
        registry_of)

    def even_ctor(t, p, c, o):
        return SimpleSchema(t, p, c, o, lambda x: isinstance(x, int) and x % 2 == 0)

    # composite: first match wins, layered over defaults
    reg = registry_of(fast_registry({"even": even_ctor}))
    assert m.validate("even", 4, {"registry": reg})
    assert not m.validate("even", 3, {"registry": reg})
    assert m.validate("int", 1, {"registry": reg})  # defaults still visible

    # mutable: registration visible to later compiles
    mut = MutableRegistry()
    reg2 = registry_of(mut)
    mut.register("odd", lambda t, p, c, o: SimpleSchema(
        t, p, c, o, lambda x: isinstance(x, int) and x % 2 == 1))
    assert m.validate("odd", 3, {"registry": reg2})
    mut.deregister("odd")
    import pytest as _pytest
    with _pytest.raises(m.SchemaError):
        m.schema("odd", {"registry": registry_of(MutableRegistry())})

    # lazy: resolved on demand via provider, alias form allowed
    lazy = LazyRegistry(lambda name: ["int", {"min": 0}] if name == "nat" else None)
    reg3 = registry_of(lazy)
    assert m.validate("nat", 5, {"registry": reg3})
    assert not m.validate("nat", -1, {"registry": reg3})


def test_swagger_export():
    from malli_ray.swagger import transform as sw
    out = sw(["map", ["x", ["maybe", "int"]], ["t", ["tuple", "int", "string"]]])
    assert out["properties"]["x"] == {"type": "integer", "format": "int64",
                                      "x-nullable": True}
    t = out["properties"]["t"]
    assert t == {"type": "array", "items": {},
                 "x-items": [{"type": "integer", "format": "int64"},
                             {"type": "string"}]}
    assert sw(["=", 5]) == {"enum": [5]}
    assert "x-anyOf" in sw(["or", "int", "string"])


def test_json_schema_reference_expectations():
    """json_schema_test.cljc expectations (Python-expressible subset),
    incl. the ::m/default merge semantics (json_schema.cljc:109-124)."""
    from malli_ray.json_schema import transform

    cases = [
        ("pos-int?", {"type": "integer", "minimum": 1}),
        ("pos?", {"type": "number", "exclusiveMinimum": 0}),
        ("float?", {"type": "number"}),
        ([">", 6], {"type": "number", "exclusiveMinimum": 6}),
        ([">=", 6], {"type": "number", "minimum": 6}),
        (["<", 6], {"type": "number", "exclusiveMaximum": 6}),
        (["<=", 6], {"type": "number", "maximum": 6}),
        (["=", "x"], {"const": "x"}),
        (["not", "string?"], {"not": {"type": "string"}}),
        (["and", "int?", "pos-int?"],
         {"allOf": [{"type": "integer"}, {"type": "integer", "minimum": 1}]}),
        (["or", "int?", "string?"],
         {"anyOf": [{"type": "integer"}, {"type": "string"}]}),
        (["orn", ["i", "int?"], ["s", "string?"]],
         {"anyOf": [{"type": "integer"}, {"type": "string"}]}),
        (["map", ["a", "string?"], ["b", {"optional": True}, "string?"],
          ["c", {"optional": False}, "string?"]],
         {"type": "object",
          "properties": {"a": {"type": "string"}, "b": {"type": "string"},
                         "c": {"type": "string"}},
          "required": ["a", "c"]}),
        # ::m/default map-of -> additionalProperties
        (["map", ["x", "int"], ["malli.core/default", ["map-of", "int", "int"]]],
         {"type": "object", "properties": {"x": {"type": "integer"}},
          "required": ["x"], "additionalProperties": {"type": "integer"}}),
        # nested ::m/default maps merge properties/required upward
        (["map", ["x", "int"],
          ["malli.core/default", ["map", ["y", "int"],
            ["malli.core/default", ["map", ["z", "int"],
              ["malli.core/default", ["map-of", "int", "int"]]]]]]],
         {"type": "object",
          "properties": {"x": {"type": "integer"}, "y": {"type": "integer"},
                         "z": {"type": "integer"}},
          "required": ["x", "y", "z"],
          "additionalProperties": {"type": "integer"}}),
    ]
    for s, want in cases:
        assert transform(s) == want, (s, transform(s), want)
    # json-schema/default property on a ::m/default fn entry survives
    got = transform(["map", ["x", "int"],
                     ["malli.core/default",
                      ["fn", {"json-schema/default": {"x": 1}},
                       "isinstance(x, dict)"]]])
    assert got["default"] == {"x": 1} and got["required"] == ["x"]


def test_json_schema_recursive_refs():
    """Recursive :ref schemas export as $ref + definitions and roundtrip
    (reference json_schema_test.cljc:247-335); previously a RecursionError."""
    CONS = ["schema", {"registry": {
        "ConsCell": ["maybe", ["tuple", "int", ["ref", "ConsCell"]]]}},
        "ConsCell"]
    js = js_transform(CONS)
    assert js["definitions"]["ConsCell"]["oneOf"]
    assert {"$ref": "#/definitions/ConsCell"} in \
        js["definitions"]["ConsCell"]["oneOf"][0]["prefixItems"]
    back = js_parse(js)
    assert m.validate(back, [1, [2, None]])
    assert not m.validate(back, [1, [2, "x"]])
    # mutual recursion
    PP = ["schema", {"registry": {
        "Ping": ["maybe", ["tuple", ["=", "ping"], ["ref", "Pong"]]],
        "Pong": ["maybe", ["tuple", ["=", "pong"], ["ref", "Ping"]]]}},
        "Ping"]
    js2 = js_transform(PP)
    assert sorted(js2["definitions"]) == ["Ping", "Pong"]
    assert m.validate(js_parse(js2), ["ping", ["pong", None]])
    # non-recursive schemas unaffected (no definitions key)
    assert "definitions" not in js_transform(["map", ["x", "int"]])


# -- clj-kondo export (mirrors test/malli/clj_kondo_test.cljc) -------------

def test_clj_kondo_transform_golden():
    """Golden outputs from clj_kondo_test.cljc:88-105 (keywords are plain
    strings in the Python DSL, so keyword enums render as :string)."""
    from malli_ray import clj_kondo as ck

    s = ["map", {"registry": {"id": "string?", "price": "double?"}},
         ["id", "id"],
         ["price", {"optional": True}, "price"],
         ["name", "string?"],
         ["description", ["maybe", "string?"]],
         ["tags", {"optional": True}, ["set", "qualified-keyword?"]],
         ["select-keys", ["maybe", ["select-keys",
                                    ["map", ["x", "int?"], ["y", "int?"]],
                                    ["x"]]]],
         ["xyz", "any"],
         ["xyz2", ["maybe", "any"]],
         ["xyz3", ["maybe", "int"]],
         ["tuple-of-ints", ["maybe", ["tuple", "int", "int"]]],
         ["nested", ["merge", ["map", ["nid", "id"]],
                     ["map", ["nprice", "price"]]]],
         ["string-type-enum", ["maybe", ["enum", "b", "c"]]],
         ["any-type-enum", ["enum", 1, "b"]],
         ["z", ["vector", ["map-of", "int?", "int?"]]]]
    assert ck.transform(s) == {
        "op": "keys",
        "opt": {"price": "double", "tags": "set"},
        "req": {"id": "string", "name": "string",
                "description": "nilable/string",
                "select-keys": {"op": "keys", "req": {"x": "int"},
                                "nilable": True},
                "xyz": "any", "xyz2": "any", "xyz3": "nilable/int",
                "tuple-of-ints": "nilable/seqable",
                "nested": {"op": "keys",
                           "req": {"nid": "string", "nprice": "double"}},
                "string-type-enum": "nilable/string",
                "any-type-enum": "any",
                "z": "vector"}}


def test_clj_kondo_function_arities():
    """kikka / siren cases (clj_kondo_test.cljc:33-53, 106-125): fixed and
    varargs arities, :-> sugar, :op :rest tails."""
    from malli_ray import clj_kondo as ck

    kikka = ["function",
             ["=>", ["cat", "int"], ["int", {"min": 0}]],
             ["=>", ["cat", "int", "int", ["*", "int"]], "int"]]
    rows = ck.from_fn({"ns": "my.ns", "name": "kikka", "schema": kikka})
    assert [(r["arity"], r["args"], r["ret"]) for r in rows] == [
        (1, ["int"], "int"),
        ("varargs", ["int", "int", {"op": "rest", "spec": "int"}], "int")]
    assert rows[1]["min-arity"] == 2

    # :-> sugar desugars to the same arity info
    kikka2 = ["->", "int", ["int", {"min": 0}]]
    (row,) = ck.from_fn({"ns": "my.ns", "name": "kikka2", "schema": kikka2})
    assert (row["arity"], row["args"], row["ret"]) == (1, ["int"], "int")

    (row,) = ck.from_fn({"ns": "my.ns", "name": "siren",
                         "schema": ["=>", ["cat", "ifn?", "coll?"], "map?"]})
    assert (row["args"], row["ret"]) == (["ifn", "coll"], "map")

    # issue-1922: seqex INSIDE a :map value is :seqable, not :rest
    (row,) = ck.from_fn({"ns": "n", "name": "f",
                         "schema": ["=>", ["cat", ["map", ["keys", ["+", "keyword"]]]],
                                    "nil"]})
    assert row["args"] == [{"op": "keys", "req": {"keys": "seqable"}}]

    # issue-836: :fn schemas are :any on both sides
    (row,) = ck.from_fn({"ns": "n", "name": "g",
                         "schema": ["=>", ["cat", "int?", ["fn", "lambda x: True"], "int?"],
                                    ["fn", "lambda x: True"]]})
    assert row["args"] == ["int", "any", "int"] and row["ret"] == "any"


def test_clj_kondo_linter_config_and_edn(tmp_path):
    from malli_ray import clj_kondo as ck

    ck.register_function_schema("app.core", "plus",
                                ["=>", ["cat", "int", "int"], "int"])
    try:
        rows = ck.collect("app.core")
        cfg = ck.linter_config(rows)
        ns = cfg["linters"]["type-mismatch"]["namespaces"]
        assert ns["app.core"]["plus"]["arities"][2] == {
            "args": ["int", "int"], "ret": "int"}
        edn = ck.write_string(cfg)
        # symbols bare, keywords prefixed, int arity key stays an int
        assert "app.core {plus" in edn
        assert ":args [:int :int]" in edn and "{2 {" in edn
        path = ck.save(cfg, str(tmp_path))
        assert path.endswith("config.edn")
        assert open(path).read().strip() == edn
    finally:
        ck._FUNCTION_SCHEMAS.clear()


def test_regex_min_max():
    """-regex-min-max parity (core.cljc:297-303, 2968-3024)."""
    import pytest
    from malli_ray import core
    from malli_ray.regex_engine import regex_min_max

    MS = "malli.core/schema"
    # the reference's own table, core_test.cljc:2448-2483 (-regex-min-max-
    # size-test), minus the :registry-sugar entry forms our DSL spells
    # explicitly
    cases = [
        ("int?", (1, 1)),
        (["cat"], (0, 0)),
        (["cat", "int?"], (1, 1)),
        (["cat", "int?", ["cat"]], (1, 1)),
        (["cat", "int?", ["cat", "string?", "int?"]], (3, 3)),
        (["schema", ["cat", "int?", ["cat", "string?", "int?"]]], (3, 3)),
        ([MS, ["cat", "int?", ["cat", "string?", "int?"]]], (3, 3)),
        (["cat", "int?", ["schema", ["cat", "string?", "int?"]]], (2, 2)),
        (["cat", "int?", [MS, ["cat", "string?", "int?"]]], (3, 3)),
        (["cat", "int?", ["schema", ["catn", ["s", "string?"], ["i", "int?"]]]], (2, 2)),
        (["catn"], (0, 0)),
        (["catn", ["n", "int?"]], (1, 1)),
        (["catn", ["n", "int?"], ["named", ["cat"]]], (1, 1)),
        (["catn", ["n", "int?"], ["named", ["cat", "string?", "int?"]]], (3, 3)),
        (["alt", "int?"], (1, 1)),
        (["alt", "int?", ["cat"]], (0, 1)),
        (["altn", ["n", "int?"]], (1, 1)),
        (["altn", ["n", "int?"], ["empty", ["cat"]]], (0, 1)),
        (["*", "int?"], (0, None)),
        (["?", "int?"], (0, 1)),
        (["?", ["cat", "int?", "int?"]], (0, 2)),
        (["?", ["schema", ["cat", "int?", "int?"]]], (0, 1)),
        (["?", [MS, ["cat", "int?", "int?"]]], (0, 2)),
        (["+", ["cat", "string?", "int?"]], (2, None)),
        (["+", ["schema", ["cat", "string?", "int?"]]], (1, None)),
        (["+", [MS, ["cat", "string?", "int?"]]], (2, None)),
        (["+", ["?", "int?"]], (0, None)),
        (["repeat", {"min": 5, "max": 15}, ["cat", "string?", "int?"]], (10, 30)),
        (["repeat", {"min": 5, "max": 15}, ["*", "int?"]], (0, None)),
        (["cat", {"registry": {"named": ["cat", "string?", "int?"]}}, "named"],
         (2, 2)),
        (["cat", {"registry": {"named": ["cat", "string?", "int?"]}},
          ["repeat", {"min": 5, "max": 15}, "named"]], (10, 30)),
        (["cat", {"registry": {"named": ["cat", "string?", "int?"]}},
          ["repeat", {"min": 5, "max": 15}, ["schema", "named"]]], (5, 15)),
    ]
    for form, want in cases:
        assert regex_min_max(core.schema(form)) == want, form

    with pytest.raises(core.SchemaError):
        regex_min_max(core.schema(
            ["cat", ["ref", "X"]],
            {"registry": {**core.default_registry(), "X": "int"}}))


def test_json_schema_reference_expectations():
    """json_schema_test.cljc:22-146 expectations table (Python-expressible
    slice; keywords/symbols are strings in this DSL)."""
    cases = [
        ("pos-int?", {"type": "integer", "minimum": 1}),
        ("pos?", {"type": "number", "exclusiveMinimum": 0}),
        ("float?", {"type": "number"}),
        ([">", 6], {"type": "number", "exclusiveMinimum": 6}),
        ([">=", 6], {"type": "number", "minimum": 6}),
        (["<", 6], {"type": "number", "exclusiveMaximum": 6}),
        (["<=", 6], {"type": "number", "maximum": 6}),
        (["=", "x"], {"const": "x"}),
        (["not", "string?"], {"not": {"type": "string"}}),
        (["and", "int?", "pos-int?"],
         {"allOf": [{"type": "integer"}, {"type": "integer", "minimum": 1}]}),
        (["or", "int?", "string?"],
         {"anyOf": [{"type": "integer"}, {"type": "string"}]}),
        (["orn", ["i", "int?"], ["s", "string?"]],
         {"anyOf": [{"type": "integer"}, {"type": "string"}]}),
        (["map", ["a", "string?"], ["b", {"optional": True}, "string?"],
          ["c", {"optional": False}, "string?"]],
         {"type": "object",
          "properties": {"a": {"type": "string"}, "b": {"type": "string"},
                         "c": {"type": "string"}},
          "required": ["a", "c"]}),
        (["map", ["x", "int"], ["malli.core/default", ["map-of", "int", "int"]]],
         {"type": "object", "properties": {"x": {"type": "integer"}},
          "required": ["x"], "additionalProperties": {"type": "integer"}}),
        (["map-of", "string?", "string?"],
         {"type": "object", "additionalProperties": {"type": "string"}}),
        (["vector", "string?"], {"type": "array", "items": {"type": "string"}}),
        (["sequential", "string?"], {"type": "array", "items": {"type": "string"}}),
        (["set", "string?"],
         {"type": "array", "items": {"type": "string"}, "uniqueItems": True}),
        (["enum", 1, 2, "3"], {"enum": [1, 2, "3"]}),
        (["enum", 1, 2, 3], {"type": "integer", "enum": [1, 2, 3]}),
        (["enum", 1.1, 2.2, 3.3], {"type": "number", "enum": [1.1, 2.2, 3.3]}),
        (["enum", "kikka", "kukka"], {"type": "string", "enum": ["kikka", "kukka"]}),
        (["maybe", "string?"], {"oneOf": [{"type": "string"}, {"type": "null"}]}),
        (["tuple", "string?", "string?"],
         {"type": "array", "prefixItems": [{"type": "string"},
                                           {"type": "string"}], "items": False}),
        (["re", "^[a-z]+$"], {"type": "string", "pattern": "^[a-z]+$"}),
        ("any", {}),
        ("some", {}),
        ("nil", {"type": "null"}),
        (["string", {"min": 1, "max": 4}],
         {"type": "string", "minLength": 1, "maxLength": 4}),
        (["int", {"min": 1, "max": 4}],
         {"type": "integer", "minimum": 1, "maximum": 4}),
        (["double", {"min": 1, "max": 4}],
         {"type": "number", "minimum": 1, "maximum": 4}),
        ("keyword", {"type": "string"}),
        ("qualified-keyword", {"type": "string"}),
        ("symbol", {"type": "string"}),
        ("uuid", {"type": "string", "format": "uuid"}),
        (["=>", ["cat"], "int?"], {}),
        ("ifn?", {}),
        ("integer?", {"type": "integer"}),
        ("rational?", {"type": "number"}),
    ]
    for s, want in cases:
        assert js_transform(s) == want, s


def test_swagger_reference_expectations():
    """swagger_test.cljc:8-134 expectations (Python-expressible slice):
    number formats, x-allOf/x-anyOf over a non-null base, x-nullable,
    x-not, x-items tuples, :swagger property overrides."""
    import pytest
    from malli_ray.swagger import transform as sw

    cases = [
        ("pos-int?", {"type": "integer", "format": "int64", "minimum": 1}),
        ("float?", {"type": "number", "format": "float"}),
        ([">", 6], {"type": "number", "exclusiveMinimum": 6}),
        ([">=", 6], {"type": "number", "minimum": 6}),
        (["<", 6], {"type": "number", "exclusiveMaximum": 6}),
        (["<=", 6], {"type": "number", "maximum": 6}),
        (["not", "string?"], {"x-not": {"type": "string"}}),
        (["and", "int?", "pos-int?"],
         {"type": "integer", "format": "int64",
          "x-allOf": [{"type": "integer", "format": "int64"},
                      {"type": "integer", "format": "int64", "minimum": 1}]}),
        (["or", "int?", "string?"],
         {"type": "integer", "format": "int64",
          "x-anyOf": [{"type": "integer", "format": "int64"},
                      {"type": "string"}]}),
        (["or", "nil", "int?"],
         {"type": "integer", "format": "int64",
          "x-anyOf": [{"type": "null"},
                      {"type": "integer", "format": "int64"}]}),
        (["multi", {"dispatch": "whatever"}, ["a", "int?"], ["b", "nil"]],
         {"type": "integer", "format": "int64",
          "x-anyOf": [{"type": "integer", "format": "int64"},
                      {"type": "null"}]}),
        (["map-of", "string?", "string?"],
         {"type": "object", "additionalProperties": {"type": "string"}}),
        (["vector", "string?"], {"type": "array", "items": {"type": "string"}}),
        (["set", "string?"],
         {"type": "array", "items": {"type": "string"}, "uniqueItems": True}),
        (["enum", 1, 2, "3"], {"enum": [1, 2, "3"]}),
        (["enum", 1, 2, 3], {"type": "integer", "enum": [1, 2, 3]}),
        (["maybe", "string?"], {"type": "string", "x-nullable": True}),
        (["tuple", "string?", "string?"],
         {"type": "array", "items": {},
          "x-items": [{"type": "string"}, {"type": "string"}]}),
        (["string", {"min": 1, "max": 4}],
         {"type": "string", "minLength": 1, "maxLength": 4}),
        (["int", {"min": 1, "max": 4}],
         {"type": "integer", "format": "int64", "minimum": 1, "maximum": 4}),
        (["double", {"min": 1, "max": 4}],
         {"type": "number", "format": "double", "minimum": 1, "maximum": 4}),
        ("keyword", {"type": "string"}),
        ("uuid", {"type": "string", "format": "uuid"}),
        ("integer?", {"type": "integer", "format": "int32"}),
        ("ratio?", {"type": "number"}),
        # full/prefixed property overrides (swagger_test "full override")
        (["string", {"swagger": {"type": "file"}}], {"type": "file"}),
        (["string", {"swagger/format": "byte"}],
         {"type": "string", "format": "byte"}),
    ]
    for s, want in cases:
        assert sw(s) == want, s
    # top-level null has no non-null base
    with pytest.raises(m.SchemaError):
        sw("nil")
    with pytest.raises(m.SchemaError):
        sw(["and", "nil"])


def test_ast_reference_shape():
    """ast-test (core_test.cljc:2949-3009): reference AST shape — child /
    keys+order / value / values / key+value, top-level registry of ASTs."""
    H = ["ref", {"registry": {
        "ConsCell": ["maybe", ["tuple", "int", ["ref", "ConsCell"]]]}},
        "ConsCell"]
    assert m.ast(H) == {
        "type": "ref", "value": "ConsCell",
        "registry": {"ConsCell": {
            "type": "maybe",
            "child": {"type": "tuple",
                      "children": [{"type": "int"},
                                   {"type": "ref", "value": "ConsCell"}]}}}}
    back = m.from_ast(m.ast(H))
    assert m.validate(back, [1, [2, None]])
    assert not m.validate(back, [1, [2, "x"]])

    S = ["map", ["x", "boolean?"], ["y", {"optional": True}, "int?"]]
    assert m.ast(S) == {
        "type": "map",
        "keys": {"x": {"order": 0, "value": {"type": "boolean?"}},
                 "y": {"order": 1, "value": {"type": "int?"},
                       "properties": {"optional": True}}}}
    assert m.ast(["map-of", "int?", "string?"]) == {
        "type": "map-of", "key": {"type": "int?"}, "value": {"type": "string?"}}
    assert m.ast(["enum", 1, 2]) == {"type": "enum", "values": [1, 2]}
    assert m.ast([">", 6]) == {"type": ">", "value": 6}
    assert m.ast(["int", {"min": 1, "max": 4}]) == \
        {"type": "int", "properties": {"min": 1, "max": 4}}
    # order survives a JSON trip even for adversarial key orderings
    import json
    a = m.ast(["map", ["b", "int"], ["a", "int"]])
    back2 = m.from_ast(json.loads(json.dumps(a)))
    from malli_ray import util as mu
    assert mu.keys(back2) == ["b", "a"]
    for f in (["vector", {"min": 1}, "int"], ["tuple", "int", "string"],
              ["orn", ["a", "int"], ["b", "string"]],
              ["catn", ["x", "int?"], ["y", "string?"]],
              ["multi", {"dispatch": "t"}, ["a", ["map", ["t", ["=", "a"]]]]]):
        assert m.form(m.from_ast(m.ast(f))) == m.form(m.schema(f)), f


def test_gen_seqex_min_max_reference():
    """min-max-test (generator_test.cljc:299-346): :min/:max and
    :gen/min/:gen/max bound generated :+/:*/:repeat lengths; :+ keeps its
    structural minimum of 1."""
    for s in [["+", {"min": 10, "max": 20}, "int"],
              ["*", {"min": 10, "max": 20}, "int"],
              ["+", {"gen/min": 10, "gen/max": 20}, "int"],
              ["*", {"gen/min": 10, "max": 20}, "int"],
              ["repeat", {"min": 10, "max": 20}, "int"],
              ["vector", {"min": 10, "max": 20}, "int?"],
              ["set", {"min": 10, "max": 20}, "int?"],
              ["string", {"min": 10, "max": 20}],
              ["vector", {"min": 1, "gen/min": 10, "max": 100, "gen/max": 20},
               "int?"]]:
        vals = sample(s, n=50, seed=3)
        assert all(10 <= len(v) <= 20 for v in vals), s
    assert all(len(v) >= 1 for v in sample(["+", "int"], n=50, seed=1))


def test_infinite_generator_reference():
    """infinite-generator-test (generator_test.cljc:712-724): :never-
    equivalent recursive schemas throw; [:maybe :never] generates nil."""
    with pytest.raises(Exception):
        generate(["schema", {"registry": {"a": ["ref", "a"]}},
                  ["ref", "a"]], seed=1)
    with pytest.raises(Exception):
        generate(["schema", {"registry": {"a": ["tuple", ["ref", "a"]]}},
                  ["ref", "a"]], seed=1)
    vals = sample(["schema", {"registry": {"a": ["maybe", ["ref", "a"]]}},
                   ["ref", "a"]], n=30, seed=2)
    assert all(v is None for v in vals)


def test_time_schemas_reference_table():
    """experimental/time_test.cljc basic-types + min-max (Python datetime
    analogs; zone ids are tzinfo OBJECTS, never their string names)."""
    tz = dt.timezone.utc
    ok = [("time/duration", dt.timedelta(milliseconds=10)),
          ("time/local-date", dt.date(2020, 1, 1)),
          ("time/local-time", dt.time(12, 0)),
          ("time/offset-time", dt.time(12, 0, tzinfo=tz)),
          ("time/local-date-time", dt.datetime(2020, 1, 1, 12)),
          ("time/instant", dt.datetime(2022, 12, 18, 12, tzinfo=tz)),
          ("time/zoned-date-time", dt.datetime(2022, 12, 18, 12, tzinfo=tz)),
          ("time/offset-date-time", dt.datetime(2022, 12, 18, 12, tzinfo=tz)),
          ("time/zone-id", tz),
          ("time/zone-offset", dt.timezone(dt.timedelta(hours=-6)))]
    for t, v in ok:
        assert m.validate(t, v), t
        assert not m.validate(t, "2020-01-01"), t
    # bounds compare the values themselves
    S = ["time/duration", {"min": dt.timedelta(milliseconds=9),
                           "max": dt.timedelta(milliseconds=10)}]
    assert m.validate(S, dt.timedelta(milliseconds=10))
    assert not m.validate(S, dt.timedelta(milliseconds=12))
    S2 = ["time/local-date", {"min": dt.date(2020, 1, 1)}]
    assert m.validate(S2, dt.date(2020, 6, 1))
    assert not m.validate(S2, dt.date(2019, 6, 1))
    # offset-less values are not instants; naive values are not zoned
    assert not m.validate("time/instant", dt.datetime(2022, 1, 1))
    assert not m.validate("time/local-date-time",
                          dt.datetime(2022, 1, 1, tzinfo=tz))


def test_cli_corpus_prep(tmp_path, ray_session, capsys):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from malli_ray.cli import main

    boiler = "accept cookies please"
    docs = pa.table({
        "doc_id": list(range(8)),
        "source": ["a"] * 6 + ["b"] * 2,
        "n_chars": [30] * 7 + [100_000],      # one absurd-length outlier
        "text": [f"{boiler}\nunique words here number {i}" for i in range(6)]
        + ["the quick brown fox jumps over the lazy dog",
           "plain other text"]})
    inp = tmp_path / "in"
    inp.mkdir()
    pq.write_table(docs, inp / "part-0.parquet")
    probes = tmp_path / "probes"
    probes.mkdir()
    pq.write_table(
        pa.table({"doc_id": [99],
                  "text": ["quick brown fox jumps over"]}),
        probes / "p.parquet")
    out = tmp_path / "out"
    rc = main(["corpus-prep", "--input", str(inp), "--out", str(out),
               "--drop-frequent-lines", "3",
               "--decontaminate", str(probes / "*.parquet"), "--ngram", "5",
               "--chunk", "12:6", "--num-cpus", "4"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["rows_in"] == 8
    assert rep["stages"] == ["drop_frequent_lines(min_count=3)",
                             "decontaminate(k=5)", "chunk(12:6)"]
    chunks = pq.read_table(sorted((out / "data").glob("*.parquet")))
    ids = set(chunks.column("doc_id").to_pylist())
    assert 6 not in ids                     # contaminated doc dropped
    texts = chunks.filter(
        pa.compute.equal(chunks.column("doc_id"), 0)
    ).column("chunk_text").to_pylist()
    assert boiler not in "".join(texts)     # boilerplate line scrubbed
    assert rep["rows_out"] == chunks.num_rows


def test_cli_corpus_prep_session5_stages(tmp_path, ray_session, capsys):
    """--url-dedup, --top-fraction, --upsample and --pack compose: URL
    canonical dedup first, then per-source top-half selection, a 2x 'a'
    mixture, and concat-and-cut packing into 10-token blocks."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from malli_ray.cli import main

    docs = pa.table({
        "doc_id": list(range(10)),
        "source": ["a"] * 6 + ["b"] * 4,
        "n_tok": [7, 3, 9, 5, 11, 2, 8, 4, 6, 10],
        "url": [f"HTTPS://WWW.X{i % 8}.COM/p/" for i in range(10)],
        "text": [f"doc number {i}" for i in range(10)]})
    inp = tmp_path / "in"
    inp.mkdir()
    pq.write_table(docs, inp / "part-0.parquet")
    out = tmp_path / "out"
    rc = main(["corpus-prep", "--input", str(inp), "--out", str(out),
               "--url-dedup", "url",
               "--top-fraction", "source:n_tok:0.5",
               "--upsample", "source:a=2",
               "--pack", "source:n_tok:10", "--num-cpus", "4"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["stages"] == ["url_dedup(url)",
                             "top_fraction(source:n_tok:0.5)",
                             "upsample(source:a=2)",
                             "pack(source:n_tok:10)"]
    spans = pq.read_table(sorted((out / "data").glob("*.parquet")))
    # urls collide mod 8 -> docs 8, 9 drop; per-source top half by n_tok:
    # a keeps ceil(6*0.5)=3 of {0..5}, b keeps ceil(2*0.5)=1 of {6, 7};
    # upsample duplicates every a row
    assert set(spans.column("doc_id").to_pylist()) == {0, 2, 4, 6}
    # doc 4 (n_tok=11) appears twice (epochs), each copy tiling 11 tokens
    d4 = spans.filter(pa.compute.equal(spans.column("doc_id"), 4))
    covered = sum((e - s) for s, e in zip(
        d4.column("tok_start").to_pylist(),
        d4.column("tok_end").to_pylist()))
    assert covered == 22
    assert rep["rows_out"] == spans.num_rows


def test_cli_corpus_prep_normalize_bloom_temperature(tmp_path, ray_session,
                                                     capsys):
    """The late-r3 CLI flags: --normalize canonicalizes before dedup,
    --seen-bloom drops previously-ingested texts, --temperature switches
    rebalance to count^alpha shares."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd
    from malli_ray.cli import main
    from malli_ray.stages.dedup import build_bloom

    docs = pa.table({
        "doc_id": list(range(40)),
        "source": ["a"] * 36 + ["b"] * 4,
        "text": [f"  SHARED Doc {i % 10}\t\ttail  " if i < 20
                 else f"fresh doc {i}" for i in range(40)]})
    inp = tmp_path / "in"
    inp.mkdir()
    pq.write_table(docs, inp / "part-0.parquet")
    # "previous run" ingested the normalized shared docs 0-4
    seen = rd.from_arrow(pa.table(
        {"text": [f"shared doc {i} tail" for i in range(5)]}))
    bloom_path = tmp_path / "seen.bloom"
    build_bloom(seen, "text", capacity=100, fp_rate=1e-5).save(
        str(bloom_path))
    out = tmp_path / "out"
    rc = main(["corpus-prep", "--input", str(inp), "--out", str(out),
               "--normalize", "--seen-bloom", str(bloom_path),
               "--dedup", "exact", "--rebalance", "source",
               "--temperature", "0.5", "--num-cpus", "4"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["stages"] == ["normalize", f"seen_bloom({bloom_path})",
                             "dedup_exact", "rebalance(source,alpha=0.5)"]
    kept = pq.read_table(sorted((out / "data").glob("*.parquet")))
    texts = kept.column("text").to_pylist()
    # normalization happened and the seen shared docs 0-4 are gone
    assert all(t == t.lower() and "\t" not in t for t in texts)
    assert not any(t.startswith("shared doc 0") or
                   t.startswith("shared doc 4") for t in texts)
    # surviving shared docs deduped to one copy each, drawn from 5-9
    # (temperature rebalance may then downsample group "a" further)
    shared = sorted(t for t in texts if t.startswith("shared"))
    assert len(shared) == len(set(shared))
    assert set(shared) <= {f"shared doc {i} tail" for i in range(5, 10)}
    assert len(texts) == len(set(texts))     # dedup held overall


def test_cli_corpus_prep_c4_domain_dedup_lines(tmp_path, ray_session,
                                               capsys):
    """The session-3 CLI flags: --dedup-lines scrubs in-doc repeats,
    --domain-blocklist drops pages with blocked URL hosts, --c4 keeps
    terminal-punctuated lines and drops thin/brace/lorem pages."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from malli_ray.cli import main

    five = "\n".join(f"this is sentence number {i}." for i in range(5))
    docs = pa.table({
        "doc_id": list(range(6)),
        "text": [
            five,                                         # clean
            five + "\n" + five.split("\n")[0],            # in-doc dup line
            five + "\nsee https://ads.spam.example/x now",  # blocked host
            "too short. really.",                         # < 4 sentences
            five + "\nvar cfg = { a: 1 };",               # brace page
            five + "\nplain line without punctuation",    # line dropped
        ]})
    inp = tmp_path / "in"
    inp.mkdir()
    pq.write_table(docs, inp / "part-0.parquet")
    out = tmp_path / "out"
    rc = main(["corpus-prep", "--input", str(inp), "--out", str(out),
               "--dedup-lines", "--domain-blocklist", "spam.example",
               "--c4", "4", "--num-cpus", "4"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["stages"] == ["dedup_lines",
                             "domain_blocklist(1 domains)",
                             "c4(min_sentences=4)"]
    kept = pq.read_table(sorted((out / "data").glob("*.parquet")))
    by_id = {r["doc_id"]: r["text"] for r in kept.to_pylist()}
    assert sorted(by_id) == [0, 1, 5]
    assert by_id[1] == five            # dup line scrubbed BEFORE c4
    assert by_id[5] == five            # unpunctuated line dropped by c4
    assert rep["rows_in"] == 6 and rep["rows_out"] == 3


def test_cli_corpus_prep_lang_filter(tmp_path, ray_session, capsys):
    """--lang keeps only docs the language-ID heuristic assigns CODE."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from malli_ray.cli import main

    docs = pa.table({
        "doc_id": [0, 1, 2],
        "text": ["the cat and the dog is with it for now",
                 "el perro y la casa de los campos es una",
                 "der hund und die katze ist nicht ein mit"]})
    inp = tmp_path / "in"
    inp.mkdir()
    pq.write_table(docs, inp / "part-0.parquet")
    out = tmp_path / "out"
    rc = main(["corpus-prep", "--input", str(inp), "--out", str(out),
               "--lang", "es", "--num-cpus", "4"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["stages"] == ["lang(es)"]
    kept = pq.read_table(sorted((out / "data").glob("*.parquet")))
    assert kept.column("doc_id").to_pylist() == [1]
    assert "lang_pred" not in kept.column_names


def test_cli_corpus_prep_split_shards(tmp_path, ray_session, capsys):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from malli_ray.cli import main
    from malli_ray.stages.sampling import KNUTH_MULT, split_thresholds

    docs = pa.table({
        "doc_id": list(range(40)),
        "source": ["a"] * 40,
        "text": [f"doc number {i}" for i in range(40)]})
    inp = tmp_path / "in"
    inp.mkdir()
    pq.write_table(docs, inp / "part-0.parquet")
    out = tmp_path / "out"
    rc = main(["corpus-prep", "--input", str(inp), "--out", str(out),
               "--split", "train:0.8,test:0.2", "--shards", "2",
               "--num-cpus", "4"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["stages"] == ["split(train:0.8,test:0.2)", "shards(2)"]
    assert rep["rows_out"] == 40
    # hive layout split=<label>/shard=<k>/
    labels = sorted(p.name for p in (out / "data").iterdir())
    assert labels and all(l.startswith("split=") for l in labels)
    got = pq.read_table(str(out / "data")).to_pylist()
    th = split_thresholds({"train": 0.8, "test": 0.2})
    for r in got:
        h = ((r["doc_id"] % 2**32) * KNUTH_MULT) % 2**32
        want = next(lab for lab, t in th if h < t)
        assert r["split"] == want and int(r["shard"]) == h % 2


def test_cli_corpus_prep_quality_filters(tmp_path, ray_session, capsys):
    """--gopher drops rule-failing docs; --compression drops texts whose
    DEFLATE ratio falls outside the band."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from malli_ray.cli import main

    good = "the quick brown fox jumps over the lazy dog again and again "
    docs = pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": [good * 3,                     # passes both
                 "too short",                  # gopher: n_words < min
                 "the abc " * 300,             # compression: too repetitive
                                               # (passes gopher: mean word
                                               # len 3.0, stopword present)
                 "# " * 50 + "the end"]})      # gopher: symbol soup
    inp = tmp_path / "in"
    inp.mkdir()
    pq.write_table(docs, inp / "part-0.parquet")
    out = tmp_path / "out"
    rc = main(["corpus-prep", "--input", str(inp), "--out", str(out),
               "--gopher", "10", "--compression", "0.05:0.95",
               "--num-cpus", "4"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["stages"] == ["gopher(min_words=10)",
                             "compression(0.05:0.95)"]
    kept = pq.read_table(sorted((out / "data").glob("*.parquet")))
    assert kept.column("doc_id").to_pylist() == [0]


def test_cli_corpus_prep_entropy_lm_filters(tmp_path, ray_session, capsys):
    """--min-entropy drops low-entropy (repetitive) docs; --lm-logprob
    keeps docs inside the self-scored bigram-LM band."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from malli_ray.cli import main

    fluent = ("the quick brown fox jumps over the lazy dog and then "
              "the small red hen walks across the wide green field ")
    docs = pa.table({
        "doc_id": [0, 1, 2],
        "text": [fluent * 2,
                 "spam spam spam spam spam spam spam spam",  # H ~ 0
                 fluent + "variety words appear here too now then"]})
    inp = tmp_path / "in"
    inp.mkdir()
    pq.write_table(docs, inp / "part-0.parquet")
    out = tmp_path / "out"
    rc = main(["corpus-prep", "--input", str(inp), "--out", str(out),
               "--min-entropy", "1.0", "--lm-logprob=-50.0:0.0",
               "--num-cpus", "4"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["stages"] == ["min_entropy(1.0)", "lm_logprob(-50.0:0.0)"]
    kept = pq.read_table(sorted((out / "data").glob("*.parquet")))
    assert sorted(kept.column("doc_id").to_pylist()) == [0, 2]
    assert kept.column_names == ["doc_id", "text"]  # signals dropped


def test_cli_url_dedup_null_canonical_survives(tmp_path, ray_session,
                                               capsys):
    """Rows whose URL fails to canonicalize (relative/malformed -> null
    canonical_url) must ALL survive --url-dedup — SQL null-key semantics.
    Regression: Series.hash maps every null to the same value, so hashing
    the null-keyed rows used to collapse them into ONE dedup group."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from malli_ray.cli import main

    docs = pa.table({
        "doc_id": list(range(7)),
        "source": ["a"] * 7,
        "n_tok": [5] * 7,
        "url": ["https://x.com/p",        # dup pair -> keep doc 0
                "HTTPS://WWW.X.COM/p/",
                "not a url",               # null canonical
                "/relative/path",          # null canonical
                "",                        # null canonical
                "mailto:someone",          # null canonical
                "https://y.com/q"],        # unique -> survives
        "text": [f"doc {i}" for i in range(7)]})
    inp = tmp_path / "in"
    inp.mkdir()
    pq.write_table(docs, inp / "part-0.parquet")
    out = tmp_path / "out"
    rc = main(["corpus-prep", "--input", str(inp), "--out", str(out),
               "--url-dedup", "url", "--num-cpus", "4"])
    assert rc == 0
    got = pq.read_table(sorted((out / "data").glob("*.parquet")))
    assert sorted(got.column("doc_id").to_pylist()) == [0, 2, 3, 4, 5, 6]


def test_cli_corpus_prep_checkpoint_dir(tmp_path, ray_session, capsys):
    """--checkpoint-dir swaps the pre-stats materialize for a resumable
    parquet checkpoint: the first run writes <tag>-<digest>/ + _SUCCESS,
    a re-run REUSES it (marker mtime unchanged) with identical output,
    and a changed flag set changes the digest (no stale reuse)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from malli_ray.cli import main

    docs = pa.table({
        "doc_id": list(range(12)),
        "source": ["a"] * 8 + ["b"] * 4,
        "text": [f"doc number {i} words here" for i in range(12)]})
    inp = tmp_path / "in"
    inp.mkdir()
    pq.write_table(docs, inp / "part-0.parquet")
    ckpt = tmp_path / "ckpt"

    def run(out_name):
        out = tmp_path / out_name
        rc = main(["corpus-prep", "--input", str(inp), "--out", str(out),
                   "--normalize", "--rebalance", "source",
                   "--checkpoint-dir", str(ckpt), "--num-cpus", "4"])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        t = pq.read_table(sorted((out / "data").glob("*.parquet")))
        return rep, t

    rep1, t1 = run("out1")
    markers = sorted(ckpt.glob("pre-stats-*._SUCCESS"))
    assert len(markers) == 1
    mtime = markers[0].stat().st_mtime_ns
    ckpt_rows = pq.read_table(
        sorted(ckpt.glob("pre-stats-*/**/*.parquet"))).num_rows
    assert ckpt_rows == 12                      # pre-rebalance snapshot

    rep2, t2 = run("out2")                      # resumes from checkpoint
    assert markers[0].stat().st_mtime_ns == mtime
    assert rep2["rows_out"] == rep1["rows_out"]
    assert sorted(t2.column("doc_id").to_pylist()) \
        == sorted(t1.column("doc_id").to_pylist())

    # a different stage chain must key a DIFFERENT checkpoint
    out3 = tmp_path / "out3"
    rc = main(["corpus-prep", "--input", str(inp), "--out", str(out3),
               "--rebalance", "source",
               "--checkpoint-dir", str(ckpt), "--num-cpus", "4"])
    assert rc == 0
    capsys.readouterr()
    assert len(sorted(ckpt.glob("pre-stats-*._SUCCESS"))) == 2


def test_cli_corpus_prep_remove_dup_spans(tmp_path, ray_session, capsys):
    """--remove-dup-spans K: the Lee-2021 substring scrub inside the
    corpus-prep chain — a 6-word phrase repeated across docs survives
    only in its first (id, pos) occurrence, every other column
    (source, n_chars) passes through the doc-keyed exchange."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from malli_ray.cli import main

    phrase = "alpha beta gamma delta epsilon zeta"
    docs = pa.table({
        "doc_id": list(range(4)),
        "source": ["a", "b", "a", "b"],
        "n_chars": [50, 60, 70, 80],
        "text": [f"{phrase} first doc tail words one",
                 f"second doc head words {phrase}",
                 f"third {phrase} middle doc words",
                 "totally unrelated content with no phrase at all ok"]})
    inp = tmp_path / "in"
    inp.mkdir()
    pq.write_table(docs, inp / "part-0.parquet")
    out = tmp_path / "out"
    rc = main(["corpus-prep", "--input", str(inp), "--out", str(out),
               "--remove-dup-spans", "6", "--num-cpus", "4"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["stages"] == ["remove_dup_spans(k=6)"]
    got = pq.read_table(sorted((out / "data").glob("*.parquet")))
    rows = {r["doc_id"]: r for r in got.to_pylist()}
    assert len(rows) == 4
    assert phrase in rows[0]["text"]            # first occurrence kept
    assert phrase not in rows[1]["text"]
    assert phrase not in rows[2]["text"]
    assert rows[1]["text"] == "second doc head words"
    assert rows[3]["text"].startswith("totally unrelated")
    # payload columns rode through the exchange
    assert {r["source"] for r in rows.values()} == {"a", "b"}
    assert rows[2]["n_chars"] == 70
