"""JSON-Schema export/import for the vector DSL.

Reimplements the transform table of /root/reference/src/malli/json_schema.cljc
(:41-199: -type-mappings and accept methods) for our Python schema trees:
type schemas with min/max -> minimum/maximum or minLength/maxLength,
:map -> object+required+additionalProperties, collections -> array bounds,
:enum, :maybe -> nullable oneOf, :and -> allOf, :or -> anyOf, :not -> not,
:multi -> oneOf, :re -> pattern, :tuple -> prefixItems.

``parse`` (JSON-Schema -> DSL) covers the same subset, giving a DSL <->
pa.schema-adjacent interchange format (SURVEY.md SS2.13 exporters row).
"""

from __future__ import annotations

from typing import Any

from .core import (
    DEFAULT_KEY, CollectionSchema, EnumSchema, MapOfSchema, MapSchema,
    MaybeSchema, MultiSchema, OrnSchema, ReSchema, Schema, SimpleSchema,
    TupleSchema, schema as to_schema,
)

__all__ = ["transform", "parse"]

_SIMPLE_MAP = {
    "string": {"type": "string"}, "string?": {"type": "string"},
    "keyword": {"type": "string"}, "keyword?": {"type": "string"},
    "symbol": {"type": "string"}, "char?": {"type": "string"},
    "qualified-keyword": {"type": "string"}, "qualified-symbol": {"type": "string"},
    "int": {"type": "integer"}, "integer": {"type": "integer"},
    "int?": {"type": "integer"}, "integer?": {"type": "integer"},
    "pos-int?": {"type": "integer", "minimum": 1},
    "neg-int?": {"type": "integer", "maximum": -1},
    "nat-int?": {"type": "integer", "minimum": 0},
    "double": {"type": "number"}, "double?": {"type": "number"},
    "float": {"type": "number"}, "float?": {"type": "number"},
    "number": {"type": "number"}, "number?": {"type": "number"},
    "rational?": {"type": "number"}, "ratio?": {"type": "number"},
    "decimal?": {"type": "number"},
    "pos?": {"type": "number", "exclusiveMinimum": 0},
    "neg?": {"type": "number", "exclusiveMaximum": 0},
    "boolean": {"type": "boolean"}, "boolean?": {"type": "boolean"},
    "nil": {"type": "null"}, "nil?": {"type": "null"},
    "uuid": {"type": "string", "format": "uuid"},
    "uuid?": {"type": "string", "format": "uuid"},
    "uri?": {"type": "string", "format": "uri"},
    "inst?": {"type": "string", "format": "date-time"},
    "any": {}, "any?": {}, "some": {}, "map?": {"type": "object"},
}

_COUNT_KEYS = {"string": ("minLength", "maxLength"),
               "vector": ("minItems", "maxItems"),
               "sequential": ("minItems", "maxItems"),
               "seqable": ("minItems", "maxItems"),
               "every": ("minItems", "maxItems"),
               "set": ("minItems", "maxItems"),
               "map-of": ("minProperties", "maxProperties")}


#: $ref context stack (one frame per top-level transform call, THREAD-LOCAL
#: — map_batches UDFs may run in threaded actors): recursive :ref schemas
#: emit {"$ref": "#/definitions/<name>"} and register their definition once;
#: cycles break on the in-progress marker
#: (reference $ref handling, json_schema_test.cljc:247-335)
import threading as _threading

_TLS = _threading.local()


class _RefCtx:
    def append(self, x):
        self._stack().append(x)

    def pop(self):
        return self._stack().pop()

    def __bool__(self):
        return bool(self._stack())

    def __getitem__(self, i):
        return self._stack()[i]

    @staticmethod
    def _stack() -> list:
        s = getattr(_TLS, "stack", None)
        if s is None:
            s = _TLS.stack = []
        return s


_REF_CTX = _RefCtx()


def transform(s: Any, options: dict | None = None, accept=None) -> dict:
    """Schema/form -> JSON-Schema dict. ``accept`` overrides the per-node
    transformer (the ::json-schema/transform hook swagger threads through,
    swagger.cljc:96-101)."""
    ctx: dict = {"defs": {}}
    _REF_CTX.append(ctx)
    try:
        node = (accept or _accept)(to_schema(s, options))
    finally:
        _REF_CTX.pop()
    if ctx["defs"]:
        node = {**node, "definitions": ctx["defs"]}
    return node


def _bounds(node: dict, sc: Schema, lo_key: str, hi_key: str) -> dict:
    props = sc.properties or {}
    if props.get("min") is not None:
        node[lo_key] = props["min"]
    if props.get("max") is not None:
        node[hi_key] = props["max"]
    return node


def _accept(sc: Schema, rec=None) -> dict:
    rec = rec or _accept
    t = sc.type
    props = sc.properties or {}
    extra = {k[12:]: v for k, v in props.items()
             if isinstance(k, str) and k.startswith("json-schema/")}

    def done(node: dict) -> dict:
        if props.get("title"):
            node["title"] = props["title"]
        if props.get("description"):
            node["description"] = props["description"]
        node.update(extra)
        return node

    if t in _SIMPLE_MAP:
        node = dict(_SIMPLE_MAP[t])
        if t == "string":
            _bounds(node, sc, "minLength", "maxLength")
        elif node.get("type") in ("integer", "number"):
            _bounds(node, sc, "minimum", "maximum")
        return done(node)

    if t in (">", ">=", "<", "<="):
        key = {">": "exclusiveMinimum", ">=": "minimum",
               "<": "exclusiveMaximum", "<=": "maximum"}[t]
        return done({"type": "number", key: sc.children[0]})
    if t == "=":
        return done({"const": sc.children[0]})

    if isinstance(sc, EnumSchema):
        # merge the inferred child type (json_schema.cljc:160 uses m/-infer)
        from .transform import _infer_child_type
        inferred = {"string": {"type": "string"},
                    "int": {"type": "integer"},
                    "double": {"type": "number"}}.get(
                        _infer_child_type(sc.children) or "", {})
        return done({**inferred, "enum": list(sc.children)})
    if isinstance(sc, ReSchema):
        return done({"type": "string", "pattern": sc.pattern.pattern})
    if isinstance(sc, MaybeSchema):
        return done({"oneOf": [rec(sc.children[0]), {"type": "null"}]})
    if t == "and":
        return done({"allOf": [rec(c) for c in sc.children]})
    if t == "or":
        return done({"anyOf": [rec(c) for c in sc.children]})
    if isinstance(sc, OrnSchema):
        return done({"anyOf": [rec(c) for (_, _, c) in sc.children]})
    if t == "not":
        return done({"not": rec(sc.children[0])})

    if isinstance(sc, MapSchema):
        properties = {}
        required = []
        for (k, p, cs) in sc.children:
            if k == DEFAULT_KEY:
                continue
            properties[str(k)] = rec(cs)
            if not (p or {}).get("optional"):
                required.append(str(k))
        node: dict = {"type": "object", "properties": properties}
        if required:
            node["required"] = required
        if sc.closed:
            node["additionalProperties"] = False
        if sc.default_entry is not None:
            # ::m/default rest-of-map: transform it and MERGE (reference
            # accept :map, json_schema.cljc:109-124): its properties /
            # required / additionalProperties fold into the object; other
            # keys (e.g. a json-schema/default) survive unless overridden
            d = rec(sc.default_entry[2])
            merged = {**{k: v for k, v in d.items()
                         if k not in ("properties", "required",
                                      "additionalProperties", "type")},
                      **node}
            if "additionalProperties" in d:
                merged["additionalProperties"] = d["additionalProperties"]
            if "properties" in d:
                merged["properties"] = {**properties, **d["properties"]}
            if "required" in d:
                merged["required"] = list(dict.fromkeys(
                    [*merged.get("required", []), *d["required"]]))
            node = merged
        return done(node)

    if isinstance(sc, MapOfSchema):
        node = {"type": "object", "additionalProperties": rec(sc.children[1])}
        _bounds(node, sc, "minProperties", "maxProperties")
        return done(node)

    if isinstance(sc, CollectionSchema):
        node = {"type": "array", "items": rec(sc.children[0])}
        if t == "set":
            node["uniqueItems"] = True
        _bounds(node, sc, "minItems", "maxItems")
        return done(node)

    if isinstance(sc, TupleSchema):
        # items:false already bounds the size; the reference emits no
        # minItems/maxItems (json_schema_test.cljc:106-108)
        return done({"type": "array",
                     "prefixItems": [rec(c) for c in sc.children],
                     "items": False})

    if isinstance(sc, MultiSchema):
        return done({"oneOf": [rec(s) for s in sc.branches.values()]
                     + ([rec(sc.default_branch)] if sc.default_branch else [])})

    if t == "ref" and sc.children:
        name = str(sc.children[0])
        if _REF_CTX:
            ctx = _REF_CTX[-1]
            # disambiguate same-named refs whose TARGETS differ (two local
            # registries can both define "X"): key variants by target form
            variants = ctx.setdefault("by_name", {}).setdefault(name, {})
            target_key = repr(sc.deref().form)
            def_key = variants.get(target_key)
            if def_key is None:
                def_key = name if not variants else f"{name}.{len(variants) + 1}"
                variants[target_key] = def_key
                ctx["defs"][def_key] = None  # in-progress marker breaks cycles
                ctx["defs"][def_key] = rec(sc.deref())
            return done({"$ref": f"#/definitions/{def_key}"})

    deref = sc.deref()
    if deref is not sc:
        return done(rec(deref))
    return done({})  # :fn / seq-regex etc -> unconstrained (json_schema.cljc default)


def parse(node: dict | bool, options: dict | None = None) -> Any:
    """JSON-Schema dict -> DSL form (subset inverse)."""
    if node is True or node == {}:
        return "any"
    if node is False:
        return ["not", "any"]
    if isinstance(node, dict) and node.get("definitions"):
        registry = {name: parse(d) for name, d in node["definitions"].items()}
        inner = parse({k: v for k, v in node.items() if k != "definitions"})
        return ["schema", {"registry": registry}, inner]
    if isinstance(node, dict) and "$ref" in node:
        return ["ref", node["$ref"].rsplit("/", 1)[-1]]
    if "enum" in node:
        return ["enum", *node["enum"]]
    if "const" in node:
        return ["=", node["const"]]
    for key, t in (("allOf", "and"), ("anyOf", "or")):
        if key in node:
            return [t, *[parse(n) for n in node[key]]]
    if "oneOf" in node:
        subs = node["oneOf"]
        if len(subs) == 2 and {"type": "null"} in subs:
            others = [s for s in subs if s != {"type": "null"}]
            if not others:
                return "nil"  # oneOf of nulls (e.g. [:maybe :nil])
            return ["maybe", parse(others[0])]
        return ["or", *[parse(n) for n in subs]]
    if "not" in node:
        return ["not", parse(node["not"])]

    t = node.get("type")
    if t == "string":
        if node.get("format") == "uuid":
            return "uuid"
        if "pattern" in node:
            return ["re", node["pattern"]]
        props = {}
        if "minLength" in node:
            props["min"] = node["minLength"]
        if "maxLength" in node:
            props["max"] = node["maxLength"]
        return ["string", props] if props else "string"
    if t in ("integer", "number"):
        base = "int" if t == "integer" else "double"
        props = {}
        if "minimum" in node:
            props["min"] = node["minimum"]
        if "maximum" in node:
            props["max"] = node["maximum"]
        form = [base, props] if props else base
        # exclusive bounds -> :and with comparators (transform emits these
        # for pos?/neg?/:>/:<)
        conj = []
        if "exclusiveMinimum" in node:
            conj.append([">", node["exclusiveMinimum"]])
        if "exclusiveMaximum" in node:
            conj.append(["<", node["exclusiveMaximum"]])
        if conj:
            return ["and", form, *conj]
        return form
    if t == "boolean":
        return "boolean"
    if t == "null":
        return "nil"
    if t == "array":
        if "prefixItems" in node:
            return ["tuple", *[parse(n) for n in node["prefixItems"]]]
        child = parse(node.get("items", {}))
        props = {}
        if "minItems" in node:
            props["min"] = node["minItems"]
        if "maxItems" in node:
            props["max"] = node["maxItems"]
        head = "set" if node.get("uniqueItems") else "vector"
        return [head, props, child] if props else [head, child]
    if t == "object":
        if "properties" in node:
            required = set(node.get("required", []))
            out: list = ["map"]
            if node.get("additionalProperties") is False:
                out.append({"closed": True})
            for k, v in node["properties"].items():
                child = parse(v)
                if k in required:
                    out.append([k, child])
                else:
                    out.append([k, {"optional": True}, child])
            return out
        if isinstance(node.get("additionalProperties"), dict):
            return ["map-of", "string", parse(node["additionalProperties"])]
        return ["map-of", "string", "any"]
    return "any"
