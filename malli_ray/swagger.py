"""Swagger 2.0 export — the malli.swagger analog.

Reference: /root/reference/src/malli/swagger.cljc — JSON-Schema accept with
Swagger 2.0 deltas: number formats (int64/int32/double/float), ``x-allOf``/
``x-anyOf`` merged over a non-null BASE child, ``x-nullable`` for :maybe,
``x-not``, tuples as ``{:type array :items {} :x-items [...]}``, and
``:swagger``/``:swagger/*`` property overrides. The recursion is shared with
json_schema via its ``accept`` hook (the ::json-schema/transform pattern,
swagger.cljc:96-101).
"""

from __future__ import annotations

from typing import Any

from .core import MaybeSchema, MultiSchema, OrnSchema, Schema, SchemaError
from .json_schema import _accept as _js_accept, transform as _js_transform

__all__ = ["transform"]

#: number-format accepts (swagger.cljc:54-71)
_FORMATS = {
    "number?": {"type": "number", "format": "double"},
    "integer?": {"type": "integer", "format": "int32"},
    "int?": {"type": "integer", "format": "int64"},
    "pos-int?": {"type": "integer", "format": "int64", "minimum": 1},
    "neg-int?": {"type": "integer", "format": "int64", "maximum": -1},
    "nat-int?": {"type": "integer", "format": "int64", "minimum": 0},
    "float?": {"type": "number", "format": "float"},
    "double?": {"type": "number", "format": "double"},
    "int": {"type": "integer", "format": "int64"},
    "double": {"type": "number", "format": "double"},
}


def _base(children: list[dict]) -> dict:
    """First non-null-typed child (swagger.cljc `-base`)."""
    for c in children:
        if c.get("type") != "null":
            return c
    raise SchemaError("swagger: a non-null base schema is needed")


def _done(sc: Schema, node: dict) -> dict:
    props = sc.properties or {}
    # full overrides, :swagger before :json-schema (swagger.cljc:75-76)
    if "swagger" in props:
        return props["swagger"]
    if "json-schema" in props:
        return props["json-schema"]
    if props.get("title"):
        node = {**node, "title": props["title"]}
    if props.get("description"):
        node = {**node, "description": props["description"]}
    for prefix in ("json-schema/", "swagger/"):
        for k, v in props.items():
            if isinstance(k, str) and k.startswith(prefix):
                node = {**node, k[len(prefix):]: v}
    return node


def _sw_accept(sc: Schema) -> dict:
    t = sc.type

    if t == "nil?":
        return _done(sc, {})
    if t in _FORMATS:
        node = dict(_FORMATS[t])
        props = sc.properties or {}
        if props.get("min") is not None:
            node["minimum"] = props["min"]
        if props.get("max") is not None:
            node["maximum"] = props["max"]
        return _done(sc, node)
    if t == "not":
        return _done(sc, {"x-not": _sw_accept(sc.children[0])})
    if t in ("and", "andn"):
        children = [_sw_accept(c) for c in sc.children] if t == "and" else \
            [_sw_accept(c) for (_, _, c) in sc.children]
        return _done(sc, {**_base(children), "x-allOf": children})
    if t == "or":
        children = [_sw_accept(c) for c in sc.children]
        return _done(sc, {**_base(children), "x-anyOf": children})
    if isinstance(sc, OrnSchema):
        children = [_sw_accept(c) for (_, _, c) in sc.children]
        return _done(sc, {**_base(children), "x-anyOf": children})
    if isinstance(sc, MultiSchema):
        children = [_sw_accept(s) for s in sc.branches.values()]
        if sc.default_branch is not None:
            children.append(_sw_accept(sc.default_branch))
        return _done(sc, {**_base(children), "x-anyOf": children})
    if isinstance(sc, MaybeSchema):
        return _done(sc, {**_base([_sw_accept(sc.children[0])]),
                          "x-nullable": True})
    if t == "tuple":
        return _done(sc, {"type": "array", "items": {},
                          "x-items": [_sw_accept(c) for c in sc.children]})
    if t == "=":
        # swagger 2.0 has no const: single-value enum
        return _done(sc, {"enum": [sc.children[0]]})
    return _done(sc, _js_accept(sc, rec=_sw_accept))


def transform(s: Any, options: dict | None = None) -> dict:
    out = _js_transform(s, options, accept=_sw_accept)
    if out.get("type") == "null":
        raise SchemaError("swagger: a non-null base schema is needed")
    return out
