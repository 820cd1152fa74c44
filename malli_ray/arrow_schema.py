"""Arrow schema <-> vector DSL conversion — SURVEY.md SS1.6's mapping table
as executable code.

``to_arrow_schema`` turns a :map schema into the pyarrow.Schema a conforming
table must have (the declared physical layout); ``from_arrow_schema`` infers
the loosest DSL that matches an existing file's schema (useful as a provider
seed or a compatibility check). ``schema_compatible`` diffs the two.
"""

from __future__ import annotations

from typing import Any, Optional

import pyarrow as pa

from .core import (
    DEFAULT_KEY, CollectionSchema, EnumSchema, MapOfSchema, MapSchema,
    MaybeSchema, ReSchema, Schema, TupleSchema, schema as to_schema,
)

__all__ = ["to_arrow_schema", "to_arrow_type", "from_arrow_schema",
           "from_arrow_type", "schema_compatible"]

_SCALAR_TYPES = {
    "string": pa.string(), "string?": pa.string(),
    "keyword": pa.string(), "keyword?": pa.string(),
    "symbol": pa.string(), "qualified-keyword": pa.string(),
    "qualified-symbol": pa.string(), "char?": pa.string(),
    "int": pa.int64(), "integer": pa.int64(), "int?": pa.int64(),
    "integer?": pa.int64(), "pos-int?": pa.int64(), "neg-int?": pa.int64(),
    "nat-int?": pa.int64(),
    "double": pa.float64(), "double?": pa.float64(),
    "float": pa.float64(), "float?": pa.float64(),
    "number": pa.float64(), "number?": pa.float64(),
    "boolean": pa.bool_(), "boolean?": pa.bool_(),
    "uuid": pa.string(), "uuid?": pa.string(),
    "inst?": pa.timestamp("us"), "time/instant": pa.timestamp("us", tz="UTC"),
    "time/local-date": pa.date32(), "time/local-time": pa.time64("us"),
    "time/local-date-time": pa.timestamp("us"),
    "time/duration": pa.duration("us"),
    "bytes?": pa.large_binary(),
    "nil": pa.null(), "any": pa.string(),
}

#: DSL int widths via properties: {"arrow/type": "int32"} overrides
_NAMED_TYPES = {"int8": pa.int8(), "int16": pa.int16(), "int32": pa.int32(),
                "int64": pa.int64(), "uint32": pa.uint32(),
                "uint64": pa.uint64(), "float32": pa.float32(),
                "float64": pa.float64(), "string": pa.string(),
                "large_string": pa.large_string(), "binary": pa.binary(),
                "large_binary": pa.large_binary()}


def to_arrow_type(s: Any, options: dict | None = None) -> pa.DataType:
    sc = to_schema(s, options)
    override = (sc.properties or {}).get("arrow/type")
    if override:
        return _NAMED_TYPES[override]
    t = sc.type
    if t in _SCALAR_TYPES:
        return _SCALAR_TYPES[t]
    if isinstance(sc, MaybeSchema):
        return to_arrow_type(sc.children[0], options)
    if isinstance(sc, EnumSchema):
        kinds = {type(c) for c in sc.children}
        if kinds <= {str}:
            return pa.string()
        if kinds <= {int}:
            return pa.int64()
        if kinds <= {int, float}:
            return pa.float64()
        return pa.string()
    if isinstance(sc, ReSchema):
        return pa.string()
    if isinstance(sc, CollectionSchema):
        return pa.large_list(to_arrow_type(sc.children[0], options)) \
            if (sc.properties or {}).get("arrow/large") else \
            pa.list_(to_arrow_type(sc.children[0], options))
    if isinstance(sc, TupleSchema):
        child_types = [to_arrow_type(c, options) for c in sc.children]
        if len(set(map(str, child_types))) == 1:
            return pa.list_(child_types[0], len(child_types))
        return pa.struct([(f"f{i}", ct) for i, ct in enumerate(child_types)])
    if isinstance(sc, MapSchema):
        fields = []
        for (k, p, cs) in sc.children:
            if k == DEFAULT_KEY:
                continue
            fields.append(pa.field(str(k), to_arrow_type(cs, options),
                                   nullable=_nullable(cs, p)))
        return pa.struct(fields)
    if isinstance(sc, MapOfSchema):
        return pa.map_(to_arrow_type(sc.children[0], options),
                       to_arrow_type(sc.children[1], options))
    if t in ("and", "or", "orn"):
        children = (sc.children if t != "orn" else [c for (_, _, c) in sc.children])
        for c in children:
            try:
                return to_arrow_type(c, options)
            except RecursiveSchemaError:
                raise  # a recursive branch must fail LOUDLY, not fall
                       # through to a sibling branch's (wrong) layout
            except (KeyError, ValueError):
                continue
    if t == "ref" and sc.children:
        # Arrow's type system is non-recursive: fail with a CLEAR error
        # instead of blowing the stack on ConsCell-style schemas
        name = str(sc.children[0])
        if name in _REF_STACK:
            raise RecursiveSchemaError(
                f"recursive schema (ref cycle through {name!r}) has no "
                "Arrow layout — flatten or bound the recursion first")
        _REF_STACK.append(name)
        try:
            return to_arrow_type(sc.deref(), options)
        finally:
            _REF_STACK.pop()
    d = sc.deref()
    if d is not sc:
        return to_arrow_type(d, options)
    raise ValueError(f"no Arrow mapping for schema type {t!r}")


class RecursiveSchemaError(ValueError):
    """Ref cycle reached the Arrow type mapper (Arrow types are
    non-recursive); never caught by union-branch fallbacks."""


#: in-progress :ref names (recursion detection)
import threading as _threading

_TLS = _threading.local()


class _TLStack:
    """Thread-local list facade (append/pop/in) — module-level state must
    not leak across threads in threaded map_batches actors."""

    def append(self, x):
        self._stack().append(x)

    def pop(self):
        return self._stack().pop()

    def __contains__(self, x):
        return x in self._stack()

    @staticmethod
    def _stack() -> list:
        s = getattr(_TLS, "stack", None)
        if s is None:
            s = _TLS.stack = []
        return s


_REF_STACK = _TLStack()


def _nullable(cs: Schema, entry_props: dict | None) -> bool:
    return isinstance(cs, MaybeSchema) or bool((entry_props or {}).get("optional"))


def to_arrow_schema(s: Any, options: dict | None = None) -> pa.Schema:
    sc = to_schema(s, options)
    sc = sc if isinstance(sc, MapSchema) else sc.deref()
    if not isinstance(sc, MapSchema):
        raise ValueError("to_arrow_schema requires a :map schema")
    fields = []
    for (k, p, cs) in sc.children:
        if k == DEFAULT_KEY:
            continue
        fields.append(pa.field(str(k), to_arrow_type(cs, options),
                               nullable=_nullable(cs, p)))
    return pa.schema(fields)


def from_arrow_type(dt: pa.DataType) -> Any:
    if pa.types.is_boolean(dt):
        return "boolean"
    if pa.types.is_integer(dt):
        return "int"
    if pa.types.is_floating(dt) or pa.types.is_decimal(dt):
        return "double"
    if pa.types.is_string(dt) or pa.types.is_large_string(dt):
        return "string"
    if pa.types.is_timestamp(dt):
        return "time/instant" if dt.tz else "time/local-date-time"
    if pa.types.is_date(dt):
        return "time/local-date"
    if pa.types.is_time(dt):
        return "time/local-time"
    if pa.types.is_duration(dt):
        return "time/duration"
    if pa.types.is_binary(dt) or pa.types.is_large_binary(dt):
        return "bytes?"
    if pa.types.is_fixed_size_list(dt):
        return ["tuple", *([from_arrow_type(dt.value_type)] * dt.list_size)]
    if pa.types.is_list(dt) or pa.types.is_large_list(dt):
        return ["vector", from_arrow_type(dt.value_type)]
    if pa.types.is_struct(dt):
        out: list = ["map"]
        for i in range(dt.num_fields):
            f = dt.field(i)
            child = from_arrow_type(f.type)
            if f.nullable:
                child = ["maybe", child]
            out.append([f.name, child])
        return out
    if pa.types.is_map(dt):
        return ["map-of", from_arrow_type(dt.key_type),
                from_arrow_type(dt.item_type)]
    if pa.types.is_null(dt):
        return "nil"
    return "any"


def from_arrow_schema(arrow_schema: pa.Schema) -> Any:
    out: list = ["map"]
    for f in arrow_schema:
        child = from_arrow_type(f.type)
        if f.nullable and not pa.types.is_null(f.type):
            child = ["maybe", child]
        out.append([f.name, child])
    return out


def schema_compatible(s: Any, arrow_schema: pa.Schema,
                      options: dict | None = None) -> list[str]:
    """Diff a :map schema's declared layout against an actual Arrow schema.

    Returns human-readable problems (empty == compatible): missing required
    columns, dtype mismatches; extra columns flagged only for closed maps.
    """
    sc = to_schema(s, options)
    sc = sc if isinstance(sc, MapSchema) else sc.deref()
    problems: list[str] = []
    names = set(arrow_schema.names)
    from .arrow_compile import compile_node, _const
    for (k, p, cs) in sc.children:
        if k == DEFAULT_KEY:
            continue
        optional = bool((p or {}).get("optional"))
        if k not in names:
            if not optional:
                problems.append(f"missing required column {k!r}")
            continue
        actual = arrow_schema.field(k).type
        fn = compile_node(cs, actual)
        # a compile that statically rejects everything means dtype mismatch
        if getattr(fn, "__const_value__", None) is False:
            try:
                declared = to_arrow_type(cs, options)
                problems.append(
                    f"column {k!r}: schema expects {declared}, file has {actual}")
            except ValueError:
                problems.append(
                    f"column {k!r}: schema type {cs.type!r} cannot match {actual}")
    if sc.closed:
        explicit = set(sc.explicit_keys)
        for n in arrow_schema.names:
            if n not in explicit:
                problems.append(f"unexpected column {n!r} (closed map)")
    return problems


def _types_close(a: pa.DataType, b: pa.DataType) -> bool:
    for pred in ("is_integer", "is_floating", "is_boolean", "is_timestamp"):
        if getattr(pa.types, pred)(a) and getattr(pa.types, pred)(b):
            return True
    if ((pa.types.is_string(a) or pa.types.is_large_string(a))
            and (pa.types.is_string(b) or pa.types.is_large_string(b))):
        return True
    if (pa.types.is_list(a) or pa.types.is_large_list(a)) and \
            (pa.types.is_list(b) or pa.types.is_large_list(b)):
        return _types_close(a.value_type, b.value_type)
    return str(a) == str(b)
