"""Human-readable schema descriptions (malli.experimental.describe analog).

Reference: /root/reference/src/malli/experimental/describe.cljc — renders a
schema as an English sentence; used in docs/reports.
"""

from __future__ import annotations

from typing import Any

from .core import (
    DEFAULT_KEY, CollectionSchema, EnumSchema, FnSchema, MapOfSchema, MapSchema,
    MaybeSchema, MultiSchema, OrnSchema, ReSchema, Schema, TupleSchema,
    schema as to_schema,
)

__all__ = ["describe"]

_NOUNS = {
    "int": "integer", "integer": "integer", "int?": "integer",
    "pos-int?": "positive integer", "neg-int?": "negative integer",
    "nat-int?": "non-negative integer",
    "double": "double", "double?": "double", "float": "float",
    "number": "number", "number?": "number",
    "string": "string", "string?": "string",
    "boolean": "boolean", "boolean?": "boolean",
    "keyword": "keyword", "symbol": "symbol", "uuid": "uuid",
    "nil": "nil", "any": "anything", "some": "anything but nil",
    "inst?": "instant",
}


def _bounds_phrase(props: dict, unit: str = "") -> str:
    mn, mx = props.get("min"), props.get("max")
    u = f" {unit}" if unit else ""
    if mn is not None and mx is not None:
        return f" between {mn} and {mx}{u}"
    if mn is not None:
        return f" at least {mn}{u}"
    if mx is not None:
        return f" at most {mx}{u}"
    return ""


def describe(s: Any, options: dict | None = None) -> str:
    return _desc(to_schema(s, options))


def _desc(sc: Schema) -> str:
    t = sc.type
    props = sc.properties or {}
    if t in _NOUNS:
        base = _NOUNS[t]
        if t.startswith("string") and ("min" in props or "max" in props):
            return base + _bounds_phrase(props, "characters long")
        if ("min" in props or "max" in props):
            return base + _bounds_phrase(props)
        return base
    if isinstance(sc, EnumSchema):
        vals = ", ".join(repr(c) for c in sc.children)
        return f"one of {vals}"
    if isinstance(sc, ReSchema):
        return f"string matching /{sc.pattern.pattern}/"
    if isinstance(sc, FnSchema):
        return "value passing a custom predicate"
    if isinstance(sc, MaybeSchema):
        return f"nullable {_desc(sc.children[0])}"
    if t == "and":
        return " and ".join(_desc(c) for c in sc.children)
    if t == "or":
        return " or ".join(_desc(c) for c in sc.children)
    if isinstance(sc, OrnSchema):
        return " or ".join(f"{k}: {_desc(c)}" for (k, _, c) in sc.children)
    if t == "not":
        return f"anything but {_desc(sc.children[0])}"
    if isinstance(sc, MapSchema):
        parts = []
        for (k, p, cs) in sc.children:
            if k == DEFAULT_KEY:
                parts.append(f"other keys: {_desc(cs)}")
                continue
            opt = " (optional)" if (p or {}).get("optional") else ""
            parts.append(f"{k}{opt}: {_desc(cs)}")
        closed = "closed " if sc.closed else ""
        return f"{closed}map of {{{', '.join(parts)}}}"
    if isinstance(sc, MapOfSchema):
        return (f"map from {_desc(sc.children[0])} to {_desc(sc.children[1])}"
                + _bounds_phrase(props, "entries"))
    if isinstance(sc, CollectionSchema):
        noun = {"vector": "vector", "sequential": "sequence", "set": "set",
                "seqable": "seqable", "every": "sequence"}[t]
        return (f"{noun} of {_desc(sc.children[0])}"
                + _bounds_phrase(props, "items"))
    if isinstance(sc, TupleSchema):
        return "tuple of [" + ", ".join(_desc(c) for c in sc.children) + "]"
    if isinstance(sc, MultiSchema):
        return "one of " + " | ".join(
            f"{k} -> {_desc(c)}" for k, c in sc.branches.items())
    if t in (">", ">=", "<", "<=", "=", "not="):
        word = {">": "greater than", ">=": "at least", "<": "less than",
                "<=": "at most", "=": "equal to", "not=": "not equal to"}[t]
        return f"value {word} {sc.children[0]!r}"
    if t in ("?", "*", "+", "repeat", "cat", "catn", "alt", "altn"):
        return f"sequence matching {sc.form!r}"
    if t == "ref" and sc.children:
        # recursive references describe by NAME, once — cycles terminate
        name = str(sc.children[0])
        if name in _REF_STACK:
            return name
        _REF_STACK.append(name)
        try:
            return f"{name} (= {_desc(sc.deref())})"
        finally:
            _REF_STACK.pop()
    d = sc.deref()
    if d is not sc:
        return _desc(d)
    return str(sc.form)


#: in-progress :ref names (cycle guard for recursive schemas)
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
