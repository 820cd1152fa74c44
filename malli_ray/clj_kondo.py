"""clj-kondo type-config export (malli.clj-kondo analog).

Reference: /root/reference/src/malli/clj_kondo.cljc:1-250. Maps schemas to
clj-kondo's type-lint vocabulary — type keywords (``"int"``, ``"string"``,
``"nilable/int"``), ``{:op :keys}`` maps for :map, ``{:op :rest}`` for
varargs tails — and assembles the ``{:linters {:type-mismatch ...}}``
config from registered function schemas (clj_kondo.cljc:213-236).

Kondo keywords are plain Python strings here; :op maps are dicts with
string keys. ``write_string`` renders the config as EDN (strings become
keywords, ``Symbol`` values/keys become bare symbols, int keys stay ints)
so the output is a loadable clj-kondo config file.
"""

from __future__ import annotations

import os
from typing import Any

from .core import (
    DEFAULT_KEY,
    EnumSchema,
    FunctionSchema,
    FunctionSetSchema,
    MapSchema,
    MaybeSchema,
    SchemaError,
    Schema,
    WrapperSchema,
    schema as to_schema,
)

__all__ = ["transform", "from_fn", "register_function_schema",
           "function_schemas", "collect", "linter_config", "write_string",
           "save", "Symbol"]


class Symbol(str):
    """A bare EDN symbol (namespaces and var names in the kondo config)."""


# predicate-schema -> kondo type keyword (clj_kondo.cljc:12-62)
_PREDICATE_TYPES = {
    "any?": "any", "some?": "any", "number?": "number", "integer?": "int",
    "int?": "int", "pos-int?": "pos-int", "neg-int?": "neg-int",
    "nat-int?": "nat-int", "pos?": "pos-int", "neg?": "neg-int",
    "float?": "double", "double?": "double", "boolean?": "boolean",
    "string?": "string", "ident?": "symbol", "simple-ident?": "symbol",
    "qualified-ident?": "symbol", "keyword?": "keyword",
    "simple-keyword?": "keyword", "qualified-keyword?": "keyword",
    "symbol?": "symbol", "simple-symbol?": "symbol",
    "qualified-symbol?": "symbol", "uuid?": "any", "uri?": "any",
    "decimal?": "double", "inst?": "any", "seqable?": "seqable",
    "indexed?": "vector", "map?": "map", "vector?": "vector",
    "list?": "list", "seq?": "seq", "char?": "char", "set?": "set",
    "nil?": "nil", "false?": "boolean", "true?": "boolean", "zero?": "int",
    "rational?": "double", "coll?": "coll", "empty?": "seq",
    "associative?": "associative", "sequential?": "sequential",
    "ratio?": "int", "bytes?": "char-sequence", "ifn?": "ifn", "fn?": "fn",
}

# type-schema / base-schema -> kondo type keyword (clj_kondo.cljc:64-127)
_TYPE_TYPES = {
    ">": "number", ">=": "number", "<": "number", "<=": "number",
    "=": "any", "not=": "any",
    "and": "any", "andn": "any", "or": "any", "orn": "any", "not": "any",
    "map-of": "map", "vector": "vector", "sequential": "sequential",
    "set": "set", "tuple": "seqable", "multi": "any", "re": "string",
    "fn": "any", "ref": "any", "any": "any", "some": "any", "nil": "nil",
    "string": "string", "int": "int", "float": "double", "double": "double",
    "boolean": "boolean", "keyword": "keyword",
    "qualified-keyword": "keyword", "symbol": "symbol",
    "qualified-symbol": "symbol", "uuid": "any",
    "alt": "any", "altn": "any", "every": "seqable", "seqable": "seqable",
    "maybe": None,  # handled structurally below
}


def _enum_type(children: list) -> str:
    """:enum maps to the single shared literal type, else :any
    (clj_kondo.cljc:88-100)."""
    kinds = {type(c) for c in children}
    if len(kinds) != 1:
        return "any"
    c = children[0]
    if isinstance(c, bool):
        return "boolean"
    if isinstance(c, str):
        return "string"
    if isinstance(c, int):
        return "int"
    if isinstance(c, float):
        return "number"
    return "any"


def transform(s: Any, options: dict | None = None) -> Any:
    """Schema/form -> clj-kondo type spec (clj_kondo.cljc `transform`).

    ``options={"arity": "varargs"}`` makes a trailing ``:*``/``:+``/``:?``/
    ``:repeat`` render as ``{:op :rest :spec ...}`` (clj_kondo.cljc:129-137).
    """
    sc = to_schema(s)
    opts = options or {}
    t = sc.type

    if isinstance(sc, MapSchema):
        req: dict = {}
        opt: dict = {}
        for (k, p, cs) in sc.children:
            if k == DEFAULT_KEY:
                continue
            target = opt if (p or {}).get("optional") else req
            target[k] = transform(cs, opts)
        out: dict = {"op": "keys"}
        if opt:
            out["opt"] = opt
        if req:
            out["req"] = req
        return out

    if isinstance(sc, MaybeSchema):
        child = transform(sc.children[0], opts)
        if isinstance(child, dict) and child.get("op") == "keys":
            return {**child, "nilable": True}
        if isinstance(child, str) and child != "any":
            return "nilable/" + child
        return child

    if isinstance(sc, EnumSchema):
        return _enum_type(list(sc.children))

    if isinstance(sc, (FunctionSchema, FunctionSetSchema)):
        return "fn"

    if t in ("schema", "malli.core/schema", "merge", "union", "select-keys"):
        if isinstance(sc, WrapperSchema) or hasattr(sc, "deref"):
            return transform(sc.deref(), opts)
        return "any"

    if t in ("+", "*", "?", "repeat"):
        # varargs tail renders as a :rest spec (clj_kondo.cljc:129-137)
        if opts.get("arity") == "varargs":
            return {"op": "rest", "spec": transform(sc.children[0], {})}
        return "seqable"

    if t == "cat":
        return [transform(c, opts) for c in sc.children]
    if t == "catn":
        return [transform(cs, opts) for (_, _, cs) in sc.children]

    if t in _PREDICATE_TYPES:
        return _PREDICATE_TYPES[t]
    mapped = _TYPE_TYPES.get(t)
    if mapped is not None:
        return mapped
    return "any"


# -- function-schema registry (m/=> / m/function-schemas analog) -----------

_FUNCTION_SCHEMAS: dict[tuple[str, str], Any] = {}


def register_function_schema(ns: str, name: str, fn_schema: Any) -> None:
    """Register a var's function schema (the `m/=>` analog,
    src/malli/core.cljc:3098-3124) for `collect`/`linter_config`."""
    _FUNCTION_SCHEMAS[(ns, name)] = fn_schema


def function_schemas() -> dict[tuple[str, str], Any]:
    return dict(_FUNCTION_SCHEMAS)


def from_fn(entry: dict) -> list[dict]:
    """{ns, name, schema} -> per-arity kondo config rows
    (clj_kondo.cljc `from`, :196-211)."""
    sc = to_schema(entry["schema"])
    if isinstance(sc, WrapperSchema):
        sc = sc.deref()
    if not isinstance(sc, (FunctionSchema, FunctionSetSchema)):
        raise SchemaError("from_fn requires a :=> or :function schema")
    rows = []
    for ar in sc.arities():
        info = ar.function_info()
        arity = info["arity"]
        row = {"ns": Symbol(entry["ns"]), "name": Symbol(entry["name"]),
               "arity": arity,
               "args": transform(info["input"], {"arity": arity}),
               "ret": transform(info["output"])}
        if arity == "varargs":
            row["min-arity"] = info["min"]
        rows.append(row)
    return rows


def collect(ns: str | None = None) -> list[dict]:
    """All registered function schemas (optionally one namespace) as kondo
    rows (clj_kondo.cljc `collect`, :238-243)."""
    out = []
    for (n, name), s in sorted(_FUNCTION_SCHEMAS.items()):
        if ns is None or n == ns:
            out.extend(from_fn({"ns": n, "name": name, "schema": s}))
    return out


def linter_config(rows: list[dict]) -> dict:
    """Rows -> nested :linters :type-mismatch config
    (clj_kondo.cljc:245-252)."""
    namespaces: dict = {}
    for row in rows:
        arities = (namespaces.setdefault(Symbol(row["ns"]), {})
                   .setdefault(Symbol(row["name"]), {})
                   .setdefault("arities", {}))
        spec = {"args": row["args"], "ret": row["ret"]}
        if "min-arity" in row:
            spec["min-arity"] = row["min-arity"]
        arities[row["arity"]] = spec
    return {"linters": {"type-mismatch": {"namespaces": namespaces}}}


# -- EDN rendering ---------------------------------------------------------

def _edn(x: Any) -> str:
    if isinstance(x, Symbol):
        return str(x)
    if isinstance(x, bool):
        return "true" if x else "false"
    if x is None:
        return "nil"
    if isinstance(x, str):
        return ":" + x  # kondo config strings are keywords
    if isinstance(x, (int, float)):
        return repr(x)
    if isinstance(x, dict):
        return "{" + ", ".join(f"{_edn(k)} {_edn(v)}" for k, v in x.items()) + "}"
    if isinstance(x, (list, tuple)):
        return "[" + " ".join(_edn(v) for v in x) + "]"
    raise SchemaError(f"cannot EDN-render {type(x).__name__}: {x!r}")


def write_string(config: Any) -> str:
    return _edn(config)


def save(config: dict, clj_kondo_dir: str) -> str:
    """Write the config under <dir>/.clj-kondo/imports/... and return the
    file path (clj_kondo.cljc `save!`, :178-189)."""
    path = os.path.join(clj_kondo_dir, ".clj-kondo", "imports",
                        "malli-ray", "types", "config.edn")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(write_string(config) + "\n")
    return path
