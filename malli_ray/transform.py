"""Transformers — the malli.transform surface (row-level).

Reimplements /root/reference/src/malli/transform.cljc semantics:
the interceptor model ({enter, leave} per schema node, composed
parent-around-children with identity elision — transform.cljc:14-58,
core.cljc:598-622, README.md:3767-3790), per-schema property overrides
``decode/<name>`` / ``encode/<name>`` (-value-transformer,
transform.cljc:411-426), and the built-in transformers:

  - string-transformer  (transform.cljc:454-458; scalar fns :60-205)
  - json-transformer    (transform.cljc:428-452)
  - collection-transformer (:530-537)
  - strip-extra-keys-transformer (:460-483)
  - key-transformer     (:485-490)
  - default-value-transformer (:492-528)

The Arrow/batch counterparts of these (pc.cast / strptime / fill_null /
select_columns) live in malli_ray.arrow_compile; this module is the row-level
contract they are tested against.
"""

from __future__ import annotations

import datetime as _dt
import uuid as _uuid
from typing import Any, Callable, Optional

from .core import DEFAULT_KEY, MapSchema, Schema, SchemaError

__all__ = [
    "Transformer", "transformer", "string_transformer", "json_transformer",
    "collection_transformer", "strip_extra_keys_transformer", "key_transformer",
    "default_value_transformer",
]


# --------------------------------------------------------------------------
# scalar coercion functions (transform.cljc:60-205)
# --------------------------------------------------------------------------


def string_to_long(x: Any) -> Any:
    """-string->long: parse or return unchanged (transform.cljc:60-70).

    Surrounding whitespace rejects (Long/parseLong semantics — Python's
    int() would silently strip it, diverging from the reference AND from
    the batch decode path)."""
    if isinstance(x, str):
        if x != x.strip() or "_" in x:
            # parseLong rejects whitespace and Python's underscore digit
            # separators ("1_0"); the batch path (polars cast) agrees
            return x
        try:
            return int(x, 10)
        except ValueError:
            return x
    return x


def string_to_double(x: Any) -> Any:
    """-string->double: parse or return unchanged (Double/parseDouble
    tolerates surrounding whitespace but not underscore separators)."""
    if isinstance(x, str):
        if "_" in x:
            return x
        try:
            return float(x)
        except ValueError:
            return x
    return x


def string_to_boolean(x: Any) -> Any:
    """-string->boolean: only "true"/"false" (transform.cljc:90-93)."""
    if x == "true":
        return True
    if x == "false":
        return False
    return x


def string_to_keyword(x: Any) -> Any:
    """Strip a leading ':' (keywords are strings in this engine)."""
    if isinstance(x, str) and x.startswith(":"):
        return x[1:]
    return x


def string_to_uuid(x: Any) -> Any:
    """-string->uuid with regex guard (transform.cljc:115-124)."""
    if isinstance(x, str):
        try:
            return _uuid.UUID(x)
        except ValueError:
            return x
    return x


def string_to_date(x: Any) -> Any:
    """ISO-8601 parse (transform.cljc:138-159)."""
    if isinstance(x, str):
        s = x[:-1] + "+00:00" if x.endswith("Z") else x
        try:
            d = _dt.datetime.fromisoformat(s)
        except ValueError:
            return x
        # insts are UTC (transform.cljc:138-159): date-only / offset-less
        # strings parse naive -> pin to UTC
        if d.tzinfo is None:
            d = d.replace(tzinfo=_dt.timezone.utc)
        return d
    return x


def string_to_decimal(x: Any) -> Any:
    """-string->decimal (transform.cljc -string->decimal): tolerant
    BigDecimal-style parse; failures return the input unchanged."""
    if isinstance(x, str):
        import decimal
        try:
            return decimal.Decimal(x)
        except decimal.InvalidOperation:
            return x
    return x


def number_to_long(x: Any) -> Any:
    """-number->long: round integral doubles (transform.cljc:99-103)."""
    if isinstance(x, float) and x.is_integer():
        return int(x)
    return x


def number_to_double(x: Any) -> Any:
    if isinstance(x, int) and not isinstance(x, bool):
        return float(x)
    return x


def any_to_string(x: Any) -> Any:
    if x is None:
        return None
    if isinstance(x, str):
        return x
    if isinstance(x, bool):
        return "true" if x else "false"
    if isinstance(x, _dt.datetime):
        return date_to_string(x)
    return str(x)


def date_to_string(x: Any) -> Any:
    """UTC ISO-8601 with millis (transform.cljc:183-193)."""
    if isinstance(x, _dt.datetime):
        if x.tzinfo is not None:
            x = x.astimezone(_dt.timezone.utc)
        return x.strftime("%Y-%m-%dT%H:%M:%S.") + f"{x.microsecond // 1000:03d}Z"
    return x


def string_to_nil(x: Any) -> Any:
    """"" -> nil (transform.cljc:171-172)."""
    return None if x == "" else x


# --------------------------------------------------------------------------
# Transformer
# --------------------------------------------------------------------------


class Transformer:
    """A named set of per-schema-type decoders/encoders.

    ``decoders`` / ``encoders`` map schema-type -> interceptor, where an
    interceptor is a callable (== enter) or {"enter": f, "leave": g}.
    Reference: mt/transformer, transform.cljc:387-426.
    """

    def __init__(self, name: str | None,
                 decoders: dict[str, Any] | None = None,
                 encoders: dict[str, Any] | None = None,
                 chain: list["Transformer"] | None = None,
                 default_decoder: Any = None,
                 default_encoder: Any = None):
        self.name = name
        self.decoders = decoders or {}
        self.encoders = encoders or {}
        self.chain = chain or []
        self.default_decoder = default_decoder
        self.default_encoder = default_encoder

    def value_transformer(self, schema_: Schema, method: str, options: dict) -> Optional[Any]:
        """Per-node transform lookup, in the reference's resolution order
        (transform.cljc:411-426): FULL property form ``{:decode {name t}}``
        first (it masks the compact key), then compact ``<method>/<name>``,
        then the same pair from type-properties, then the transformer's
        type map, then the default."""
        if self.chain:
            steps = [t.value_transformer(schema_, method, options) for t in self.chain]
            steps = [s for s in steps if s is not None]
            if not steps:
                return None
            if len(steps) == 1:
                return steps[0]
            return _compose_interceptors(steps)

        def from_props(props: dict | None) -> Any:
            if not props or not self.name:
                return None
            full = props.get(method)
            if isinstance(full, dict) and self.name in full:
                return full[self.name]
            return props.get(f"{method}/{self.name}")

        override = from_props(schema_.properties)
        if override is None:
            override = from_props(getattr(schema_, "type_properties", None))
        if override is not None:
            return _to_interceptor(override, schema_, options)
        table = self.decoders if method == "decode" else self.encoders
        t = table.get(schema_.type)
        if t is None:
            t = (self.default_decoder if method == "decode"
                 else self.default_encoder)
        if t is None:
            return None
        if callable(t) and getattr(t, "__transformer_compile__", False):
            return t(schema_, options)
        return _to_interceptor(t, schema_, options)


#: -interceptor compile recursion guard (transform.cljc:14, 26-29)
MAX_COMPILE_DEPTH = 10


def _to_interceptor(t: Any, schema_: Any = None, options: dict | None = None,
                    _depth: int = 0) -> Any:
    """-interceptor (transform.cljc:16-43): fn == enter; a map with
    "compile" is invoked with (schema, options) and the result merged over
    the remaining keys, depth-guarded."""
    if isinstance(t, dict) and "compile" in t:
        if _depth >= MAX_COMPILE_DEPTH:
            raise SchemaError("too deep transformer compilation", t)
        compiled = t["compile"](schema_, options)
        if compiled is None:
            return None
        inner = _to_interceptor(compiled, schema_, options, _depth + 1)
        if callable(inner):
            inner = {"enter": inner}
        rest = {k: v for k, v in t.items() if k != "compile"}
        return {**rest, **(inner or {})}
    return t


def _compose_interceptors(steps: list) -> dict:
    enters, leaves = [], []
    for s in steps:
        if isinstance(s, dict):
            if s.get("enter"):
                enters.append(s["enter"])
            if s.get("leave"):
                leaves.append(s["leave"])
        elif callable(s):
            enters.append(s)

    def run(fs):
        def f(x):
            for g in fs:
                x = g(x)
            return x
        return f

    out: dict = {}
    if enters:
        out["enter"] = run(enters)
    if leaves:
        out["leave"] = run(list(reversed(leaves)))
    return out


def transformer(*ts) -> Transformer:
    """Compose transformers left-to-right (mt/transformer chaining,
    transform.cljc:387-406). Accepts Transformer objects or transformer
    MAPS ``{"name": ..., "decoders": ..., "encoders": ...,
    "default-decoder": ..., "default-encoder": ...}``."""
    def to_t(t):
        if isinstance(t, dict):
            return Transformer(t.get("name"), t.get("decoders"),
                               t.get("encoders"),
                               default_decoder=t.get("default-decoder"),
                               default_encoder=t.get("default-encoder"))
        return t

    norm = [to_t(t) for t in ts if t is not None]
    if len(norm) == 1:
        return norm[0]
    return Transformer(None, chain=norm)


def _compile_marker(f):
    f.__transformer_compile__ = True
    return f


# --------------------------------------------------------------------------
# built-in transformers
# --------------------------------------------------------------------------

_STRING_DECODERS: dict[str, Any] = {
    "int": string_to_long, "integer": string_to_long,
    "int?": string_to_long, "integer?": string_to_long,
    "pos-int?": string_to_long, "neg-int?": string_to_long, "nat-int?": string_to_long,
    "double": string_to_double, "float": string_to_double,
    "double?": string_to_double, "float?": string_to_double, "number?": string_to_double,
    "number": string_to_double,
    "boolean": string_to_boolean, "boolean?": string_to_boolean,
    "keyword": string_to_keyword, "keyword?": string_to_keyword,
    "qualified-keyword": string_to_keyword,
    "symbol": string_to_keyword, "symbol?": string_to_keyword,
    "uuid": string_to_uuid, "uuid?": string_to_uuid,
    "inst?": string_to_date,
    "nil": string_to_nil, "nil?": string_to_nil,
    "decimal?": string_to_decimal,
}

_STRING_ENCODERS: dict[str, Any] = {
    "int": any_to_string, "integer": any_to_string, "int?": any_to_string,
    "double": any_to_string, "double?": any_to_string, "float": any_to_string,
    # :boolean deliberately NOT string-encoded (transform.cljc:371, the
    # commented-out `;:boolean -any->string`)
    "keyword": any_to_string, "symbol": any_to_string,
    "uuid": any_to_string, "uuid?": any_to_string,
    "inst?": date_to_string,
    "decimal?": any_to_string,
}


def _infer_child_type(children) -> str | None:
    """m/-infer (core.cljc:243-245): the common literal type of children
    (string before int before double; keywords/symbols are strings here)."""
    vals = [c for c in children]
    if not vals:
        return None
    if all(isinstance(c, str) for c in vals):
        return "string"
    if all(isinstance(c, int) and not isinstance(c, bool) for c in vals):
        return "int"
    if all(isinstance(c, float) for c in vals):
        return "double"
    return None


def _add_child_compilers(table: dict) -> dict:
    """-add-child-compilers (transform.cljc:241-247): :enum and := code
    their literal children via the inferred child type's coder."""
    @_compile_marker
    def compile_(schema_: Schema, options: dict):
        t = _infer_child_type(schema_.children)
        coder = table.get(t) if t else None
        if coder is None:
            return None
        if callable(coder) and getattr(coder, "__transformer_compile__", False):
            return coder(schema_, options)
        return coder

    return {**table, "enum": compile_, "=": compile_}


def string_transformer() -> Transformer:
    """String -> typed values per target schema (transform.cljc:454-458)."""
    return Transformer("string",
                       decoders=_add_child_compilers(dict(_STRING_DECODERS)),
                       encoders=_add_child_compilers(dict(_STRING_ENCODERS)))


def _list_to_set(x: Any) -> Any:
    if isinstance(x, (list, tuple)):
        return set(x)
    return x


@_compile_marker
def _decode_map_of_keys(schema_: Schema, _options: dict):
    """:map-of JSON keys decode via the STRING decoders for the key schema,
    kept only when the decoded key validates (transform.cljc:436-443,
    map-of-key-decoders default = -string-decoders)."""
    key_schema = schema_.children[0] if schema_.children else None
    coder = _STRING_DECODERS.get(key_schema.type) if key_schema is not None else None
    if coder is None:
        return None
    valid = key_schema.validator()

    def tx(x: Any) -> Any:
        if not isinstance(x, dict):
            return x
        out = {}
        for k, v in x.items():
            k2 = coder(k) if isinstance(k, str) else k
            out[k2 if valid(k2) else k] = v
        return out

    return {"enter": tx}


def json_transformer() -> Transformer:
    """JSON-shaped data -> richer types (transform.cljc:428-452)."""
    decoders = {
        "map-of": _decode_map_of_keys,
        "keyword": string_to_keyword, "keyword?": string_to_keyword,
        "qualified-keyword": string_to_keyword,
        "symbol": string_to_keyword, "symbol?": string_to_keyword,
        "uuid": string_to_uuid, "uuid?": string_to_uuid,
        "inst?": string_to_date,
        "set": _list_to_set, "set?": _list_to_set,
        "int": number_to_long, "int?": number_to_long,
        "double": number_to_double, "double?": number_to_double,
    }
    encoders = {
        "keyword": any_to_string, "symbol": any_to_string,
        "uuid": any_to_string, "uuid?": any_to_string,
        "inst?": date_to_string,
        "set": lambda x: sorted(x) if isinstance(x, (set, frozenset)) else x,
    }
    return Transformer("json", decoders=_add_child_compilers(decoders),
                       encoders=_add_child_compilers(encoders))


def collection_transformer() -> Transformer:
    """Sequence/set coercions, same coders for decode AND encode
    (transform.cljc:530-537)."""
    def to_list(x: Any) -> Any:
        return list(x) if isinstance(x, (tuple, set, frozenset)) else x

    coders = {"set": _list_to_set, "set?": _list_to_set,
              "vector": to_list, "sequential": to_list, "tuple": to_list}
    return Transformer("collection", decoders=dict(coders),
                       encoders=dict(coders))


def _default_keep_fn(default_schema: Schema):
    """How a ::m/default schema keeps rest entries, by schema type
    (transform.cljc:466-471 delegates to the default schema's own strip):
    :map-of -> entry key+value validity; :map -> key membership (recursing
    into nested defaults); other -> entry-wise validity."""
    from .core import MapOfSchema
    if isinstance(default_schema, MapOfSchema):
        kv = default_schema.children[0].validator()
        vv = default_schema.children[1].validator()
        return lambda k, v: kv(k) and vv(v)
    if isinstance(default_schema, MapSchema):
        keep = set(default_schema.explicit_keys)
        nested = (None if default_schema.default_entry is None
                  else _default_keep_fn(default_schema.default_entry[2]))
        if nested is None:
            return lambda k, v: k in keep
        return lambda k, v: k in keep or nested(k, v)
    valid = default_schema.validator()
    return lambda k, v: valid({k: v})


def _make_strip_map(schema_: Schema, stage: str):
    if not isinstance(schema_, MapSchema):
        return None
    keep = set(schema_.explicit_keys)
    default_entry = schema_.default_entry

    if default_entry is not None:
        # ::m/default defines how extra keys are stripped
        # (transform_test.cljc:565-585)
        default_keep = _default_keep_fn(default_entry[2])

        def strip_with_default(x: Any) -> Any:
            if not isinstance(x, dict):
                return x
            return {k: v for k, v in x.items()
                    if k in keep or default_keep(k, v)}

        return {stage: strip_with_default}

    def strip(x: Any) -> Any:
        if not isinstance(x, dict):
            return x
        if all(k in keep for k in x):
            return x
        return {k: v for k, v in x.items() if k in keep}

    return {"enter": strip}


def _make_strip_map_of(schema_: Schema, stage: str):
    """:map-of strip: drop entries whose key or value does not validate
    (transform_test.cljc:549-562). On DECODE this runs at LEAVE (composed
    decoders coerce entries first); on ENCODE it runs at ENTER (values must
    be stripped before they are encoded away from the schema's types)."""
    from .core import MapOfSchema
    if not isinstance(schema_, MapOfSchema):
        return None
    kv = schema_.children[0].validator()
    vv = schema_.children[1].validator()

    def strip(x: Any) -> Any:
        if not isinstance(x, dict):
            return x
        return {k: v for k, v in x.items() if kv(k) and vv(v)}

    return {stage: strip}


@_compile_marker
def _strip_map_decode(schema_: Schema, _options: dict):
    return _make_strip_map(schema_, "leave")


@_compile_marker
def _strip_map_encode(schema_: Schema, _options: dict):
    return _make_strip_map(schema_, "enter")


@_compile_marker
def _strip_map_of_decode(schema_: Schema, _options: dict):
    return _make_strip_map_of(schema_, "leave")


@_compile_marker
def _strip_map_of_encode(schema_: Schema, _options: dict):
    return _make_strip_map_of(schema_, "enter")


def strip_extra_keys_transformer() -> Transformer:
    """Drop map keys not in the schema (transform.cljc:460-483)."""
    return Transformer("strip-extra-keys",
                       decoders={"map": _strip_map_decode,
                                 "map-of": _strip_map_of_decode},
                       encoders={"map": _strip_map_encode,
                                 "map-of": _strip_map_of_encode})


def key_transformer(decode: Callable | None = None,
                    encode: Callable | None = None,
                    types=("map",)) -> Transformer:
    """Rename/transform map keys (transform.cljc:485-490, :195-201).

    decode runs on :enter (before entry decoding), encode on :leave
    (after entry encoding) — so e.g. strip-extra-keys in the same chain
    sees the schema's own keys. ``types`` is the set of schema types to
    apply at, or "default" for every type."""

    def make(f, stage):
        if f is None:
            return None

        def tx(x: Any) -> Any:
            if not isinstance(x, dict):
                return x
            return {f(k): v for k, v in x.items()}

        return {stage: tx}

    dec, enc = make(decode, "enter"), make(encode, "leave")
    if types == "default":
        return Transformer("key", default_decoder=dec, default_encoder=enc)
    return Transformer("key",
                       decoders={t: dec for t in types} if dec else {},
                       encoders={t: enc for t in types} if enc else {})


def default_value_transformer(key: str = "default",
                              defaults: dict[str, Any] | None = None,
                              add_optional_keys: bool = False,
                              default_fn: Callable | None = None) -> Transformer:
    """Fill nil/missing values with defaults (transform.cljc:492-528).

    Reference shape: ``set-default`` runs as the DEFAULT decoder/encoder at
    EVERY schema node (so ``[:tuple {:default [1 2]} ...]`` and
    ``[:and {:default false} ...]`` fill on nil), and ``add-defaults`` runs
    at :map nodes filling MISSING entries. Default sources, in order:
    ``<key>/fn`` property (a zero-arg callable), the ``<key>`` property
    (schema or entry properties), then the per-type ``defaults`` table
    (value, or callable of the schema). ``default_fn(schema, v)`` post-
    processes every produced default; optional entries fill only with
    ``add_optional_keys``.
    """
    defaults = defaults or {}
    dfn = default_fn or (lambda _schema, x: x)

    def get_default(schema_: Schema | None, more_props: dict | None):
        """-> zero-arg producer or None (transform.cljc:495-501)."""
        for props in ((schema_.properties if schema_ is not None else None),
                      more_props):
            f = (props or {}).get(f"{key}/fn")
            if f is not None:
                return f
        for props in ((schema_.properties if schema_ is not None else None),
                      more_props):
            if props is not None and key in props:
                v = props[key]
                return lambda: v
        if schema_ is not None and schema_.type in defaults:
            d = defaults[schema_.type]
            return (lambda: d(schema_)) if callable(d) else (lambda: d)
        return None

    @_compile_marker
    def set_default(schema_: Schema, _options: dict):
        f = get_default(schema_, None)
        if f is None:
            return None
        return lambda x: dfn(schema_, f()) if x is None else x

    @_compile_marker
    def add_defaults(schema_: Schema, _options: dict):
        fills = {}
        for (k, props, cs) in schema_.children:
            if k == DEFAULT_KEY:
                continue
            if (props or {}).get("optional") and not add_optional_keys:
                continue
            f = get_default(cs, props)
            if f is None and hasattr(cs, "deref"):
                try:
                    f = get_default(cs.deref(), props)
                except Exception:
                    f = None
            if f is not None:
                fills[k] = f
        if not fills:
            return None

        def fill(x: Any) -> Any:
            if not isinstance(x, dict):
                return x
            out = None
            for k, f in fills.items():
                if k not in x:
                    if out is None:
                        out = dict(x)
                    out[k] = dfn(schema_, f())
            return x if out is None else out

        return fill

    return transformer(
        {"default-decoder": set_default, "default-encoder": set_default},
        {"decoders": {"map": add_defaults}, "encoders": {"map": add_defaults}})


