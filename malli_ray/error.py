"""Error messages + humanize — the malli.error surface.

Reimplements the semantics of /root/reference/src/malli/error.cljc:
message catalog (:44-172), resolution chain schema-props -> type-props ->
catalog-by-error-type -> catalog-by-schema-type -> default (:293-310),
``humanize`` building a message tree mirroring the value's shape (:379-395,
-push-in :200-215), and Levenshtein spell-checking for misspelled map keys
(:250-281, 344-377).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

from .core import Schema

__all__ = ["error_message", "humanize", "with_spell_checking", "MESSAGE_CATALOG"]

DEFAULT_LOCALE = "en"


def _fmt_bounds(unit: str):
    def fn(error: dict, _opts: dict) -> str:
        props = _schema_properties(error)
        mn, mx = props.get("min"), props.get("max")
        u = f" {unit}" if unit else ""

        def plural(n):
            if not unit:
                return ""
            return f" {unit}" if n == 1 else f" {unit}s"

        if mn is not None and mx is not None:
            return f"should be between {mn} and {mx}{plural(mx)}"
        if mn is not None:
            return f"should be at least {mn}{plural(mn)}"
        return f"should be at most {mx}{plural(mx)}"

    return fn


def _schema_properties(error: dict) -> dict:
    s = error.get("schema")
    return s.properties if isinstance(s, Schema) else {}


def _schema_children(error: dict) -> list:
    s = error.get("schema")
    return s.children if isinstance(s, Schema) else []


def _enum_message(error: dict, _opts: dict) -> str:
    vals = [repr(c) for c in _schema_children(error)]
    if len(vals) == 1:
        return f"should be {vals[0]}"
    return "should be either " + ", ".join(vals[:-1]) + f" or {vals[-1]}"


def _comparator_message(template: str):
    def fn(error: dict, _opts: dict) -> str:
        cs = _schema_children(error)
        return template.format(cs[0] if cs else "?")

    return fn


def _bounded_type_message(noun: str, unit: str):
    """Type schemas with :min/:max — bounds message when bounded, noun otherwise."""
    bounds = _fmt_bounds(unit)

    def fn(error: dict, opts: dict) -> str:
        props = _schema_properties(error)
        value = error.get("value")
        type_ok = opts.get("__value_type_ok__")
        if ("min" in props or "max" in props) and type_ok and type_ok(value):
            return bounds(error, opts)
        return noun

    return fn


#: (scope, key) -> str | fn(error, opts).  Scope "type" = error :type keyword,
#: scope "schema" = schema type.  Port of error.cljc:44-172 (:en locale).
MESSAGE_CATALOG: dict[tuple[str, str], Any] = {
    ("type", "malli.core/missing-key"): "missing required key",
    ("type", "malli.core/extra-key"): "disallowed key",
    ("type", "malli.core/invalid-type"): "invalid type",
    ("type", "malli.core/invalid-dispatch-value"): "invalid dispatch value",
    ("type", "malli.core/end-of-input"): "end of input",
    ("type", "malli.core/input-remaining"): "input remaining",
    ("type", "malli.core/tuple-size"): lambda e, o: (
        f"invalid tuple size {len(e.get('value') or [])}, expected {len(_schema_children(e))}"),
    ("type", "malli.core/limits"): _fmt_bounds("element"),

    ("schema", "any"): "should be any",
    ("schema", "nil"): "should be nil",
    ("schema", "string"): lambda e, o: _bounded_type_message(
        "should be a string", "character")(e, {**o, "__value_type_ok__": lambda v: isinstance(v, str)}),
    ("schema", "int"): lambda e, o: _bounded_type_message(
        "should be an integer", "")(e, {**o, "__value_type_ok__":
                                        lambda v: isinstance(v, int) and not isinstance(v, bool)}),
    ("schema", "integer"): "should be an integer",
    ("schema", "double"): lambda e, o: _bounded_type_message(
        "should be a double", "")(e, {**o, "__value_type_ok__":
                                      lambda v: isinstance(v, (int, float)) and not isinstance(v, bool)}),
    ("schema", "float"): "should be a float",
    ("schema", "number"): "should be a number",
    ("schema", "boolean"): "should be a boolean",
    ("schema", "keyword"): "should be a keyword",
    ("schema", "symbol"): "should be a symbol",
    ("schema", "uuid"): "should be a uuid",
    ("schema", "enum"): _enum_message,
    ("schema", "re"): "should match regex",
    ("schema", "fn"): "should apply function",
    ("schema", "maybe"): "should be nil or satisfy the child schema",
    ("schema", "map"): "should be a map",
    ("schema", "map-of"): "should be a map",
    ("schema", "vector"): "should be a vector",
    ("schema", "sequential"): "should be a sequence",
    ("schema", "set"): "should be a set",
    ("schema", "tuple"): "should be a tuple",
    ("schema", ">"): _comparator_message("should be larger than {}"),
    ("schema", ">="): _comparator_message("should be at least {}"),
    ("schema", "<"): _comparator_message("should be smaller than {}"),
    ("schema", "<="): _comparator_message("should be at most {}"),
    ("schema", "="): _comparator_message("should be equal to {}"),
    ("schema", "not="): _comparator_message("should not be equal to {}"),

    # predicate schemas (error.cljc:95-170 has the full table; common ones here)
    ("schema", "string?"): "should be a string",
    ("schema", "int?"): "should be an int",
    ("schema", "integer?"): "should be an integer",
    ("schema", "number?"): "should be a number",
    ("schema", "boolean?"): "should be a boolean",
    ("schema", "keyword?"): "should be a keyword",
    ("schema", "symbol?"): "should be a symbol",
    ("schema", "uuid?"): "should be a uuid",
    ("schema", "pos-int?"): "should be a positive int",
    ("schema", "neg-int?"): "should be a negative int",
    ("schema", "nat-int?"): "should be a non-negative int",
    ("schema", "pos?"): "should be positive",
    ("schema", "neg?"): "should be negative",
    ("schema", "zero?"): "should be zero",
    ("schema", "nil?"): "should be nil",
    ("schema", "some?"): "should be some",
    ("schema", "map?"): "should be a map",
    ("schema", "vector?"): "should be a vector",
    ("schema", "set?"): "should be a set",
    ("schema", "coll?"): "should be a collection",
    ("schema", "seqable?"): "should be seqable",
    ("schema", "sequential?"): "should be sequential",
    ("schema", "double?"): "should be a double",
    ("schema", "float?"): "should be a float",
    ("schema", "inst?"): "should be an instant",
    ("schema", "bytes?"): "should be bytes",
    ("schema", "true?"): "should be true",
    ("schema", "false?"): "should be false",
    ("schema", "fn?"): "should be a function",
    ("schema", "ifn?"): "should be an ifn",
    ("schema", "char?"): "should be a char",
    ("schema", "empty?"): "should be empty",
}

_UNKNOWN = "unknown error"


def _resolve(template: Any, error: dict, options: dict) -> str | None:
    if template is None:
        return None
    if isinstance(template, str):
        return template
    if isinstance(template, dict):  # localized {locale: msg}
        locale = options.get("locale", DEFAULT_LOCALE)
        t = template.get(locale) or template.get(DEFAULT_LOCALE)
        return _resolve(t, error, options)
    if callable(template):
        return template(error, options)
    return str(template)


def error_message(error: dict, options: dict | None = None) -> str:
    """Resolve one error to a human message.

    Resolution chain (error.cljc:293-310): schema :error/message ->
    schema :error/fn -> catalog by error :type -> catalog by schema type ->
    "unknown error".
    """
    options = options or {}
    if error.get("message"):
        return error["message"]  # pre-resolved (e.g. with_spell_checking)
    props = _schema_properties(error)
    # :error/fn wins over :error/message when both present
    # (error_test.cljc:21; resolution chain error.cljc:293-310)
    msg = None
    if props.get("error/fn") is not None:
        msg = _resolve(props["error/fn"], error, options)
    if msg is None:
        msg = _resolve(props.get("error/message"), error, options)
    if msg is None and error.get("type"):
        msg = _resolve(MESSAGE_CATALOG.get(("type", error["type"])), error, options)
    if msg is None:
        s = error.get("schema")
        if isinstance(s, Schema):
            msg = _resolve(MESSAGE_CATALOG.get(("schema", s.type)), error, options)
    return msg if msg is not None else _UNKNOWN


def _push_in(acc: Any, path: list, msg: str) -> Any:
    """Build the message tree mirroring the value shape (error.cljc:200-215).

    Leaves are lists of messages; map steps become dicts; index steps become
    None-padded lists.
    """
    if not path:
        if acc is None:
            return [msg]
        if isinstance(acc, list) and all(isinstance(m, str) for m in acc):
            acc.append(msg)
            return acc
        return acc  # conflicting shapes: keep first (malli merges shallowly)
    head, rest = path[0], path[1:]
    if isinstance(head, int):
        if not isinstance(acc, list) or (acc and all(isinstance(m, str) for m in acc)):
            acc = [] if acc is None else acc
            if not isinstance(acc, list):
                acc = []
        while len(acc) <= head:
            acc.append(None)
        acc[head] = _push_in(acc[head], rest, msg)
        return acc
    if not isinstance(acc, dict):
        acc = {}
    acc[head] = _push_in(acc.get(head), rest, msg)
    return acc


def humanize(explanation: dict | None, options: dict | None = None,
             resolve: Callable | None = None) -> Any:
    """Explanation -> human message tree (error.cljc:379-395).

    A schema's ``error/path`` property redirects where its message lands in
    the tree (error.cljc:218-222; error_test.cljc:263-276)."""
    if explanation is None:
        return None
    options = options or {}
    resolve = resolve or error_message
    out: Any = None
    for e in explanation.get("errors", []):
        msg = resolve(e, options)
        in_ = list(e.get("in", []))
        extra = _schema_properties(e).get("error/path")
        if extra:
            in_ = in_ + list(extra)
        out = _push_in(out, in_, msg)
    return out


# -- spell checking ---------------------------------------------------------


def _levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def with_spell_checking(explanation: dict | None, options: dict | None = None) -> dict | None:
    """Rewrite likely-misspelled extra keys (error.cljc:250-281, 344-377).

    ``malli.core/extra-key`` errors whose key is within edit distance 2 of a
    known key become ``malli.error/misspelled-key`` errors carrying
    ``likely-misspelling-of`` and a "should be spelled ..." message
    (error_test.cljc:37-60 shape).
    """
    if explanation is None:
        return None
    out = dict(explanation)
    errors = []
    for e in explanation.get("errors", []):
        if e.get("type") == "malli.core/extra-key" and isinstance(e.get("schema"), Schema):
            s = e["schema"]
            known = [str(k) for k in getattr(s, "explicit_keys", [])]
            bad = str(e["path"][-1]) if e.get("path") else ""
            best = sorted(
                ((k, _levenshtein(bad, k)) for k in known), key=lambda kv: kv[1])
            if best and best[0][1] <= 2:
                likely = [b for (b, d) in best if d == best[0][1]]
                e = dict(e)
                e["type"] = "malli.error/misspelled-key"
                e["likely-misspelling-of"] = likely
                e["message"] = "should be spelled " + " or ".join(
                    repr(k) for k in likely)
        errors.append(e)
    out["errors"] = errors
    return out
