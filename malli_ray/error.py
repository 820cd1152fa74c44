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

__all__ = ["error_message", "humanize", "with_spell_checking", "error_value",
           "resolve_root_error", "MESSAGE_CATALOG"]

DEFAULT_LOCALE = "en"


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


def _comparator_message(template: str, complement: str | None = None):
    """Comparator messages; under negation the message FORWARDS to the
    complement comparator ("not >" reads "at most", error.cljc:145-168)."""
    def fn(error: dict, opts: dict) -> str:
        cs = _schema_children(error)
        child = cs[0] if cs else "?"
        negated = error.get("negated")
        if callable(negated) and complement is not None:
            comp_err = {k: v for k, v in error.items() if k != "negated"}
            from .core import schema as _schema
            comp_err["schema"] = _schema([complement, child])
            return negated(error_message(comp_err, opts))
        v = error.get("value")
        if not (isinstance(v, (int, float)) and not isinstance(v, bool)):
            return "should be a number"  # (number? value) guard
        return template.format(child)

    return fn


def _bounded_type_message(noun: str, unit: str, measure=None):
    """Type schemas with :min/:max — VALUE-AWARE bound selection
    (error.cljc:127-139 :string fn / :9-18 -pred-min-max-error-fn): wrong
    type -> noun; min == max -> exact; measure below min (negated: at or
    above min) -> at-least; else at-most. Never a 'between' message."""

    def plural(n):
        if not unit:
            return ""
        return f" {unit}" if n == 1 else f" {unit}s"

    def fn(error: dict, opts: dict) -> str:
        props = _schema_properties(error)
        value = error.get("value")
        type_ok = opts.get("__value_type_ok__")
        if not (type_ok and type_ok(value)):
            return noun
        mn, mx = props.get("min"), props.get("max")
        if mn is None and mx is None:
            return noun
        x = measure(value) if measure else value
        negated = callable(error.get("negated"))
        if mn is not None and mn == mx:
            return f"should be {mn}{plural(mn)}"
        if mn is not None and ((x >= mn) if negated else (x < mn)):
            return f"should be at least {mn}{plural(mn)}"
        if mx is not None:
            return f"should be at most {mx}{plural(mx)}"
        return noun

    return fn


def _limits_message(error: dict) -> str:
    """::m/limits (error.cljc:47-52): min==max -> exact, value too short ->
    at-least, else at-most."""
    props = _schema_properties(error)
    mn, mx = props.get("min"), props.get("max")
    try:
        n = len(error.get("value") or [])
    except TypeError:
        n = 0
    if mn is not None and mn == mx:
        return f"should have {mn} elements"
    if mn is not None and n < mn:
        return f"should have at least {mn} elements"
    if mx is not None:
        return f"should have at most {mx} elements"
    return None  # reference cond falls through -> "unknown error"


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
    ("type", "malli.core/limits"): lambda e, _o: _limits_message(e),

    ("schema", "any"): "should be any",
    ("schema", "nil"): "should be nil",
    ("schema", "string"): lambda e, o: _bounded_type_message(
        "should be a string", "character", measure=len)(
            e, {**o, "__value_type_ok__": lambda v: isinstance(v, str)}),
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
    # :fn has NO catalog message in the reference -> "unknown error"
    # (humanize-throws-test-1271)
    ("schema", "maybe"): "should be nil or satisfy the child schema",
    ("schema", "=>"): "should be a valid function",
    ("schema", "->"): "should be a valid function",
    ("schema", "function"): "should be a valid function",
    ("schema", "map"): "should be a map",
    ("schema", "map-of"): "should be a map",
    ("schema", "vector"): "should be a vector",
    ("schema", "sequential"): "should be a sequence",
    ("schema", "set"): "should be a set",
    ("schema", "tuple"): "should be a tuple",
    ("schema", ">"): _comparator_message("should be larger than {}", "<="),
    ("schema", ">="): _comparator_message("should be at least {}", "<"),
    ("schema", "<"): _comparator_message("should be smaller than {}", ">="),
    ("schema", "<="): _comparator_message("should be at most {}", ">"),
    # := / :not= use -pr-str of the literal (error.cljc:169-172)
    ("schema", "="): lambda e, _o: "should be " + repr(
        (_schema_children(e) or ["?"])[0]),
    ("schema", "not="): lambda e, _o: "should not be " + repr(
        (_schema_children(e) or ["?"])[0]),

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
    ("schema", "coll?"): "should be a coll",
    ("schema", "seqable?"): "should be seqable",
    ("schema", "sequential?"): "should be sequential",
    ("schema", "double?"): "should be a double",
    ("schema", "float?"): "should be a float",
    ("schema", "inst?"): "should be an inst",
    ("schema", "bytes?"): "should be bytes",
    ("schema", "true?"): "should be true",
    ("schema", "false?"): "should be false",
    ("schema", "fn?"): "should be a fn",
    ("schema", "ifn?"): "should be an ifn",
    ("schema", "char?"): "should be a char",
    ("schema", "empty?"): "should be empty",
    ("schema", "any?"): "should be any",
    ("schema", "any"): "should be any",
    ("schema", "nil"): "should be nil",
    ("schema", "ident?"): "should be an ident",
    ("schema", "simple-ident?"): "should be a simple ident",
    ("schema", "qualified-ident?"): "should be a qualified ident",
    ("schema", "simple-keyword?"): "should be a simple keyword",
    ("schema", "qualified-keyword?"): "should be a qualified keyword",
    ("schema", "simple-symbol?"): "should be a simple symbol",
    ("schema", "qualified-symbol?"): "should be a qualified symbol",
    ("schema", "uri?"): "should be a uri",
    ("schema", "decimal?"): "should be a decimal",
    ("schema", "indexed?"): "should be indexed",
    ("schema", "list?"): "should be a list",
    ("schema", "seq?"): "should be a seq",
    ("schema", "rational?"): "should be a rational",
    ("schema", "associative?"): "should be associative",
    ("schema", "ratio?"): "should be a ratio",
}


_NEGATED_MARK = "\x00negated\x00"


def _not_message(error: dict, options: dict) -> str | None:
    """:not humanization (error.cljc:21-42, 123-124): resolve the CHILD's
    message with a ``negated`` marker callable — a negation-aware child
    message (comparator complements, custom :error/fn negation) returns
    through the marker as-is; otherwise the "should "/"should not " prefix
    flips. Double negation unwraps (outer :not passes the original error's
    ``negated`` through)."""
    s = error.get("schema")
    child = s.children[0] if isinstance(s, Schema) and s.children else None
    if child is None:
        return None
    outer_negated = error.get("negated")
    if callable(outer_negated):
        # [:not [:not X]]: cancel out — resolve X without negation
        inner_err = {k: v for k, v in error.items()
                     if k not in ("message", "negated")}
        inner_err["schema"] = child
        return outer_negated(error_message(inner_err, options))
    inner_err = {k: v for k, v in error.items() if k != "message"}
    inner_err["schema"] = child
    inner_err["negated"] = lambda msg: (
        _NEGATED_MARK + msg if isinstance(msg, str) else msg)
    inner = error_message(inner_err, {**options, "unknown": False})
    if not isinstance(inner, str):
        return None
    if inner.startswith(_NEGATED_MARK):
        return inner[len(_NEGATED_MARK):]
    if inner.startswith("should not "):
        return "should " + inner[len("should not "):]
    if inner.startswith("should "):
        return "should not " + inner[len("should "):]
    return None


MESSAGE_CATALOG[("schema", "not")] = _not_message

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


def _entry_message(entry: Any, error: dict, options: dict) -> str | None:
    """Resolve one catalog entry: either a bare template (string / locale
    dict / callable) or a properties-shaped map ``{"error/fn": ...,
    "error/message": ...}`` as in the reference's default-errors
    (error.cljc:44-60)."""
    if entry is None:
        return None
    if isinstance(entry, dict) and ("error/message" in entry
                                    or "error/fn" in entry):
        msg = None
        if entry.get("error/fn") is not None:
            msg = _resolve(entry["error/fn"], error, options)
        if msg is None:
            msg = _resolve(entry.get("error/message"), error, options)
        return msg
    return _resolve(entry, error, options)


def error_message(error: dict, options: dict | None = None) -> str:
    """Resolve one error to a human message.

    Resolution chain (error.cljc:293-310): schema :error/message ->
    schema :error/fn -> catalog by error :type -> catalog by schema type ->
    "unknown error".  An ``options["errors"]`` map REPLACES the default
    catalog (reference ``:or {errors default-errors}`` — no merge), keyed
    by plain error/schema type with properties-shaped entries.
    """
    options = options or {}
    if error.get("message"):
        return error["message"]  # pre-resolved (e.g. with_spell_checking)
    props = _schema_properties(error)
    cat = options.get("errors")
    # :error/fn wins over :error/message when both present
    # (error_test.cljc:21; resolution chain error.cljc:293-310)
    msg = None
    if props.get("error/fn") is not None:
        msg = _resolve(props["error/fn"], error, options)
    if msg is None:
        msg = _resolve(props.get("error/message"), error, options)
    if msg is None and error.get("type"):
        entry = (cat.get(error["type"]) if cat is not None
                 else MESSAGE_CATALOG.get(("type", error["type"])))
        msg = _entry_message(entry, error, options)
    if msg is None:
        s = error.get("schema")
        if isinstance(s, Schema):
            entry = (cat.get(s.type) if cat is not None
                     else MESSAGE_CATALOG.get(("schema", s.type)))
            msg = _entry_message(entry, error, options)
    if msg is None and not options.get("unknown", True):
        return None
    if cat is not None:
        # custom catalog supplies its own ::unknown (or none at all)
        if msg is None:
            msg = _entry_message(cat.get("malli.error/unknown"), error, options)
        return msg if msg is not None else _UNKNOWN
    return msg if msg is not None else _UNKNOWN


class _Errs(list):
    """Error leaf — the metadata-tagged message vector (-error/-error?,
    error.cljc:182-183). A list SUBCLASS so a value that happens to be a
    list of strings is never mistaken for one; compares equal to plain
    lists for callers."""


def _is_error_leaf(a: Any) -> bool:
    return isinstance(a, _Errs)


def _acc_get(x: Any, k: Any) -> Any:
    if isinstance(x, dict):
        return x.get(k)
    if isinstance(x, (list, tuple)) and isinstance(k, int) \
            and not isinstance(k, bool) and 0 <= k < len(x):
        return x[k]
    return None


def _val_get(v: Any, k: Any) -> Any:
    """-get (error.cljc:185): map lookup, or positional for sequentials."""
    if isinstance(v, dict):
        return v.get(k)
    if isinstance(v, (list, tuple)) and isinstance(k, int) \
            and not isinstance(k, bool) and 0 <= k < len(v):
        return v[k]
    return None


def _push(x: Any, k: Any, v: Any) -> Any:
    """-push (error.cljc:188-197): pad-and-set for non-negative ints on
    sequential accumulators, assoc for maps (or nil -> a fresh map); a
    non-indexable key on a vector degrades to the literal
    ``["invalid type"]`` (humanize-throws-test-1271)."""
    if isinstance(x, list) and not isinstance(x, _Errs):
        if isinstance(k, int) and not isinstance(k, bool) and k >= 0:
            while len(x) <= k:
                x.append(None)
            x[k] = v
            return x
        return ["invalid type"]
    if x is None:
        return {k: v}
    if isinstance(x, dict):
        x[k] = v
        return x
    return ["invalid type"]


def _push_in(acc: Any, value: Any, path: list, msg: str) -> Any:
    """Build the message tree mirroring the VALUE's shape (-push-in,
    error.cljc:200-215): the accumulator at each level is seeded from the
    value there (sequential -> list, map -> dict, else nil), an existing
    error leaf blocks deeper pushes, a rootless error on a map accumulator
    goes under ``malli/error``, and on a non-empty indexed accumulator it
    is dropped (child value errors win)."""
    aprime = acc
    if aprime is None:
        if isinstance(value, (list, tuple, set, frozenset)):
            aprime = []
        elif isinstance(value, dict):
            aprime = {}
    if path:
        head, rest = path[0], path[1:]
        if _is_error_leaf(aprime):
            return acc
        inner = _push_in(_acc_get(aprime, head), _val_get(value, head),
                         rest, msg)
        return _push(aprime, head, inner)
    if isinstance(acc, dict):  # map? of the ORIGINAL accumulator
        return _push_in(acc, value, ["malli/error"], msg)
    if _is_error_leaf(aprime):
        aprime.append(msg)
        return aprime
    if isinstance(aprime, list) and aprime:
        return aprime
    return _Errs([msg])


def humanize(explanation: dict | None, options: dict | None = None,
             resolve: Callable | None = None) -> Any:
    """Explanation -> human message tree (error.cljc:379-395).

    A schema's ``error/path`` property redirects where its message lands in
    the tree (error.cljc:218-222; error_test.cljc:263-276)."""
    if explanation is None:
        return None
    options = options or {}
    resolve = resolve or options.get("resolve") or error_message
    out: Any = None
    for e in explanation.get("errors", []):
        if getattr(resolve, "__takes_explanation__", False):
            in_, msg = resolve(explanation, e, options)
            in_ = list(in_)
        else:
            msg = resolve(e, options)
            in_ = list(e.get("in", []))
            extra = _schema_properties(e).get("error/path")
            if extra:
                in_ = in_ + list(extra)
        out = _push_in(out, explanation.get("value"), in_, msg)
    return out


def _explicit_message(s: "Schema", error: dict, options: dict) -> str | None:
    """A message defined ON the schema (props / type-properties
    :error/message|:error/fn) — never the catalog."""
    for props in (s.properties or {}, getattr(s, "type_properties", None) or {}):
        err = {**error, "schema": s}
        msg = _resolve(props.get("error/fn"), err, options)
        if msg is None:
            msg = _resolve(props.get("error/message"), err, options)
        if msg is not None:
            return msg
    return None


def resolve_root_error(explanation: dict, error: dict,
                       options: dict | None = None):
    """me/-resolve-root-error analog (error.cljc:315-329): walk the error's
    schema path from the ROOT down; the first schema or map entry that
    defines an EXPLICIT :error/message / :error/fn supplies the message and
    the tree position; otherwise the error's own message at its own path.

    Pass as ``humanize(e, resolve=resolve_root_error)``.
    """
    from . import util as mu
    options = dict(options or {})
    root = explanation.get("schema")
    path = list(error.get("path", []))
    has_in = bool(error.get("in"))

    def in_of(prefix: list) -> list:
        if not has_in:
            return []
        try:
            return list(mu.path_to_in(root, prefix))
        except Exception:
            return list(error.get("in", []))

    if isinstance(root, Schema):
        for cut in range(len(path) + 1):
            prefix = path[:cut]
            try:
                sub = mu.get_in(root, prefix)
            except Exception:
                sub = None
            if isinstance(sub, Schema):
                msg = _explicit_message(sub, error, options)
                if msg is not None:
                    return in_of(prefix), msg
                if cut < len(path):
                    key = path[cut]
                    try:
                        found = mu.find(sub, key)
                    except Exception:
                        found = None
                    if found is not None:
                        _k, eprops, child = found
                        if eprops:
                            merged = dict(child.properties or {})
                            merged.update(eprops)
                            proxy = _PropsProxy(child, merged)
                            msg = _explicit_message(proxy, error, options)
                            if msg is not None:
                                return in_of(prefix + [key]), msg
    return list(error.get("in", [])), error_message(error, options)


resolve_root_error.__takes_explanation__ = True


class _PropsProxy:
    """A schema view with overridden properties (entry props merged over the
    child schema — mu/update-properties in -resolve-root-error)."""

    def __init__(self, schema: "Schema", props: dict):
        self._schema = schema
        self.properties = props
        self.type_properties = getattr(schema, "type_properties", None)

    def __getattr__(self, name):
        return getattr(self._schema, name)


# -- error-value (the parts of the value that are in error) -----------------

_NOTHING = object()


def _ev_get(x: Any, k: Any) -> Any:
    if isinstance(x, dict):
        return x.get(k)
    if isinstance(x, (set, frozenset)):
        return k if k in x else None
    if isinstance(x, (list, tuple)):
        return x[k] if isinstance(k, int) and 0 <= k < len(x) else None
    return None


def _ev_empty_like(v: Any) -> Any:
    if isinstance(v, dict):
        return {}
    if isinstance(v, (set, frozenset)):
        return set()
    if isinstance(v, (list, tuple)):
        return []
    return {}


def _ev_push(x: Any, k: Any, v: Any, fill: Any) -> Any:
    """-push (error.cljc:189-198): assoc into map/set/sequence, padding
    sequences with ``fill`` up to index ``k``."""
    if isinstance(x, (set, frozenset)):
        out = set(x)
        out.add(v)
        return out
    if isinstance(x, list):
        out = list(x)
        if isinstance(k, int):
            while len(out) <= k:
                out.append(fill)
            out[k] = v
            return out
        return out + [v]
    out = dict(x) if isinstance(x, dict) else {}
    out[k] = v
    return out


def _ev_replace_in(a: Any, v: Any, path: list, e: Any, fill: Any) -> Any:
    """-replace-in (error.cljc:228-230): build (or extend) the error-only
    skeleton of ``v`` along ``path``, placing ``e`` at the leaf."""
    if not path:
        return e
    aa = a if a is not None else _ev_empty_like(v)
    p, rest = path[0], path[1:]
    if isinstance(aa, (set, frozenset)):
        aa = set(aa)
        aa.discard(p)
    return _ev_push(aa, p,
                    _ev_replace_in(_ev_get(a, p), _ev_get(v, p), rest, e, fill),
                    fill)


def _ev_masked(mask: Any, x: Any, y: Any) -> Any:
    """-masked (error.cljc:239-245): fill the valid parts of ``x`` (the
    original value) absent from the error skeleton ``y`` with ``mask``."""
    nested = isinstance(x, dict) and (isinstance(y, dict) or y is None)
    if nested:
        acc = dict(y) if isinstance(y, dict) else {}
        for k, v in x.items():
            if isinstance(y, dict) and k in y:
                acc[k] = _ev_masked(mask, v, y[k])
            else:
                acc[k] = mask
        return acc
    if isinstance(x, (set, frozenset)):
        out = set(y) if isinstance(y, (set, frozenset)) else set()
        if len(x) != len(out):
            out.add(mask)
        return out
    if isinstance(x, (list, tuple)) and isinstance(y, list):
        out = list(y)
        while len(out) < len(x):
            out.append(mask)
        return out
    return y


def error_value(explanation: dict | None, options: dict | None = None) -> Any:
    """The parts of the value that are in error (me/error-value,
    error.cljc:232-247, 397-408).

    Options (snake_case analogs of the ``::me/*`` keys):
      - ``mask_valid_values``: value to mask valid parts with
      - ``keep_valid_values``: keep valid values (overrides mask)
      - ``accept_error``: predicate on error maps (default: everything
        except ``malli.core/missing-key``)
      - ``wrap_error``: fn error-map -> painted value (default: its value)
    """
    if explanation is None:
        return None
    options = options or {}
    mask = options.get("mask_valid_values", _NOTHING)
    accept = options.get(
        "accept_error",
        lambda e: e.get("type") != "malli.core/missing-key")
    wrap = options.get("wrap_error", lambda e: e.get("value"))
    value = explanation.get("value")
    fill = None if mask is _NOTHING else mask
    acc = value if options.get("keep_valid_values") else None
    for e in explanation.get("errors", []):
        if accept(e):
            acc = _ev_replace_in(acc, value, list(e.get("in", [])), wrap(e),
                                 fill)
    if mask is not _NOTHING:
        acc = _ev_masked(mask, value, acc)
    return acc


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


def _length_threshold(n: int) -> int:
    """-length->threshold (error.cljc:250-251)."""
    for lim, t in ((2, 0), (5, 1), (6, 2), (11, 3), (20, 4)):
        if n <= lim:
            return t
    return int(0.2 * n)


def _similar_key(bad: Any, cand: Any) -> int | None:
    """-similar-key (error.cljc:267-270): edit distance within the
    length-scaled threshold."""
    a, b = str(bad), str(cand)
    d = _levenshtein(a, b)
    return d if d <= _length_threshold(min(len(a), len(b))) else None


def _get_in(value: Any, path: list) -> Any:
    for p in path:
        if isinstance(value, dict):
            value = value.get(p)
        elif isinstance(value, (list, tuple)) and isinstance(p, int) and p < len(value):
            value = value[p]
        else:
            return None
    return value


def with_spell_checking(explanation: dict | None, options: dict | None = None) -> dict | None:
    """Rewrite likely-misspelled keys and :multi dispatch values
    (error.cljc:250-281, 344-377).

    ``malli.core/extra-key`` errors similar to a known (absent) entry key
    become ``malli.error/misspelled-key``; ``malli.core/invalid-dispatch-
    value`` with a map-key dispatch becomes ``malli.error/misspelled-value``
    ("did you mean ..."). ``likely-misspelling-of`` holds FULL paths; the
    corresponding ``missing-key`` errors are stripped unless
    ``keep-likely-misspelled-of`` is set (error_test.cljc:36-104 shapes).
    """
    if explanation is None:
        return None
    keep = bool((options or {}).get("keep-likely-misspelled-of"))
    likely_paths: set = set()
    errors = []
    for e in explanation.get("errors", []):
        s = e.get("schema")
        t = e.get("type")
        found = None  # (error-type, bad-key, known, present)
        if t == "malli.core/extra-key" and isinstance(s, Schema):
            value = _get_in(explanation.get("value"), list(e.get("path", []))[:-1])
            present = set(value.keys()) if isinstance(value, dict) else set()
            known = list(getattr(s, "explicit_keys", None) or
                         [k for (k, _, _) in s.children])
            bad = e["path"][-1] if e.get("path") else ""
            found = ("malli.error/misspelled-key", bad, known, present,
                     "should be spelled ")
        elif (t == "malli.core/invalid-dispatch-value" and isinstance(s, Schema)
              and getattr(s, "dispatch_key", None) is not None):
            value = _get_in(explanation.get("value"), list(e.get("path", []))[:-1])
            bad = value.get(s.dispatch_key) if isinstance(value, dict) else None
            known = list(getattr(s, "branches", {}).keys())
            found = ("malli.error/misspelled-value", bad, known, {bad},
                     "did you mean ")
        if found is not None:
            err_type, bad, known, present, prefix = found
            sims = sorted(
                ((d, k) for k in known if k not in present
                 for d in [_similar_key(bad, k)] if d is not None))
            if sims:
                likely = [list(e.get("path", []))[:-1] + [k] for (_, k) in sims]
                likely_paths.update(tuple(p) for p in likely)
                e = dict(e)
                e["type"] = err_type
                e["likely-misspelling-of"] = likely
                e["message"] = prefix + " or ".join(repr(p[-1]) for p in likely)
        errors.append(e)
    if not keep:
        errors = [e for e in errors
                  if not (e.get("type") == "malli.core/missing-key"
                          and tuple(e.get("path", [])) in likely_paths)]
    out = dict(explanation)
    out["errors"] = errors
    return out
