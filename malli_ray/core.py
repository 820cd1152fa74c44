"""Row-level schema core: the malli semantics contract, from scratch in Python.

Implements the vector-DSL schema language and the compile-once API surface of
metosin/malli (``validate`` / ``explain`` / ``parse`` / ``unparse`` / ``decode``
/ ``encode`` / ``coerce``) over plain Python values.  This module is pure
Python and driver-side; the vectorized Arrow path (``malli_ray.arrow_compile``)
compiles the *same* schema trees into pyarrow.compute plans, and falls back to
this row engine for non-vectorizable schemas and for violation-row emission.

Semantics reference (file:line into /root/reference, metosin/malli):
  - schema parsing / registry lookup: src/malli/core.cljc:2567-2589
  - Schema protocol (-validator/-explainer/-parser/...): src/malli/core.cljc:30-43
  - error data model {:path :in :schema :value :type}: src/malli/impl/util.cljc:19-21
  - per-type validators: src/malli/core.cljc:765-2064 (see SURVEY.md SS2.2)
  - min/max property predicates: src/malli/core.cljc:726-755

Divergences from the Clojure reference (documented, deliberate):
  - keywords/symbols are Python strings (``keyword?`` == ``str``);
  - ``:fn`` accepts Python callables or source strings evaluated in a
    restricted namespace (reference uses sci: src/malli/core.cljc:2897-2916);
  - ratios map to ``fractions.Fraction``, insts to ``datetime``.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import fractions as _fractions
import math
import re as _re
import uuid as _uuid
from collections.abc import Hashable
from typing import Any, Callable, Optional

__all__ = [
    "Invalid", "INVALID", "Tag", "Tags", "SchemaError", "Schema",
    "schema", "validate", "validator", "explain", "explainer",
    "parse", "parser", "unparse", "unparser",
    "tag", "tags", "old_parse_format", "parser_info",
    "is_schema", "into_schema", "type_properties", "options",
    "deref_all", "deref_recursive", "explicit_keys", "default_schema",
    "schema_walker",
    "decode", "decoder", "encode", "encoder", "coerce", "coercer",
    "form", "properties", "children", "entries", "schema_type", "walk",
    "default_registry", "register_type", "ast", "from_ast", "deref",
    "MISSING", "DEFAULT_KEY",
]

# --------------------------------------------------------------------------
# sentinels & tagged values
# --------------------------------------------------------------------------


class Invalid:
    """Singleton parse-failure sentinel (= ``:malli.core/invalid``)."""

    _instance: Optional["Invalid"] = None

    def __new__(cls) -> "Invalid":
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self) -> str:  # pragma: no cover
        return ":malli.core/invalid"

    def __bool__(self) -> bool:
        return False


INVALID = Invalid()

_MISSING = object()  # internal not-found sentinel (mirrors -lookup sentinel)
MISSING = _MISSING

#: the ``::m/default`` entry / branch key (src/malli/core.cljc:587)
DEFAULT_KEY = "malli.core/default"


class Tag:
    """Tagged parse result for :orn / :altn / :multi branches.

    Reference: ``Tag`` deftype, src/malli/core.cljc:164-183.
    """

    __slots__ = ("key", "value")

    def __init__(self, key: Any, value: Any):
        self.key = key
        self.value = value

    def __eq__(self, other: Any) -> bool:
        return isinstance(other, Tag) and other.key == self.key and other.value == self.value

    def __hash__(self) -> int:
        return hash(("malli.Tag", self.key))

    def __repr__(self) -> str:
        return f"Tag({self.key!r}, {self.value!r})"


class Tags:
    """Named parse results for :catn / :andn.

    Reference: ``Tags`` deftype, src/malli/core.cljc:185-195.
    """

    __slots__ = ("values",)

    def __init__(self, values: dict):
        self.values = values

    def __eq__(self, other: Any) -> bool:
        return isinstance(other, Tags) and other.values == self.values

    def __hash__(self) -> int:
        return hash(("malli.Tags", tuple(sorted(map(str, self.values)))))

    def __repr__(self) -> str:
        return f"Tags({self.values!r})"


class SchemaError(ValueError):
    """Raised on malformed schema forms or failed coercion."""

    def __init__(self, message: str, data: Any = None):
        super().__init__(message)
        self.data = data


def _error(path: list, in_: list, schema_: "Schema", value: Any, type_: str | None = None) -> dict:
    """Build one explain error map. Reference: miu/-error impl/util.cljc:19-21."""
    e = {"path": list(path), "in": list(in_), "schema": schema_, "value": value}
    if type_ is not None:
        e["type"] = type_
    return e


# --------------------------------------------------------------------------
# predicate library (Clojure predicate schemas -> Python)
# --------------------------------------------------------------------------


def _is_int(x: Any) -> bool:
    return isinstance(x, int) and not isinstance(x, bool)


def _is_number(x: Any) -> bool:
    return isinstance(x, (int, float, _decimal.Decimal, _fractions.Fraction)) and not isinstance(x, bool)


def _is_float(x: Any) -> bool:
    return isinstance(x, float)


def _is_string(x: Any) -> bool:
    return isinstance(x, str)


def _is_bool(x: Any) -> bool:
    return isinstance(x, bool)


def _is_coll(x: Any) -> bool:
    return isinstance(x, (list, tuple, set, frozenset, dict))


def _is_seqable(x: Any) -> bool:
    return x is None or isinstance(x, (list, tuple, set, frozenset, dict, str, bytes, range))


def _safe_nonempty(x: Any) -> bool:
    try:
        return len(x) == 0
    except TypeError:
        return False


#: predicate schemas, src/malli/core.cljc:2929-2940 (predicate registry)
PREDICATES: dict[str, Callable[[Any], bool]] = {
    "any?": lambda x: True,
    "some?": lambda x: x is not None,
    "number?": _is_number,
    "integer?": _is_int,
    "int?": _is_int,
    "pos-int?": lambda x: _is_int(x) and x > 0,
    "neg-int?": lambda x: _is_int(x) and x < 0,
    "nat-int?": lambda x: _is_int(x) and x >= 0,
    "pos?": lambda x: _is_number(x) and x > 0,
    "neg?": lambda x: _is_number(x) and x < 0,
    "zero?": lambda x: _is_number(x) and x == 0,
    "float?": lambda x: _is_float(x) or isinstance(x, _decimal.Decimal),
    "double?": _is_float,
    "boolean?": _is_bool,
    "string?": _is_string,
    "ident?": _is_string,
    "simple-ident?": lambda x: _is_string(x) and "/" not in x,
    "qualified-ident?": lambda x: _is_string(x) and "/" in x,
    "keyword?": _is_string,
    "simple-keyword?": lambda x: _is_string(x) and "/" not in x,
    "qualified-keyword?": lambda x: _is_string(x) and "/" in x,
    "symbol?": _is_string,
    "simple-symbol?": lambda x: _is_string(x) and "/" not in x,
    "qualified-symbol?": lambda x: _is_string(x) and "/" in x,
    "uuid?": lambda x: isinstance(x, _uuid.UUID),
    "uri?": lambda x: _is_string(x) and "://" in x,
    "decimal?": lambda x: isinstance(x, _decimal.Decimal),
    "inst?": lambda x: isinstance(x, (_dt.datetime, _dt.date)),
    "seqable?": _is_seqable,
    "indexed?": lambda x: isinstance(x, (list, tuple)),
    "map?": lambda x: isinstance(x, dict),
    "vector?": lambda x: isinstance(x, (list, tuple)),
    "list?": lambda x: isinstance(x, (list, tuple)),
    "seq?": lambda x: isinstance(x, (list, tuple, range)),
    "char?": lambda x: _is_string(x) and len(x) == 1,
    "set?": lambda x: isinstance(x, (set, frozenset)),
    "nil?": lambda x: x is None,
    "false?": lambda x: x is False,
    "true?": lambda x: x is True,
    "coll?": _is_coll,
    "empty?": _safe_nonempty,
    "associative?": lambda x: isinstance(x, (dict, list, tuple)),
    "sequential?": lambda x: isinstance(x, (list, tuple, range)),
    "ratio?": lambda x: isinstance(x, _fractions.Fraction),
    "rational?": lambda x: _is_int(x) or isinstance(x, _fractions.Fraction),
    "bytes?": lambda x: isinstance(x, (bytes, bytearray)),
    "ifn?": callable,
    "fn?": callable,
}


def _safe_count(x: Any) -> int | None:
    """-safe-count, src/malli/core.cljc:738-741."""
    try:
        return len(x)
    except TypeError:
        return None


def _min_max_validator(props: dict, count_based: bool) -> Optional[Callable[[Any], bool]]:
    """-min-max-pred, src/malli/core.cljc:726-736.

    count_based=True -> bounds apply to len(x); False -> to the value itself.
    """
    mn = props.get("min")
    mx = props.get("max")
    if mn is None and mx is None:
        return None

    if count_based:
        def check(x: Any) -> bool:
            n = _safe_count(x)
            if n is None:
                return False
            return (mn is None or n >= mn) and (mx is None or n <= mx)
    else:
        def check(x: Any) -> bool:
            try:
                return (mn is None or x >= mn) and (mx is None or x <= mx)
            except TypeError:
                return False

    return check


def _safe_pred(f: Callable[[Any], bool]) -> Callable[[Any], bool]:
    """-safe-pred: exception -> False. src/malli/core.cljc:209."""

    def safe(x: Any) -> bool:
        try:
            return bool(f(x))
        except Exception:
            return False

    return safe


# --------------------------------------------------------------------------
# Schema base
# --------------------------------------------------------------------------


class Schema:
    """A compiled schema node.

    Mirrors malli's ``Schema`` protocol (src/malli/core.cljc:30-43) with the
    compile-once / cached-artifact invariant (``-cached``,
    src/malli/core.cljc:354-370): ``validator()`` / ``explainer()`` /
    ``parser()`` etc. are built lazily once per schema instance and reused.
    """

    type: str = "__abstract__"

    def __init__(self, type_: str, properties: dict, children: list, options: dict):
        self.type = type_
        self.properties = properties or {}
        self.children = children
        self.options = options
        self._cache: dict[str, Any] = {}

    # -- cached compile surface -------------------------------------------
    def validator(self) -> Callable[[Any], bool]:
        v = self._cache.get("validator")
        if v is None:
            v = self._validator()
            self._cache["validator"] = v
        return v

    def explainer(self) -> Callable[[Any], list]:
        e = self._cache.get("explainer")
        if e is None:
            inner = self._explainer([])
            e = lambda x: inner(x, [], [])
            self._cache["explainer"] = e
        return e

    def parser(self) -> Callable[[Any], Any]:
        p = self._cache.get("parser")
        if p is None:
            p = self._parser()
            self._cache["parser"] = p
        return p

    def unparser(self) -> Callable[[Any], Any]:
        p = self._cache.get("unparser")
        if p is None:
            p = self._unparser()
            self._cache["unparser"] = p
        return p

    # -- per-type compile hooks -------------------------------------------
    def _validator(self) -> Callable[[Any], bool]:
        raise NotImplementedError

    def _explainer(self, path: list) -> Callable[[Any, list, list], list]:
        """Default explainer: validator failure -> one error at (path, in)."""
        valid = self.validator()
        this = self

        def explain_(x: Any, in_: list, acc: list) -> list:
            if not valid(x):
                acc.append(_error(path, in_, this, x))
            return acc

        return explain_

    def _parser(self) -> Callable[[Any], Any]:
        valid = self.validator()
        return lambda x: x if valid(x) else INVALID

    def _unparser(self) -> Callable[[Any], Any]:
        valid = self.validator()
        return lambda x: x if valid(x) else INVALID

    # -- transformer chain -------------------------------------------------
    def _transformer(self, transformer: Any, method: str, options: dict) -> Optional[Callable]:
        """Compose this node's value transform around its children.

        Reference: -parent-children-transformer / -intercepting,
        src/malli/core.cljc:598-622; identity elision per README.md:3767-3790.
        """
        this_t = transformer.value_transformer(self, method, options) if transformer else None
        child_t = self._children_transformer(transformer, method, options)
        return _intercepting(this_t, child_t)

    def _children_transformer(self, transformer: Any, method: str, options: dict) -> Optional[Callable]:
        return None

    # -- introspection -----------------------------------------------------
    @property
    def form(self) -> Any:
        """Original vector form (``m/form``, src/malli/core.cljc:2591-2596)."""
        f = self._cache.get("form")
        if f is None:
            f = self._form()
            self._cache["form"] = f
        return f

    def _form(self) -> Any:
        cs = [_child_form(c) for c in self.children]
        if not cs and not self.properties:
            return self.type
        out: list = [self.type]
        if self.properties:
            out.append(dict(self.properties))
        out.extend(cs)
        return out

    def walk(self, walker: Callable, path: list | None = None) -> Any:
        """Bottom-up postwalk (``m/walk``, src/malli/core.cljc:2628-2641)."""
        path = path or []
        walked = self._walk_children(walker, path)
        return walker(self, path, walked)

    def _walk_children(self, walker: Callable, path: list) -> list:
        out = []
        for i, c in enumerate(self.children):
            if isinstance(c, Schema):
                out.append(c.walk(walker, path + [i]))
            else:
                out.append(c)
        return out

    def deref(self) -> "Schema":
        return self

    def ast(self) -> dict:
        """Lossless AST map in the reference's keyed shape (``m/ast``,
        src/malli/core.cljc:690-719, 2865-2892): single schema child ->
        ``child``; entry children -> ``keys`` with ``order``; one literal
        child -> ``value``; several literals -> ``values``; a local
        ``registry`` property lifts to a top-level map of ASTs."""
        node: dict[str, Any] = {"type": self.type}
        cs = self.children
        if cs and all(isinstance(c, tuple) and len(c) == 3
                      and isinstance(c[2], Schema) for c in cs):
            keys: dict = {}
            for i, (k, p, s) in enumerate(cs):
                entry: dict = {"order": i, "value": s.ast()}
                if p:
                    entry["properties"] = dict(p)
                keys[k] = entry
            node["keys"] = keys
        elif len(cs) == 1 and isinstance(cs[0], Schema):
            node["child"] = cs[0].ast()
        elif cs and all(isinstance(c, Schema) for c in cs):
            node["children"] = [c.ast() for c in cs]
        elif len(cs) == 1:
            node["value"] = cs[0]
        elif cs:
            node["values"] = list(cs)
        return self._finish_ast(node)

    def _finish_ast(self, node: dict) -> dict:
        props = dict(self.properties) if self.properties else None
        if props and "registry" in props:
            reg = props.pop("registry")
            node["registry"] = {
                k: (v.ast() if isinstance(v, Schema)
                    else schema(v, self.options).ast())
                for k, v in reg.items()}
        if props:
            node["properties"] = props
        return node

    def __repr__(self) -> str:
        return f"<Schema {self.form!r}>"

    def __eq__(self, other: Any) -> bool:
        return isinstance(other, Schema) and _form_key(other.form) == _form_key(self.form)

    def __hash__(self) -> int:
        return hash(_form_key(self.form))

    # pickling for shipping compiled schemas to Ray actors: drop the
    # closure cache (rebuilt lazily on the worker, preserving compile-once
    # *per actor* which is exactly the design in SURVEY.md SS2.7).
    def __getstate__(self) -> dict:
        state = dict(self.__dict__)
        state["_cache"] = {}
        return state


def _form_key(form: Any) -> Any:
    if isinstance(form, list):
        return ("__l__",) + tuple(_form_key(f) for f in form)
    if isinstance(form, dict):
        return ("__d__",) + tuple(sorted((k, _form_key(v)) for k, v in form.items()))
    if isinstance(form, set):
        return ("__s__",) + tuple(sorted(map(repr, form)))
    try:
        hash(form)
        return form
    except TypeError:
        return repr(form)


def _child_form(c: Any) -> Any:
    if isinstance(c, Schema):
        return c.form
    if isinstance(c, tuple) and len(c) == 3:  # map entry (key, props, schema)
        k, props, s = c
        sf = _child_form(s)
        return [k, props, sf] if props else [k, sf]
    return c


def _intercepting(this_t: Optional[Callable], child_t: Optional[Callable]) -> Optional[Callable]:
    """Compose {enter, leave} interceptor around the child transform.

    this_t may be a plain callable (== enter) or an {"enter","leave"} dict.
    Reference: -intercepting, src/malli/core.cljc:598-602.
    """
    enter = leave = None
    if callable(this_t):
        enter = this_t
    elif isinstance(this_t, dict):
        enter = this_t.get("enter")
        leave = this_t.get("leave")
    steps = [f for f in (enter, child_t, leave) if f is not None]
    if not steps:
        return None
    if len(steps) == 1:
        return steps[0]

    def chained(x: Any) -> Any:
        for f in steps:
            x = f(x)
        return x

    return chained


# --------------------------------------------------------------------------
# concrete schema types
# --------------------------------------------------------------------------


class SimpleSchema(Schema):
    """-simple-schema: predicate + optional min/max property predicate.

    Covers type schemas (:string :int ...) and the ~47 predicate schemas.
    Reference: src/malli/core.cljc:765-832.
    """

    def __init__(self, type_, properties, children, options, pred, count_based_bounds=False,
                 supports_bounds=True):
        super().__init__(type_, properties, children, options)
        self.pred = pred
        bounds = _min_max_validator(properties or {}, count_based_bounds) if supports_bounds else None
        self.bounds = bounds

    def _validator(self):
        pred, bounds = self.pred, self.bounds
        if bounds is None:
            return _safe_pred(pred)
        return _safe_pred(lambda x: pred(x) and bounds(x))


class EnumSchema(Schema):
    """:enum — set membership. src/malli/core.cljc:1669-1714."""

    def __init__(self, type_, properties, children, options):
        if not children:
            raise SchemaError(":enum requires at least one child")
        super().__init__(type_, properties, children, options)
        try:
            # type-aware membership keys: Python's 1 == True == 1.0 would let
            # booleans/floats match int enums (Clojure = is type-strict)
            self.value_set = {_enum_key(v) for v in children}
            self._hashable = True
        except TypeError:
            self.value_set = None
            self._hashable = False

    def _validator(self):
        if self._hashable:
            vs = self.value_set
            return lambda x: _try_contains_key(vs, x)
        vals = self.children
        return lambda x: any(type(x) is type(v) and x == v for v in vals)


def _enum_key(v: Any) -> Any:
    """Membership key distinguishing bool/int/float (1 != True != 1.0)."""
    if isinstance(v, (bool, int, float)):
        return (type(v).__name__, v)
    return v


def _try_contains_key(vs: set, x: Any) -> bool:
    try:
        return _enum_key(x) in vs
    except TypeError:
        return False


class ReSchema(Schema):
    """:re — regex re-find semantics. src/malli/core.cljc:1716-1768."""

    def __init__(self, type_, properties, children, options):
        if len(children) != 1:
            raise SchemaError(":re expects exactly one child (the pattern)")
        super().__init__(type_, properties, children, options)
        pat = children[0]
        self.pattern = pat if isinstance(pat, _re.Pattern) else _re.compile(pat)

    def _validator(self):
        pat = self.pattern
        return _safe_pred(lambda x: isinstance(x, str) and pat.search(x) is not None)

    def _form(self):
        pat = self.children[0]
        src = pat.pattern if isinstance(pat, _re.Pattern) else pat
        if self.properties:
            return [self.type, dict(self.properties), src]
        return [self.type, src]


_FN_ENV = {"len": len, "abs": abs, "min": min, "max": max, "sum": sum, "all": all,
           "any": any, "sorted": sorted, "set": set, "str": str, "int": int,
           "float": float, "bool": bool, "isinstance": isinstance, "math": math,
           "round": round, "list": list, "dict": dict, "tuple": tuple}


def compile_fn_source(src: str) -> Callable[[Any], bool]:
    """Compile a restricted predicate expression over ``x``.

    Stand-in for malli's sci evaluator (src/malli/sci.cljc:5-22): the source
    is a Python expression with ``x`` bound, evaluated with no builtins except
    a small numeric/collection whitelist. Needed so :fn schemas serialize to
    Ray actors.
    """
    code = compile(src, "<malli-fn>", "eval")
    env = {"__builtins__": {}, **_FN_ENV}
    return lambda x: eval(code, env, {"x": x})  # noqa: S307 - restricted env


class FnSchema(Schema):
    """:fn — arbitrary predicate, exception-safe. src/malli/core.cljc:1770-1817."""

    def __init__(self, type_, properties, children, options):
        if len(children) != 1:
            raise SchemaError(":fn expects exactly one child")
        super().__init__(type_, properties, children, options)
        f = children[0]
        if isinstance(f, str):
            fn_registry = (options or {}).get("fn-registry") or {}
            f = fn_registry.get(f) or compile_fn_source(f)
        if not callable(f):
            raise SchemaError(":fn child must be callable or a source string")
        self.fn = f

    def _validator(self):
        return _safe_pred(self.fn)

    def _form(self):
        # keep the original child (source string OR callable) so that
        # serialization can reject closures honestly (serialize.py)
        c = self.children[0]
        if self.properties:
            return [self.type, dict(self.properties), c]
        return [self.type, c]


class AndSchema(Schema):
    """:and — all children. src/malli/core.cljc:834-928."""

    def _validator(self):
        vs = [c.validator() for c in self.children]
        if len(vs) == 1:
            return vs[0]
        if len(vs) == 2:
            v0, v1 = vs
            return lambda x: v0(x) and v1(x)
        return lambda x: all(v(x) for v in vs)

    def _explainer(self, path):
        es = [c._explainer(path + [i]) for i, c in enumerate(self.children)]

        def explain_(x, in_, acc):
            for e in es:
                acc = e(x, in_, acc)
            return acc

        return explain_

    def _transforming_child(self) -> int | None:
        """Index of the single non-identity-parsing child (None if all are
        simple). Reference: ->transforming-parser-idx,
        src/malli/core.cljc:846-861 (errors on more than one)."""
        idxs = [i for i, c in enumerate(self.children)
                if not _parse_identity(c, set())]
        if len(idxs) > 1:
            raise SchemaError(
                ":and supports at most one transforming parser child",
                {"schema": self.form})
        return idxs[0] if idxs else None

    def _parser(self):
        """Parse children left-to-right; every child must accept; the result
        is the transforming child's parse (or x unchanged if none).

        Reference: :and -parser, src/malli/core.cljc:877-890.
        """
        pi = self._transforming_child()
        steps = [(c.parser() if i == pi else c.validator(), i == pi)
                 for i, c in enumerate(self.children)]

        def parse_(x):
            result = x
            for fn, transforming in steps:
                if transforming:
                    out = fn(x)
                    if out is INVALID:
                        return INVALID
                    result = out
                elif not fn(x):
                    return INVALID
            return result

        return parse_

    def _unparser(self):
        """Unparse via the transforming child (identity if none), then the
        remaining children validate the reconstruction.
        Reference: :and -unparser, src/malli/core.cljc:892-906."""
        pi = self._transforming_child()
        unparser = self.children[pi].unparser() if pi is not None else (lambda x: x)
        others = [c.validator() for i, c in enumerate(self.children) if i != pi]

        def unparse_(x_tagged):
            x = unparser(x_tagged)
            if x is INVALID or not all(v(x) for v in others):
                return INVALID
            return x

        return unparse_

    def _children_transformer(self, transformer, method, options):
        # chain ALL conjuncts' transformers in order
        # (-parent-children-transformer, src/malli/core.cljc:611-622)
        ts = [c._transformer(transformer, method, options) for c in self.children]
        ts = [t for t in ts if t is not None]
        if not ts:
            return None
        if len(ts) == 1:
            return ts[0]

        def chained(x):
            for t in ts:
                x = t(x)
            return x

        return chained


class OrSchema(Schema):
    """:or — any child; explain drops branch errors if one branch passes.

    Reference: src/malli/core.cljc:1005-1051; decode tries branches in order
    and picks the first whose result validates (-or-transformer,
    src/malli/core.cljc:651-670).
    """

    def _validator(self):
        vs = [c.validator() for c in self.children]
        return lambda x: any(v(x) for v in vs)

    def _explainer(self, path):
        vs = [c.validator() for c in self.children]
        es = [c._explainer(path + [i]) for i, c in enumerate(self.children)]

        def explain_(x, in_, acc):
            if any(v(x) for v in vs):
                return acc
            for e in es:
                acc = e(x, in_, acc)
            return acc

        return explain_

    def _parser(self):
        ps = [c.parser() for c in self.children]

        def parse_(x):
            for p in ps:
                out = p(x)
                if out is not INVALID:
                    return out
            return INVALID

        return parse_

    def _unparser(self):
        us = [c.unparser() for c in self.children]

        def unparse_(x):
            for u in us:
                out = u(x)
                if out is not INVALID:
                    return out
            return INVALID

        return unparse_

    def _transformer(self, transformer, method, options):
        return _or_transformer(self, transformer, method, options,
                               list(self.children))


def _or_transformer(this: "Schema", transformer, method: str, options,
                    child_schemas: list) -> Optional[Callable]:
    """-or-transformer (src/malli/core.cljc:651-670), shared by :or and
    :orn (which applies it over its entry children, core.cljc:1097).

    decode: first branch whose DECODED value validates wins; when none
    validates, the FIRST branch's decoded value is kept (reference acc
    semantics). encode: first branch whose validator accepts the raw value
    supplies the encoder; otherwise the value passes through unchanged.
    """
    this_t = transformer.value_transformer(this, method, options) if transformer else None
    branch_ts = [c._transformer(transformer, method, options) for c in child_schemas]
    branch_vs = [c.validator() for c in child_schemas]
    if all(t is None for t in branch_ts):
        return _intercepting(this_t, None)

    if method == "decode":
        def try_branches(x):
            first = _MISSING
            for t, v in zip(branch_ts, branch_vs):
                out = x if t is None else t(x)
                if v(out):
                    return out
                if first is _MISSING:
                    first = out
            return x if first is _MISSING else first
    else:
        def try_branches(x):
            for t, v in zip(branch_ts, branch_vs):
                if v(x):
                    return x if t is None else t(x)
            return x

    return _intercepting(this_t, try_branches)


class OrnSchema(Schema):
    """:orn — named alternatives; parse wraps in Tag. src/malli/core.cljc:1053-1114."""

    def __init__(self, type_, properties, children, options):
        # children: list of (key, props, schema)
        super().__init__(type_, properties, children, options)

    def _validator(self):
        vs = [s.validator() for (_, _, s) in self.children]
        return lambda x: any(v(x) for v in vs)

    def _explainer(self, path):
        vs = [s.validator() for (_, _, s) in self.children]
        es = [s._explainer(path + [k]) for (k, _, s) in self.children]

        def explain_(x, in_, acc):
            if any(v(x) for v in vs):
                return acc
            for e in es:
                acc = e(x, in_, acc)
            return acc

        return explain_

    def _parser(self):
        branches = [(k, s.parser()) for (k, _, s) in self.children]

        def parse_(x):
            for k, p in branches:
                out = p(x)
                if out is not INVALID:
                    return Tag(k, out)
            return INVALID

        return parse_

    def _unparser(self):
        us = {k: s.unparser() for (k, _, s) in self.children}

        def unparse_(x):
            if not isinstance(x, Tag) or x.key not in us:
                return INVALID
            return us[x.key](x.value)

        return unparse_

    def _transformer(self, transformer, method, options):
        # :orn transforms like :or over its entry children
        # (src/malli/core.cljc:1097 -> -or-transformer)
        return _or_transformer(self, transformer, method, options,
                               [s for (_, _, s) in self.children])

    def _form(self):
        out: list = [self.type]
        if self.properties:
            out.append(dict(self.properties))
        for (k, props, s) in self.children:
            out.append([k, props, s.form] if props else [k, s.form])
        return out

    def _walk_children(self, walker, path):
        return [(k, p, s.walk(walker, path + [k])) for (k, p, s) in self.children]

class NotSchema(Schema):
    """:not — complement. src/malli/core.cljc:1116-1160."""

    def _validator(self):
        v = self.children[0].validator()
        return lambda x: not v(x)

    def _explainer(self, path):
        """Error path points into the child position (core_test.cljc:440-457:
        [:not pos?] explain -> :path [0], schema = the :not schema)."""
        valid = self.validator()
        this = self

        def explain_(x, in_, acc):
            if not valid(x):
                acc.append(_error(path + [0], in_, this, x))
            return acc

        return explain_


class MaybeSchema(Schema):
    """:maybe — nil or child. src/malli/core.cljc:1819-1868."""

    def _validator(self):
        v = self.children[0].validator()
        return lambda x: x is None or v(x)

    def _explainer(self, path):
        v = self.children[0].validator()
        e = self.children[0]._explainer(path + [0])

        def explain_(x, in_, acc):
            if x is None or v(x):
                return acc
            return e(x, in_, acc)

        return explain_

    def _parser(self):
        p = self.children[0].parser()
        return lambda x: None if x is None else p(x)

    def _unparser(self):
        u = self.children[0].unparser()
        return lambda x: None if x is None else u(x)

    def _children_transformer(self, transformer, method, options):
        t = self.children[0]._transformer(transformer, method, options)
        if t is None:
            return None
        return lambda x: None if x is None else t(x)


class MapSchema(Schema):
    """:map — entry map schema with :optional / :closed / ::m/default.

    Reference: src/malli/core.cljc:1219-1363; entry parser :496-586.
    children = list of (key, props, schema); the ``DEFAULT_KEY`` entry holds
    the rest-of-map schema.
    """

    def __init__(self, type_, properties, children, options):
        super().__init__(type_, properties, children, options)
        self.explicit_keys = [k for (k, _, _) in children if k != DEFAULT_KEY]
        self.default_entry = next(((k, p, s) for (k, p, s) in children if k == DEFAULT_KEY), None)
        self.closed = bool((properties or {}).get("closed"))

    def _validator(self):
        checks = []
        for (k, props, s) in self.children:
            if k == DEFAULT_KEY:
                continue
            optional = bool((props or {}).get("optional"))
            checks.append((k, optional, s.validator()))
        explicit = set(self.explicit_keys)
        default_v = self.default_entry[2].validator() if self.default_entry else None
        closed = self.closed

        def valid(x):
            if not isinstance(x, dict):
                return False
            for (k, optional, v) in checks:
                val = x.get(k, _MISSING)
                if val is _MISSING:
                    if not optional:
                        return False
                elif not v(val):
                    return False
            if default_v is not None:
                rest = {k: v for k, v in x.items() if k not in explicit}
                if not default_v(rest):
                    return False
            elif closed:
                for k in x:
                    if k not in explicit:
                        return False
            return True

        return valid

    def _explainer(self, path):
        entries = []
        for (k, props, s) in self.children:
            if k == DEFAULT_KEY:
                continue
            optional = bool((props or {}).get("optional"))
            entries.append((k, optional, s._explainer(path + [k])))
        explicit = set(self.explicit_keys)
        default_e = (self.default_entry[2]._explainer(path + [DEFAULT_KEY])
                     if self.default_entry else None)
        closed = self.closed
        this = self

        def explain_(x, in_, acc):
            if not isinstance(x, dict):
                acc.append(_error(path, in_, this, x, "malli.core/invalid-type"))
                return acc
            for (k, optional, e) in entries:
                val = x.get(k, _MISSING)
                if val is _MISSING:
                    if not optional:
                        acc.append(_error(path + [k], in_ + [k], this, None,
                                          "malli.core/missing-key"))
                else:
                    acc = e(val, in_ + [k], acc)
            if default_e is not None:
                rest = {k: v for k, v in x.items() if k not in explicit}
                acc = default_e(rest, in_, acc)
            elif closed:
                for k in x:
                    if k not in explicit:
                        acc.append(_error(path + [k], in_ + [k], this, x[k],
                                          "malli.core/extra-key"))
            return acc

        return explain_

    def _parser(self):
        entries = []
        for (k, props, s) in self.children:
            if k == DEFAULT_KEY:
                continue
            optional = bool((props or {}).get("optional"))
            entries.append((k, optional, s.parser()))
        valid_shape = self.validator()
        explicit = set(self.explicit_keys)
        # ::m/default rest-entries parse THROUGH the default schema
        # (core.cljc:1257-1263), not just validate
        default_p = self.default_entry[2].parser() if self.default_entry else None

        def parse_(x):
            if not isinstance(x, dict):
                return INVALID
            if default_p is not None:
                # rest entries are REPLACED by the default schema's parse
                # (select-keys explicit + parsed rest, core.cljc:1260-1263)
                out = {k: v for k, v in x.items() if k in explicit}
            else:
                out = dict(x)
            for (k, optional, p) in entries:
                val = x.get(k, _MISSING)
                if val is _MISSING:
                    if not optional:
                        return INVALID
                    continue
                parsed = p(val)
                if parsed is INVALID:
                    return INVALID
                out[k] = parsed
            if default_p is not None:
                rest = {k: v for k, v in x.items() if k not in explicit}
                parsed_rest = default_p(rest)
                if parsed_rest is INVALID:
                    return INVALID
                if isinstance(parsed_rest, dict):
                    out.update(parsed_rest)
            elif not valid_shape(x):
                # closed-map violations not covered above
                return INVALID
            return out

        return parse_

    def _unparser(self):
        entries = []
        for (k, props, s) in self.children:
            if k == DEFAULT_KEY:
                continue
            optional = bool((props or {}).get("optional"))
            entries.append((k, optional, s.unparser()))

        explicit = set(self.explicit_keys)
        default_u = (self.default_entry[2].unparser()
                     if self.default_entry else None)

        def unparse_(x):
            if not isinstance(x, dict):
                return INVALID
            if default_u is not None:
                out = {k: v for k, v in x.items() if k in explicit}
            else:
                out = dict(x)
            for (k, optional, u) in entries:
                val = x.get(k, _MISSING)
                if val is _MISSING:
                    if not optional:
                        return INVALID
                    continue
                un = u(val)
                if un is INVALID:
                    return INVALID
                out[k] = un
            if default_u is not None:
                rest = {k: v for k, v in x.items() if k not in explicit}
                un_rest = default_u(rest)
                if un_rest is INVALID:
                    return INVALID
                if isinstance(un_rest, dict):
                    out.update(un_rest)
            return out

        return unparse_

    def _children_transformer(self, transformer, method, options):
        ts = []
        for (k, props, s) in self.children:
            if k == DEFAULT_KEY:
                continue
            t = s._transformer(transformer, method, options)
            if t is not None:
                ts.append((k, t))
        if not ts:
            return None

        def transform_(x):
            if not isinstance(x, dict):
                return x
            out = None
            for (k, t) in ts:
                if k in x:
                    if out is None:
                        out = dict(x)
                    out[k] = t(out[k])
            return out if out is not None else x

        return transform_

    def _form(self):
        out: list = [self.type]
        if self.properties:
            out.append(dict(self.properties))
        for (k, props, s) in self.children:
            out.append([k, props, s.form] if props else [k, s.form])
        return out

    def _walk_children(self, walker, path):
        return [(k, p, s.walk(walker, path + [k])) for (k, p, s) in self.children]

    def entries(self):
        return list(self.children)

class MapOfSchema(Schema):
    """:map-of — homogeneous key/value schemas + size limits.

    Reference: src/malli/core.cljc:1365-1459.
    """

    def ast(self) -> dict:
        # {:type :map-of, :key ast, :value ast} (core.cljc:1403-1404)
        return self._finish_ast({"type": self.type,
                                 "key": self.children[0].ast(),
                                 "value": self.children[1].ast()})

    def __init__(self, type_, properties, children, options):
        if len(children) != 2:
            raise SchemaError(":map-of expects [key-schema value-schema]")
        super().__init__(type_, properties, children, options)
        self.limits = _min_max_validator(properties or {}, count_based=True)

    def _validator(self):
        kv = self.children[0].validator()
        vv = self.children[1].validator()
        limits = self.limits

        def valid(x):
            if not isinstance(x, dict):
                return False
            if limits is not None and not limits(x):
                return False
            return all(kv(k) and vv(v) for k, v in x.items())

        return valid

    def _explainer(self, path):
        ke = self.children[0]._explainer(path + [0])
        ve = self.children[1]._explainer(path + [1])
        limits = self.limits
        this = self

        def explain_(x, in_, acc):
            if not isinstance(x, dict):
                acc.append(_error(path, in_, this, x, "malli.core/invalid-type"))
                return acc
            if limits is not None and not limits(x):
                acc.append(_error(path, in_, this, x, "malli.core/limits"))
            for k, v in x.items():
                acc = ke(k, in_ + [k], acc)
                acc = ve(v, in_ + [k], acc)
            return acc

        return explain_

    def _parser(self):
        kp = self.children[0].parser()
        vp = self.children[1].parser()
        limits = self.limits

        def parse_(x):
            if not isinstance(x, dict):
                return INVALID
            if limits is not None and not limits(x):
                return INVALID
            out = {}
            for k, v in x.items():
                pk, pv = kp(k), vp(v)
                if pk is INVALID or pv is INVALID:
                    return INVALID
                out[pk] = pv
            return out

        return parse_

    def _unparser(self):
        ku = self.children[0].unparser()
        vu = self.children[1].unparser()
        limits = self.limits

        def unparse_(x):
            if not isinstance(x, dict):
                return INVALID
            if limits is not None and not limits(x):
                return INVALID
            out = {}
            for k, v in x.items():
                uk, uv = ku(k), vu(v)
                if uk is INVALID or uv is INVALID:
                    return INVALID
                out[uk] = uv
            return out

        return unparse_

    def _children_transformer(self, transformer, method, options):
        kt = self.children[0]._transformer(transformer, method, options)
        vt = self.children[1]._transformer(transformer, method, options)
        if kt is None and vt is None:
            return None

        def transform_(x):
            if not isinstance(x, dict):
                return x
            return {(kt(k) if kt else k): (vt(v) if vt else v) for k, v in x.items()}

        return transform_


def _is_lazy_iterable(x) -> bool:
    """Non-countable iterable (generator/iterator) — the Python analog of a
    Clojure lazy seq (NOT -safely-countable?, core.cljc:1463-1476).

    CAVEAT (documented divergence): Clojure lazy seqs/eductions re-iterate;
    Python generators are ONE-SHOT and are CONSUMED by validation. A later
    explain/validate on the same exhausted iterator sees an empty sequence —
    snapshot with list(...) first when a value is needed more than once."""
    from collections.abc import Iterable
    return (isinstance(x, Iterable) and not hasattr(x, "__len__")
            and not isinstance(x, (str, bytes)))


_COLL_PREDS = {
    "vector": lambda x: isinstance(x, (list, tuple)),
    # eductions/generators are sequential? in the reference
    # (eduction-test, core_test.cljc:3594-3600)
    "sequential": lambda x: (isinstance(x, (list, tuple, range))
                             or _is_lazy_iterable(x)),
    "seqable": lambda x: (isinstance(x, (list, tuple, set, frozenset, range, dict))
                          or x is None or _is_lazy_iterable(x)),
    "set": lambda x: isinstance(x, (set, frozenset)),
    "every": lambda x: (isinstance(x, (list, tuple, set, frozenset, range))
                        or x is None or _is_lazy_iterable(x)),
}


class CollectionSchema(Schema):
    """-collection-schema family: :vector :sequential :seqable :set :every.

    Reference: src/malli/core.cljc:1478-1591; count limits -validate-limits
    :743-751; :every bounded prefix check :1499-1522 (coll-check-limit 101).
    """

    def __init__(self, type_, properties, children, options):
        if len(children) != 1:
            raise SchemaError(f":{type_} expects exactly one child schema")
        super().__init__(type_, properties, children, options)
        self.coll_pred = _COLL_PREDS[type_]
        self.limits = _min_max_validator(properties or {}, count_based=True)
        # :every is BOUNDED: countable colls validate fully, lazy iterables
        # only their first `bounded` items — bounded = max(max+1, min,
        # coll-check-limit) (core.cljc:745-751, 1499-1522). The limit comes
        # from the ::m/coll-check-limit OPTION (or schema property).
        if type_ == "every":
            ccl = (properties or {}).get("malli.core/coll-check-limit")
            if ccl is None:
                ccl = (options or {}).get("malli.core/coll-check-limit", 101)
            props = properties or {}
            mx = props.get("max")
            self.bounded = max((mx + 1) if mx is not None else 0,
                               props.get("min") or 0, ccl)
        else:
            self.bounded = None

    def _iter(self, x):
        if isinstance(x, dict):
            return list(x.items())
        if x is None:
            return []
        return x

    def _take(self, x):
        """Items to check + count for limit checks. Lazy iterables are
        materialized (fully for unbounded schemas — seqable traverses
        everything; first `bounded` for :every). NOTE: this consumes a
        one-shot Python generator — pass a list to keep the value."""
        items = self._iter(x)
        if not hasattr(items, "__len__"):
            if self.bounded is not None:
                from itertools import islice
                return list(islice(items, self.bounded))
            return list(items)
        return items

    def _validator(self):
        cv = self.children[0].validator()
        coll_pred, limits = self.coll_pred, self.limits
        take = self._take

        def valid(x):
            if not coll_pred(x):
                return False
            items = take(x)
            if limits is not None and not limits(items):
                return False
            return all(cv(v) for v in items)

        return valid

    def _explainer(self, path):
        ce = self.children[0]._explainer(path + [0])
        coll_pred, limits = self.coll_pred, self.limits
        take, this = self._take, self

        def explain_(x, in_, acc):
            if not coll_pred(x):
                acc.append(_error(path, in_, this, x, "malli.core/invalid-type"))
                return acc
            items = take(x)
            if limits is not None and not limits(items):
                acc.append(_error(path, in_, this, x, "malli.core/limits"))
                return acc
            if not isinstance(items, (list, tuple)):
                items = list(items)
            for i, v in enumerate(items):
                acc = ce(v, in_ + [i], acc)
            return acc

        return explain_

    def _parser(self):
        # bounded :every parses by VALIDATING the checked prefix and
        # returning the value unchanged (core.cljc:1530-1531 ->parser with
        # -validator + identity)
        if self.bounded is not None:
            valid = self._validator()
            return lambda x: x if valid(x) else INVALID
        cp = self.children[0].parser()
        valid_shape = self.coll_pred
        limits = self.limits
        is_set = self.type == "set"

        def parse_(x):
            if not valid_shape(x):
                return INVALID
            items = self._iter(x)
            if not hasattr(items, "__len__"):
                items = list(items)  # lazy seqable: materialize to count
            if limits is not None and not limits(items):
                return INVALID
            out = []
            for v in items:
                p = cp(v)
                if p is INVALID:
                    return INVALID
                out.append(p)
            return set(out) if is_set else out

        return parse_

    def _unparser(self):
        if self.bounded is not None:
            valid = self._validator()
            return lambda x: x if valid(x) else INVALID
        cu = self.children[0].unparser()
        limits = self.limits
        is_set = self.type == "set"

        def unparse_(x):
            if not isinstance(x, (list, tuple, set, frozenset)):
                return INVALID
            if limits is not None and not limits(x):
                return INVALID
            out = []
            for v in x:
                u = cu(v)
                if u is INVALID:
                    return INVALID
                out.append(u)
            return set(out) if is_set else out

        return unparse_

    def _children_transformer(self, transformer, method, options):
        t = self.children[0]._transformer(transformer, method, options)
        if t is None:
            return None
        is_set = self.type == "set"

        def transform_(x):
            if not isinstance(x, (list, tuple, set, frozenset)):
                return x
            out = [t(v) for v in x]
            return set(out) if is_set else out

        return transform_


class TupleSchema(Schema):
    """:tuple — exact-size positional children. src/malli/core.cljc:1593-1667."""

    def _validator(self):
        vs = [c.validator() for c in self.children]
        n = len(vs)

        def valid(x):
            if not isinstance(x, (list, tuple)) or len(x) != n:
                return False
            return all(v(e) for v, e in zip(vs, x))

        return valid

    def _explainer(self, path):
        es = [c._explainer(path + [i]) for i, c in enumerate(self.children)]
        n = len(es)
        this = self

        def explain_(x, in_, acc):
            if not isinstance(x, (list, tuple)):
                acc.append(_error(path, in_, this, x, "malli.core/invalid-type"))
                return acc
            if len(x) != n:
                acc.append(_error(path, in_, this, x, "malli.core/tuple-size"))
                return acc
            for i, (e, v) in enumerate(zip(es, x)):
                acc = e(v, in_ + [i], acc)
            return acc

        return explain_

    def _parser(self):
        ps = [c.parser() for c in self.children]
        n = len(ps)

        def parse_(x):
            if not isinstance(x, (list, tuple)) or len(x) != n:
                return INVALID
            out = []
            for p, v in zip(ps, x):
                pv = p(v)
                if pv is INVALID:
                    return INVALID
                out.append(pv)
            return out

        return parse_

    def _unparser(self):
        us = [c.unparser() for c in self.children]
        n = len(us)

        def unparse_(x):
            if not isinstance(x, (list, tuple)) or len(x) != n:
                return INVALID
            out = []
            for u, v in zip(us, x):
                uv = u(v)
                if uv is INVALID:
                    return INVALID
                out.append(uv)
            return out

        return unparse_

    def _children_transformer(self, transformer, method, options):
        ts = [c._transformer(transformer, method, options) for c in self.children]
        if all(t is None for t in ts):
            return None

        def transform_(x):
            if not isinstance(x, (list, tuple)) or len(x) != len(ts):
                return x
            return [v if t is None else t(v) for t, v in zip(ts, x)]

        return transform_


class MultiSchema(Schema):
    """:multi — dispatch to branch schema. src/malli/core.cljc:1870-1947.

    children = (dispatch-value, props, schema); dispatch fn from properties
    :dispatch (a key string -> dict lookup, or a callable).
    """

    def __init__(self, type_, properties, children, options):
        super().__init__(type_, properties, children, options)
        dispatch = (properties or {}).get("dispatch")
        if dispatch is None:
            raise SchemaError(":multi requires :dispatch property")
        if callable(dispatch):
            self.dispatch = dispatch
            self.dispatch_key = None
        else:
            key = dispatch
            self.dispatch = lambda x: x.get(key) if isinstance(x, dict) else None
            self.dispatch_key = key
        self.branches = {k: s for (k, _, s) in children if k != DEFAULT_KEY}
        self.default_branch = next((s for (k, _, s) in children if k == DEFAULT_KEY), None)

    def _branch(self, x):
        try:
            dv = self.dispatch(x)
        except Exception:
            return None, None
        s = self.branches.get(dv, self.default_branch) if _hashable(dv) else self.default_branch
        return dv, s

    def _validator(self):
        vs = {k: s.validator() for k, s in self.branches.items()}
        default_v = self.default_branch.validator() if self.default_branch else None
        dispatch = self.dispatch

        def valid(x):
            try:
                dv = dispatch(x)
            except Exception:
                return False
            v = vs.get(dv) if _hashable(dv) else None
            if v is None:
                v = default_v
            return v(x) if v is not None else False

        return valid

    def _explainer(self, path):
        es = {k: s._explainer(path + [k]) for k, s in self.branches.items()}
        default_e = (self.default_branch._explainer(path + [DEFAULT_KEY])
                     if self.default_branch else None)
        dispatch, this = self.dispatch, self

        def explain_(x, in_, acc):
            try:
                dv = dispatch(x)
            except Exception:
                dv = None
            e = es.get(dv) if _hashable(dv) else None
            if e is None:
                e = default_e
            if e is None:
                # map-key dispatch on a map value: the error lands AT the
                # dispatch key (core.cljc:1913-1914)
                if this.dispatch_key is not None and isinstance(x, dict):
                    acc.append(_error(path + [this.dispatch_key],
                                      in_ + [this.dispatch_key], this, x,
                                      "malli.core/invalid-dispatch-value"))
                else:
                    acc.append(_error(path, in_, this, x,
                                      "malli.core/invalid-dispatch-value"))
                return acc
            return e(x, in_, acc)

        return explain_

    def _parser(self):
        ps = {k: s.parser() for k, s in self.branches.items()}
        default_p = self.default_branch.parser() if self.default_branch else None
        dispatch = self.dispatch

        def parse_(x):
            try:
                dv = dispatch(x)
            except Exception:
                return INVALID
            p = ps.get(dv) if _hashable(dv) else None
            if p is None:
                p = default_p
            if p is None:
                return INVALID
            out = p(x)
            return INVALID if out is INVALID else Tag(dv, out)

        return parse_

    def _unparser(self):
        us = {k: s.unparser() for k, s in self.branches.items()}

        def unparse_(x):
            if not isinstance(x, Tag) or x.key not in us:
                return INVALID
            return us[x.key](x.value)

        return unparse_

    def _children_transformer(self, transformer, method, options):
        ts = {k: s._transformer(transformer, method, options) for k, s in self.branches.items()}
        default_t = (self.default_branch._transformer(transformer, method, options)
                     if self.default_branch else None)
        if all(t is None for t in ts.values()) and default_t is None:
            return None
        dispatch = self.dispatch

        def transform_(x):
            try:
                dv = dispatch(x)
            except Exception:
                return x
            t = ts.get(dv) if _hashable(dv) else None
            if t is None:
                t = default_t
            return t(x) if t is not None else x

        return transform_

    def _form(self):
        out: list = [self.type]
        if self.properties:
            props = dict(self.properties)
            if callable(props.get("dispatch")):
                props["dispatch"] = getattr(props["dispatch"], "__name__", "<fn>")
            out.append(props)
        for (k, props, s) in self.children:
            out.append([k, props, s.form] if props else [k, s.form])
        return out

    def _walk_children(self, walker, path):
        return [(k, p, s.walk(walker, path + [k])) for (k, p, s) in self.children]


def _hashable(x: Any) -> bool:
    try:
        hash(x)
        return True
    except TypeError:
        return False


class AndnSchema(Schema):
    """:andn — named conjuncts; parse -> Tags. src/malli/core.cljc:930-1003."""

    def _validator(self):
        vs = [s.validator() for (_, _, s) in self.children]
        return lambda x: all(v(x) for v in vs)

    def _explainer(self, path):
        es = [s._explainer(path + [k]) for (k, _, s) in self.children]

        def explain_(x, in_, acc):
            for e in es:
                acc = e(x, in_, acc)
            return acc

        return explain_

    def _parser(self):
        branches = [(k, s.parser()) for (k, _, s) in self.children]

        def parse_(x):
            out = {}
            for k, p in branches:
                v = p(x)
                if v is INVALID:
                    return INVALID
                out[k] = v
            return Tags(out)

        return parse_

    def _unparser(self):
        """Only the LEFT-MOST conjunct present in the tags is unparsed; the
        remaining values are ignored and the result re-validates against the
        other conjuncts (src/malli/core.cljc:966-984 — to modify one
        conjunct's value, remove all others). Unknown keys invalidate.
        DELIBERATE divergence: the reference's `((validators k) x)` re-runs
        the chosen key's own validator for every conjunct (a slip); we
        validate against each OTHER conjunct as its comment intends."""
        ks = [k for (k, _, _) in self.children]
        unparsers = {k: s.unparser() for (k, _, s) in self.children}
        validators = {k: s.validator() for (k, _, s) in self.children}

        def unparse_(x):
            if not isinstance(x, Tags) or not x.values:
                return INVALID
            if any(k not in validators for k in x.values):
                return INVALID
            k = next((k for k in ks if k in x.values), None)
            if k is None:
                return INVALID
            v = unparsers[k](x.values[k])
            if v is INVALID:
                return INVALID
            if all(other == k or validators[other](v) for other in ks):
                return v
            return INVALID

        return unparse_

    def _form(self):
        out: list = [self.type]
        if self.properties:
            out.append(dict(self.properties))
        for (k, props, s) in self.children:
            out.append([k, props, s.form] if props else [k, s.form])
        return out

    def _walk_children(self, walker, path):
        return [(k, p, s.walk(walker, path + [k])) for (k, p, s) in self.children]


class FunctionSchema(Schema):
    """:=> / :-> / :function — function schemas.

    Validates ``callable(x)`` (malli: ifn? unless a ::function-checker option
    provides generative checking — src/malli/core.cljc:2154-2321). With option
    ``{"function-checker": checker}``, ``checker(schema) -> pred`` is used.
    """

    def __init__(self, type_, properties, children, options):
        if type_ == "->":
            # [:-> a b c] sugar == [:=> [:cat a b] c] (core.cljc:2382-2391)
            if len(children) < 1:
                raise SchemaError(":-> expects at least an output schema")
            *ins, out = children
            children = [schema(["cat", *[_child_form(c) for c in ins]], options),
                        schema(out, options) if not isinstance(out, Schema) else out]
            type_ = "=>"
        super().__init__(type_, properties, children, options)
        self.checker = (options or {}).get("function-checker")

    def _validator(self):
        if self.checker is not None:
            return _safe_pred(self.checker(self))
        return callable

    @property
    def input(self) -> "Schema":
        return self.children[0]

    @property
    def output(self) -> "Schema":
        return self.children[1]

    def function_info(self) -> dict:
        """-function-info (src/malli/core.cljc:2211-2218): arity bounds from
        the input seqex's static min/max; arity is the fixed count when
        min == max, else "varargs"."""
        from .regex_engine import regex_min_max
        mn, mx = regex_min_max(self.input, nested=False)
        info = {"min": mn, "arity": mn if mn == mx else "varargs",
                "input": self.input, "output": self.output}
        if mx is not None:
            info["max"] = mx
        return info

    def arities(self) -> list["FunctionSchema"]:
        return [self]


class FunctionSetSchema(Schema):
    """:function — a set of :=> arities. src/malli/core.cljc:2154-2321."""

    def _validator(self):
        return callable

    def arities(self) -> list["FunctionSchema"]:
        """-function-schema-arities: the :=> children."""
        return [c for c in self.children if isinstance(c, FunctionSchema)]


class RefSchema(Schema):
    """:ref — registry deref with recursion-safe lazy resolution.

    Reference: src/malli/core.cljc:1963-2064 (knot-tied validator :1994-2008).
    Resolution happens at first call, through the options' registry (which
    includes any local ``{:registry {...}}`` properties in scope).
    """

    def __init__(self, type_, properties, children, options):
        if len(children) != 1:
            raise SchemaError(":ref expects a registry key child")
        super().__init__(type_, properties, children, options)
        self.key = children[0]
        self._resolved: Schema | None = None

    def deref(self) -> Schema:
        if self._resolved is None:
            reg = (self.options or {}).get("registry") or {}
            target = _registry_get(reg, self.key)
            if target is None:
                raise SchemaError(f":ref key not found in registry: {self.key!r}")
            self._resolved = target if isinstance(target, Schema) else schema(target, self.options)
        return self._resolved

    def _validator(self):
        this = self
        memo: dict[str, Callable] = {}

        def valid(x):
            v = memo.get("v")
            if v is None:
                v = this.deref().validator()
                memo["v"] = v
            return v(x)

        return valid

    def _explainer(self, path):
        this = self
        memo: dict[str, Callable] = {}

        def explain_(x, in_, acc):
            e = memo.get("e")
            if e is None:
                e = this.deref()._explainer(path + [0])
                memo["e"] = e
            return e(x, in_, acc)

        return explain_

    def _parser(self):
        this = self
        memo: dict[str, Callable] = {}

        def parse_(x):
            p = memo.get("p")
            if p is None:
                p = this.deref().parser()
                memo["p"] = p
            return p(x)

        return parse_

    def _unparser(self):
        this = self
        memo: dict[str, Callable] = {}

        def unparse_(x):
            u = memo.get("u")
            if u is None:
                u = this.deref().unparser()
                memo["u"] = u
            return u(x)

        return unparse_

    def _children_transformer(self, transformer, method, options):
        this = self
        memo: dict[str, Any] = {}

        def transform_(x):
            if "t" not in memo:
                memo["t"] = this.deref()._transformer(transformer, method, options)
            t = memo["t"]
            return t(x) if t is not None else x

        return transform_

    def _form(self):
        if self.properties:
            return [self.type, dict(self.properties), self.key]
        return [self.type, self.key]


class WrapperSchema(Schema):
    """:schema / ::m/schema — transparent wrapper (src/malli/core.cljc:2066-2152)."""

    def deref(self) -> Schema:
        return self.children[0]

    def _validator(self):
        return self.children[0].validator()

    def _explainer(self, path):
        return self.children[0]._explainer(path + [0])

    def _parser(self):
        return self.children[0].parser()

    def _unparser(self):
        return self.children[0].unparser()

    def _children_transformer(self, transformer, method, options):
        return self.children[0]._transformer(transformer, method, options)


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------


def _simple(pred: Callable, count_based: bool = False, supports_bounds: bool = True):
    def ctor(type_, properties, children, options):
        if children:
            raise SchemaError(f"{type_} takes no children, got {children!r}")
        return SimpleSchema(type_, properties, children, options, pred,
                            count_based_bounds=count_based, supports_bounds=supports_bounds)
    return ctor


def _comparator(op: Callable[[Any, Any], bool]):
    """Comparator schemas :> :>= :< :<= := :not=. src/malli/core.cljc:2947-2951."""

    def ctor(type_, properties, children, options):
        if len(children) != 1:
            raise SchemaError(f"{type_} expects exactly one child value")
        bound = children[0]
        return SimpleSchema(type_, properties, children, options,
                            lambda x: op(x, bound), supports_bounds=False)

    return ctor


import operator as _op


def _build_default_registry() -> dict:
    reg: dict[str, Any] = {}

    # type schemas (src/malli/core.cljc:2953-2966, impls :820-832)
    reg["any"] = _simple(lambda x: True, supports_bounds=False)
    reg["some"] = _simple(lambda x: x is not None, supports_bounds=False)
    reg["nil"] = _simple(lambda x: x is None, supports_bounds=False)
    reg["string"] = _simple(_is_string, count_based=True)
    reg["int"] = _simple(_is_int)
    reg["integer"] = _simple(_is_int)
    reg["float"] = _simple(lambda x: _is_float(x) or _is_int(x))
    reg["double"] = _simple(lambda x: _is_float(x) or _is_int(x))
    reg["number"] = _simple(_is_number)
    reg["boolean"] = _simple(_is_bool, supports_bounds=False)
    reg["keyword"] = _simple(_is_string, supports_bounds=False)
    reg["symbol"] = _simple(_is_string, supports_bounds=False)
    reg["qualified-keyword"] = _simple(lambda x: _is_string(x) and "/" in x, supports_bounds=False)
    reg["qualified-symbol"] = _simple(lambda x: _is_string(x) and "/" in x, supports_bounds=False)
    reg["uuid"] = _simple(lambda x: isinstance(x, _uuid.UUID), supports_bounds=False)

    # predicate schemas
    for name, pred in PREDICATES.items():
        reg[name] = _simple(pred, supports_bounds=False)

    # comparators
    reg[">"] = _comparator(_safe_cmp(_op.gt))
    reg[">="] = _comparator(_safe_cmp(_op.ge))
    reg["<"] = _comparator(_safe_cmp(_op.lt))
    reg["<="] = _comparator(_safe_cmp(_op.le))
    reg["="] = _comparator(lambda x, b: x == b)
    reg["not="] = _comparator(lambda x, b: x != b)

    # base schemas
    reg["enum"] = EnumSchema
    reg["re"] = ReSchema
    reg["fn"] = FnSchema
    reg["and"] = AndSchema
    reg["or"] = OrSchema
    reg["orn"] = _entry_ctor(OrnSchema)
    reg["not"] = NotSchema
    reg["maybe"] = MaybeSchema
    reg["map"] = _entry_ctor(MapSchema)
    reg["map-of"] = MapOfSchema
    for t in ("vector", "sequential", "seqable", "set", "every"):
        reg[t] = CollectionSchema
    reg["tuple"] = TupleSchema
    reg["multi"] = _entry_ctor(MultiSchema)
    reg["andn"] = _entry_ctor(AndnSchema)
    reg["ref"] = RefSchema
    reg["schema"] = WrapperSchema
    reg["malli.core/schema"] = WrapperSchema
    reg["=>"] = FunctionSchema
    reg["->"] = FunctionSchema
    reg["function"] = FunctionSetSchema

    # experimental time schemas (src/malli/experimental/time.cljc:97-108);
    # Python mapping: datetime/date/time/timedelta with :min/:max value bounds
    reg["time/instant"] = _simple(
        lambda x: isinstance(x, _dt.datetime) and x.tzinfo is not None)
    reg["time/local-date"] = _simple(
        lambda x: isinstance(x, _dt.date) and not isinstance(x, _dt.datetime))
    reg["time/local-time"] = _simple(
        lambda x: isinstance(x, _dt.time) and x.tzinfo is None)
    reg["time/local-date-time"] = _simple(
        lambda x: isinstance(x, _dt.datetime) and x.tzinfo is None)
    reg["time/duration"] = _simple(lambda x: isinstance(x, _dt.timedelta))
    reg["time/period"] = _simple(lambda x: isinstance(x, _dt.timedelta))
    reg["time/zoned-date-time"] = _simple(
        lambda x: isinstance(x, _dt.datetime) and x.tzinfo is not None)
    reg["time/offset-date-time"] = _simple(
        lambda x: isinstance(x, _dt.datetime) and x.tzinfo is not None)
    reg["time/offset-time"] = _simple(
        lambda x: isinstance(x, _dt.time) and x.tzinfo is not None)
    # a zone ID is a tzinfo OBJECT, not its string name (time_test.cljc:34)
    reg["time/zone-id"] = _simple(lambda x: isinstance(x, _dt.tzinfo),
                                  supports_bounds=False)
    reg["time/zone-offset"] = _simple(lambda x: isinstance(x, _dt.timezone),
                                      supports_bounds=False)

    return reg


def _safe_cmp(op):
    def cmp(x, b):
        try:
            return op(x, b)
        except TypeError:
            return False
    return cmp


def _entry_ctor(cls):
    """Wrap an entry-based schema class: normalize children to (key, props, schema)."""

    def ctor(type_, properties, children, options):
        entries = []
        for c in children:
            if isinstance(c, tuple) and len(c) == 3 and isinstance(c[2], Schema):
                entries.append(c)
                continue
            # NAKED KEYS (core.cljc:496-586, parse-entries-test): a bare
            # string key, [key] or [key props] resolves the key itself in
            # the registry
            if isinstance(c, str):
                entries.append((c, None, schema(c, options)))
                continue
            if not isinstance(c, (list, tuple)) or len(c) < 1:
                raise SchemaError(f"invalid {type_} entry: {c!r}")
            key = c[0]
            if len(c) == 1:
                props, child_form = None, key
            elif len(c) == 2 and isinstance(c[1], dict):
                props, child_form = c[1], key
            elif len(c) == 2:
                props, child_form = None, c[1]
            elif len(c) == 3 and (isinstance(c[1], dict) or c[1] is None):
                props, child_form = c[1], c[2]
            else:
                raise SchemaError(f"invalid {type_} entry: {c!r}")
            entries.append((key, props, schema(child_form, options)))
        # duplicate keys are a schema error (parse-entries-test)
        seen: set = set()
        for (k, _, _) in entries:
            if isinstance(k, Hashable):
                if k in seen:
                    raise SchemaError(f"duplicate {type_} entry key: {k!r}")
                seen.add(k)
        return cls(type_, properties, entries, options)

    return ctor


_DEFAULT_REGISTRY: dict | None = None


def default_registry() -> dict:
    """The built-in type registry (``default-schemas``, src/malli/core.cljc:3052-3053)."""
    global _DEFAULT_REGISTRY
    if _DEFAULT_REGISTRY is None:
        _DEFAULT_REGISTRY = _build_default_registry()
        # seq-regex types registered lazily to avoid a circular import
        from . import regex_engine
        regex_engine.register_into(_DEFAULT_REGISTRY)
        from . import util as _util
        _util.register_into(_DEFAULT_REGISTRY)
    return _DEFAULT_REGISTRY


def register_type(name: str, ctor: Callable, registry: dict | None = None) -> None:
    """User-extension hook: register a custom schema type.

    ``ctor(type, properties, children, options) -> Schema``.
    Reference: IntoSchema extension surface, src/malli/core.cljc:23-43.
    """
    (registry if registry is not None else default_registry())[name] = ctor


def _registry_get(reg: dict, key: str):
    if key in reg:
        return reg[key]
    return None


# --------------------------------------------------------------------------
# schema parsing (m/schema, src/malli/core.cljc:2567-2589)
# --------------------------------------------------------------------------


def schema(form: Any, options: dict | None = None) -> Schema:
    """Parse a vector-DSL form (or pass through a Schema) into a compiled Schema."""
    if isinstance(form, Schema):
        return form
    options = dict(options or {})
    registry = options.get("registry")
    if registry is None:
        registry = default_registry()
        options["registry"] = registry

    if isinstance(form, _re.Pattern):
        return ReSchema("re", {}, [form], options)
    if callable(form) and not isinstance(form, type):
        return FnSchema("fn", {}, [form], options)

    if isinstance(form, str):
        return _make(form, {}, [], options)

    if isinstance(form, (list, tuple)):
        if not form:
            raise SchemaError("empty schema form")
        type_ = form[0]
        if not isinstance(type_, str):
            raise SchemaError(f"schema type must be a string, got {type_!r}")
        rest = list(form[1:])
        props: dict = {}
        if rest and (isinstance(rest[0], dict) or rest[0] is None):
            props = rest.pop(0) or {}
        # local registry in properties (src/malli/core.cljc:344-348);
        # ChainMap layering preserves lazy/mutable base-registry semantics
        # (a dict copy would snapshot only already-cached names)
        if "registry" in props:
            import collections as _collections
            local = props["registry"]
            options = dict(options)
            options["registry"] = _collections.ChainMap(
                dict(local), options["registry"])
        return _make(type_, props, rest, options)

    raise SchemaError(f"invalid schema form: {form!r}")


_ENTRY_TYPES = {"map", "orn", "multi", "catn", "altn", "andn"}
_VALUE_CHILD_TYPES = {"enum", "re", "fn", ">", ">=", "<", "<=", "=", "not=", "ref"}


def _make(type_: str, props: dict, children: list, options: dict) -> Schema:
    registry = options["registry"]
    ctor = _registry_get(registry, type_)
    if ctor is None:
        raise SchemaError(f"unknown schema type: {type_!r}", {"type": type_})
    if isinstance(ctor, Schema) or (isinstance(ctor, (list, str))
                                    and not callable(ctor)):
        # registry alias (name -> form) or pre-compiled Schema entry.
        # Children are rejected (the target's children are fixed), but
        # vector application WITH PROPERTIES re-binds the expanded schema's
        # top-node properties — [::derived-str {:error/message "bar"}]
        # semantics (reference issue-451, core_test.cljc:3088-3110)
        if children:
            raise SchemaError(
                f"registry alias {type_!r} takes no children here")
        target = ctor if isinstance(ctor, Schema) else schema(ctor, options)
        if props:
            # rebuild from the expanded FORM with merged top-node properties
            # (schema subclasses have varying ctor signatures).  Whether
            # form[1] is a props dict is decided by target.properties — a
            # dict VALUE child (e.g. [:= {...}] / [:enum {...} ...]) must
            # NOT be mistaken for properties
            f = target.form
            if isinstance(f, str):
                new_form: list = [f, dict(props)]
            elif target.properties:
                new_form = [f[0], {**f[1], **props}, *f[2:]]
            else:
                new_form = [f[0], dict(props), *f[1:]]
            return schema(new_form, options)
        return target
    if isinstance(ctor, type) and issubclass(ctor, Schema):
        if type_ in _ENTRY_TYPES:
            return _entry_ctor(ctor)(type_, props, children, options)
        if type_ in _VALUE_CHILD_TYPES:
            return ctor(type_, props, children, options)
        compiled = [schema(c, options) for c in children]
        return ctor(type_, props, compiled, options)
    # plain ctor function: decides child handling itself
    if type_ in _ENTRY_TYPES or type_ in _VALUE_CHILD_TYPES:
        return ctor(type_, props, children, options)
    if type_ in ("vector", "sequential", "seqable", "set", "every", "and", "or",
                 "not", "maybe", "tuple", "map-of", "schema", "malli.core/schema"):
        compiled = [schema(c, options) for c in children]
        return ctor(type_, props, compiled, options)
    return ctor(type_, props, children, options)


# --------------------------------------------------------------------------
# public API (src/malli/core.cljc:2643-2786)
# --------------------------------------------------------------------------


def validator(s: Any, options: dict | None = None) -> Callable[[Any], bool]:
    return schema(s, options).validator()


def validate(s: Any, value: Any, options: dict | None = None) -> bool:
    return schema(s, options).validator()(value)


def explainer(s: Any, options: dict | None = None) -> Callable[[Any], dict | None]:
    sc = schema(s, options)
    inner = sc.explainer()

    def explain_(value: Any) -> dict | None:
        errors = inner(value)
        if not errors:
            return None
        return {"schema": sc, "value": value, "errors": errors}

    return explain_


def explain(s: Any, value: Any, options: dict | None = None) -> dict | None:
    return explainer(s, options)(value)


def parser(s: Any, options: dict | None = None) -> Callable[[Any], Any]:
    return schema(s, options).parser()


def parse(s: Any, value: Any, options: dict | None = None) -> Any:
    return schema(s, options).parser()(value)


def unparser(s: Any, options: dict | None = None) -> Callable[[Any], Any]:
    return schema(s, options).unparser()


def unparse(s: Any, value: Any, options: dict | None = None) -> Any:
    return schema(s, options).unparser()(value)


def is_schema(x: Any) -> bool:
    """m/schema? (src/malli/core.cljc:2560-2563)."""
    return isinstance(x, Schema)


def into_schema(type_: Any, properties: dict | None, children: list,
                options: dict | None = None) -> Schema:
    """m/into-schema: explicit (type, props, children) -> Schema
    (src/malli/core.cljc:2540-2558)."""
    form: list = [type_]
    if properties:
        form.append(dict(properties))
    form.extend(children)
    return schema(form, options)


def type_properties(s: Any, options: dict | None = None) -> dict:
    """m/type-properties: properties contributed by the schema TYPE itself
    (src/malli/core.cljc:2534-2539). Built-in types contribute none in this
    engine; custom types registered with ``type_properties`` surface them."""
    sc = schema(s, options)
    return dict(getattr(sc, "type_properties", None) or {})


def options(s: Any) -> dict | None:
    """m/options (src/malli/core.cljc:2612-2616)."""
    return schema(s).options


def deref_all(s: Any, options: dict | None = None) -> Schema:
    """Deref top-level wrapper/ref schemas recursively
    (m/deref-all, src/malli/core.cljc:2843-2849)."""
    sc = schema(s, options)
    seen = 0
    while hasattr(sc, "deref") and sc.type in (
            "ref", "schema", "malli.core/schema", "merge", "union",
            "select-keys") and seen < 100:
        nxt = sc.deref()
        if nxt is sc:
            break
        sc = nxt
        seen += 1
    return sc


def deref_recursive(s: Any, options: dict | None = None) -> Schema:
    """Derefs all schemas at ALL levels; does not walk over :ref
    (m/deref-recursive, src/malli/core.cljc:2851-2863)."""
    sc = deref_all(schema(s, options))

    def walk_(node: Schema) -> Schema:
        if node.type == "ref":
            return node  # recursion boundary
        if hasattr(node, "deref") and node.type in (
                "schema", "malli.core/schema", "merge", "union", "select-keys"):
            return walk_(deref_all(node))
        new_children = []
        changed = False
        for c in node.children:
            if isinstance(c, Schema):
                w = walk_(c)
                changed = changed or (w is not c)
                new_children.append(w)
            elif (isinstance(c, tuple) and len(c) == 3
                  and isinstance(c[2], Schema)):
                w = walk_(c[2])
                changed = changed or (w is not c[2])
                new_children.append((c[0], c[1], w))
            else:
                new_children.append(c)
        if not changed:
            return node
        return type(node)(node.type, node.properties, new_children,
                          node.options)

    return walk_(sc)


def explicit_keys(s: Any, options: dict | None = None) -> list:
    """m/explicit-keys: map entry keys excluding ::m/default
    (src/malli/core.cljc 'explicit-keys')."""
    sc = deref_all(schema(s, options))
    return list(getattr(sc, "explicit_keys", []) or [])


def default_schema(s: Any, options: dict | None = None) -> Optional[Schema]:
    """m/default-schema: the ::m/default entry's schema, if any."""
    sc = deref_all(schema(s, options))
    e = getattr(sc, "default_entry", None)
    return e[2] if e else None


def schema_walker(f: Callable[[Schema], Any]) -> Callable:
    """m/schema-walker (src/malli/core.cljc:2922-2924): lift a
    schema->schema fn into the ``walk`` visitor signature."""
    return lambda sc, _path, _walked: f(sc)


def tag(key: Any, value: Any) -> Tag:
    """Construct a parse Tag (m/tag, src/malli/core.cljc:168-171)."""
    return Tag(key, value)


def tags(values: dict) -> Tags:
    """Construct parse Tags (m/tags, src/malli/core.cljc:176-179)."""
    return Tags(values)


def old_parse_format(parsed: Any) -> Any:
    """Transform the new parsing format to the old one by replacing Tag and
    Tags objects with their content (postwalk).

    Reference: m/old-parse-format, src/malli/core.cljc:185-195 —
    Tag(k, v) -> [k, v]; Tags({...}) -> {...}.
    """
    def walk_(x: Any) -> Any:
        if isinstance(x, Tag):
            return [walk_(x.key), walk_(x.value)]
        if isinstance(x, Tags):
            return {walk_(k): walk_(v) for k, v in x.values.items()}
        if isinstance(x, dict):
            return {walk_(k): walk_(v) for k, v in x.items()}
        if isinstance(x, list):
            return [walk_(v) for v in x]
        if isinstance(x, tuple):
            return tuple(walk_(v) for v in x)
        if isinstance(x, (set, frozenset)):
            return type(x)(walk_(v) for v in x)
        return x

    return walk_(parsed)


def decoder(s: Any, transformer: Any, options: dict | None = None) -> Callable[[Any], Any]:
    """m/decoder — compile the decode chain; identity when nothing to transform.

    Reference: src/malli/core.cljc:2716-2731.
    """
    t = schema(s, options)._transformer(transformer, "decode", options or {})
    return t if t is not None else lambda x: x


def decode(s: Any, value: Any, transformer: Any, options: dict | None = None) -> Any:
    return decoder(s, transformer, options)(value)


def encoder(s: Any, transformer: Any, options: dict | None = None) -> Callable[[Any], Any]:
    t = schema(s, options)._transformer(transformer, "encode", options or {})
    return t if t is not None else lambda x: x


def encode(s: Any, value: Any, transformer: Any, options: dict | None = None) -> Any:
    return encoder(s, transformer, options)(value)


def coercer(s: Any, transformer: Any = None, options: dict | None = None,
            respond: Callable | None = None, raise_: Callable | None = None) -> Callable:
    """m/coercer = decode -> validate -> respond/raise. src/malli/core.cljc:2750-2766."""
    sc = schema(s, options)
    dec = decoder(sc, transformer, options) if transformer is not None else (lambda x: x)
    valid = sc.validator()
    exp = explainer(sc, options)
    respond = respond or (lambda x: x)

    def default_raise(err):
        raise SchemaError("coercion failed", err)

    raise_ = raise_ or default_raise

    def coerce_(x):
        v = dec(x)
        if valid(v):
            return respond(v)
        return raise_({"value": v, "schema": sc, "explain": exp(v)})

    return coerce_


def coerce(s: Any, value: Any, transformer: Any = None,
           options: dict | None = None, respond: Callable | None = None,
           raise_: Callable | None = None) -> Any:
    """m/coerce — CPS arity takes respond/raise callbacks
    (src/malli/core.cljc:2768-2774, coerce-test core_test.cljc:3192-3208)."""
    return coercer(s, transformer, options, respond=respond, raise_=raise_)(value)


_IDENTITY_PARSE_TYPES = frozenset({
    "any", "some", "nil", "string", "int", "integer", "float", "double",
    "number", "boolean", "keyword", "symbol", "qualified-keyword",
    "qualified-symbol", "uuid", "enum", "re", "fn", ">", ">=", "<", "<=",
    "=", "not=", "not", "=>", "function",
}) | frozenset(PREDICATES)


def parser_info(s: Any, options: dict | None = None) -> dict:
    """Static 'is parse identity?' analysis enabling parse elision.

    Reference: ParserInfo / -parser-info, src/malli/core.cljc:99-100,
    761-763, 1361. When {"identity": True}, ``parse`` returns the input
    unchanged for every valid value, so a parse projection stage can be
    skipped entirely (SURVEY.md SS2.4 Ray mapping).
    """
    sc = schema(s, options)
    return {"identity": _parse_identity(sc, set())}


def _parse_identity(sc: Schema, seen: set) -> bool:
    if id(sc) in seen:
        return True  # recursive refs: identity unless a tagger intervenes
    seen = seen | {id(sc)}
    t = sc.type
    if t in ("orn", "multi", "andn", "catn", "altn", "cat", "alt",
             "?", "*", "+", "repeat"):
        return False
    if t in _IDENTITY_PARSE_TYPES:
        return True
    if t == "every":
        # bounded :every parses by VALIDATING and returning the value
        # unchanged regardless of the child (simple-parser-templates,
        # parser_test.cljc:48-53; core.cljc ->parser simple when bounded)
        return True
    if t in ("maybe", "vector", "sequential", "seqable", "set",
             "schema", "malli.core/schema", "not"):
        return all(_parse_identity(c, seen) for c in sc.children
                   if isinstance(c, Schema))
    if t == "and":
        # mirrors the transforming-child parser: identity iff NO child parses
        return all(_parse_identity(c, seen) for c in sc.children)
    if t == "or":
        return all(_parse_identity(c, seen) for c in sc.children)
    if t in ("map", "map-of", "tuple"):
        children = ([c for (_, _, c) in sc.children] if t == "map"
                    else [c for c in sc.children if isinstance(c, Schema)])
        return all(_parse_identity(c, seen) for c in children)
    if t in ("ref", "merge", "union", "select-keys"):
        try:
            return _parse_identity(sc.deref(), seen)
        except SchemaError:
            return False
    return False


#: global assert flag (the engine's *assert* analog, src/malli/core.cljc:2776)
ASSERTS_ENABLED = True


def assert_(s: Any, value: Any, options: dict | None = None) -> Any:
    """m/assert: validate honoring the global assert flag; returns the value
    or raises SchemaError with the explanation. src/malli/core.cljc:2776-2786."""
    if not ASSERTS_ENABLED:
        return value
    sc = schema(s, options)
    if sc.validator()(value):
        return value
    raise SchemaError("assertion failed",
                      {"schema": sc, "value": value,
                       "explain": explainer(sc, options)(value)})


# -- introspection ----------------------------------------------------------


def form(s: Any, options: dict | None = None) -> Any:
    return schema(s, options).form


def properties(s: Any, options: dict | None = None) -> dict:
    return schema(s, options).properties


def children(s: Any, options: dict | None = None) -> list:
    return schema(s, options).children


def entries(s: Any, options: dict | None = None) -> list:
    sc = schema(s, options)
    if isinstance(sc, (MapSchema, OrnSchema, MultiSchema)):
        return list(sc.children)
    raise SchemaError(f"{sc.type} has no entries")


def schema_type(s: Any, options: dict | None = None) -> str:
    return schema(s, options).type


def walk(s: Any, walker: Callable, options: dict | None = None) -> Any:
    return schema(s, options).walk(walker)


def deref(s: Any, options: dict | None = None) -> Schema:
    return schema(s, options).deref()


def ast(s: Any, options: dict | None = None) -> dict:
    return schema(s, options).ast()


def from_ast(node: dict, options: dict | None = None) -> Schema:
    """Build a Schema from its AST map (m/from-ast, src/malli/core.cljc:2865-2892)."""
    return schema(_ast_to_form(node), options)


def _ast_to_form(node: dict) -> Any:
    type_ = node["type"]
    props = dict(node.get("properties") or {})
    if "registry" in node:
        props["registry"] = {k: _ast_to_form(v)
                             for k, v in node["registry"].items()}
    if "keys" in node:
        out: list = [type_]
        if props:
            out.append(props)
        entries = sorted(node["keys"].items(),
                         key=lambda kv: kv[1].get("order", 0))
        for k, v in entries:
            child = _ast_to_form(v["value"])
            p = v.get("properties")
            out.append([k, p, child] if p else [k, child])
        return out
    if "key" in node and "value" in node:  # :map-of
        out = [type_]
        if props:
            out.append(props)
        out.extend([_ast_to_form(node["key"]), _ast_to_form(node["value"])])
        return out
    if "child" in node:
        out = [type_]
        if props:
            out.append(props)
        out.append(_ast_to_form(node["child"]))
        return out
    if "value" in node:
        out = [type_]
        if props:
            out.append(props)
        out.append(node["value"])
        return out
    if "values" in node:
        out = [type_]
        if props:
            out.append(props)
        out.extend(node["values"])
        return out
    children_ = node.get("children")
    if children_ is None and not props:
        return type_
    out = [type_]
    if props:
        out.append(props)
    for c in (children_ or []):
        if isinstance(c, dict) and "type" in c:
            out.append(_ast_to_form(c))
        elif isinstance(c, dict) and "value" in c:
            out.append(c["value"])
        else:
            out.append(c)
    return out
