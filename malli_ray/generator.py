"""Deterministic value generation from schemas (the malli.generator surface).

Seeded, dependency-free reimplementation of the semantics of
/root/reference/src/malli/generator.cljc (:19-90, 451-483): every schema type
gets a generator honoring :min/:max plus the :gen/* property hooks with the
reference's -create ordering — :gen/return > :gen/elements > :gen/schema >
default, wrapped by :gen/fmap (callable or restricted source string);
:gen/min/:gen/max refine :min/:max (fail when looser); recursive refs halve
the size budget per deref (linear, not exponential, value sizes). The
roundtrip property ``validate(s, generate(s)) == True`` is the test contract
(generator_test.cljc style). Used to build synthetic FIXTURES (SURVEY.md
SS2.13 'generators from schemas' row). :gen/gen (a raw test.check generator)
has no Python counterpart — use :gen/schema or :gen/fmap instead.
"""

from __future__ import annotations

import math
import string as _string
import uuid as _uuid
from typing import Any

import numpy as np

from .core import (
    DEFAULT_KEY, CollectionSchema, EnumSchema, FnSchema, MapOfSchema, MapSchema,
    MaybeSchema, MultiSchema, NotSchema, OrnSchema, ReSchema, Schema,
    SchemaError, TupleSchema, WrapperSchema, schema as to_schema,
)
from .regex_engine import AltSchema, CatSchema, RepeatSchema

__all__ = ["generate", "sample"]

_ALPHABET = _string.ascii_lowercase + _string.digits


def generate(s: Any, seed: int = 42, size: int = 10,
             options: dict | None = None) -> Any:
    """One deterministic value satisfying the schema."""
    rng = np.random.default_rng(seed)
    return _gen(to_schema(s, options), rng, size, depth=0)


def sample(s: Any, n: int = 10, seed: int = 42, size: int = 10,
           options: dict | None = None) -> list:
    rng = np.random.default_rng(seed)
    sc = to_schema(s, options)
    return [_gen(sc, rng, size, depth=0) for _ in range(n)]


def _gen_min_max(props: dict, lo, hi):
    """-min-max (generator.cljc:77-84): :gen/min|:gen/max refine :min|:max
    and must not loosen them (fail loudly otherwise)."""
    mn, mx = props.get("min"), props.get("max")
    gmn, gmx = props.get("gen/min"), props.get("gen/max")
    if mn is not None and gmn is not None and gmn < mn:
        raise SchemaError(f"invalid :gen/min {gmn} < :min {mn}")
    if mx is not None and gmx is not None and gmx > mx:
        raise SchemaError(f"invalid :gen/max {gmx} > :max {mx}")
    out_mn = gmn if gmn is not None else (mn if mn is not None else lo)
    out_mx = gmx if gmx is not None else (mx if mx is not None else hi)
    return out_mn, out_mx


def _bounded_int(rng, props: dict, lo=-1000, hi=1000) -> int:
    mn, mx = _gen_min_max(props, lo, hi)
    if mn > mx:
        raise SchemaError(f"unsatisfiable int bounds {mn} > {mx}")
    return int(rng.integers(mn, mx + 1))


def _string_of(rng, length: int) -> str:
    return "".join(_ALPHABET[i] for i in rng.integers(0, len(_ALPHABET), length))


def _count_bounds(props: dict, size: int) -> tuple[int, int]:
    mn, mx = _gen_min_max(props, 0, None)
    if mx is None:
        mx = max(mn, min(size, mn + size))
    return mn, max(mn, mx)


_MAX_DEPTH = 8


def _resolve_gen_fn(f: Any) -> Any:
    """:gen/fmap value -> callable: a Python callable, or a restricted
    source string (same contract as :fn children; reference evals through
    sci, src/malli/core.cljc:2897-2916)."""
    if callable(f):
        return f
    if isinstance(f, str):
        from .core import compile_fn_source
        return compile_fn_source(f)
    raise SchemaError(":gen/fmap must be callable or a source string")


def _gen(sc: Schema, rng, size: int, depth: int) -> Any:
    """-create ordering (generator.cljc:451-483): :gen/return >
    :gen/elements > :gen/schema > the schema's own generator; :gen/fmap
    wraps whichever was chosen."""
    props = sc.properties or {}
    fmap = props.get("gen/fmap")
    if "gen/return" in props:
        out = props["gen/return"]
    elif "gen/elements" in props:
        els = props["gen/elements"]
        out = els[int(rng.integers(0, len(els)))]
    elif "gen/schema" in props:
        out = _gen(to_schema(props["gen/schema"], sc.options), rng, size,
                   depth + 1)
    else:
        out = _gen_base(sc, rng, size, depth)
    if fmap is not None:
        out = _resolve_gen_fn(fmap)(out)
    return out


def _gen_base(sc: Schema, rng, size: int, depth: int) -> Any:
    props = sc.properties or {}
    if depth > _MAX_DEPTH:
        return _shallow_default(sc)

    t = sc.type

    if isinstance(sc, EnumSchema):
        return sc.children[int(rng.integers(0, len(sc.children)))]
    if isinstance(sc, MaybeSchema):
        if rng.random() < 0.2:
            return None
        return _gen(sc.children[0], rng, size, depth + 1)
    if isinstance(sc, MapSchema):
        out = {}
        for (k, p, cs) in sc.children:
            if k == DEFAULT_KEY:
                continue
            if (p or {}).get("optional") and rng.random() < 0.3:
                continue
            out[k] = _gen(cs, rng, size, depth + 1)
        return out
    if isinstance(sc, MapOfSchema):
        mn, mx = _count_bounds(props, max(2, size // 2))
        n = int(rng.integers(mn, mx + 1))
        out = {}
        guard = 0
        while len(out) < n and guard < n * 20:
            k = _gen(sc.children[0], rng, size, depth + 1)
            try:
                out[k] = _gen(sc.children[1], rng, size, depth + 1)
            except TypeError:
                pass
            guard += 1
        if len(out) < mn:
            raise SchemaError(
                f"cannot generate {mn}+ distinct keys for {sc.form!r} "
                "(key domain too small)")
        return out
    if isinstance(sc, CollectionSchema):
        mn, mx = _count_bounds(props, max(2, size // 2))
        n = int(rng.integers(mn, mx + 1))
        items = [_gen(sc.children[0], rng, size, depth + 1) for _ in range(n)]
        if t == "set":
            return set(items)
        return items
    if isinstance(sc, TupleSchema):
        return [_gen(c, rng, size, depth + 1) for c in sc.children]
    if isinstance(sc, OrnSchema):
        k, p, cs = sc.children[int(rng.integers(0, len(sc.children)))]
        return _gen(cs, rng, size, depth + 1)
    if isinstance(sc, MultiSchema):
        branches = list(sc.branches.values()) + (
            [sc.default_branch] if sc.default_branch else [])
        return _gen(branches[int(rng.integers(0, len(branches)))], rng, size, depth + 1)
    if isinstance(sc, NotSchema):
        # try candidates until the complement accepts (bounded)
        valid = sc.validator()
        for cand in (None, 0, "x", 1.5, [], {}, True, -1, "zzz"):
            if valid(cand):
                return cand
        raise SchemaError(f"cannot generate for {sc.form!r}")
    if isinstance(sc, ReSchema):
        return _gen_regex_string(sc.pattern.pattern, rng)
    if isinstance(sc, FnSchema):
        valid = sc.validator()
        for _ in range(1000):
            cand = int(rng.integers(-1000, 1001))
            if valid(cand):
                return cand
        for cand in (None, "", "x", 0.5, [], {}):
            if valid(cand):
                return cand
        raise SchemaError(f"cannot generate for :fn schema")
    if isinstance(sc, WrapperSchema):
        # plain wrappers ([:schema X], named registry aliases) are not the
        # recursion point — pass the size budget through unchanged so a
        # wrapped schema generates the same distribution as the unwrapped
        # one; only :ref derefs (below) halve, which is what bounds
        # recursive schemas to LINEAR size (generator.cljc "Approach for
        # recursive generators").
        return _gen(sc.deref(), rng, size, depth + 1)
    if isinstance(sc, (CatSchema, AltSchema, RepeatSchema)):
        return _gen_seq_regex(sc, rng, size, depth)

    if t == "and":
        valid = sc.validator()
        for attempt in range(200):
            cand = _gen(sc.children[0], rng, size, depth + 1)
            if valid(cand):
                return cand
        raise SchemaError(f"cannot satisfy :and schema {sc.form!r}")
    if t == "or":
        c = sc.children[int(rng.integers(0, len(sc.children)))]
        return _gen(c, rng, size, depth + 1)
    if t == "ref":
        return _gen(sc.deref(), rng, max(0, size // 2), depth + 1)

    return _gen_simple(sc, t, props, rng, size)


def _gen_simple(sc: Schema, t: str, props: dict, rng, size: int) -> Any:
    if t in ("int", "integer", "int?", "integer?"):
        return _bounded_int(rng, props)
    if t == "pos-int?":
        return _bounded_int(rng, props, 1, 1000)
    if t == "neg-int?":
        return _bounded_int(rng, props, -1000, -1)
    if t == "nat-int?":
        return _bounded_int(rng, props, 0, 1000)
    if t in ("double", "float", "double?", "float?", "number", "number?"):
        # :gen/infinite? / :gen/NaN? opt-ins (generator.cljc:86-88 inf-nan;
        # defaults exclude both, like gen-double's double-default)
        if props.get("gen/infinite?") and rng.random() < 0.15:
            return math.inf if rng.random() < 0.5 else -math.inf
        if props.get("gen/NaN?") and rng.random() < 0.15:
            return math.nan
        mn, mx = _gen_min_max(props, -1000.0, 1000.0)
        v = float(rng.uniform(mn, mx))
        return v if t not in ("double?", "float?") else v + 0.0
    if t == "pos?":
        return float(rng.uniform(0.001, 1000))
    if t == "neg?":
        return float(rng.uniform(-1000, -0.001))
    if t == "zero?":
        return 0
    if t in ("string", "string?", "keyword", "keyword?", "symbol", "symbol?"):
        mn, mx = _count_bounds(props, size)
        return _string_of(rng, int(rng.integers(mn, mx + 1)))
    if t in ("qualified-keyword", "qualified-symbol"):
        return f"{_string_of(rng, 3)}/{_string_of(rng, 4)}"
    if t == "char?":
        return _ALPHABET[int(rng.integers(0, len(_ALPHABET)))]
    if t in ("boolean", "boolean?"):
        return bool(rng.random() < 0.5)
    if t == "true?":
        return True
    if t == "false?":
        return False
    if t in ("nil", "nil?"):
        return None
    if t in ("uuid", "uuid?"):
        return _uuid.UUID(bytes=bytes(rng.integers(0, 256, 16, dtype=np.uint8)))
    if t in ("any", "any?", "some", "some?"):
        return _bounded_int(rng, {})
    if t == "bytes?":
        return bytes(rng.integers(0, 256, size, dtype=np.uint8))
    if t in (">", ">=", "<", "<="):
        b = sc.children[0]
        delta = int(rng.integers(1, 10))
        return {"" ">": b + delta, ">": b + delta, ">=": b + delta - 1,
                "<": b - delta, "<=": b - delta + 1}[t]
    if t == "=":
        return sc.children[0]
    if t == "not=":
        b = sc.children[0]
        return (b + 1) if isinstance(b, (int, float)) and not isinstance(b, bool) else "different"
    valid = sc.validator()
    for cand in (0, 1, "x", None, 1.5, [], {}, True):
        if valid(cand):
            return cand
    raise SchemaError(f"no generator for schema type {t!r}")


def _gen_seq_regex(sc: Schema, rng, size: int, depth: int) -> list:
    out: list = []
    _emit_regex(sc, rng, size, depth, out)
    return out


def _emit_regex(sc: Schema, rng, size: int, depth: int, out: list) -> None:
    if isinstance(sc, CatSchema):
        for (k, s) in sc._parts():
            _emit_child(s, rng, size, depth, out)
    elif isinstance(sc, AltSchema):
        parts = sc._parts()
        k, s = parts[int(rng.integers(0, len(parts)))]
        _emit_child(s, rng, size, depth, out)
    elif isinstance(sc, RepeatSchema):
        # :min/:max and :gen/min/:gen/max properties bound the generated
        # repetition count on :+/:*/:repeat too (min-max-test,
        # generator_test.cljc:299-346); the structural minimum (1 for :+)
        # still applies
        pmn, pmx = _gen_min_max(sc.properties or {}, None, None)
        mn = max(sc.min, pmn) if pmn is not None else sc.min
        mx = pmx if pmx is not None else sc.max
        if mx is None:
            mx = mn + max(1, size // 2)
        if mn > mx:
            raise SchemaError(
                f"unsatisfiable repetition bounds {mn} > {mx} for {sc.form!r}")
        n = int(rng.integers(mn, mx + 1))
        for _ in range(n):
            _emit_child(sc.children[0], rng, size, depth, out)


def _emit_child(s: Schema, rng, size: int, depth: int, out: list) -> None:
    if isinstance(s, (CatSchema, AltSchema, RepeatSchema)):
        _emit_regex(s, rng, size, depth, out)
    else:
        out.append(_gen(s, rng, size, depth + 1))


def _gen_regex_string(pattern: str, rng) -> str:
    """Tiny regex string generator for common patterns; falls back to search
    for literal-ish patterns."""
    import re as _re
    import sre_parse

    try:
        parsed = sre_parse.parse(pattern)
    except Exception:
        raise SchemaError(f"cannot generate for regex {pattern!r}")

    out: list[str] = []

    def emit(tokens):
        for op, arg in tokens:
            op = str(op)
            if op == "LITERAL":
                out.append(chr(arg))
            elif op == "IN":
                choices = []
                for iop, iarg in arg:
                    iop = str(iop)
                    if iop == "LITERAL":
                        choices.append(chr(iarg))
                    elif iop == "RANGE":
                        choices.extend(chr(c) for c in range(iarg[0], min(iarg[1], iarg[0] + 20) + 1))
                    elif iop == "CATEGORY":
                        cat = str(iarg)
                        if "DIGIT" in cat:
                            choices.extend("0123456789")
                        elif "WORD" in cat:
                            choices.extend(_ALPHABET)
                        elif "SPACE" in cat:
                            choices.append(" ")
                if choices:
                    out.append(choices[int(rng.integers(0, len(choices)))])
            elif op in ("MAX_REPEAT", "MIN_REPEAT"):
                mn, mx, sub = arg
                mx = mn + 3 if mx is sre_parse.MAXREPEAT or mx > mn + 3 else mx
                n = int(rng.integers(mn, mx + 1))
                for _ in range(n):
                    emit(sub)
            elif op == "SUBPATTERN":
                emit(arg[3])
            elif op == "BRANCH":
                branches = arg[1]
                emit(branches[int(rng.integers(0, len(branches)))])
            elif op == "CATEGORY":
                cat = str(arg)
                if "DIGIT" in cat:
                    out.append(str(int(rng.integers(0, 10))))
                elif "WORD" in cat:
                    out.append(_ALPHABET[int(rng.integers(0, len(_ALPHABET)))])
                else:
                    out.append(" ")
            elif op in ("AT",):
                pass
            elif op == "ANY":
                out.append(_ALPHABET[int(rng.integers(0, len(_ALPHABET)))])

    emit(parsed)
    s = "".join(out)
    if _re.search(pattern, s) is None:
        raise SchemaError(f"generated string does not match {pattern!r}")
    return s


def _shallow_default(sc: Schema) -> Any:
    """Depth-capped fallback: a VALID simple value or a clear error — never a
    silently-invalid placeholder (roundtrip contract: generated => valid)."""
    valid = sc.validator()
    for cand in (None, 0, 1, "", "x", [], {}, set(), False, True, 0.5):
        if valid(cand):
            return cand
    raise SchemaError(
        f"generation depth limit reached with no valid shallow value for "
        f"{sc.form!r}")
