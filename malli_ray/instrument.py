"""Function instrumentation — wrap callables with schema checks.

The engine analog of malli's ``m/-instrument`` (reference:
src/malli/core.cljc:3126-3147; var-wrapping instrument.clj:19-42): wrap a
Python callable (e.g. a UDF passed to ``map_batches``) so its inputs and
output are validated per call. SURVEY.md SS2.7 marks this optional for the
data engine; here it guards user-supplied pipeline UDFs.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

from .core import FunctionSchema, FunctionSetSchema, SchemaError, schema as to_schema
from .error import humanize

__all__ = ["instrument"]


def instrument(fn_schema: Any, f: Callable | None = None, *,
               report: Callable | None = None, options: dict | None = None):
    """Wrap ``f`` so args validate against the :=> input :cat and the return
    value against the output schema.

    Usable as a decorator::

        @instrument(["=>", ["cat", "int", "int"], "int"])
        def add(x, y): return x + y

    ``report(kind, data)`` overrides the default raising behavior
    (kind is "input", "output" or "arity"), mirroring ::m/report-fn. An
    arity outside the input seqex's static min/max reports "arity" BEFORE
    input validation (reference ::m/invalid-arity, core.cljc:2227-2230);
    a multi-arity :function schema dispatches on argument count with a
    varargs fallback (core.cljc:2296-2311).
    """
    sc = to_schema(fn_schema, options)
    if not isinstance(sc, (FunctionSchema, FunctionSetSchema)):
        sc = sc.deref()
    if isinstance(sc, FunctionSetSchema):
        return _instrument_multi(sc, f, report=report, options=options)
    if not isinstance(sc, FunctionSchema):
        raise SchemaError("instrument requires a :=> or :function schema")
    in_schema, out_schema = sc.input, sc.output
    in_valid = in_schema.validator()
    out_valid = out_schema.validator()
    # optional third :=> child: the guard relates [args, return-value]
    # (reference ::m/invalid-guard, core.cljc:2217-2236)
    guard_schema = sc.children[2] if len(sc.children) > 2 else None
    guard_valid = guard_schema.validator() if guard_schema else None
    try:
        info = sc.function_info()
        min_arity, max_arity = info["min"], info.get("max")
    except SchemaError:       # e.g. recursive seqex input: no static bounds
        min_arity, max_arity = 0, None

    def default_report(kind: str, data: dict):
        raise SchemaError(f"invalid function {kind}", data)

    rep = report or default_report

    def wrap(func: Callable) -> Callable:
        import inspect
        try:
            sig = inspect.signature(func)
        except (TypeError, ValueError):
            sig = None

        @functools.wraps(func)
        def wrapped(*args, **kwargs):
            # bind to the declared parameter order so out-of-order kwargs
            # line up with the :cat positions
            if sig is not None and kwargs:
                try:
                    bound = sig.bind(*args, **kwargs)
                    all_args = []
                    for name, val in bound.arguments.items():
                        kind = sig.parameters[name].kind
                        if kind is inspect.Parameter.VAR_POSITIONAL:
                            all_args.extend(val)       # *args flatten
                        elif kind is inspect.Parameter.VAR_KEYWORD:
                            all_args.extend(val.values())  # **kwargs flatten
                        else:
                            all_args.append(val)
                except TypeError:
                    all_args = list(args) + list(kwargs.values())
            else:
                all_args = list(args) + list(kwargs.values())
            n = len(all_args)
            if n < min_arity or (max_arity is not None and n > max_arity):
                rep("arity", {"arity": n, "min": min_arity,
                              "max": max_arity, "args": all_args})
            if not in_valid(all_args):
                from .core import explain
                rep("input", {"args": all_args,
                              "explain": explain(in_schema, all_args),
                              "humanized": humanize(explain(in_schema, all_args))})
            out = func(*args, **kwargs)
            if not out_valid(out):
                from .core import explain
                rep("output", {"value": out,
                               "explain": explain(out_schema, out),
                               "humanized": humanize(explain(out_schema, out))})
            if guard_valid is not None and not guard_valid([all_args, out]):
                from .core import explain
                g_expl = explain(guard_schema, [all_args, out])
                rep("guard", {"args": all_args, "value": out,
                              "explain": g_expl,
                              "humanized": humanize(g_expl)})
            return out

        wrapped.__malli_schema__ = sc
        return wrapped

    return wrap(f) if f is not None else wrap


def _instrument_multi(sc: FunctionSetSchema, f: Callable | None, *,
                      report: Callable | None, options: dict | None):
    """:function (multi-arity) instrument: build one wrapped fn per :=>
    child, dispatch by positional-argument count, fall back to the varargs
    arity when the count is at or above its min (core.cljc:2296-2311)."""

    def default_report(kind: str, data: dict):
        raise SchemaError(f"invalid function {kind}", data)

    rep = report or default_report
    arities = sc.arities()
    if not arities:
        raise SchemaError(":function schema has no :=> arities")

    def wrap(func: Callable) -> Callable:
        by_arity: dict = {}
        varargs = None
        for ar in arities:
            info = ar.function_info()
            wrapped_ar = instrument(ar, func, report=report, options=options)
            if info["arity"] == "varargs":
                if varargs is not None:
                    raise SchemaError(":function has duplicate varargs arities")
                varargs = (info["min"], wrapped_ar)
            else:
                if info["arity"] in by_arity:
                    raise SchemaError(
                        f":function has duplicate arity {info['arity']}")
                by_arity[info["arity"]] = wrapped_ar

        if not by_arity and varargs is not None and len(arities) == 1:
            return varargs[1]
        if len(by_arity) == 1 and varargs is None:
            return next(iter(by_arity.values()))

        @functools.wraps(func)
        def dispatch(*args, **kwargs):
            n = len(args) + len(kwargs)
            target = by_arity.get(n)
            if target is None and varargs is not None and n >= varargs[0]:
                target = varargs[1]
            if target is None:
                rep("arity", {"arity": n,
                              "arities": sorted(by_arity) +
                                         (["varargs"] if varargs else []),
                              "args": list(args)})
                return None
            return target(*args, **kwargs)

        dispatch.__malli_schema__ = sc
        return dispatch

    return wrap(f) if f is not None else wrap
