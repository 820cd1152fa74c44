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

from .core import FunctionSchema, SchemaError, schema as to_schema
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
    (kind is "input" or "output"), mirroring ::m/report-fn.
    """
    sc = to_schema(fn_schema, options)
    sc = sc.deref() if not isinstance(sc, FunctionSchema) else sc
    if not isinstance(sc, FunctionSchema):
        raise SchemaError("instrument requires a :=> schema")
    in_schema, out_schema = sc.input, sc.output
    in_valid = in_schema.validator()
    out_valid = out_schema.validator()

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
            return out

        wrapped.__malli_schema__ = sc
        return wrapped

    return wrap(f) if f is not None else wrap
