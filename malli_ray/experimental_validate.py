"""malli.experimental.validate — the ``:validate`` schema type.

A ``:fn`` variant whose function returns *custom error maps* instead of a
boolean: ``f(value)`` returns ``None`` (valid) or a sequence of
``{"in": [...], "type": ..., "value": ...}`` maps that become explain
errors verbatim (with ``in`` appended to the enclosing path).

Reference: src/malli/experimental/validate.cljc:1-59 and
test/malli/experimental/validate_test.cljc:1-107.  Reference quirks
mirrored deliberately:

- the schema's *type* is ``fn`` even though the registry key is
  ``validate`` (``(-type [_] :fn)``, validate.cljc:14), so ``m/form``
  prints ``[:fn f]`` and parser-info reports a simple (identity) parser;
- the validator treats only ``nil``/``None`` as valid
  (``(nil? (f val))``, validate.cljc:27) — an *empty* error sequence is
  falsy for ``validate`` yet produces no explain errors;
- an exception inside ``f`` yields one error at the schema's own path
  whose error type is taken from the exception's ``data["type"]`` when
  present (``(:type (ex-data e))``, validate.cljc:36).
"""

from __future__ import annotations

from typing import Any

from .core import FnSchema, _error


class ValidateSchema(FnSchema):
    """Compiled ``:validate`` node (shares child handling with :fn)."""

    def _validator(self):
        f = self.fn

        def pred(x: Any) -> bool:
            try:
                return f(x) is None
            except Exception:
                return False

        return pred

    def _explainer(self, path):
        f = self.fn
        this = self

        def explain_(x: Any, in_: list, acc: list) -> list:
            try:
                errors = f(x)
            except Exception as e:
                data = getattr(e, "data", None)
                t = data.get("type") if isinstance(data, dict) else None
                acc.append(_error(path, list(in_), this, x, t))
                return acc
            if errors:
                for err in errors:
                    acc.append(_error(
                        path,
                        list(in_) + list(err.get("in") or []),
                        this,
                        err.get("value"),
                        err.get("type")))
            return acc

        return explain_


def _validate_ctor(type_, properties, children, options):
    # a plain-function ctor keeps the callable child RAW (core._make would
    # compile a callable child of a Schema-class ctor into an :fn schema);
    # the built type is "fn" per the reference's (-type [_] :fn)
    return ValidateSchema("fn", properties, children, options)


def schemas() -> dict:
    """Registry fragment: ``{"validate": ...}`` (validate.cljc:58-59)."""
    return {"validate": _validate_ctor}
