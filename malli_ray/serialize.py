"""Schema <-> string serialization (the malli.edn surface, JSON-encoded).

Reference: malli.edn/write-string / read-string round-trip schemas as EDN
(/root/reference/src/malli/edn.cljc:13-23). Our forms are JSON-native data
(lists / dicts / strings / numbers), so the wire format is JSON; regex and
function children serialize through their source strings (the same restriction
malli's sci edn path has). The checkpoint store persists job schemas with
this module, which is what makes resume schema-exact.
"""

from __future__ import annotations

import json
import re as _re
from typing import Any

from .core import Schema, SchemaError, schema

__all__ = ["write_string", "read_string", "form_to_jsonable", "jsonable_to_form"]


def form_to_jsonable(form: Any) -> Any:
    if isinstance(form, Schema):
        return form_to_jsonable(form.form)
    if isinstance(form, _re.Pattern):
        return {"$re": form.pattern}
    if isinstance(form, (list, tuple)):
        return [form_to_jsonable(f) for f in form]
    if isinstance(form, dict):
        return {k: form_to_jsonable(v) for k, v in form.items()}
    if isinstance(form, set):
        return {"$set": sorted(form_to_jsonable(v) for v in form)}
    if callable(form):
        name = getattr(form, "__name__", None)
        raise SchemaError(
            f"cannot serialize callable {name or form!r}; use a source-string "
            ":fn child or a registered named predicate instead")
    return form


def jsonable_to_form(data: Any) -> Any:
    if isinstance(data, dict):
        if set(data.keys()) == {"$re"}:
            return _re.compile(data["$re"])
        if set(data.keys()) == {"$set"}:
            return set(data["$set"])
        return {k: jsonable_to_form(v) for k, v in data.items()}
    if isinstance(data, list):
        return [jsonable_to_form(d) for d in data]
    return data


def write_string(s: Any, options: dict | None = None) -> str:
    """Schema (or form) -> JSON string."""
    return json.dumps(form_to_jsonable(schema(s, options).form), sort_keys=False)


def read_string(text: str, options: dict | None = None) -> Schema:
    """JSON string -> compiled Schema ("over the wire" round trip)."""
    return schema(jsonable_to_form(json.loads(text)), options)
