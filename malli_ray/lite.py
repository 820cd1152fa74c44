"""malli.experimental.lite — dict-style schema sugar.

Reference: /root/reference/src/malli/experimental/lite.cljc:1-24.
``{"name": "string", "age": optional("int")}`` -> ``[:map ...]``; nested dicts
nest. The reference uses dynamic *options*; we pass options explicitly.
"""

from __future__ import annotations

from typing import Any

from .core import Schema, schema

__all__ = ["from_lite", "optional", "Optional"]


class Optional:
    __slots__ = ("child",)

    def __init__(self, child: Any):
        self.child = child


def optional(child: Any) -> Optional:
    return Optional(child)


def _form(x: Any) -> Any:
    if isinstance(x, dict):
        out: list = ["map"]
        for k, v in x.items():
            if isinstance(v, Optional):
                out.append([k, {"optional": True}, _form(v.child)])
            else:
                out.append([k, _form(v)])
        return out
    if isinstance(x, Schema):
        return x.form
    return x


def from_lite(x: Any, options: dict | None = None) -> Schema:
    return schema(_form(x), options)
