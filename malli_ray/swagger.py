"""Swagger 2.0 export — the malli.swagger analog.

Reference: /root/reference/src/malli/swagger.cljc — a JSON-Schema-derived
format with Swagger 2.0 deltas: ``x-nullable`` instead of null-type unions,
no ``const`` (→ single-value enum), no ``prefixItems`` (tuples → items list
with x-tuple marker), ``x-anyOf``/``x-allOf`` for unsupported combinators.
"""

from __future__ import annotations

from typing import Any

from .json_schema import transform as js_transform

__all__ = ["transform"]


def transform(s: Any, options: dict | None = None) -> dict:
    return _swaggerize(js_transform(s, options))


def _swaggerize(node: Any) -> Any:
    if isinstance(node, list):
        return [_swaggerize(n) for n in node]
    if not isinstance(node, dict):
        return node
    node = {k: _swaggerize(v) for k, v in node.items()}

    # nullable oneOf -> x-nullable (swagger.cljc :maybe handling)
    if "oneOf" in node and {"type": "null"} in node["oneOf"]:
        others = [n for n in node["oneOf"] if n != {"type": "null"}]
        if len(others) == 1:
            node = {**others[0], "x-nullable": True,
                    **{k: v for k, v in node.items() if k != "oneOf"}}

    if "const" in node:
        node = {**{k: v for k, v in node.items() if k != "const"},
                "enum": [node["const"]]}

    # swagger 2.0 has no oneOf/anyOf/not -> x- extensions
    for key in ("oneOf", "anyOf"):
        if key in node:
            node[f"x-{key}"] = node.pop(key)
    if "allOf" in node:
        pass  # allOf IS valid swagger
    if "not" in node:
        node["x-not"] = node.pop("not")

    # tuples: prefixItems -> items list (swagger array form)
    if "prefixItems" in node:
        node["items"] = node.pop("prefixItems")
        node.pop("minItems", None)
        node.pop("maxItems", None)
        node["x-tuple"] = True

    return node
