"""Graphviz DOT export of schema trees (malli.dot analog).

Reference: /root/reference/src/malli/dot.cljc — renders a schema as a
digraph for documentation. Node labels show type+properties; entry edges are
labeled with the key (optional keys dashed).
"""

from __future__ import annotations

from typing import Any

from .core import DEFAULT_KEY, MapSchema, MultiSchema, OrnSchema, Schema, schema as to_schema

__all__ = ["transform"]


def _label(sc: Schema) -> str:
    t = sc.type
    props = {k: v for k, v in (sc.properties or {}).items()
             if not str(k).startswith(("gen/", "error/", "decode/", "encode/"))
             and k != "registry"}
    leafish = not any(isinstance(c, Schema) for c in sc.children) and not isinstance(
        sc, (MapSchema, OrnSchema, MultiSchema))
    if leafish and sc.children:
        vals = " ".join(repr(c)[:20] for c in sc.children[:6])
        base = f"{t} {vals}"
    else:
        base = t
    if props:
        base += " " + repr(props)
    return base.replace('"', "'")


def transform(s: Any, options: dict | None = None) -> str:
    """Schema/form -> DOT digraph source."""
    sc = to_schema(s, options)
    lines = ["digraph schema {", "  node [shape=box, fontname=monospace];"]
    counter = [0]

    def walk_(node: Schema) -> str:
        nid = f"n{counter[0]}"
        counter[0] += 1
        lines.append(f'  {nid} [label="{_label(node)}"];')
        if isinstance(node, (MapSchema, OrnSchema, MultiSchema)) or node.type in (
                "catn", "altn", "andn"):
            for (k, p, cs) in node.children:
                if not isinstance(cs, Schema):
                    continue
                child = walk_(cs)
                style = ' style=dashed' if (p or {}).get("optional") else ""
                key = "…" if k == DEFAULT_KEY else str(k).replace('"', "'")
                lines.append(f'  {nid} -> {child} [label="{key}"{style}];')
        else:
            for c in node.children:
                if isinstance(c, Schema):
                    child = walk_(c)
                    lines.append(f"  {nid} -> {child};")
        return nid

    walk_(sc)
    lines.append("}")
    return "\n".join(lines)
