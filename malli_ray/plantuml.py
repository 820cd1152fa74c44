"""PlantUML export of schema trees (malli.plantuml analog).

Reference: /root/reference/src/malli/plantuml.cljc:1-21 — renders the
schema's named entities (the local ``registry`` entries, plus the top-level
schema as ``Schema`` when anonymous) as ``entity`` blocks with their map
entries, and draws ``o--`` links between entities that reference each other
through ``:ref``.  Entities are emitted in sorted name order (the
reference's ``sorted``), so output is deterministic.
"""

from __future__ import annotations

from typing import Any

from .core import DEFAULT_KEY, MapSchema, Schema, schema as to_schema

__all__ = ["transform"]


def _collect_registry(sc: Schema) -> dict[str, Schema]:
    """Named entities: every local-registry entry reachable from the root
    (the analog of md/-lift + -collect + -normalize)."""
    registry: dict[str, Schema] = {}

    def walk_(node: Schema) -> None:
        reg = (node.properties or {}).get("registry") or {}
        for name, form in reg.items():
            if name not in registry:
                entity = form if isinstance(form, Schema) else to_schema(
                    form, node.options)
                registry[str(name)] = entity
                walk_(entity)
        for c in node.children:
            if isinstance(c, Schema):
                walk_(c)
            elif isinstance(c, (tuple, list)) and len(c) == 3 and isinstance(
                    c[2], Schema):
                walk_(c[2])

    walk_(sc)
    return registry


def _ref_targets(sc: Schema, names: set[str]) -> list[str]:
    """Registry names referenced (via :ref) inside ``sc``'s subtree."""
    found: list[str] = []

    def walk_(node: Schema) -> None:
        if node.type == "ref" and node.children and str(node.children[0]) in names:
            n = str(node.children[0])
            if n not in found:
                found.append(n)
            return  # don't deref — links are structural, not recursive
        for c in node.children:
            if isinstance(c, Schema):
                walk_(c)
            elif isinstance(c, (tuple, list)) and len(c) == 3 and isinstance(
                    c[2], Schema):
                walk_(c[2])

    walk_(sc)
    return found


def _entity_body(sc: Schema) -> str:
    if isinstance(sc, MapSchema):
        rows = []
        for (k, p, cs) in sc.children:
            key = "..." if k == DEFAULT_KEY else str(k)
            rows.append(f" {key} {cs.form!r}")
        return "\n".join(rows) if rows else f" {sc.form!r}"
    return f" {sc.form!r}"


def transform(s: Any, options: dict | None = None) -> str:
    """Schema/form -> PlantUML source (@startuml ... @enduml)."""
    sc = to_schema(s, options)
    registry = _collect_registry(sc)
    if not registry:
        registry = {"Schema": sc}
    else:
        # add an anonymous top-level entity unless the root is just a
        # pointer into the registry (e.g. [:schema {:registry ...} Order])
        top = sc
        for _ in range(8):
            if top.type in ("schema", "malli.core/schema", "ref"):
                try:
                    top = top.deref()
                    continue
                except Exception:
                    break
            break
        top_form = getattr(top, "form", None)
        if not any(e.form == top_form for e in registry.values()):
            registry.setdefault("Schema", sc)
    names = set(registry)
    lines = ["@startuml"]
    for name in sorted(registry):
        lines.append(f"entity {name} {{")
        lines.append(_entity_body(registry[name]))
        lines.append("}")
    for name in sorted(registry):
        for target in _ref_targets(registry[name], names):
            lines.append(f"{name} o-- {target}")
    lines.append("@enduml")
    return "\n".join(lines)
