"""Schema inference — the malli.provider surface, as a distributed aggregation.

Reference semantics (/root/reference/src/malli/provider.cljc:14-111): a
reduce-accumulate-finalize pass — ``(reduce infer {} xs)`` builds per-type /
per-key counters, then ``-schema`` picks winners by preference order (:5-6),
wraps nullable values in :maybe, unions mixed types in :or, and marks map keys
{:optional true} when their count is below the map count.

This is exactly a distributed aggregation (SURVEY.md SS2.1 last row): here the
accumulator is a plain nested dict (mergeable partial), built per batch inside
``map_batches`` and merged driver-side; ``finalize`` produces the DSL form.
For Arrow tables the per-column accumulation is vectorized (the Arrow dtype
resolves the type counter in O(1) per batch; only true object columns walk
values).
"""

from __future__ import annotations

import datetime as _dt
import uuid as _uuid
from typing import Any

import numpy as np

__all__ = ["provide", "accumulate_value", "accumulate_table", "merge_stats",
           "finalize", "infer_dataset"]

#: type preference for :or ordering (provider.cljc:5-6 analogue)
_PREFERENCE = ["map", "vector", "set", "tuple", "int", "double", "boolean",
               "uuid", "inst?", "keyword", "string", "any", "nil"]


def _rank(t: str) -> int:
    try:
        return _PREFERENCE.index(t)
    except ValueError:
        return len(_PREFERENCE)


def _new_stats() -> dict:
    return {"count": 0, "types": {}, "keys": {}, "item": None, "min": None, "max": None}


def _value_type(v: Any) -> str:
    if v is None:
        return "nil"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "double"
    if isinstance(v, str):
        return "string"
    if isinstance(v, dict):
        return "map"
    if isinstance(v, (list, tuple)):
        return "vector"
    if isinstance(v, (set, frozenset)):
        return "set"
    if isinstance(v, _uuid.UUID):
        return "uuid"
    if isinstance(v, (_dt.datetime, _dt.date)):
        return "inst?"
    return "any"


def accumulate_value(stats: dict, v: Any) -> dict:
    """One reduction step (provider.cljc:14-36)."""
    stats["count"] += 1
    t = _value_type(v)
    stats["types"][t] = stats["types"].get(t, 0) + 1
    if t == "map":
        for k, kv in v.items():
            sub = stats["keys"].get(k)
            if sub is None:
                sub = stats["keys"][k] = _new_stats()
            accumulate_value(sub, kv)
    elif t in ("vector", "set"):
        if stats["item"] is None:
            stats["item"] = _new_stats()
        for item in v:
            accumulate_value(stats["item"], item)
    elif t in ("int", "double"):
        stats["min"] = v if stats["min"] is None else min(stats["min"], v)
        stats["max"] = v if stats["max"] is None else max(stats["max"], v)
    return stats


def merge_stats(a: dict, b: dict) -> dict:
    """Commutative partial merge (the distributed combine)."""
    a["count"] += b["count"]
    for t, n in b["types"].items():
        a["types"][t] = a["types"].get(t, 0) + n
    for k, sub in b["keys"].items():
        if k in a["keys"]:
            merge_stats(a["keys"][k], sub)
        else:
            a["keys"][k] = sub
    if b["item"] is not None:
        if a["item"] is None:
            a["item"] = b["item"]
        else:
            merge_stats(a["item"], b["item"])
    for key, pick in (("min", min), ("max", max)):
        if b.get(key) is not None:
            a[key] = b[key] if a.get(key) is None else pick(a[key], b[key])
    return a


def finalize(stats: dict) -> Any:
    """Stats -> DSL form (provider.cljc -schema, :38-90)."""
    types = dict(stats["types"])
    nil_count = types.pop("nil", 0)
    if not types:
        return "nil" if nil_count else "any"
    # int subsumed by double when both present (numeric widening)
    if "int" in types and "double" in types:
        types["double"] += types.pop("int")
    forms = []
    for t in sorted(types, key=_rank):
        if t == "map":
            total_maps = stats["types"].get("map", 0)
            entries = []
            for k in stats["keys"]:
                sub = stats["keys"][k]
                child = finalize(sub)
                if sub["count"] < total_maps:
                    entries.append([k, {"optional": True}, child])
                else:
                    entries.append([k, child])
            forms.append(["map", *entries] if entries else "map")
        elif t in ("vector", "set"):
            item = finalize(stats["item"]) if stats["item"] is not None else "any"
            forms.append([t, item])
        else:
            forms.append(t)
    form = forms[0] if len(forms) == 1 else ["or", *forms]
    if nil_count:
        form = ["maybe", form]
    return form


def provide(values: list, options: dict | None = None) -> Any:
    """mp/provide: infer a schema form from sample values."""
    stats = _new_stats()
    for v in values:
        accumulate_value(stats, v)
    return finalize(stats)


# --------------------------------------------------------------------------
# Arrow-native accumulation (vectorized per column)
# --------------------------------------------------------------------------

_ARROW_TYPE_MAP = [
    ("is_boolean", "boolean"),
    ("is_integer", "int"),
    ("is_floating", "double"),
    ("is_decimal", "double"),
    ("is_string", "string"),
    ("is_large_string", "string"),
    ("is_timestamp", "inst?"),
    ("is_date", "inst?"),
    ("is_binary", "any"),
    ("is_large_binary", "any"),
]


def accumulate_table(stats: dict, table) -> dict:
    """Accumulate an Arrow table treating each row as a map value.

    The Arrow dtype resolves each column's type counter in O(1) per batch;
    min/max via pc.min_max — no Python row loop for flat columns.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    n = table.num_rows
    stats["count"] += n
    stats["types"]["map"] = stats["types"].get("map", 0) + n
    for name in table.schema.names:
        col = table.column(name)
        sub = stats["keys"].get(name)
        if sub is None:
            sub = stats["keys"][name] = _new_stats()
        nulls = col.null_count
        present = n - nulls
        sub["count"] += n
        if nulls:
            sub["types"]["nil"] = sub["types"].get("nil", 0) + nulls
        if present == 0:
            continue
        dt = col.type
        resolved = None
        for pred, tname in _ARROW_TYPE_MAP:
            if getattr(pa.types, pred)(dt):
                resolved = tname
                break
        if resolved is not None:
            sub["types"][resolved] = sub["types"].get(resolved, 0) + present
            if resolved in ("int", "double"):
                mm = pc.min_max(col)
                mn, mx = mm["min"].as_py(), mm["max"].as_py()
                sub["min"] = mn if sub["min"] is None else min(sub["min"], mn)
                sub["max"] = mx if sub["max"] is None else max(sub["max"], mx)
        elif (pa.types.is_list(dt) or pa.types.is_large_list(dt)
              or pa.types.is_fixed_size_list(dt)):
            sub["types"]["vector"] = sub["types"].get("vector", 0) + present
            if sub["item"] is None:
                sub["item"] = _new_stats()
            flat = col.combine_chunks().flatten() if isinstance(col, pa.ChunkedArray) else col.flatten()
            item_tbl = pa.table({"_": flat})
            _accumulate_column(sub["item"], item_tbl.column("_"))
        elif pa.types.is_struct(dt):
            sub["types"]["map"] = sub["types"].get("map", 0) + present
            combined = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            for i in range(dt.num_fields):
                f = dt.field(i)
                ksub = sub["keys"].get(f.name)
                if ksub is None:
                    ksub = sub["keys"][f.name] = _new_stats()
                _accumulate_column(ksub, pc.struct_field(combined, [i]))
        else:
            for v in col.to_pylist():
                if v is not None:
                    accumulate_value(sub, v)
            sub["count"] -= present  # counted twice above
    return stats


def _accumulate_column(stats: dict, col) -> None:
    import pyarrow as pa
    tbl = pa.table({"_": col})
    wrapper = _new_stats()
    accumulate_table(wrapper, tbl)
    merge_stats(stats, wrapper["keys"]["_"])


def infer_dataset(ds, concurrency=None) -> Any:
    """Distributed inference: per-batch partials -> driver merge -> finalize.

    Returns the inferred DSL form for rows-as-maps of the dataset.
    """
    import json
    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        st = _new_stats()
        accumulate_table(st, batch)
        return pa.table({"stats_json": [json.dumps(st, default=str)]})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    merged = _new_stats()
    for p in parts:
        merge_stats(merged, json.loads(p["stats_json"]))
    # rows are maps: unwrap the top-level map stats
    return finalize(merged)
