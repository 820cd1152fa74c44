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
           "finalize", "infer_dataset", "Hinted", "hinted"]


class Hinted:
    """Explicit value hint wrapper (mp/-hinted, provider.cljc:10-12 — the
    reference's non-metadata hint path). Hints: "enum" (scalar -> [:enum
    values]), "map-of", "tuple"."""

    __slots__ = ("value", "hint")

    def __init__(self, value: Any, hint: str):
        self.value = value
        self.hint = hint


def hinted(value: Any, hint: str) -> Hinted:
    return Hinted(value, hint)


#: bounded distinct-value tracking for scalars (:enum hints + value-decoders
#: need the full distinct set; past the cap both features disable)
_VALUES_CAP = 256

#: type preference for :or ordering (provider.cljc:5-6 analogue)
_PREFERENCE = ["map", "vector", "set", "tuple", "int", "double", "boolean",
               "uuid", "inst?", "keyword", "string", "any", "nil"]


def _rank(t: str) -> int:
    try:
        return _PREFERENCE.index(t)
    except ValueError:
        return len(_PREFERENCE)


def _new_stats() -> dict:
    return {"count": 0, "types": {}, "keys": {}, "item": None, "min": None,
            "max": None, "key_stats": None, "lengths": [], "sigs": [],
            "positions": [], "hints": [], "values": {}}


_SIG_CAP = 64          # bounded per-sample signature memory for tuple coherence
_TUPLE_WIDTH_CAP = 16  # vectors wider than this never infer as tuples


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
    if isinstance(v, Hinted):
        if v.hint not in stats["hints"]:
            stats["hints"].append(v.hint)
        v = v.value
    stats["count"] += 1
    t = _value_type(v)
    stats["types"][t] = stats["types"].get(t, 0) + 1
    if t not in ("map", "vector", "set", "nil"):
        vals = stats["values"]
        if vals is not None:
            try:
                vals[v] = vals.get(v, 0) + 1
                if len(vals) > _VALUES_CAP:
                    stats["values"] = None  # overflow: disable enum/decoders
            except TypeError:
                pass  # unhashable scalar-ish value: skip tracking
    if t == "map":
        if stats["key_stats"] is None:
            stats["key_stats"] = _new_stats()
        for k, kv in v.items():
            sub = stats["keys"].get(k)
            if sub is None:
                sub = stats["keys"][k] = _new_stats()
            accumulate_value(sub, kv)
            accumulate_value(stats["key_stats"], k)
    elif t in ("vector", "set"):
        if stats["item"] is None:
            stats["item"] = _new_stats()
        for item in v:
            accumulate_value(stats["item"], item)
        if t == "vector":
            # tuple-inference bookkeeping: lengths, per-sample type
            # signatures (coherence), per-position stats
            # (provider.cljc -sequential-schema :44-56). Bounded: vectors
            # wider than _TUPLE_WIDTH_CAP (e.g. embeddings) opt out — they
            # are never tuples and the per-position stats would be costly.
            if len(v) not in stats["lengths"]:
                stats["lengths"].append(len(v))
            if len(v) <= _TUPLE_WIDTH_CAP and stats["sigs"] != ["__overflow__"]:
                sig = tuple(_value_type(e) for e in v)
                if sig not in stats["sigs"]:
                    if len(stats["sigs"]) >= _SIG_CAP:
                        stats["sigs"] = ["__overflow__"]
                    else:
                        stats["sigs"].append(sig)
                if stats["sigs"] != ["__overflow__"]:
                    pos = stats["positions"]
                    for i, e in enumerate(v):
                        if i >= len(pos):
                            pos.append(_new_stats())
                        accumulate_value(pos[i], e)
            else:
                stats["sigs"] = ["__overflow__"]
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
    if b.get("key_stats") is not None:
        if a.get("key_stats") is None:
            a["key_stats"] = b["key_stats"]
        else:
            merge_stats(a["key_stats"], b["key_stats"])
    for l in b.get("lengths", []):
        if l not in a["lengths"]:
            a["lengths"].append(l)
    b_sigs = b.get("sigs", [])
    if b_sigs == ["__overflow__"] or a["sigs"] == ["__overflow__"]:
        a["sigs"] = ["__overflow__"]
    else:
        existing = {tuple(x) for x in a["sigs"]}
        for s in b_sigs:
            ts = tuple(s)
            if ts not in existing:
                if len(a["sigs"]) >= _SIG_CAP:
                    a["sigs"] = ["__overflow__"]
                    break
                a["sigs"].append(ts)
                existing.add(ts)
    bpos = b.get("positions", [])
    for i, p in enumerate(bpos):
        if i >= len(a["positions"]):
            a["positions"].append(p)
        else:
            merge_stats(a["positions"][i], p)
    for key, pick in (("min", min), ("max", max)):
        if b.get(key) is not None:
            a[key] = b[key] if a.get(key) is None else pick(a[key], b[key])
    for h in b.get("hints", []):
        if h not in a["hints"]:
            a["hints"].append(h)
    bv = b.get("values", {})
    if bv is None or a.get("values") is None:
        a["values"] = None
    else:
        av = a["values"]
        for v, n in bv.items():
            av[v] = av.get(v, 0) + n
        if len(av) > _VALUES_CAP:
            a["values"] = None
    return a


def finalize(stats: dict, options: dict | None = None) -> Any:
    """Stats -> DSL form (provider.cljc -schema, :38-90).

    options (provider.cljc analogs):
      - "map-of-threshold": with >= N map samples, homogeneous key/value
        schemas and enough distinct keys, infer [:map-of K V] (:58-66)
      - "tuple-threshold": with >= N equal-length, signature-coherent vector
        samples, infer [:tuple ...] (:44-56)
      - "value-decoders": {scalar-form: {target-form: fn}} — when EVERY
        distinct observed value changes under fn, the scalar form upgrades
        to the target (mp/::value-decoders, provider.cljc:70-81)
      - value hints via ``hinted(x, "enum"|"map-of"|"tuple")``
        (provider.cljc:10-12, 38-40, 50, 66)
    """
    options = options or {}
    types = dict(stats["types"])
    nil_count = types.pop("nil", 0)
    if not types:
        return "nil" if nil_count else "any"
    hints = stats.get("hints") or []
    # :enum hint: the distinct observed values ARE the schema
    # (provider.cljc -value-schema :38-40)
    if (hints == ["enum"] and stats.get("values")
            and not any(t in types for t in ("map", "vector", "set"))):
        return ["enum", *stats["values"].keys()]
    # int subsumed by double when both present (numeric widening)
    if "int" in types and "double" in types:
        types["double"] += types.pop("int")
    forms = []
    for t in sorted(types, key=_rank):
        if t == "map":
            total_maps = stats["types"].get("map", 0)
            if "map-of" in hints and stats["keys"]:
                # forced :map-of (provider.cljc :66): union value schema
                merged = _new_stats()
                for sub in stats["keys"].values():
                    merge_stats(merged, sub)
                forms.append(["map-of",
                              finalize(stats["key_stats"], options)
                              if stats.get("key_stats") else "any",
                              finalize(merged, options)])
                continue
            mo = _try_map_of(stats, total_maps, options)
            if mo is not None:
                forms.append(mo)
                continue
            entries = []
            for k in stats["keys"]:
                sub = stats["keys"][k]
                child = finalize(sub, options)
                if sub["count"] < total_maps:
                    entries.append([k, {"optional": True}, child])
                else:
                    entries.append([k, child])
            forms.append(["map", *entries] if entries else "map")
        elif t == "vector":
            if "tuple" in hints:
                # hinted tuple (provider.cljc :50): equal lengths suffice —
                # heterogeneous positions union per position; length
                # mismatch falls back to a vector
                tup = None
                if (len(stats.get("lengths", [])) == 1
                        and stats.get("positions")
                        and stats.get("sigs") != ["__overflow__"]):
                    tup = ["tuple", *[finalize(p, options)
                                      for p in stats["positions"]]]
            else:
                tup = _try_tuple(stats, stats["types"].get("vector", 0), options)
            if tup is not None:
                forms.append(tup)
                continue
            item = finalize(stats["item"], options) if stats["item"] is not None else "any"
            forms.append([t, item])
        elif t == "set":
            item = finalize(stats["item"], options) if stats["item"] is not None else "any"
            forms.append([t, item])
        else:
            forms.append(_apply_value_decoders(t, stats, options))
    form = forms[0] if len(forms) == 1 else ["or", *forms]
    if nil_count:
        form = ["maybe", form]
    return form


def _apply_value_decoders(t: str, stats: dict, options: dict) -> str:
    """mp/::value-decoders (-decoded, provider.cljc:70-81): upgrade a scalar
    form when EVERY distinct observed value changes under a decoder fn; the
    first target (in dict order) whose decoder changes all values wins.
    Disabled past the distinct-values cap (can't prove 'all')."""
    decoders = (options or {}).get("value-decoders") or {}
    vp = decoders.get(t)
    vals = stats.get("values")
    if not vp or not vals:
        return t
    # only values of THIS scalar type vote (mixed-type stats split per type)
    vs = [v for v in vals if _value_type(v) == t]
    if not vs:
        return t
    for target, fn in vp.items():
        try:
            if all(fn(v) != v for v in vs):
                return target
        except Exception:
            continue
    return t


def _try_map_of(stats: dict, total_maps: int, options: dict) -> Any:
    threshold = options.get("map-of-threshold")
    if threshold is None or total_maps < threshold or not stats["keys"]:
        return None
    # all value schemas equal + all key schemas equal (provider.cljc @?ks*
    # guard :64-67 — heterogeneous key types fall back to :map)
    vforms = {repr(finalize(sub, options)) for sub in stats["keys"].values()}
    if len(vforms) != 1:
        return None
    if len({_value_type(k) for k in stats["keys"]}) != 1:
        return None
    ks = stats.get("key_stats")
    if ks is None:
        return None
    # accept rule (provider.cljc -map-of-accept :58-59):
    # distinct keys > (total key observations)^0.7
    total_key_obs = sum(sub["count"] for sub in stats["keys"].values())
    if len(stats["keys"]) <= total_key_obs ** 0.7:
        return None
    return ["map-of", finalize(ks, options),
            finalize(next(iter(stats["keys"].values())), options)]


def _try_tuple(stats: dict, total_vecs: int, options: dict) -> Any:
    threshold = options.get("tuple-threshold")
    if threshold is None or total_vecs < threshold:
        return None
    if len(stats.get("lengths", [])) != 1:
        return None
    sigs = stats.get("sigs", [])
    if len(sigs) != 1 or sigs == ["__overflow__"]:
        return None  # non-coherent / too-wide samples stay [:vector ...]
    return ["tuple", *[finalize(p, options) for p in stats["positions"]]]


def provide(values: list, options: dict | None = None) -> Any:
    """mp/provide: infer a schema form from sample values."""
    stats = _new_stats()
    for v in values:
        accumulate_value(stats, v)
    return finalize(stats, options)


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


def infer_dataset(ds, concurrency=None, options: dict | None = None) -> Any:
    """Distributed inference: per-batch partials -> driver merge -> finalize.

    Returns the inferred DSL form for rows-as-maps of the dataset.
    """
    import json
    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        st = _new_stats()
        accumulate_table(st, batch)
        return pa.table({"stats_json": [json.dumps(st, default=str)]})

    from .stages import concurrency_kwargs
    parts = ds.map_batches(partial, batch_format="pyarrow",
                           **concurrency_kwargs(concurrency)).take_all()
    merged = _new_stats()
    for p in parts:
        merge_stats(merged, json.loads(p["stats_json"]))
    # rows are maps: unwrap the top-level map stats
    return finalize(merged, options)
