"""Batch-level decode/encode: the columnar counterpart of malli.transform.

``DecodeBatch`` compiles a :map schema + transformer name into per-column
tolerant casts (string->int/double/boolean/timestamp ...), the Arrow analog of
string-transformer / json-transformer (transform.cljc:454-458, 428-452;
SURVEY.md SS2.5 table).  Failed casts become NULL (the column stays typed), so
downstream validation flags exactly the rows malli would reject — documented
divergence: the original unparseable string is carried in the violation row's
``value`` only if explain runs before decode.

``strip`` implements strip-extra-keys (select schema columns only,
transform.cljc:460-483); ``fill_defaults`` implements
default-value-transformer via pc.fill_null / constant columns (:492-528).
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

from ..core import DEFAULT_KEY, MapSchema, Schema, schema as to_schema

__all__ = ["DecodeBatch", "strip_extra_columns", "fill_defaults"]

_INT_TYPES = {"int", "integer", "int?", "integer?", "pos-int?", "neg-int?", "nat-int?"}
_FLOAT_TYPES = {"double", "float", "double?", "float?", "number", "number?"}
_BOOL_TYPES = {"boolean", "boolean?"}
_TS_TYPES = {"inst?", "time/instant"}


def _target_kind(s: Schema) -> str | None:
    t = s.type
    if t in _INT_TYPES:
        return "int"
    if t in _FLOAT_TYPES:
        return "float"
    if t in _BOOL_TYPES:
        return "bool"
    if t in _TS_TYPES:
        return "timestamp"
    if t == "maybe":
        return _target_kind(s.children[0])
    if t in ("and", "or"):
        for c in s.children:
            k = _target_kind(c)
            if k:
                return k
    return None


def _tolerant_cast(arr: pa.ChunkedArray | pa.Array, kind: str):
    """String column -> typed column; unparseable values become null."""
    import polars as pl

    if kind == "bool":
        a = arr if isinstance(arr, pa.Array) else arr.combine_chunks()
        t = pc.equal(a, "true")
        f = pc.equal(a, "false")
        return pc.if_else(t, pa.scalar(True),
                          pc.if_else(f, pa.scalar(False), pa.scalar(None, pa.bool_())))
    s = pl.from_arrow(arr if isinstance(arr, pa.Array) else arr.combine_chunks())
    if kind == "int":
        out = s.cast(pl.Int64, strict=False)
    elif kind == "float":
        out = s.cast(pl.Float64, strict=False)
    elif kind == "timestamp":
        out = s.str.to_datetime(strict=False, time_unit="us")
    else:
        return arr
    return out.to_arrow()


class DecodeBatch:
    """Actor-pool decode stage: compile the column cast plan once per actor."""

    def __init__(self, schema: Any, options: dict | None = None):
        s = to_schema(schema, options)
        s = s if isinstance(s, MapSchema) else s.deref()
        if not isinstance(s, MapSchema):
            raise ValueError("DecodeBatch requires a :map schema")
        self.targets: dict[str, str] = {}
        for (k, props, cs) in s.children:
            if k == DEFAULT_KEY:
                continue
            kind = _target_kind(cs)
            if kind:
                self.targets[k] = kind

    def __call__(self, batch: pa.Table) -> pa.Table:
        for name, kind in self.targets.items():
            if name not in batch.schema.names:
                continue
            col = batch.column(name)
            dt = col.type
            if pa.types.is_string(dt) or pa.types.is_large_string(dt):
                idx = batch.schema.get_field_index(name)
                batch = batch.set_column(idx, name, _tolerant_cast(col, kind))
            elif kind == "int" and pa.types.is_floating(dt):
                # number->long semantics: round integral doubles
                # (transform.cljc:99-103); non-integral, non-finite, or
                # out-of-int64-range values become null (contract: failed
                # casts are NULL, never a task crash)
                rounded = pc.round(col)
                ok = pc.and_(pc.is_finite(col), pc.equal(rounded, col))
                ok = pc.and_(ok, pc.and_(
                    pc.greater_equal(col, float(-2**63)),
                    pc.less(col, float(2**63))))
                typed_null = pa.scalar(None, type=pa.float64())
                casted = pc.if_else(pc.fill_null(ok, False),
                                    rounded.cast(pa.float64()), typed_null)
                idx = batch.schema.get_field_index(name)
                batch = batch.set_column(idx, name, casted.cast(pa.int64()))
            elif kind == "float" and pa.types.is_integer(dt):
                idx = batch.schema.get_field_index(name)
                batch = batch.set_column(idx, name, col.cast(pa.float64()))
        return batch


def strip_extra_columns(schema: Any, options: dict | None = None):
    """strip-extra-keys at batch level == select schema columns."""
    s = to_schema(schema, options)
    keep = [k for (k, _, _) in s.children if k != DEFAULT_KEY]

    def strip(batch: pa.Table) -> pa.Table:
        cols = [c for c in keep if c in batch.schema.names]
        return batch.select(cols)

    return strip


def fill_defaults(schema: Any, options: dict | None = None, key: str = "default"):
    """default-value-transformer at batch level: pc.fill_null with the entry
    schema's :default property; missing columns become constant columns."""
    s = to_schema(schema, options)
    defaults = {}
    for (k, props, cs) in s.children:
        if k == DEFAULT_KEY:
            continue
        if key in cs.properties:
            defaults[k] = cs.properties[key]

    def fill(batch: pa.Table) -> pa.Table:
        for name, d in defaults.items():
            if name in batch.schema.names:
                col = batch.column(name)
                if col.null_count:
                    idx = batch.schema.get_field_index(name)
                    batch = batch.set_column(idx, name, pc.fill_null(col, d))
            else:
                batch = batch.append_column(
                    name, pa.array([d] * batch.num_rows))
        return batch

    return fill
