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

from typing import Any, Callable

import pyarrow as pa
import pyarrow.compute as pc

from ..core import DEFAULT_KEY, MapSchema, Schema, schema as to_schema

__all__ = ["DecodeBatch", "EncodeBatch", "strip_extra_columns",
           "fill_defaults", "batch_kernel"]

_INT_TYPES = {"int", "integer", "int?", "integer?", "pos-int?", "neg-int?", "nat-int?"}
_FLOAT_TYPES = {"double", "float", "double?", "float?", "number", "number?"}
_BOOL_TYPES = {"boolean", "boolean?"}
_TS_TYPES = {"inst?", "time/instant"}
_DECIMAL_TYPES = {"decimal?"}


def batch_kernel(fn: Callable) -> Callable:
    """Mark a ``decode/<name>`` override as a BATCH kernel: it receives the
    whole pyarrow Array/ChunkedArray and must return one (the vectorized
    contract).  Unmarked callables are applied row-by-row over to_pylist —
    correct but the designated slow path."""
    fn.__malli_batch_kernel__ = True
    return fn


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
    if t in _DECIMAL_TYPES:
        return "decimal"
    if t == "maybe":
        return _target_kind(s.children[0])
    if t in ("and", "or"):
        for c in s.children:
            k = _target_kind(c)
            if k:
                return k
    return None


#: chrono patterns mirroring the reference's +string->date-format+
#: (transform.cljc:138-159): yyyy-MM-dd['T'HH:mm:ss][.fraction][offset],
#: offset-less strings default to UTC.  Trailing 'Z' normalizes to +00:00.
_DATE_TZ_FORMATS = ["%Y-%m-%dT%H:%M:%S%.f%z"]
_DATE_NAIVE_FORMATS = ["%Y-%m-%dT%H:%M:%S%.f", "%Y-%m-%d"]


def _string_to_datetime_cascade(arr: pa.Array):
    """Vectorized multi-format ISO-8601 parse -> timestamp[us, UTC]; each
    format is one polars kernel pass, coalesced in order."""
    import polars as pl
    s = pl.from_arrow(arr).str.replace(r"Z$", "+00:00")
    parts = []
    for f in _DATE_TZ_FORMATS:
        parts.append(s.str.to_datetime(format=f, strict=False,
                                       time_unit="us", time_zone="UTC"))
    for f in _DATE_NAIVE_FORMATS:
        parts.append(s.str.to_datetime(format=f, strict=False, time_unit="us")
                     .dt.replace_time_zone("UTC"))
    df = pl.DataFrame({f"c{i}": p for i, p in enumerate(parts)})
    out = df.select(pl.coalesce([f"c{i}" for i in range(len(parts))]))
    return out.to_series().to_arrow()


def _string_to_decimal(arr: pa.Array):
    """-string->decimal (transform.cljc -string->decimal): tolerant parse to
    decimal128(38, 18); unparseable / out-of-precision values become null."""
    import decimal
    t = pa.decimal128(38, 18)

    def fits(d: decimal.Decimal) -> bool:
        # decimal128(38, 18) holds d iff rescaling to 18 fractional digits
        # is exact-or-representable and total digits <= 38, i.e. the
        # integer part needs <= 20 digits (adjusted() is the exponent of
        # the most significant digit)
        return d.is_finite() and d.adjusted() < 20

    out = []
    for v in arr.to_pylist():
        d = None
        if v is not None:
            try:
                d = decimal.Decimal(v)
                if not fits(d):
                    d = None
            except decimal.InvalidOperation:
                d = None
        out.append(d)
    try:
        return pa.array(out, type=t)
    except (pa.ArrowInvalid, OverflowError):
        # rare fallback: some value passed the digit check but Arrow still
        # rejects it (e.g. sub-1e-18 fractions needing rounding) — probe
        # individually, nulling only the offenders
        safe = []
        for d in out:
            if d is not None:
                try:
                    pa.array([d], type=t)
                except (pa.ArrowInvalid, OverflowError, decimal.InvalidOperation):
                    d = None
            safe.append(d)
        return pa.array(safe, type=t)


def _tolerant_cast(arr: pa.ChunkedArray | pa.Array, kind: str):
    """String column -> typed column; unparseable values become null."""
    import polars as pl

    a = arr if isinstance(arr, pa.Array) else arr.combine_chunks()
    if kind == "bool":
        t = pc.equal(a, "true")
        f = pc.equal(a, "false")
        return pc.if_else(t, pa.scalar(True),
                          pc.if_else(f, pa.scalar(False), pa.scalar(None, pa.bool_())))
    if kind == "timestamp":
        return _string_to_datetime_cascade(a)
    if kind == "decimal":
        return _string_to_decimal(a)
    s = pl.from_arrow(a)
    if kind == "int":
        # Long/parseLong semantics: surrounding whitespace rejects
        out = s.cast(pl.Int64, strict=False)
    elif kind == "float":
        # Double/parseDouble semantics: surrounding whitespace is tolerated
        # (matches the row path; polars cast alone would reject it)
        out = s.str.strip_chars().cast(pl.Float64, strict=False)
    else:
        return arr
    return out.to_arrow()


class DecodeBatch:
    """Actor-pool decode stage: compile the column cast plan once per actor.

    ``name`` is the transformer name; a ``decode/<name>`` property on an
    entry or its child schema overrides the built-in cast for that column
    (the batch counterpart of -value-transformer property lookup,
    transform.cljc:411-426).  Overrides marked with ``batch_kernel`` get the
    Arrow array; plain callables are row-mapped.
    """

    def __init__(self, schema: Any, options: dict | None = None,
                 name: str = "string"):
        s = to_schema(schema, options)
        s = s if isinstance(s, MapSchema) else s.deref()
        if not isinstance(s, MapSchema):
            raise ValueError("DecodeBatch requires a :map schema")
        self.targets: dict[str, str] = {}
        self.overrides: dict[str, Callable] = {}
        prop = f"decode/{name}"
        for (k, props, cs) in s.children:
            if k == DEFAULT_KEY:
                continue
            override = (props or {}).get(prop) or cs.properties.get(prop)
            if callable(override):
                self.overrides[k] = override
                continue
            kind = _target_kind(cs)
            if kind:
                self.targets[k] = kind

    def _apply_override(self, col, fn: Callable):
        a = col if isinstance(col, pa.Array) else col.combine_chunks()
        if getattr(fn, "__malli_batch_kernel__", False):
            return fn(a)
        return pa.array([None if v is None else fn(v) for v in a.to_pylist()])

    def __call__(self, batch: pa.Table) -> pa.Table:
        for name, fn in self.overrides.items():
            if name not in batch.schema.names:
                continue
            idx = batch.schema.get_field_index(name)
            batch = batch.set_column(
                idx, name, self._apply_override(batch.column(name), fn))
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


def _datetime_to_string_batch(arr: pa.Array):
    """Vectorized date_to_string (UTC ISO-8601 with millis,
    transform.cljc:183-193): one polars strftime pass."""
    import polars as pl
    s = pl.from_arrow(arr)
    if s.dtype.time_zone is not None:
        s = s.dt.convert_time_zone("UTC")
    return (s.dt.strftime("%Y-%m-%dT%H:%M:%S%.3f") + "Z").to_arrow() \
        .cast(pa.string())


class EncodeBatch:
    """Actor-pool ENCODE stage — the write-side mirror of DecodeBatch:
    typed columns -> canonical strings per the string-transformer encode
    direction (transform.cljc:454-458; the row path's _STRING_ENCODERS
    are the semantics oracle, enforced by a cross-path parity test).

    int/timestamp columns encode with one vectorized kernel; float and
    decimal columns row-map ``str`` (Arrow's float formatting diverges
    from Python's — '1e-7' vs '1e-07', '3' vs '3.0' — so the vectorized
    cast would break row-path parity; designated slow path, same class
    as the regex row fallbacks).  :boolean is deliberately NOT encoded
    (the reference's commented-out -any->string, transform.cljc:371).
    ``encode/<name>`` properties override per column, with the
    ``batch_kernel`` marker contract shared with DecodeBatch."""

    def __init__(self, schema: Any, options: dict | None = None,
                 name: str = "string"):
        s = to_schema(schema, options)
        s = s if isinstance(s, MapSchema) else s.deref()
        if not isinstance(s, MapSchema):
            raise ValueError("EncodeBatch requires a :map schema")
        self.targets: dict[str, str] = {}
        self.overrides: dict[str, Callable] = {}
        prop = f"encode/{name}"
        for (k, props, cs) in s.children:
            if k == DEFAULT_KEY:
                continue
            override = (props or {}).get(prop) or cs.properties.get(prop)
            if callable(override):
                self.overrides[k] = override
                continue
            kind = _target_kind(cs)
            if kind in ("int", "float", "timestamp", "decimal"):
                self.targets[k] = kind

    def _apply_override(self, col, fn: Callable):
        a = col if isinstance(col, pa.Array) else col.combine_chunks()
        if getattr(fn, "__malli_batch_kernel__", False):
            return fn(a)
        return pa.array([None if v is None else fn(v) for v in a.to_pylist()])

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..transform import any_to_string

        for name, fn in self.overrides.items():
            if name not in batch.schema.names:
                continue
            idx = batch.schema.get_field_index(name)
            batch = batch.set_column(
                idx, name, self._apply_override(batch.column(name), fn))
        for name, kind in self.targets.items():
            if name not in batch.schema.names:
                continue
            col = batch.column(name)
            dt = col.type
            if pa.types.is_string(dt) or pa.types.is_large_string(dt):
                continue                      # already encoded
            a = col if isinstance(col, pa.Array) else col.combine_chunks()
            if kind == "int" and pa.types.is_integer(dt):
                out = pc.cast(a, pa.string())
            elif kind == "timestamp" and pa.types.is_timestamp(dt):
                out = _datetime_to_string_batch(a)
            else:
                # float / decimal / unexpected dtype: row-map the exact
                # row-path encoder
                out = pa.array([None if v is None else any_to_string(v)
                                for v in a.to_pylist()], pa.string())
            idx = batch.schema.get_field_index(name)
            batch = batch.set_column(idx, name, out)
        return batch
