"""Vectorized Arrow compiler: schema tree -> pyarrow.compute column plans.

Compiles a top-level :map schema (columns = entries) into a ``TablePlan`` that
evaluates an entire ``pyarrow.Table`` batch with vectorized kernels, mirroring
the row-level semantics of malli's validators (SURVEY.md SS1.6 mapping table):

  - type schemas resolve their type check at COMPILE time against the Arrow
    column dtype (columns are homogeneous), leaving only null checks + bounds;
  - ``:enum`` -> pc.is_in, ``:re`` -> pc.match_substring_regex (re-find
    semantics, src/malli/core.cljc:1716-1768), comparators -> pc kernels,
    ``:and/:or/:not/:maybe`` -> boolean-mask algebra;
  - ``:vector``/``:sequential`` of primitives -> offsets-based segmented
    reduction over the flattened child values (no Python loop);
  - anything non-vectorizable (``:fn``, ``:multi``, seq-regex, ``:map-of``)
    falls back to the row engine on ``to_pylist()`` — the designated slow path
    (SURVEY.md SS2.2), still inside the same batch.

The explain path is two-phase exactly like the reference ("validator is fast
path, explainer is slow path", SURVEY.md SS2.3): vectorized masks first, then
the row-level explainer only over failing rows, emitting malli error rows
{path, in, type, value, message} (src/malli/impl/util.cljc:19-21).
"""

from __future__ import annotations

import json
from typing import Any, Callable, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .core import (
    DEFAULT_KEY, MapSchema, MaybeSchema, Schema, SchemaError, schema as to_schema,
)
from .error import error_message

__all__ = ["TablePlan", "BoundPlan", "compile_table_plan", "VIOLATION_SCHEMA"]

MaskFn = Callable[[pa.Array], np.ndarray]

VIOLATION_SCHEMA = pa.schema([
    ("row_index", pa.int64()),
    ("id", pa.string()),
    ("column", pa.string()),
    ("path", pa.string()),
    ("in", pa.string()),
    ("type", pa.string()),
    ("value", pa.string()),
    ("message", pa.string()),
])


def _mask_to_np(mask: Any, n: int) -> np.ndarray:
    if isinstance(mask, np.ndarray):
        return mask
    if isinstance(mask, (pa.Array, pa.ChunkedArray)):
        m = pc.fill_null(mask, False)
        if isinstance(m, pa.ChunkedArray):
            m = m.combine_chunks()
        return m.to_numpy(zero_copy_only=False).astype(bool, copy=False)
    return np.full(n, bool(mask))


def _notnull(arr: pa.Array) -> np.ndarray:
    return _mask_to_np(pc.is_valid(arr), len(arr))


def _const(value: bool) -> MaskFn:
    fn = lambda arr: np.full(len(arr), value, dtype=bool)  # noqa: E731
    fn.__const_value__ = value  # introspectable (arrow_schema.schema_compatible)
    return fn


def _is_string_type(dt: pa.DataType) -> bool:
    return pa.types.is_string(dt) or pa.types.is_large_string(dt)


def _is_int_type(dt: pa.DataType) -> bool:
    return pa.types.is_integer(dt)


def _is_float_type(dt: pa.DataType) -> bool:
    return pa.types.is_floating(dt) or pa.types.is_decimal(dt)


def _is_list_type(dt: pa.DataType) -> bool:
    return pa.types.is_list(dt) or pa.types.is_large_list(dt) or pa.types.is_fixed_size_list(dt)


def _bounds_mask(arr_like: Any, mn, mx, n: int) -> np.ndarray:
    mask = None
    if mn is not None:
        mask = pc.greater_equal(arr_like, mn)
    if mx is not None:
        m2 = pc.less_equal(arr_like, mx)
        mask = m2 if mask is None else pc.and_(mask, m2)
    return _mask_to_np(mask, n) if mask is not None else np.ones(n, dtype=bool)


def _row_fallback(s: Schema) -> MaskFn:
    """Per-row Python validation over to_pylist — the designated slow path."""
    valid = s.validator()

    def mask_fn(arr: pa.Array) -> np.ndarray:
        return np.fromiter((valid(v) for v in arr.to_pylist()),
                           dtype=bool, count=len(arr))

    return mask_fn


def _value_bounds(s: Schema) -> tuple:
    props = s.properties or {}
    return props.get("min"), props.get("max")


def compile_node(s: Schema, dtype: pa.DataType) -> MaskFn:
    """Compile one schema node against a column dtype -> mask fn (True=valid).

    Null semantics follow the row engine: None fails every check except
    :any / :nil / :maybe (src/malli/core.cljc:1819-1868 for :maybe).
    """
    t = s.type
    mn, mx = _value_bounds(s)

    if t == "any" or t == "any?":
        return _const(True)
    if t in ("nil", "nil?"):
        return lambda arr: ~_notnull(arr)
    if t in ("some", "some?"):
        return _notnull

    if t in ("string", "string?", "keyword", "keyword?", "symbol", "symbol?",
             "ident?", "char?"):
        if not _is_string_type(dtype):
            return _const(False)
        if t == "char?":
            return lambda arr: _notnull(arr) & _bounds_mask(pc.utf8_length(arr), 1, 1, len(arr))
        if mn is None and mx is None or t != "string":
            return _notnull
        return lambda arr: _notnull(arr) & _bounds_mask(pc.utf8_length(arr), mn, mx, len(arr))

    if t in ("qualified-keyword", "qualified-symbol", "qualified-ident?"):
        if not _is_string_type(dtype):
            return _const(False)
        return lambda arr: _notnull(arr) & _mask_to_np(pc.match_substring(arr, "/"), len(arr))

    if t in ("int", "integer", "int?", "integer?", "pos-int?", "neg-int?",
             "nat-int?"):
        if not _is_int_type(dtype):
            return _const(False)
        lo, hi = mn, mx
        if t == "pos-int?":
            lo = 1 if lo is None else max(lo, 1)
        elif t == "neg-int?":
            hi = -1 if hi is None else min(hi, -1)
        elif t == "nat-int?":
            lo = 0 if lo is None else max(lo, 0)
        if lo is None and hi is None:
            return _notnull
        return lambda arr: _notnull(arr) & _bounds_mask(arr, lo, hi, len(arr))

    if t in ("double", "float", "double?", "float?", "number", "number?", "pos?",
             "neg?", "zero?"):
        ok = _is_float_type(dtype) or _is_int_type(dtype)
        if t in ("double?", "float?") and not _is_float_type(dtype):
            ok = False
        if not ok:
            return _const(False)
        lo, hi = mn, mx
        if t == "pos?":
            return lambda arr: _notnull(arr) & _mask_to_np(pc.greater(arr, 0), len(arr))
        if t == "neg?":
            return lambda arr: _notnull(arr) & _mask_to_np(pc.less(arr, 0), len(arr))
        if t == "zero?":
            return lambda arr: _notnull(arr) & _mask_to_np(pc.equal(arr, 0), len(arr))
        # NaN is a valid double (Clojure double? accepts ##NaN); bounds
        # comparisons reject NaN naturally (NaN >= x is false)
        if lo is None and hi is None:
            return _notnull
        return lambda arr: _notnull(arr) & _bounds_mask(arr, lo, hi, len(arr))

    if t in ("boolean", "boolean?"):
        if not pa.types.is_boolean(dtype):
            return _const(False)
        return _notnull
    if t == "true?":
        if not pa.types.is_boolean(dtype):
            return _const(False)
        return lambda arr: _mask_to_np(pc.equal(arr, True), len(arr))
    if t == "false?":
        if not pa.types.is_boolean(dtype):
            return _const(False)
        return lambda arr: _mask_to_np(pc.equal(arr, False), len(arr))

    if t in ("uuid", "uuid?"):
        # Arrow has no uuid type: accept canonical-form strings (documented
        # divergence; matches transform.cljc:115-116 uuid regex).
        if not _is_string_type(dtype):
            return _const(False)
        pat = r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
        return lambda arr: _notnull(arr) & _mask_to_np(
            pc.match_substring_regex(arr, pat), len(arr))

    if t == "inst?":
        if not (pa.types.is_timestamp(dtype) or pa.types.is_date(dtype)):
            return _const(False)
        return _notnull

    if t in (">", ">=", "<", "<=", "=", "not="):
        bound = s.children[0]
        op = {">": pc.greater, ">=": pc.greater_equal, "<": pc.less,
              "<=": pc.less_equal, "=": pc.equal, "not=": pc.not_equal}[t]
        # null semantics mirror the row engine's Clojure behavior:
        # ordering on nil throws -> invalid; (= nil c) -> false;
        # (not= nil c) -> TRUE (nil differs from any constant)
        null_result = (t == "not=")

        def cmp_mask(arr: pa.Array) -> np.ndarray:
            try:
                m = pc.fill_null(op(arr, bound), null_result)
                if isinstance(m, pa.ChunkedArray):
                    m = m.combine_chunks()
                return m.to_numpy(zero_copy_only=False).astype(bool, copy=False)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                # uncomparable dtype: ordering/equality -> invalid/false for
                # every row, but not= holds for every row (types differ)
                return _const(null_result)(arr)

        return cmp_mask

    if t == "enum":
        # type-strict membership like the row engine (_enum_key): an int
        # enum must not match float/bool columns via arrow casting; a nil
        # member makes null rows valid
        null_ok = any(c is None for c in s.children)
        children = [c for c in s.children if c is not None]
        if _is_int_type(dtype):
            children = [c for c in children if type(c) is int]
        elif _is_float_type(dtype):
            children = [c for c in children if type(c) is float]
        elif pa.types.is_boolean(dtype):
            children = [c for c in children if type(c) is bool]
        elif _is_string_type(dtype):
            children = [c for c in children if isinstance(c, str)]
        if not children:
            if null_ok:
                return lambda arr: ~_notnull(arr)
            return _const(False)
        try:
            value_set = pa.array(children)
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            return _row_fallback(s)

        def enum_mask(arr: pa.Array) -> np.ndarray:
            try:
                out = _mask_to_np(pc.is_in(arr, value_set=value_set),
                                  len(arr)) & _notnull(arr)
                if null_ok:
                    out |= ~_notnull(arr)
                return out
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                return _const(False)(arr)

        return enum_mask

    if t == "re":
        if not _is_string_type(dtype):
            return _const(False)
        pattern = s.pattern.pattern

        def re_mask(arr: pa.Array) -> np.ndarray:
            return _notnull(arr) & _mask_to_np(
                pc.match_substring_regex(arr, pattern), len(arr))

        return re_mask

    if t == "maybe":
        child = compile_node(s.children[0], dtype)
        return lambda arr: ~_notnull(arr) | child(arr)

    if t == "and":
        cs = [compile_node(c, dtype) for c in s.children]

        def and_mask(arr: pa.Array) -> np.ndarray:
            out = cs[0](arr)
            for c in cs[1:]:
                out = out & c(arr)
            return out

        return and_mask

    if t == "or" or t == "orn":
        children = (s.children if t == "or" else [c for (_, _, c) in s.children])
        cs = [compile_node(c, dtype) for c in children]

        def or_mask(arr: pa.Array) -> np.ndarray:
            out = cs[0](arr)
            for c in cs[1:]:
                out = out | c(arr)
            return out

        return or_mask

    if t == "not":
        child = compile_node(s.children[0], dtype)
        return lambda arr: ~child(arr)

    if t in ("vector", "sequential", "seqable", "every"):
        if not _is_list_type(dtype):
            return _const(False)
        return _compile_list_check(s, dtype, mn, mx)

    if t == "tuple":
        if pa.types.is_struct(dtype):
            return _compile_struct_positional(s, dtype)
        if pa.types.is_fixed_size_list(dtype):
            return _compile_fsl_tuple(s, dtype)
        return _row_fallback(s)

    if t == "map":
        if pa.types.is_struct(dtype):
            return _compile_struct_map(s, dtype)
        return _row_fallback(s)

    if t in ("merge", "union", "select-keys", "schema", "malli.core/schema", "ref"):
        try:
            return compile_node(s.deref(), dtype)
        except SchemaError:
            return _row_fallback(s)

    if t == "fn":
        child = s.children[0]
        if isinstance(child, str):
            vectorized = _compile_fn_expr(child, dtype)
            if vectorized is not None:
                return vectorized
        return _row_fallback(s)

    # :multi, :map-of, :set, seq-regex, predicates w/o vector mapping ...
    return _row_fallback(s)


def _list_offsets(arr: pa.Array) -> tuple[np.ndarray, pa.Array]:
    """(offsets[n+1], raw child values) for list/large_list/fixed_size_list."""
    if pa.types.is_fixed_size_list(arr.type):
        k = arr.type.list_size
        start = arr.offset * k
        n = len(arr)
        offs = np.arange(n + 1, dtype=np.int64) * k + start
        return offs, arr.values
    offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    return offs, arr.values


def _compile_fn_expr(src: str, dtype: pa.DataType) -> Optional[MaskFn]:
    """Compile a restricted :fn source expression into pc kernels.

    Supports the same expression subset as core.compile_fn_source, vectorized:
    comparisons (incl. chains), arithmetic, and/or/not, ``len(x)``,
    ``abs(x)``, ``x in (...)``.  Returns None when not expressible — the
    caller falls back to the per-row engine (semantics identical: null /
    error -> invalid, matching -safe-pred).
    """
    import ast as _ast

    try:
        tree = _ast.parse(src, mode="eval").body
    except SyntaxError:
        return None

    def value(node, arr):
        # -> pa.Array/ChunkedArray or python scalar
        if isinstance(node, _ast.Name) and node.id == "x":
            return arr
        if isinstance(node, _ast.Constant):
            return node.value
        if isinstance(node, _ast.UnaryOp) and isinstance(node.op, _ast.USub):
            v = value(node.operand, arr)
            return pc.negate(v) if isinstance(v, (pa.Array, pa.ChunkedArray)) else -v
        if isinstance(node, _ast.BinOp):
            l, r = value(node.left, arr), value(node.right, arr)
            ops = {_ast.Add: pc.add, _ast.Sub: pc.subtract, _ast.Mult: pc.multiply,
                   _ast.Div: pc.divide, _ast.Mod: lambda a, b: pc.subtract(
                       a, pc.multiply(_floor_div(a, b), b)),
                   _ast.FloorDiv: _floor_div}
            fn = ops.get(type(node.op))
            if fn is None:
                raise _Unsupported
            return fn(l, r)
        if isinstance(node, _ast.Call) and isinstance(node.func, _ast.Name):
            if node.func.id == "len" and len(node.args) == 1:
                v = value(node.args[0], arr)
                if not isinstance(v, (pa.Array, pa.ChunkedArray)):
                    raise _Unsupported
                if _is_string_type(v.type):
                    return pc.utf8_length(v)
                if _is_list_type(v.type):
                    return pc.list_value_length(v)
                raise _Unsupported
            if node.func.id == "abs" and len(node.args) == 1:
                return pc.abs(value(node.args[0], arr))
        raise _Unsupported

    def mask(node, arr) -> Any:
        if isinstance(node, _ast.BoolOp):
            parts = [mask(v, arr) for v in node.values]
            out = parts[0]
            combine = pc.and_kleene if isinstance(node.op, _ast.And) else pc.or_kleene
            for p in parts[1:]:
                out = combine(out, p)
            return out
        if isinstance(node, _ast.UnaryOp) and isinstance(node.op, _ast.Not):
            return pc.invert(mask(node.operand, arr))
        if isinstance(node, _ast.Compare):
            left = value(node.left, arr)
            out = None
            cmp_ops = {_ast.Lt: pc.less, _ast.LtE: pc.less_equal,
                       _ast.Gt: pc.greater, _ast.GtE: pc.greater_equal,
                       _ast.Eq: pc.equal, _ast.NotEq: pc.not_equal}
            for op, comparator in zip(node.ops, node.comparators):
                if isinstance(op, _ast.In):
                    right = comparator
                    if not isinstance(right, (_ast.Tuple, _ast.List, _ast.Set)):
                        raise _Unsupported
                    vals = [value(e, arr) for e in right.elts]
                    if any(isinstance(v, (pa.Array, pa.ChunkedArray)) for v in vals):
                        raise _Unsupported
                    m = pc.is_in(left, value_set=pa.array(vals))
                else:
                    fn = cmp_ops.get(type(op))
                    if fn is None:
                        raise _Unsupported
                    right_v = value(comparator, arr)
                    m = fn(left, right_v)
                    left = right_v
                out = m if out is None else pc.and_kleene(out, m)
            return out
        raise _Unsupported

    class _Unsupported(Exception):
        pass

    # dry-run compile against an empty array to reject unsupported shapes
    probe = pa.array([], type=dtype)
    try:
        mask(tree, probe)
    except _Unsupported:
        return None
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
        return None
    except Exception:
        return None

    # Python null semantics: None==5 -> False (no raise), None>5 -> raises ->
    # invalid.  pred(None) is a constant; kleene nulls in the kernel output
    # are exactly the null-input rows, so fill them with that constant.
    from .core import compile_fn_source, _safe_pred
    null_result = bool(_safe_pred(compile_fn_source(src))(None))

    def mask_fn(arr: pa.Array) -> np.ndarray:
        try:
            out = mask(tree, arr)
            out = pc.fill_null(out, null_result)
            if isinstance(out, pa.ChunkedArray):
                out = out.combine_chunks()
            return out.to_numpy(zero_copy_only=False).astype(bool, copy=False)
        except Exception:
            # runtime kernel failure -> per-row safe-pred semantics
            return _row_fallback_arr(arr, src)

    return mask_fn


def _floor_div(a, b):
    # Python floor semantics: Arrow's integer divide truncates toward zero,
    # so compute in float64 and floor (documented precision: |x| < 2^53)
    fa = pc.cast(a, pa.float64()) if isinstance(a, (pa.Array, pa.ChunkedArray)) else float(a)
    fb = pc.cast(b, pa.float64()) if isinstance(b, (pa.Array, pa.ChunkedArray)) else float(b)
    return pc.floor(pc.divide(fa, fb))


def _row_fallback_arr(arr: pa.Array, src: str) -> np.ndarray:
    from .core import compile_fn_source, _safe_pred
    valid = _safe_pred(compile_fn_source(src))
    return np.fromiter((valid(v) for v in arr.to_pylist()), dtype=bool,
                       count=len(arr))


def compile_probe(s: Schema, dtype: pa.DataType) -> Optional[Callable[[pa.Array], bool]]:
    """A cheap whole-array pre-check: returns True iff EVERY element is
    certainly valid — the hierarchical fast path for element checks over huge
    flattened token arrays (one SIMD min_max beats 34M boolean kernels when,
    as in real validation workloads, violations are rare)."""
    t = s.type
    mn, mx = _value_bounds(s)
    if t in ("int", "integer", "int?", "integer?") and _is_int_type(dtype):
        def probe(values: pa.Array) -> bool:
            if values.null_count:
                return False
            if len(values) == 0:
                return True
            mm = pc.min_max(values)
            lo, hi = mm["min"].as_py(), mm["max"].as_py()
            return (mn is None or lo >= mn) and (mx is None or hi <= mx)
        return probe
    if t in ("double", "float", "number", "double?", "float?", "number?") and (
            _is_float_type(dtype) or _is_int_type(dtype)):
        def probe(values: pa.Array) -> bool:
            if values.null_count or len(values) == 0:
                return values.null_count == 0
            mm = pc.min_max(values)
            lo, hi = mm["min"].as_py(), mm["max"].as_py()
            if lo is None or hi is None:
                return False
            return (mn is None or lo >= mn) and (mx is None or hi <= mx)
        return probe
    if t in ("string", "string?", "keyword", "keyword?") and _is_string_type(dtype):
        if mn is None and mx is None or t != "string":
            return lambda values: values.null_count == 0
    return None


def _numpy_elem_mask(s: Schema, dtype: pa.DataType) -> Optional[Callable]:
    """Pure-numpy element mask for primitive bounds — avoids Arrow boolean
    materialization round-trips on the flattened child array."""
    t = s.type
    mn, mx = _value_bounds(s)
    if t in ("int", "integer", "int?", "integer?") and _is_int_type(dtype) and (
            mn is not None or mx is not None):
        def mask(values: pa.Array) -> np.ndarray:
            if values.null_count == 0:
                v = values.to_numpy(zero_copy_only=True)
                out = np.ones(len(v), dtype=bool)
                if mn is not None:
                    out &= v >= mn
                if mx is not None:
                    out &= v <= mx
                return out
            v = values.to_numpy(zero_copy_only=False)
            out = ~np.isnan(v)
            if mn is not None:
                out &= v >= mn
            if mx is not None:
                out &= v <= mx
            return out
        return mask
    return None


def _compile_list_check(s: Schema, dtype: pa.DataType, mn, mx) -> MaskFn:
    elem_schema = s.children[0]
    elem_dtype = dtype.value_type
    elem_fn = _numpy_elem_mask(elem_schema, elem_dtype) or compile_node(
        elem_schema, elem_dtype)
    elem_probe = compile_probe(elem_schema, elem_dtype)
    elem_trivial = elem_schema.type in ("any", "any?")
    # NOTE: :every's bounded-prefix check applies only to LAZY iterables in
    # the row engine (core.cljc -safely-countable?); Arrow arrays are always
    # countable, so the vector path validates every element — full parity.
    # :every/:seqable accept nil (seqable? nil is true — core.cljc:1478-1494)
    null_ok = s.type in ("every", "seqable")

    def list_mask(arr: pa.Array) -> np.ndarray:
        n = len(arr)
        out = np.ones(n, dtype=bool) if null_ok else _notnull(arr)
        if mn is not None or mx is not None:
            lengths = pc.list_value_length(arr)
            out = out & _bounds_mask(lengths, mn, mx, n)
        if not elem_trivial and out.any():
            offs, values = _list_offsets(arr)
            # hierarchical fast path: whole-child probe first (skippable only
            # because all-valid => bounded prefix also all-valid)
            if elem_probe is not None and elem_probe(values):
                return out
            elem_valid = elem_fn(values)
            bad = ~elem_valid
            cum = np.empty(len(bad) + 1, dtype=np.int64)
            cum[0] = 0
            np.cumsum(bad, dtype=np.int64, out=cum[1:])
            bad_per_list = cum[offs[1:]] - cum[offs[:-1]]
            out = out & (bad_per_list == 0)
        return out

    return list_mask


def _compile_fsl_tuple(s: Schema, dtype: pa.DataType) -> MaskFn:
    k = dtype.list_size
    if len(s.children) != k:
        return _const(False)
    elem_dtype = dtype.value_type
    fns = [compile_node(c, elem_dtype) for c in s.children]

    def fsl_mask(arr: pa.Array) -> np.ndarray:
        n = len(arr)
        out = _notnull(arr)
        offs, values = _list_offsets(arr)
        start = offs[0]
        for i, fn in enumerate(fns):
            pos_vals = values[start + i::k] if k > 0 else values
            pos_vals = pos_vals[:n]
            out = out & fn(pos_vals)
        return out

    return fsl_mask


def _compile_struct_positional(s: Schema, dtype: pa.DataType) -> MaskFn:
    if dtype.num_fields != len(s.children):
        return _const(False)
    fns = [(i, compile_node(c, dtype.field(i).type)) for i, c in enumerate(s.children)]

    def struct_mask(arr: pa.Array) -> np.ndarray:
        out = _notnull(arr)
        for i, fn in fns:
            out = out & fn(pc.struct_field(arr, [i]))
        return out

    return struct_mask


def _compile_struct_map(s: MapSchema, dtype: pa.DataType) -> MaskFn:
    if s.default_entry is not None:
        # ::m/default over struct rest-fields: no sound static mapping
        # (field set is closed but the default schema sees a sub-map) ->
        # row fallback for exact parity
        return _row_fallback(s)
    field_names = {dtype.field(i).name: i for i in range(dtype.num_fields)}
    checks = []
    for (k, props, cs) in s.children:
        if k == DEFAULT_KEY:
            continue
        optional = bool((props or {}).get("optional"))
        idx = field_names.get(k)
        if idx is None:
            if not optional:
                return _const(False)
            continue
        checks.append((idx, optional, compile_node(cs, dtype.field(idx).type)))
    closed_bad = False
    if s.closed:
        explicit = set(s.explicit_keys)
        closed_bad = any(name not in explicit for name in field_names)
    if closed_bad:
        return _const(False)

    def struct_mask(arr: pa.Array) -> np.ndarray:
        # Arrow structs always materialize every field, so to_pylist() (and
        # hence the row engine) sees optional fields as PRESENT with None —
        # which must then satisfy the child schema. No optional-null escape
        # here, for exact row-path parity.
        out = _notnull(arr)
        for idx, optional, fn in checks:
            field = pc.struct_field(arr, [idx])
            out = out & fn(field)
        return out

    return struct_mask


# --------------------------------------------------------------------------
# table plans
# --------------------------------------------------------------------------


class TableCheck:
    """A cross-column constraint evaluated per batch (engine extension).

    ``mask_fn(table) -> bool mask`` (True = valid). The north-rule
    ``n_tok == len(tokens)`` consistency check is expressed this way.
    """

    def __init__(self, name: str, mask_fn: Callable[[pa.Table], Any],
                 message: str, columns: list[str] | None = None):
        self.name = name
        self.mask_fn = mask_fn
        self.message = message
        self.columns = columns or []

    def mask(self, table: pa.Table) -> np.ndarray:
        return _mask_to_np(self.mask_fn(table), table.num_rows)


class TablePlan:
    """Compile-once plan for a top-level :map schema over table columns."""

    def __init__(self, schema_: Any, table_checks: list[TableCheck] | None = None,
                 options: dict | None = None):
        s = to_schema(schema_, options)
        s = s.deref() if not isinstance(s, MapSchema) else s
        if not isinstance(s, MapSchema):
            raise SchemaError("TablePlan requires a :map schema at the top level")
        self.schema = s
        self.table_checks = table_checks or []
        self._bound: dict[Any, BoundPlan] = {}

    def bind(self, arrow_schema: pa.Schema) -> "BoundPlan":
        key = tuple((f.name, str(f.type)) for f in arrow_schema)
        bp = self._bound.get(key)
        if bp is None:
            bp = BoundPlan(self, arrow_schema)
            self._bound[key] = bp
        return bp

    def valid_mask(self, table: pa.Table) -> np.ndarray:
        return self.bind(table.schema).valid_mask(table)

    def explain_table(self, table: pa.Table, **kw) -> pa.Table:
        return self.bind(table.schema).explain_table(table, **kw)


class BoundPlan:
    """A TablePlan bound to a concrete Arrow schema (types resolved)."""

    def __init__(self, plan: TablePlan, arrow_schema: pa.Schema):
        self.plan = plan
        self.arrow_schema = arrow_schema
        names = set(arrow_schema.names)
        self.columns: list[tuple[str, bool, Schema, Optional[MaskFn]]] = []
        self.missing_required: list[tuple[str, Schema]] = []
        for (k, props, cs) in plan.schema.children:
            if k == DEFAULT_KEY:
                continue
            optional = bool((props or {}).get("optional"))
            if k not in names:
                if not optional:
                    self.missing_required.append((k, cs))
                continue
            dtype = arrow_schema.field(k).type
            self.columns.append((k, optional, cs, compile_node(cs, dtype)))
        explicit = set(plan.schema.explicit_keys)
        # ::m/default entry: rest columns are validated by the default schema
        # (row-engine parity — never silently skipped)
        if plan.schema.default_entry is not None:
            default_schema = plan.schema.default_entry[2]
            rest_cols = [n for n in arrow_schema.names if n not in explicit]
            from .core import MapOfSchema as _MapOf
            if isinstance(default_schema, _MapOf):
                key_valid = default_schema.children[0].validator()
                val_schema = default_schema.children[1]
                for n in rest_cols:
                    dtype = arrow_schema.field(n).type
                    if not key_valid(n):
                        self.columns.append((n, False, default_schema,
                                             _const(False)))
                    else:
                        self.columns.append((n, False, val_schema,
                                             compile_node(val_schema, dtype)))
            elif rest_cols:
                # non-map-of default: per-row dict validation of the rest map
                self._rest_fallback = (list(rest_cols),
                                       default_schema.validator())
        self.extra_columns = []
        if plan.schema.closed and plan.schema.default_entry is None:
            self.extra_columns = [n for n in arrow_schema.names if n not in explicit]

    def column_masks(self, table: pa.Table) -> dict[str, np.ndarray]:
        out = {}
        for (k, optional, cs, fn) in self.columns:
            arr = table.column(k)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            out[k] = fn(arr)
        return out

    def evaluate(self, table: pa.Table) -> tuple[dict, list, np.ndarray]:
        """(column_masks, check_masks, overall_mask) in ONE pass — callers
        reuse the masks for explain so nothing is computed twice."""
        n = table.num_rows
        if self.missing_required or self.extra_columns:
            return {}, [], np.zeros(n, dtype=bool)
        col_masks = self.column_masks(table)
        check_masks = [check.mask(table) for check in self.plan.table_checks]
        out = np.ones(n, dtype=bool)
        for mask in col_masks.values():
            out &= mask
        for mask in check_masks:
            out &= mask
        rest = getattr(self, "_rest_fallback", None)
        if rest is not None:
            cols, valid_rest = rest
            sub = table.select(cols)
            out &= np.fromiter((valid_rest(r) for r in sub.to_pylist()),
                               dtype=bool, count=n)
        return col_masks, check_masks, out

    def valid_mask(self, table: pa.Table) -> np.ndarray:
        return self.evaluate(table)[2]

    def explain_table(self, table: pa.Table, id_column: str | None = None,
                      row_offset: int = 0, max_violations: int | None = None,
                      precomputed: tuple | None = None) -> pa.Table:
        """Violation rows for failing rows only (two-phase explain)."""
        n = table.num_rows
        rows: dict[str, list] = {name: [] for name in VIOLATION_SCHEMA.names}
        # fetch ids lazily per failing row — never to_pylist the whole column
        ids = (table.column(id_column) if id_column
               and id_column in table.schema.names else None)
        budget = max_violations if max_violations is not None else float("inf")

        def emit(i, column, path, in_, type_, value, message):
            rows["row_index"].append(row_offset + int(i))
            raw_id = ids[int(i)].as_py() if ids is not None else None
            rows["id"].append(str(raw_id) if raw_id is not None else None)
            rows["column"].append(column)
            rows["path"].append(_path_str(path))
            rows["in"].append(_path_str(in_))
            rows["type"].append(type_)
            rows["value"].append(_json_value(value))
            rows["message"].append(message)

        count = 0
        for (k, cs) in self.missing_required:
            err_proto = {"schema": self.plan.schema, "type": "malli.core/missing-key"}
            msg = error_message(err_proto)
            for i in range(n):
                if count >= budget:
                    break
                emit(i, k, [k], [k], "malli.core/missing-key", None, msg)
                count += 1

        for col in self.extra_columns:
            err_proto = {"schema": self.plan.schema, "type": "malli.core/extra-key"}
            msg = error_message(err_proto)
            vals = table.column(col)
            for i in range(n):
                if count >= budget:
                    break
                emit(i, col, [col], [col], "malli.core/extra-key", vals[i].as_py(), msg)
                count += 1

        col_masks = precomputed[0] if precomputed else None
        check_masks = precomputed[1] if precomputed else None

        if count < budget:
            for (k, optional, cs, fn) in self.columns:
                # precomputed masks may be empty when missing-required
                # short-circuited evaluate(); recompute per column then.
                # NEVER materialize (combine_chunks) a column whose mask is
                # already clean — for wide token-list columns that copy
                # costs more than the whole vectorized pass.
                arr = None
                mask = col_masks.get(k) if col_masks else None
                if mask is None:
                    arr = table.column(k)
                    if isinstance(arr, pa.ChunkedArray):
                        arr = arr.combine_chunks()
                    mask = fn(arr)
                bad_idx = np.nonzero(~mask)[0]
                if len(bad_idx) == 0:
                    continue
                if arr is None:
                    arr = table.column(k)  # chunked row access is fine here
                explainer = cs._explainer([k])
                for i in bad_idx:
                    if count >= budget:
                        break
                    v = arr[int(i)].as_py()
                    errors = explainer(v, [k], [])
                    if not errors:  # divergence between vector + row path
                        emit(i, k, [k], [k], None, v, "invalid value")
                        count += 1
                        continue
                    for e in errors:
                        if count >= budget:
                            break
                        emit(i, k, e["path"], e["in"], e.get("type"),
                             e["value"], error_message(e))
                        count += 1

        if count < budget:
            for ci, check in enumerate(self.plan.table_checks):
                mask = (check_masks[ci]
                        if check_masks is not None and ci < len(check_masks)
                        else check.mask(table))
                bad_idx = np.nonzero(~mask)[0]
                for i in bad_idx:
                    if count >= budget:
                        break
                    emit(i, ",".join(check.columns) or check.name, [check.name],
                         [check.name], "engine/check-failed", None, check.message)
                    count += 1

        return pa.Table.from_pydict(rows, schema=VIOLATION_SCHEMA)


def _path_str(path: list) -> str:
    return "/" + "/".join(str(p) for p in path)


def _json_value(v: Any) -> str | None:
    if v is None:
        return None
    try:
        return json.dumps(v, default=str)
    except (TypeError, ValueError):
        return repr(v)


def compile_table_plan(schema_form: Any, table_checks: list | None = None,
                       options: dict | None = None) -> TablePlan:
    """Build a TablePlan from a DSL form plus optional [spec] table checks.

    ``table_checks`` entries may be TableCheck instances or serializable dicts
    {"name", "kind", ...} — see ``check_from_spec``.
    """
    checks = []
    for c in table_checks or []:
        checks.append(c if isinstance(c, TableCheck) else check_from_spec(c))
    return TablePlan(schema_form, checks, options)


def check_from_spec(spec: dict) -> TableCheck:
    """Serializable cross-column checks (picklable to Ray actors).

    kinds:
      - list_len_eq: column ``len_col`` must equal len(list_col)
      - expr_eq / expr_le / expr_ge: compare two columns
    """
    kind = spec["kind"]
    name = spec.get("name", kind)
    if kind == "list_len_eq":
        list_col, len_col = spec["list_col"], spec["len_col"]

        def mask_fn(t: pa.Table):
            return pc.equal(pc.list_value_length(t[list_col]).cast(t[len_col].type),
                            t[len_col])

        return TableCheck(name, mask_fn,
                          spec.get("message", f"{len_col} must equal len({list_col})"),
                          [list_col, len_col])
    if kind in ("col_eq", "col_le", "col_ge"):
        a, b = spec["left"], spec["right"]
        op = {"col_eq": pc.equal, "col_le": pc.less_equal, "col_ge": pc.greater_equal}[kind]
        return TableCheck(name, lambda t: op(t[a], t[b]),
                          spec.get("message", f"{a} {kind} {b} failed"), [a, b])
    if kind == "in_set":
        # referential check: broadcast small side, pc.is_in per batch
        col = spec["column"]
        value_set = pa.array(sorted(set(spec["allowed"])))
        return TableCheck(
            name, lambda t: pc.fill_null(pc.is_in(t[col], value_set=value_set), False),
            spec.get("message", f"{col} not in allowed set"), [col])
    raise SchemaError(f"unknown table check kind: {kind!r}")
