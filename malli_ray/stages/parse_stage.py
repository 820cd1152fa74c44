"""Batch-level m/parse / m/unparse projection stages.

Reference semantics: parse contract src/malli/core.cljc:2684-2714 (value ->
parsed value or ::m/invalid; :orn/:multi wrap in Tag), Tag/Tags
src/malli/core.cljc:164-195, ParserInfo identity elision
src/malli/core.cljc:99-100, 761-763, 1361.

Ray mapping (SURVEY.md SS2.4): a ``map_batches`` projection appending a
``parsed`` struct column ``{tag: string, value: child}``:

  - **identity elision**: when ``parser_info`` says parse is identity the
    projection is skipped entirely — the batch streams through untouched
    (the perf win malli gets from eliding identity transformer chains);
  - **vectorized :orn**: branch tags are computed with the SAME compiled
    Arrow masks the validator uses (arrow_compile.compile_node), evaluated
    in malli's first-match-wins branch order via ``np.select`` — one pass,
    no Python row loop.  Requires every branch child to be an
    identity-parsing schema (true for scalar branches), so the struct value
    is the input column zero-copy;
  - **row fallback**: any other schema parses row-by-row with the core
    engine's parser (the designated slow path), Tag -> {tag, value}.

Rows that parse to ``::m/invalid`` become NULL structs (the columnar
encoding of the invalid sentinel).
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..core import INVALID, OrnSchema, Schema, Tag, parser_info, schema as to_schema
from ..core import _parse_identity

__all__ = ["ParseBatch", "UnparseBatch", "parse_projection",
           "unparse_projection"]


class ParseBatch:
    """Append ``out`` = parse(``column``) as a {tag, value} struct column.

    Stateful stage: the schema compiles once per actor/worker; per-branch
    Arrow masks compile lazily on the first batch (they bind to the column
    dtype) and are reused for every subsequent batch.
    """

    def __init__(self, schema_form: Any, column: str, out: str = "parsed",
                 options: dict | None = None):
        self.sc = to_schema(schema_form, options)
        self.column = column
        self.out = out
        self.identity = parser_info(self.sc)["identity"]
        self._vector_orn = (
            isinstance(self.sc, OrnSchema)
            and all(_parse_identity(s, set()) for (_, _, s) in self.sc.children))
        self._masks = None          # compiled per dtype on first batch
        self._row_parser = None

    def _orn_masks(self, dtype: pa.DataType):
        from ..arrow_compile import compile_node
        if self._masks is None:
            self._masks = [(k, compile_node(s, dtype))
                           for (k, _, s) in self.sc.children]
        return self._masks

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.identity:
            return batch  # ParserInfo elision: parse is the identity
        arr = batch.column(self.column)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        n = len(arr)
        if self._vector_orn:
            masks = self._orn_masks(arr.type)
            branch_masks = [m(arr) for (_, m) in masks]
            # malli orn parse order: FIRST branch whose parser succeeds wins
            # stringify keys so non-string :orn entry keys (e.g. ints) do
            # not break pa.array(..., type=pa.string()); matches the row
            # fallback's str(out.key) and UnparseBatch's str(k)->k map.
            tag = np.select(branch_masks, [str(k) for (k, _) in masks],
                            default=None)
            matched = np.zeros(n, dtype=bool)
            for bm in branch_masks:
                matched |= bm
            tag_arr = pa.array(tag.tolist(), type=pa.string())
            struct = pa.StructArray.from_arrays(
                [tag_arr, arr], names=["tag", "value"],
                mask=pa.array(~matched))
            return batch.append_column(self.out, struct)
        # row fallback (general schemas: :multi, seq-regex, nested maps...)
        if self._row_parser is None:
            self._row_parser = self.sc.parser()
        tags: list = []
        values: list = []
        invalid = np.zeros(n, dtype=bool)
        for i, v in enumerate(arr.to_pylist()):
            out = self._row_parser(v)
            if out is INVALID:
                invalid[i] = True
                tags.append(None)
                values.append(None)
            elif isinstance(out, Tag):
                tags.append(str(out.key))
                values.append(out.value)
            else:
                tags.append(None)
                values.append(out)
        try:
            value_arr = pa.array(values)
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            import json
            value_arr = pa.array(
                [None if v is None else json.dumps(v, default=str)
                 for v in values], type=pa.string())
        struct = pa.StructArray.from_arrays(
            [pa.array(tags, type=pa.string()), value_arr],
            names=["tag", "value"], mask=pa.array(invalid))
        return batch.append_column(self.out, struct)


class UnparseBatch:
    """Inverse projection: reconstruct ``out`` from a {tag, value} struct
    column (m/unparse, src/malli/core.cljc:2700-2714).  NULL structs
    (::m/invalid) unparse to NULL."""

    def __init__(self, schema_form: Any, column: str = "parsed",
                 out: str = "unparsed", options: dict | None = None):
        self.sc = to_schema(schema_form, options)
        self.column = column
        self.out = out
        self.identity = parser_info(self.sc)["identity"]
        self._vector_orn = (
            isinstance(self.sc, OrnSchema)
            and all(_parse_identity(s, set()) for (_, _, s) in self.sc.children))
        self._row_unparser = None
        # ParseBatch stores tags stringified (one Arrow string column);
        # recover the ORIGINAL branch keys (ints, etc.) for Tag
        # reconstruction — unparse of Tag('1', v) against branch key 1
        # would be ::invalid
        self._tag_keys: dict = {}
        branch_keys = []
        if isinstance(self.sc, OrnSchema):
            branch_keys = [k for (k, _, _) in self.sc.children]
        else:
            branches = getattr(self.sc, "branches", None)
            if isinstance(branches, dict):
                branch_keys = list(branches.keys())
        self._tag_keys = {str(k): k for k in branch_keys}
        if len(self._tag_keys) != len(branch_keys):
            # e.g. branch keys 1 (int) and "1" (string): the stringified
            # struct tag is ambiguous — fail LOUDLY instead of unparsing one
            # branch's rows to null
            raise ValueError(
                "UnparseBatch: branch keys stringify ambiguously "
                f"({branch_keys!r}); batch unparse cannot recover the "
                "original keys — use the row engine for this schema")

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.identity:
            return batch
        col = batch.column(self.column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if self._vector_orn:
            # identity branches: unparse(Tag(k, v)) == v — project the value
            # child out of the struct (zero-copy), nulls stay null
            import pyarrow.compute as pc
            value = col.field("value")
            if col.null_count:
                value = pc.if_else(col.is_valid(), value,
                                   pa.nulls(len(col), value.type))
            return batch.append_column(self.out, value)
        if self._row_unparser is None:
            self._row_unparser = self.sc.unparser()
        out_vals = []
        for row in col.to_pylist():
            if row is None:
                out_vals.append(None)
                continue
            t = row.get("tag")
            if t is not None:
                v = Tag(self._tag_keys.get(t, t), row["value"])
            else:
                v = row["value"]
            u = self._row_unparser(v)
            out_vals.append(None if u is INVALID else u)
        return batch.append_column(self.out, pa.array(out_vals))


def parse_projection(ds: Dataset, schema_form: Any, column: str,
                     out: str = "parsed", concurrency=None,
                     batch_size: int | None = None) -> Dataset:
    """Dataset-level parse projection (elided entirely when identity)."""
    sc = to_schema(schema_form)
    if parser_info(sc)["identity"]:
        return ds  # no-op stage never enters the plan
    from . import cached_stage, concurrency_kwargs
    return ds.map_batches(
        cached_stage(ParseBatch, schema_form=schema_form, column=column, out=out),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size,
        **concurrency_kwargs(concurrency))


def unparse_projection(ds: Dataset, schema_form: Any, column: str = "parsed",
                       out: str = "unparsed", concurrency=None,
                       batch_size: int | None = None) -> Dataset:
    sc = to_schema(schema_form)
    if parser_info(sc)["identity"]:
        return ds
    from . import cached_stage, concurrency_kwargs
    return ds.map_batches(
        cached_stage(UnparseBatch, schema_form=schema_form, column=column, out=out),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size,
        **concurrency_kwargs(concurrency))
