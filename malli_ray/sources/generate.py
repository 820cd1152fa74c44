"""Distributed schema-driven data generation: the malli generator
(malli_ray/generator.py, mirroring malli.generator's seeded `m/sample`,
reference src/malli/generator.cljc) scaled out as a Ray Data SOURCE.

Each row is generated from its GLOBAL row index (`rng = default_rng(seed *
M + i)`), not from a per-block stream — so the produced table is a pure
function of (schema, n, seed): independent of block count, partitioning,
scheduling order, and resume point.  That is the property that makes a
100-TB synthetic corpus reproducible shard-by-shard (the same invariant
sources/sequences.py uses for the north-rule table).

Row synthesis is necessarily per-row Python (arbitrary recursive schemas);
this is a data SOURCE, not a hot transform path — downstream stages stay
vectorized Arrow.  Schemas whose top level is `:map` produce one column per
entry; any other schema produces a single ``value`` column.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import pyarrow as pa

from ray.data import Dataset

__all__ = ["generate_dataset", "generate_block"]

_SEED_STRIDE = 0x9E3779B9  # row-index seed spacing (odd, well-mixed)


def _block_schema(form: Any) -> "pa.Schema | None":
    """The STATIC Arrow schema for generated blocks (streaming execution
    cannot tolerate a data-dependent layout — a block whose first row lacks
    an optional key would otherwise silently drop the column, since
    ``pa.Table.from_pylist`` infers from the first row)."""
    from ..arrow_schema import to_arrow_schema, to_arrow_type
    from ..core import schema as to_schema

    sc = to_schema(form)
    if getattr(sc, "type", None) == "map":
        return to_arrow_schema(form)
    return pa.schema([("value", to_arrow_type(form))])


def _rows_to_table(rows: list, is_map: bool, schema: pa.Schema) -> pa.Table:
    if is_map:
        return pa.Table.from_pylist(rows, schema=schema)
    return pa.table({"value": pa.array(rows, type=schema.field(0).type)})


def generate_block(form: Any, start: int, count: int, seed: int,
                   size: int = 10) -> pa.Table:
    """One deterministic block of ``count`` rows for global row indexes
    ``start..start+count`` — the per-shard unit (importable directly for
    resumable out-of-Ray generation, like generate_sequences_shard)."""
    from ..core import schema as to_schema
    from ..generator import _gen

    sc = to_schema(form)
    is_map = getattr(sc, "type", None) == "map"
    rows = []
    for i in range(start, start + count):
        rng = np.random.default_rng(seed * _SEED_STRIDE + i)
        rows.append(_gen(sc, rng, size, depth=0))
    return _rows_to_table(rows, is_map, _block_schema(form))


def generate_dataset(form: Any, n: int, seed: int = 42, size: int = 10,
                     index_column: "str | None" = None,
                     concurrency=None) -> Dataset:
    """``n`` schema-valid rows as a streaming Dataset.

    Scale shape: ``ray.data.range(n)`` provides the global row indexes;
    each block maps its index range through the compiled generator
    (schema compiled ONCE per worker via the stage cache).  No shuffle, no
    driver-side materialization — blocks stream straight into downstream
    stages or a parquet sink.  Row i's content is deterministic, but the
    streaming executor does NOT guarantee block arrival order — pass
    ``index_column`` to materialize the global index when downstream needs
    a stable identity/order."""
    import ray.data as rd
    from ..stages import cached_stage, concurrency_kwargs

    class _GenBlock:
        def __init__(self, form, seed, size, index_column):
            from ..core import schema as to_schema
            self.sc = to_schema(form)
            self.is_map = getattr(self.sc, "type", None) == "map"
            self.schema = _block_schema(form)
            self.seed = seed
            self.size = size
            self.index_column = index_column

        def __call__(self, batch: pa.Table) -> pa.Table:
            from ..generator import _gen
            ids = batch.column("id").to_numpy(zero_copy_only=False)
            rows = []
            for i in ids.tolist():
                rng = np.random.default_rng(self.seed * _SEED_STRIDE + i)
                rows.append(_gen(self.sc, rng, self.size, depth=0))
            out = _rows_to_table(rows, self.is_map, self.schema)
            if self.index_column:
                out = out.append_column(
                    self.index_column, pa.array(ids, type=pa.int64()))
            return out

    # the DSL form is plain data — it ships in the task closure; the
    # compiled Schema object is built once per worker
    return rd.range(n).map_batches(
        cached_stage(_GenBlock, form=form, seed=seed, size=size,
                     index_column=index_column),
        batch_format="pyarrow", **concurrency_kwargs(concurrency))
