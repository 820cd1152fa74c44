"""Sequence packing: group documents into fixed token-budget training blocks.

The LLM-pipeline step between tokenization and shard writing: every document
carries a token (or char) count and must land in a block whose total stays
near a budget. Two variants:

- ``chunk_blocks``: non-resetting budget chunking — ``block_id =
  floor(cumulative_count_before / cap)`` within a partition group, computed
  with ONE groupby shuffle and a vectorized per-group cumsum (exactly the
  SQL window ``SUM(n) OVER (PARTITION BY g ORDER BY id) - n``, so it is
  oracle-checkable). Blocks may overflow by at most one document.
- ``pack_greedy``: classic greedy first-fit-in-order packing (a block closes
  when the NEXT doc would overflow; oversized docs get their own block).
  The resetting scan is inherently sequential per group — a bounded numpy
  loop over the group's rows.

Partitioning assumption (documented, same as windows.sessionize): one
group's rows fit in a worker's memory. At 100 TB pick a grouping key of
bounded size (source × date shard); only (group, id, count) columns move
through the shuffle, never the payload.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from . import concurrency_kwargs as _conc

__all__ = ["chunk_blocks", "pack_greedy", "greedy_block_ids"]


def chunk_blocks(ds: Dataset, group_column: str, id_column: str,
                 count_column: str, cap: int) -> Dataset:
    """(group, id, count, block_id) with block_id = cum_before // cap per
    group in id order."""

    def per_group(group: pa.Table) -> pa.Table:
        idx = pa.compute.sort_indices(group, sort_keys=[(id_column, "ascending")])
        group = group.take(idx)
        n = group.column(count_column).to_numpy(zero_copy_only=False).astype(np.int64)
        before = np.cumsum(n) - n
        return group.append_column("block_id", pa.array(before // cap,
                                                        type=pa.int64()))

    cols = [group_column, id_column, count_column]
    return (ds.select_columns(cols)
            .groupby(group_column)
            .map_groups(per_group, batch_format="pyarrow"))


def greedy_block_ids(counts: np.ndarray, cap: int) -> np.ndarray:
    """Greedy first-fit-in-order block ids for one ordered group: the block
    closes when the next doc would push the total past ``cap``; a doc larger
    than ``cap`` occupies its own block."""
    out = np.empty(len(counts), dtype=np.int64)
    block, total = 0, 0
    for i, c in enumerate(counts):
        c = int(c)
        if total > 0 and total + c > cap:
            block += 1
            total = 0
        out[i] = block
        total += c
    return out


def pack_greedy(ds: Dataset, group_column: str, id_column: str,
                count_column: str, cap: int) -> Dataset:
    """(group, id, count, block_id) with greedy resetting packing per group."""

    def per_group(group: pa.Table) -> pa.Table:
        idx = pa.compute.sort_indices(group, sort_keys=[(id_column, "ascending")])
        group = group.take(idx)
        n = group.column(count_column).to_numpy(zero_copy_only=False).astype(np.int64)
        return group.append_column("block_id",
                                   pa.array(greedy_block_ids(n, cap),
                                            type=pa.int64()))

    cols = [group_column, id_column, count_column]
    return (ds.select_columns(cols)
            .groupby(group_column)
            .map_groups(per_group, batch_format="pyarrow"))
