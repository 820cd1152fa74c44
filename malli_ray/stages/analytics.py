"""Grouped analytics operators: top-k per group, exact distinct counts,
pivot (wide) counts.

The reference has no dataset-level analytics (malli validates one value at a
time, SURVEY.md SS2.9-2.10); these are the engine's ranking/cardinality
primitives, designed Ray-Data-first:

  - ``top_k_per_group``: SQL ``ROW_NUMBER() OVER (PARTITION BY g ORDER BY
    ...) <= k`` — map-side partial top-k inside every batch (one Arrow
    multi-column sort + vectorized run-boundary scan) so at most
    k x groups-per-batch rows ever reach the shuffle, then ONE groupby on the
    group key with a per-group sort+slice finisher.  Payload columns ride
    only for surviving rows.
  - ``distinct_count_by_group``: exact ``COUNT(DISTINCT v) GROUP BY g`` —
    map-side per-batch (g, v) dedup (Arrow hash group_by, vectorized) so
    only distinct-per-batch PAIRS shuffle, then one groupby(g) with an
    np.unique finisher.  For approximate counts at extreme cardinality use
    state/sketches.HLL instead; this operator is the exact path.
  - ``pivot_counts``: occurrence counts of a low-cardinality category column
    spread into wide int64 columns per group — map-side (g, cat) partial
    counts (Arrow hash group_by), ONE tiny groupby(g) summing partials into
    the fixed category layout.  The category list is explicit so the output
    schema is static (required for streaming execution; no
    data-dependent schema).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

__all__ = ["top_k_per_group", "distinct_count_by_group", "pivot_counts"]


def _sort_spec(group: str, order_by, descending: bool):
    if isinstance(order_by, str):
        order_by = [order_by]
    direction = "descending" if descending else "ascending"
    # tie-break ascending on every remaining column for determinism is the
    # CALLER's job (pass explicit tie-break columns in order_by)
    return [(group, "ascending"),
            (order_by[0], direction),
            *[(c, "ascending") for c in order_by[1:]]]


def _run_positions(keys: np.ndarray) -> np.ndarray:
    """Position of each element within its run of equal consecutive keys."""
    n = len(keys)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    new = np.ones(n, dtype=bool)
    new[1:] = keys[1:] != keys[:-1]
    starts = np.flatnonzero(new)
    lens = np.diff(np.append(starts, n))
    return np.arange(n, dtype=np.int64) - np.repeat(starts, lens)


def top_k_per_group(ds: Dataset, group: str, order_by, k: int,
                    descending: bool = True, rank_col: str = "rk",
                    num_partitions: int | None = None) -> Dataset:
    """The first ``k`` rows of every ``group``, ordered by ``order_by``
    (descending by default) — SQL ``QUALIFY ROW_NUMBER() OVER (PARTITION BY
    group ORDER BY ...) <= k``, with the 1-based row number in ``rank_col``.

    ``order_by`` may be a column name or a list; the FIRST column gets the
    ``descending`` direction, the rest sort ascending as tie-breaks — pass a
    unique tie-break column (an id) to make the selection deterministic.

    Scale shape: each batch is cut to its own per-group top-k first (one
    Arrow sort + a vectorized run-position scan — no Python loop), so the
    shuffle moves at most ``k x groups`` rows per batch; the finisher
    groupby re-sorts the k-sized survivors per group.  Skew-safe: a hot
    group contributes k rows per batch, not its full volume.
    """
    spec = _sort_spec(group, order_by, descending)

    def partial_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        batch = batch.sort_by(spec)
        gvals = batch.column(group).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(_run_positions(gvals) < k))

    def finish(g: pa.Table) -> pa.Table:
        g = g.sort_by(spec)
        n = min(k, g.num_rows)
        return g.slice(0, n).append_column(
            rank_col, pa.array(np.arange(1, n + 1, dtype=np.int64)))

    return (ds.map_batches(partial_topk, batch_format="pyarrow")
            .groupby(group, num_partitions=num_partitions)
            .map_groups(finish, batch_format="pyarrow"))


def distinct_count_by_group(ds: Dataset, group: str, value: str,
                            out_col: str = "n_distinct",
                            num_partitions: int | None = None) -> Dataset:
    """Exact ``COUNT(DISTINCT value) GROUP BY group``.

    Map-side combine: every batch first collapses to its distinct
    ``(group, value)`` pairs via Arrow's hash ``group_by`` (vectorized), so
    the shuffle carries distinct-per-batch pairs — bounded by the true
    (group x value) cardinality per batch, never the row count.  The
    finisher counts unique values per group with ``np.unique``.  Null
    values are NOT counted (SQL COUNT(DISTINCT) semantics); null groups
    form their own group (SQL GROUP BY semantics).
    """

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        pairs = batch.select([group, value])
        return pairs.group_by([group, value], use_threads=False).aggregate([])

    def finish(g: pa.Table) -> pa.Table:
        v = g.column(value)
        if v.null_count:
            v = v.drop_null()
        vals = v.to_numpy(zero_copy_only=False)
        return pa.table({
            group: g.column(group).slice(0, 1),
            out_col: pa.array([len(np.unique(vals))], type=pa.int64())})

    return (ds.select_columns([group, value])
            .map_batches(distinct_pairs, batch_format="pyarrow")
            .groupby(group, num_partitions=num_partitions)
            .map_groups(finish, batch_format="pyarrow"))


def pivot_counts(ds: Dataset, group: str, pivot: str,
                 categories: list[str], prefix: str = "n_",
                 num_partitions: int | None = None) -> Dataset:
    """Occurrence counts of each ``categories`` value of ``pivot``, spread
    into wide ``<prefix><category>`` int64 columns per ``group`` — SQL
    ``count(*) FILTER (WHERE pivot = '<cat>')`` per category.

    The category list is EXPLICIT (static output schema — a streaming
    pipeline cannot discover columns from data); values outside it are
    ignored.  Map-side combine: each batch collapses to (group, pivot,
    partial count) via Arrow hash group_by, so the shuffle carries at most
    ``groups x |categories|`` rows per batch; the finisher sums partials
    into the wide layout.
    """
    cat_arr = pa.array(categories)

    def partial_counts(batch: pa.Table) -> pa.Table:
        t = batch.select([group, pivot])
        t = t.filter(pc.is_in(t.column(pivot), value_set=cat_arr))
        out = t.group_by([group, pivot], use_threads=False).aggregate(
            [([], "count_all")])
        return out.rename_columns([group, pivot, "__cnt__"])

    def finish(g: pa.Table) -> pa.Table:
        piv = g.column(pivot).to_numpy(zero_copy_only=False)
        cnt = g.column("__cnt__").to_numpy(zero_copy_only=False)
        cols = {group: g.column(group).slice(0, 1)}
        for cat in categories:
            cols[prefix + cat] = pa.array(
                [int(cnt[piv == cat].sum())], type=pa.int64())
        return pa.table(cols)

    return (ds.select_columns([group, pivot])
            .map_batches(partial_counts, batch_format="pyarrow")
            .groupby(group, num_partitions=num_partitions)
            .map_groups(finish, batch_format="pyarrow"))
