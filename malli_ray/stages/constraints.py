"""Dataset-level constraints: uniqueness, referential integrity, drift.

malli's single-value model has no dataset constraints (SURVEY.md SS2.8); the
north_rule adds three, designed Ray-natively:

  - uniqueness(key): project the key column only (never the payload), partial
    value-counts per batch (map-side combine), then ONE hash groupby on the
    key — shuffle volume is O(distinct keys seen per block), not O(rows of
    full width).  Pre-aggregation is the salt: a hot key collapses to one
    (key, count) row per block before the shuffle.
  - referential(column, allowed): broadcast semi-join — the small allowed
    side ships once inside the actor spec (ray.put happens implicitly via
    the spec object in the actor constructor), evaluated as pc.is_in per
    batch.  No shuffle at all.
  - drift: low-cardinality histogram groupby (combine map-side) compared
    driver-side against a checkpointed baseline with chi-squared + KL.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data import Dataset
from ray.data.aggregate import Count, Sum

__all__ = ["uniqueness_violations", "check_referential", "histogram",
           "drift_score", "ReferentialCheck"]


def _local_value_counts(key: str):
    """Per-batch (key, cnt) partial — the map-side combine before the shuffle."""

    def count_batch(batch: pa.Table) -> pa.Table:
        vc = batch.column(key).value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        return pa.table({key: vc.field("values"),
                         "cnt": vc.field("counts").cast(pa.int64())})

    return count_batch


def uniqueness_violations(ds: Dataset, key: str) -> Dataset:
    """Keys appearing more than once -> (key, cnt) rows.

    Exact dedup check via hash groupby on the projected key column
    (SURVEY.md SS2.8 "uniqueness of doc_id"). Two-phase: batch-local
    value_counts (combiner), then groupby-sum on the key.
    """
    projected = ds.select_columns([key])
    partial = projected.map_batches(_local_value_counts(key), batch_format="pyarrow")
    totals = partial.groupby(key).aggregate(Sum("cnt", alias_name="cnt"))
    return totals.filter(expr="cnt > 1")


# NOTE: a full-payload `first_per_key` groupby used to live here; deleted
# because it shuffled whole rows. For keep-one-per-key semantics use
# stages.dedup.exact_dedup_keep_first (key-only shuffle) and filter the
# corpus by the resulting id set (broadcast is_in / semi_join).


class ReferentialCheck:
    """Broadcast semi-join actor: batch column membership in a small side.

    The allowed set is captured in the actor constructor (shipped once per
    actor via Ray's object store, not per batch).
    """

    def __init__(self, column: str, allowed: list, invert: bool = False):
        self.column = column
        self.value_set = pa.array(sorted(set(allowed)))
        self.invert = invert

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column(self.column), value_set=self.value_set)
        mask = pc.fill_null(mask, False)
        if self.invert:
            mask = pc.invert(mask)
        return batch.filter(mask)


def check_referential(ds: Dataset, column: str, allowed: list,
                      concurrency: int | None = None) -> Dataset:
    """Rows whose ``column`` is NOT in ``allowed`` (the anti-join side ->
    violations)."""
    from . import cached_stage, concurrency_kwargs
    return ds.map_batches(
        cached_stage(ReferentialCheck, column=column, allowed=allowed,
                     invert=True),
        batch_format="pyarrow", **concurrency_kwargs(concurrency))


def histogram(ds: Dataset, column: str) -> dict[str, int]:
    """Low-cardinality histogram: map-side combine + tiny groupby."""
    partial = ds.select_columns([column]).map_batches(
        _local_value_counts(column), batch_format="pyarrow")
    totals = partial.groupby(column).aggregate(Sum("cnt", alias_name="cnt"))
    out: dict[str, int] = {}
    for row in totals.iter_rows():
        out[str(row[column])] = int(row["cnt"])
    return out


def drift_score(current: dict[str, float], baseline: dict[str, float],
                epsilon: float = 1e-9) -> dict[str, float]:
    """Chi-squared statistic + KL divergence between two histograms.

    Scored driver-side over the merged (tiny) histograms, matching the
    north_star "distribution drift on n_tok/source histograms ... chi-squared
    and KL-divergence against a checkpointed baseline".
    """
    keys = sorted(set(current) | set(baseline))
    cur_total = sum(current.values()) or 1.0
    base_total = sum(baseline.values()) or 1.0
    chi2 = 0.0
    kl = 0.0
    for k in keys:
        p = baseline.get(k, 0) / base_total    # expected
        q = current.get(k, 0) / cur_total      # observed
        expected_count = p * cur_total
        observed_count = current.get(k, 0)
        if expected_count > 0:
            chi2 += (observed_count - expected_count) ** 2 / expected_count
        else:
            chi2 += observed_count  # new category: each obs contributes 1
        if q > 0:
            kl += q * math.log((q + epsilon) / (p + epsilon))
    return {"chi2": chi2, "kl": kl, "n_categories": len(keys)}


def numeric_histogram(ds: Dataset, column: str, edges: list[float]) -> dict[str, int]:
    """Fixed-edge numeric histogram (for n_tok drift): vectorized np.histogram
    per batch, summed driver-side (partials are tiny arrays)."""
    edges_arr = np.asarray(edges, dtype=np.float64)

    def hist_batch(batch: pa.Table) -> pa.Table:
        vals = batch.column(column).drop_null().to_numpy(zero_copy_only=False)
        counts, _ = np.histogram(np.asarray(vals, dtype=np.float64), bins=edges_arr)
        return pa.table({"bin": list(range(len(counts))),
                         "cnt": counts.astype(np.int64)})

    partial = ds.select_columns([column]).map_batches(hist_batch, batch_format="pyarrow")
    totals = partial.groupby("bin").aggregate(Sum("cnt", alias_name="cnt"))
    out: dict[str, int] = {}
    for row in totals.iter_rows():
        out[f"bin_{int(row['bin']):04d}"] = int(row["cnt"])
    return out


def monotonic_violations(ds: Dataset, key: str, order_by, value_column: str,
                         strict: bool = False,
                         num_buckets: int = 64) -> Dataset:
    """Ordering constraint: within each ``key``'s run ordered by
    ``order_by``, ``value_column`` must be non-decreasing (``strict=True``:
    strictly increasing).  Emits the violating rows with the previous
    value attached (``<value>_prev``) — the event-time-sanity check a
    validation engine runs on append-ordered streams (SQL replay:
    ``LAG(value) OVER (PARTITION BY key ORDER BY order_by)`` + a filter).

    Values move verbatim (``pc.take``), so timestamps, floats and
    decimals compare with their own Arrow semantics (nulls never violate:
    a null value or a null predecessor is skipped, SQL comparison-with-
    NULL parity).

    Scale shape: the `lag_lead` discipline — ONE ``hash(key) %
    num_buckets`` exchange (evenly-sized groups regardless of key count
    or skew), one Arrow multi-column sort per bucket, then a fully
    vectorized previous-index shift with run-boundary masking across all
    keys at once."""
    from .analytics import _adjacent_change_mask, bucketed_groups

    if isinstance(order_by, str):
        order_by = [order_by]
    prev_name = f"{value_column}_prev"
    spec = [(key, "ascending"), *[(c, "ascending") for c in order_by]]

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.sort_by(spec)
        n = t.num_rows
        empty = pa.table({
            **{c: pa.array([], type=t.schema.field(c).type)
               for c in t.column_names},
            prev_name: pa.array([], type=t.schema.field(value_column).type)})
        if n == 0:
            return empty
        first = np.zeros(n, dtype=bool)
        first[0] = True
        first |= _adjacent_change_mask(t, [key])
        idx = np.arange(n, dtype=np.int64) - 1
        # run starts take a dummy index 0 and are masked to null next
        prev = pc.take(t.column(value_column),
                       pa.array(np.where(first, 0, idx), type=pa.int64()))
        prev = pc.if_else(pa.array(first), pa.nulls(
            n, t.schema.field(value_column).type), prev)
        cur = t.column(value_column)
        bad = (pc.less(cur, prev) if not strict
               else pc.less_equal(cur, prev))
        bad = pc.fill_null(bad, False)
        out = t.append_column(prev_name, prev)
        return out.filter(bad)

    return bucketed_groups(ds, key, per_bucket, num_buckets=num_buckets,
                           seed=17)
