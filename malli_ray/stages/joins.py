"""Join operators: broadcast (small side) and hash-shuffle (big-big).

The reference has no joins (malli validates one value at a time, SURVEY.md
SS2.8); these are the engine's dataset-level lookup primitives, designed
Ray-Data-first:

  - ``broadcast_join``: the small side is ``ray.put`` ONCE and probed
    vectorized (np.searchsorted on a sorted key array) inside every
    ``map_batches`` task — zero shuffle, the right plan whenever one side
    fits in worker memory (dimension tables, allow-lists, vocab maps).
  - ``hash_join``: thin policy wrapper over Ray Data's native
    ``Dataset.join`` (hash-partitioned shuffle join) with ``num_partitions``
    defaulted from the cluster size — both sides move, use only when both
    sides are genuinely large.
  - ``semi_join`` / ``anti_join``: membership filters on the engine's own
    tag+union bucketed shape (NOT Ray's native left_semi/left_anti — the
    native join nondeterministically finalizes empty tiny-side partitions
    schema-less; see _membership_join).  Broadcast variant for small
    filter sides: stages/constraints.check_referential.
  - ``bloom_semi_join``: Bloom pre-filter (no false negatives) + the exact
    semi join — cuts the shuffle to ~match_rate x |left| for selective
    membership filters.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

__all__ = ["broadcast_join", "hash_join", "semi_join", "anti_join",
           "bloom_semi_join", "interval_lookup", "partitions_for",
           "except_keys", "intersect_keys", "except_all_keys",
           "intersect_all_keys", "snapshot_diff", "estimate_join_size",
           "hot_keys", "skew_join", "union_by_name"]


class _BroadcastProbe:
    """Stateful stage: the broadcast (sorted-key) lookup held once per
    worker; vectorized searchsorted probe per batch."""

    def __init__(self, ref, probe_key: str, out_cols: list[str],
                 how: str):
        import ray
        keys, values = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        self.keys = keys            # sorted 1-D numpy key array
        # Arrow arrays built once per worker (pc.take target)
        self.values = {c: pa.array(v) for c, v in values.items()}
        self.probe_key = probe_key
        self.out_cols = out_cols
        self.how = how

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.probe_key)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # nulls never match; fill them with a real key value BEFORE the
        # numpy conversion so (a) object arrays contain no None (searchsorted
        # would raise) and (b) nullable int64 columns don't degrade to
        # float64 (precision loss corrupts 2^53+ ids)
        null_mask = np.zeros(len(col), dtype=bool)
        if col.null_count:
            null_mask = np.asarray(col.is_null())
            if len(self.keys):
                fill = (self.keys[0].item() if hasattr(self.keys[0], "item")
                        else self.keys[0])
                col = pc.fill_null(col, fill)
        probe = col.to_numpy(zero_copy_only=False)
        if len(self.keys):
            # side='right' - 1 => LAST occurrence among duplicate keys wins
            idx = np.searchsorted(self.keys, probe, side="right") - 1
            idx_c = np.clip(idx, 0, len(self.keys) - 1)
            matched = (self.keys[idx_c] == probe) & ~null_mask
        else:
            idx_c = np.zeros(len(probe), dtype=np.int64)
            matched = np.zeros(len(probe), dtype=bool)
        if self.how == "inner":
            batch = batch.filter(pa.array(matched))
            idx_c = idx_c[matched]
            matched = None
        take = pa.array(idx_c, type=pa.int64(),
                        mask=(None if matched is None else ~matched))
        for col_name in self.out_cols:
            batch = batch.append_column(col_name,
                                        pc.take(self.values[col_name], take))
        return batch


def broadcast_join(ds: Dataset, small: pa.Table, key: str,
                   value_cols: list[str], probe_key: str | None = None,
                   how: str = "left", concurrency=None) -> Dataset:
    """Attach ``value_cols`` from a SMALL table to every row of ``ds``.

    The small side ships to the object store once (``ray.put``) as sorted
    numpy arrays; each batch probes it with one vectorized searchsorted —
    never a shuffle, never a Python loop over keys. ``how``: "left" keeps
    unmatched rows with null values, "inner" drops them.  Duplicate keys on
    the small side keep the LAST occurrence (deterministic after sort).
    """
    import ray
    from . import cached_stage, concurrency_kwargs
    if how not in ("left", "inner"):
        raise ValueError("broadcast_join: how must be 'left' or 'inner'")
    probe_key = probe_key or key
    # drop build-side null keys up front: they can never match a probe, and
    # leaving them in would crash object-key sorts / degrade int64 keys to
    # float64 (precision corruption for 2^53+ ids)
    if small.column(key).null_count:
        small = small.filter(pc.is_valid(small.column(key)))
    keys = small.column(key).to_numpy(zero_copy_only=False)
    order = np.argsort(keys, kind="stable")
    values = {c: small.column(c).to_numpy(zero_copy_only=False)[order]
              for c in value_cols}
    ref = ray.put((keys[order], values))
    return ds.map_batches(
        cached_stage(_BroadcastProbe, ref=ref, probe_key=probe_key,
                     out_cols=value_cols, how=how),
        batch_format="pyarrow", **concurrency_kwargs(concurrency))


class _IntervalProbe:
    """Per-worker state: sorted interval bounds + values from the object
    store; per batch ONE vectorized searchsorted probe."""

    def __init__(self, ref, probe_key: str, out_cols: list[str], how: str,
                 closed: str):
        import ray
        self.lo, self.hi, self.values = ray.get(ref)
        self.probe_key = probe_key
        self.out_cols = out_cols
        self.how = how
        self.closed = closed

    def __call__(self, batch: pa.Table) -> pa.Table:
        probe = batch.column(self.probe_key).to_numpy(zero_copy_only=False)
        side = "right" if self.closed in ("left", "both") else "left"
        idx = np.searchsorted(self.lo, probe, side=side) - 1
        safe = np.maximum(idx, 0)
        upper = (probe <= self.hi[safe] if self.closed in ("right", "both")
                 else probe < self.hi[safe])
        hit = (idx >= 0) & upper & ~np.isnan(probe.astype(np.float64,
                                                          copy=False))
        for c in self.out_cols:
            vals = pa.array(self.values[c][safe])
            batch = batch.append_column(
                c, pc.if_else(pa.array(hit), vals,
                              pa.scalar(None, vals.type)))
        if self.how == "inner":
            batch = batch.filter(pa.array(hit))
        return batch


def interval_lookup(ds: Dataset, intervals: pa.Table, probe_key: str,
                    lo_col: str, hi_col: str, value_cols: list[str],
                    how: str = "left", closed: str = "left",
                    concurrency=None) -> Dataset:
    """Enrich rows by NON-OVERLAPPING interval membership (GeoIP-range /
    value-band lookup): the interval table ships once via ``ray.put``;
    each batch probes with one vectorized searchsorted — no shuffle.

    ``closed``: "left" = [lo, hi), "right" = (lo, hi], "both" = [lo, hi].
    Overlapping or unsorted intervals raise (semantics would be
    order-dependent); ``how`` as in :func:`broadcast_join`.

    The at-scale sibling of :func:`range_join` — use that (one shuffle,
    per-group searchsorted) when the interval side is too large to
    broadcast or intervals overlap (one-to-many)."""
    import ray
    from . import cached_stage, concurrency_kwargs
    if how not in ("left", "inner"):
        raise ValueError("interval_lookup: how must be 'left' or 'inner'")
    if closed not in ("left", "right", "both"):
        raise ValueError("interval_lookup: closed must be left|right|both")
    lo = intervals.column(lo_col).to_numpy(zero_copy_only=False)
    hi = intervals.column(hi_col).to_numpy(zero_copy_only=False)
    order = np.argsort(lo, kind="stable")
    lo, hi = lo[order], hi[order]
    if np.any(hi < lo) or (len(lo) > 1 and not (
            np.all(hi[:-1] <= lo[1:]) if closed != "both"
            else np.all(hi[:-1] < lo[1:]))):
        raise ValueError("interval_lookup: intervals must be sorted and "
                         "non-overlapping")
    values = {c: intervals.column(c).to_numpy(zero_copy_only=False)[order]
              for c in value_cols}
    ref = ray.put((lo, hi, values))
    return ds.map_batches(
        cached_stage(_IntervalProbe, ref=ref, probe_key=probe_key,
                     out_cols=value_cols, how=how, closed=closed),
        batch_format="pyarrow", **concurrency_kwargs(concurrency))


def _default_partitions() -> int:
    import ray
    try:
        return max(8, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        return 16


def partitions_for(rows: int | None,
                   rows_per_partition: int = 100_000) -> int | None:
    """Data-aware shuffle-partition count for :func:`hash_join`.

    Ray's hash-shuffle join spins up ``num_partitions`` aggregator actors
    per execution — a FIXED cost that dominates small joins (measured: the
    same sf0.1 left-outer join runs 2.5s at 4-8 partitions vs 6s at 32).
    Size partitions to the larger side's row count (parquet-metadata
    ``count()`` is free on a fresh read), capped by cluster CPUs: at
    100 TB the cap binds (partitions == CPUs, each worker busy); at bench
    scale the data term binds (no idle aggregator spin-up)."""
    if rows is None:
        return None
    return max(4, min(_default_partitions(),
                      int(rows) // int(rows_per_partition) + 1))


def hash_join(left: Dataset, right: Dataset, on, right_on=None,
              join_type: str = "inner",
              num_partitions: int | None = None, **kwargs) -> Dataset:
    """Big-big equi-join: Ray Data's native hash-partitioned shuffle join.

    Both sides shuffle (all-to-all) — project to the needed columns FIRST
    and prefer ``broadcast_join`` whenever one side is small. Partition
    count defaults to the cluster CPU count (each partition joins
    independently; more partitions = smaller per-worker memory).
    """
    if isinstance(on, str):
        on = (on,)
    if isinstance(right_on, str):
        right_on = (right_on,)
    return left.join(right, join_type=join_type,
                     num_partitions=num_partitions or _default_partitions(),
                     on=tuple(on), right_on=right_on, **kwargs)


def bloom_semi_join(left: Dataset, right: Dataset, on: str,
                    right_on: str | None = None,
                    capacity: int | None = None,
                    fp_rate: float = 0.01,
                    num_partitions: int | None = None) -> Dataset:
    """Semi-join with a Bloom pre-filter: build an OR-mergeable Bloom
    digest of the RIGHT keys in one streaming pass, broadcast it, drop
    left rows that cannot match BEFORE the shuffle, then the exact
    ``semi_join`` on the survivors.

    EXACT result (the Bloom filter has no false negatives; false
    positives survive the pre-filter and are removed by the exact join).
    The win is shuffle volume: when the match rate is small — the usual
    shape for "keep train docs whose id appears in the curated list" —
    the all-to-all moves ~match_rate x |left| rows instead of |left|.
    ``capacity`` defaults to a metadata-count of the right side."""
    right_on = right_on or on
    from .dedup import build_bloom

    # the Bloom pre-filter hashes COLUMN VALUES: a dtype mismatch between
    # the two key columns would hash differently -> FALSE NEGATIVES the
    # exact join can't repair.  Fail loudly instead.
    lt = left.schema().base_schema.field(on).type
    rt = right.schema().base_schema.field(right_on).type
    if lt != rt:
        raise ValueError(f"bloom_semi_join: key dtypes differ "
                         f"({lt} vs {rt}); cast first")

    if capacity is None:
        capacity = max(1024, right.count())
    bloom = build_bloom(right, right_on, capacity=capacity,
                        fp_rate=fp_rate)
    from .dedup import filter_seen_bloom
    pre = filter_seen_bloom(left, on, bloom, keep_seen=True)
    return semi_join(pre, right, on, right_on,
                     num_partitions=num_partitions)


def _membership_join(left: Dataset, right: Dataset, on, right_on,
                     keep_matched: bool,
                     num_partitions: int | None) -> Dataset:
    """Semi/anti join on the engine's own tag+union bucketed shape.

    Ray's native ``Dataset.join`` nondeterministically finalizes EMPTY
    tiny-side partitions as schema-less tables (the documented failure in
    SCALE.md — a selective filter on the right side reliably triggers
    it), so membership joins use the same construction as asof_join:
    left rows ride with payload (side 0), the right side contributes its
    map-side-DEDUPED keys only (side 1, renamed into the left schema with
    null payload), ONE groupby on ``hash(key) % buckets``, and each
    bucket filters vectorized with ``pc.is_in``.  Shuffle volume equals
    the native semi join's (left rows + right distinct keys); buckets
    are hash-balanced regardless of key skew."""
    from ..state.sketches import hash64

    if not isinstance(on, str) or (right_on is not None
                                   and not isinstance(right_on, str)):
        raise ValueError("semi/anti join: single key column only")
    right_on = right_on or on
    buckets = num_partitions or _default_partitions()
    left_schema = left.schema().base_schema
    if on not in left_schema.names:
        raise ValueError(f"semi/anti join: {on!r} not in left columns")

    def tag_left(batch: pa.Table) -> pa.Table:
        h = hash64(batch.column(on), seed=17)
        return (batch
                .append_column("__side", pa.array(
                    np.zeros(batch.num_rows, dtype=np.int8)))
                .append_column("__b", pa.array(
                    (h % np.uint64(buckets)).astype(np.int64))))

    def tag_right(batch: pa.Table) -> pa.Table:
        keys = batch.select([right_on]) \
            .group_by([right_on], use_threads=False).aggregate([])
        key_col = keys.column(right_on).combine_chunks()
        if key_col.type != left_schema.field(on).type:
            key_col = key_col.cast(left_schema.field(on).type)
        h = hash64(key_col, seed=17)
        cols = {}
        for f in left_schema:
            cols[f.name] = (key_col if f.name == on
                            else pa.nulls(len(key_col), f.type))
        t = pa.table(cols)
        return (t
                .append_column("__side", pa.array(
                    np.ones(len(key_col), dtype=np.int8)))
                .append_column("__b", pa.array(
                    (h % np.uint64(buckets)).astype(np.int64))))

    uni = (left.map_batches(tag_left, batch_format="pyarrow")
           .union(right.map_batches(tag_right, batch_format="pyarrow")))

    def filter_bucket(g: pa.Table) -> pa.Table:
        side = g.column("__side").to_numpy(zero_copy_only=False)
        lhs = g.filter(pa.array(side == 0))
        rhs_keys = g.filter(pa.array(side == 1)).column(on).combine_chunks()
        out = lhs.drop_columns(["__side", "__b"])
        if len(rhs_keys) == 0:
            return out if not keep_matched else out.slice(0, 0)
        hit = pc.is_in(lhs.column(on), value_set=rhs_keys)
        hit = pc.fill_null(hit, False)
        return out.filter(hit if keep_matched else pc.invert(hit))

    return uni.groupby("__b").map_groups(filter_bucket,
                                         batch_format="pyarrow")


def semi_join(left: Dataset, right: Dataset, on, right_on=None,
              num_partitions: int | None = None) -> Dataset:
    """Rows of ``left`` whose key appears in ``right`` (no right
    columns).  Tag+union bucketed membership filter — see
    :func:`_membership_join` for why this avoids Ray's native semi join."""
    return _membership_join(left, right, on, right_on, True,
                            num_partitions)


def anti_join(left: Dataset, right: Dataset, on, right_on=None,
              num_partitions: int | None = None) -> Dataset:
    """Rows of ``left`` whose key does NOT appear in ``right``."""
    return _membership_join(left, right, on, right_on, False,
                            num_partitions)


def _set_op_keys(ds_a: Dataset, ds_b: Dataset, key_a: str, key_b: str,
                 op: str, out_col: Optional[str],
                 num_partitions: Optional[int]) -> Dataset:
    """Distinct-key set algebra (SQL EXCEPT / INTERSECT on single key
    columns).

    Scale shape: each side is projected to its key column, deduped map-side
    per batch (Arrow hash group_by), and tagged with a constant side bit —
    so the shuffle carries only distinct-per-batch KEYS + one int8.  One
    groupby(key) aggregate (min/max of the side bit) classifies every key:
    except  -> seen only on side A (max == 0)
    intersect -> seen on both     (min == 0 and max == 1)
    No payload moves, no per-key Python — the classify step is Ray's
    native vectorized Min/Max aggregate + a filter.
    """
    from ray.data.aggregate import Max, Min

    out = out_col or key_a
    side_col = "__setside__"

    def prep(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            keys = batch.group_by([batch.column_names[0]],
                                  use_threads=False).aggregate([])
            keys = keys.rename_columns([out])
            return keys.append_column(
                side_col, pa.array(np.full(keys.num_rows, side,
                                           dtype=np.int8)))
        return fn

    a = ds_a.select_columns([key_a]).map_batches(prep(0),
                                                 batch_format="pyarrow")
    b = ds_b.select_columns([key_b]).map_batches(prep(1),
                                                 batch_format="pyarrow")
    both = a.union(b)
    agg = both.groupby(out, num_partitions=num_partitions).aggregate(
        Min(side_col, alias_name="__mn__"), Max(side_col,
                                                alias_name="__mx__"))
    if op == "except":
        agg = agg.filter(expr="__mx__ == 0")
    elif op == "intersect":
        agg = agg.filter(expr="__mn__ == 0 and __mx__ == 1")
    else:
        raise ValueError(f"unknown set op: {op}")
    return agg.select_columns([out])


def except_keys(ds_a: Dataset, ds_b: Dataset, key_a: str,
                key_b: Optional[str] = None, out_col: Optional[str] = None,
                num_partitions: Optional[int] = None) -> Dataset:
    """SQL ``SELECT DISTINCT key_a FROM a EXCEPT SELECT key_b FROM b`` —
    distinct keys of A that never appear in B (anti_join's distinct-key
    sibling; use anti_join when you need A's full rows back)."""
    return _set_op_keys(ds_a, ds_b, key_a, key_b or key_a, "except",
                        out_col, num_partitions)


def intersect_keys(ds_a: Dataset, ds_b: Dataset, key_a: str,
                   key_b: Optional[str] = None,
                   out_col: Optional[str] = None,
                   num_partitions: Optional[int] = None) -> Dataset:
    """SQL ``SELECT DISTINCT key_a FROM a INTERSECT SELECT key_b FROM b``."""
    return _set_op_keys(ds_a, ds_b, key_a, key_b or key_a, "intersect",
                        out_col, num_partitions)


def _set_op_all_keys(ds_a: Dataset, ds_b: Dataset, key_a: str, key_b: str,
                     op: str, out_col: Optional[str],
                     num_partitions: Optional[int]) -> Dataset:
    """Bag-semantics set algebra (SQL EXCEPT ALL / INTERSECT ALL on single
    key columns): a key with count ``ca`` in A and ``cb`` in B appears
    ``max(ca - cb, 0)`` (except_all) / ``min(ca, cb)`` (intersect_all)
    times in the output.

    Scale shape: each side collapses to per-batch (key, count) partials
    map-side (Arrow hash group_by — hot keys combine before moving), the
    shuffle carries only distinct-per-batch keys + two int64s, one
    groupby(key) sums both sides, and the multiplicity expansion is a
    vectorized np.repeat per output block.  Output size is the SQL bag
    result — the only stage whose row count can exceed the distinct-key
    count."""
    from ray.data.aggregate import Sum

    out = out_col or key_a

    def prep(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            t = pa.table({out: batch.column(0)})
            counts = t.group_by([out], use_threads=False).aggregate(
                [([], "count_all")])
            cnt = pc.cast(counts.column("count_all"), pa.int64())
            zero = pa.array(np.zeros(len(cnt), dtype=np.int64))
            return pa.table({out: counts.column(out),
                             "__ca__": cnt if side == 0 else zero,
                             "__cb__": zero if side == 0 else cnt})
        return fn

    a = ds_a.select_columns([key_a]).map_batches(prep(0),
                                                 batch_format="pyarrow")
    b = ds_b.select_columns([key_b]).map_batches(prep(1),
                                                 batch_format="pyarrow")
    agg = a.union(b).groupby(out, num_partitions=num_partitions).aggregate(
        Sum("__ca__", alias_name="__ca__"),
        Sum("__cb__", alias_name="__cb__"))

    def expand(batch: pa.Table) -> pa.Table:
        ca = (batch.column("__ca__").to_numpy(zero_copy_only=False)
              .astype(np.int64))
        cb = (batch.column("__cb__").to_numpy(zero_copy_only=False)
              .astype(np.int64))
        if op == "except_all":
            m = np.maximum(ca - cb, 0)
        else:
            m = np.minimum(ca, cb)
        idx = np.repeat(np.arange(batch.num_rows), m)
        keys = batch.column(out)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        return pa.table({out: keys.take(pa.array(idx, type=pa.int64()))})

    return agg.map_batches(expand, batch_format="pyarrow")


def except_all_keys(ds_a: Dataset, ds_b: Dataset, key_a: str,
                    key_b: Optional[str] = None,
                    out_col: Optional[str] = None,
                    num_partitions: Optional[int] = None) -> Dataset:
    """SQL ``SELECT key_a FROM a EXCEPT ALL SELECT key_b FROM b`` — bag
    difference with multiplicities (each B occurrence cancels one A
    occurrence)."""
    return _set_op_all_keys(ds_a, ds_b, key_a, key_b or key_a,
                            "except_all", out_col, num_partitions)


def intersect_all_keys(ds_a: Dataset, ds_b: Dataset, key_a: str,
                       key_b: Optional[str] = None,
                       out_col: Optional[str] = None,
                       num_partitions: Optional[int] = None) -> Dataset:
    """SQL ``SELECT key_a FROM a INTERSECT ALL SELECT key_b FROM b`` —
    bag intersection (min of the two occurrence counts per key)."""
    return _set_op_all_keys(ds_a, ds_b, key_a, key_b or key_a,
                            "intersect_all", out_col, num_partitions)


def snapshot_diff(old: Dataset, new: Dataset, key: str,
                  compare_cols: "list[str]",
                  num_partitions: Optional[int] = None) -> Dataset:
    """CDC-style diff of two snapshots of a keyed table: one row per key
    whose state differs — ``status`` in {'added', 'removed', 'changed'}
    (unchanged keys are dropped).  ``key`` must be unique within each
    snapshot (the usual CDC contract).

    Scale shape: neither payload shuffles — each side collapses map-side
    to (key, side-tagged 128-bit content hash of ``compare_cols``), one
    groupby(key) sums the tagged columns (with unique keys the sums ARE
    the per-side values), and a vectorized finisher classifies:
    missing-on-old -> added, missing-on-new -> removed, differing hashes
    -> changed.  Collision risk is the standard 2^-128; the hash kernel
    is the engine-wide pinned polars xxhash (state.sketches.hash64).
    """
    from ..state.sketches import hash64

    FNV = np.uint64(1099511628211)

    def prep(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            h1 = np.full(n, np.uint64(0x9E3779B97F4A7C15))
            h2 = np.full(n, np.uint64(0xC2B2AE3D27D4EB4F))
            for i, c in enumerate(compare_cols):
                h1 = h1 * FNV + hash64(batch.column(c), seed=17 + i)
                h2 = h2 * FNV + hash64(batch.column(c), seed=1017 + i)
            one = np.ones(n, dtype=np.int64)
            zero = np.zeros(n, dtype=np.int64)
            cols = {key: batch.column(key)}
            if side == 0:
                cols.update({"__na": one, "__ha1": h1.astype(np.int64),
                             "__ha2": h2.astype(np.int64), "__nb": zero,
                             "__hb1": zero, "__hb2": zero})
            else:
                cols.update({"__na": zero, "__ha1": zero, "__ha2": zero,
                             "__nb": one, "__hb1": h1.astype(np.int64),
                             "__hb2": h2.astype(np.int64)})
            return pa.table(cols)
        return fn

    a = old.select_columns([key, *compare_cols]).map_batches(
        prep(0), batch_format="pyarrow")
    b = new.select_columns([key, *compare_cols]).map_batches(
        prep(1), batch_format="pyarrow")
    # exchange on hash(key) % buckets, not on the raw (unique-per-side)
    # key: a per-key Ray aggregate would shuffle into |keys| groups with
    # nothing to combine map-side; 64 hash buckets + one polars group_by
    # per bucket classify the same rows in a fraction of the exchange cost
    num_buckets = 64
    bucket_col = "__diffbucket__"

    def bucketize(batch: pa.Table) -> pa.Table:
        h = hash64(batch.column(key), seed=29) % np.uint64(num_buckets)
        return batch.append_column(
            bucket_col, pa.array(h.astype(np.int64), type=pa.int64()))

    def classify(g: pa.Table) -> pa.Table:
        import polars as pl
        agg = (pl.from_arrow(g.drop_columns([bucket_col]))
               .group_by(key)
               .agg(*[pl.col(c).sum().alias(c) for c in
                      ("__na", "__ha1", "__ha2", "__nb", "__hb1", "__hb2")]))

        def col(c):
            return agg.get_column(c).cast(pl.Int64).to_numpy()
        na, nb = col("__na"), col("__nb")
        if (na > 1).any() or (nb > 1).any():
            raise ValueError("snapshot_diff: duplicate keys in a snapshot")
        changed = ((col("__ha1") != col("__hb1"))
                   | (col("__ha2") != col("__hb2")))
        status = np.where(na == 0, "added",
                          np.where(nb == 0, "removed",
                                   np.where(changed, "changed", "")))
        keep = status != ""
        keys = agg.get_column(key).to_arrow().cast(
            g.schema.field(key).type)
        idx = pa.array(np.flatnonzero(keep), type=pa.int64())
        return pa.table({key: keys.take(idx),
                         "status": pa.array(status[keep].tolist(),
                                            type=pa.string())})

    return (a.union(b)
            .map_batches(bucketize, batch_format="pyarrow")
            .groupby(bucket_col, num_partitions=num_partitions)
            .map_groups(classify, batch_format="pyarrow"))


def _cms_of_column(ds: Dataset, column: str, width: int,
                   depth: int):
    from ..state.sketches import CountMinSketch

    def partial(batch: pa.Table) -> pa.Table:
        sk = CountMinSketch(width=width, depth=depth)
        col = batch.column(column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if col.null_count:
            col = col.drop_null()
        sk.add(col)
        return pa.table({"d": pa.array([sk.digest()], pa.large_string())})

    rows = ds.select_columns([column]).map_batches(
        partial, batch_format="pyarrow").take_all()
    merged = CountMinSketch(width=width, depth=depth)
    for r in rows:
        merged.merge(CountMinSketch.from_digest(r["d"], width=width,
                                                depth=depth))
    return merged


def estimate_join_size(left: Dataset, right: Dataset, on: str,
                       right_on: Optional[str] = None,
                       width: int = 8192, depth: int = 4) -> int:
    """Upper-bound estimate of the equi-join OUTPUT row count WITHOUT
    running the join — the shuffle-planning probe: one streaming
    Count-Min sketch pass per side (fixed-size mergeable partials, one
    digest row per block to the driver), then the CM inner-product
    estimator ``min_d <row_a(d), row_b(d)>``.

    Never under-estimates (each row over-counts by hash collisions
    only); expected over-estimate <= (e / width) * |left| * |right|.
    Use it to choose ``num_partitions`` (:func:`partitions_for` on the
    ESTIMATE rather than the input size), to flag exploding joins before
    paying the all-to-all, and to pick broadcast- vs hash-join sides.
    Null keys are excluded (they never match in an equi-join)."""
    a = _cms_of_column(left, on, width, depth)
    b = _cms_of_column(right, right_on or on, width, depth)
    return a.inner_product(b)


# -- skew-aware hybrid join ---------------------------------------------------


def hot_keys(ds: Dataset, column: str, min_share: float = 0.05,
             width: int = 8192, depth: int = 4) -> np.ndarray:
    """Join keys whose global frequency share is >= ``min_share``, found
    in ONE streaming pass (the pre-shuffle skew probe).

    Per batch: the batch-local top-``ceil(1/min_share)`` values become
    candidates (pigeonhole-COMPLETE: a key with global share >= t has
    share >= t in at least one batch, where it ranks in the top 1/t) and
    one Count-Min digest row is emitted; the driver merges the O(batches)
    fixed-size partials and keeps candidates whose CM estimate >=
    ``min_share * total``.  CM never under-counts, so false POSITIVES are
    possible (a cold key promoted hot — harmless: it just rides the
    broadcast path in :func:`skew_join`) but a truly hot key is never
    missed.  Nulls never count (they never match an equi-join).

    Returns the hot keys as a SORTED numpy array of the column's type."""
    import polars as pl

    from ..state.sketches import CountMinSketch

    if not (0.0 < min_share <= 1.0):
        raise ValueError("hot_keys: min_share must be in (0, 1]")
    k = int(np.ceil(1.0 / min_share))

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if col.null_count:
            col = col.drop_null()
        sk = CountMinSketch(width=width, depth=depth)
        sk.add(col)
        top = (pl.DataFrame({"v": pl.from_arrow(col)})
               .group_by("v").len().top_k(k, by="len")
               .get_column("v").to_arrow().cast(col.type))
        n = len(top)
        return pa.table({
            "cand": pa.concat_arrays(
                [top.combine_chunks() if isinstance(top, pa.ChunkedArray)
                 else top, pa.nulls(1, col.type)]),
            "digest": pa.array([None] * n + [sk.digest()],
                               pa.large_string())})

    rows = (ds.select_columns([column])
            .map_batches(partial, batch_format="pyarrow")
            .take_all())
    merged = CountMinSketch(width=width, depth=depth)
    cands = []
    for r in rows:
        if r["digest"] is not None:
            merged.merge(CountMinSketch.from_digest(
                r["digest"], width=width, depth=depth))
        elif r["cand"] is not None:
            cands.append(r["cand"])
    if not cands:
        return np.array([], dtype=np.int64)
    uniq = np.unique(np.array(cands))
    est = merged.estimate(pa.array(uniq.tolist()))
    hot = uniq[est >= min_share * merged.total()]
    return np.sort(hot)


class _BroadcastMultiProbe:
    """Multi-match broadcast probe (the hot branch of :func:`skew_join`):
    the build side is sorted by key; each probe row fans out to ALL
    matching build rows via two searchsorted bounds + one vectorized
    range expansion — full inner-join semantics, never one row per key."""

    def __init__(self, ref, probe_key: str, out_cols: "list[str]"):
        import ray
        keys, values = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        self.keys = keys                # sorted numpy key array
        self.values = values            # {col: Arrow array, build order}
        self.probe_key = probe_key
        self.out_cols = out_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.probe_key)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        null_mask = np.zeros(len(col), dtype=bool)
        if col.null_count:
            null_mask = np.asarray(col.is_null())
            if len(self.keys):
                fill = (self.keys[0].item() if hasattr(self.keys[0], "item")
                        else self.keys[0])
                col = pc.fill_null(col, fill)
        probe = col.to_numpy(zero_copy_only=False)
        if len(self.keys) and len(probe):
            lo = np.searchsorted(self.keys, probe, side="left")
            hi = np.searchsorted(self.keys, probe, side="right")
            counts = (hi - lo).astype(np.int64)
            counts[null_mask] = 0
        else:
            lo = np.zeros(len(probe), dtype=np.int64)
            counts = np.zeros(len(probe), dtype=np.int64)
        total = int(counts.sum())
        left_idx = np.repeat(np.arange(len(probe), dtype=np.int64), counts)
        start = np.repeat(lo, counts)
        offs = np.concatenate(([0], np.cumsum(counts)[:-1])) \
            if len(counts) else np.zeros(0, dtype=np.int64)
        within = (np.arange(total, dtype=np.int64)
                  - np.repeat(offs, counts))
        right_idx = pa.array(start + within, pa.int64())
        out = batch.take(pa.array(left_idx, pa.int64()))
        for c in self.out_cols:
            out = out.append_column(c, pc.take(self.values[c], right_idx))
        return out


def skew_join(left: Dataset, right: Dataset, on: str,
              right_value_cols: "list[str]",
              right_on: Optional[str] = None, *,
              min_share: float = 0.05,
              num_partitions: Optional[int] = None,
              max_hot_build_rows: int = 2_000_000,
              width: int = 8192, depth: int = 4,
              concurrency=None) -> Dataset:
    """Skew-aware hybrid INNER equi-join: hot keys never enter the
    shuffle.

    A plain hash join under Zipf skew sends every row of the hottest key
    to ONE aggregator partition — that partition's memory and wall time
    bound the whole job.  Here a one-pass probe (:func:`hot_keys`) finds
    keys with global left-side share >= ``min_share``; the right side's
    rows for those keys are pulled and BROADCAST (fail-loud
    ``max_hot_build_rows`` cap — hot keys are few by definition and the
    right side is the lookup side), and the hot branch fans out map-side
    with full multi-match semantics (:class:`_BroadcastMultiProbe`).
    The cold branch is the ordinary hash-shuffle join against the
    hot-EXCLUDED right side.  Each left row lands in exactly one branch
    (the right side is partitioned by key), so ``union`` of the two
    branches IS the inner join — bit-identical rows to ``hash_join``,
    any order.

    ``right_value_cols``: the right-side columns to carry (the key
    column excluded) — also the output column-order contract: left
    columns first (original order), then ``right_value_cols``.  Left
    scans twice (once per branch) — the price of removing the skewed
    partition; at scale the stalled-straggler cost dominates a scan.

    Caveat: the cold branch is Ray's native hash join, which misbehaves
    when its right side ends up with near-empty hash partitions (the
    documented schema-less-finalize bug) — i.e. when nearly EVERY right
    key is hot.  That regime means the right side was broadcastable
    outright: use :func:`broadcast_join` (1:1) or raise ``min_share``."""
    import ray

    from . import cached_stage, concurrency_kwargs

    right_on = right_on or on
    hot = hot_keys(left, on, min_share=min_share, width=width, depth=depth)

    def _align(batch: pa.Table) -> pa.Table:
        keep = [c for c in batch.column_names
                if c not in right_value_cols] + list(right_value_cols)
        return batch.select(keep)

    if len(hot) == 0:
        return hash_join(left, right, on=on, right_on=right_on,
                         num_partitions=num_partitions).map_batches(
                             _align, batch_format="pyarrow")
    hot_ref = ray.put(hot)

    def _split(key_col: str, want_hot: bool):
        def f(batch: pa.Table) -> pa.Table:
            h = ray.get(hot_ref)
            col = batch.column(key_col)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            null_mask = np.zeros(len(col), dtype=bool)
            if col.null_count:
                null_mask = np.asarray(col.is_null())
                col = pc.fill_null(col, h[0].item()
                                   if hasattr(h[0], "item") else h[0])
            v = col.to_numpy(zero_copy_only=False)
            idx = np.searchsorted(h, v)
            idx[idx >= len(h)] = 0
            is_hot = (h[idx] == v) & ~null_mask
            # null keys never match an inner join: keep them OUT of the
            # cold shuffle too (they'd ship and drop at the join)
            keep = is_hot if want_hot else ~(is_hot | null_mask)
            return batch.filter(pa.array(keep))
        return f

    # hot build side: pulled once, capped fail-loud, broadcast sorted
    hot_right = (right.select_columns([right_on] + list(right_value_cols))
                 .map_batches(_split(right_on, True),
                              batch_format="pyarrow")
                 .materialize())
    n_hot = hot_right.count()
    if n_hot > max_hot_build_rows:
        raise ValueError(
            f"skew_join: hot-key build side has {n_hot} rows > "
            f"max_hot_build_rows={max_hot_build_rows} — the 'small' side "
            "of the hot keys is not small; raise the cap, raise "
            "min_share, or pre-aggregate the right side")
    batches = list(hot_right.iter_batches(batch_format="pyarrow"))
    build = (pa.concat_tables(batches) if batches
             else pa.Table.from_pylist(
                 [], schema=hot_right.schema().base_schema))
    bkeys = build.column(right_on).to_numpy(zero_copy_only=False)
    order = np.argsort(bkeys, kind="stable")
    values = {c: build.column(c).take(pa.array(order, pa.int64()))
              .combine_chunks()
              for c in right_value_cols}
    build_ref = ray.put((bkeys[order], values))

    hot_branch = left.map_batches(
        cached_stage(_BroadcastMultiProbe, ref=build_ref, probe_key=on,
                     out_cols=list(right_value_cols)),
        batch_format="pyarrow", **concurrency_kwargs(concurrency))
    # BOTH sides exclude hot keys before the exchange — a hot left row
    # entering the cold shuffle would recreate the straggler partition
    # this operator exists to remove (it would produce no output, but
    # its bytes still pin one aggregator)
    cold_left = left.map_batches(_split(on, False), batch_format="pyarrow")
    cold_right = right.map_batches(_split(right_on, False),
                                   batch_format="pyarrow")
    cold_branch = hash_join(cold_left, cold_right, on=on,
                            right_on=right_on,
                            num_partitions=num_partitions).map_batches(
                                _align, batch_format="pyarrow")
    return hot_branch.map_batches(
        _align, batch_format="pyarrow").union(cold_branch)


# ---------------------------------------------------------------------------
# schema-evolution union (multi-snapshot ingestion)
# ---------------------------------------------------------------------------


def union_by_name(datasets, schemas=None, promote: bool = True):
    """Union datasets whose schemas drifted across snapshots — column
    order differs, columns were added/dropped, numeric widths grew (the
    standard multi-year corpus ingestion problem; SQL's ``UNION ALL BY
    NAME``).

    Target schema = the name-union of all fields in first-seen order,
    types unified by ``pa.unify_schemas`` (``promote=True`` allows lossless
    widening like int32→int64; ``False`` requires identical types).  Each
    input gets ONE map-only pass that adds missing columns as typed
    nulls, casts, and reorders — then chained ``Dataset.union`` (zero
    movement: union in Ray Data concatenates block lists lazily).

    ``schemas``: pass explicit pyarrow schemas for transformed inputs —
    ``ds.schema()`` on a transformed dataset EXECUTES a probe pipeline
    (the asof_join/pagerank contract); for fresh ``read_parquet``
    datasets it is metadata-only and the default is fine."""
    datasets = list(datasets)
    if not datasets:
        raise ValueError("union_by_name: need at least one dataset")
    if schemas is None:
        schemas = [d.schema().base_schema for d in datasets]
    target = pa.unify_schemas(
        list(schemas),
        promote_options="permissive" if promote else "default")

    def aligner(sch):
        def align(batch: pa.Table) -> pa.Table:
            cols = []
            for f in sch:
                i = batch.schema.get_field_index(f.name)
                if i < 0:
                    cols.append(pa.nulls(batch.num_rows, f.type))
                else:
                    c = batch.column(i)
                    if isinstance(c, pa.ChunkedArray):
                        c = c.combine_chunks()
                    cols.append(c if c.type.equals(f.type)
                                else c.cast(f.type))
            return pa.Table.from_arrays(cols, schema=sch)
        return align

    aligned = [d.map_batches(aligner(target), batch_format="pyarrow")
               for d in datasets]
    out = aligned[0]
    for a in aligned[1:]:
        out = out.union(a)
    return out
