"""Windowed aggregates, sessionization, and as-of joins.

Operators the reference doesn't have (it is a pure function library,
SURVEY.md SS2.12) and Ray Data lacks natively — implemented as compositions of
``map_batches`` + ``groupby().map_groups`` per the custom-operator guidance:

  - tumbling_window: pc.floor_temporal per batch (embarrassingly parallel),
    then a grouped aggregate on (window, keys) — ONE shuffle on low-cardinality
    composite keys.
  - sessionize: hash groupby on the entity key; per-group vectorized gap
    detection (sort + diff + boundary scan), Arrow-native groups.
    Partitioning assumption: one entity's events fit in one group (true when
    per-entity volume << node memory; salt by time-range for pathological
    entities).
  - asof_join / range_join / rolling_aggregate: both sides tagged and
    unioned to an explicit COMMON Arrow schema (typed nulls on the absent
    side — no pandas upcast), ONE hash shuffle on ``hash(key) % num_buckets``
    (never ``groupby(raw key)``, whose per-distinct-key ``map_groups`` is one
    Python call per entity — the measured ~10-15s/1e5-key trap), then per
    bucket ONE Arrow sort by (key, ts, ...) and a fully vectorized
    run-boundary-masked pass across ALL keys at once (carry-forward indices
    for asof, per-run-rebased offset-trick searchsorted for range/rolling).
    Matched right values are attached with pc.take on null-masked indices so
    every output column keeps its exact input Arrow type.
    Partitioning assumption: one BUCKET (not one key) fits in memory; at
    10^12 rows raise num_buckets, or pre-bucket by (key, coarse time bucket).
"""

from __future__ import annotations

import logging
from typing import Any, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count

logger = logging.getLogger(__name__)


def _neq_adjacent(keys: np.ndarray) -> np.ndarray:
    """Elementwise ``keys[i] != keys[i-1]`` (length n-1), NULL-SAFE: a
    nullable NUMERIC key column reads as float NaN via to_numpy, and raw
    ``!=`` would split the null group into per-row runs (NaN != NaN);
    adjacent NaNs count as EQUAL so nulls form one group, matching SQL
    GROUP BY and the object-array (None) behavior of string keys."""
    neq = keys[1:] != keys[:-1]
    if keys.dtype.kind == "f":
        nn = np.isnan(keys)
        neq &= ~(nn[1:] & nn[:-1])
    return neq


def _key_runs(keys: np.ndarray) -> np.ndarray:
    """Boolean run-start mask over a sorted key array (nulls group last)."""
    n = len(keys)
    new = np.ones(n, dtype=bool)
    if n > 1:
        new[1:] = _neq_adjacent(keys)
    return new


def _ts_to_i64(col: "pa.ChunkedArray | pa.Array") -> "pa.ChunkedArray | pa.Array":
    """Lossless int64 view of an ordering column (timestamp or integer)."""
    if pa.types.is_timestamp(col.type) or pa.types.is_integer(col.type):
        return pc.cast(col, pa.int64())
    raise TypeError(
        f"ordering column must be timestamp or integer, got {col.type} "
        "(float ordering columns are out of contract for the bucketed "
        "exchange — quantize first)")


def _delta_to_i64(delta, ts_type: pa.DataType, what: str) -> int:
    """Convert a window bound (np.timedelta64 or plain number) to int64 in
    the ordering column's unit."""
    if isinstance(delta, np.timedelta64):
        if not pa.types.is_timestamp(ts_type):
            raise TypeError(f"{what}: timedelta bound on a non-timestamp "
                            f"ordering column ({ts_type})")
        return int(delta.astype(f"timedelta64[{ts_type.unit}]")
                   .astype(np.int64))
    as_int = int(delta)
    if as_int != delta:
        raise TypeError(f"{what}: numeric bounds must be integral for the "
                        f"int64 bucketed exchange, got {delta!r}")
    return as_int

__all__ = ["tumbling_window", "hopping_window", "sessionize", "asof_join",
           "range_join", "rolling_aggregate", "debounce", "funnel",
           "retention", "gap_fill", "ffill", "bfill", "ohlc",
           "interval_coverage"]


def tumbling_window(ds: Dataset, ts_col: str, minutes: int,
                    key_cols: list[str], aggs: list | None = None,
                    window_col: str = "window") -> Dataset:
    """Tumbling (fixed) time-window aggregate: count per (window, keys)."""

    def bucket(batch: pa.Table) -> pa.Table:
        w = pc.floor_temporal(batch.column(ts_col), multiple=minutes,
                              unit="minute")
        return batch.append_column(window_col, w)

    bucketed = ds.map_batches(bucket, batch_format="pyarrow")
    aggs = aggs or [Count(alias_name="n")]
    return bucketed.groupby([window_col, *key_cols]).aggregate(*aggs)


def hopping_window(ds: Dataset, ts_col: str, size_minutes: int,
                   hop_minutes: int, key_cols: list[str],
                   aggs: list | None = None,
                   window_col: str = "window") -> Dataset:
    """Hopping (sliding) window aggregate: windows of ``size_minutes`` every
    ``hop_minutes`` — each event flat-maps into size/hop overlapping
    windows (vectorized repeat + arithmetic, no per-row Python), then ONE
    grouped aggregate on (window_start, keys).

    ``size_minutes`` must be a multiple of ``hop_minutes`` (the standard
    hopping-window constraint; each event belongs to exactly size/hop
    windows).  Window label = the window's START timestamp.
    """
    if size_minutes % hop_minutes:
        raise ValueError("size_minutes must be a multiple of hop_minutes")
    k = size_minutes // hop_minutes

    def explode(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col)
        # pure pc kernels: nulls propagate into a null window group (same as
        # SQL time_bucket(NULL)), timezone-aware timestamps floor in local
        # time and KEEP their tz — identical semantics to tumbling_window
        base = pc.floor_temporal(ts, multiple=hop_minutes, unit="minute")
        unit = base.type.unit
        scale = {"s": 1, "ms": 1_000, "us": 1_000_000,
                 "ns": 1_000_000_000}[unit]
        parts = []
        for j in range(k):
            delta = pa.scalar(j * hop_minutes * 60 * scale,
                              type=pa.duration(unit))
            w = pc.subtract(base, delta)
            # full batch rides along, so arbitrary aggs over value columns
            # work (the k-fold payload duplication is inherent to hopping)
            parts.append(batch.append_column(window_col, w))
        return pa.concat_tables(parts)

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    aggs = aggs or [Count(alias_name="n")]
    return exploded.groupby([window_col, *key_cols]).aggregate(*aggs)


def sessionize(ds: Dataset, key: str, ts_col: str, gap_minutes: int,
               session_col: str = "session_id",
               num_buckets: int = 64,
               num_partitions: int | None = None) -> Dataset:
    """Session windows: a new session starts when the gap to the previous
    event of the same ``key`` exceeds ``gap_minutes``.

    Returns per-session summaries: (key, session_id, n_events, session_start).
    Session ids are 1-based in time order per key (deterministic).

    Scale shape (the lag_lead exchange): shuffle on ``hash(key) %
    num_buckets`` — NOT the raw key, whose per-entity ``map_groups`` means
    one Python call per user at corpus scale — then per bucket ONE Arrow
    sort by (key, ts) and a fully vectorized boundary scan across ALL
    keys at once (a key change or a gap > threshold starts a session;
    ids rebase per key run).  Only (key, ts) shuffles.
    """
    from ..state.sketches import hash64

    gap = np.timedelta64(gap_minutes * 60, "s")
    bucket_col = "__sessbucket__"
    if num_partitions is None:
        num_partitions = min(num_buckets, 64)

    def bucketize(batch: pa.Table) -> pa.Table:
        h = hash64(batch.column(key), seed=47) % np.uint64(num_buckets)
        return batch.append_column(
            bucket_col, pa.array(h.astype(np.int64), type=pa.int64()))

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.sort_by([(key, "ascending"), (ts_col, "ascending")])
        keys = g.column(key).to_numpy(zero_copy_only=False)
        ts = g.column(ts_col).to_numpy(zero_copy_only=False)
        n = len(keys)
        if n == 0:
            return pa.table({
                key: pa.array([], type=g.schema.field(key).type),
                session_col: pa.array([], type=pa.int64()),
                "n_events": pa.array([], type=pa.int64()),
                "session_start": pa.array(
                    [], type=g.schema.field(ts_col).type)})
        new_key = _key_runs(keys)
        new_session = new_key.copy()
        if n > 1:
            new_session[1:] |= np.diff(ts) > gap
        starts = np.flatnonzero(new_session)
        counts = np.diff(np.append(starts, n)).astype(np.int64)
        # 1-based session index, rebased at every key run start
        sess_no = np.cumsum(new_session)[starts]
        key_first_sess = sess_no[new_key[starts]]
        rebase = np.repeat(key_first_sess,
                           np.diff(np.append(
                               np.flatnonzero(new_key[starts]),
                               len(starts))))
        take_starts = pa.array(starts, type=pa.int64())
        return pa.table({
            key: pc.take(g.column(key), take_starts),
            session_col: pa.array(sess_no - rebase + 1),
            "n_events": pa.array(counts),
            "session_start": pc.take(g.column(ts_col), take_starts),
        })

    return (ds.select_columns([key, ts_col])
            .map_batches(bucketize, batch_format="pyarrow")
            .groupby(bucket_col, num_partitions=num_partitions)
            .map_groups(per_bucket, batch_format="pyarrow"))


def asof_join(left: Dataset, right: Dataset, key: str,
              left_ts: str, right_ts: str,
              right_cols: list[str], suffix: str = "_right",
              strict: bool = True,
              left_schema: "pa.Schema | None" = None,
              right_schema: "pa.Schema | None" = None,
              num_buckets: int = 64,
              num_partitions: int | None = None) -> Dataset:
    """For each left row, attach the right row with the greatest
    ``right_ts`` <= left_ts (``<`` when strict) within the same ``key``.

    Left rows with no match keep null right columns. Ties on right_ts break
    to the LAST row in (right_ts, right_cols) sort order (deterministic).

    Pass ``left_schema`` / ``right_schema`` (plain Arrow schemas) when known
    statically: ``Dataset.schema()`` on a side that already has transforms
    applied EXECUTES a limit-1 pipeline just to learn dtypes — a whole extra
    Ray execution per call that the caller can usually provide for free
    (e.g. from ``pyarrow.parquet.read_schema`` file metadata).

    Scale shape (the lag_lead exchange, NOT ``groupby(key)``): both tagged
    sides shuffle ONCE on ``hash(key) % num_buckets``; per bucket one Arrow
    sort by (key, coalesced ts, side order, right tiebreakers) followed by a
    single vectorized carry-forward of right-row indices
    (``np.maximum.accumulate`` rebased at key-run starts — the ffill kernel),
    so the whole bucket is one Python call regardless of key count.  Side
    order encodes strictness: at equal timestamps the right row sorts before
    the left row iff it is eligible (non-strict).  Both ts columns must be
    mutually comparable (right ts is cast to the left ts type for the
    coalesced sort column).
    """
    right_renamed = {c: (c + suffix if c != key else c) for c in
                     [key, right_ts, *right_cols]}
    rts = right_renamed[right_ts]
    rvals = [right_renamed[c] for c in right_cols]

    # Explicit common union schema: left columns + renamed right columns +
    # side tag.  Each side fills the other's columns with TYPED nulls so the
    # union never null-fills/upcasts (Arrow int64-with-nulls stays int64).
    l_schema: pa.Schema = (left_schema if left_schema is not None
                           else left.schema().base_schema)
    r_schema: pa.Schema = (right_schema if right_schema is not None
                           else right.schema().base_schema)
    left_names = list(l_schema.names)
    r_types = {right_renamed[c]: r_schema.field(c).type
               for c in [right_ts, *right_cols]}
    from ..state.sketches import hash64

    t_type = l_schema.field(left_ts).type
    bucket_col = "__asofbkt__"
    if num_partitions is None:
        num_partitions = min(num_buckets, 64)
    # at equal timestamps: right eligible (sorts first) iff non-strict
    l_ord, r_ord = (0, 1) if strict else (1, 0)

    def prep_left(batch: pa.Table) -> pa.Table:
        cols = {c: batch.column(c) for c in left_names}
        for c in (rts, *rvals):
            cols[c] = pa.nulls(batch.num_rows, type=r_types[c])
        cols["__t__"] = batch.column(left_ts)
        cols["__ord__"] = pa.array(
            np.full(batch.num_rows, l_ord, dtype=np.int8), type=pa.int8())
        h = hash64(batch.column(key), seed=53) % np.uint64(num_buckets)
        cols[bucket_col] = pa.array(h.astype(np.int64), type=pa.int64())
        return pa.table(cols)

    def prep_right(batch: pa.Table) -> pa.Table:
        cols = {}
        for c in left_names:
            if c == key:
                cols[c] = batch.column(key)
            else:
                cols[c] = pa.nulls(batch.num_rows, type=l_schema.field(c).type)
        cols[rts] = batch.column(right_ts)
        for c in right_cols:
            cols[right_renamed[c]] = batch.column(c)
        cols["__t__"] = pc.cast(batch.column(right_ts), t_type)
        cols["__ord__"] = pa.array(
            np.full(batch.num_rows, r_ord, dtype=np.int8), type=pa.int8())
        h = hash64(batch.column(key), seed=53) % np.uint64(num_buckets)
        cols[bucket_col] = pa.array(h.astype(np.int64), type=pa.int64())
        return pa.table(cols)

    l_tagged = left.map_batches(prep_left, batch_format="pyarrow")
    r_tagged = right.map_batches(prep_right, batch_format="pyarrow")
    unioned = l_tagged.union(r_tagged)
    out_left = [c for c in left_names]
    is_right_ord = r_ord  # __ord__ value marking right rows

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.sort_by([(key, "ascending"), ("__t__", "ascending"),
                       ("__ord__", "ascending"),
                       *[(c, "ascending") for c in rvals]])
        n = g.num_rows
        ordv = g.column("__ord__").to_numpy(zero_copy_only=False)
        is_r = ordv == is_right_ord
        idx = np.arange(n, dtype=np.int64)
        # carry-forward: index of the most recent right row at-or-before
        # this position, rebased so a carry never crosses a key run
        src = np.maximum.accumulate(np.where(is_r, idx, -1))
        keys_np = g.column(key).to_numpy(zero_copy_only=False)
        new_key = _key_runs(keys_np)
        run_start = idx[new_key][np.cumsum(new_key) - 1] if n else idx
        src = np.where(src >= run_start, src, -1)
        l_pos = np.flatnonzero(~is_r)
        match = src[l_pos]
        l_take = pa.array(l_pos, type=pa.int64())
        cols = {c: pc.take(g.column(c), l_take) for c in out_left}
        # null-masked take: unmatched rows get typed nulls, matched rows the
        # right value with its original Arrow type (no float upcast)
        take_idx = pa.array(np.where(match < 0, 0, match),
                            type=pa.int64(), mask=(match < 0))
        cols[rts] = pc.take(g.column(rts), take_idx)
        for c in rvals:
            cols[c] = pc.take(g.column(c), take_idx)
        return pa.table(cols)

    return (unioned.groupby(bucket_col, num_partitions=num_partitions)
            .map_groups(per_bucket, batch_format="pyarrow"))


def range_join(left: Dataset, right: Dataset, key: str,
               left_ts: str, right_ts: str,
               right_cols: list[str],
               lower, upper,
               suffix: str = "_right",
               lower_inclusive: bool = True,
               upper_inclusive: bool = True,
               left_schema: "pa.Schema | None" = None,
               right_schema: "pa.Schema | None" = None,
               num_buckets: int = 64,
               num_partitions: int | None = None) -> Dataset:
    """Interval (range) join: for each left row, ALL right rows of the same
    ``key`` with ``right_ts`` in ``[left_ts + lower, left_ts + upper]``
    (bounds open when the matching ``*_inclusive`` is False).  Inner-join
    semantics: left rows with no right match emit nothing.

    ``lower``/``upper`` are ``np.timedelta64`` for timestamp columns, plain
    integers for integer ones (the ordering column must be timestamp or
    integer — the exchange works in an exact int64 domain).

    Scale shape (same bucketed exchange as :func:`asof_join`, never
    ``groupby(raw key)``): tagged sides shuffle ONCE on ``hash(key) %
    num_buckets``; per bucket one Arrow sort by (key, ts), then BOTH probes
    run vectorized across ALL keys at once via the per-run-rebased offset
    trick (``combined = run_id * BIG + (ts - run_min)``, globally sorted, so
    two ``np.searchsorted`` calls bound every left row's window) + one flat
    expansion.  Falls back to a per-run scan (logged) iff ``runs x span``
    would overflow int64.  Output row count is the true join cardinality
    (bound ``upper - lower`` to bound it)."""
    right_renamed = {c: (c + suffix if c != key else c) for c in
                     [key, right_ts, *right_cols]}
    rts = right_renamed[right_ts]
    rvals = [right_renamed[c] for c in right_cols]

    l_schema: pa.Schema = (left_schema if left_schema is not None
                           else left.schema().base_schema)
    r_schema: pa.Schema = (right_schema if right_schema is not None
                           else right.schema().base_schema)
    left_names = list(l_schema.names)
    r_types = {right_renamed[c]: r_schema.field(c).type
               for c in [right_ts, *right_cols]}
    from ..state.sketches import hash64

    t_type = l_schema.field(left_ts).type
    lower_i = _delta_to_i64(lower, t_type, "range_join lower")
    upper_i = _delta_to_i64(upper, t_type, "range_join upper")
    bucket_col = "__rngbkt__"
    if num_partitions is None:
        num_partitions = min(num_buckets, 64)

    def prep_left(batch: pa.Table) -> pa.Table:
        cols = {c: batch.column(c) for c in left_names}
        for c in (rts, *rvals):
            cols[c] = pa.nulls(batch.num_rows, type=r_types[c])
        cols["__t__"] = _ts_to_i64(batch.column(left_ts))
        cols["__side__"] = pa.array(
            np.zeros(batch.num_rows, dtype=np.int8), type=pa.int8())
        h = hash64(batch.column(key), seed=53) % np.uint64(num_buckets)
        cols[bucket_col] = pa.array(h.astype(np.int64), type=pa.int64())
        return pa.table(cols)

    def prep_right(batch: pa.Table) -> pa.Table:
        cols = {}
        for c in left_names:
            if c == key:
                cols[c] = batch.column(key)
            else:
                cols[c] = pa.nulls(batch.num_rows,
                                   type=l_schema.field(c).type)
        cols[rts] = batch.column(right_ts)
        for c in right_cols:
            cols[right_renamed[c]] = batch.column(c)
        cols["__t__"] = _ts_to_i64(batch.column(right_ts))
        cols["__side__"] = pa.array(
            np.ones(batch.num_rows, dtype=np.int8), type=pa.int8())
        h = hash64(batch.column(key), seed=53) % np.uint64(num_buckets)
        cols[bucket_col] = pa.array(h.astype(np.int64), type=pa.int64())
        return pa.table(cols)

    unioned = (left.map_batches(prep_left, batch_format="pyarrow")
               .union(right.map_batches(prep_right,
                                        batch_format="pyarrow")))
    out_left = list(left_names)
    lo_side = "left" if lower_inclusive else "right"
    hi_side = "right" if upper_inclusive else "left"

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.sort_by([(key, "ascending"), ("__t__", "ascending")])
        n = g.num_rows
        empty = {**{c: g.column(c).slice(0, 0) for c in out_left},
                 rts: pa.nulls(0, type=r_types[rts]),
                 **{c: pa.nulls(0, type=r_types[c]) for c in rvals}}
        if n == 0:
            return pa.table(empty)
        side = g.column("__side__").to_numpy(zero_copy_only=False)
        tv = g.column("__t__").to_numpy(zero_copy_only=False)
        keys_np = g.column(key).to_numpy(zero_copy_only=False)
        new_key = _key_runs(keys_np)
        run_id = np.cumsum(new_key) - 1
        # rebase per key run so the offset trick stays inside int64
        base = tv[new_key][run_id]
        t_rel = tv - base
        r_pos = np.flatnonzero(side == 1)
        l_pos = np.flatnonzero(side == 0)
        if len(r_pos) == 0 or len(l_pos) == 0:
            return pa.table(empty)
        span = int(t_rel.max())
        big = span + 3
        n_runs = int(run_id[-1]) + 1
        l_run, r_run = run_id[l_pos], run_id[r_pos]
        qlo = np.clip(t_rel[l_pos] + lower_i, -1, span + 1)
        qhi = np.clip(t_rel[l_pos] + upper_i, -1, span + 1)
        if n_runs * big < (1 << 62):
            combined_r = r_run * big + t_rel[r_pos]
            lo = np.searchsorted(combined_r, l_run * big + qlo,
                                 side=lo_side)
            hi = np.searchsorted(combined_r, l_run * big + qhi,
                                 side=hi_side)
        else:  # pragma: no cover - 2^62 span x run product
            logger.warning("range_join: offset trick would overflow "
                           "(%d runs x %d span); per-run scan",
                           n_runs, span)
            rv = t_rel[r_pos]
            seg_lo = np.searchsorted(r_run, l_run, side="left")
            seg_hi = np.searchsorted(r_run, l_run, side="right")
            lo = np.empty(len(l_pos), dtype=np.int64)
            hi = np.empty(len(l_pos), dtype=np.int64)
            for i in range(len(l_pos)):
                a, b = seg_lo[i], seg_hi[i]
                lo[i] = a + np.searchsorted(rv[a:b], qlo[i], side=lo_side)
                hi[i] = a + np.searchsorted(rv[a:b], qhi[i], side=hi_side)
        counts = np.maximum(hi - lo, 0)
        total = int(counts.sum())
        if total == 0:
            return pa.table(empty)
        l_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        r_idx = (np.arange(total, dtype=np.int64)
                 - np.repeat(np.cumsum(counts) - counts, counts)
                 + np.repeat(lo, counts))
        l_take = pa.array(l_pos[l_idx], type=pa.int64())
        r_take = pa.array(r_pos[r_idx], type=pa.int64())
        cols = {c: pc.take(g.column(c), l_take) for c in out_left}
        cols[rts] = pc.take(g.column(rts), r_take)
        for c in rvals:
            cols[c] = pc.take(g.column(c), r_take)
        return pa.table(cols)

    return (unioned.groupby(bucket_col, num_partitions=num_partitions)
            .map_groups(per_bucket, batch_format="pyarrow"))


def rolling_aggregate(ds: Dataset, key: str, ts_col: str, value_col: str,
                      preceding,
                      sum_col: str = "rolling_sum",
                      count_col: str = "rolling_count",
                      num_buckets: int = 64,
                      num_partitions: int | None = None) -> Dataset:
    """Per-key rolling RANGE-frame aggregate: every row gets the count and
    sum of ``value_col`` over rows of the SAME ``key`` whose ``ts_col`` lies
    in ``[ts - preceding, ts]`` (both ends inclusive) — exactly SQL's
    ``... OVER (PARTITION BY key ORDER BY ts
    RANGE BETWEEN <preceding> PRECEDING AND CURRENT ROW)`` including the
    peers-of-equal-ts rule (rows sharing a timestamp share a frame).

    ``preceding`` is ``np.timedelta64`` for timestamp columns, a plain
    integer for integer ordering columns (the exchange works in an exact
    int64 domain).

    Scale shape (the lag_lead exchange, NOT ``groupby(raw key)``): project
    to the needed columns FIRST, ONE shuffle on ``hash(key) % num_buckets``,
    then per bucket a single Arrow sort by (key, ts) + two vectorized
    ``searchsorted`` probes over ALL keys at once (per-run-rebased offset
    trick: ``combined = run_id * BIG + (ts - run_min)`` is globally sorted
    and frame bounds never cross a key run) + one cumulative sum — one
    Python call per BUCKET regardless of key count.  Frame sums are
    prefix-sum differences: exact for integer ``value_col`` (use an
    int-cents cast for currency floats), last-ulp-approximate for floats.

    Reference: no analogue (malli is per-value, SURVEY.md SS2.12); this is
    the brief's "windowed aggregate" custom-operator slot.
    """
    from ..state.sketches import hash64

    bucket_col = "__rollbkt__"
    if num_partitions is None:
        num_partitions = min(num_buckets, 64)

    def bucketize(batch: pa.Table) -> pa.Table:
        h = hash64(batch.column(key), seed=53) % np.uint64(num_buckets)
        return (batch
                .append_column("__t__", _ts_to_i64(batch.column(ts_col)))
                .append_column(bucket_col,
                               pa.array(h.astype(np.int64),
                                        type=pa.int64())))

    prec_holder: dict[str, int] = {}

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.sort_by([(key, "ascending"), ("__t__", "ascending")])
        n = g.num_rows
        if n == 0:
            # typed empty result: csum over an empty numpy array would
            # silently produce float64 and split the output schema
            vt = g.schema.field(value_col).type
            st = pa.int64() if pa.types.is_integer(vt) else pa.float64()
            return (g.drop_columns(["__t__", bucket_col])
                     .append_column(count_col, pa.array([], type=pa.int64()))
                     .append_column(sum_col, pa.array([], type=st)))
        if "prec" not in prec_holder:
            prec_holder["prec"] = _delta_to_i64(
                preceding, g.schema.field(ts_col).type,
                "rolling_aggregate preceding")
        prec = prec_holder["prec"]
        tv = g.column("__t__").to_numpy(zero_copy_only=False)
        keys_np = g.column(key).to_numpy(zero_copy_only=False)
        new_key = _key_runs(keys_np)
        run_id = np.cumsum(new_key) - 1
        base = tv[new_key][run_id]
        t_rel = tv - base
        span = int(t_rel.max())
        big = span + 2
        n_runs = int(run_id[-1]) + 1
        if n_runs * big < (1 << 62):
            combined = run_id * big + t_rel
            # frame start clamps at the run's own origin (t_rel >= 0), so
            # a window reaching before the run never crosses into it
            lo = np.searchsorted(combined,
                                 run_id * big + np.maximum(t_rel - prec, 0),
                                 side="left")
            hi = np.searchsorted(combined, combined, side="right")
        else:  # pragma: no cover - 2^62 span x run product
            logger.warning("rolling_aggregate: offset trick would overflow "
                           "(%d runs x %d span); per-run scan",
                           n_runs, span)
            lo = np.empty(n, dtype=np.int64)
            hi = np.empty(n, dtype=np.int64)
            starts = np.flatnonzero(new_key)
            ends = np.append(starts[1:], n)
            for a, b in zip(starts, ends):
                lo[a:b] = a + np.searchsorted(t_rel[a:b], t_rel[a:b] - prec,
                                              side="left")
                hi[a:b] = a + np.searchsorted(t_rel[a:b], t_rel[a:b],
                                              side="right")
        v = g.column(value_col).to_numpy(zero_copy_only=False)
        csum = np.concatenate(([0], np.cumsum(v)))
        return (g.drop_columns(["__t__", bucket_col])
                 .append_column(count_col,
                                pa.array(hi - lo, type=pa.int64()))
                 .append_column(sum_col, pa.array(csum[hi] - csum[lo])))

    return (ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby(bucket_col, num_partitions=num_partitions)
            .map_groups(per_bucket, batch_format="pyarrow"))


def debounce(ds: Dataset, keys, ts_col: str, seconds: float,
             tie_col: str | None = None, num_buckets: int = 64,
             num_partitions: int | None = None) -> Dataset:
    """Windowed event dedup (ingest debounce): drop a row when the
    PREVIOUS row with the same ``keys`` is within ``seconds`` of it —
    SQL ``LAG(ts) OVER (PARTITION BY keys ORDER BY ts, tie)`` then
    ``WHERE prev IS NULL OR ts - prev > seconds``.  The reference point
    is the previous EVENT (kept or not), which keeps the filter
    vectorizable and deterministic; chain-based throttling (reference =
    previous KEPT event) is inherently sequential per key — compose
    ``sessionize`` + first-per-session for that semantics.

    Scale shape: the ``lag_lead`` exchange — ONE groupby on
    ``hash(first key) % num_buckets`` (evenly-sized buckets under key
    skew), per bucket one Arrow multi-column sort + a vectorized
    run-boundary-masked previous-timestamp compare.  Equal timestamps
    are always dropped as repeats (ts - prev = 0 <= seconds); pass
    ``tie_col`` (a unique id) to make which copy survives
    deterministic."""
    from ..state.sketches import hash64

    if isinstance(keys, str):
        keys = [keys]
    order = [ts_col] + ([tie_col] if tie_col else [])
    spec = [*[(k, "ascending") for k in keys],
            *[(c, "ascending") for c in order]]
    bucket_col = "__debounce__"

    def bucketize(batch: pa.Table) -> pa.Table:
        h = hash64(batch.column(keys[0]), seed=11) % np.uint64(num_buckets)
        return batch.append_column(
            bucket_col, pa.array(h.astype(np.int64), type=pa.int64()))

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.sort_by(spec)
        n = g.num_rows
        new_run = np.ones(n, dtype=bool)
        for k in keys:
            v = g.column(k).to_numpy(zero_copy_only=False)
            changed = np.ones(n, dtype=bool)
            changed[1:] = v[1:] != v[:-1]
            if k == keys[0]:
                new_run = changed
            else:
                new_run |= changed
        ts = g.column(ts_col)
        if pa.types.is_timestamp(ts.type):
            tv = pc.cast(ts, pa.int64()).to_numpy(zero_copy_only=False)
            gap = int(round(seconds * {"s": 1, "ms": 1_000,
                                       "us": 1_000_000,
                                       "ns": 1_000_000_000}[ts.type.unit]))
        else:
            tv = ts.to_numpy(zero_copy_only=False)
            gap = seconds
        # keep = starts a new key run OR the in-run gap exceeds the window
        keep = new_run.copy()
        keep[1:] |= (tv[1:] - tv[:-1]) > gap
        return g.filter(pa.array(keep)).drop_columns([bucket_col])

    return (ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby(bucket_col, num_partitions=num_partitions)
            .map_groups(per_bucket, batch_format="pyarrow"))


def funnel(ds: Dataset, user_col: str, ts_col: str, type_col: str,
           steps: "list[str]", within_s: float | None = None,
           tie_col: str | None = None, num_buckets: int = 64,
           num_partitions: int | None = None) -> Dataset:
    """Ordered funnel analysis: for every user, the EARLIEST event chain
    matching ``steps`` in order — step k matches the first event of its
    type strictly after step k-1's match (and, with ``within_s``, within
    the window of step 1's match: the ClickHouse ``windowFunnel``
    convention).  Emits one row per user: ``step{i}_ts`` timestamps
    (null once the chain breaks), ``steps_completed`` and ``converted``.

    Earliest-match semantics is the standard funnel definition and what
    the SQL oracle (nested min-after-previous joins) computes; it is not
    maximal matching — a later step-1 event that would admit a longer
    chain inside the window is not explored.

    Scale shape: ONE exchange on ``hash(user) % num_buckets``; per
    bucket one Arrow sort by (user, ts, tie), then per STEP a single
    vectorized masked segmented-min (``np.minimum.reduceat`` — min is
    associative, so block order is irrelevant) over all users at once.
    K steps = K vector passes, no per-user Python at any scale."""
    from ..state.sketches import hash64

    if not steps:
        raise ValueError("funnel: steps must be non-empty")
    spec = [(user_col, "ascending"), (ts_col, "ascending"),
            *([(tie_col, "ascending")] if tie_col else [])]
    bucket_col = "__funnel__"

    def bucketize(batch: pa.Table) -> pa.Table:
        h = hash64(batch.column(user_col), seed=11) % np.uint64(num_buckets)
        return batch.append_column(
            bucket_col, pa.array(h.astype(np.int64), type=pa.int64()))

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.sort_by(spec)
        users = g.column(user_col).to_numpy(zero_copy_only=False)
        n = len(users)
        new = _key_runs(users)
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, n))
        nruns = len(starts)
        run_id = np.repeat(np.arange(nruns, dtype=np.int64), lens)
        ts = g.column(ts_col)
        ts_type = ts.type
        if pa.types.is_timestamp(ts_type):
            tv = pc.cast(ts, pa.int64()).to_numpy(zero_copy_only=False)
            unit = {"s": 1, "ms": 1_000, "us": 1_000_000,
                    "ns": 1_000_000_000}[ts_type.unit]
            win = (int(round(within_s * unit))
                   if within_s is not None else None)
        else:
            tv = ts.to_numpy(zero_copy_only=False)
            win = within_s
        types = g.column(type_col).to_numpy(zero_copy_only=False)
        INF = np.iinfo(np.int64).max
        NEG = np.iinfo(np.int64).min
        t_prev = np.full(nruns, NEG, dtype=np.int64)
        t0 = None
        step_ts = []
        for k, step in enumerate(steps):
            ok = (types == step) & (tv > t_prev[run_id])
            if k > 0 and win is not None:
                # clamp so INF (chain already broken) never overflows;
                # those rows are excluded by the t_prev condition anyway
                lim = np.minimum(t0[run_id], INF - win - 1) + win
                ok &= tv <= lim
            cand = np.where(ok, tv, INF)
            tk = np.minimum.reduceat(cand, starts)
            step_ts.append(tk)
            if k == 0:
                t0 = tk
            t_prev = tk
        completed = np.zeros(nruns, dtype=np.int64)
        for tk in step_ts:
            completed += (tk != INF)
        cols = {user_col: pc.take(g.column(user_col),
                                  pa.array(starts, pa.int64()))}
        for i, tk in enumerate(step_ts, 1):
            arr = pa.array(tk, type=pa.int64(), mask=(tk == INF))
            if pa.types.is_timestamp(ts_type):
                arr = arr.cast(ts_type)
            cols[f"step{i}_ts"] = arr
        cols["steps_completed"] = pa.array(completed, pa.int64())
        cols["converted"] = pa.array(completed == len(steps))
        return pa.table(cols)

    return (ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby(bucket_col, num_partitions=num_partitions)
            .map_groups(per_bucket, batch_format="pyarrow"))


def retention(ds: Dataset, user_col: str, ts_col: str,
              period: str = "week", num_buckets: int = 64,
              num_partitions: int | None = None) -> Dataset:
    """Cohort retention matrix: users are cohorted by the period (ISO
    week or day) of their FIRST event; for every (cohort, period
    offset) the output counts distinct users active in that period —
    the standard retention triangle.

    Scale shape: ONE exchange on ``hash(user) % num_buckets``; per
    bucket one sort by (user, ts) gives each user's first event and,
    because period offsets are monotone in ts, the distinct
    (user, offset) pairs fall out of a single boundary scan — only one
    row per user-active-period reaches the final tiny
    (cohort, offset) count groupby.  No per-user Python."""
    from ..state.sketches import hash64

    if period not in ("week", "day"):
        raise ValueError(f"retention: unsupported period {period!r}")
    bucket_col = "__cohort__"

    def bucketize(batch: pa.Table) -> pa.Table:
        h = hash64(batch.column(user_col), seed=11) % np.uint64(num_buckets)
        return batch.append_column(
            bucket_col, pa.array(h.astype(np.int64), type=pa.int64()))

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.sort_by([(user_col, "ascending"), (ts_col, "ascending")])
        users = g.column(user_col).to_numpy(zero_copy_only=False)
        n = len(users)
        new_run = _key_runs(users)
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.append(starts, n))
        pw = pc.floor_temporal(g.column(ts_col), unit=period)
        unit = pw.type.unit
        scale = {"s": 1, "ms": 1_000, "us": 1_000_000,
                 "ns": 1_000_000_000}[unit]
        plen = (7 if period == "week" else 1) * 86400 * scale
        wv = pc.cast(pw, pa.int64()).to_numpy(zero_copy_only=False)
        cohort = np.repeat(wv[starts], lens)     # first period per user
        offset = (wv - cohort) // plen
        # offsets are monotone within a sorted run: distinct
        # (user, offset) = run start OR offset change
        keep = new_run.copy()
        keep[1:] |= offset[1:] != offset[:-1]
        return pa.table({
            f"cohort_{period}": pa.array(cohort[keep],
                                         pa.int64()).cast(pw.type),
            f"{period}_offset": pa.array(offset[keep], pa.int64())})

    pairs = (ds.select_columns([user_col, ts_col])
             .map_batches(bucketize, batch_format="pyarrow")
             .groupby(bucket_col, num_partitions=num_partitions)
             .map_groups(per_bucket, batch_format="pyarrow"))
    return (pairs.groupby([f"cohort_{period}", f"{period}_offset"])
            .aggregate(Count(alias_name="n_users")))


def gap_fill(ds: Dataset, key: str, bucket_column: str, value_column: str,
             fill_value: int = 0, num_buckets: int = 64,
             num_partitions: int | None = None,
             max_rows_per_key: int = 1_000_000) -> Dataset:
    """Densify a per-key integer-bucket series: emit one row per key per
    bucket in ``[min(bucket), max(bucket)]`` (per key), with
    ``fill_value`` where the input has no row — the time-series gap-fill
    that turns sparse per-hour/per-day aggregates into dense training /
    charting series (SQL: per-key ``generate_series`` LEFT JOIN +
    ``coalesce``).  ``bucket_column`` must be int64 (epoch-hour, day
    index, ...); at most one input row per (key, bucket) — duplicates
    raise (aggregate first).

    Scale shape: ONE bucketed exchange on ``hash(key)`` over the
    already-aggregated (key, bucket, value) rows, then a fully vectorized
    per-bucket expansion (run scan + repeat/arange + one scatter — no
    per-key Python).  A key whose bucket span exceeds
    ``max_rows_per_key`` raises instead of silently exploding the
    output (a sparse key with a decade-wide span is almost always an
    upstream bug)."""
    from ..state.sketches import hash64

    if num_partitions is None:
        num_partitions = min(num_buckets, 64)
    bcol = "__gapbucket__"

    def bucketize(batch: pa.Table) -> pa.Table:
        h = hash64(batch.column(key), seed=29) % np.uint64(num_buckets)
        return batch.append_column(
            bcol, pa.array(h.astype(np.int64), type=pa.int64()))

    def per_bucket(g: pa.Table) -> pa.Table:
        out_schema = pa.schema([
            g.schema.field(key),
            pa.field(bucket_column, pa.int64()),
            g.schema.field(value_column)])
        if g.num_rows == 0:
            return out_schema.empty_table()
        g = g.sort_by([(key, "ascending"), (bucket_column, "ascending")])
        keys = g.column(key).to_numpy(zero_copy_only=False)
        b = g.column(bucket_column).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n = len(keys)
        new = _key_runs(keys)
        if not np.all(new | np.concatenate(([True], b[1:] != b[:-1]))):
            raise ValueError(
                "gap_fill: duplicate (key, bucket) rows — aggregate first")
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, n))
        mins = b[starts]
        maxs = b[starts + lens - 1]
        spans = maxs - mins + 1
        if spans.max(initial=0) > max_rows_per_key:
            raise ValueError(
                f"gap_fill: a key spans {int(spans.max())} buckets > "
                f"max_rows_per_key={max_rows_per_key}")
        total = int(spans.sum())
        run_of_out = np.repeat(np.arange(len(starts), dtype=np.int64),
                               spans)
        out_starts = np.cumsum(spans) - spans
        offs = np.arange(total, dtype=np.int64) - out_starts[run_of_out]
        out_b = mins[run_of_out] + offs
        vals = g.column(value_column).to_numpy(zero_copy_only=False)
        out_vals = np.full(total, fill_value,
                           dtype=np.asarray(vals).dtype)
        run_of_in = np.cumsum(new) - 1
        out_vals[out_starts[run_of_in] + (b - mins[run_of_in])] = vals
        key_take = pa.array(starts[run_of_out], type=pa.int64())
        return pa.table({
            key: pc.take(g.column(key), key_take),
            bucket_column: pa.array(out_b),
            value_column: pa.array(out_vals)})

    return (ds.select_columns([key, bucket_column, value_column])
            .map_batches(bucketize, batch_format="pyarrow")
            .groupby(bcol, num_partitions=num_partitions)
            .map_groups(per_bucket, batch_format="pyarrow"))


def ffill(ds: Dataset, key: str, order_by, value_col: str,
          out: str | None = None, num_buckets: int = 64,
          num_partitions: int | None = None) -> Dataset:
    """Last-observation-carried-forward per key: SQL ``LAST_VALUE(value
    IGNORE NULLS) OVER (PARTITION BY key ORDER BY order_by ROWS UNBOUNDED
    PRECEDING)`` — the sensor-gap / sparse-feature fill that turns
    event-sourced nulls into dense series.  Values are MOVED verbatim
    (``pc.take``), so types and float bit-patterns are preserved; leading
    nulls (no prior observation in the key) stay null.

    Scale shape (the lag_lead exchange): shuffle on ``hash(key) %
    num_buckets`` for evenly-sized groups, then per bucket ONE Arrow
    multi-column sort + a fully vectorized carry — the index of the most
    recent non-null row via ``np.maximum.accumulate``, rebased per key
    run so a carry never crosses keys.  No per-key Python at any scale."""
    from ..state.sketches import hash64

    if isinstance(order_by, str):
        order_by = [order_by]
    out_name = out or f"{value_col}_ffill"
    spec = [(key, "ascending"), *[(c, "ascending") for c in order_by]]
    bucket_col = "__ffbucket__"
    if num_partitions is None:
        num_partitions = min(num_buckets, 64)

    def bucketize(batch: pa.Table) -> pa.Table:
        h = hash64(batch.column(key), seed=41) % np.uint64(num_buckets)
        return batch.append_column(
            bucket_col, pa.array(h.astype(np.int64), type=pa.int64()))

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.sort_by(spec)
        vals = g.column(value_col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        keys = g.column(key).to_numpy(zero_copy_only=False)
        n = len(keys)
        idx = np.arange(n, dtype=np.int64)
        valid = np.asarray(pc.is_valid(vals))
        # most recent valid index at-or-before each row, then rebased so a
        # carry never crosses into the previous key's run
        src = np.maximum.accumulate(np.where(valid, idx, -1))
        new_key = (_key_runs(keys) if n
                   else np.ones(0, dtype=bool))
        run_start = idx[new_key][np.cumsum(new_key) - 1]
        src = np.where(src >= run_start, src, -1)
        mask = src < 0
        filled = pc.take(vals, pa.array(np.where(mask, 0, src),
                                        type=pa.int64()))
        if mask.any():
            filled = pc.if_else(pa.array(~mask), filled,
                                pa.nulls(n, vals.type))
        return g.drop_columns([bucket_col]).append_column(out_name, filled)

    return (ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby(bucket_col, num_partitions=num_partitions)
            .map_groups(per_bucket, batch_format="pyarrow"))


def bfill(ds: Dataset, key: str, order_by, value_col: str,
          out: str | None = None, num_buckets: int = 64,
          num_partitions: int | None = None) -> Dataset:
    """Next-observation-carried-BACKWARD per key — :func:`ffill`'s
    mirror: SQL ``FIRST_VALUE(value IGNORE NULLS) OVER (PARTITION BY key
    ORDER BY order_by ROWS BETWEEN CURRENT ROW AND UNBOUNDED
    FOLLOWING)``.  Values MOVE verbatim (``pc.take``) so types and float
    bit-patterns are preserved; trailing nulls (no later observation in
    the key) stay null.

    Scale shape identical to ffill: ``hash(key) % num_buckets`` exchange,
    per bucket ONE Arrow sort + a vectorized backward carry — the
    forward ``np.maximum.accumulate`` kernel run over the REVERSED
    index, then clamped so a carry never crosses into the next key's
    run."""
    from ..state.sketches import hash64

    if isinstance(order_by, str):
        order_by = [order_by]
    out_name = out or f"{value_col}_bfill"
    spec = [(key, "ascending"), *[(c, "ascending") for c in order_by]]
    bucket_col = "__bfbucket__"
    if num_partitions is None:
        num_partitions = min(num_buckets, 64)

    def bucketize(batch: pa.Table) -> pa.Table:
        h = hash64(batch.column(key), seed=43) % np.uint64(num_buckets)
        return batch.append_column(
            bucket_col, pa.array(h.astype(np.int64), type=pa.int64()))

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.sort_by(spec)
        vals = g.column(value_col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        keys = g.column(key).to_numpy(zero_copy_only=False)
        n = len(keys)
        idx = np.arange(n, dtype=np.int64)
        valid = np.asarray(pc.is_valid(vals))
        # nearest valid index at-or-AFTER each row: run the forward-carry
        # kernel over the reversed order, then map indices back
        rev_src = np.maximum.accumulate(
            np.where(valid[::-1], idx, -1))       # idx here = reversed pos
        src = np.where(rev_src[::-1] >= 0,
                       (n - 1) - rev_src[::-1], n)  # n = no later valid
        # clamp: a carry never crosses into the NEXT key's run
        new_key = (_key_runs(keys) if n
                   else np.ones(0, dtype=bool))
        starts = np.flatnonzero(new_key)
        lens = np.diff(np.append(starts, n))
        run_end = np.repeat(starts + lens - 1, lens)
        src = np.where(src <= run_end, src, n)
        mask = src >= n
        filled = pc.take(vals, pa.array(np.where(mask, 0, src),
                                        type=pa.int64()))
        if mask.any():
            filled = pc.if_else(pa.array(~mask), filled,
                                pa.nulls(n, vals.type))
        return g.drop_columns([bucket_col]).append_column(out_name, filled)

    return (ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby(bucket_col, num_partitions=num_partitions)
            .map_groups(per_bucket, batch_format="pyarrow"))


def ohlc(ds: Dataset, key: str, ts_col: str, value_col: str,
         minutes: int, id_col: str | None = None,
         window_col: str = "window", num_buckets: int = 64,
         num_partitions: int | None = None) -> Dataset:
    """Open/high/low/close/count bars per (key, tumbling window) — the
    time-series candle aggregate (metrics rollups, market data, sensor
    summaries).  Open/close are the first/last NON-NULL values in
    (ts, id) order (``id_col`` breaks equal-timestamp ties
    deterministically); high/low are max/min.  Values are MOVED verbatim
    (``pc.take`` / reduceat over the raw column) — no arithmetic, so
    floats are bit-exact vs a SQL replay.

    Scale shape (the lag_lead exchange): shuffle on ``hash(key) %
    num_buckets`` (never one group per (key, window) — that is one
    Python call per bar), then per bucket ONE Arrow sort by (key,
    window, ts, id) and vectorized run reductions (reduceat max/min +
    run-boundary takes).  Null values drop before the scan (SQL
    aggregate-ignores-null semantics)."""
    from ..state.sketches import hash64

    bucket_col = "__ohlcbkt__"
    if num_partitions is None:
        num_partitions = min(num_buckets, 64)
    order_cols = [ts_col] + ([id_col] if id_col else [])

    def prep(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col)
        keep = pc.is_valid(v)
        if pa.types.is_floating(v.type):
            # NaN poisons reduceat max/min for the whole bar and SQL MAX/MIN
            # ignore it — drop alongside nulls to keep the SQL-replay
            # contract bit-exact for float inputs
            keep = pc.and_(keep, pc.invert(pc.is_nan(v)))
        batch = batch.filter(keep)
        w = pc.floor_temporal(batch.column(ts_col), multiple=minutes,
                              unit="minute")
        h = hash64(batch.column(key), seed=59) % np.uint64(num_buckets)
        return (batch.append_column(window_col, w)
                .append_column(bucket_col,
                               pa.array(h.astype(np.int64))))

    def per_bucket(g: pa.Table) -> pa.Table:
        spec = [(key, "ascending"), (window_col, "ascending"),
                *[(c, "ascending") for c in order_cols]]
        g = g.sort_by(spec)
        n = g.num_rows
        if n == 0:
            return pa.table({
                key: pa.array([], type=g.schema.field(key).type),
                window_col: pa.array(
                    [], type=g.schema.field(window_col).type),
                "open": pa.array([], type=g.schema.field(value_col).type),
                "high": pa.array([], type=g.schema.field(value_col).type),
                "low": pa.array([], type=g.schema.field(value_col).type),
                "close": pa.array(
                    [], type=g.schema.field(value_col).type),
                "n": pa.array([], type=pa.int64())})
        keys = g.column(key).to_numpy(zero_copy_only=False)
        wins = g.column(window_col).to_numpy(zero_copy_only=False)
        new = np.ones(n, dtype=bool)
        new[1:] = _neq_adjacent(keys) | _neq_adjacent(wins)
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, n)).astype(np.int64)
        vals = g.column(value_col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        v = vals.to_numpy(zero_copy_only=False)
        hi = np.maximum.reduceat(v, starts)
        lo = np.minimum.reduceat(v, starts)
        first = pa.array(starts, type=pa.int64())
        last = pa.array(starts + lens - 1, type=pa.int64())
        return pa.table({
            key: pc.take(g.column(key), first),
            window_col: pc.take(g.column(window_col), first),
            "open": pc.take(vals, first),
            "high": pa.array(hi, type=vals.type),
            "low": pa.array(lo, type=vals.type),
            "close": pc.take(vals, last),
            "n": pa.array(lens)})

    return (ds.select_columns(
                [key, ts_col, value_col] + ([id_col] if id_col else []))
            .map_batches(prep, batch_format="pyarrow")
            .groupby(bucket_col, num_partitions=num_partitions)
            .map_groups(per_bucket, batch_format="pyarrow"))


def interval_coverage(ds: Dataset, key: str, start_col: str, end_col: str,
                      num_buckets: int = 64,
                      num_partitions: int | None = None) -> Dataset:
    """Union-of-intervals per key: merge overlapping/touching ``[start,
    end)`` intervals and emit ``(key, n_intervals, n_merged,
    coverage)`` — total covered time (watch-time / uptime / on-call
    coverage dedup), where naive SUM(end - start) double-counts
    overlaps.  Inputs may be int64 or timestamps (measured in the
    column's unit; coverage is int64 in that unit).  Intervals with
    ``end <= start`` or null bounds are dropped.

    Scale shape: ONE bucketed exchange of (key, start, end); per bucket
    one sort + the segmented offset-shifted cummax island scan (the
    dup-spans merge), all vectorized.  The offset trick needs
    ``runs x span`` inside int64 — past that the bucket falls back to a
    per-run scan (logged), never silent wraparound."""
    from ..state.sketches import hash64

    bucket_col = "__ivbkt__"
    if num_partitions is None:
        num_partitions = min(num_buckets, 64)

    def prep(batch: pa.Table) -> pa.Table:
        s = batch.column(start_col)
        e = batch.column(end_col)
        if pa.types.is_timestamp(s.type):
            s = s.cast(pa.int64())
        if pa.types.is_timestamp(e.type):
            e = e.cast(pa.int64())
        t = pa.table({"k": batch.column(key),
                      "s": s.cast(pa.int64()), "e": e.cast(pa.int64())})
        keep = pc.and_kleene(
            pc.and_kleene(pc.is_valid(t.column("s")),
                          pc.is_valid(t.column("e"))),
            pc.greater(t.column("e"), t.column("s")))
        t = t.filter(pc.fill_null(keep, False))
        h = hash64(t.column("k"), seed=61) % np.uint64(num_buckets)
        return t.append_column(bucket_col,
                               pa.array(h.astype(np.int64)))

    def per_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table({
            key: pa.array([], type=g.schema.field("k").type),
            "n_intervals": pa.array([], type=pa.int64()),
            "n_merged": pa.array([], type=pa.int64()),
            "coverage": pa.array([], type=pa.int64())})
        if g.num_rows == 0:
            return empty
        g = g.sort_by([("k", "ascending"), ("s", "ascending"),
                       ("e", "ascending")])
        keys = g.column("k").to_numpy(zero_copy_only=False)
        s = g.column("s").to_numpy(zero_copy_only=False)
        e = g.column("e").to_numpy(zero_copy_only=False)
        n = len(s)
        new_run = _key_runs(keys)
        run_id = np.cumsum(new_run) - 1
        # rebase per run so the offset trick stays inside int64
        base = s[new_run][run_id]
        s_rel = s - base
        e_rel = e - base
        big = np.int64(int(e_rel.max()) + 1)
        n_runs = int(run_id[-1]) + 1
        if n_runs * int(big) < (1 << 62):
            cme = np.maximum.accumulate(e_rel + run_id * big) \
                - run_id * big
        else:
            logger.warning("interval_coverage: offset trick would "
                           "overflow (%d runs x %d span); per-run scan",
                           n_runs, int(big))
            cme = np.empty(n, dtype=np.int64)
            for r0 in np.flatnonzero(new_run):
                r1 = r0
                while r1 + 1 < n and not new_run[r1 + 1]:
                    r1 += 1
                cme[r0:r1 + 1] = np.maximum.accumulate(e_rel[r0:r1 + 1])
        new_island = new_run.copy()
        new_island[1:] |= s_rel[1:] > cme[:-1]
        isl_starts = np.flatnonzero(new_island)
        isl_end = np.maximum.reduceat(e_rel, isl_starts)
        isl_cov = isl_end - s_rel[isl_starts]
        isl_run = run_id[isl_starts]
        # per-key reductions over contiguous islands
        key_starts = np.flatnonzero(np.concatenate((
            [True], isl_run[1:] != isl_run[:-1])))
        n_merged = np.diff(np.append(key_starts, len(isl_starts)))
        coverage = np.add.reduceat(isl_cov, key_starts)
        n_in = np.diff(np.append(np.flatnonzero(new_run), n))
        take = pa.array(isl_starts[key_starts], type=pa.int64())
        return pa.table({
            key: pc.take(g.column("k"), take),
            "n_intervals": pa.array(n_in.astype(np.int64)),
            "n_merged": pa.array(n_merged.astype(np.int64)),
            "coverage": pa.array(coverage.astype(np.int64))})

    return (ds.select_columns([key, start_col, end_col])
            .map_batches(prep, batch_format="pyarrow")
            .groupby(bucket_col, num_partitions=num_partitions)
            .map_groups(per_bucket, batch_format="pyarrow"))
