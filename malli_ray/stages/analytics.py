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

__all__ = ["top_k_per_group", "distinct_count_by_group", "pivot_counts",
           "lag_lead", "running_aggregate", "collect_by_group",
           "rank_per_group", "mode_by_group", "covariance_by_group",
           "approx_distinct_by_group", "quantiles_by_group",
           "regression_by_group", "list_value_counts", "bucketed_groups",
           "list_value_counts_by_group", "confusion_report"]


def _neq_adjacent(keys: np.ndarray) -> np.ndarray:
    """Elementwise ``keys[i] != keys[i-1]`` (length n-1), NULL-SAFE: a
    nullable NUMERIC key column reads as float NaN via to_numpy, and raw
    ``!=`` would split the null group into per-row runs (NaN != NaN);
    adjacent NaNs count as EQUAL so nulls form one group — matching SQL
    GROUP BY and the object-array (None) behavior of string keys."""
    neq = keys[1:] != keys[:-1]
    if keys.dtype.kind == "f":
        nn = np.isnan(keys)
        neq &= ~(nn[1:] & nn[:-1])
    return neq


def _key_runs(keys: np.ndarray) -> "tuple[np.ndarray, np.ndarray]":
    """(starts, lens) of runs of equal consecutive keys.  Null-safe via
    ``_neq_adjacent`` (None and NaN keys each form ONE group, SQL GROUP BY
    semantics)."""
    n = len(keys)
    if n == 0:
        return (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64))
    new = np.ones(n, dtype=bool)
    new[1:] = _neq_adjacent(keys)
    starts = np.flatnonzero(new)
    return starts, np.diff(np.append(starts, n))


def bucketed_groups(ds: Dataset, key, per_bucket,
                    num_buckets: int = 64, seed: int = 17,
                    num_partitions: int | None = None,
                    bucket_col: str = "__gbkt__") -> Dataset:
    """The de-trapped replacement for ``groupby(raw key).map_groups(fn)``:
    exchange on ``hash(key) % num_buckets`` (evenly-sized groups, ~one
    Python call per bucket instead of one per DISTINCT KEY — at 100 TB a
    raw entity key means billions of Python ``map_groups`` calls), then
    ``per_bucket`` handles ALL keys of its bucket in one vectorized pass
    (sort + ``_key_runs``).  ``per_bucket`` receives the bucket table with
    ``bucket_col`` already dropped; every row of a key lands in exactly one
    bucket, so per-key semantics are unchanged.  ``key`` may be a column
    name or list (multi-column keys combine hashes FNV-style)."""
    from ..state.sketches import hash64

    key_cols = [key] if isinstance(key, str) else list(key)

    def bucketize(batch: pa.Table) -> pa.Table:
        h = hash64(batch.column(key_cols[0]), seed=seed)
        for c in key_cols[1:]:
            h = h * np.uint64(1099511628211) + hash64(batch.column(c),
                                                      seed=seed)
        h = h % np.uint64(num_buckets)
        return batch.append_column(
            bucket_col, pa.array(h.astype(np.int64), type=pa.int64()))

    def run(g: pa.Table) -> pa.Table:
        return per_bucket(g.drop_columns([bucket_col]))

    return (ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby(bucket_col, num_partitions=num_partitions)
            .map_groups(run, batch_format="pyarrow"))


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
    new[1:] = _neq_adjacent(keys)
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
    exchange keys on ``hash(group) % num_buckets`` (NOT the raw group —
    one vectorized pass per bucket, never one Python call per distinct
    group) and re-ranks all of a bucket's groups with one sort + run scan.
    Skew-safe: a hot group contributes k rows per batch, not its full
    volume.
    """
    spec = _sort_spec(group, order_by, descending)

    def partial_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        batch = batch.sort_by(spec)
        gvals = batch.column(group).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(_run_positions(gvals) < k))

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.sort_by(spec)
        # null-safe run positions (change mask, not numpy equality: a
        # nullable NUMERIC group column reads as NaN, and NaN != NaN
        # would split the null group into per-row runs)
        starts = np.flatnonzero(_adjacent_change_mask(g, [group]))
        lens = np.diff(np.append(starts, g.num_rows))
        pos = (np.arange(g.num_rows, dtype=np.int64)
               - np.repeat(starts, lens))
        keep = pos < k
        g = g.append_column(rank_col, pa.array(pos + 1, type=pa.int64()))
        return g.filter(pa.array(keep))

    return bucketed_groups(
        ds.map_batches(partial_topk, batch_format="pyarrow"),
        group, per_bucket, seed=17, num_partitions=num_partitions)


def distinct_count_by_group(ds: Dataset, group: str, value: str,
                            out_col: str = "n_distinct",
                            num_partitions: int | None = None) -> Dataset:
    """Exact ``COUNT(DISTINCT value) GROUP BY group``.

    Map-side combine: every batch first collapses to its distinct
    ``(group, value)`` pairs via Arrow's hash ``group_by`` (vectorized), so
    the shuffle carries distinct-per-batch pairs — bounded by the true
    (group x value) cardinality per batch, never the row count.  The
    finisher exchange keys on ``hash(group) % num_buckets`` (never one
    Python call per distinct group); per bucket ONE (group, value) sort +
    null-safe adjacent-change masks dedup pairs across batches and count
    per group run.  Null values are NOT counted (SQL COUNT(DISTINCT)
    semantics); null groups form their own group (SQL GROUP BY semantics)
    and groups whose values are all null report 0.
    """

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        pairs = batch.select([group, value])
        return pairs.group_by([group, value], use_threads=False).aggregate([])

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.sort_by([(group, "ascending"), (value, "ascending")])
        pair_first = _adjacent_change_mask(t, [group, value])
        grp_first = _adjacent_change_mask(t, [group])
        starts = np.flatnonzero(grp_first)
        if len(starts) == 0:
            return pa.table({group: t.column(group),
                             out_col: pa.array([], type=pa.int64())})
        vcol = t.column(value)
        if isinstance(vcol, pa.ChunkedArray):
            vcol = vcol.combine_chunks()
        contrib = (pair_first
                   & np.asarray(pc.is_valid(vcol))).astype(np.int64)
        counts = np.add.reduceat(contrib, starts)
        gcol = t.column(group)
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        return pa.table({
            group: gcol.take(pa.array(starts, pa.int64())),
            out_col: pa.array(counts, type=pa.int64())})

    return bucketed_groups(
        ds.select_columns([group, value])
        .map_batches(distinct_pairs, batch_format="pyarrow"),
        group, per_bucket, seed=17, num_partitions=num_partitions)


def quantiles_by_group(ds: Dataset, group: str, value: str,
                       qs: "tuple | list" = (0.5, 0.9, 0.99),
                       num_partitions: int | None = None) -> Dataset:
    """Approximate per-group quantiles via per-group t-digest — the
    at-scale sibling of the exact sort-based per-group quantiles
    (`median_value_by_type`): each batch builds one digest per group it
    contains (map-side partial), so the groupby moves (group, digest)
    rows per (batch x group) instead of raw values.  Digest merge is
    associative; rel. error is the t-digest bound (<1% at the tails for
    delta=200, pytest-verified)."""
    from ..state.sketches import TDigest

    def partial(batch: pa.Table) -> pa.Table:
        cols = batch.select([group, value])
        enc = cols.column(group).combine_chunks()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        dict_arr = pc.dictionary_encode(enc)
        if isinstance(dict_arr, pa.ChunkedArray):
            dict_arr = dict_arr.combine_chunks()
        codes = dict_arr.indices.to_numpy(zero_copy_only=False)
        uniq = dict_arr.dictionary
        vals = cols.column(value).to_numpy(zero_copy_only=False) \
            .astype(np.float64, copy=False)
        digs = []
        for g in range(len(uniq)):
            td = TDigest()
            td.add(vals[codes == g])
            digs.append(td.digest())
        return pa.table({group: uniq,
                         "_digest": pa.array(digs, pa.string())})

    q_cols = [f"q{str(q).replace('.', '_')}" for q in qs]

    def per_bucket(g: pa.Table) -> pa.Table:
        # bucketed finisher: one sort, then a per-RUN digest merge (the
        # merge is Python-object work either way; the win is ~one Ray
        # map_groups call per bucket instead of one per distinct group)
        from ..state.sketches import TDigest as TD
        t = g.sort_by([(group, "ascending")])
        starts = np.flatnonzero(_adjacent_change_mask(t, [group]))
        bounds = np.append(starts, t.num_rows)
        digests = t.column("_digest").to_pylist()
        out_vals: dict = {name: [] for name in q_cols}
        for i in range(len(starts)):
            merged = None
            for d in digests[bounds[i]:bounds[i + 1]]:
                td = TD.from_digest(d)
                merged = td if merged is None else merged.merge(td)
            for q, name in zip(qs, q_cols):
                out_vals[name].append(merged.quantile(q))
        gcol = t.column(group)
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        out = {group: gcol.take(pa.array(starts, pa.int64()))}
        for name in q_cols:
            out[name] = pa.array(out_vals[name], pa.float64())
        return pa.table(out)

    return bucketed_groups(
        ds.select_columns([group, value])
        .map_batches(partial, batch_format="pyarrow"),
        group, per_bucket, seed=17, num_partitions=num_partitions)


def approx_distinct_by_group(ds: Dataset, group: str, value: str,
                             p: int = 12,
                             out_col: str = "approx_distinct",
                             num_partitions: int | None = None) -> Dataset:
    """Approximate ``COUNT(DISTINCT value) GROUP BY group`` via per-group
    HyperLogLog — the at-scale sibling of :func:`distinct_count_by_group`.

    Shuffle shape: each batch builds ONE 2^p-register sketch per group it
    contains (map-side partial), so the groupby moves (group, 2^p bytes)
    rows per (batch x group) — independent of value cardinality.  Use this
    when distinct pairs per batch outgrow the pair shuffle (e.g. distinct
    users per day at 10^9 events/day); the exact operator is otherwise
    cheaper AND exact.  Register merge is elementwise max (commutative,
    associative — order-independent).  Relative error ~ 1.04/sqrt(2^p)
    (~1.6% at p=12)."""
    from ..state.sketches import HyperLogLog, hash64

    def partial(batch: pa.Table) -> pa.Table:
        cols = batch.select([group, value])
        enc = cols.column(group).combine_chunks()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        dict_arr = pc.dictionary_encode(enc)
        if isinstance(dict_arr, pa.ChunkedArray):
            dict_arr = dict_arr.combine_chunks()
        codes = dict_arr.indices.to_numpy(zero_copy_only=False)
        uniq = dict_arr.dictionary
        hashes = hash64(cols.column(value).combine_chunks()
                        if isinstance(cols.column(value), pa.ChunkedArray)
                        else cols.column(value))
        null_mask = pc.is_null(cols.column(value)).to_numpy(
            zero_copy_only=False)
        regs_out = []
        for g in range(len(uniq)):
            h = HyperLogLog(p=p)
            sel = (codes == g) & ~null_mask
            h.add_hashes(hashes[sel])
            regs_out.append(h.registers.tobytes())
        return pa.table({group: uniq,
                         "_regs": pa.array(regs_out, pa.large_binary())})

    def per_bucket(g: pa.Table) -> pa.Table:
        # bucketed finisher: register merge is ONE np.maximum.reduceat
        # over the stacked (rows x 2^p) register matrix — vectorized
        # across every group in the bucket at once
        t = g.sort_by([(group, "ascending")])
        starts = np.flatnonzero(_adjacent_change_mask(t, [group]))
        if len(starts) == 0:
            return pa.table({group: t.column(group),
                             out_col: pa.array([], type=pa.int64())})
        mat = np.frombuffer(
            b"".join(t.column("_regs").to_pylist()),
            dtype=np.uint8).reshape(t.num_rows, 1 << p)
        merged = np.maximum.reduceat(mat, starts, axis=0)
        ests = [int(round(HyperLogLog(p=p, registers=merged[i])
                          .cardinality()))
                for i in range(len(starts))]
        gcol = t.column(group)
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        return pa.table({
            group: gcol.take(pa.array(starts, pa.int64())),
            out_col: pa.array(ests, type=pa.int64())})

    return bucketed_groups(
        ds.select_columns([group, value])
        .map_batches(partial, batch_format="pyarrow"),
        group, per_bucket, seed=17, num_partitions=num_partitions)


def collect_by_group(ds: Dataset, group: str, value: str, order_by,
                     sep: str = ",", out_col: str = "collected",
                     max_group_rows: int = 1_000_000,
                     num_partitions: int | None = None) -> Dataset:
    """SQL ``string_agg(value, sep ORDER BY order_by)`` — one row per group
    with the group's values joined in a deterministic order.  (Also the
    conversation/session re-assembly primitive: events -> one ordered
    transcript per session.)

    This op genuinely must move the payload (it concatenates it), so it is
    ONE bucketed shuffle (hash(group) % num_buckets) of the projected
    (group, value, order) columns — select only what you join.  Per
    bucket: one Arrow sort + an in-process join per group run (never one
    Ray call per distinct group).  Assumption: one group's rows fit in a
    worker (``max_group_rows`` guards it loudly — re-bucket by (group,
    coarse order window) upstream for pathological groups).  Null values
    are skipped (SQL string_agg semantics); groups with only nulls emit
    an empty string."""
    if isinstance(order_by, str):
        order_by = [order_by]
    proj = [group, value, *[c for c in order_by if c not in (group, value)]]

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.sort_by([(group, "ascending"),
                       *[(c, "ascending") for c in order_by]])
        starts = np.flatnonzero(_adjacent_change_mask(t, [group]))
        bounds = np.append(starts, t.num_rows)
        lens = np.diff(bounds)
        if len(lens) and lens.max() > max_group_rows:
            big = int(np.argmax(lens))
            raise ValueError(
                f"collect_by_group: group "
                f"{t.column(group)[int(starts[big])]} has {lens.max()} "
                f"rows > max_group_rows={max_group_rows}; re-bucket "
                "upstream")
        vals = t.column(value).to_pylist()
        joined, n_items = [], []
        for i in range(len(starts)):
            vs = [v for v in vals[bounds[i]:bounds[i + 1]]
                  if v is not None]
            joined.append(sep.join(map(str, vs)))
            n_items.append(len(vs))
        gcol = t.column(group)
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        return pa.table({
            group: gcol.take(pa.array(starts, pa.int64())),
            out_col: pa.array(joined, type=pa.string()),
            "n_items": pa.array(n_items, type=pa.int64())})

    return bucketed_groups(ds.select_columns(proj), group, per_bucket,
                           seed=17, num_partitions=num_partitions)


def lag_lead(ds: Dataset, key: str, order_by, value_col: str, n: int = 1,
             lag_col: str | None = None, lead_col: str | None = None,
             num_buckets: int = 64,
             num_partitions: int | None = None) -> Dataset:
    """SQL ``LAG(value, n)`` / ``LEAD(value, n)`` ``OVER (PARTITION BY key
    ORDER BY order_by...)`` — the previous/next value within a key's ordered
    run, null at the run edges.  Values are MOVED verbatim (``pc.take``), so
    types and float bit-patterns are preserved exactly.

    ``order_by`` is a column name or list; together with ``key`` it must
    order rows within a key deterministically (include a unique tie-break
    column such as the row id).

    Scale shape: the shuffle key is ``hash(key) % num_buckets`` — NOT the
    raw key — so the exchange produces ``num_buckets`` evenly-sized groups
    instead of one tiny group per key (at 100 TB, per-user groups would mean
    billions of Python ``map_groups`` calls; buckets mean ~one vectorized
    call per partition).  Inside a bucket: ONE Arrow multi-column sort by
    (key, order_by...), then a fully vectorized shift with run-boundary null
    masking across ALL keys at once — positions whose run offset < n (lag)
    or >= run_length - n (lead) take a null index.  Assumption: one
    BUCKET fits in worker memory (tune num_buckets, not the key
    distribution — hot keys do not skew buckets more than hash balance).
    """
    if isinstance(order_by, str):
        order_by = [order_by]
    lag_name = lag_col or f"{value_col}_lag{n}"
    lead_name = lead_col or f"{value_col}_lead{n}"
    spec = [(key, "ascending"), *[(c, "ascending") for c in order_by]]
    bucket_col = "__lagbucket__"

    from ..state.sketches import hash64

    def bucketize(batch: pa.Table) -> pa.Table:
        h = hash64(batch.column(key), seed=11) % np.uint64(num_buckets)
        return batch.append_column(
            bucket_col, pa.array(h.astype(np.int64), type=pa.int64()))

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.sort_by(spec)
        keys = g.column(key).to_numpy(zero_copy_only=False)
        pos = _run_positions(keys)
        nrows = len(keys)
        # run lengths broadcast back to rows: runlen[i] = len of i's run
        new = np.ones(nrows, dtype=bool)
        new[1:] = _neq_adjacent(keys)
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, nrows))
        runlen = np.repeat(lens, lens)
        idx = np.arange(nrows, dtype=np.int64)
        lag_ok = pos >= n
        lead_ok = pos < runlen - n
        vals = g.column(value_col)
        lag_idx = pa.array(np.where(lag_ok, idx - n, 0), type=pa.int64(),
                           mask=~lag_ok)
        lead_idx = pa.array(np.where(lead_ok, idx + n, 0), type=pa.int64(),
                            mask=~lead_ok)
        g = g.append_column(lag_name, pc.take(vals, lag_idx))
        g = g.append_column(lead_name, pc.take(vals, lead_idx))
        return g.drop_columns([bucket_col])

    return (ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby(bucket_col, num_partitions=num_partitions)
            .map_groups(per_bucket, batch_format="pyarrow"))


def first_last_per_key(ds: Dataset, key: str, order_by, value_col: str,
                       first_col: str | None = None,
                       last_col: str | None = None,
                       num_buckets: int = 64,
                       num_partitions: int | None = None) -> Dataset:
    """SQL ``FIRST_VALUE(value)`` / ``LAST_VALUE(value) OVER (PARTITION BY
    key ORDER BY order_by ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED
    FOLLOWING)`` — every row gains its key's first and last ordered value.
    Values move verbatim via ``pc.take`` so types and float bit-patterns
    are preserved exactly.

    ``order_by`` must order rows within a key deterministically (include a
    unique tie-break column).

    Scale shape: identical to :func:`lag_lead` — shuffle on ``hash(key) %
    num_buckets`` (evenly-sized groups, no per-key Python), then per bucket
    ONE Arrow sort + run-boundary scan; the first/last row index of each
    run broadcasts to the run with ``np.repeat``."""
    if isinstance(order_by, str):
        order_by = [order_by]
    first_name = first_col or f"{value_col}_first"
    last_name = last_col or f"{value_col}_last"
    spec = [(key, "ascending"), *[(c, "ascending") for c in order_by]]
    bucket_col = "__flbucket__"

    from ..state.sketches import hash64

    def bucketize(batch: pa.Table) -> pa.Table:
        h = hash64(batch.column(key), seed=14) % np.uint64(num_buckets)
        return batch.append_column(
            bucket_col, pa.array(h.astype(np.int64), type=pa.int64()))

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.sort_by(spec)
        keys = g.column(key).to_numpy(zero_copy_only=False)
        nrows = len(keys)
        new = np.ones(nrows, dtype=bool)
        new[1:] = _neq_adjacent(keys)
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, nrows))
        first_idx = np.repeat(starts, lens)
        last_idx = np.repeat(starts + lens - 1, lens)
        vals = g.column(value_col)
        g = g.append_column(first_name, pc.take(
            vals, pa.array(first_idx, type=pa.int64())))
        g = g.append_column(last_name, pc.take(
            vals, pa.array(last_idx, type=pa.int64())))
        return g.drop_columns([bucket_col])

    return (ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby(bucket_col, num_partitions=num_partitions)
            .map_groups(per_bucket, batch_format="pyarrow"))


def running_aggregate(ds: Dataset, key: str, order_by, value_col: str,
                      count_col: str = "running_count",
                      sum_col: str = "running_sum",
                      num_buckets: int = 64,
                      num_partitions: int | None = None) -> Dataset:
    """SQL running total: ``COUNT(*)`` / ``SUM(value) OVER (PARTITION BY key
    ORDER BY order_by ROWS UNBOUNDED PRECEDING)`` — the cumulative count and
    sum up to and including each row in its key's ordered run.  (ROWS
    frame, not RANGE: peer rows with equal order keys accumulate one at a
    time in tie-break order — include a unique tie-break column in
    ``order_by``; windows.rolling_aggregate is the RANGE/peers sibling.)

    Integer-exact when ``value_col`` is integral (int64 cumsum).  Float
    inputs use a whole-bucket prefix sum minus the run-start offset, whose
    rounding differs from SQL's incremental per-row accumulation — for SQL
    bit-parity cast to integer units (cents) first, as rolling_aggregate
    does.

    Scale shape: same exchange as :func:`lag_lead` — shuffle on
    ``hash(key) % num_buckets``, per-bucket ONE Arrow sort + a single
    vectorized cumsum with run-start offsets subtracted (no per-key
    Python)."""
    if isinstance(order_by, str):
        order_by = [order_by]
    spec = [(key, "ascending"), *[(c, "ascending") for c in order_by]]
    bucket_col = "__runbucket__"

    from ..state.sketches import hash64

    def bucketize(batch: pa.Table) -> pa.Table:
        h = hash64(batch.column(key), seed=12) % np.uint64(num_buckets)
        return batch.append_column(
            bucket_col, pa.array(h.astype(np.int64), type=pa.int64()))

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.sort_by(spec)
        keys = g.column(key).to_numpy(zero_copy_only=False)
        pos = _run_positions(keys)
        vals = g.column(value_col).to_numpy(zero_copy_only=False)
        integral = np.issubdtype(vals.dtype, np.integer)
        acc = vals.astype(np.int64 if integral else np.float64)
        csum = np.cumsum(acc)
        # subtract the cumulative total just before each run's start
        nrows = len(keys)
        new = np.ones(nrows, dtype=bool)
        new[1:] = _neq_adjacent(keys)
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, nrows))
        base = np.where(starts > 0, csum[starts - 1], 0)
        run_sum = csum - np.repeat(base, lens)
        g = g.append_column(count_col, pa.array(pos + 1, type=pa.int64()))
        g = g.append_column(sum_col, pa.array(
            run_sum, type=pa.int64() if integral else pa.float64()))
        return g.drop_columns([bucket_col])

    return (ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby(bucket_col, num_partitions=num_partitions)
            .map_groups(per_bucket, batch_format="pyarrow"))


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

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.sort_by([(group, "ascending")])
        starts = np.flatnonzero(_adjacent_change_mask(t, [group]))
        piv = t.column(pivot).to_numpy(zero_copy_only=False)
        cnt = t.column("__cnt__").to_numpy(
            zero_copy_only=False).astype(np.int64)
        gcol = t.column(group)
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        cols = {group: gcol.take(pa.array(starts, pa.int64()))}
        for cat in categories:
            contrib = np.where(piv == cat, cnt, 0)
            cols[prefix + cat] = pa.array(
                np.add.reduceat(contrib, starts) if len(starts)
                else np.zeros(0, dtype=np.int64), type=pa.int64())
        return pa.table(cols)

    return bucketed_groups(
        ds.select_columns([group, pivot])
        .map_batches(partial_counts, batch_format="pyarrow"),
        group, per_bucket, seed=17, num_partitions=num_partitions)


def _adjacent_change_mask(table: pa.Table, cols: "list[str]") -> np.ndarray:
    """Boolean mask: row i starts a new run of ``cols`` values (row 0 always
    True).  Nulls are peers of nulls (SQL window-frame peer semantics)."""
    n = table.num_rows
    new = np.zeros(n, dtype=bool)
    if n == 0:
        return new
    new[0] = True
    for c in cols:
        col = table.column(c)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        neq = pc.fill_null(
            pc.not_equal(col.slice(1), col.slice(0, n - 1)), False)
        # null vs non-null IS a change (not_equal yields null there)
        validity_change = pc.xor(pc.is_valid(col.slice(1)),
                                 pc.is_valid(col.slice(0, n - 1)))
        new[1:] |= np.asarray(pc.or_(neq, validity_change))
    return new


def _ntile(pos: np.ndarray, runlen: np.ndarray, tiles: int) -> np.ndarray:
    """SQL NTILE(tiles) bucket (1-based) from 0-based in-group position and
    group size: the first ``size % tiles`` buckets get the extra row."""
    base = runlen // tiles
    big = runlen % tiles
    big_span = big * (base + 1)
    in_big = pos < big_span
    tile = np.where(in_big, pos // np.maximum(base + 1, 1),
                    big + (pos - big_span) // np.maximum(base, 1))
    return (tile + 1).astype(np.int64)


def rank_per_group(ds: Dataset, key: str, order_by,
                   peer_by: "list[str] | None" = None,
                   tiles: int | None = None,
                   percentiles: bool = False,
                   num_buckets: int = 64,
                   num_partitions: int | None = None) -> Dataset:
    """SQL ranking window functions per key: appends ``row_number``,
    ``rnk`` (RANK), ``dense_rank``, and (when ``tiles``) ``tile{n}``
    (NTILE) columns — ``OVER (PARTITION BY key ORDER BY ...)``.
    ``percentiles=True`` adds ``percent_rank`` = (rank-1)/(N-1) (0.0 for
    single-row groups) and ``cume_dist`` = peers-through-current / N; both
    are ONE IEEE division of exactly-representable ints, so they match an
    SQL oracle bit-for-bit.

    ``order_by`` must order rows within a key uniquely (include a tie-break
    id column): it defines row_number/ntile order.  ``peer_by`` (default:
    all of ``order_by``) names the PREFIX columns that define rank peers —
    e.g. ``order_by=[qty, id], peer_by=[qty]`` reproduces
    ``RANK() OVER (PARTITION BY key ORDER BY qty)`` while keeping
    row_number deterministic.

    Scale shape (same exchange as :func:`lag_lead`): shuffle on
    ``hash(key) % num_buckets`` for evenly-sized groups, then per bucket ONE
    Arrow multi-column sort + vectorized run/peer boundary scans — rank is
    the peer-run start position broadcast by ``np.repeat``, dense_rank a
    cumsum of peer starts rebased per key run, ntile closed-form from
    (position, group size).  No per-key Python at any scale.
    """
    if isinstance(order_by, str):
        order_by = [order_by]
    peer_by = list(peer_by) if peer_by is not None else list(order_by)
    spec = [(key, "ascending"), *[(c, "ascending") for c in order_by]]
    bucket_col = "__rankbucket__"
    tile_name = f"tile{tiles}" if tiles else None

    from ..state.sketches import hash64

    def bucketize(batch: pa.Table) -> pa.Table:
        h = hash64(batch.column(key), seed=13) % np.uint64(num_buckets)
        return batch.append_column(
            bucket_col, pa.array(h.astype(np.int64), type=pa.int64()))

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.sort_by(spec)
        keys = g.column(key).to_numpy(zero_copy_only=False)
        nrows = len(keys)
        pos = _run_positions(keys)
        new_key = np.ones(nrows, dtype=bool)
        new_key[1:] = _neq_adjacent(keys)
        key_starts = np.flatnonzero(new_key)
        key_lens = np.diff(np.append(key_starts, nrows))
        # peer runs: change in any peer column OR a new key
        new_peer = _adjacent_change_mask(g, peer_by) | new_key
        peer_starts = np.flatnonzero(new_peer)
        peer_lens = np.diff(np.append(peer_starts, nrows))
        rank = np.repeat(pos[peer_starts] + 1, peer_lens)
        pidx = np.cumsum(new_peer)
        dense = pidx - np.repeat(pidx[key_starts], key_lens) + 1
        g = g.append_column("row_number",
                            pa.array(pos + 1, type=pa.int64()))
        g = g.append_column("rnk", pa.array(rank, type=pa.int64()))
        g = g.append_column("dense_rank", pa.array(dense, type=pa.int64()))
        if tiles or percentiles:
            runlen = np.repeat(key_lens, key_lens)
            if tiles:
                g = g.append_column(tile_name,
                                    pa.array(_ntile(pos, runlen, tiles)))
            if percentiles:
                denom = runlen - 1
                pr = np.where(denom > 0,
                              (rank - 1) / np.maximum(denom, 1), 0.0)
                cume = np.repeat(pos[peer_starts] + peer_lens,
                                 peer_lens) / runlen
                g = g.append_column("percent_rank",
                                    pa.array(pr, type=pa.float64()))
                g = g.append_column("cume_dist",
                                    pa.array(cume, type=pa.float64()))
        return g.drop_columns([bucket_col])

    return (ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby(bucket_col, num_partitions=num_partitions)
            .map_groups(per_bucket, batch_format="pyarrow"))


def mode_by_group(ds: Dataset, group: str, value: str,
                  out_col: str = "mode_value", count_col: str = "cnt",
                  num_buckets: int = 64,
                  num_partitions: int | None = None) -> Dataset:
    """Most frequent ``value`` per ``group`` (SQL mode with a DETERMINISTIC
    tie-break: highest count, then smallest value) plus its count.

    Scale shape: map-side (group, value, partial count) combine via Arrow
    hash group_by — the shuffle carries at most distinct-pairs-per-batch
    rows, never payloads.  The exchange is keyed on ``hash(group) %
    num_buckets`` (evenly-sized groups, no per-key Python): each bucket sums
    partials with one Arrow group_by, sorts by (group, count desc, value
    asc), and keeps each group-run's first row via a vectorized boundary
    mask.
    """
    bucket_col = "__modebucket__"
    from ..state.sketches import hash64

    def partial_counts(batch: pa.Table) -> pa.Table:
        t = batch.select([group, value])
        out = t.group_by([group, value], use_threads=False).aggregate(
            [([], "count_all")])
        out = out.rename_columns([group, value, "__cnt__"])
        h = hash64(out.column(group), seed=14) % np.uint64(num_buckets)
        return out.append_column(
            bucket_col, pa.array(h.astype(np.int64), type=pa.int64()))

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.group_by([group, value], use_threads=False).aggregate(
            [("__cnt__", "sum")])
        t = t.rename_columns([group, value, "__cnt__"])
        t = t.sort_by([(group, "ascending"), ("__cnt__", "descending"),
                       (value, "ascending")])
        keys = t.column(group).to_numpy(zero_copy_only=False)
        first = np.ones(len(keys), dtype=bool)
        first[1:] = _neq_adjacent(keys)
        t = t.filter(pa.array(first))
        return pa.table({
            group: t.column(group),
            out_col: t.column(value),
            count_col: pc.cast(t.column("__cnt__"), pa.int64())})

    return (ds.select_columns([group, value])
            .map_batches(partial_counts, batch_format="pyarrow")
            .groupby(bucket_col, num_partitions=num_partitions)
            .map_groups(per_bucket, batch_format="pyarrow"))


def covariance_by_group(ds: Dataset, group: str, x: str, y: str,
                        corr: bool = False,
                        num_partitions: int | None = None) -> Dataset:
    """Population covariance of two INTEGER columns per group, plus the
    exact integer sums it derives from: ``(group, n, sum_x, sum_y, sum_xy,
    cov_pop)``.  With ``corr=True`` the partials also carry ``sum_xx`` /
    ``sum_yy`` and the output adds Pearson ``corr_pop`` =
    ``cov / (sqrt(var_x) * sqrt(var_y))`` — every term the same literal
    IEEE expression an SQL oracle spells (sqrt is correctly rounded, so
    it is as reproducible as the divisions); NULL when either variance
    is zero.

    Bit-reproducibility contract: ``x`` and ``y`` must already be integral
    (cast floats to fixed-point units — cents — upstream, exactly as
    windows.rolling_aggregate requires).  All accumulation is integer-exact
    (map-side int64 partial sums, driver-side Python arbitrary-precision
    totals), and ``cov_pop`` is computed by the literal IEEE sequence
    ``sxy/n - (sx/n)*(sy/n)`` on correctly-rounded int->double conversions —
    the same expression an SQL oracle can spell, so the float matches
    bit-for-bit.  Overflow bound: per-row |x*y| * rows-per-block must fit
    int64 (fixed-point units, not raw magnitudes; raise block count to
    shrink blocks if needed).

    Scale shape: one Arrow hash group_by per batch collapses each block to
    (group, n, sx, sy, sxy) partials — ONLY these tiny rows shuffle — then a
    single groupby(group) finisher sums partials.  Group count is assumed
    small (it is an aggregate output); no payload ever moves.
    """

    def partials(batch: pa.Table) -> pa.Table:
        xv = pc.cast(batch.column(x), pa.int64())
        yv = pc.cast(batch.column(y), pa.int64())
        cols = {group: batch.column(group), "__x": xv, "__y": yv,
                "__xy": pc.multiply_checked(xv, yv)}
        aggs = [("__x", "sum"), ("__y", "sum"), ("__xy", "sum")]
        names = [group, "__sx", "__sy", "__sxy"]
        if corr:
            cols["__xx"] = pc.multiply_checked(xv, xv)
            cols["__yy"] = pc.multiply_checked(yv, yv)
            aggs += [("__xx", "sum"), ("__yy", "sum")]
            names += ["__sxx", "__syy"]
        out = pa.table(cols).group_by([group], use_threads=False) \
            .aggregate(aggs + [([], "count_all")])
        return out.rename_columns(names + ["__n"])

    def per_bucket(g: pa.Table) -> pa.Table:
        # bucketed finisher; the per-RUN merge stays Python-int (the
        # arbitrary-precision totals the bit-exactness contract needs —
        # np.add.reduceat could overflow int64 where HUGEINT doesn't),
        # looping over partial rows in-process, never one Ray call/group
        import math
        t = g.sort_by([(group, "ascending")])
        starts = np.flatnonzero(_adjacent_change_mask(t, [group]))
        bounds = np.append(starts, t.num_rows)
        pn = t.column("__n").to_pylist()
        psx = t.column("__sx").to_pylist()
        psy = t.column("__sy").to_pylist()
        psxy = t.column("__sxy").to_pylist()
        if corr:
            psxx = t.column("__sxx").to_pylist()
            psyy = t.column("__syy").to_pylist()
        rows: dict = {"n": [], "sum_x": [], "sum_y": [], "sum_xy": [],
                      "cov_pop": [], "sum_xx": [], "sum_yy": [],
                      "corr_pop": []}
        for i in range(len(starts)):
            lo, hi = bounds[i], bounds[i + 1]
            n = sum(pn[lo:hi])
            sx = sum(psx[lo:hi])
            sy = sum(psy[lo:hi])
            sxy = sum(psxy[lo:hi])
            cov = (sxy / n) - (sx / n) * (sy / n)
            rows["n"].append(n)
            rows["sum_x"].append(sx)
            rows["sum_y"].append(sy)
            rows["sum_xy"].append(sxy)
            rows["cov_pop"].append(cov)
            if corr:
                sxx = sum(psxx[lo:hi])
                syy = sum(psyy[lo:hi])
                vx = (sxx / n) - (sx / n) * (sx / n)
                vy = (syy / n) - (sy / n) * (sy / n)
                r = (cov / (math.sqrt(vx) * math.sqrt(vy))
                     if vx > 0 and vy > 0 else None)
                rows["sum_xx"].append(sxx)
                rows["sum_yy"].append(syy)
                rows["corr_pop"].append(r)
        gcol = t.column(group)
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        cols = {group: gcol.take(pa.array(starts, pa.int64())),
                "n": pa.array(rows["n"], type=pa.int64()),
                "sum_x": pa.array(rows["sum_x"], type=pa.int64()),
                "sum_y": pa.array(rows["sum_y"], type=pa.int64()),
                "sum_xy": pa.array(rows["sum_xy"], type=pa.int64()),
                "cov_pop": pa.array(rows["cov_pop"], type=pa.float64())}
        if corr:
            cols["sum_xx"] = pa.array(rows["sum_xx"], type=pa.int64())
            cols["sum_yy"] = pa.array(rows["sum_yy"], type=pa.int64())
            cols["corr_pop"] = pa.array(rows["corr_pop"],
                                        type=pa.float64())
        return pa.table(cols)

    return bucketed_groups(
        ds.select_columns([group, x, y])
        .map_batches(partials, batch_format="pyarrow"),
        group, per_bucket, seed=17, num_partitions=num_partitions)


def regression_by_group(ds: Dataset, group: str, x: str, y: str,
                        num_partitions: int | None = None) -> Dataset:
    """Per-group simple OLS ``y = intercept + slope * x`` over two
    INTEGER columns: ``(group, n, slope, intercept, r2)``.

    Same shape and bit-reproducibility contract as
    :func:`covariance_by_group` (cast floats to fixed-point ints
    upstream): map-side Arrow group_by collapses each block to
    ``(group, n, sx, sy, sxy, sxx, syy)`` int64 partials — only these
    tiny rows shuffle — and the finisher sums them with Python
    arbitrary-precision ints, so every numerator/denominator is EXACT:

    - ``slope = (n*sxy - sx*sy) / (n*sxx - sx^2)``
    - ``intercept = (sy - slope*sx) / n``
    - ``r2 = (num/den_x) * (num/den_y)`` with ``num = n*sxy - sx*sy``,
      ``den_x = n*sxx - sx^2``, ``den_y = n*syy - sy^2``

    Float steps mirror the SQL oracle's literal expression sequence:
    each exact integer is rounded to double FIRST (``float(int)`` ==
    ``CAST(hugeint AS DOUBLE)``), then IEEE divide/multiply/subtract in
    the same order — so the result matches DuckDB bit-for-bit.  ``r2``
    deliberately multiplies two quotients instead of squaring ``num``
    (``num^2`` can overflow int128 in the oracle's HUGEINT arithmetic).
    ``slope``/``r2`` are NULL for zero x-variance (and ``r2`` for zero
    y-variance); ``intercept`` is NULL whenever slope is.
    """

    def partials(batch: pa.Table) -> pa.Table:
        xv = pc.cast(batch.column(x), pa.int64())
        yv = pc.cast(batch.column(y), pa.int64())
        out = pa.table({
            group: batch.column(group), "__x": xv, "__y": yv,
            "__xy": pc.multiply_checked(xv, yv),
            "__xx": pc.multiply_checked(xv, xv),
            "__yy": pc.multiply_checked(yv, yv),
        }).group_by([group], use_threads=False).aggregate(
            [("__x", "sum"), ("__y", "sum"), ("__xy", "sum"),
             ("__xx", "sum"), ("__yy", "sum"), ([], "count_all")])
        return out.rename_columns(
            [group, "__sx", "__sy", "__sxy", "__sxx", "__syy", "__n"])

    def per_bucket(g: pa.Table) -> pa.Table:
        # bucketed finisher, per-run Python-int merge (exactness contract
        # — see covariance_by_group.per_bucket)
        t = g.sort_by([(group, "ascending")])
        starts = np.flatnonzero(_adjacent_change_mask(t, [group]))
        bounds = np.append(starts, t.num_rows)
        pn = t.column("__n").to_pylist()
        psx = t.column("__sx").to_pylist()
        psy = t.column("__sy").to_pylist()
        psxy = t.column("__sxy").to_pylist()
        psxx = t.column("__sxx").to_pylist()
        psyy = t.column("__syy").to_pylist()
        ns, slopes, intercepts, r2s = [], [], [], []
        for i in range(len(starts)):
            lo, hi = bounds[i], bounds[i + 1]
            n = sum(pn[lo:hi])
            sx = sum(psx[lo:hi])
            sy = sum(psy[lo:hi])
            sxy = sum(psxy[lo:hi])
            sxx = sum(psxx[lo:hi])
            syy = sum(psyy[lo:hi])
            num = n * sxy - sx * sy
            den_x = n * sxx - sx * sx
            den_y = n * syy - sy * sy
            slope = intercept = r2 = None
            if den_x > 0:
                slope = float(num) / float(den_x)
                intercept = (float(sy) - slope * float(sx)) / float(n)
                if den_y > 0:
                    r2 = (float(num) / float(den_x)) \
                        * (float(num) / float(den_y))
            ns.append(n)
            slopes.append(slope)
            intercepts.append(intercept)
            r2s.append(r2)
        gcol = t.column(group)
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        return pa.table({
            group: gcol.take(pa.array(starts, pa.int64())),
            "n": pa.array(ns, type=pa.int64()),
            "slope": pa.array(slopes, type=pa.float64()),
            "intercept": pa.array(intercepts, type=pa.float64()),
            "r2": pa.array(r2s, type=pa.float64())})

    return bucketed_groups(
        ds.select_columns([group, x, y])
        .map_batches(partials, batch_format="pyarrow"),
        group, per_bucket, seed=17, num_partitions=num_partitions)


def _grouping_sets_counts(ds: Dataset, columns: "list[str]",
                          sets: "list[tuple[list[str], int]]",
                          id_col: str, count_col: str,
                          num_partitions: int | None) -> Dataset:
    """Shared GROUPING SETS count engine (rollup/cube): one count row
    per group per set, rolled-up columns null, ``id_col`` carrying the
    set id so real nulls stay distinguishable from rolled-up ones.

    Map-side combine: each batch collapses to per-set partial counts
    via one Arrow hash group_by per set over its own rows, so the
    shuffle carries at most the sum of per-set cardinalities per batch
    and hot groups collapse before moving; a null-safe hash-bucketed
    exchange + a polars finisher sum the partials (polars, NOT Arrow:
    pyarrow 16 hash grouping on >= 3 key columns with null keys
    re-creates the null group every 32 internal exec rows — pinned in
    test_rollup_counts_null_key_grouping)."""

    def partials(batch: pa.Table) -> pa.Table:
        t = batch.select(columns)
        parts = []
        for kept, sid in sets:
            if kept:
                agg = t.select(kept).group_by(
                    kept, use_threads=False).aggregate([([], "count_all")])
                cnt = agg.column("count_all")
                cols = {c: (agg.column(c) if c in kept
                            else pa.nulls(agg.num_rows,
                                          t.schema.field(c).type))
                        for c in columns}
            else:
                cnt = pa.array([batch.num_rows], pa.int64())
                cols = {c: pa.nulls(1, t.schema.field(c).type)
                        for c in columns}
            cols[id_col] = pa.array(
                np.full(len(cnt), sid, dtype=np.int64))
            cols["__cnt"] = pc.cast(cnt, pa.int64())
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    def bucketize(batch: pa.Table) -> pa.Table:
        # null-safe combined key hash: Ray's sort-based groupby cannot
        # order null string keys, so the exchange keys on one int bucket
        from ..state.sketches import hash64
        h = batch.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        for c in columns:
            h = h * np.uint64(1099511628211) + hash64(batch.column(c),
                                                      seed=31)
        return batch.append_column(
            "__b", pa.array((h % np.uint64(64)).astype(np.int64)))

    def finish(g: pa.Table) -> pa.Table:
        import polars as pl
        agg = (pl.from_arrow(g.select([*columns, id_col, "__cnt"]))
               .group_by([*columns, id_col])
               .agg(pl.col("__cnt").sum().alias(count_col))
               .to_arrow())
        cols = {c: agg.column(c).cast(g.schema.field(c).type)
                for c in [*columns, id_col]}
        cols[count_col] = agg.column(count_col).cast(pa.int64())
        return pa.table(cols)

    return (ds.select_columns(columns)
            .map_batches(partials, batch_format="pyarrow")
            .map_batches(bucketize, batch_format="pyarrow")
            .groupby("__b", num_partitions=num_partitions)
            .map_groups(finish, batch_format="pyarrow"))


def rollup_counts(ds: Dataset, columns: "list[str]",
                  count_col: str = "n",
                  num_partitions: int | None = None) -> Dataset:
    """SQL ``GROUP BY ROLLUP(columns)`` counts: one count row per group
    at EVERY prefix level — (c1, ..., ck), ..., (c1), () — with the
    rolled-up columns null and ``__level`` (number of grouping columns
    kept) playing SQL GROUPING()'s disambiguation role."""
    if not columns:
        raise ValueError("rollup_counts: columns must be non-empty")
    k = len(columns)
    sets = [(columns[:lvl], lvl) for lvl in range(k, -1, -1)]
    return _grouping_sets_counts(ds, columns, sets, "__level", count_col,
                                 num_partitions)


def cube_counts(ds: Dataset, columns: "list[str]",
                count_col: str = "n",
                num_partitions: int | None = None) -> Dataset:
    """SQL ``GROUP BY CUBE(columns)`` counts: one count row per group
    for EVERY column subset (2^k sets).  ``__grouping`` is the SQL
    ``GROUPING(c1, ..., ck)`` bitmask — bit for column i set when the
    column is rolled up, leftmost column most significant."""
    if not columns:
        raise ValueError("cube_counts: columns must be non-empty")
    k = len(columns)
    if k > 8:
        raise ValueError("cube_counts: 2^k sets — cap columns at 8")
    sets = []
    for mask in range(1 << k):
        kept = [c for i, c in enumerate(columns)
                if not (mask >> (k - 1 - i)) & 1]
        sets.append((kept, mask))
    return _grouping_sets_counts(ds, columns, sets, "__grouping",
                                 count_col, num_partitions)


def transition_counts(ds: Dataset, key: str, order_by, state_col: str,
                      num_buckets: int = 64,
                      num_partitions: int | None = None) -> Dataset:
    """First-order transition (Markov edge) counts: how often state A is
    IMMEDIATELY followed by state B within a key's ordered run — the
    journey/flow aggregation behind Sankey diagrams and next-event
    models.  SQL: ``LAG(state) OVER (PARTITION BY key ORDER BY ...)``
    then ``GROUP BY prev, state``.

    Scale shape: the lag_lead exchange (hash(key) % num_buckets), per
    bucket one sort + a run-boundary-masked shift, then each bucket
    collapses to (prev, state, partial count) — only distinct
    transition pairs per bucket reach the final tiny groupby."""
    from ..state.sketches import hash64

    if isinstance(order_by, str):
        order_by = [order_by]
    spec = [(key, "ascending"), *[(c, "ascending") for c in order_by]]
    bucket_col = "__transbucket__"

    def bucketize(batch: pa.Table) -> pa.Table:
        h = hash64(batch.column(key), seed=11) % np.uint64(num_buckets)
        return batch.append_column(
            bucket_col, pa.array(h.astype(np.int64), type=pa.int64()))

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.sort_by(spec)
        keys = g.column(key).to_numpy(zero_copy_only=False)
        n = len(keys)
        same_run = np.zeros(n, dtype=bool)
        same_run[1:] = ~_neq_adjacent(keys)
        idx = np.flatnonzero(same_run)
        state = g.column(state_col)
        pairs = pa.table({
            "prev_state": pc.take(state, pa.array(idx - 1, pa.int64())),
            "next_state": pc.take(state, pa.array(idx, pa.int64()))})
        agg = pairs.group_by(["prev_state", "next_state"],
                             use_threads=False).aggregate(
            [([], "count_all")])
        return agg.rename_columns(["prev_state", "next_state", "__cnt"])

    def sum_pairs(g: pa.Table) -> pa.Table:
        # bucketed pair-sum finisher (hash((prev, next)) % buckets, one
        # reduceat per bucket — also null-state safe, unlike a raw
        # string-pair sort groupby)
        t = g.sort_by([("prev_state", "ascending"),
                       ("next_state", "ascending")])
        starts = np.flatnonzero(
            _adjacent_change_mask(t, ["prev_state", "next_state"]))
        cnt = t.column("__cnt").to_numpy(
            zero_copy_only=False).astype(np.int64)
        sums = (np.add.reduceat(cnt, starts) if len(starts)
                else np.zeros(0, dtype=np.int64))
        idx = pa.array(starts, pa.int64())
        prev = t.column("prev_state")
        nxt = t.column("next_state")
        if isinstance(prev, pa.ChunkedArray):
            prev = prev.combine_chunks()
        if isinstance(nxt, pa.ChunkedArray):
            nxt = nxt.combine_chunks()
        return pa.table({"prev_state": prev.take(idx),
                         "next_state": nxt.take(idx),
                         "n": pa.array(sums, pa.int64())})

    partial_pairs = (ds.select_columns([key, *order_by, state_col])
                     .map_batches(bucketize, batch_format="pyarrow")
                     .groupby(bucket_col, num_partitions=num_partitions)
                     .map_groups(per_bucket, batch_format="pyarrow"))
    return bucketed_groups(partial_pairs, ["prev_state", "next_state"],
                           sum_pairs, seed=23,
                           num_partitions=num_partitions)


def standardize_by_group(ds: Dataset, group: str, value: str,
                         method: str = "zscore",
                         out: str | None = None,
                         num_partitions: int | None = None) -> Dataset:
    """Per-group feature standardization over an INTEGER column (cast
    floats to fixed-point units upstream, the covariance contract):
    ``zscore`` appends ``(x - mean) / stddev_pop``, ``minmax`` appends
    ``(x - min) / (max - min)`` — the scaling step before ML training.
    Constant groups yield null.

    Bit-reproducibility: group stats come from exact integer sums /
    mins / maxes (map-side Arrow group_by partials — only tiny stat
    rows shuffle), and the per-row float is the literal IEEE sequence
    an SQL oracle spells (divisions of exactly-representable ints +
    correctly-rounded sqrt).  Two passes: a tiny stats groupby, then a
    shuffle-free broadcast-probe scan (stats ride a ray.put table)."""
    import math

    import ray

    if method not in ("zscore", "minmax"):
        raise ValueError(f"standardize_by_group: unknown method {method!r}")
    out = out or f"{value}_{method}"

    def partials(batch: pa.Table) -> pa.Table:
        xv = pc.cast(batch.column(value), pa.int64())
        t = pa.table({group: batch.column(group), "__x": xv,
                      "__xx": pc.multiply_checked(xv, xv)})
        agg = t.group_by([group], use_threads=False).aggregate(
            [("__x", "sum"), ("__xx", "sum"), ("__x", "min"),
             ("__x", "max"), ([], "count_all")])
        return agg.rename_columns([group, "__sx", "__sxx", "__mn",
                                   "__mx", "__n"])

    def per_bucket(g: pa.Table) -> pa.Table:
        # bucketed stats merge, per-run Python-int sums (exactness
        # contract — see covariance_by_group.per_bucket)
        t = g.sort_by([(group, "ascending")])
        starts = np.flatnonzero(_adjacent_change_mask(t, [group]))
        bounds = np.append(starts, t.num_rows)
        pn = t.column("__n").to_pylist()
        psx = t.column("__sx").to_pylist()
        psxx = t.column("__sxx").to_pylist()
        pmn = t.column("__mn").to_pylist()
        pmx = t.column("__mx").to_pylist()
        ns, sxs, sxxs, mns, mxs = [], [], [], [], []
        for i in range(len(starts)):
            lo, hi = bounds[i], bounds[i + 1]
            ns.append(sum(pn[lo:hi]))
            sxs.append(sum(psx[lo:hi]))
            sxxs.append(sum(psxx[lo:hi]))
            mns.append(min(pmn[lo:hi]))
            mxs.append(max(pmx[lo:hi]))
        gcol = t.column(group)
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        return pa.table({group: gcol.take(pa.array(starts, pa.int64())),
                         "__n": pa.array(ns, pa.int64()),
                         "__sx": pa.array(sxs, pa.int64()),
                         "__sxx": pa.array(sxxs, pa.int64()),
                         "__mn": pa.array(mns, pa.int64()),
                         "__mx": pa.array(mxs, pa.int64())})

    stats = bucketed_groups(
        ds.select_columns([group, value])
        .map_batches(partials, batch_format="pyarrow"),
        group, per_bucket, seed=17,
        num_partitions=num_partitions).take_all()

    lookup = {}
    for r in stats:
        n, sx, sxx = r["__n"], r["__sx"], r["__sxx"]
        mn, mx = r["__mn"], r["__mx"]
        if method == "zscore":
            var = (sxx / n) - (sx / n) * (sx / n)
            lookup[r[group]] = ((sx / n, math.sqrt(var))
                                if var > 0 else None)
        else:
            lookup[r[group]] = ((float(mn), float(mx - mn))
                                if mx > mn else None)
    ref = ray.put(lookup)

    def score(batch: pa.Table) -> pa.Table:
        table = ray.get(ref)
        keys = batch.column(group).to_numpy(zero_copy_only=False)
        x = pc.cast(batch.column(value), pa.int64()) \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        outv = np.empty(len(keys), dtype=np.float64)
        mask = np.zeros(len(keys), dtype=bool)
        # vectorize per group present in the batch (groups are few)
        for k in set(keys.tolist()):
            sel = keys == k
            st = table.get(k)
            if st is None:
                mask |= sel
            else:
                a, b = st
                outv[sel] = (x[sel] - a) / b
        return batch.append_column(
            out, pa.array(outv, pa.float64(), mask=mask))

    return ds.map_batches(score, batch_format="pyarrow")


def list_value_counts(ds: Dataset, list_column: str,
                      out_value: str = "value", out_count: str = "cnt",
                      bounded_range: "tuple[int, int] | None" = None,
                      num_partitions: "int | None" = None) -> Dataset:
    """Frequency of every element across a list column (token-id
    histogram over pre-tokenized sequences, tag counts, ...): SQL
    ``SELECT t, COUNT(*) FROM tbl, UNNEST(col) AS u(t) GROUP BY t``.

    Two scale shapes:

    - ``bounded_range=(lo, hi)`` (token ids, categorical codes): each
      batch flattens ZERO-COPY and emits ONE fixed-size np.bincount
      vector row — value-cardinality-independent, like the DSIR count
      vectors — and a single constant-key reduce sums the vectors on a
      worker (tree-reduce by vector segment at 100 TB; the driver never
      sees partials).  NO per-key shuffle at all — measured 15x faster
      than the groupby path on a 50k-id vocab.  Out-of-range elements
      raise (silent truncation would corrupt counts); null elements are
      not counted in this mode.
    - unbounded (strings, arbitrary ints): per-batch Arrow hash group_by
      collapses to one (value, count) row per DISTINCT element per
      block, then one combining groupby sums partials.  Null elements
      count under a null value.
    """
    from ray.data.aggregate import Sum

    if bounded_range is not None:
        lo, hi = int(bounded_range[0]), int(bounded_range[1])
        width = hi - lo
        if width <= 0:
            raise ValueError("list_value_counts: empty bounded_range")

        def vec_partial(batch: pa.Table) -> pa.Table:
            col = batch.column(list_column)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            flat = col.flatten()
            if flat.null_count:
                flat = flat.drop_null()
            v = flat.to_numpy(zero_copy_only=False).astype(np.int64)
            if len(v) and (v.min() < lo or v.max() >= hi):
                raise ValueError(
                    f"list_value_counts: element outside bounded_range "
                    f"[{lo}, {hi})")
            counts = np.bincount(v - lo, minlength=width)
            return pa.table({
                "__k": pa.array([0], pa.int8()),
                "__vec": pa.array([counts.astype(np.int64).tolist()],
                                  type=pa.list_(pa.int64()))})

        def vec_sum(g: pa.Table) -> pa.Table:
            col = g.column("__vec")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            mat = np.asarray(col.values, dtype=np.int64).reshape(
                g.num_rows, width)
            total = mat.sum(axis=0)
            nz = np.flatnonzero(total)
            return pa.table({
                out_value: pa.array(nz + lo, type=pa.int64()),
                out_count: pa.array(total[nz], type=pa.int64())})

        return (ds.select_columns([list_column])
                .map_batches(vec_partial, batch_format="pyarrow")
                .groupby("__k")
                .map_groups(vec_sum, batch_format="pyarrow"))

    def partials(batch: pa.Table) -> pa.Table:
        col = batch.column(list_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten()  # drops null lists, keeps null elements
        agg = pa.table({out_value: flat}).group_by(
            [out_value], use_threads=False).aggregate([([], "count_all")])
        return pa.table({
            out_value: agg.column(out_value),
            out_count: pc.cast(agg.column("count_all"), pa.int64())})

    return (ds.select_columns([list_column])
            .map_batches(partials, batch_format="pyarrow")
            .groupby(out_value, num_partitions=num_partitions)
            .aggregate(Sum(out_count, alias_name=out_count)))


def _grouped_flat_values(batch: pa.Table, list_column: str,
                         group_column: str, lo: int, hi: int,
                         op_name: str, null_group: "str | None" = None):
    """Shared prologue of the grouped bounded-list kernels
    (:func:`list_value_counts_by_group`, :func:`token_presence_by_group`):
    validate null lists/elements and the [lo, hi) element range, code the
    group column, and return ``(uniq_groups, values, gpos)`` where
    ``values`` is the flattened int64 element buffer and ``gpos`` its
    per-element group code.  ``null_group=None`` makes null group keys
    RAISE; a string folds them map-side (SQL COALESCE parity)."""
    col = batch.column(list_column)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        raise ValueError(f"{op_name}: null lists unsupported "
                         f"(filter or fill upstream)")
    flat = col.flatten()
    if flat.null_count:
        raise ValueError(f"{op_name}: null elements unsupported")
    grp = batch.column(group_column)
    if null_group is not None:
        grp = pc.fill_null(grp, pa.scalar(null_group, pa.string()))
    elif grp.null_count:
        raise ValueError(f"{op_name}: null group keys unsupported")
    gvals = grp.to_numpy(zero_copy_only=False)
    uniq, codes = np.unique(gvals, return_inverse=True)
    offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(offs - offs[0])
    v = flat.to_numpy(zero_copy_only=False).astype(np.int64)
    if len(v) and (v.min() < lo or v.max() >= hi):
        raise ValueError(f"{op_name}: element outside bounded_range "
                         f"[{lo}, {hi})")
    gpos = np.repeat(codes.astype(np.int64), lens)
    return uniq, v, gpos


def list_value_counts_by_group(ds: Dataset, list_column: str,
                               group_column: str,
                               bounded_range: "tuple[int, int]",
                               out_value: str = "value",
                               out_count: str = "cnt",
                               null_group: str = "") -> Dataset:
    """Per-group element frequency over a bounded list column — the
    per-source token-distribution diagnostic behind data-mixture
    decisions (which slice over/under-represents which vocabulary).
    SQL: ``SELECT g, t, COUNT(*) FROM tbl, UNNEST(col) u(t) GROUP BY
    g, t``.

    Scale shape: each batch collapses to ONE fixed-width bincount
    vector PER GROUP PRESENT (a single ``np.bincount`` over ``code *
    width + value`` — value-cardinality-independent, group count
    bounded by design: sources/langs, like DSIR buckets), then one
    groupby(group) merges O(batches) vectors per group with a matrix
    sum.  The exchange carries ``batches x groups`` vector rows, never
    element rows.  Null group keys fold to ``null_group`` map-side
    (SQL ``COALESCE`` parity — and Ray's sort groupby cannot order
    null strings); null LISTS or null elements raise (silent drops
    would corrupt per-group counts)."""
    lo, hi = int(bounded_range[0]), int(bounded_range[1])
    width = hi - lo
    if width <= 0:
        raise ValueError("list_value_counts_by_group: empty bounded_range")

    def vec_partial(batch: pa.Table) -> pa.Table:
        uniq, v, gpos = _grouped_flat_values(
            batch, list_column, group_column, lo, hi,
            "list_value_counts_by_group", null_group=null_group)
        counts = np.bincount(gpos * width + (v - lo),
                             minlength=len(uniq) * width)
        return pa.table({
            "__g": pa.array(uniq, pa.string()),
            "__vec": pa.array(
                counts.astype(np.int64).reshape(len(uniq), width).tolist(),
                type=pa.list_(pa.int64()))})

    def vec_sum(g: pa.Table) -> pa.Table:
        col = g.column("__vec")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mat = np.asarray(col.values, dtype=np.int64).reshape(
            g.num_rows, width)
        total = mat.sum(axis=0)
        nz = np.flatnonzero(total)
        n = len(nz)
        return pa.table({
            group_column: pa.array([g.column("__g")[0].as_py()] * n,
                                   pa.string()),
            out_value: pa.array(nz + lo, type=pa.int64()),
            out_count: pa.array(total[nz], type=pa.int64())})

    # groupby(raw group).map_groups = one Python call per GROUP — bounded
    # by design here (sources/langs), the sanctioned exception to the
    # bucketed-exchange rule
    return (ds.select_columns([list_column, group_column])
            .map_batches(vec_partial, batch_format="pyarrow")
            .groupby("__g")
            .map_groups(vec_sum, batch_format="pyarrow"))


def token_presence_by_group(ds: Dataset, list_column: str,
                            group_column: str,
                            bounded_range: "tuple[int, int]") -> pa.Table:
    """Exact per-group token-TYPE presence bitmaps over a bounded list
    column — the shared primitive of :func:`vocab_overlap_by_group` and
    :func:`vocab_growth_curve`.  One row per group:
    ``(group, bitmap: large_binary, n_tokens, n_types)``.

    Scale shape: each batch collapses to ONE packed presence bitmap per
    group present ((vocab+7)//8 bytes — 6.3 KB at a 50k vocab,
    value-cardinality-independent like the bincount vectors), merged
    with a bytewise OR in one bounded groupby(group) (group count
    bounded by design: sources/shards — the sanctioned per-group
    exception).  The driver holds O(groups) bitmaps.  Null lists/
    elements and out-of-range ids raise (presence of a silently-dropped
    id would corrupt the set algebra downstream)."""
    lo, hi = int(bounded_range[0]), int(bounded_range[1])
    width = hi - lo
    if width <= 0:
        raise ValueError("token_presence_by_group: empty bounded_range")
    nbytes = (width + 7) // 8

    def vec_partial(batch: pa.Table) -> pa.Table:
        uniq, v, gpos = _grouped_flat_values(
            batch, list_column, group_column, lo, hi,
            "token_presence_by_group")
        pres = np.zeros(len(uniq) * width, dtype=bool)
        pres[gpos * width + (v - lo)] = True
        packed = np.packbits(pres.reshape(len(uniq), width), axis=1,
                             bitorder="little")
        nt = np.bincount(gpos, minlength=len(uniq)).astype(np.int64)
        return pa.table({
            "__g": pa.array(uniq),
            "__bm": pa.array([p.tobytes() for p in packed],
                             pa.large_binary()),
            "__nt": pa.array(nt, pa.int64())})

    def or_merge(g: pa.Table) -> pa.Table:
        bms = g.column("__bm")
        mat = np.frombuffer(
            b"".join(b.as_py() for b in bms), dtype=np.uint8
        ).reshape(g.num_rows, nbytes)
        merged = np.bitwise_or.reduce(mat, axis=0)
        n_types = int(np.unpackbits(merged, bitorder="little").sum())
        nt = int(pc.sum(g.column("__nt")).as_py())
        return pa.table({
            "group": g.column("__g").slice(0, 1),
            "bitmap": pa.array([merged.tobytes()], pa.large_binary()),
            "n_tokens": pa.array([nt], pa.int64()),
            "n_types": pa.array([n_types], pa.int64())})

    rows = (ds.select_columns([list_column, group_column])
            .map_batches(vec_partial, batch_format="pyarrow")
            .groupby("__g")
            .map_groups(or_merge, batch_format="pyarrow")
            .take_all())  # O(groups) rows
    rows.sort(key=lambda r: r["group"])
    return pa.table({
        "group": pa.array([r["group"] for r in rows]),
        "bitmap": pa.array([r["bitmap"] for r in rows], pa.large_binary()),
        "n_tokens": pa.array([r["n_tokens"] for r in rows], pa.int64()),
        "n_types": pa.array([r["n_types"] for r in rows], pa.int64())})


def vocab_overlap_by_group(ds: Dataset, list_column: str,
                           group_column: str,
                           bounded_range: "tuple[int, int]") -> pa.Table:
    """Per-group-pair vocabulary overlap — the mixture-design diagnostic
    (does the code slice share a vocabulary with web, or fight it for id
    space?): for every UNORDERED group pair ``a < b``,
    ``(group_a, group_b, n_types_a, n_types_b, n_common, jaccard)``
    where jaccard = \\|types_a ∩ types_b\\| / \\|types_a ∪ types_b\\|.

    Exactness: all counts are exact int64 (bitmap AND/OR popcounts);
    ``jaccard`` is ONE IEEE int/int division, so the SQL replay
    (DISTINCT (group, token) self-join) is bit-exact.  Cost: ONE
    presence-bitmap pass (:func:`token_presence_by_group`) + O(groups^2)
    driver popcounts over (vocab/8)-byte bitmaps."""
    t = token_presence_by_group(ds, list_column, group_column,
                                bounded_range)
    groups = t.column("group").to_pylist()
    nt = t.column("n_types").to_pylist()
    bms = [np.frombuffer(b, dtype=np.uint8)
           for b in t.column("bitmap").to_pylist()]
    ga, gb, na, nb, nc, jac = [], [], [], [], [], []
    for i in range(len(groups)):
        for j in range(i + 1, len(groups)):
            common = int(np.unpackbits(bms[i] & bms[j],
                                       bitorder="little").sum())
            union = nt[i] + nt[j] - common
            ga.append(groups[i]); gb.append(groups[j])
            na.append(nt[i]); nb.append(nt[j]); nc.append(common)
            jac.append(common / union if union else 0.0)
    return pa.table({
        "group_a": pa.array(ga), "group_b": pa.array(gb),
        "n_types_a": pa.array(na, pa.int64()),
        "n_types_b": pa.array(nb, pa.int64()),
        "n_common": pa.array(nc, pa.int64()),
        "jaccard": pa.array(jac, pa.float64())})


def vocab_growth_curve(ds: Dataset, list_column: str, group_column: str,
                       bounded_range: "tuple[int, int]") -> pa.Table:
    """Heaps-law vocabulary growth curve: groups (shards) accumulate in
    sorted group order and each prefix reports the CUMULATIVE token and
    token-TYPE counts — how fast the vocabulary saturates as the corpus
    grows.  One row per prefix:
    ``(group, n_tokens_cum, n_types_cum)`` — all exact int64.

    The SQL replay avoids per-prefix DISTINCT blowup with the min-shard
    trick: a type's first-appearance shard m makes it count for every
    prefix >= m, so ``n_types_cum(g) = COUNT(*) WHERE min_shard <= g``
    — exactly the prefix-OR popcount the engine computes."""
    t = token_presence_by_group(ds, list_column, group_column,
                                bounded_range)
    bms = [np.frombuffer(b, dtype=np.uint8)
           for b in t.column("bitmap").to_pylist()]
    nt = t.column("n_tokens").to_pylist()
    acc = None
    cum_types, cum_tokens, running = [], [], 0
    for i, bm in enumerate(bms):
        acc = bm.copy() if acc is None else (acc | bm)
        running += nt[i]
        cum_tokens.append(running)
        cum_types.append(int(np.unpackbits(acc, bitorder="little").sum()))
    return pa.table({
        "group": t.column("group"),
        "n_tokens_cum": pa.array(cum_tokens, pa.int64()),
        "n_types_cum": pa.array(cum_types, pa.int64())})


def vocab_coverage(ds: Dataset, list_column: str,
                   bounded_range: "tuple[int, int]",
                   ks=(100, 1_000, 10_000)) -> pa.Table:
    """Tokenizer-audit coverage curve: for each ``k``, the fraction of
    all token OCCURRENCES covered by the ``k`` most frequent token TYPES
    (the classic head-heaviness diagnostic — a BPE vocab whose top-1k
    types cover 95% of occurrences wastes most of its id space; a flat
    curve means id pressure).  One row per k:
    ``(k, covered, total, n_distinct, coverage)``.

    Exactness: ``covered``/``total``/``n_distinct`` are exact int64;
    ``coverage`` is ONE IEEE division of those ints, so an SQL oracle
    (window ``ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC)`` +
    filtered sum) replays every value bit-exactly.  Ties rank by
    (count DESC, token ASC) — pinned to match the SQL ordering.

    Scale shape: ONE bounded-bincount pass (:func:`list_value_counts`'s
    fixed-size vector combine — the exchange carries O(batches) vectors,
    never element rows); the driver holds O(vocab) ints, the same bound
    the token_freq / DSIR ops already accept."""
    rows = list_value_counts(ds, list_column, out_value="token",
                             out_count="cnt",
                             bounded_range=bounded_range).take_all()
    tok = np.array([r["token"] for r in rows], dtype=np.int64)
    cnt = np.array([r["cnt"] for r in rows], dtype=np.int64)
    order = np.lexsort((tok, -cnt))           # cnt DESC, token ASC
    cum = np.cumsum(cnt[order])
    total = int(cum[-1]) if len(cum) else 0
    nd = len(tok)
    out_k, covered = [], []
    for k in ks:
        k = int(k)
        if k < 1:
            raise ValueError("vocab_coverage: k must be >= 1")
        out_k.append(k)
        covered.append(int(cum[min(k, nd) - 1]) if nd else 0)
    return pa.table({
        "k": pa.array(out_k, pa.int64()),
        "covered": pa.array(covered, pa.int64()),
        "total": pa.array([total] * len(out_k), pa.int64()),
        "n_distinct": pa.array([nd] * len(out_k), pa.int64()),
        "coverage": pa.array(
            [c / total if total else 0.0 for c in covered], pa.float64())})


def confusion_report(ds: Dataset, prob_column: str, label_column: str,
                     thresholds) -> Dataset:
    """Threshold-sweep classifier evaluation (the quality-filter
    calibration report: does a prob cutoff of 0.8 keep the precision the
    mixture plan assumes?).  For every threshold t: counts of
    ``prob >= t`` vs the boolean label (tp/fp/fn/tn) plus
    precision/recall/f1/accuracy.  SQL: one ``CASE`` aggregate per cell
    over ``probs JOIN labels``, thresholds from a literal list.

    Scale shape: ONE map pass — each batch bucketizes probs against the
    sorted threshold grid with a single ``np.searchsorted`` + two
    ``np.bincount`` histograms (per-label), so a batch collapses to
    ``len(thresholds)`` partial rows regardless of row count; one tiny
    groupby(thr) sums partials; rates are single IEEE divisions of
    exactly-summed int64 cells (the bit-exact float contract) computed
    in a final map over O(thresholds) rows.  Null labels count as False
    (SQL ``COALESCE`` parity); null probs raise (a silently dropped row
    would corrupt the counts)."""
    from ray.data.aggregate import Sum

    thr = np.asarray(sorted(float(t) for t in thresholds), np.float64)
    if len(thr) == 0 or len(np.unique(thr)) != len(thr):
        raise ValueError("confusion_report: thresholds must be non-empty "
                         "and distinct")
    T = len(thr)

    def partial(batch: pa.Table) -> pa.Table:
        p_arr = batch.column(prob_column)
        if p_arr.null_count:
            raise ValueError("confusion_report: null probabilities "
                             "unsupported (filter or fill upstream)")
        p = p_arr.to_numpy(zero_copy_only=False).astype(np.float64)
        y = (pc.fill_null(batch.column(label_column).cast(pa.bool_()),
                          False).to_numpy(zero_copy_only=False)
             .astype(bool))
        # idx = #thresholds <= p; pred-positive at thr[i] <=> idx >= i+1
        idx = np.searchsorted(thr, p, side="right")
        pos = np.bincount(idx[y], minlength=T + 1)
        neg = np.bincount(idx[~y], minlength=T + 1)
        tp = pos[::-1].cumsum()[::-1][1:]
        fp = neg[::-1].cumsum()[::-1][1:]
        n_pos = int(pos.sum())
        n_neg = int(neg.sum())
        return pa.table({
            "thr": pa.array(thr, pa.float64()),
            "tp": pa.array(tp, pa.int64()),
            "fp": pa.array(fp, pa.int64()),
            "fn": pa.array(n_pos - tp, pa.int64()),
            "tn": pa.array(n_neg - fp, pa.int64())})

    def rates(batch: pa.Table) -> pa.Table:
        tp = batch.column("tp").to_numpy(zero_copy_only=False)
        fp = batch.column("fp").to_numpy(zero_copy_only=False)
        fn = batch.column("fn").to_numpy(zero_copy_only=False)
        tn = batch.column("tn").to_numpy(zero_copy_only=False)

        def div(num, den):
            out = num.astype(np.float64)
            ok = den != 0
            out[ok] = num[ok].astype(np.float64) / den[ok]
            return pa.array(out, pa.float64(), mask=~ok)

        return pa.table({
            "thr": batch.column("thr"),
            "tp": pa.array(tp, pa.int64()),
            "fp": pa.array(fp, pa.int64()),
            "fn": pa.array(fn, pa.int64()),
            "tn": pa.array(tn, pa.int64()),
            "precision": div(tp, tp + fp),
            "recall": div(tp, tp + fn),
            "f1": div(2 * tp, 2 * tp + fp + fn),
            "accuracy": div(tp + tn, tp + fp + fn + tn)})

    return (ds.select_columns([prob_column, label_column])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("thr")
            .aggregate(Sum("tp", alias_name="tp"),
                       Sum("fp", alias_name="fp"),
                       Sum("fn", alias_name="fn"),
                       Sum("tn", alias_name="tn"))
            .map_batches(rates, batch_format="pyarrow"))
