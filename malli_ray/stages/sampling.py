"""Deterministic sampling stages: mixture rebalancing, train/valid/test
splits, output sharding, per-group outlier filtering.

Ray-native training-data operators (no reference analogue — malli is
single-value; these are north-rule "large-scale training-data pipeline"
additions): rebalance a corpus's group mixture (source/language/domain
shares) by DETERMINISTIC rate sampling, so reruns and resumes pick the
exact same rows and a SQL oracle can reproduce the selection bit-for-bit.

Selection rule: keep a row iff ``((id mod 2^32) * 2654435761) mod 2^32 <
threshold_g`` — Knuth's multiplicative hash (the 2^32/phi constant), a
well-mixed deterministic stand-in for a uniform draw that any SQL engine
can evaluate.  Thresholds derive from one tiny count-only groupby; the
payload never shuffles and the filter pass is shuffle-free.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count

logger = logging.getLogger(__name__)

#: Knuth multiplicative constant (closest odd integer to 2^32 / golden ratio)
KNUTH_MULT = 2654435761
_MOD = np.uint64(1) << np.uint64(32)


def quantile_cont(v_sorted: np.ndarray, ps) -> np.ndarray:
    """SQL ``quantile_cont`` with DuckDB's EXACT interpolation arithmetic:
    ``RN = q*(n-1); x[floor(RN)]*(ceil(RN)-RN) + x[ceil(RN)]*(RN-floor(RN))``
    (duckdb quantile interpolator).  ``np.quantile(method='linear')`` is
    the same mathematical definition but a DIFFERENT floating evaluation
    (numpy's lerp switches to ``b - (1-t)*(b-a)`` for t > 0.5 for
    accuracy), which diverges in the last bit — observed as a
    value-hash mismatch on 16/500 winsorize rows (497.1999999999999 vs
    ...93).  All quantile_cont-parity sites go through here so engine
    bounds are BIT-equal to the oracle's."""
    v = np.asarray(v_sorted, dtype=np.float64)
    ps = np.atleast_1d(np.asarray(ps, dtype=np.float64))
    n = len(v)
    if n == 0:
        return np.full(len(ps), np.nan)
    rn = ps * (n - 1)
    frn = np.floor(rn).astype(np.int64)
    crn = np.ceil(rn).astype(np.int64)
    out = np.empty(len(ps), dtype=np.float64)
    for i in range(len(ps)):
        if crn[i] == frn[i]:
            out[i] = v[frn[i]]
        else:
            out[i] = (v[frn[i]] * (crn[i] - rn[i])
                      + v[crn[i]] * (rn[i] - frn[i]))
    return out


def keep_mask(ids: np.ndarray, threshold) -> np.ndarray:
    """Deterministic per-row keep decision.

    ``(ids mod 2^32) * KNUTH_MULT`` never overflows uint64 (both factors
    < 2^32) and equals the full-product mod — identical to the SQL
    ``(id * 2654435761) % 4294967296`` for any id a BIGINT can square
    into (ids < ~3.4e9; beyond that SQL engines need the same pre-mod)."""
    h = ((ids.astype(np.uint64) % _MOD) * np.uint64(KNUTH_MULT)) % _MOD
    return h < np.asarray(threshold, dtype=np.uint64)


def group_thresholds(ds: Dataset, group_column: str) -> dict:
    """Per-group keep thresholds that downsample every group to ~ the
    smallest group's size (uniform target mixture).

    One count-only groupby (shuffles (group, partial_count) rows — the
    payload never moves); the result is one row per distinct group, so the
    driver-side collect is bounded by group cardinality (sources/languages
    — document the bound before pointing this at a high-cardinality key).

    threshold_g = floor(min_count / count_g * 2^32), computed with the
    same IEEE double ops a SQL oracle uses (divide, multiply, floor)."""
    rows = ds.groupby(group_column).aggregate(Count(alias_name="c")).take_all()
    if not rows:
        return {}
    min_c = min(r["c"] for r in rows)
    return {r[group_column]: int(np.floor(float(min_c) / float(r["c"])
                                          * 4294967296.0))
            for r in rows}


class _RebalanceFilter:
    """Per-batch deterministic filter against broadcast group thresholds."""

    def __init__(self, id_column: str, group_column: str, thresholds: dict):
        self.id_column = id_column
        self.group_column = group_column
        self.thresholds = dict(thresholds)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        ids = batch.column(self.id_column).to_numpy(zero_copy_only=False)
        groups = batch.column(self.group_column)
        if isinstance(groups, pa.ChunkedArray):
            groups = groups.combine_chunks()
        # dictionary-encode: the Python threshold lookup runs once per
        # DISTINCT group in the batch, the row-level gather is numpy
        enc = groups.dictionary_encode()
        per_value = np.array([self.thresholds.get(v, 0)
                              for v in enc.dictionary.to_pylist()],
                             dtype=np.uint64)
        idx = (enc.indices.fill_null(-1)
               .to_numpy(zero_copy_only=False).astype(np.int64))
        if len(per_value):
            thr = np.where(idx >= 0, per_value[np.maximum(idx, 0)],
                           np.uint64(0))
        else:  # all-null group column
            thr = np.zeros(len(ids), dtype=np.uint64)
        return batch.filter(pa.array(keep_mask(ids, thr)))


def rebalance_to_uniform(ds: Dataset, group_column: str, id_column: str,
                         concurrency=None) -> Dataset:
    """Downsample every group to approximately the smallest group's size
    (uniform mixture balancing — e.g. equalize sources or languages before
    training).  Deterministic: the same input always keeps the same rows,
    so resumes are idempotent and SQL oracles reproduce the selection.

    Two passes: a count-only groupby (tiny — one row per group), then one
    shuffle-free vectorized filter with the thresholds in the actor
    closure (a dict of group -> int; broadcast-by-closure is fine at this
    cardinality, ray.put for larger maps)."""
    from . import cached_stage, concurrency_kwargs
    thresholds = group_thresholds(ds, group_column)
    logger.info("rebalance_to_uniform: %d groups, thresholds %s",
                len(thresholds), thresholds)
    return ds.map_batches(
        cached_stage(_RebalanceFilter, id_column=id_column,
                     group_column=group_column, thresholds=thresholds),
        batch_format="pyarrow", **concurrency_kwargs(concurrency))


def temperature_thresholds(counts: dict, alpha: float = 0.5,
                           target_total: "int | None" = None) -> dict:
    """Per-group keep thresholds for temperature-based mixture sampling
    (the multilingual-LM pattern: sample group g with probability
    proportional to ``count_g ** alpha`` — alpha=1 preserves the natural
    mixture, alpha=0 is uniform, 0.3-0.7 up-weights the tail).

    Derivation is INTEGER-exact for alpha=0.5: weights are ``isqrt(c)``
    (floor of the IEEE-correctly-rounded sqrt, so any SQL engine computes
    the identical integer), and ``threshold_g = min(2^32, (N * w_g * 2^32)
    // (c_g * sum(w)))`` uses only integer multiply/floor-divide — no
    float summation whose order could differ between engines.  Other
    alphas take the float ``floor(c ** alpha)`` weight (numpy pow and SQL
    POWER may disagree in the last ulp — in-process use only).  Groups can
    only be DOWN-sampled (rate capped at 1); ``target_total`` defaults to
    the input row count."""
    import math
    if not counts:
        return {}
    n = int(target_total) if target_total is not None \
        else int(sum(counts.values()))
    if alpha == 0.5:
        w = {g: math.isqrt(int(c)) for g, c in counts.items()}
    elif alpha == 1.0:
        w = {g: int(c) for g, c in counts.items()}
    else:
        w = {g: int(np.floor(float(c) ** alpha)) for g, c in counts.items()}
    s = sum(w.values())
    out = {}
    for g, c in counts.items():
        if c <= 0 or s == 0:
            out[g] = 0
            continue
        out[g] = min((n * w[g] * 4294967296) // (int(c) * s), 4294967296)
    return out


def rebalance_by_temperature(ds: Dataset, group_column: str, id_column: str,
                             alpha: float = 0.5,
                             target_total: "int | None" = None,
                             concurrency=None) -> Dataset:
    """Temperature-based mixture sampling: downsample each group toward a
    ``count ** alpha`` share of ``target_total`` rows, deterministically
    (same Knuth-hash selection rule as :func:`rebalance_to_uniform`, so
    reruns/resumes keep identical rows and SQL reproduces the selection
    bit-for-bit at alpha=0.5).

    Scale shape: ONE count-only groupby (a row per group), thresholds in
    the actor closure, then a shuffle-free vectorized filter — the payload
    never moves."""
    from . import cached_stage, concurrency_kwargs
    rows = ds.groupby(group_column).aggregate(Count(alias_name="c")).take_all()
    counts = {r[group_column]: r["c"] for r in rows}
    thresholds = temperature_thresholds(counts, alpha=alpha,
                                        target_total=target_total)
    logger.info("rebalance_by_temperature(alpha=%s): %d groups, "
                "thresholds %s", alpha, len(thresholds), thresholds)
    return ds.map_batches(
        cached_stage(_RebalanceFilter, id_column=id_column,
                     group_column=group_column, thresholds=thresholds),
        batch_format="pyarrow", **concurrency_kwargs(concurrency))


def sample_k_by_hash(ds: Dataset, id_column: str, k: int,
                     seed: int = 0) -> Dataset:
    """Deterministic exact-k global sample: the ``k`` rows with the
    smallest seeded Knuth hash of their id (ties by id) — the
    order-independent, resume-stable alternative to reservoir sampling
    (a reservoir's pick depends on encounter order; this one is a pure
    function of the row set).

    Scale shape: map-side partial top-k per batch (at most k rows survive
    each block — one Arrow sort + slice, no shuffle of the rest), then one
    tiny global sort+limit over the <= k * n_blocks survivors.  SQL parity:
    ``ORDER BY ((id + seed) % 2^32) * 2654435761 % 2^32, id LIMIT k``."""

    def add_key(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        h = (((ids.astype(np.uint64) + np.uint64(seed)) % _MOD)
             * np.uint64(KNUTH_MULT)) % _MOD
        t = batch.append_column(
            "__sample_h__", pa.array(h.astype(np.int64), type=pa.int64()))
        if t.num_rows > k:
            t = t.sort_by([("__sample_h__", "ascending"),
                           (id_column, "ascending")]).slice(0, k)
        return t

    return (ds.map_batches(add_key, batch_format="pyarrow")
            .sort(["__sample_h__", id_column]).limit(k)
            .drop_columns(["__sample_h__"]))


def sample_k_per_group(ds: Dataset, group_column: str, id_column: str,
                       k: int, seed: int = 0,
                       num_partitions: int | None = None) -> Dataset:
    """Deterministic exact-k sample PER GROUP: for every ``group_column``
    value, the ``k`` rows with the smallest seeded Knuth hash of their id
    (ties by id) — the per-group sibling of :func:`sample_k_by_hash`, and
    the resume-stable replacement for per-group reservoir sampling (a pure
    function of the row set, independent of encounter order and
    partitioning).

    Scale shape (rides ``analytics.top_k_per_group``): each batch is cut
    to its own per-group k first (one Arrow sort + vectorized run-position
    scan), so the shuffle moves at most ``k x groups`` rows per batch —
    skew-safe, a hot group ships k rows per batch, not its volume.  SQL
    parity: ``QUALIFY ROW_NUMBER() OVER (PARTITION BY group ORDER BY
    ((id + seed) % 2^32) * 2654435761 % 2^32, id) <= k``."""
    from .analytics import top_k_per_group

    def add_key(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        h = (((ids.astype(np.uint64) + np.uint64(seed)) % _MOD)
             * np.uint64(KNUTH_MULT)) % _MOD
        return batch.append_column(
            "__sample_h__", pa.array(h.astype(np.int64), type=pa.int64()))

    out = top_k_per_group(
        ds.map_batches(add_key, batch_format="pyarrow"), group_column,
        ["__sample_h__", id_column], k, descending=False,
        num_partitions=num_partitions)
    return out.drop_columns(["__sample_h__"])


def global_shuffle(ds: Dataset, id_column: str, seed: int = 0,
                   key_col: str = "shuffle_key",
                   keep_key: bool = False) -> Dataset:
    """Deterministic global shuffle: order rows by the seeded Knuth hash of
    their id (ties broken by id) via Ray Data's distributed range-partition
    sort — the pre-training corpus shuffle, but reproducible: the same
    (input, seed) always yields the same permutation, so a resumed or
    re-run job trains on the identical order (``ds.random_shuffle`` is
    nondeterministic across runs/cluster shapes).  Different epochs =
    different seeds.

    Scale shape: ONE all-to-all exchange (the sort), with only the 4-byte
    key added per row; the key column is dropped after the sort unless
    ``keep_key``.  SQL parity: ``ORDER BY ((id + seed) % 2^32) *
    2654435761 % 2^32, id``."""

    def add_key(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        h = (((ids.astype(np.uint64) + np.uint64(seed)) % _MOD)
             * np.uint64(KNUTH_MULT)) % _MOD
        return batch.append_column(
            key_col, pa.array(h.astype(np.int64), type=pa.int64()))

    out = (ds.map_batches(add_key, batch_format="pyarrow")
           .sort([key_col, id_column]))
    if keep_key:
        return out
    return out.drop_columns([key_col])


def _group_bounds_bucketed(ds: Dataset, group_column: str,
                           value_column: str, per_run) -> dict:
    """Shared driver-dict finisher for the per-group exact-quantile bounds
    family: a ``hash(group) % num_buckets`` exchange (never one Python
    ``map_groups`` call per distinct group), per bucket ONE (group, value)
    sort, then ``per_run(values)`` on each group's non-null value slice —
    the literal original per-group computation, so results are bit
    identical.  Output is driver-collected: one (lo, hi) per group (bounded
    by group cardinality, same caveat as group_thresholds)."""
    from .analytics import _adjacent_change_mask, bucketed_groups

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.filter(pc.is_valid(g.column(value_column)))
        if t.num_rows == 0:
            return pa.table({
                group_column: t.column(group_column),
                "lo": pa.array([], type=pa.float64()),
                "hi": pa.array([], type=pa.float64())})
        t = t.sort_by([(group_column, "ascending"),
                       (value_column, "ascending")])
        starts = np.flatnonzero(_adjacent_change_mask(t, [group_column]))
        bounds_ix = np.append(starts, t.num_rows)
        v = t.column(value_column).to_numpy(zero_copy_only=False)
        los, his = [], []
        for i in range(len(starts)):
            lo, hi = per_run(v[bounds_ix[i]:bounds_ix[i + 1]])
            los.append(lo)
            his.append(hi)
        gcol = t.column(group_column)
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        return pa.table({
            group_column: gcol.take(pa.array(starts, pa.int64())),
            "lo": pa.array(los, type=pa.float64()),
            "hi": pa.array(his, type=pa.float64())})

    rows = bucketed_groups(
        ds.select_columns([group_column, value_column]),
        group_column, per_bucket, seed=17).take_all()
    return {r[group_column]: (r["lo"], r["hi"]) for r in rows
            if r["lo"] is not None}


def group_iqr_bounds(ds: Dataset, group_column: str, value_column: str,
                     k: float = 1.5) -> dict:
    """Per-group Tukey fences: ``[q1 - k*IQR, q3 + k*IQR]`` from EXACT
    per-group quantiles (sort-based ``np.quantile`` linear interpolation —
    the same definition as SQL ``quantile_cont``, so the bounds and
    therefore the filter are value-reproducible by an oracle).

    One groupby on (group, value) only — the payload never shuffles; the
    result is one row per group, driver-collected (bounded by group
    cardinality, same caveat as group_thresholds)."""

    def per_run(v: np.ndarray) -> "tuple[float, float]":
        q1, q3 = quantile_cont(np.sort(v), [0.25, 0.75])
        return q1 - k * (q3 - q1), q3 + k * (q3 - q1)

    return _group_bounds_bucketed(ds, group_column, value_column, per_run)


class _OutlierFilter:
    """Per-batch Tukey-fence filter against broadcast per-group bounds."""

    def __init__(self, group_column: str, value_column: str, bounds: dict):
        self.group_column = group_column
        self.value_column = value_column
        self.bounds = dict(bounds)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        groups = batch.column(self.group_column)
        if isinstance(groups, pa.ChunkedArray):
            groups = groups.combine_chunks()
        enc = groups.dictionary_encode()
        per_lo = np.array([self.bounds.get(v, (np.inf, -np.inf))[0]
                           for v in enc.dictionary.to_pylist()])
        per_hi = np.array([self.bounds.get(v, (np.inf, -np.inf))[1]
                           for v in enc.dictionary.to_pylist()])
        idx = (enc.indices.fill_null(-1)
               .to_numpy(zero_copy_only=False).astype(np.int64))
        vals = batch.column(self.value_column)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        v = np.asarray(vals.cast(pa.float64()).to_numpy(
            zero_copy_only=False))
        known = idx >= 0
        safe = np.maximum(idx, 0)
        if len(per_lo):
            keep = (known & ~np.isnan(v)
                    & (v >= per_lo[safe]) & (v <= per_hi[safe]))
        else:
            keep = np.zeros(batch.num_rows, dtype=bool)
        return batch.filter(pa.array(keep))


def filter_outliers_by_group(ds: Dataset, group_column: str,
                             value_column: str, k: float = 1.5,
                             concurrency=None) -> Dataset:
    """Drop rows whose ``value_column`` falls outside the group's Tukey
    fences (``q1 - k*IQR`` .. ``q3 + k*IQR``) — the classic per-source /
    per-language length-distribution quality filter.

    Two passes: exact per-group quantiles on projected (group, value)
    columns (one small shuffle), then a shuffle-free broadcast-bounds
    filter.  Null values and groups absent from the bounds drop (inner
    semantics, matching a SQL join against the bounds table)."""
    from . import cached_stage, concurrency_kwargs
    bounds = group_iqr_bounds(ds, group_column, value_column, k=k)
    logger.info("filter_outliers_by_group: %d groups", len(bounds))
    return ds.map_batches(
        cached_stage(_OutlierFilter, group_column=group_column,
                     value_column=value_column, bounds=bounds),
        batch_format="pyarrow", **concurrency_kwargs(concurrency))


def poisson_bootstrap_thresholds(max_k: int = 8) -> "list[int]":
    """Cumulative Poisson(1) CDF thresholds scaled to 2^32 ints: a row
    whose Knuth-hash draw lands between thresholds k-1 and k gets
    replicate count k.  Driver-side math.exp/factorial scalars (the
    shared-libm contract); the tail past ``max_k`` (~1e-6 at 8) folds
    into the last bucket — the SQL oracle embeds the SAME literals, so
    the truncation is part of the pinned spec, not an approximation
    gap."""
    import math
    acc, out, fact = 0.0, [], 1.0
    for k in range(max_k):
        if k:
            fact *= k
        acc += math.exp(-1.0) / fact
        out.append(int(math.floor(acc * 4294967296.0)))
    return out


def poisson_bootstrap(ds: Dataset, id_column: str, replicate: int = 0,
                      out: str = "n_boot", max_k: int = 8,
                      concurrency=None) -> Dataset:
    """Deterministic Poisson(1) bootstrap replicate weights — the
    streaming bootstrap (Chamandy et al. / online bootstrap): each row's
    weight in replicate ``r`` is an iid-ish Poisson(1) draw derived from
    ``hash(id + r * PRIME)``, so any worker recomputes the same weights
    with no stored RNG state, resamples never materialize (downstream
    aggregates multiply by ``n_boot``), and a SQL oracle replays the
    draw from the same integer thresholds.  Shuffle-free."""
    from . import concurrency_kwargs
    thresholds = np.asarray(poisson_bootstrap_thresholds(max_k),
                            dtype=np.uint64)
    salt = np.uint64(replicate) * np.uint64(0x9E3779B97F4A7C15)

    def weigh(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_numpy(
            zero_copy_only=False).astype(np.uint64)
        h = (((ids + salt) % _MOD) * np.uint64(KNUTH_MULT)) % _MOD
        k = np.searchsorted(thresholds, h, side="right")
        return batch.append_column(out,
                                   pa.array(k.astype(np.int64)))

    return ds.map_batches(weigh, batch_format="pyarrow",
                          **concurrency_kwargs(concurrency))


def upsample_by_group_factor(ds: Dataset, group_column: str, id_column: str,
                             factors: "dict[str, float]",
                             default_factor: float = 1.0,
                             epoch_col: str = "epoch",
                             concurrency=None) -> Dataset:
    """Fractional epoch up/down-sampling per group — the training-mixture
    primitive ("repeat books 2.5x, halve web"): every row is emitted
    ``floor(f_g)`` times plus one extra copy iff its Knuth-hash draw is
    below ``frac(f_g)``, with a 0-based copy index in ``epoch_col``.
    Factors < 1 downsample (0 base copies + a Bernoulli(f) survivor), so
    one op expresses a full mixture spec.

    Deterministic and SQL-replayable: the per-group (base, threshold)
    pair is computed ONCE driver-side (``floor(f)``,
    ``floor((f - floor(f)) * 2^32)``) and the per-row draw is the
    engine-standard ``hash(id) < threshold`` mask, so reruns emit the
    identical multiset and the oracle replays it with a VALUES join +
    ``range()`` expansion.

    Shuffle-free flat expansion (``take`` with repeated indices — payload
    copies are created batch-locally and stream); expected output volume
    is ``sum_g f_g * n_g`` — budget downstream stages accordingly."""
    from . import concurrency_kwargs
    import math

    spec = {}
    for g, f in factors.items():
        if f < 0:
            raise ValueError(f"factor for {g!r} must be >= 0, got {f}")
        base = math.floor(f)
        spec[g] = (base, int(math.floor((f - base) * 4294967296.0)))
    dbase = math.floor(default_factor)
    dspec = (dbase,
             int(math.floor((default_factor - dbase) * 4294967296.0)))

    def expand(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(epoch_col,
                                       pa.array([], type=pa.int64()))
        groups = batch.column(group_column)
        if isinstance(groups, pa.ChunkedArray):
            groups = groups.combine_chunks()
        enc = groups.dictionary_encode()
        per_value = [spec.get(v, dspec)
                     for v in enc.dictionary.to_pylist()]
        base_v = np.array([b for b, _ in per_value], dtype=np.int64)
        thr_v = np.array([t for _, t in per_value], dtype=np.uint64)
        idx = (enc.indices.fill_null(-1)
               .to_numpy(zero_copy_only=False).astype(np.int64))
        ok = idx >= 0
        base = np.where(ok, base_v[np.maximum(idx, 0)], np.int64(dspec[0]))
        thr = np.where(ok, thr_v[np.maximum(idx, 0)], np.uint64(dspec[1]))
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        k = base + keep_mask(ids, thr).astype(np.int64)
        rows = np.repeat(np.arange(batch.num_rows, dtype=np.int64), k)
        epoch = np.arange(len(rows), dtype=np.int64) \
            - np.repeat(np.cumsum(k) - k, k)
        return (batch.take(pa.array(rows))
                .append_column(epoch_col, pa.array(epoch)))

    return ds.map_batches(expand, batch_format="pyarrow",
                          **concurrency_kwargs(concurrency))


def sample_by_weight(ds: Dataset, weight_column: str, id_column: str,
                     rate_at_max: float = 1.0,
                     concurrency=None) -> Dataset:
    """Deterministic weight-proportional Bernoulli sampling: keep each row
    with probability ``rate_at_max * w / max(w)`` — quality-weighted
    downsampling (keep high-quality docs more often) with the engine's
    standard Knuth-hash draw, so reruns/resumes select the exact same rows
    and a SQL oracle reproduces the selection bit-for-bit.

    Threshold float contract (the split_documents/rebalance discipline):
    ``floor((rate * (w / max_w)) * 2^32)`` evaluated in exactly that IEEE
    op order — divide, multiply, multiply, floor — which SQL spells
    ``FLOOR((rate * (CAST(w AS DOUBLE) / max_w)) * 4294967296.0)``.  Null
    or non-positive weights never keep.

    Scale shape: one max-only aggregate (a scalar), then a shuffle-free
    vectorized filter pass.  Expected sample size is ``rate * sum(w) /
    max(w)`` — for exact-k weighted selection order by a priority key
    instead (see sample_k_by_hash for the unweighted sibling)."""
    from ray.data.aggregate import Max

    from . import concurrency_kwargs
    if not (0.0 < rate_at_max <= 1.0):
        raise ValueError(f"rate_at_max must be in (0, 1], got {rate_at_max}")
    agg = ds.aggregate(Max(weight_column))
    max_w = agg[f"max({weight_column})"]
    if max_w is None or float(max_w) <= 0:
        return ds.filter(lambda row: False)
    max_w = float(max_w)

    def keep(batch: pa.Table) -> pa.Table:
        w = batch.column(weight_column).to_numpy(zero_copy_only=False)
        w = np.nan_to_num(w.astype(np.float64), nan=0.0)
        thr = np.floor((rate_at_max * (w / max_w))
                       * 4294967296.0).astype(np.int64)
        thr = np.maximum(thr, 0).astype(np.uint64)
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(keep_mask(ids, thr)))

    return ds.map_batches(keep, batch_format="pyarrow",
                          **concurrency_kwargs(concurrency))


def top_fraction_by_group(ds: Dataset, group_column: str, score_column: str,
                          id_column: str, fraction: float,
                          descending: bool = True, rank_col: str = "rk",
                          num_partitions: int | None = None) -> Dataset:
    """Keep the top ``ceil(fraction * n_g)`` rows of every group ranked by
    ``score_column`` (descending by default; ``id_column`` breaks ties
    deterministically) — percentile-based data selection ("keep the best
    20% per source by quality score"), SQL ``QUALIFY ROW_NUMBER() OVER
    (PARTITION BY g ORDER BY score DESC, id) <= CEIL(f * COUNT(*))``.

    Rows with a null score are excluded from BOTH the count and the
    ranking (SQL inner-join-against-counts semantics).  ``k_g`` is
    ``ceil`` of one IEEE double multiply — the same op order a SQL oracle
    uses, so the cut is bit-reproducible.

    Scale shape: pass 1 is a count-only groupby (only (group, count)
    partials shuffle — Ray's Count aggregate combines map-side); the k
    table is group-cardinality-sized and ships inside the stage (document
    the bound before pointing this at a high-cardinality key).  Pass 2
    prunes each batch to its own per-group top-k_g first (one Arrow sort +
    vectorized run-position scan, k looked up per DISTINCT group via
    dictionary encoding), so at most ``k_g x groups-per-batch`` rows reach
    the single bucketed exchange (hash(group) % num_buckets — never one
    Python call per distinct group); the per-bucket finisher re-sorts the
    survivors and cuts exactly ``k_g`` per run.  Skew-safe like
    ``analytics.top_k_per_group``: a hot group contributes k_g rows per
    batch, never its full volume."""
    import math

    from .analytics import _run_positions, _sort_spec

    if not (0.0 < fraction <= 1.0):
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    spec = _sort_spec(group_column, [score_column, id_column], descending)

    def _count_partial(batch: pa.Table) -> pa.Table:
        t = batch.select([group_column, score_column])
        t = t.filter(pc.is_valid(t.column(score_column)))
        return t.group_by([group_column], use_threads=False).aggregate(
            [(score_column, "count")])

    counts = (ds.select_columns([group_column, score_column])
              .map_batches(_count_partial, batch_format="pyarrow")
              .groupby(group_column)
              .sum(f"{score_column}_count")).take_all()
    ks = {r[group_column]: math.ceil(fraction *
                                     float(r[f"sum({score_column}_count)"]))
          for r in counts}
    logger.info("top_fraction_by_group: %d groups", len(ks))

    def partial_prune(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column(score_column)))
        if batch.num_rows == 0:
            return batch
        batch = batch.sort_by(spec)
        g = batch.column(group_column)
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        enc = g.dictionary_encode()
        per_value = np.array([ks.get(v, 0)
                              for v in enc.dictionary.to_pylist()],
                             dtype=np.int64)
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k_row = per_value[idx]
        gv = g.to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(_run_positions(gv) < k_row))

    def per_bucket(g: pa.Table) -> pa.Table:
        # bucketed finisher (hash(group) % buckets — never one Python
        # call per distinct group): one sort, per-row k lookup via
        # dictionary encoding, run-position cut + rank in one pass
        g = g.sort_by(spec)
        gc = g.column(group_column)
        if isinstance(gc, pa.ChunkedArray):
            gc = gc.combine_chunks()
        enc = gc.dictionary_encode()
        per_value = np.array([ks.get(v, 0)
                              for v in enc.dictionary.to_pylist()],
                             dtype=np.int64)
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k_row = per_value[idx]
        # null-safe run positions (change mask — see top_k_per_group)
        from .analytics import _adjacent_change_mask
        starts = np.flatnonzero(_adjacent_change_mask(g, [group_column]))
        lens = np.diff(np.append(starts, g.num_rows))
        pos = (np.arange(g.num_rows, dtype=np.int64)
               - np.repeat(starts, lens))
        g = g.append_column(rank_col, pa.array(pos + 1, type=pa.int64()))
        return g.filter(pa.array(pos < k_row))

    from .analytics import bucketed_groups
    return bucketed_groups(
        ds.map_batches(partial_prune, batch_format="pyarrow"),
        group_column, per_bucket, seed=17,
        num_partitions=num_partitions)


def group_quantile_bounds(ds: Dataset, group_column: str, value_column: str,
                          p_lo: float = 0.05, p_hi: float = 0.95) -> dict:
    """Per-group exact ``(quantile_cont(p_lo), quantile_cont(p_hi))`` —
    the arbitrary-percentile sibling of :func:`group_iqr_bounds` (same
    shape: (group, value) projection shuffles, one row per group back to
    the driver; quantile_cont() replicates DuckDB's interpolation arithmetic
    BIT-exactly, so the bounds are value-reproducible by an oracle)."""

    def per_run(v: np.ndarray) -> "tuple[float, float]":
        lo, hi = quantile_cont(np.sort(v), [p_lo, p_hi])
        return lo, hi

    return _group_bounds_bucketed(ds, group_column, value_column, per_run)


class _WinsorizeClip:
    """Per-batch clip against broadcast per-group quantile bounds —
    ``max(min(v, hi), lo)``, the literal GREATEST(LEAST(...)) an SQL
    oracle spells.  Unknown groups / null values pass through unclipped."""

    def __init__(self, group_column: str, value_column: str, out: str,
                 bounds: dict):
        self.group_column = group_column
        self.value_column = value_column
        self.out = out
        self.bounds = dict(bounds)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(
                self.out, pa.array([], type=pa.float64()))
        groups = batch.column(self.group_column)
        if isinstance(groups, pa.ChunkedArray):
            groups = groups.combine_chunks()
        enc = groups.dictionary_encode()
        per_lo = np.array([self.bounds.get(v, (-np.inf, np.inf))[0]
                           for v in enc.dictionary.to_pylist()],
                          dtype=np.float64)
        per_hi = np.array([self.bounds.get(v, (-np.inf, np.inf))[1]
                           for v in enc.dictionary.to_pylist()],
                          dtype=np.float64)
        idx = (enc.indices.fill_null(-1)
               .to_numpy(zero_copy_only=False).astype(np.int64))
        vals = batch.column(self.value_column)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        v = np.asarray(vals.cast(pa.float64()).to_numpy(
            zero_copy_only=False))
        known = idx >= 0
        safe = np.maximum(idx, 0)
        lo = np.where(known, per_lo[safe] if len(per_lo) else -np.inf,
                      -np.inf)
        hi = np.where(known, per_hi[safe] if len(per_hi) else np.inf,
                      np.inf)
        clipped = np.maximum(np.minimum(v, hi), lo)  # NaN (null) passes
        return batch.append_column(
            self.out, pa.array(clipped, type=pa.float64()))


def winsorize_by_group(ds: Dataset, group_column: str, value_column: str,
                       p_lo: float = 0.05, p_hi: float = 0.95,
                       out: "str | None" = None,
                       concurrency=None) -> Dataset:
    """Winsorize ``value_column`` within each group: clip to the group's
    exact ``[quantile_cont(p_lo), quantile_cont(p_hi)]`` — the
    heavy-tail-taming sibling of :func:`filter_outliers_by_group` that
    KEEPS every row (use it where dropping would bias the mix, e.g.
    per-source token-length normalization before packing).

    Two passes, same scale shape as the outlier filter: a (group, value)
    projection is the only shuffle; the clip is a shuffle-free broadcast
    probe.  The clipped column is ``max(min(v, hi), lo)`` on float64 —
    bit-reproducible by GREATEST(LEAST(..)) in SQL."""
    from . import cached_stage, concurrency_kwargs
    bounds = group_quantile_bounds(ds, group_column, value_column,
                                   p_lo=p_lo, p_hi=p_hi)
    logger.info("winsorize_by_group: %d groups", len(bounds))
    return ds.map_batches(
        cached_stage(_WinsorizeClip, group_column=group_column,
                     value_column=value_column,
                     out=out or value_column + "_w", bounds=bounds),
        batch_format="pyarrow", **concurrency_kwargs(concurrency))


class _ImputeFill:
    """Per-batch null fill against broadcast per-group statistics."""

    def __init__(self, group_column: str, value_column: str, out: str,
                 fills: dict):
        self.group_column = group_column
        self.value_column = value_column
        self.out = out
        self.fills = dict(fills)

    def __call__(self, batch: pa.Table) -> pa.Table:
        groups = batch.column(self.group_column)
        if isinstance(groups, pa.ChunkedArray):
            groups = groups.combine_chunks()
        enc = groups.dictionary_encode()
        per_fill = np.array([self.fills.get(v, np.nan)
                             for v in enc.dictionary.to_pylist()],
                            dtype=np.float64)
        idx = (enc.indices.fill_null(-1)
               .to_numpy(zero_copy_only=False).astype(np.int64))
        vals = batch.column(self.value_column)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        v = np.asarray(vals.cast(pa.float64()).to_numpy(
            zero_copy_only=False), dtype=np.float64)
        known = idx >= 0
        fill = np.where(known,
                        per_fill[np.maximum(idx, 0)] if len(per_fill)
                        else np.nan, np.nan)
        out_v = np.where(np.isnan(v), fill, v)
        mask = np.isnan(out_v)
        arr = pa.array(out_v, type=pa.float64(),
                       mask=mask if mask.any() else None)
        return batch.append_column(self.out, arr)


def impute_by_group(ds: Dataset, group_column: str, value_column: str,
                    strategy: str = "median", out: "str | None" = None,
                    concurrency=None) -> Dataset:
    """Fill null ``value_column`` entries with the group's statistic —
    the standard feature-cleanup op before training.

    ``strategy="median"``: exact per-group median of the NON-null values
    (sort-based ``np.quantile`` == SQL ``quantile_cont(0.5)`` — order-
    free, so bit-reproducible under any partitioning).
    ``strategy="mean"``: integer-exact mean — values must be integral
    (cast to fixed-point upstream; the safe Arrow cast raises otherwise);
    per-group int64 partial sums, ONE IEEE division, the same
    ``CAST(SUM AS DOUBLE)/CAST(COUNT AS DOUBLE)`` an oracle spells.

    Scale shape: the stats pass shuffles only the projected
    (group, value) pair; the fill is a shuffle-free broadcast probe.
    Rows whose group has no non-null values (or an unknown group) stay
    null."""
    if strategy == "median":
        fills = {g: lo for g, (lo, _) in group_quantile_bounds(
            ds, group_column, value_column, 0.5, 0.5).items()}
    elif strategy == "mean":
        def partials(batch: pa.Table) -> pa.Table:
            v = pc.cast(batch.column(value_column), pa.int64())
            t = pa.table({group_column: batch.column(group_column),
                          "__v": v})
            out_t = t.group_by([group_column], use_threads=False).aggregate(
                [("__v", "sum"), ("__v", "count")])
            return out_t.rename_columns([group_column, "__s", "__n"])

        def per_bucket(g: pa.Table) -> pa.Table:
            # bucketed merge, per-run Python-int sums (the exact-mean
            # contract: arbitrary-precision totals, one IEEE division)
            from .analytics import _adjacent_change_mask
            t = g.sort_by([(group_column, "ascending")])
            starts = np.flatnonzero(
                _adjacent_change_mask(t, [group_column]))
            bounds_ix = np.append(starts, t.num_rows)
            ps = t.column("__s").to_pylist()
            pn = t.column("__n").to_pylist()
            means = []
            for i in range(len(starts)):
                lo, hi = bounds_ix[i], bounds_ix[i + 1]
                s = sum(x or 0 for x in ps[lo:hi])
                n = sum(x or 0 for x in pn[lo:hi])
                means.append(float(s) / float(n) if n else None)
            gcol = t.column(group_column)
            if isinstance(gcol, pa.ChunkedArray):
                gcol = gcol.combine_chunks()
            return pa.table({
                group_column: gcol.take(pa.array(starts, pa.int64())),
                "mean": pa.array(means, type=pa.float64())})

        from .analytics import bucketed_groups
        rows = bucketed_groups(
            ds.select_columns([group_column, value_column])
            .map_batches(partials, batch_format="pyarrow"),
            group_column, per_bucket, seed=17).take_all()
        fills = {r[group_column]: r["mean"] for r in rows
                 if r["mean"] is not None}
    else:
        raise ValueError(f"impute_by_group: unknown strategy {strategy!r}")
    from . import cached_stage, concurrency_kwargs
    logger.info("impute_by_group(%s): %d groups", strategy, len(fills))
    return ds.map_batches(
        cached_stage(_ImputeFill, group_column=group_column,
                     value_column=value_column,
                     out=out or value_column + "_imp", fills=fills),
        batch_format="pyarrow", **concurrency_kwargs(concurrency))


def global_quantile_thresholds(ds: Dataset, value_column: str,
                               n_bins: int = 10,
                               method: str = "exact",
                               max_exact_rows: int = 100_000_000
                               ) -> np.ndarray:
    """The ``n_bins - 1`` interior quantile thresholds of a column.

    ``method="exact"``: one worker sorts the projected value column
    (groupby on a constant key — the values never visit the driver);
    quantile_cont() replicates DuckDB's interpolation arithmetic
    bit-exactly, so the thresholds are oracle-reproducible.  Right for <= ~1e8 values; the path is
    FAIL-LOUD-bounded WITHOUT an extra upstream execution: the guard is
    ``limit(max_exact_rows + 1).materialize()`` on the projection — the
    streaming executor early-stops past the cap (an over-cap input
    raises after ~cap rows, never a full scan), and an under-cap input's
    materialized blocks (complete, since limit dropped nothing) feed the
    exchange directly, so the upstream chain runs ONCE total.  Raises
    above ``max_exact_rows`` (default 1e8, ~800 MB of float64 on the
    single receiving worker) with a pointer to ``method="tdigest"`` —
    mergeable sketch partials per batch (fixed size, any scale), ~<1%
    rank error, not SQL-reproducible.  Set ``max_exact_rows=0`` to skip
    the guard when the caller has already bounded the input.
    """
    ps = [(i + 1) / n_bins for i in range(n_bins - 1)]
    proj = ds.select_columns([value_column])
    if method == "exact":
        if max_exact_rows:
            proj = proj.limit(max_exact_rows + 1).materialize()
            n = proj.count()  # metadata count on the materialized blocks
            if n > max_exact_rows:
                raise ValueError(
                    f"global_quantile_thresholds(method='exact'): "
                    f"> max_exact_rows={max_exact_rows} rows — the "
                    f"exact path ships EVERY value to one worker for a "
                    f"whole-column sort. Use method='tdigest' (mergeable "
                    f"sketch, any scale, ~<1% rank error) or raise "
                    f"max_exact_rows if the worker can hold the column.")
        def quantiles(group: pa.Table) -> pa.Table:
            v = (group.column(value_column).drop_null()
                 .to_numpy(zero_copy_only=False))
            th = quantile_cont(np.sort(v), ps)
            return pa.table({"th": pa.array(th.tolist(), pa.float64())})

        def tag(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "__one__", pa.array(np.zeros(batch.num_rows,
                                             dtype=np.int8)))

        rows = (proj.map_batches(tag, batch_format="pyarrow")
                .groupby("__one__")
                .map_groups(quantiles, batch_format="pyarrow").take_all())
        return np.array([r["th"] for r in rows], dtype=np.float64)
    elif method == "tdigest":
        from ..state.sketches import TDigest

        def partial(batch: pa.Table) -> pa.Table:
            td = TDigest()
            v = (batch.column(value_column).drop_null()
                 .to_numpy(zero_copy_only=False).astype(np.float64))
            td.add(v)
            import pickle
            return pa.table({"d": pa.array([pickle.dumps(td)],
                                           pa.large_binary())})

        import pickle
        rows = proj.map_batches(partial, batch_format="pyarrow").take_all()
        td = pickle.loads(rows[0]["d"])
        for r in rows[1:]:
            td.merge(pickle.loads(r["d"]))
        return np.array([td.quantile(p) for p in ps], dtype=np.float64)
    raise ValueError(f"unknown method {method!r}")


class _BinAssign:
    """Broadcast-threshold equal-frequency bin assignment: bucket =
    1 + #(thresholds <= v) — the literal list_filter count an SQL oracle
    spells; nulls stay null."""

    def __init__(self, value_column: str, out: str, thresholds):
        self.value_column = value_column
        self.out = out
        self.th = np.asarray(thresholds, dtype=np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.value_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        nulls = np.asarray(col.is_null()) if col.null_count else \
            np.zeros(len(col), dtype=bool)
        v = np.asarray(col.cast(pa.float64()).to_numpy(
            zero_copy_only=False), dtype=np.float64)
        bins = (np.searchsorted(self.th, v, side="right") + 1).astype(
            np.int64)
        arr = pa.array(bins, type=pa.int64(),
                       mask=nulls if nulls.any() else None)
        return batch.append_column(self.out, arr)


def discretize_global(ds: Dataset, value_column: str, n_bins: int = 10,
                      out: "str | None" = None, method: str = "exact",
                      concurrency=None) -> Dataset:
    """Equal-frequency (quantile) discretization of a numeric column —
    the feature-engineering binning op (decile buckets etc.).  Two
    passes: global thresholds (exact sort-based or t-digest at scale —
    see :func:`global_quantile_thresholds`), then a shuffle-free
    broadcast searchsorted assignment."""
    th = global_quantile_thresholds(ds, value_column, n_bins=n_bins,
                                    method=method)
    from . import cached_stage, concurrency_kwargs
    return ds.map_batches(
        cached_stage(_BinAssign, value_column=value_column,
                     out=out or value_column + "_bin",
                     thresholds=th.tolist()),
        batch_format="pyarrow", **concurrency_kwargs(concurrency))


def split_thresholds(fractions: "dict[str, float]") -> "list[tuple[str, int]]":
    """(label, upper-threshold) list for :func:`split_by_hash`: cumulative
    fractions scaled to 2^32 with plain IEEE double ops so a SQL oracle can
    reproduce them.  The LAST label absorbs any rounding remainder (its
    threshold is forced to 2^32), so every row gets a label."""
    if not fractions:
        raise ValueError("split_by_hash: fractions must be non-empty")
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split_by_hash: fractions sum to {total} > 1")
    out, cum = [], 0.0
    items = list(fractions.items())
    for label, f in items:
        cum = cum + float(f)
        out.append((label, int(np.floor(cum * 4294967296.0))))
    out[-1] = (out[-1][0], 4294967296)
    return out


class _SplitAssign:
    """Per-batch deterministic split-label assignment (vectorized
    searchsorted over the cumulative thresholds)."""

    def __init__(self, id_column: str, thresholds, split_col: str):
        self.id_column = id_column
        self.split_col = split_col
        self.labels = pa.array([l for l, _ in thresholds])
        self.bounds = np.array([t for _, t in thresholds], dtype=np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_column).to_numpy(zero_copy_only=False)
        h = ((ids.astype(np.uint64) % _MOD) * np.uint64(KNUTH_MULT)) % _MOD
        idx = np.searchsorted(self.bounds, h, side="right")
        import pyarrow.compute as pc
        lab = pc.take(self.labels, pa.array(idx, type=pa.int64()))
        return batch.append_column(self.split_col, lab)


def split_by_hash(ds: Dataset, id_column: str,
                  fractions: "dict[str, float]",
                  split_col: str = "split", concurrency=None) -> Dataset:
    """Deterministic train/valid/test split: every row gets a label from
    ``fractions`` (insertion-ordered, e.g. ``{"train": .98, "valid": .01,
    "test": .01}``) chosen by the same Knuth multiplicative hash as
    :func:`rebalance_to_uniform` — shuffle-free, rerun/resume-stable, and
    bit-reproducible in SQL (``CASE WHEN (id%2^32)*2654435761%2^32 < t1
    THEN ... END`` with :func:`split_thresholds` integers).  The last label
    absorbs the rounding remainder so no row is unlabeled; correlated ids
    (same doc across revisions) land in the same split by construction."""
    from . import cached_stage, concurrency_kwargs
    thresholds = split_thresholds(fractions)
    return ds.map_batches(
        cached_stage(_SplitAssign, id_column=id_column,
                     thresholds=tuple(thresholds), split_col=split_col),
        batch_format="pyarrow", **concurrency_kwargs(concurrency))


class _ShardAssign:
    """Per-batch deterministic shard id: well-mixed hash mod n_shards."""

    def __init__(self, id_column: str, n_shards: int, shard_col: str):
        self.id_column = id_column
        self.n = np.uint64(n_shards)
        self.shard_col = shard_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_column).to_numpy(zero_copy_only=False)
        h = ((ids.astype(np.uint64) % _MOD) * np.uint64(KNUTH_MULT)) % _MOD
        return batch.append_column(
            self.shard_col, pa.array((h % self.n).astype(np.int64)))


def assign_shards(ds: Dataset, id_column: str, n_shards: int,
                  shard_col: str = "shard", concurrency=None) -> Dataset:
    """Deterministic output-shard assignment: ``knuth_hash(id) mod
    n_shards`` (the raw ``id mod n`` would inherit any id stride/skew; the
    multiplicative hash mixes first).  Shuffle-free; SQL-reproducible."""
    from . import cached_stage, concurrency_kwargs
    if n_shards < 1:
        raise ValueError("assign_shards: n_shards must be >= 1")
    return ds.map_batches(
        cached_stage(_ShardAssign, id_column=id_column, n_shards=n_shards,
                     shard_col=shard_col),
        batch_format="pyarrow", **concurrency_kwargs(concurrency))


def write_hash_shards(ds: Dataset, id_column: str, n_shards: int,
                      out_dir: str, shard_col: str = "shard",
                      concurrency=None) -> None:
    """Resumable training-output sink: assign every row a deterministic
    shard (:func:`assign_shards`) and write hive-partitioned parquet —
    ``out_dir/shard=<k>/...`` — so a failed run can diff finished shard
    directories against the expected set and re-emit only the missing ones
    (assignment is pure id arithmetic: re-running a shard reproduces
    exactly its rows).  Never one giant file; shard count bounds the
    per-directory volume."""
    sharded = assign_shards(ds, id_column, n_shards, shard_col=shard_col,
                            concurrency=concurrency)
    sharded.write_parquet(out_dir, partition_cols=[shard_col])


# ---------------------------------------------------------------------------
# DSIR-style hashed n-gram importance weighting (Xie et al. 2023)
# ---------------------------------------------------------------------------

#: fixed-point denominator for quantized log-ratios: the per-doc reduction
#: happens in int64 (order-free, associative, exactly reproducible) and
#: converts to float once at the end.
DSIR_SCALE = float(1 << 40)
_DSIR_SCALE_I = 1 << 40


def dsir_bucket_counts(ds: Dataset, text_column: str,
                       n_buckets: int = 4096, seed: int = 11) -> np.ndarray:
    """Hashed-feature bucket counts for a corpus in ONE streaming pass:
    features are unigrams + word-bigrams (the shared shifted-concat gram
    builder, polars xxhash) folded into ``n_buckets``.  Each batch emits
    a single fixed-size count vector row (8 x n_buckets bytes —
    value-cardinality-independent, the HLL-register shape), summed on
    the driver.  At 100 TB the partials stay O(batches), never O(rows)."""
    from .text import _gram_rows

    nb = np.uint64(n_buckets)

    def partials(batch: pa.Table) -> pa.Table:
        import polars as pl
        col = batch.column(text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        texts = pl.from_arrow(col).fill_null("")
        cnt = np.zeros(n_buckets, dtype=np.int64)
        for k in (1, 2):
            _, _, (h,) = _gram_rows(texts, k, (seed,))
            if len(h):
                cnt += np.bincount((h % nb).astype(np.int64),
                                   minlength=n_buckets)
        return pa.table({"cnt": pa.FixedSizeListArray.from_arrays(
            pa.array(cnt, pa.int64()), n_buckets)})

    rows = ds.map_batches(partials, batch_format="pyarrow").take_all()
    total = np.zeros(n_buckets, dtype=np.int64)
    for r in rows:
        total += np.asarray(r["cnt"], dtype=np.int64)
    return total


def dsir_log_ratio_table(raw_counts: np.ndarray,
                         target_counts: np.ndarray,
                         alpha: float = 1.0) -> np.ndarray:
    """Quantized per-bucket log importance ratios
    ``round((ln p_target - ln p_raw) * 2^40)`` as int64.

    Float contract (for the golden fixture): per-bucket smoothed
    probabilities are ``(cnt + alpha) / (total + alpha * B)``, logs via
    driver-side ``math.log`` scalars, quantized with Python banker's
    ``round`` — an independent reference running the same formula
    reproduces the table bit-for-bit, and everything AFTER the table is
    integer arithmetic."""
    import math
    nb = len(raw_counts)
    if len(target_counts) != nb:
        raise ValueError("dsir_log_ratio_table: bucket counts differ")
    tot_r = float(int(raw_counts.sum()) + alpha * nb)
    tot_t = float(int(target_counts.sum()) + alpha * nb)
    lam = np.empty(nb, dtype=np.int64)
    for b in range(nb):
        lt = math.log((float(target_counts[b]) + alpha) / tot_t)
        lr = math.log((float(raw_counts[b]) + alpha) / tot_r)
        lam[b] = round((lt - lr) * DSIR_SCALE)
    return lam


def dsir_weights(ds: Dataset, text_column: str, id_column: str,
                 lam: np.ndarray, seed: int = 11) -> Dataset:
    """Per-document DSIR log importance weight: the sum of the quantized
    log-ratio over the doc's hashed unigram+bigram features.  The
    reduction is an int64 scatter-add (``np.add.at``) — associative and
    exact, so results are independent of batch split, feature order and
    summation strategy; ``log_weight`` is the single int->float
    conversion + one exact power-of-two division at the end.  Shuffle-
    free; the 8B x n_buckets table rides the task closure (ray.put it
    for 1e6+ buckets)."""
    from .text import _gram_rows

    n_buckets = len(lam)
    nb = np.uint64(n_buckets)
    lam = np.ascontiguousarray(lam, dtype=np.int64)

    def score(batch: pa.Table) -> pa.Table:
        import polars as pl
        col = batch.column(text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        texts = pl.from_arrow(col).fill_null("")
        wq = np.zeros(batch.num_rows, dtype=np.int64)
        nf = np.zeros(batch.num_rows, dtype=np.int64)
        for k in (1, 2):
            rows, _, (h, ) = _gram_rows(texts, k, (seed,))
            if len(rows):
                b = (h % nb).astype(np.int64)
                np.add.at(wq, rows, lam[b])
                np.add.at(nf, rows, 1)
        return pa.table({
            id_column: batch.column(id_column),
            "n_features": pa.array(nf, pa.int64()),
            "log_weight_q": pa.array(wq, pa.int64()),
            "log_weight": pa.array(wq.astype(np.float64) / DSIR_SCALE,
                                   pa.float64())})

    return ds.map_batches(score, batch_format="pyarrow")


def dsir_reweight(raw: Dataset, target: Dataset, text_column: str,
                  id_column: str, n_buckets: int = 4096,
                  alpha: float = 1.0, seed: int = 11) -> Dataset:
    """End-to-end DSIR (Xie et al. 2023): estimate hashed-feature
    distributions of the raw corpus and the (small, curated) target,
    then score every raw doc with its log importance ratio.  Three
    streaming passes, no shuffle; compose with
    :func:`sample_k_by_hash` / threshold filters for the resample step."""
    cnt_r = dsir_bucket_counts(raw, text_column, n_buckets, seed)
    cnt_t = dsir_bucket_counts(target, text_column, n_buckets, seed)
    lam = dsir_log_ratio_table(cnt_r, cnt_t, alpha)
    return dsir_weights(raw, text_column, id_column, lam, seed)


def shard_manifest(ds: Dataset, id_column: str, n_shards: int) -> "pa.Table":
    """Integrity manifest of a (virtually) sharded dataset: one row per
    shard — ``(shard, n_rows, id_checksum)`` — the audit primitive for a
    100 TB run: recompute the manifest after a resume / re-emit and diff
    it against the expected one to prove no shard lost or duplicated rows
    (:func:`write_hash_shards` is the sink it audits).

    The checksum is ``sum of knuth_hash(id) mod 2^64`` per shard —
    associative and commutative, so it is independent of row order, batch
    split and partitioning, and a SQL oracle replays it exactly (HUGEINT
    sum, then the signed int64 bit-pattern view — the engine's uint64
    wraparound IS mod 2^64).  Each batch emits one fixed-size partial row
    per shard (count vector + checksum vector, the dsir_bucket_counts
    shape), so driver traffic is O(batches x n_shards), never O(rows)."""
    if n_shards < 1:
        raise ValueError("shard_manifest: n_shards must be >= 1")

    def partials(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        h = ((ids.astype(np.uint64) % _MOD) * np.uint64(KNUTH_MULT)) % _MOD
        shard = (h % np.uint64(n_shards)).astype(np.int64)
        cnt = np.bincount(shard, minlength=n_shards).astype(np.int64)
        acc = np.zeros(n_shards, dtype=np.uint64)
        np.add.at(acc, shard, h)
        return pa.table({
            "n": pa.FixedSizeListArray.from_arrays(
                pa.array(cnt, pa.int64()), n_shards),
            "c": pa.FixedSizeListArray.from_arrays(
                pa.array(acc.view(np.int64), pa.int64()), n_shards)})

    rows = ds.select_columns([id_column]).map_batches(
        partials, batch_format="pyarrow").take_all()
    n_rows = np.zeros(n_shards, dtype=np.int64)
    checksum = np.zeros(n_shards, dtype=np.uint64)
    for r in rows:
        n_rows += np.asarray(r["n"], dtype=np.int64)
        checksum += np.asarray(r["c"], dtype=np.int64).view(np.uint64)
    return pa.table({
        "shard": pa.array(np.arange(n_shards, dtype=np.int64)),
        "n_rows": pa.array(n_rows, pa.int64()),
        "id_checksum": pa.array(checksum.view(np.int64), pa.int64())})


def zorder_codes(values: "dict[str, np.ndarray]",
                 thresholds: "dict[str, np.ndarray]",
                 bits: int = 16) -> np.ndarray:
    """Interleaved Morton (Z-order) codes for 2+ columns: each column
    rank-quantizes into ``2^bits`` equal-frequency cells via its
    threshold array (``searchsorted`` side='right' — the list_filter
    count an SQL oracle spells), then the cell bits interleave
    column-round-robin (column j contributes bit i at output position
    ``i * n_cols + j``).  Pure integer function of (value, thresholds)."""
    cols = list(values)
    n_cols = len(cols)
    if n_cols < 2:
        raise ValueError("zorder_codes: need >= 2 columns")
    n = len(values[cols[0]])
    out = np.zeros(n, dtype=np.int64)
    for j, c in enumerate(cols):
        th = np.asarray(thresholds[c], dtype=np.float64)
        cell = np.searchsorted(th, np.asarray(values[c], dtype=np.float64),
                               side="right").astype(np.int64)
        for i in range(bits):
            out |= ((cell >> i) & 1) << (i * n_cols + j)
    return out


def zorder_sort(ds: Dataset, columns: "list[str]", bits: int = 16,
                out: str = "zvalue", method: str = "exact",
                concurrency=None) -> Dataset:
    """Z-ORDER the dataset by 2+ numeric columns (the Delta/Iceberg
    OPTIMIZE ZORDER layout op): multi-dimensional locality so range
    filters on ANY of the columns prune most blocks after a re-write.

    Two passes: per-column equal-frequency cell thresholds
    (:func:`global_quantile_thresholds` — exact or t-digest at scale),
    then a shuffle-free Morton-code stage + ONE range-partition sort on
    the code (Ray's sort — the same intentional all-to-all as
    global_shuffle).  The appended ``out`` column is a pure integer
    function of (value, thresholds), so an SQL oracle replays it
    bit-for-bit even though row ORDER itself is not part of the hash
    compare; the locality property is pinned by test."""
    n_bins = 1 << bits
    if method == "exact" and ds.count() > 100_000_000:
        # one guard count for ALL columns (instead of one per column
        # inside global_quantile_thresholds)
        raise ValueError(
            "zorder_sort(method='exact'): input exceeds the exact "
            "quantile path's single-worker bound (1e8 rows) — use "
            "method='tdigest'")
    ths = {c: global_quantile_thresholds(ds, c, n_bins=n_bins,
                                         method=method,
                                         max_exact_rows=0)
           for c in columns}
    from . import cached_stage, concurrency_kwargs

    class _ZCode:
        def __init__(self, columns, thresholds, bits, out):
            self.columns = columns
            self.th = {c: np.asarray(t, dtype=np.float64)
                       for c, t in thresholds.items()}
            self.bits = bits
            self.out = out

        def __call__(self, batch: pa.Table) -> pa.Table:
            vals = {c: np.asarray(
                batch.column(c).cast(pa.float64()).to_numpy(
                    zero_copy_only=False), dtype=np.float64)
                for c in self.columns}
            z = zorder_codes(vals, self.th, bits=self.bits)
            return batch.append_column(self.out,
                                       pa.array(z, type=pa.int64()))

    coded = ds.map_batches(
        cached_stage(_ZCode, columns=list(columns),
                     thresholds={c: t.tolist() for c, t in ths.items()},
                     bits=bits, out=out),
        batch_format="pyarrow", **concurrency_kwargs(concurrency))
    return coded.sort(out)


def budget_sample(ds: Dataset, group_column: str, weight_column: str,
                  id_column: str, fraction: float, seed: int = 0,
                  num_buckets: int = 64,
                  num_partitions: int | None = None) -> Dataset:
    """Per-group WEIGHT-budget prefix selection — the token-budget
    data-mixture builder: keep each group's rows in deterministic seeded
    Knuth-hash order until the group's cumulative weight would exceed
    ``floor(fraction x group_total)`` (keep iff the INCLUSIVE running
    sum fits the budget).  Unlike count-based rebalancing
    (:func:`rebalance_to_uniform`), the budget is in WEIGHT units (token
    counts), which is what a training-mixture spec actually allocates.

    Deterministic and SQL-replayable: selection is a pure function of
    (id, weight) sets — rerun/resume-stable, order-independent; the
    oracle spells ``SUM(w) OVER (PARTITION BY g ORDER BY knuth(id), id
    ROWS UNBOUNDED PRECEDING) <= CAST(FLOOR(fraction * total) AS
    BIGINT)``.  The budget is ONE float multiply + floor per group
    (exact below 2^53 total weight).

    Scale shape: pass 1 is a count-only groupby of int64 weight totals
    (O(groups) rows, broadcast back as the budget table); pass 2 is ONE
    ``hash(group) % num_buckets`` exchange carrying only (group, id,
    weight), with a per-bucket Arrow sort + run-rebased cumsum — never
    one Python call per group.  Weights must be non-negative int64
    (token counts); null weights count 0."""
    import ray
    from ray.data.aggregate import Sum

    from ..state.sketches import hash64

    if not (0.0 <= fraction <= 1.0):
        raise ValueError("budget_sample: fraction must be in [0, 1]")

    def wprep(batch: pa.Table) -> pa.Table:
        w = pc.fill_null(pc.cast(batch.column(weight_column),
                                 pa.int64()), 0)
        return pa.table({group_column: batch.column(group_column),
                         "__w": w})

    totals = (ds.map_batches(wprep, batch_format="pyarrow")
              .groupby(group_column)
              .aggregate(Sum("__w", alias_name="t")).take_all())
    budgets = {r[group_column]: int(np.floor(fraction * float(r["t"])))
               for r in totals}
    bref = ray.put(budgets)
    bucket_col = "__bsbkt__"

    def bucketize(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        h = (((ids.astype(np.uint64) + np.uint64(seed)) % _MOD)
             * np.uint64(KNUTH_MULT)) % _MOD
        gb = hash64(batch.column(group_column), seed=31) \
            % np.uint64(num_buckets)
        return (batch
                .append_column("__h", pa.array(h.astype(np.int64),
                                               pa.int64()))
                .append_column(bucket_col,
                               pa.array(gb.astype(np.int64), pa.int64())))

    def per_bucket(g: pa.Table) -> pa.Table:
        import ray as _ray
        b = _ray.get(bref)
        g = g.sort_by([(group_column, "ascending"),
                       ("__h", "ascending"), (id_column, "ascending")])
        keys = g.column(group_column).to_numpy(zero_copy_only=False)
        w = pc.fill_null(pc.cast(g.column(weight_column), pa.int64()),
                         0).to_numpy(zero_copy_only=False)
        n = len(keys)
        if n == 0:
            return g.drop_columns(["__h", bucket_col])
        new = np.ones(n, dtype=bool)
        new[1:] = keys[1:] != keys[:-1]
        csum = np.cumsum(w)
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, n))
        base = np.where(starts > 0, csum[starts - 1], 0)
        cum = csum - np.repeat(base, lens)          # inclusive per-run
        budget = np.array([b.get(keys[s], 0) for s in starts],
                          dtype=np.int64)
        keep = cum <= np.repeat(budget, lens)
        return (g.filter(pa.array(keep))
                .drop_columns(["__h", bucket_col]))

    if num_partitions is None:
        num_partitions = min(num_buckets, 64)
    return (ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby(bucket_col, num_partitions=num_partitions)
            .map_groups(per_bucket, batch_format="pyarrow"))


class _GroupSplit:
    """Per-batch leakage-safe split label: cumulative thresholds over
    hash64(group) folded to 32 bits (any column type, nulls = one
    deterministic group)."""

    def __init__(self, group_column, thresholds, split_col, seed):
        self.group_column = group_column
        self.split_col = split_col
        self.seed = seed
        self.labels = pa.array([l for l, _ in thresholds])
        self.bounds = np.array([t for _, t in thresholds],
                               dtype=np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..state.sketches import hash64
        h = hash64(batch.column(self.group_column), seed=self.seed) \
            % np.uint64(4294967296)
        idx = np.searchsorted(self.bounds, h, side="right")
        lab = pc.take(self.labels, pa.array(idx, type=pa.int64()))
        return batch.append_column(self.split_col, lab)


def split_by_group(ds: Dataset, group_column: str,
                   fractions: "dict[str, float]",
                   split_col: str = "split", seed: int = 3343,
                   concurrency=None) -> Dataset:
    """Leakage-safe train/valid/test split: EVERY row sharing
    ``group_column`` (URL domain, repo, author) lands in the same split —
    the dedup-aware split that keeps near-copies of a training document
    out of eval.  :func:`split_by_hash` requires integer ids; this keys
    the same cumulative thresholds on ``hash64(group) mod 2^32`` so any
    column type works.  Shuffle-free map-only pass; rerun/resume-stable;
    null groups hash to one deterministic group (they travel together —
    SQL null-key semantics).  Not SQL-replayable (xxhash) — the oracle is
    a golden fixture."""
    from . import cached_stage, concurrency_kwargs

    thresholds = split_thresholds(fractions)
    return ds.map_batches(
        cached_stage(_GroupSplit, group_column=group_column,
                     thresholds=tuple(thresholds), split_col=split_col,
                     seed=seed),
        batch_format="pyarrow", **concurrency_kwargs(concurrency))


def interleave_by_ratio(ds: Dataset, group_column: str, id_column: str,
                        weights: "dict[str, int]",
                        default_weight: int = 1,
                        quant: int = 1 << 20,
                        null_group: str = "",
                        num_buckets: int = 64) -> Dataset:
    """Deterministic mixture-stream scheduling: assign every row a
    ``mix_key`` such that reading the corpus in ``mix_key`` order
    interleaves the groups at the requested integer ``weights`` ratio
    (stride scheduling — the r-th row of group g, 0-based in ``id``
    order, gets ``((2r + 1) * quant) // w_g``, the Bresenham key of the
    rational deadline ``(r + 1/2) / w_g``).  The pre-mixed-shard step of
    a streaming training pipeline: at 100 TB the trainer cannot shuffle
    at read time, so the mixture is baked into the on-disk order — write
    sorted by ``mix_key`` and a sequential reader sees web:books:... at
    the target rate from the first batch onward.

    Unlike :func:`rebalance` / ``upsample_by_group_factor`` (which decide
    WHICH rows are in the epoch), this decides the ORDER; compose them.
    All arithmetic is int64-exact and SQL-replayable (ROW_NUMBER +
    integer div); groups not in ``weights`` get ``default_weight``;
    null groups fold to ``null_group``.

    Scale shape: one ``hash(group) % num_buckets`` exchange of the
    PROJECTED (group, id) columns only — the payload never moves; per
    bucket ONE sort + run-rebased arange; ranks to ~2^42 stay exact
    (``2 * r * quant < 2^63``).  Join ``mix_key`` back by id (broadcast
    or hash join) or run on the projected table and gather payload at
    write time."""
    if any(int(w) <= 0 for w in weights.values()) or default_weight <= 0:
        raise ValueError("interleave_by_ratio: weights must be positive")
    from .analytics import _adjacent_change_mask, bucketed_groups

    wmap = {str(k): int(v) for k, v in weights.items()}

    def prep(batch: pa.Table) -> pa.Table:
        grp = batch.column(group_column)
        if pa.types.is_null(grp.type):
            grp = grp.cast(pa.string())
        return pa.table({
            group_column: pc.fill_null(grp, pa.scalar(null_group,
                                                      pa.string())),
            id_column: batch.column(id_column)})

    Q = int(quant)

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.sort_by([(group_column, "ascending"),
                       (id_column, "ascending")])
        n = t.num_rows
        starts = np.flatnonzero(_adjacent_change_mask(t, [group_column]))
        lens = np.diff(np.append(starts, n))
        rn = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
        gcol = t.column(group_column)
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        run_w = np.array([wmap.get(gcol[int(s)].as_py(), default_weight)
                          for s in starts], dtype=np.int64)
        w = np.repeat(run_w, lens)
        key = ((2 * rn + 1) * Q) // w
        return pa.table({
            id_column: t.column(id_column),
            group_column: gcol,
            "mix_key": pa.array(key, type=pa.int64())})

    return bucketed_groups(
        ds.select_columns([group_column, id_column])
        .map_batches(prep, batch_format="pyarrow"),
        group_column, per_bucket, num_buckets=num_buckets, seed=17)
