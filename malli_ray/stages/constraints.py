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
           "drift_score", "ReferentialCheck", "monotonic_violations",
           "expectations_report", "expectations_from_stats"]


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


_EXPECT_SCALE = 1 << 20  # float quantization step (the logreg discipline)


def expectations_report(ds: Dataset, rules: list[dict]) -> pa.Table:
    """Great-expectations-style table assertions in ONE streaming pass
    (plus one tiny O(distinct) exchange per ``distinct_count_between``
    rule): each rule yields a verdict row ``(rule, column, observed_i,
    observed_f, ok)``.  All comparisons are EXACT —

      - counts/null-counts are int64,
      - rate and mean bounds compare by integer cross-multiplication
        (``null_count * 10^9 < rate_ppb * row_count``), never float
        division,
      - float-column sums quantize each value to ``round(v * 2^20)``
        BEFORE summation (associative, partitioning-independent — the
        same discipline as the logreg gradient), integer columns sum
        exactly,
      - min/max move verbatim (``observed_f``).

    Rule kinds: ``row_count_between {lo,hi}``, ``null_rate_lt {column,
    max_rate}``, ``mean_between {column, lo, hi}`` (numeric), ``min_ge`` /
    ``max_le {column, value}`` (numeric), ``distinct_count_between
    {column, lo, hi}``.

    Scale shape: one map-side partial row per (batch, rule) — O(batches x
    rules) driver pull, never O(rows); the fused validator's stats pass
    already covers per-column profiling, this is the VERDICT layer a CI
    gate consumes."""
    scan_rules = [(i, r) for i, r in enumerate(rules)
                  if r["kind"] != "distinct_count_between"]
    cols = sorted({r["column"] for _, r in scan_rules if "column" in r})

    def partial(batch: pa.Table) -> pa.Table:
        out = {"rule_id": [], "n": [], "nulls": [], "sum_i": [],
               "min_f": [], "max_f": []}
        for i, r in scan_rules:
            c = r.get("column")
            n = batch.num_rows
            nulls = sum_i = 0
            mn = mx = None
            if c is not None:
                col = batch.column(c)
                nulls = int(pc.sum(pc.cast(pc.is_null(col),
                                           pa.int64())).as_py() or 0)
                if r["kind"] in ("mean_between", "min_ge", "max_le"):
                    v = pc.drop_null(col)
                    if len(v):
                        if pa.types.is_floating(col.type):
                            q = np.round(v.to_numpy(zero_copy_only=False)
                                         * _EXPECT_SCALE).astype(np.int64)
                            sum_i = int(q.sum())
                        else:
                            sum_i = int(v.to_numpy(
                                zero_copy_only=False).astype(np.int64)
                                .sum())
                        mn = float(pc.min(v).as_py())
                        mx = float(pc.max(v).as_py())
            out["rule_id"].append(i)
            out["n"].append(n)
            out["nulls"].append(nulls)
            out["sum_i"].append(sum_i)
            out["min_f"].append(mn)
            out["max_f"].append(mx)
        return pa.table({
            "rule_id": pa.array(out["rule_id"], pa.int64()),
            "n": pa.array(out["n"], pa.int64()),
            "nulls": pa.array(out["nulls"], pa.int64()),
            "sum_i": pa.array(out["sum_i"], pa.int64()),
            "min_f": pa.array(out["min_f"], pa.float64()),
            "max_f": pa.array(out["max_f"], pa.float64())})

    proj = ds.select_columns(cols) if cols else ds
    parts = proj.map_batches(partial, batch_format="pyarrow").take_all()

    agg: dict[int, dict] = {i: {"n": 0, "nulls": 0, "sum_i": 0,
                                "min_f": None, "max_f": None}
                            for i, _ in scan_rules}
    for row in parts:  # O(batches x rules) rows — exact python-int sums
        a = agg[int(row["rule_id"])]
        a["n"] += int(row["n"])
        a["nulls"] += int(row["nulls"])
        a["sum_i"] += int(row["sum_i"])
        for k, red in (("min_f", min), ("max_f", max)):
            v = row[k]
            if v is not None:
                a[k] = v if a[k] is None else red(a[k], v)

    rows = []
    for i, r in enumerate(rules):
        kind, c = r["kind"], r.get("column")
        obs_i = None
        obs_f = None
        if kind == "distinct_count_between":
            # nulls excluded (SQL COUNT(DISTINCT ...) parity); map-side
            # value_counts combine, then one O(distinct) exchange — the
            # result row count is metadata
            sub = (ds.select_columns([c])
                   .map_batches(lambda t, _c=c: t.filter(
                       pc.is_valid(t.column(_c))), batch_format="pyarrow")
                   .map_batches(_local_value_counts(c),
                                batch_format="pyarrow"))
            obs_i = int(sub.groupby(c).count().count())
            ok = int(r["lo"]) <= obs_i <= int(r["hi"])
        else:
            scale = (_EXPECT_SCALE
                     if kind == "mean_between" and _rule_col_is_float(ds, c)
                     else 1)
            obs_i, obs_f, ok = _decide_scan_rule(
                r, n=agg[i]["n"], nulls=agg[i]["nulls"],
                sum_i=agg[i]["sum_i"], scale=scale,
                mn=agg[i]["min_f"], mx=agg[i]["max_f"])
        rows.append((r.get("name", kind), c or "", obs_i, obs_f, bool(ok)))

    return pa.table({
        "rule": pa.array([x[0] for x in rows], pa.string()),
        "column": pa.array([x[1] for x in rows], pa.string()),
        "observed_i": pa.array([x[2] for x in rows], pa.int64()),
        "observed_f": pa.array([x[3] for x in rows], pa.float64()),
        "ok": pa.array([x[4] for x in rows], pa.bool_())})


def _rule_col_is_float(ds: Dataset, c: str) -> bool:
    sch = ds.schema(fetch_if_missing=True)
    return pa.types.is_floating(sch.base_schema.field(c).type)


def _decide_scan_rule(r: dict, *, n: int, nulls: int, sum_i: int,
                      scale: int, mn, mx):
    """(observed_i, observed_f, ok) for one scan rule from exact
    aggregates — the comparison math shared by `expectations_report` and
    `expectations_from_stats` (integer cross-multiplication, no float
    division)."""
    kind = r["kind"]
    if kind == "row_count_between":
        return n, None, int(r["lo"]) <= n <= int(r["hi"])
    if kind == "null_rate_lt":
        ppb = int(round(float(r["max_rate"]) * 1_000_000_000))
        return nulls, None, nulls * 1_000_000_000 < ppb * n
    if kind == "mean_between":
        valid = n - nulls
        lo = int(round(float(r["lo"]) * 1_000_000_000))
        hi = int(round(float(r["hi"]) * 1_000_000_000))
        ok = (valid > 0
              and lo * valid * scale <= sum_i * 1_000_000_000
              <= hi * valid * scale)
        return sum_i, None, ok
    if kind == "min_ge":
        return None, mn, mn is not None and mn >= float(r["value"])
    if kind == "max_le":
        return None, mx, mx is not None and mx <= float(r["value"])
    raise ValueError(f"expectations: unknown kind {kind!r}")


def expectations_from_stats(stats: dict, n_rows: int,
                            rules: list[dict]) -> tuple[list[dict],
                                                        list[dict]]:
    """Evaluate scan rules for FREE from a fused validation report's
    column stats (`ColumnStats` now carries exact `sum_i`/`sum_scale`):
    returns ``(verdict_rows, leftover_rules)`` where leftovers (the
    distinct-count rules, which need their own tiny exchange) still go
    through :func:`expectations_report`.  Identical verdict math — the
    CLI's ``--expect`` pays zero extra passes for scan rules."""
    rows, leftover = [], []
    for r in rules:
        if r["kind"] == "distinct_count_between":
            leftover.append(r)
            continue
        c = r.get("column")
        s = stats.get(c, {}) if c else {}
        mn = mx = None
        if r["kind"] in ("min_ge", "max_le"):  # numeric rules only
            mn = float(s["min"]) if s.get("min") is not None else None
            mx = float(s["max"]) if s.get("max") is not None else None
        obs_i, obs_f, ok = _decide_scan_rule(
            r, n=n_rows, nulls=int(s.get("null_count", 0)),
            sum_i=int(s.get("sum_i", 0)),
            scale=int(s.get("sum_scale", 1)), mn=mn, mx=mx)
        rows.append({"rule": r.get("name", r["kind"]), "column": c or "",
                     "observed_i": obs_i, "observed_f": obs_f,
                     "ok": bool(ok)})
    return rows, leftover
