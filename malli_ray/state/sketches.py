"""Mergeable sketches + column stats for the fused validation pass.

All sketches here are (a) built per batch with vectorized numpy, (b) mergeable
(commutative, associative up to floating error — merges are applied in sorted
partition order for checkpoint-exact resume, SURVEY.md SS7.5.5), and
(c) serializable to small digests recorded in per-partition lineage.

  - HyperLogLog (dense, p-bit registers) for distinct counts (doc_id);
    standard HLL estimator with small/large range corrections
    (Flajolet et al. 2007; bias constants per the original paper).
  - Merging t-digest (Dunning & Ertl) for quantiles on n_tok.
  - ColumnStats: count / null_count / min / max, plus value histograms for
    low-cardinality columns (drift baselines).

The reference has no sketches (malli is single-value); these implement the
north_star's fused "column-stats collection ... HyperLogLog distinct sketches,
t-digest quantiles" requirement (BASELINE.json).
"""

from __future__ import annotations

import base64
import json
import math
from typing import Any, Optional

import numpy as np

__all__ = ["CountMinSketch", "HyperLogLog", "TDigest", "ColumnStats",
           "hash64"]


def hash64(values, seed: int = 0) -> np.ndarray:
    """Vectorized, deterministic 64-bit hashes of a column.

    Uses polars' xxhash-based Series.hash (stable for a fixed polars version,
    which is pinned in this sandbox); good enough for sketches and dedup
    bucketing — never used for cross-system comparison.
    """
    import polars as pl
    import pyarrow as pa

    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        s = pl.from_arrow(values)
    else:
        s = pl.Series(values)
    return s.hash(seed=seed).to_numpy().astype(np.uint64, copy=False)


class HyperLogLog:
    """Dense HyperLogLog with 2**p registers."""

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (registers if registers is not None
                          else np.zeros(self.m, dtype=np.uint8))

    def add_hashes(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        idx = (hashes >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (hashes << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of rest + 1, over the (64-p)-bit suffix
        lz = np.zeros(len(rest), dtype=np.uint8)
        x = rest.copy()
        bit = np.uint64(1) << np.uint64(63)
        # vectorized leading-zero count via float log2 (exact for our use):
        fl = np.frexp(x.astype(np.float64))[1]  # exponent: bits used
        lz = (64 - fl).astype(np.uint8) + 1
        np.maximum.at(self.registers, idx, lz)

    def add(self, values, seed: int = 0) -> None:
        self.add_hashes(hash64(values, seed=seed))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def cardinality(self) -> float:
        m = float(self.m)
        regs = self.registers.astype(np.float64)
        est = (0.7213 / (1 + 1.079 / m)) * m * m / np.sum(np.exp2(-regs))
        zeros = int(np.count_nonzero(self.registers == 0))
        if est <= 2.5 * m and zeros > 0:
            est = m * math.log(m / zeros)  # linear counting, small range
        return est

    # -- digests for lineage ------------------------------------------------
    def digest(self) -> str:
        return base64.b64encode(self.registers.tobytes()).decode()

    @classmethod
    def from_digest(cls, s: str, p: int = 12) -> "HyperLogLog":
        regs = np.frombuffer(base64.b64decode(s), dtype=np.uint8).copy()
        return cls(p=p, registers=regs)


class CountMinSketch:
    """Count-min sketch (Cormode & Muthukrishnan 2005) for hot-key /
    frequency estimation over unbounded key spaces.

    depth independent hash rows x width counters; ``estimate`` takes the
    row-wise minimum, so it NEVER under-counts (one-sided error:
    est <= true + eps*N with eps = e/width at probability 1 - e^-depth).
    Merge is elementwise sum — commutative/associative, so partials built
    per batch combine in any order.  The skew detector for choosing
    salting / bucket counts BEFORE running a shuffle (SURVEY.md SS4.2
    'partitioning for shuffles')."""

    def __init__(self, width: int = 2048, depth: int = 4,
                 counts: np.ndarray | None = None):
        self.width, self.depth = width, depth
        self.counts = (counts if counts is not None
                       else np.zeros((depth, width), dtype=np.int64))

    def add(self, values, weights: np.ndarray | None = None) -> None:
        if len(values) == 0:
            return
        for d in range(self.depth):
            idx = (hash64(values, seed=1000 + d)
                   % np.uint64(self.width)).astype(np.int64)
            if weights is None:
                np.add.at(self.counts[d], idx, 1)
            else:
                np.add.at(self.counts[d], idx,
                          np.asarray(weights, dtype=np.int64))

    def estimate(self, values) -> np.ndarray:
        """(n,) int64 estimated counts — elementwise min over hash rows."""
        if len(values) == 0:
            return np.zeros(0, dtype=np.int64)
        est = None
        for d in range(self.depth):
            idx = (hash64(values, seed=1000 + d)
                   % np.uint64(self.width)).astype(np.int64)
            row = self.counts[d][idx]
            est = row if est is None else np.minimum(est, row)
        return est

    def total(self) -> int:
        return int(self.counts[0].sum())

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert (self.width, self.depth) == (other.width, other.depth)
        self.counts += other.counts
        return self

    def inner_product(self, other: "CountMinSketch") -> int:
        """Upper-bound estimate of ``sum_k count_a(k) * count_b(k)`` —
        the equi-join OUTPUT cardinality when both sketches summarize the
        join keys (AMS/CM inner-product estimator: min over rows of the
        rowwise dot; never under-estimates, over by <= eps * Na * Nb)."""
        assert (self.width, self.depth) == (other.width, other.depth)
        dots = (self.counts.astype(object)
                * other.counts.astype(object)).sum(axis=1)
        return int(min(dots))

    def digest(self) -> str:
        return base64.b64encode(self.counts.tobytes()).decode()

    @classmethod
    def from_digest(cls, s: str, width: int = 2048,
                    depth: int = 4) -> "CountMinSketch":
        counts = np.frombuffer(base64.b64decode(s),
                               dtype=np.int64).reshape(depth, width).copy()
        return cls(width=width, depth=depth, counts=counts)


class TDigest:
    """Merging t-digest (Dunning & Ertl) for streaming quantiles."""

    def __init__(self, delta: int = 200,
                 means: np.ndarray | None = None, weights: np.ndarray | None = None):
        self.delta = delta
        self.means = means if means is not None else np.empty(0, dtype=np.float64)
        self.weights = weights if weights is not None else np.empty(0, dtype=np.float64)
        self._min = math.inf
        self._max = -math.inf

    def add(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if len(values) == 0:
            return
        self._min = min(self._min, float(values.min()))
        self._max = max(self._max, float(values.max()))
        means = np.concatenate([self.means, values])
        weights = np.concatenate([self.weights, np.ones(len(values))])
        self.means, self.weights = self._compress(means, weights)

    def merge(self, other: "TDigest") -> "TDigest":
        self._min = min(self._min, other._min)
        self._max = max(self._max, other._max)
        means = np.concatenate([self.means, other.means])
        weights = np.concatenate([self.weights, other.weights])
        self.means, self.weights = self._compress(means, weights)
        return self

    def _compress(self, means: np.ndarray, weights: np.ndarray):
        """Vectorized k1-scale recompression: bucket centroids by
        floor(k(q)) at their right cumulative-weight edge, merge buckets with
        np.add.reduceat — no Python loop over values."""
        if len(means) == 0:
            return means, weights
        order = np.argsort(means, kind="mergesort")
        means, weights = means[order], weights[order]
        total = weights.sum()
        q_right = np.cumsum(weights) / total
        # k1 scale: k(q) = delta/(2pi) * asin(2q-1)
        k_vals = self.delta / (2 * math.pi) * np.arcsin(
            np.clip(2 * q_right - 1, -1.0, 1.0))
        bucket = np.floor(k_vals)
        seg_starts = np.concatenate(
            ([0], np.nonzero(np.diff(bucket))[0] + 1))
        out_w = np.add.reduceat(weights, seg_starts)
        out_m = np.add.reduceat(weights * means, seg_starts) / out_w
        return out_m, out_w

    @property
    def count(self) -> float:
        return float(self.weights.sum())

    def quantile(self, q: float) -> float:
        if len(self.means) == 0:
            return math.nan
        if len(self.means) == 1:
            return float(self.means[0])
        total = self.weights.sum()
        target = q * total
        cum = np.cumsum(self.weights) - self.weights / 2
        if target <= cum[0]:
            return float(self._min if math.isfinite(self._min) else self.means[0])
        if target >= cum[-1]:
            return float(self._max if math.isfinite(self._max) else self.means[-1])
        idx = np.searchsorted(cum, target)
        lo, hi = idx - 1, idx
        frac = (target - cum[lo]) / (cum[hi] - cum[lo])
        return float(self.means[lo] + frac * (self.means[hi] - self.means[lo]))

    def digest(self) -> str:
        payload = {
            "delta": self.delta,
            "min": None if not math.isfinite(self._min) else self._min,
            "max": None if not math.isfinite(self._max) else self._max,
            "means": base64.b64encode(self.means.astype(np.float64).tobytes()).decode(),
            "weights": base64.b64encode(self.weights.astype(np.float64).tobytes()).decode(),
        }
        return json.dumps(payload)

    @classmethod
    def from_digest(cls, s: str) -> "TDigest":
        d = json.loads(s)
        td = cls(delta=d["delta"],
                 means=np.frombuffer(base64.b64decode(d["means"]), dtype=np.float64).copy(),
                 weights=np.frombuffer(base64.b64decode(d["weights"]), dtype=np.float64).copy())
        td._min = d["min"] if d["min"] is not None else math.inf
        td._max = d["max"] if d["max"] is not None else -math.inf
        return td


class ColumnStats:
    """count / null_count / min / max per column + optional value histogram."""

    def __init__(self, stats: dict[str, dict] | None = None):
        self.stats = stats or {}

    def update_from_table(self, table, hist_columns: set[str] | frozenset = frozenset()):
        import pyarrow as pa
        import pyarrow.compute as pc

        for name in table.schema.names:
            col = table.column(name)
            s = self.stats.setdefault(name, {"count": 0, "null_count": 0,
                                             "min": None, "max": None, "hist": {}})
            s["count"] += len(col)
            s["null_count"] += col.null_count
            dt = col.type
            if (pa.types.is_integer(dt) or pa.types.is_floating(dt)
                    or pa.types.is_string(dt) or pa.types.is_large_string(dt)
                    or pa.types.is_timestamp(dt) or pa.types.is_date(dt)
                    or pa.types.is_boolean(dt)):
                if len(col) > col.null_count:
                    mm = pc.min_max(col)
                    mn, mx = mm["min"].as_py(), mm["max"].as_py()
                    s["min"] = mn if s["min"] is None else min(s["min"], mn)
                    s["max"] = mx if s["max"] is None else max(s["max"], mx)
            # exact sums for mean-style assertions, fused with the scan:
            # int columns sum exactly (python-int accumulation, unbounded);
            # float columns quantize each value at 2^20 BEFORE summation so
            # partial sums are associative and partitioning-independent.
            # sum_scale makes the record self-describing for consumers.
            if pa.types.is_integer(dt):
                if len(col) > col.null_count:
                    s["sum_i"] = (s.get("sum_i", 0)
                                  + int(pc.sum(col).as_py() or 0))
                s["sum_scale"] = 1
            elif pa.types.is_floating(dt):
                if len(col) > col.null_count:
                    import numpy as _np
                    v = pc.drop_null(col).to_numpy(zero_copy_only=False)
                    s["sum_i"] = (s.get("sum_i", 0)
                                  + int(_np.round(v * (1 << 20))
                                        .astype(_np.int64).sum()))
                s["sum_scale"] = 1 << 20
            if name in hist_columns:
                vc = col.value_counts()
                if isinstance(vc, pa.ChunkedArray):
                    vc = vc.combine_chunks()
                for item in vc.to_pylist():
                    key = str(item["values"])
                    s["hist"][key] = s["hist"].get(key, 0) + item["counts"]
        return self

    def merge(self, other: "ColumnStats") -> "ColumnStats":
        for name, o in other.stats.items():
            s = self.stats.setdefault(name, {"count": 0, "null_count": 0,
                                             "min": None, "max": None, "hist": {}})
            s["count"] += o["count"]
            s["null_count"] += o["null_count"]
            for key, pick in (("min", min), ("max", max)):
                if o[key] is not None:
                    s[key] = o[key] if s[key] is None else pick(s[key], o[key])
            if "sum_i" in o or "sum_i" in s:
                s["sum_i"] = s.get("sum_i", 0) + o.get("sum_i", 0)
            if "sum_scale" in o:
                s["sum_scale"] = o["sum_scale"]
            for k, v in o.get("hist", {}).items():
                s["hist"][k] = s["hist"].get(k, 0) + v
        return self

    def to_json(self) -> str:
        return json.dumps(self.stats, default=str, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "ColumnStats":
        return cls(json.loads(s))
