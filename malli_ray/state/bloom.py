"""Bloom filter for cross-run incremental deduplication.

The exact-dedup family (stages/dedup.py) dedupes WITHIN one corpus via a
key-only shuffle.  An incremental pipeline ("dedupe today's crawl against
everything already ingested") cannot re-shuffle the historical corpus every
run; the standard scale answer is a Bloom digest of the seen keys: build it
once per ingested partition (mergeable by bitwise OR), persist it, and
filter new data with a broadcast, shuffle-free membership probe.

Properties (Bloom 1970):
  - NO false negatives: a seen key always hits, so a kept row is genuinely
    new.
  - False positives at rate ~(1 - e^{-kn/m})^k: a genuinely-new row may be
    dropped.  Size ``capacity``/``fp_rate`` for the tolerable loss; the
    filter is deterministic (fixed hash seeds), so the FP set is a fixed
    function of the data, not a per-run draw.
  - Merge = bitwise OR (same m, k): per-batch partial filters combine in
    any order, so the distributed build is one streaming pass with small
    (m/8-byte) partials and NO shuffle.

At 100 TB the single bit-array does not fit one worker (1e10 keys at 1%
-> ~12 GiB): shard the filter by key-hash prefix (one Bloom per shard,
rows routed by the same prefix) and broadcast only the shards a task
needs; the class supports that layout by construction (any number of
independent filters OR-merge per shard).  hash64 (polars xxhash, the
engine's pinned hash kernel) provides the two base hashes; probe index i
uses the standard double-hashing h1 + i*h2 (Kirsch & Mitzenmacher 2006).
"""

from __future__ import annotations

import base64
import json
import math

import numpy as np

__all__ = ["BloomFilter"]


class BloomFilter:
    """Vectorized Bloom filter over arbitrary Arrow/numpy columns."""

    def __init__(self, capacity: int, fp_rate: float = 0.01,
                 bits: "np.ndarray | None" = None, seed: int = 0):
        if capacity <= 0:
            raise ValueError("capacity must be positive")
        if not 0.0 < fp_rate < 1.0:
            raise ValueError("fp_rate must be in (0, 1)")
        self.capacity = int(capacity)
        self.fp_rate = float(fp_rate)
        self.seed = int(seed)
        # optimal m = -n ln p / (ln 2)^2, k = (m/n) ln 2
        m = int(math.ceil(-capacity * math.log(fp_rate) / (math.log(2) ** 2)))
        self.m = max(64, (m + 63) // 64 * 64)            # word-aligned
        self.k = max(1, round(self.m / capacity * math.log(2)))
        self.bits = (np.zeros(self.m // 64, dtype=np.uint64)
                     if bits is None else bits)
        if len(self.bits) * 64 != self.m:
            raise ValueError("bits length does not match capacity/fp_rate")

    # -- hashing ----------------------------------------------------------
    def _positions(self, values) -> np.ndarray:
        """(n, k) bit positions via double hashing of the value column."""
        from .sketches import hash64
        h1 = hash64(values, seed=self.seed + 101)
        h2 = hash64(values, seed=self.seed + 202) | np.uint64(1)  # odd
        i = np.arange(self.k, dtype=np.uint64)
        return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(self.m)

    # -- core ops ----------------------------------------------------------
    def add(self, values) -> None:
        if len(values) == 0:
            return
        pos = self._positions(values).ravel()
        np.bitwise_or.at(self.bits, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))

    def contains(self, values) -> np.ndarray:
        """Vectorized membership mask (True = probably seen)."""
        if len(values) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(values)
        word = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
        hit = (word >> (pos & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=1)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (other.m, other.k, other.seed) != (self.m, self.k, self.seed):
            raise ValueError("cannot merge Bloom filters with different "
                             "geometry (m, k, seed)")
        self.bits |= other.bits
        return self

    @property
    def fill_ratio(self) -> float:
        """Fraction of set bits — the saturation gauge (>0.5 means the
        filter is past its design capacity; rebuild bigger)."""
        return float(np.unpackbits(self.bits.view(np.uint8)).mean())

    # -- persistence -------------------------------------------------------
    def digest(self) -> str:
        head = {"capacity": self.capacity, "fp_rate": self.fp_rate,
                "seed": self.seed}
        raw = self.bits.tobytes()
        return json.dumps({**head,
                           "bits": base64.b64encode(raw).decode("ascii")})

    @classmethod
    def from_digest(cls, s: str) -> "BloomFilter":
        d = json.loads(s)
        bits = np.frombuffer(
            base64.b64decode(d["bits"]), dtype=np.uint64).copy()
        return cls(d["capacity"], d["fp_rate"], bits=bits, seed=d["seed"])

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.digest())

    @classmethod
    def load(cls, path: str) -> "BloomFilter":
        with open(path) as f:
            return cls.from_digest(f.read())
