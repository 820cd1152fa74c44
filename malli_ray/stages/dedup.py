"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding near-dup.

Ray-native designs (no reference analogue — malli is single-value; these are
the north-rule "large-scale training-data pipeline" operators):

  - exact: content-hash per batch (two-seed 64-bit xxhash == 128-bit key, no
    realistic collisions at 10^12 rows), then ONE groupby on the hash —
    shuffle volume is (hash, id), never the text payload.
  - MinHash+LSH: per-batch vectorized shingle->minhash signatures (numpy
    universal hashing), banded into (band, band_hash, id) rows; a groupby on
    the band bucket surfaces candidate groups; candidates verified by
    signature agreement (unbiased Jaccard estimator).  Classic MMDS ch.3
    construction (Broder 1997; Leskovec/Rajaraman/Ullman).
  - SimHash (Charikar 2002): vectorized 64-bit fingerprints via unpacked bit
    votes; near-dup pairs via the 4x16-bit chunk pigeonhole bucketing
    (hamming<=3 pairs must share a chunk).
  - embedding near-dup: random-hyperplane LSH buckets + exact cosine verify
    within buckets.
"""

from __future__ import annotations

import re
from typing import Any, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import AggregateFn, Count, Min, Sum

from ..state.sketches import hash64

__all__ = [
    "add_content_hash", "exact_dup_groups", "exact_dedup_keep_first",
    "MinHasher", "minhash_lsh_candidates", "SimHasher", "simhash_near_dups",
    "ngram_jaccard", "embedding_near_dups",
]

_MERSENNE = (1 << 61) - 1


def add_content_hash(ds: Dataset, column: str, out: str = "content_hash") -> Dataset:
    """Append a 128-bit (hex) content hash of ``column``."""

    def hash_batch(batch: pa.Table) -> pa.Table:
        h1 = hash64(batch.column(column), seed=1)
        h2 = hash64(batch.column(column), seed=2)
        hx = np.char.add(np.char.zfill(np.vectorize(lambda v: format(v, "x"))(h1), 16),
                         np.char.zfill(np.vectorize(lambda v: format(v, "x"))(h2), 16))
        return batch.append_column(out, pa.array(hx.tolist(), type=pa.string()))

    return ds.map_batches(hash_batch, batch_format="pyarrow")


def _hash_combine(column: str, id_column: str):
    """Map-side combine: per-batch (hash -> min id, count) before the shuffle
    — a hot duplicated document collapses to one row per block, so the
    groupby never sees a skewed key at full multiplicity."""

    def combine(batch: pa.Table) -> pa.Table:
        h1 = hash64(batch.column(column), seed=1)
        h2 = hash64(batch.column(column), seed=2)
        hx = [f"{a:016x}{b:016x}" for a, b in zip(h1.tolist(), h2.tolist())]
        t = pa.table({"content_hash": pa.array(hx, type=pa.string()),
                      id_column: batch.column(id_column)})
        g = t.group_by("content_hash").aggregate(
            [(id_column, "min"), ("content_hash", "count")])
        # rename by NAME: aggregate output column order differs across
        # pyarrow versions (key-first on >=14, key-last before)
        mapping = {f"{id_column}_min": id_column, "content_hash_count": "cnt",
                   "content_hash": "content_hash"}
        return g.rename_columns([mapping[n] for n in g.schema.names])

    return combine


def exact_dup_groups(ds: Dataset, column: str, id_column: str) -> Dataset:
    """(content_hash, n, keep_id) for every group with n > 1."""
    partial = ds.map_batches(_hash_combine(column, id_column),
                             batch_format="pyarrow")
    g = partial.groupby("content_hash").aggregate(
        Sum("cnt", alias_name="n"), Min(id_column, alias_name="keep_id"))
    return g.filter(expr="n > 1")


def exact_dedup_keep_first(ds: Dataset, column: str, id_column: str) -> Dataset:
    """One id per distinct content (the minimum id — deterministic keep rule)."""
    partial = ds.map_batches(_hash_combine(column, id_column),
                             batch_format="pyarrow")
    return (partial.groupby("content_hash")
            .aggregate(Min(id_column, alias_name=id_column))
            .select_columns([id_column]))


_WORD_RE = re.compile(r"\S+")


def _word_shingles(text: str, k: int) -> list[str]:
    words = _WORD_RE.findall(text or "")
    if len(words) < k:
        return [" ".join(words)] if words else [""]
    return [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]


class MinHasher:
    """Vectorized minhash signatures (stateful stage: permutation parameters
    generated once per actor from a fixed seed)."""

    def __init__(self, text_column: str, id_column: str, num_perm: int = 128,
                 shingle_k: int = 3, seed: int = 42,
                 bands: int = 16):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.text_column = text_column
        self.id_column = id_column
        self.shingle_k = shingle_k
        self.bands = bands
        self.rows_per_band = num_perm // bands

    def signatures(self, texts: list[str]) -> np.ndarray:
        """(n_docs, num_perm) uint64 signature matrix.

        One (total_shingles x num_perm) universal-hash matrix for the WHOLE
        batch, then a single segmented min (np.minimum.reduceat) per batch —
        no per-document Python loop."""
        import polars as pl
        all_shingles: list[str] = []
        counts = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            sh = _word_shingles(t, self.shingle_k)
            counts[i] = len(sh)
            all_shingles.extend(sh)
        M = np.uint64(_MERSENNE)
        if not all_shingles:
            return np.full((len(texts), self.num_perm), M, dtype=np.uint64)
        base = pl.Series(all_shingles).hash(seed=7).to_numpy().astype(np.uint64)
        vals = (base[:, None] * self.a[None, :] + self.b[None, :]) % M
        starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
        # _word_shingles never returns an empty list, so every segment is
        # non-empty and reduceat is well-defined
        return np.minimum.reduceat(vals, starts, axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Emit (band, band_hash, id, sig) rows — the LSH flat-map.

        Shuffle-volume design: the carried signature is 1 byte per
        permutation (low byte of each minhash). Signature-equality estimation
        still works; per-perm accidental agreement adds ~1/256 (~+0.4%) to
        the estimate — negligible vs 16x less all-to-all traffic.
        """
        texts = batch.column(self.text_column).to_pylist()
        ids = batch.column(self.id_column)
        sigs = self.signatures(texts)
        n = len(texts)
        r = self.rows_per_band
        sig_small = (sigs & np.uint64(0xFF)).astype(np.uint8)
        sig_bytes = [sig_small[i].tobytes() for i in range(n)]
        # per-band FNV combine (band b occupies sigs[:, b*r:(b+1)*r])
        prime = np.uint64(0x100000001B3)
        bh = np.empty((n, self.bands), dtype=np.uint64)
        for b in range(self.bands):
            seg = sigs[:, b * r:(b + 1) * r]
            h = np.full(n, np.uint64(0xCBF29CE484222325), dtype=np.uint64)
            for c in range(seg.shape[1]):
                h = (h * prime) ^ seg[:, c]
            bh[:, b] = h
        band_col = np.repeat(np.arange(self.bands, dtype=np.int32), n)
        hash_col = (bh.T.reshape(-1) & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
        id_col = pa.concat_arrays(
            [ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids]
            * self.bands)
        return pa.table({"band": pa.array(band_col),
                         "band_hash": pa.array(hash_col),
                         "id": id_col,
                         "sig": pa.array(sig_bytes * self.bands, type=pa.binary())})


def minhash_lsh_candidates(ds: Dataset, text_column: str, id_column: str,
                           num_perm: int = 128, bands: int = 16,
                           shingle_k: int = 3, threshold: float = 0.5,
                           concurrency=None) -> Dataset:
    """Near-duplicate pairs (id_a, id_b, est_jaccard >= threshold).

    shingle->minhash->band->bucket groupby; pairs verified by signature
    agreement within each bucket group; deduped across bands by keeping the
    pair only in its first matching band... (pairs may appear once per band;
    final distinct via groupby on the pair key).
    """
    from . import cached_stage, concurrency_kwargs
    band_ds = ds.map_batches(
        cached_stage(MinHasher, text_column=text_column, id_column=id_column,
                     num_perm=num_perm, shingle_k=shingle_k, bands=bands),
        batch_format="pyarrow", **concurrency_kwargs(concurrency))

    def emit_pairs(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n < 2:
            return pa.table({"id_a": pa.array([], type=group.column("id").type),
                             "id_b": pa.array([], type=group.column("id").type),
                             "est_jaccard": pa.array([], type=pa.float64())})
        ids = group.column("id").to_pylist()
        sigs = [np.frombuffer(b, dtype=np.uint8) for b in group.column("sig").to_pylist()]
        a_out, b_out, j_out = [], [], []
        for i in range(n):
            for j in range(i + 1, n):
                if ids[i] == ids[j]:
                    continue
                est = float((sigs[i] == sigs[j]).mean())
                if est >= threshold:
                    lo, hi = sorted((ids[i], ids[j]))
                    a_out.append(lo)
                    b_out.append(hi)
                    j_out.append(est)
        return pa.table({"id_a": a_out, "id_b": b_out,
                         "est_jaccard": pa.array(j_out, type=pa.float64())})

    pairs = band_ds.groupby(["band", "band_hash"]).map_groups(
        emit_pairs, batch_format="pyarrow")
    # distinct pairs (a pair can fire in multiple bands)
    from ray.data.aggregate import Max
    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Max("est_jaccard", alias_name="est_jaccard"))


class SimHasher:
    """64-bit SimHash fingerprints, vectorized via unpacked bit votes."""

    def __init__(self, text_column: str, out: str = "simhash"):
        self.text_column = text_column
        self.out = out

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl
        texts = batch.column(self.text_column).to_pylist()
        words_per_doc = [(_WORD_RE.findall(t or "") or [""]) for t in texts]
        counts = np.fromiter((len(w) for w in words_per_doc), dtype=np.int64,
                             count=len(words_per_doc))
        flat = [w for ws in words_per_doc for w in ws]
        h = pl.Series(flat).hash(seed=11).to_numpy().astype(np.uint64)
        bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1,
                             bitorder="little").astype(np.int32)  # (n_words, 64)
        votes = bits * 2 - 1
        offsets = np.concatenate(([0], np.cumsum(counts)))[:-1]
        sums = np.add.reduceat(votes, offsets, axis=0)  # (n_docs, 64)
        fp_bits = (sums > 0).astype(np.uint8)
        fp = np.packbits(fp_bits, axis=1, bitorder="little").view(np.uint64).ravel()
        return batch.append_column(self.out, pa.array(fp, type=pa.uint64()))


def simhash_near_dups(ds: Dataset, text_column: str, id_column: str,
                      max_hamming: int = 3, concurrency=None) -> Dataset:
    """Near-dup pairs by SimHash: 4x16-bit chunk bucketing + hamming verify.

    Any pair with hamming distance <= 3 over 64 bits agrees exactly on at
    least one of the 4 16-bit chunks (pigeonhole), so bucketing each chunk
    finds all such pairs.
    """
    from . import cached_stage, concurrency_kwargs
    fp_ds = ds.map_batches(cached_stage(SimHasher, text_column=text_column),
                           batch_format="pyarrow",
                           **concurrency_kwargs(concurrency))

    def chunk_rows(batch: pa.Table) -> pa.Table:
        fp = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch.column(id_column)
        out = []
        for c in range(4):
            chunk = ((fp >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64)
            out.append(pa.table({"chunk_id": pa.array(np.full(len(fp), c, dtype=np.int32)),
                                 "chunk_val": pa.array(chunk),
                                 "id": ids,
                                 "fp": pa.array(fp.astype(np.int64))}))
        return pa.concat_tables(out)

    chunked = fp_ds.map_batches(chunk_rows, batch_format="pyarrow")

    def verify(group: pa.Table) -> pa.Table:
        n = group.num_rows
        empty = pa.table({"id_a": pa.array([], type=group.column("id").type),
                          "id_b": pa.array([], type=group.column("id").type),
                          "hamming": pa.array([], type=pa.int32())})
        if n < 2:
            return empty
        ids = group.column("id").to_pylist()
        fp = group.column("fp").to_numpy(zero_copy_only=False).astype(np.int64).astype(np.uint64)
        a_out, b_out, d_out = [], [], []
        for i in range(n):
            x = fp[i] ^ fp[i + 1:]
            d = np.array([bin(int(v)).count("1") for v in x])
            for off in np.nonzero(d <= max_hamming)[0]:
                j = i + 1 + off
                if ids[i] == ids[j]:
                    continue
                lo, hi = sorted((ids[i], ids[j]))
                a_out.append(lo)
                b_out.append(hi)
                d_out.append(int(d[off]))
        return pa.table({"id_a": a_out, "id_b": b_out,
                         "hamming": pa.array(d_out, type=pa.int32())})

    pairs = chunked.groupby(["chunk_id", "chunk_val"]).map_groups(
        verify, batch_format="pyarrow")
    from ray.data.aggregate import Min as MinAgg
    return pairs.groupby(["id_a", "id_b"]).aggregate(
        MinAgg("hamming", alias_name="hamming"))


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact word-shingle Jaccard (the verifier for LSH candidates)."""
    sa, sb = set(_word_shingles(text_a, k)), set(_word_shingles(text_b, k))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def embedding_near_dups(ds: Dataset, emb_column: str, id_column: str,
                        threshold: float = 0.95, n_planes: int = 12,
                        seed: int = 42, concurrency=None) -> Dataset:
    """Cosine near-duplicate pairs via random-hyperplane LSH + exact verify.

    Buckets by the sign pattern of ``n_planes`` random projections (scale
    path: bucket count 2^n_planes keeps groups small); exact cosine inside
    each bucket. Recall < 1 by construction (documented); raise n_planes
    repeats for higher recall.
    """

    class Bucketer:
        def __init__(self):
            self.planes = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({
                    "bucket": pa.array([], type=pa.int64()),
                    "id": pa.array([], type=batch.schema.field(id_column).type),
                    "unit": pa.array([], type=pa.list_(pa.float64()))})
            emb = np.asarray(batch.column(emb_column).to_pylist(), dtype=np.float64)
            if self.planes is None:
                rng = np.random.default_rng(seed)
                self.planes = rng.standard_normal((emb.shape[1], n_planes))
            signs = (emb @ self.planes) > 0
            bucket = np.packbits(signs, axis=1, bitorder="little")[:, 0:2]
            bucket_id = bucket[:, 0].astype(np.int64)
            if bucket.shape[1] > 1:
                bucket_id |= bucket[:, 1].astype(np.int64) << 8
            norm = np.linalg.norm(emb, axis=1, keepdims=True)
            norm[norm == 0] = 1.0
            unit = emb / norm
            return pa.table({
                "bucket": pa.array(bucket_id),
                "id": batch.column(id_column),
                "unit": pa.array(list(unit), type=pa.list_(pa.float64()))})

    def verify(group: pa.Table) -> pa.Table:
        n = group.num_rows
        empty = pa.table({"id_a": pa.array([], type=group.column("id").type),
                          "id_b": pa.array([], type=group.column("id").type),
                          "cosine": pa.array([], type=pa.float64())})
        if n < 2:
            return empty
        ids = group.column("id").to_pylist()
        unit = np.asarray(group.column("unit").to_pylist(), dtype=np.float64)
        sims = unit @ unit.T
        a_out, b_out, c_out = [], [], []
        ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
        for i, j in zip(ii, jj):
            if ids[i] == ids[j]:
                continue
            lo, hi = sorted((ids[i], ids[j]))
            a_out.append(lo)
            b_out.append(hi)
            c_out.append(float(sims[i, j]))
        return pa.table({"id_a": a_out, "id_b": b_out,
                         "cosine": pa.array(c_out, type=pa.float64())})

    bucketed = ds.map_batches(Bucketer, batch_format="pyarrow",
                              concurrency=concurrency or (1, 8))
    pairs = bucketed.groupby("bucket").map_groups(verify, batch_format="pyarrow")
    from ray.data.aggregate import Max
    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Max("cosine", alias_name="cosine"))
