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

import logging
import re
from typing import Any, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

logger = logging.getLogger(__name__)

#: 256-entry popcount lookup table (vectorized hamming distance)
_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _stable_dot(a: np.ndarray, b: np.ndarray) -> float:
    """Machine-independent float64 dot product: elementwise products are
    correctly-rounded IEEE multiplies, math.fsum is exactly rounded — so the
    result is bit-identical on every CPU/BLAS build.  `a @ b` dispatches to
    BLAS ddot, whose summation order (and hence last-ulp rounding) varies
    across machines; the golden fixtures pin emitted cosines bit-exactly, so
    every per-pair cosine the engine EMITS must go through this.  Only for
    the emitted pairs (pairs << n^2) — matmul prefilters stay BLAS."""
    import math
    return math.fsum((a * b).tolist())


def _collapse_identical(keys: np.ndarray, ids: list):
    """Group rows by identical key rows (2-D uint array) and return
    (unique_keys, representative_min_id_per_group, inverse_group_index).

    This is the in-bucket exact-duplicate collapse: a cluster of k identical
    documents shares one signature/fingerprint, so pairwise verification cost
    depends on DISTINCT contents, not raw multiplicity (the k^2 blowup the
    naive bucket verify has).  Exact-duplicate multiplicity itself is the job
    of exact_dup_groups."""
    uniq, inverse = np.unique(keys, axis=0, return_inverse=True)
    inverse = inverse.ravel()
    reps: list = [None] * len(uniq)
    for row_i, g in enumerate(inverse):
        rid = ids[row_i]
        if reps[g] is None or rid < reps[g]:
            reps[g] = rid
    return uniq, reps, inverse

from ray.data import Dataset
from ray.data.aggregate import AggregateFn, Count, Min, Sum

from ..state.sketches import hash64

__all__ = [
    "add_content_hash", "exact_dup_groups", "exact_dedup_keep_first",
    "exact_dedup_keep_best",
    "MinHasher", "minhash_lsh_candidates", "prefix_jaccard_candidates",
    "containment_candidates", "ngram_containment",
    "SimHasher", "simhash_near_dups",
    "hamming_near_dups", "fuzzy_join_ed1",
    "ngram_jaccard", "embedding_near_dups",
    "semantic_codebook", "semantic_dedup_pairs", "semantic_dedup",
    "build_bloom", "filter_seen_bloom",
    "cluster_pairs", "dedup_by_clusters",
    "BandDigest", "build_band_digest", "probe_band_digest",
]

_MERSENNE = (1 << 61) - 1


def add_content_hash(ds: Dataset, column: str, out: str = "content_hash") -> Dataset:
    """Append a 128-bit (hex) content hash of ``column``."""

    def hash_batch(batch: pa.Table) -> pa.Table:
        h1 = hash64(batch.column(column), seed=1)
        h2 = hash64(batch.column(column), seed=2)
        hx = [f"{a:016x}{b:016x}" for a, b in zip(h1.tolist(), h2.tolist())]
        return batch.append_column(out, pa.array(hx, type=pa.string()))

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


def exact_dup_counts(ds: Dataset, column: str, id_column: str) -> Dataset:
    """(id_column = min id, n_copies) for EVERY distinct content of
    ``column`` — the group-multiplicity view of ``exact_dedup_keep_first``
    (``exact_dup_groups`` filtered to n > 1 loses the singletons).  Works
    on any column polars can hash, including list<int> token arrays
    (sequence-level exact dedup keys the whole token array).  Same scale
    shape: map-side (hash -> min id, count) combine, ONE groupby on the
    128-bit content hash, key-only shuffle."""
    partial = ds.map_batches(_hash_combine(column, id_column),
                             batch_format="pyarrow")
    return (partial.groupby("content_hash")
            .aggregate(Sum("cnt", alias_name="n_copies"),
                       Min(id_column, alias_name=id_column))
            .select_columns([id_column, "n_copies"]))


def exact_dedup_keep_first(ds: Dataset, column: str, id_column: str) -> Dataset:
    """One id per distinct content (the minimum id — deterministic keep rule)."""
    partial = ds.map_batches(_hash_combine(column, id_column),
                             batch_format="pyarrow")
    return (partial.groupby("content_hash")
            .aggregate(Min(id_column, alias_name=id_column))
            .select_columns([id_column]))


def exact_dedup_keep_best(ds: Dataset, column: str, id_column: str,
                          score_column: str) -> Dataset:
    """One id per distinct content, keeping the row with the HIGHEST
    ``score_column`` (ties to the minimum id) — the quality-aware keep
    rule ("of N exact duplicates keep the best-scored copy", e.g. the
    least-truncated crawl).  SQL ``QUALIFY ROW_NUMBER() OVER (PARTITION
    BY content ORDER BY score DESC, id) = 1``.

    Same scale shape as ``exact_dedup_keep_first``: a map-side per-batch
    argmax collapses duplicates inside every block before the shuffle
    (only (hash, id, score) rows move, a hot content key arrives
    pre-collapsed per block), then one groupby picks the global best per
    content hash.  Null scores lose to any non-null score."""

    def combine(batch: pa.Table) -> pa.Table:
        h1 = hash64(batch.column(column), seed=1)
        h2 = hash64(batch.column(column), seed=2)
        hx = [f"{a:016x}{b:016x}" for a, b in zip(h1.tolist(), h2.tolist())]
        t = pa.table({"content_hash": pa.array(hx, type=pa.string()),
                      id_column: batch.column(id_column),
                      score_column: batch.column(score_column)})
        t = t.sort_by([("content_hash", "ascending"),
                       (score_column, "descending"),
                       (id_column, "ascending")])
        ch = t.column("content_hash").to_numpy(zero_copy_only=False)
        first = np.ones(len(ch), dtype=bool)
        first[1:] = ch[1:] != ch[:-1]
        return t.filter(pa.array(first))

    def bucketize(batch: pa.Table) -> pa.Table:
        h = hash64(batch.column("content_hash"), seed=53) % np.uint64(64)
        return batch.append_column(
            "__kbbkt__", pa.array(h.astype(np.int64)))

    def best(g: pa.Table) -> pa.Table:
        # bucketed, NOT per-content map_groups (one Python call per
        # distinct text at corpus scale): one sort + run-first mask
        g = g.sort_by([("content_hash", "ascending"),
                       (score_column, "descending"),
                       (id_column, "ascending")])
        ch = g.column("content_hash").to_numpy(zero_copy_only=False)
        first = np.ones(len(ch), dtype=bool)
        first[1:] = ch[1:] != ch[:-1]
        return g.filter(pa.array(first)).select([id_column])

    return (ds.map_batches(combine, batch_format="pyarrow")
            .map_batches(bucketize, batch_format="pyarrow")
            .groupby("__kbbkt__")
            .map_groups(best, batch_format="pyarrow"))


def cross_source_dup_matrix(ds: Dataset, column: str, source_column: str,
                            num_buckets: int = 64,
                            num_partitions: "int | None" = None) -> Dataset:
    """Cross-source exact-duplication matrix — the "who copies whom"
    corpus diagnostic (CommonCrawl vs Wikipedia overlap, mirror-site
    detection, snapshot drift between ingestion feeds): one row per
    ORDERED source pair ``(source_a, source_b)`` with ``a != b``, where
    ``n_docs`` counts the documents of ``source_a`` whose exact content
    also occurs somewhere in ``source_b``.  SQL: a self-join of
    per-(content, source) doc counts.

    Scale shape: a map-side ``(h1, h2, source, cnt)`` combine per batch
    (the 128-bit content-hash discipline of
    :func:`exact_dedup_keep_first`; a hot content key arrives
    pre-collapsed per block and the text payload never shuffles), ONE
    ``h1 % num_buckets`` key exchange, and per bucket one vectorized
    segmented cartesian product over each key's source set — keys held
    by a single source (the vast majority of a real corpus) are
    filtered out BEFORE expansion, so the pair blowup is bounded by
    actual cross-source duplication, never corpus size.  The finisher is
    an O(sources^2)-row groupby-sum.  Null sources fold to ``''``
    map-side (SQL COALESCE parity)."""
    import polars as pl

    from ray.data.aggregate import Sum

    nb = np.uint64(num_buckets)

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(column)
        src = pc.fill_null(batch.column(source_column),
                           pa.scalar("", pa.string()))
        df = pl.DataFrame({
            "h1": hash64(col, seed=1).view(np.int64),
            "h2": hash64(col, seed=2).view(np.int64),
            "s": pl.from_arrow(src)})
        g = df.group_by(["h1", "h2", "s"]).len(name="cnt")
        t = g.to_arrow()
        b = (t.column("h1").to_numpy(zero_copy_only=False)
             .view(np.uint64) % nb).astype(np.int64)
        return pa.table({
            "h1": t.column("h1"), "h2": t.column("h2"),
            "s": t.column("s").cast(pa.string()),
            "cnt": pc.cast(t.column("cnt"), pa.int64()),
            "__b__": pa.array(b)})

    def expand(g: pa.Table) -> pa.Table:
        empty = pa.table({"source_a": pa.array([], pa.string()),
                          "source_b": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if g.num_rows == 0 or "h1" not in g.column_names:
            return empty
        g = g.sort_by([("h1", "ascending"), ("h2", "ascending"),
                       ("s", "ascending")])
        # collapse duplicate (h1, h2, s) rows FIRST (the same content in
        # the same source spans map batches, one partial row per batch)
        # — without this, repeated rows of one source would pair with
        # each other (a self-pair the semantics forbid) and overcount
        # the b-side
        h1 = g.column("h1").to_numpy(zero_copy_only=False)
        h2 = g.column("h2").to_numpy(zero_copy_only=False)
        s_arr = g.column("s")
        if isinstance(s_arr, pa.ChunkedArray):
            s_arr = s_arr.combine_chunks()
        s_np = s_arr.to_numpy(zero_copy_only=False)
        cnt_np = g.column("cnt").to_numpy(zero_copy_only=False)
        key_first = np.ones(len(h1), dtype=bool)
        key_first[1:] = ((h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
                         | (s_np[1:] != s_np[:-1]))
        kstarts = np.flatnonzero(key_first)
        cnt_c = np.add.reduceat(cnt_np, kstarts) if len(kstarts) else \
            np.empty(0, dtype=np.int64)
        h1, h2, s_np = h1[kstarts], h2[kstarts], s_np[kstarts]
        src = s_arr.take(pa.array(kstarts, pa.int64()))
        new = np.ones(len(h1), dtype=bool)
        new[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        run_id = np.cumsum(new) - 1
        l = np.bincount(run_id) if len(run_id) else \
            np.empty(0, dtype=np.int64)          # sources per content key
        multi = l[run_id] >= 2 if len(run_id) else \
            np.empty(0, dtype=bool)              # drop single-source keys
        if not multi.any():
            return empty
        keep_i = np.flatnonzero(multi)
        src = src.take(pa.array(keep_i, pa.int64()))
        cnt = cnt_c[keep_i]
        run_id = run_id[keep_i]
        _, run_id = np.unique(run_id, return_inverse=True)
        l = np.bincount(run_id)
        starts = np.concatenate(([0], np.cumsum(l)[:-1]))
        n = len(keep_i)
        per_elem = l[run_id]                   # pair count per element
        a_idx = np.repeat(np.arange(n, dtype=np.int64), per_elem)
        block = np.repeat(np.cumsum(per_elem) - per_elem, per_elem)
        within = np.arange(len(a_idx), dtype=np.int64) - block
        b_idx = starts[run_id[a_idx]] + within
        keep = a_idx != b_idx
        a_idx, b_idx = a_idx[keep], b_idx[keep]
        pairs = pa.table({
            "source_a": src.take(pa.array(a_idx)),
            "source_b": src.take(pa.array(b_idx)),
            "n": pa.array(cnt[a_idx], type=pa.int64())})
        # local combine: O(sources^2) rows leave the bucket, never pairs
        out = (pl.from_arrow(pairs).group_by(["source_a", "source_b"])
               .agg(pl.col("n").sum()).to_arrow())
        return pa.table({"source_a": out.column("source_a").cast(pa.string()),
                         "source_b": out.column("source_b").cast(pa.string()),
                         "n": pc.cast(out.column("n"), pa.int64())})

    return (ds.select_columns([column, source_column])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("__b__", num_partitions=num_partitions)
            .map_groups(expand, batch_format="pyarrow")
            .groupby(["source_a", "source_b"])
            .aggregate(Sum("n", alias_name="n_docs")))


# RE2-compatible "non-space": RE2 (pyarrow/DuckDB) \s is ASCII-only while
# Python re / rust-regex \s is unicode — the explicit class keeps shingles
# consistent with the SQL oracles on NBSP/EM-space text
_WORD_RE = re.compile(r"[^\t\n\f\r ]+")


def _word_shingles(text: str, k: int) -> list[str]:
    words = _WORD_RE.findall(text or "")
    if len(words) < k:
        return [" ".join(words)] if words else [""]
    return [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]


_FNV_PRIME = np.uint64(0x100000001B3)
_FNV_BASIS = np.uint64(0xCBF29CE484222325)


def _band_fnv(sigs: np.ndarray, bands: int) -> np.ndarray:
    """(n, bands) uint64 FNV combine of each band's signature segment —
    band b occupies ``sigs[:, b*r:(b+1)*r]``.  The documented band-bucket
    identity shared by the LSH flat-map, the cross-run band digest, and
    the golden-fixture references."""
    n, num_perm = sigs.shape
    r = num_perm // bands
    bh = np.empty((n, bands), dtype=np.uint64)
    for b in range(bands):
        seg = sigs[:, b * r:(b + 1) * r]
        h = np.full(n, _FNV_BASIS, dtype=np.uint64)
        for c in range(seg.shape[1]):
            h = (h * _FNV_PRIME) ^ seg[:, c]
        bh[:, b] = h
    return bh


def _band_digest_keys(sigs: np.ndarray, bands: int) -> np.ndarray:
    """(n, bands) uint64 digest keys: the band FNV mixed with the band
    INDEX (``fnv * prime ^ band``) so equal segment hashes in different
    bands never collide in the flat key set."""
    bh = _band_fnv(sigs, bands)
    return ((bh * _FNV_PRIME)
            ^ np.arange(bands, dtype=np.uint64)[None, :])


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

        Fully vectorized: polars extract_all + shifted concat_str builds
        every word-k-shingle for the WHOLE batch (no per-document Python
        loop), hashes them in one pass, then a single segmented min
        (np.minimum.reduceat) per permutation.  Bitwise-identical to the
        per-doc ``_word_shingles`` construction (tested)."""
        import polars as pl
        n = len(texts)
        M = np.uint64(_MERSENNE)
        if n == 0:
            return np.empty((0, self.num_perm), dtype=np.uint64)
        k = self.shingle_k
        s = pl.Series("t", texts, dtype=pl.Utf8).fill_null("")
        words = s.str.extract_all(_WORD_RE.pattern)
        wc = words.list.len().to_numpy().astype(np.int64)
        # counts: docs with >= k words emit wc-k+1 shingles; shorter docs
        # emit ONE shingle (all words joined; "" when empty) — the
        # _word_shingles contract
        long_mask = wc >= k
        counts = np.where(long_mask, wc - k + 1, 1)
        starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
        total = int(counts.sum())
        base = np.empty(total, dtype=np.uint64)
        if long_mask.any():
            lf = (pl.DataFrame({"w": words})
                  .lazy().with_row_index("doc")
                  .explode("w", empty_as_null=True))
            cols = [pl.col("w")] + [pl.col("w").shift(-i).over("doc")
                                    for i in range(1, k)]
            # concat_str yields null when any shifted word is null (the
            # trailing k-1 positions of each doc) — exactly the shingles
            # that don't exist
            sh = (lf.select(pl.concat_str(cols, separator=" ").alias("s"))
                  .collect()["s"].drop_nulls())
            h_long = sh.hash(seed=7).to_numpy().astype(np.uint64)
            lc = counts[long_mask]
            offs = (np.arange(len(h_long))
                    - np.repeat(np.cumsum(lc) - lc, lc))
            base[np.repeat(starts[long_mask], lc) + offs] = h_long
        if (~long_mask).any():
            short = words.list.join(" ")
            h_short = short.hash(seed=7).to_numpy().astype(np.uint64)
            base[starts[~long_mask]] = h_short[~long_mask]
        # per-permutation column loop: one (n_shingles,) fused multiply-add-
        # mod + segmented min per permutation — ~4x faster than the
        # (n_shingles, num_perm) broadcast matrix (stays in cache, avoids a
        # 100s-of-MB intermediate), bitwise-identical results.
        # _word_shingles never returns an empty list, so every segment is
        # non-empty and reduceat is well-defined
        out = np.empty((len(texts), self.num_perm), dtype=np.uint64)
        for j in range(self.num_perm):
            v = (base * self.a[j] + self.b[j]) % M
            out[:, j] = np.minimum.reduceat(v, starts)
        return out

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
        return self._emit_bands(ids, sigs)

    def _emit_bands(self, ids, sigs: np.ndarray) -> pa.Table:
        """(band, band_hash, id, sig) rows from a signature matrix — the
        shared LSH flat-map tail for every signature source."""
        n = sigs.shape[0]
        sig_small = (sigs & np.uint64(0xFF)).astype(np.uint8)
        sig_bytes = [sig_small[i].tobytes() for i in range(n)]
        bh = _band_fnv(sigs, self.bands)
        band_col = np.repeat(np.arange(self.bands, dtype=np.int32), n)
        hash_col = (bh.T.reshape(-1) & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
        id_col = pa.concat_arrays(
            [ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids]
            * self.bands)
        return pa.table({"band": pa.array(band_col),
                         "band_hash": pa.array(hash_col),
                         "id": id_col,
                         "sig": pa.array(sig_bytes * self.bands, type=pa.binary())})


def _list_values_offsets(col) -> "tuple[np.ndarray, np.ndarray]":
    """(values int64, offsets int64) of a list<int> column, null rows
    reading as empty.  Rebased so row i's tokens are
    values[offsets[i]:offsets[i+1]]."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_null(col.type):
        n = len(col)
        return (np.empty(0, dtype=np.int64),
                np.zeros(n + 1, dtype=np.int64))
    # fill nulls with empty lists so offsets stay monotone and complete
    if col.null_count:
        col = col.fill_null([])
    offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = col.values.to_numpy(zero_copy_only=False).astype(np.int64)
    lo = offsets[0]
    if lo or offsets[-1] != len(values):
        values = values[lo:offsets[-1]]
        offsets = offsets - lo
    return values, offsets


def token_grams(col, k: int, vocab: int) -> "tuple[np.ndarray, np.ndarray]":
    """Per-row Horner-packed token k-grams of a list<int> column.

    Returns ``(grams, starts)``: a flat int64 gram array and the per-row
    start offsets (length n_rows; row i's grams are
    ``grams[starts[i]:starts[i+1]]``, last row runs to the end).  Grams
    are EXACT integer packs ``((t0*V + t1)*V + t2)...`` — requires
    ``vocab**k < 2**63`` (raises otherwise) so the identical gram domain
    is expressible in the SQL oracle (no HASH collisions in the k-gram
    domain).  Rows shorter than k emit ONE gram packing the whole row
    (empty/null rows pack to 0) — the ``_word_shingles`` short-doc
    contract transplanted to token ids.  Caveat (shared bit-for-bit by
    the SQL oracle, so results stay consistent): the short-row pack is
    length-AMBIGUOUS — ``[5]`` and ``[0, 5]`` both pack to 5, and a
    short-row pack can coincide with a long row's k-gram — so exactness
    holds for the k-gram domain, not across mixed-length short rows.  Fully vectorized from the Arrow buffers: k gathers
    for the long rows, <=k-1 masked passes for the short ones.
    """
    if vocab ** k >= 2 ** 63:
        raise ValueError(
            f"vocab**k = {vocab}**{k} overflows int64 gram packing — "
            "lower k or hash the grams instead")
    values, offsets = _list_values_offsets(col)
    if np.any(values < 0) or np.any(values >= vocab):
        raise ValueError("token id outside [0, vocab) — exact gram "
                         "packing needs the declared vocab bound")
    lengths = np.diff(offsets)
    n = len(lengths)
    long_mask = lengths >= k
    counts = np.where(long_mask, lengths - k + 1, 1)
    starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
    grams = np.zeros(int(counts.sum()), dtype=np.int64)
    V = np.int64(vocab)
    if long_mask.any():
        lc = counts[long_mask]
        rep_off = np.repeat(offsets[:-1][long_mask], lc)
        within = (np.arange(len(rep_off), dtype=np.int64)
                  - np.repeat(np.cumsum(lc) - lc, lc))
        pos = rep_off + within
        g = values[pos]
        for t in range(1, k):
            g = g * V + values[pos + t]
        out_pos = np.repeat(starts[long_mask], lc) + within
        grams[out_pos] = g
    short_mask = ~long_mask
    if short_mask.any():
        off_s = offsets[:-1][short_mask]
        len_s = lengths[short_mask]
        pack = np.zeros(len(off_s), dtype=np.int64)
        for t in range(k - 1):
            m = len_s > t
            pack[m] = pack[m] * V + values[off_s[m] + t]
        grams[starts[short_mask]] = pack
    return grams, starts


class TokenMinHasher(MinHasher):
    """MinHash signatures over token-id k-grams of a ``list<int>`` column
    (``text_column`` names the token-list column).

    Same banding/signature contract as :class:`MinHasher`; the shingle
    domain is :func:`token_grams`' exact Horner packs, hashed once per
    batch (polars xxhash) and fed through the identical universal-hash
    permutation family.  Stateful stage: permutation parameters generated
    once per actor."""

    def __init__(self, text_column: str, id_column: str, num_perm: int = 128,
                 shingle_k: int = 3, seed: int = 42, bands: int = 16,
                 vocab: int = 50257):
        super().__init__(text_column, id_column, num_perm=num_perm,
                         shingle_k=shingle_k, seed=seed, bands=bands)
        if vocab ** shingle_k >= 2 ** 63:
            raise ValueError("vocab**shingle_k must fit int64 — see "
                             "token_grams")
        self.vocab = vocab

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl
        ids = batch.column(self.id_column)
        n = batch.num_rows
        if n == 0:
            return self._emit_bands(
                ids, np.empty((0, self.num_perm), dtype=np.uint64))
        grams, starts = token_grams(batch.column(self.text_column),
                                    self.shingle_k, self.vocab)
        base = (pl.Series(grams).hash(seed=7).to_numpy()
                .astype(np.uint64, copy=False))
        out = np.empty((n, self.num_perm), dtype=np.uint64)
        # odd-multiplier multiply-add: a BIJECTION of Z_2^64 (a|1 is
        # invertible mod 2^64), i.e. a true permutation of the already
        # xxhash-mixed gram space — and ~2x faster than the uint64
        # Mersenne mod (which, applied after the wrapping multiply, was
        # not even injective).  Family change is candidate-recall-
        # neutral: banding math holds for any uniform permutation.
        for j in range(self.num_perm):
            v = base * (self.a[j] | np.uint64(1)) + self.b[j]
            out[:, j] = np.minimum.reduceat(v, starts)
        return self._emit_bands(ids, out)


def minhash_lsh_candidates(ds: Dataset, text_column: str, id_column: str,
                           num_perm: int = 128, bands: int = 16,
                           shingle_k: int = 3, threshold: float = 0.5,
                           max_bucket: int = 1024,
                           intra_closure_cap: int = 256,
                           cross_closure_cap: int = 1024,
                           hash_buckets: int | None = 65_536,
                           fail_on_truncation: bool = False,
                           dedupe: bool = True,
                           token_mode: bool = False, vocab: int = 50257,
                           concurrency=None) -> Dataset:
    """Near-duplicate pairs (id_a, id_b, est_jaccard >= threshold) over
    DISTINCT contents.

    shingle->minhash->band->bucket groupby; inside each (band, band_hash)
    bucket identical signatures are first collapsed to their min-id
    representative (a cluster of k exact-duplicate docs costs O(k) here, not
    O(k^2) — exact multiplicity belongs to exact_dup_groups), then pairwise
    signature agreement is computed VECTORIZED over the <=``max_bucket``
    distinct signatures (oversize buckets are truncated in min-id order and
    logged — never silently).  A pair can fire in several bands; the final
    groupby keeps it once.

    ``hash_buckets``: band hashes fold modulo this count so the shuffle
    produces at most bands x hash_buckets GROUPS instead of one
    micro-group per distinct band hash — per-group task overhead dominates
    wall time for high-band configs (e.g. the r=2/b=32 exactness setting).
    Bounded BY DEFAULT (65_536) so naive callers never hit the
    micro-group trap; pass ``None`` to shuffle on raw band hashes.
    The ORIGINAL band hash rides along as a payload column and signatures
    are compared only within original buckets, so folding changes neither
    the candidate set nor the per-bucket cost — only the group count.
    ``max_bucket`` applies per ORIGINAL bucket in either mode.

    ``fail_on_truncation``: exactness mode — any cap that would silently
    drop candidate pairs (bucket truncation, closure fallbacks) RAISES
    instead of logging, so recall-guarantee runs fail loudly rather than
    returning a quietly incomplete pair set.

    ``dedupe``: a pair can fire in several bands; by default a final
    groupby keeps it once (the scale path).  ``dedupe=False`` skips that
    all-to-all and returns the raw per-band pairs — callers that pull the
    (small) pairs table to the driver anyway (e.g. the exactness verify)
    dedupe there and save one shuffle.
    """
    from . import cached_stage, concurrency_kwargs
    signer_kwargs = dict(text_column=text_column, id_column=id_column,
                         num_perm=num_perm, shingle_k=shingle_k, bands=bands)
    if token_mode:
        signer_kwargs["vocab"] = vocab
    band_ds = ds.map_batches(
        cached_stage(TokenMinHasher if token_mode else MinHasher,
                     **signer_kwargs),
        batch_format="pyarrow", **concurrency_kwargs(concurrency))
    if hash_buckets:
        # fold the shuffle KEY modulo hash_buckets (bounds the number of
        # groupby groups — per-group task overhead dominates otherwise) but
        # carry the ORIGINAL band hash as a payload column: emit_pairs
        # compares signatures only WITHIN original buckets, so folding never
        # mixes unrelated documents into one pairwise-verify matrix (that
        # u^2 blowup made folded groups quadratically expensive).
        def fold(batch: pa.Table) -> pa.Table:
            h = batch.column("band_hash").to_numpy(zero_copy_only=False)
            folded = pa.array(h % np.int64(hash_buckets))
            batch = batch.append_column("bh_orig", batch.column("band_hash"))
            return batch.set_column(
                batch.schema.get_field_index("band_hash"), "band_hash", folded)
        band_ds = band_ds.map_batches(fold, batch_format="pyarrow")

    def emit_pairs(group: pa.Table) -> pa.Table:
        id_type = group.column("id").type
        empty = pa.table({"id_a": pa.array([], type=id_type),
                          "id_b": pa.array([], type=id_type),
                          "est_jaccard": pa.array([], type=pa.float64())})
        n = group.num_rows
        if n < 2:
            return empty
        all_ids = group.column("id").to_pylist()
        sig_col = group.column("sig").to_pylist()
        all_sigs = np.frombuffer(b"".join(sig_col), dtype=np.uint8).reshape(n, -1)
        band_is_zero = group.column("band")[0].as_py() == 0
        a_out, b_out, j_out = [], [], []

        def emit(x, y, est):
            if x == y:
                return
            lo, hi = sorted((x, y))
            a_out.append(lo)
            b_out.append(hi)
            j_out.append(est)

        def process_bucket(ids: list, sigs: np.ndarray):
            """Pairwise verify ONE original (band, band_hash) bucket."""
            uniq, reps, inverse = _collapse_identical(sigs, ids)
            u = len(uniq)
            members: list[list] = [[] for _ in range(u)]
            for row_i, g in enumerate(inverse):
                members[g].append(ids[row_i])
            # identical-signature members (incl. exact duplicates): full
            # pairwise closure while the cluster is small; adversarial
            # clusters fall back to O(k) rep-member pairs with a LOGGED
            # closure truncation.  Identical sigs share EVERY band's bucket,
            # so emit only in band 0 (bands x less duplicate traffic).
            if len(ids) > u and band_is_zero:
                for g in range(u):
                    mem = members[g]
                    k = len(mem)
                    if k < 2:
                        continue
                    if k <= intra_closure_cap:
                        for i in range(k):
                            for j in range(i + 1, k):
                                emit(mem[i], mem[j], 1.0)
                    elif fail_on_truncation:
                        raise RuntimeError(
                            f"minhash exactness run: identical-sig cluster "
                            f"of {k} members exceeds intra_closure_cap="
                            f"{intra_closure_cap}; raise the cap")
                    else:
                        logger.warning(
                            "minhash identical-sig cluster of %d members > "
                            "closure cap %d: emitting rep-member pairs only "
                            "(%d of %d pairs)", k, intra_closure_cap, k - 1,
                            k * (k - 1) // 2)
                        rep = reps[g]
                        for rid in mem:
                            emit(rep, rid, 1.0)
            if u > max_bucket:
                if fail_on_truncation:
                    raise RuntimeError(
                        f"minhash exactness run: bucket with {u} distinct "
                        f"signatures exceeds max_bucket={max_bucket}; raise "
                        f"max_bucket")
                logger.warning(
                    "minhash bucket truncated: %d distinct signatures > "
                    "max_bucket=%d; dropping %d", u, max_bucket,
                    u - max_bucket)
                order = sorted(range(u), key=lambda i: reps[i])[:max_bucket]
                uniq = uniq[order]
                reps = [reps[i] for i in order]
                members = [members[i] for i in order]
                u = max_bucket
            if u < 2:
                return
            # vectorized pairwise agreement: (u, u) fraction-equal matrix
            # from a broadcast equality sum (u^2 * P bytes, <= max_bucket^2)
            eq_counts = np.zeros((u, u), dtype=np.int32)
            P = uniq.shape[1]
            chunk = max(1, (1 << 24) // max(1, u * P))  # ~16MB temp per slab
            for s in range(0, u, chunk):
                e = min(u, s + chunk)
                eq_counts[s:e] = (uniq[s:e, None, :] == uniq[None, :, :]).sum(axis=2)
            est = eq_counts.astype(np.float64) / P
            ii, jj = np.nonzero(np.triu(est >= threshold, k=1))
            for i, j in zip(ii.tolist(), jj.tolist()):
                e = float(est[i, j])
                mi, mj = members[i], members[j]
                # cross-group expansion: every member of an identical-sig
                # group shares its signature, so each member pair is a
                # candidate; cap the cross product with a LOGGED fallback
                if len(mi) * len(mj) <= cross_closure_cap:
                    for x in mi:
                        for y in mj:
                            emit(x, y, e)
                elif fail_on_truncation:
                    raise RuntimeError(
                        f"minhash exactness run: cross-group expansion "
                        f"{len(mi)}x{len(mj)} exceeds cross_closure_cap="
                        f"{cross_closure_cap}; raise the cap")
                else:
                    logger.warning(
                        "minhash cross-group expansion %dx%d > cap %d: "
                        "emitting representative pair only",
                        len(mi), len(mj), cross_closure_cap)
                    emit(reps[i], reps[j], e)

        if "bh_orig" in group.schema.names:
            # folded group: subgroup by the ORIGINAL band hash — only rows
            # sharing it are real candidates; skip singleton subgroups (the
            # vast majority) without any per-row Python
            bh = group.column("bh_orig").to_numpy(zero_copy_only=False)
            order = np.argsort(bh, kind="stable")
            sb = bh[order]
            bounds = np.nonzero(np.concatenate(([True], sb[1:] != sb[:-1])))[0]
            bounds = np.append(bounds, n)
            for s, e in zip(bounds[:-1].tolist(), bounds[1:].tolist()):
                if e - s < 2:
                    continue
                idx = order[s:e]
                process_bucket([all_ids[i] for i in idx], all_sigs[idx])
        else:
            process_bucket(all_ids, all_sigs)
        if not a_out:
            return empty
        return pa.table({"id_a": pa.array(a_out, type=id_type),
                         "id_b": pa.array(b_out, type=id_type),
                         "est_jaccard": pa.array(j_out, type=pa.float64())})

    pairs = band_ds.groupby(["band", "band_hash"]).map_groups(
        emit_pairs, batch_format="pyarrow")
    if not dedupe:
        return pairs
    # distinct pairs (a pair can fire in multiple bands)
    from ray.data.aggregate import Max
    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Max("est_jaccard", alias_name="est_jaccard"))


def token_jaccard_verify(cands: Dataset, ds: Dataset, tokens_column: str,
                         id_column: str, k: int = 3, vocab: int = 50257,
                         threshold: float = 0.5,
                         max_pairs: int = 5_000_000) -> Dataset:
    """EXACT token-k-gram Jaccard verify over candidate pairs.

    Grams are :func:`token_grams`' exact Horner packs (``vocab**k <
    2**63``), so unlike the text verifiers there is no hash layer at
    all — the score is ONE exact integer division over true distinct-gram
    set sizes, bit-equal to a SQL oracle computing the same packs.

    Scale shape (the ``_gram_hash_verify`` contract): the pairs table
    pulls to the driver and dedupes (pairs << corpus by the LSH
    contract; ``max_pairs`` fail-louds the assumption), participants'
    distinct-gram sets build DISTRIBUTED (one token_grams pass over the
    id-filtered docs — never once per pair instance), broadcast as one
    flat (ids, offsets, grams) arena via ray.put, and pairs score in
    map_batches with a searchsorted membership count per pair.  Driver
    memory is O(pairs + participants' grams)."""
    import ray
    import ray.data as rd

    from . import cached_stage
    from .constraints import ReferentialCheck

    batches = list(cands.iter_batches(batch_format="pyarrow"))
    if batches:
        pairs_tbl = (pa.concat_tables(batches)
                     .select(["id_a", "id_b"])
                     .group_by(["id_a", "id_b"]).aggregate([]))
    else:
        pairs_tbl = None
    empty = pa.table({"id_a": pa.array([], type=pa.string()),
                      "id_b": pa.array([], type=pa.string()),
                      "jaccard": pa.array([], type=pa.float64())})
    if pairs_tbl is None or pairs_tbl.num_rows == 0:
        return rd.from_arrow(empty)
    if pairs_tbl.num_rows > max_pairs:
        raise ValueError(
            f"{pairs_tbl.num_rows} candidate pairs exceed max_pairs="
            f"{max_pairs} — tighten the LSH threshold/banding or verify "
            "with a bucketed join instead of the broadcast arena")
    ids: set = set(pairs_tbl.column("id_a").to_pylist())
    ids.update(pairs_tbl.column("id_b").to_pylist())

    participant = ds.map_batches(
        cached_stage(ReferentialCheck, column=id_column,
                     allowed=sorted(ids), invert=False),
        batch_format="pyarrow")

    def gramify(batch: pa.Table) -> pa.Table:
        grams, starts = token_grams(batch.column(tokens_column), k, vocab)
        n = batch.num_rows
        counts = np.diff(np.concatenate((starts, [len(grams)])))
        row = np.repeat(np.arange(n, dtype=np.int64), counts)
        order = np.lexsort((grams, row))
        g, r = grams[order], row[order]
        keep = np.ones(len(g), dtype=bool)
        keep[1:] = (g[1:] != g[:-1]) | (r[1:] != r[:-1])
        g, r = g[keep], r[keep]
        d_counts = np.bincount(r, minlength=n).astype(np.int64)
        offs = np.concatenate(([0], np.cumsum(d_counts)))
        lists = pa.ListArray.from_arrays(pa.array(offs, type=pa.int64()).cast(pa.int32()),
                                         pa.array(g, type=pa.int64()))
        return pa.table({id_column: batch.column(id_column),
                         "grams": lists})

    gtabs = list(participant.map_batches(gramify, batch_format="pyarrow")
                 .iter_batches(batch_format="pyarrow"))
    if not gtabs:
        return rd.from_arrow(empty)
    gtab = pa.concat_tables(gtabs).combine_chunks()
    part_ids = np.array(gtab.column(id_column).to_pylist(), dtype=np.str_)
    order = np.argsort(part_ids)
    part_ids = part_ids[order]
    if len(part_ids) > 1 and np.any(part_ids[1:] == part_ids[:-1]):
        dup = part_ids[1:][part_ids[1:] == part_ids[:-1]][0]
        raise ValueError(
            f"token_jaccard_verify: duplicated {id_column} {dup!r} among "
            f"participants — which row a candidate pair scores against "
            f"would be ambiguous; dedup ids upstream")
    gl = gtab.column("grams")
    if isinstance(gl, pa.ChunkedArray):
        gl = gl.combine_chunks()
    flat = gl.values.to_numpy(zero_copy_only=False).astype(np.int64)
    goffs = gl.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    sizes = np.diff(goffs)[order]
    arena_offs = np.concatenate(([0], np.cumsum(sizes)))
    arena = np.empty(int(sizes.sum()), dtype=np.int64)
    for new_i, old_i in enumerate(order):
        arena[arena_offs[new_i]:arena_offs[new_i + 1]] = \
            flat[goffs[old_i]:goffs[old_i + 1]]
    arena_ref = ray.put((part_ids, arena_offs, arena))

    def verify(batch: pa.Table) -> pa.Table:
        pids, offs, flat_g = ray.get(arena_ref)
        a = batch.column("id_a").to_numpy(zero_copy_only=False).astype(np.str_)
        b = batch.column("id_b").to_numpy(zero_copy_only=False).astype(np.str_)
        ia = np.searchsorted(pids, a)
        ib = np.searchsorted(pids, b)
        # fail-loud id contract: every candidate id must resolve to its
        # OWN participant row — a missing or duplicated id would silently
        # score the pair against a neighbour's gram set otherwise
        ia_c = np.minimum(ia, len(pids) - 1)
        ib_c = np.minimum(ib, len(pids) - 1)
        if len(pids) == 0 or np.any(pids[ia_c] != a) or \
                np.any(pids[ib_c] != b):
            bad = np.concatenate([a[pids[ia_c] != a], b[pids[ib_c] != b]]) \
                if len(pids) else a
            raise ValueError(
                f"token_jaccard_verify: candidate ids not found among "
                f"participants (e.g. {bad[:3].tolist()}) — the candidates "
                f"and the dataset must share exactly one row per id")
        j = np.empty(len(a), dtype=np.float64)
        for row in range(len(a)):
            ga = flat_g[offs[ia[row]]:offs[ia[row] + 1]]
            gb = flat_g[offs[ib[row]]:offs[ib[row] + 1]]
            if len(ga) > len(gb):
                ga, gb = gb, ga
            pos = np.searchsorted(gb, ga)
            pos_c = np.minimum(pos, len(gb) - 1)
            inter = int(np.count_nonzero(gb[pos_c] == ga)) if len(gb) else 0
            union = len(ga) + len(gb) - inter
            j[row] = inter / union if union else 1.0
        t = pa.table({"id_a": batch.column("id_a"),
                      "id_b": batch.column("id_b"),
                      "jaccard": pa.array(j, type=pa.float64())})
        return t.filter(pc.greater_equal(t.column("jaccard"), threshold))

    return rd.from_arrow(pairs_tbl).map_batches(verify,
                                                batch_format="pyarrow")


def cross_near_dup_candidates(train: Dataset, probe: Dataset,
                              text_column: str, id_column: str,
                              return_union: bool = False,
                              **lsh_kwargs) -> Dataset:
    """Cross-dataset fuzzy-decontamination candidates: near-dup pairs with
    one side in ``train`` and the other in ``probe`` (the GPT-3/PaLM
    "remove train docs that near-duplicate an eval doc" step, at dataset
    scale rather than the probe-string scan of ngram_contamination).

    Shape: probe ids are remapped into the negative half of the int64
    space (``-id - 1``, bijective), both sides union into ONE dataset and
    the standard banded-LSH pipeline runs over it — same shuffles, same
    caps, same ``fail_on_truncation`` exactness mode as
    :func:`minhash_lsh_candidates`.  Pairs are ordered id_a < id_b, so a
    cross pair is exactly ``id_a < 0 <= id_b``; same-side pairs are
    filtered out.  Returns (train_id, probe_id, est_jaccard) with probe
    ids mapped back.

    Scale note: the union costs nothing extra (LSH cost is linear in total
    rows) and probe is usually tiny next to train; no new shuffle shape.
    """
    import pyarrow.compute as pc

    for side in (train, probe):
        t = side.schema().base_schema.field(id_column).type
        if not pa.types.is_integer(t):
            raise ValueError(f"cross_near_dup_candidates needs integer ids, "
                             f"got {t}")

    def negate(batch: pa.Table) -> pa.Table:
        ids = pc.subtract(pc.multiply(
            batch.column(id_column).cast(pa.int64()), pa.scalar(-1)),
            pa.scalar(1))
        i = batch.schema.get_field_index(id_column)
        return batch.set_column(i, id_column, ids)

    def to_i64(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index(id_column)
        return batch.set_column(i, id_column,
                                batch.column(id_column).cast(pa.int64()))

    uni = (train.select_columns([id_column, text_column])
           .map_batches(to_i64, batch_format="pyarrow")
           .union(probe.select_columns([id_column, text_column])
                  .map_batches(negate, batch_format="pyarrow")))
    cands = minhash_lsh_candidates(uni, text_column, id_column, **lsh_kwargs)

    def cross_only(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a")
        keep = pc.and_(pc.less(a, pa.scalar(0, pa.int64())),
                       pc.greater_equal(batch.column("id_b"),
                                        pa.scalar(0, pa.int64())))
        return batch.filter(keep)

    out = cands.map_batches(cross_only, batch_format="pyarrow")
    if return_union:
        return out, uni
    return out


class BandDigest:
    """Persistable cross-run NEAR-dup state: the distinct MinHash band
    keys of a previously-processed corpus (``state/bloom.BloomFilter``'s
    near-dup sibling — that one answers "seen this EXACT content?", this
    one answers "shares an LSH band with anything seen?").

    ``keys`` is a sorted uint64 array of :func:`_band_digest_keys`
    values.  Union-mergeable (``merge``), so shards/runs combine in any
    order; probe is one ``np.searchsorted`` per batch.  At 8 bytes/key
    x bands/doc, 1e9 docs x 16 bands = 128 GB — beyond worker memory,
    shard the digest by ``key % n_shards`` into per-shard files and
    probe each shard's partition (the BloomFilter sharding note applies
    verbatim)."""

    def __init__(self, keys: np.ndarray, num_perm: int, shingle_k: int,
                 seed: int, bands: int):
        self.keys = np.sort(np.asarray(keys, dtype=np.uint64))
        self.num_perm = num_perm
        self.shingle_k = shingle_k
        self.seed = seed
        self.bands = bands

    def params(self) -> dict:
        return {"num_perm": self.num_perm, "shingle_k": self.shingle_k,
                "seed": self.seed, "bands": self.bands}

    def merge(self, other: "BandDigest") -> "BandDigest":
        if self.params() != other.params():
            raise ValueError("BandDigest.merge: parameter mismatch "
                             f"{self.params()} != {other.params()}")
        self.keys = np.unique(np.concatenate([self.keys, other.keys]))
        return self

    def save(self, path: str) -> None:
        np.savez_compressed(
            path, keys=self.keys,
            params=np.array([self.num_perm, self.shingle_k, self.seed,
                             self.bands], dtype=np.int64))

    @classmethod
    def load(cls, path: str) -> "BandDigest":
        z = np.load(path if path.endswith(".npz") else path + ".npz")
        p = z["params"]
        return cls(z["keys"], num_perm=int(p[0]), shingle_k=int(p[1]),
                   seed=int(p[2]), bands=int(p[3]))


def build_band_digest(ds: Dataset, text_column: str,
                      num_perm: int = 128, shingle_k: int = 3,
                      seed: int = 42, bands: int = 16,
                      max_keys: int = 100_000_000) -> BandDigest:
    """Build a :class:`BandDigest` in ONE streaming pass: each batch
    emits its DISTINCT band keys as one binary blob (uint64 tobytes —
    O(batches) driver rows), the driver unions them.  Fail-loud
    ``max_keys`` cap; beyond it, build per-shard digests (see
    :class:`BandDigest`)."""

    def partial(batch: pa.Table) -> pa.Table:
        mh = MinHasher(text_column, text_column, num_perm=num_perm,
                       shingle_k=shingle_k, seed=seed, bands=bands)
        sigs = mh.signatures(batch.column(text_column).to_pylist())
        keys = np.unique(_band_digest_keys(sigs, bands).reshape(-1))
        return pa.table({"k": pa.array([keys.tobytes()],
                                       pa.large_binary())})

    rows = (ds.select_columns([text_column])
            .map_batches(partial, batch_format="pyarrow").take_all())
    parts = [np.frombuffer(r["k"], dtype=np.uint64) for r in rows]
    keys = (np.unique(np.concatenate(parts)) if parts
            else np.empty(0, dtype=np.uint64))
    if len(keys) > max_keys:
        raise ValueError(
            f"build_band_digest: {len(keys)} distinct band keys > "
            f"max_keys={max_keys} — shard the digest (key % n_shards) "
            "and build per shard")
    return BandDigest(keys, num_perm=num_perm, shingle_k=shingle_k,
                      seed=seed, bands=bands)


class _BandDigestProbe:
    """Per-worker state: the sorted digest keys + minhash params; per
    batch one signature pass + one searchsorted membership test."""

    def __init__(self, ref, text_column: str, id_column: str,
                 append: bool = False):
        import ray
        keys, params = ray.get(ref) if isinstance(ref, ray.ObjectRef) \
            else ref
        self.keys = keys
        self.mh = MinHasher(text_column, id_column, **params)
        self.text_column = text_column
        self.id_column = id_column
        self.bands = params["bands"]
        self.append = append

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = self.mh.signatures(
            batch.column(self.text_column).to_pylist())
        dk = _band_digest_keys(sigs, self.bands)
        if len(self.keys):
            idx = np.searchsorted(self.keys, dk.reshape(-1))
            idx[idx >= len(self.keys)] = 0
            hits = (self.keys[idx] == dk.reshape(-1)).reshape(dk.shape)
        else:
            hits = np.zeros(dk.shape, dtype=bool)
        n_hits = hits.sum(axis=1).astype(np.int64)
        if self.append:
            return (batch
                    .append_column("n_band_hits",
                                   pa.array(n_hits, pa.int64()))
                    .append_column("candidate", pa.array(n_hits > 0)))
        return pa.table({
            self.id_column: batch.column(self.id_column),
            "n_band_hits": pa.array(n_hits, pa.int64()),
            "candidate": pa.array(n_hits > 0)})


def probe_band_digest(ds: Dataset, text_column: str, id_column: str,
                      digest: BandDigest, append: bool = False,
                      concurrency=None) -> Dataset:
    """Flag documents sharing at least one MinHash LSH band with a
    previously-digested corpus — incremental cross-run NEAR-dup
    candidates (continuous-ingestion dedup: digest yesterday's corpus
    once, probe today's shuffle-free; verify candidates exactly against
    the stored corpus downstream).  Emits per doc ``n_band_hits`` (of
    ``bands``) and ``candidate`` — projected to ``(id, ...)`` rows by
    default, or APPENDED to the input batch with ``append=True`` (the
    filter-in-place shape: no join needed to drop candidates).  The
    digest rides the object store via ``ray.put``, read once per
    worker."""
    import ray

    from . import cached_stage, concurrency_kwargs

    ref = ray.put((digest.keys, digest.params()))
    return ds.map_batches(
        cached_stage(_BandDigestProbe, ref=ref, text_column=text_column,
                     id_column=id_column, append=append),
        batch_format="pyarrow", **concurrency_kwargs(concurrency))


def build_band_digest_sharded(ds: Dataset, text_column: str, out_dir: str,
                              n_shards: int = 16, num_perm: int = 128,
                              shingle_k: int = 3, seed: int = 42,
                              bands: int = 16) -> "list[dict]":
    """The >``max_keys`` layout of :func:`build_band_digest`, end-to-end:
    ONE streaming signature pass (each batch emits its distinct band keys
    split by ``key % n_shards`` as per-shard binary blobs) + ONE
    shard-keyed exchange; each shard task unions its blobs and writes
    ``shard-{i:05d}.npz`` (a :class:`BandDigest` save) to ``out_dir``
    (shared storage at scale — S3/NFS; the digest never assembles in one
    place).  Returns the manifest ``[{shard, n_keys, path}, ...]``.

    Scale shape: the exchange moves KEY BLOBS only (8 B/distinct key);
    the group key is the shard index — at most ``n_shards`` groups,
    balanced by construction because band keys are already uniform
    hashes, so the bucketed-finisher discipline's hot-group concern
    cannot arise.  Driver holds the O(n_shards) manifest, never keys."""
    import os

    import ray.data as rd

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    os.makedirs(out_dir, exist_ok=True)
    params = {"num_perm": num_perm, "shingle_k": shingle_k, "seed": seed,
              "bands": bands}
    nsh = np.uint64(n_shards)

    def partial(batch: pa.Table) -> pa.Table:
        mh = MinHasher(text_column, text_column, **params)
        sigs = mh.signatures(batch.column(text_column).to_pylist())
        keys = np.unique(_band_digest_keys(sigs, bands).reshape(-1))
        sh = (keys % nsh).astype(np.int64)
        order = np.argsort(sh, kind="mergesort")
        keys, sh = keys[order], sh[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(np.diff(sh)) + 1, [len(sh)]))
        shards, blobs = [], []
        for i in range(len(starts) - 1):
            shards.append(int(sh[starts[i]]))
            blobs.append(keys[starts[i]:starts[i + 1]].tobytes())
        return pa.table({"shard": pa.array(shards, pa.int64()),
                         "blob": pa.array(blobs, pa.large_binary())})

    def write_shard(group: pa.Table) -> pa.Table:
        shard = int(group.column("shard")[0].as_py())
        parts = [np.frombuffer(b.as_py(), dtype=np.uint64)
                 for b in group.column("blob")]
        keys = np.unique(np.concatenate(parts)) if parts else \
            np.empty(0, dtype=np.uint64)
        path = os.path.join(out_dir, f"shard-{shard:05d}")
        BandDigest(keys, **params).save(path)
        return pa.table({"shard": pa.array([shard], pa.int64()),
                         "n_keys": pa.array([len(keys)], pa.int64()),
                         "path": pa.array([path + ".npz"])})

    manifest = (ds.select_columns([text_column])
                .map_batches(partial, batch_format="pyarrow")
                .groupby("shard")
                .map_groups(write_shard, batch_format="pyarrow")
                .take_all())  # O(n_shards) rows
    seen = {r["shard"] for r in manifest}
    for i in range(n_shards):
        if i not in seen:  # empty shard: write an empty digest so probe
            path = os.path.join(out_dir, f"shard-{i:05d}")  # never 404s
            BandDigest(np.empty(0, dtype=np.uint64), **params).save(path)
            manifest.append({"shard": i, "n_keys": 0,
                             "path": path + ".npz"})
    return sorted(manifest, key=lambda r: r["shard"])


def probe_band_digest_sharded(ds: Dataset, text_column: str,
                              id_column: str, manifest: "list[dict]",
                              num_perm: int = 128, shingle_k: int = 3,
                              seed: int = 42, bands: int = 16,
                              num_buckets: int = 64) -> Dataset:
    """Probe a SHARDED band digest (:func:`build_band_digest_sharded`)
    without ever loading the full key set anywhere: one signature pass
    explodes each doc into ``bands`` scalar ``(id, key, shard)`` rows;
    ONE shard-keyed exchange sends each row to the task holding its
    shard file (loaded once per group task); per-id hit counts combine
    in ONE final id-keyed groupby-sum.  Output matches
    :func:`probe_band_digest` exactly: ``(id, n_band_hits, candidate)``
    — for UNIQUE probe ids; a duplicated id would silently sum hits
    across its copies in the id-keyed combine, so it FAILS LOUDLY
    instead (the unsharded probe is map-only and needs no such guard).
    Each shard load also validates the stored build params against the
    probe params — a mismatched ``seed``/``num_perm``/``shingle_k``/
    ``bands`` would otherwise return zero hits for every doc.

    Scale shape: both exchanges move 16-byte scalar rows only (never
    text payload); each group task holds ONE shard (total_keys/n_shards
    x 8 B).  ``n_band_hits`` counts hit BANDS, identical to the
    unsharded probe, because every band contributes exactly one key."""
    import ray

    params = {"num_perm": num_perm, "shingle_k": shingle_k, "seed": seed,
              "bands": bands}
    paths = {int(r["shard"]): r["path"] for r in manifest}
    n_shards = len(paths)
    if sorted(paths) != list(range(n_shards)):
        raise ValueError("probe_band_digest_sharded: manifest must cover "
                         "shards 0..n-1 exactly")
    paths_ref = ray.put(paths)
    nsh = np.uint64(n_shards)

    def explode(batch: pa.Table) -> pa.Table:
        mh = MinHasher(text_column, id_column, **params)
        sigs = mh.signatures(batch.column(text_column).to_pylist())
        keys = _band_digest_keys(sigs, bands).reshape(-1)
        ids = batch.column(id_column)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        rep = ids.take(pa.array(
            np.repeat(np.arange(batch.num_rows, dtype=np.int64), bands)))
        return pa.table({
            id_column: rep,
            "key": pa.array(keys.view(np.int64), pa.int64()),
            "shard": pa.array((keys % nsh).astype(np.int64), pa.int64())})

    def probe_shard(group: pa.Table) -> pa.Table:
        shard = int(group.column("shard")[0].as_py())
        digest = BandDigest.load(ray.get(paths_ref)[shard])
        if digest.params() != params:
            raise ValueError(
                f"probe_band_digest_sharded: shard {shard} was built with "
                f"{digest.params()} but probed with {params} — signatures "
                f"would never match; pass the build's params")
        k = group.column("key").to_numpy(
            zero_copy_only=False).view(np.uint64)
        if len(digest.keys):
            idx = np.searchsorted(digest.keys, k)
            idx[idx >= len(digest.keys)] = 0
            hit = (digest.keys[idx] == k).astype(np.int64)
        else:
            hit = np.zeros(len(k), dtype=np.int64)
        return pa.table({id_column: group.column(id_column),
                         "hit": pa.array(hit, pa.int64())})

    from ray.data.aggregate import Count, Sum

    hits = (ds.map_batches(explode, batch_format="pyarrow")
            .groupby("shard")
            .map_groups(probe_shard, batch_format="pyarrow")
            .groupby(id_column).aggregate(Sum("hit"), Count()))

    def finish(batch: pa.Table) -> pa.Table:
        # each probe doc contributes exactly `bands` (id, key) rows, so a
        # per-id row count != bands means the id appeared on >1 input row
        # and the sum above silently merged them — fail loudly instead
        cnt = pc.cast(batch.column("count()"), pa.int64())
        bad = pc.filter(batch.column(id_column),
                        pc.not_equal(cnt, pa.scalar(bands, pa.int64())))
        if len(bad):
            raise ValueError(
                "probe_band_digest_sharded: duplicate probe ids "
                f"(e.g. {bad[0].as_py()!r}) — per-id band hits would merge "
                "across copies; dedup the id column first")
        n = pc.cast(batch.column("sum(hit)"), pa.int64())
        return pa.table({
            id_column: batch.column(id_column),
            "n_band_hits": n,
            "candidate": pc.greater(n, pa.scalar(0, pa.int64()))})

    return hits.map_batches(finish, batch_format="pyarrow")


class SimHasher:
    """64-bit SimHash fingerprints, vectorized via unpacked bit votes."""

    def __init__(self, text_column: str, out: str = "simhash"):
        self.text_column = text_column
        self.out = out

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl
        col = batch.column(self.text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if len(col) == 0:
            return batch.append_column(self.out,
                                       pa.array([], type=pa.uint64()))
        # vectorized word extraction (no per-doc regex loop): empty docs
        # count one "" word — explode emits a null row for an empty list,
        # fill_null restores the placeholder
        words = pl.from_arrow(col).fill_null("").str.extract_all(
            _WORD_RE.pattern)
        counts = np.maximum(words.list.len().to_numpy().astype(np.int64), 1)
        h = (words.explode(empty_as_null=True).fill_null("").hash(seed=11)
             .to_numpy().astype(np.uint64))
        bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1,
                             bitorder="little").astype(np.int32)  # (n_words, 64)
        votes = bits * 2 - 1
        offsets = np.concatenate(([0], np.cumsum(counts)))[:-1]
        sums = np.add.reduceat(votes, offsets, axis=0)  # (n_docs, 64)
        fp_bits = (sums > 0).astype(np.uint8)
        fp = np.packbits(fp_bits, axis=1, bitorder="little").view(np.uint64).ravel()
        return batch.append_column(self.out, pa.array(fp, type=pa.uint64()))


def simhash_near_dups(ds: Dataset, text_column: str, id_column: str,
                      max_hamming: int = 3, n_chunks: int = 4,
                      max_bucket: int = 4096, closure_cap: int = 256,
                      concurrency=None) -> Dataset:
    """Near-dup pairs by SimHash: the SimHasher fingerprint stage +
    :func:`hamming_near_dups` (chunk-pigeonhole bucketing + vectorized
    hamming verify) over the resulting 64-bit ``simhash`` column."""
    from . import cached_stage, concurrency_kwargs
    fp_ds = ds.map_batches(cached_stage(SimHasher, text_column=text_column),
                           batch_format="pyarrow",
                           **concurrency_kwargs(concurrency))
    return hamming_near_dups(fp_ds, "simhash", id_column,
                             max_hamming=max_hamming, n_chunks=n_chunks,
                             max_bucket=max_bucket, closure_cap=closure_cap)


def hamming_near_dups(ds: Dataset, hash_column: str, id_column: str,
                      max_hamming: int = 3, n_chunks: int = 4,
                      max_bucket: int = 4096,
                      closure_cap: int = 256) -> Dataset:
    """Near-dup pairs over ANY 64-bit fingerprint column (int64 bit
    pattern): SimHash text fingerprints, image dHash, audio fingerprints —
    chunk-pigeonhole bucketing + vectorized hamming verify.

    The 64-bit fingerprint splits into ``n_chunks`` equal chunks; any pair
    with hamming distance <= n_chunks - 1 agrees exactly on at least one
    chunk (pigeonhole), so bucketing on each chunk finds all such pairs —
    ``max_hamming`` must stay <= n_chunks - 1.  Raise ``n_chunks`` (e.g. 8
    chunks of 8 bits => hamming <= 7, but smaller/denser buckets) to trade
    bucket size for recall radius.

    In-bucket verify collapses identical fingerprints to a min-id
    representative first (exact-dup clusters cost O(k), not O(k^2)), then
    computes all pairwise hamming distances with one XOR outer product + a
    byte popcount table — no per-pair Python.  Oversize buckets are
    truncated in min-id order and LOGGED, never silently.

    SCALE: a chunk has only ``2^(64/n_chunks)`` possible values, so the
    AVERAGE bucket holds ``n / 2^(64/n_chunks)`` fingerprints and the
    total pairwise verify is O(n^2 / 2^(64/n_chunks)) — pick n_chunks so
    that divisor dwarfs the corpus (n_chunks=16 means 4-bit chunks = 16
    values: quadratic in practice, measured 398 s at 50k docs; n_chunks=8
    = 256 values; n_chunks=4 = 65,536 values — the Manku 2007 radius<=3
    production setting).  Larger radii fundamentally trade selectivity
    away; beyond max_bucket the truncation triggers (logged).
    """
    if max_hamming > n_chunks - 1:
        raise ValueError(
            f"max_hamming={max_hamming} needs n_chunks>={max_hamming + 1} "
            "for the pigeonhole guarantee")
    if 64 % n_chunks:
        raise ValueError("n_chunks must divide 64")
    chunk_bits = 64 // n_chunks
    chunk_mask = np.uint64((1 << chunk_bits) - 1)

    def chunk_rows(batch: pa.Table) -> pa.Table:
        fp = batch.column(hash_column).to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch.column(id_column)
        out = []
        for c in range(n_chunks):
            chunk = ((fp >> np.uint64(chunk_bits * c)) & chunk_mask).astype(np.int64)
            out.append(pa.table({"chunk_id": pa.array(np.full(len(fp), c, dtype=np.int32)),
                                 "chunk_val": pa.array(chunk),
                                 "id": ids,
                                 "fp": pa.array(fp.astype(np.int64))}))
        return pa.concat_tables(out)

    chunked = ds.map_batches(chunk_rows, batch_format="pyarrow")

    def verify(group: pa.Table) -> pa.Table:
        id_type = group.column("id").type
        empty = pa.table({"id_a": pa.array([], type=id_type),
                          "id_b": pa.array([], type=id_type),
                          "hamming": pa.array([], type=pa.int32())})
        n = group.num_rows
        if n < 2:
            return empty
        ids = group.column("id").to_pylist()
        fp = (group.column("fp").to_numpy(zero_copy_only=False)
              .astype(np.int64).astype(np.uint64))
        uniq, reps, inverse = _collapse_identical(fp[:, None], ids)
        ufp = uniq.ravel()
        u = len(ufp)
        members: list[list] = [[] for _ in range(u)]
        for row_i, g in enumerate(inverse):
            members[g].append(ids[row_i])
        a_out, b_out, d_out = [], [], []

        def emit(x, y, dist):
            if x == y:
                return
            lo, hi = sorted((x, y))
            a_out.append(lo)
            b_out.append(hi)
            d_out.append(dist)

        # identical fingerprints (hamming 0, incl. exact dups): full pairwise
        # closure for small clusters, rep-member pairs (LOGGED) otherwise;
        # emitted only from chunk 0 (identical fps share every chunk)
        if n > u and group.column("chunk_id")[0].as_py() == 0:
            for g in range(u):
                mem = members[g]
                k = len(mem)
                if k < 2:
                    continue
                if k <= closure_cap:
                    for i in range(k):
                        for j in range(i + 1, k):
                            emit(mem[i], mem[j], 0)
                else:
                    logger.warning(
                        "hamming identical-fp cluster of %d members > "
                        "closure cap %d: rep-member pairs only", k, closure_cap)
                    for rid in mem:
                        emit(reps[g], rid, 0)
        if u > max_bucket:
            logger.warning(
                "hamming bucket truncated: %d distinct fingerprints > "
                "max_bucket=%d (chunk=%s val=%s); dropping %d",
                u, max_bucket, group.column("chunk_id")[0],
                group.column("chunk_val")[0], u - max_bucket)
            order = sorted(range(u), key=lambda i: reps[i])[:max_bucket]
            ufp = ufp[order]
            reps = [reps[i] for i in order]
            members = [members[i] for i in order]
            u = max_bucket
        if u >= 2:
            # XOR outer product + byte-LUT popcount: (u, u) hamming matrix
            x = np.bitwise_xor.outer(ufp, ufp)           # (u, u) uint64
            d = _POPCOUNT8[x.view(np.uint8).reshape(u, u, 8)].sum(
                axis=2, dtype=np.int32)
            ii, jj = np.nonzero(np.triu(d <= max_hamming, k=1))
            for i, j in zip(ii.tolist(), jj.tolist()):
                mi, mj = members[i], members[j]
                if len(mi) * len(mj) <= closure_cap:
                    for x_ in mi:
                        for y_ in mj:
                            emit(x_, y_, int(d[i, j]))
                else:
                    logger.warning(
                        "hamming cross-group expansion %dx%d > cap %d: "
                        "representative pair only", len(mi), len(mj),
                        closure_cap)
                    emit(reps[i], reps[j], int(d[i, j]))
        if not a_out:
            return empty
        return pa.table({"id_a": pa.array(a_out, type=id_type),
                         "id_b": pa.array(b_out, type=id_type),
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


class _HyperplaneBucketer:
    """Stateful stage: hyperplane matrix generated once per worker from a
    fixed seed; emits (bucket, id, unit-float32) rows.

    The shuffled payload is the unit vector downcast to float32 — half the
    all-to-all bytes of float64; in-bucket cosines are verified in float64
    after upcast (error ~1e-7, far below any useful near-dup threshold)."""

    def __init__(self, emb_column: str, id_column: str, n_planes: int,
                 seed: int):
        if not 1 <= n_planes <= 62:
            raise ValueError("n_planes must be in [1, 62]")
        self.emb_column = emb_column
        self.id_column = id_column
        self.n_planes = n_planes
        self.seed = seed
        self.planes = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "bucket": pa.array([], type=pa.int64()),
                "id": pa.array([], type=batch.schema.field(self.id_column).type),
                "unit": pa.array([], type=pa.list_(pa.float32()))})
        emb = np.asarray(batch.column(self.emb_column).to_pylist(),
                         dtype=np.float64)
        if self.planes is None:
            rng = np.random.default_rng(self.seed)
            self.planes = rng.standard_normal((emb.shape[1], self.n_planes))
        signs = (emb @ self.planes) > 0
        bucket_id = (signs.astype(np.int64)
                     << np.arange(self.n_planes, dtype=np.int64)).sum(axis=1)
        norm = np.linalg.norm(emb, axis=1, keepdims=True)
        norm[norm == 0] = 1.0
        unit = (emb / norm).astype(np.float32)
        return pa.table({
            "bucket": pa.array(bucket_id),
            "id": batch.column(self.id_column),
            "unit": pa.array(list(unit), type=pa.list_(pa.float32()))})


def embedding_near_dups(ds: Dataset, emb_column: str, id_column: str,
                        threshold: float = 0.95, n_planes: int = 12,
                        seed: int = 42, max_bucket: int = 8192,
                        concurrency=None) -> Dataset:
    """Cosine near-duplicate pairs via random-hyperplane LSH + exact verify.

    Buckets by the sign pattern of ``n_planes`` random projections (scale
    path: bucket count 2^n_planes keeps groups small — size n_planes to
    log2(n_rows / target_bucket_size)); exact cosine inside each bucket via
    one matmul (vectorized, no per-pair Python). Oversize buckets truncate
    in min-id order with a LOGGED warning. Recall < 1 by construction
    (near-dups can land across a hyperplane); raise n_planes repeats /
    multiple seeds for higher recall.
    """

    def verify(group: pa.Table) -> pa.Table:
        n = group.num_rows
        id_type = group.column("id").type
        empty = pa.table({"id_a": pa.array([], type=id_type),
                          "id_b": pa.array([], type=id_type),
                          "cosine": pa.array([], type=pa.float64())})
        if n < 2:
            return empty
        ids = group.column("id").to_pylist()
        if n > max_bucket:
            logger.warning(
                "embedding bucket truncated: %d rows > max_bucket=%d "
                "(bucket=%s); dropping %d", n, max_bucket,
                group.column("bucket")[0], n - max_bucket)
            order = sorted(range(n), key=lambda i: ids[i])[:max_bucket]
            group = group.take(pa.array(order, type=pa.int64()))
            ids = [ids[i] for i in order]
            n = max_bucket
        unit = np.asarray(group.column("unit").to_pylist(), dtype=np.float64)
        sims = unit @ unit.T
        a_out, b_out, c_out = [], [], []
        # matmul prefilter with an ulp margin; membership AND the emitted
        # value come from the machine-stable per-pair dot (BLAS dgemm
        # rounding varies across CPUs — the golden fixture pins bits)
        ii, jj = np.nonzero(np.triu(sims >= threshold - 1e-9, k=1))
        for i, j in zip(ii.tolist(), jj.tolist()):
            if ids[i] == ids[j]:
                continue
            cos = _stable_dot(unit[i], unit[j])
            if cos < threshold:
                continue
            lo, hi = sorted((ids[i], ids[j]))
            a_out.append(lo)
            b_out.append(hi)
            c_out.append(cos)
        return pa.table({"id_a": pa.array(a_out, type=id_type),
                         "id_b": pa.array(b_out, type=id_type),
                         "cosine": pa.array(c_out, type=pa.float64())})

    from . import cached_stage, concurrency_kwargs
    bucketed = ds.map_batches(
        cached_stage(_HyperplaneBucketer, emb_column=emb_column,
                     id_column=id_column, n_planes=n_planes, seed=seed),
        batch_format="pyarrow", **concurrency_kwargs(concurrency))
    pairs = bucketed.groupby("bucket").map_groups(verify, batch_format="pyarrow")
    from ray.data.aggregate import Max
    deduped = pairs.groupby(["id_a", "id_b"]).aggregate(
        Max("cosine", alias_name="cosine"))
    # a zero-pair result would otherwise lose its schema entirely (the
    # aggregate emits no blocks); union one typed empty block so downstream
    # consumers (and the driver's schema check) always see (id_a, id_b,
    # cosine).  id type from parquet metadata — no execution triggered.
    import ray
    id_type = ds.schema().base_schema.field(id_column).type
    empty = ray.data.from_arrow(pa.table({
        "id_a": pa.array([], type=id_type),
        "id_b": pa.array([], type=id_type),
        "cosine": pa.array([], type=pa.float64())}))
    return deduped.union(empty)


# ---------------------------------------------------------------------------
# incremental dedup across runs (Bloom digest of the seen corpus)
# ---------------------------------------------------------------------------


def build_bloom(ds: Dataset, column: str, capacity: int,
                fp_rate: float = 0.01, seed: int = 0):
    """Build a :class:`~malli_ray.state.bloom.BloomFilter` of ``column``'s
    values in ONE streaming pass — the persistent "seen" digest for
    incremental (cross-run) dedup.

    Each batch emits its DISTINCT (h1, h2) base-hash pairs (16 bytes per
    distinct value, duplicates collapse map-side); the driver sets bits
    vectorized.  No shuffle, no payload movement.  At 1e10-key scale
    neither the hash stream nor a single bit array is driver-friendly:
    hash-partition the keys and build one Bloom PER SHARD (the filters
    OR-merge, and probes route by the same prefix) — this builder is the
    per-shard unit of that layout."""
    from ..state.bloom import BloomFilter

    bloom = BloomFilter(capacity, fp_rate, seed=seed)

    def hash_pairs(batch: pa.Table) -> pa.Table:
        col = batch.column(column)
        h1 = hash64(col, seed=seed + 101).view(np.int64)
        h2 = hash64(col, seed=seed + 202).view(np.int64)
        uniq = np.unique(np.stack([h1, h2], axis=1), axis=0)
        return pa.table({"h1": pa.array(uniq[:, 0], type=pa.int64()),
                         "h2": pa.array(uniq[:, 1], type=pa.int64())})

    k = np.arange(bloom.k, dtype=np.uint64)
    for b in (ds.map_batches(hash_pairs, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        t = pa.table(b)
        if t.num_rows == 0:
            continue
        h1 = t.column("h1").to_numpy(zero_copy_only=False).view(np.uint64)
        h2 = t.column("h2").to_numpy(zero_copy_only=False).view(np.uint64) \
            | np.uint64(1)
        pos = ((h1[:, None] + k[None, :] * h2[:, None])
               % np.uint64(bloom.m)).ravel()
        np.bitwise_or.at(bloom.bits,
                         (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
    return bloom


class _BloomProbe:
    """Stateful stage: Bloom digest fetched/parsed once per worker; the
    per-batch __call__ is one vectorized membership probe."""

    def __init__(self, digest_ref, column: str, keep_seen: bool):
        import ray
        from ..state.bloom import BloomFilter
        digest = (ray.get(digest_ref)
                  if isinstance(digest_ref, ray.ObjectRef) else digest_ref)
        self.bloom = BloomFilter.from_digest(digest)
        self.column = column
        self.keep_seen = keep_seen

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        seen = self.bloom.contains(batch.column(self.column))
        return batch.filter(pa.array(seen if self.keep_seen else ~seen))


def filter_seen_bloom(ds: Dataset, column: str, bloom,
                      keep_seen: bool = False, concurrency=None) -> Dataset:
    """Drop (default) or keep rows whose ``column`` value is in ``bloom`` —
    the incremental-dedup probe pass: the digest broadcasts ONCE via
    ray.put, the corpus streams shuffle-free.  No false negatives — every
    seen value is filtered; a genuinely-new value may be wrongly dropped
    at ~fp_rate (deterministic per (data, seed), not a per-run draw)."""
    import ray
    from . import cached_stage, concurrency_kwargs

    digest_ref = ray.put(bloom.digest())
    return ds.map_batches(
        cached_stage(_BloomProbe, digest_ref=digest_ref, column=column,
                     keep_seen=keep_seen),
        batch_format="pyarrow", **concurrency_kwargs(concurrency))


# ---------------------------------------------------------------------------
# semantic dedup (SemDeDup: cluster embeddings, near-dup within clusters)
# ---------------------------------------------------------------------------


def semantic_codebook(ds: Dataset, emb_column: str, id_column: str,
                      n_clusters: int, seed: int = 42,
                      sample_size: int = 2048, iters: int = 10) -> np.ndarray:
    """Deterministic spherical-k-means codebook for :func:`semantic_dedup`.

    The training sample is the ``sample_size`` rows with the globally
    SMALLEST ``hash(id)`` — a map-side partial top-k per batch (at most
    sample_size rows survive each block) merged on the driver — so the
    sample (and therefore the codebook and every downstream cluster
    assignment) is independent of block order, partitioning, and cluster
    size: rerun- and resume-stable by construction, unlike a
    ``random_sample`` whose draw follows block boundaries.  Lloyd iterations
    run on the driver over the tiny sample (similarity.train_centroids
    math).  For codebooks that must see the full corpus use
    similarity.kmeans_fit instead (scale path; reduction order makes it
    deterministic only up to float-sum rounding)."""
    from .similarity import smallest_hash_sample, train_centroids

    sample = smallest_hash_sample(ds, emb_column, id_column, sample_size)
    return train_centroids(sample, n_clusters, iters=iters, seed=seed)


class _CentroidAssigner:
    """Stateful stage: centroids fetched once per worker; emits (cid, id,
    unit-float32) rows — the same float32 wire cut as _HyperplaneBucketer."""

    def __init__(self, centroids_ref, emb_column: str, id_column: str):
        import ray
        self.centroids = (ray.get(centroids_ref)
                          if isinstance(centroids_ref, ray.ObjectRef)
                          else centroids_ref)
        self.emb_column = emb_column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "cid": pa.array([], type=pa.int64()),
                "id": pa.array([], type=batch.schema.field(
                    self.id_column).type),
                "unit": pa.array([], type=pa.list_(pa.float32()))})
        emb = np.asarray(batch.column(self.emb_column).to_pylist(),
                         dtype=np.float64)
        norm = np.linalg.norm(emb, axis=1, keepdims=True)
        norm[norm == 0] = 1.0
        unit = emb / norm
        cid = (unit @ self.centroids.T).argmax(axis=1).astype(np.int64)
        return pa.table({
            "cid": pa.array(cid),
            "id": batch.column(self.id_column),
            "unit": pa.array(list(unit.astype(np.float32)),
                             type=pa.list_(pa.float32()))})


def semantic_dedup_pairs(ds: Dataset, emb_column: str, id_column: str,
                         n_clusters: int = 16, threshold: float = 0.9,
                         seed: int = 42, sample_size: int = 2048,
                         max_bucket: int = 8192,
                         centroids: "np.ndarray | None" = None,
                         concurrency=None) -> Dataset:
    """SemDeDup (Abbas et al. 2023): semantic near-duplicate pairs via
    k-means clustering + exact within-cluster cosine.

    Scale shape: the all-pairs problem is partitioned by cluster — ONE
    shuffle keyed on the centroid assignment (k groups, sized ~n/k for a
    balanced codebook), exact cosine inside each cluster via one matmul.
    The shuffled payload is the float32 unit vector; emitted pair cosines
    are recomputed as float64 per-pair dots over the float32-roundtripped
    units (pairs << n^2, and the per-pair dot is the precision contract the
    golden fixture pins — membership is decided on the SAME dot).  Recall <
    1 by construction: a near-dup pair straddling a cluster boundary is
    missed; raise n_clusters for speed, lower it (or run two seeds) for
    recall.  Oversize clusters truncate in min-id order with a LOGGED
    warning (raise max_bucket or n_clusters instead of relying on it)."""
    import ray
    from . import cached_stage, concurrency_kwargs

    if centroids is None:
        centroids = semantic_codebook(ds, emb_column, id_column, n_clusters,
                                      seed=seed, sample_size=sample_size)
    cref = ray.put(np.asarray(centroids, dtype=np.float64))

    def verify(group: pa.Table) -> pa.Table:
        n = group.num_rows
        id_type = group.column("id").type
        empty = pa.table({"id_a": pa.array([], type=id_type),
                          "id_b": pa.array([], type=id_type),
                          "cosine": pa.array([], type=pa.float64())})
        if n < 2:
            return empty
        ids = group.column("id").to_pylist()
        if n > max_bucket:
            logger.warning(
                "semantic cluster truncated: %d rows > max_bucket=%d "
                "(cid=%s); dropping %d", n, max_bucket,
                group.column("cid")[0], n - max_bucket)
            order = sorted(range(n), key=lambda i: ids[i])[:max_bucket]
            group = group.take(pa.array(order, type=pa.int64()))
            ids = [ids[i] for i in order]
            n = max_bucket
        unit = np.asarray(group.column("unit").to_pylist(), dtype=np.float64)
        sims = unit @ unit.T
        # matmul prefilter with an ulp margin; membership decided by the
        # machine-stable per-pair float64 dot (the emitted value)
        ii, jj = np.nonzero(np.triu(sims >= threshold - 1e-9, k=1))
        a_out, b_out, c_out = [], [], []
        for i, j in zip(ii.tolist(), jj.tolist()):
            if ids[i] == ids[j]:
                continue
            cos = _stable_dot(unit[i], unit[j])
            if cos < threshold:
                continue
            lo, hi = sorted((ids[i], ids[j]))
            a_out.append(lo)
            b_out.append(hi)
            c_out.append(cos)
        return pa.table({"id_a": pa.array(a_out, type=id_type),
                         "id_b": pa.array(b_out, type=id_type),
                         "cosine": pa.array(c_out, type=pa.float64())})

    assigned = ds.map_batches(
        cached_stage(_CentroidAssigner, centroids_ref=cref,
                     emb_column=emb_column, id_column=id_column),
        batch_format="pyarrow", **concurrency_kwargs(concurrency))
    pairs = assigned.groupby("cid").map_groups(verify, batch_format="pyarrow")
    # typed empty union so a zero-pair result keeps its schema (the
    # embedding_near_dups pattern)
    id_type = ds.schema().base_schema.field(id_column).type
    empty = ray.data.from_arrow(pa.table({
        "id_a": pa.array([], type=id_type),
        "id_b": pa.array([], type=id_type),
        "cosine": pa.array([], type=pa.float64())}))
    return pairs.union(empty)


def semantic_dedup(ds: Dataset, emb_column: str, id_column: str,
                   n_clusters: int = 16, threshold: float = 0.9,
                   seed: int = 42, sample_size: int = 2048,
                   max_bucket: int = 8192, concurrency=None) -> Dataset:
    """Keep one representative (minimum id) per semantic near-dup cluster:
    pairs -> driver union-find over the SMALL pairs output -> broadcast
    drop-set filter.  The corpus itself streams; only pairs materialize."""
    pairs = semantic_dedup_pairs(
        ds, emb_column, id_column, n_clusters=n_clusters,
        threshold=threshold, seed=seed, sample_size=sample_size,
        max_bucket=max_bucket, concurrency=concurrency)
    clusters = cluster_pairs(pairs)
    return dedup_by_clusters(ds, id_column, clusters)


def cluster_pairs(pairs: "Dataset | pa.Table") -> pa.Table:
    """Near-dup pair list -> (id, cluster_id) via union-find (cluster_id =
    the cluster's minimum member id). Completes the dedup story: candidate
    pairs -> transitive clusters -> keep one representative per cluster.

    Driver-side by design: the PAIRS table is the small output of the
    LSH/verify pipelines (bounded by the caps there), orders of magnitude
    smaller than the corpus — O(pairs α(pairs)) union-find on the driver is
    the standard shape (the corpus itself never materializes). For
    pathological pair volumes, run in rounds: cluster each pairs partition,
    then union the per-partition (id, cluster_id) maps the same way."""
    if not isinstance(pairs, pa.Table):
        batches = list(pairs.iter_batches(batch_format="pyarrow")) \
            if hasattr(pairs, "iter_batches") else []
        if not batches:  # no near-duplicates: empty clusters table
            return pa.table({"id": pa.array([], type=pa.int64()),
                             "cluster_id": pa.array([], type=pa.int64())})
        pairs = pa.concat_tables(batches)
    a = pairs.column("id_a").to_pylist()
    b = pairs.column("id_b").to_pylist()
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:      # path compression
            parent[x], x = root, parent[x]
        return root

    for x, y in zip(a, b):
        rx, ry = find(x), find(y)
        if rx != ry:
            lo, hi = (rx, ry) if _lt(rx, ry) else (ry, rx)
            parent[hi] = lo               # union by MIN id -> deterministic
    members = sorted({*a, *b}, key=_sort_key)
    id_type = pairs.column("id_a").type
    return pa.table({"id": pa.array(members, type=id_type),
                     "cluster_id": pa.array([find(x) for x in members],
                                            type=id_type)})


def _lt(x, y):
    try:
        return x < y
    except TypeError:
        return str(x) < str(y)


def _sort_key(x):
    return (0, x) if isinstance(x, (int, float)) else (1, str(x))


def dedup_by_clusters(ds: Dataset, id_column: str,
                      clusters: pa.Table) -> Dataset:
    """Drop every non-representative cluster member (keep id == cluster_id
    rows and all unclustered rows). The small clusters table broadcasts
    once via ray.put; the corpus streams."""
    import ray
    from . import cached_stage

    drop = clusters.filter(
        pa.compute.invert(pa.compute.equal(clusters.column("id"),
                                           clusters.column("cluster_id"))))
    drop_ref = ray.put(set(drop.column("id").to_pylist()))

    class _DropMembers:
        def __init__(self, ref):
            drop_ids = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            # value_set built ONCE per worker — per-batch __call__ only runs
            # the is_in kernel (the constraints.py ReferentialCheck pattern)
            self.drop_arr = pa.array(sorted(drop_ids, key=_sort_key))

        def __call__(self, batch: pa.Table) -> pa.Table:
            if len(self.drop_arr) == 0:
                return batch
            mask = pa.compute.invert(pa.compute.is_in(
                batch.column(id_column), value_set=self.drop_arr))
            return batch.filter(pa.compute.fill_null(mask, True))

    return ds.map_batches(cached_stage(_DropMembers, ref=drop_ref),
                          batch_format="pyarrow")


# ---------------------------------------------------------------------------
# line-level dedup (C4-style boilerplate removal)
# ---------------------------------------------------------------------------


def _explode_lines(texts: pa.Array):
    """(row_index int64[], lines large_string Array) — one row per '\\n'-split
    line, nulls as empty text (split always yields >= 1 line per doc)."""
    import polars as pl
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    s = pl.from_arrow(texts).fill_null("")
    df = pl.DataFrame({"row": np.arange(len(s), dtype=np.int64),
                       "line": s.str.split("\n")}).explode("line")
    lines = df.get_column("line").to_arrow()
    rows = df.get_column("row").to_numpy()
    return rows, lines


def _line_count_combine(text_column: str):
    """Map-side combine: per-batch (h1, h2, cnt) of line-content hashes —
    the shuffle carries hashed line COUNTS, never line text, and a line
    repeated across the batch collapses to one row before the exchange."""

    def combine(batch: pa.Table) -> pa.Table:
        _, lines = _explode_lines(batch.column(text_column))
        # int64 bit-pattern view: Ray's groupby round-trips values through
        # Python ints, where uint64 > 2^63-1 overflows — the view keeps the
        # shuffle at 16 bytes/key with identical equality semantics
        h1 = hash64(lines, seed=21).view(np.int64)
        h2 = hash64(lines, seed=22).view(np.int64)
        keys = np.stack([h1, h2], axis=1)
        uniq, counts = np.unique(keys, axis=0, return_counts=True)
        return pa.table({"h1": pa.array(uniq[:, 0], type=pa.int64()),
                         "h2": pa.array(uniq[:, 1], type=pa.int64()),
                         "cnt": pa.array(counts.astype(np.int64))})

    return combine


def frequent_line_hashes(ds: Dataset, text_column: str, min_count: int,
                         max_frequent: int = 5_000_000):
    """Corpus-wide line-frequency pass: the (h1, h2) hash pairs of every
    line occurring >= ``min_count`` times.

    Returns ``(h1s, h2s)`` int64 numpy arrays (bit-pattern views of the
    64-bit hashes; small by construction — boilerplate lines are few
    relative to the corpus).  Raises when more than ``max_frequent`` lines
    qualify: truncating the set would silently KEEP lines that should drop,
    so an oversized result must fail loudly (raise the threshold or the
    cap)."""
    partial = ds.map_batches(_line_count_combine(text_column),
                             batch_format="pyarrow")
    freq = (partial.groupby(["h1", "h2"])
            .aggregate(Sum("cnt", alias_name="n"))
            .filter(expr=f"n >= {int(min_count)}"))
    parts = [pa.table(b) for b in freq.iter_batches(batch_format="pyarrow")]
    if not parts:
        empty = np.empty(0, dtype=np.int64)
        return empty, empty
    tbl = pa.concat_tables(parts)
    n = tbl.num_rows
    if n > max_frequent:
        raise ValueError(
            f"{n} frequent lines exceed max_frequent={max_frequent}; "
            "raise min_count or max_frequent (a truncated frequent set "
            "would silently keep droppable lines)")
    return (tbl.column("h1").to_numpy().astype(np.int64),
            tbl.column("h2").to_numpy().astype(np.int64))


class _FrequentLineFilter:
    """Per-batch line filter against a broadcast frequent-hash set.

    Membership is fully vectorized: candidates via np.isin on sorted unique
    h1, then the paired h2 check through one searchsorted gather (falls back
    to an exact pair-set probe only if two distinct frequent lines collide
    on h1 — ~n^2/2^64, effectively never)."""

    def __init__(self, text_column: str, out_column: str,
                 drop_count_column: str, freq_ref):
        import ray
        h1s, h2s = (ray.get(freq_ref)
                    if isinstance(freq_ref, ray.ObjectRef) else freq_ref)
        self.text_column = text_column
        self.out_column = out_column
        self.drop_count_column = drop_count_column
        order = np.argsort(h1s, kind="stable")
        self.h1_sorted = h1s[order]
        self.h2_for_h1 = h2s[order]
        self.h1_unique = (len(self.h1_sorted) == 0
                          or bool(np.all(np.diff(self.h1_sorted) > 0)))
        self.pair_set = (None if self.h1_unique
                         else {(int(a), int(b)) for a, b in zip(h1s, h2s)})

    def _drop_mask(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        drop = np.zeros(len(h1), dtype=bool)
        if not len(self.h1_sorted):
            return drop
        cand = np.flatnonzero(np.isin(h1, self.h1_sorted))
        if not len(cand):
            return drop
        if self.h1_unique:
            pos = np.searchsorted(self.h1_sorted, h1[cand])
            drop[cand] = self.h2_for_h1[pos] == h2[cand]
        else:
            for i in cand.tolist():
                drop[i] = (int(h1[i]), int(h2[i])) in self.pair_set
        return drop

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl
        n_docs = batch.num_rows
        if n_docs == 0:
            return (batch
                    .append_column(self.out_column,
                                   pa.array([], type=pa.string()))
                    .append_column(self.drop_count_column,
                                   pa.array([], type=pa.int64())))
        rows, lines = _explode_lines(batch.column(self.text_column))
        h1 = hash64(lines, seed=21).view(np.int64)
        h2 = hash64(lines, seed=22).view(np.int64)
        drop = self._drop_mask(h1, h2)
        df = pl.DataFrame({"row": rows,
                           "line": pl.from_arrow(lines),
                           "keep": ~drop})
        kept = (df.filter(pl.col("keep"))
                .group_by("row")
                .agg(pl.col("line").str.join("\n").alias("clean")))
        clean = (pl.DataFrame({"row": np.arange(n_docs, dtype=np.int64)})
                 .join(kept, on="row", how="left")
                 .sort("row")
                 .get_column("clean")
                 .fill_null(""))
        dropped = np.bincount(rows[drop], minlength=n_docs).astype(np.int64)
        out = clean.to_arrow()
        if out.type != pa.string():
            out = out.cast(pa.string())
        return (batch
                .append_column(self.out_column, out)
                .append_column(self.drop_count_column, pa.array(dropped)))


def drop_frequent_lines(ds: Dataset, text_column: str, min_count: int,
                        out_column: str = "text_clean",
                        drop_count_column: str = "n_lines_dropped",
                        max_frequent: int = 5_000_000,
                        concurrency=None) -> Dataset:
    """C4-style line-level dedup: remove every line that occurs >=
    ``min_count`` times corpus-wide (navigation menus, cookie banners,
    license boilerplate), keeping document structure otherwise intact.

    Two streaming passes, in the exact-dedup shuffle shape:
      1. line-hash frequency — map-side combine, (hash, cnt)-only shuffle,
         small filtered result collected and broadcast ONCE via ray.put;
      2. per-batch vectorized filter + reassembly (polars split/explode /
         str.join) — no shuffle at all.

    Appends ``out_column`` (text with frequent lines removed, '' when all
    lines drop) and ``drop_count_column``.  Line = '\\n'-split segment,
    compared EXACTLY (128-bit content hash, no normalization) — the same
    drop set SQL computes by grouping raw lines."""
    import ray
    from . import cached_stage, concurrency_kwargs
    freq = frequent_line_hashes(ds, text_column, min_count,
                                max_frequent=max_frequent)
    logger.info("drop_frequent_lines: %d frequent lines (min_count=%d)",
                len(freq[0]), min_count)
    freq_ref = ray.put(freq)
    return ds.map_batches(
        cached_stage(_FrequentLineFilter, text_column=text_column,
                     out_column=out_column,
                     drop_count_column=drop_count_column, freq_ref=freq_ref),
        batch_format="pyarrow", **concurrency_kwargs(concurrency))


# ---------------------------------------------------------------------------
# exact substring (duplicate-span) dedup — Lee et al. 2021, "Deduplicating
# Training Data Makes Language Models Better", at word-k-gram granularity
# ---------------------------------------------------------------------------


class _GramOccurrenceEmitter:
    """Flat-map a document batch to one row per word-k-gram occurrence:
    ``(h1, h2, id, pos)`` — two independent 64-bit hashes of the gram text
    (128 bits kills collisions at 10^12 grams, the exact-dedup precedent),
    the document id, and the 0-based word index of the gram's first word."""

    def __init__(self, text_column: str, id_column: str, k: int):
        self.text_column = text_column
        self.id_column = id_column
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl
        from .text import _gram_rows
        col = batch.column(self.text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        rows, pos, (h1, h2) = _gram_rows(pl.from_arrow(col), self.k,
                                         seeds=(11, 29))
        ids = batch.column(self.id_column).take(
            pa.array(rows, type=pa.int64()))
        # int64 bit-pattern views: Ray groupby round-trips uint64 through
        # Python ints, which overflows (the drop_frequent_lines precedent)
        return pa.table({"h1": pa.array(h1.view(np.int64)),
                         "h2": pa.array(h2.view(np.int64)),
                         "id": ids,
                         "pos": pa.array(pos, type=pa.int64())})


def _merged_flat_spans(g: pa.Table, k: int):
    """Merge duplicate-window starts into maximal word spans, vectorized
    across every document in the bucket at once: sort by (id, pos), then a
    per-run segmented interval merge (offset-shifted cummax so runs never
    interact).  Returns flat ``(span_ids, span_start, span_end)`` numpy
    arrays sorted by (id, start), end exclusive — empty arrays when the
    bucket holds no occurrences."""
    if g.num_rows == 0:
        return (np.empty(0, dtype=object), np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64))
    g = g.sort_by([("id", "ascending"), ("pos", "ascending")])
    ids = g.column("id").to_numpy(zero_copy_only=False)
    s = g.column("pos").to_numpy(zero_copy_only=False).astype(np.int64)
    e = s + k
    n = len(s)
    new_run = np.ones(n, dtype=bool)
    new_run[1:] = ids[1:] != ids[:-1]
    run_id = np.cumsum(new_run) - 1
    big = np.int64(e.max() + 1)
    cummax_e = np.maximum.accumulate(e + run_id * big) - run_id * big
    new_span = new_run.copy()
    new_span[1:] |= s[1:] > cummax_e[:-1]
    starts_idx = np.flatnonzero(new_span)
    return ids[starts_idx], s[starts_idx], np.maximum.reduceat(e, starts_idx)


def _merged_span_lists(g: pa.Table, k: int, id_out: str) -> pa.Table:
    """Per-document span lists from a bucket of duplicate occurrences:
    one row per document — (id, starts, ends) int64 list columns, spans
    sorted by start, end exclusive.  See :func:`_merged_flat_spans`."""
    id_type = g.column("id").type
    span_ids, span_start, span_end = _merged_flat_spans(g, k)
    if len(span_start) == 0:
        return pa.table({id_out: pa.array([], type=id_type),
                         "starts": pa.array([], type=pa.list_(pa.int64())),
                         "ends": pa.array([], type=pa.list_(pa.int64()))})
    # per-doc list offsets: spans arrive in contiguous (id, start) runs
    doc_new = np.ones(len(span_ids), dtype=bool)
    doc_new[1:] = span_ids[1:] != span_ids[:-1]
    doc_starts = np.flatnonzero(doc_new)
    counts = np.diff(np.append(doc_starts, len(span_ids)))
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    doc_ids = pa.array(span_ids[doc_starts], type=id_type)
    starts_col = pa.LargeListArray.from_arrays(
        offsets, pa.array(span_start, type=pa.int64())).cast(
            pa.list_(pa.int64()))
    ends_col = pa.LargeListArray.from_arrays(
        offsets, pa.array(span_end, type=pa.int64())).cast(
            pa.list_(pa.int64()))
    return pa.table({id_out: doc_ids, "starts": starts_col,
                     "ends": ends_col})


_SPLITMIX_C1 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_C2 = np.uint64(0x94D049BB133111EB)


def _splitmix(z: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (Steele et al. 2014) — avalanches the Horner
    accumulator so bucket assignment (h % num_buckets) is uniform."""
    z = z ^ (z >> np.uint64(30))
    z = z * _SPLITMIX_C1
    z = z ^ (z >> np.uint64(27))
    z = z * _SPLITMIX_C2
    return z ^ (z >> np.uint64(31))


class _TokenGramOccurrenceEmitter:
    """Token-granularity sibling of :class:`_GramOccurrenceEmitter`:
    one row ``(h1, h2, id, pos)`` per token-k-gram occurrence of a
    ``list<int>`` column.  Each hash is an independent odd-multiplier
    Horner accumulation over the window (k gathers, fully vectorized)
    finished with a splitmix64 avalanche — two independent 64-bit
    values = 128 bits, the same collision budget as the word emitter's
    dual polars hashes.  ``pos`` is the 0-based TOKEN index of the
    gram's first element."""

    _A1 = np.uint64(0x9E3779B97F4A7C15 | 1)
    _A2 = np.uint64(0xC2B2AE3D27D4EB4F | 1)

    def __init__(self, text_column: str, id_column: str, k: int):
        self.text_column = text_column   # the list<int> tokens column
        self.id_column = id_column
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        values, offsets = _list_values_offsets(batch.column(self.text_column))
        lens = np.diff(offsets)
        ng = np.maximum(lens - self.k + 1, 0)
        total = int(ng.sum())
        if total == 0:
            return pa.table({
                "h1": pa.array([], pa.int64()),
                "h2": pa.array([], pa.int64()),
                "id": batch.column(self.id_column).slice(0, 0),
                "pos": pa.array([], pa.int64())})
        rows = np.repeat(np.arange(len(lens), dtype=np.int64), ng)
        pos = (np.arange(total, dtype=np.int64)
               - np.repeat(np.cumsum(ng) - ng, ng))
        start = offsets[:-1][rows] + pos
        v = values.astype(np.uint64, copy=False) + np.uint64(1)
        h1 = np.zeros(total, dtype=np.uint64)
        h2 = np.zeros(total, dtype=np.uint64)
        for j in range(self.k):
            x = v[start + j]
            h1 = h1 * self._A1 + x
            h2 = h2 * self._A2 + x
        h1, h2 = _splitmix(h1), _splitmix(h2)
        ids = batch.column(self.id_column).take(pa.array(rows))
        return pa.table({"h1": pa.array(h1.view(np.int64)),
                         "h2": pa.array(h2.view(np.int64)),
                         "id": ids,
                         "pos": pa.array(pos, type=pa.int64())})


def _dup_gram_h1_ref(ds: Dataset, text_column: str, id_column: str,
                     k: int, num_buckets: int,
                     num_partitions: "int | None", concurrency,
                     token_mode: bool, max_dup_grams: int):
    """EXACT dup-gram pre-filter build: the sorted array of h1 values of
    grams occurring >= 2 times corpus-wide, broadcast via ``ray.put``.

    One h1-only exchange (16 B/distinct-gram-per-batch rows — ints only,
    no ids/positions) instead of the full ~45 B occurrence rows: each
    batch collapses to DISTINCT (h1, count capped at 2), buckets on
    ``h1 % num_buckets``, and each bucket emits its dup h1s as ONE
    binary blob.  Driver holds O(dup grams) — fail-loud ``max_dup_grams``
    cap (8 B/gram; the cap bounds the broadcast, not correctness: run
    without the prefilter when a corpus is mostly duplicate)."""
    import ray

    from . import cached_stage, concurrency_kwargs

    emitter = _TokenGramOccurrenceEmitter if token_mode \
        else _GramOccurrenceEmitter

    def local_counts(batch: pa.Table) -> pa.Table:
        h = batch.column("h1").to_numpy(zero_copy_only=False)
        u, c = np.unique(h, return_counts=True)
        return pa.table({"h1": pa.array(u, pa.int64()),
                         "cnt": pa.array(np.minimum(c, 2), pa.int8()),
                         "__b__": pa.array(
                             (u.view(np.uint64) % np.uint64(num_buckets))
                             .astype(np.int64))})

    def bucket_dups(g: pa.Table) -> pa.Table:
        h = g.column("h1").to_numpy(zero_copy_only=False)
        c = g.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(h, kind="mergesort")
        h, c = h[order], c[order]
        starts = np.concatenate(([0], np.flatnonzero(h[1:] != h[:-1]) + 1))
        sums = np.add.reduceat(c, starts)
        dup = h[starts[sums >= 2]]
        return pa.table({"blob": pa.array([dup.tobytes()],
                                          pa.large_binary())})

    rows = (ds.map_batches(
                cached_stage(emitter, text_column=text_column,
                             id_column=id_column, k=k),
                batch_format="pyarrow", **concurrency_kwargs(concurrency))
            .map_batches(local_counts, batch_format="pyarrow")
            .groupby("__b__", num_partitions=num_partitions)
            .map_groups(bucket_dups, batch_format="pyarrow")
            .take_all())  # O(num_buckets) blob rows
    parts = [np.frombuffer(r["blob"], dtype=np.int64) for r in rows
             if len(r["blob"])]
    dup = np.sort(np.concatenate(parts)) if parts \
        else np.empty(0, dtype=np.int64)
    if len(dup) > max_dup_grams:
        raise ValueError(
            f"dup-gram prefilter: {len(dup)} duplicated grams > "
            f"max_dup_grams={max_dup_grams} — the corpus is too "
            f"duplicate-heavy for a broadcast filter; raise the cap or "
            f"run with prefilter=False")
    logger.info("dup-gram prefilter: %d duplicated grams (%.0f MB "
                "broadcast)", len(dup), len(dup) * 8 / 1e6)
    return ray.put(dup)


class _PrefilteredEmitter:
    """Occurrence emitter + broadcast dup-h1 filter: only occurrences of
    corpus-duplicated grams leave the map side (searchsorted per batch)."""

    def __init__(self, emitter_cls, dup_ref, **kwargs):
        import ray
        self.inner = emitter_cls(**kwargs)
        self.dup = ray.get(dup_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = self.inner(batch)
        if t.num_rows == 0 or len(self.dup) == 0:
            return t.slice(0, 0)
        h = t.column("h1").to_numpy(zero_copy_only=False)
        i = np.searchsorted(self.dup, h)
        i_c = np.minimum(i, len(self.dup) - 1)
        return t.filter(pa.array(self.dup[i_c] == h))


def _duplicate_occurrences(ds: Dataset, text_column: str, id_column: str,
                           k: int, num_buckets: int,
                           num_partitions: int | None,
                           concurrency, token_mode: bool = False,
                           prefilter: bool = False,
                           max_dup_grams: int = 50_000_000) -> Dataset:
    """Shared phase of exact substring dedup: one row ``(id, pos)`` per
    NON-FIRST occurrence of each word-k-gram (``token_mode=True``:
    token-k-gram of a list<int> column), global first defined by
    (id, pos) order.  ONE gram-keyed exchange: grams bucket on
    ``h1 % num_buckets`` and each bucket runs a single vectorized sort +
    run-boundary mask.

    ``prefilter=True`` (the documented singleton-cut mitigation, EXACT):
    an extra h1-only counting pass finds the corpus-duplicated grams
    first, and the wide ``(h1, h2, id, pos)`` exchange then ships ONLY
    their occurrences — singleton grams (the vast majority of a mostly
    unique corpus) never leave the map side.  Output is identical:
    singleton grams cannot produce non-first occurrences.

    MEASURED honesty note (sf0.1, 170M token occurrences, 32 cores):
    the prefilter is ~1.5x SLOWER there — duplication is cross-batch, so
    the counting pass's per-batch-distinct rows number ~the full
    occurrence count and the exchange saving is bytes-per-row only
    (17 B vs ~45 B), while gram hashing runs twice.  Use it when
    exchange BYTES dominate (disk-spilling shuffles, wide id columns),
    not to cut wall time on an in-memory shuffle."""
    from . import cached_stage, concurrency_kwargs

    emitter = _TokenGramOccurrenceEmitter if token_mode \
        else _GramOccurrenceEmitter
    if prefilter:
        dup_ref = _dup_gram_h1_ref(ds, text_column, id_column, k,
                                   num_buckets, num_partitions,
                                   concurrency, token_mode, max_dup_grams)
        occ = ds.map_batches(
            cached_stage(_PrefilteredEmitter, emitter_cls=emitter,
                         dup_ref=dup_ref, text_column=text_column,
                         id_column=id_column, k=k),
            batch_format="pyarrow", **concurrency_kwargs(concurrency))
    else:
        occ = ds.map_batches(
            cached_stage(emitter, text_column=text_column,
                         id_column=id_column, k=k),
            batch_format="pyarrow", **concurrency_kwargs(concurrency))

    def bucketize_gram(batch: pa.Table) -> pa.Table:
        h = batch.column("h1").to_numpy(zero_copy_only=False)
        b = (h.view(np.uint64) % np.uint64(num_buckets)).astype(np.int64)
        return batch.append_column("__gbucket__", pa.array(b))

    def drop_first(g: pa.Table) -> pa.Table:
        # non-first occurrences of each (h1, h2) gram, vectorized via one
        # sort + run-boundary mask across the whole bucket
        g = g.sort_by([("h1", "ascending"), ("h2", "ascending"),
                       ("id", "ascending"), ("pos", "ascending")])
        h1 = g.column("h1").to_numpy(zero_copy_only=False)
        h2 = g.column("h2").to_numpy(zero_copy_only=False)
        first = np.ones(len(h1), dtype=bool)
        first[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        return g.filter(pa.array(~first)).select(["id", "pos"])

    return (occ.map_batches(bucketize_gram, batch_format="pyarrow")
            .groupby("__gbucket__", num_partitions=num_partitions)
            .map_groups(drop_first, batch_format="pyarrow"))


def _doc_keyed_span_merge(dup_occ: Dataset, merge_fn, empty: pa.Table,
                          num_buckets: int,
                          num_partitions: "int | None") -> Dataset:
    """Shared doc-keyed finisher of the span ops (word AND token paths):
    bucket the duplicate occurrences ``(id, pos)`` on
    ``hash(id) % num_buckets``, merge each bucket with ONE vectorized
    ``merge_fn(table) -> table`` call, and union a typed empty table so a
    zero-dup corpus keeps its output schema.  The ``select`` normalizes
    empty shuffle partitions, which re-emit zero-row blocks with the
    FULL pre-groupby schema (extra gram columns)."""
    import ray

    from ..state.sketches import hash64

    def bucketize_doc(batch: pa.Table) -> pa.Table:
        batch = batch.select(["id", "pos"])
        h = hash64(batch.column("id"), seed=17) % np.uint64(num_buckets)
        return batch.append_column("__dbucket__",
                                   pa.array(h.astype(np.int64)))

    def merge(g: pa.Table) -> pa.Table:
        return merge_fn(g.drop_columns(["__dbucket__"]))

    spans = (dup_occ.map_batches(bucketize_doc, batch_format="pyarrow")
             .groupby("__dbucket__", num_partitions=num_partitions)
             .map_groups(merge, batch_format="pyarrow"))
    return spans.union(ray.data.from_arrow(empty))


def duplicate_span_lists(ds: Dataset, text_column: str, id_column: str,
                         k: int = 10, num_buckets: int = 64,
                         num_partitions: int | None = None,
                         prefilter: bool = False,
                         concurrency=None) -> Dataset:
    """Exact substring dedup, phase 1 (Lee et al. 2021 semantics at word
    granularity): find every maximal span of words that is covered by
    duplicated k-grams, keeping the globally FIRST occurrence of each gram
    (ordered by (id, pos)).  One row per document that contains duplicate
    spans: ``(id, starts: list<int64>, ends: list<int64>)`` — word-index
    spans, end exclusive, sorted by start.

    Scale shape: the exchange is (h1, h2, id, pos) per word occurrence —
    ~28 bytes/word, the honest price of EXACT substring dedup (the
    suffix-array construction of the paper is also superlinear I/O).  Both
    groupbys shuffle on ``hash % num_buckets`` — evenly-sized buckets, ONE
    vectorized call per bucket, never per-gram/per-doc Python (the lag_lead
    precedent).  Mitigations for 100 TB, in order: raise ``k`` (fewer
    matches, same volume), pre-filter singleton grams with a two-level
    Bloom pass (ships only grams seen >= 2 — typically 10-50x volume cut;
    build_bloom provides the digest), or sample windows with a stride and
    widen matched spans by k (approximate).  Docs with < k words emit no
    grams and never appear in the output."""
    dup_occ = _duplicate_occurrences(ds, text_column, id_column, k,
                                     num_buckets, num_partitions,
                                     concurrency, prefilter=prefilter)
    id_type = ds.schema().base_schema.field(id_column).type
    empty = pa.table({
        id_column: pa.array([], type=id_type),
        "starts": pa.array([], type=pa.list_(pa.int64())),
        "ends": pa.array([], type=pa.list_(pa.int64()))})
    return _doc_keyed_span_merge(
        dup_occ, lambda g: _merged_span_lists(g, k, id_column), empty,
        num_buckets, num_partitions)


def duplicate_spans(ds: Dataset, text_column: str, id_column: str,
                    k: int = 10, num_buckets: int = 64,
                    num_partitions: int | None = None,
                    prefilter: bool = False,
                    concurrency=None) -> Dataset:
    """Exact substring dedup, exploded view: one row per maximal duplicate
    span — ``(id, span_start, span_end)`` word indices, end exclusive.
    See :func:`duplicate_span_lists` for semantics and scale shape."""
    lists = duplicate_span_lists(ds, text_column, id_column, k=k,
                                 num_buckets=num_buckets,
                                 num_partitions=num_partitions,
                                 prefilter=prefilter,
                                 concurrency=concurrency)
    id_type = ds.schema().base_schema.field(id_column).type

    def explode(batch: pa.Table) -> pa.Table:
        if "starts" not in batch.column_names:
            # zero-row passthrough block from an empty shuffle partition
            # (Ray re-emits the pre-groupby schema for empty partitions)
            return pa.table({id_column: pa.array([], type=id_type),
                             "span_start": pa.array([], type=pa.int64()),
                             "span_end": pa.array([], type=pa.int64())})
        ids = batch.column(id_column)
        starts = batch.column("starts")
        if isinstance(starts, pa.ChunkedArray):
            starts = starts.combine_chunks()
        ends = batch.column("ends")
        if isinstance(ends, pa.ChunkedArray):
            ends = ends.combine_chunks()
        lens = pc.list_value_length(starts).to_numpy(zero_copy_only=False)
        row_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        return pa.table({
            id_column: ids.take(pa.array(row_idx)),
            "span_start": starts.flatten(),
            "span_end": ends.flatten()})

    return lists.map_batches(explode, batch_format="pyarrow")


def _mask_words(col, row_idx, starts, ends):
    """Drop the words covered by spans and rebuild whitespace-normalized
    text, fully vectorized across the table: one polars word extraction,
    one global coverage difference array over the flattened words
    (np.add.at with ALL span endpoints at once), one Arrow filter + list
    rebuild + binary_join.  ``col`` is a string array of texts (one per
    doc); ``row_idx``/``starts``/``ends`` are flat span arrays where
    row_idx indexes into ``col``.  Returns ``(text_out, dropped)``."""
    import polars as pl
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_null(col.type):
        col = col.cast(pa.string())
    words = (pl.from_arrow(col).fill_null("")
             .str.extract_all(_WORD_RE.pattern))
    wc = words.list.len().to_numpy().astype(np.int64)
    doc_off = np.concatenate(([0], np.cumsum(wc)))
    total = int(doc_off[-1])
    flat = words.explode().drop_nulls().to_arrow()
    if not pa.types.is_string(flat.type):
        flat = flat.cast(pa.string())
    cover = np.zeros(total + 1, dtype=np.int64)
    np.add.at(cover, np.clip(doc_off[row_idx] + starts, 0, total), 1)
    np.add.at(cover, np.clip(doc_off[row_idx] + ends, 0, total), -1)
    keep = np.cumsum(cover[:-1]) <= 0
    cs = np.concatenate(([0], np.cumsum(keep))).astype(np.int64)
    kept_counts = cs[doc_off[1:]] - cs[doc_off[:-1]]
    kept = flat.filter(pa.array(keep)) if total else flat
    out_off = np.concatenate(([0], np.cumsum(kept_counts)))
    lists = pa.LargeListArray.from_arrays(out_off.astype(np.int64), kept)
    text_out = pc.binary_join(lists, " ")
    dropped = pa.array(wc - kept_counts, type=pa.int64())
    return text_out, dropped


def _broadcast_span_ref(spans: Dataset, id_column: str,
                        max_broadcast_spans: int, strategy: str,
                        op_name: str):
    """Materialize the merged (id, span_start, span_end) table, enforce
    the broadcast cap, and ship it as sorted flat arrays via ray.put:
    ``(ids_sorted_unique, per_id_offsets, starts, ends)``.  The driver
    pull is Arrow blocks sliced to numpy (never row dicts — at the 20M
    default cap dict rows would be GBs of Python overhead).  Returns
    ``(ref, materialized_spans)``; ref is None when ``strategy='auto'``
    exceeds the cap — the caller reuses the MATERIALIZED spans in the
    exchange fallback, so phase 1 is never paid twice.  An explicit
    ``strategy='broadcast'`` RAISES above the cap instead."""
    import ray

    spans = spans.materialize()
    n_spans = spans.count()
    if n_spans > max_broadcast_spans:
        if strategy == "broadcast":
            raise ValueError(
                f"{op_name}: {n_spans} merged spans > "
                f"max_broadcast_spans={max_broadcast_spans} — the corpus "
                f"is too duplicate-heavy for a broadcast mask; use "
                f"strategy='exchange' (no driver-side span state)")
        logger.info("%s: %d spans > cap %d — falling back to the "
                    "exchange strategy (reusing the materialized spans)",
                    op_name, n_spans, max_broadcast_spans)
        return None, spans
    if n_spans == 0:
        ref = ray.put((np.empty(0, dtype=object),
                       np.zeros(1, dtype=np.int64),
                       np.empty(0, dtype=np.int64),
                       np.empty(0, dtype=np.int64)))
        return ref, spans
    tbl = pa.concat_tables(
        [t for t in ray.get(spans.sort(id_column).to_arrow_refs())
         if t.num_rows])
    sids = tbl.column(id_column).to_numpy(zero_copy_only=False)
    starts = (tbl.column("span_start").to_numpy(zero_copy_only=False)
              .astype(np.int64))
    ends = (tbl.column("span_end").to_numpy(zero_copy_only=False)
            .astype(np.int64))
    if len(sids) > 1 and not np.all(sids[:-1] <= sids[1:]):
        # defensive: sort blocks should arrive range-ordered; re-sort
        # driver-side if the runtime ever stops guaranteeing it
        order = np.argsort(sids, kind="stable")
        sids, starts, ends = sids[order], starts[order], ends[order]
    uniq, first = np.unique(sids, return_index=True)
    off = np.concatenate((np.sort(first), [len(sids)])).astype(np.int64)
    logger.info("%s: broadcast strategy (%d spans over %d docs)",
                op_name, n_spans, len(uniq))
    return ray.put((uniq, off, starts, ends)), spans


class _BroadcastWordSpanMask:
    """Word-level sibling of :class:`_BroadcastSpanMask`: broadcast span
    lookup + :func:`_mask_words` text rebuild per batch — the text
    payload never shuffles."""

    def __init__(self, ref, text_column, id_column, out_column,
                 drop_count_column):
        import ray
        self.ids, self.off, self.starts, self.ends = ray.get(ref)
        self.text_column = text_column
        self.id_column = id_column
        self.out_column = out_column
        self.drop_count_column = drop_count_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        bid = batch.column(self.id_column).to_numpy(zero_copy_only=False)
        if len(self.ids):
            p = np.searchsorted(self.ids, bid)
            p_c = np.minimum(p, len(self.ids) - 1)
            matched = self.ids[p_c] == bid
        else:
            p_c = np.zeros(len(bid), dtype=np.int64)
            matched = np.zeros(len(bid), dtype=bool)
        m_rows = np.flatnonzero(matched)
        lo = self.off[p_c[m_rows]]
        cnt = self.off[p_c[m_rows] + 1] - lo
        row_idx = np.repeat(m_rows, cnt).astype(np.int64)
        block = np.repeat(np.cumsum(cnt) - cnt, cnt)
        take = lo[np.repeat(np.arange(len(m_rows)), cnt)] \
            + (np.arange(len(row_idx)) - block)
        text_out, dropped = _mask_words(
            batch.column(self.text_column), row_idx,
            self.starts[take], self.ends[take])
        keep_cols = [c for c in batch.column_names
                     if c not in (self.id_column, self.text_column)]
        return pa.table({
            self.id_column: batch.column(self.id_column),
            self.out_column: text_out,
            self.drop_count_column: dropped,
            **{c: batch.column(c) for c in keep_cols}})


def remove_duplicate_spans(ds: Dataset, text_column: str, id_column: str,
                           k: int = 10, out_column: str = "text_dedup",
                           drop_count_column: str = "n_words_dropped",
                           num_buckets: int = 64,
                           num_partitions: int | None = None,
                           keep_columns: "list[str] | None" = None,
                           prefilter: bool = False,
                           strategy: str = "auto",
                           max_broadcast_spans: int = 20_000_000,
                           concurrency=None) -> Dataset:
    """Exact substring dedup, phase 2: drop every word covered by a
    duplicate span (keeping each gram's globally first occurrence) and
    rebuild the text from the surviving words joined by single spaces —
    i.e. ALL documents come back whitespace-normalized, duplicated spans
    removed.  Output: (id, out_column, drop_count_column [, keep_columns
    — payload columns carried through the doc-keyed exchange verbatim,
    so a pipeline keeps source/metadata without a re-join]).

    Strategies (identical output — see the token sibling
    :func:`remove_duplicate_token_spans` for the trade):
    ``"broadcast"`` (``"auto"`` default under ``max_broadcast_spans``
    merged spans) ships the span table via the object store and masks
    map-only — the TEXT PAYLOAD NEVER SHUFFLES; ``"exchange"`` (the
    auto fallback, or explicit) is the original two-exchange shape: the
    gram-keyed keep-first shuffle (:func:`_duplicate_occurrences`), then
    ONE doc-keyed shuffle that fuses span merge + join + mask — the raw
    duplicate occurrences ``(id, pos)`` union with the documents
    (tag+union, the asof_join precedent; Ray's native hash join
    nondeterministically finalizes empty tiny-side partitions as
    SCHEMA-LESS tables, observed: the same plan alternates between 500
    rows and ``ArrowInvalid: no match for FieldRef doc_id on right
    side``), both sides bucket on ``hash(id) % num_buckets``, and each
    bucket merges its occurrences into maximal spans
    (:func:`_merged_flat_spans`), aligns them to its docs with one
    searchsorted, and masks (:func:`_mask_words`) — all vectorized, no
    per-doc Python."""
    from . import cached_stage, concurrency_kwargs
    from ..state.sketches import hash64

    if strategy not in ("auto", "broadcast", "exchange"):
        raise ValueError(f"remove_duplicate_spans: unknown strategy "
                         f"{strategy!r}")
    premerged = None
    if strategy in ("auto", "broadcast"):
        spans = duplicate_spans(ds, text_column, id_column, k=k,
                                num_buckets=num_buckets,
                                num_partitions=num_partitions,
                                prefilter=prefilter,
                                concurrency=concurrency)
        ref, premerged = _broadcast_span_ref(
            spans, id_column, max_broadcast_spans, strategy,
            "remove_duplicate_spans")
        if ref is not None:
            sel = [id_column, text_column,
                   *[c for c in (keep_columns or ())
                     if c not in (id_column, text_column)]]
            return ds.select_columns(sel).map_batches(
                cached_stage(_BroadcastWordSpanMask, ref=ref,
                             text_column=text_column,
                             id_column=id_column, out_column=out_column,
                             drop_count_column=drop_count_column),
                batch_format="pyarrow", **concurrency_kwargs(concurrency))

    if premerged is not None:
        # auto fallback: the spans are already merged and materialized —
        # co-shuffle them with the docs instead of re-paying the gram
        # exchange (side-1 carries (id, start, end) directly)
        side1 = premerged
    else:
        side1 = _duplicate_occurrences(ds, text_column, id_column, k,
                                       num_buckets, num_partitions,
                                       concurrency, prefilter=prefilter)
    schema = ds.schema().base_schema
    id_type = schema.field(id_column).type
    text_type = schema.field(text_column).type
    if pa.types.is_null(text_type):
        text_type = pa.string()
    keep = [c for c in (keep_columns or ())
            if c not in (id_column, text_column)]
    keep_types = {c: schema.field(c).type for c in keep}

    side_col, bucket_col = "__jside__", "__jbucket__"

    is_premerged = premerged is not None

    def _tagged(batch: pa.Table, side: int) -> pa.Table:
        # occ blocks from empty shuffle partitions re-emit the pre-groupby
        # schema (extra gram columns); select normalizes either way
        ids = batch.column(id_column if (side == 0 or is_premerged)
                           else "id")
        n = batch.num_rows
        text = (batch.column(text_column) if side == 0
                else pa.nulls(n, text_type))
        if side == 0 and pa.types.is_null(text.type):
            text = text.cast(text_type)
        if side == 1:
            pos = batch.column("span_start" if is_premerged else "pos")
            pos2 = (batch.column("span_end") if is_premerged
                    else pa.nulls(n, pa.int64()))
        else:
            pos = pa.nulls(n, pa.int64())
            pos2 = pa.nulls(n, pa.int64())
        bucket = (hash64(ids, seed=23)
                  % np.uint64(num_buckets)).astype(np.int64)
        cols = {id_column: ids, text_column: text, "pos": pos,
                "pos2": pos2,
                side_col: pa.array(np.full(n, side, dtype=np.int8)),
                bucket_col: pa.array(bucket)}
        for c in keep:
            cols[c] = (batch.column(c) if side == 0
                       else pa.nulls(n, keep_types[c]))
        return pa.table(cols)

    both = (ds.select_columns([id_column, text_column, *keep])
            .map_batches(lambda b: _tagged(b, 0), batch_format="pyarrow")
            .union(side1.map_batches(lambda b: _tagged(b, 1),
                                     batch_format="pyarrow")))

    def merge_mask(g: pa.Table) -> pa.Table:
        empty = pa.table({
            id_column: pa.array([], type=id_type),
            out_column: pa.array([], type=pa.string()),
            drop_count_column: pa.array([], type=pa.int64()),
            **{c: pa.array([], type=keep_types[c]) for c in keep}})
        if g.num_rows == 0 or side_col not in g.column_names:
            return empty
        side = g.column(side_col).to_numpy(zero_copy_only=False)
        docs = (g.filter(pa.array(side == 0))
                .select([id_column, text_column, *keep])
                .sort_by([(id_column, "ascending")]))
        if docs.num_rows == 0:
            return empty
        occ_part = (g.filter(pa.array(side == 1))
                    .select([id_column, "pos", "pos2"])
                    .rename_columns(["id", "pos", "pos2"]))
        if is_premerged:
            span_ids = (occ_part.column("id")
                        .to_numpy(zero_copy_only=False))
            span_start = (occ_part.column("pos")
                          .to_numpy(zero_copy_only=False)
                          .astype(np.int64))
            span_end = (occ_part.column("pos2")
                        .to_numpy(zero_copy_only=False)
                        .astype(np.int64))
        else:
            span_ids, span_start, span_end = _merged_flat_spans(
                occ_part.drop_columns(["pos2"]), k)
        doc_ids = docs.column(id_column).to_numpy(zero_copy_only=False)
        # both sides Arrow-sorted ascending: spans align to their doc row
        # with one searchsorted (UTF-8 byte order == code-point order, so
        # numpy's string comparison agrees with Arrow's)
        row_idx = (np.searchsorted(doc_ids, span_ids)
                   if len(span_ids) else np.empty(0, dtype=np.int64))
        text_out, dropped = _mask_words(docs.column(text_column),
                                        row_idx, span_start, span_end)
        return pa.table({id_column: docs.column(id_column),
                         out_column: text_out,
                         drop_count_column: dropped,
                         **{c: docs.column(c) for c in keep}})

    return (both.groupby(bucket_col, num_partitions=num_partitions)
            .map_groups(merge_mask, batch_format="pyarrow"))


def duplicate_token_spans(ds: Dataset, tokens_column: str, id_column: str,
                          k: int = 10, num_buckets: int = 64,
                          num_partitions: int | None = None,
                          prefilter: bool = False,
                          concurrency=None) -> Dataset:
    """Exact substring dedup at TOKEN granularity (Lee et al. 2021's
    native setting — the paper deduplicates tokenized corpora): one row
    per maximal span of tokens covered by duplicated token-k-grams,
    keeping each gram's globally FIRST occurrence (ordered by (id, pos)).
    Output ``(id, span_start, span_end)`` — token indices, end exclusive.

    Same two-exchange scale shape as the word-level
    :func:`duplicate_spans` (the exchange is ~28 B per token occurrence,
    the honest price of exactness; the same mitigations apply), with the
    gram hashes computed by two independent Horner+splitmix64
    accumulations over the token windows instead of string hashing —
    k gathers per batch, no string materialization at all."""
    dup_occ = _duplicate_occurrences(ds, tokens_column, id_column, k,
                                     num_buckets, num_partitions,
                                     concurrency, token_mode=True,
                                     prefilter=prefilter)
    id_type = ds.schema().base_schema.field(id_column).type

    def merge(g: pa.Table) -> pa.Table:
        span_ids, s, e = _merged_flat_spans(g, k)
        return pa.table({
            id_column: pa.array(span_ids.tolist(), type=id_type),
            "span_start": pa.array(s, type=pa.int64()),
            "span_end": pa.array(e, type=pa.int64())})

    empty = pa.table({
        id_column: pa.array([], type=id_type),
        "span_start": pa.array([], type=pa.int64()),
        "span_end": pa.array([], type=pa.int64())})
    return _doc_keyed_span_merge(dup_occ, merge, empty,
                                 num_buckets, num_partitions)


def duplicate_token_span_lists(ds: Dataset, tokens_column: str,
                               id_column: str, k: int = 10,
                               num_buckets: int = 64,
                               num_partitions: "int | None" = None,
                               prefilter: bool = False,
                               concurrency=None) -> Dataset:
    """Per-document list view of :func:`duplicate_token_spans` (API
    parity with the word-level :func:`duplicate_span_lists`): one row per
    document containing duplicate token spans —
    ``(id, starts: list<int64>, ends: list<int64>)``, sorted by start."""
    dup_occ = _duplicate_occurrences(ds, tokens_column, id_column, k,
                                     num_buckets, num_partitions,
                                     concurrency, token_mode=True,
                                     prefilter=prefilter)
    id_type = ds.schema().base_schema.field(id_column).type
    empty = pa.table({
        id_column: pa.array([], type=id_type),
        "starts": pa.array([], type=pa.list_(pa.int64())),
        "ends": pa.array([], type=pa.list_(pa.int64()))})
    return _doc_keyed_span_merge(
        dup_occ, lambda g: _merged_span_lists(g, k, id_column), empty,
        num_buckets, num_partitions)


def _mask_token_lists(docs: pa.Table, tokens_column: str,
                      row_idx: np.ndarray, span_start, span_end,
                      val_type) -> "tuple[pa.ListArray, pa.Array]":
    """Drop the tokens covered by spans, fully vectorized across the
    table: one coverage-difference array over the flattened values
    buffer (np.add.at with ALL span endpoints at once), one filter +
    list rebuild.  ``row_idx``/``span_start``/``span_end`` are flat
    span arrays where row_idx indexes into ``docs``.  Returns
    ``(lists, dropped)`` — the token sibling of :func:`_mask_words`."""
    values, offsets = _list_values_offsets(docs.column(tokens_column))
    lens = np.diff(offsets)
    total = int(offsets[-1])
    cover = np.zeros(total + 1, dtype=np.int64)
    np.add.at(cover, np.clip(offsets[:-1][row_idx] + span_start,
                             0, total), 1)
    np.add.at(cover, np.clip(offsets[:-1][row_idx] + span_end,
                             0, total), -1)
    keep = np.cumsum(cover[:-1]) <= 0
    cs = np.concatenate(([0], np.cumsum(keep))).astype(np.int64)
    kept_counts = cs[offsets[1:]] - cs[offsets[:-1]]
    out_off = np.concatenate(([0], np.cumsum(kept_counts)))
    lists = pa.ListArray.from_arrays(
        pa.array(out_off.astype(np.int32), type=pa.int32()),
        pa.array(values[keep], type=pa.int64()).cast(val_type))
    return lists, pa.array(lens - kept_counts, type=pa.int64())


class _BroadcastSpanMask:
    """Shuffle-free phase-2 masker: the merged span table rides the
    object store (sorted ids + flat per-id span ranges, fetched once per
    worker); each batch looks its rows up with one searchsorted and
    masks in place — the document payload NEVER shuffles."""

    def __init__(self, ref, tokens_column, id_column, out_column,
                 drop_count_column, val_type):
        import ray
        self.ids, self.off, self.starts, self.ends = ray.get(ref)
        self.tokens_column = tokens_column
        self.id_column = id_column
        self.out_column = out_column
        self.drop_count_column = drop_count_column
        self.val_type = val_type

    def __call__(self, batch: pa.Table) -> pa.Table:
        bid = batch.column(self.id_column).to_numpy(zero_copy_only=False)
        if len(self.ids):
            p = np.searchsorted(self.ids, bid)
            p_c = np.minimum(p, len(self.ids) - 1)
            matched = self.ids[p_c] == bid
        else:
            p_c = np.zeros(len(bid), dtype=np.int64)
            matched = np.zeros(len(bid), dtype=bool)
        m_rows = np.flatnonzero(matched)
        lo = self.off[p_c[m_rows]]
        cnt = self.off[p_c[m_rows] + 1] - lo
        row_idx = np.repeat(m_rows, cnt)
        block = np.repeat(np.cumsum(cnt) - cnt, cnt)
        take = lo[np.repeat(np.arange(len(m_rows)), cnt)] \
            + (np.arange(len(row_idx)) - block)
        lists, dropped = _mask_token_lists(
            batch, self.tokens_column, row_idx.astype(np.int64),
            self.starts[take], self.ends[take], self.val_type)
        keep_cols = [c for c in batch.column_names
                     if c not in (self.id_column, self.tokens_column)]
        return pa.table({
            self.id_column: batch.column(self.id_column),
            self.out_column: lists,
            self.drop_count_column: dropped,
            **{c: batch.column(c) for c in keep_cols}})


def remove_duplicate_token_spans(ds: Dataset, tokens_column: str,
                                 id_column: str, k: int = 10,
                                 out_column: str = "tokens_dedup",
                                 drop_count_column: str = "n_tokens_dropped",
                                 num_buckets: int = 64,
                                 num_partitions: int | None = None,
                                 keep_columns: "list[str] | None" = None,
                                 prefilter: bool = False,
                                 strategy: str = "auto",
                                 max_broadcast_spans: int = 20_000_000,
                                 concurrency=None) -> Dataset:
    """Exact substring dedup at token granularity, phase 2: drop every
    token covered by a duplicate span (each gram's globally first
    occurrence survives) and rebuild the list column.  Output:
    ``(id, out_column: list<same value type>, drop_count_column)`` for
    EVERY input document.

    Two strategies for applying the spans, identical output:

    - ``"broadcast"`` (picked by ``"auto"`` when the MERGED span count
      <= ``max_broadcast_spans``): spans collapse to per-doc ranges via
      the same small (id, pos)-scalar exchange phase 1 uses, then ride
      the object store as sorted flat arrays (24 B/span + ids) and each
      batch masks in place — the TOKEN PAYLOAD NEVER SHUFFLES.  At a
      typical <10% duplication rate this removes the dominant exchange
      (the sf0.1 bench: 29.3s -> ~21s).
    - ``"exchange"`` (the ``"auto"`` fallback above the cap, logged):
      the fused tag+union shape of the word-level
      :func:`remove_duplicate_spans` — docs and occurrences co-shuffle
      on ``hash(id) % num_buckets`` and each bucket merges + masks; no
      driver-side span state at any duplication rate.

    Both paths are one coverage-difference cumsum over flattened values
    (:func:`_mask_token_lists` — no per-doc Python)."""
    from . import cached_stage, concurrency_kwargs
    from ..state.sketches import hash64

    if strategy not in ("auto", "broadcast", "exchange"):
        raise ValueError(f"remove_duplicate_token_spans: unknown "
                         f"strategy {strategy!r}")
    schema = ds.schema().base_schema
    premerged = None
    if strategy in ("auto", "broadcast"):
        val_type = schema.field(tokens_column).type.value_type
        spans = duplicate_token_spans(
            ds, tokens_column, id_column, k=k, num_buckets=num_buckets,
            num_partitions=num_partitions, prefilter=prefilter,
            concurrency=concurrency)
        ref, premerged = _broadcast_span_ref(
            spans, id_column, max_broadcast_spans, strategy,
            "remove_duplicate_token_spans")
        if ref is not None:
            sel = [id_column, tokens_column,
                   *[c for c in (keep_columns or ())
                     if c not in (id_column, tokens_column)]]
            return ds.select_columns(sel).map_batches(
                cached_stage(_BroadcastSpanMask, ref=ref,
                             tokens_column=tokens_column,
                             id_column=id_column, out_column=out_column,
                             drop_count_column=drop_count_column,
                             val_type=val_type),
                batch_format="pyarrow", **concurrency_kwargs(concurrency))

    if premerged is not None:
        # auto fallback: spans already merged + materialized — co-shuffle
        # them with the docs; the gram exchange is never paid twice
        side1 = premerged
    else:
        side1 = _duplicate_occurrences(ds, tokens_column, id_column, k,
                                       num_buckets, num_partitions,
                                       concurrency, token_mode=True,
                                       prefilter=prefilter)
    id_type = schema.field(id_column).type
    toks_type = schema.field(tokens_column).type
    val_type = toks_type.value_type
    keep_cols = [c for c in (keep_columns or ())
            if c not in (id_column, tokens_column)]
    keep_types = {c: schema.field(c).type for c in keep_cols}

    side_col, bucket_col = "__jside__", "__jbucket__"
    is_premerged = premerged is not None

    def _tagged(batch: pa.Table, side: int) -> pa.Table:
        ids = batch.column(id_column if (side == 0 or is_premerged)
                           else "id")
        n = batch.num_rows
        toks = (batch.column(tokens_column) if side == 0
                else pa.nulls(n, toks_type))
        if side == 1:
            pos = batch.column("span_start" if is_premerged else "pos")
            pos2 = (batch.column("span_end") if is_premerged
                    else pa.nulls(n, pa.int64()))
        else:
            pos = pa.nulls(n, pa.int64())
            pos2 = pa.nulls(n, pa.int64())
        bucket = (hash64(ids, seed=23)
                  % np.uint64(num_buckets)).astype(np.int64)
        cols = {id_column: ids, tokens_column: toks, "pos": pos,
                "pos2": pos2,
                side_col: pa.array(np.full(n, side, dtype=np.int8)),
                bucket_col: pa.array(bucket)}
        for c in keep_cols:
            cols[c] = (batch.column(c) if side == 0
                       else pa.nulls(n, keep_types[c]))
        return pa.table(cols)

    both = (ds.select_columns([id_column, tokens_column, *keep_cols])
            .map_batches(lambda b: _tagged(b, 0), batch_format="pyarrow")
            .union(side1.map_batches(lambda b: _tagged(b, 1),
                                     batch_format="pyarrow")))

    def merge_mask(g: pa.Table) -> pa.Table:
        empty = pa.table({
            id_column: pa.array([], type=id_type),
            out_column: pa.array([], type=pa.list_(val_type)),
            drop_count_column: pa.array([], type=pa.int64()),
            **{c: pa.array([], type=keep_types[c]) for c in keep_cols}})
        if g.num_rows == 0 or side_col not in g.column_names:
            return empty
        side = g.column(side_col).to_numpy(zero_copy_only=False)
        docs = (g.filter(pa.array(side == 0))
                .select([id_column, tokens_column, *keep_cols])
                .sort_by([(id_column, "ascending")]))
        if docs.num_rows == 0:
            return empty
        occ_part = (g.filter(pa.array(side == 1))
                    .select([id_column, "pos", "pos2"])
                    .rename_columns(["id", "pos", "pos2"]))
        if is_premerged:
            span_ids = (occ_part.column("id")
                        .to_numpy(zero_copy_only=False))
            span_start = (occ_part.column("pos")
                          .to_numpy(zero_copy_only=False)
                          .astype(np.int64))
            span_end = (occ_part.column("pos2")
                        .to_numpy(zero_copy_only=False)
                        .astype(np.int64))
        else:
            span_ids, span_start, span_end = _merged_flat_spans(
                occ_part.drop_columns(["pos2"]), k)
        doc_ids = docs.column(id_column).to_numpy(zero_copy_only=False)
        row_idx = (np.searchsorted(doc_ids, span_ids)
                   if len(span_ids) else np.empty(0, dtype=np.int64))
        lists, dropped = _mask_token_lists(docs, tokens_column, row_idx,
                                           span_start, span_end, val_type)
        return pa.table({
            id_column: docs.column(id_column),
            out_column: lists,
            drop_count_column: dropped,
            **{c: docs.column(c) for c in keep_cols}})

    return (both.groupby(bucket_col, num_partitions=num_partitions)
            .map_groups(merge_mask, batch_format="pyarrow"))


def levenshtein(a: str, b: str) -> int:
    """Levenshtein distance over UTF-8 BYTES (unit-cost insert / delete /
    substitute — the classic Wagner-Fischer recurrence).  Byte-level
    deliberately: it matches SQL ``levenshtein()`` (DuckDB is byte-based:
    ``levenshtein('é','e') = 2``) so the oracle replays it exactly, and
    bytes == characters for ASCII corpora anyway.

    The DP runs one python iteration per byte of ``a`` with O(len(b))
    numpy vector work inside: the sequential insertion chain
    ``cur[j] = min(m[j], cur[j-1]+1)`` is a prefix-min of ``m[j] - j``
    (subtract the index, ``np.minimum.accumulate``, add it back), so
    there is no per-cell Python loop."""
    if a == b:
        return 0
    ab = a.encode("utf-8")
    bb = b.encode("utf-8")
    la, lb = len(ab), len(bb)
    if la == 0 or lb == 0:
        return la or lb
    if la < lb:  # iterate over the shorter string
        ab, bb, la, lb = bb, ab, lb, la
    barr = np.frombuffer(bb, dtype=np.uint8)
    jdx = np.arange(lb + 1, dtype=np.int64)
    prev = jdx.copy()
    for i, ca in enumerate(ab):
        m = np.minimum(prev[:-1] + (barr != ca), prev[1:] + 1)
        vals = np.concatenate(([np.int64(i + 1)], m - jdx[1:]))
        prev = np.minimum.accumulate(vals) + jdx
    return int(prev[lb])


def add_edit_distance(ds: Dataset, col_a: str, col_b: str,
                      max_chars: int = 20_000) -> Dataset:
    """Per-row exact edit distance between two text columns — the
    precision verifier for near-dup CANDIDATE pairs (run it on the small
    LSH/minhash pairs table after texts are joined on, never on a cross
    product: the DP is O(len_a x len_b) per row by nature).

    Emits ``edit_dist`` (int64) and ``edit_ratio`` — ONE IEEE division
    ``edit_dist / max(bytes_a, bytes_b, 1)`` (byte lengths, matching the
    byte-based distance — SQL: ``octet_length``), so a SQL oracle
    (``levenshtein()``) reproduces both exactly.  Rows longer than
    ``max_chars`` raise: a silent quadratic blowup at scale is worse
    than a loud cap (chunk or fingerprint such docs upstream)."""

    def dist(batch: pa.Table) -> pa.Table:
        a = batch.column(col_a).to_pylist()
        b = batch.column(col_b).to_pylist()
        out = np.empty(len(a), dtype=np.int64)
        denom = np.empty(len(a), dtype=np.int64)
        for i, (x, y) in enumerate(zip(a, b)):
            x, y = x or "", y or ""
            if len(x) > max_chars or len(y) > max_chars:
                raise RuntimeError(
                    f"add_edit_distance: text of {max(len(x), len(y))} "
                    f"chars exceeds max_chars={max_chars}")
            out[i] = levenshtein(x, y)
            denom[i] = max(len(x.encode("utf-8")), len(y.encode("utf-8")),
                           1)
        return batch.append_column(
            "edit_dist", pa.array(out, pa.int64())).append_column(
            "edit_ratio", pa.array(out.astype(np.float64) / denom,
                                   pa.float64()))

    return ds.map_batches(dist, batch_format="pyarrow")


def ed1_check(a: str, b: str) -> "int | None":
    """Edit distance if <= 1 else None — LINEAR, no DP: equal -> 0; equal
    length -> exactly one mismatched position; length diff 1 -> one-gap
    two-pointer match.  ~15x the DP levenshtein on short strings, and the
    only distances fuzzy_join_ed1 can emit anyway."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == lb:
        diff = sum(1 for x, y in zip(a, b) if x != y)
        return 1 if diff == 1 else None
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if lb - la != 1:
        return None
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return 1 if a[i:] == b[i + 1:] else None


def fuzzy_join_ed1(ds: Dataset, column: str, id_column: str,
                   max_bucket: int = 4096, closure_cap: int = 100_000,
                   num_buckets: int = 64,
                   num_partitions: "int | None" = None) -> Dataset:
    """All pairs of rows whose ``column`` values are within edit distance
    1 (record linkage / near-identical-name dedup) — the SymSpell
    deletion-neighborhood banding, which is EXACT for radius 1: any two
    strings with ``ed <= 1`` share a key in
    ``{s} U {s minus one character}`` (equal -> s itself; substitution at
    i -> both delete i; insert/delete -> the longer's deletion equals the
    shorter).

    Scale shape: each row emits its DISTINCT deletion keys (vectorized —
    one polars slice-concat per deletion position, deduped per row before
    the shuffle: ~len(s) short strings/row), ONE groupby on ``hash(key) %
    num_buckets`` (NOT the raw key — per-key map_groups means one Python
    call per distinct deletion key, measured ~15s at 150k keys), a
    per-bucket run gap-scan generating candidate pairs vectorized, the
    LINEAR :func:`ed1_check` verify (no DP — results agree with
    levenshtein wherever ed <= 1, which is all the op emits), then a
    (id_a, id_b) Min groupby dedupes pairs found via multiple shared
    keys.  Oversize key runs truncate in min-id order and are LOGGED,
    never silent.
    """
    import polars as pl

    from ray.data.aggregate import Min as MinAgg

    def emit_keys(batch: pa.Table) -> pa.Table:
        df = pl.DataFrame({
            "id": pl.from_arrow(batch.column(id_column)
                                if not isinstance(batch.column(id_column),
                                                  pa.ChunkedArray)
                                else batch.column(id_column).combine_chunks()),
            "s": pl.from_arrow(batch.column(column)
                               if not isinstance(batch.column(column),
                                                 pa.ChunkedArray)
                               else batch.column(column).combine_chunks())
            .fill_null("")})
        max_len = int(df.get_column("s").str.len_chars().max() or 0)
        frames = [df.with_columns(pl.col("s").alias("key"))]
        for d in range(max_len):
            frames.append(df.filter(
                pl.col("s").str.len_chars() > d).with_columns(
                (pl.col("s").str.slice(0, d)
                 + pl.col("s").str.slice(d + 1)).alias("key")))
        allk = pl.concat(frames).unique(subset=["id", "key"])
        out = allk.to_arrow()
        key_col = out.column("key").cast(pa.string())
        h = (hash64(key_col, seed=43)
             % np.uint64(num_buckets)).astype(np.int64)
        return pa.table({
            "key": key_col,
            "id": out.column("id"),
            "val": out.column("s").cast(pa.string()),
            "__fbkt__": pa.array(h)})

    keyed = ds.select_columns([id_column, column]).map_batches(
        emit_keys, batch_format="pyarrow")

    def verify(group: pa.Table) -> pa.Table:
        id_type = group.column("id").type
        empty = pa.table({"id_a": pa.array([], type=id_type),
                          "id_b": pa.array([], type=id_type),
                          "dist": pa.array([], type=pa.int32())})
        if group.num_rows < 2:
            return empty
        group = group.sort_by([("key", "ascending"), ("id", "ascending")])
        keys = group.column("key").to_numpy(zero_copy_only=False)
        m = len(keys)
        posn = _run_positions_local(keys)
        if int(posn.max(initial=0)) >= max_bucket:
            over = int((posn >= max_bucket).sum())
            logger.warning(
                "fuzzy_join_ed1: key runs truncated to max_bucket=%d "
                "(dropping %d rows, min-id order kept)", max_bucket, over)
            group = group.filter(pa.array(posn < max_bucket))
            keys = group.column("key").to_numpy(zero_copy_only=False)
            m = len(keys)
        ids = group.column("id").to_numpy(zero_copy_only=False)
        vals = group.column("val").to_pylist()
        lens = np.fromiter((len(v) for v in vals), dtype=np.int64,
                           count=m)
        a_out, b_out, d_out = [], [], []
        emitted = 0
        gap = 1
        while gap < m:
            same = keys[gap:] == keys[:-gap]
            if not same.any():
                break
            cand = same & (ids[gap:] != ids[:-gap])                 & (np.abs(lens[gap:] - lens[:-gap]) <= 1)
            for i in np.flatnonzero(cand):
                d = ed1_check(vals[i], vals[i + gap])
                if d is not None:
                    lo, hi = sorted((ids[i], ids[i + gap]))
                    a_out.append(lo)
                    b_out.append(hi)
                    d_out.append(d)
                    emitted += 1
                    if emitted > closure_cap:
                        raise ValueError(
                            "fuzzy_join_ed1: pair closure exceeded "
                            f"closure_cap={closure_cap} in one bucket")
            gap += 1
        if not a_out:
            return empty
        return pa.table({"id_a": pa.array(a_out, type=id_type),
                         "id_b": pa.array(b_out, type=id_type),
                         "dist": pa.array(d_out, type=pa.int32())})

    pairs = keyed.groupby("__fbkt__",
                          num_partitions=num_partitions).map_groups(
        verify, batch_format="pyarrow")
    return pairs.groupby(["id_a", "id_b"]).aggregate(
        MinAgg("dist", alias_name="dist"))


# ---------------------------------------------------------------------------
# prefix-filtered exact-recall jaccard candidates (PPJoin-style)
# ---------------------------------------------------------------------------



def _pair_dedup(pairs: Dataset, num_buckets: int,
                num_partitions: int | None) -> Dataset:
    """Distinct (id_a, id_b) via ONE bucketed exchange + a per-bucket
    sort/run-mask — NOT groupby(pair).map_groups, which invokes Python
    once per distinct pair (measured ~10s at 10^5 pairs)."""
    B = np.uint64(num_buckets)

    def bucketize(batch: pa.Table) -> pa.Table:
        h = hash64(batch.column("id_a"), seed=37) % B
        return batch.append_column(
            "__pbkt__", pa.array(h.astype(np.int64)))

    def distinct(g: pa.Table) -> pa.Table:
        g = g.sort_by([("id_a", "ascending"), ("id_b", "ascending")])
        a = g.column("id_a").to_numpy(zero_copy_only=False)
        b = g.column("id_b").to_numpy(zero_copy_only=False)
        first = np.ones(len(a), dtype=bool)
        first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        return g.filter(pa.array(first)).select(["id_a", "id_b"])

    return (pairs.map_batches(bucketize, batch_format="pyarrow")
            .groupby("__pbkt__", num_partitions=num_partitions)
            .map_groups(distinct, batch_format="pyarrow"))


def _distinct_gram_hashes(texts: "list[str]", k: int):
    """Per-doc DISTINCT word-k-gram 64-bit hashes for a batch: returns
    (g, doc_idx, set_size_per_doc) where ``g`` is uint64 and ``doc_idx``
    maps each gram to its batch row.  Same gram contract as
    ``_word_shingles`` (short docs emit their joined words; empty docs one
    "" gram), same polars hash seed (7) as the MinHasher stream."""
    import polars as pl

    n = len(texts)
    if n == 0:
        return (np.empty(0, np.uint64), np.empty(0, np.int64),
                np.empty(0, np.int64))
    s = pl.Series("t", texts, dtype=pl.Utf8).fill_null("")
    words = s.str.extract_all(_WORD_RE.pattern)
    wc = words.list.len().to_numpy().astype(np.int64)
    long_mask = wc >= k
    parts = []
    if long_mask.any():
        lf = (pl.DataFrame({"w": words})
              .lazy().with_row_index("doc")
              .explode("w", empty_as_null=True))
        cols = [pl.col("w")] + [pl.col("w").shift(-i).over("doc")
                                for i in range(1, k)]
        sh = (lf.select(pl.col("doc"),
                        pl.concat_str(cols, separator=" ").alias("s"))
              .drop_nulls().collect())
        parts.append(pl.DataFrame({
            "doc": sh.get_column("doc").cast(pl.Int64),
            "g": sh.get_column("s").hash(seed=7)}))
    if (~long_mask).any():
        short_idx = np.flatnonzero(~long_mask)
        short = words.list.join(" ")
        h_short = short.hash(seed=7).to_numpy().astype(np.uint64)
        parts.append(pl.DataFrame({
            "doc": pl.Series(short_idx, dtype=pl.Int64),
            "g": pl.Series(h_short[short_idx], dtype=pl.UInt64)}))
    df = pl.concat(parts).unique().sort(["doc", "g"])
    doc_idx = df.get_column("doc").to_numpy().astype(np.int64)
    g = df.get_column("g").to_numpy().astype(np.uint64)
    sizes = np.zeros(n, dtype=np.int64)
    u, c = np.unique(doc_idx, return_counts=True)
    sizes[u] = c
    return g, doc_idx, sizes


def prefix_jaccard_candidates(ds: Dataset, text_column: str, id_column: str,
                              threshold: float, k: int = 3,
                              num_buckets: int = 64,
                              num_partitions: int | None = None,
                              max_gram_docs: int = 8192,
                              fail_on_truncation: bool = True) -> Dataset:
    """Candidate pairs with EXACT recall for word-k-gram Jaccard >=
    ``threshold`` — the deterministic-complete alternative to MinHash LSH
    (whose recall is probabilistic).  PPJoin-style prefix filtering (Xiao
    et al. 2008 / Chaudhuri et al. 2006): order every doc's distinct
    grams by the GLOBAL (document-frequency, gram) order — rarest first —
    and keep only the first ``|A| - ceil(t*|A|) + 1`` grams; any pair
    with J >= t shares >= ceil(t*max(|A|,|B|)) grams, so BOTH prefixes
    must contain a common gram, and pairing docs within each prefix
    gram's posting list (with the ``|B| >= t*|A|`` length filter) loses
    nothing.  Returns distinct ``(id_a, id_b)`` with id_a < id_b — feed
    to an exact verifier (ngram_jaccard) for the final cut; precision is
    NOT 1, recall is (up to 64-bit gram-hash collisions, the same
    contract as the minhash exactness mode).

    Shuffle shape — four bucketed exchanges, all carrying (gram, doc, n)
    triples, never the text: (1) df attach: bucket on gram, per-bucket
    run lengths; (2) prefix cut: bucket on doc, per-doc sort by (df,
    gram) + run-position mask; (3) pairing: bucket on gram over PREFIX
    rows only, per-run shifted-gap scan with the length filter (a gram
    whose posting list exceeds ``max_gram_docs`` raises when
    ``fail_on_truncation`` — exactness runs fail loudly); (4) pair
    dedup.  The df ordering concentrates prefixes on RARE grams, which
    is what keeps posting lists short at corpus scale."""
    import math

    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if num_partitions is None:
        num_partitions = min(num_buckets, 64)
    B = np.uint64(num_buckets)

    def gram_stream(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_column).to_pylist()
        g, doc_idx, sizes = _distinct_gram_hashes(texts, k)
        ids = batch.column(id_column).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({
            "g": pa.array(g.view(np.int64)),
            "doc": pa.array(ids[doc_idx]),
            "n": pa.array(sizes[doc_idx]),
            "bkt": pa.array((g % B).astype(np.int64))})

    def attach_df(grp: pa.Table) -> pa.Table:
        grp = grp.sort_by([("g", "ascending")])
        g = grp.column("g").to_numpy(zero_copy_only=False)
        new = np.ones(len(g), dtype=bool)
        new[1:] = g[1:] != g[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(g)))
        df = np.repeat(lens, lens)
        from ..state.sketches import hash64
        h = hash64(grp.column("doc"), seed=31) % B
        return pa.table({
            "g": grp.column("g"), "doc": grp.column("doc"),
            "n": grp.column("n"),
            "df": pa.array(df.astype(np.int64)),
            "bkt": pa.array(h.astype(np.int64))})

    def prefix_cut(grp: pa.Table) -> pa.Table:
        grp = grp.sort_by([("doc", "ascending"), ("df", "ascending"),
                           ("g", "ascending")])
        doc = grp.column("doc").to_numpy(zero_copy_only=False)
        n = grp.column("n").to_numpy(zero_copy_only=False)
        pos = _run_positions_local(doc)
        # floor, not ceil: floor(float(t*n)) <= ceil(exact t*n) regardless
        # of the literal's rounding direction, so the prefix can only be
        # LONGER than the theorem needs — completeness survives
        # non-representable thresholds at the cost of <= 1 extra gram/doc
        p = n - np.floor(threshold * n).astype(np.int64) + 1
        keep = pos < p
        out = grp.filter(pa.array(keep))
        g = out.column("g").to_numpy(zero_copy_only=False)
        return pa.table({
            "g": out.column("g"), "doc": out.column("doc"),
            "n": out.column("n"),
            "pos": pa.array(pos[keep]),
            "bkt": pa.array((g.view(np.uint64) % B).astype(np.int64))})

    def pair_up(grp: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                          "id_b": pa.array([], type=pa.int64())})
        if grp.num_rows == 0:
            return empty
        grp = grp.sort_by([("g", "ascending"), ("n", "ascending"),
                           ("doc", "ascending")])
        g = grp.column("g").to_numpy(zero_copy_only=False)
        n = grp.column("n").to_numpy(zero_copy_only=False)
        doc = grp.column("doc").to_numpy(zero_copy_only=False)
        pos = grp.column("pos").to_numpy(zero_copy_only=False)
        new = np.ones(len(g), dtype=bool)
        new[1:] = g[1:] != g[:-1]
        lens = np.diff(np.append(np.flatnonzero(new), len(g)))
        if lens.max(initial=0) > max_gram_docs:
            msg = (f"prefix_jaccard_candidates: a prefix gram's posting "
                   f"list has {int(lens.max())} docs > max_gram_docs="
                   f"{max_gram_docs}")
            if fail_on_truncation:
                raise ValueError(msg + " — raise max_gram_docs")
            logger.warning("%s; pairs beyond the cap are dropped", msg)
        parts_a, parts_b = [], []
        gap = 1
        m = len(g)
        while gap < min(m, max_gram_docs):
            same = g[gap:] == g[:-gap]
            # length filter: n ascending within a run, so the pair
            # (i, i+gap) can reach J >= t only when n_i >= t * n_{i+gap}
            ok = same & (n[:-gap] >= threshold * n[gap:])
            if not same.any():
                break
            if ok.any():
                # PPJoin positional filter (Xiao et al. 2008): a true
                # pair's FIRST shared gram (positions pA, pB in each
                # doc's global gram order) bounds the overlap by
                # 1 + min(nA-1-pA, nB-1-pB); require that bound to reach
                # alpha = floor(t/(1+t) * (nA+nB)) (floor: always <= the
                # exact ceil requirement, so completeness survives float
                # rounding).  Instance-wise filtering keeps the pair iff
                # ANY generating instance passes — the first-shared-gram
                # instance of a true pair always does.
                na, nb = n[:-gap][ok], n[gap:][ok]
                pa_, pb_ = pos[:-gap][ok], pos[gap:][ok]
                alpha = np.floor(threshold / (1.0 + threshold)
                                 * (na + nb)).astype(np.int64)
                ub = 1 + np.minimum(na - 1 - pa_, nb - 1 - pb_)
                keep2 = ub >= alpha
                if keep2.any():
                    a = doc[:-gap][ok][keep2]
                    b = doc[gap:][ok][keep2]
                    parts_a.append(np.minimum(a, b))
                    parts_b.append(np.maximum(a, b))
            gap += 1
        if not parts_a:
            return empty
        t = pa.table({"id_a": pa.array(np.concatenate(parts_a)),
                      "id_b": pa.array(np.concatenate(parts_b))})
        # local pre-dedup before the pair exchange
        return t.group_by(["id_a", "id_b"], use_threads=False).aggregate([])

    pairs = (ds.select_columns([id_column, text_column])
             .map_batches(gram_stream, batch_format="pyarrow")
             .groupby("bkt", num_partitions=num_partitions)
             .map_groups(attach_df, batch_format="pyarrow")
             .groupby("bkt", num_partitions=num_partitions)
             .map_groups(prefix_cut, batch_format="pyarrow")
             .groupby("bkt", num_partitions=num_partitions)
             .map_groups(pair_up, batch_format="pyarrow"))
    return _pair_dedup(pairs, num_buckets, num_partitions)


def _run_positions_local(keys: np.ndarray) -> np.ndarray:
    """Position of each element within its run of equal consecutive keys
    (the analytics._run_positions shape, local to avoid a cross-module
    import at worker-deserialize time)."""
    n = len(keys)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    new = np.ones(n, dtype=bool)
    new[1:] = keys[1:] != keys[:-1]
    starts = np.flatnonzero(new)
    run_id = np.cumsum(new) - 1
    return np.arange(n, dtype=np.int64) - starts[run_id]


def containment_candidates(ds: Dataset, text_column: str, id_column: str,
                           threshold: float, k: int = 3,
                           num_buckets: int = 64,
                           num_partitions: int | None = None,
                           max_gram_docs: int = 8192,
                           fail_on_truncation: bool = True) -> Dataset:
    """Candidate pairs with EXACT recall for word-k-gram CONTAINMENT
    ``|A ∩ B| / min(|A|, |B|) >= threshold`` — the partial-duplicate /
    quote-detection relation that Jaccard misses (a doc fully embedded in
    a 10x-longer doc has high containment but tiny Jaccard, so no
    Jaccard-calibrated LSH banding finds it reliably).

    Asymmetric prefix filtering: containment bounds the intersection only
    against the SMALLER set (``I >= ceil(t * min)``), so the smaller doc
    keeps a df-ordered prefix of ``n - ceil(t*n) + 1`` grams (probe side)
    while every doc also posts ALL its grams (index side); a qualifying
    pair must share a probe-prefix gram with the other doc's full posting
    list.  The full index postings are the inherent price of exact
    containment recall — there is no length filter (any size ratio can
    qualify), which is why the op caps a gram's posting list with a
    fail-loud ``max_gram_docs`` like the exactness LSH mode.  Returns
    distinct ``(id_a, id_b)``, id_a < id_b; verify with an exact
    containment scorer.  Same exchanges as
    :func:`prefix_jaccard_candidates` (df attach -> prefix cut ->
    gram-keyed pairing -> pair dedup), with the index side riding the
    pairing exchange untagged-by-df."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if num_partitions is None:
        num_partitions = min(num_buckets, 64)
    B = np.uint64(num_buckets)

    def gram_stream(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_column).to_pylist()
        g, doc_idx, sizes = _distinct_gram_hashes(texts, k)
        ids = batch.column(id_column).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({
            "g": pa.array(g.view(np.int64)),
            "doc": pa.array(ids[doc_idx]),
            "n": pa.array(sizes[doc_idx]),
            "bkt": pa.array((g % B).astype(np.int64))})

    def attach_df(grp: pa.Table) -> pa.Table:
        grp = grp.sort_by([("g", "ascending")])
        g = grp.column("g").to_numpy(zero_copy_only=False)
        new = np.ones(len(g), dtype=bool)
        new[1:] = g[1:] != g[:-1]
        lens = np.diff(np.append(np.flatnonzero(new), len(g)))
        df = np.repeat(lens, lens)
        from ..state.sketches import hash64
        h = hash64(grp.column("doc"), seed=31) % B
        return pa.table({
            "g": grp.column("g"), "doc": grp.column("doc"),
            "n": grp.column("n"),
            "df": pa.array(df.astype(np.int64)),
            "bkt": pa.array(h.astype(np.int64))})

    def tag_sides(grp: pa.Table) -> pa.Table:
        """Per doc: ALL grams as index rows (side 1) + the df-ordered
        prefix as probe rows (side 0)."""
        grp = grp.sort_by([("doc", "ascending"), ("df", "ascending"),
                           ("g", "ascending")])
        doc = grp.column("doc").to_numpy(zero_copy_only=False)
        n = grp.column("n").to_numpy(zero_copy_only=False)
        pos = _run_positions_local(doc)
        # floor for boundary safety — see prefix_jaccard_candidates
        p = n - np.floor(threshold * n).astype(np.int64) + 1
        pmask = pos < p
        probe = grp.filter(pa.array(pmask))
        gp = probe.column("g").to_numpy(zero_copy_only=False)
        gi = grp.column("g").to_numpy(zero_copy_only=False)
        side = np.concatenate([np.zeros(probe.num_rows, dtype=np.int8),
                               np.ones(grp.num_rows, dtype=np.int8)])
        return pa.table({
            "g": pa.array(np.concatenate([gp, gi])),
            "doc": pa.array(np.concatenate(
                [probe.column("doc").to_numpy(zero_copy_only=False),
                 doc])),
            "n": pa.array(np.concatenate(
                [probe.column("n").to_numpy(zero_copy_only=False), n])),
            "pos": pa.array(np.concatenate([pos[pmask], pos])),
            "side": pa.array(side),
            "bkt": pa.array((np.concatenate([gp, gi]).view(np.uint64)
                             % B).astype(np.int64))})

    def pair_up(grp: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                          "id_b": pa.array([], type=pa.int64())})
        if grp.num_rows == 0:
            return empty
        grp = grp.sort_by([("g", "ascending"), ("doc", "ascending"),
                           ("side", "ascending")])
        g = grp.column("g").to_numpy(zero_copy_only=False)
        doc = grp.column("doc").to_numpy(zero_copy_only=False)
        side = grp.column("side").to_numpy(zero_copy_only=False)
        n = grp.column("n").to_numpy(zero_copy_only=False)
        pos = grp.column("pos").to_numpy(zero_copy_only=False)
        new = np.ones(len(g), dtype=bool)
        new[1:] = g[1:] != g[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(g)))
        if lens.max(initial=0) > 2 * max_gram_docs:
            msg = (f"containment_candidates: a gram's posting list has "
                   f"{int(lens.max())} rows > 2*max_gram_docs="
                   f"{2 * max_gram_docs}")
            if fail_on_truncation:
                raise ValueError(msg + " — raise max_gram_docs")
            logger.warning("%s; pairs beyond the cap are dropped", msg)
        parts_a, parts_b = [], []
        gap = 1
        m = len(g)
        # probe x index pairs within each gram run: the shifted-gap scan
        # over the (doc, side)-sorted run pairs every two DISTINCT docs
        # where at least one side is a probe row
        while gap < min(m, 2 * max_gram_docs):
            same = g[gap:] == g[:-gap]
            if not same.any():
                break
            ok = same & (doc[gap:] != doc[:-gap]) \
                & ((side[:-gap] == 0) | (side[gap:] == 0))
            if ok.any():
                # positional filter (see prefix_jaccard_candidates): the
                # first shared gram bounds I by 1 + min(remaining grams
                # on each side); require it to reach floor(t * min(n))
                na, nb = n[:-gap][ok], n[gap:][ok]
                pa_, pb_ = pos[:-gap][ok], pos[gap:][ok]
                alpha = np.floor(threshold
                                 * np.minimum(na, nb)).astype(np.int64)
                ub = 1 + np.minimum(na - 1 - pa_, nb - 1 - pb_)
                keep2 = ub >= alpha
                if keep2.any():
                    a = doc[:-gap][ok][keep2]
                    b = doc[gap:][ok][keep2]
                    parts_a.append(np.minimum(a, b))
                    parts_b.append(np.maximum(a, b))
            gap += 1
        if not parts_a:
            return empty
        t = pa.table({"id_a": pa.array(np.concatenate(parts_a)),
                      "id_b": pa.array(np.concatenate(parts_b))})
        # local pre-dedup before the pair exchange
        return t.group_by(["id_a", "id_b"], use_threads=False).aggregate([])

    pairs = (ds.select_columns([id_column, text_column])
             .map_batches(gram_stream, batch_format="pyarrow")
             .groupby("bkt", num_partitions=num_partitions)
             .map_groups(attach_df, batch_format="pyarrow")
             .groupby("bkt", num_partitions=num_partitions)
             .map_groups(tag_sides, batch_format="pyarrow")
             .groupby("bkt", num_partitions=num_partitions)
             .map_groups(pair_up, batch_format="pyarrow"))
    return _pair_dedup(pairs, num_buckets, num_partitions)


def ngram_containment(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact word-shingle containment |A∩B| / min(|A|,|B|) (the verifier
    for containment_candidates)."""
    sa, sb = set(_word_shingles(text_a, k)), set(_word_shingles(text_b, k))
    if not sa and not sb:
        return 1.0
    m = min(len(sa), len(sb))
    return len(sa & sb) / m if m else 0.0
