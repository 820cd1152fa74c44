"""Similarity search over embedding columns: brute-force cosine top-k and an
IVF (inverted-file) variant as the scale path.

Design (north-rule "similarity search" component):
  - brute force: the query matrix is broadcast ONCE (``ray.put`` -> actor
    constructor arg), each batch does one numpy matmul and emits only its
    LOCAL top-k rows per query (k x n_queries rows per batch, not n_rows),
    then a tiny groupby-per-query keeps the global top-k.  Driver never sees
    row data beyond the final k x q result.
  - IVF: centroids are learned driver-side from a seeded sample (numpy
    k-means, a few iterations), broadcast to actors; each batch assigns rows
    to centroids and only rows in the probed cells are scored.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

__all__ = ["TopKScorer", "topk_cosine", "train_centroids", "ivf_topk",
           "kmeans_fit", "normalize_embeddings", "quantize_embeddings_int8",
           "pca_fit", "pca_project", "ann_join"]


def _unit_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _emb_matrix(batch: pa.Table, emb_column: str) -> np.ndarray:
    col = batch.column(emb_column)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # zero-copy flatten for fixed-length float lists
    values = np.asarray(col.values, dtype=np.float64)
    n = len(col)
    return values.reshape(n, -1)


class TopKScorer:
    """Actor: broadcast query matrix held once; per-batch matmul + local top-k."""

    def __init__(self, queries_ref: Any, emb_column: str, id_column: str, k: int):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.queries = _unit_rows(np.asarray(q, dtype=np.float64))
        self.emb_column = emb_column
        self.id_column = id_column
        self.k = k

    def _empty(self, batch: pa.Table) -> pa.Table:
        return pa.table({"query_id": pa.array([], type=pa.int32()),
                         self.id_column: pa.array(
                             [], type=batch.schema.field(self.id_column).type),
                         "score": pa.array([], type=pa.float64())})

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return self._empty(batch)
        emb = _unit_rows(_emb_matrix(batch, self.emb_column))
        sims = emb @ self.queries.T              # (n, q)
        ids = batch.column(self.id_column)
        n, q = sims.shape
        k = min(self.k, n)
        # local top-k per query (argpartition: O(n) per query)
        top = np.argpartition(-sims, kth=k - 1, axis=0)[:k, :]   # (k, q)
        out_q, out_id, out_s = [], [], []
        for qi in range(q):
            idx = top[:, qi]
            out_q.extend([qi] * k)
            out_id.extend(ids.take(pa.array(idx)).to_pylist())
            out_s.extend(sims[idx, qi].tolist())
        return pa.table({"query_id": pa.array(out_q, type=pa.int32()),
                         self.id_column: out_id,
                         "score": pa.array(out_s, type=pa.float64())})


def _global_topk(local: Dataset, id_column: str, k: int,
                 score_col: str = "score",
                 descending: bool = True) -> Dataset:
    """Merge per-batch local top-k rows into the global top-k per query:
    bucketed exchange on hash(query_id) (one vectorized pass per bucket,
    not one Python call per query), ONE Arrow sort (query, score, id),
    run-position cut."""
    from .analytics import _run_positions, bucketed_groups
    direction = "descending" if descending else "ascending"

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.sort_by([("query_id", "ascending"), (score_col, direction),
                       (id_column, "ascending")])
        pos = _run_positions(
            g.column("query_id").to_numpy(zero_copy_only=False))
        return g.filter(pa.array(pos < k))

    return bucketed_groups(local, "query_id", per_bucket, seed=17)


def topk_cosine(ds: Dataset, queries: np.ndarray, emb_column: str,
                id_column: str, k: int = 10, concurrency=None) -> Dataset:
    """Exact top-k cosine neighbors of each query row (ties broken by id)."""
    queries_ref = ray.put(np.asarray(queries, dtype=np.float64))
    from . import cached_stage, concurrency_kwargs
    local = ds.map_batches(
        cached_stage(TopKScorer, queries_ref=queries_ref, emb_column=emb_column,
                     id_column=id_column, k=k),
        batch_format="pyarrow", **concurrency_kwargs(concurrency))
    return _global_topk(local, id_column, k)


def train_centroids(sample: np.ndarray, n_centroids: int, iters: int = 10,
                    seed: int = 42) -> np.ndarray:
    """Seeded mini k-means on a driver-side sample (the IVF codebook)."""
    rng = np.random.default_rng(seed)
    sample = _unit_rows(np.asarray(sample, dtype=np.float64))
    idx = rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)
    centroids = sample[idx].copy()
    for _ in range(iters):
        sims = sample @ centroids.T
        assign = sims.argmax(axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _unit_rows(centroids)
    return centroids


class IVFScorer:
    """IVF probe: score only rows whose nearest centroid is in the probe set."""

    def __init__(self, queries_ref, centroids_ref, emb_column: str,
                 id_column: str, k: int, n_probe: int):
        get = lambda r: ray.get(r) if isinstance(r, ray.ObjectRef) else r
        self.queries = _unit_rows(np.asarray(get(queries_ref), dtype=np.float64))
        self.centroids = np.asarray(get(centroids_ref), dtype=np.float64)
        self.k = k
        self.emb_column = emb_column
        self.id_column = id_column
        # probe cells per query: the n_probe nearest centroids
        qsims = self.queries @ self.centroids.T
        order = np.argsort(-qsims, axis=1)[:, :n_probe]
        self.probe_cells = [set(row.tolist()) for row in order]
        self.all_cells = set().union(*self.probe_cells) if len(order) else set()

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"query_id": pa.array([], type=pa.int32()),
                             self.id_column: pa.array(
                                 [], type=batch.schema.field(self.id_column).type),
                             "score": pa.array([], type=pa.float64())})
        emb = _unit_rows(_emb_matrix(batch, self.emb_column))
        assign = (emb @ self.centroids.T).argmax(axis=1)
        keep = np.isin(assign, list(self.all_cells))
        out_q, out_id, out_s = [], [], []
        ids = batch.column(self.id_column)
        if keep.any():
            sub = emb[keep]
            sub_ids = ids.filter(pa.array(keep))
            sub_assign = assign[keep]
            sims = sub @ self.queries.T
            for qi, cells in enumerate(self.probe_cells):
                in_cell = np.isin(sub_assign, list(cells))
                if not in_cell.any():
                    continue
                scores = sims[in_cell, qi]
                cand_ids = sub_ids.filter(pa.array(in_cell)).to_pylist()
                k = min(self.k, len(scores))
                top = np.argpartition(-scores, kth=k - 1)[:k]
                out_q.extend([qi] * k)
                out_id.extend([cand_ids[t] for t in top])
                out_s.extend(scores[top].tolist())
        return pa.table({"query_id": pa.array(out_q, type=pa.int32()),
                         self.id_column: out_id,
                         "score": pa.array(out_s, type=pa.float64())})


def ivf_topk(ds: Dataset, queries: np.ndarray, emb_column: str, id_column: str,
             k: int = 10, n_centroids: int = 16, n_probe: int = 4,
             sample_size: int = 2048, seed: int = 42,
             centroids: Optional[np.ndarray] = None,
             concurrency=None) -> Dataset:
    """Approximate top-k via IVF: train codebook on a SEEDED RANDOM sample
    (``ds.random_sample`` — a limit() sample would take the first rows in
    storage order, which is biased/skewed for ordered inputs), probe the
    ``n_probe`` nearest cells per query.  Pass ``centroids`` to reuse a
    precomputed codebook (e.g. the full-corpus ``kmeans_fit``)."""
    if centroids is None:
        n_total = ds.count()  # parquet metadata fast path — no full scan
        frac = 1.0 if n_total <= sample_size else min(
            1.0, (sample_size * 1.25) / n_total)
        sample_rows = (ds.random_sample(frac, seed=seed)
                       .limit(sample_size).take_all())
        sample = np.asarray([r[emb_column] for r in sample_rows],
                            dtype=np.float64)
        centroids = train_centroids(sample, n_centroids)
    queries_ref = ray.put(np.asarray(queries, dtype=np.float64))
    centroids_ref = ray.put(centroids)
    from . import cached_stage, concurrency_kwargs
    local = ds.map_batches(
        cached_stage(IVFScorer, queries_ref=queries_ref,
                     centroids_ref=centroids_ref, emb_column=emb_column,
                     id_column=id_column, k=k, n_probe=n_probe),
        batch_format="pyarrow", **concurrency_kwargs(concurrency))
    return _global_topk(local, id_column, k)


def kmeans_fit(ds: Dataset, emb_column: str, n_centroids: int,
               iters: int = 3, seed: int = 42, sample_size: int = 2048,
               concurrency=None) -> np.ndarray:
    """Distributed spherical k-means (Lloyd's) over the FULL corpus — the
    IVF codebook scale path beyond the driver-side sampled `train_centroids`.

    Init from the seeded-sample codebook, then each iteration is ONE
    streaming pass: every batch assigns its rows (matmul against broadcast
    centroids) and emits k partial rows of (cid, count, vector sum) — k x d
    floats per batch to the driver, no shuffle, payload never moves.  The
    driver merges partials (commutative sums, so reduction order cannot
    change the result meaningfully) and recomputes unit-normalized
    centroids; empty cells keep their previous centroid."""
    from . import cached_stage, concurrency_kwargs

    n_total = ds.count()
    frac = 1.0 if n_total <= sample_size else min(
        1.0, (sample_size * 1.25) / n_total)
    sample_rows = (ds.random_sample(frac, seed=seed)
                   .limit(sample_size).take_all())
    sample = np.asarray([r[emb_column] for r in sample_rows],
                        dtype=np.float64)
    centroids = train_centroids(sample, n_centroids, seed=seed)
    k, d = centroids.shape

    class _Partials:
        def __init__(self, cref):
            self.centroids = (ray.get(cref)
                              if isinstance(cref, ray.ObjectRef) else cref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({"cid": pa.array([], type=pa.int32()),
                                 "cnt": pa.array([], type=pa.int64()),
                                 "vsum": pa.array([], type=pa.list_(
                                     pa.float64()))})
            emb = _unit_rows(_emb_matrix(batch, emb_column))
            assign = (emb @ self.centroids.T).argmax(axis=1)
            cnt = np.bincount(assign, minlength=k).astype(np.int64)
            sums = np.zeros((k, d), dtype=np.float64)
            np.add.at(sums, assign, emb)
            return pa.table({"cid": pa.array(np.arange(k, dtype=np.int32)),
                             "cnt": pa.array(cnt),
                             "vsum": pa.array(list(sums))})

    for _ in range(iters):
        cref = ray.put(centroids)
        parts = ds.map_batches(
            cached_stage(_Partials, cref=cref), batch_format="pyarrow",
            **concurrency_kwargs(concurrency))
        tot_cnt = np.zeros(k, dtype=np.int64)
        tot_sum = np.zeros((k, d), dtype=np.float64)
        for b in parts.iter_batches(batch_format="pyarrow"):
            t = pa.table(b)
            cids = t.column("cid").to_numpy(zero_copy_only=False)
            tot_cnt[cids] += t.column("cnt").to_numpy(zero_copy_only=False)
            vs = np.asarray(t.column("vsum").combine_chunks().values,
                            dtype=np.float64).reshape(len(cids), d)
            np.add.at(tot_sum, cids, vs)
        nonempty = tot_cnt > 0
        centroids = centroids.copy()
        centroids[nonempty] = tot_sum[nonempty] / tot_cnt[nonempty, None]
        centroids = _unit_rows(centroids)
    return centroids


def _list_from_matrix(mat: np.ndarray, value_type) -> pa.ListArray:
    """Rebuild a list<value_type> column from a (n, d) matrix."""
    n, d = mat.shape
    values = pa.array(mat.reshape(-1), type=value_type)
    offsets = pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32),
                       type=pa.int32())
    return pa.ListArray.from_arrays(offsets, values)


class _Normalizer:
    """Per-batch L2 normalization of an embedding column (zero vectors
    pass through unchanged)."""

    def __init__(self, emb_column: str, out_column: str):
        self.emb_column = emb_column
        self.out_column = out_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(
                self.out_column, batch.column(self.emb_column)) \
                if self.out_column not in batch.column_names else batch
        mat = _unit_rows(_emb_matrix(batch, self.emb_column))
        arr = _list_from_matrix(mat.astype(np.float32), pa.float32())
        if self.out_column == self.emb_column:
            i = batch.schema.get_field_index(self.emb_column)
            return batch.set_column(i, self.emb_column, arr)
        return batch.append_column(self.out_column, arr)


def normalize_embeddings(ds: Dataset, emb_column: str,
                         out_column: str | None = None,
                         concurrency=None) -> Dataset:
    """Unit-normalize an embedding column (float32 output) — the
    precompute that turns every downstream cosine into a dot product.
    Shuffle-free, one matrix pass per batch."""
    from . import cached_stage, concurrency_kwargs
    return ds.map_batches(
        cached_stage(_Normalizer, emb_column=emb_column,
                     out_column=out_column or emb_column),
        batch_format="pyarrow", **concurrency_kwargs(concurrency))


class _Int8Quantizer:
    """Per-batch symmetric int8 quantization, flattened output rows.

    scale = max(|x|) / 127 per vector (ONE IEEE division);
    q = floor(x / scale + 0.5) — explicit floor(+0.5) instead of rint so a
    SQL oracle reproduces every value bit-for-bit (rint rounds half to
    even; SQL ROUND rounds half away; floor(+0.5) is identical on both
    sides). Zero vectors quantize to all-zero with scale 0."""

    def __init__(self, emb_column: str, id_column: str):
        self.emb_column = emb_column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _emb_matrix(batch, self.emb_column)   # float64 (n, d)
        n, d = mat.shape
        maxabs = np.abs(mat).max(axis=1)
        scale = maxabs / 127.0
        safe = np.where(scale == 0.0, 1.0, scale)
        q = np.floor(mat / safe[:, None] + 0.5).astype(np.int8)
        ids = batch.column(self.id_column)
        take = pa.array(np.repeat(np.arange(n, dtype=np.int64), d))
        import pyarrow.compute as pc
        return pa.table({
            self.id_column: pc.take(ids, take),
            "pos": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), n)),
            "q": pa.array(q.reshape(-1)),
            "scale": pa.array(np.repeat(scale, d), type=pa.float64())})


def quantize_embeddings_int8(ds: Dataset, emb_column: str, id_column: str,
                             concurrency=None) -> Dataset:
    """Symmetric per-vector int8 quantization (the 4x memory cut for the
    ANN scale path): emits flattened (id, pos 1-based, q int8, scale)
    rows. Dequantization is ``q * scale``; max per-element error is
    scale/2. Shuffle-free."""
    from . import cached_stage, concurrency_kwargs
    return ds.map_batches(
        cached_stage(_Int8Quantizer, emb_column=emb_column,
                     id_column=id_column),
        batch_format="pyarrow", **concurrency_kwargs(concurrency))


# --------------------------------------------------------------------------
# product quantization (PQ) — the sub-byte ANN compression path
# --------------------------------------------------------------------------


def smallest_hash_sample(ds: Dataset, emb_column: str, id_column: str,
                         sample_size: int, hash_seed: int = 5) -> np.ndarray:
    """The ``sample_size`` embedding rows with the globally SMALLEST
    ``hash(id)`` — map-side partial top-k per batch + a streaming driver
    merge (O(sample_size) driver memory).  Block-order / partitioning /
    cluster-size independent, so every codebook trained on it is rerun-
    and resume-stable (the dedup.semantic_codebook sampling contract,
    factored here for reuse)."""
    from ..state.sketches import hash64

    def partial_sample(batch: pa.Table) -> pa.Table:
        t = pa.table({"h": pa.array(
            hash64(batch.column(id_column), seed=hash_seed).view(np.int64)),
            "id": batch.column(id_column),
            "emb": batch.column(emb_column)})
        if t.num_rows > sample_size:
            t = t.sort_by([("h", "ascending"), ("id", "ascending")])
            t = t.slice(0, sample_size)
        return t

    merged: "pa.Table | None" = None
    for b in ds.map_batches(partial_sample,
                            batch_format="pyarrow").iter_batches(
                                batch_format="pyarrow"):
        t = pa.table(b)
        if t.num_rows == 0:
            continue
        merged = t if merged is None else pa.concat_tables([merged, t])
        if merged.num_rows > sample_size:
            merged = merged.sort_by([("h", "ascending"),
                                     ("id", "ascending")])
            merged = merged.slice(0, sample_size).combine_chunks()
    if merged is None:
        raise ValueError("smallest_hash_sample: empty dataset")
    merged = merged.sort_by([("h", "ascending"), ("id", "ascending")])
    merged = merged.slice(0, sample_size)
    return np.asarray(merged.column("emb").to_pylist(), dtype=np.float64)


def _lloyd_euclidean(x: np.ndarray, k: int, iters: int,
                     seed: int) -> np.ndarray:
    """Seeded Euclidean Lloyd on a driver-side sample (PQ sub-codebooks —
    unlike train_centroids, NOT spherical: PQ quantizes raw subvectors)."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(x), size=min(k, len(x)), replace=False)
    cents = x[idx].copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def pq_train(ds: Dataset, emb_column: str, id_column: str, m: int = 8,
             k: int = 16, sample_size: int = 2048, iters: int = 10,
             seed: int = 42) -> np.ndarray:
    """Train product-quantization codebooks (Jégou, Douze & Schmid 2011):
    split d dims into ``m`` subspaces, per-subspace seeded Euclidean
    k-means with ``k`` centroids over the deterministic smallest-hash
    sample.  Returns (m, k, d/m) float64 codebooks.  Memory per encoded
    vector is m bytes (k <= 256) — 16-32x below float32."""
    sample = smallest_hash_sample(ds, emb_column, id_column, sample_size)
    d = sample.shape[1]
    if d % m:
        raise ValueError(f"pq_train: dim {d} not divisible by m={m}")
    if k > 256:
        raise ValueError("pq_train: k > 256 does not fit uint8 codes")
    dsub = d // m
    return np.stack([
        _lloyd_euclidean(sample[:, j * dsub:(j + 1) * dsub], k, iters,
                         seed + j)
        for j in range(m)])


class _PQEncoder:
    """Per-worker state: broadcast (m, k, dsub) codebooks; per batch one
    vectorized distance argmin per subspace."""

    def __init__(self, codebooks_ref, emb_column: str, id_column: str):
        self.books = (ray.get(codebooks_ref)
                      if not isinstance(codebooks_ref, np.ndarray)
                      else codebooks_ref)
        self.emb_column = emb_column
        self.id_column = id_column

    def _codes(self, mat: np.ndarray) -> np.ndarray:
        m, _, dsub = self.books.shape
        codes = np.empty((mat.shape[0], m), dtype=np.uint8)
        for j in range(m):
            sub = mat[:, j * dsub:(j + 1) * dsub]
            d2 = ((sub[:, None, :] - self.books[j][None, :, :]) ** 2) \
                .sum(axis=2)
            codes[:, j] = d2.argmin(axis=1).astype(np.uint8)
        return codes

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _emb_matrix(batch, self.emb_column)
        codes = self._codes(mat)
        m = codes.shape[1]
        flat = pa.array(codes.reshape(-1), type=pa.uint8())
        return pa.table({
            self.id_column: batch.column(self.id_column),
            "pq_code": pa.FixedSizeListArray.from_arrays(flat, m)})


def pq_encode(ds: Dataset, codebooks: np.ndarray, emb_column: str,
              id_column: str, concurrency=None) -> Dataset:
    """Encode every vector to m uint8 centroid indexes (shuffle-free)."""
    from . import cached_stage, concurrency_kwargs
    ref = ray.put(np.asarray(codebooks, dtype=np.float64))
    return ds.map_batches(
        cached_stage(_PQEncoder, codebooks_ref=ref, emb_column=emb_column,
                     id_column=id_column),
        batch_format="pyarrow", **concurrency_kwargs(concurrency))


class _PQScorer(_PQEncoder):
    """ADC search: per query a (m, k) distance table against the
    codebooks, per row a table-lookup sum over its m codes — no float
    math per vector at query time."""

    def __init__(self, codebooks_ref, queries_ref, emb_column: str,
                 id_column: str, k: int):
        super().__init__(codebooks_ref, emb_column, id_column)
        q = ray.get(queries_ref)
        m, _, dsub = self.books.shape
        # tables[q, j, c] = ||query_sub - centroid||^2
        self.tables = np.stack([
            ((q[:, j * dsub:(j + 1) * dsub][:, None, :]
              - self.books[j][None, :, :]) ** 2).sum(axis=2)
            for j in range(m)], axis=1)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _emb_matrix(batch, self.emb_column)
        codes = self._codes(mat)                       # (n, m)
        nq, m, _ = self.tables.shape
        n = codes.shape[0]
        ids = batch.column(self.id_column)
        out_q, out_take, out_d = [], [], []
        sub = np.arange(m)
        for qi in range(nq):
            dist = self.tables[qi][sub[None, :], codes].sum(axis=1)
            top = np.argsort(dist, kind="stable")[:self.k]
            out_q.extend([qi] * len(top))
            out_take.extend(top.tolist())
            out_d.extend(dist[top].tolist())
        import pyarrow.compute as pc
        return pa.table({
            "query_id": pa.array(out_q, type=pa.int32()),
            self.id_column: pc.take(ids, pa.array(out_take,
                                                  type=pa.int64())),
            "pq_dist": pa.array(out_d, type=pa.float64())})


def pq_topk(ds: Dataset, queries: np.ndarray, codebooks: np.ndarray,
            emb_column: str, id_column: str, k: int = 10,
            concurrency=None) -> Dataset:
    """Approximate top-k by PQ asymmetric distance: per-batch local top-k
    (codes computed on the fly — at scale, run over a pq_encode'd table
    instead), one tiny groupby reduce per query (ties by id)."""
    from . import cached_stage, concurrency_kwargs
    cref = ray.put(np.asarray(codebooks, dtype=np.float64))
    qref = ray.put(np.asarray(queries, dtype=np.float64))
    local = ds.map_batches(
        cached_stage(_PQScorer, codebooks_ref=cref, queries_ref=qref,
                     emb_column=emb_column, id_column=id_column, k=k),
        batch_format="pyarrow", **concurrency_kwargs(concurrency))

    return _global_topk(local, id_column, k, score_col="pq_dist",
                        descending=False)


class _IVFPQScorer(_PQEncoder):
    """Residual IVF-PQ (the canonical billion-scale ANN layout, Jégou
    2011 §IV): rows assign to their nearest coarse centroid (spherical,
    the IVF cells); the PQ codebooks quantize the RESIDUAL x - c; each
    query probes its n_probe nearest cells with a per-cell ADC table over
    the residual query q - c."""

    def __init__(self, codebooks_ref, centroids_ref, queries_ref,
                 emb_column: str, id_column: str, k: int, n_probe: int):
        super().__init__(codebooks_ref, emb_column, id_column)
        get = (lambda r: ray.get(r) if isinstance(r, ray.ObjectRef) else r)
        self.centroids = np.asarray(get(centroids_ref), dtype=np.float64)
        q = np.asarray(get(queries_ref), dtype=np.float64)
        m, kc, dsub = self.books.shape
        qn = _unit_rows(q)
        order = np.argsort(-(qn @ self.centroids.T), axis=1)[:, :n_probe]
        self.probe_cells = [row.tolist() for row in order]
        # per (query, probed cell): ADC table over the residual query
        self.tables = {}
        for qi, cells in enumerate(self.probe_cells):
            for c in cells:
                res = q[qi] - self.centroids[c]
                self.tables[(qi, c)] = np.stack([
                    ((res[j * dsub:(j + 1) * dsub][None, :]
                      - self.books[j][None, :, :].reshape(kc, dsub)) ** 2)
                    .sum(axis=1) for j in range(m)])
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _emb_matrix(batch, self.emb_column)
        unit = _unit_rows(mat)
        assign = (unit @ self.centroids.T).argmax(axis=1)
        m = self.books.shape[0]
        sub = np.arange(m)
        ids = batch.column(self.id_column)
        out_q, out_take, out_d = [], [], []
        for qi, cells in enumerate(self.probe_cells):
            for c in cells:
                in_cell = np.flatnonzero(assign == c)
                if not len(in_cell):
                    continue
                res = mat[in_cell] - self.centroids[c]
                codes = self._codes(res)
                dist = self.tables[(qi, c)][sub[None, :], codes].sum(axis=1)
                kk = min(self.k, len(dist))
                top = np.argpartition(dist, kth=kk - 1)[:kk]
                out_q.extend([qi] * kk)
                out_take.extend(in_cell[top].tolist())
                out_d.extend(dist[top].tolist())
        import pyarrow.compute as pc
        return pa.table({
            "query_id": pa.array(out_q, type=pa.int32()),
            self.id_column: pc.take(ids, pa.array(out_take,
                                                  type=pa.int64())),
            "pq_dist": pa.array(out_d, type=pa.float64())})


def ivfpq_train(ds: Dataset, emb_column: str, id_column: str,
                n_centroids: int = 8, m: int = 8, k: int = 16,
                sample_size: int = 2048, iters: int = 10,
                seed: int = 42) -> "tuple[np.ndarray, np.ndarray]":
    """Train the coarse (spherical) centroids AND residual PQ codebooks
    from ONE deterministic smallest-hash sample.  Returns
    (centroids (C, d), codebooks (m, k, d/m))."""
    sample = smallest_hash_sample(ds, emb_column, id_column, sample_size)
    cents = train_centroids(sample, n_centroids, iters=iters, seed=seed)
    assign = (_unit_rows(sample) @ cents.T).argmax(axis=1)
    residuals = sample - cents[assign]
    d = residuals.shape[1]
    if d % m:
        raise ValueError(f"ivfpq_train: dim {d} not divisible by m={m}")
    dsub = d // m
    books = np.stack([
        _lloyd_euclidean(residuals[:, j * dsub:(j + 1) * dsub], k, iters,
                         seed + j)
        for j in range(m)])
    return cents, books


def ivfpq_topk(ds: Dataset, queries: np.ndarray, centroids: np.ndarray,
               codebooks: np.ndarray, emb_column: str, id_column: str,
               k: int = 10, n_probe: int = 3, concurrency=None) -> Dataset:
    """Residual IVF-PQ ADC search: centroids + codebooks broadcast once,
    per-batch cell filter + residual-code table lookups, one tiny
    groupby reduce per query."""
    from . import cached_stage, concurrency_kwargs
    cref = ray.put(np.asarray(codebooks, dtype=np.float64))
    vref = ray.put(np.asarray(centroids, dtype=np.float64))
    qref = ray.put(np.asarray(queries, dtype=np.float64))
    local = ds.map_batches(
        cached_stage(_IVFPQScorer, codebooks_ref=cref, centroids_ref=vref,
                     queries_ref=qref, emb_column=emb_column,
                     id_column=id_column, k=k, n_probe=n_probe),
        batch_format="pyarrow", **concurrency_kwargs(concurrency))

    return _global_topk(local, id_column, k, score_col="pq_dist",
                        descending=False)


# --------------------------------------------------------------------------
# Distributed PCA with a fixed-point bit-exactness contract.

PCA_SCALE = 1 << 20  # embedding quantization; projections divide by 2^40


def _quantize_emb(mat: np.ndarray, scale: int = PCA_SCALE) -> np.ndarray:
    """q = floor(x * scale + 0.5) — round-half-up, mirrored by the golden
    fixture; int64."""
    return np.floor(mat * scale + 0.5).astype(np.int64)


def pca_fit(ds: Dataset, emb_column: str, k: int = 4,
            scale: int = PCA_SCALE) -> dict:
    """Distributed PCA over an embedding column, bit-reproducible under
    any partitioning:

    1. Embeddings quantize to int64 (``floor(x * 2^20 + 0.5)``) so every
       accumulation is integer-exact (the DSIR/PageRank fixed-point trick
       — float sums are order-dependent, integer sums are not).
    2. Each batch collapses to ``(n, sum_q[d], sum_qq[d, d])`` partials
       (one int64 einsum per batch); ONLY these tiny rows leave the
       workers — no shuffle, no payload movement.
    3. The driver sums partials with Python arbitrary-precision ints and
       builds the exact population covariance
       ``C = (n * Sqq - Sq Sq^T) / (n^2 * scale^2)`` (one float division
       per entry off exact ints).
    4. ``np.linalg.eigh(C)`` (driver-side, the pinned shared primitive —
       one LAPACK call on a bit-identical matrix, like the fixture's) and
       the top-``k`` eigenvectors quantize back to int64 components.

    Returns ``{"n", "mean_q", "comps_q", "eigvals", "scale"}`` for
    :func:`pca_project`.  Overflow bounds (documented, asserted): unit-ish
    embeddings -> |q| <= ~2 * scale; per-batch einsum fits int64 to ~1e5
    rows x d; driver totals are Python bigints.
    """

    def partials(batch: pa.Table) -> pa.Table:
        q = _quantize_emb(_emb_matrix(batch, emb_column), scale)
        sq = q.sum(axis=0, dtype=np.int64)
        sqq = np.einsum("bi,bj->ij", q, q, dtype=np.int64)
        return pa.table({
            "n": pa.array([batch.num_rows], type=pa.int64()),
            "sq": pa.array([sq.tolist()],
                           type=pa.list_(pa.int64())),
            "sqq": pa.array([sqq.ravel().tolist()],
                            type=pa.list_(pa.int64()))})

    rows = (ds.select_columns([emb_column])
            .map_batches(partials, batch_format="pyarrow").take_all())
    if not rows:
        raise ValueError("pca_fit: empty dataset")
    d = len(rows[0]["sq"])
    n = sum(int(r["n"]) for r in rows)
    sq = [0] * d
    sqq = [0] * (d * d)
    for r in rows:
        for i, v in enumerate(r["sq"]):
            sq[i] += int(v)
        for i, v in enumerate(r["sqq"]):
            sqq[i] += int(v)
    denom = float(n * n * scale * scale)
    cov = np.empty((d, d), dtype=np.float64)
    for i in range(d):
        for j in range(d):
            cov[i, j] = float(n * sqq[i * d + j] - sq[i] * sq[j]) / denom
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order]                       # (d, k)
    comps_q = np.floor(comps * scale + 0.5).astype(np.int64)
    mean_q = np.array([s // n for s in sq], dtype=np.int64)
    return {"n": n, "mean_q": mean_q, "comps_q": comps_q,
            "eigvals": w[order].tolist(), "scale": scale}


def pca_project(ds: Dataset, model: dict, emb_column: str, id_column: str,
                out_prefix: str = "pc", concurrency=None) -> Dataset:
    """Project embeddings onto fitted PCA components — all-integer per
    row: ``y_int = (q - mean_q) @ comps_q`` (int64 matmul, exact), then
    ONE division by ``scale^2`` per output.  Centering uses the
    floor-quantized mean (int64) — part of the documented spec, mirrored
    by the fixture.  Map-only; broadcast model via the stage-arg path."""
    from . import cached_stage, concurrency_kwargs

    class _Projector:
        def __init__(self, model, emb_column, id_column, out_prefix):
            self.mean_q = np.asarray(model["mean_q"], dtype=np.int64)
            self.comps_q = np.asarray(model["comps_q"], dtype=np.int64)
            self.scale = int(model["scale"])
            self.emb_column = emb_column
            self.id_column = id_column
            self.out_prefix = out_prefix

        def __call__(self, batch: pa.Table) -> pa.Table:
            q = _quantize_emb(_emb_matrix(batch, self.emb_column),
                              self.scale)
            y = (q - self.mean_q) @ self.comps_q          # int64 exact
            denom = float(self.scale) * float(self.scale)
            cols = {self.id_column: batch.column(self.id_column)}
            for j in range(y.shape[1]):
                cols[f"{self.out_prefix}{j + 1}"] = pa.array(
                    y[:, j].astype(np.float64) / denom, type=pa.float64())
            return pa.table(cols)

    return ds.map_batches(
        cached_stage(_Projector, model=model, emb_column=emb_column,
                     id_column=id_column, out_prefix=out_prefix),
        batch_format="pyarrow", **concurrency_kwargs(concurrency))


def ann_join(left: Dataset, right: Dataset, emb_column: str,
             id_column: str, k: int = 5, n_centroids: int = 8,
             n_probe: int = 3, sample_size: int = 2048, iters: int = 10,
             seed: int = 42, centroids: Optional[np.ndarray] = None,
             num_partitions: int | None = None) -> Dataset:
    """Approximate nearest-neighbor JOIN between two datasets: for every
    LEFT row, the top-``k`` RIGHT rows by cosine — the embedding-space
    decontamination / retrieval-pairing primitive ("for each eval doc,
    its nearest training docs") where BOTH sides are large, so the
    broadcast-query ``topk_cosine`` shape does not apply.

    IVF cell partitioning makes the all-pairs problem local: a codebook
    is trained on the deterministic smallest-hash sample of the RIGHT
    side (rerun/partition-stable — the semantic_codebook contract); each
    right row goes to its nearest cell, each left row flat-maps to its
    ``n_probe`` nearest cells; ONE exchange keyed on the cell co-locates
    them, and each cell scores one matmul + vectorized per-left top-k.
    Candidates from the probed cells (a right row lives in exactly one
    cell, so candidates are unique) merge with one k-sized
    ``top_k_per_group`` exchange.

    Recall < 1 by construction (a true neighbor in an unprobed cell is
    missed); raise ``n_probe``/``n_centroids`` to trade cost for recall.
    Ties break on ascending right id (total order — membership is
    deterministic).  Emits ``(query_id, match_id, score, rk)``."""
    from .analytics import top_k_per_group

    if centroids is None:
        sample = smallest_hash_sample(right, emb_column, id_column,
                                      sample_size)
        centroids = train_centroids(sample, n_centroids, iters=iters,
                                    seed=seed)
    cents = np.asarray(centroids, dtype=np.float64)
    if num_partitions is None:
        num_partitions = max(2, min(len(cents), 16))
    side_t, cell_t = pa.int8(), pa.int64()

    def tag_right(batch: pa.Table) -> pa.Table:
        emb = _unit_rows(_emb_matrix(batch, emb_column))
        assign = (emb @ cents.T).argmax(axis=1).astype(np.int64)
        return pa.table({
            "cell": pa.array(assign, type=cell_t),
            "side": pa.array(np.ones(batch.num_rows, dtype=np.int8),
                             type=side_t),
            "vid": batch.column(id_column),
            "emb": batch.column(emb_column)})

    def tag_left(batch: pa.Table) -> pa.Table:
        emb = _unit_rows(_emb_matrix(batch, emb_column))
        order = np.argsort(-(emb @ cents.T), axis=1)[:, :n_probe]
        rows = np.repeat(np.arange(batch.num_rows, dtype=np.int64),
                         order.shape[1])
        take = pa.array(rows, type=pa.int64())
        return pa.table({
            "cell": pa.array(order.reshape(-1).astype(np.int64),
                             type=cell_t),
            "side": pa.array(np.zeros(len(rows), dtype=np.int8),
                             type=side_t),
            "vid": pc.take(batch.column(id_column), take),
            "emb": pc.take(batch.column(emb_column), take)})

    tagged = (right.select_columns([id_column, emb_column])
              .map_batches(tag_right, batch_format="pyarrow")
              .union(left.select_columns([id_column, emb_column])
                     .map_batches(tag_left, batch_format="pyarrow")))

    def per_cell(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "query_id": pa.array([], type=pa.int64()),
            "match_id": pa.array([], type=pa.int64()),
            "score": pa.array([], type=pa.float64())})
        if g.num_rows == 0 or "side" not in g.column_names:
            return empty
        side = g.column("side").to_numpy(zero_copy_only=False)
        lt = g.filter(pa.array(side == 0))
        rt = g.filter(pa.array(side == 1)).sort_by([("vid", "ascending")])
        if lt.num_rows == 0 or rt.num_rows == 0:
            return empty
        L = _unit_rows(_emb_matrix(lt, "emb"))
        R = _unit_rows(_emb_matrix(rt, "emb"))
        rids = rt.column("vid").to_numpy(zero_copy_only=False)
        lids = lt.column("vid").to_numpy(zero_copy_only=False)
        sims = L @ R.T
        n, m = sims.shape
        kk = min(k, m)
        # vectorized per-left top-k (no per-row Python): argpartition,
        # re-sort the kk-subset ascending (R is rid-sorted, so subset
        # order == rid order), then a STABLE score sort — which makes the
        # tie-break ascending rid, the same total order the merge uses
        if m > kk:
            part = np.argpartition(-sims, kth=kk - 1, axis=1)[:, :kk]
        else:
            part = np.tile(np.arange(m, dtype=np.int64), (n, 1))
        part = np.sort(part, axis=1)
        s_part = np.take_along_axis(sims, part, axis=1)
        ord2 = np.argsort(-s_part, axis=1, kind="stable")
        sel = np.take_along_axis(part, ord2, axis=1)
        return pa.table({
            "query_id": pa.array(np.repeat(lids.astype(np.int64), kk)),
            "match_id": pa.array(rids[sel].reshape(-1).astype(np.int64)),
            "score": pa.array(
                np.take_along_axis(s_part, ord2, axis=1).reshape(-1),
                type=pa.float64())})

    cands = (tagged.groupby("cell", num_partitions=num_partitions)
             .map_groups(per_cell, batch_format="pyarrow"))
    return top_k_per_group(cands, "query_id", ["score", "match_id"], k,
                           descending=True)
