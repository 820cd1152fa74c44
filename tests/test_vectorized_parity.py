"""Bitwise-parity tests for the whole-batch vectorized text stages.

Each stage (MinHasher signatures, SimHasher fingerprints, winnowed
Fingerprinter) replaced a per-document Python loop with segmented
polars/numpy kernels; these tests pin the vectorized output to an inline
per-document reference implementation (the pre-vectorization code) on the
real corpus plus adversarial edge cases (empty/null docs, docs shorter than
the n-gram, unicode NBSP/EM-space, duplicate-heavy text).

Reference for the golden-value discipline: the reference pins expected
values the same way in test/malli/core_test.cljc:238-311.
"""

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from malli_ray.stages.dedup import (MinHasher, SimHasher, _MERSENNE,
                                    _WORD_RE, _word_shingles)
from malli_ray.stages.text import Fingerprinter
from malli_ray.state.sketches import hash64

SF = "/root/testdata/sf0.001"

EDGE_TEXTS = [
    "", None, "one", "two words", "a b c", "a b c d", "a b c d e",
    "a b c d e f g h i j k l m",
    "dup dup dup dup dup dup dup dup dup dup dup dup",
    "unicode nbsp and em space words here",
    "  leading trailing  ", "\t\n\f\r mixed \t whitespace d e f",
    "w " * 9, "q " * 15,
]


def _edge_batch():
    return pa.table({"text": pa.array(EDGE_TEXTS, type=pa.string())})


def _corpus_batch():
    return pq.read_table(f"{SF}/documents.parquet", columns=["text"])


# -- per-document reference implementations (pre-vectorization code) --------


def _ref_minhash_signatures(mh: MinHasher, texts):
    all_shingles, counts = [], np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        sh = _word_shingles(t, mh.shingle_k)
        counts[i] = len(sh)
        all_shingles.extend(sh)
    M = np.uint64(_MERSENNE)
    if not all_shingles:
        return np.full((len(texts), mh.num_perm), M, dtype=np.uint64)
    base = pl.Series(all_shingles).hash(seed=7).to_numpy().astype(np.uint64)
    starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
    out = np.empty((len(texts), mh.num_perm), dtype=np.uint64)
    for j in range(mh.num_perm):
        v = (base * mh.a[j] + mh.b[j]) % M
        out[:, j] = np.minimum.reduceat(v, starts)
    return out


def _ref_simhash(texts):
    words_per_doc = [(_WORD_RE.findall(t or "") or [""]) for t in texts]
    counts = np.fromiter((len(w) for w in words_per_doc), dtype=np.int64,
                         count=len(words_per_doc))
    flat = [w for ws in words_per_doc for w in ws]
    h = pl.Series(flat).hash(seed=11).to_numpy().astype(np.uint64)
    bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1,
                         bitorder="little").astype(np.int32)
    votes = bits * 2 - 1
    offsets = np.concatenate(([0], np.cumsum(counts)))[:-1]
    sums = np.add.reduceat(votes, offsets, axis=0)
    return np.packbits((sums > 0).astype(np.uint8), axis=1,
                       bitorder="little").view(np.uint64).ravel()


def _ref_fingerprint(fp: Fingerprinter, texts):
    from numpy.lib.stride_tricks import sliding_window_view
    words_per_doc = [(fp.word_re.findall(t or "") or [""]) for t in texts]
    flat = [w for ws in words_per_doc for w in ws]
    h = hash64(flat, seed=13)
    counts = np.fromiter((len(w) for w in words_per_doc), dtype=np.int64,
                         count=len(words_per_doc))
    offsets = np.concatenate(([0], np.cumsum(counts)))
    B = np.uint64(1099511628211)
    out = np.empty(len(texts), dtype=np.uint64)
    for i in range(len(texts)):
        hw = h[offsets[i]:offsets[i + 1]]
        n, k = len(hw), fp.ngram
        if n < k:
            grams = np.array([hw.sum(dtype=np.uint64)], dtype=np.uint64)
        else:
            grams = np.zeros(n - k + 1, dtype=np.uint64)
            for j in range(k):
                grams = grams * B + hw[j:n - k + 1 + j]
        w = min(fp.window, len(grams))
        mins = (grams if w <= 1
                else sliding_window_view(grams, w).min(axis=1))
        acc = np.uint64(0)
        for m in np.unique(mins):
            acc ^= m
        out[i] = acc
    return out


# -- tests -------------------------------------------------------------------


@pytest.mark.parametrize("batch_fn", [_corpus_batch, _edge_batch],
                         ids=["corpus", "edge"])
def test_minhash_signatures_bitwise_parity(batch_fn):
    mh = MinHasher("text", "doc_id", num_perm=64, shingle_k=3, bands=32)
    texts = batch_fn().column("text").to_pylist()
    assert np.array_equal(mh.signatures(texts),
                          _ref_minhash_signatures(mh, texts))


def test_minhash_signatures_empty_and_k_variants():
    for k in (1, 2, 5):
        mh = MinHasher("text", "doc_id", num_perm=16, shingle_k=k, bands=4)
        assert np.array_equal(mh.signatures(EDGE_TEXTS),
                              _ref_minhash_signatures(mh, EDGE_TEXTS))
    mh = MinHasher("text", "doc_id", num_perm=16, shingle_k=3, bands=4)
    assert mh.signatures([]).shape == (0, 16)


@pytest.mark.parametrize("batch_fn", [_corpus_batch, _edge_batch],
                         ids=["corpus", "edge"])
def test_simhash_bitwise_parity(batch_fn):
    batch = batch_fn()
    got = SimHasher("text")(batch).column("simhash").to_numpy()
    assert np.array_equal(got,
                          _ref_simhash(batch.column("text").to_pylist()))


def test_simhash_empty_batch():
    empty = pa.table({"text": pa.array([], type=pa.string())})
    out = SimHasher("text")(empty)
    assert out.num_rows == 0 and out.column("simhash").type == pa.uint64()


@pytest.mark.parametrize("ngram,window", [(4, 8), (4, 1), (2, 3), (1, 8)])
def test_fingerprint_bitwise_parity(ngram, window):
    fp = Fingerprinter("text", ngram=ngram, window=window)
    for batch in (_corpus_batch(), _edge_batch()):
        got = fp(batch).column("fingerprint").to_numpy()
        ref = _ref_fingerprint(fp, batch.column("text").to_pylist())
        assert np.array_equal(got, ref)


def test_fingerprint_empty_batch():
    empty = pa.table({"text": pa.array([], type=pa.string())})
    out = Fingerprinter("text")(empty)
    assert out.num_rows == 0 and out.column("fingerprint").type == pa.uint64()
