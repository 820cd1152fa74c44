"""Generate golden-fixture parquet for the hash-based dedup queries.

The fingerprint / simhash / minhash outputs are deterministic functions of
the document text, but not expressible in ANSI SQL (they depend on polars'
xxhash kernel), so the driver's DuckDB oracle can't recompute them.  This
script pins the expected output per scale factor with an INDEPENDENT
per-document reference implementation (plain Python loops over one doc /
one pair at a time — the engine's segmented whole-batch kernels are not
imported), following the golden-value discipline of the reference's
test/malli/core_test.cljc:238-311.  ``oracle_sql()`` then reads the fixture
via ``read_parquet`` so the driver hash-checks the engine against it.

Run:  python tools/make_golden.py            # writes fixtures/golden/sf*/
Algorithm constants below mirror the documented specs in
malli_ray/stages/dedup.py (MinHasher/SimHasher) and stages/text.py
(Fingerprinter); the only shared primitive is polars' Series.hash, which is
the pinned hash kernel both sides are defined in terms of.
"""
import math
import os
import re
import sys

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORD_RE = re.compile(r"[^\t\n\f\r ]+")  # RE2-compatible ASCII \S
MERSENNE = (1 << 61) - 1


def _words(text):
    return WORD_RE.findall(text or "") or [""]


def _hash_words(words, seed):
    return pl.Series(words).hash(seed=seed).to_numpy().astype(np.uint64)


def fingerprint_doc(text, ngram=4, window=8):
    """Winnowed rolling-hash fingerprint of ONE document (Schleimer 2003)."""
    hw = _hash_words(_words(text), seed=13)
    n, k = len(hw), ngram
    if n < k:
        grams = np.array([hw.sum(dtype=np.uint64)], dtype=np.uint64)
    else:
        grams = np.zeros(n - k + 1, dtype=np.uint64)
        B = np.uint64(1099511628211)
        for j in range(k):
            grams = grams * B + hw[j:n - k + 1 + j]
    w = min(window, len(grams))
    if w <= 1:
        mins = grams
    else:
        mins = np.array([grams[i:i + w].min() for i in range(len(grams) - w + 1)],
                        dtype=np.uint64)
    fp = np.uint64(0)
    for m in np.unique(mins):
        fp ^= m
    return int(fp)


def simhash_doc(text):
    """64-bit SimHash of ONE document (Charikar 2002 bit votes)."""
    h = _hash_words(_words(text), seed=11)
    fp = np.uint64(0)
    for bit in range(64):
        ones = int(((h >> np.uint64(bit)) & np.uint64(1)).sum())
        if 2 * ones > len(h):
            fp |= np.uint64(1) << np.uint64(bit)
    return int(fp)


def minhash_signature_doc(text, a, b, shingle_k=3):
    """(num_perm,) uint64 minhash signature of ONE document."""
    words = WORD_RE.findall(text or "")
    if len(words) < shingle_k:
        shingles = [" ".join(words)] if words else [""]
    else:
        shingles = [" ".join(words[i:i + shingle_k])
                    for i in range(len(words) - shingle_k + 1)]
    h = _hash_words(shingles, seed=7)
    M = np.uint64(MERSENNE)
    sig = np.empty(len(a), dtype=np.uint64)
    for j in range(len(a)):
        sig[j] = ((a[j] * h + b[j]) % M).min()
    return sig


def minhash_pairs(ids, texts, num_perm=128, bands=16, threshold=0.5,
                  shingle_k=3, seed=42):
    """Brute-force reconstruction of the LSH candidate set: every pair that
    shares at least one exact band segment (bucket membership), estimated by
    the fraction of agreeing low signature bytes (the engine's 1-byte wire
    signature), kept at est >= threshold.  O(n^2) — fixture scale only."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE, num_perm, dtype=np.uint64)
    b = rng.integers(0, MERSENNE, num_perm, dtype=np.uint64)
    sigs = np.stack([minhash_signature_doc(t, a, b, shingle_k) for t in texts])
    low = (sigs & np.uint64(0xFF)).astype(np.uint8)
    r = num_perm // bands
    n = len(ids)
    out = []
    for i in range(n):
        for j in range(i + 1, n):
            shares = any(
                np.array_equal(sigs[i, bb * r:(bb + 1) * r],
                               sigs[j, bb * r:(bb + 1) * r])
                for bb in range(bands))
            if not shares:
                continue
            est = float((low[i] == low[j]).mean())
            if est >= threshold:
                lo, hi = sorted((ids[i], ids[j]))
                out.append((lo, hi, est))
    out.sort()
    return out


def word_jaccard(text_a, text_b, k=3):
    """Exact word-k-gram Jaccard of two documents."""
    def grams(text):
        words = WORD_RE.findall(text or "")
        if len(words) < k:
            return {" ".join(words)} if words else {""}
        return {" ".join(words[i:i + k]) for i in range(len(words) - k + 1)}
    sa, sb = grams(text_a), grams(text_b)
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def simhash_verified_pairs(ids, texts, max_hamming=7, n_chunks=8,
                           threshold=0.5):
    """Brute-force reconstruction of the simhash near-dup query: every pair
    sharing at least one exact fingerprint chunk (bucket membership) with
    hamming <= max_hamming, kept at exact word-3-gram Jaccard >= threshold."""
    fps = np.array([simhash_doc(t) for t in texts], dtype=np.uint64)
    chunk_bits = 64 // n_chunks
    mask = np.uint64((1 << chunk_bits) - 1)
    n = len(ids)
    out = []
    for i in range(n):
        for j in range(i + 1, n):
            x = int(fps[i] ^ fps[j])
            shares = any(
                (fps[i] >> np.uint64(c * chunk_bits)) & mask
                == (fps[j] >> np.uint64(c * chunk_bits)) & mask
                for c in range(n_chunks))
            if not shares or bin(x).count("1") > max_hamming:
                continue
            jac = word_jaccard(texts[i], texts[j])
            if jac >= threshold:
                lo, hi = sorted((ids[i], ids[j]))
                out.append((lo, hi, jac))
    out.sort()
    return out


def embedding_pairs(ids, embs, threshold=0.95, n_planes=12, seed=42):
    """Brute-force reconstruction of the hyperplane-LSH near-dup query:
    pairs sharing a sign-pattern bucket with exact cosine >= threshold
    (cosine in float64 over float32-rounded unit vectors — the wire
    precision the engine shuffles)."""
    emb = np.asarray(embs, dtype=np.float64)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((emb.shape[1], n_planes))
    signs = (emb @ planes) > 0
    bucket = (signs.astype(np.int64)
              << np.arange(n_planes, dtype=np.int64)).sum(axis=1)
    norm = np.linalg.norm(emb, axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    unit = (emb / norm).astype(np.float32).astype(np.float64)
    out = []
    n = len(ids)
    for i in range(n):
        for j in range(i + 1, n):
            if bucket[i] != bucket[j]:
                continue
            cos = math.fsum((unit[i] * unit[j]).tolist())
            if cos >= threshold:
                lo, hi = sorted((ids[i], ids[j]))
                out.append((lo, hi, cos))
    out.sort()
    return out


def semantic_dedup_pairs_ref(ids, embs, n_clusters=8, threshold=0.9,
                             seed=42, sample_size=256, eps=0.05,
                             mult=0x9E3779B97F4A7C15):
    """Brute-force reconstruction of the semantic-dedup query: synthesize
    the eps-perturbed duplicate rows (same per-row sign-bit rule as
    __ray_entry__._sem_synth_dups), pick the codebook sample as the
    sample_size smallest polars-hash(id) rows, run the documented seeded
    Lloyd iterations, assign every row to its argmax centroid, and emit
    within-cluster pairs whose float64 per-pair dot of float32-roundtripped
    unit vectors is >= threshold.  Plain numpy over the full table — no
    engine kernels imported; polars Series.hash is the pinned shared
    primitive."""
    emb = np.asarray(embs, dtype=np.float64)
    ids = np.asarray(ids, dtype=np.int64)
    d = emb.shape[1]
    # synthesized duplicates (vec_id % 10 == 3 -> copy at id + 1_000_000)
    pick = ids % 10 == 3
    h = ids[pick].astype(np.uint64) * np.uint64(mult)
    bits = (h[:, None] >> (np.arange(d, dtype=np.uint64) % np.uint64(64))) \
        & np.uint64(1)
    signs = np.where(bits == 1, 1.0, -1.0)
    dup = (emb[pick] * (1.0 + eps * signs)).astype(np.float32) \
        .astype(np.float64)
    all_ids = np.concatenate([ids, ids[pick] + 1_000_000])
    all_emb = np.vstack([emb, dup])
    # codebook: sample_size smallest hash(id) rows, seeded Lloyd
    hh = pl.Series(all_ids).hash(seed=5).to_numpy().astype(np.uint64) \
        .view(np.int64)
    order = np.lexsort((all_ids, hh))[:sample_size]
    sample = all_emb[order]
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    sample = sample / norms
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(n_clusters, len(sample)),
                     replace=False)
    centroids = sample[idx].copy()
    for _ in range(10):
        assign = (sample @ centroids.T).argmax(axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        cn = np.linalg.norm(centroids, axis=1, keepdims=True)
        cn[cn == 0] = 1.0
        centroids = centroids / cn
    # assignment + within-cluster exact pairs over float32 wire units
    norm = np.linalg.norm(all_emb, axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    unit = all_emb / norm
    cid = (unit @ centroids.T).argmax(axis=1)
    unit32 = unit.astype(np.float32).astype(np.float64)
    out = []
    n = len(all_ids)
    for i in range(n):
        for j in range(i + 1, n):
            if cid[i] != cid[j] or all_ids[i] == all_ids[j]:
                continue
            cos = math.fsum((unit32[i] * unit32[j]).tolist())
            if cos >= threshold:
                lo, hi = sorted((int(all_ids[i]), int(all_ids[j])))
                out.append((lo, hi, cos))
    out.sort()
    return out


def ivf_topk_ref(ids, embs, n_queries=2, k=5, n_clusters=8, n_probe=3,
                 seed=42, sample_size=256):
    """Brute-force reconstruction of the ivf_topk query: the same
    smallest-hash codebook sample and seeded Lloyd as semantic_dedup_ref,
    probe the n_probe nearest cells per query (queries = the first
    n_queries embeddings), exact cosine over the probed cells, top-k per
    query by (-score, id).  Scores are NOT emitted (membership only), so
    the pin is ulp-robust."""
    emb = np.asarray(embs, dtype=np.float64)
    ids = np.asarray(ids, dtype=np.int64)
    hh = pl.Series(ids).hash(seed=5).to_numpy().astype(np.uint64) \
        .view(np.int64)
    order = np.lexsort((ids, hh))[:sample_size]
    sample = emb[order]
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    sample = sample / norms
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(n_clusters, len(sample)),
                     replace=False)
    centroids = sample[idx].copy()
    for _ in range(10):
        assign = (sample @ centroids.T).argmax(axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        cn = np.linalg.norm(centroids, axis=1, keepdims=True)
        cn[cn == 0] = 1.0
        centroids = centroids / cn
    norm = np.linalg.norm(emb, axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    unit = emb / norm
    queries = unit[:n_queries]
    probe = np.argsort(-(queries @ centroids.T), axis=1)[:, :n_probe]
    assign = (unit @ centroids.T).argmax(axis=1)
    out = []
    for qi in range(n_queries):
        cells = set(probe[qi].tolist())
        cand = np.flatnonzero(np.isin(assign, list(cells)))
        scores = unit[cand] @ queries[qi]
        sel = np.lexsort((ids[cand], -scores))[:k]
        for j in sel:
            out.append((qi, int(ids[cand][j])))
    return out


def bpe_merges_ref(texts, num_merges=120, max_words=50_000, min_count=1):
    """NAIVE BPE trainer (Sennrich 2016): full pair recount every
    iteration over the capped word-frequency table.  Independent of the
    engine's incremental trainer (malli_ray/stages/bpe.py) — same spec
    (words = ASCII \\S+, symbols = chars + '</w>', adjacent-overlapping
    counting, greedy non-overlapping apply, (max count, min pair)
    selection), different algorithm."""
    from collections import Counter
    wc = Counter()
    for t in texts:
        wc.update(WORD_RE.findall(t or ""))
    ranked = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:max_words]
    vocab = {tuple(w) + ("</w>",): c for w, c in ranked}
    merges = []
    for rank in range(num_merges):
        stats = Counter()
        for syms, cnt in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += cnt
        if not stats:
            break
        (left, right), total = min(stats.items(),
                                   key=lambda kv: (-kv[1], kv[0]))
        if total < min_count:
            break
        merges.append((rank, left, right, total))
        new_vocab = {}
        for syms, cnt in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if (i < len(syms) - 1 and syms[i] == left
                        and syms[i + 1] == right):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + cnt
        vocab = new_vocab
    return merges


def bpe_encode_ref(texts, merges):
    """NAIVE per-document BPE encoder: iteratively merge the lowest-rank
    adjacent pair (greedy non-overlapping within a round) until none
    applies; tokens joined by one space.  No caching, no engine imports."""
    ranks = {(l, r): k for k, (_rk, l, r, _c) in enumerate(merges)}
    out = []
    for t in texts:
        toks = []
        for w in WORD_RE.findall(t or ""):
            syms = list(w) + ["</w>"]
            while len(syms) > 1:
                cand = [(ranks[(syms[i], syms[i + 1])], i)
                        for i in range(len(syms) - 1)
                        if (syms[i], syms[i + 1]) in ranks]
                if not cand:
                    break
                best = min(cand)[0]
                left, right = [p for p, k in ranks.items() if k == best][0]
                new = []
                i = 0
                while i < len(syms):
                    if (i < len(syms) - 1 and syms[i] == left
                            and syms[i + 1] == right):
                        new.append(left + right)
                        i += 2
                    else:
                        new.append(syms[i])
                        i += 1
                syms = new
            toks.extend(syms)
        out.append((len(toks), " ".join(toks)))
    return out


def pq_topk_ref(ids, embs, n_queries=2, k=5, m=8, kc=16, seed=42,
                sample_size=256, iters=10):
    """Brute-force reconstruction of the PQ ADC top-k query: the same
    smallest-hash sample (polars hash — the pinned primitive), per-subspace
    seeded Euclidean Lloyd (seed+j per subspace), argmin encoding, ADC
    table-lookup distance, top-k by (dist, id).  Membership-only pin
    (query_id, vec_id) — ulp-robust like ivf_topk_ref."""
    emb = np.asarray(embs, dtype=np.float64)
    ids = np.asarray(ids, dtype=np.int64)
    hh = pl.Series(ids).hash(seed=5).to_numpy().astype(np.uint64) \
        .view(np.int64)
    order = np.lexsort((ids, hh))[:sample_size]
    sample = emb[order]
    d = emb.shape[1]
    dsub = d // m
    books = []
    for j in range(m):
        x = sample[:, j * dsub:(j + 1) * dsub]
        rng = np.random.default_rng(seed + j)
        idx = rng.choice(len(x), size=min(kc, len(x)), replace=False)
        cents = x[idx].copy()
        for _ in range(iters):
            d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(len(cents)):
                members = x[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books.append(cents)
    codes = np.empty((len(emb), m), dtype=np.int64)
    for j in range(m):
        sub = emb[:, j * dsub:(j + 1) * dsub]
        codes[:, j] = ((sub[:, None, :] - books[j][None, :, :]) ** 2) \
            .sum(axis=2).argmin(axis=1)
    queries = emb[:n_queries]
    out = []
    for qi in range(n_queries):
        table = np.stack([
            ((queries[qi, j * dsub:(j + 1) * dsub][None, :]
              - books[j]) ** 2).sum(axis=1) for j in range(m)])
        dist = table[np.arange(m)[None, :], codes].sum(axis=1)
        sel = np.lexsort((ids, dist))[:k]
        for i in sel:
            out.append((qi, int(ids[i])))
    return out


def ann_join_ref(ids, embs, k=5, n_centroids=8, n_probe=3, seed=42,
                 sample_size=256, iters=10):
    """Independent replay of similarity.ann_join over the vec_id%10 split
    (left = eval rows, right = the rest): the same smallest-hash sample
    of the RIGHT side (polars hash — the pinned primitive), the spherical
    Lloyd of train_centroids, argmax-dot cell assignment, n_probe probed
    cells per left row, per-cell cosines, global top-k by (-score, rid).
    Membership-only pin (query_id, match_id) — ulp-robust like
    ivf/pq_topk_ref."""
    emb = np.asarray(embs, dtype=np.float64)
    ids = np.asarray(ids, dtype=np.int64)
    lmask = ids % 10 == 0
    lids, lemb = ids[lmask], emb[lmask]
    rids, remb = ids[~lmask], emb[~lmask]
    hh = pl.Series(rids).hash(seed=5).to_numpy().astype(np.uint64) \
        .view(np.int64)
    order = np.lexsort((rids, hh))[:sample_size]
    sample = remb[order]

    def unit(x):
        n = np.linalg.norm(x, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return x / n

    su = unit(sample)
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(su), size=min(n_centroids, len(su)),
                     replace=False)
    cents = su[idx].copy()
    for _ in range(iters):
        assign = (su @ cents.T).argmax(axis=1)
        for c in range(len(cents)):
            members = su[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = unit(cents)
    ru = unit(remb)
    assign_r = (ru @ cents.T).argmax(axis=1)
    lu = unit(lemb)
    probes = np.argsort(-(lu @ cents.T), axis=1)[:, :n_probe]
    out = []
    for qi in range(len(lids)):
        cand_i, cand_s = [], []
        for c in probes[qi].tolist():
            in_cell = np.flatnonzero(assign_r == c)
            if not len(in_cell):
                continue
            s = ru[in_cell] @ lu[qi]
            cand_i.extend(rids[in_cell].tolist())
            cand_s.extend(s.tolist())
        if not cand_i:
            continue
        cand_i = np.asarray(cand_i, dtype=np.int64)
        cand_s = np.asarray(cand_s)
        sel = np.lexsort((cand_i, -cand_s))[:k]
        for x in sel:
            out.append((int(lids[qi]), int(cand_i[x])))
    return out


def ivfpq_topk_ref(ids, embs, n_queries=2, k=5, n_centroids=8, m=8, kc=16,
                   n_probe=3, seed=42, sample_size=256, iters=10):
    """Brute-force reconstruction of the residual IVF-PQ query: the same
    smallest-hash sample, the SPHERICAL coarse Lloyd of
    similarity.train_centroids (unit rows, argmax-dot assign, mean,
    renormalize), residual PQ codebooks per subspace (Euclidean Lloyd,
    seed+j), per-(query, probed-cell) residual ADC tables, top-k by
    (dist, id).  Membership-only pin."""
    emb = np.asarray(embs, dtype=np.float64)
    ids = np.asarray(ids, dtype=np.int64)
    hh = pl.Series(ids).hash(seed=5).to_numpy().astype(np.uint64) \
        .view(np.int64)
    order = np.lexsort((ids, hh))[:sample_size]
    sample = emb[order]

    def unit(x):
        n = np.linalg.norm(x, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return x / n

    su = unit(sample)
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(su), size=min(n_centroids, len(su)), replace=False)
    cents = su[idx].copy()
    for _ in range(iters):
        assign = (su @ cents.T).argmax(axis=1)
        for c in range(len(cents)):
            members = su[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = unit(cents)
    assign_s = (su @ cents.T).argmax(axis=1)
    residuals = sample - cents[assign_s]
    d = emb.shape[1]
    dsub = d // m
    books = []
    for j in range(m):
        x = residuals[:, j * dsub:(j + 1) * dsub]
        rj = np.random.default_rng(seed + j)
        ix = rj.choice(len(x), size=min(kc, len(x)), replace=False)
        cb = x[ix].copy()
        for _ in range(iters):
            d2 = ((x[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for c in range(len(cb)):
                members = x[a == c]
                if len(members):
                    cb[c] = members.mean(axis=0)
        books.append(cb)
    queries = emb[:n_queries]
    eu = unit(emb)
    assign = (eu @ cents.T).argmax(axis=1)
    probe = np.argsort(-(unit(queries) @ cents.T), axis=1)[:, :n_probe]
    out = []
    for qi in range(n_queries):
        cand_d, cand_i = [], []
        for c in probe[qi].tolist():
            in_cell = np.flatnonzero(assign == c)
            if not len(in_cell):
                continue
            res = emb[in_cell] - cents[c]
            codes = np.empty((len(in_cell), m), dtype=np.int64)
            for j in range(m):
                sub = res[:, j * dsub:(j + 1) * dsub]
                codes[:, j] = ((sub[:, None, :] - books[j][None, :, :]) ** 2
                               ).sum(axis=2).argmin(axis=1)
            qres = queries[qi] - cents[c]
            table = np.stack([
                ((qres[j * dsub:(j + 1) * dsub][None, :] - books[j]) ** 2)
                .sum(axis=1) for j in range(m)])
            dist = table[np.arange(m)[None, :], codes].sum(axis=1)
            cand_d.extend(dist.tolist())
            cand_i.extend(ids[in_cell].tolist())
        cand_d = np.asarray(cand_d)
        cand_i = np.asarray(cand_i)
        sel = np.lexsort((cand_i, cand_d))[:k]
        for i in sel:
            out.append((qi, int(cand_i[i])))
    return out


def compression_ref(texts, level=6):
    """Per-doc DEFLATE sizes.  zlib at a fixed level IS the pinned shared
    primitive (like polars' hash for the dedup fixtures); this pins the
    byte counts so any zlib/build change fails the drift guard before the
    driver sees it."""
    import zlib
    out = []
    for t in texts:
        raw = (t or "").encode("utf-8")
        comp = len(zlib.compress(raw, level))
        out.append((len(raw), comp, comp / max(len(raw), 1)))
    return out


def entropy_ref(texts):
    """Per-doc unigram word entropy (nats), fixed-point log contract of
    malli_ray/stages/text.py::add_entropy — independent implementation:
    one Counter per document, scalar math.log per count (the engine uses
    a segmented polars explode/group_by over the whole batch and a
    count-indexed log table).  Shared spec constants only: WORD_RE and
    the 2^40 quantization."""
    from collections import Counter
    scale = 1 << 40
    out = []
    for t in texts:
        ws = WORD_RE.findall(t or "")
        n = len(ws)
        if n == 0:
            out.append((0, 0, 0.0))
            continue
        s = 0
        for c in Counter(ws).values():
            s += c * int(math.floor(math.log(c) * scale + 0.5))
        qn = int(math.floor(math.log(n) * scale + 0.5))
        ent_q = n * qn - s
        out.append((n, ent_q, float(ent_q) / float(n * scale)))
    return out


def _synth_pixels_ref(doc_id, h=24, w=32):
    """Mirror of multimodal.synth_image_pixels — INPUT generation, not
    output computation; numpy default_rng is a pinned shared primitive."""
    base = doc_id - 1 if (doc_id % 5 == 0 and doc_id > 0) else doc_id
    rng = np.random.default_rng(int(base) & 0x7FFFFFFF)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    if base != doc_id:
        prng = np.random.default_rng((int(doc_id) & 0x7FFFFFFF) + 10 ** 9)
        mask = prng.random((h, w)) < 0.25
        noise = prng.integers(-12, 13, size=(h, w, 3), dtype=np.int16)
        px = np.clip(px.astype(np.int16) + noise * mask[..., None],
                     0, 255).astype(np.uint8)
    return px


def dhash_ref(doc_id, grid=8):
    """dHash of ONE synthesized image by per-pixel Python loops — the
    independent reference for multimodal.dhash64 (which uses reduceat
    box sums over the decoded BMP; this never encodes/decodes BMP, so a
    match also certifies the engine's encode->decode round-trip).
    Integer spec shared by both: luma (299r+587g+114b)//1000, floor bin
    boundaries i*dim//bins, exact integer cell means, bit = right>left,
    row-major, bit 0 = MSB."""
    px = _synth_pixels_ref(doc_id)
    h, w = px.shape[:2]
    luma = [[(int(px[r][c][0]) * 299 + int(px[r][c][1]) * 587
              + int(px[r][c][2]) * 114) // 1000
             for c in range(w)] for r in range(h)]
    rb = [(i * h) // grid for i in range(grid + 1)]
    cb = [(j * w) // (grid + 1) for j in range(grid + 2)]
    means = []
    for i in range(grid):
        row = []
        for j in range(grid + 1):
            tot = cnt = 0
            for r in range(rb[i], rb[i + 1]):
                for c in range(cb[j], cb[j + 1]):
                    tot += luma[r][c]
                    cnt += 1
            row.append(tot // cnt)
        means.append(row)
    out = 0
    for i in range(grid):
        for j in range(grid):
            out = (out << 1) | (1 if means[i][j + 1] > means[i][j] else 0)
    return out


def image_patches_ref(ids, grid=4):
    """Per-pixel reference for multimodal.ImagePatcher: floor-boundary
    ``grid x grid`` cells over the integer luma, exact sums/counts and
    integer means — never encodes/decodes BMP, so a match also certifies
    the engine's codec round-trip."""
    out = []
    for doc_id in sorted(ids):
        px = _synth_pixels_ref(doc_id)
        h, w = px.shape[:2]
        luma = [[(int(px[r][c][0]) * 299 + int(px[r][c][1]) * 587
                  + int(px[r][c][2]) * 114) // 1000
                 for c in range(w)] for r in range(h)]
        rb = [(i * h) // grid for i in range(grid + 1)]
        cb = [(j * w) // grid for j in range(grid + 1)]
        for i in range(grid):
            for j in range(grid):
                tot = cnt = 0
                for r in range(rb[i], rb[i + 1]):
                    for c in range(cb[j], cb[j + 1]):
                        tot += luma[r][c]
                        cnt += 1
                out.append((doc_id, i, j, tot, cnt, tot // cnt))
    return out


def image_near_dups_ref(ids, max_hamming=7):
    """Brute-force O(n^2) hamming pairs over the per-doc dHashes — the
    independent counterpart of the engine's chunk-pigeonhole banding."""
    hs = [(i, dhash_ref(i)) for i in sorted(ids)]
    pairs = []
    for x in range(len(hs)):
        for y in range(x + 1, len(hs)):
            d = bin(hs[x][1] ^ hs[y][1]).count("1")
            if d <= max_hamming:
                pairs.append((hs[x][0], hs[y][0], d))
    return hs, pairs


def _synth_audio_ref(doc_id, n_samples=2048):
    """Mirror of multimodal.synth_audio_pcm (input generation; default_rng
    is a pinned shared primitive)."""
    base = doc_id - 1 if (doc_id % 4 == 0 and doc_id > 0) else doc_id
    rng = np.random.default_rng((int(base) & 0x7FFFFFFF) ^ 0x5EED)
    pcm = rng.integers(-30000, 30001, size=n_samples).astype(np.int16)
    if base != doc_id:
        prng = np.random.default_rng(
            ((int(doc_id) & 0x7FFFFFFF) ^ 0x5EED) + 2 * 10 ** 9)
        mask = prng.random(n_samples) < 0.10
        noise = prng.integers(-400, 401, size=n_samples).astype(np.int32)
        pcm = np.clip(pcm.astype(np.int32) + noise * mask,
                      -32768, 32767).astype(np.int16)
    return pcm


def audio_fp_ref(doc_id, grid=64):
    """Energy-contour fingerprint by per-sample Python loops — the
    independent reference for multimodal.audio_fp64 (reduceat + integer
    divisions over the decoded WAV); never touches the WAV container, so
    a match also certifies the engine's RIFF chunk-walk decode.  Integer
    spec shared by both: segment boundaries i*n//(grid+1), exact mean
    energy sum//count, bit = next > prev, MSB-first."""
    pcm = [int(v) for v in _synth_audio_ref(doc_id)]
    n = len(pcm)
    if n < grid + 1:
        pcm = pcm + [0] * (grid + 1 - n)
        n = grid + 1
    b = [(i * n) // (grid + 1) for i in range(grid + 2)]
    means = []
    for i in range(grid + 1):
        tot = 0
        for j in range(b[i], b[i + 1]):
            tot += pcm[j] * pcm[j]
        means.append(tot // (b[i + 1] - b[i]))
    out = 0
    for i in range(grid):
        out = (out << 1) | (1 if means[i + 1] > means[i] else 0)
    return out


def audio_near_dups_ref(ids, max_hamming=7):
    """Brute-force hamming pairs over the per-doc audio fingerprints."""
    hs = [(i, audio_fp_ref(i)) for i in sorted(ids)]
    pairs = []
    for x in range(len(hs)):
        for y in range(x + 1, len(hs)):
            d = bin(hs[x][1] ^ hs[y][1]).count("1")
            if d <= max_hamming:
                pairs.append((hs[x][0], hs[y][0], d))
    return hs, pairs


def pca_ref(ids, embs, k=4, scale=1 << 20):
    """Distributed-PCA reference: per-element Python-int loops for the
    quantized sums / covariance / projections (the engine uses one int64
    einsum per batch and an int64 matmul per row).  Shared pinned
    primitives: the floor(x*2^20+0.5) quantization spec and ONE
    driver-side np.linalg.eigh call on the bit-identical covariance
    matrix (a single LAPACK invocation, same role as math.log scalars)."""
    vecs = [[float(np.float64(np.float32(x))) for x in e] for e in embs]
    d = len(vecs[0])
    n = len(vecs)
    q = [[int(math.floor(x * scale + 0.5)) for x in v] for v in vecs]
    sq = [0] * d
    sqq = [[0] * d for _ in range(d)]
    for row in q:
        for i in range(d):
            sq[i] += row[i]
            for j in range(d):
                sqq[i][j] += row[i] * row[j]
    denom = float(n * n * scale * scale)
    cov = np.empty((d, d), dtype=np.float64)
    for i in range(d):
        for j in range(d):
            cov[i, j] = float(n * sqq[i][j] - sq[i] * sq[j]) / denom
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps_q = [[int(math.floor(v[i, c] * scale + 0.5)) for c in order]
               for i in range(d)]
    mean_q = [s // n for s in sq]
    out = []
    div = float(scale) * float(scale)
    for rid, row in zip(ids, q):
        pcs = []
        for c in range(k):
            acc = 0
            for i in range(d):
                acc += (row[i] - mean_q[i]) * comps_q[i][c]
            pcs.append(float(acc) / div)
        out.append((rid, *pcs))
    return out


def bigram_lm_ref(texts, corpus_texts=None):
    """Stupid-backoff bigram LM reference: Counter-built corpus tables +
    per-doc Python loops (the engine builds the tables with distributed
    word_stats/cooccurrence passes and scores via vectorized polars
    joins).  Shared spec: WORD_RE, the 2^40 log quantization
    (floor(ln(x)*2^40+0.5), scalar math.log), ln(0.4) backoff, -ln(N)
    uniform OOV.  ``corpus_texts`` (default: ``texts``) builds the LM
    tables — the golden query scores all docs against the even-id half
    so the backoff and OOV branches actually fire."""
    from collections import Counter
    scale = 1 << 40

    def q(x):
        return int(math.floor(math.log(x) * scale + 0.5))

    uni, bi = Counter(), Counter()
    for t in (corpus_texts if corpus_texts is not None else texts):
        ws = WORD_RE.findall(t or "")
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    docs = [WORD_RE.findall(t or "") for t in texts]
    total = sum(uni.values())
    q_alpha, q_total = q(0.4), q(max(total, 1))
    out = []
    for ws in docs:
        lp = 0
        nb = 0
        for v, w in zip(ws, ws[1:]):
            nb += 1
            cvw = bi.get((v, w), 0)
            if cvw > 0:
                lp += q(cvw) - q(uni[v])
            elif uni.get(w, 0) > 0:
                lp += q_alpha + q(uni[w]) - q_total
            else:
                lp += -q_total
        avg = float(lp) / (float(max(nb, 1)) * float(scale))
        out.append((nb, lp, avg))
    return out


def infer_schema_ref(sf: str) -> str:
    """Expected inferred-schema JSON via the engine's LOCAL single-value
    provider path (malli_ray.provider.provide — the reference-parity
    implementation, itself golden-tested against the ported
    provider_test.cljc corpus).  This is the one fixture that imports an
    engine module: the point of the pin is the cross-check DISTRIBUTED
    accumulate/merge/finalize (provider.infer_dataset) == LOCAL reduce —
    two independent code paths over the same semantics."""
    import json
    sys.path.insert(0, REPO)
    from malli_ray.provider import provide
    t = pq.read_table(f"/root/testdata/{sf}/documents.parquet")
    return json.dumps(provide(t.to_pylist()))


#: BM25 query set — spec constant, mirrored as __ray_entry__._BM25_QUERIES.
BM25_QUERIES = {0: "hash join", 1: "slow scan filter",
                2: "vector column data", 3: "merge sort order"}


def bm25_topk_ref(ids, texts, k=10, k1=1.2, b=0.75):
    """Independent BM25 (Robertson idf): per-doc Counter loops — the
    engine's batched polars/numpy kernels are not used.  Shares only the
    pinned float CONTRACT (operation order) documented in
    malli_ray/stages/text.py bm25_topk, so scores match bit-for-bit."""
    from collections import Counter
    docs = [WORD_RE.findall(t or "") for t in texts]
    n_docs = len(docs)
    avgdl = float(sum(len(w) for w in docs)) / float(n_docs)
    qterms = {qid: q.split() for qid, q in BM25_QUERIES.items()}
    terms = sorted({t for ts in qterms.values() for t in ts})
    df = {t: sum(1 for w in docs if t in w) for t in terms}
    idf = {t: math.log(1.0 + (n_docs - float(df[t]) + 0.5)
                       / (float(df[t]) + 0.5)) for t in terms}
    rows = []
    for qid, ts in qterms.items():
        scored = []
        for did, words in zip(ids, docs):
            cnt = Counter(words)
            dl = float(len(words))
            norm = k1 * ((1.0 - b) + (b * dl) / avgdl)
            s = 0.0
            for t in ts:
                tf = float(cnt[t])
                s = s + idf[t] * (tf * (k1 + 1.0)) / (tf + norm)
            scored.append((s, did))
        scored.sort(key=lambda p: (-p[0], p[1]))
        for r, (s, did) in enumerate(scored[:k], 1):
            rows.append((qid, did, s, r))
    return rows


#: DSIR spec constants — mirrored in __ray_entry__._q_dsir_weights_documents.
DSIR_TARGET_SOURCE = "src0"
DSIR_BUCKETS = 4096
DSIR_ALPHA = 1.0
DSIR_SEED = 11


def dsir_weights_ref(ids, texts, sources):
    """Independent DSIR (Xie et al. 2023): per-doc Python loops and dict
    counters — the engine's bincount/scatter-add kernels are not used.
    Shares the pinned polars hash primitive and the documented float
    contract of sampling.dsir_log_ratio_table (math.log scalars +
    banker's round quantization); everything per-doc is exact int64."""
    B, alpha = DSIR_BUCKETS, DSIR_ALPHA
    scale = float(1 << 40)

    def feats(t):
        ws = WORD_RE.findall(t or "")
        return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]

    def buckets(fs):
        if not fs:
            return []
        h = pl.Series(fs, dtype=pl.Utf8).hash(seed=DSIR_SEED).to_numpy()
        return [int(x) % B for x in h.astype(np.uint64)]

    doc_buckets = [buckets(feats(t)) for t in texts]
    cnt_r = [0] * B
    cnt_t = [0] * B
    for bs, src in zip(doc_buckets, sources):
        for b in bs:
            cnt_r[b] += 1
            if src == DSIR_TARGET_SOURCE:
                cnt_t[b] += 1
    tot_r = float(sum(cnt_r)) + alpha * B
    tot_t = float(sum(cnt_t)) + alpha * B
    lam = [round((math.log((float(cnt_t[b]) + alpha) / tot_t)
                  - math.log((float(cnt_r[b]) + alpha) / tot_r)) * scale)
           for b in range(B)]
    rows = []
    for did, bs in zip(ids, doc_buckets):
        wq = 0
        for b in bs:
            wq += lam[b]
        rows.append((did, len(bs), wq, float(wq) / scale))
    return rows


#: NB classifier spec constants — mirrored in
#: __ray_entry__._q_nb_classify_documents.
NB_POS_SOURCES = ("src0", "src1", "src2", "src3")
NB_BUCKETS = 4096
NB_ALPHA = 1.0
NB_SEED = 11


def nb_classify_ref(ids, texts, sources):
    """Independent hashed Naive-Bayes classifier (the CCNet/fastText
    quality-filter shape): per-doc Python loops and list counters — the
    engine's bincount/scatter-add kernels are not used.  Shares the
    pinned polars hash primitive and the documented float contract of
    text.train_nb_classifier (math.log scalars + banker's round
    quantization); everything per-doc is exact int64."""
    B, alpha = NB_BUCKETS, NB_ALPHA
    scale = float(1 << 40)

    def feats(t):
        ws = WORD_RE.findall(t or "")
        return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]

    def buckets(fs):
        if not fs:
            return []
        h = pl.Series(fs, dtype=pl.Utf8).hash(seed=NB_SEED).to_numpy()
        return [int(x) % B for x in h.astype(np.uint64)]

    doc_buckets = [buckets(feats(t)) for t in texts]
    pos = [s in NB_POS_SOURCES for s in sources]
    n_pos = sum(pos)
    n_neg = len(pos) - n_pos
    cnt_p = [0] * B
    cnt_n = [0] * B
    for bs, p in zip(doc_buckets, pos):
        tgt = cnt_p if p else cnt_n
        for b in bs:
            tgt[b] += 1
    tot_p = float(sum(cnt_p)) + alpha * B
    tot_n = float(sum(cnt_n)) + alpha * B
    lam = [round((math.log((float(cnt_p[b]) + alpha) / tot_p)
                  - math.log((float(cnt_n[b]) + alpha) / tot_n)) * scale)
           for b in range(B)]
    prior = round((math.log(float(n_pos)) - math.log(float(n_neg))) * scale)
    rows = []
    for did, bs in zip(ids, doc_buckets):
        wq = prior
        for b in bs:
            wq += lam[b]
        rows.append((did, len(bs), wq, float(wq) / scale,
                     1 if wq > 0 else 0))
    return rows


#: logistic-regression fixture hyperparameters — mirrored by
#: __ray_entry__._q_logreg_classify_documents.
LR_BUCKETS = 4096
LR_SEED = 11
LR_EPOCHS = 8
LR_RATE = 2.0
LR_L2 = 0.0
LR_RESID_SCALE = float(1 << 20)


def logreg_classify_ref(ids, texts, sources):
    """Independent hashed logistic-regression reference (full-batch GD,
    the trainable fastText/CCNet filter shape): per-doc Python loops for
    feature extraction, scalar float accumulation in document order for
    logits, and Python-int gradient counters — the engine's np.add.at
    scatter kernels are not used.  Shares the pinned primitives of
    text.train_logreg_classifier's documented contract: polars hash,
    elementwise np.exp/np.log/np.round, and the driver-side float64
    vector update; per-doc residual/loss quantization to int64 at 2^20
    makes the gradient reduction order-free on both sides."""
    B, T, lr, l2 = LR_BUCKETS, LR_EPOCHS, LR_RATE, LR_L2
    scale = LR_RESID_SCALE

    def buckets(fs):
        if not fs:
            return []
        h = pl.Series(fs, dtype=pl.Utf8).hash(seed=LR_SEED).to_numpy()
        return [int(x) % B for x in h.astype(np.uint64)]

    # engine addition order: ALL unigrams (text order), then ALL bigrams
    doc_feats = []
    for t in texts:
        ws = WORD_RE.findall(t or "")
        doc_feats.append(buckets(ws)
                         + buckets([f"{a} {b}" for a, b in zip(ws, ws[1:])]))
    nf = np.array([len(fs) for fs in doc_feats], dtype=np.int64)
    y = np.array([s in NB_POS_SOURCES for s in sources], dtype=np.float64)
    n = len(ids)

    def doc_logits(w, bias):
        zs = []
        for fs in doc_feats:
            s = 0.0
            for b in fs:
                s += w[b]
            zs.append(s)
        return bias + np.array(zs, dtype=np.float64) / np.maximum(nf, 1)

    w = np.zeros(B, dtype=np.float64)
    bias = 0.0
    for _ in range(T):
        z = doc_logits(w, bias)
        sig = 1.0 / (1.0 + np.exp(-z))
        resid = sig - y
        rq = np.round(resid / np.maximum(nf, 1) * scale).astype(np.int64)
        rq_bias = np.round(resid * scale).astype(np.int64)
        g = [0] * B
        gb = 0
        for d, fs in enumerate(doc_feats):
            for b in fs:
                g[b] += int(rq[d])
            gb += int(rq_bias[d])
        gf = np.array(g, dtype=np.float64) / scale
        w = w - lr * (gf / n + l2 * w)
        bias = bias - lr * (float(gb) / scale / n)

    z = doc_logits(w, bias)
    q = float(1 << 40)
    zq = np.round(z * q).astype(np.int64)
    prob = 1.0 / (1.0 + np.exp(-(zq.astype(np.float64) / q)))
    return [(did, int(nf[i]), int(zq[i]), float(prob[i]),
             1 if zq[i] > 0 else 0) for i, did in enumerate(ids)]


def incremental_near_dup_ref(ids, texts, num_perm=128, bands=16,
                             shingle_k=3, seed=42):
    """Independent cross-run band-digest reference: per-doc Python-int
    FNV band combining over minhash_signature_doc signatures (the
    engine's vectorized _band_digest_keys is not imported).  Old corpus
    = even doc ids; probe = odd; a probe doc is a candidate iff any of
    its band keys is in the old key set."""
    MASK = (1 << 64) - 1
    PRIME = 0x100000001B3
    BASIS = 0xCBF29CE484222325
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE, num_perm, dtype=np.uint64)
    b = rng.integers(0, MERSENNE, num_perm, dtype=np.uint64)
    r = num_perm // bands

    def doc_keys(text):
        sig = minhash_signature_doc(text, a, b, shingle_k)
        keys = []
        for bb in range(bands):
            h = BASIS
            for v in sig[bb * r:(bb + 1) * r]:
                h = ((h * PRIME) & MASK) ^ int(v)
            keys.append(((h * PRIME) & MASK) ^ bb)
        return keys

    old = set()
    for did, t in zip(ids, texts):
        if did % 2 == 0:
            old.update(doc_keys(t))
    rows = []
    for did, t in zip(ids, texts):
        if did % 2 == 0:
            continue
        hits = sum(1 for k in doc_keys(t) if k in old)
        rows.append((did, hits, hits > 0))
    return rows


def approx_distinct_ref(groups, values, p=12):
    """Independent per-group HyperLogLog (Flajolet et al. 2007): the
    standard alpha_m bias-corrected harmonic estimator with the
    linear-counting small-range branch, exact integer register arithmetic
    (bit_length rank — the engine's float frexp rank agrees except on
    astronomically unlikely 2^52-rounding edges, which this drift guard
    would surface).  Hashes are polars Series.hash seed 0 (the engine's
    hash64 contract).  Null values are skipped (COUNT DISTINCT
    semantics); a group whose values are all null reports 0."""
    m = 1 << p
    hashes = pl.Series(values).hash(seed=0).to_list()
    regs: dict = {}
    for g, v, h in zip(groups, values, hashes):
        r = regs.setdefault(g, [0] * m)
        if v is None:
            continue
        idx = h >> (64 - p)
        rest = ((h << p) & ((1 << 64) - 1)) | ((1 << p) - 1)
        rank = 64 - rest.bit_length() + 1
        if rank > r[idx]:
            r[idx] = rank
    out = []
    for g, r in regs.items():
        s = float(np.sum(np.exp2(-np.asarray(r, dtype=np.float64))))
        est = (0.7213 / (1 + 1.079 / m)) * m * m / s
        zeros = r.count(0)
        if est <= 2.5 * m and zeros > 0:
            est = m * math.log(m / zeros)
        out.append((g, int(round(est))))
    return sorted(out)


def validate_sequences_ref(seq_dir):
    """Independent reconstruction of the validate_sequences report's
    deterministic columns over the north-rule sequences table:

    - n_rows / n_valid / n_violations via DuckDB, spelling out the
      schema paths (doc_id string min-1, tokens vector min-1 of
      int [0, 50256] with one explain entry PER bad element, n_tok int
      min-1, source enum) plus the two job checks (n_tok consistency,
      referential source) — one violation entry per failing path, the
      engine's explain_table contract;
    - distinct_doc_id via :func:`approx_distinct_ref` (pure-Python
      integer HLL over the pinned polars hash) — bit-equal to the
      engine's register-max-merged estimate because HLL registers are
      order- and partition-insensitive.

    The t-digest quantile is NOT reproduced here: its compression is
    batch-layout-dependent (rounded p50 measured 243 vs 244 across
    num_cpus on the same table), which is exactly why the query exposes
    only the deterministic columns."""
    import glob

    import duckdb

    pat = os.path.join(seq_dir, "*.parquet")
    allowed = "('web', 'books', 'code', 'wiki', 'news')"
    row = duckdb.connect().execute(f"""
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN
                     doc_id IS NOT NULL AND length(doc_id) >= 1
                     AND tokens IS NOT NULL AND len(tokens) >= 1
                     AND len(list_filter(tokens,
                         t -> t IS NULL OR t < 0 OR t > 50256)) = 0
                     AND n_tok IS NOT NULL AND n_tok >= 1
                     AND source IN {allowed}
                     AND COALESCE(len(tokens) = n_tok, FALSE)
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
               CAST(SUM(
                   CASE WHEN doc_id IS NULL OR length(doc_id) < 1
                        THEN 1 ELSE 0 END
                 + CASE WHEN tokens IS NULL OR len(tokens) < 1
                        THEN 1 ELSE 0 END
                 + COALESCE(len(list_filter(tokens,
                       t -> t IS NULL OR t < 0 OR t > 50256)), 0)
                 + CASE WHEN n_tok IS NULL OR n_tok < 1
                        THEN 1 ELSE 0 END
                 + CASE WHEN source IS NULL OR source NOT IN {allowed}
                        THEN 1 ELSE 0 END
                 + CASE WHEN COALESCE(len(tokens) = n_tok, FALSE)
                        THEN 0 ELSE 1 END
                 + CASE WHEN source IS NULL OR source NOT IN {allowed}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
          FROM read_parquet('{pat}')""").fetchone()
    doc_ids = []
    for p in sorted(glob.glob(pat)):
        doc_ids.extend(pq.read_table(p, columns=["doc_id"])
                       .column("doc_id").to_pylist())
    (_, distinct), = approx_distinct_ref(["all"] * len(doc_ids), doc_ids)
    return {"n_rows": int(row[0]), "n_valid": int(row[1]),
            "n_violations": int(row[2]), "distinct_doc_id": int(distinct)}


def split_by_domain_ref(ids, texts, seed=3343):
    """Leakage-safe domain split reference: FIRST URL's host per doc via
    python-re (independent of the engine's polars str.extract), hash64 =
    polars Series.hash (the pinned primitive), cumulative thresholds
    recomputed independently of sampling.split_thresholds."""
    url_re = re.compile(r"https?://[^\t\n\f\r ]+")
    host_re = re.compile(r"^https?://([^/?#]+)")
    fractions = [("train", 0.9), ("valid", 0.05), ("test", 0.05)]
    cum, th = 0.0, []
    for label, f in fractions:
        cum = cum + float(f)
        th.append((label, math.floor(cum * 4294967296.0)))
    th[-1] = (th[-1][0], 4294967296)
    domains = []
    for i, t in zip(ids, texts):
        # the deterministic URL injection mirrored from the engine query
        # (plain python f-strings vs the engine's arrow binary_join)
        t = t or ""
        if i % 5 == 0:
            t = f"http://Host-{i % 7}.Example.ORG/a " + t
        elif i % 3 == 0:
            t = t + f" https://site-{i % 97}.example.com/p"
        m = url_re.search(t)
        if not m:
            domains.append(None)
            continue
        h = host_re.match(m.group(0))
        domains.append(h.group(1).lower() if h else None)
    hs = (pl.Series(domains, dtype=pl.String).hash(seed=seed)
          .to_numpy().astype(np.uint64) % np.uint64(4294967296))
    out = []
    for i, d, h in zip(ids, domains, hs):
        for label, bound in th:
            if int(h) < bound:
                out.append((i, d, label))
                break
    return out


def spfhp_pack_ref(ids, lengths, max_len):
    """Independent per-doc SPFHP reference (same deterministic batched
    spec as stages/packing.spfhp_plan, naive machinery: explicit pack-id
    LISTS per group, linear scans for the smallest-remaining eligible
    group, direct per-row assignment — no histogram, no numpy, no range
    arithmetic, no event plan).  Spec: lengths descend from max_len;
    each step fills min(c, len(group)) packs of the chosen group
    one-per-pack (smallest remaining >= L, ties earliest-created,
    lowest pack ids first); no fit -> open new packs; the filled packs
    split off as a new group appended in creation order; docs of equal
    length consume ranks in (length, id, input-position) order."""
    by_len = {}
    for pos, (i, L) in enumerate(zip(ids, lengths)):
        if L < 1 or L > max_len:
            raise ValueError("spfhp_pack_ref: length out of range")
        by_len.setdefault(L, []).append((i, pos))
    for L in by_len:
        by_len[L].sort()
    groups = []  # [{"rem": int, "packs": [pack ids]}], creation order
    assign = {}  # input position -> pack id
    next_pack = 0
    for L in range(max_len, 0, -1):
        docs = by_len.get(L, [])
        pos = 0
        while pos < len(docs):
            best = None
            for g in groups:
                if g["rem"] >= L and (best is None
                                      or g["rem"] < best["rem"]):
                    best = g
            c = len(docs) - pos
            if best is None:
                taken = list(range(next_pack, next_pack + c))
                next_pack += c
                k = c
            else:
                k = min(c, len(best["packs"]))
                taken = best["packs"][:k]
                best["packs"] = best["packs"][k:]
                if not best["packs"]:
                    groups.remove(best)
            for (_, p), pk in zip(docs[pos:pos + k], taken):
                assign[p] = pk
            rem = (max_len if best is None else best["rem"]) - L
            if rem >= 1:
                groups.append({"rem": rem, "packs": taken})
            pos += k
    return [(i, L, assign[pos])
            for pos, (i, L) in enumerate(zip(ids, lengths))]


def main(sfs=("sf0.001", "sf0.01")):
    for sf in sfs:
        src = f"/root/testdata/{sf}/documents.parquet"
        docs = pq.read_table(src, columns=["doc_id", "text"])
        ids = docs.column("doc_id").to_pylist()
        texts = docs.column("text").to_pylist()
        outdir = os.path.join(REPO, "fixtures", "golden", sf)
        os.makedirs(outdir, exist_ok=True)

        fp = [str(fingerprint_doc(t)) for t in texts]
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                      "fingerprint": pa.array(fp, type=pa.string())}),
            os.path.join(outdir, "fingerprint_documents.parquet"))

        sh = [str(simhash_doc(t)) for t in texts]
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                      "simhash": pa.array(sh, type=pa.string())}),
            os.path.join(outdir, "simhash_documents.parquet"))

        pairs = minhash_pairs(ids, texts)
        pq.write_table(
            pa.table({"id_a": pa.array([p[0] for p in pairs], type=pa.int64()),
                      "id_b": pa.array([p[1] for p in pairs], type=pa.int64()),
                      "est_jaccard": pa.array([p[2] for p in pairs],
                                              type=pa.float64())}),
            os.path.join(outdir, "minhash_dedup_documents.parquet"))
        spairs = simhash_verified_pairs(ids, texts)
        pq.write_table(
            pa.table({"id_a": pa.array([p[0] for p in spairs], type=pa.int64()),
                      "id_b": pa.array([p[1] for p in spairs], type=pa.int64()),
                      "jaccard": pa.array([p[2] for p in spairs],
                                          type=pa.float64())}),
            os.path.join(outdir, "near_dup_pairs_simhash.parquet"))

        et = pq.read_table(f"/root/testdata/{sf}/embeddings.parquet",
                           columns=["vec_id", "embedding"])
        eids = et.column("vec_id").to_pylist()
        epairs = embedding_pairs(eids, et.column("embedding").to_pylist())
        pq.write_table(
            pa.table({"id_a": pa.array([p[0] for p in epairs], type=pa.int64()),
                      "id_b": pa.array([p[1] for p in epairs], type=pa.int64()),
                      "cosine": pa.array([p[2] for p in epairs],
                                         type=pa.float64())}),
            os.path.join(outdir, "embedding_near_dups.parquet"))
        sempairs = semantic_dedup_pairs_ref(eids,
                                            et.column("embedding").to_pylist())
        pq.write_table(
            pa.table({"id_a": pa.array([p[0] for p in sempairs],
                                       type=pa.int64()),
                      "id_b": pa.array([p[1] for p in sempairs],
                                       type=pa.int64()),
                      "cosine": pa.array([p[2] for p in sempairs],
                                         type=pa.float64())}),
            os.path.join(outdir, "semantic_dedup_embeddings.parquet"))
        pq.write_table(
            pa.table({"schema_form": pa.array([infer_schema_ref(sf)],
                                              type=pa.string())}),
            os.path.join(outdir, "infer_schema_documents.parquet"))
        merges = bpe_merges_ref(texts)
        pq.write_table(
            pa.table({"rank": pa.array([m[0] for m in merges],
                                       type=pa.int32()),
                      "left": pa.array([m[1] for m in merges],
                                       type=pa.string()),
                      "right": pa.array([m[2] for m in merges],
                                        type=pa.string()),
                      "pair_count": pa.array([m[3] for m in merges],
                                             type=pa.int64())}),
            os.path.join(outdir, "bpe_merges_documents.parquet"))
        enc = bpe_encode_ref(texts, merges)
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                      "n_bpe": pa.array([e[0] for e in enc],
                                        type=pa.int64()),
                      "bpe_text": pa.array([e[1] for e in enc],
                                           type=pa.string())}),
            os.path.join(outdir, "bpe_tokenize_documents.parquet"))
        comp = compression_ref(texts)
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                      "n_bytes": pa.array([c[0] for c in comp],
                                          type=pa.int64()),
                      "n_compressed": pa.array([c[1] for c in comp],
                                               type=pa.int64()),
                      "compression_ratio": pa.array([c[2] for c in comp],
                                                    type=pa.float64())}),
            os.path.join(outdir, "compression_documents.parquet"))
        ent = entropy_ref(texts)
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                      "n_words": pa.array([e[0] for e in ent],
                                          type=pa.int64()),
                      "ent_q": pa.array([e[1] for e in ent],
                                        type=pa.int64()),
                      "entropy": pa.array([e[2] for e in ent],
                                          type=pa.float64())}),
            os.path.join(outdir, "entropy_documents.parquet"))
        patches = image_patches_ref(ids)
        pq.write_table(
            pa.table({"doc_id": pa.array([p[0] for p in patches],
                                         type=pa.int64()),
                      "patch_row": pa.array([p[1] for p in patches],
                                            type=pa.int64()),
                      "patch_col": pa.array([p[2] for p in patches],
                                            type=pa.int64()),
                      "luma_sum": pa.array([p[3] for p in patches],
                                           type=pa.int64()),
                      "n_px": pa.array([p[4] for p in patches],
                                       type=pa.int64()),
                      "luma_mean": pa.array([p[5] for p in patches],
                                            type=pa.int64())}),
            os.path.join(outdir, "image_patches_documents.parquet"))
        hs, ipairs = image_near_dups_ref(ids)
        pq.write_table(
            pa.table({"doc_id": pa.array([h[0] for h in hs],
                                         type=pa.int64()),
                      "dhash": pa.array(
                          [v - (1 << 64) if v >= (1 << 63) else v
                           for _, v in hs], type=pa.int64())}),
            os.path.join(outdir, "image_dhash_documents.parquet"))
        pq.write_table(
            pa.table({"id_a": pa.array([p[0] for p in ipairs],
                                       type=pa.int64()),
                      "id_b": pa.array([p[1] for p in ipairs],
                                       type=pa.int64()),
                      "hamming": pa.array([p[2] for p in ipairs],
                                          type=pa.int32())}),
            os.path.join(outdir, "image_near_dups.parquet"))
        ahs, apairs = audio_near_dups_ref(ids)
        pq.write_table(
            pa.table({"doc_id": pa.array([h[0] for h in ahs],
                                         type=pa.int64()),
                      "audio_fp": pa.array(
                          [v - (1 << 64) if v >= (1 << 63) else v
                           for _, v in ahs], type=pa.int64())}),
            os.path.join(outdir, "audio_fp_documents.parquet"))
        pq.write_table(
            pa.table({"id_a": pa.array([p[0] for p in apairs],
                                       type=pa.int64()),
                      "id_b": pa.array([p[1] for p in apairs],
                                       type=pa.int64()),
                      "hamming": pa.array([p[2] for p in apairs],
                                          type=pa.int32())}),
            os.path.join(outdir, "audio_near_dups.parquet"))
        blm = bigram_lm_ref(texts, [t for i, t in zip(ids, texts)
                                    if i % 2 == 0])
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                      "n_bigrams": pa.array([b[0] for b in blm],
                                            type=pa.int64()),
                      "lp_q": pa.array([b[1] for b in blm],
                                       type=pa.int64()),
                      "avg_logprob": pa.array([b[2] for b in blm],
                                              type=pa.float64())}),
            os.path.join(outdir, "bigram_lm_documents.parquet"))
        et0 = pq.read_table(f"/root/testdata/{sf}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
        pcr = pca_ref(et0.column("vec_id").to_pylist(),
                      et0.column("embedding").to_pylist())
        pq.write_table(
            pa.table({"vec_id": pa.array([r[0] for r in pcr],
                                         type=pa.int64()),
                      **{f"pc{j + 1}": pa.array([r[j + 1] for r in pcr],
                                                type=pa.float64())
                         for j in range(4)}}),
            os.path.join(outdir, "pca_embeddings.parquet"))
        annj = ann_join_ref(eids, et.column("embedding").to_pylist())
        pq.write_table(
            pa.table({"query_id": pa.array([p[0] for p in annj],
                                           type=pa.int64()),
                      "match_id": pa.array([p[1] for p in annj],
                                           type=pa.int64())}),
            os.path.join(outdir, "ann_join_embeddings.parquet"))
        ivfpq = ivfpq_topk_ref(eids, et.column("embedding").to_pylist())
        pq.write_table(
            pa.table({"query_id": pa.array([p[0] for p in ivfpq],
                                           type=pa.int32()),
                      "vec_id": pa.array([p[1] for p in ivfpq],
                                         type=pa.int64())}),
            os.path.join(outdir, "ivfpq_topk_embeddings.parquet"))
        pqr = pq_topk_ref(eids, et.column("embedding").to_pylist())
        pq.write_table(
            pa.table({"query_id": pa.array([p[0] for p in pqr],
                                           type=pa.int32()),
                      "vec_id": pa.array([p[1] for p in pqr],
                                         type=pa.int64())}),
            os.path.join(outdir, "pq_topk_embeddings.parquet"))
        ivf = ivf_topk_ref(eids, et.column("embedding").to_pylist())
        pq.write_table(
            pa.table({"query_id": pa.array([p[0] for p in ivf],
                                           type=pa.int32()),
                      "vec_id": pa.array([p[1] for p in ivf],
                                         type=pa.int64())}),
            os.path.join(outdir, "ivf_topk_embeddings.parquet"))
        srcs = pq.read_table(src, columns=["source"]) \
            .column("source").to_pylist()
        dw = dsir_weights_ref(ids, texts, srcs)
        pq.write_table(
            pa.table({"doc_id": pa.array([r[0] for r in dw],
                                         type=pa.int64()),
                      "n_features": pa.array([r[1] for r in dw],
                                             type=pa.int64()),
                      "log_weight_q": pa.array([r[2] for r in dw],
                                               type=pa.int64()),
                      "log_weight": pa.array([r[3] for r in dw],
                                             type=pa.float64())}),
            os.path.join(outdir, "dsir_weights_documents.parquet"))

        nbr = nb_classify_ref(ids, texts, srcs)
        pq.write_table(
            pa.table({"doc_id": pa.array([r[0] for r in nbr],
                                         type=pa.int64()),
                      "n_features": pa.array([r[1] for r in nbr],
                                             type=pa.int64()),
                      "logit_q": pa.array([r[2] for r in nbr],
                                          type=pa.int64()),
                      "logit": pa.array([r[3] for r in nbr],
                                        type=pa.float64()),
                      "pred": pa.array([r[4] for r in nbr],
                                       type=pa.int64())}),
            os.path.join(outdir, "nb_classify_documents.parquet"))

        inr = incremental_near_dup_ref(ids, texts)
        pq.write_table(
            pa.table({"doc_id": pa.array([r[0] for r in inr],
                                         type=pa.int64()),
                      "n_band_hits": pa.array([r[1] for r in inr],
                                              type=pa.int64()),
                      "candidate": pa.array([r[2] for r in inr],
                                            type=pa.bool_())}),
            os.path.join(outdir, "incremental_near_dup_documents.parquet"))

        lrr = logreg_classify_ref(ids, texts, srcs)
        pq.write_table(
            pa.table({"doc_id": pa.array([r[0] for r in lrr],
                                         type=pa.int64()),
                      "n_features": pa.array([r[1] for r in lrr],
                                             type=pa.int64()),
                      "logit_q": pa.array([r[2] for r in lrr],
                                          type=pa.int64()),
                      "prob": pa.array([r[3] for r in lrr],
                                       type=pa.float64()),
                      "pred": pa.array([r[4] for r in lrr],
                                       type=pa.int64())}),
            os.path.join(outdir, "logreg_classify_documents.parquet"))

        bm = bm25_topk_ref(ids, texts)
        pq.write_table(
            pa.table({"query_id": pa.array([r[0] for r in bm],
                                           type=pa.int64()),
                      "doc_id": pa.array([r[1] for r in bm],
                                         type=pa.int64()),
                      "score": pa.array([r[2] for r in bm],
                                        type=pa.float64()),
                      "rank": pa.array([r[3] for r in bm],
                                       type=pa.int64())}),
            os.path.join(outdir, "bm25_topk_documents.parquet"))
        # value = event_id: distinct-per-type is ~N/5, which exercises the
        # bias-corrected harmonic branch at sf0.01 AND the linear-counting
        # small-range branch at sf0.001 (user_id saturates: every type
        # sees every user, a degenerate all-equal fixture)
        ev = pq.read_table(f"/root/testdata/{sf}/events.parquet",
                           columns=["event_type", "event_id"])
        ad = approx_distinct_ref(ev.column("event_type").to_pylist(),
                                 ev.column("event_id").to_pylist())
        pq.write_table(
            pa.table({"event_type": pa.array([r[0] for r in ad],
                                             type=pa.string()),
                      "approx_distinct": pa.array([r[1] for r in ad],
                                                  type=pa.int64())}),
            os.path.join(outdir, "approx_distinct_events.parquet"))

        if REPO not in sys.path:
            sys.path.insert(0, REPO)
        from malli_ray.sources.sequences import (ensure_sequences,
                                                 sequences_dir_for)
        seq_dir, seq_n = sequences_dir_for(float(sf[2:]))
        ensure_sequences(seq_dir, seq_n)
        import glob as _glob
        seq = pa.concat_tables([
            pq.read_table(p, columns=["doc_id", "tokens"])
            for p in sorted(_glob.glob(os.path.join(seq_dir, "*.parquet")))])
        seq_ids = seq.column("doc_id").to_pylist()
        seq_lens = [min(len(t), 2048) for t in seq.column("tokens").to_pylist()]
        packed = spfhp_pack_ref(seq_ids, seq_lens, 2048)
        pq.write_table(
            pa.table({"doc_id": pa.array([r[0] for r in packed],
                                         type=pa.string()),
                      "length": pa.array([r[1] for r in packed],
                                         type=pa.int64()),
                      "pack_id": pa.array([r[2] for r in packed],
                                          type=pa.int64())}),
            os.path.join(outdir, "pack_sequences.parquet"))

        vs = validate_sequences_ref(seq_dir)
        pq.write_table(
            pa.table({k: pa.array([v], type=pa.int64())
                      for k, v in vs.items()}),
            os.path.join(outdir, "validate_sequences.parquet"))

        sbd = split_by_domain_ref(ids, texts)
        pq.write_table(
            pa.table({"doc_id": pa.array([r[0] for r in sbd],
                                         type=pa.int64()),
                      "domain": pa.array([r[1] for r in sbd],
                                         type=pa.string()),
                      "split": pa.array([r[2] for r in sbd],
                                        type=pa.string())}),
            os.path.join(outdir, "split_by_domain_documents.parquet"))

        print(f"{sf}: {len(fp)} fingerprints, {len(sh)} simhashes, "
              f"{len(pairs)} minhash pairs, {len(spairs)} simhash pairs, "
              f"{len(epairs)} embedding pairs, {len(sempairs)} semantic "
              f"pairs, 1 inferred schema -> {outdir}")


if __name__ == "__main__":
    main(sys.argv[1:] or ("sf0.001", "sf0.01"))
