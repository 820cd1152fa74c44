"""Tokenized (sequence-table) dedup family: exact Horner-packed token
k-grams, TokenMinHasher LSH, exact token-Jaccard verify, sequence-level
exact dedup, and per-row type/token stats — each pinned against an
independent per-row Python/pandas rederivation."""

import numpy as np
import pyarrow as pa
import pytest

from malli_ray.stages.dedup import (TokenMinHasher, exact_dup_counts,
                                    minhash_lsh_candidates, token_grams,
                                    token_jaccard_verify)

VOCAB = 50257


def _ref_grams(row, k=3, vocab=VOCAB):
    if len(row) >= k:
        out = []
        for i in range(len(row) - k + 1):
            g = 0
            for t in row[i:i + k]:
                g = g * vocab + t
            out.append(g)
        return out
    g = 0
    for t in row:
        g = g * vocab + t
    return [g]


def test_token_grams_matches_reference():
    rng = np.random.default_rng(7)
    rows = [rng.integers(0, VOCAB, rng.integers(0, 30)).tolist()
            for _ in range(200)]
    rows[3] = []          # empty
    rows[10] = [5]        # len 1
    rows[11] = [5, 9]     # len 2
    col = pa.array(rows, type=pa.list_(pa.int32()))
    grams, starts = token_grams(col, 3, VOCAB)
    bounds = list(starts) + [len(grams)]
    for i, row in enumerate(rows):
        got = grams[bounds[i]:bounds[i + 1]].tolist()
        assert got == _ref_grams(row), f"row {i}"


def test_token_grams_null_rows_read_as_empty():
    col = pa.array([[1, 2, 3, 4], None, [9]], type=pa.list_(pa.int32()))
    grams, starts = token_grams(col, 3, VOCAB)
    bounds = list(starts) + [len(grams)]
    assert grams[bounds[1]:bounds[2]].tolist() == [0]


def test_token_grams_overflow_and_range_raise():
    col = pa.array([[1, 2, 3]], type=pa.list_(pa.int32()))
    with pytest.raises(ValueError, match="overflows"):
        token_grams(col, 5, VOCAB)
    bad = pa.array([[1, 2, VOCAB]], type=pa.list_(pa.int32()))
    with pytest.raises(ValueError, match="vocab"):
        token_grams(bad, 3, VOCAB)


def _jaccard(a, b, k=3):
    sa, sb = set(_ref_grams(a, k)), set(_ref_grams(b, k))
    return len(sa & sb) / len(sa | sb)


def test_token_minhash_near_dup_end_to_end(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(11)
    rows, ids = [], []
    for i in range(40):
        rows.append(rng.integers(0, VOCAB, 120).tolist())
        ids.append(f"s{i:03d}")
    # three near-dup prefix copies + one exact copy
    for i in (2, 17, 33):
        rows.append(rows[i][:100])
        ids.append(f"s{i:03d}~t")
    rows.append(list(rows[5]))
    ids.append("s005~c")
    t = pa.table({"doc_id": pa.array(ids),
                  "tokens": pa.array(rows, type=pa.list_(pa.int32()))})
    ds = rd.from_arrow(t).repartition(4)
    cands = minhash_lsh_candidates(ds, "tokens", "doc_id", threshold=0.2,
                                   num_perm=64, bands=32, hash_buckets=512,
                                   fail_on_truncation=True, dedupe=False,
                                   token_mode=True, vocab=VOCAB)
    got = token_jaccard_verify(cands, ds, "tokens", "doc_id",
                               threshold=0.5).to_pandas()
    got = got.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    # brute-force reference over all pairs
    exp = []
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            jac = _jaccard(rows[i], rows[j])
            if jac >= 0.5:
                lo, hi = sorted((ids[i], ids[j]))
                exp.append((lo, hi, jac))
    exp.sort()
    assert [tuple(r) for r in got.itertuples(index=False)] == exp
    assert len(exp) == 4


def test_exact_dup_counts_on_token_lists(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(3)
    base = [rng.integers(0, VOCAB, 8).tolist() for _ in range(30)]
    rows = base + [base[4], base[4], base[9]]
    ids = [f"d{i:03d}" for i in range(len(rows))]
    t = pa.table({"doc_id": pa.array(ids),
                  "tokens": pa.array(rows, type=pa.list_(pa.int32()))})
    got = (exact_dup_counts(rd.from_arrow(t).repartition(3),
                            "tokens", "doc_id")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    import pandas as pd
    ref = (pd.DataFrame({"doc_id": ids,
                         "key": [tuple(r) for r in rows]})
           .groupby("key")["doc_id"].agg(["min", "count"])
           .rename(columns={"min": "doc_id", "count": "n_copies"})
           .sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == ref["doc_id"].tolist()
    assert got["n_copies"].tolist() == ref["n_copies"].tolist()
    assert got["n_copies"].sum() == len(rows)


def test_token_type_stats_matches_reference(ray_session):
    import ray.data as rd
    from malli_ray.stages.text import token_type_stats
    rng = np.random.default_rng(5)
    rows = [rng.integers(0, 50, rng.integers(1, 40)).tolist()
            for _ in range(100)]
    rows[7] = [3] * 20          # degenerate repetition
    ids = [f"d{i:03d}" for i in range(len(rows))]
    t = pa.table({"doc_id": pa.array(ids),
                  "tokens": pa.array(rows, type=pa.list_(pa.int32()))})
    got = (token_type_stats(rd.from_arrow(t).repartition(4),
                            "tokens", "doc_id")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    for i, row in enumerate(rows):
        assert got.loc[i, "n_tok"] == len(row)
        assert got.loc[i, "n_distinct"] == len(set(row))
        assert got.loc[i, "n_repeated"] == len(row) - len(set(row))
        assert got.loc[i, "ttr"] == len(set(row)) / len(row)
    assert got.loc[7, "ttr"] == 0.05


def test_token_type_stats_empty_row_and_id_bounds(ray_session):
    """Empty/null token rows emit NULL ttr (matching SQL's 0/0 -> NULL);
    ids >= 2**32 raise instead of silently corrupting the row<<32 pack."""
    import pytest
    import ray.data as rd
    from malli_ray.stages.text import token_type_stats

    t = pa.table({"doc_id": pa.array(["a", "b", "c"]),
                  "tokens": pa.array([[1, 1, 2], [], None],
                                     type=pa.list_(pa.int32()))})
    got = (token_type_stats(rd.from_arrow(t), "tokens", "doc_id")
           .to_pandas().set_index("doc_id"))
    assert got.loc["a", "ttr"] == 2 / 3
    assert np.isnan(got.loc["b", "ttr"]) and got.loc["b", "n_tok"] == 0
    assert np.isnan(got.loc["c", "ttr"]) and got.loc["c", "n_distinct"] == 0
    big = pa.table({"doc_id": pa.array(["x"]),
                    "tokens": pa.array([[2 ** 32]],
                                       type=pa.list_(pa.int64()))})
    with pytest.raises(Exception, match="2\\*\\*32"):
        token_type_stats(rd.from_arrow(big), "tokens",
                         "doc_id").to_pandas()


def test_token_minhasher_short_and_empty_rows(ray_session):
    """Short rows sign on their whole-row pack; identical short rows get
    identical signatures (exact-dup candidates), distinct ones don't."""
    h = TokenMinHasher("tokens", "doc_id", num_perm=16, bands=8)
    t = pa.table({"doc_id": pa.array(["a", "b", "c", "d"]),
                  "tokens": pa.array([[7, 8], [7, 8], [9], []],
                                     type=pa.list_(pa.int32()))})
    out = h(t)
    assert out.num_rows == 4 * 8  # bands x rows
    sig = {r["id"]: r["sig"] for r in out.to_pylist() if r["band"] == 0}
    assert sig["a"] == sig["b"]
    assert sig["a"] != sig["c"]


def test_token_span_dedup_matches_bruteforce(ray_session):
    """duplicate_token_spans / remove_duplicate_token_spans vs a per-row
    Python reconstruction of the Lee-2021 semantics (first occurrence of
    each token k-gram by (id, pos) survives; covered tokens drop), over a
    corpus with planted cross-doc and within-doc duplicate runs."""
    import ray.data as rd
    from malli_ray.stages.dedup import (duplicate_token_spans,
                                        remove_duplicate_token_spans)

    rng = np.random.default_rng(11)
    k = 5
    motif = rng.integers(0, 1000, 12).tolist()      # 12 > k: spans merge
    rows, ids = [], []
    for i in range(120):
        body = rng.integers(0, 50_000, int(rng.integers(0, 30))).tolist()
        if i % 4 == 0:       # plant the motif at a random position
            p = int(rng.integers(0, max(len(body) - 1, 1)))
            body = body[:p] + motif + body[p:]
        if i == 7:           # within-doc repetition
            body = body + body[:8]
        if i == 9:           # null row
            body = None
        ids.append(f"d{i:04d}")
        rows.append(body)
    t = pa.table({"doc_id": pa.array(ids),
                  "tokens": pa.array(rows, pa.list_(pa.int32()))})

    # brute-force reference
    first = {}
    for i in sorted(range(len(ids)), key=lambda j: ids[j]):
        toks = rows[i] or []
        for p in range(max(len(toks) - k + 1, 0)):
            first.setdefault(tuple(toks[p:p + k]), (ids[i], p))
    covered = {di: set() for di in ids}
    for i, di in enumerate(ids):
        toks = rows[i] or []
        for p in range(max(len(toks) - k + 1, 0)):
            if first[tuple(toks[p:p + k])] != (di, p):
                covered[di].update(range(p, p + k))

    def ref_spans(di):
        c = sorted(covered[di])
        out, s = [], None
        for a, b in zip(c, c[1:] + [None]):
            if s is None:
                s = a
            if b != a + 1:
                out.append((s, a + 1))
                s = None
        return out

    ds = rd.from_arrow(t).repartition(5)
    got_spans = {}
    for r in duplicate_token_spans(ds, "tokens", "doc_id",
                                   k=k, num_buckets=8).take_all():
        got_spans.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"]))
    for di in ids:
        assert sorted(got_spans.get(di, [])) == ref_spans(di), di

    got = {r["doc_id"]: r for r in remove_duplicate_token_spans(
        ds, "tokens", "doc_id", k=k, num_buckets=8).take_all()}
    assert set(got) == set(ids)
    for i, di in enumerate(ids):
        toks = rows[i] or []
        want = [tk for p, tk in enumerate(toks) if p not in covered[di]]
        assert list(got[di]["tokens_dedup"]) == want, di
        assert got[di]["n_tokens_dropped"] == len(toks) - len(want)


def test_token_jaccard_verify_id_contract_raises(ray_session):
    """Candidate ids missing from the participant set, and duplicated ids
    among participants, both fail loudly instead of scoring a pair
    against a neighbour row's gram set (ADVICE r4)."""
    import ray.data as rd

    rows = [[1, 2, 3, 4, 5], [1, 2, 3, 4, 6], [9, 9, 9, 9, 9]]
    ids = ["a", "b", "c"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids),
        "tokens": pa.array(rows, pa.list_(pa.int32()))}))
    ghost = rd.from_arrow(pa.table({
        "id_a": pa.array(["a"]), "id_b": pa.array(["zz"]),
        "est_jaccard": pa.array([0.9])}))
    with pytest.raises(Exception, match="not found among"):
        token_jaccard_verify(ghost, ds, "tokens", "doc_id",
                             threshold=0.0).to_pandas()
    dup_ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(["a", "a", "b"]),
        "tokens": pa.array(rows, pa.list_(pa.int32()))}))
    pair = rd.from_arrow(pa.table({
        "id_a": pa.array(["a"]), "id_b": pa.array(["b"]),
        "est_jaccard": pa.array([0.9])}))
    with pytest.raises(Exception, match="duplicated"):
        token_jaccard_verify(pair, dup_ds, "tokens", "doc_id",
                             threshold=0.0).to_pandas()


def test_token_span_prefilter_equivalence(ray_session):
    """prefilter=True (the exact dup-gram pre-pass) produces IDENTICAL
    spans and scrubbed tokens to the default path, and the fail-loud
    max_dup_grams cap raises."""
    import ray.data as rd
    from malli_ray.stages.dedup import (duplicate_token_spans,
                                        remove_duplicate_token_spans)

    rng = np.random.default_rng(31)
    motif = rng.integers(0, 1000, 14).tolist()
    rows, ids = [], []
    for i in range(300):
        body = rng.integers(0, 50_000, int(rng.integers(5, 40))).tolist()
        if i % 3 == 0:
            p = int(rng.integers(0, len(body)))
            body = body[:p] + motif + body[p:]
        rows.append(body)
        ids.append(f"d{i:04d}")
    t = pa.table({"doc_id": pa.array(ids),
                  "tokens": pa.array(rows, pa.list_(pa.int32()))})
    ds = rd.from_arrow(t).repartition(5)

    def spans(prefilter):
        return sorted(tuple(r.values()) for r in duplicate_token_spans(
            ds, "tokens", "doc_id", k=5, num_buckets=8,
            prefilter=prefilter).take_all())

    assert spans(True) == spans(False)
    assert len(spans(True)) > 0

    def scrub(prefilter):
        return sorted((r["doc_id"], list(r["tokens_dedup"]),
                       r["n_tokens_dropped"])
                      for r in remove_duplicate_token_spans(
                          ds, "tokens", "doc_id", k=5, num_buckets=8,
                          prefilter=prefilter).take_all())

    assert scrub(True) == scrub(False)

    from malli_ray.stages.dedup import _dup_gram_h1_ref
    with pytest.raises(ValueError, match="max_dup_grams"):
        _dup_gram_h1_ref(ds, "tokens", "doc_id", 5, 8, None, None,
                         True, max_dup_grams=1)


def test_token_span_lists_consistent_with_exploded(ray_session):
    """duplicate_token_span_lists == the grouped view of
    duplicate_token_spans (API parity with the word-level pair)."""
    import ray.data as rd
    from malli_ray.stages.dedup import (duplicate_token_span_lists,
                                        duplicate_token_spans)

    rng = np.random.default_rng(41)
    motif = rng.integers(0, 1000, 12).tolist()
    rows, ids = [], []
    for i in range(150):
        body = rng.integers(0, 50_000, int(rng.integers(4, 30))).tolist()
        if i % 2 == 0:
            body = body + motif
        rows.append(body)
        ids.append(f"d{i:04d}")
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids),
        "tokens": pa.array(rows, pa.list_(pa.int32()))})).repartition(4)
    exploded = {}
    for r in duplicate_token_spans(ds, "tokens", "doc_id", k=5,
                                   num_buckets=8).take_all():
        exploded.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"]))
    lists = {r["doc_id"]: list(zip(r["starts"], r["ends"]))
             for r in duplicate_token_span_lists(
                 ds, "tokens", "doc_id", k=5, num_buckets=8).take_all()}
    assert {k: sorted(v) for k, v in exploded.items()} == \
        {k: sorted(v) for k, v in lists.items()}
    assert len(lists) > 0


def test_remove_token_spans_strategies_identical(ray_session):
    """strategy='broadcast' (payload never shuffles) and
    strategy='exchange' (tag+union co-shuffle) produce IDENTICAL rows,
    keep_columns ride both paths, explicit broadcast above the span cap
    raises, and auto falls back to exchange quietly."""
    import ray.data as rd
    from malli_ray.stages.dedup import remove_duplicate_token_spans

    rng = np.random.default_rng(23)
    k = 4
    motif = rng.integers(0, 500, 9).tolist()
    rows, ids, src = [], [], []
    for i in range(80):
        body = rng.integers(0, 9000, int(rng.integers(0, 25))).tolist()
        if i % 3 == 0:
            p = int(rng.integers(0, max(len(body) - 1, 1)))
            body = body[:p] + motif + body[p:]
        ids.append(f"s{i:03d}")
        rows.append(body if i != 5 else None)
        src.append(f"src{i % 3}")
    t = pa.table({"doc_id": pa.array(ids),
                  "tokens": pa.array(rows, pa.list_(pa.int32())),
                  "source": pa.array(src)})
    ds = rd.from_arrow(t).repartition(4)

    def run(**kw):
        return sorted(remove_duplicate_token_spans(
            ds, "tokens", "doc_id", k=k, num_buckets=8,
            keep_columns=["source"], **kw).take_all(),
            key=lambda r: r["doc_id"])

    bc = run(strategy="broadcast")
    ex = run(strategy="exchange")
    assert len(bc) == len(ids)
    for a, b in zip(bc, ex):
        assert a["doc_id"] == b["doc_id"]
        assert list(a["tokens_dedup"]) == list(b["tokens_dedup"])
        assert a["n_tokens_dropped"] == b["n_tokens_dropped"]
        assert a["source"] == b["source"] != None  # noqa: E711
    # explicit broadcast above the cap fails loudly...
    with pytest.raises(ValueError, match="max_broadcast_spans"):
        run(strategy="broadcast", max_broadcast_spans=1)
    # ...auto above the cap falls back to the exchange output
    assert run(strategy="auto", max_broadcast_spans=1) == ex


def test_remove_word_spans_strategies_identical(ray_session):
    """Word-level sibling: broadcast vs exchange strategies produce
    identical (id, text_dedup, n_words_dropped, keep) rows."""
    import ray.data as rd
    from malli_ray.stages.dedup import remove_duplicate_spans

    rng = np.random.default_rng(31)
    motif = " ".join(f"m{i}" for i in range(7))
    texts, ids, src = [], [], []
    for i in range(60):
        words = [f"w{int(x)}" for x in rng.integers(0, 400, int(
            rng.integers(0, 20)))]
        t = " ".join(words)
        if i % 3 == 0:
            t = (t + " " + motif).strip()
        ids.append(f"w{i:03d}")
        texts.append(t if i != 4 else None)
        src.append(f"s{i % 2}")
    tbl = pa.table({"doc_id": pa.array(ids),
                    "text": pa.array(texts, pa.string()),
                    "source": pa.array(src)})
    ds = rd.from_arrow(tbl).repartition(4)

    def run(**kw):
        return sorted(remove_duplicate_spans(
            ds, "text", "doc_id", k=4, num_buckets=8,
            keep_columns=["source"], **kw).take_all(),
            key=lambda r: r["doc_id"])

    bc = run(strategy="broadcast")
    ex = run(strategy="exchange")
    assert bc == ex and len(bc) == len(ids)
    assert run(strategy="auto", max_broadcast_spans=1) == ex


def test_scrub_probe_token_spans_matches_bruteforce(ray_session):
    """scrub_probe_token_spans vs a per-row Python reconstruction:
    every exact probe window's positions drop (overlaps merge), nothing
    else moves, other columns pass through, and the flag sibling
    (token_ngram_contamination) agrees on which rows were touched."""
    import ray.data as rd
    from malli_ray.stages.text import (scrub_probe_token_spans,
                                       token_ngram_contamination)

    rng = np.random.default_rng(41)
    k = 4
    probes = [rng.integers(0, 300, k).tolist() for _ in range(3)]
    rows, ids, src = [], [], []
    for i in range(100):
        body = rng.integers(0, 5000, int(rng.integers(0, 24))).tolist()
        if i % 3 == 0 and body:
            p = int(rng.integers(0, len(body)))
            body = body[:p] + probes[i % len(probes)] + body[p:]
        if i == 6:                     # overlapping plants merge
            body = probes[0][:-1] + probes[0] + probes[1]
        ids.append(f"p{i:03d}")
        rows.append(body)
        src.append(f"s{i % 4}")
    t = pa.table({"doc_id": pa.array(ids),
                  "tokens": pa.array(rows, pa.list_(pa.int32())),
                  "source": pa.array(src)})
    ds = rd.from_arrow(t).repartition(5)

    got = {r["doc_id"]: r for r in scrub_probe_token_spans(
        ds, probes, "tokens", "doc_id").take_all()}
    pset = {tuple(p) for p in probes}
    touched = set()
    for i, di in enumerate(ids):
        toks = rows[i]
        cov = set()
        for p in range(max(len(toks) - k + 1, 0)):
            if tuple(toks[p:p + k]) in pset:
                cov.update(range(p, p + k))
        want = [tk for p, tk in enumerate(toks) if p not in cov]
        assert list(got[di]["tokens_clean"]) == want, di
        assert got[di]["n_tokens_scrubbed"] == len(cov)
        assert got[di]["source"] == src[i]
        if cov:
            touched.add(di)
    flagged = {r["doc_id"] for r in token_ngram_contamination(
        ds, probes, "tokens", "doc_id").take_all()}
    assert flagged == touched


def test_scrub_probe_word_spans_matches_bruteforce(ray_session):
    """Word-level scrub vs a per-row Python reference: probe k-gram
    matches drop (overlaps merge), everything comes back
    whitespace-normalized, payload columns pass through."""
    import ray.data as rd
    from malli_ray.stages.text import scrub_probe_word_spans

    rng = np.random.default_rng(53)
    k = 3
    probe_texts = [" ".join(f"p{i}w{j}" for j in range(6))
                   for i in range(3)]
    probe_grams = set()
    for t in probe_texts:
        ws = t.split()
        for p in range(len(ws) - k + 1):
            probe_grams.add(tuple(ws[p:p + k]))
    texts, ids, src = [], [], []
    for i in range(80):
        ws = [f"w{int(x)}" for x in rng.integers(0, 200, int(
            rng.integers(0, 18)))]
        if i % 3 == 0:
            plant = probe_texts[i % 3].split()[0:k + 1]
            p = int(rng.integers(0, len(ws) + 1))
            ws = ws[:p] + plant + ws[p:]
        ids.append(f"d{i:03d}")
        texts.append("  ".join(ws) if i % 7 else " ".join(ws))
        src.append(f"s{i % 2}")
    t = pa.table({"doc_id": pa.array(ids),
                  "text": pa.array(texts, pa.string()),
                  "source": pa.array(src)})
    ds = rd.from_arrow(t).repartition(4)
    probes = rd.from_arrow(pa.table({
        "doc_id": [f"probe{i}" for i in range(len(probe_texts))],
        "text": probe_texts}))

    got = {r["doc_id"]: r for r in scrub_probe_word_spans(
        ds, probes, "text", "doc_id", k=k).take_all()}
    for i, di in enumerate(ids):
        ws = texts[i].split()
        cov = set()
        for p in range(max(len(ws) - k + 1, 0)):
            if tuple(ws[p:p + k]) in probe_grams:
                cov.update(range(p, p + k))
        want = " ".join(w for p, w in enumerate(ws) if p not in cov)
        assert got[di]["text_clean"] == want, di
        assert got[di]["n_words_scrubbed"] == len(cov)
        assert got[di]["source"] == src[i]
