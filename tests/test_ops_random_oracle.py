"""Randomized cross-checks for the r3 training-pipeline operators: each op
runs over seeded random corpora and must equal a naive pure-Python
reference implementation (the in-process analogue of the DuckDB oracles,
over inputs the fixed testdata can't produce — repeated lines, skewed
groups, adversarial overlaps)."""

import random
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


def _random_docs(rng: random.Random, n: int, n_lines=(1, 6),
                 line_words=(1, 5)):
    docs = []
    # a pool of repeatable lines so line/gram collisions actually happen
    pool = [" ".join(rng.choices(WORDS, k=rng.randint(*line_words)))
            for _ in range(12)]
    for _ in range(n):
        lines = [rng.choice(pool) if rng.random() < 0.5
                 else " ".join(rng.choices(WORDS,
                                           k=rng.randint(*line_words)))
                 for _ in range(rng.randint(*n_lines))]
        docs.append("\n".join(lines))
    return docs


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_drop_frequent_lines_random(ray_session, seed):
    from malli_ray.stages.dedup import drop_frequent_lines
    rng = random.Random(seed)
    docs = _random_docs(rng, 120)
    min_count = 4
    t = pa.table({"doc_id": list(range(len(docs))), "text": docs})
    out = {r["doc_id"]: r for r in
           drop_frequent_lines(rd.from_arrow(t), "text",
                               min_count=min_count).take_all()}
    freq = Counter(line for d in docs for line in d.split("\n"))
    drop = {l for l, c in freq.items() if c >= min_count}
    for i, d in enumerate(docs):
        keep = [l for l in d.split("\n") if l not in drop]
        assert out[i]["text_clean"] == "\n".join(keep)
        assert out[i]["n_lines_dropped"] == \
            sum(1 for l in d.split("\n") if l in drop)


@pytest.mark.parametrize("seed", [4, 5])
def test_chunk_text_random(ray_session, seed):
    from malli_ray.stages.packing import chunk_text
    rng = random.Random(seed)
    docs = ["".join(rng.choices("abcdefgh", k=rng.randint(0, 60)))
            for _ in range(80)]
    size, stride = 16, 7
    t = pa.table({"doc_id": list(range(len(docs))),
                  "text": pa.array(docs, type=pa.string())})
    rows = chunk_text(rd.from_arrow(t), "text", "doc_id",
                      size=size, stride=stride).take_all()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, d in enumerate(docs):
        got = sorted(by_doc.get(i, []), key=lambda r: r["chunk_id"])
        if not d:
            assert got == []
            continue
        want = []
        start = 0
        while True:
            want.append(d[start:start + size])
            if start + size >= len(d):
                break
            start += stride
        assert [r["chunk_text"] for r in got] == want
        assert [r["chunk_start"] for r in got] == \
            [j * stride for j in range(len(want))]


@pytest.mark.parametrize("seed", [6, 7])
def test_range_join_random(ray_session, seed):
    from malli_ray.stages.windows import range_join
    rng = random.Random(seed)
    keys = ["k0", "k1", "k2"]
    left = [(rng.choice(keys), i, rng.randint(0, 50))
            for i in range(60)]
    right = [(rng.choice(keys), 100 + i, rng.randint(0, 50))
             for i in range(60)]
    lt = pa.table({"k": [x[0] for x in left], "lid": [x[1] for x in left],
                   "t": [x[2] for x in left]})
    rt = pa.table({"k": [x[0] for x in right], "rid": [x[1] for x in right],
                   "rt": [x[2] for x in right]})
    out = range_join(rd.from_arrow(lt), rd.from_arrow(rt), key="k",
                     left_ts="t", right_ts="rt", right_cols=["rid"],
                     lower=-3, upper=2, upper_inclusive=False,
                     left_schema=lt.schema, right_schema=rt.schema)
    got = sorted((r["lid"], r["rid_right"]) for r in out.take_all())
    want = sorted((lk_id, rr_id)
                  for lk, lk_id, lt_ in left
                  for rk, rr_id, rt_ in right
                  if lk == rk and lt_ - 3 <= rt_ < lt_ + 2)
    assert got == want


@pytest.mark.parametrize("seed", [8, 9])
def test_corpus_freq_random(ray_session, seed):
    from malli_ray.stages.text import corpus_freq_score
    rng = random.Random(seed)
    docs = [" ".join(rng.choices(WORDS[:5], k=rng.randint(0, 12)))
            for _ in range(90)]
    t = pa.table({"doc_id": list(range(len(docs))),
                  "text": pa.array(docs, type=pa.string())})
    out = {r["doc_id"]: r for r in
           corpus_freq_score(rd.from_arrow(t), "text", "doc_id",
                             min_count=20).take_all()}
    freq = Counter(w for d in docs for w in d.split() if w)
    for i, d in enumerate(docs):
        ws = [w for w in d.split() if w]
        assert out[i]["n_words"] == len(ws)
        assert out[i]["total_freq"] == sum(freq[w] for w in ws)
        assert out[i]["oov_words"] == sum(1 for w in ws if freq[w] < 20)


@pytest.mark.parametrize("seed", [10, 11])
def test_ngram_contamination_random(ray_session, seed):
    from malli_ray.stages.text import ngram_contamination
    rng = random.Random(seed)
    k = 3
    probes = [" ".join(rng.choices(WORDS, k=rng.randint(0, 10)))
              for _ in range(15)]
    docs = [" ".join(rng.choices(WORDS, k=rng.randint(0, 10)))
            for _ in range(70)]
    pt = pa.table({"doc_id": list(range(1000, 1000 + len(probes))),
                   "text": probes})
    dt = pa.table({"doc_id": list(range(len(docs))), "text": docs})
    out = {r["doc_id"]: r for r in
           ngram_contamination(rd.from_arrow(dt), "text", "doc_id",
                               rd.from_arrow(pt), k=k).take_all()}

    def grams(s):
        ws = s.split()
        return [" ".join(ws[i:i + k]) for i in range(len(ws) - k + 1)]

    pset = {g for p in probes for g in grams(p)}
    for i, d in enumerate(docs):
        gs = grams(d)
        assert out[i]["n_grams"] == len(gs)
        assert out[i]["n_hit"] == sum(1 for g in gs if g in pset)


def test_rebalance_random(ray_session):
    from malli_ray.stages.sampling import rebalance_to_uniform, KNUTH_MULT
    rng = random.Random(12)
    groups = [rng.choice(["a", "a", "a", "b", "c"]) for _ in range(400)]
    t = pa.table({"doc_id": list(range(400)), "source": groups})
    kept = sorted(r["doc_id"] for r in
                  rebalance_to_uniform(rd.from_arrow(t), "source",
                                       "doc_id").take_all())
    cnt = Counter(groups)
    m = min(cnt.values())
    want = [i for i, g in enumerate(groups)
            if (i * KNUTH_MULT) % 2**32
            < int(np.floor(m / cnt[g] * 4294967296.0))]
    assert kept == want


def test_outlier_filter_random(ray_session):
    from malli_ray.stages.sampling import filter_outliers_by_group
    rng = random.Random(13)
    rows = [(rng.choice(["x", "y"]), rng.gauss(100, 10)) for _ in range(300)]
    rows += [("x", 10_000.0), ("y", -10_000.0)]
    t = pa.table({"doc_id": list(range(len(rows))),
                  "g": [r[0] for r in rows],
                  "v": [r[1] for r in rows]})
    kept = {r["doc_id"] for r in
            filter_outliers_by_group(rd.from_arrow(t), "g", "v").take_all()}
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    want = set()
    for i, (g, v) in enumerate(rows):
        q1, q3 = np.quantile(np.sort(np.array(by_g[g])), [0.25, 0.75])
        if q1 - 1.5 * (q3 - q1) <= v <= q3 + 1.5 * (q3 - q1):
            want.add(i)
    assert kept == want


@pytest.mark.parametrize("seed", [11, 12])
def test_rolling_aggregate_random(ray_session, seed):
    """RANGE-frame semantics vs a naive O(n^2) scan — including peer rows
    (duplicate timestamps share a frame) and frame-boundary inclusivity."""
    from malli_ray.stages.windows import rolling_aggregate
    rng = random.Random(seed)
    n, delta = 300, 10
    keys = [rng.randint(0, 5) for _ in range(n)]
    ts = [rng.randint(0, 60) for _ in range(n)]          # many ties
    vals = [rng.randint(-9, 9) for _ in range(n)]
    t = pa.table({"k": keys, "ts": ts, "v": vals,
                  "rid": list(range(n))})
    out = rolling_aggregate(rd.from_arrow(t), key="k", ts_col="ts",
                            value_col="v", preceding=delta).take_all()
    assert len(out) == n
    by_rid = {r["rid"]: r for r in out}
    for i in range(n):
        frame = [vals[j] for j in range(n)
                 if keys[j] == keys[i] and ts[i] - delta <= ts[j] <= ts[i]]
        r = by_rid[i]
        assert r["rolling_count"] == len(frame), i
        assert r["rolling_sum"] == sum(frame), i


@pytest.mark.parametrize("seed", [41, 42])
def test_semantic_dedup_random(ray_session, seed):
    """SemDeDup over planted well-separated clusters: every planted
    near-dup pair is recovered (same-cluster recall), no cross-cluster
    false pairs, and semantic_dedup keeps exactly one representative
    (the min id) per near-dup group while untouched rows survive."""
    from malli_ray.stages.dedup import semantic_dedup_pairs, semantic_dedup
    rng = np.random.default_rng(seed)
    d, n_clusters, per = 32, 4, 40
    bases = rng.standard_normal((n_clusters, d))
    bases /= np.linalg.norm(bases, axis=1, keepdims=True)
    rows, ids, dup_of = [], [], {}
    i = 0
    for c in range(n_clusters):
        for _ in range(per):
            v = bases[c] + 0.05 * rng.standard_normal(d)
            rows.append(v)
            ids.append(i)
            i += 1
            if rng.random() < 0.25:            # planted near-dup
                rows.append(v + 1e-4 * rng.standard_normal(d))
                dup_of[i] = i - 1
                ids.append(i)
                i += 1
    t = pa.table({"vec_id": pa.array(ids, type=pa.int64()),
                  "embedding": pa.array([r.astype(np.float32) for r in rows],
                                        type=pa.list_(pa.float32()))})
    ds = rd.from_arrow(t)
    pairs = semantic_dedup_pairs(ds, "embedding", "vec_id",
                                 n_clusters=n_clusters, threshold=0.99,
                                 seed=7, sample_size=64).take_all()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    want = {(orig, dup) for dup, orig in dup_of.items()}
    assert want <= got                       # every planted pair recovered
    for a, b in got:
        cos = np.dot(rows[a], rows[b]) / (
            np.linalg.norm(rows[a]) * np.linalg.norm(rows[b]))
        assert cos >= 0.99 - 1e-6            # no false pairs
    kept = {r["vec_id"] for r in
            semantic_dedup(ds, "embedding", "vec_id",
                           n_clusters=n_clusters, threshold=0.99,
                           seed=7, sample_size=64).take_all()}
    extra_found = got - want
    if not extra_found:                      # exact keep-set check
        assert kept == set(range(i)) - set(dup_of.keys())
    else:                                    # duplicates among originals
        assert set(dup_of.keys()).isdisjoint(kept)
    assert len(kept) + len({b for _, b in got}) >= i  # reps all survive


@pytest.mark.parametrize("seed", [31, 32])
def test_lag_lead_random(ray_session, seed):
    """LAG/LEAD vs a naive per-key scan — null at run edges, values moved
    verbatim (float bits preserved), deterministic under the (ts, rid)
    tie-break, stable across bucket counts."""
    from malli_ray.stages.analytics import lag_lead
    rng = random.Random(seed)
    n = 400
    keys = [rng.choice(["u1", "u2", "u3", "u4", "solo"][:4]) for _ in range(n)]
    keys.append("solo")                                   # 1-row run
    ts = [rng.randint(0, 50) for _ in range(n + 1)]       # heavy ties
    vals = [rng.uniform(-5, 5) for _ in range(n + 1)]
    t = pa.table({"k": keys, "ts": ts, "v": vals,
                  "rid": list(range(n + 1))})
    for shift, buckets in [(1, 8), (2, 3)]:
        out = {r["rid"]: r for r in
               lag_lead(rd.from_arrow(t), key="k", order_by=["ts", "rid"],
                        value_col="v", n=shift,
                        num_buckets=buckets).take_all()}
        assert len(out) == n + 1
        per_key = {}
        for i in sorted(range(n + 1), key=lambda i: (ts[i], i)):
            per_key.setdefault(keys[i], []).append(i)
        for k, order in per_key.items():
            for pos, i in enumerate(order):
                r = out[i]
                want_lag = (vals[order[pos - shift]]
                            if pos >= shift else None)
                want_lead = (vals[order[pos + shift]]
                             if pos + shift < len(order) else None)
                assert r[f"v_lag{shift}"] == want_lag, (k, i)
                assert r[f"v_lead{shift}"] == want_lead, (k, i)


@pytest.mark.parametrize("seed", [37, 38])
def test_collect_by_group_random(ray_session, seed):
    """string_agg ORDER BY semantics: deterministic tie-broken order,
    nulls skipped, all-null groups emit empty string."""
    from malli_ray.stages.analytics import collect_by_group
    rng = random.Random(seed)
    n = 300
    groups = [rng.choice("wxyz") for _ in range(n)] + ["only_null"]
    vals = [rng.choice([None, "a", "b", "cc"]) for _ in range(n)] + [None]
    ts = [rng.randint(0, 30) for _ in range(n + 1)]
    t = pa.table({"g": groups, "v": pa.array(vals, type=pa.string()),
                  "ts": ts, "rid": list(range(n + 1))})
    out = {r["g"]: r for r in
           collect_by_group(rd.from_arrow(t), "g", "v",
                            order_by=["ts", "rid"]).take_all()}
    for g in set(groups):
        order = sorted((i for i in range(n + 1) if groups[i] == g),
                       key=lambda i: (ts[i], i))
        want = [vals[i] for i in order if vals[i] is not None]
        assert out[g]["collected"] == ",".join(want), g
        assert out[g]["n_items"] == len(want), g
    # the guard trips loudly on oversize groups
    import ray.exceptions
    with pytest.raises(Exception):
        collect_by_group(rd.from_arrow(t), "g", "v", order_by=["ts"],
                         max_group_rows=3).take_all()


@pytest.mark.parametrize("seed", [35, 36])
def test_normalize_text_random(ray_session, seed):
    """normalize_text vs a naive python pipeline over adversarial strings:
    control chars stripped, whitespace runs collapsed, trimmed, lowered;
    nulls pass through as nulls."""
    import re as _re
    from malli_ray.stages.text import normalize_text
    rng = random.Random(seed)
    pool = "AbC xyZ\t\n\r\f \x00\x07\x1f\x7fqW  E"
    docs = ["".join(rng.choices(pool, k=rng.randint(0, 40)))
            for _ in range(150)] + [None, "", "  \t ", "\x00\x01"]
    t = pa.table({"doc_id": list(range(len(docs))),
                  "text": pa.array(docs, type=pa.string())})
    out = {r["doc_id"]: r["text"] for r in
           normalize_text(rd.from_arrow(t), "text").take_all()}
    for i, d in enumerate(docs):
        if d is None:
            assert out[i] is None
            continue
        want = _re.sub(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "", d)
        want = _re.sub(r"[\t\n\f\r ]+", " ", want).strip().lower()
        assert out[i] == want, (i, repr(d))


def test_extract_urls(ray_session):
    """Flat-map url extraction: multiple urls per doc in order, none for
    url-free or null docs."""
    from malli_ray.stages.text import extract_urls
    docs = ["see https://a.io/x and http://b.co/y?z=1 end",
            "no links here", None, "",
            "trail https://c.de/p.", "https://d.f/q\nhttps://d.f/r"]
    t = pa.table({"doc_id": list(range(len(docs))),
                  "text": pa.array(docs, type=pa.string())})
    out = extract_urls(rd.from_arrow(t), "text", "doc_id").take_all()
    got = sorted((r["doc_id"], r["url"]) for r in out)
    assert got == [(0, "http://b.co/y?z=1"), (0, "https://a.io/x"),
                   (4, "https://c.de/p."),
                   (5, "https://d.f/q"), (5, "https://d.f/r")]


@pytest.mark.parametrize("seed", [33, 34])
def test_running_aggregate_random(ray_session, seed):
    """ROWS-frame running count/sum vs a naive per-key scan — ties
    accumulate one row at a time in (ts, rid) order, integer-exact,
    stable across bucket counts."""
    from malli_ray.stages.analytics import running_aggregate
    rng = random.Random(seed)
    n = 400
    keys = [rng.choice("pqrs") for _ in range(n)]
    ts = [rng.randint(0, 40) for _ in range(n)]           # heavy ties
    vals = [rng.randint(-9, 9) for _ in range(n)]
    t = pa.table({"k": keys, "ts": ts, "v": vals, "rid": list(range(n))})
    for buckets in (2, 16):
        out = {r["rid"]: r for r in
               running_aggregate(rd.from_arrow(t), key="k",
                                 order_by=["ts", "rid"], value_col="v",
                                 num_buckets=buckets).take_all()}
        assert len(out) == n
        per_key = {}
        for i in sorted(range(n), key=lambda i: (ts[i], i)):
            per_key.setdefault(keys[i], []).append(i)
        for key, order in per_key.items():
            run = 0
            for pos, i in enumerate(order):
                run += vals[i]
                assert out[i]["running_count"] == pos + 1, (key, i)
                assert out[i]["running_sum"] == run, (key, i)


def test_sample_k_by_hash(ray_session):
    """Exact-k deterministic sample: equals the global smallest-hash-k set
    regardless of partitioning; k larger than the table returns all rows."""
    import ray.data as rd2
    from malli_ray.stages.sampling import sample_k_by_hash, KNUTH_MULT
    n, k, seed = 3000, 50, 9
    t = pa.table({"doc_id": list(range(n)), "v": list(range(n))})
    mod = 1 << 32
    want = sorted(range(n),
                  key=lambda i: (((i + seed) % mod) * KNUTH_MULT % mod, i))[:k]
    for parts in (1, 11):
        out = sample_k_by_hash(rd2.from_arrow(t).repartition(parts),
                               "doc_id", k=k, seed=seed).take_all()
        assert sorted(r["doc_id"] for r in out) == sorted(want)
    small = sample_k_by_hash(rd2.from_arrow(t.slice(0, 20)), "doc_id",
                             k=100, seed=seed).take_all()
    assert sorted(r["doc_id"] for r in small) == list(range(20))


@pytest.mark.parametrize("seed", [13, 14])
def test_top_k_per_group_random(ray_session, seed):
    from malli_ray.stages.analytics import top_k_per_group
    rng = random.Random(seed)
    n, k = 400, 3
    groups = [rng.choice("abcd") for _ in range(n)]
    vals = [rng.randint(0, 20) for _ in range(n)]        # heavy ties
    t = pa.table({"g": groups, "v": vals, "rid": list(range(n))})
    out = top_k_per_group(rd.from_arrow(t), group="g",
                          order_by=["v", "rid"], k=k).take_all()
    expect = {}
    for g in set(groups):
        rows = sorted(((vals[i], i) for i in range(n) if groups[i] == g),
                      key=lambda p: (-p[0], p[1]))[:k]
        expect[g] = [(v, rid, rk + 1) for rk, (v, rid) in enumerate(rows)]
    got = {}
    for r in out:
        got.setdefault(r["g"], []).append((r["v"], r["rid"], r["rk"]))
    for g in got:
        got[g].sort(key=lambda p: p[2])
    assert got == expect


def test_top_k_small_groups(ray_session):
    """Groups smaller than k emit all their rows with ranks 1..n."""
    from malli_ray.stages.analytics import top_k_per_group
    t = pa.table({"g": ["a", "a", "b"], "v": [5, 7, 1],
                  "rid": [0, 1, 2]})
    out = sorted(top_k_per_group(rd.from_arrow(t), "g", ["v", "rid"],
                                 k=10).take_all(),
                 key=lambda r: (r["g"], r["rk"]))
    assert [(r["g"], r["rid"], r["rk"]) for r in out] == \
        [("a", 1, 1), ("a", 0, 2), ("b", 2, 1)]


@pytest.mark.parametrize("seed", [15, 16])
def test_distinct_count_by_group_random(ray_session, seed):
    """Exact COUNT(DISTINCT v): null values not counted, null group is its
    own group."""
    from malli_ray.stages.analytics import distinct_count_by_group
    rng = random.Random(seed)
    n = 500
    groups = [rng.choice(["x", "y", "z", None]) for _ in range(n)]
    vals = [rng.choice([None, *range(12)]) for _ in range(n)]
    t = pa.table({"g": pa.array(groups), "v": pa.array(vals,
                                                       type=pa.int64())})
    out = {r["g"]: r["n_distinct"] for r in
           distinct_count_by_group(rd.from_arrow(t), "g", "v").take_all()}
    expect = {}
    for g, v in zip(groups, vals):
        if v is not None:
            expect.setdefault(g, set()).add(v)
    assert out == {g: len(s) for g, s in expect.items()} | \
        {g: 0 for g in set(groups) - set(expect)}


@pytest.mark.parametrize("seed", [17])
def test_pivot_counts_random(ray_session, seed):
    """Values outside the explicit category list are ignored; absent
    categories report 0."""
    from malli_ray.stages.analytics import pivot_counts
    rng = random.Random(seed)
    n = 400
    groups = [rng.choice("pq") for _ in range(n)]
    cats = [rng.choice(["a", "b", "c", "other"]) for _ in range(n)]
    t = pa.table({"g": groups, "c": cats})
    out = {r["g"]: r for r in
           pivot_counts(rd.from_arrow(t), "g", "c",
                        categories=["a", "b", "zzz"]).take_all()}
    for g in "pq":
        for cat in ["a", "b", "zzz"]:
            want = sum(1 for gg, cc in zip(groups, cats)
                       if gg == g and cc == cat)
            assert out[g]["n_" + cat] == want


@pytest.mark.parametrize("seed", [21, 22])
def test_split_by_hash_random(ray_session, seed):
    """Split labels equal the pure-Python hash rule; remainder falls into
    the LAST label; assignment is deterministic across runs."""
    from malli_ray.stages.sampling import (KNUTH_MULT, split_by_hash,
                                           split_thresholds)
    rng = random.Random(seed)
    ids = rng.sample(range(10**12), 300)
    fractions = {"train": 0.6, "valid": 0.2, "test": 0.1}   # sums to 0.9
    t = pa.table({"doc_id": ids})
    out = {r["doc_id"]: r["split"] for r in
           split_by_hash(rd.from_arrow(t), "doc_id", fractions).take_all()}
    out2 = {r["doc_id"]: r["split"] for r in
            split_by_hash(rd.from_arrow(t), "doc_id", fractions).take_all()}
    assert out == out2
    th = split_thresholds(fractions)
    assert th[-1] == ("test", 4294967296)    # remainder absorbed
    for i in ids:
        h = ((i % 2**32) * KNUTH_MULT) % 2**32
        want = next(lab for lab, t_ in th if h < t_)
        assert out[i] == want, i


def test_split_by_hash_validation():
    from malli_ray.stages.sampling import split_thresholds
    with pytest.raises(ValueError):
        split_thresholds({})
    with pytest.raises(ValueError):
        split_thresholds({"a": 0.7, "b": 0.7})


def test_write_hash_shards(ray_session, tmp_path):
    """Hive-partitioned shard dirs; union of shards == input; assignment
    matches assign_shards exactly."""
    import pyarrow.parquet as pq
    from malli_ray.stages.sampling import KNUTH_MULT, write_hash_shards
    ids = list(range(0, 700, 7))
    t = pa.table({"doc_id": ids, "payload": [f"p{i}" for i in ids]})
    out = tmp_path / "shards"
    write_hash_shards(rd.from_arrow(t), "doc_id", n_shards=4, out_dir=str(out))
    dirs = sorted(p.name for p in out.iterdir())
    assert all(d.startswith("shard=") for d in dirs)
    got = pq.read_table(str(out)).to_pylist()
    assert len(got) == len(ids)
    for r in got:
        want = (((r["doc_id"] % 2**32) * KNUTH_MULT) % 2**32) % 4
        assert int(r["shard"]) == want
        assert r["payload"] == f"p{r['doc_id']}"


@pytest.mark.parametrize("seed", [31, 32])
def test_word_stats_fused_pass(ray_session, seed):
    """word_stats's one-pass (word, cnt, df) equals the separate
    word_counts + document_frequencies passes, and feeding it to the two
    scorers reproduces their default two-scan outputs exactly."""
    from malli_ray.stages.text import (corpus_freq_score,
                                       document_frequencies, tfidf_keywords,
                                       word_counts, word_stats)
    rng = random.Random(seed)
    docs = _random_docs(rng, 100)
    t = pa.table({"doc_id": list(range(len(docs))), "text": docs})
    ds = rd.from_arrow(t)

    stats = word_stats(ds, "text")
    cnt = {r["word"]: r["cnt"] for r in word_counts(ds, "text").take_all()}
    df = {r["word"]: r["df"]
          for r in document_frequencies(ds, "text").to_pylist()}
    got = {r["word"]: (r["cnt"], r["df"]) for r in stats.to_pylist()}
    assert got == {w: (cnt[w], df[w]) for w in cnt}

    def rows(ds_):
        return sorted(map(tuple, (r.values() for r in ds_.take_all())))

    assert rows(corpus_freq_score(ds, "text", "doc_id",
                                  vocab_table=stats)) == \
        rows(corpus_freq_score(ds, "text", "doc_id"))
    assert rows(tfidf_keywords(ds, "text", "doc_id", k=2,
                               df_table=stats)) == \
        rows(tfidf_keywords(ds, "text", "doc_id", k=2))


@pytest.mark.parametrize("seed", [41, 42])
def test_embedding_normalize_quantize_random(ray_session, seed):
    """Unit norms after normalize; quantization round-trips within scale/2
    per element and preserves cosine; zero vectors stay zero."""
    from malli_ray.stages.similarity import (normalize_embeddings,
                                             quantize_embeddings_int8)
    rng = np.random.default_rng(seed)
    n, d = 60, 16
    mat = rng.normal(size=(n, d)).astype(np.float32)
    mat[7] = 0.0                                   # zero vector
    t = pa.table({"vec_id": list(range(n)),
                  "embedding": [row.tolist() for row in mat]})
    ds = rd.from_arrow(t)

    normed = {r["vec_id"]: np.asarray(r["embedding"]) for r in
              normalize_embeddings(ds, "embedding").take_all()}
    for i in range(n):
        norm = np.linalg.norm(normed[i])
        assert abs(norm - 1.0) < 1e-5 or (i == 7 and norm == 0.0)

    rows = quantize_embeddings_int8(ds, "embedding", "vec_id").take_all()
    assert len(rows) == n * d
    q = np.zeros((n, d)); scale = np.zeros(n)
    for r in rows:
        q[r["vec_id"], r["pos"] - 1] = r["q"]
        scale[r["vec_id"]] = r["scale"]
    assert np.all(np.abs(q) <= 127)
    assert scale[7] == 0.0 and not q[7].any()
    deq = q * scale[:, None]
    err = np.abs(deq - mat.astype(np.float64))
    assert np.all(err <= scale[:, None] / 2 + 1e-12)
    for i in range(n):
        if i == 7:
            continue
        cos = (deq[i] @ mat[i]) / (np.linalg.norm(deq[i])
                                   * np.linalg.norm(mat[i]))
        assert cos > 0.995, (i, cos)


def _ref_dup_spans(docs, ids, k):
    """Pure-Python exact substring dedup reference: keep the globally
    first occurrence of each word k-gram by (id, pos); merge later
    occurrences' windows into maximal per-doc spans."""
    import re
    occ = []  # (id, pos, gram) in (id, pos) order
    for did in sorted(ids):
        words = re.findall(r"[^\t\n\f\r ]+", docs[did] or "")
        for i in range(max(len(words) - k + 1, 0)):
            occ.append((did, i, " ".join(words[i:i + k])))
    seen, windows = set(), {}
    for did, i, g in occ:
        if g in seen:
            windows.setdefault(did, []).append((i, i + k))
        else:
            seen.add(g)
    spans = {}
    for did, ws in windows.items():
        merged = []
        for s, e in sorted(ws):
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        spans[did] = [(s, e) for s, e in merged]
    return spans


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_duplicate_spans_random(ray_session, seed):
    from malli_ray.stages.dedup import duplicate_spans, \
        remove_duplicate_spans
    import re
    rng = random.Random(seed)
    k = 4
    # phrase pool so k-gram collisions (incl. overlapping ones) happen
    pool = [" ".join(rng.choices(WORDS, k=k + rng.randint(0, 3)))
            for _ in range(8)]
    docs = {}
    for did in range(80):
        parts = [rng.choice(pool) if rng.random() < 0.6
                 else " ".join(rng.choices(WORDS, k=rng.randint(1, 6)))
                 for _ in range(rng.randint(0, 4))]
        docs[did] = " ".join(parts)
    ids = list(docs)
    t = pa.table({"doc_id": ids, "text": [docs[i] for i in ids]})
    ref = _ref_dup_spans(docs, ids, k)

    got = {}
    for r in duplicate_spans(rd.from_arrow(t), "text", "doc_id",
                             k=k).take_all():
        got.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"]))
    assert {d: sorted(v) for d, v in got.items()} == ref

    out = {r["doc_id"]: r for r in
           remove_duplicate_spans(rd.from_arrow(t), "text", "doc_id",
                                  k=k).take_all()}
    assert set(out) == set(ids)
    for did in ids:
        words = re.findall(r"[^\t\n\f\r ]+", docs[did])
        drop = set()
        for s, e in ref.get(did, []):
            drop.update(range(s, e))
        keep = [w for i, w in enumerate(words) if i not in drop]
        assert out[did]["text_dedup"] == " ".join(keep)
        assert out[did]["n_words_dropped"] == len(drop)


def _uf_components(edges):
    """Pure-Python union-find reference: node -> min id in its component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize("seed", [1, 2])
def test_connected_components_random(ray_session, seed):
    """Random sparse graphs (chains + cliques + isolated pairs) vs a
    union-find reference — exercises multi-round propagation (chain
    diameter > 1)."""
    from malli_ray.stages.graph import connected_components

    rng = random.Random(seed)
    edges = []
    nxt = 0
    for _ in range(10):  # chains of length up to 12 (diameter stress)
        ln = rng.randint(2, 12)
        chain = list(range(nxt, nxt + ln))
        rng.shuffle(chain)
        edges += list(zip(chain, chain[1:]))
        nxt += ln
    for _ in range(5):   # cliques
        ln = rng.randint(2, 6)
        nodes = list(range(nxt, nxt + ln))
        edges += [(a, b) for a in nodes for b in nodes if a < b]
        nxt += ln
    edges += [(rng.randrange(nxt), rng.randrange(nxt)) for _ in range(8)]
    rng.shuffle(edges)
    want = _uf_components(edges)

    t = pa.table({"a": [a for a, _ in edges], "b": [b for _, b in edges]})
    got = {r["node"]: r["component"] for r in
           connected_components(rd.from_arrow(t).repartition(5),
                                "a", "b", num_buckets=8).take_all()}
    assert got == want


@pytest.mark.parametrize("seed,window", [(31, 1), (32, 2), (33, 3)])
def test_cooccurrence_random(ray_session, seed, window):
    from malli_ray.stages.text import cooccurrence_counts
    rng = random.Random(seed)
    docs = _random_docs(rng, 100)
    # flatten newlines into spaces so the word split is the only tokenizer
    t = pa.table({"text": docs})
    min_count = 2
    out = {(r["word_a"], r["word_b"]): r["cnt"] for r in
           cooccurrence_counts(rd.from_arrow(t), "text", window=window,
                               min_count=min_count).take_all()}
    ref = Counter()
    for d in docs:
        ws = d.split()
        for i, a in enumerate(ws):
            for j in range(i + 1, min(i + window, len(ws) - 1) + 1):
                ref[(a, ws[j])] += 1
    expect = {k: c for k, c in ref.items() if c >= min_count}
    assert out == expect


def test_shard_manifest_random(ray_session):
    from malli_ray.stages.sampling import shard_manifest, KNUTH_MULT
    rng = random.Random(9)
    ids = rng.sample(range(10_000_000), 5000)
    n_shards = 16
    out = shard_manifest(rd.from_arrow(pa.table({"id": ids})), "id",
                         n_shards)
    ref_n = [0] * n_shards
    ref_c = [0] * n_shards
    for i in ids:
        h = (i % 2**32) * KNUTH_MULT % 2**32
        ref_n[h % n_shards] += 1
        ref_c[h % n_shards] = (ref_c[h % n_shards] + h) % 2**64
    ref_c = [c - 2**64 if c >= 2**63 else c for c in ref_c]
    assert out.column("shard").to_pylist() == list(range(n_shards))
    assert out.column("n_rows").to_pylist() == ref_n
    assert out.column("id_checksum").to_pylist() == ref_c
    assert sum(ref_n) == len(ids)


def test_shard_manifest_detects_loss(ray_session):
    """Dropping one row changes exactly that shard's (n_rows, checksum)."""
    from malli_ray.stages.sampling import shard_manifest
    ids = list(range(1000))
    full = shard_manifest(rd.from_arrow(pa.table({"id": ids})), "id", 4)
    partial = shard_manifest(rd.from_arrow(pa.table({"id": ids[1:]})),
                             "id", 4)
    diff = [s for s in range(4)
            if full.column("id_checksum")[s] != partial.column(
                "id_checksum")[s]
            or full.column("n_rows")[s] != partial.column("n_rows")[s]]
    assert len(diff) == 1


@pytest.mark.parametrize("seed", [41, 42])
def test_logreg_classifier_random(ray_session, seed):
    """Engine logreg train+classify (distributed full-batch GD) equals a
    naive per-doc reference bit-for-bit (incl. the float prob) on random
    corpora, regardless of batch split / partitioning of the training
    pass."""
    import polars as pl
    from malli_ray.stages.text import logreg_classify, train_logreg_classifier

    rng = random.Random(seed)
    docs = _random_docs(rng, 120)
    labels = [rng.random() < 0.4 for _ in docs]
    labels[0], labels[1] = True, False
    B, T, lr, s = 256, 4, 1.0, 7
    t = pa.table({"doc_id": list(range(len(docs))), "text": docs,
                  "label": labels})
    model = train_logreg_classifier(rd.from_arrow(t).repartition(7),
                                    "text", "label", n_buckets=B,
                                    epochs=T, lr=lr, seed=s)
    m2 = train_logreg_classifier(rd.from_arrow(t).repartition(3),
                                 "text", "label", n_buckets=B,
                                 epochs=T, lr=lr, seed=s)
    assert np.array_equal(model["w"], m2["w"])           # partitioning-free
    assert model["bias"] == m2["bias"]
    assert model["loss_history"] == m2["loss_history"]
    got = {r["doc_id"]: (r["n_features"], r["logit_q"], r["prob"],
                         r["pred"])
           for r in logreg_classify(rd.from_arrow(t).repartition(5), "text",
                                    "doc_id", model).take_all()}

    # naive per-doc reference (the make_golden.logreg_classify_ref shape)
    def buckets(fs):
        if not fs:
            return []
        h = pl.Series(fs, dtype=pl.Utf8).hash(seed=s).to_numpy()
        return [int(x) % B for x in h.astype(np.uint64)]

    feats = []
    for d in docs:
        ws = d.split()
        feats.append(buckets(ws)
                     + buckets([f"{a} {b}" for a, b in zip(ws, ws[1:])]))
    nf = np.array([len(fs) for fs in feats], dtype=np.int64)
    y = np.array(labels, dtype=np.float64)
    n = len(docs)
    scale = float(1 << 20)

    def doc_logits(w, bias):
        zs = []
        for fs in feats:
            acc = 0.0
            for b in fs:
                acc += w[b]
            zs.append(acc)
        return bias + np.array(zs, dtype=np.float64) / np.maximum(nf, 1)

    w, bias = np.zeros(B, dtype=np.float64), 0.0
    for _ in range(T):
        z = doc_logits(w, bias)
        sig = 1.0 / (1.0 + np.exp(-z))
        resid = sig - y
        rq = np.round(resid / np.maximum(nf, 1) * scale).astype(np.int64)
        rqb = np.round(resid * scale).astype(np.int64)
        g, gb = [0] * B, 0
        for d, fs in enumerate(feats):
            for b in fs:
                g[b] += int(rq[d])
            gb += int(rqb[d])
        w = w - lr * (np.array(g, dtype=np.float64) / scale / n)
        bias = bias - lr * (float(gb) / scale / n)
    assert np.array_equal(model["w"], w) and model["bias"] == bias
    z = doc_logits(w, bias)
    q = float(1 << 40)
    zq = np.round(z * q).astype(np.int64)
    prob = 1.0 / (1.0 + np.exp(-(zq.astype(np.float64) / q)))
    for i in range(n):
        assert got[i] == (int(nf[i]), int(zq[i]), float(prob[i]),
                          1 if zq[i] > 0 else 0)
    # full-batch GD on log-loss with a sane lr: monotone decreasing loss
    lh = model["loss_history"]
    assert all(lh[i + 1] < lh[i] for i in range(len(lh) - 1))


@pytest.mark.parametrize("seed", [41, 42])
def test_nb_classifier_random(ray_session, seed):
    """Engine NB train+classify equals a naive per-doc reference
    bit-for-bit (incl. the float logit) on random corpora, regardless of
    batch split."""
    import math

    import polars as pl
    from malli_ray.stages.text import nb_classify, train_nb_classifier

    rng = random.Random(seed)
    docs = _random_docs(rng, 150)
    labels = [rng.random() < 0.3 for _ in docs]
    if not any(labels):
        labels[0] = True
    if all(labels):
        labels[0] = False
    B, alpha, s = 256, 0.5, 7
    t = pa.table({"doc_id": list(range(len(docs))), "text": docs,
                  "label": labels})
    model = train_nb_classifier(rd.from_arrow(t).repartition(7),
                                "text", "label", n_buckets=B,
                                alpha=alpha, seed=s)
    got = {r["doc_id"]: (r["n_features"], r["logit_q"], r["logit"],
                         r["pred"])
           for r in nb_classify(rd.from_arrow(t).repartition(3), "text",
                                "doc_id", model).take_all()}

    # naive reference
    def feats(txt):
        ws = txt.split()
        return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]

    def buckets(fs):
        if not fs:
            return []
        h = pl.Series(fs, dtype=pl.Utf8).hash(seed=s).to_numpy()
        return [int(x) % B for x in h.astype(np.uint64)]

    doc_b = [buckets(feats(d)) for d in docs]
    cnt_p, cnt_n = [0] * B, [0] * B
    for bs, lab in zip(doc_b, labels):
        tgt = cnt_p if lab else cnt_n
        for b in bs:
            tgt[b] += 1
    tot_p = float(sum(cnt_p)) + alpha * B
    tot_n = float(sum(cnt_n)) + alpha * B
    scale = float(1 << 40)
    lam = [round((math.log((cnt_p[b] + alpha) / tot_p)
                  - math.log((cnt_n[b] + alpha) / tot_n)) * scale)
           for b in range(B)]
    prior = round((math.log(float(sum(labels)))
                   - math.log(float(len(labels) - sum(labels)))) * scale)
    for i, bs in enumerate(doc_b):
        wq = prior + sum(lam[b] for b in bs)
        assert got[i] == (len(bs), wq, float(wq) / scale,
                          1 if wq > 0 else 0)


def test_levenshtein_matches_duckdb(ray_session):
    """Byte-level Levenshtein == SQL levenshtein() (DuckDB is byte-based),
    incl. unicode and empty strings; add_edit_distance emits the exact
    one-division ratio."""
    import duckdb
    from malli_ray.stages.dedup import add_edit_distance, levenshtein
    con = duckdb.connect()
    rng = random.Random(17)
    cases = [("", ""), ("", "abc"), ("kitten", "sitting"),
             ("héllo", "hello"), ("日本語テスト", "日本語のテスト")]
    cases += [("".join(rng.choices("abcde f", k=rng.randint(0, 25))),
               "".join(rng.choices("abcdxy f", k=rng.randint(0, 25))))
              for _ in range(100)]
    for a, b in cases:
        want = con.execute("select levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert levenshtein(a, b) == want, (a, b)
    t = pa.table({"text_a": [a for a, _ in cases],
                  "text_b": [b for _, b in cases]})
    out = add_edit_distance(rd.from_arrow(t), "text_a", "text_b").take_all()
    for (a, b), r in zip(cases, out):
        d = con.execute("select levenshtein(?, ?)", [a, b]).fetchone()[0]
        denom = max(len(a.encode()), len(b.encode()), 1)
        assert r["edit_dist"] == d
        assert r["edit_ratio"] == float(d) / denom


def test_add_edit_distance_caps(ray_session):
    from malli_ray.stages.dedup import add_edit_distance
    t = pa.table({"text_a": ["x" * 100], "text_b": ["y"]})
    with pytest.raises(Exception, match="max_chars"):
        add_edit_distance(rd.from_arrow(t), "text_a", "text_b",
                          max_chars=50).take_all()
