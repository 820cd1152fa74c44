"""Scale-shape stress tests: key-count independence + Zipf-skew safety.

Two empirical pins the scale docstrings previously only claimed:

1. **Key-count independence** (the de-trapped asof/range/rolling family):
   the bucketed exchange does ONE vectorized Python call per bucket, so
   wall time must not grow with the number of distinct keys.  The old
   ``groupby(raw key).map_groups`` shape paid ~10-15s of pure Python call
   overhead per 1e5 keys at sf0.1 (NOTES_r3, measured) — a >=10x blowup
   that these tests would catch with a wide margin to spare.

2. **Hot-key (Zipf) safety** for the bucketed exchanges the engine leans
   on (uniqueness, lag_lead, top_k_per_group, exact_dedup_keep_best):
   one key carrying 20% of all rows must neither change results nor blow
   up wall time vs a uniform key mix (a hot key lands in ONE bucket —
   bounded by bucket count, never by per-key group count; map-side
   combines collapse it before the shuffle where applicable).

Timing asserts are deliberately generous (4x ratio + absolute slack) —
the box is shared and co-tenant CPU steal is real; the trap regressions
these guard against are 10-100x, far outside the noise band.
"""

import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

N_ROWS = 120_000
FEW_KEYS = 50
MANY_KEYS = 100_000


def _timed(make_ds):
    t0 = time.perf_counter()
    n = make_ds().count()
    return time.perf_counter() - t0, n


def _event_tables(rng, n_keys):
    keys = rng.integers(0, n_keys, size=N_ROWS).astype(np.int64)
    ts = rng.integers(0, 1_000_000, size=N_ROWS).astype(np.int64)
    vals = rng.integers(-5, 6, size=N_ROWS).astype(np.int64)
    ids = np.arange(N_ROWS, dtype=np.int64)
    t = pa.table({"k": keys, "ts": ts, "v": vals, "rid": ids})
    return t


def _from_arrow(t, parallelism=16):
    # from_arrow yields ONE block; repartition so the map side parallelizes
    # the same way at both key counts
    return rd.from_arrow(t).repartition(parallelism)


@pytest.mark.parametrize("op", ["asof", "range", "rolling"])
def test_window_family_key_count_independent(ray_session, op):
    """asof_join / range_join / rolling_aggregate wall time must be flat in
    the number of distinct keys (2000x more keys, same row count)."""
    from malli_ray.stages.windows import asof_join, range_join, \
        rolling_aggregate

    rng = np.random.default_rng(7)
    times = {}
    counts = {}
    for n_keys in (FEW_KEYS, MANY_KEYS):
        t = _event_tables(rng, n_keys)
        if op == "rolling":
            def run(t=t):
                return rolling_aggregate(_from_arrow(t), key="k",
                                         ts_col="ts", value_col="v",
                                         preceding=500)
        elif op == "asof":
            right = t.rename_columns(["k", "rts", "rv", "rrid"])

            def run(t=t, right=right):
                return asof_join(_from_arrow(t), _from_arrow(right),
                                 key="k", left_ts="ts", right_ts="rts",
                                 right_cols=["rrid"],
                                 left_schema=t.schema,
                                 right_schema=right.schema)
        else:
            right = t.rename_columns(["k", "rts", "rv", "rrid"])

            def run(t=t, right=right):
                return range_join(_from_arrow(t), _from_arrow(right),
                                  key="k", left_ts="ts", right_ts="rts",
                                  right_cols=["rrid"],
                                  lower=-2, upper=0,
                                  upper_inclusive=False,
                                  left_schema=t.schema,
                                  right_schema=right.schema)
        # warm the stage cache once at the small key count only
        if n_keys == FEW_KEYS:
            run().count()
        times[n_keys], counts[n_keys] = _timed(run)

    if op in ("asof", "rolling"):          # row-preserving ops
        assert counts[FEW_KEYS] == counts[MANY_KEYS] == N_ROWS
    # the trap costs >=10x at 1e5 keys; flat-in-key-count means well under
    assert times[MANY_KEYS] <= 4 * times[FEW_KEYS] + 5.0, times


def _zipf_keys(rng, n, hot_fraction=0.2, n_cold=50_000):
    hot = np.zeros(int(n * hot_fraction), dtype=np.int64)
    cold = rng.integers(1, n_cold, size=n - len(hot)).astype(np.int64)
    keys = np.concatenate([hot, cold])
    rng.shuffle(keys)
    return keys


def test_skew_uniqueness_violations(ray_session):
    from malli_ray.stages.constraints import uniqueness_violations

    rng = np.random.default_rng(11)
    n = 200_000
    res = {}
    for label, keys in (("uniform",
                         rng.integers(0, 150_000, size=n).astype(np.int64)),
                        ("skew", _zipf_keys(rng, n))):
        t = pa.table({"doc_id": keys})
        t0 = time.perf_counter()
        rows = uniqueness_violations(_from_arrow(t), "doc_id").take_all()
        res[label] = (time.perf_counter() - t0, rows)
        # exact vs numpy
        u, c = np.unique(keys, return_counts=True)
        want = {int(k): int(v) for k, v in zip(u, c) if v > 1}
        got = {int(r["doc_id"]): int(r["cnt"]) for r in rows}
        assert got == want, label
    assert res["skew"][0] <= 4 * res["uniform"][0] + 5.0, \
        {k: v[0] for k, v in res.items()}


def test_skew_lag_lead(ray_session):
    from malli_ray.stages.analytics import lag_lead

    rng = np.random.default_rng(13)
    n = 200_000
    times = {}
    for label, keys in (("uniform",
                         rng.integers(0, 150_000, size=n).astype(np.int64)),
                        ("skew", _zipf_keys(rng, n))):
        vals = rng.integers(0, 1_000, size=n).astype(np.int64)
        rid = np.arange(n, dtype=np.int64)
        t = pa.table({"k": keys, "rid": rid, "v": vals})
        t0 = time.perf_counter()
        out = lag_lead(_from_arrow(t), key="k", order_by="rid",
                       value_col="v").take_all()
        times[label] = time.perf_counter() - t0
        df = pd.DataFrame({"k": keys, "rid": rid, "v": vals})
        df = df.sort_values(["k", "rid"])
        want_lag = df.groupby("k")["v"].shift(1)
        want = dict(zip(df["rid"], want_lag))
        got = {r["rid"]: r["v_lag1"] for r in out}
        assert len(got) == n
        for ridv, lag in got.items():
            w = want[ridv]
            assert (lag is None and pd.isna(w)) or lag == w
    assert times["skew"] <= 4 * times["uniform"] + 5.0, times


def test_skew_top_k_per_group(ray_session):
    from malli_ray.stages.analytics import top_k_per_group

    rng = np.random.default_rng(17)
    n = 200_000
    times = {}
    for label, keys in (("uniform",
                         rng.integers(0, 20_000, size=n).astype(np.int64)),
                        ("skew", _zipf_keys(rng, n, n_cold=20_000))):
        vals = rng.integers(0, 1_000_000, size=n).astype(np.int64)
        rid = np.arange(n, dtype=np.int64)
        t = pa.table({"g": keys, "score": vals, "rid": rid})
        t0 = time.perf_counter()
        out = top_k_per_group(_from_arrow(t), group="g",
                              order_by=["score", "rid"], k=3).take_all()
        times[label] = time.perf_counter() - t0
        df = pd.DataFrame({"g": keys, "score": vals, "rid": rid})
        df = df.sort_values(["score", "rid"],
                            ascending=[False, True])
        top = df.groupby("g", sort=False).head(3)
        want = set(zip(top["g"].astype(int), top["rid"].astype(int)))
        got = {(int(r["g"]), int(r["rid"])) for r in out}
        assert got == want, label
    assert times["skew"] <= 4 * times["uniform"] + 5.0, times


def test_skew_exact_dedup_keep_best(ray_session):
    from malli_ray.stages.dedup import exact_dedup_keep_best

    rng = np.random.default_rng(19)
    n = 200_000
    times = {}
    for label, keys in (("uniform",
                         rng.integers(0, 150_000, size=n).astype(np.int64)),
                        ("skew", _zipf_keys(rng, n))):
        content = np.char.add("doc-", keys.astype(str))
        score = rng.integers(0, 1_000_000, size=n).astype(np.int64)
        rid = np.arange(n, dtype=np.int64)
        t = pa.table({"text": content, "id": rid, "q": score})
        t0 = time.perf_counter()
        out = exact_dedup_keep_best(_from_arrow(t), column="text",
                                    id_column="id",
                                    score_column="q").take_all()
        times[label] = time.perf_counter() - t0
        df = pd.DataFrame({"text": content, "id": rid, "q": score})
        df = df.sort_values(["q", "id"], ascending=[False, True])
        want = set(df.groupby("text", sort=False).head(1)["id"]
                   .astype(int))
        got = {int(r["id"]) for r in out}
        assert got == want, label
    assert times["skew"] <= 4 * times["uniform"] + 5.0, times


# --- round-4 sweep: key-count independence for the converted finishers ---
#
# Every op below used groupby(raw key).map_groups(per_key) before the
# round-4 de-trap sweep (one Ray Python call per distinct key).  2000x
# more keys at the same row count must not change wall time.

def _kv_table(rng, n_keys, n=N_ROWS):
    return pa.table({
        "g": rng.integers(0, n_keys, size=n).astype(np.int64),
        "v": rng.integers(0, 1_000, size=n).astype(np.int64),
        "rid": np.arange(n, dtype=np.int64)})


@pytest.mark.parametrize("op", [
    "top_k", "distinct_count", "collect", "top_fraction", "chunk_blocks",
    "group_quantile_bounds"])
def test_converted_finishers_key_count_independent(ray_session, op):
    from malli_ray.stages.analytics import (collect_by_group,
                                            distinct_count_by_group,
                                            top_k_per_group)
    from malli_ray.stages.packing import chunk_blocks
    from malli_ray.stages.sampling import (group_quantile_bounds,
                                           top_fraction_by_group)

    rng = np.random.default_rng(23)
    times = {}
    for n_keys in (FEW_KEYS, MANY_KEYS):
        t = _kv_table(rng, n_keys)
        df = pd.DataFrame({"g": t.column("g").to_numpy(),
                           "v": t.column("v").to_numpy(),
                           "rid": t.column("rid").to_numpy()})
        t0 = time.perf_counter()
        if op == "top_k":
            out = top_k_per_group(_from_arrow(t), group="g",
                                  order_by=["v", "rid"], k=2).take_all()
            sdf = df.sort_values(["v", "rid"], ascending=[False, True])
            want = set(zip(sdf.groupby("g", sort=False).head(2)["g"],
                           sdf.groupby("g", sort=False).head(2)["rid"]))
            got = {(r["g"], r["rid"]) for r in out}
            assert got == want
        elif op == "distinct_count":
            out = distinct_count_by_group(_from_arrow(t), group="g",
                                          value="v").take_all()
            want = df.groupby("g")["v"].nunique().to_dict()
            got = {r["g"]: r["n_distinct"] for r in out}
            assert got == want
        elif op == "collect":
            out = collect_by_group(_from_arrow(t), group="g", value="v",
                                   order_by=["rid"]).take_all()
            assert len(out) == df["g"].nunique()
            assert sum(r["n_items"] for r in out) == len(df)
        elif op == "top_fraction":
            out = top_fraction_by_group(_from_arrow(t), group_column="g",
                                        score_column="v", id_column="rid",
                                        fraction=0.5).take_all()
            import math
            want_n = int(sum(math.ceil(0.5 * c)
                             for c in df.groupby("g").size()))
            assert len(out) == want_n
        elif op == "chunk_blocks":
            out = chunk_blocks(_from_arrow(t), group_column="g",
                               id_column="rid", count_column="v",
                               cap=1000).take_all()
            assert len(out) == len(df)
        else:
            bounds = group_quantile_bounds(_from_arrow(t), "g", "v",
                                           0.25, 0.75)
            assert len(bounds) == df["g"].nunique()
            lo, hi = bounds[int(df["g"].iloc[0])]
            grp = df[df["g"] == df["g"].iloc[0]]["v"].to_numpy()
            assert lo == np.quantile(np.sort(grp), 0.25, method="linear")
            assert hi == np.quantile(np.sort(grp), 0.75, method="linear")
        times[n_keys] = time.perf_counter() - t0
    assert times[MANY_KEYS] <= 4 * times[FEW_KEYS] + 5.0, times


def test_inverted_index_vocab_count_independent(ray_session):
    """build_inverted_index's old finisher made one Ray call per WORD;
    the bucketed rewrite must be flat in vocabulary size."""
    from malli_ray.stages.text import build_inverted_index

    rng = np.random.default_rng(29)
    n_docs = 20_000
    times = {}
    for label, vocab in (("small", 50), ("large", 60_000)):
        words = rng.integers(0, vocab, size=(n_docs, 6))
        texts = [" ".join(f"w{w}" for w in row) for row in words]
        t = pa.table({"doc_id": np.arange(n_docs, dtype=np.int64),
                      "body": texts})
        t0 = time.perf_counter()
        out = build_inverted_index(_from_arrow(t), text_column="body",
                                   id_column="doc_id",
                                   min_df=2).take_all()
        times[label] = time.perf_counter() - t0
        # cross-check df counts against pandas
        pairs = {(f"w{w}", i) for i, row in enumerate(words)
                 for w in row}
        dfc = pd.Series([w for w, _ in pairs]).value_counts()
        want = {w: int(c) for w, c in dfc.items() if c >= 2}
        got = {r["word"]: r["df"] for r in out}
        assert got == want, label
        # postings are the sorted distinct doc ids
        some = out[0]
        ids = [int(x) for x in some["postings"].split(",")]
        assert ids == sorted(set(ids)) and len(ids) == some["df"]
    assert times["large"] <= 4 * times["small"] + 5.0, times


def test_top_k_null_numeric_group(ray_session):
    """A nullable NUMERIC group column: nulls must form ONE group (SQL
    GROUP BY), not per-row NaN runs (the numpy-equality pitfall)."""
    from malli_ray.stages.analytics import top_k_per_group

    t = pa.table({
        "g": pa.array([1, 1, None, None, None, 2], type=pa.int64()),
        "v": pa.array([5, 7, 9, 8, 6, 3], type=pa.int64()),
        "rid": pa.array(list(range(6)), type=pa.int64())})
    out = top_k_per_group(rd.from_arrow(t), group="g",
                          order_by=["v", "rid"], k=2).take_all()
    got = {(r["g"], r["rid"], r["rk"]) for r in out}
    assert got == {(1, 1, 1), (1, 0, 2),        # g=1: v=7 then v=5
                   (None, 2, 1), (None, 3, 2),  # null group: v=9, v=8
                   (2, 5, 1)}


def test_null_numeric_key_groups_once(ray_session):
    """Nullable NUMERIC keys across the run-masked family: nulls must form
    ONE group (SQL GROUP BY/PARTITION BY), not per-row NaN runs."""
    from malli_ray.stages.analytics import lag_lead
    from malli_ray.stages.windows import sessionize

    t = pa.table({
        "k": pa.array([1, 1, None, None, 2], type=pa.int64()),
        "ts": pa.array([0, 10, 0, 5, 0], type=pa.int64()),
        "v": pa.array([10, 20, 30, 40, 50], type=pa.int64()),
        "rid": pa.array(list(range(5)), type=pa.int64())})
    out = lag_lead(rd.from_arrow(t), key="k", order_by="rid",
                   value_col="v").take_all()
    lags = {r["rid"]: r["v_lag1"] for r in out}
    # rid=3 (null key) must see rid=2's value — one null group
    assert lags[3] == 30 and lags[2] is None
    assert lags[1] == 10 and lags[0] is None and lags[4] is None

    t2 = pa.table({
        "user": pa.array([None, None, 7], type=pa.int64()),
        "ts": pa.array([0, 600_000_000, 0], type=pa.timestamp("us"))})
    sess = sessionize(rd.from_arrow(t2), key="user", ts_col="ts",
                      gap_minutes=30).take_all()
    by_user = {}
    for r in sess:
        by_user.setdefault(r["user"], []).append(r["n_events"])
    # the two null-key events are 10min apart (< gap) -> ONE session of 2
    # in ONE null group; per-row NaN runs would yield two 1-event sessions
    assert by_user[None] == [2]
    assert by_user[7] == [1]


def _skewed_join_inputs(n=60_000, hot_share=0.3, n_cold=500, seed=7):
    rng = np.random.default_rng(seed)
    keys = np.where(rng.random(n) < hot_share, 0,
                    rng.integers(1, n_cold, n)).astype(np.int64)
    karr = [None if i % 5000 == 0 else int(keys[i]) for i in range(n)]
    lt = pa.table({"k": pa.array(karr, pa.int64()),
                   "lv": pa.array(np.arange(n, dtype=np.int64))})
    rk, rv = [], []
    for key in range(n_cold):
        for j in range(3 if key == 0 else int(rng.integers(0, 3))):
            rk.append(key)
            rv.append(key * 10 + j)
    rt = pa.table({"rk": pa.array(rk, pa.int64()),
                   "rv": pa.array(rv, pa.int64())})
    return lt, rt


def test_skew_join_matches_reference(ray_session):
    """Hybrid hot/cold join == plain SQL inner join bit-for-bit: one
    planet-sized hot key (30%, 3 build rows -> multi-match fan-out),
    ~500 cold keys, null left keys dropped (equi-join semantics)."""
    import polars as pl
    from malli_ray.stages.joins import hot_keys, skew_join

    lt, rt = _skewed_join_inputs()
    left = rd.from_arrow(lt).repartition(8)
    right = rd.from_arrow(rt).repartition(4)
    assert list(hot_keys(left, "k", min_share=0.05)) == [0]
    out = skew_join(left, right, on="k", right_on="rk",
                    right_value_cols=["rv"], min_share=0.05)
    got = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    assert got.column_names == ["k", "lv", "rv"]
    want = (pl.from_arrow(lt).join(
        pl.from_arrow(rt), left_on="k", right_on="rk", how="inner")
        .select(["k", "lv", "rv"]).sort(["k", "lv", "rv"]))
    got_pl = pl.from_arrow(got).sort(["k", "lv", "rv"])
    assert got_pl.equals(want)


def test_skew_join_no_hot_fallback(ray_session):
    """Uniform keys at a high min_share: no hot keys detected -> the
    plain hash-join fallback, same rows, same column contract."""
    import polars as pl
    from malli_ray.stages.joins import hot_keys, skew_join

    n = 20_000
    rng = np.random.default_rng(3)
    lt = pa.table({"k": pa.array(rng.integers(0, 200, n), pa.int64()),
                   "lv": pa.array(np.arange(n, dtype=np.int64))})
    rt = pa.table({"rk": pa.array(np.arange(200, dtype=np.int64)),
                   "rv": pa.array(np.arange(200, dtype=np.int64) * 2)})
    left = rd.from_arrow(lt).repartition(4)
    assert len(hot_keys(left, "k", min_share=0.5)) == 0
    out = skew_join(left, rd.from_arrow(rt), on="k", right_on="rk",
                    right_value_cols=["rv"], min_share=0.5)
    got = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    assert got.column_names == ["k", "lv", "rv"]
    assert got.num_rows == n
    want = (pl.from_arrow(lt).join(pl.from_arrow(rt), left_on="k",
                                   right_on="rk", how="inner")
            .select(["k", "lv", "rv"]).sort(["k", "lv", "rv"]))
    assert pl.from_arrow(got).sort(["k", "lv", "rv"]).equals(want)


def test_skew_join_hot_build_cap_raises(ray_session):
    from malli_ray.stages.joins import skew_join

    lt, rt = _skewed_join_inputs(n=20_000)
    with pytest.raises(ValueError, match="max_hot_build_rows"):
        skew_join(rd.from_arrow(lt).repartition(4), rd.from_arrow(rt),
                  on="k", right_on="rk", right_value_cols=["rv"],
                  min_share=0.05, max_hot_build_rows=2)


def test_skew_join_string_keys(ray_session):
    """skew_join over STRING keys: the hot-key probe, broadcast build
    sort, and membership splits all run on object arrays."""
    import polars as pl
    from malli_ray.stages.joins import hot_keys, skew_join

    n = 30_000
    rng = np.random.default_rng(11)
    keys = np.where(rng.random(n) < 0.4, "hot",
                    np.char.add("k", rng.integers(0, 300, n).astype(str)))
    lt = pa.table({"k": pa.array(keys.tolist(), pa.string()),
                   "lv": pa.array(np.arange(n, dtype=np.int64))})
    rk = ["hot", "hot"] + [f"k{i}" for i in range(300)]
    rt = pa.table({"rk": pa.array(rk, pa.string()),
                   "rv": pa.array(np.arange(len(rk), dtype=np.int64))})
    left = rd.from_arrow(lt).repartition(6)
    assert list(hot_keys(left, "k", min_share=0.1)) == ["hot"]
    out = skew_join(left, rd.from_arrow(rt), on="k", right_on="rk",
                    right_value_cols=["rv"], min_share=0.1)
    got = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    want = (pl.from_arrow(lt).join(pl.from_arrow(rt), left_on="k",
                                   right_on="rk", how="inner")
            .select(["k", "lv", "rv"]).sort(["k", "lv", "rv"]))
    assert pl.from_arrow(got).sort(["k", "lv", "rv"]).equals(want)


def test_budget_sample_semantics(ray_session):
    """budget_sample: inclusive hash-order prefix per group, budget =
    floor(fraction x group total), groups independent, rerun-identical
    under repartition."""
    from malli_ray.stages.sampling import KNUTH_MULT, budget_sample

    rng = np.random.default_rng(13)
    n = 6000
    t = pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "g": pa.array((np.arange(n) % 3).astype(np.int64)),
        "w": pa.array(rng.integers(1, 100, n).astype(np.int64))})
    out = budget_sample(rd.from_arrow(t).repartition(7), "g", "w", "id",
                        fraction=0.5, num_buckets=8).take_all()
    kept = {r["id"] for r in out}
    # independent reference
    h = ((np.arange(n).astype(np.uint64) % (1 << 32))
         * np.uint64(KNUTH_MULT)) % np.uint64(1 << 32)
    df = pd.DataFrame({"id": np.arange(n), "g": np.arange(n) % 3,
                       "w": t.column("w").to_numpy(), "h": h})
    want = set()
    for g, grp in df.groupby("g"):
        grp = grp.sort_values(["h", "id"])
        budget = int(np.floor(0.5 * float(grp["w"].sum())))
        cum = grp["w"].cumsum()
        want |= set(grp.loc[cum <= budget, "id"])
    assert kept == want
    # share of weight is close to (and never exceeds) the fraction
    for g, grp in df.groupby("g"):
        share = df[(df.g == g) & (df.id.isin(kept))]["w"].sum() \
            / grp["w"].sum()
        assert share <= 0.5 and share > 0.45
    out2 = budget_sample(rd.from_arrow(t).repartition(3), "g", "w", "id",
                         fraction=0.5, num_buckets=8).take_all()
    assert {r["id"] for r in out2} == kept


def test_skew_assemble_packed_blocks(ray_session):
    """The fragment design's skew claim, empirically pinned: a 90%-hot
    group assembles in comparable wall time to a uniform mix (block-keyed
    fragment buckets are hash-balanced regardless of group skew), and the
    per-group token totals are conserved exactly."""
    from malli_ray.stages.packing import assemble_packed_blocks

    rng = np.random.default_rng(31)
    n = 60_000
    B = 256
    res = {}
    for label, grp in (
            ("uniform", rng.integers(0, 10, size=n)),
            ("skew", np.where(rng.random(n) < 0.9, 0,
                              rng.integers(1, 10, size=n)))):
        lens = rng.integers(1, 200, size=n)
        off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=off[1:])
        vals = rng.integers(0, 50_000, int(off[-1])).astype(np.int32)
        t = pa.table({
            "doc_id": pa.array([f"d{i:07d}" for i in range(n)]),
            "tokens": pa.ListArray.from_arrays(
                pa.array(off.astype(np.int32), pa.int32()),
                pa.array(vals)),
            "source": pa.array([f"s{g}" for g in grp])})
        ds = _from_arrow(t)
        t0 = time.perf_counter()
        out = assemble_packed_blocks(ds, block_size=B,
                                     num_buckets=16).materialize()
        dt = time.perf_counter() - t0
        agg = {}
        for b in out.iter_batches(batch_format="pyarrow", batch_size=None):
            for s, ntok in zip(b.column("source").to_pylist(),
                               b.column("n_tokens").to_pylist()):
                agg[s] = agg.get(s, 0) + int(ntok)
        want = {}
        for g, ln in zip(grp, lens):
            want[f"s{g}"] = want.get(f"s{g}", 0) + int(ln)
        assert agg == want, label
        res[label] = dt
    assert res["skew"] <= 2.5 * res["uniform"] + 5.0, res


_WALL_RE = None


def _task_wall_spread(stats_str):
    """Parse ds.stats() 'Remote wall time' lines into (max, mean, total)
    tuples per operator, so straggler pins can assert on the actual task
    distribution instead of end-to-end wall time."""
    import re
    global _WALL_RE
    if _WALL_RE is None:
        num = r"([0-9.]+)(us|ms|s|m)\b"
        _WALL_RE = re.compile(
            r"Remote wall time: " + num + r" min, " + num + r" max, "
            + num + r" mean, " + num + r" total")
    scale = {"us": 1e-6, "ms": 1e-3, "s": 1.0, "m": 60.0}

    out = []
    for m in _WALL_RE.finditer(stats_str):
        mx = float(m.group(3)) * scale[m.group(4)]
        mean = float(m.group(5)) * scale[m.group(6)]
        tot = float(m.group(7)) * scale[m.group(8)]
        out.append((mx, mean, tot))
    return out


def test_skew_assemble_straggler_pin_1m(ray_session):
    """Straggler-resilience regression pin for the trainer repack at 1M
    rows: with ONE group holding 90% of all tokens, no assembly stage may
    concentrate work in a straggler task — every operator whose total
    remote wall time exceeds 1s must keep max-task <= 4x mean-task
    (the block-level fragment design's core claim; the rejected
    one-exchange-per-group design measured a 55s hot-group task)."""
    from malli_ray.stages.packing import assemble_packed_blocks

    rng = np.random.default_rng(47)
    n = 1_000_000
    grp = np.where(rng.random(n) < 0.9, 0, rng.integers(1, 10, size=n))
    lens = rng.integers(1, 60, size=n)
    off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=off[1:])
    vals = rng.integers(0, 50_000, int(off[-1])).astype(np.int32)
    t = pa.table({
        "doc_id": pa.array([f"d{i:07d}" for i in range(n)]),
        "tokens": pa.ListArray.from_arrays(
            pa.array(off.astype(np.int32), pa.int32()),
            pa.array(vals)),
        "source": pa.array([f"s{g}" for g in grp])})
    ds = _from_arrow(t)
    out = assemble_packed_blocks(ds, block_size=512,
                                 num_buckets=32).materialize()
    # exact global token conservation + the hot group dominates as seeded
    import pyarrow.compute as pc
    tot = hot = 0
    for b in out.iter_batches(batch_format="pyarrow", batch_size=None):
        ntok = b.column("n_tokens").to_numpy(zero_copy_only=False)
        is_hot = np.asarray(pc.equal(b.column("source"), "s0"))
        tot += int(ntok.sum())
        hot += int(ntok[is_hot].sum())
    assert tot == int(lens.sum())
    assert hot / tot > 0.85
    spreads = _task_wall_spread(out.stats())
    heavy = [(mx, mean) for mx, mean, total in spreads if total > 1.0]
    assert heavy, "expected at least one >1s-total stage at 1M rows"
    for mx, mean in heavy:
        assert mx <= 4.0 * mean + 0.5, (
            f"straggler task: max {mx:.2f}s vs mean {mean:.2f}s\n"
            + out.stats())


def test_skew_token_span_dedup_hot_gram(ray_session):
    """Pathological dup-heavy corpus for token span dedup: ONE 12-token
    motif appears in EVERY doc (100k docs), so a handful of gram buckets
    hold ~300k occurrences while most hold the unique boundary grams.
    Correctness: every doc except the global-first id gets exactly one
    12-token span over the motif; no stage concentrates into a straggler
    (max-task <= 4x mean for every >1s stage)."""
    from malli_ray.stages.dedup import duplicate_token_spans

    rng = np.random.default_rng(53)
    n = 100_000
    k = 10
    motif = rng.integers(0, 50_000, 12).astype(np.int32)
    bodies = [rng.integers(0, 50_000, 24).astype(np.int32) for _ in range(8)]
    rows, starts = [], []
    for i in range(n):
        body = bodies[i % 8].copy()
        body[:4] = rng.integers(0, 50_000, 4)     # unique-ish prefix
        p = 4 + int(rng.integers(0, 8))
        rows.append(np.concatenate([body[:p], motif, body[p:]]))
        starts.append(p)
    ids = [f"d{i:06d}" for i in range(n)]
    off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum([len(r) for r in rows], out=off[1:])
    t = pa.table({
        "doc_id": pa.array(ids),
        "tokens": pa.ListArray.from_arrays(
            pa.array(off.astype(np.int32), pa.int32()),
            pa.array(np.concatenate(rows)))})
    out = duplicate_token_spans(_from_arrow(t), "tokens", "doc_id",
                                k=k, num_buckets=32).materialize()
    got = {}
    for b in out.iter_batches(batch_format="pyarrow", batch_size=None):
        for d, s, e in zip(b.column("doc_id").to_pylist(),
                           b.column("span_start").to_pylist(),
                           b.column("span_end").to_pylist()):
            got.setdefault(d, []).append((s, e))
    # shared bodies mean spans can extend beyond the motif; the motif
    # interval itself must be covered in every doc but the global first
    covered = 0
    for i in range(1, n):
        spans = got.get(ids[i], [])
        if any(s <= starts[i] and e >= starts[i] + 12 for s, e in spans):
            covered += 1
    assert covered == n - 1, covered
    spreads = _task_wall_spread(out.stats())
    heavy = [(mx, mean) for mx, mean, total in spreads if total > 1.0]
    for mx, mean in heavy:
        assert mx <= 4.0 * mean + 0.5, (mx, mean)
