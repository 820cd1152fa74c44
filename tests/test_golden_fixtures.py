"""Golden-fixture drift guard.

The committed fixtures under fixtures/golden/ are the driver's oracle for
the hash-based dedup queries (fingerprint/simhash/minhash — deterministic
functions of text that SQL can't recompute).  This re-derives the sf0.001
fixtures from the INDEPENDENT per-document implementations in
tools/make_golden.py and checks (a) the committed parquet still matches the
derivation and (b) the engine's distributed output still matches the
fixture — so any engine or generator change that shifts values fails here
before the driver sees it.
"""

import importlib.util
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

spec = importlib.util.spec_from_file_location(
    "make_golden", os.path.join(REPO, "tools", "make_golden.py"))
make_golden = importlib.util.module_from_spec(spec)
spec.loader.exec_module(make_golden)

SF = "sf0.001"
SF_DIR = f"/root/testdata/{SF}"
GOLD = os.path.join(REPO, "fixtures", "golden", SF)


@pytest.fixture(scope="module")
def docs():
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    return t.column("doc_id").to_pylist(), t.column("text").to_pylist()


def _sorted_pandas(tbl, cols):
    return tbl.to_pandas()[cols].sort_values(cols).reset_index(drop=True)


def test_fingerprint_fixture_rederives(docs):
    ids, texts = docs
    want = [str(make_golden.fingerprint_doc(t)) for t in texts]
    got = pq.read_table(f"{GOLD}/fingerprint_documents.parquet")
    assert got.column("doc_id").to_pylist() == ids
    assert got.column("fingerprint").to_pylist() == want


def test_simhash_fixture_rederives(docs):
    ids, texts = docs
    want = [str(make_golden.simhash_doc(t)) for t in texts]
    got = pq.read_table(f"{GOLD}/simhash_documents.parquet")
    assert got.column("doc_id").to_pylist() == ids
    assert got.column("simhash").to_pylist() == want


def test_minhash_fixture_rederives(docs):
    ids, texts = docs
    want = make_golden.minhash_pairs(ids, texts)
    got = pq.read_table(f"{GOLD}/minhash_dedup_documents.parquet")
    assert [tuple(r.values()) for r in got.to_pylist()] == want


def test_simhash_pairs_fixture_rederives(docs):
    ids, texts = docs
    want = make_golden.simhash_verified_pairs(ids, texts)
    got = pq.read_table(f"{GOLD}/near_dup_pairs_simhash.parquet")
    assert [tuple(r.values()) for r in got.to_pylist()] == want


def test_bm25_fixture_rederives(docs):
    ids, texts = docs
    want = make_golden.bm25_topk_ref(ids, texts)
    got = pq.read_table(f"{GOLD}/bm25_topk_documents.parquet")
    assert [tuple(r.values()) for r in got.to_pylist()] == want
    # engine/fixture query sets must stay in lockstep
    import __ray_entry__ as e
    assert e._BM25_QUERIES == make_golden.BM25_QUERIES


def test_dsir_fixture_rederives(docs):
    ids, texts = docs
    srcs = pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["source"]).column("source").to_pylist()
    want = make_golden.dsir_weights_ref(ids, texts, srcs)
    got = pq.read_table(f"{GOLD}/dsir_weights_documents.parquet")
    assert [tuple(r.values()) for r in got.to_pylist()] == want


def test_bpe_fixtures_rederive(docs):
    ids, texts = docs
    merges = make_golden.bpe_merges_ref(texts)
    got = pq.read_table(f"{GOLD}/bpe_merges_documents.parquet")
    assert [tuple(r.values()) for r in got.to_pylist()] == merges
    enc = make_golden.bpe_encode_ref(texts, merges)
    got = pq.read_table(f"{GOLD}/bpe_tokenize_documents.parquet")
    assert [tuple(r.values()) for r in got.to_pylist()] == \
        [(i, n, s) for i, (n, s) in zip(ids, enc)]


def test_compression_fixture_rederives(docs):
    ids, texts = docs
    want = make_golden.compression_ref(texts)
    got = pq.read_table(f"{GOLD}/compression_documents.parquet")
    assert [tuple(r.values()) for r in got.to_pylist()] == \
        [(i, a, b, c) for i, (a, b, c) in zip(ids, want)]


def test_entropy_fixture_rederives(docs):
    ids, texts = docs
    want = make_golden.entropy_ref(texts)
    got = pq.read_table(f"{GOLD}/entropy_documents.parquet")
    assert [tuple(r.values()) for r in got.to_pylist()] == \
        [(i, n, q, e) for i, (n, q, e) in zip(ids, want)]
    # edge cases the corpus may not cover: empty + single-word +
    # all-same-word (H == 0) + uniform two-word (H == ln 2 quantized)
    import math
    ref = make_golden.entropy_ref(["", "one", "dup dup dup", "a b"])
    assert ref[0] == (0, 0, 0.0)
    assert ref[1] == (1, 0, 0.0)
    assert ref[2][1] == 0 and ref[2][2] == 0.0  # n*q(n) - n*q(n)
    q2 = int(math.floor(math.log(2) * (1 << 40) + 0.5))
    assert ref[3] == (2, 2 * q2, float(2 * q2) / float(2 << 40))


def test_image_dhash_fixtures_rederive(docs):
    ids, _ = docs
    hs, pairs = make_golden.image_near_dups_ref(ids)
    got_h = pq.read_table(f"{GOLD}/image_dhash_documents.parquet")
    assert [tuple(r.values()) for r in got_h.to_pylist()] == \
        [(i, v - (1 << 64) if v >= (1 << 63) else v) for i, v in hs]
    got_p = pq.read_table(f"{GOLD}/image_near_dups.parquet")
    assert [tuple(r.values()) for r in got_p.to_pylist()] == pairs
    assert len(pairs) >= 10  # the planted every-5th-doc copies are found


def test_bigram_lm_fixture_rederives(docs):
    ids, texts = docs
    corpus = [t for i, t in zip(ids, texts) if i % 2 == 0]
    want = make_golden.bigram_lm_ref(texts, corpus)
    got = pq.read_table(f"{GOLD}/bigram_lm_documents.parquet")
    assert [tuple(r.values()) for r in got.to_pylist()] == \
        [(i, n, lp, a) for i, (n, lp, a) in zip(ids, want)]
    # the three scoring branches all fire on a controlled corpus
    ref = make_golden.bigram_lm_ref(
        ["a b", "a c", "zz qq"], corpus_texts=["a b x", "c d"])
    import math
    q = lambda x: int(math.floor(math.log(x) * (1 << 40) + 0.5))
    n_tot = 5
    #  'a b': bigram seen once, c(a)=1 -> lp = q(1) - q(1) = 0
    assert ref[0] == (1, 0, 0.0)
    #  'a c': bigram unseen, c seen -> backoff
    assert ref[1][1] == q(0.4) + q(1) - q(n_tot)
    #  'zz qq': both OOV -> uniform
    assert ref[2][1] == -q(n_tot)


def test_pca_fixture_rederives():
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    want = make_golden.pca_ref(t.column("vec_id").to_pylist(),
                               t.column("embedding").to_pylist())
    got = pq.read_table(f"{GOLD}/pca_embeddings.parquet")
    assert [tuple(r.values()) for r in got.to_pylist()] == want
    # PC1 must explain at least as much spread as PC4 (eigval ordering)
    import numpy as np
    arr = np.array([w[1:] for w in want])
    var = arr.var(axis=0)
    assert var[0] >= var[-1]


def test_audio_fp_fixtures_rederive(docs):
    ids, _ = docs
    hs, pairs = make_golden.audio_near_dups_ref(ids)
    got_h = pq.read_table(f"{GOLD}/audio_fp_documents.parquet")
    assert [tuple(r.values()) for r in got_h.to_pylist()] == \
        [(i, v - (1 << 64) if v >= (1 << 63) else v) for i, v in hs]
    got_p = pq.read_table(f"{GOLD}/audio_near_dups.parquet")
    assert [tuple(r.values()) for r in got_p.to_pylist()] == pairs
    assert len(pairs) >= 10


def test_wav_codec_edges():
    import numpy as np
    from malli_ray.stages.multimodal import (audio_fp64, decode_wav_pcm16,
                                             wrap_pcm_wav)

    pcm = np.array([0, 100, -100, 32767, -32768, 7], dtype=np.int16)
    assert np.array_equal(decode_wav_pcm16(wrap_pcm_wav(pcm.tobytes())), pcm)
    # short signal pads with zeros to grid+1 segments
    assert isinstance(audio_fp64(pcm), int)
    # undecodable payloads -> None, never raise
    assert decode_wav_pcm16(b"") is None
    assert decode_wav_pcm16(b"RIFFxxxxWAVE") is None
    assert decode_wav_pcm16(b"not audio at all") is None
    # stereo / non-PCM fmt rejected
    stereo = wrap_pcm_wav(pcm.tobytes(), channels=2)
    assert decode_wav_pcm16(stereo) is None
    # engine fingerprint matches the fixture's per-sample reference
    assert audio_fp64(make_golden._synth_audio_ref(9)) == \
        make_golden.audio_fp_ref(9)


def test_bmp_codec_edges():
    import numpy as np
    from malli_ray.stages.multimodal import decode_bmp, dhash64, make_bmp

    # row padding: w=5 -> stride 16 != 15
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(make_bmp(px)), px)
    # top-down BMP (negative height) decodes to the same pixels
    import struct
    body = make_bmp(px)
    h, w = px.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w * 3] = px[:, :, ::-1].reshape(h, w * 3)  # natural order, BGR
    topdown = body[:14] + struct.pack(
        "<IiiHHIIiiII", 40, w, -h, 1, 24, 0, stride * h, 2835, 2835, 0, 0) \
        + rows.tobytes()
    assert np.array_equal(decode_bmp(topdown), px)
    # undecodable payloads -> None, never raise
    assert decode_bmp(b"") is None
    assert decode_bmp(b"BM" + b"\0" * 60) is None
    assert decode_bmp(body[:40]) is None
    # engine dhash matches the fixture's per-pixel reference on a real doc
    assert dhash64(make_golden._synth_pixels_ref(7)) == \
        make_golden.dhash_ref(7)


def test_pq_topk_fixture_rederives():
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    want = make_golden.pq_topk_ref(t.column("vec_id").to_pylist(),
                                   t.column("embedding").to_pylist())
    got = pq.read_table(f"{GOLD}/pq_topk_embeddings.parquet")
    assert [tuple(r.values()) for r in got.to_pylist()] == want


def test_ivfpq_topk_fixture_rederives():
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    want = make_golden.ivfpq_topk_ref(t.column("vec_id").to_pylist(),
                                      t.column("embedding").to_pylist())
    got = pq.read_table(f"{GOLD}/ivfpq_topk_embeddings.parquet")
    assert [tuple(r.values()) for r in got.to_pylist()] == want


def test_image_patches_fixture_rederives():
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    ids = t.column("doc_id").to_pylist()[:20]
    want = make_golden.image_patches_ref(ids)
    got = pq.read_table(f"{GOLD}/image_patches_documents.parquet")
    got = got.filter(pa.compute.is_in(got.column("doc_id"),
                                      pa.array(sorted(ids))))
    assert [tuple(r.values()) for r in got.to_pylist()] == want


def test_ann_join_fixture_rederives():
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    want = make_golden.ann_join_ref(t.column("vec_id").to_pylist(),
                                    t.column("embedding").to_pylist())
    got = pq.read_table(f"{GOLD}/ann_join_embeddings.parquet")
    assert [tuple(r.values()) for r in got.to_pylist()] == want


def test_embedding_pairs_fixture_rederives():
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    want = make_golden.embedding_pairs(t.column("vec_id").to_pylist(),
                                       t.column("embedding").to_pylist())
    got = pq.read_table(f"{GOLD}/embedding_near_dups.parquet")
    assert [tuple(r.values()) for r in got.to_pylist()] == want


def test_semantic_pairs_fixture_rederives():
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    want = make_golden.semantic_dedup_pairs_ref(
        t.column("vec_id").to_pylist(), t.column("embedding").to_pylist())
    got = pq.read_table(f"{GOLD}/semantic_dedup_embeddings.parquet")
    assert len(want) == 50          # every synthesized dup pair recovered
    assert [tuple(r.values()) for r in got.to_pylist()] == want


def test_ivf_topk_fixture_rederives():
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    want = make_golden.ivf_topk_ref(t.column("vec_id").to_pylist(),
                                    t.column("embedding").to_pylist())
    got = pq.read_table(f"{GOLD}/ivf_topk_embeddings.parquet")
    assert [tuple(r.values()) for r in got.to_pylist()] == want
    assert len(want) == 10                     # 2 queries x k=5


def test_infer_schema_fixture_rederives():
    want = make_golden.infer_schema_ref(SF)
    got = pq.read_table(f"{GOLD}/infer_schema_documents.parquet")
    assert got.column("schema_form").to_pylist() == [want]


@pytest.mark.parametrize("name,cols", [
    ("fingerprint_documents", ["doc_id", "fingerprint"]),
    ("simhash_documents", ["doc_id", "simhash"]),
    ("minhash_dedup_documents", ["id_a", "id_b", "est_jaccard"]),
    ("near_dup_pairs_simhash", ["id_a", "id_b", "jaccard"]),
    ("embedding_near_dups", ["id_a", "id_b", "cosine"]),
    ("semantic_dedup_embeddings", ["id_a", "id_b", "cosine"]),
    ("infer_schema_documents", ["schema_form"]),
    ("ivf_topk_embeddings", ["query_id", "vec_id"]),
    ("bpe_merges_documents", ["rank", "left", "right", "pair_count"]),
    ("bpe_tokenize_documents", ["doc_id", "n_bpe", "bpe_text"]),
    ("compression_documents",
     ["doc_id", "n_bytes", "n_compressed", "compression_ratio"]),
    ("pq_topk_embeddings", ["query_id", "vec_id"]),
    ("ivfpq_topk_embeddings", ["query_id", "vec_id"]),
])
def test_engine_matches_fixture(ray_session, name, cols):
    import __ray_entry__ as entrymod
    res = entrymod.queries()[name](SF_DIR)
    gold = pq.read_table(f"{GOLD}/{name}.parquet")
    if isinstance(res, pa.Table):
        tbl = res
    else:
        batches = list(res.iter_batches(batch_format="pyarrow"))
        if not batches:
            assert gold.num_rows == 0
            # the driver compares schemas even for empty results
            assert [f.name for f in res.schema().base_schema] == cols
            return
        tbl = pa.concat_tables(batches)
    assert sorted(tbl.column_names) == sorted(cols)
    a = _sorted_pandas(tbl, cols)
    b = _sorted_pandas(gold, cols)
    assert a.shape == b.shape
    assert a.equals(b), f"{name}: engine output diverged from golden fixture"


def test_nb_classify_fixture_rederives(docs):
    ids, texts = docs
    srcs = pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["source"]).column("source").to_pylist()
    want = make_golden.nb_classify_ref(ids, texts, srcs)
    got = pq.read_table(f"{GOLD}/nb_classify_documents.parquet")
    assert [tuple(r.values()) for r in got.to_pylist()] == want


def test_logreg_classify_fixture_rederives(docs):
    ids, texts = docs
    srcs = pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["source"]).column("source").to_pylist()
    want = make_golden.logreg_classify_ref(ids, texts, srcs)
    got = pq.read_table(f"{GOLD}/logreg_classify_documents.parquet")
    assert [tuple(r.values()) for r in got.to_pylist()] == want


def test_incremental_near_dup_fixture_rederives(docs):
    ids, texts = docs
    want = make_golden.incremental_near_dup_ref(ids, texts)
    got = pq.read_table(f"{GOLD}/incremental_near_dup_documents.parquet")
    assert [tuple(r.values()) for r in got.to_pylist()] == want


def test_approx_distinct_fixture_rederives():
    ev = pq.read_table(f"{SF_DIR}/events.parquet",
                       columns=["event_type", "event_id"])
    want = make_golden.approx_distinct_ref(
        ev.column("event_type").to_pylist(),
        ev.column("event_id").to_pylist())
    got = pq.read_table(f"{GOLD}/approx_distinct_events.parquet")
    assert sorted(zip(got.column("event_type").to_pylist(),
                      got.column("approx_distinct").to_pylist())) == want
    # sanity: estimates are near the true distinct counts (HLL p=12
    # relative error ~1.6%; allow 5%)
    import collections
    true = collections.Counter(ev.column("event_type").to_pylist())
    for et, est in want:
        assert abs(est - true[et]) <= max(5, 0.05 * true[et]), (et, est)


def test_split_by_domain_fixture_rederives(docs):
    ids, texts = docs
    want = make_golden.split_by_domain_ref(ids, texts)
    got = pq.read_table(f"{GOLD}/split_by_domain_documents.parquet")
    assert got.column("doc_id").to_pylist() == [r[0] for r in want]
    assert got.column("domain").to_pylist() == [r[1] for r in want]
    assert got.column("split").to_pylist() == [r[2] for r in want]
    # leakage-safety invariant: one split label per domain
    by_dom = {}
    for _, d, s in want:
        by_dom.setdefault(d, set()).add(s)
    assert all(len(v) == 1 for v in by_dom.values())


def test_pack_sequences_fixture_rederives():
    from malli_ray.sources.sequences import ensure_sequences, sequences_dir_for
    import glob
    seq_dir, seq_n = sequences_dir_for(0.001)
    ensure_sequences(seq_dir, seq_n)
    seq = pa.concat_tables([
        pq.read_table(p, columns=["doc_id", "tokens"])
        for p in sorted(glob.glob(os.path.join(seq_dir, "*.parquet")))])
    ids = seq.column("doc_id").to_pylist()
    lens = [min(len(t), 2048) for t in seq.column("tokens").to_pylist()]
    want = make_golden.spfhp_pack_ref(ids, lens, 2048)
    got = pq.read_table(f"{GOLD}/pack_sequences.parquet")
    assert got.column("doc_id").to_pylist() == [r[0] for r in want]
    assert got.column("length").to_pylist() == [r[1] for r in want]
    assert got.column("pack_id").to_pylist() == [r[2] for r in want]
    # invariants: no pack over capacity, contiguous pack ids, every doc
    fills = {}
    for _, L, p in want:
        fills[p] = fills.get(p, 0) + L
    assert max(fills.values()) <= 2048
    assert set(fills) == set(range(len(fills)))
    assert len(want) == len(ids)


def test_spfhp_plan_matches_naive_reference():
    """Randomized differential: the histogram-level planner (engine) must
    assign bit-identically to the naive per-doc linear-scan reference."""
    import numpy as np
    from malli_ray.stages.packing import spfhp_plan

    rng = np.random.default_rng(7)
    for _ in range(10):
        max_len = int(rng.integers(4, 64))
        n = int(rng.integers(1, 300))
        lengths = rng.integers(1, max_len + 1, n).tolist()
        ids = [f"d{int(x):06d}" for x in rng.integers(0, n, n)]
        want = sorted((i, L, p)
                      for i, L, p in make_golden.spfhp_pack_ref(
                          ids, lengths, max_len))
        hist = np.bincount(lengths, minlength=max_len + 1)
        plan, n_packs, _ = spfhp_plan(hist, max_len)
        order = sorted(range(n), key=lambda p: (lengths[p], ids[p]))
        got, cur, r = [], None, 0
        for p in order:
            L = lengths[p]
            if L != cur:
                cur, r = L, 0
            rs, istarts = plan[L]
            j = int(np.searchsorted(rs, r, side="right")) - 1
            got.append((ids[p], L, int(istarts[j] + (r - rs[j]))))
            r += 1
        assert sorted(got) == want
        assert len({pk for _, _, pk in got}) == n_packs


def test_validate_sequences_fixture_rederives():
    """The validate_sequences fixture rederives from the independent
    DuckDB + pure-Python-HLL reconstruction, and its HLL estimate is
    within the p=12 error envelope of the true distinct count."""
    from malli_ray.sources.sequences import ensure_sequences, \
        sequences_dir_for

    seq_dir, seq_n = sequences_dir_for(0.001)
    ensure_sequences(seq_dir, seq_n)
    want = make_golden.validate_sequences_ref(seq_dir)
    got = pq.read_table(f"{GOLD}/validate_sequences.parquet").to_pydict()
    assert {k: v[0] for k, v in got.items()} == want
    # invariants: every invalid row yields >= 1 violation entry; the HLL
    # estimate is within 5% of the true distinct count (p=12 ~ 1.6% rse)
    assert want["n_violations"] >= want["n_rows"] - want["n_valid"]
    import glob
    import duckdb
    true_distinct = duckdb.connect().execute(
        f"SELECT COUNT(DISTINCT doc_id) FROM "
        f"read_parquet('{os.path.join(seq_dir, '*.parquet')}')"
    ).fetchone()[0]
    assert abs(want["distinct_doc_id"] - true_distinct) <= \
        max(5, 0.05 * true_distinct)


def test_validate_sequences_tdigest_bound(ray_session):
    """The t-digest n_tok p50 the fused report computes (the column
    deliberately EXCLUDED from the hash-compared query): within 1% of
    the exact median on every run.  Exact run-to-run determinism does
    NOT hold — Ray's dynamic block splitting shifts batch boundaries
    between runs of the same session (observed 243.34 vs 243.18), which
    is precisely why the query exposes only count/HLL columns; this pin
    asserts the sketch's accuracy contract instead."""
    import duckdb
    import ray.data as rd

    from malli_ray.pipelines import validation_job as vj
    from malli_ray.sources.sequences import (SEQUENCES_DSL,
                                             ensure_sequences,
                                             sequences_dir_for)
    from malli_ray.stages.validator import ValidationSpec

    seq_dir, seq_n = sequences_dir_for(0.001)
    paths = ensure_sequences(seq_dir, seq_n)
    spec = ValidationSpec(schema=SEQUENCES_DSL, id_column="doc_id",
                          tdigest_columns=["n_tok"])
    p50s = [vj.summarize(rd.read_parquet(paths),
                         spec)["quantiles"]["n_tok"][0.5]
            for _ in range(2)]
    exact = duckdb.connect().execute(
        f"SELECT quantile_cont(n_tok, 0.5) FROM "
        f"read_parquet('{os.path.join(seq_dir, '*.parquet')}')"
    ).fetchone()[0]
    for p in p50s:
        assert abs(p - exact) <= 0.01 * exact
    # runs agree with each other to well under the accuracy envelope
    assert abs(p50s[0] - p50s[1]) <= 0.005 * exact
