"""Ray Data stage tests: validator actors, constraints, dedup, similarity,
text analysis, multimodal plumbing, distributed inference."""

import numpy as np
import pyarrow as pa
import pytest

import malli_ray as m


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",        # exact dup of 0
        "the quick brown fox jumps over the lazy cat today",  # near dup of 0
        "el gato esta en la casa y el perro en el jardin",
        "completely different content about ray data pipelines and arrow",
        "der hund ist nicht das problem und die katze auch nicht",
    ]
    t = pa.table({
        "doc_id": list(range(len(texts))),
        "text": texts,
        "source": ["web", "web", "books", "web", "code", "wiki"],
    })
    return rd.from_arrow(t)


def test_validate_explain_stages(ray_session):
    import ray.data as rd
    from malli_ray.stages.validator import ValidationSpec
    from malli_ray.pipelines import validation_job as vj

    t = pa.table({"doc_id": ["a", "b", ""], "n": [1, -1, 2]})
    ds = rd.from_arrow(t)
    spec = ValidationSpec(
        schema=["map", ["doc_id", ["string", {"min": 1}]], ["n", ["int", {"min": 0}]]],
        id_column="doc_id")
    out = vj.validate(ds, spec, concurrency=2).take_all()
    assert [r["valid"] for r in out] == [True, False, False]
    vio = vj.explain(ds, spec, concurrency=2).take_all()
    assert {(v["id"], v["column"]) for v in vio} == {("b", "n"), ("", "doc_id")}
    rep = vj.summarize(ds, spec, concurrency=2)
    assert rep["n_rows"] == 3 and rep["n_valid"] == 1 and rep["n_violations"] == 2


def test_uniqueness_and_referential(ray_session):
    import ray.data as rd
    from malli_ray.stages import constraints as C

    t = pa.table({"k": ["a", "b", "a", "c", "a"], "src": ["x", "y", "zz", "x", "y"]})
    ds = rd.from_arrow(t)
    dups = C.uniqueness_violations(ds, "k").take_all()
    assert len(dups) == 1 and dups[0]["k"] == "a" and dups[0]["cnt"] == 3
    bad = C.check_referential(ds, "src", ["x", "y"]).take_all()
    assert len(bad) == 1 and bad[0]["src"] == "zz"
    hist = C.histogram(ds, "src")
    assert hist == {"x": 2, "y": 2, "zz": 1}
    drift = C.drift_score({"x": 50, "y": 50}, {"x": 50, "y": 50})
    assert drift["chi2"] < 1e-6 and abs(drift["kl"]) < 1e-6
    drift2 = C.drift_score({"x": 90, "y": 10}, {"x": 50, "y": 50})
    assert drift2["chi2"] > 10 and drift2["kl"] > 0.1


def test_exact_dedup(ray_session, docs_ds):
    from malli_ray.stages import dedup

    groups = dedup.exact_dup_groups(docs_ds, "text", "doc_id").take_all()
    assert len(groups) == 1
    assert groups[0]["n"] == 2 and groups[0]["keep_id"] == 0
    kept = dedup.exact_dedup_keep_first(docs_ds, "text", "doc_id").take_all()
    assert sorted(r["doc_id"] for r in kept) == [0, 2, 3, 4, 5]


def test_minhash_lsh(ray_session, docs_ds):
    from malli_ray.stages import dedup

    # 32 bands x 4 rows: detection prob for jaccard 0.7 is 1-(1-0.7^4)^32 ~ 1
    pairs = dedup.minhash_lsh_candidates(
        docs_ds, "text", "doc_id", threshold=0.4, shingle_k=2,
        num_perm=128, bands=32).take_all()
    found = {(p["id_a"], p["id_b"]) for p in pairs}
    assert (0, 1) in found          # exact dup pair must be found
    assert any(p["est_jaccard"] == 1.0 for p in pairs)
    # near-dup (0,2)/(1,2) should surface at this threshold
    assert (0, 2) in found or (1, 2) in found


def test_simhash(ray_session, docs_ds):
    from malli_ray.stages import dedup

    # hamming radius 10 needs >= 11 chunks for the pigeonhole guarantee
    pairs = dedup.simhash_near_dups(docs_ds, "text", "doc_id",
                                    max_hamming=10, n_chunks=16).take_all()
    found = {(p["id_a"], p["id_b"]): p["hamming"] for p in pairs}
    assert found.get((0, 1)) == 0   # identical text -> identical fingerprint


def test_adversarial_duplicate_cluster(ray_session):
    """50k copies of one doc: the in-bucket collapse must keep LSH verify
    linear (a naive all-pairs bucket verify would do 1.25e9 comparisons)."""
    import time
    import ray.data as rd
    from malli_ray.stages import dedup

    n = 50_000
    texts = ["the same exact document text repeated many many times over"] * n
    texts.append("the same exact document text repeated many times over")  # near
    texts.append("something entirely different about distributed dataflow")
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    ds = rd.from_arrow(t)

    t0 = time.perf_counter()
    pairs = dedup.minhash_lsh_candidates(
        ds, "text", "doc_id", threshold=0.5, num_perm=32, bands=8).take_all()
    minhash_s = time.perf_counter() - t0
    found = {(p["id_a"], p["id_b"]) for p in pairs}
    # every duplicate is paired with the cluster representative (min id)
    assert (0, 1) in found and (0, n - 1) in found
    assert (0, n) in found                     # the near-dup via its rep
    assert len([p for p in found if p[0] == 0]) == n  # n-1 dups + 1 near
    # generous bound: the box is shared (5-10x load spikes observed); the
    # naive O(k^2) verify this guards against takes HOURS, not minutes
    assert minhash_s < 300, f"minhash adversarial took {minhash_s:.1f}s"

    t0 = time.perf_counter()
    spairs = dedup.simhash_near_dups(ds, "text", "doc_id",
                                     max_hamming=3).take_all()
    simhash_s = time.perf_counter() - t0
    sfound = {(p["id_a"], p["id_b"]): p["hamming"] for p in spairs}
    assert sfound.get((0, 1)) == 0 and sfound.get((0, n - 1)) == 0
    assert simhash_s < 300, f"simhash adversarial took {simhash_s:.1f}s"


def test_minhash_bucket_cap_logged(ray_session, caplog):
    """Oversized buckets truncate with a logged warning (no silent caps)."""
    import logging
    import ray.data as rd
    from malli_ray.stages import dedup

    # force tiny cap: distinct texts that all share a band bucket is hard to
    # stage; instead use distinct docs and max_bucket=1 so any bucket with
    # >=2 distinct signatures logs. Verification: it still completes and the
    # pipeline emits only intra-bucket survivors.
    texts = [f"shared prefix words {i}" for i in range(4)]
    t = pa.table({"doc_id": list(range(4)), "text": texts})
    pairs = dedup.minhash_lsh_candidates(
        rd.from_arrow(t), "text", "doc_id", threshold=0.0, num_perm=16,
        bands=4, max_bucket=1).take_all()
    assert isinstance(pairs, list)  # completes; truncation logged in workers


def test_ngram_jaccard():
    from malli_ray.stages.dedup import ngram_jaccard
    assert ngram_jaccard("a b c d", "a b c d") == 1.0
    assert ngram_jaccard("a b c d", "x y z w") == 0.0
    assert 0.0 < ngram_jaccard("a b c d e", "a b c d x") < 1.0


def test_embedding_near_dups(ray_session):
    import ray.data as rd
    from malli_ray.stages import dedup

    rng = np.random.default_rng(0)
    base = rng.standard_normal((20, 16))
    base[7] = base[3] + 0.001 * rng.standard_normal(16)   # near-dup pair (3,7)
    t = pa.table({"vec_id": list(range(20)),
                  "embedding": pa.array(base.tolist(), type=pa.list_(pa.float64()))})
    pairs = dedup.embedding_near_dups(rd.from_arrow(t), "embedding", "vec_id",
                                      threshold=0.99).take_all()
    assert {(p["id_a"], p["id_b"]) for p in pairs} == {(3, 7)}


def test_topk_cosine_vs_oracle(ray_session):
    import ray.data as rd
    from malli_ray.stages.similarity import topk_cosine

    rng = np.random.default_rng(1)
    emb = rng.standard_normal((50, 8))
    queries = emb[[5, 17]] + 0.01
    t = pa.table({"vec_id": list(range(50)),
                  "embedding": pa.array(emb.tolist(), type=pa.list_(pa.float64()))})
    got = topk_cosine(rd.from_arrow(t), queries, "embedding", "vec_id", k=3).take_all()
    # numpy oracle
    unit = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    qunit = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    sims = unit @ qunit.T
    for qi in range(2):
        want = set(np.argsort(-sims[:, qi])[:3].tolist())
        have = {r["vec_id"] for r in got if r["query_id"] == qi}
        assert have == want
    assert {r["vec_id"] for r in got if r["query_id"] == 0} >= {5}


def test_ivf_topk_recall(ray_session):
    import ray.data as rd
    from malli_ray.stages.similarity import ivf_topk

    rng = np.random.default_rng(2)
    # clustered data (IVF's operating assumption): 8 centers, 100 pts each
    centers = rng.standard_normal((8, 16)) * 4
    emb = np.concatenate([c + rng.standard_normal((100, 16)) for c in centers])
    queries = emb[[10, 250, 601]]
    t = pa.table({"vec_id": list(range(len(emb))),
                  "embedding": pa.array(emb.tolist(), type=pa.list_(pa.float64()))})
    k = 10
    got = ivf_topk(rd.from_arrow(t), queries, "embedding", "vec_id",
                   k=k, n_centroids=8, n_probe=3, seed=7).take_all()
    # deterministic (seeded sample + seeded k-means): same result twice
    again = ivf_topk(rd.from_arrow(t), queries, "embedding", "vec_id",
                     k=k, n_centroids=8, n_probe=3, seed=7).take_all()
    key = lambda rows: sorted((r["query_id"], r["vec_id"]) for r in rows)
    assert key(got) == key(again)
    # recall@k vs brute force >= 0.8 averaged over queries
    unit = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    qunit = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    sims = unit @ qunit.T
    hits = total = 0
    for qi in range(len(queries)):
        want = set(np.argsort(-sims[:, qi])[:k].tolist())
        have = {r["vec_id"] for r in got if r["query_id"] == qi}
        hits += len(want & have)
        total += k
    assert hits / total >= 0.8, f"recall@{k} = {hits / total:.2f}"
    assert 10 in {r["vec_id"] for r in got if r["query_id"] == 0}


def test_parse_projection_vectorized_orn(ray_session):
    """Vectorized :orn parse: first-match-wins branch tags as a struct
    column, ::m/invalid -> null struct, identical to the row engine."""
    import ray.data as rd
    from malli_ray.stages.parse_stage import parse_projection, unparse_projection

    ORN = ["orn", ["neg", ["<", 0.0]], ["small", ["<=", 10.0]], ["big", "double"]]
    vals = [-5.0, 0.0, 10.0, 10.5, None, 3.14]
    t = pa.table({"i": list(range(len(vals))), "value": vals})
    out = parse_projection(rd.from_arrow(t), ORN, "value").take_all()
    got = [(r["parsed"] or {}).get("tag") for r in out]
    assert got == ["neg", "small", "small", "big", None, "small"]
    # row-engine equivalence (m/parse contract)
    sc = m.schema(ORN)
    for r in out:
        want = m.parse(sc, r["value"])
        if r["parsed"] is None:
            assert want is m.INVALID
        else:
            assert want.key == r["parsed"]["tag"]
            assert want.value == r["parsed"]["value"]
    # unparse roundtrip restores the original column
    ds2 = parse_projection(rd.from_arrow(t), ORN, "value")
    back = unparse_projection(ds2, ORN, "parsed", out="value2").take_all()
    assert [r["value2"] for r in back] == vals


def test_parse_projection_row_fallback_multi(ray_session):
    """:multi (keyword dispatch) goes through the row-fallback parser and
    still emits Tag -> {tag, value} structs."""
    import ray.data as rd
    from malli_ray.stages.parse_stage import ParseBatch, parse_projection

    MULTI = ["multi", {"dispatch": "kind"},
             ["a", ["map", ["kind", "string"], ["x", "int"]]],
             ["b", ["map", ["kind", "string"], ["y", "string"]]]]
    rows = [{"kind": "a", "x": 1}, {"kind": "b", "y": "hi"}, {"kind": "c"}]
    t = pa.table({"i": [0, 1, 2], "obj": pa.array(rows)})
    out = parse_projection(rd.from_arrow(t), MULTI, "obj").take_all()
    assert out[0]["parsed"]["tag"] == "a"
    assert out[1]["parsed"]["tag"] == "b"
    assert out[2]["parsed"] is None  # no branch, no default -> invalid


def test_parse_projection_identity_elision(ray_session):
    import ray.data as rd
    from malli_ray.stages.parse_stage import parse_projection

    t = pa.table({"value": [1.0, 2.0]})
    ds = rd.from_arrow(t)
    assert parse_projection(ds, "double", "value") is ds
    assert parse_projection(ds, ["map", ["value", "double"]], "value") is ds


def test_text_stages(ray_session, docs_ds):
    from malli_ray.stages import text as T

    out = T.add_token_count(docs_ds, "text").take_all()
    assert out[0]["n_tokens"] == 9
    out = T.add_quality(docs_ds, "text").take_all()
    assert all(0.0 <= r["quality"] <= 1.0 for r in out)
    assert out[0]["stop_ratio"] > 0   # English sentence has stopwords
    out = T.add_lang_id(docs_ds, "text").take_all()
    preds = {r["doc_id"]: r["lang_pred"] for r in out}
    assert preds[0] == "en" and preds[3] == "es" and preds[5] == "de"
    out = T.add_fingerprint(docs_ds, "text").take_all()
    fps = {r["doc_id"]: r["fingerprint"] for r in out}
    assert fps[0] == fps[1]           # identical text -> identical fingerprint
    assert fps[0] != fps[4]


def test_redact_pii(ray_session):
    import ray.data as rd
    from malli_ray.stages import text as T

    ds = rd.from_items([
        {"doc_id": 0, "text": "mail me at jane.doe+x@example.co.uk today"},
        {"doc_id": 1, "text": "call +1 (555) 123-4567 or 192.168.0.1"},
        {"doc_id": 2, "text": "nothing sensitive here"},
        {"doc_id": 3, "text": None},
    ])
    got = {r["doc_id"]: r["text"]
           for r in T.redact(ds, "text").take_all()}
    assert got[0] == "mail me at [REDACTED] today"
    assert got[1] == "call [REDACTED] or [REDACTED]"
    assert got[2] == "nothing sensitive here"
    assert got[3] is None             # nulls pass through
    # out= keeps the original column
    rows = T.redact(ds, "text", out="clean").take_all()
    assert {"text", "clean"} <= set(rows[0].keys())


def test_add_repetition(ray_session):
    import ray.data as rd
    from malli_ray.stages import text as T

    ds = rd.from_items([
        {"doc_id": 0, "text": "a b a c"},      # 4 words, 3 distinct
        {"doc_id": 1, "text": "x x x"},        # 3 words, 1 distinct
        {"doc_id": 2, "text": ""},             # empty -> 0.0
        {"doc_id": 3, "text": "all unique words"},
    ])
    got = {r["doc_id"]: r["rep_ratio"]
           for r in T.add_repetition(ds, "text").take_all()}
    assert got[0] == pytest.approx(0.25)
    assert got[1] == pytest.approx(2 / 3)
    assert got[2] == 0.0
    assert got[3] == 0.0


def test_contamination_pairs(ray_session):
    import ray.data as rd
    from malli_ray.stages import text as T

    ds = rd.from_items([
        {"doc_id": 10, "text": "the quick brown fox jumps"},
        {"doc_id": 11, "text": "xx the quick brown fox jumps yy"},
        {"doc_id": 12, "text": "totally different"},
    ])
    pairs = T.contamination_pairs(ds, "text", "doc_id",
                                  [(1, "quick brown fox"),
                                   (2, "no such probe")]).take_all()
    got = sorted((r["doc_id"], r["probe_id"]) for r in pairs)
    assert got == [(10, 1), (11, 1)]
    # no hits at all -> empty, schema intact
    none = T.contamination_pairs(ds, "text", "doc_id",
                                 [(9, "zzz-absent")])
    assert none.count() == 0
    assert set(none.schema().names) == {"doc_id", "probe_id"}


def test_contamination_rabin_karp_parity(ray_session):
    """The RK anchor-pass scanner is pair-for-pair identical to the
    per-probe scanner (and to a plain Python `p in text` oracle) on
    adversarial inputs: shared anchors, boundary-straddling near-matches,
    unicode, empty/None docs, repeats, probes of different lengths."""
    import ray.data as rd
    from malli_ray.stages import text as T

    rows = [
        {"doc_id": 0, "text": "the quick brown fox jumps"},
        {"doc_id": 1, "text": "quick brown"},          # prefix-only: no hit
        {"doc_id": 2, "text": ""},
        {"doc_id": 3, "text": None},
        {"doc_id": 4, "text": "naïve café déjà vu ünïcode"},
        {"doc_id": 5, "text": "abcabcabc abcabd"},     # shared anchor "abcab"
        {"doc_id": 6, "text": "quick brown fox" * 3},  # repeated probe
        # straddle bait: doc 7 ends with the anchor prefix, doc 8 starts
        # with the rest — concatenated they'd contain the probe
        {"doc_id": 7, "text": "ends with quick br"},
        {"doc_id": 8, "text": "own fox starts here"},
        {"doc_id": 9, "text": "ümlaut probe ßharp"},
    ]
    probes = [(1, "quick brown fox"), (2, "abcab"), (3, "abcabd"),
              (4, "café déjà"), (5, "ßharp"), (6, "zz-absent-zz")]

    def oracle():
        out = set()
        for r in rows:
            t = r["text"] or ""
            for pid, p in probes:
                if p in t:
                    out.add((r["doc_id"], pid))
        return sorted(out)

    ds = rd.from_items(rows)
    per_probe = sorted((r["doc_id"], r["probe_id"])
                       for r in T.contamination_pairs(
                           ds, "text", "doc_id", probes,
                           method="per-probe").take_all())
    rk = sorted((r["doc_id"], r["probe_id"])
                for r in T.contamination_pairs(
                    ds, "text", "doc_id", probes,
                    method="rabin-karp").take_all())
    assert per_probe == rk == oracle()
    assert (0, 1) in rk and (6, 1) in rk and (7, 1) not in rk

    # real corpus spot check: identical pair sets at sf0.001
    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    corpus_probes = [(i, f"probe-{i}") for i in range(3)]
    # seed from actual text so there ARE hits
    texts = docs.take(5)
    corpus_probes += [(10 + i, r["text"][:40]) for i, r in enumerate(texts)
                      if r["text"] and len(r["text"]) >= 40]
    a = sorted((r["doc_id"], r["probe_id"])
               for r in T.contamination_pairs(
                   docs, "text", "doc_id", corpus_probes,
                   method="per-probe").take_all())
    b = sorted((r["doc_id"], r["probe_id"])
               for r in T.contamination_pairs(
                   docs, "text", "doc_id", corpus_probes,
                   method="rabin-karp").take_all())
    assert a == b and len(a) >= 3


def test_multimodal_plumbing(ray_session):
    import ray.data as rd
    from malli_ray.stages.multimodal import (
        FrameSampler, ImageFeatureExtractor, add_image_features,
        suggested_batch_size)

    payloads = [bytes([i]) * 100 for i in range(6)]
    t = pa.table({"id": list(range(6)),
                  "payload": pa.array(payloads, type=pa.large_binary())})
    ds = rd.from_arrow(t)
    out = add_image_features(ds, batch_size=2).take_all()
    assert len(out) == 6
    assert all(isinstance(r["img_width"], int) for r in out)
    # deterministic fake: same payload -> same features
    again = add_image_features(rd.from_arrow(t), batch_size=3).take_all()
    assert [r["mean_luma"] for r in sorted(out, key=lambda r: r["id"])] == \
           [r["mean_luma"] for r in sorted(again, key=lambda r: r["id"])]
    frames = ds.map_batches(FrameSampler, fn_constructor_kwargs={},
                            batch_format="pyarrow", concurrency=2).take_all()
    assert len(frames) == 24  # 6 videos x 4 frames
    assert suggested_batch_size(10 * 1024 * 1024) == 51


def test_media_header_probe(ray_session):
    """REAL (dependency-free) container-header parsing: hand-built PNG /
    JPEG(SOF0 after APP0) / GIF / BMP(top-down negative height) / WAV
    payloads parse to their exact header fields; garbage and null payloads
    come back header_ok=False with typed nulls."""
    import struct
    import ray.data as rd
    from malli_ray.stages.multimodal import (
        MediaHeaderProbe, probe_media_headers, wrap_pcm_wav)

    png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
           + struct.pack(">II", 640, 480) + bytes([8, 6, 0, 0, 0]) + b"\0" * 8)
    jpeg = (b"\xff\xd8" + b"\xff\xe0" + struct.pack(">H", 16)
            + b"JFIF\0" + b"\0" * 9
            + b"\xff\xc0" + struct.pack(">H", 17) + bytes([8])
            + struct.pack(">HH", 480, 640) + bytes([3]) + b"\0" * 10
            + b"\xff\xd9")
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\0" * 4
    bmp = b"BM" + b"\0" * 16 + struct.pack("<ii", 800, -600) + b"\0" * 10
    wav = wrap_pcm_wav(b"\x01\x02" * 16000)  # exactly 1 s @ 16 kHz mono 16-bit
    tbl = pa.table({
        "id": list(range(7)),
        "payload": pa.array([png, jpeg, gif, bmp, wav,
                             b"not a media file", None],
                            type=pa.large_binary())})
    rows = {r["id"]: r for r in
            probe_media_headers(rd.from_arrow(tbl), batch_size=3).take_all()}
    assert (rows[0]["media_format"], rows[0]["media_width"],
            rows[0]["media_height"], rows[0]["media_channels"],
            rows[0]["media_bit_depth"]) == ("png", 640, 480, 4, 8)
    assert (rows[1]["media_format"], rows[1]["media_width"],
            rows[1]["media_height"], rows[1]["media_channels"]) == \
        ("jpeg", 640, 480, 3)
    assert (rows[2]["media_format"], rows[2]["media_width"],
            rows[2]["media_height"]) == ("gif", 320, 200)
    assert (rows[3]["media_format"], rows[3]["media_width"],
            rows[3]["media_height"]) == ("bmp", 800, 600)
    assert (rows[4]["media_format"], rows[4]["media_channels"],
            rows[4]["media_sample_rate"], rows[4]["media_bit_depth"],
            rows[4]["media_duration_s"]) == ("wav", 1, 16000, 16, 1.0)
    for bad in (5, 6):
        assert rows[bad]["header_ok"] is False
        assert rows[bad]["media_format"] is None
    # truncated data chunk: duration clamps to the bytes actually present
    half = wav[:44 + 16000]  # header + 0.5 s of the claimed 1 s
    got = MediaHeaderProbe()(pa.table(
        {"payload": pa.array([half], type=pa.large_binary())}))
    assert got.column("media_duration_s")[0].as_py() == 0.5


def test_ogg_header_parse(ray_session):
    """Ogg Opus/Vorbis identification parse + edge cases: multi-segment
    lacing, truncated table, non-audio first packet."""
    from malli_ray.stages.multimodal import (MediaHeaderProbe,
                                             make_ogg_opus_header,
                                             make_ogg_vorbis_header)
    assert MediaHeaderProbe._ogg(make_ogg_opus_header(2, 48000, 100)) == {
        "media_format": "ogg-opus", "media_channels": 2,
        "media_sample_rate": 48000}
    assert MediaHeaderProbe._ogg(make_ogg_vorbis_header(6, 96000)) == {
        "media_format": "ogg-vorbis", "media_channels": 6,
        "media_sample_rate": 96000}
    # lacing: a 255 segment means the packet continues into the next one
    pkt = (b"OpusHead" + bytes([1, 1]) + (0).to_bytes(2, "little")
           + (16000).to_bytes(4, "little") + b"\x00" * 3)
    page = (b"OggS\x00\x02" + b"\x00" * 8 + b"\x01\x00\x00\x00"
            + b"\x00" * 8 + bytes([2, 255, 0]) + pkt + b"\x00" * 236)
    got = MediaHeaderProbe._ogg(page)
    assert got["media_sample_rate"] == 16000
    # truncated segment table / unknown first packet -> None
    assert MediaHeaderProbe._ogg(b"OggS\x00\x02" + b"\x00" * 20
                                 + bytes([5])) is None
    other = b"\x03vorbis" + b"\x00" * 20
    assert MediaHeaderProbe._ogg(
        b"OggS\x00\x02" + b"\x00" * 20 + bytes([1, len(other)])
        + other) is None


def test_jpeg_exif_probe(ray_session):
    """EXIF APP1 parse: synth round trip, big-endian TIFF, JPEG without
    EXIF (dims only), inline <=4-byte ASCII value, garbage payloads."""
    import struct
    import ray.data as rd
    from malli_ray.stages.multimodal import (make_jpeg_exif,
                                             parse_jpeg_exif, probe_exif)

    p = make_jpeg_exif(321, 123, 8, "1999:12:31 23:59:59")
    assert parse_jpeg_exif(p) == {
        "jpeg_width": 321, "jpeg_height": 123,
        "exif_orientation": 8, "exif_datetime": "1999:12:31 23:59:59"}

    # big-endian TIFF body with only Orientation (no DateTime)
    ifd = (struct.pack(">H", 1)
           + struct.pack(">HHI", 0x0112, 3, 1) + struct.pack(">HH", 3, 0)
           + struct.pack(">I", 0))
    tiff = b"MM\x00\x2a" + struct.pack(">I", 8) + ifd
    app1_body = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(app1_body) + 2) + app1_body
    sof = (b"\xff\xc0" + struct.pack(">H", 11) + bytes([8])
           + struct.pack(">HH", 10, 20) + bytes([1, 1, 0x11, 0]))
    be = b"\xff\xd8" + app1 + sof + b"\xff\xd9"
    assert parse_jpeg_exif(be) == {
        "jpeg_width": 20, "jpeg_height": 10,
        "exif_orientation": 3, "exif_datetime": None}

    # plain JPEG (no EXIF): dims parse, EXIF fields null
    plain = (b"\xff\xd8\xff\xc0" + struct.pack(">H", 11) + bytes([8])
             + struct.pack(">HH", 5, 6) + bytes([1, 1, 0x11, 0])
             + b"\xff\xd9")
    assert parse_jpeg_exif(plain)["exif_orientation"] is None
    assert parse_jpeg_exif(plain)["jpeg_width"] == 6

    # inline ASCII value (count <= 4 packs into the value field)
    ifd2 = (struct.pack("<H", 1)
            + struct.pack("<HHI", 0x0132, 2, 3) + b"ab\x00\x00"
            + struct.pack("<I", 0))
    tiff2 = b"II\x2a\x00" + struct.pack("<I", 8) + ifd2
    body2 = b"Exif\x00\x00" + tiff2
    app12 = b"\xff\xe1" + struct.pack(">H", len(body2) + 2) + body2
    inl = b"\xff\xd8" + app12 + sof + b"\xff\xd9"
    assert parse_jpeg_exif(inl)["exif_datetime"] == "ab"

    # distributed stage over a mixed batch incl. garbage
    tbl = pa.table({"id": [0, 1, 2],
                    "payload": pa.array([p, b"garbage", None],
                                        type=pa.large_binary())})
    rows = {r["id"]: r for r in probe_exif(rd.from_arrow(tbl)).take_all()}
    assert rows[0]["exif_ok"] and rows[0]["exif_orientation"] == 8
    assert rows[1]["exif_ok"] is False and rows[2]["exif_ok"] is False


def test_audio_frame_features(ray_session):
    """Real windowed audio features over raw PCM (no codec needed): RMS/ZCR
    per 25ms window vs a numpy oracle; non-raw formats skip (or raise in
    strict mode)."""
    import ray.data as rd
    from malli_ray.stages.multimodal import (
        AudioFrameFeatures, audio_frame_features)

    sr = 16000
    t = np.arange(sr, dtype=np.float64) / sr          # 1s of audio
    sine = (np.sin(2 * np.pi * 440 * t) * 0.5 * 32767).astype("<i2")
    silence = np.zeros(sr // 2, dtype="<i2")
    tbl = pa.table({
        "id": [1, 2, 3],
        "payload": [sine.tobytes(), silence.tobytes(), b"\x00" * 100],
        "format": ["pcm16", "raw", "mp3"],
    })
    out = audio_frame_features(rd.from_arrow(tbl), "payload", "id",
                               format_column="format").take_all()
    by_id = {}
    for r in out:
        by_id.setdefault(r["audio_id"], []).append(r)
    # 1s at 10ms hop, 25ms window -> (16000-400)//160+1 = 98 windows
    assert len(by_id[1]) == 98
    # sine at ~0.5 amplitude: rms ~= 0.5/sqrt(2); zcr ~= 2*440/16000
    assert abs(by_id[1][0]["rms"] - 0.5 / np.sqrt(2)) < 0.02
    assert abs(by_id[1][0]["zcr"] - 2 * 440 / sr) < 0.02
    assert all(abs(r["rms"]) < 1e-9 for r in by_id[2])   # silence
    assert 3 not in by_id                                # mp3 skipped
    # strict mode: compressed format raises (documented stub boundary)
    strict = AudioFrameFeatures("payload", "id", format_column="format",
                                strict=True)
    with pytest.raises(NotImplementedError):
        strict(tbl)


def test_infer_dataset(ray_session):
    import ray.data as rd
    from malli_ray.provider import infer_dataset

    t = pa.table({"a": [1, 2, None], "s": ["x", "y", "z"],
                  "v": pa.array([[1], [2, 3], []], type=pa.list_(pa.int64()))})
    form = infer_dataset(rd.from_arrow(t))
    assert form == ["map", ["a", ["maybe", "int"]], ["s", "string"],
                    ["v", ["vector", "int"]]]


def test_decode_batch_stage(ray_session):
    import ray.data as rd
    from malli_ray.stages.transform_stage import DecodeBatch, fill_defaults

    t = pa.table({"x": ["true", "false", "zzz"], "y": ["1", "bad", "3"]})
    ds = rd.from_arrow(t)
    S = ["map", ["x", "boolean"], ["y", "int"]]
    out = ds.map_batches(DecodeBatch, fn_constructor_kwargs={"schema": S},
                         batch_format="pyarrow", concurrency=2).take_all()
    assert [r["x"] for r in out] == [True, False, None]
    assert [r["y"] for r in out] == [1, None, 3]
    # defaults
    S2 = ["map", ["z", ["int", {"default": 9}]]]
    t2 = pa.table({"z": [1, None]})
    out = rd.from_arrow(t2).map_batches(fill_defaults(S2),
                                        batch_format="pyarrow").take_all()
    assert [r["z"] for r in out] == [1, 9]


def test_hopping_window(ray_session):
    """Each event lands in exactly size/hop overlapping windows; counts
    match a hand-computed expectation."""
    import datetime as dt
    import ray.data as rd
    import pytest
    from malli_ray.stages.windows import hopping_window

    base = dt.datetime(2022, 1, 1, 10, 0, 0)
    rows = [(base + dt.timedelta(minutes=m), "a") for m in (0, 10, 20, 40)]
    t = pa.table({"ts": pa.array([r[0] for r in rows],
                                 type=pa.timestamp("us")),
                  "event_type": [r[1] for r in rows]})
    out = hopping_window(rd.from_arrow(t), "ts", size_minutes=30,
                         hop_minutes=15, key_cols=["event_type"]).take_all()
    got = {(r["window"].strftime("%H:%M"), r["event_type"]): r["n"]
           for r in out}
    # 10:00 event -> windows 09:45, 10:00; 10:10 -> 09:45, 10:00;
    # 10:20 -> 10:00, 10:15; 10:40 -> 10:15, 10:30
    assert got == {("09:45", "a"): 2, ("10:00", "a"): 3,
                   ("10:15", "a"): 2, ("10:30", "a"): 1}
    with pytest.raises(ValueError):
        hopping_window(rd.from_arrow(t), "ts", 25, 10, ["event_type"])
    # nulls propagate into a null window group (SQL time_bucket(NULL)
    # parity) instead of crashing; value-column aggregates work
    from ray.data.aggregate import Sum
    t2 = pa.table({"ts": pa.array([base, None], type=pa.timestamp("us")),
                   "event_type": ["a", "a"],
                   "value": [2.0, 5.0]})
    out2 = hopping_window(rd.from_arrow(t2), "ts", 30, 15, ["event_type"],
                          aggs=[Sum("value", alias_name="total")]).take_all()
    got2 = {r["window"]: r["total"] for r in out2}
    assert got2[None] == 10.0            # null event in both (null) windows
    assert sum(v for k, v in got2.items() if k is not None) == 4.0


def test_decode_batch_dates_decimal_overrides(ray_session):
    """Batch decode breadth: multi-format ISO dates, decimal, and per-schema
    decode/<name> overrides (batch-kernel and row-callable)."""
    import datetime as dt
    import decimal
    import ray.data as rd
    import pyarrow.compute as pc
    from malli_ray.stages.transform_stage import DecodeBatch, batch_kernel

    t = pa.table({
        "ts": ["2020-01-01", "2020-01-01T10:20:30", "2020-01-01T10:20:30.123456",
               "2020-01-01T10:20:30Z", "2020-01-01T10:20:30.5+02:00", "nope", None],
        "amount": ["1.50", "-0.125", "garbage", None, "2", "1e3", "99"],
    })
    S = ["map", ["ts", "inst?"], ["amount", "decimal?"]]
    out = rd.from_arrow(t).map_batches(
        DecodeBatch, fn_constructor_kwargs={"schema": S},
        batch_format="pyarrow", concurrency=1).take_all()
    utc = dt.timezone.utc
    want_ts = [dt.datetime(2020, 1, 1, tzinfo=utc),
               dt.datetime(2020, 1, 1, 10, 20, 30, tzinfo=utc),
               dt.datetime(2020, 1, 1, 10, 20, 30, 123456, tzinfo=utc),
               dt.datetime(2020, 1, 1, 10, 20, 30, tzinfo=utc),
               dt.datetime(2020, 1, 1, 8, 20, 30, 500000, tzinfo=utc),
               None, None]
    assert [r["ts"] for r in out] == want_ts
    amounts = [r["amount"] for r in out]
    assert amounts[0] == decimal.Decimal("1.50")
    assert amounts[1] == decimal.Decimal("-0.125")
    assert amounts[2] is None and amounts[3] is None
    assert amounts[4] == decimal.Decimal(2)
    assert amounts[5] == decimal.Decimal(1000)

    # decode/string override: batch kernel beats the built-in cast
    @batch_kernel
    def double_it(arr):
        return pc.multiply(arr.cast(pa.int64()), 2)

    S2 = ["map", ["x", ["int", {"decode/string": double_it}]],
                 ["y", ["int", {"decode/string": lambda v: int(v) + 100}]]]
    t2 = pa.table({"x": ["1", "2"], "y": ["5", "6"]})
    out2 = rd.from_arrow(t2).map_batches(
        DecodeBatch, fn_constructor_kwargs={"schema": S2},
        batch_format="pyarrow", concurrency=1).take_all()
    assert [r["x"] for r in out2] == [2, 4]
    assert [r["y"] for r in out2] == [105, 106]


def test_string_to_decimal_row_path():
    import decimal
    from malli_ray.transform import string_to_decimal, string_transformer

    assert string_to_decimal("1.5") == decimal.Decimal("1.5")
    assert string_to_decimal("bad") == "bad"      # tolerant: unchanged
    assert string_to_decimal(7) == 7
    out = m.decode(["map", ["d", "decimal?"]], {"d": "2.25"},
                   string_transformer())
    assert out == {"d": decimal.Decimal("2.25")}


def test_windows_and_asof(ray_session):
    import datetime as dt
    import ray.data as rd
    from malli_ray.stages.windows import asof_join, sessionize, tumbling_window

    base = dt.datetime(2024, 1, 1)
    rows = [
        {"user": 1, "ts": base},
        {"user": 1, "ts": base + dt.timedelta(minutes=10)},
        {"user": 1, "ts": base + dt.timedelta(minutes=90)},   # new session
        {"user": 2, "ts": base + dt.timedelta(minutes=5)},
    ]
    t = pa.table({"user": [r["user"] for r in rows],
                  "ts": pa.array([r["ts"] for r in rows],
                                 type=pa.timestamp("us"))})
    ds = rd.from_arrow(t)

    w = tumbling_window(ds, "ts", 30, ["user"]).take_all()
    got = {(r["user"], r["window"].minute): r["n"] for r in w}
    assert got[(1, 0)] == 2 and got[(1, 30)] == 1 and got[(2, 0)] == 1

    s = sessionize(ds, "user", "ts", gap_minutes=30).take_all()
    by = {(r["user"], r["session_id"]): r["n_events"] for r in s}
    assert by == {(1, 1): 2, (1, 2): 1, (2, 1): 1}

    left = rd.from_arrow(pa.table({
        "id": [10, 11], "user": [1, 1],
        "ts": pa.array([base + dt.timedelta(minutes=15),
                        base + dt.timedelta(minutes=1)],
                       type=pa.timestamp("us"))}))
    right = rd.from_arrow(pa.table({
        "user": [1, 1],
        "rts": pa.array([base, base + dt.timedelta(minutes=10)],
                        type=pa.timestamp("us")),
        "val": ["a", "b"]}))
    j = asof_join(left, right, key="user", left_ts="ts", right_ts="rts",
                  right_cols=["val"]).take_all()
    got = {r["id"]: r["val_right"] for r in j}
    assert got == {10: "b", 11: "a"}


def test_joins(ray_session):
    """broadcast_join (left/inner), hash_join, semi/anti joins."""
    import ray.data as rd
    from malli_ray.stages.joins import (
        anti_join, broadcast_join, hash_join, semi_join)

    left = rd.from_arrow(pa.table({"k": [1, 2, 3, 4], "x": ["a", "b", "c", "d"]}))
    small = pa.table({"k": [1, 3, 5], "v": [10, 30, 50], "w": ["p", "q", "r"]})

    out = sorted(broadcast_join(left, small, "k", ["v", "w"]).take_all(),
                 key=lambda r: r["k"])
    assert [r["v"] for r in out] == [10, None, 30, None]
    assert [r["w"] for r in out] == ["p", None, "q", None]
    inner = sorted(broadcast_join(left, small, "k", ["v"], how="inner").take_all(),
                   key=lambda r: r["k"])
    assert [(r["k"], r["v"]) for r in inner] == [(1, 10), (3, 30)]

    right = rd.from_arrow(pa.table({"rk": [1, 3, 3], "y": [100, 300, 301]}))
    hj = sorted(hash_join(left, right, on="k", right_on="rk").take_all(),
                key=lambda r: (r["k"], r["y"]))
    assert [(r["k"], r["y"]) for r in hj] == [(1, 100), (3, 300), (3, 301)]
    sj = sorted(r["k"] for r in semi_join(left, right, "k", "rk").take_all())
    assert sj == [1, 3]
    aj = sorted(r["k"] for r in anti_join(left, right, "k", "rk").take_all())
    assert aj == [2, 4]


def test_broadcast_join_nulls_dups_bigints(ray_session):
    """Review regressions: null probe keys never match (and never crash),
    duplicate small-side keys keep the LAST occurrence, and nullable int64
    keys don't round-trip through float64 (2^53+1 stays exact)."""
    import ray.data as rd
    from malli_ray.stages.joins import broadcast_join

    big = 2 ** 53 + 1
    left = rd.from_arrow(pa.table({"k": pa.array([1, None, big, 2 ** 53],
                                                 type=pa.int64())}))
    small = pa.table({"k": pa.array([1, 1, big], type=pa.int64()),
                      "v": [10, 11, 99]})
    out = broadcast_join(left, small, "k", ["v"]).take_all()
    by_k = {r["k"]: r["v"] for r in out}
    assert by_k[1] == 11          # duplicate key: LAST occurrence wins
    assert by_k[None] is None     # null probe: unmatched, no crash
    assert by_k[big] == 99        # exact 64-bit match
    assert by_k[2 ** 53] is None  # neighbor of big must NOT match
    # string keys with nulls — on BOTH sides (build-side nulls dropped)
    left2 = rd.from_arrow(pa.table({"k": ["a", None, "z"]}))
    small2 = pa.table({"k": ["a", None], "v": [1, 99]})
    out2 = {r["k"]: r["v"] for r in
            broadcast_join(left2, small2, "k", ["v"]).take_all()}
    assert out2 == {"a": 1, None: None, "z": None}
    # build-side null alongside big ints must not degrade keys to float64
    small3 = pa.table({"k": pa.array([1, None, big], type=pa.int64()),
                       "v": [10, 0, 99]})
    out3 = {r["k"]: r["v"] for r in
            broadcast_join(left, small3, "k", ["v"]).take_all()}
    assert out3[big] == 99 and out3[2 ** 53] is None


def test_parse_unparse_multi_int_keys(ray_session):
    """Review regression: stringified struct tags must map back to the
    ORIGINAL branch keys on unparse (int dispatch values)."""
    import ray.data as rd
    from malli_ray.stages.parse_stage import parse_projection, unparse_projection

    MULTI = ["multi", {"dispatch": "kind"},
             [1, ["map", ["kind", "int"], ["x", "int"]]],
             [2, ["map", ["kind", "int"], ["y", "string"]]]]
    rows = [{"kind": 1, "x": 5}, {"kind": 2, "y": "hi"}]
    t = pa.table({"i": [0, 1], "obj": pa.array(rows)})
    parsed = parse_projection(rd.from_arrow(t), MULTI, "obj")
    back = unparse_projection(parsed, MULTI, "parsed", out="obj2").take_all()
    assert back[0]["obj2"]["x"] == 5          # not silently null
    assert back[1]["obj2"]["y"] == "hi"


def test_audio_all_skipped_batch_schema(ray_session):
    """Review regression: an all-skipped audio batch keeps a TYPED audio_id
    column so blocks concat with row-producing batches."""
    import ray.data as rd
    from malli_ray.stages.multimodal import audio_frame_features

    sr = 16000
    pcm = (np.zeros(sr // 4)).astype("<i2").tobytes()
    t = pa.table({"id": [1, 2, 3],
                  "payload": [b"x", b"y", pcm],
                  "format": ["mp3", "ogg", "pcm16"]})
    # force tiny batches so one batch is all-skipped
    out = audio_frame_features(rd.from_arrow(t).repartition(3), "payload",
                               "id", format_column="format",
                               batch_size=1).take_all()
    assert all(isinstance(r["audio_id"], int) for r in out)
    assert {r["audio_id"] for r in out} == {3}


def test_word_counts_top_words(ray_session):
    import ray.data as rd
    from malli_ray.stages.text import top_words, word_counts

    t = pa.table({"text": ["a b b", "b c", None, ""]})
    ds = rd.from_arrow(t)
    counts = {r["word"]: r["cnt"] for r in word_counts(ds, "text").take_all()}
    assert counts == {"a": 1, "b": 3, "c": 1}
    top = top_words(ds, "text", k=2).take_all()
    assert [(r["word"], r["cnt"]) for r in top] == [("b", 3), ("a", 1)]


def test_vocab_tokenizer(ray_session):
    import ray.data as rd
    from malli_ray.stages.text import tokenize_with_vocab

    t = pa.table({"doc_id": [10, 20], "text": ["a b zzz a", None]})
    vocab = {"a": 1, "b": 2}
    out = tokenize_with_vocab(rd.from_arrow(t), "text", "doc_id",
                              vocab).take_all()
    rows = sorted((r["doc_id"], r["pos"], r["token_id"]) for r in out)
    assert rows == [(10, 1, 1), (10, 2, 2), (10, 3, 0), (10, 4, 1)]


def test_uniqueness_hot_key_skew(ray_session):
    """A pathologically hot key must not blow up the shuffle: the batch-local
    combiner collapses it to one (key, count) row per block."""
    import ray.data as rd
    from malli_ray.stages import constraints as C

    t = pa.table({"k": ["hot"] * 100_000 + [f"u{i}" for i in range(1000)]})
    ds = rd.from_arrow(t).repartition(8)
    dups = C.uniqueness_violations(ds, "k").take_all()
    assert len(dups) == 1
    assert dups[0]["k"] == "hot" and dups[0]["cnt"] == 100_000


def test_parse_projection_matches_row_engine_fuzz(ray_session):
    """Vectorized :orn parse projection must agree with m.parse row-by-row
    over random schemas x random columns (both first-match order and the
    ::invalid null-struct encoding), and unparse must roundtrip."""
    import random
    import ray.data as rd
    from malli_ray.stages.parse_stage import parse_projection, unparse_projection

    rng = random.Random(7)
    branch_pool = [
        ("neg", ["<", 0.0]), ("small", ["<=", 10.0]), ("mid", ["<", 100.0]),
        ("exact", ["=", 42.0]), ("dbl", "double"),
        ("bounded", ["double", {"min": -5.0, "max": 5.0}]),
    ]
    for trial in range(6):
        k = rng.randint(2, 4)
        branches = rng.sample(branch_pool, k)
        ORN = ["orn", *[[name, s] for (name, s) in branches]]
        n = rng.randint(30, 120)
        vals = [None if rng.random() < .1 else
                round(rng.uniform(-200, 200), 3) for _ in range(n)]
        # sprinkle exact 42s so ["=",42.0] branches fire
        for _ in range(5):
            vals[rng.randrange(n)] = 42.0
        t = pa.table({"i": list(range(n)),
                      "value": pa.array(vals, type=pa.float64())})
        out = parse_projection(rd.from_arrow(t), ORN, "value").take_all()
        out.sort(key=lambda r: r["i"])
        sc = m.schema(ORN)
        for r in out:
            want = m.parse(sc, r["value"])
            if want is m.INVALID:
                assert r["parsed"] is None, (trial, r)
            else:
                assert r["parsed"] is not None, (trial, r, want)
                assert r["parsed"]["tag"] == str(want.key), (trial, r, want)
                assert r["parsed"]["value"] == want.value
        back = unparse_projection(
            parse_projection(rd.from_arrow(t), ORN, "value"),
            ORN, "parsed", out="v2").take_all()
        back.sort(key=lambda r: r["i"])
        for r in back:
            want = m.parse(sc, r["value"])
            assert r["v2"] == (None if want is m.INVALID else r["value"])


def test_decode_batch_matches_row_engine_fuzz(ray_session):
    """Batch decode (DecodeBatch) must agree with the row-level
    string-transformer decode on random stringly tables."""
    import random
    import ray.data as rd
    from malli_ray.stages.transform_stage import DecodeBatch
    from malli_ray.transform import string_transformer

    rng = random.Random(13)
    S = ["map", ["a", "int"], ["b", "double"], ["c", "boolean"],
         ["d", "inst?"]]
    st = string_transformer()
    for trial in range(4):
        n = rng.randint(20, 80)
        def cell(kind):
            r = rng.random()
            if r < .1:
                return None
            if r < .25:
                return "garbage!"
            if kind == "a":
                return str(rng.randint(-999, 999))
            if kind == "b":
                return f"{rng.uniform(-10, 10):.4f}"
            if kind == "c":
                return rng.choice(["true", "false"])
            return rng.choice(["2021-03-04", "2021-03-04T05:06:07",
                               "2021-03-04T05:06:07Z"])
        t = pa.table({k: pa.array([cell(k) for _ in range(n)])
                      for k in ("a", "b", "c", "d")})
        out = rd.from_arrow(t).map_batches(
            DecodeBatch, fn_constructor_kwargs={"schema": S},
            batch_format="pyarrow", concurrency=1).take_all()
        src = t.to_pylist()
        for i, got in enumerate(out):
            want = m.decode(S, src[i], st)
            for k in ("a", "b", "c", "d"):
                w = want[k]
                g = got[k]
                # batch contract: failed casts become typed NULLs while the
                # row path keeps the unparsed string (documented divergence)
                if isinstance(w, str) or w is None:
                    assert g is None, (trial, i, k, g, w)
                else:
                    assert g == w, (trial, i, k, g, w)


def test_pipeline_matches_row_engine_fuzz(ray_session):
    """Distributed summarize/explain must agree exactly with the row engine
    on random tables (counts of valid rows AND of violation rows)."""
    import random
    import ray.data as rd
    from malli_ray.pipelines import validation_job as vj
    from malli_ray.stages.validator import ValidationSpec

    rng = random.Random(11)
    schema = ["map",
              ["id", ["string", {"min": 1}]],
              ["n", ["int", {"min": -20, "max": 20}]],
              ["tag", ["enum", "a", "b", "c"]],
              ["v", ["vector", {"min": 1}, ["int", {"max": 15}]]]]
    spec = ValidationSpec(schema=schema, id_column="id")
    for trial in range(4):
        n = rng.randint(50, 200)
        t = pa.table({
            "id": pa.array([f"id{i}" if rng.random() > .05 else None
                            for i in range(n)]),
            "n": pa.array([None if rng.random() < .15 else rng.randint(-50, 50)
                           for _ in range(n)], type=pa.int64()),
            "tag": pa.array([rng.choice(["a", "b", "zz", None])
                             for _ in range(n)]),
            "v": pa.array([None if rng.random() < .1 else
                           [rng.randint(0, 20) for _ in range(rng.randint(0, 5))]
                           for _ in range(n)], type=pa.list_(pa.int64())),
        })
        expected_valid = sum(1 for row in t.to_pylist() if m.validate(schema, row))
        rep = vj.summarize(rd.from_arrow(t).repartition(3), spec)
        assert (rep["n_rows"], rep["n_valid"]) == (n, expected_valid)
        vio = vj.explain(rd.from_arrow(t).repartition(3), spec).count()
        expected_vio = sum(len(m.explain(schema, row)["errors"])
                           for row in t.to_pylist()
                           if not m.validate(schema, row))
        assert vio == expected_vio


def test_sequence_packing(ray_session):
    import numpy as np
    import ray.data as rd
    from malli_ray.stages import packing

    # greedy block ids: pure-function oracle
    assert list(packing.greedy_block_ids(np.array([3, 3, 3, 3]), 6)) == \
        [0, 0, 1, 1]
    assert list(packing.greedy_block_ids(np.array([5, 2, 9, 1]), 6)) == \
        [0, 1, 2, 3]          # 9 > cap gets its own block
    assert list(packing.greedy_block_ids(np.array([7]), 6)) == [0]
    assert list(packing.greedy_block_ids(np.array([], dtype=np.int64), 6)) == []

    rows = [{"g": "a", "id": i, "n": n}
            for i, n in enumerate([3, 3, 3, 3, 5, 2])] + \
           [{"g": "b", "id": 10, "n": 9}]
    ds = rd.from_items(rows)

    packed = packing.pack_greedy(ds, "g", "id", "n", cap=6).take_all()
    got = {(r["g"], r["id"]): r["block_id"] for r in packed}
    # greedy: [3,3|3,3|5|2] — 5+2 would overflow the 6 cap
    assert got == {("a", 0): 0, ("a", 1): 0, ("a", 2): 1, ("a", 3): 1,
                   ("a", 4): 2, ("a", 5): 3, ("b", 10): 0}

    chunked = packing.chunk_blocks(ds, "g", "id", "n", cap=6).take_all()
    got = {(r["g"], r["id"]): r["block_id"] for r in chunked}
    # non-resetting: cum_before // cap
    assert got == {("a", 0): 0, ("a", 1): 0, ("a", 2): 1, ("a", 3): 1,
                   ("a", 4): 2, ("a", 5): 2, ("b", 10): 0}


def test_canonicalize_urls(ray_session):
    import ray.data as rd
    from malli_ray.stages import text as T

    tbl = pa.table({"id": [0, 1, 2, 3, 4], "url": [
        "HTTPS://WWW.Example.COM/Path/Sub/?q=1#frag",
        "https://example.com/Path/Sub",     # same canonical as row 0
        "ftp://Files.Org//",                # scheme kept, path run stripped
        "no scheme here",                   # -> null
        None]})
    out = {r["id"]: r["canonical_url"]
           for r in T.canonicalize_urls(rd.from_arrow(tbl),
                                        "url").take_all()}
    assert out[0] == "https://example.com/Path/Sub"
    assert out[1] == "https://example.com/Path/Sub"
    assert out[2] == "ftp://files.org"
    assert out[3] is None and out[4] is None


def test_exact_dedup_keep_best(ray_session):
    import ray.data as rd
    from malli_ray.stages.dedup import exact_dedup_keep_best

    rows = [{"id": 0, "t": "x", "s": 5}, {"id": 1, "t": "x", "s": 9},
            {"id": 2, "t": "x", "s": 9},           # tie -> min id (1)
            {"id": 3, "t": "y", "s": None},        # null loses...
            {"id": 4, "t": "y", "s": 1},
            {"id": 5, "t": "z", "s": None}]        # ...unless all null
    ds = rd.from_items(rows)
    kept = {r["id"] for r in
            exact_dedup_keep_best(ds, "t", "id", "s").take_all()}
    assert kept == {1, 4, 5}


def test_cross_source_dup_matrix(ray_session):
    """The who-copies-whom matrix vs a brute-force reference: ordered
    pairs only, within-source dups never pair with themselves, doc
    MULTIPLICITY counts on the a-side, null sources fold to ''."""
    import itertools

    import ray.data as rd
    from malli_ray.stages.dedup import cross_source_dup_matrix

    rows = [("x", "A"), ("x", "A"),       # two A docs with content x
            ("x", "B"),                   # ... also in B
            ("y", "A"), ("y", "C"), ("y", "C"),
            ("z", "B"),                   # unique to B: no pairs
            ("w", None), ("w", "A")]      # null source folds to ''
    # ONE ROW PER BLOCK: every (text, source) partial row reaches the
    # bucket un-collapsed, so duplicate (content, source) pairs MUST be
    # re-collapsed there — the regression that produced self-pairs
    # (A, A) and overcounted b-sides when copies spanned map batches
    t = pa.table({"text": [r[0] for r in rows],
                  "source": pa.array([r[1] for r in rows], pa.string())})
    got = {(r["source_a"], r["source_b"]): r["n_docs"]
           for r in cross_source_dup_matrix(
               rd.from_arrow(t).repartition(len(rows)), "text", "source")
           .take_all()}
    assert all(a != b for a, b in got)    # no self-pairs, ever
    # brute-force reference
    from collections import Counter
    per = Counter(((txt, s or "") for txt, s in rows))
    srcs_of = {}
    for (txt, s), _n in per.items():
        srcs_of.setdefault(txt, set()).add(s)
    want = Counter()
    for (txt, s), n in per.items():
        for other in srcs_of[txt] - {s}:
            want[(s, other)] += n
    assert got == dict(want)
    assert got[("A", "B")] == 2 and got[("B", "A")] == 1
    assert got[("", "A")] == 1 and got[("A", "")] == 1
    assert ("B", "C") not in got


def test_vocab_coverage(ray_session):
    """Coverage curve vs hand arithmetic, incl. the count-DESC/token-ASC
    tie rule and k > n_distinct clamping."""
    import ray.data as rd
    from malli_ray.stages.analytics import vocab_coverage

    # token 3 x5, token 1 x3, token 2 x3, token 0 x1  (1 and 2 tie)
    t = pa.table({"tokens": [[3, 3, 3], [3, 3, 1, 1], [1, 2, 2], [2, 0]]})
    out = vocab_coverage(rd.from_arrow(t).repartition(2), "tokens",
                         bounded_range=(0, 10), ks=(1, 2, 3, 100))
    rows = {r["k"]: r for r in out.to_pylist()}
    assert rows[1]["covered"] == 5                 # top-1 = token 3
    assert rows[2]["covered"] == 8                 # tie -> token 1 first
    assert rows[3]["covered"] == 11
    assert rows[100]["covered"] == 12              # clamped to n_distinct
    assert rows[100]["n_distinct"] == 4
    assert all(r["total"] == 12 for r in rows.values())
    assert rows[2]["coverage"] == 8 / 12


def test_vocab_overlap_and_growth(ray_session):
    """Presence-bitmap set algebra vs brute-force sets: pairwise type
    overlap (unordered pairs, exact jaccard) and the cumulative
    growth curve (prefix-OR == union of prefix type sets)."""
    import ray.data as rd
    from malli_ray.stages.analytics import (vocab_growth_curve,
                                            vocab_overlap_by_group)

    rows = [("a", [1, 2, 3, 1]), ("a", [4]), ("b", [3, 4, 5]),
            ("c", [9]), ("b", [5, 5])]
    t = pa.table({"g": [r[0] for r in rows],
                  "tokens": [r[1] for r in rows]})
    ds = rd.from_arrow(t).repartition(3)

    sets = {}
    toks = {}
    for g, ts in rows:
        sets.setdefault(g, set()).update(ts)
        toks[g] = toks.get(g, 0) + len(ts)
    ov = {(r["group_a"], r["group_b"]): r
          for r in vocab_overlap_by_group(
              ds, "tokens", "g", bounded_range=(0, 10)).to_pylist()}
    assert set(ov) == {("a", "b"), ("a", "c"), ("b", "c")}
    for (ga, gb), r in ov.items():
        inter = len(sets[ga] & sets[gb])
        union = len(sets[ga] | sets[gb])
        assert r["n_common"] == inter
        assert r["n_types_a"] == len(sets[ga])
        assert r["n_types_b"] == len(sets[gb])
        assert r["jaccard"] == (inter / union if union else 0.0)

    gr = vocab_growth_curve(ds, "tokens", "g",
                            bounded_range=(0, 10)).to_pylist()
    assert [r["group"] for r in gr] == ["a", "b", "c"]
    seen, ntok = set(), 0
    for r in gr:
        seen |= sets[r["group"]]
        ntok += toks[r["group"]]
        assert r["n_types_cum"] == len(seen)
        assert r["n_tokens_cum"] == ntok


def test_prefix_jaccard_candidates_complete(ray_session):
    """Prefix-filter recall is EXACTLY 1: on random word soups, every
    pair with true word-3-gram Jaccard >= t appears in the candidates."""
    import numpy as np
    import ray.data as rd
    from malli_ray.stages.dedup import (_word_shingles,
                                        prefix_jaccard_candidates)

    rng = np.random.default_rng(19)
    vocab = [f"w{i}" for i in range(30)]
    for t in (0.5, 0.25):
        docs = []
        for i in range(40):
            base = rng.integers(3, 20)
            words = [vocab[j] for j in rng.integers(0, len(vocab),
                                                    size=base)]
            docs.append(" ".join(words))
            if i % 4 == 0:       # plant near-dups: perturb one word
                w2 = list(words)
                w2[rng.integers(0, len(w2))] = vocab[0]
                docs.append(" ".join(w2))
        ids = list(range(len(docs)))
        truth = set()
        gs = [set(_word_shingles(d, 3)) for d in docs]
        for a in range(len(docs)):
            for b in range(a + 1, len(docs)):
                u = len(gs[a] | gs[b])
                if u and len(gs[a] & gs[b]) / u >= t:
                    truth.add((a, b))
        ds = rd.from_arrow(pa.table({"doc_id": ids, "text": docs}))
        cands = {(r["id_a"], r["id_b"])
                 for r in prefix_jaccard_candidates(
                     ds, "text", "doc_id", threshold=t,
                     num_buckets=8).take_all()}
        missing = truth - cands
        assert not missing, f"t={t}: recall gap {missing}"


def test_containment_candidates_complete(ray_session):
    """Containment recall is exactly 1 — including the asymmetric pairs
    (short doc embedded in a much longer one) whose JACCARD is far below
    any banding threshold."""
    import numpy as np
    import ray.data as rd
    from malli_ray.stages.dedup import (_word_shingles,
                                        containment_candidates)

    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    for i in range(25):
        words = [vocab[j] for j in rng.integers(0, len(vocab),
                                                size=rng.integers(20, 40))]
        docs.append(" ".join(words))
        if i % 3 == 0:  # plant a fully-contained short excerpt
            s = rng.integers(0, len(words) - 6)
            docs.append(" ".join(words[s:s + 6]))
    ids = list(range(len(docs)))
    t = 0.8
    gs = [set(_word_shingles(d, 3)) for d in docs]
    truth = set()
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            m = min(len(gs[a]), len(gs[b]))
            if 5 * len(gs[a] & gs[b]) >= 4 * m:
                truth.add((a, b))
    assert truth, "planted containment pairs missing from the setup"
    ds = rd.from_arrow(pa.table({"doc_id": ids, "text": docs}))
    cands = {(r["id_a"], r["id_b"])
             for r in containment_candidates(ds, "text", "doc_id",
                                             threshold=t,
                                             num_buckets=8).take_all()}
    assert truth - cands == set(), truth - cands


def test_ann_join_exact_when_all_cells_probed(ray_session):
    import numpy as np
    import ray.data as rd
    from malli_ray.stages.similarity import ann_join

    rng = np.random.default_rng(3)
    n, d = 120, 16
    emb = rng.normal(size=(n, d)).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table({"vec_id": ids, "embedding": [list(map(float, e))
                                                 for e in emb]})
    ds = rd.from_arrow(tbl)
    left = ds.filter(lambda r: r["vec_id"] % 10 == 0)
    right = ds.filter(lambda r: r["vec_id"] % 10 != 0)
    # n_probe == n_centroids -> every cell probed -> EXACT top-k
    out = ann_join(left, right, "embedding", "vec_id", k=3,
                   n_centroids=4, n_probe=4, sample_size=64)
    got = {}
    for r in out.take_all():
        got.setdefault(r["query_id"], []).append(r["match_id"])
    # brute-force reference
    e64 = emb.astype(np.float64)
    u = e64 / np.linalg.norm(e64, axis=1, keepdims=True)
    lmask = ids % 10 == 0
    sims = u[lmask] @ u[~lmask].T
    rids = ids[~lmask]
    for qi, lid in enumerate(ids[lmask]):
        sel = np.lexsort((rids, -sims[qi]))[:3]
        assert set(got[lid]) == set(rids[sel].tolist()), lid
    # partial probing: recall can drop but stays useful
    out2 = ann_join(left, right, "embedding", "vec_id", k=3,
                    n_centroids=4, n_probe=2, sample_size=64)
    hits = tot = 0
    got2 = {}
    for r in out2.take_all():
        got2.setdefault(r["query_id"], set()).add(r["match_id"])
    for qi, lid in enumerate(ids[lmask]):
        sel = set(rids[np.lexsort((rids, -sims[qi]))[:3]].tolist())
        hits += len(sel & got2.get(lid, set()))
        tot += 3
    assert hits / tot >= 0.6


def test_interval_coverage(ray_session):
    import ray.data as rd
    from malli_ray.stages.windows import interval_coverage

    tbl = pa.table({
        "k": ["a"] * 4 + ["b"] * 2 + ["c"],
        "s": [0, 5, 20, 30, 100, 100, 7],
        "e": [10, 15, 25, 30, 110, 105, 3]})  # a: 30-30 empty; c: e<s
    out = {r["k"]: (r["n_intervals"], r["n_merged"], r["coverage"])
           for r in interval_coverage(rd.from_arrow(tbl), "k", "s", "e",
                                      num_buckets=4).take_all()}
    # a: [0,10)+[5,15) merge -> [0,15); [20,25) separate; [30,30) dropped
    assert out == {"a": (3, 2, 20), "b": (2, 1, 10)}

    # touching intervals merge (end == next start)
    t2 = pa.table({"k": ["x", "x"], "s": [0, 10], "e": [10, 20]})
    out2 = interval_coverage(rd.from_arrow(t2), "k", "s", "e",
                             num_buckets=1).take_all()
    assert (out2[0]["n_merged"], out2[0]["coverage"]) == (1, 20)


def test_ohlc(ray_session):
    import datetime as dt
    import ray.data as rd
    from malli_ray.stages.windows import ohlc

    base = dt.datetime(2024, 1, 1)
    rows = [
        # key a, hour 0: open 5 (tie at t0 broken by id), high 9, low 2
        ("a", base, 1, 5.0), ("a", base, 2, 7.0),
        ("a", base + dt.timedelta(minutes=30), 3, 2.0),
        ("a", base + dt.timedelta(minutes=59), 4, 9.0),
        # key a, hour 1: single value + a null (dropped)
        ("a", base + dt.timedelta(minutes=61), 5, 4.0),
        ("a", base + dt.timedelta(minutes=62), 6, None),
        # key b, hour 0
        ("b", base + dt.timedelta(minutes=10), 7, 1.0),
    ]
    t = pa.table({"k": [r[0] for r in rows],
                  "ts": pa.array([r[1] for r in rows],
                                 type=pa.timestamp("us")),
                  "id": [r[2] for r in rows],
                  "v": pa.array([r[3] for r in rows],
                                type=pa.float64())})
    out = {(r["k"], r["window"].minute + 60 * r["window"].hour):
           (r["open"], r["high"], r["low"], r["close"], r["n"])
           for r in ohlc(rd.from_arrow(t), "k", "ts", "v", minutes=60,
                         id_col="id", num_buckets=4).take_all()}
    assert out == {("a", 0): (5.0, 9.0, 2.0, 9.0, 4),
                   ("a", 60): (4.0, 4.0, 4.0, 4.0, 1),
                   ("b", 0): (1.0, 1.0, 1.0, 1.0, 1)}


def test_sessionize_bucketed_rebase(ray_session):
    """Many keys per bucket (num_buckets=1): session ids rebase per key
    run — randomized cross-check vs a per-key python reference."""
    import datetime as dt
    import ray.data as rd
    from malli_ray.stages.windows import sessionize

    rng = np.random.default_rng(13)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for u in range(12):
        t = 0
        for _ in range(int(rng.integers(1, 15))):
            t += int(rng.integers(1, 90))
            rows.append({"user": u,
                         "ts": base + dt.timedelta(minutes=t)})
    tbl = pa.table({"user": [r["user"] for r in rows],
                    "ts": pa.array([r["ts"] for r in rows],
                                   type=pa.timestamp("us"))})
    got = {(r["user"], r["session_id"]): (r["n_events"],
                                          r["session_start"])
           for r in sessionize(rd.from_arrow(tbl), "user", "ts",
                               gap_minutes=30,
                               num_buckets=1).take_all()}
    # reference: python per key
    want = {}
    byu = {}
    for r in rows:
        byu.setdefault(r["user"], []).append(r["ts"])
    for u, tss in byu.items():
        tss.sort()
        sid, cnt, start = 0, 0, None
        prev = None
        for ts in tss:
            if prev is None or (ts - prev).total_seconds() > 1800:
                if sid:
                    want[(u, sid)] = (cnt, start)
                sid += 1
                cnt, start = 0, ts
            cnt += 1
            prev = ts
        want[(u, sid)] = (cnt, start)
    assert got == want


def test_ffill(ray_session):
    import ray.data as rd
    from malli_ray.stages.windows import ffill

    tbl = pa.table({"k": ["a"] * 5 + ["b"] * 3,
                    "o": [1, 2, 3, 4, 5, 1, 2, 3],
                    "v": [None, 1.5, None, None, 7.0, None, None, 2.0]})
    out = ffill(rd.from_arrow(tbl), "k", "o", "v",
                num_buckets=4).take_all()
    got = {(r["k"], r["o"]): r["v_ffill"] for r in out}
    # leading nulls stay null; carries never cross keys
    assert got == {("a", 1): None, ("a", 2): 1.5, ("a", 3): 1.5,
                   ("a", 4): 1.5, ("a", 5): 7.0,
                   ("b", 1): None, ("b", 2): None, ("b", 3): 2.0}


def test_bfill(ray_session):
    import ray.data as rd
    from malli_ray.stages.windows import bfill

    tbl = pa.table({"k": ["a"] * 5 + ["b"] * 3,
                    "o": [1, 2, 3, 4, 5, 1, 2, 3],
                    "v": [None, 1.5, None, None, 7.0, 2.0, None, None]})
    out = bfill(rd.from_arrow(tbl), "k", "o", "v",
                num_buckets=4).take_all()
    got = {(r["k"], r["o"]): r["v_bfill"] for r in out}
    # trailing nulls stay null; carries never cross keys
    assert got == {("a", 1): 1.5, ("a", 2): 1.5, ("a", 3): 7.0,
                   ("a", 4): 7.0, ("a", 5): 7.0,
                   ("b", 1): 2.0, ("b", 2): None, ("b", 3): None}


def test_bfill_random_matches_pandas(ray_session):
    """bfill == pandas groupby-bfill on random sparse series (values
    moved verbatim, bit-exact)."""
    import random

    import pandas as pd
    import ray.data as rd
    from malli_ray.stages.windows import bfill

    rng = random.Random(5)
    n = 4000
    df = pd.DataFrame({
        "k": [rng.randrange(40) for _ in range(n)],
        "o": range(n),
        "v": [None if rng.random() < 0.6 else rng.random()
              for _ in range(n)]})
    out = bfill(rd.from_arrow(pa.Table.from_pandas(df)), "k", "o", "v",
                num_buckets=8).take_all()
    got = {r["o"]: r["v_bfill"] for r in out}
    want = df.sort_values(["k", "o"]).groupby("k")["v"].bfill()
    want.index = df.sort_values(["k", "o"])["o"]
    for o, w in want.items():
        g = got[o]
        assert (g is None and pd.isna(w)) or g == w


def test_gap_fill(ray_session):
    import ray.data as rd
    from malli_ray.stages.windows import gap_fill

    tbl = pa.table({"k": ["a", "a", "a", "b", "c"],
                    "b": [10, 13, 11, 5, 7],
                    "v": [1, 3, 2, 9, 4]})
    out = gap_fill(rd.from_arrow(tbl), "k", "b", "v",
                   num_buckets=4).take_all()
    got = sorted((r["k"], r["b"], r["v"]) for r in out)
    assert got == [("a", 10, 1), ("a", 11, 2), ("a", 12, 0), ("a", 13, 3),
                   ("b", 5, 9), ("c", 7, 4)]

    # duplicate (key, bucket) raises
    dup = pa.table({"k": ["a", "a"], "b": [1, 1], "v": [1, 2]})
    with pytest.raises(Exception, match="duplicate"):
        gap_fill(rd.from_arrow(dup), "k", "b", "v",
                 num_buckets=1).take_all()

    # span guard raises
    wide = pa.table({"k": ["a", "a"], "b": [0, 10_000], "v": [1, 1]})
    with pytest.raises(Exception, match="max_rows_per_key"):
        gap_fill(rd.from_arrow(wide), "k", "b", "v", num_buckets=1,
                 max_rows_per_key=100).take_all()


def test_upsample_by_group_factor(ray_session):
    import ray.data as rd
    from malli_ray.stages import sampling

    rows = [{"id": i, "g": "a" if i < 400 else "b"} for i in range(800)]
    ds = rd.from_items(rows)
    out = sampling.upsample_by_group_factor(
        ds, "g", "id", factors={"a": 2.5, "b": 0.25}).take_all()
    by_g = {}
    epochs = {}
    for r in out:
        by_g[r["g"]] = by_g.get(r["g"], 0) + 1
        epochs.setdefault(r["id"], []).append(r["epoch"])
    # a: 400 rows x 2.5 ~ 1000 (base 800 + ~200 extras); b: ~100
    assert 900 < by_g["a"] < 1100 and 60 < by_g["b"] < 140
    # every copy list is a contiguous 0..k-1 epoch range
    for eid, es in epochs.items():
        assert sorted(es) == list(range(len(es)))
    # deterministic rerun
    again = sampling.upsample_by_group_factor(
        ds, "g", "id", factors={"a": 2.5, "b": 0.25}).take_all()
    assert sorted((r["id"], r["epoch"]) for r in again) == \
        sorted((r["id"], r["epoch"]) for r in out)

    with pytest.raises(ValueError):
        sampling.upsample_by_group_factor(ds, "g", "id",
                                          factors={"a": -1.0})


def test_poisson_bootstrap(ray_session):
    import ray.data as rd
    from malli_ray.stages import sampling

    ds = rd.from_arrow(pa.table({"id": list(range(20000))}))
    out = sampling.poisson_bootstrap(ds, "id", replicate=0).take_all()
    ks = np.array([r["n_boot"] for r in out])
    # Poisson(1): mean ~1, P(0) ~ 1/e, P(k>=5) tiny
    assert abs(ks.mean() - 1.0) < 0.05
    assert abs((ks == 0).mean() - 0.3679) < 0.02
    assert (ks >= 5).mean() < 0.01
    # replicates decorrelate; each is individually deterministic
    out1 = sampling.poisson_bootstrap(ds, "id", replicate=1).take_all()
    k1 = np.array([r["n_boot"] for r in out1])
    assert abs(k1.mean() - 1.0) < 0.05 and not np.array_equal(ks, k1)
    again = sampling.poisson_bootstrap(ds, "id", replicate=1).take_all()
    assert np.array_equal(k1, np.array([r["n_boot"] for r in again]))


def test_sample_by_weight(ray_session):
    import ray.data as rd
    from malli_ray.stages import sampling

    rows = [{"id": i, "w": (i % 10) + 1} for i in range(2000)]
    rows += [{"id": 9990, "w": 0}, {"id": 9991, "w": None}]
    ds = rd.from_items(rows)
    out = sampling.sample_by_weight(ds, "w", "id", rate_at_max=1.0)
    got = out.take_all()
    ids = {r["id"] for r in got}
    assert 9990 not in ids and 9991 not in ids
    # keep rate per weight ~ w / 10 (Knuth hash is well mixed at n=200/arm)
    by_w = {}
    for r in got:
        by_w[r["w"]] = by_w.get(r["w"], 0) + 1
    assert by_w[10] == 200                # prob exactly 1.0 at the max
    assert 0.5 * 200 * 0.7 < by_w[5] < 0.5 * 200 * 1.3
    # deterministic: identical second run
    again = {r["id"] for r in
             sampling.sample_by_weight(ds, "w", "id",
                                       rate_at_max=1.0).take_all()}
    assert again == ids

    with pytest.raises(ValueError):
        sampling.sample_by_weight(ds, "w", "id", rate_at_max=0.0)


def test_triangle_counts_random_graphs(ray_session):
    import itertools

    import numpy as np
    import ray.data as rd
    from malli_ray.stages.graph import triangle_counts

    rng = np.random.default_rng(7)
    for trial in range(4):
        n = int(rng.integers(5, 30))
        m = int(rng.integers(n, 4 * n))
        src = rng.integers(0, n, size=m)
        dst = rng.integers(0, n, size=m)
        # brute-force reference: adjacency set, count per node
        adj = {i: set() for i in range(n)}
        for a, b in zip(src.tolist(), dst.tolist()):
            if a != b:
                adj[a].add(b)
                adj[b].add(a)
        expected = {}
        for a, b, c in itertools.combinations(range(n), 3):
            if b in adj[a] and c in adj[a] and c in adj[b]:
                for x in (a, b, c):
                    expected[x] = expected.get(x, 0) + 1
        ds = rd.from_arrow(pa.table({"s": src, "d": dst}))
        got = {r["node"]: r["n_triangles"]
               for r in triangle_counts(ds, "s", "d",
                                        num_buckets=4).take_all()}
        assert got == expected, f"trial {trial}"

    # degenerate: no edges survive canonicalization (all self-loops)
    ds = rd.from_arrow(pa.table({"s": [1, 2], "d": [1, 2]}))
    assert triangle_counts(ds, "s", "d", num_buckets=2).take_all() == []


def test_bfs_levels_random_graphs(ray_session):
    from collections import deque

    import numpy as np
    import ray.data as rd
    from malli_ray.stages.graph import bfs_levels

    rng = np.random.default_rng(31)
    for trial in range(3):
        n = int(rng.integers(6, 30))
        m = int(rng.integers(n, 3 * n))
        src = rng.integers(0, n, size=m)
        dst = rng.integers(0, n, size=m)
        sources = sorted(set(rng.integers(0, n,
                                          size=rng.integers(1, 3)).tolist()))
        adj = {}
        for a, b in zip(src.tolist(), dst.tolist()):
            if a != b:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
        expected = {s: 0 for s in sources}
        dq = deque(sources)
        while dq:
            x = dq.popleft()
            for y in adj.get(x, ()):
                if y not in expected:
                    expected[y] = expected[x] + 1
                    dq.append(y)
        ds = rd.from_arrow(pa.table({"s": src, "d": dst}))
        out, conv = bfs_levels(ds, "s", "d", sources, num_buckets=4)
        got = {r["node"]: r["dist"] for r in out.take_all()}
        assert conv and got == expected, f"trial {trial}"


def test_k_core_random_graphs(ray_session):
    import numpy as np
    import ray.data as rd
    from malli_ray.stages.graph import k_core

    rng = np.random.default_rng(11)
    for trial in range(3):
        n = int(rng.integers(8, 40))
        m = int(rng.integers(n, 5 * n))
        src = rng.integers(0, n, size=m)
        dst = rng.integers(0, n, size=m)
        k = int(rng.integers(2, 5))
        # brute-force peel
        E = {(min(a, b), max(a, b))
             for a, b in zip(src.tolist(), dst.tolist()) if a != b}
        while True:
            deg = {}
            for a, b in E:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            keep = {x for x, d in deg.items() if d >= k}
            E2 = {(a, b) for a, b in E if a in keep and b in keep}
            if E2 == E:
                break
            E = E2
        expected = {}
        for a, b in E:
            expected[a] = expected.get(a, 0) + 1
            expected[b] = expected.get(b, 0) + 1
        ds = rd.from_arrow(pa.table({"s": src, "d": dst}))
        out, conv = k_core(ds, "s", "d", k=k, num_buckets=4)
        got = {r["node"]: r["degree"] for r in out.take_all()}
        assert conv and got == expected, f"trial {trial} k={k}"


def test_top_fraction_by_group(ray_session):
    import ray.data as rd
    from malli_ray.stages import sampling

    rows = ([{"g": "a", "id": i, "s": i * 10} for i in range(10)] +
            [{"g": "b", "id": i, "s": 5 if i < 3 else None}
             for i in range(5)])
    ds = rd.from_items(rows)
    out = sampling.top_fraction_by_group(ds, "g", "s", "id",
                                         fraction=0.25).take_all()
    got = sorted((r["g"], r["id"], r["rk"]) for r in out)
    # a: ceil(0.25*10)=3 -> ids 9,8,7; b: 3 non-null, ceil(0.75)=1,
    # tie on s=5 broken by ascending id -> id 0
    assert got == [("a", 7, 3), ("a", 8, 2), ("a", 9, 1), ("b", 0, 1)]

    # fraction=1 keeps every non-null-score row
    out = sampling.top_fraction_by_group(ds, "g", "s", "id",
                                         fraction=1.0).take_all()
    assert len(out) == 13

    with pytest.raises(ValueError):
        sampling.top_fraction_by_group(ds, "g", "s", "id", fraction=0.0)


def test_concat_token_blocks(ray_session):
    import numpy as np
    import ray.data as rd
    from malli_ray.stages import packing

    rows = [{"g": "a", "id": i, "n": n}
            for i, n in enumerate([3, 10, 4, 0, 7])] + \
           [{"g": "b", "id": 0, "n": 13}, {"g": "b", "id": 1, "n": None}]
    ds = rd.from_items(rows)
    out = packing.concat_token_blocks(ds, "g", "id", "n",
                                      block_size=6).take_all()

    # hand-computed spans for group a (stream: 3,10,4,_,7 = 24 tokens)
    a = sorted([(r["id"], r["block_id"], r["tok_start"], r["tok_end"],
                 r["block_offset"]) for r in out if r["g"] == "a"])
    assert a == [
        (0, 0, 0, 3, 0),            # doc0 tokens 0-3 -> block 0 @ 0
        (1, 0, 0, 3, 3),            # doc1 first 3 fill block 0
        (1, 1, 3, 9, 0),            # next 6 fill block 1
        (1, 2, 9, 10, 0),           # last 1 opens block 2
        (2, 2, 0, 4, 1),            # doc2 rides block 2 after it
        # doc3 (n=0) emits nothing
        (4, 2, 0, 1, 5),            # doc4 first token closes block 2
        (4, 3, 1, 7, 0),            # remaining 6 fill block 3 exactly
    ]
    # invariants: spans tile each doc exactly; every non-final block is full
    b = [(r["id"], r["block_id"], r["tok_start"], r["tok_end"],
          r["block_offset"]) for r in out if r["g"] == "b"]
    assert sorted(b) == [(0, 0, 0, 6, 0), (0, 1, 6, 12, 0), (0, 2, 12, 13, 0)]
    for g, max_blk in [("a", 3), ("b", 2)]:
        per_blk = {}
        for r in out:
            if r["g"] == g:
                per_blk[r["block_id"]] = per_blk.get(r["block_id"], 0) + \
                    (r["tok_end"] - r["tok_start"])
        for blk, tot in per_blk.items():
            assert tot == 6 or blk == max_blk


def test_cluster_pairs_and_dedup_by_clusters(ray_session):
    import ray.data as rd
    from malli_ray.stages import dedup

    # union-find over a pair list: {1,2,3,7} and {5,6} clusters
    t = pa.table({"id_a": [1, 2, 5, 7], "id_b": [2, 3, 6, 1]})
    out = dedup.cluster_pairs(t)
    assert out.to_pydict() == {"id": [1, 2, 3, 5, 6, 7],
                               "cluster_id": [1, 1, 1, 5, 5, 1]}
    # chain order independence (reversed pair order, late union)
    t2 = pa.table({"id_a": [7, 5, 2, 1], "id_b": [1, 6, 3, 2]})
    assert dedup.cluster_pairs(t2).to_pydict() == out.to_pydict()

    # end-to-end: near-dup pairs -> clusters -> keep representatives
    texts = ["the quick brown fox jumps over the lazy dog"] * 3 + \
            ["totally different content entirely"]
    ds = rd.from_items([{"doc_id": i, "text": s} for i, s in enumerate(texts)])
    pairs_ds = dedup.minhash_lsh_candidates(ds, "text", "doc_id",
                                            threshold=0.5, num_perm=32,
                                            bands=8)
    clusters = dedup.cluster_pairs(pairs_ds)
    kept = dedup.dedup_by_clusters(ds, "doc_id", clusters).take_all()
    assert sorted(r["doc_id"] for r in kept) == [0, 3]


def test_cluster_pairs_empty_dataset(ray_session):
    """No near-duplicates: cluster_pairs returns an empty clusters table
    and dedup_by_clusters keeps everything (review regression)."""
    import ray.data as rd
    from malli_ray.stages import dedup

    ds = rd.from_items([{"doc_id": i, "text": f"unique text {i} here"}
                        for i in range(4)])
    pairs = dedup.minhash_lsh_candidates(ds, "text", "doc_id",
                                         threshold=0.9, num_perm=16, bands=4)
    clusters = dedup.cluster_pairs(pairs)
    assert clusters.num_rows == 0
    kept = dedup.dedup_by_clusters(ds, "doc_id", clusters).take_all()
    assert sorted(r["doc_id"] for r in kept) == [0, 1, 2, 3]


def test_drop_frequent_lines(ray_session):
    """C4-style line scrub: corpus-frequent lines drop, rare lines keep
    their order; all-dropped docs become ''; null text behaves as ''."""
    import ray.data as rd
    from malli_ray.stages import dedup

    boiler = "accept all cookies"
    footer = "copyright 2026 example"
    texts = [f"{boiler}\nunique alpha {i}\n{footer}\nunique beta {i}"
             for i in range(6)]
    texts += [boiler, None, "solo line never repeated"]
    t = pa.table({"doc_id": list(range(len(texts))),
                  "text": pa.array(texts, type=pa.string())})
    out = (dedup.drop_frequent_lines(rd.from_arrow(t), "text", min_count=3)
           .take_all())
    by_id = {r["doc_id"]: r for r in out}
    for i in range(6):
        assert by_id[i]["text_clean"] == f"unique alpha {i}\nunique beta {i}"
        assert by_id[i]["n_lines_dropped"] == 2
    assert by_id[6]["text_clean"] == "" and by_id[6]["n_lines_dropped"] == 1
    assert by_id[7]["text_clean"] == "" and by_id[7]["n_lines_dropped"] == 0
    assert by_id[8]["text_clean"] == "solo line never repeated"
    assert by_id[8]["n_lines_dropped"] == 0


def test_drop_frequent_lines_empty_freq_and_cap(ray_session):
    import ray.data as rd
    from malli_ray.stages import dedup

    t = pa.table({"doc_id": [0, 1], "text": ["a\nb", "c\nd"]})
    # no line reaches min_count -> identity text, zero drops
    out = (dedup.drop_frequent_lines(rd.from_arrow(t), "text", min_count=2)
           .take_all())
    assert {r["doc_id"]: r["text_clean"] for r in out} == {0: "a\nb",
                                                           1: "c\nd"}
    assert all(r["n_lines_dropped"] == 0 for r in out)
    # oversize frequent set fails loudly instead of truncating
    dup = pa.table({"doc_id": [0, 1, 2], "text": ["x\ny"] * 3})
    with pytest.raises(ValueError, match="max_frequent"):
        dedup.drop_frequent_lines(rd.from_arrow(dup), "text", min_count=2,
                                  max_frequent=1)


def test_corpus_freq_score(ray_session):
    """Unigram corpus-frequency scorer: integer-exact aggregates, OOV by
    corpus threshold, empty/null text -> zero counts and null avg."""
    import ray.data as rd
    from malli_ray.stages.text import corpus_freq_score

    t = pa.table({"doc_id": [0, 1, 2, 3],
                  "text": pa.array(["cat cat dog", "dog rare", "", None],
                                   type=pa.string())})
    out = corpus_freq_score(rd.from_arrow(t), "text", "doc_id", min_count=2)
    rows = {r["doc_id"]: r for r in out.take_all()}
    # corpus counts: cat=2, dog=2, rare=1
    assert rows[0]["n_words"] == 3 and rows[0]["total_freq"] == 2 + 2 + 2
    assert rows[0]["oov_words"] == 0
    assert rows[0]["avg_word_freq"] == 6 / 3
    assert rows[1]["n_words"] == 2 and rows[1]["total_freq"] == 3
    assert rows[1]["oov_words"] == 1  # 'rare' below min_count
    for i in (2, 3):
        assert rows[i]["n_words"] == 0 and rows[i]["total_freq"] == 0
        assert rows[i]["avg_word_freq"] is None
        assert rows[i]["oov_words"] == 0


def test_ngram_contamination(ray_session):
    """5-gram decontamination: planted probe grams are found, clean docs
    score zero, short docs (<k words) have no grams and null frac."""
    import ray.data as rd
    from malli_ray.stages.text import ngram_contamination

    probe = pa.table({"doc_id": [100],
                      "text": ["the quick brown fox jumps over the lazy dog"]})
    corpus = pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": ["intro words then the quick brown fox jumps over it",
                 "totally unrelated clean text with many distinct words here",
                 "tiny doc",
                 None]})
    out = ngram_contamination(rd.from_arrow(corpus), "text", "doc_id",
                              rd.from_arrow(probe), k=5)
    rows = {r["doc_id"]: r for r in out.take_all()}
    # doc 0: 10 words -> 6 grams; grams 4 and 5 ('the quick brown fox
    # jumps', 'quick brown fox jumps over') appear in the probe
    assert rows[0]["n_grams"] == 6 and rows[0]["n_hit"] == 2
    assert rows[0]["hit_frac"] == 2 / 6
    assert rows[1]["n_hit"] == 0 and rows[1]["hit_frac"] == 0.0
    assert rows[2]["n_grams"] == 0 and rows[2]["hit_frac"] is None
    assert rows[3]["n_grams"] == 0 and rows[3]["hit_frac"] is None


def test_rebalance_to_uniform(ray_session):
    """Deterministic mixture rebalancing: the small group survives whole
    (threshold 2^32 keeps everything), big groups shrink toward it, and
    reruns select the identical rows."""
    import ray.data as rd
    from malli_ray.stages.sampling import rebalance_to_uniform, keep_mask

    n_a, n_b = 2000, 100
    t = pa.table({"doc_id": list(range(n_a + n_b)),
                  "source": ["a"] * n_a + ["b"] * n_b})
    out = rebalance_to_uniform(rd.from_arrow(t), "source", "doc_id")
    rows = out.take_all()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    # group b: min_c == c -> threshold floor(1.0 * 2^32) == 2^32 keeps all
    assert sorted(by_src["b"]) == list(range(n_a, n_a + n_b))
    # group a shrinks to ~100 (rate sampling, not exact-k)
    assert 50 <= len(by_src["a"]) <= 200
    # deterministic: rerun picks the identical rows
    again = rebalance_to_uniform(rd.from_arrow(t), "source", "doc_id")
    assert sorted(r["doc_id"] for r in again.take_all()) == \
        sorted(r["doc_id"] for r in rows)
    # mask matches the arithmetic contract
    ids = np.array(by_src["a"])
    thr = int(np.floor(100.0 / 2000.0 * 4294967296.0))
    assert keep_mask(ids, thr).all()


def test_generate_dataset(ray_session):
    """Distributed schema-driven generation: every row validates, the
    table is a pure function of (schema, n, seed) — identical across
    block counts and runs — and non-map schemas emit a value column."""
    import malli_ray as m
    from malli_ray.sources.generate import generate_dataset, generate_block

    form = ["map",
            ["id", ["int", {"min": 0, "max": 1000}]],
            ["name", ["string", {"min": 1, "max": 8}]],
            ["tags", ["vector", {"max": 3}, ["enum", "a", "b", "c"]]],
            ["score", {"optional": True}, "double"]]
    n = 300
    out = sorted(generate_dataset(form, n, seed=5,
                                  index_column="row_index").take_all(),
                 key=lambda r: r["row_index"])
    assert len(out) == n
    sc = m.schema(form)
    for r in out:
        row = {k: v for k, v in r.items()
               if v is not None and k != "row_index"}
        assert m.validate(sc, row), row
    # purity: row i is identical across runs (block arrival order is NOT
    # guaranteed — identity comes from the index column)
    again = sorted(generate_dataset(form, n, seed=5,
                                    index_column="row_index").take_all(),
                   key=lambda r: r["row_index"])
    assert out == again
    # block API matches the dataset path row-for-row
    blk = generate_block(form, start=100, count=5, seed=5).to_pylist()
    assert blk == [{k: v for k, v in r.items() if k != "row_index"}
                   for r in out[100:105]]
    # different seed differs; scalar schema emits a value column
    other = sorted(generate_dataset(form, n, seed=6,
                                    index_column="row_index").take_all(),
                   key=lambda r: r["row_index"])
    assert other != out
    vals = generate_dataset(["int", {"min": 0, "max": 9}], 50,
                            seed=1).take_all()
    assert len(vals) == 50 and all(0 <= r["value"] <= 9 for r in vals)


def test_bloom_filter_properties():
    """No false negatives ever; false-positive rate near design; merge is
    bitwise OR; digest round-trips exactly."""
    from malli_ray.state.bloom import BloomFilter

    seen = [f"doc-{i}" for i in range(5000)]
    fresh = [f"new-{i}" for i in range(20000)]
    b = BloomFilter(capacity=5000, fp_rate=0.01, seed=3)
    b.add(seen)
    assert b.contains(seen).all()                    # zero false negatives
    fp = b.contains(fresh).mean()
    assert fp <= 0.03                                # ~1% design, 3x slack
    # merge == union
    b1 = BloomFilter(5000, 0.01, seed=3)
    b2 = BloomFilter(5000, 0.01, seed=3)
    b1.add(seen[:2500])
    b2.add(seen[2500:])
    b1.merge(b2)
    assert (b1.bits == b.bits).all()
    # digest round-trip
    rt = BloomFilter.from_digest(b.digest())
    assert (rt.bits == b.bits).all() and rt.k == b.k and rt.m == b.m
    # geometry mismatch refuses to merge
    import pytest as _pytest
    with _pytest.raises(ValueError):
        b1.merge(BloomFilter(5000, 0.01, seed=4))


def test_incremental_dedup_bloom(ray_session):
    """build_bloom over one corpus, filter_seen_bloom over the next run's
    data: every previously-seen text drops, new texts survive (no FPs at
    this scale), keep_seen inverts the mask, and the digest persists."""
    import ray.data as rd
    from malli_ray.stages.dedup import build_bloom, filter_seen_bloom
    from malli_ray.state.bloom import BloomFilter

    old = pa.table({"doc_id": list(range(1000)),
                    "text": [f"seen text {i}" for i in range(1000)]})
    new = pa.table({
        "doc_id": list(range(1000, 1400)),
        "text": [f"seen text {i}" if i % 2 == 0 else f"fresh {i}"
                 for i in range(400)]})
    bloom = build_bloom(rd.from_arrow(old).repartition(5), "text",
                        capacity=2000, fp_rate=1e-5, seed=1)
    assert bloom.contains(old.column("text")).all()
    kept = filter_seen_bloom(rd.from_arrow(new), "text", bloom).take_all()
    assert sorted(r["doc_id"] for r in kept) == \
        [1000 + i for i in range(400) if i % 2 == 1]
    dropped = filter_seen_bloom(rd.from_arrow(new), "text", bloom,
                                keep_seen=True).take_all()
    assert len(dropped) + len(kept) == 400
    # persistence: save/load gives an identical filter
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "bloom.json")
        bloom.save(p)
        again = BloomFilter.load(p)
        assert (again.bits == bloom.bits).all()


def test_band_digest_incremental_near_dup(ray_session):
    """build_band_digest over one corpus, probe_band_digest over the next:
    exact re-occurrences hit ALL bands, near-dups (one word changed in a
    long doc) hit >= 1 band, disjoint-vocabulary docs hit none; the
    digest merges across shards and survives save/load."""
    import ray.data as rd
    from malli_ray.stages.dedup import (BandDigest, build_band_digest,
                                        probe_band_digest)

    base = " ".join(f"w{i % 37} tok{i % 11} x{i}" for i in range(60))
    old = pa.table({"doc_id": list(range(40)),
                    "text": [f"{base} doc {i}" for i in range(40)]})
    near = base + " doc 0 CHANGED"
    new = pa.table({
        "doc_id": [100, 101, 102],
        "text": [f"{base} doc 0",                      # exact re-occurrence
                 near,                                 # near-dup
                 "совершенно unrelated vocabulary entirely different"]})
    dig = build_band_digest(rd.from_arrow(old).repartition(5), "text")
    got = {r["doc_id"]: (r["n_band_hits"], r["candidate"])
           for r in probe_band_digest(rd.from_arrow(new), "text",
                                      "doc_id", dig).take_all()}
    assert got[100] == (dig.bands, True)
    assert got[101][1] and 1 <= got[101][0] < dig.bands
    assert got[102] == (0, False)

    # shard-merge: two half-digests union to the full key set
    d1 = build_band_digest(
        rd.from_arrow(old.slice(0, 20)), "text")
    d2 = build_band_digest(rd.from_arrow(old.slice(20)), "text")
    assert (d1.merge(d2).keys == dig.keys).all()

    import os
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "bands.npz")
        dig.save(p)
        again = BandDigest.load(p)
        assert (again.keys == dig.keys).all()
        assert again.params() == dig.params()


def test_band_digest_sharded_end_to_end(ray_session):
    """The >max_keys sharded layout, end-to-end: build_band_digest_sharded
    writes key % n_shards digest files (union of per-shard keys == the
    unsharded key set), and probe_band_digest_sharded returns EXACTLY the
    unsharded probe's (id, n_band_hits, candidate) rows — including
    zero-hit docs — without any task loading more than one shard."""
    import os
    import tempfile

    import ray
    import ray.data as rd
    from malli_ray.stages.dedup import (BandDigest, build_band_digest,
                                        build_band_digest_sharded,
                                        probe_band_digest,
                                        probe_band_digest_sharded)

    base = " ".join(f"w{i % 37} tok{i % 11} x{i}" for i in range(60))
    old = pa.table({"doc_id": list(range(40)),
                    "text": [f"{base} doc {i}" for i in range(40)]})
    new = pa.table({
        "doc_id": [100, 101, 102],
        "text": [f"{base} doc 0", base + " doc 0 CHANGED",
                 "совершенно unrelated vocabulary entirely different"]})
    dig = build_band_digest(rd.from_arrow(old).repartition(5), "text")
    with tempfile.TemporaryDirectory() as d:
        man = build_band_digest_sharded(
            rd.from_arrow(old).repartition(5), "text",
            os.path.join(d, "sh"), n_shards=7)
        assert [r["shard"] for r in man] == list(range(7))
        # union of shard keys == the unsharded digest's key set, and
        # every key landed in its key % n_shards shard
        allk = []
        for r in man:
            sk = BandDigest.load(r["path"]).keys
            assert (sk % np.uint64(7) == r["shard"]).all()
            assert len(sk) == r["n_keys"]
            allk.append(sk)
        assert (np.sort(np.concatenate(allk)) == dig.keys).all()

        want = sorted(probe_band_digest(
            rd.from_arrow(new), "text", "doc_id", dig).take_all(),
            key=lambda r: r["doc_id"])
        got = sorted(probe_band_digest_sharded(
            rd.from_arrow(new), "text", "doc_id", man,
            num_perm=dig.num_perm, shingle_k=dig.shingle_k,
            seed=dig.seed, bands=dig.bands).take_all(),
            key=lambda r: r["doc_id"])
        assert got == want
        assert got[2]["n_band_hits"] == 0     # zero-hit doc still reported
        # malformed manifest fails loudly
        with pytest.raises(ValueError):
            probe_band_digest_sharded(rd.from_arrow(new), "text",
                                      "doc_id", man[1:])
        # build/probe param mismatch fails loudly (a silently different
        # seed/num_perm would return n_band_hits=0 for every doc)
        with pytest.raises(ray.exceptions.RayTaskError,
                           match="built with"):
            probe_band_digest_sharded(
                rd.from_arrow(new), "text", "doc_id", man,
                num_perm=dig.num_perm, shingle_k=dig.shingle_k,
                seed=dig.seed + 1, bands=dig.bands).take_all()
        # duplicate probe ids fail loudly (the id-keyed combine would
        # silently sum band hits across the copies)
        dup = pa.table({"doc_id": [100, 100],
                        "text": [f"{base} doc 0", f"{base} doc 0"]})
        with pytest.raises(ray.exceptions.RayTaskError,
                           match="duplicate probe ids"):
            probe_band_digest_sharded(
                rd.from_arrow(dup), "text", "doc_id", man,
                num_perm=dig.num_perm, shingle_k=dig.shingle_k,
                seed=dig.seed, bands=dig.bands).take_all()


def test_global_shuffle(ray_session):
    """Deterministic global shuffle: output order == sorted-by-(hash, id),
    rerun-identical, a different seed yields a different permutation, and
    the key column is dropped by default."""
    import ray.data as rd
    from malli_ray.stages.sampling import global_shuffle, KNUTH_MULT

    n = 5000
    t = pa.table({"doc_id": list(range(n)),
                  "v": [i * 2 for i in range(n)]})
    ds = rd.from_arrow(t).repartition(7)
    out = global_shuffle(ds, "doc_id", seed=3)
    rows = [r["doc_id"] for r in out.take_all()]
    mod = 1 << 32
    want = sorted(range(n), key=lambda i: (((i + 3) % mod) * KNUTH_MULT
                                           % mod, i))
    assert rows == want
    assert rows != list(range(n))            # actually permuted
    assert "shuffle_key" not in out.schema().names
    assert [r["doc_id"] for r in
            global_shuffle(ds, "doc_id", seed=3).take_all()] == want
    assert [r["doc_id"] for r in
            global_shuffle(ds, "doc_id", seed=4).take_all()] != want


def test_rebalance_by_temperature(ray_session):
    """Temperature sampling at alpha=0.5: shares move toward sqrt(count)
    proportions, the derivation is integer-exact (threshold arithmetic
    matches the documented formula), alpha=1 is a no-op mixture (all
    thresholds 2^32 when target_total == N), and reruns are identical."""
    import math
    import ray.data as rd
    from malli_ray.stages.sampling import (rebalance_by_temperature,
                                           temperature_thresholds, keep_mask)

    n_a, n_b = 3600, 400                                 # sqrt 60 vs 20
    t = pa.table({"doc_id": list(range(n_a + n_b)),
                  "source": ["a"] * n_a + ["b"] * n_b})
    ds = rd.from_arrow(t)
    out = rebalance_by_temperature(ds, "source", "doc_id", alpha=0.5)
    rows = out.take_all()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    # expected: N=4000, w=(60,20), s=80 -> a: 4000*60/(3600*80)=0.833,
    # b: 4000*20/(400*80)=2.5 capped at 1 -> b survives whole
    assert sorted(by_src["b"]) == list(range(n_a, n_a + n_b))
    assert 0.75 * n_a <= len(by_src["a"]) <= 0.92 * n_a
    # threshold formula: integer-exact contract
    th = temperature_thresholds({"a": n_a, "b": n_b}, alpha=0.5)
    assert th["b"] == 4294967296
    assert th["a"] == (4000 * math.isqrt(3600) * 4294967296) // (3600 * 80)
    assert keep_mask(np.array(by_src["a"]), th["a"]).all()
    # alpha=1.0 preserves the natural mixture exactly
    all_rows = rebalance_by_temperature(ds, "source", "doc_id",
                                        alpha=1.0).take_all()
    assert len(all_rows) == n_a + n_b
    # deterministic rerun
    again = rebalance_by_temperature(ds, "source", "doc_id", alpha=0.5)
    assert sorted(r["doc_id"] for r in again.take_all()) == \
        sorted(r["doc_id"] for r in rows)


def test_tfidf_keywords(ray_session):
    """tf/df ranking: doc-specific words outrank corpus-wide ones; ties
    break on ascending word; empty docs emit nothing."""
    import ray.data as rd
    from malli_ray.stages.text import tfidf_keywords

    t = pa.table({"doc_id": [0, 1, 2],
                  "text": ["apple apple common zebra",
                           "banana common common",
                           ""]})
    out = tfidf_keywords(rd.from_arrow(t), "text", "doc_id", k=2)
    rows = sorted(out.take_all(), key=lambda r: (r["doc_id"], r["rk"]))
    # doc 0: apple tf=2 df=1 -> 2.0; zebra 1/1 -> 1.0; common 1/2 -> 0.5
    assert [(r["word"], r["rk"]) for r in rows if r["doc_id"] == 0] == \
        [("apple", 1), ("zebra", 2)]
    # doc 1: banana 1/1=1.0 beats common 2/2=1.0 on word tie-break
    assert [(r["word"], r["rk"]) for r in rows if r["doc_id"] == 1] == \
        [("banana", 1), ("common", 2)]
    assert not [r for r in rows if r["doc_id"] == 2]


def test_chunk_text(ray_session):
    """Sliding-window chunking: full coverage with overlap, short docs one
    chunk, empty/null docs none; multibyte chars count as ONE (char, not
    byte, offsets)."""
    import ray.data as rd
    from malli_ray.stages.packing import chunk_text

    t = pa.table({"doc_id": [0, 1, 2, 3, 4],
                  "text": ["abcdefghij",      # 10 chars: [0:8], [4:12)
                           "short",           # <= size -> one chunk
                           "",                # no chunks
                           None,              # no chunks
                           "éééééééééé"]})    # 10 multibyte chars
    out = chunk_text(rd.from_arrow(t), "text", "doc_id", size=8, stride=4)
    rows = sorted(out.take_all(), key=lambda r: (r["doc_id"], r["chunk_id"]))
    d0 = [r for r in rows if r["doc_id"] == 0]
    assert [(r["chunk_start"], r["chunk_text"]) for r in d0] == \
        [(0, "abcdefgh"), (4, "efghij")]
    assert d0[1]["chunk_len"] == 6
    d1 = [r for r in rows if r["doc_id"] == 1]
    assert [(r["chunk_id"], r["chunk_text"]) for r in d1] == [(0, "short")]
    assert not [r for r in rows if r["doc_id"] in (2, 3)]
    d4 = [r for r in rows if r["doc_id"] == 4]
    assert [r["chunk_text"] for r in d4] == ["é" * 8, "é" * 6]
    with pytest.raises(ValueError, match="stride"):
        chunk_text(rd.from_arrow(t), "text", "doc_id", size=4, stride=8)


def test_kmeans_fit_distributed(ray_session):
    """Distributed Lloyd's recovers planted cluster directions and beats
    the sampled init; ivf_topk with the fitted codebook keeps recall."""
    import ray.data as rd
    from malli_ray.stages.similarity import kmeans_fit, ivf_topk, _unit_rows

    rng = np.random.default_rng(7)
    true = _unit_rows(rng.normal(size=(4, 16)))
    vecs = _unit_rows(np.repeat(true, 200, axis=0)
                      + rng.normal(scale=0.05, size=(800, 16)))
    t = pa.table({"vec_id": list(range(800)),
                  "embedding": pa.array([v.tolist() for v in vecs],
                                        type=pa.list_(pa.float64()))})
    ds = rd.from_arrow(t)
    cents = kmeans_fit(ds, "embedding", n_centroids=4, iters=3, seed=3)
    assert cents.shape == (4, 16)
    # every true direction has a fitted centroid with cosine > 0.98
    sims = true @ cents.T
    assert (sims.max(axis=1) > 0.98).all(), sims.max(axis=1)
    # deterministic: same seed, same data -> same codebook
    again = kmeans_fit(ds, "embedding", n_centroids=4, iters=3, seed=3)
    assert np.array_equal(cents, again)
    # recall with the fitted codebook (probe half the cells)
    queries = vecs[::160]
    got = ivf_topk(ds, queries, "embedding", "vec_id", k=5,
                   centroids=cents, n_probe=2).take_all()
    from malli_ray.stages.similarity import topk_cosine
    want = topk_cosine(ds, queries, "embedding", "vec_id", k=5).take_all()
    def by_q(rows):
        out = {}
        for r in rows:
            out.setdefault(r["query_id"], set()).add(r["vec_id"])
        return out
    g, w = by_q(got), by_q(want)
    hits = sum(len(g.get(q, set()) & ids) for q, ids in w.items())
    total = sum(len(ids) for ids in w.values())
    assert hits / total >= 0.8, hits / total


def test_mkv_header_probe():
    """EBML element walk: round-trips synthesized Matroska/WebM headers
    (video dims, audio rate/channels, DocType, duration via
    TimestampScale), survives truncation/garbage, handles unknown-size
    and multi-byte vints."""
    from malli_ray.stages.multimodal import (MediaHeaderProbe,
                                             make_mkv_header, _ebml_vint,
                                             _ebml_elem)

    p = make_mkv_header(1280, 720, duration_units=5000)
    assert MediaHeaderProbe._mkv(p) == {
        "media_format": "mkv", "media_width": 1280, "media_height": 720,
        "media_duration_s": 5.0}
    p2 = make_mkv_header(640, 360, 12345, doc_type="webm",
                         sample_rate=48000, channels=2)
    f = MediaHeaderProbe._mkv(p2)
    assert f["media_format"] == "webm" and f["media_sample_rate"] == 48000
    assert f["media_channels"] == 2 and f["media_duration_s"] == 12.345
    # non-default TimestampScale rescales the duration
    p3 = make_mkv_header(2, 2, duration_units=500, timescale_ns=2_000_000)
    assert MediaHeaderProbe._mkv(p3)["media_duration_s"] == 1.0
    # garbage / wrong magic / truncation never raise
    assert MediaHeaderProbe._mkv(b"\x00\x01\x02") is None
    assert MediaHeaderProbe._mkv(b"RIFFxxxxWAVE") is None
    assert MediaHeaderProbe._mkv(p[:9])["media_format"] == "mkv"
    # unknown-size segment (all-ones vint) extends to end of payload
    seg_body = _ebml_elem(b"\x15\x49\xa9\x66",
                          _ebml_elem(b"\x44\x89",
                                     __import__("struct").pack(">d", 3000.0)))
    unknown = b"\x18\x53\x80\x67" + b"\xff" + seg_body
    empty_ebml = b"\x1aE\xdf\xa3" + _ebml_vint(0)    # zero-payload header
    got = MediaHeaderProbe._mkv(empty_ebml + unknown)
    assert got["media_duration_s"] == 3.0
    # vint boundary: a payload longer than 127 bytes forces a 2-byte size
    big = make_mkv_header(1, 1, 1, doc_type="matroska" * 20)
    assert MediaHeaderProbe._mkv(big)["media_width"] == 1


def test_mp4_header_probe():
    """ISO-BMFF box walk: round-trips the synthesized header, handles
    64-bit largesize, v1 mvhd, and rejects garbage."""
    import struct
    from malli_ray.stages.multimodal import MediaHeaderProbe, make_mp4_header

    p = make_mp4_header(640, 360, 90000, timescale=30000)
    f = MediaHeaderProbe._mp4(p)
    assert f == {"media_format": "mp4", "media_duration_s": 3.0,
                 "media_width": 640, "media_height": 360}
    # v1 mvhd (64-bit ctime/mtime/duration)
    mvhd_v1 = (b"\x01\x00\x00\x00" + b"\x00" * 16
               + struct.pack(">I", 1000) + struct.pack(">Q", 2500))
    box = lambda t, pl: struct.pack(">I", 8 + len(pl)) + t + pl
    p2 = (box(b"ftyp", b"isomxxxxisom")
          + box(b"moov", box(b"mvhd", mvhd_v1)))
    assert MediaHeaderProbe._mp4(p2)["media_duration_s"] == 2.5
    # largesize box header
    inner = box(b"mvhd", b"\x00\x00\x00\x00" + b"\x00" * 8
                + struct.pack(">II", 100, 450))
    large = (struct.pack(">I", 1) + b"moov" + struct.pack(">Q", 16 + len(inner))
             + inner)
    assert MediaHeaderProbe._mp4(box(b"ftyp", b"isomxxxxisom")
                                 + large)["media_duration_s"] == 4.5
    assert MediaHeaderProbe._mp4(b"RIFFxxxxWAVE") is None
    # truncated box must not loop or raise
    assert MediaHeaderProbe._mp4(box(b"ftyp", b"isomxxxxisom")
                                 + b"\x00\x00\xff\xffmoov") == \
        {"media_format": "mp4"}


def test_flac_header_probe():
    """FLAC STREAMINFO bit layout: round-trips the synthesized header over
    the field ranges, rejects corrupt/truncated/other-format payloads."""
    from malli_ray.stages.multimodal import MediaHeaderProbe, \
        make_flac_header

    for sr, ch, bits, n in [(44100, 2, 16, 441000), (8000, 1, 8, 0),
                            (192000, 8, 32, (1 << 36) - 1),
                            (22050, 3, 24, 12345)]:
        f = MediaHeaderProbe._flac(make_flac_header(sr, ch, bits, n))
        assert f == {"media_format": "flac", "media_sample_rate": sr,
                     "media_channels": ch, "media_bit_depth": bits,
                     "media_duration_s": n / sr}
    good = make_flac_header(44100, 2, 16, 1000)
    assert MediaHeaderProbe._flac(good[:20]) is None          # truncated
    assert MediaHeaderProbe._flac(b"OggS" + good[4:]) is None  # bad magic
    # first block not STREAMINFO (type 4 = VORBIS_COMMENT)
    bad = good[:4] + bytes([0x84]) + good[5:]
    assert MediaHeaderProbe._flac(bad) is None
    for sr, ch, bits, n in [(0, 2, 16, 1), (44100, 9, 16, 1),
                            (44100, 2, 33, 1), (44100, 2, 16, 1 << 36)]:
        with pytest.raises(ValueError):
            make_flac_header(sr, ch, bits, n)


def test_range_join(ray_session):
    """Interval join: numeric bounds, inclusivity flags, inner semantics,
    no-match groups drop, types preserved."""
    import ray.data as rd
    from malli_ray.stages.windows import range_join

    left = pa.table({"k": ["a", "a", "b", "c"],
                     "lid": [1, 2, 3, 4],
                     "t": [10, 20, 10, 99]})
    right = pa.table({"k": ["a", "a", "a", "b", "d"],
                      "rid": [100, 101, 102, 103, 104],
                      "rt": [8, 10, 15, 30, 10]})
    out = range_join(rd.from_arrow(left), rd.from_arrow(right), key="k",
                     left_ts="t", right_ts="rt", right_cols=["rid"],
                     lower=-5, upper=0, upper_inclusive=True,
                     left_schema=left.schema, right_schema=right.schema)
    rows = sorted((r["lid"], r["rid_right"]) for r in out.take_all())
    # lid 1 (t=10, window [5,10]): rids at rt 8,10 -> 100,101
    # lid 2 (t=20, window [15,20]): rt 15 -> 102
    # lid 3 (k=b t=10, window [5,10]): rt 30 no; lid 4: k=c no right rows
    assert rows == [(1, 100), (1, 101), (2, 102)]
    # exclusive upper drops the rt == t match
    out2 = range_join(rd.from_arrow(left), rd.from_arrow(right), key="k",
                      left_ts="t", right_ts="rt", right_cols=["rid"],
                      lower=-5, upper=0, upper_inclusive=False,
                      left_schema=left.schema, right_schema=right.schema)
    rows2 = sorted((r["lid"], r["rid_right"]) for r in out2.take_all())
    assert rows2 == [(1, 100), (2, 102)]
    # dtype check: ids stay int64 through the union/expansion
    assert all(isinstance(r["rid_right"], int) for r in out.take_all())


def test_filter_outliers_by_group(ray_session):
    """Tukey fences per group: outliers drop, in-fence rows keep, null
    values and unknown groups drop (inner semantics)."""
    import ray.data as rd
    from malli_ray.stages.sampling import (filter_outliers_by_group,
                                           group_iqr_bounds)

    vals = list(range(1, 13)) + [1000]          # 1000 is the outlier
    t = pa.table({"doc_id": list(range(14)),
                  "g": ["a"] * 13 + ["b"],      # group b: single row
                  "n": pa.array(vals + [None], type=pa.int64())})
    # group b has only a null value -> no bounds -> its rows drop
    out = filter_outliers_by_group(rd.from_arrow(t), "g", "n")
    kept = sorted(r["doc_id"] for r in out.take_all())
    assert 12 not in kept          # the 1000 outlier
    assert 13 not in kept          # null value in boundless group
    assert kept == list(range(12))
    b = group_iqr_bounds(rd.from_arrow(t), "g", "n")
    assert set(b) == {"a"}
    q1, q3 = np.quantile(np.array(vals, dtype=float), [0.25, 0.75])
    assert b["a"] == (q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1))


# --- rank / mode / covariance / set ops (round-3 continuation) -------------

def test_rank_per_group_edges(ray_session):
    """Ties, null peers, and groups smaller than the tile count."""
    import ray.data as rd
    from malli_ray.stages.analytics import rank_per_group

    t = pa.table({
        "g":  ["a"] * 5 + ["b"] * 2 + ["c"],
        "v":  [1, 1, None, None, 2,  5, 5,  9],
        "id": [1, 2, 3, 4, 5,  1, 2,  1]})
    out = (rank_per_group(rd.from_arrow(t), "g", ["v", "id"],
                          peer_by=["v"], tiles=3)
           .to_pandas().sort_values(["g", "id"]).reset_index(drop=True))
    # group a ordered by (v,id): nulls sort last in Arrow ascending
    a = out[out.g == "a"].sort_values("row_number")
    assert list(a.id) == [1, 2, 5, 3, 4]
    assert list(a.rnk) == [1, 1, 3, 4, 4]          # null peers tie
    assert list(a.dense_rank) == [1, 1, 2, 3, 3]
    assert list(a.tile3) == [1, 1, 2, 2, 3]        # 5 rows -> 2,2,1
    b = out[out.g == "b"].sort_values("row_number")
    assert list(b.rnk) == [1, 1] and list(b.row_number) == [1, 2]
    assert list(b.tile3) == [1, 2]                  # fewer rows than tiles
    c = out[out.g == "c"]
    assert list(c.rnk) == [1] and list(c.tile3) == [1]


def test_mode_by_group_tie_break(ray_session):
    import ray.data as rd
    from malli_ray.stages.analytics import mode_by_group

    t = pa.table({"g": ["x"] * 4 + ["y"] * 3,
                  "v": ["b", "a", "a", "b",  "q", "q", "p"]})
    out = (mode_by_group(rd.from_arrow(t), "g", "v")
           .to_pandas().sort_values("g").reset_index(drop=True))
    # x: a and b tie at 2 -> smallest value wins
    assert list(out.mode_value) == ["a", "q"]
    assert list(out.cnt) == [2, 2]


def test_covariance_by_group_exact(ray_session):
    import ray.data as rd
    from malli_ray.stages.analytics import covariance_by_group

    rng = np.random.default_rng(7)
    g = rng.choice(["p", "q"], size=400)
    x = rng.integers(-50, 50, size=400)
    y = rng.integers(-1000, 1000, size=400)
    ds = rd.from_arrow(pa.table({"g": g, "x": x, "y": y}))
    out = covariance_by_group(ds, "g", "x", "y").to_pandas()
    for _, row in out.iterrows():
        m = g == row.g
        n = int(m.sum())
        sx, sy = int(x[m].sum()), int(y[m].sum())
        sxy = int((x[m].astype(object) * y[m].astype(object)).sum())
        assert row.n == n and row.sum_x == sx and row.sum_y == sy
        assert row.sum_xy == sxy
        want = (sxy / n) - (sx / n) * (sy / n)
        assert row.cov_pop == want  # bit-exact, same IEEE sequence


def test_regression_by_group_exact(ray_session):
    import ray.data as rd
    from malli_ray.stages.analytics import regression_by_group

    rng = np.random.default_rng(11)
    g = rng.choice(["p", "q", "r"], size=500)
    x = rng.integers(-50, 50, size=500)
    noise = rng.integers(-100, 100, size=500)
    y = 3 * x + 17 + noise  # near-linear so r2 is high but < 1
    ds = rd.from_arrow(pa.table({"g": g, "x": x, "y": y}))
    out = regression_by_group(ds, "g", "x", "y").to_pandas()
    assert len(out) == 3
    for _, row in out.iterrows():
        m = g == row.g
        n = int(m.sum())
        sx, sy = int(x[m].sum()), int(y[m].sum())
        sxy = int((x[m].astype(object) * y[m].astype(object)).sum())
        sxx = int((x[m].astype(object) ** 2).sum())
        syy = int((y[m].astype(object) ** 2).sum())
        num = n * sxy - sx * sy
        den_x = n * sxx - sx * sx
        den_y = n * syy - sy * sy
        slope = float(num) / float(den_x)
        assert row.n == n
        assert row.slope == slope  # bit-exact, same IEEE sequence
        assert row.intercept == (float(sy) - slope * float(sx)) / float(n)
        assert row.r2 == (float(num) / float(den_x)) * (
            float(num) / float(den_y))
        # sanity: recovers the planted line
        assert abs(row.slope - 3.0) < 0.2 and row.r2 > 0.6
    # zero-variance x -> NULL slope/intercept/r2
    flat = rd.from_arrow(pa.table({"g": ["z"] * 5, "x": [4] * 5,
                                   "y": [1, 2, 3, 4, 5]}))
    row = regression_by_group(flat, "g", "x", "y").to_pandas().iloc[0]
    assert row.slope is None or np.isnan(row.slope)
    assert row.r2 is None or np.isnan(row.r2)


def test_set_op_keys(ray_session):
    import ray.data as rd
    from malli_ray.stages.joins import except_keys, intersect_keys

    a = rd.from_arrow(pa.table({"k": [1, 2, 2, 3, 4, 4]}))
    b = rd.from_arrow(pa.table({"j": [3, 4, 5, 5]}))
    ex = sorted(except_keys(a, b, "k", "j").to_pandas().k)
    assert ex == [1, 2]
    inter = sorted(intersect_keys(a, b, "k", "j").to_pandas().k)
    assert inter == [3, 4]
    # disjoint -> empty intersect, full except
    c = rd.from_arrow(pa.table({"j": [9]}))
    assert intersect_keys(a, c, "k", "j").count() == 0
    assert sorted(except_keys(a, c, "k", "j").to_pandas().k) == [1, 2, 3, 4]


def test_zorder_sort_locality(ray_session):
    import ray.data as rd
    from malli_ray.stages.sampling import zorder_codes, zorder_sort

    rng = np.random.default_rng(4)
    n = 20_000
    t = pa.table({"x": rng.normal(size=n), "y": rng.normal(size=n)})
    ds = rd.from_arrow(t).repartition(10)
    out = zorder_sort(ds, ["x", "y"], bits=8)

    def spans(d, col):
        s = []
        for b in d.iter_batches(batch_size=1000, batch_format="pandas"):
            if len(b) > 1:
                s.append(b[col].max() - b[col].min())
        return float(np.mean(s))

    # after z-ordering, BOTH columns are locally clustered: per-1000-row
    # spans shrink far below the random-order spans
    for col in ("x", "y"):
        assert spans(out, col) < 0.55 * spans(ds, col)
    # the code is the documented pure function of (value, thresholds)
    th = {"a": np.array([0.0, 1.0]), "b": np.array([0.5])}
    z = zorder_codes({"a": np.array([1.5, -1.0]),
                      "b": np.array([0.5, 0.4])}, th, bits=2)
    #   row0: cell_a=2 (>both), cell_b=1 (0.5<=0.5) -> bits a:10 b:01
    #   interleave a->even, b->odd: (0<<0)|(1<<2) | (1<<1)|(0<<3) = 6
    assert z.tolist() == [6, 0]


def test_list_value_counts_paths(ray_session):
    import pytest as _pytest
    import ray.data as rd
    from malli_ray.stages.analytics import list_value_counts

    lists = [[1, 2, 2, 7], [], None, [7, 7, 0]]
    ds = rd.from_arrow(pa.table({"v": pa.array(lists,
                                               type=pa.list_(pa.int32()))}))
    want = {0: 1, 1: 1, 2: 2, 7: 3}
    grp = list_value_counts(ds, "v").to_pandas()
    assert dict(zip(grp.value.astype(int), grp.cnt)) == want
    fast = list_value_counts(ds, "v", bounded_range=(0, 8)).to_pandas()
    assert dict(zip(fast.value.astype(int), fast.cnt)) == want
    # out-of-range raises rather than silently truncating
    bad = rd.from_arrow(pa.table({"v": pa.array([[9]],
                                                type=pa.list_(pa.int32()))}))
    with _pytest.raises(Exception):
        list_value_counts(bad, "v", bounded_range=(0, 8)).to_pandas()


def test_discretize_global_paths(ray_session):
    import ray.data as rd
    from malli_ray.stages.sampling import (discretize_global,
                                           global_quantile_thresholds)

    rng = np.random.default_rng(8)
    vals = rng.normal(100.0, 20.0, size=20_000)
    ds = rd.from_arrow(pa.table({"id": np.arange(len(vals)),
                                 "v": vals})).repartition(8)
    out = discretize_global(ds, "v", n_bins=10).to_pandas()
    counts = out.v_bin.value_counts()
    assert sorted(counts.index) == list(range(1, 11))
    # equal-frequency: every decile within 1 of n/10 (exact quantiles)
    assert counts.max() - counts.min() <= 2
    # t-digest path: thresholds within ~1% rank error of exact
    exact = global_quantile_thresholds(ds, "v", 10, method="exact")
    approx = global_quantile_thresholds(ds, "v", 10, method="tdigest")
    ranks = np.searchsorted(np.sort(vals), approx) / len(vals)
    assert np.abs(ranks - np.arange(0.1, 1.0, 0.1)).max() < 0.02
    assert np.abs((approx - exact) / exact).max() < 0.05
    # the exact path is fail-loud-bounded: above max_exact_rows it must
    # raise (pointing at tdigest) instead of shipping every value to one
    # worker for the whole-column sort
    with pytest.raises(ValueError, match="tdigest"):
        global_quantile_thresholds(ds, "v", 10, method="exact",
                                   max_exact_rows=1_000)
    # max_exact_rows=0 skips the guard pass entirely
    th0 = global_quantile_thresholds(ds, "v", 10, method="exact",
                                     max_exact_rows=0)
    assert np.allclose(th0, exact)


def test_zorder_exact_guard(ray_session):
    import ray.data as rd
    from malli_ray.stages.sampling import zorder_sort

    ds = rd.from_arrow(pa.table({"x": np.arange(100.0),
                                 "y": np.arange(100.0)[::-1].copy()}))
    # small input passes; the guard path itself is pinned via the
    # underlying global_quantile_thresholds raise above (zorder hoists
    # ONE count for all columns and forwards max_exact_rows=0)
    out = zorder_sort(ds, ["x", "y"], bits=2).to_pandas()
    assert len(out) == 100 and "zvalue" in out.columns


def test_fuzzy_join_ed1_exact(ray_session):
    import itertools

    import ray.data as rd
    from malli_ray.stages.dedup import fuzzy_join_ed1, levenshtein

    rng = np.random.default_rng(2)
    alphabet = list("abc")
    vals = ["".join(rng.choice(alphabet, size=rng.integers(0, 5)))
            for _ in range(60)]
    ds = rd.from_arrow(pa.table({"id": np.arange(60), "s": vals}))
    got = fuzzy_join_ed1(ds, "s", "id").to_pandas()
    got_pairs = {(int(a), int(b)): int(d)
                 for a, b, d in zip(got.id_a, got.id_b, got.dist)}
    want = {}
    for i, j in itertools.combinations(range(60), 2):
        d = levenshtein(vals[i], vals[j])
        if d <= 1:
            want[(i, j)] = d
    assert got_pairs == want  # deletion-neighborhood banding is exact at 1

    # the linear ed1_check agrees with the DP levenshtein on the <=1 band
    from malli_ray.stages.dedup import ed1_check
    for _ in range(500):
        x = "".join(rng.choice(alphabet, size=rng.integers(0, 6)))
        y = "".join(rng.choice(alphabet, size=rng.integers(0, 6)))
        d = levenshtein(x, y)
        assert ed1_check(x, y) == (d if d <= 1 else None), (x, y)


def test_pca_partition_invariant(ray_session):
    import ray.data as rd
    from malli_ray.stages.similarity import pca_fit, pca_project

    rng = np.random.default_rng(5)
    mat = rng.normal(size=(300, 8)).astype(np.float32)
    t = pa.table({"id": np.arange(300),
                  "embedding": pa.array(mat.tolist(),
                                        type=pa.list_(pa.float32()))})
    one = rd.from_arrow(t)
    many = one.repartition(7)
    m1 = pca_fit(one, "embedding", k=3)
    m2 = pca_fit(many, "embedding", k=3)
    assert np.array_equal(m1["comps_q"], m2["comps_q"])  # bit-identical
    assert m1["mean_q"].tolist() == m2["mean_q"].tolist()
    p1 = pca_project(one, m1, "embedding", "id").to_pandas() \
        .sort_values("id").reset_index(drop=True)
    p2 = pca_project(many, m2, "embedding", "id").to_pandas() \
        .sort_values("id").reset_index(drop=True)
    assert p1.equals(p2)
    # eigenvalues descend
    ev = m1["eigvals"]
    assert all(ev[i] >= ev[i + 1] for i in range(len(ev) - 1))


def test_estimate_join_size(ray_session):
    import ray.data as rd
    from malli_ray.stages.joins import estimate_join_size

    rng = np.random.default_rng(6)
    # zipf-ish keys so the join has hot-key blowup the estimator must see
    lk = rng.zipf(1.5, size=5000) % 100
    rk = rng.zipf(1.5, size=3000) % 100
    left = rd.from_arrow(pa.table({"k": lk.astype(np.int64)}))
    right = rd.from_arrow(pa.table({"j": rk.astype(np.int64)}))
    est = estimate_join_size(left, right, "k", "j")
    import collections
    ca, cb = collections.Counter(lk.tolist()), collections.Counter(rk.tolist())
    true = sum(ca[k] * cb.get(k, 0) for k in ca)
    assert est >= true                       # never under-estimates
    assert est <= true + (3.0 / 8192) * len(lk) * len(rk)  # eps bound
    # disjoint keys -> (near-)zero estimate
    dis = rd.from_arrow(pa.table({"j": np.arange(10_000, 10_050)}))
    assert estimate_join_size(left, dis, "k", "j") <= \
        (3.0 / 8192) * len(lk) * 50


def test_snapshot_diff(ray_session):
    import pytest as _pytest
    import ray.data as rd
    from malli_ray.stages.joins import snapshot_diff

    old = rd.from_arrow(pa.table({
        "k": [1, 2, 3, 4], "v": [1.0, 2.0, 3.0, 4.0],
        "s": ["a", "b", "c", "d"]}))
    new = rd.from_arrow(pa.table({
        "k": [2, 3, 4, 5], "v": [2.0, 3.5, 4.0, 5.0],
        "s": ["b", "c", "D", "e"]}))
    out = snapshot_diff(old, new, "k", ["v", "s"]).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert list(zip(out.k, out.status)) == [
        (1, "removed"), (3, "changed"), (4, "changed"), (5, "added")]
    # duplicate keys in a snapshot violate the CDC contract -> raise
    dup = rd.from_arrow(pa.table({"k": [1, 1], "v": [1.0, 1.0],
                                  "s": ["a", "a"]}))
    with _pytest.raises(Exception):
        snapshot_diff(dup, new, "k", ["v", "s"]).to_pandas()


def test_impute_by_group(ray_session):
    import ray.data as rd
    from malli_ray.stages.sampling import impute_by_group

    t = pa.table({"g": ["a", "a", "a", "b", "b", "c"],
                  "v": [10.0, None, 20.0, 7.0, None, None]})
    ds = rd.from_arrow(t)
    med = impute_by_group(ds, "g", "v", strategy="median").to_pandas() \
        .sort_values(["g", "v"], na_position="last").reset_index(drop=True)
    assert list(med.v_imp[:3]) == [10.0, 20.0, 15.0]  # a-hole -> median 15
    assert list(med.v_imp[3:5]) == [7.0, 7.0]          # single value
    assert np.isnan(med.v_imp[5])                      # all-null group stays
    mean = impute_by_group(ds, "g", "v", strategy="mean").to_pandas()
    a_hole = mean[(mean.g == "a") & mean.v.isna()].v_imp.iloc[0]
    assert a_hole == float(30) / float(2)  # bit-exact int-sum division


def test_set_op_all_keys(ray_session):
    import ray.data as rd
    from malli_ray.stages.joins import except_all_keys, intersect_all_keys

    a = rd.from_arrow(pa.table({"k": [1, 2, 2, 2, 3, 4, 4]}))
    b = rd.from_arrow(pa.table({"j": [2, 3, 3, 5]}))
    # EXCEPT ALL: 1x1, 2x(3-1), 3x0, 4x2
    ex = sorted(except_all_keys(a, b, "k", "j").to_pandas().k)
    assert ex == [1, 2, 2, 4, 4]
    # INTERSECT ALL: 2xmin(3,1), 3xmin(1,2)
    inter = sorted(intersect_all_keys(a, b, "k", "j").to_pandas().k)
    assert inter == [2, 3]
    # disjoint -> empty intersect, bag-identical except
    c = rd.from_arrow(pa.table({"j": [9]}))
    assert intersect_all_keys(a, c, "k", "j").count() == 0
    assert sorted(except_all_keys(a, c, "k", "j").to_pandas().k) == \
        [1, 2, 2, 2, 3, 4, 4]


def test_duplicate_spans_semantics(ray_session):
    """Exact substring dedup (Lee et al. 2021 at word-gram granularity):
    the globally FIRST occurrence of each k-gram (by (id, pos)) emits no
    span; later occurrences' windows merge into maximal spans; docs with
    fewer than k words emit no grams."""
    import ray.data as rd
    from malli_ray.stages import dedup

    t = pa.table({
        "doc_id": [0, 1, 2, 3, 4, 5],
        "text": pa.array([
            "a b c d e",               # all grams first -> no spans
            "x a b c d e y",           # dup windows [1,4)+[2,5)+[3,6) -> [1,6)
            "a b c",                   # whole doc duplicated -> [0,3)
            "short one",               # < k words -> no grams
            None,                      # null text -> no grams
            "  spaced   out   doc  ",  # < k words, whitespace only
        ], type=pa.string())})
    ds = rd.from_arrow(t)
    spans = {(r["doc_id"], r["span_start"], r["span_end"])
             for r in dedup.duplicate_spans(ds, "text", "doc_id",
                                            k=3).take_all()}
    assert spans == {(1, 1, 6), (2, 0, 3)}

    out = {r["doc_id"]: r for r in
           dedup.remove_duplicate_spans(ds, "text", "doc_id",
                                        k=3).take_all()}
    assert len(out) == 6
    assert out[0]["text_dedup"] == "a b c d e"
    assert out[0]["n_words_dropped"] == 0
    assert out[1]["text_dedup"] == "x y"
    assert out[1]["n_words_dropped"] == 5
    assert out[2]["text_dedup"] == "" and out[2]["n_words_dropped"] == 3
    assert out[3]["text_dedup"] == "short one"
    assert out[4]["text_dedup"] == "" and out[4]["n_words_dropped"] == 0
    # whitespace-normalized rebuild is part of the contract
    assert out[5]["text_dedup"] == "spaced out doc"
    assert out[5]["n_words_dropped"] == 0


def test_duplicate_spans_zero_dup_corpus(ray_session):
    """A corpus with no duplicated k-grams: empty span set, identity
    (whitespace-normalized) pass-through with 0 drops."""
    import ray.data as rd
    from malli_ray.stages import dedup

    t = pa.table({"doc_id": [10, 11],
                  "text": ["w1 w2 w3 w4", "v1 v2 v3 v4"]})
    ds = rd.from_arrow(t)
    assert dedup.duplicate_spans(ds, "text", "doc_id", k=3).count() == 0
    out = {r["doc_id"]: r for r in
           dedup.remove_duplicate_spans(ds, "text", "doc_id",
                                        k=3).take_all()}
    assert out[10]["text_dedup"] == "w1 w2 w3 w4"
    assert all(r["n_words_dropped"] == 0 for r in out.values())


def test_connected_components_semantics(ray_session):
    """Hash-min label propagation: chains, cliques, self-loops, duplicate
    edges, string ids — component label is the minimum node id."""
    import ray.data as rd
    from malli_ray.stages.graph import connected_components

    edges = pa.table({"a": [1, 2, 3, 10, 20, 4, 1],
                      "b": [2, 3, 4, 11, 20, 1, 2]})
    out = {r["node"]: r["component"] for r in
           connected_components(rd.from_arrow(edges), "a", "b",
                                num_buckets=8).take_all()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}

    e2 = pa.table({"s": ["x", "y", "m"], "d": ["y", "z", "n"]})
    out2 = {r["node"]: r["component"] for r in
            connected_components(rd.from_arrow(e2), "s", "d",
                                 num_buckets=8).take_all()}
    assert out2 == {"x": "x", "y": "x", "z": "x", "m": "m", "n": "m"}

    empty = pa.table({"a": pa.array([], type=pa.int64()),
                      "b": pa.array([], type=pa.int64())})
    assert connected_components(rd.from_arrow(empty), "a", "b").count() == 0


def test_first_last_per_key(ray_session):
    """FIRST_VALUE/LAST_VALUE over the full frame: run boundaries, nulls
    in the value column move verbatim, single-row keys."""
    import ray.data as rd
    from malli_ray.stages.analytics import first_last_per_key

    t = pa.table({"k": [1, 1, 1, 2, 2, 3],
                  "o": [3, 1, 2, 2, 1, 5],
                  "v": pa.array([30.0, None, 20.0, 9.0, 8.0, 7.0])})
    out = first_last_per_key(rd.from_arrow(t), "k", "o", "v").take_all()
    got = {(r["k"], r["o"]): (r["v_first"], r["v_last"]) for r in out}
    assert got[(1, 1)] == (None, 30.0)   # ordered by o: None,20,30
    assert got[(1, 2)] == (None, 30.0)
    assert got[(1, 3)] == (None, 30.0)
    assert got[(2, 1)] == (8.0, 9.0)
    assert got[(3, 5)] == (7.0, 7.0)


def test_sample_k_per_group(ray_session):
    """Per-group exact-k hash sample equals the brute-force smallest-hash
    selection, independent of block layout."""
    import ray.data as rd
    from malli_ray.stages.sampling import sample_k_per_group, KNUTH_MULT

    ids = list(range(200))
    groups = [f"g{i % 3}" for i in ids]
    t = pa.table({"id": ids, "grp": groups})
    out = sample_k_per_group(rd.from_arrow(t).repartition(7),
                             "grp", "id", k=5, seed=3).take_all()
    got = {}
    for r in out:
        got.setdefault(r["grp"], []).append(r["id"])

    def h(i):
        return ((i + 3) % 2**32) * KNUTH_MULT % 2**32

    for g in ("g0", "g1", "g2"):
        members = [i for i in ids if f"g{i % 3}" == g]
        want = sorted(members, key=lambda i: (h(i), i))[:5]
        assert sorted(got[g]) == sorted(want)


def test_bpe_incremental_equals_naive_trainer():
    """The engine's incremental merge loop (O(affected words) per merge)
    must be bit-equal to the naive full-recount Sennrich trainer
    (tools/make_golden.bpe_merges_ref) — same spec, different algorithm."""
    import importlib.util
    import os
    import random

    from malli_ray.stages.bpe import WORD_RE, train_merges

    spec = importlib.util.spec_from_file_location(
        "mg", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools", "make_golden.py"))
    mg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mg)

    rng = random.Random(42)
    alphabet = "abcde"
    for trial in range(20):
        texts = [" ".join("".join(rng.choice(alphabet)
                                  for _ in range(rng.randint(1, 8)))
                          for _ in range(rng.randint(0, 30)))
                 for _ in range(rng.randint(1, 40))]
        from collections import Counter
        wc = Counter()
        for t in texts:
            wc.update(WORD_RE.findall(t))
        ranked = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))
        n = rng.randint(1, 60)
        assert train_merges(ranked, n) == mg.bpe_merges_ref(texts, n), \
            f"trial {trial} diverged"


def test_bpe_encode_classic():
    """'low lower lowest newest widest' textbook example: the learned
    merges segment a training word into one token and an unseen word into
    learned subwords."""
    from collections import Counter

    from malli_ray.stages.bpe import WORD_RE, encode_word, train_merges

    corpus = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    wc = sorted(Counter(corpus).items(), key=lambda kv: (-kv[1], kv[0]))
    merges = train_merges(wc, 30)
    ranks = {(m[1], m[2]): m[0] for m in merges}
    assert encode_word("low", ranks) == ["low</w>"]
    assert encode_word("newest", ranks) == ["newest</w>"]
    # unseen word decomposes into learned pieces, never crashes
    toks = encode_word("lowest", ranks)
    assert "".join(toks) == "lowest</w>" and len(toks) >= 2
    assert WORD_RE.findall("a  b\tc") == ["a", "b", "c"]


def test_bpe_train_distributed_matches_local(ray_session):
    """bpe_train over a Ray Dataset == local trainer over the same texts."""
    import ray.data as rd
    from collections import Counter

    from malli_ray.stages.bpe import (WORD_RE, bpe_tokenize, bpe_train,
                                      train_merges)

    texts = [f"pack my box with {w} dozen liquor jugs {w}{w}"
             for w in ["ab", "abc", "bc", "cab"] * 6]
    ds = rd.from_arrow(pa.table({"doc_id": list(range(len(texts))),
                                 "text": texts}))
    got = bpe_train(ds, "text", num_merges=40)
    wc = Counter()
    for t in texts:
        wc.update(WORD_RE.findall(t))
    ranked = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))
    want = train_merges(ranked, 40)
    assert [tuple(r.values()) for r in got.to_pylist()] == want

    enc = bpe_tokenize(ds, got, "text", "doc_id").take_all()
    assert len(enc) == len(texts)
    for row in enc:
        rebuilt = row["bpe_text"].replace(" ", "").replace("</w>", " ")
        assert rebuilt.strip() == texts[row["doc_id"]]
        assert row["n_bpe"] == len(row["bpe_text"].split(" "))


def test_gopher_rules_edges(ray_session):
    """Rule-by-rule edge semantics on hand-built docs."""
    import ray.data as rd

    from malli_ray.stages.text import gopher_rules

    good = "the quick brown fox jumps over " * 10           # 60 words, stopword
    docs = [
        (0, good),                                          # passes
        (1, "the fox"),                                     # too few words
        (2, "# " * 60 + "the end"),                         # symbol soup
        (3, "\n".join("- item " + str(i) for i in range(10))),  # all bullets
        (4, ("the story goes on...\n" * 8) + "done\ndone"),     # ellipsis lines
        (5, ("123 456 789 " * 20) + "the end"),             # non-alpha words
        (6, "supercalifragilisticexpialidocious " * 60),    # mean word len > 10
        (7, ""),                                            # empty
    ]
    ds = rd.from_arrow(pa.table({"doc_id": [d[0] for d in docs],
                                 "text": [d[1] for d in docs]}))
    out = {r["doc_id"]: r for r in
           gopher_rules(ds, "text", "doc_id", min_words=10,
                        min_stop_hits=1).take_all()}
    assert out[0]["pass_gopher"] is True
    assert out[1]["pass_gopher"] is False and out[1]["n_words"] == 2
    assert out[2]["pass_gopher"] is False and out[2]["symbol_ratio"] > 0.1
    assert out[3]["pass_gopher"] is False and out[3]["bullet_ratio"] == 1.0
    assert out[4]["pass_gopher"] is False and out[4]["ellipsis_ratio"] > 0.3
    assert out[5]["pass_gopher"] is False and out[5]["alpha_ratio"] < 0.8
    assert out[6]["pass_gopher"] is False and out[6]["mean_word_len"] > 10
    assert out[7]["pass_gopher"] is False and out[7]["n_words"] == 0
    assert out[7]["mean_word_len"] == 0.0 and out[7]["bullet_ratio"] == 0.0
    # stop_hits counts DISTINCT stopwords present, not occurrences
    assert out[0]["stop_hits"] == 1


def test_c4_rules_edges(ray_session):
    """C4 rule-by-rule edge semantics on hand-built docs."""
    import ray.data as rd

    from malli_ray.stages.text import c4_rules

    five_sent = "\n".join(f"this is sentence number {i}." for i in range(5))
    docs = [
        (0, five_sent),                                   # passes
        (1, five_sent + "\nplease see lorem Ipsum text."),  # lorem page drop
        (2, five_sent + "\nvar x = { a: 1 };"),           # brace page drop
        (3, five_sent.replace(".", "")),                  # no terminal punct
        (4, "ok.\nfine.\nyes."),                          # lines < 3 words
        (5, five_sent + "\nenable JavaScript to continue."),  # js line drop
        (6, "one good sentence here.\nanother one here too."),  # < 5 sentences
        (7, five_sent + "\nthe crude word appears here."),  # blocklist
        (8, ""),                                          # empty
        (9, 'he said "stop there!"\n' + five_sent),       # end-quote terminal
    ]
    ds = rd.from_arrow(pa.table({"doc_id": [d[0] for d in docs],
                                 "text": [d[1] for d in docs]}))
    out = {r["doc_id"]: r for r in
           c4_rules(ds, "text", "doc_id",
                    blocklist=("crude",)).take_all()}
    assert out[0]["pass_c4"] is True and out[0]["n_kept_lines"] == 5
    assert out[1]["pass_c4"] is False and out[1]["has_lorem_ipsum"] is True
    assert out[2]["pass_c4"] is False and out[2]["has_brace"] is True
    assert out[3]["n_kept_lines"] == 0 and out[3]["text_clean"] == ""
    assert out[4]["n_kept_lines"] == 0          # terminal punct but 1 word
    # the javascript LINE is dropped, the page itself still passes
    assert out[5]["pass_c4"] is True and out[5]["n_kept_lines"] == 5
    assert "JavaScript" not in out[5]["text_clean"]
    assert out[6]["pass_c4"] is False and out[6]["n_sentences"] == 2
    assert out[7]["pass_c4"] is False and out[7]["has_bad_word"] is True
    assert out[8]["pass_c4"] is False and out[8]["n_lines"] == 1
    assert out[9]["pass_c4"] is True and out[9]["n_kept_lines"] == 6
    # sentence count: the quoted line ends at '!' (the trailing quote
    # merges into the NEXT sentence's leading run); five_sent adds 5
    assert out[9]["n_sentences"] == 6


def test_dedup_lines_within_doc(ray_session):
    """Keep-first order, counts, paragraph granularity, empty docs."""
    import ray.data as rd

    from malli_ray.stages.text import dedup_lines_within_doc

    docs = [(0, "a b.\nc d.\na b.\ne f.\nc d."),   # 2 dups dropped
            (1, "x.\nx.\nx."),                     # collapses to one
            (2, ""),                               # empty stays empty
            (3, "solo line"),                      # untouched
            (4, None)]                             # null -> ""
    ds = rd.from_arrow(pa.table({
        "doc_id": [d[0] for d in docs],
        "text": pa.array([d[1] for d in docs], pa.string())}))
    out = {r["doc_id"]: r for r in
           dedup_lines_within_doc(ds, "text").take_all()}
    assert out[0]["text"] == "a b.\nc d.\ne f."
    assert out[0]["n_dup_lines_dropped"] == 2
    assert out[1]["text"] == "x." and out[1]["n_dup_lines_dropped"] == 2
    assert out[2]["text"] == "" and out[2]["n_dup_lines_dropped"] == 0
    assert out[3]["text"] == "solo line"
    assert out[4]["text"] == ""
    # paragraph granularity via sep
    ds2 = rd.from_arrow(pa.table({"doc_id": [0],
                                  "text": ["p one\np one\n\np one\np one"]}))
    r2 = dedup_lines_within_doc(ds2, "text", sep="\n\n").take_all()[0]
    assert r2["text"] == "p one\np one" and r2["n_dup_lines_dropped"] == 1


def test_domain_filter_semantics(ray_session):
    """Host normalization, suffix vs substring, drop mode, multi-entry."""
    import ray.data as rd

    from malli_ray.stages.text import domain_filter

    docs = [(0, "see https://ads.bad.example/p and http://ok.net/q"),
            (1, "https://WWW.Bad.Example/root"),       # case + www strip
            (2, "https://notbad.example/x"),           # NOT a dot-suffix
            (3, "no urls at all"),
            (4, "http://evil.org:8080/y https://sub.evil.org/z"),
            (5, None)]
    ds = rd.from_arrow(pa.table({
        "doc_id": [d[0] for d in docs],
        "text": pa.array([d[1] for d in docs], pa.string())}))
    bl = ("bad.example", "evil.org")
    out = {r["doc_id"]: r for r in
           domain_filter(ds, "text", "doc_id", blocklist=bl).take_all()}
    assert out[0]["blocked"] is True and out[0]["n_blocked_urls"] == 1
    assert out[0]["n_urls"] == 2
    assert out[1]["blocked"] is True          # lower + www. strip -> exact
    assert out[2]["blocked"] is False         # substring is not a suffix
    assert out[3]["n_urls"] == 0 and out[3]["blocked"] is False
    assert out[4]["n_blocked_urls"] == 2      # port stripped; subdomain hits
    assert out[5]["blocked"] is False
    kept = sorted(r["doc_id"] for r in
                  domain_filter(ds, "text", "doc_id", blocklist=bl,
                                mode="drop").take_all())
    assert kept == [2, 3, 5]
    with pytest.raises(ValueError, match="unknown mode"):
        domain_filter(ds, "text", "doc_id", blocklist=bl, mode="nope")


def test_bm25_topk_semantics(ray_session):
    """Rarer terms outrank common ones; tf saturates; ties break by id."""
    import ray.data as rd

    from malli_ray.stages.text import bm25_topk

    docs = [(0, "apple banana banana banana"),   # tf-saturated banana
            (1, "apple banana"),
            (2, "apple cherry"),                 # cherry is rare
            (3, "apple apple apple apple"),
            (4, "durian")]
    ds = rd.from_arrow(pa.table({"doc_id": [d[0] for d in docs],
                                 "text": [d[1] for d in docs]}))
    out = bm25_topk(ds, "text", "doc_id",
                    {0: "cherry", 1: "banana", 2: "apple"},
                    k=3).take_all()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r["rank"])
    # cherry: only doc 2 scores > 0; zero-score ties break by doc_id asc
    assert by_q[0][0]["doc_id"] == 2 and by_q[0][0]["score"] > 0
    assert [r["doc_id"] for r in by_q[0][1:]] == [0, 1]
    assert by_q[0][1]["score"] == 0.0
    # banana: doc 0 (tf=3) beats doc 1 (tf=1), but saturated — not 3x
    assert [r["doc_id"] for r in by_q[1][:2]] == [0, 1]
    assert by_q[1][0]["score"] < 3 * by_q[1][1]["score"]
    # apple appears in 4/5 docs -> low idf; rare-term query scores higher
    assert by_q[0][0]["score"] > by_q[2][0]["score"]
    assert all(len(rows) == 3 for rows in by_q.values())


def test_corr_by_group_exact(ray_session):
    """corr=True: Pearson r vs numpy; zero-variance groups yield NULL."""
    import ray.data as rd

    from malli_ray.stages.analytics import covariance_by_group

    rng = np.random.default_rng(3)
    x = rng.integers(0, 100, 500)
    y = 3 * x + rng.integers(0, 50, 500)          # strongly correlated
    tbl = pa.table({"g": ["a"] * 500 + ["flat"] * 4,
                    "x": np.concatenate([x, [7, 7, 7, 7]]),
                    "y": np.concatenate([y, [1, 2, 3, 4]])})
    out = {r["g"]: r for r in covariance_by_group(
        rd.from_arrow(tbl), "g", "x", "y", corr=True).take_all()}
    want = np.corrcoef(x, y)[0, 1]
    assert abs(out["a"]["corr_pop"] - want) < 1e-12
    assert out["flat"]["corr_pop"] is None        # var(x) == 0
    assert out["a"]["sum_xx"] == int((x.astype(object) ** 2).sum())


def test_debounce_semantics(ray_session):
    """Run boundaries, equal timestamps, window edge, repartition-safe."""
    import ray.data as rd

    from malli_ray.stages.windows import debounce

    def ts(s):
        return np.datetime64("2026-01-01T00:00:00", "us") \
            + np.timedelta64(s, "s")

    rows = [
        (1, ts(0),    "u1", "click"),    # keep (first)
        (2, ts(5),    "u1", "click"),    # drop (within 10)
        (3, ts(5),    "u1", "view"),     # keep (other type)
        (4, ts(16),   "u1", "click"),    # keep (11s after #2: lag-based)
        (5, ts(16),   "u1", "click"),    # drop (equal ts)
        (6, ts(26),   "u1", "click"),    # drop (exactly 10s after #5)
        (7, ts(37),   "u1", "click"),    # keep (11s after #6)
        (8, ts(0),    "u2", "click"),    # keep (other user)
    ]
    tbl = pa.table({"event_id": [r[0] for r in rows],
                    "ts": pa.array([r[1] for r in rows],
                                   pa.timestamp("us")),
                    "user_id": [r[2] for r in rows],
                    "event_type": [r[3] for r in rows]})
    kept = sorted(r["event_id"] for r in debounce(
        rd.from_arrow(tbl), ["user_id", "event_type"], "ts", 10,
        tie_col="event_id").take_all())
    assert kept == [1, 3, 4, 7, 8]
    kept2 = sorted(r["event_id"] for r in debounce(
        rd.from_arrow(tbl).repartition(5),
        ["user_id", "event_type"], "ts", 10,
        tie_col="event_id").take_all())
    assert kept2 == kept


def test_funnel_semantics(ray_session):
    """Step order, earliest-match, window constraint, broken chains."""
    import ray.data as rd

    from malli_ray.stages.windows import funnel

    def ts(s):
        return np.datetime64("2026-01-01T00:00:00", "us") \
            + np.timedelta64(s, "s")

    rows = [
        # u1 converts: A@0 -> B@10 -> C@20
        (1, ts(0), "u1", "A"), (2, ts(10), "u1", "B"),
        (3, ts(20), "u1", "C"),
        # u2: B before A doesn't count; chain stops at A
        (4, ts(0), "u2", "B"), (5, ts(5), "u2", "A"),
        # u3: A then C (skips B) -> 1 step
        (6, ts(0), "u3", "A"), (7, ts(9), "u3", "C"),
        # u4: earliest-match pins A@0; B@100 outside the 60s window
        (8, ts(0), "u4", "A"), (9, ts(100), "u4", "B"),
        (10, ts(110), "u4", "C"),
        # u5: no funnel events at all
        (11, ts(0), "u5", "X"),
    ]
    tbl = pa.table({"event_id": [r[0] for r in rows],
                    "ts": pa.array([r[1] for r in rows],
                                   pa.timestamp("us")),
                    "user_id": [r[2] for r in rows],
                    "event_type": [r[3] for r in rows]})
    ds = rd.from_arrow(tbl)
    out = {r["user_id"]: r for r in funnel(
        ds, "user_id", "ts", "event_type", ["A", "B", "C"],
        within_s=60, tie_col="event_id").take_all()}
    assert out["u1"]["converted"] is True
    assert out["u1"]["steps_completed"] == 3
    assert out["u2"]["steps_completed"] == 1    # B@0 ignored (before A)
    assert out["u3"]["steps_completed"] == 1 and out["u3"]["step2_ts"] is None
    assert out["u4"]["steps_completed"] == 1    # window cut B@100
    assert out["u5"]["steps_completed"] == 0
    assert out["u5"]["step1_ts"] is None
    # without the window, u4 completes
    out2 = {r["user_id"]: r for r in funnel(
        ds, "user_id", "ts", "event_type", ["A", "B", "C"],
        tie_col="event_id").take_all()}
    assert out2["u4"]["converted"] is True


def test_retention_semantics(ray_session):
    """Cohorting by first event, distinct-per-period, day granularity."""
    import ray.data as rd

    from malli_ray.stages.windows import retention

    def d(day, hour=12):
        return (np.datetime64("2026-01-05", "us")           # a Monday
                + np.timedelta64(day, "D") + np.timedelta64(hour, "h"))

    rows = [
        # cohort week 0 (Jan 5): u1 active weeks 0,1,2; u2 weeks 0,2
        ("u1", d(0)), ("u1", d(1)), ("u1", d(8)), ("u1", d(15)),
        ("u2", d(3)), ("u2", d(16)),
        # cohort week 1 (Jan 12): u3 active weeks 0,1
        ("u3", d(7)), ("u3", d(14)),
        # Sunday-start edge: u4's first event Sun Jan 11 -> cohort week 0
        ("u4", d(6, 23)),
    ]
    ds = rd.from_arrow(pa.table({
        "user_id": [r[0] for r in rows],
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us"))}))
    out = {(str(r["cohort_week"])[:10], r["week_offset"]): r["n_users"]
           for r in retention(ds, "user_id", "ts").take_all()}
    assert out == {("2026-01-05", 0): 3,     # u1, u2, u4
                   ("2026-01-05", 1): 1,     # u1 (u2 skipped week 1)
                   ("2026-01-05", 2): 2,     # u1, u2
                   ("2026-01-12", 0): 1,     # u3
                   ("2026-01-12", 1): 1}
    # day granularity: u1 active on days 0,1,8,15
    day = {(str(r["cohort_day"])[:10], r["day_offset"]): r["n_users"]
           for r in retention(ds.filter(expr="user_id == 'u1'"),
                              "user_id", "ts", period="day").take_all()}
    assert day == {("2026-01-05", 0): 1, ("2026-01-05", 1): 1,
                   ("2026-01-05", 8): 1, ("2026-01-05", 15): 1}
    with pytest.raises(ValueError, match="period"):
        retention(ds, "user_id", "ts", period="month")


def test_pagerank_integer_exact(ray_session):
    """Bit-equality with an independent integer reference; duplicate
    edges collapse; dangling nodes rank; repartition-invariant."""
    from collections import defaultdict

    import ray.data as rd

    from malli_ray.stages.graph import PAGERANK_SCALE, pagerank

    rng = np.random.default_rng(11)
    edges = [(int(a), int(b)) for a, b in
             rng.integers(0, 40, size=(300, 2)) if a != b]
    edges += edges[:20]                       # duplicates must collapse
    ds = rd.from_arrow(pa.table({"s": [e[0] for e in edges],
                                 "d": [e[1] for e in edges]}))

    def reference(E, iters):
        E = sorted(set(E))
        nodes = sorted({x for e in E for x in e})
        N, S = len(nodes), PAGERANK_SCALE
        deg = defaultdict(int)
        for s_, _ in E:
            deg[s_] += 1
        r = {v: S // N for v in nodes}
        base = (3 * S) // (20 * N)
        for _ in range(iters):
            msg = defaultdict(int)
            for s_, d_ in E:
                msg[d_] += r[s_] // deg[s_]
            r = {v: base + (17 * msg[v]) // 20 for v in nodes}
        return r

    for iters in (1, 2, 7):
        got = {r["node"]: r["rank_q"] for r in pagerank(
            ds, "s", "d", iterations=iters,
            node_type=pa.int64()).take_all()}
        assert got == reference(edges, iters), iters
    # repartition + bucket-count invariance (integer sums associative)
    alt = {r["node"]: r["rank_q"] for r in pagerank(
        ds.repartition(7), "s", "d", iterations=7, num_buckets=5,
        num_partitions=3, node_type=pa.int64()).take_all()}
    assert alt == reference(edges, 7)
    # dangling node: edge into a sink; sink still ranks, mass leaks
    sink = rd.from_arrow(pa.table({"s": [1, 2], "d": [3, 3]}))
    out = {r["node"]: r for r in pagerank(
        sink, "s", "d", iterations=3, node_type=pa.int64()).take_all()}
    assert out[3]["rank_q"] > out[1]["rank_q"]
    assert sum(r["rank_q"] for r in out.values()) < PAGERANK_SCALE


def test_rollup_counts_null_key_grouping(ray_session):
    """Pins the pyarrow 16 bug rollup works around: Arrow hash group_by
    with >= 3 key columns and NULL keys re-creates the null-key group
    every 32 internal exec rows.  rollup_counts must combine correctly
    anyway (polars finisher)."""
    import ray.data as rd

    from malli_ray.stages.analytics import rollup_counts

    # upstream behavior pin — if this starts returning 3, the polars
    # workaround can be retired
    rows = [("A", "P", 2), ("B", "F", 2), ("C", None, 1)] * 13
    t = pa.table({"a": [r[0] for r in rows], "b": [r[1] for r in rows],
                  "l": pa.array([r[2] for r in rows], pa.int64())})
    arrow_groups = t.group_by(["a", "b", "l"], use_threads=False) \
        .aggregate([([], "count_all")]).num_rows
    assert arrow_groups in (3, 4)    # 4 = the buggy pyarrow 16 output

    ds = rd.from_arrow(pa.table({
        "p": ["x"] * 40 + ["y"] * 24,
        "s": (["u", "v"] * 20) + (["u"] * 24)})).repartition(9)
    out = rollup_counts(ds, ["p", "s"]).to_pandas()
    key = out.set_index(["p", "s", "__level"], drop=True)["n"]
    assert len(out) == len(set(map(tuple, out[["p", "s", "__level"]]
                                   .itertuples(index=False)))), "dup keys"
    assert key[("x", "u", 2)] == 20 and key[("x", "v", 2)] == 20
    assert key[("y", "u", 2)] == 24
    assert key[("x", None, 1)] == 40 and key[("y", None, 1)] == 24
    assert key[(None, None, 0)] == 64
    with pytest.raises(ValueError, match="non-empty"):
        rollup_counts(ds, [])
    # cube: all 2^k subsets with the GROUPING bitmask
    from malli_ray.stages.analytics import cube_counts
    cb = cube_counts(ds, ["p", "s"]).to_pandas()
    ck = cb.set_index(["p", "s", "__grouping"], drop=True)["n"]
    assert ck[("x", "u", 0)] == 20            # neither rolled
    assert ck[(None, "u", 2)] == 44           # p rolled (high bit)
    assert ck[("y", None, 1)] == 24           # s rolled (low bit)
    assert ck[(None, None, 3)] == 64
    assert len(cb) == 3 + 2 + 2 + 1           # (p,s) + p + s + ()
    with pytest.raises(ValueError, match="cap columns"):
        cube_counts(ds, [f"c{i}" for i in range(9)])


def test_transition_counts_semantics(ray_session):
    """Adjacent-only pairs, per-key isolation, deterministic ties."""
    import ray.data as rd

    from malli_ray.stages.analytics import transition_counts

    rows = [("u1", 1, "A"), ("u1", 2, "B"), ("u1", 3, "A"),
            ("u1", 4, "B"),
            ("u2", 1, "B"), ("u2", 2, "A"),
            ("u3", 1, "C")]                      # single event: no pair
    ds = rd.from_arrow(pa.table({
        "k": [r[0] for r in rows],
        "t": pa.array([r[1] for r in rows], pa.int64()),
        "s": [r[2] for r in rows]})).repartition(3)
    out = {(r["prev_state"], r["next_state"]): r["n"]
           for r in transition_counts(ds, "k", "t", "s").take_all()}
    assert out == {("A", "B"): 2, ("B", "A"): 2}


def test_standardize_by_group(ray_session):
    """z-score/min-max vs numpy; constant groups null; unknown method."""
    import ray.data as rd

    from malli_ray.stages.analytics import standardize_by_group

    rng = np.random.default_rng(7)
    x = rng.integers(0, 1000, 400)
    tbl = pa.table({"g": ["a"] * 400 + ["const"] * 3,
                    "v": np.concatenate([x, [5, 5, 5]])})
    ds = rd.from_arrow(tbl).repartition(5)
    out = standardize_by_group(
        standardize_by_group(ds, "g", "v", method="zscore"),
        "g", "v", method="minmax").to_pandas()
    a = out[out.g == "a"].sort_index()
    want_z = (x - x.mean()) / x.std()          # population std
    assert np.allclose(np.sort(a.v_zscore), np.sort(want_z), atol=1e-9)
    want_m = (x - x.min()) / (x.max() - x.min())
    assert np.allclose(np.sort(a.v_minmax), np.sort(want_m), atol=1e-12)
    const = out[out.g == "const"]
    assert const.v_zscore.isna().all() and const.v_minmax.isna().all()
    with pytest.raises(ValueError, match="unknown method"):
        standardize_by_group(ds, "g", "v", method="robust")


def test_event_ops_random_reference(ray_session):
    """funnel / debounce / retention vs brute-force Python references on
    random event streams (5 seeds) — the oracle gate checks one corpus;
    this sweeps shapes: sparse users, dense repeats, ties."""
    import ray.data as rd

    from malli_ray.stages.windows import debounce, funnel, retention

    for seed in range(5):
        rng = np.random.default_rng(seed)
        n = rng.integers(50, 400)
        users = rng.integers(0, 12, n)
        secs = rng.integers(0, 9 * 86_400, n)     # ~9 days of activity
        kinds = rng.choice(["A", "B", "C", "D"], n)
        base = np.datetime64("2026-01-05T00:00:00", "us")
        ts = base + secs.astype("timedelta64[s]")
        eid = np.arange(n, dtype=np.int64)
        tbl = pa.table({"event_id": eid,
                        "ts": pa.array(ts, pa.timestamp("us")),
                        "user_id": users, "event_type": kinds})
        ds = rd.from_arrow(tbl).repartition(int(rng.integers(1, 6)))
        rows = sorted(zip(users.tolist(), secs.tolist(), eid.tolist(),
                          kinds.tolist()))

        # --- debounce reference: LAG-based per (user, kind) ---
        keep = set()
        prev: dict = {}
        for u, s, i, k in sorted(zip(users.tolist(), secs.tolist(),
                                     eid.tolist(), kinds.tolist()),
                                 key=lambda r: (r[0], r[3], r[1], r[2])):
            p = prev.get((u, k))
            if p is None or s - p > 60:
                keep.add(i)
            prev[(u, k)] = s
        got = sorted(r["event_id"] for r in debounce(
            ds, ["user_id", "event_type"], "ts", 60,
            tie_col="event_id").take_all())
        assert got == sorted(keep), f"debounce seed {seed}"

        # --- funnel reference: earliest-match A->B->C within 600s ---
        want_steps = {}
        for u in set(users.tolist()):
            ev = [(s, i, k) for uu, s, i, k in rows if uu == u]
            t_prev, t0, done = None, None, 0
            for step in ("A", "B", "C"):
                nxt = None
                for s, i, k in ev:
                    if k != step:
                        continue
                    if t_prev is not None and s <= t_prev:
                        continue
                    if t0 is not None and s - t0 > 600:
                        continue
                    nxt = s
                    break
                if nxt is None:
                    break
                done += 1
                t_prev = nxt
                if t0 is None:
                    t0 = nxt
            want_steps[u] = done
        got_f = {r["user_id"]: r["steps_completed"] for r in funnel(
            ds, "user_id", "ts", "event_type", ["A", "B", "C"],
            within_s=600, tie_col="event_id").take_all()}
        assert got_f == want_steps, f"funnel seed {seed}"

        # --- retention reference: day cohorts ---
        day = secs // 86400
        first = {}
        for u, d in sorted(zip(users.tolist(), day.tolist())):
            first.setdefault(u, d)
        cells: dict = {}
        for u, d in set(zip(users.tolist(), day.tolist())):
            key = (first[u], d - first[u])
            cells[key] = cells.get(key, 0) + 1
        got_r = {(int(str(r["cohort_day"])[8:10]) - 5, r["day_offset"]):
                 r["n_users"] for r in retention(
                     ds, "user_id", "ts", period="day").take_all()}
        assert got_r == cells, f"retention seed {seed}"


def test_encode_batch_row_parity(ray_session, tmp_path):
    """EncodeBatch == the row-path string encoders per column; the JSONL
    sink round-trips through read_json_with_schema decode."""
    import ray.data as rd

    from malli_ray.sources.readers import (read_json_with_schema,
                                           write_jsonl_with_schema)
    from malli_ray.stages.transform_stage import EncodeBatch, batch_kernel
    from malli_ray.transform import any_to_string, date_to_string

    schema = ["map", ["i", "int"], ["x", "double"],
              ["ts", "inst?"], ["b", "boolean"], ["s", "string"]]
    ts = pa.array([1767613845123456, 1767600000000000, None],
                  pa.timestamp("us"))
    tbl = pa.table({"i": pa.array([42, -7, None], pa.int64()),
                    "x": pa.array([1.5, 1e-07, 3.0], pa.float64()),
                    "ts": ts,
                    "b": pa.array([True, False, None]),
                    "s": ["keep", "as", "is"]})
    enc = EncodeBatch(schema)(tbl)
    assert enc.column("i").to_pylist() == ["42", "-7", None]
    # float goes through the exact row encoder (str), not Arrow's cast
    assert enc.column("x").to_pylist() == [
        any_to_string(v) for v in tbl.column("x").to_pylist()]
    assert enc.column("x").to_pylist() == ["1.5", "1e-07", "3.0"]
    assert enc.column("ts").to_pylist() == [
        date_to_string(v) if v is not None else None
        for v in ts.to_pylist()]
    # :boolean deliberately NOT encoded (reference transform.cljc:371)
    assert enc.column("b").type == pa.bool_()
    assert enc.column("s").to_pylist() == ["keep", "as", "is"]

    # encode/<name> override with the batch_kernel marker
    import pyarrow.compute as pc2
    sch2 = ["map", ["i", ["int", {"encode/string": batch_kernel(
        lambda a: pc2.cast(pc2.add(a, 1), pa.string()))}]]]
    enc2 = EncodeBatch(sch2)(pa.table({"i": pa.array([1, 2], pa.int64())}))
    assert enc2.column("i").to_pylist() == ["2", "3"]

    # sink round-trip: write JSONL, decode back, values survive
    out = tmp_path / "jsonl"
    write_jsonl_with_schema(
        rd.from_arrow(tbl.drop_columns(["b"])),
        ["map", ["i", "int"], ["x", "double"], ["ts", "inst?"],
         ["s", "string"]], str(out))
    back = read_json_with_schema(
        sorted(str(p) for p in out.glob("*.json")),
        ["map", ["i", "int"], ["x", "double"], ["s", "string"]]) \
        .to_pandas().sort_values("s").reset_index(drop=True)
    assert sorted(x for x in back["i"].dropna()) == [-7, 42]
    assert abs(back["x"].sum() - (1.5 + 1e-07 + 3.0)) < 1e-12


def test_dsir_weights_semantics(ray_session):
    """Target-like docs score higher; repartition-invariant; exact int."""
    import ray.data as rd

    from malli_ray.stages.sampling import (dsir_bucket_counts,
                                           dsir_log_ratio_table,
                                           dsir_reweight, dsir_weights)

    target_text = "curated medical study results analysis"
    web_text = "click here buy now free offer deal"
    docs = ([(i, target_text + f" v{i}", "tgt") for i in range(20)]
            + [(100 + i, web_text + f" w{i}", "web") for i in range(80)])
    tbl = pa.table({"doc_id": [d[0] for d in docs],
                    "text": [d[1] for d in docs],
                    "src": [d[2] for d in docs]})
    raw = rd.from_arrow(tbl)
    target = raw.filter(expr="src == 'tgt'")
    out = dsir_reweight(raw, target, "text", "doc_id",
                        n_buckets=512).to_pandas()
    tgt_w = out[out.doc_id < 100].log_weight
    web_w = out[out.doc_id >= 100].log_weight
    assert tgt_w.min() > web_w.max()     # clean separation by construction
    # quantized column is the float's exact source
    assert (out.log_weight == out.log_weight_q / float(1 << 40)).all()
    # n_features = unigrams + bigrams = 2*words - 1
    assert (out[out.doc_id < 100].n_features == 11).all()    # 6 words
    assert (out[out.doc_id >= 100].n_features == 15).all()   # 8 words
    # batch-split invariance: int64 scatter-add is associative
    cnt_r = dsir_bucket_counts(raw, "text", 512)
    cnt_t = dsir_bucket_counts(target, "text", 512)
    lam = dsir_log_ratio_table(cnt_r, cnt_t)
    again = dsir_weights(raw.repartition(7), "text", "doc_id",
                         lam).to_pandas()
    merged = out.merge(again, on="doc_id", suffixes=("", "_b"))
    assert (merged.log_weight_q == merged.log_weight_q_b).all()


def test_cross_near_dup_candidates(ray_session):
    """Cross-side-only pairs; same-side near-dups are excluded."""
    import ray.data as rd

    from malli_ray.stages import dedup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    train = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": [base, base + " lambda", "unrelated words entirely here"]}))
    # probe 7 near-duplicates train 1 and 2; probe 8 matches nothing;
    # train 1 vs train 2 is a SAME-side near-dup and must NOT appear
    probe = rd.from_arrow(pa.table({
        "doc_id": [7, 8],
        "text": [base + " mu", "zzz yyy xxx www vvv uuu ttt sss"]}))
    pairs = dedup.cross_near_dup_candidates(
        train, probe, "text", "doc_id", threshold=0.2,
        num_perm=64, bands=32, fail_on_truncation=True).take_all()
    sides = {(r["id_a"] < 0, r["id_b"] < 0) for r in pairs}
    assert sides <= {(True, False)}, "same-side pair leaked"
    back = {(-r["id_a"] - 1, r["id_b"]) for r in pairs}
    assert (7, 1) in back and (7, 2) in back
    assert all(p == 7 for p, _ in back)


def test_interval_lookup_semantics(ray_session):
    import ray.data as rd

    from malli_ray.stages.joins import interval_lookup

    bands = pa.table({"lo": [0.0, 10.0, 30.0], "hi": [10.0, 20.0, 40.0],
                      "band": ["a", "b", "c"]})
    ds = rd.from_arrow(pa.table({
        "id": [1, 2, 3, 4, 5, 6],
        "v": [0.0, 9.999, 10.0, 25.0, 40.0, -1.0]}))
    left = {r["id"]: r["band"]
            for r in interval_lookup(ds, bands, "v", "lo", "hi",
                                     ["band"]).take_all()}
    # closed="left": [lo, hi) — 40.0 and the gap/below-range rows are null
    assert left == {1: "a", 2: "a", 3: "b", 4: None, 5: None, 6: None}
    # closed="both" needs strictly disjoint bounds (touching intervals
    # would share the boundary point — the validator rejects them)
    bands2 = pa.table({"lo": [0.0, 30.0], "hi": [10.0, 40.0],
                       "band": ["a", "c"]})
    both = {r["id"]: r["band"]
            for r in interval_lookup(ds, bands2, "v", "lo", "hi", ["band"],
                                     closed="both").take_all()}
    assert both[5] == "c" and both[3] == "a"
    inner = interval_lookup(ds, bands, "v", "lo", "hi", ["band"],
                            how="inner").take_all()
    assert sorted(r["id"] for r in inner) == [1, 2, 3]
    with pytest.raises(ValueError, match="non-overlapping"):
        interval_lookup(ds, pa.table({"lo": [0.0, 5.0], "hi": [10.0, 15.0],
                                      "band": ["x", "y"]}),
                        "v", "lo", "hi", ["band"])


def test_compression_ratio_stage(ray_session):
    import zlib

    import ray.data as rd

    from malli_ray.stages.text import add_compression_ratio

    texts = ["abc " * 100, "", "entropy8(*&^%$#@!"]
    ds = rd.from_arrow(pa.table({"doc_id": [0, 1, 2], "text": texts}))
    out = {r["doc_id"]: r
           for r in add_compression_ratio(ds, "text", "doc_id").take_all()}
    for i, t in enumerate(texts):
        raw = t.encode()
        assert out[i]["n_bytes"] == len(raw)
        assert out[i]["n_compressed"] == len(zlib.compress(raw, 6))
    assert out[0]["compression_ratio"] < 0.1      # repetitive -> tiny
    assert out[1]["compression_ratio"] == len(zlib.compress(b"", 6))  # /1
    assert out[2]["compression_ratio"] > 1.0      # incompressible short


def test_mp3_tiff_header_parsing():
    """Dependency-free MP3/TIFF header parsers: field recovery, ID3 skip,
    endianness, truncation robustness, loose-sync ordering."""
    from malli_ray.stages.multimodal import (MediaHeaderProbe,
                                             make_mp3_header,
                                             make_tiff_header, wrap_pcm_wav)

    mp3 = MediaHeaderProbe._mp3
    p = make_mp3_header(48000, 1, 160, n_data_bytes=2000, id3_size=64)
    got = mp3(p)
    assert got["media_sample_rate"] == 48000 and got["media_channels"] == 1
    assert got["media_duration_s"] == (2004 * 8) / 160000
    assert mp3(p[:20]) is None                       # truncated inside ID3
    assert mp3(b"\xff\xfb") is None                  # header cut short
    assert mp3(b"\xff\x00\x00\x00") is None          # bad sync
    # free-format (bitrate idx 0) and reserved sample-rate idx rejected
    assert mp3(bytes((0xFF, 0xFB, 0x00, 0x00))) is None
    assert mp3(bytes((0xFF, 0xFB, 0x9C, 0x00))) is None

    tiff = MediaHeaderProbe._tiff
    for be in (False, True):
        t = make_tiff_header(640, 480, bits=16, samples=4, big_endian=be)
        got = tiff(t)
        assert (got["media_width"], got["media_height"],
                got["media_bit_depth"], got["media_channels"]) \
            == (640, 480, 16, 4)
        assert tiff(t[:9]) is None                   # truncated IFD
    assert tiff(b"II\x2a\x00" + b"\xff" * 4) is None  # IFD offset past end

    # parser ordering: a WAV payload must classify as wav (mp3's loose
    # 11-bit sync runs LAST)
    probe = MediaHeaderProbe(payload_column="payload")
    wav = wrap_pcm_wav(b"\x00\x01" * 400)
    out = probe(pa.table({"payload": pa.array(
        [wav, make_mp3_header(44100, 2, 128, 100),
         make_tiff_header(2, 2), b"junk"], type=pa.large_binary())}))
    assert out.column("media_format").to_pylist() == \
        ["wav", "mp3", "tiff", None]
    assert out.column("header_ok").to_pylist() == [True, True, True, False]


def test_split_sentences_semantics(ray_session):
    import ray.data as rd

    from malli_ray.stages.text import split_sentences

    ds = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": ["One. Two!  Three?No gap. tail without end",
                 "unterminated only",
                 "",
                 "...!?"]}))
    rows = sorted((r["doc_id"], r["sent_idx"], r["sentence"])
                  for r in split_sentences(ds, "text", "doc_id").take_all())
    assert rows == [
        (1, 0, "One."), (1, 1, "Two!"), (1, 2, "Three?"),
        (1, 3, "No gap."), (1, 4, "tail without end"),
        (2, 0, "unterminated only"),
        (4, 0, "...!?"),
    ]


def test_count_min_sketch_properties():
    """One-sided error, merge==single-build, digest round trip, eps bound."""
    import numpy as np

    from malli_ray.state.sketches import CountMinSketch

    rng = np.random.default_rng(42)
    # zipf-ish stream over 5000 distinct keys
    keys = [f"k{int(z)}" for z in rng.zipf(1.3, size=20000) if z < 5000]
    from collections import Counter
    exact = Counter(keys)
    sk = CountMinSketch(width=2048, depth=4)
    sk.add(keys)
    vals = sorted(exact)
    est = sk.estimate(vals)
    true = np.array([exact[v] for v in vals])
    assert (est >= true).all()                     # never under-counts
    n = len(keys)
    eps = np.e / 2048
    # CM bound holds for the vast majority (prob 1 - e^-4 per key)
    assert ((est - true) <= eps * n).mean() > 0.98
    # merge of two halves == one-pass build
    a, b = CountMinSketch(), CountMinSketch()
    a.add(keys[:9000]); b.add(keys[9000:])
    merged = a.merge(b)
    one = CountMinSketch(); one.add(keys)
    assert (merged.counts == one.counts).all()
    rt = CountMinSketch.from_digest(one.digest())
    assert (rt.counts == one.counts).all() and rt.total() == len(keys)


def test_summarize_hot_keys(ray_session):
    """cms_columns in the fused pass surfaces the known hot keys with
    one-sided estimates."""
    import ray.data as rd

    from malli_ray.pipelines.validation_job import summarize
    from malli_ray.stages.validator import ValidationSpec

    # 3 hot users + 500 cold ones
    users = (["hot-a"] * 4000 + ["hot-b"] * 2500 + ["hot-c"] * 1500
             + [f"cold-{i}" for i in range(500)])
    ds = rd.from_arrow(pa.table({"user": users})).repartition(8)
    spec = ValidationSpec(schema=["map", ["user", "string"]],
                          cms_columns=["user"])
    rep = summarize(ds, spec)
    hot = rep["hot_keys"]["user"]
    assert [h["value"] for h in hot[:3]] == ["hot-a", "hot-b", "hot-c"]
    for h, true in zip(hot[:3], (4000, 2500, 1500)):
        assert h["est_count"] >= true                 # one-sided
        assert h["est_count"] <= true + len(users) // 100


def test_approx_distinct_by_group(ray_session):
    """Per-group HLL estimate within ~2% of exact; nulls excluded; merge
    across batches is order-independent (same answer after repartition)."""
    import numpy as np
    import ray.data as rd

    from malli_ray.stages.analytics import approx_distinct_by_group

    rng = np.random.default_rng(7)
    sizes = {"a": 5000, "b": 800, "c": 23}
    groups, vals = [], []
    for g, n in sizes.items():
        groups += [g] * (n * 2)
        draws = rng.integers(0, n, size=n * 2)      # ~n distinct w/ repeats
        vals += [f"u{g}{int(v)}" for v in draws]
    groups.append("a")
    vals.append(None)                                # null: not counted
    ds = rd.from_arrow(pa.table({"g": groups, "v": vals}))
    exact = {g: len({v for gg, v in zip(groups, vals)
                     if gg == g and v is not None}) for g in sizes}
    for parts in (1, 16):
        got = {r["g"]: r["approx_distinct"]
               for r in approx_distinct_by_group(
                   ds.repartition(parts), "g", "v").take_all()}
        for g, true in exact.items():
            assert abs(got[g] - true) / true < 0.05, (g, got[g], true)


def test_bigram_coverage_semantics(ray_session):
    """Known-corpus check: occurrence counting (not distinct), short docs,
    threshold boundary."""
    import ray.data as rd

    from malli_ray.stages.text import bigram_coverage

    ds = rd.from_arrow(pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": ["a b a b a b",      # bigrams: (a b)x3, (b a)x2
                 "a b c",            # (a b), (b c)
                 "one",              # no bigrams
                 "a b x y"]}))       # (a b), (b x), (x y)
    out = {r["doc_id"]: r
           for r in bigram_coverage(ds, "text", "doc_id",
                                    min_count=3).take_all()}
    # corpus counts: (a b)=5 -> frequent; (b a)=2, (b c)=1, ... -> not
    assert out[0]["n_bigrams"] == 5 and out[0]["n_known"] == 3
    assert out[1]["n_bigrams"] == 2 and out[1]["n_known"] == 1
    assert out[2]["n_bigrams"] == 0 and out[2]["bigram_coverage"] == 0.0
    assert out[3]["n_known"] == 1
    assert out[0]["bigram_coverage"] == 3 / 5


def test_inverted_index_semantics(ray_session):
    import ray.data as rd

    from malli_ray.stages.text import build_inverted_index

    ds = rd.from_arrow(pa.table({
        "doc_id": [3, 1, 2],
        "text": ["cat dog cat", "dog bird", "dog cat zebra"]}))
    rows = {r["word"]: r for r in build_inverted_index(
        ds.repartition(3), "text", "doc_id", min_df=2).take_all()}
    # zebra/bird df=1 -> excluded; postings sorted; repeats deduped
    assert set(rows) == {"cat", "dog"}
    assert rows["cat"]["df"] == 2 and rows["cat"]["postings"] == "2,3"
    assert rows["dog"]["df"] == 3 and rows["dog"]["postings"] == "1,2,3"
    # max_df excludes the frequent word
    only = build_inverted_index(ds, "text", "doc_id", min_df=2,
                                max_df=2).take_all()
    assert [r["word"] for r in only] == ["cat"]


def test_pq_quantization_quality(ray_session):
    """PQ encode/search sanity: reconstruction beats the zero predictor,
    ADC top-k recalls most exact-L2 neighbors, codes fit uint8."""
    import numpy as np
    import ray.data as rd

    from malli_ray.stages.similarity import pq_encode, pq_topk, pq_train

    rng = np.random.default_rng(3)
    # cluster-structured data (iid gaussians have near-equidistant
    # neighbors — meaningless recall target for ANY quantizer)
    centers = rng.standard_normal((20, 32)) * 3.0
    assign = rng.integers(0, 20, size=400)
    emb = centers[assign] + 0.3 * rng.standard_normal((400, 32))
    ds = rd.from_arrow(pa.table({
        "vec_id": list(range(400)),
        "embedding": [row.tolist() for row in emb]}))
    books = pq_train(ds, "embedding", "vec_id", m=4, k=32, sample_size=400)
    assert books.shape == (4, 32, 8)

    codes = {r["vec_id"]: r["pq_code"]
             for r in pq_encode(ds, books, "embedding",
                                "vec_id").take_all()}
    assert len(codes) == 400 and all(len(c) == 4 for c in codes.values())
    # reconstruction error well below signal energy
    recon = np.stack([np.concatenate([books[j][codes[i][j]]
                                      for j in range(4)])
                      for i in range(400)])
    assert ((emb - recon) ** 2).mean() < 0.5 * (emb ** 2).mean()

    queries = emb[:3]
    got = pq_topk(ds, queries, books, "embedding", "vec_id",
                  k=10).take_all()
    for qi in range(3):
        mine = {r["vec_id"] for r in got if r["query_id"] == qi}
        assert len(mine) == 10
        # within a cluster PQ codes coincide (quantization cell > noise),
        # so exact-rank overlap is tie-broken arbitrarily — the meaningful
        # recall target is CLUSTER membership of the retrieved neighbors
        same_cluster = sum(assign[v] == assign[qi] for v in mine)
        assert same_cluster >= 8, (qi, same_cluster)


def test_strip_html_semantics(ray_session):
    import ray.data as rd

    from malli_ray.stages.text import strip_html

    docs = [
        ("<p>Hello <b>world</b></p>", "Hello world"),
        ("<script>ignore < this </script>keep", "keep"),
        ("<style a=b>.x{}</style>text", "text"),
        ("<!-- no -->yes<!-- \n multi\nline -->", "yes"),
        ("A &amp; B &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end",
         "A & B <tag> \"q\" 's' end"),
        ("unclosed <div attr='x' rest", "unclosed <div attr='x' rest"),
        ("  spaced\t\tout\n\nwords  ", "spaced out words"),
        ("", ""),
        ("<SCRIPT>UPPER</SCRIPT><P>case</P>", "case"),
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": list(range(len(docs))),
        "text": [d[0] for d in docs]}))
    out = {r["doc_id"]: r["text"]
           for r in strip_html(ds, "text").take_all()}
    for i, (_, want) in enumerate(docs):
        assert out[i] == want, (i, out[i], want)


def test_normalize_unicode_forms(ray_session):
    import unicodedata

    import ray.data as rd

    from malli_ray.stages.text import normalize_unicode

    decomp = "café Å ﬁne"     # e+acute, A+ring, fi-ligature
    ds = rd.from_arrow(pa.table({"doc_id": [0, 1],
                                 "text": [decomp, None]}))
    nfc = normalize_unicode(ds, "text").take_all()
    got = {r["doc_id"]: r["text"] for r in nfc}
    assert got[0] == "café Å ﬁne"   # ligature survives NFC
    assert got[1] is None
    nfkc = normalize_unicode(ds, "text", out="t2", form="NFKC").take_all()
    got2 = {r["doc_id"]: r["t2"] for r in nfkc}
    assert got2[0] == "café Å fine"      # NFKC folds the ligature
    assert unicodedata.normalize("NFC", decomp) == got[0]


def test_quantiles_by_group(ray_session):
    """Per-group t-digest quantiles within 1.5% rank error of exact,
    repartition-invariant up to digest merge order."""
    import numpy as np
    import ray.data as rd

    from malli_ray.stages.analytics import quantiles_by_group

    rng = np.random.default_rng(11)
    groups, vals = [], []
    dists = {"a": rng.lognormal(3, 1, 20000),
             "b": rng.uniform(0, 100, 5000),
             "c": np.arange(50, dtype=np.float64)}
    for g, v in dists.items():
        groups += [g] * len(v)
        vals += v.tolist()
    ds = rd.from_arrow(pa.table({"g": groups, "v": vals})).repartition(8)
    got = {r["g"]: r for r in quantiles_by_group(
        ds, "g", "v", qs=(0.5, 0.9, 0.99)).take_all()}
    for g, v in dists.items():
        v = np.sort(v)
        for q, col in ((0.5, "q0_5"), (0.9, "q0_9"), (0.99, "q0_99")):
            est = got[g][col]
            # rank error: where does the estimate land in the true CDF?
            rank = np.searchsorted(v, est) / len(v)
            assert abs(rank - q) < 0.015, (g, q, est, rank)


def test_bloom_semi_join_exact(ray_session):
    """Bloom pre-filter + exact semi-join == plain semi-join (the filter
    has no false negatives; false positives die in the exact join)."""
    import ray.data as rd

    from malli_ray.stages.joins import bloom_semi_join, semi_join

    left = rd.from_arrow(pa.table({
        "k": list(range(1000)),
        "payload": [f"p{i}" for i in range(1000)]}))
    right = rd.from_arrow(pa.table({"rk": [3, 17, 17, 256, 999, 1500]}))
    got = sorted(r["k"] for r in bloom_semi_join(
        left, right, on="k", right_on="rk").take_all())
    want = sorted(r["k"] for r in semi_join(
        left, right, on="k", right_on="rk").take_all())
    assert got == want == [3, 17, 256, 999]
    with pytest.raises(ValueError, match="dtypes differ"):
        bloom_semi_join(left, rd.from_arrow(pa.table(
            {"rk": pa.array([3], pa.int32())})), on="k", right_on="rk")


def test_bigram_lm_hashed_bounded(ray_session):
    """The hashed-bucket bigram LM (the bounded 100-TB path): (a) with
    buckets >> vocabulary, scores are bit-identical to exact mode;
    (b) with tiny bucket counts, BOTH broadcast tables are bounded by
    the bucket count while total word mass is preserved; (c) the exact
    mode's fail-loud caps raise before any unbounded driver pull."""
    import ray.data as rd
    from malli_ray.stages.text import _hashed_lm_tables, bigram_lm_score

    docs = ["the cat sat on the mat",
            "the dog sat on the log",
            "a cat and a dog and a mat",
            "完全 different 字符 here",
            "", "single"]
    t = pa.table({"doc_id": list(range(len(docs))), "text": docs})
    ds = rd.from_arrow(t)

    cols = ["doc_id", "n_bigrams", "lp_q", "avg_logprob"]
    exact = (bigram_lm_score(ds, "text", "doc_id")
             .select_columns(cols).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    hashed = (bigram_lm_score(ds, "text", "doc_id",
                              hashed_buckets=1 << 40)
              .select_columns(cols).to_pandas()
              .sort_values("doc_id").reset_index(drop=True))
    assert exact.equals(hashed)

    H = 8
    uni, bi, total = _hashed_lm_tables(ds, "text", H)
    assert uni.num_rows <= H and bi.num_rows <= H
    n_words = sum(len(d.split()) for d in docs)
    assert total == n_words                     # mass preserved
    assert int(pa.compute.sum(bi.column("cnt")).as_py()) == \
        sum(max(len(d.split()) - 1, 0) for d in docs)
    # deterministic: same tables on a rebuild
    uni2, bi2, total2 = _hashed_lm_tables(ds, "text", H)
    assert uni.equals(uni2) and bi.equals(bi2) and total == total2
    # tiny-H scoring still runs end to end and is deterministic
    s1 = (bigram_lm_score(ds, "text", "doc_id", hashed_buckets=H)
          .select_columns(["doc_id", "lp_q"]).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    s2 = (bigram_lm_score(ds, "text", "doc_id", hashed_buckets=H)
          .select_columns(["doc_id", "lp_q"]).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    assert s1.equals(s2)

    with pytest.raises(ValueError, match="max_bigrams"):
        bigram_lm_score(ds, "text", "doc_id", max_bigrams=3).to_pandas()
    with pytest.raises(ValueError, match="max_vocab"):
        bigram_lm_score(ds, "text", "doc_id", max_vocab=3).to_pandas()


def test_with_frequencies_matches_standalone_ops(ray_session):
    """The fused frequency pass must be bit-identical to running
    drop_frequent_lines, corpus_freq_score and tfidf_keywords alone."""
    import pandas as pd
    import ray.data as rd
    from malli_ray.stages.dedup import drop_frequent_lines
    from malli_ray.stages.text import (corpus_freq_score, tfidf_keywords,
                                       with_frequencies)

    docs = ["menu\nthe cat sat\nmenu",
            "menu\nthe dog ran\nfooter",
            "menu\nfooter\nunique words here",
            "", "one"]
    t = pa.table({"doc_id": list(range(len(docs))), "text": docs})
    ds = rd.from_arrow(t)

    fused = (with_frequencies(ds, "text", "doc_id",
                              drop_lines_min_count=3, freq_min_count=2,
                              tfidf_k=2)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))

    scrub = (drop_frequent_lines(ds, "text", min_count=3)
             .select_columns(["doc_id", "text_clean", "n_lines_dropped"])
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    freq = (corpus_freq_score(ds, "text", "doc_id", min_count=2)
            .select_columns(["doc_id", "n_words", "total_freq",
                             "avg_word_freq", "oov_words"])
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    kw_rows = (tfidf_keywords(ds, "text", "doc_id", k=2)
               .to_pandas().sort_values(["doc_id", "rk"]))
    want_kw = {d: " ".join(g["word"]) for d, g in kw_rows.groupby("doc_id")}

    assert fused["n_lines_dropped"].tolist() == \
        scrub["n_lines_dropped"].tolist()
    assert fused["text_clean"].tolist() == scrub["text_clean"].tolist()
    for c in ("n_words", "total_freq", "oov_words"):
        assert fused[c].tolist() == freq[c].tolist(), c
    assert [(a == b) or (pd.isna(a) and pd.isna(b)) for a, b in
            zip(fused["avg_word_freq"], freq["avg_word_freq"])]
    assert fused["top_words"].tolist() == \
        [want_kw.get(i, "") for i in fused["doc_id"]]

    with pytest.raises(ValueError, match="at least one signal"):
        with_frequencies(ds, "text", "doc_id")


@pytest.mark.parametrize("seed", [31, 32])
def test_domain_filter_indexed_matcher_random(ray_session, seed):
    """The O(log n) reversed-suffix matcher vs a naive per-host Python
    reference — random hosts and blocklists INCLUDING nested entries
    (both 'example' and 'bad.example' blocked) where minimalization must
    not change the matched set, and hosts matched by several entries
    must count ONCE (the SQL list_filter semantics)."""
    import random

    import ray.data as rd
    from malli_ray.stages.text import domain_filter

    rng = random.Random(seed)
    labels = ["a", "b", "cc", "dd", "x-y", "z9"]

    def rand_domain(depth):
        return ".".join(rng.choice(labels) for _ in range(depth))

    blocklist = tuple({rand_domain(rng.randint(1, 3))
                       for _ in range(40)})
    docs = []
    for i in range(120):
        hosts = [rand_domain(rng.randint(1, 4)) for _ in
                 range(rng.randint(0, 5))]
        docs.append((i, hosts,
                     " ".join(f"see https://{h}/p/{i}" for h in hosts)))
    t = pa.table({"doc_id": [d[0] for d in docs],
                  "text": [d[2] for d in docs]})
    out = domain_filter(rd.from_arrow(t), "text", "doc_id",
                        blocklist).take_all()
    got = {r["doc_id"]: (r["n_urls"], r["n_blocked_urls"], r["blocked"])
           for r in out}

    def hit(h):
        return any(h == b or h.endswith("." + b) for b in blocklist)

    for i, hosts, _ in docs:
        n_blocked = sum(1 for h in hosts if hit(h))
        assert got[i] == (len(hosts), n_blocked, n_blocked > 0), \
            (i, hosts)


def test_domain_filter_large_blocklist(ray_session):
    """1e5-entry blocklist: the indexed matcher stays fast (no per-entry
    pass) and exact."""
    import time

    import ray.data as rd
    from malli_ray.stages.text import domain_filter

    blocklist = tuple(f"d{i}.example" for i in range(100_000))
    texts = [f"link https://sub.d{i * 7 % 150_000}.example/x and "
             f"https://clean{i}.org/y" for i in range(2_000)]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    t0 = time.perf_counter()
    out = domain_filter(rd.from_arrow(t), "text", "doc_id",
                        blocklist).take_all()
    el = time.perf_counter() - t0
    want_blocked = sum(1 for i in range(2_000) if i * 7 % 150_000 < 100_000)
    assert sum(r["blocked"] for r in out) == want_blocked
    assert all(r["n_urls"] == 2 for r in out)
    # a per-entry pass would be ~1e5 vector scans; generous wall bound
    assert el < 30.0, el


def test_mp4_sample_probe(ray_session):
    """MP4 sample-table parsing: stts run-length entries, both stsz
    branches (fixed size vs per-sample table), mdhd timescale, fps as
    one IEEE division; malformed/truncated/sample-less payloads null."""
    import ray.data as rd
    from malli_ray.stages.multimodal import (MP4SampleProbe,
                                             make_mp4_header,
                                             make_mp4_sampled,
                                             probe_mp4_samples)

    # fixed-size branch + run-length-collapsed deltas (2,2,2,5 -> 2 entries)
    p1 = make_mp4_sampled(640, 480, 600, [2, 2, 2, 5], 100)
    # table branch
    p2 = make_mp4_sampled(320, 240, 1000, [1, 2, 3], [10, 20, 30])
    p3 = make_mp4_header(640, 480, 5000, 1000)    # header only, no stbl
    p4 = b"\x00\x00\x00\x08ftyp"                  # truncated
    p5 = b"not media at all"
    t = pa.table({"id": [1, 2, 3, 4, 5],
                  "payload": pa.array([p1, p2, p3, p4, p5],
                                      type=pa.large_binary())})
    rows = {r["id"]: r for r in
            probe_mp4_samples(rd.from_arrow(t)).take_all()}
    r1 = rows[1]
    assert (r1["mp4_n_tracks"], r1["mp4_n_samples"],
            r1["mp4_sample_bytes"]) == (1, 4, 400)
    assert (r1["mp4_media_timescale"],
            r1["mp4_media_duration_units"]) == (600, 11)
    assert r1["mp4_fps"] == (4 * 600) / 11
    r2 = rows[2]
    assert (r2["mp4_n_samples"], r2["mp4_sample_bytes"],
            r2["mp4_media_duration_units"]) == (3, 60, 6)
    assert r2["mp4_fps"] == (3 * 1000) / 6
    r3 = rows[3]                                  # track but no stbl
    assert r3["mp4_n_tracks"] == 1 and r3["mp4_n_samples"] is None
    for k in (4, 5):
        assert rows[k]["mp4_n_tracks"] is None
        assert rows[k]["mp4_fps"] is None
    # stts run-length collapse produced 2 entries, not 4
    import struct
    i = p1.find(b"stts")
    assert struct.unpack(">I", p1[i + 8:i + 12])[0] == 2


# ---------------------------------------------------------------------------
# session-4 ops: padding waste, truncate, token decon, union_by_name,
# split_by_group
# ---------------------------------------------------------------------------


def test_padding_waste_report(ray_session):
    import ray.data as rd
    from malli_ray.stages.packing import padding_waste_report
    t = pa.table({
        "tokens": pa.array([[1, 2, 3], [4] * 5, [7] * 4, [8]],
                           type=pa.list_(pa.int32())),
        "source": pa.array(["a", "a", None, "b"])})
    got = {r["source"]: r for r in padding_waste_report(
        rd.from_arrow(t), "tokens", "source", block_len=4).take_all()}
    # a: lens 3,5 -> blocks 1,2 -> padded 12, waste 4
    assert got["a"]["n_seqs"] == 2 and got["a"]["total_tokens"] == 8
    assert got["a"]["n_blocks"] == 3 and got["a"]["padded_tokens"] == 12
    assert got["a"]["waste_tokens"] == 4
    assert got["a"]["waste_pct"] == 4.0 / 12.0
    # null source folds to ""
    assert got[""]["n_seqs"] == 1 and got[""]["waste_tokens"] == 0
    assert got["b"]["n_blocks"] == 1 and got["b"]["waste_tokens"] == 3
    with pytest.raises(ValueError):
        padding_waste_report(rd.from_arrow(t), block_len=0)


def test_truncate_sequences(ray_session):
    import ray.data as rd
    from malli_ray.stages.packing import truncate_sequences
    t = pa.table({
        "doc_id": pa.array(["a", "b"]),
        "tokens": pa.array([[1, 2, 3, 4, 5], [9]],
                           type=pa.list_(pa.int32())),
        "n_tok": pa.array([99, 1], pa.int32())})
    rows = sorted(truncate_sequences(
        rd.from_arrow(t), "tokens", max_len=3).take_all(),
        key=lambda r: r["doc_id"])
    assert rows[0]["tokens"] == [1, 2, 3] and rows[0]["n_tok"] == 3
    assert rows[0]["was_truncated"] is True or rows[0]["was_truncated"] == True  # noqa: E712
    assert rows[1]["tokens"] == [9] and rows[1]["n_tok"] == 1
    assert not rows[1]["was_truncated"]


def test_token_ngram_contamination(ray_session):
    import ray.data as rd
    from malli_ray.stages.text import token_ngram_contamination
    probe = [5, 6, 7]
    t = pa.table({
        "doc_id": pa.array(["hit_start", "hit_mid", "hit_twice",
                            "straddle_a", "straddle_b", "clean", "dup",
                            "dup"]),
        "tokens": pa.array([
            [5, 6, 7, 1],          # at start
            [1, 5, 6, 7, 2],       # middle
            [5, 6, 7, 5, 6, 7],    # two hits
            [1, 2, 5, 6],          # ends with prefix of probe...
            [7, 3, 4],             # ...next row completes it: must NOT hit
            [9, 9, 9],
            [5, 6, 7],             # same doc_id twice -> hits combine
            [2, 5, 6, 7]],
            type=pa.list_(pa.int32()))})
    got = {r["doc_id"]: r["n_hits"] for r in token_ngram_contamination(
        rd.from_arrow(t), [probe], "tokens", "doc_id").take_all()}
    assert got == {"hit_start": 1, "hit_mid": 1, "hit_twice": 2, "dup": 2}
    with pytest.raises(ValueError):
        token_ngram_contamination(rd.from_arrow(t), [[1, 2], [3]])
    with pytest.raises(ValueError):
        token_ngram_contamination(rd.from_arrow(t), [])


def test_union_by_name(ray_session):
    import ray.data as rd
    from malli_ray.stages.joins import union_by_name
    a = pa.table({"id": pa.array([1, 2], pa.int32()),
                  "x": pa.array(["p", "q"])})
    b = pa.table({"y": pa.array([1.5]),
                  "id": pa.array([3], pa.int64())})
    out = union_by_name([rd.from_arrow(a), rd.from_arrow(b)])
    rows = sorted(out.take_all(), key=lambda r: r["id"])
    assert [r["id"] for r in rows] == [1, 2, 3]          # int32 -> int64
    assert [r["x"] for r in rows] == ["p", "q", None]    # null fill
    assert [r["y"] for r in rows] == [None, None, 1.5]
    sch = out.schema().base_schema
    assert sch.field("id").type == pa.int64()
    with pytest.raises(ValueError):
        union_by_name([])


def test_split_by_group(ray_session):
    import ray.data as rd
    from malli_ray.stages.sampling import split_by_group
    n = 2000
    t = pa.table({"id": pa.array(range(n), pa.int64()),
                  "grp": pa.array(
                      [None if i % 13 == 0 else f"g{i % 211}"
                       for i in range(n)])})
    rows = split_by_group(rd.from_arrow(t), "grp",
                          {"train": 0.8, "valid": 0.1, "test": 0.1}
                          ).take_all()
    by_grp = {}
    for r in rows:
        by_grp.setdefault(r["grp"], set()).add(r["split"])
    # leakage safety: every group (incl. the null group) gets ONE label
    assert all(len(v) == 1 for v in by_grp.values())
    labels = {next(iter(v)) for v in by_grp.values()}
    assert "train" in labels and len(labels) >= 2
    # deterministic across executions
    rows2 = split_by_group(rd.from_arrow(t), "grp",
                           {"train": 0.8, "valid": 0.1, "test": 0.1}
                           ).take_all()
    assert sorted((r["id"], r["split"]) for r in rows) == \
           sorted((r["id"], r["split"]) for r in rows2)


def test_token_dup_ngram_stats(ray_session):
    import ray.data as rd
    from malli_ray.stages.text import token_dup_ngram_stats
    t = pa.table({
        "doc_id": pa.array(["all_dup", "no_dup", "mixed", "tiny"]),
        "tokens": pa.array([
            [7, 7, 7, 7],       # grams (7,7)x3 -> total 3, uniq 1, dup 2
            [1, 2, 3, 4],       # 3 distinct grams
            [1, 2, 1, 2, 1],    # grams: (1,2),(2,1),(1,2),(2,1) -> dup 2
            [5]],               # no bigrams -> emits nothing
            type=pa.list_(pa.int32()))})
    got = {r["doc_id"]: r for r in token_dup_ngram_stats(
        rd.from_arrow(t), "tokens", "doc_id", n=2).take_all()}
    assert set(got) == {"all_dup", "no_dup", "mixed"}
    assert (got["all_dup"]["dup_ngrams"], got["all_dup"]["total_ngrams"]) \
        == (2, 3)
    assert got["all_dup"]["dup_frac"] == 2.0 / 3.0
    assert got["no_dup"]["dup_ngrams"] == 0
    assert (got["mixed"]["dup_ngrams"], got["mixed"]["total_ngrams"]) \
        == (2, 4)
    with pytest.raises(ValueError):
        token_dup_ngram_stats(rd.from_arrow(t), n=5)   # vocab**5 > 2**63


def test_list_value_counts_by_group(ray_session):
    import ray.data as rd
    from malli_ray.stages.analytics import list_value_counts_by_group
    t = pa.table({
        "tokens": pa.array([[0, 1, 1], [2], [1, 2], []],
                           type=pa.list_(pa.int32())),
        "src": pa.array(["a", "a", None, "b"])})
    rows = sorted(
        ((r["src"], r["value"], r["cnt"]) for r in
         list_value_counts_by_group(rd.from_arrow(t), "tokens", "src",
                                    bounded_range=(0, 4)).take_all()))
    assert rows == [("", 1, 1), ("", 2, 1),
                    ("a", 0, 1), ("a", 1, 2), ("a", 2, 1)]
    bad = pa.table({"tokens": pa.array([[9]], type=pa.list_(pa.int32())),
                    "src": pa.array(["a"])})
    with pytest.raises(Exception):
        list_value_counts_by_group(rd.from_arrow(bad), "tokens", "src",
                                   bounded_range=(0, 4)).take_all()


def test_confusion_report(ray_session):
    import ray.data as rd
    from malli_ray.stages.analytics import confusion_report
    t = pa.table({
        "prob": pa.array([0.1, 0.5, 0.5, 0.9, 0.3, 0.7]),
        "label": pa.array([False, True, False, True, None, True])})
    rows = {r["thr"]: r for r in confusion_report(
        rd.from_arrow(t).repartition(3), "prob", "label",
        [0.5, 0.8]).take_all()}
    # thr 0.5: pred+ = {0.5,0.5,0.9,0.7} -> tp=3 fp=1; pred- = {0.1,0.3}
    r = rows[0.5]
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (3, 1, 0, 2)
    assert r["precision"] == 3 / 4 and r["recall"] == 1.0
    assert r["f1"] == 6 / 7 and r["accuracy"] == 5 / 6
    # thr 0.8: pred+ = {0.9} -> tp=1 fp=0 fn=2 tn=3
    r = rows[0.8]
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (1, 0, 2, 3)
    assert r["precision"] == 1.0 and r["recall"] == 1 / 3
    # all-negative predictions: precision is NULL, not 0/0
    empty = {r["thr"]: r for r in confusion_report(
        rd.from_arrow(pa.table({"p": pa.array([0.2]),
                                "y": pa.array([True])})),
        "p", "y", [0.9]).take_all()}
    assert empty[0.9]["precision"] is None
    with pytest.raises(Exception):
        confusion_report(rd.from_arrow(pa.table(
            {"p": pa.array([None], pa.float64()),
             "y": pa.array([True])})), "p", "y", [0.5]).take_all()


def test_pack_histogram(ray_session):
    import ray.data as rd
    from malli_ray.stages.packing import pack_histogram

    rng = np.random.default_rng(31)
    n, max_len = 5000, 64
    lengths = np.clip(np.round(rng.lognormal(2.5, 0.9, n)), 1,
                      max_len).astype(np.int64)
    ids = np.array([f"s{i:06d}" for i in range(n)], dtype=object)
    t = pa.table({"sid": pa.array(ids, pa.string()),
                  "n": pa.array(lengths, pa.int64())})
    out = pack_histogram(rd.from_arrow(t).repartition(7), "sid", "n",
                         max_len=max_len).take_all()
    assert len(out) == n
    fills, docs = {}, set()
    for r in out:
        fills[r["pack_id"]] = fills.get(r["pack_id"], 0) + r["length"]
        docs.add(r["sid"])
    assert len(docs) == n
    assert max(fills.values()) <= max_len
    assert set(fills) == set(range(len(fills)))
    # near-optimal on lognormal lengths: >= 95% fill (pad-to-max ~20%)
    assert lengths.sum() / (len(fills) * max_len) > 0.95
    # deterministic under different partitioning
    out2 = pack_histogram(rd.from_arrow(t).repartition(2), "sid", "n",
                          max_len=max_len).take_all()
    assert (sorted((r["sid"], r["length"], r["pack_id"]) for r in out)
            == sorted((r["sid"], r["length"], r["pack_id"]) for r in out2))
    # out-of-range counts fail loud
    bad = pa.table({"sid": pa.array(["a"]), "n": pa.array([0])})
    with pytest.raises(Exception):
        pack_histogram(rd.from_arrow(bad), "sid", "n",
                       max_len=max_len).take_all()


def test_assemble_packed_blocks_random(ray_session):
    """assemble_packed_blocks vs a naive per-token Python reference on
    randomized data with null groups, null/empty token lists, and docs
    spanning multiple blocks."""
    import collections

    import ray.data as rd

    from malli_ray.stages.packing import assemble_packed_blocks

    rng = np.random.default_rng(7)
    rows = []
    for i in range(400):
        n = int(rng.integers(0, 30))
        src = (["a", "b", "c"][int(rng.integers(0, 3))]
               if rng.random() < 0.9 else None)
        toks = (None if rng.random() < 0.03
                else rng.integers(0, 100, n).astype(np.int32).tolist())
        rows.append({"doc_id": f"d{i:05d}", "tokens": toks, "source": src})
    tbl = pa.table({
        "doc_id": [r["doc_id"] for r in rows],
        "tokens": pa.array([r["tokens"] for r in rows], pa.list_(pa.int32())),
        "source": [r["source"] for r in rows]})
    ds = rd.from_arrow(tbl).repartition(4)

    B = 16
    out = assemble_packed_blocks(ds, block_size=B, num_buckets=8).to_pandas()
    # the guarded join fallback (payload crosses the wire twice) must be
    # bit-identical to the broadcast fast path
    out_join = assemble_packed_blocks(
        ds, block_size=B, num_buckets=8,
        max_broadcast_docs=0).to_pandas()
    key = ["source", "block_id"]
    a = out.sort_values(key).reset_index(drop=True)
    b = out_join.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b)
    for col in ["source", "block_id", "n_tokens", "n_docs"]:
        assert (a[col] == b[col]).all()
    for col in ["input_ids", "position_ids", "segment_ids"]:
        assert all(list(x) == list(y) for x, y in zip(a[col], b[col]))
    streams = collections.defaultdict(list)
    for r in rows:
        if r["tokens"]:
            streams[r["source"] or ""].append((r["doc_id"], r["tokens"]))
    ref = {}
    for g, docs in streams.items():
        docs.sort()
        stream = [(t, p, d) for d, tk in docs for p, t in enumerate(tk)]
        for bi in range(0, len(stream), B):
            blk = stream[bi:bi + B]
            docset = []
            for t, p, d in blk:
                if d not in docset:
                    docset.append(d)
            ref[(g, bi // B)] = (
                [t for t, p, d in blk], [p for t, p, d in blk],
                [docset.index(d) + 1 for t, p, d in blk], len(docset))
    assert len(out) == len(ref)
    for _, r in out.iterrows():
        e_in, e_pos, e_seg, e_nd = ref[(r["source"], r["block_id"])]
        assert list(r["input_ids"]) == e_in
        assert list(r["position_ids"]) == e_pos
        assert list(r["segment_ids"]) == e_seg
        assert r["n_docs"] == e_nd and r["n_tokens"] == len(e_in)
    # every block but a group's last is exactly full
    full = out.sort_values(["source", "block_id"]).groupby("source")[
        "n_tokens"].apply(lambda s: (s.iloc[:-1] == B).all())
    assert full.all()


def test_window_tokens_random(ray_session):
    import ray.data as rd

    from malli_ray.stages.packing import window_tokens

    rng = np.random.default_rng(11)
    docs = {f"d{i}": rng.integers(0, 1000, int(rng.integers(0, 40)))
            .astype(np.int32).tolist() for i in range(300)}
    tbl = pa.table({"doc_id": list(docs),
                    "tokens": pa.array(list(docs.values()),
                                       pa.list_(pa.int32()))})
    ds = rd.from_arrow(tbl).repartition(3)
    size, stride = 8, 3
    w = window_tokens(ds, size=size, stride=stride).to_pandas()
    ref = {}
    for d, tk in docs.items():
        n = len(tk)
        if n == 0:
            continue
        k = 1 if n <= size else -(-(n - size) // stride) + 1
        for i in range(k):
            ref[(d, i)] = tk[i * stride:i * stride + size]
    assert len(w) == len(ref)
    for _, r in w.iterrows():
        e = ref[(r["doc_id"], r["win_id"])]
        assert list(r["input_ids"]) == e
        assert r["win_len"] == len(e)
        assert r["win_start"] == r["win_id"] * stride
    # stride > size is rejected
    with pytest.raises(ValueError):
        window_tokens(ds, size=4, stride=5)


def test_remap_token_ids(ray_session):
    import ray.data as rd

    from malli_ray.stages.text import remap_token_ids

    rng = np.random.default_rng(13)
    docs = {f"d{i}": rng.integers(-5, 120, int(rng.integers(0, 20)))
            .astype(np.int64).tolist() for i in range(200)}
    tbl = pa.table({"doc_id": list(docs),
                    "tokens": pa.array(list(docs.values()),
                                       pa.list_(pa.int64()))})
    ds = rd.from_arrow(tbl).repartition(3)
    mp = ((np.arange(100, dtype=np.int64) * 7 + 3) % 100)
    got = remap_token_ids(ds, mp, unk_id=99).to_pandas().set_index("doc_id")
    for d, tk in docs.items():
        exp = [int(mp[t]) if 0 <= t < 100 else 99 for t in tk]
        assert list(got.loc[d, "tokens"]) == exp
    # out= writes a separate column, input preserved
    got2 = remap_token_ids(ds, mp, unk_id=99,
                           out="remapped").to_pandas().set_index("doc_id")
    for d, tk in list(docs.items())[:20]:
        assert list(got2.loc[d, "tokens"]) == tk


def test_assemble_packed_blocks_empty_inputs(ray_session):
    """Zero-row and all-empty-token-list inputs assemble to zero blocks on
    BOTH the broadcast and join paths (regression: the empty assignment
    table used to break the driver pull)."""
    import ray.data as rd

    from malli_ray.stages.packing import assemble_packed_blocks

    cases = [
        pa.table({"doc_id": pa.array([], pa.string()),
                  "tokens": pa.array([], pa.list_(pa.int32())),
                  "source": pa.array([], pa.string())}),
        pa.table({"doc_id": ["a", "b"],
                  "tokens": pa.array([[], None], pa.list_(pa.int32())),
                  "source": ["x", "y"]})]
    for tbl in cases:
        for cap in (8_000_000, 0):
            out = assemble_packed_blocks(
                rd.from_arrow(tbl), block_size=4, num_buckets=2,
                tokens_type=pa.list_(pa.int32()),
                max_broadcast_docs=cap).take_all()
            assert out == []


def test_assemble_packed_blocks_dup_id_raises(ray_session):
    import ray.data as rd

    from malli_ray.stages.packing import assemble_packed_blocks

    tbl = pa.table({
        "doc_id": ["a", "a", "b"],
        "tokens": pa.array([[1, 2], [3], [4]], pa.list_(pa.int32())),
        "source": ["x", "x", "x"]})
    with pytest.raises(Exception, match="duplicate id"):
        assemble_packed_blocks(rd.from_arrow(tbl), block_size=4,
                               num_buckets=2).take_all()


def test_add_sentinel_tokens(ray_session):
    import ray.data as rd

    from malli_ray.stages.text import add_sentinel_tokens

    tbl = pa.table({
        "doc_id": ["a", "b", "c", "d"],
        "tokens": pa.array([[1, 2, 3], [], None, [7]], pa.list_(pa.int32())),
        "n_tok": pa.array([3, 0, 0, 1], pa.int32())})
    ds = rd.from_arrow(tbl)
    got = {r["doc_id"]: r for r in add_sentinel_tokens(
        ds, "tokens", bos_id=100, eos_id=101,
        count_column="n_tok").take_all()}
    assert list(got["a"]["tokens"]) == [100, 1, 2, 3, 101]
    assert list(got["b"]["tokens"]) == [100, 101]
    assert list(got["c"]["tokens"]) == [100, 101]
    assert list(got["d"]["tokens"]) == [100, 7, 101]
    assert [got[k]["n_tok"] for k in "abcd"] == [5, 2, 2, 3]
    # eos-only, separate output column, input preserved
    got2 = {r["doc_id"]: r for r in add_sentinel_tokens(
        ds, "tokens", eos_id=9, out="with_eos").take_all()}
    assert list(got2["a"]["tokens"]) == [1, 2, 3]
    assert list(got2["a"]["with_eos"]) == [1, 2, 3, 9]
    with pytest.raises(ValueError):
        add_sentinel_tokens(ds, "tokens")


def test_clip_sentinel_fused_matches_composition(ray_session):
    """The fused clip+sentinel kernel is row-identical to the
    truncate_sequences -> add_sentinel_tokens composition it replaces
    (pack_prep's prep chain), across nulls, empties, short and clipped
    rows."""
    import ray.data as rd

    from malli_ray.stages.packing import (clip_sentinel_tokens,
                                          truncate_sequences)
    from malli_ray.stages.text import add_sentinel_tokens

    rng = np.random.default_rng(23)
    rows = [None if rng.random() < 0.05
            else rng.integers(0, 50257, int(rng.integers(0, 40))
                              ).astype(np.int32).tolist()
            for _ in range(400)]
    tbl = pa.table({
        "doc_id": [f"d{i:04d}" for i in range(len(rows))],
        "tokens": pa.array(rows, pa.list_(pa.int32())),
        "source": ["web"] * len(rows)})
    ds = rd.from_arrow(tbl).repartition(4)
    for bos, eos in [(100, 101), (None, 101), (100, None)]:
        fused = clip_sentinel_tokens(ds, "tokens", max_len=17,
                                     bos_id=bos, eos_id=eos).to_pandas()
        comp = add_sentinel_tokens(
            truncate_sequences(ds, "tokens", max_len=17,
                               count_column=None),
            "tokens", bos_id=bos, eos_id=eos).to_pandas()
        fused = fused.sort_values("doc_id").reset_index(drop=True)
        comp = comp.sort_values("doc_id").reset_index(drop=True)
        assert (fused.doc_id == comp.doc_id).all()
        assert all(list(a) == list(b)
                   for a, b in zip(fused.tokens, comp.tokens))
        assert (fused.source == comp.source).all()
    with pytest.raises(ValueError):
        clip_sentinel_tokens(ds, "tokens", max_len=17)


def test_fim_transform_random(ray_session):
    """fim_transform (psm + spm) vs a per-row Python reference, with null
    lists, out-of-range cut points (clamped), and null cuts (read as 0)."""
    import ray.data as rd

    from malli_ray.stages.text import fim_transform

    rng = np.random.default_rng(17)
    rows = []
    for i in range(300):
        n = int(rng.integers(0, 25))
        toks = (None if rng.random() < 0.05
                else rng.integers(0, 1000, n).astype(np.int32).tolist())
        c1 = (None if rng.random() < 0.05
              else int(rng.integers(-3, 30)))
        c2 = (None if rng.random() < 0.05
              else int(rng.integers(-3, 30)))
        rows.append((f"d{i}", toks, c1, c2))
    tbl = pa.table({
        "doc_id": [r[0] for r in rows],
        "tokens": pa.array([r[1] for r in rows], pa.list_(pa.int32())),
        "fim_c1": pa.array([r[2] for r in rows], pa.int64()),
        "fim_c2": pa.array([r[3] for r in rows], pa.int64())})
    PRE, SUF, MID = 9001, 9003, 9002

    def ref(toks, c1, c2, mode):
        t = toks or []
        n = len(t)
        c1 = min(max(c1 or 0, 0), n)
        c2 = min(max(c2 or 0, c1), n)
        pre, mid, suf = t[:c1], t[c1:c2], t[c2:]
        if mode == "psm":
            return [PRE] + pre + [SUF] + suf + [MID] + mid
        return [PRE, SUF] + suf + [MID] + pre + mid

    for mode in ("psm", "spm"):
        ds = rd.from_arrow(tbl).repartition(3)
        got = fim_transform(ds, "tokens", pre_id=PRE, suf_id=SUF,
                            mid_id=MID, mode=mode,
                            count_column="n_fim").to_pandas()
        got = got.set_index("doc_id")
        for d, toks, c1, c2 in rows:
            e = ref(toks, c1, c2, mode)
            assert list(got.loc[d, "tokens"]) == e, (mode, d)
            assert got.loc[d, "n_fim"] == len(e)
        assert "fim_c1" not in got.columns  # dropped by default
    with pytest.raises(ValueError):
        fim_transform(rd.from_arrow(tbl), mode="nope")


def test_shift_labels_random(ray_session):
    import ray.data as rd

    from malli_ray.stages.text import shift_labels

    rng = np.random.default_rng(19)
    docs = [(f"d{i}", None if rng.random() < 0.05 else
             rng.integers(0, 1000, int(rng.integers(0, 20)))
             .astype(np.int32).tolist()) for i in range(300)]
    tbl = pa.table({
        "doc_id": [d for d, _ in docs],
        "tokens": pa.array([t for _, t in docs], pa.list_(pa.int32()))})
    got = {r["doc_id"]: r for r in shift_labels(
        rd.from_arrow(tbl).repartition(3), "tokens",
        out="labels", pad_id=-100).take_all()}
    for d, t in docs:
        t = t or []
        exp = t[1:] + [-100] if t else []
        assert list(got[d]["labels"] or []) == exp
        assert list(got[d]["tokens"] or []) == t  # input preserved


def test_expectations_report(ray_session):
    """expectations_report verdicts vs hand-computed truth: passing and
    failing rules, float-column quantized means, null-excluded distinct."""
    import ray.data as rd

    from malli_ray.stages.constraints import expectations_report

    tbl = pa.table({
        "id": pa.array(list(range(10)), pa.int64()),
        "x": pa.array([1, 2, 3, 4, 5, 6, 7, 8, 9, 10], pa.int64()),
        "f": pa.array([0.5, 1.5, None, 2.5, 0.5, 1.0, 1.0, 2.0, 3.0, 0.0],
                      pa.float64()),
        "g": pa.array(["a", "b", "a", None, "c", "a", "b", None, "c", "a"],
                      pa.string())})
    ds = rd.from_arrow(tbl).repartition(3)
    rep = expectations_report(ds, [
        {"kind": "row_count_between", "lo": 5, "hi": 20, "name": "rc_ok"},
        {"kind": "row_count_between", "lo": 11, "hi": 20, "name": "rc_bad"},
        {"kind": "null_rate_lt", "column": "g", "max_rate": 0.3,
         "name": "nulls_ok"},          # 2/10 = 0.2 < 0.3
        {"kind": "null_rate_lt", "column": "g", "max_rate": 0.2,
         "name": "nulls_bad"},         # 0.2 < 0.2 is false
        {"kind": "mean_between", "column": "x", "lo": 5, "hi": 6,
         "name": "mean_ok"},           # mean 5.5
        {"kind": "mean_between", "column": "f", "lo": 1.3, "hi": 1.4,
         "name": "fmean_ok"},          # mean 12/9 = 1.333...
        {"kind": "min_ge", "column": "x", "value": 1, "name": "min_ok"},
        {"kind": "max_le", "column": "x", "value": 9, "name": "max_bad"},
        {"kind": "distinct_count_between", "column": "g", "lo": 3, "hi": 3,
         "name": "card_ok"},           # a,b,c — nulls excluded
    ]).to_pydict()
    ok = dict(zip(rep["rule"], rep["ok"]))
    assert ok == {"rc_ok": True, "rc_bad": False, "nulls_ok": True,
                  "nulls_bad": False, "mean_ok": True, "fmean_ok": True,
                  "min_ok": True, "max_bad": False, "card_ok": True}
    obs = dict(zip(rep["rule"], rep["observed_i"]))
    assert obs["rc_ok"] == 10 and obs["nulls_ok"] == 2
    assert obs["mean_ok"] == 55 and obs["card_ok"] == 3
    # float sums quantize at 2^20 BEFORE summation (exact, associative)
    assert obs["fmean_ok"] == sum(round(v * (1 << 20)) for v in
                                  [0.5, 1.5, 2.5, 0.5, 1.0, 1.0, 2.0,
                                   3.0, 0.0])


def test_monotonic_violations_random(ray_session):
    """monotonic_violations vs a pandas LAG reference: random keys/orders/
    values with nulls, both strict modes."""
    import pandas as pd
    import ray.data as rd

    from malli_ray.stages.constraints import monotonic_violations

    rng = np.random.default_rng(29)
    n = 2000
    df = pd.DataFrame({
        "k": rng.integers(0, 40, n),
        "o": rng.permutation(n),
        "v": np.where(rng.random(n) < 0.05, np.nan,
                      rng.integers(0, 50, n).astype(float))})
    tbl = pa.table({"k": pa.array(df.k, pa.int64()),
                    "o": pa.array(df.o, pa.int64()),
                    "v": pa.array(df.v, pa.float64(), from_pandas=True)})
    for strict in (False, True):
        got = monotonic_violations(
            rd.from_arrow(tbl).repartition(4), "k", "o", "v",
            strict=strict, num_buckets=8).to_pandas()
        s = df.sort_values(["k", "o"]).copy()
        s["p"] = s.groupby("k")["v"].shift(1)
        bad = s[(s.v < s.p) if not strict else (s.v <= s.p)]
        assert len(got) == len(bad)
        g = got.sort_values(["k", "o"]).reset_index(drop=True)
        b = bad.sort_values(["k", "o"]).reset_index(drop=True)
        assert (g["k"].values == b["k"].values).all()
        assert (g["o"].values == b["o"].values).all()
        assert (g["v"].values == b["v"].values).all()
        assert (g["v_prev"].values == b["p"].values).all()


def test_token_rarity_random(ray_session):
    """token_rarity vs a per-row Python reference (corpus counts, per-doc
    sum/min), with null/empty lists and the out-of-range raise."""
    import collections

    import ray.data as rd

    from malli_ray.stages.text import token_rarity

    rng = np.random.default_rng(23)
    docs = [(f"d{i}", None if rng.random() < 0.05 else
             rng.integers(0, 50, int(rng.integers(0, 15)))
             .astype(np.int32).tolist()) for i in range(300)]
    tbl = pa.table({
        "doc_id": [d for d, _ in docs],
        "tokens": pa.array([t for _, t in docs], pa.list_(pa.int32()))})
    got = {r["doc_id"]: r for r in token_rarity(
        rd.from_arrow(tbl).repartition(3), "tokens", "doc_id",
        vocab_range=(0, 50)).take_all()}
    cnt = collections.Counter(t for _, ts in docs for t in (ts or []))
    for d, ts in docs:
        ts = ts or []
        assert got[d]["n_tok"] == len(ts)
        assert got[d]["rarity_sum"] == sum(cnt[t] for t in ts)
        assert got[d]["rarity_min"] == (min(cnt[t] for t in ts) if ts
                                        else 0)
    bad = pa.table({"doc_id": ["x"],
                    "tokens": pa.array([[99]], pa.list_(pa.int32()))})
    with pytest.raises(Exception, match="vocab_range|bounded_range"):
        token_rarity(rd.from_arrow(bad), vocab_range=(0, 50)).take_all()


def test_assemble_packed_blocks_cross_group_dup_raises(ray_session):
    import ray.data as rd

    from malli_ray.stages.packing import assemble_packed_blocks

    tbl = pa.table({
        "doc_id": ["a", "a", "b"],
        "tokens": pa.array([[1, 2], [3], [4]], pa.list_(pa.int32())),
        "source": ["x", "y", "x"]})
    with pytest.raises(Exception, match="multiple groups|globally unique"):
        assemble_packed_blocks(rd.from_arrow(tbl), block_size=4,
                               num_buckets=2).take_all()
    # the join fallback carries the same guard (checked per id-bucket)
    with pytest.raises(Exception, match="multiple groups|globally unique"):
        assemble_packed_blocks(rd.from_arrow(tbl), block_size=4,
                               num_buckets=2,
                               max_broadcast_docs=0).take_all()


def test_interleave_by_ratio(ray_session):
    """Stride-scheduling keys: exact per-group keys vs a per-row Python
    reference, and the mixture property — any prefix of the mix_key
    order carries the groups near their weight shares."""
    import ray.data as rd

    from malli_ray.stages.sampling import interleave_by_ratio

    rng = np.random.default_rng(3)
    groups = rng.choice(["a", "b", "c"], p=[0.6, 0.3, 0.1], size=3000)
    tbl = pa.table({"doc_id": [f"d{i:05d}" for i in range(3000)],
                    "source": groups})
    w = {"a": 6, "b": 3, "c": 1}
    out = interleave_by_ratio(rd.from_arrow(tbl).repartition(4), "source",
                              "doc_id", weights=w).to_pandas()
    # exact key check vs a naive reference
    ref = {}
    rank = {}
    for i in np.argsort([f"d{i:05d}" for i in range(3000)]):
        g = groups[i]
        r = rank.get(g, 0)
        rank[g] = r + 1
        ref[f"d{i:05d}"] = ((2 * r + 1) * (1 << 20)) // w[g]
    got = dict(zip(out["doc_id"], out["mix_key"]))
    assert got == ref
    # mixture property: the first 1000 rows in key order ~ 6:3:1
    head = out.sort_values(["mix_key", "doc_id"]).head(1000)
    shares = head["source"].value_counts(normalize=True)
    assert abs(shares["a"] - 0.6) < 0.02
    assert abs(shares["b"] - 0.3) < 0.02
    assert abs(shares["c"] - 0.1) < 0.02
    with pytest.raises(ValueError):
        interleave_by_ratio(rd.from_arrow(tbl), "source", "doc_id",
                            weights={"a": 0})


def test_quantile_cont_bit_exact_vs_duckdb():
    """sampling.quantile_cont replicates DuckDB's quantile_cont
    interpolation BIT-exactly (the driver's value-hash gate compares
    exact float reprs, so one ulp is a failure): random data, awkward
    fractions, exact-index hits, and n=1/n=2 edges."""
    import duckdb

    from malli_ray.stages.sampling import quantile_cont

    con = duckdb.connect()
    rng = np.random.default_rng(3)
    ps = [0.05, 0.1, 0.25, 1 / 3, 0.5, 0.75, 0.9, 0.95, 0.99]
    for n in (1, 2, 7, 100, 999):
        v = np.sort(rng.normal(100, 37, n))
        lit = "[" + ", ".join(f"'{float(x)!r}'::DOUBLE" for x in v) + "]"
        exprs = ", ".join(f"quantile_cont(u, {p!r})" for p in ps)
        want = con.execute(
            f"SELECT {exprs} FROM (SELECT UNNEST({lit}) AS u)"
        ).fetchone()
        got = quantile_cont(v, ps)
        assert all(float(g) == float(w) for g, w in zip(got, want)), n


def test_add_loss_mask(ray_session):
    """SFT loss-mask: 0 over the prompt, 1 over the completion; prompt
    lengths clamp to [0, len]; null prompt -> all-train; null tokens ->
    empty mask."""
    import ray.data as rd

    from malli_ray.stages.text import add_loss_mask

    t = pa.table({
        "doc_id": ["a", "b", "c", "d", "e"],
        "tokens": pa.array([[1, 2, 3, 4], [5, 6], [7, 8, 9], None, [1]],
                           pa.list_(pa.int32())),
        "prompt_len": pa.array([2, 10, 0, 3, None], pa.int64())})
    got = {r["doc_id"]: list(r["loss_mask"]) for r in add_loss_mask(
        rd.from_arrow(t), "tokens", "prompt_len").take_all()}
    assert got["a"] == [0, 0, 1, 1]
    assert got["b"] == [0, 0]          # clamp to len
    assert got["c"] == [1, 1, 1]
    assert got["d"] == []              # null tokens
    assert got["e"] == [1]             # null prompt reads as 0


def test_length_sorted_batches(ray_session):
    """Stream-cut sorted batching vs a driver-side reference: batch_id =
    tokens-before-in-(length,id)-order // budget; every batch except the
    last spans < budget + max_len tokens; sortedness bounds padding."""
    import ray.data as rd

    from malli_ray.stages.packing import length_sorted_batches

    rng = np.random.default_rng(19)
    n = 5_000
    lens = rng.integers(1, 512, n).astype(np.int64)
    ids = [f"d{i:05d}" for i in range(n)]
    t = pa.table({"doc_id": pa.array(ids),
                  "length": pa.array(lens, pa.int64())})
    budget = 4_000
    got = {r["doc_id"]: (r["length"], r["batch_id"])
           for r in length_sorted_batches(
               rd.from_arrow(t).repartition(8), "doc_id", "length",
               budget_tokens=budget, max_len=512).take_all()}
    order = sorted(range(n), key=lambda i: (lens[i], ids[i]))
    before = 0
    for i in order:
        assert got[ids[i]] == (lens[i], before // budget), ids[i]
        before += int(lens[i])
    # batches are length-contiguous: doc lengths within one batch span
    # at most the sorted neighbourhood
    by_batch = {}
    for di, (L, b) in got.items():
        by_batch.setdefault(b, []).append(L)
    tot = {b: sum(v) for b, v in by_batch.items()}
    for b, s in tot.items():
        if b != max(tot):
            assert s < budget + 512, (b, s)
    import pytest as _p
    with _p.raises(ValueError):
        length_sorted_batches(rd.from_arrow(t), "doc_id", "length",
                              budget_tokens=0, max_len=512)
