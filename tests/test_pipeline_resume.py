"""E2E checkpointed job: verdicts, resume-identical, token-array equality
invariant (SURVEY.md SS5.2.4; BASELINE.json input_hint per-row invariant)."""

import glob
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from malli_ray.sources.sequences import (
    ALLOWED_SOURCES, SEQUENCES_DSL, ensure_sequences, generate_sequences_shard,
)
from malli_ray.stages.validator import ValidationSpec


@pytest.fixture(scope="module")
def seq_dir():
    d = "/tmp/malli_ray_sequences/pytest3k"
    shutil.rmtree(d, ignore_errors=True)
    ensure_sequences(d, 3000, rows_per_shard=1000)
    return d


def make_spec():
    return ValidationSpec(
        schema=SEQUENCES_DSL,
        checks=[{"kind": "list_len_eq", "list_col": "tokens", "len_col": "n_tok",
                 "name": "n_tok_consistency"},
                {"kind": "in_set", "column": "source", "allowed": ALLOWED_SOURCES,
                 "name": "referential_source"}],
        id_column="doc_id",
        hll_columns=["doc_id"], tdigest_columns=["n_tok"], hist_columns=["source"])


def test_generation_deterministic():
    a = generate_sequences_shard(0, 100, 0)
    b = generate_sequences_shard(0, 100, 0)
    assert a.equals(b)


def test_run_job_and_resume(ray_session, seq_dir):
    from malli_ray.pipelines import validation_job as vj

    paths = sorted(glob.glob(seq_dir + "/*.parquet"))
    out = "/tmp/malli_ray_job_pytest"
    shutil.rmtree(out, ignore_errors=True)
    spec = make_spec()
    report = vj.run_job(paths, spec, out, uniqueness_key="doc_id",
                        drift_columns=["source"], concurrency=2)
    assert report["n_rows"] == 3000
    # injected anomalies: per 1000 rows -> 1 dup, 1 mismatch, 1 bogus, .5 null
    expected_invalid_rows = 3 + 3 + 2  # mismatch + bogus + null-source rows
    assert report["n_rows"] - report["n_valid"] == expected_invalid_rows
    assert report["uniqueness"]["duplicate_keys"] == 3
    assert not report["pass"]
    # HLL distinct close to truth (3000 - 3 dups)
    assert abs(report["distinct"]["doc_id"] - 2997) / 2997 < 0.05
    # per-partition lineage present and committed
    assert report["n_partitions"] == 3
    assert all(not p["pass"] for p in report["per_partition"])

    # violations written per fragment, readable
    vio_files = sorted(glob.glob(out + "/violations/*.parquet"))
    assert len(vio_files) == 3
    vio = pq.read_table(vio_files[0])
    assert {"row_index", "id", "column", "path", "type", "message"} <= set(
        vio.schema.names)

    # -- resume: kill one partition's commit record; verdicts identical ----
    recs = sorted(glob.glob(out + "/checkpoint/partitions/*.json"))
    os.unlink(recs[1])
    report2 = vj.run_job(paths, spec, out, uniqueness_key="doc_id",
                         drift_columns=["source"], concurrency=2)
    assert report2["resumed_partitions"] == 2
    for key in ("n_rows", "n_valid", "n_violations", "distinct", "quantiles"):
        assert report2[key] == report[key], key
    assert [p["pass"] for p in report2["per_partition"]] == \
           [p["pass"] for p in report["per_partition"]]
    # drift now scored against the baseline from run 1 (same data -> ~0)
    assert report2["drift"]["source"]["chi2"] < 1e-6


def test_token_array_equality_invariant(ray_session, seq_dir):
    """Tokens must pass through the engine byte-identical (north-rule
    per-row invariant). Verified at the Arrow buffer level."""
    import ray.data as rd
    from malli_ray.pipelines import validation_job as vj

    paths = sorted(glob.glob(seq_dir + "/*.parquet"))
    ds = rd.read_parquet(paths[0])
    spec = make_spec()
    out = vj.validate(ds, spec, concurrency=2)
    result = pa.Table.from_pylist(out.take_all())
    source = pq.read_table(paths[0])
    # row order within one fragment is preserved (single block)
    got = result.column("tokens").combine_chunks()
    want = source.column("tokens").combine_chunks()
    assert got.equals(want.cast(got.type))
    # byte-level check on the flattened values buffer
    gv = np.asarray(got.flatten(), dtype=np.int32)
    wv = np.asarray(want.flatten(), dtype=np.int32)
    assert np.array_equal(gv, wv)


def test_summarize_matches_run_job(ray_session, seq_dir):
    import ray.data as rd
    from malli_ray.pipelines import validation_job as vj

    paths = sorted(glob.glob(seq_dir + "/*.parquet"))
    spec = make_spec()
    rep = vj.summarize(rd.read_parquet(paths), spec, concurrency=2)
    assert rep["n_rows"] == 3000
    assert rep["n_rows"] - rep["n_valid"] == 8
    assert rep["stats"]["source"]["null_count"] == 2
    assert rep["stats"]["n_tok"]["min"] >= 1
    assert sum(rep["stats"]["source"]["hist"].values()) == 3000


def test_run_job_ignores_stale_partitions(ray_session, seq_dir):
    """Re-running with a SUBSET of inputs on the same out_dir must report
    only the subset, not stale committed partitions (review finding)."""
    import glob
    from malli_ray.pipelines import validation_job as vj

    paths = sorted(glob.glob(seq_dir + "/*.parquet"))
    out = "/tmp/malli_ray_job_subset"
    shutil.rmtree(out, ignore_errors=True)
    spec = make_spec()
    full = vj.run_job(paths, spec, out)
    assert full["n_rows"] == 3000
    sub = vj.run_job(paths[:1], spec, out)
    assert sub["n_rows"] == 1000
    assert sub["n_partitions"] == 1


def test_strict_layout_fail_fast(ray_session, seq_dir, tmp_path):
    """strict_layout=True aborts BEFORE processing when the physical schema
    can't satisfy the declared :map layout; default mode records problems."""
    from malli_ray.pipelines.validation_job import SchemaLayoutError, run_job

    paths = sorted(glob.glob(os.path.join(seq_dir, "*.parquet")))
    bad_spec = ValidationSpec(
        schema=["map", ["doc_id", "string"], ["no_such_column", "int"]],
        id_column="doc_id")
    with pytest.raises(SchemaLayoutError) as ei:
        run_job(paths, bad_spec, str(tmp_path / "strict"), strict_layout=True)
    assert ei.value.problems and any("no_such_column" in p
                                     for p in ei.value.problems)
    assert not os.path.exists(str(tmp_path / "strict" / "violations"))
    # non-strict: same spec runs, problems recorded in the report
    rep = run_job(paths, bad_spec, str(tmp_path / "lenient"))
    assert rep["schema_problems"]
    # strict + unverifiable layout (unreadable first file) must ABORT too,
    # never silently degrade to a full run (review regression)
    bad_file = tmp_path / "garbage.parquet"
    bad_file.write_bytes(b"not a parquet file")
    with pytest.raises(SchemaLayoutError):
        run_job([str(bad_file)], bad_spec, str(tmp_path / "strict2"),
                strict_layout=True)


def test_row_group_partitions(ray_session, tmp_path):
    """rowgroups_per_partition: finer resume units; verdicts identical to
    file-level partitioning."""
    from malli_ray.pipelines import validation_job as vj
    from malli_ray.sources.sequences import generate_sequences_shard

    # one file, 8 row groups of 250 rows
    frag = tmp_path / "big-00000.parquet"
    pq.write_table(generate_sequences_shard(0, 2000, 0), frag,
                   row_group_size=250)
    spec = make_spec()
    out_a = str(tmp_path / "out_file")
    ra = vj.run_job([str(frag)], spec, out_a)
    out_b = str(tmp_path / "out_rg")
    rb = vj.run_job([str(frag)], spec, out_b, rowgroups_per_partition=2)
    assert rb["n_partitions"] == 4
    for key in ("n_rows", "n_valid", "n_violations"):
        assert ra[key] == rb[key], key
    # t-digest approximations differ slightly across partitionings
    for q, va in ra["quantiles"]["n_tok"].items():
        vb = rb["quantiles"]["n_tok"][q]
        assert abs(va - vb) / va < 0.05, (q, va, vb)
    # resume one row-group partition only
    recs = sorted(glob.glob(out_b + "/checkpoint/partitions/*.json"))
    os.unlink(recs[2])
    rb2 = vj.run_job([str(frag)], spec, out_b, rowgroups_per_partition=2)
    assert rb2["resumed_partitions"] == 3
    assert rb2["n_rows"] == rb["n_rows"]
    assert rb2["n_violations"] == rb["n_violations"]


def test_cli_pack_blocks(ray_session, seq_dir, tmp_path):
    """The `pack` CLI: truncate -> assemble -> parquet partitioned by
    group; block token totals and the exact-full-block invariant hold,
    and every input token (post-truncate, unique ids) is preserved."""
    from malli_ray import cli

    out = str(tmp_path / "packrun")
    rc = cli.main(["pack", "--input", seq_dir, "--out", out,
                   "--block-size", "512", "--truncate", "1024",
                   "--num-cpus", "4"])
    assert rc == 0
    files = sorted(glob.glob(os.path.join(out, "blocks", "**", "*.parquet"),
                             recursive=True))
    assert files and any("source=" in f for f in files)
    t = pa.concat_tables([
        pq.read_table(f, columns=["block_id", "n_tokens", "n_docs"])
        for f in files])
    n_tok = t.column("n_tokens").to_numpy()
    assert (n_tok <= 512).all() and (n_tok > 0).all()
    # totals: sum of block tokens == sum of clipped lengths over the
    # surviving docs (rows of duplicated ids are dropped up front — a
    # duplicated id makes the concat order ill-defined and RAISES in the
    # op itself)
    import collections

    import pyarrow.compute as pc2
    src = pq.read_table(seq_dir)
    ids = src.column("doc_id").to_pylist()
    counts = collections.Counter(ids)
    keep = pa.array([counts[i] == 1 for i in ids])
    lens = pc2.list_value_length(src.filter(keep).column("tokens"))
    clipped = pc2.min_element_wise(pc2.cast(lens, pa.int64()),
                                   pa.scalar(1024, pa.int64()))
    assert int(np.sum(n_tok)) == int(pc2.sum(clipped).as_py())


def test_cli_pack_expectations(ray_session, seq_dir, tmp_path, capsys):
    """pack --expect: rules assert over the WRITTEN blocks table and gate
    the exit code — a passing pack keeps exit 0 with verdicts in the
    report; an impossible bound exits 1."""
    import json

    from malli_ray import cli

    def run(expect, out):
        rc = cli.main(["pack", "--input", seq_dir, "--out",
                       str(tmp_path / out), "--block-size", "512",
                       "--num-cpus", "4",
                       *[x for e in expect for x in ("--expect", e)]])
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        return rc, rep

    rc, rep = run(["row_count_between:1:1e9", "min_ge:n_docs:1",
                   "max_le:n_tokens:512"], "pk_ok")
    assert rc == 0 and all(v["ok"] for v in rep["expectations"])
    assert rep["expectations"][0]["observed_i"] == rep["blocks"]

    rc, rep = run(["max_le:n_tokens:10"], "pk_bad")
    assert rc == 1
    assert [v["ok"] for v in rep["expectations"]] == [False]


def test_cli_validate_expectations(ray_session, seq_dir, tmp_path, capsys):
    """--expect rules land in the report and gate the exit code: a passing
    suite keeps the job's own verdict; a failing cardinality rule flips
    pass to False (exit 1); malformed rules exit with a one-line message."""
    import json

    from malli_ray import cli

    schema = tmp_path / "schema.json"
    schema.write_text(json.dumps(
        ["map", ["doc_id", ["string", {"min": 1}]]]))

    def run(expect, out):
        rc = cli.main([
            "validate", "--input", seq_dir, "--schema", str(schema),
            "--out", str(tmp_path / out), "--num-cpus", "4",
            *[x for e in expect for x in ("--expect", e)]])
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        return rc, rep

    rc, rep = run(["row_count_between:1:1e9", "null_rate_lt:source:0.01",
                   "mean_between:n_tok:200:600", "min_ge:n_tok:1"], "e1")
    assert all(r["ok"] for r in rep["expectations"])
    assert rep["expectations"][0]["observed_i"] == 3000
    assert rc == (0 if rep["pass"] else 1)

    # 'bogus' + null source -> 6 distinct (nulls excluded) > 4 -> fail
    rc, rep = run(["distinct_count_between:source:1:4"], "e2")
    assert rc == 1 and rep["pass"] is False
    assert rep["expectations"][0]["observed_i"] == 6

    with pytest.raises(SystemExit, match="unknown --expect kind"):
        cli.main(["validate", "--input", seq_dir, "--schema", str(schema),
                  "--out", str(tmp_path / "e3"), "--num-cpus", "4",
                  "--expect", "nope:1"])


def test_cli_pack_scrub_dup_spans(ray_session, tmp_path, capsys):
    """pack --scrub-dup-spans K: Lee-2021 token-span scrub before
    assembly — a motif shared by half the docs survives only in its
    first occurrence; token conservation holds net of the scrub."""
    import json

    import numpy as np
    import pyarrow.compute as pc2

    from malli_ray import cli

    rng = np.random.default_rng(21)
    motif = rng.integers(0, 50_000, 20).tolist()
    rows, ids = [], []
    for i in range(600):
        body = rng.integers(0, 50_000, 40).tolist()
        if i % 2 == 0:
            body = body[:10] + motif + body[10:]
        rows.append(body)
        ids.append(f"d{i:05d}")
    inp = tmp_path / "scrub_in"
    inp.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array(ids),
                  "tokens": pa.array(rows, pa.list_(pa.int32())),
                  "source": pa.array(["web"] * len(ids))}),
        inp / "part-0.parquet")
    out = tmp_path / "pk"
    rc = cli.main(["pack", "--input", str(inp), "--out", str(out),
                   "--block-size", "256", "--scrub-dup-spans", "10",
                   "--num-cpus", "4"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # every copy beyond the first loses (at least) the 20-token motif
    assert rep["scrubbed_tokens"] >= 299 * 20
    files = sorted(glob.glob(os.path.join(str(out), "blocks", "**",
                                          "*.parquet"), recursive=True))
    t = pa.concat_tables([pq.read_table(f, columns=["n_tokens"])
                          for f in files])
    total_in = sum(len(r) for r in rows)
    assert int(pc2.sum(t.column("n_tokens")).as_py()) == \
        total_in - rep["scrubbed_tokens"]


def test_cli_report(ray_session, seq_dir, capsys):
    """The `report` CLI: coverage / overlap / growth sections over a
    tokenized table, with set-exact invariants — coverage monotone in k,
    growth monotone with the final prefix equal to the corpus type
    count, overlap pairs unordered and complete over non-null sources."""
    import json

    from malli_ray import cli

    rc = cli.main(["report", "--input", seq_dir, "--num-cpus", "4",
                   "--coverage-ks", "10,1000,100000",
                   "--growth-shards", "4"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    d = json.loads(out)
    assert rc == 0
    assert d["n_rows"] == 3000 and d["n_null_token_rows"] == 0
    cov = d["coverage"]
    assert [r["k"] for r in cov] == [10, 1000, 100000]
    assert cov[0]["covered"] <= cov[1]["covered"] <= cov[2]["covered"]
    assert cov[2]["covered"] == d["total_tokens"]     # k > vocab covers all
    assert cov[2]["coverage"] == 1.0
    gr = d["growth"]
    assert [r["group"] for r in gr] == [0, 1, 2, 3]
    assert all(a["n_types_cum"] <= b["n_types_cum"]
               for a, b in zip(gr, gr[1:]))
    assert gr[-1]["n_tokens_cum"] == d["total_tokens"]
    assert gr[-1]["n_types_cum"] == cov[0]["n_distinct"]
    srcs = {r["group_a"] for r in d["overlap"]} | \
        {r["group_b"] for r in d["overlap"]}
    n = len(srcs)
    assert len(d["overlap"]) == n * (n - 1) // 2
    assert all(r["group_a"] < r["group_b"] for r in d["overlap"])


def test_cli_scrub_decon_paths(ray_session, tmp_path, capsys):
    """The decontamination-by-removal CLI stages: corpus-prep
    --scrub-decon (word probes parquet) scrubs probe phrases in place;
    pack --scrub-decon (token probes JSON) reports the scrubbed count
    and packs the cleaned stream."""
    import json

    from malli_ray import cli

    # --- corpus-prep: word-level ---
    inp = tmp_path / "cin"; inp.mkdir()
    prb = tmp_path / "cprobes"; prb.mkdir()
    docs = pa.table({
        "doc_id": ["d0", "d1", "d2"],
        "text": ["alpha beta gamma delta", "no match here",
                 "x alpha beta gamma y"],
        "source": ["a", "b", "a"]})
    pq.write_table(docs, str(inp / "p.parquet"))
    pq.write_table(pa.table({"doc_id": ["p"],
                             "text": ["alpha beta gamma"]}),
                   str(prb / "p.parquet"))
    rc = cli.main(["corpus-prep", "--input", str(inp), "--out",
                   str(tmp_path / "cout"), "--scrub-decon", str(prb),
                   "--scrub-decon-k", "3", "--num-cpus", "4"])
    capsys.readouterr()
    assert rc == 0
    got = {r["doc_id"]: r["text"] for r in pa.concat_tables(
        [pq.read_table(f) for f in glob.glob(
            str(tmp_path / "cout") + "/**/*.parquet", recursive=True)]
        ).to_pylist()}
    assert got == {"d0": "delta", "d1": "no match here", "d2": "x y"}

    # --- pack: token-level ---
    sin = tmp_path / "sin"; sin.mkdir()
    rows = [list(range(20)), [7, 7, 7, 7, 7], list(range(100, 130))]
    pq.write_table(pa.table({
        "doc_id": ["s0", "s1", "s2"],
        "tokens": pa.array(rows, pa.list_(pa.int32())),
        "source": ["w", "w", "w"]}), str(sin / "p.parquet"))
    probes = [list(range(4, 8)), [7, 7, 7, 7]]
    pf = tmp_path / "probes.json"
    pf.write_text(json.dumps(probes))
    rc = cli.main(["pack", "--input", str(sin), "--out",
                   str(tmp_path / "pout"), "--block-size", "16",
                   "--scrub-decon", str(pf), "--num-cpus", "4"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rep = json.loads(out)
    assert rc == 0
    # s0 loses positions 4..7 (4 tokens); s1 loses all 5 (windows
    # overlap-merge); s2 untouched
    assert rep["decon_scrubbed_tokens"] == 9
    total = sum(r["n_tokens"] for f in glob.glob(
        str(tmp_path / "pout") + "/blocks/**/*.parquet", recursive=True)
        for r in pq.read_table(f, columns=["n_tokens"]).to_pylist())
    assert total == (20 - 4) + 0 + 30
    # malformed probes files exit with a one-line message, whatever the
    # malformation raises internally (ValueError AND TypeError shapes)
    for payload in ("[[1,2],[3]]", "42", "[5, [1,2]]"):
        bad = tmp_path / "bad.json"; bad.write_text(payload)
        with pytest.raises(SystemExit):
            cli.main(["pack", "--input", str(sin), "--out",
                      str(tmp_path / "pout2"), "--scrub-decon",
                      str(bad), "--num-cpus", "4"])
