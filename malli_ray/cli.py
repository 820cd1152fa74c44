"""CLI job entry: run (or resume) a checkpointed validation job.

The ``ray job submit`` entry point of the engine (SURVEY.md SS7.0 cli.py):

    python -m malli_ray.cli validate \
        --input '/data/sequences/*.parquet' \
        --schema schema.json \
        --out /out/run1 \
        --id-column doc_id --uniqueness-key doc_id \
        --hll doc_id --tdigest n_tok --hist source --drift source \
        --check list_len_eq:tokens:n_tok --allowed source:web,books

Re-running the same command resumes from the checkpoint (identical verdicts).
Owns its Ray session (guarded); library code never calls ray.init.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def _build_spec(args) -> "ValidationSpec":
    from .serialize import jsonable_to_form
    from .stages.validator import ValidationSpec

    try:
        with open(args.schema) as f:
            schema_form = jsonable_to_form(json.load(f))
    except FileNotFoundError:
        raise SystemExit(f"schema file not found: {args.schema}")
    except json.JSONDecodeError as e:
        raise SystemExit(f"schema file is not valid JSON: {args.schema}: {e}")

    checks = []
    for c in args.check or []:
        kind, *rest = c.split(":")
        if kind == "list_len_eq":
            checks.append({"kind": "list_len_eq", "list_col": rest[0],
                           "len_col": rest[1],
                           "name": f"{rest[1]}_consistency"})
        elif kind in ("col_eq", "col_le", "col_ge"):
            checks.append({"kind": kind, "left": rest[0], "right": rest[1],
                           "name": c})
        else:
            raise SystemExit(f"unknown --check kind: {kind}")
    for a in args.allowed or []:
        col, vals = a.split(":", 1)
        checks.append({"kind": "in_set", "column": col,
                       "allowed": vals.split(","),
                       "name": f"referential_{col}"})

    hist = list(args.hist or [])
    # drift needs fused histograms: auto-include drift columns
    for c in (args.drift or []):
        if c not in hist:
            hist.append(c)
    return ValidationSpec(
        schema=schema_form, checks=checks, id_column=args.id_column,
        hll_columns=args.hll or [], tdigest_columns=args.tdigest or [],
        hist_columns=hist,
        max_violations_per_batch=args.max_violations)


def _stage_checkpoint(ds, args, paths, stages, tag):
    """Re-execution guard before a multi-pass stage.

    Default: ``materialize()`` into the object store (the measured
    corpus_prep_v2 lesson — without it every extra pass re-executes the
    upstream chain).  With ``--checkpoint-dir``: a partitioned-parquet
    checkpoint keyed by a digest of (input paths, stage chain so far) —
    the 100 TB shape: a failed run restarts from the last FINISHED
    checkpoint (``<name>._SUCCESS`` marker) instead of recomputing hours
    of upstream work, and a changed flag set changes the key, so stale
    checkpoints can never be silently reused.  A partial directory from
    a killed run (no marker) is cleared and rewritten."""
    if not getattr(args, "checkpoint_dir", None):
        return ds.materialize()
    import hashlib
    import shutil

    import ray.data as rdata

    key = hashlib.sha256(json.dumps([sorted(paths), stages, tag])
                         .encode()).hexdigest()[:12]
    path = os.path.join(args.checkpoint_dir, f"{tag}-{key}")
    marker = path + "._SUCCESS"
    if os.path.exists(marker):
        return rdata.read_parquet(path)
    if os.path.exists(path):
        shutil.rmtree(path)
    ds.write_parquet(path)
    with open(marker, "w"):
        pass
    return rdata.read_parquet(path)


def _run_corpus_prep(args, paths: list[str]) -> int:
    """Assemble the requested operator chain (fixed order: normalize ->
    gopher/compression quality filters -> bloom -> line scrub -> span scrub -> dedup ->
    decontaminate -> outliers -> rebalance -> chunk), write partitioned
    parquet to <out>/data/, print a one-line JSON report."""
    import glob as _glob

    import ray.data as rdata

    from .stages import dedup, joins, packing, sampling, text as T

    ds = rdata.read_parquet(paths)
    rows_in = ds.count()
    stages = []
    tc, idc = args.text_column, args.id_column

    if args.strip_html:
        ds = T.strip_html(ds, tc)
        stages.append("strip_html")
    if args.normalize:
        ds = T.normalize_text(ds, tc)
        stages.append("normalize")
    if args.lang:
        ds = T.add_lang_id(ds, tc)
        ds = ds.filter(expr=f"lang_pred == '{args.lang}'")
        ds = ds.map_batches(lambda b: b.drop_columns(["lang_pred"]),
                            batch_format="pyarrow")
        stages.append(f"lang({args.lang})")
    if args.dedup_lines:
        ds = T.dedup_lines_within_doc(ds, tc)
        ds = ds.map_batches(
            lambda b: b.drop_columns(["n_dup_lines_dropped"]),
            batch_format="pyarrow")
        stages.append("dedup_lines")
    if args.domain_blocklist:
        bl = tuple(d.strip() for d in args.domain_blocklist.split(",")
                   if d.strip())
        ds = T.domain_filter(ds, tc, idc, blocklist=bl, mode="drop")
        stages.append(f"domain_blocklist({len(bl)} domains)")
    if args.c4 is not None:
        ds = T.c4_rules(ds, tc, idc, min_sentences=args.c4, append=True)
        ds = ds.filter(expr="pass_c4 == True")

        def _swap_c4(b):
            i = b.schema.get_field_index(tc)
            return (b.set_column(i, tc, b.column("text_clean"))
                    .drop_columns(["n_lines", "n_kept_lines",
                                   "n_sentences", "has_lorem_ipsum",
                                   "has_brace", "has_bad_word", "pass_c4",
                                   "text_clean"]))

        ds = ds.map_batches(_swap_c4, batch_format="pyarrow")
        stages.append(f"c4(min_sentences={args.c4})")
    if args.gopher is not None:
        ds = T.gopher_rules(ds, tc, idc, min_words=args.gopher,
                            min_stop_hits=1, append=True)
        ds = ds.filter(expr="pass_gopher == True")

        def _drop_gopher(b):
            return b.drop_columns(
                ["n_words", "mean_word_len", "symbol_ratio", "alpha_ratio",
                 "bullet_ratio", "ellipsis_ratio", "stop_hits",
                 "pass_gopher"])

        ds = ds.map_batches(_drop_gopher, batch_format="pyarrow")
        stages.append(f"gopher(min_words={args.gopher})")
    if args.compression:
        lo, hi = (float(x) for x in args.compression.split(":", 1))
        import zlib as _zlib

        def _comp_filter(b):
            import pyarrow as _pa
            keep = []
            for t in b.column(tc).to_pylist():
                raw = (t or "").encode("utf-8")
                r = len(_zlib.compress(raw, 6)) / max(len(raw), 1)
                keep.append(lo <= r <= hi)
            return b.filter(_pa.array(keep))

        ds = ds.map_batches(_comp_filter, batch_format="pyarrow")
        stages.append(f"compression({lo}:{hi})")
    if args.min_entropy is not None:
        ds = T.add_entropy(ds, tc, idc)
        ds = ds.filter(expr=f"entropy >= {float(args.min_entropy)}")
        ds = ds.map_batches(
            lambda b: b.drop_columns(["n_words", "ent_q", "entropy"]),
            batch_format="pyarrow")
        stages.append(f"min_entropy({args.min_entropy})")
    if args.lm_logprob:
        lo, hi = (float(x) for x in args.lm_logprob.split(":", 1))
        # the LM needs two table-building passes over the stream + the
        # scoring pass: checkpoint once so upstream filters don't
        # re-execute 3x (--checkpoint-dir makes this a resumable parquet
        # checkpoint; default is an in-memory materialize)
        ds = _stage_checkpoint(ds, args, paths, stages, "pre-lm")
        ds = T.bigram_lm_score(ds, tc, idc)
        ds = ds.filter(
            expr=f"avg_logprob >= {lo} and avg_logprob <= {hi}")
        ds = ds.map_batches(
            lambda b: b.drop_columns(["n_bigrams", "lp_q",
                                      "avg_logprob"]),
            batch_format="pyarrow")
        stages.append(f"lm_logprob({lo}:{hi})")
    if args.seen_bloom:
        from .state.bloom import BloomFilter
        bloom = BloomFilter.load(args.seen_bloom)
        ds = dedup.filter_seen_bloom(ds, tc, bloom)
        stages.append(f"seen_bloom({args.seen_bloom})")
    if args.seen_bands:
        import pyarrow.compute as _pcc
        digest = dedup.BandDigest.load(args.seen_bands)
        ds = dedup.probe_band_digest(ds, tc, idc, digest, append=True)
        ds = ds.map_batches(
            lambda b: b.filter(_pcc.invert(b.column("candidate")))
                       .drop_columns(["n_band_hits", "candidate"]),
            batch_format="pyarrow")
        stages.append(f"seen_bands({args.seen_bands})")
    if args.drop_frequent_lines:
        ds = dedup.drop_frequent_lines(
            ds, tc, min_count=args.drop_frequent_lines,
            out_column=tc + "_clean")

        def _swap_clean(b):
            i = b.schema.get_field_index(tc)
            return (b.set_column(i, tc, b.column(tc + "_clean"))
                    .drop_columns([tc + "_clean", "n_lines_dropped"]))

        ds = ds.map_batches(_swap_clean, batch_format="pyarrow")
        stages.append(f"drop_frequent_lines(min_count="
                      f"{args.drop_frequent_lines})")
    if args.scrub_decon:
        # decontamination by REMOVAL: probe-corpus word k-grams drop
        # from the text (map-only — probe gram pairs broadcast once)
        p = args.scrub_decon
        pfiles = sorted(glob.glob(os.path.join(p, "*.parquet")
                                  if os.path.isdir(p) else p))
        if not pfiles:
            raise SystemExit(f"no parquet files match --scrub-decon "
                             f"{p!r}")
        probe_ds = rdata.read_parquet(pfiles, columns=[tc])
        ds = T.scrub_probe_word_spans(ds, probe_ds, tc, idc,
                                      k=args.scrub_decon_k,
                                      out_column=tc + "_dc")

        def _swap_dc(b):
            names = [tc if c == tc + "_dc" else c for c in b.column_names]
            return (b.rename_columns(names)
                    .drop_columns(["n_words_scrubbed"]))

        ds = ds.map_batches(_swap_dc, batch_format="pyarrow")
        stages.append(f"scrub_decon(k={args.scrub_decon_k})")
    if args.remove_dup_spans:
        # Lee-2021 exact substring scrub: covered words drop, every
        # other column rides the doc-keyed exchange (keep_columns).
        # remove_duplicate_spans consumes its input TWICE (gram-occurrence
        # exchange + the docs side of the tag+union join), and the
        # schema() probe below can trigger a partial execution too —
        # checkpoint once so the upstream filter chain doesn't re-run
        # per consumer (the same q21 guard the lm_logprob stage uses)
        ds = _stage_checkpoint(ds, args, paths, stages, "pre-spans")
        others = [c for c in ds.schema(fetch_if_missing=True)
                  .base_schema.names if c not in (tc, idc)]
        ds = dedup.remove_duplicate_spans(
            ds, tc, idc, k=args.remove_dup_spans,
            out_column=tc + "_sd", keep_columns=others)

        def _swap_sd(b):
            names = [tc if c == tc + "_sd" else c for c in b.column_names]
            return b.rename_columns(names).drop_columns(
                ["n_words_dropped"])

        ds = ds.map_batches(_swap_sd, batch_format="pyarrow")
        stages.append(f"remove_dup_spans(k={args.remove_dup_spans})")
    if args.dedup == "exact":
        kept = dedup.exact_dedup_keep_first(ds, tc, idc)
        ds = joins.semi_join(ds, kept, on=idc)
        stages.append("dedup_exact")
    if args.url_dedup:
        import pyarrow.compute as _pc

        ds = T.canonicalize_urls(ds, args.url_dedup)
        # SQL semantics: NULL keys never match each other — a relative or
        # malformed URL canonicalizes to null, and hashing the null-keyed
        # rows would collapse ALL of them into one dedup group (polars
        # Series.hash maps every null to the same value).  Dedup only the
        # non-null partition; null-URL rows always survive.

        def _nn(b):
            return b.filter(_pc.is_valid(b.column("canonical_url")))

        def _nu(b):
            return b.filter(_pc.is_null(b.column("canonical_url")))

        kept = dedup.exact_dedup_keep_first(
            ds.map_batches(_nn, batch_format="pyarrow"),
            "canonical_url", idc)
        null_ids = (ds.map_batches(_nu, batch_format="pyarrow")
                    .select_columns([idc]))
        ds = joins.semi_join(ds, kept.union(null_ids),
                             on=idc).drop_columns(["canonical_url"])
        stages.append(f"url_dedup({args.url_dedup})")
    if args.decontaminate:
        probe_paths = sorted(_glob.glob(args.decontaminate))
        if not probe_paths:
            raise SystemExit(
                f"no parquet files match {args.decontaminate!r}")
        probes = rdata.read_parquet(probe_paths)
        ds = T.ngram_contamination(ds, tc, idc, probes, k=args.ngram)
        ds = ds.filter(expr="n_hit == 0")
        stages.append(f"decontaminate(k={args.ngram})")
    if args.outliers or args.rebalance or args.top_fraction:
        # outliers and rebalance are both two-pass (a tiny stats pass, then
        # the filter), and each pass would re-execute the upstream chain
        # lazily — checkpoint ONCE before the first of them; everything
        # between is a shuffle-free filter that is cheap to re-run
        ds = _stage_checkpoint(ds, args, paths, stages, "pre-stats")
    if args.outliers:
        g, v = args.outliers.split(":", 1)
        ds = sampling.filter_outliers_by_group(ds, g, v)
        stages.append(f"outliers({g}:{v})")
    if args.rebalance:
        if args.temperature is not None:
            ds = sampling.rebalance_by_temperature(
                ds, args.rebalance, idc, alpha=args.temperature)
            stages.append(f"rebalance({args.rebalance},"
                          f"alpha={args.temperature})")
        else:
            ds = sampling.rebalance_to_uniform(ds, args.rebalance, idc)
            stages.append(f"rebalance({args.rebalance})")
    if args.top_fraction:
        g, s, f = args.top_fraction.split(":")
        ds = sampling.top_fraction_by_group(ds, g, s, idc, float(f))
        ds = ds.drop_columns(["rk"])
        stages.append(f"top_fraction({g}:{s}:{f})")
    if args.upsample:
        g, spec = args.upsample.split(":", 1)
        factors, default = {}, 1.0
        for part in spec.split(","):
            name, fv = part.split("=", 1)
            if name == "default":
                default = float(fv)
            else:
                factors[name] = float(fv)
        ds = sampling.upsample_by_group_factor(
            ds, g, idc, factors, default_factor=default)
        stages.append(f"upsample({args.upsample})")
    if args.chunk:
        size, stride = (int(x) for x in args.chunk.split(":", 1))
        ds = packing.chunk_text(ds, tc, idc, size=size, stride=stride)
        stages.append(f"chunk({size}:{stride})")
    if args.pack:
        g, cnt, bs = args.pack.split(":")
        ds = packing.concat_token_blocks(ds, g, idc, cnt, int(bs))
        stages.append(f"pack({args.pack})")
    partition_cols = []
    if args.split:
        fractions = {}
        for part in args.split.split(","):
            label, frac = part.split(":", 1)
            fractions[label] = float(frac)
        ds = sampling.split_by_hash(ds, idc, fractions)
        partition_cols.append("split")
        stages.append(f"split({args.split})")
    if args.shards:
        ds = sampling.assign_shards(ds, idc, args.shards)
        partition_cols.append("shard")
        stages.append(f"shards({args.shards})")

    out_dir = os.path.join(args.out, "data")
    ds.write_parquet(out_dir, partition_cols=partition_cols or None)
    import pyarrow.parquet as pq
    rows_out = sum(pq.read_metadata(f).num_rows
                   for f in sorted(_glob.glob(
                       os.path.join(out_dir, "**", "*.parquet"),
                       recursive=True)))
    print(json.dumps({"rows_in": rows_in, "rows_out": rows_out,
                      "stages": stages, "out": out_dir}))
    return 0


def _run_pack(args, paths: list[str]) -> int:
    """Trainer-data terminal job: (optional truncate) -> assemble packed
    blocks (input_ids / position_ids / segment_ids) -> parquet
    partitioned by group, so a consumer reads one corpus slice without
    touching the rest and a failed downstream job re-reads per-partition."""
    import glob as _glob

    import pyarrow.parquet as pq
    import ray.data as rdata

    from .stages import packing

    ds = rdata.read_parquet(paths)
    rows_in = ds.count()  # metadata-only on a fresh parquet read
    sch = ds.schema(fetch_if_missing=False)
    if args.tokens_column not in sch.base_schema.names:
        raise SystemExit(f"--tokens-column {args.tokens_column!r} not in "
                         f"input schema {sch.base_schema.names}")
    tok_t = sch.base_schema.field(args.tokens_column).type
    # duplicated ids make the concat order ill-defined (assembly RAISES
    # on them): drop every row of a duplicated id up front — one
    # key-only uniqueness scan, the dup set broadcasts into a map-side
    # filter — and report the count honestly
    import numpy as _np
    import pyarrow as _pa
    import ray as _ray

    from .stages.constraints import uniqueness_violations

    dup_rows = uniqueness_violations(
        ds.select_columns([args.id_column]), args.id_column).take_all()
    if len(dup_rows) > 1_000_000:
        raise SystemExit(
            f"{len(dup_rows)} duplicated {args.id_column!r} values — run "
            f"corpus-prep --dedup first instead of packing raw duplicates")
    dropped_dup_rows = 0
    if dup_rows:
        idc = args.id_column
        dup_ref = _ray.put(_np.sort(_np.array(
            [r[idc] for r in dup_rows],
            dtype=_np.str_ if isinstance(dup_rows[0][idc], str)
            else None)))

        def drop_dups(batch):
            dups = _ray.get(dup_ref)
            ids = batch.column(idc).to_numpy(zero_copy_only=False)
            ids = ids.astype(dups.dtype)
            i = _np.searchsorted(dups, ids)
            hit = ((i < len(dups))
                   & (dups[_np.minimum(i, len(dups) - 1)] == ids))
            return batch.filter(_pa.array(~hit))

        ds = ds.map_batches(drop_dups, batch_format="pyarrow")
        dropped_dup_rows = sum(int(r["cnt"]) for r in dup_rows)
    decon_scrubbed_tokens = 0
    if args.scrub_decon:
        # decontamination by REMOVAL before packing: exact benchmark
        # probe n-gram windows drop from the token stream (map-only)
        from .stages import text as _text

        try:
            with open(args.scrub_decon) as f:
                probes = json.load(f)
        except (OSError, json.JSONDecodeError) as e:
            raise SystemExit(f"cannot read --scrub-decon probes: {e}")
        try:
            ds = _text.scrub_probe_token_spans(
                ds, probes, args.tokens_column, args.id_column,
                out_column=args.tokens_column + "_dc",
                drop_count_column="__n_decon__")
        except (ValueError, TypeError) as e:
            # TypeError: probes JSON parsed but isn't a list of int
            # lists (e.g. a bare int) — same one-line contract
            raise SystemExit(f"--scrub-decon: {e}")

        def _swap_dc(b):
            names = [args.tokens_column if c == args.tokens_column + "_dc"
                     else c for c in b.column_names]
            return b.rename_columns(names)

        # materialize once: the decon sum + the assembly's two consumers
        # would otherwise re-run the scan chain per consumer (q21 guard)
        ds = ds.map_batches(_swap_dc, batch_format="pyarrow").materialize()
        decon_scrubbed_tokens = int(ds.sum("__n_decon__") or 0)
        ds = ds.map_batches(
            lambda b: b.drop_columns(["__n_decon__"]),
            batch_format="pyarrow")
    scrubbed_tokens = 0
    if args.scrub_dup_spans:
        # Lee-2021 exact substring scrub at token granularity BEFORE
        # packing (train on each span once); other columns (the group
        # column) ride the doc-keyed exchange
        from .stages import dedup as _dedup

        others = [c for c in sch.base_schema.names
                  if c not in (args.tokens_column, args.id_column)]
        ds = _dedup.remove_duplicate_token_spans(
            ds, args.tokens_column, args.id_column,
            k=args.scrub_dup_spans, out_column=args.tokens_column + "_sd",
            keep_columns=others)

        def _swap_sd(b):
            names = [args.tokens_column if c == args.tokens_column + "_sd"
                     else c for c in b.column_names]
            return b.rename_columns(names)

        ds = ds.map_batches(_swap_sd, batch_format="pyarrow")
        # assemble consumes its input twice (counts + payload) and the
        # scrub chain is expensive — materialize once (the q21 guard)
        ds = ds.materialize()
        scrubbed_tokens = int(ds.sum("n_tokens_dropped") or 0)
        ds = ds.map_batches(
            lambda b: b.drop_columns(["n_tokens_dropped"]),
            batch_format="pyarrow")
    if args.truncate:
        ds = packing.truncate_sequences(ds, args.tokens_column,
                                        max_len=args.truncate,
                                        count_column=None)
    blocks = packing.assemble_packed_blocks(
        ds, tokens_column=args.tokens_column, id_column=args.id_column,
        group_column=args.group_column, block_size=args.block_size,
        null_group="__null__", num_buckets=args.num_buckets,
        tokens_type=tok_t)
    out_dir = os.path.join(args.out, "blocks")
    blocks.write_parquet(out_dir, partition_cols=[args.group_column])
    n_blocks = sum(pq.read_metadata(f).num_rows
                   for f in sorted(_glob.glob(
                       os.path.join(out_dir, "**", "*.parquet"),
                       recursive=True)))
    report = {"rows_in": rows_in, "blocks": n_blocks,
              "dropped_dup_rows": dropped_dup_rows,
              "scrubbed_tokens": scrubbed_tokens,
              "decon_scrubbed_tokens": decon_scrubbed_tokens,
              "block_size": args.block_size, "out": out_dir}
    rc = 0
    if getattr(args, "expect", None):
        # assert over the WRITTEN blocks (the artifact a trainer reads),
        # not the lazy pipeline — one projected re-read, no re-assembly
        from .stages.constraints import expectations_report
        rules = _parse_expect_rules(args.expect)
        need = sorted({r["column"] for r in rules if "column" in r})
        # column-less rules (row_count_between) still need rows to count,
        # but never the token payload — project ONE cheap scalar column
        scan = rdata.read_parquet(out_dir, columns=need or ["block_id"])
        verdicts = expectations_report(scan, rules).to_pylist()
        report["expectations"] = verdicts
        if any(not v["ok"] for v in verdicts):
            rc = 1
    print(json.dumps(report))
    return rc


def _run_report(args, paths: list[str]) -> int:
    """Corpus diagnostics JSON over a tokenized table: coverage curve
    (top-k type coverage of occurrences), per-source vocabulary overlap
    (type jaccard per pair) and the Heaps-law growth curve over hash(id)
    shards.  One cleaned materialization feeds all three passes (the
    q21 multi-consumer guard); null token lists are dropped and counted,
    null sources fold to ''."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pcc
    import ray.data as rdata

    from .stages.analytics import (vocab_coverage, vocab_growth_curve,
                                   vocab_overlap_by_group)
    from .state.sketches import hash64

    tc, idc, srcc = args.tokens_column, args.id_column, args.source_column
    cols = [c for c in dict.fromkeys((tc, idc, srcc)) if c]
    ds = rdata.read_parquet(paths, columns=cols)

    def clean(b: pa.Table) -> pa.Table:
        b = b.filter(pcc.is_valid(b.column(tc)))
        if srcc:
            i = b.schema.get_field_index(srcc)
            b = b.set_column(i, srcc, pcc.fill_null(
                b.column(srcc), pa.scalar("", pa.string())))
        return b

    bounded = (0, args.vocab)
    try:
        ks = [int(x) for x in args.coverage_ks.split(",") if x]
    except ValueError:
        raise SystemExit(f"--coverage-ks must be comma-separated ints, "
                         f"got {args.coverage_ks!r}")
    if not ks or any(k < 1 for k in ks):
        raise SystemExit("--coverage-ks must name at least one cutoff "
                         ">= 1")
    n_input = ds.count()  # parquet metadata count
    ds = ds.map_batches(clean, batch_format="pyarrow").materialize()

    report: dict = {"n_rows": ds.count()}
    report["n_null_token_rows"] = n_input - report["n_rows"]
    cov = vocab_coverage(ds, tc, bounded_range=bounded, ks=ks)
    report["total_tokens"] = (int(cov.column("total")[0].as_py())
                              if cov.num_rows else 0)
    report["coverage"] = cov.to_pylist()
    if srcc:
        report["overlap"] = vocab_overlap_by_group(
            ds, tc, srcc, bounded_range=bounded).to_pylist()
    if args.growth_shards:
        nsh = np.uint64(args.growth_shards)

        def shard(b: pa.Table) -> pa.Table:
            h = (hash64(b.column(idc), seed=31) % nsh).astype(np.int64)
            return pa.table({tc: b.column(tc), "__shard__": pa.array(h)})

        report["growth"] = vocab_growth_curve(
            ds.map_batches(shard, batch_format="pyarrow"), tc,
            "__shard__", bounded_range=bounded).to_pylist()
    print(json.dumps(report))
    return 0


def _parse_expect_rules(specs: list[str]) -> list[dict]:
    """--expect RULE parser → constraints.expectations_report rule dicts.
    Malformed specs exit with a one-line message (the CLI contract)."""
    rules = []
    for s in specs:
        kind, *rest = s.split(":")
        try:
            if kind == "row_count_between":
                rules.append({"kind": kind, "lo": int(float(rest[0])),
                              "hi": int(float(rest[1])), "name": s})
            elif kind == "null_rate_lt":
                rules.append({"kind": kind, "column": rest[0],
                              "max_rate": float(rest[1]), "name": s})
            elif kind == "mean_between":
                rules.append({"kind": kind, "column": rest[0],
                              "lo": float(rest[1]), "hi": float(rest[2]),
                              "name": s})
            elif kind in ("min_ge", "max_le"):
                rules.append({"kind": kind, "column": rest[0],
                              "value": float(rest[1]), "name": s})
            elif kind == "distinct_count_between":
                rules.append({"kind": kind, "column": rest[0],
                              "lo": int(float(rest[1])),
                              "hi": int(float(rest[2])), "name": s})
            else:
                raise SystemExit(f"unknown --expect kind: {kind}")
        except (IndexError, ValueError):
            raise SystemExit(f"malformed --expect rule: {s!r}")
    return rules


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="malli_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("validate", help="run/resume a checkpointed validation job")
    v.add_argument("--input", required=True,
                   help="parquet glob or directory")
    v.add_argument("--schema", required=True, help="schema JSON file (DSL form)")
    v.add_argument("--out", required=True, help="output/checkpoint directory")
    v.add_argument("--id-column")
    v.add_argument("--uniqueness-key")
    v.add_argument("--hll", action="append")
    v.add_argument("--tdigest", action="append")
    v.add_argument("--hist", action="append")
    v.add_argument("--drift", action="append")
    v.add_argument("--check", action="append",
                   help="cross-column check, e.g. list_len_eq:tokens:n_tok")
    v.add_argument("--allowed", action="append",
                   help="referential small side, e.g. source:web,books")
    v.add_argument("--expect", action="append", metavar="RULE",
                   help="assertion rule, repeatable: row_count_between:LO:HI"
                        " | null_rate_lt:COL:RATE | mean_between:COL:LO:HI"
                        " | min_ge:COL:V | max_le:COL:V"
                        " | distinct_count_between:COL:LO:HI — verdicts "
                        "land in the report under 'expectations' and gate "
                        "the exit code")
    v.add_argument("--max-violations", type=int, default=10_000)
    v.add_argument("--write-valid", action="store_true",
                   help="also route valid rows to <out>/valid/ (coerce sink)")
    v.add_argument("--strict-layout", action="store_true",
                   help="fail fast (exit 2) when the declared :map layout is "
                        "incompatible with the input's physical schema")
    v.add_argument("--num-cpus", type=int,
                   default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    v.add_argument("--rows-per-batch", type=int, default=65_536)

    cp = sub.add_parser(
        "corpus-prep",
        help="compose the training-data operators into a prep job")
    cp.add_argument("--input", required=True,
                    help="parquet glob or directory of documents")
    cp.add_argument("--out", required=True, help="output directory")
    cp.add_argument("--text-column", default="text")
    cp.add_argument("--id-column", default="doc_id")
    cp.add_argument("--strip-html", action="store_true",
                    help="C4-style HTML extraction before everything else "
                         "(script/style/comment/tag strip + entity decode)")
    cp.add_argument("--normalize", action="store_true",
                    help="canonical text normalization first (control-strip"
                         " -> whitespace-collapse -> trim -> lower)")
    cp.add_argument("--lang", metavar="CODE",
                    help="keep only docs whose language-ID heuristic "
                         "predicts CODE (en/es/de/fr/zh)")
    cp.add_argument("--dedup-lines", action="store_true",
                    help="within-document duplicate-line scrub (keep the "
                         "first occurrence of each exact line)")
    cp.add_argument("--domain-blocklist", metavar="D1,D2,...",
                    help="drop docs containing a URL whose host matches a "
                         "blocked domain (exact or dot-suffix)")
    cp.add_argument("--c4", type=int, metavar="MIN_SENTENCES",
                    help="C4 cleaning rules: keep only terminal-punctuated "
                         ">=3-word non-javascript lines, then drop pages "
                         "with < MIN_SENTENCES sentences / lorem ipsum / "
                         "curly braces")
    cp.add_argument("--gopher", type=int, metavar="MIN_WORDS",
                    help="drop docs failing the Gopher rule suite "
                         "(stages/text.gopher_rules; min_stop_hits=1)")
    cp.add_argument("--compression", metavar="LO:HI",
                    help="keep docs whose DEFLATE ratio lies in [LO, HI] "
                         "(drops boilerplate-repetitive and binary-ish "
                         "text)")
    cp.add_argument("--min-entropy", type=float, metavar="NATS",
                    help="drop docs whose unigram word entropy is below "
                         "NATS (repetitive/boilerplate filter)")
    cp.add_argument("--lm-logprob", metavar="LO:HI",
                    help="keep docs whose bigram-LM avg log-prob (stupid "
                         "backoff, self-scored) is inside [LO, HI] — the "
                         "CCNet-style perplexity band filter")
    cp.add_argument("--seen-bands", metavar="PATH",
                    help="drop NEAR-dup candidates vs a previous run: "
                         "docs sharing any MinHash LSH band with a "
                         "dedup.build_band_digest().save(PATH) digest "
                         "(shuffle-free probe; exact-verify survivors "
                         "downstream if precision matters)")
    cp.add_argument("--seen-bloom", metavar="PATH",
                    help="drop rows whose text is in a previously-built "
                         "Bloom digest (incremental cross-run dedup; build "
                         "with dedup.build_bloom().save(PATH))")
    cp.add_argument("--temperature", type=float, metavar="ALPHA",
                    help="with --rebalance GROUP: temperature sampling "
                         "toward count^ALPHA shares instead of uniform")
    cp.add_argument("--drop-frequent-lines", type=int, metavar="MIN_COUNT",
                    help="C4-style line scrub: drop lines occurring >= "
                         "MIN_COUNT times corpus-wide")
    cp.add_argument("--remove-dup-spans", type=int, metavar="K",
                    help="exact substring scrub (Lee 2021): drop every "
                         "word covered by a corpus-duplicated K-word "
                         "gram span (first occurrence survives); other "
                         "columns pass through")
    cp.add_argument("--scrub-decon", metavar="PROBES",
                    help="decontamination by REMOVAL: parquet file/dir of "
                         "probe docs (same text column name); every word "
                         "covered by a probe K-gram match drops, the doc "
                         "survives (contrast --decontaminate, which drops "
                         "whole docs). NOTE: ALL docs come back "
                         "whitespace-normalized (runs of spaces/newlines "
                         "collapse to single spaces), matched or not — "
                         "the remove-dup-spans rebuild contract")
    cp.add_argument("--scrub-decon-k", type=int, default=5, metavar="K",
                    help="probe word-gram width for --scrub-decon")
    cp.add_argument("--dedup", choices=["exact"],
                    help="exact dedup keeping the min id per content")
    cp.add_argument("--decontaminate", metavar="GLOB",
                    help="parquet glob of probe docs; drop docs sharing any "
                         "word n-gram with them")
    cp.add_argument("--ngram", type=int, default=13,
                    help="decontamination gram size (default 13)")
    cp.add_argument("--outliers", metavar="GROUP:VALUE",
                    help="per-group Tukey-fence filter, e.g. source:n_chars")
    cp.add_argument("--rebalance", metavar="GROUP",
                    help="deterministic uniform-mixture downsampling on GROUP")
    cp.add_argument("--url-dedup", metavar="URLCOL",
                    help="canonicalize the URL column (lower scheme/host, "
                         "strip www/query/fragment/trailing slashes) and "
                         "keep one doc per canonical URL (min id)")
    cp.add_argument("--top-fraction", metavar="GROUP:SCORE:F",
                    help="keep the top F fraction of every GROUP by SCORE "
                         "(deterministic id tie-break)")
    cp.add_argument("--upsample", metavar="GROUP:NAME=F[,NAME=F...]",
                    help="fractional epoch mixture, e.g. "
                         "source:books=2.5,web=0.5,default=1 — emits an "
                         "epoch copy-index column")
    cp.add_argument("--pack", metavar="GROUP:COUNT:BLOCK",
                    help="GPT-style concat-and-cut packing: per-GROUP "
                         "token streams (COUNT column) cut into BLOCK-"
                         "token blocks; output is per-(doc, block) spans")
    cp.add_argument("--chunk", metavar="SIZE:STRIDE",
                    help="sliding-window chunking of the text column")
    cp.add_argument("--split", metavar="LABEL:FRAC,...",
                    help="deterministic hash split, e.g. "
                         "train:0.98,valid:0.01,test:0.01 (last label "
                         "absorbs remainder); output partitioned by split")
    cp.add_argument("--shards", type=int, metavar="N",
                    help="deterministic hash-shard assignment; output "
                         "partitioned into shard=k/ directories")
    cp.add_argument("--checkpoint-dir", metavar="DIR",
                    help="write the multi-pass stage guards as resumable "
                         "parquet checkpoints under DIR instead of "
                         "in-memory materialize: a re-run after a crash "
                         "resumes from the last FINISHED checkpoint; "
                         "keys digest the input paths + stage chain, so "
                         "changed flags invalidate automatically")
    cp.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))

    pk = sub.add_parser(
        "pack",
        help="assemble trainer-ready packed token blocks (concat-and-cut "
             "input_ids/position_ids/segment_ids, parquet partitioned by "
             "group)")
    pk.add_argument("--input", required=True,
                    help="parquet glob or directory of tokenized sequences")
    pk.add_argument("--out", required=True, help="output directory")
    pk.add_argument("--tokens-column", default="tokens")
    pk.add_argument("--id-column", default="doc_id")
    pk.add_argument("--group-column", default="source")
    pk.add_argument("--block-size", type=int, default=2048)
    pk.add_argument("--truncate", type=int, metavar="MAX_LEN",
                    help="clip every sequence to MAX_LEN tokens first")
    pk.add_argument("--scrub-decon", metavar="PROBES_JSON",
                    help="decontamination by REMOVAL before packing: JSON "
                         "file of equal-length token-id lists; every "
                         "exact probe window's tokens drop (overlaps "
                         "merge); scrubbed count lands in the report as "
                         "decon_scrubbed_tokens")
    pk.add_argument("--scrub-dup-spans", type=int, metavar="K",
                    help="Lee-2021 exact substring scrub BEFORE packing: "
                         "drop every token covered by a corpus-duplicated "
                         "K-token-gram span (first occurrence survives); "
                         "scrubbed token count lands in the report")
    pk.add_argument("--num-buckets", type=int, default=64)
    pk.add_argument("--expect", action="append", metavar="RULE",
                    help="assertion rule over the WRITTEN blocks table "
                         "(columns: block_id, n_tokens, n_docs, "
                         "input/position/segment ids, the group column), "
                         "repeatable — same kinds as validate --expect; "
                         "e.g. row_count_between:100:100000 "
                         "mean_between:n_tokens:1800:2048 min_ge:n_docs:1; "
                         "verdicts land under 'expectations' and gate the "
                         "exit code")
    pk.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))

    rp = sub.add_parser(
        "report",
        help="corpus diagnostics JSON over a tokenized sequences table: "
             "vocab coverage curve, per-source vocabulary overlap, "
             "Heaps-law growth curve")
    rp.add_argument("--input", required=True,
                    help="parquet glob or directory of tokenized sequences")
    rp.add_argument("--tokens-column", default="tokens")
    rp.add_argument("--id-column", default="doc_id")
    rp.add_argument("--source-column", default="source",
                    help="group column for the overlap matrix; pass '' "
                         "to skip the overlap section")
    rp.add_argument("--vocab", type=int, default=50257,
                    help="token ids must lie in [0, vocab)")
    rp.add_argument("--coverage-ks", default="100,1000,10000",
                    help="comma-separated top-k cutoffs for the coverage "
                         "curve")
    rp.add_argument("--growth-shards", type=int, default=8,
                    help="number of hash(id) shards for the growth "
                         "curve; 0 skips the section")
    rp.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))

    ex = sub.add_parser(
        "explain",
        help="pretty-print a validation report for one JSON value "
             "(driver-side, no Ray session)")
    ex.add_argument("--schema", required=True,
                    help="schema JSON file (DSL form)")
    ex.add_argument("--value", required=True,
                    help="value JSON file, or an inline JSON literal")
    ex.add_argument("--width", type=int, default=80)
    ex.add_argument("--colors", action="store_true",
                    help="ANSI-256 dark theme (the malli.dev.pretty look)")

    args = p.parse_args(argv)

    if args.cmd == "explain":
        from . import pretty
        from .core import SchemaError, schema as make_schema
        try:
            form = json.load(open(args.schema))
        except OSError as e:
            raise SystemExit(f"cannot read schema file: {e}")
        if os.path.exists(args.value):
            value = json.load(open(args.value))
        else:
            try:
                value = json.loads(args.value)
            except json.JSONDecodeError as e:
                raise SystemExit(f"--value is neither a file nor valid "
                                 f"JSON: {e}")
        p_opts = pretty.printer(width=args.width,
                                colors="dark" if args.colors else None)
        try:
            sc = make_schema(form)
        except SchemaError as e:
            print(pretty.format_exception(e, p_opts), end="")
            return 2
        return 1 if pretty.explain(sc, value, p_opts) is not None else 0

    if os.path.isdir(args.input):
        paths = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
    else:
        paths = sorted(glob.glob(args.input))
    if not paths:
        raise SystemExit(f"no parquet files match {args.input!r}")

    import ray
    owns_ray = not ray.is_initialized()
    if owns_ray:
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    try:
        if args.cmd == "corpus-prep":
            return _run_corpus_prep(args, paths)
        if args.cmd == "pack":
            return _run_pack(args, paths)
        if args.cmd == "report":
            return _run_report(args, paths)
        from .pipelines.validation_job import SchemaLayoutError, run_job
        spec = _build_spec(args)
        try:
            report = run_job(paths, spec, args.out,
                             uniqueness_key=args.uniqueness_key,
                             drift_columns=args.drift,
                             rows_per_batch=args.rows_per_batch,
                             write_valid=args.write_valid,
                             strict_layout=args.strict_layout)
        except SchemaLayoutError as e:
            print(json.dumps({"pass": False, "layout_error": e.problems}))
            return 2
        if args.expect:
            # scan rules evaluate for FREE from the fused pass's stats
            # (exact sum_i/sum_scale ride in ColumnStats); only
            # distinct-count rules need their own tiny exchange
            from .stages.constraints import (expectations_from_stats,
                                             expectations_report)
            rows, leftover = expectations_from_stats(
                report["stats"], report["n_rows"],
                _parse_expect_rules(args.expect))
            if leftover:
                import ray.data as rd
                rows += expectations_report(rd.read_parquet(paths),
                                            leftover).to_pylist()
            report["expectations"] = rows
            report["pass"] = bool(report["pass"]
                                  and all(r["ok"] for r in rows))
        print(json.dumps(report, default=str))
        return 0 if report["pass"] else 1
    finally:
        if owns_ray:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
