"""The flagship pipeline: fused streaming validation job with lineage/resume.

Engine lifecycle (SURVEY.md SS3.3 "Engine lifecycle"):

  config(schema DSL + constraints + io paths)
    -> driver compiles spec (plain data, shipped to actors)
    -> Dataset-level ops (validate/explain/summarize) for composition, and
    -> run_job(): per-fragment fused pass with per-partition lineage commits
       (checkpoint store), violations written to deterministic per-fragment
       parquet paths (idempotent overwrite => retry/resume safe),
       + dataset-level constraints (uniqueness groupby, drift histograms).

Scale design notes (BASELINE.json north_rule):
  - the fused pass is embarrassingly parallel (no shuffle); the driver only
    ever merges O(partitions) metadata — never row data;
  - uniqueness shuffles only the projected key column with a map-side
    combiner (stages/constraints.py);
  - drift histograms ride along in the fused column stats (zero extra pass);
  - resume: committed partitions are skipped; outputs are overwritten by
    deterministic name so half-written partitions self-heal.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data
from ray.data import Dataset

from ..state.checkpoint import CheckpointStore
from ..state.sketches import ColumnStats, HyperLogLog, TDigest, hash64
from ..stages.validator import (
    ExplainBatch, SummarizeBatch, ValidateBatch, ValidationSpec, merge_summaries,
)
from ..stages import constraints as C

__all__ = ["ValidationSpec", "validate", "explain", "summarize", "run_job",
           "SchemaLayoutError"]


class SchemaLayoutError(ValueError):
    """strict_layout fail-fast: declared :map layout vs physical schema."""

    def __init__(self, message: str, problems: list[str]):
        super().__init__(message)
        self.problems = problems


from ..stages import concurrency_kwargs as _concurrency_kwargs


def validate(ds: Dataset, spec: ValidationSpec, concurrency=None,
             batch_size: int | None = None) -> Dataset:
    """Append a ``valid`` boolean column (m/validate over the stream).

    Task-based with a worker-process plan cache: compile-once-per-worker
    without actor-pool spin-up (stages/validator.py rationale)."""
    from ..stages.validator import make_validate_fn
    return ds.map_batches(make_validate_fn(spec), batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size,
                          **_concurrency_kwargs(concurrency))


def explain(ds: Dataset, spec: ValidationSpec, concurrency=None,
            batch_size: int | None = None) -> Dataset:
    """Violation rows dataset (m/explain over the stream)."""
    from ..stages.validator import make_explain_fn
    return ds.map_batches(make_explain_fn(spec), batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size,
                          **_concurrency_kwargs(concurrency))


def filter_valid(ds: Dataset, spec: ValidationSpec,
                 batch_size: int | None = None, invert: bool = False) -> Dataset:
    """Keep only rows passing the schema (validate-as-filter)."""
    from ..stages import cached_stage
    from ..stages.validator import FilterValid
    return ds.map_batches(cached_stage(FilterValid, spec=spec, invert=invert),
                          batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=batch_size)


def coerce(ds: Dataset, spec: ValidationSpec,
           decode_schema: Any | None = None,
           batch_size: int | None = None) -> tuple[Dataset, Dataset]:
    """The m/coerce loop over a stream: decode -> validate -> route.

    Returns (valid_rows, violation_rows). NOTE: Ray Data has single-output
    operators, so consuming both datasets executes the decode twice — when
    both sides are needed at scale, prefer run_job (which writes violations
    as a side output in its single fused pass).
    Reference semantics: m/coercer, src/malli/core.cljc:2750-2766.
    """
    if decode_schema is not None:
        from ..stages.transform_stage import DecodeBatch
        decoder = DecodeBatch(decode_schema)
        ds = ds.map_batches(lambda b: decoder(b), batch_format="pyarrow",
                            batch_size=batch_size)
    return (filter_valid(ds, spec, batch_size=batch_size),
            explain(ds, spec, batch_size=batch_size))


def summarize(ds: Dataset, spec: ValidationSpec, concurrency=None,
              batch_size: int | None = None) -> dict:
    """Fused validate+stats pass -> merged job report (driver merges tiny
    per-batch partials only)."""
    from ..stages.validator import make_summarize_fn
    s = ds.map_batches(make_summarize_fn(spec), batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=batch_size,
                       **_concurrency_kwargs(concurrency))
    rows = s.take_all()  # O(batches) small rows
    return merge_summaries(rows)


# --------------------------------------------------------------------------
# checkpointed per-fragment job
# --------------------------------------------------------------------------


class _ProcessFragment:
    """Actor: one parquet fragment -> fused validate+stats+violations pass.

    Reads row groups streaming (never the whole fragment at once), writes
    violation rows to a deterministic per-fragment path, returns ONE lineage
    row. Compiled plan is built once per actor.
    """

    def __init__(self, spec: ValidationSpec, out_dir: str,
                 rows_per_batch: int = 65_536, write_valid: bool = False):
        self.spec = spec
        self.plan = spec.build_plan()
        self.out_dir = out_dir
        self.rows_per_batch = rows_per_batch
        self.write_valid = write_valid
        os.makedirs(os.path.join(out_dir, "violations"), exist_ok=True)
        if write_valid:
            os.makedirs(os.path.join(out_dir, "valid"), exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_rows = {"partition_id": [], "fragment": [], "row_count": [],
                    "n_valid": [], "violation_count": [], "stats_json": [],
                    "hll_json": [], "tdigest_json": [], "wall_s": []}
        has_rg = "rg_start" in batch.schema.names
        rows = batch.to_pylist()
        for row in rows:
            t0 = time.perf_counter()
            rgs = None
            if has_rg and row.get("rg_start", -1) >= 0:
                rgs = list(range(row["rg_start"], row["rg_end"] + 1))
            rec = self._process(row["path"], row_groups=rgs,
                                partition_id=row.get("partition_id"))
            rec["wall_s"] = time.perf_counter() - t0
            for k in out_rows:
                out_rows[k].append(rec[k])
        return pa.Table.from_pydict(out_rows)

    def _process(self, path: str, row_groups: list | None = None,
                 partition_id: str | None = None) -> dict:
        spec = self.spec
        pf = pq.ParquetFile(path)
        stats = ColumnStats()
        hlls = {c: HyperLogLog() for c in spec.hll_columns}
        tds = {c: TDigest() for c in spec.tdigest_columns}
        hist_cols = frozenset(spec.hist_columns)
        n_rows = n_valid = 0
        violation_tables = []
        row_offset = 0
        frag_id = partition_id or os.path.splitext(os.path.basename(path))[0]
        if row_groups is not None:
            # row-group-range partition (finer resume granularity for
            # many-row-group files; SURVEY.md SS4.2 partition determinism)
            if partition_id is None:
                frag_id = f"{frag_id}@rg{row_groups[0]}-{row_groups[-1]}"
            row_offset = sum(pf.metadata.row_group(i).num_rows
                             for i in range(row_groups[0]))
        valid_writer = None
        valid_tmp = valid_path = None
        if self.write_valid:
            # routed coerce sink: valid rows stream to a per-fragment file
            # (deterministic name + tmp/rename => retry-idempotent)
            valid_path = os.path.join(self.out_dir, "valid", f"{frag_id}.parquet")
            valid_tmp = valid_path + ".tmp"
        for rb in pf.iter_batches(batch_size=self.rows_per_batch,
                                  row_groups=row_groups):
            t = pa.Table.from_batches([rb])
            bound = self.plan.bind(t.schema)
            evaluated = bound.evaluate(t)
            mask = evaluated[2]
            n_rows += t.num_rows
            batch_valid = int(mask.sum())
            n_valid += batch_valid
            if batch_valid < t.num_rows:
                v = bound.explain_table(
                    t, id_column=spec.id_column, row_offset=row_offset,
                    max_violations=spec.max_violations_per_batch,
                    precomputed=evaluated)
                if v.num_rows:
                    violation_tables.append(v)
            if self.write_valid:
                keep = t.filter(pa.array(mask))
                if valid_writer is None:
                    valid_writer = pq.ParquetWriter(valid_tmp, t.schema)
                if keep.num_rows:
                    valid_writer.write_table(keep)
            stats.update_from_table(t, hist_cols)
            for c, h in hlls.items():
                if c in t.schema.names:
                    h.add_hashes(hash64(t.column(c).drop_null()))
            for c, td in tds.items():
                if c in t.schema.names:
                    td.add(np.asarray(
                        t.column(c).drop_null().to_numpy(zero_copy_only=False),
                        dtype=np.float64))
            row_offset += t.num_rows

        if valid_writer is not None:
            valid_writer.close()
            os.replace(valid_tmp, valid_path)
        vio_count = 0
        vio_path = os.path.join(self.out_dir, "violations", f"{frag_id}.parquet")
        if violation_tables:
            vio = pa.concat_tables(violation_tables)
            vio_count = vio.num_rows
            tmp = vio_path + ".tmp"
            pq.write_table(vio, tmp)
            os.replace(tmp, vio_path)  # deterministic overwrite => idempotent
        elif os.path.exists(vio_path):
            os.unlink(vio_path)

        return {
            "partition_id": frag_id, "fragment": path, "row_count": n_rows,
            "n_valid": n_valid, "violation_count": vio_count,
            "stats_json": stats.to_json(),
            "hll_json": json.dumps({c: h.digest() for c, h in hlls.items()}),
            "tdigest_json": json.dumps({c: t.digest() for c, t in tds.items()}),
        }


def run_job(input_paths: list[str], spec: ValidationSpec, out_dir: str,
            uniqueness_key: str | None = None,
            drift_columns: list[str] | None = None,
            concurrency: int | None = None,
            rows_per_batch: int = 65_536,
            save_baseline_if_missing: bool = True,
            write_valid: bool = False,
            rowgroups_per_partition: int | None = None,
            strict_layout: bool = False) -> dict:
    """Run (or resume) the full checkpointed validation job.

    Returns the job report: verdicts, stats, sketches, constraint results,
    drift scores. Identical verdicts on resume: partition == fragment,
    deterministic processing, sketch merges in sorted partition order.

    ``strict_layout=True`` turns the declared-DSL-vs-physical-schema diff
    (arrow_schema.schema_compatible) into a FAIL-FAST error before any
    fragment is processed — for jobs where a layout drift (renamed/retyped
    column) should abort rather than surface as per-row violations.
    """
    import hashlib

    from ..stages.validator import _spec_key

    # fail-fast config checks BEFORE any fragment processing
    if drift_columns:
        missing_hist = [c for c in drift_columns if c not in spec.hist_columns]
        if missing_hist:
            raise ValueError(
                f"drift_columns {missing_hist} are not in spec.hist_columns — "
                "their histograms would never be collected; add them to "
                "ValidationSpec(hist_columns=[...])")

    store = CheckpointStore(os.path.join(out_dir, "checkpoint"))
    prior_meta = store.read_meta() or {}
    spec_digest = hashlib.sha256(_spec_key(spec, "").encode()).hexdigest()[:16]
    # partition plan: one partition per file, or per row-group range when
    # rowgroups_per_partition is set (finer resume units for huge files).
    # Partition ids must be unique: duplicate basenames across directories
    # get a short path-hash suffix (else one file would shadow the other)
    base_counts: dict[str, int] = {}
    for p in input_paths:
        b = os.path.splitext(os.path.basename(p))[0]
        base_counts[b] = base_counts.get(b, 0) + 1
    by_id: dict[str, dict] = {}
    for p in input_paths:
        base = os.path.splitext(os.path.basename(p))[0]
        if base_counts[base] > 1:
            base = base + "-" + hashlib.sha1(p.encode()).hexdigest()[:8]
        if rowgroups_per_partition is None:
            by_id[base] = {"path": p, "rg_start": -1, "rg_end": -1,
                           "partition_id": base}
        else:
            n_rg = pq.ParquetFile(p).metadata.num_row_groups
            for start in range(0, n_rg, rowgroups_per_partition):
                end = min(start + rowgroups_per_partition, n_rg) - 1
                pid = f"{base}@rg{start}-{end}"
                by_id[pid] = {"path": p, "rg_start": start, "rg_end": end,
                              "partition_id": pid}
    inputs_digest = hashlib.sha256(
        "\n".join(sorted(by_id.keys())).encode()).hexdigest()[:16]
    store.write_meta({"schema": spec.schema, "input_count": len(input_paths),
                      "uniqueness_key": uniqueness_key,
                      "spec_digest": spec_digest,
                      "last_report": prior_meta.get("last_report")})

    # a committed partition only counts if it was produced under THIS spec —
    # changing the schema/checks invalidates old verdicts (review finding)
    committed_now = store.committed()
    valid_committed = {k for k, r in committed_now.items()
                       if r.get("spec_digest") == spec_digest}
    pending = [k for k in by_id if k not in valid_committed]
    skipped = len(by_id) - len(pending)

    # fail-fast layout check: declared DSL layout vs the first fragment's
    # physical schema (arrow_schema.schema_compatible); recorded, not fatal —
    # per-row validation still produces exact violations either way
    schema_problems: list[str] = []
    try:
        from ..arrow_schema import schema_compatible
        first = pq.read_schema(input_paths[0])
        schema_problems = schema_compatible(spec.schema, first)
    except Exception as e:
        if strict_layout:
            # fail-fast was requested: a layout check that itself fails
            # must ABORT, not silently degrade to a full run
            raise SchemaLayoutError(
                f"strict_layout: could not verify input layout against the "
                f"declared schema ({e})", [str(e)]) from e
    if strict_layout and schema_problems:
        raise SchemaLayoutError(
            f"input layout incompatible with declared schema "
            f"({len(schema_problems)} problem(s)): "
            + "; ".join(schema_problems), schema_problems)

    if pending:
        from ..stages import cached_stage
        process_fragment = cached_stage(
            _ProcessFragment, spec=spec, out_dir=out_dir,
            rows_per_batch=rows_per_batch, write_valid=write_valid)
        paths_ds = ray.data.from_items([by_id[p] for p in sorted(pending)])
        lineage = paths_ds.map_batches(process_fragment, batch_size=1,
                                       batch_format="pyarrow",
                                       **_concurrency_kwargs(concurrency))
        # stream lineage rows and commit each partition as it lands
        for row in lineage.iter_rows():
            store.commit_partition(row["partition_id"],
                                   {**row, "status": "committed",
                                    "spec_digest": spec_digest})

    committed = store.committed()
    # merge in sorted partition order (checkpoint-exact determinism);
    # restrict to THIS job's inputs AND this spec — stale partitions from
    # earlier runs sharing the out_dir must not inflate the report
    records = [committed[k] for k in sorted(committed.keys())
               if k in by_id and committed[k].get("spec_digest") == spec_digest]
    report: dict[str, Any] = {
        "schema_problems": schema_problems,
        "n_partitions": len(records), "resumed_partitions": skipped,
        "n_rows": sum(r["row_count"] for r in records),
        "n_valid": sum(r["n_valid"] for r in records),
        "n_violations": sum(r["violation_count"] for r in records),
    }
    stats = ColumnStats()
    hlls: dict[str, HyperLogLog] = {}
    tds: dict[str, TDigest] = {}
    for r in records:
        stats.merge(ColumnStats.from_json(r["stats_json"]))
        for c, dig in json.loads(r["hll_json"]).items():
            h = HyperLogLog.from_digest(dig)
            hlls[c] = hlls[c].merge(h) if c in hlls else h
        for c, dig in json.loads(r["tdigest_json"]).items():
            t = TDigest.from_digest(dig)
            tds[c] = tds[c].merge(t) if c in tds else t
    report["stats"] = stats.stats
    report["distinct"] = {c: h.cardinality() for c, h in hlls.items()}
    report["quantiles"] = {c: {str(q): t.quantile(q) for q in (0.5, 0.9, 0.99)}
                           for c, t in tds.items()}
    report["per_partition"] = [
        {"partition_id": r["partition_id"], "row_count": r["row_count"],
         "violation_count": r["violation_count"],
         "pass": r["violation_count"] == 0} for r in records]

    # -- uniqueness constraint: projected-key groupby across all fragments --
    if uniqueness_key:
        # resume fast-path: reuse the checkpointed result only when it was
        # computed for EXACTLY this input set (digest of sorted partition ids)
        cached = (prior_meta.get("last_report") or {}).get("uniqueness")
        if (not pending and cached and cached.get("key") == uniqueness_key
                and cached.get("inputs_digest") == inputs_digest):
            report["uniqueness"] = cached
        else:
            from ray.data.aggregate import Count as _Count, Sum as _Sum
            ds = ray.data.read_parquet(input_paths, columns=[uniqueness_key])
            # materialize the (small, duplicates-only) result so the three
            # consumptions below don't re-run the shuffle; the driver itself
            # only ever receives aggregates + a 20-row sample
            dups = C.uniqueness_violations(ds, uniqueness_key).materialize()
            agg = dups.aggregate(_Count(alias_name="dup_keys"),
                                 _Sum("cnt", alias_name="dup_total"))
            dup_keys = int(agg["dup_keys"] or 0)
            dup_total = int(agg["dup_total"] or 0)
            report["uniqueness"] = {
                "key": uniqueness_key,
                "inputs_digest": inputs_digest,
                "duplicate_keys": dup_keys,
                "duplicate_rows": dup_total - dup_keys,
                "sample": [r[uniqueness_key] for r in dups.limit(20).take_all()],
            }
        report["n_violations"] += report["uniqueness"]["duplicate_rows"]

    # -- drift vs checkpointed baseline (histograms came fused with stats) --
    if drift_columns:
        current = {c: stats.stats.get(c, {}).get("hist", {}) for c in drift_columns}
        baseline = store.read_baseline()
        if baseline is None and save_baseline_if_missing:
            store.write_baseline(current)
            report["drift"] = {"baseline": "initialized"}
        elif baseline is not None:
            report["drift"] = {
                c: C.drift_score(current.get(c, {}), baseline.get(c, {}))
                for c in drift_columns}

    report["pass"] = report["n_violations"] == 0
    store.write_meta({"schema": spec.schema, "input_count": len(input_paths),
                      "uniqueness_key": uniqueness_key,
                      "last_report": {k: v for k, v in report.items()
                                      if k not in ("per_partition",)}})
    return report
