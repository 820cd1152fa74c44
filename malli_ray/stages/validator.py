"""Ray Data stages: validator / explainer / coercer actor classes.

These are callable CLASSES for ``ds.map_batches(Cls, fn_constructor_kwargs=...,
concurrency=N, batch_format="pyarrow", zero_copy_batch=True)`` — the schema
compiles ONCE per actor in ``__init__`` and every ``__call__`` streams a
zero-copy Arrow batch through the compiled plan.  This is the Ray-native
restatement of malli's compile-once cache (src/malli/core.cljc:354-370;
SURVEY.md SS2.7): per-schema closure cache atom -> per-actor compiled plan.

Everything an actor needs ships as a ``ValidationSpec`` of plain data (DSL
forms, check specs) — never compiled closures — so pickling is trivial and
each worker compiles locally.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np
import pyarrow as pa

from ..arrow_compile import TablePlan, compile_table_plan
from ..state.sketches import (ColumnStats, CountMinSketch, HyperLogLog,
                              TDigest, hash64)

__all__ = ["ValidationSpec", "ValidateBatch", "ExplainBatch", "SummarizeBatch",
           "SUMMARY_SCHEMA"]


@dataclass
class ValidationSpec:
    """Serializable job spec: everything the actors compile from.

    schema: vector-DSL form (plain data).
    checks: cross-column check specs (arrow_compile.check_from_spec).
    id_column: row-identity column copied into violation rows.
    hll_columns / tdigest_columns / hist_columns: fused sketch targets.
    broadcast: name -> list of allowed values (small-side semi-join tables,
        e.g. allowed sources; applied as enum-style checks if listed in
        ``referential``).
    """

    schema: Any
    checks: list = field(default_factory=list)
    id_column: Optional[str] = None
    hll_columns: list = field(default_factory=list)
    tdigest_columns: list = field(default_factory=list)
    hist_columns: list = field(default_factory=list)
    #: hot-key (skew) detection columns: per batch a count-min partial +
    #: the batch's top-16 local values; merged driver-side into a
    #: `hot_keys` report section (candidates scored by the merged sketch).
    #: The pre-shuffle skew probe — estimates, not a correctness gate.
    cms_columns: list = field(default_factory=list)
    max_violations_per_batch: int = 10_000
    options: dict = field(default_factory=dict)

    def build_plan(self) -> TablePlan:
        return compile_table_plan(self.schema, self.checks, self.options or None)


class _PlanHolder:
    """Base actor: compile the plan once per actor process."""

    def __init__(self, spec: ValidationSpec):
        self.spec = spec
        self.plan = spec.build_plan()


class ValidateBatch(_PlanHolder):
    """Append a boolean ``valid`` column (the malli `validate` fast path)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = self.plan.valid_mask(batch)
        return batch.append_column("valid", pa.array(mask))


class FilterValid(_PlanHolder):
    """Keep only valid rows (validate-as-filter)."""

    def __init__(self, spec: ValidationSpec, invert: bool = False):
        super().__init__(spec)
        self.invert = invert

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = self.plan.valid_mask(batch)
        if self.invert:
            mask = ~mask
        return batch.filter(pa.array(mask))


class ExplainBatch(_PlanHolder):
    """Emit malli explain-style violation rows (0..n per input row)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.plan.explain_table(
            batch, id_column=self.spec.id_column,
            max_violations=self.spec.max_violations_per_batch)


SUMMARY_SCHEMA = pa.schema([
    ("n_rows", pa.int64()),
    ("n_valid", pa.int64()),
    ("n_violations", pa.int64()),
    ("violations_json", pa.string()),   # capped sample, JSON rows
    ("stats_json", pa.string()),        # ColumnStats partial
    ("hll_json", pa.string()),          # {col: digest}
    ("tdigest_json", pa.string()),      # {col: digest}
    ("cms_json", pa.string()),          # {col: {digest, cand: {v: n}}}
])


class SummarizeBatch(_PlanHolder):
    """The fused single-pass stage: validate + explain(violators) + stats.

    Input batch -> ONE summary row (tiny), so the consuming aggregate stream
    is O(batches), never O(rows) — the driver merges partials only
    (scaling-efficiency requirement, SURVEY.md SS4.2 row 'two-cluster-size').
    """

    def __init__(self, spec: ValidationSpec, sample_violations: int = 100):
        super().__init__(spec)
        self.sample_violations = sample_violations
        self.hist_cols = frozenset(spec.hist_columns)

    def __call__(self, batch: pa.Table) -> pa.Table:
        plan, spec = self.plan, self.spec
        bound = plan.bind(batch.schema)
        evaluated = bound.evaluate(batch)
        mask = evaluated[2]
        n, n_valid = batch.num_rows, int(mask.sum())

        violations_json = "[]"
        n_violations = 0
        if n_valid < n:
            v = bound.explain_table(batch, id_column=spec.id_column,
                                    max_violations=spec.max_violations_per_batch,
                                    precomputed=evaluated)
            n_violations = v.num_rows
            sample = v.slice(0, self.sample_violations)
            violations_json = json.dumps(sample.to_pylist(), default=str)

        stats = ColumnStats().update_from_table(batch, self.hist_cols)

        hlls = {}
        for col in spec.hll_columns:
            if col in batch.schema.names:
                h = HyperLogLog()
                arr = batch.column(col)
                h.add_hashes(hash64(arr.drop_null()))
                hlls[col] = h.digest()

        tds = {}
        for col in spec.tdigest_columns:
            if col in batch.schema.names:
                td = TDigest()
                vals = batch.column(col).drop_null().to_numpy(zero_copy_only=False)
                td.add(np.asarray(vals, dtype=np.float64))
                tds[col] = td.digest()

        cms = {}
        for col in getattr(spec, "cms_columns", ()) or ():
            if col in batch.schema.names:
                arr = batch.column(col).drop_null()
                vc = arr.value_counts()
                vals = vc.field("values")
                counts = vc.field("counts").to_numpy(zero_copy_only=False)
                sk = CountMinSketch()
                sk.add(vals, weights=counts)
                top = np.argsort(counts, kind="stable")[::-1][:16]
                cand = {str(vals[int(i)].as_py()): int(counts[int(i)])
                        for i in top}
                cms[col] = {"digest": sk.digest(), "cand": cand}

        return pa.Table.from_pydict({
            "n_rows": [n], "n_valid": [n_valid], "n_violations": [n_violations],
            "violations_json": [violations_json],
            "stats_json": [stats.to_json()],
            "hll_json": [json.dumps(hlls)],
            "tdigest_json": [json.dumps(tds)],
            "cms_json": [json.dumps(cms)],
        }, schema=SUMMARY_SCHEMA)


# --------------------------------------------------------------------------
# task-based variants with worker-process caching
#
# Ray worker PROCESSES persist across tasks, so a module-level cache gives the
# same compile-once-per-worker behavior as an actor pool without paying actor
# spin-up per execution (actor pools are rebuilt for every dataset execution;
# task workers are reused).  Use the actor classes above for genuinely heavy
# state (models, large broadcasts); use these for light compiled plans.
# --------------------------------------------------------------------------

import hashlib as _hashlib
import re as _re_mod


def _canonical_default(o: Any) -> str:
    """Process-stable serialization for non-JSON values in spec keys/digests:
    callables hash their bytecode (repr embeds memory addresses, which would
    defeat cross-process checkpoint resume); other reprs get addresses
    scrubbed."""
    if callable(o):
        code = getattr(o, "__code__", None)
        body = (code.co_code if code is not None else b"") + repr(
            getattr(code, "co_consts", ())).encode()
        return (f"fn:{getattr(o, '__module__', '')}."
                f"{getattr(o, '__qualname__', '')}:"
                f"{_hashlib.sha1(body).hexdigest()[:12]}")
    return _re_mod.sub(r" at 0x[0-9a-fA-F]+", "", repr(o))


def _spec_key(spec: ValidationSpec, tag: str) -> str:
    """Canonical serialization of a spec (cache keys + checkpoint spec digests)."""
    return tag + json.dumps(
        {"schema": spec.schema, "checks": spec.checks, "id": spec.id_column,
         "hll": spec.hll_columns, "td": spec.tdigest_columns,
         "hist": spec.hist_columns, "mx": spec.max_violations_per_batch,
         "opts": spec.options},
        sort_keys=True, default=_canonical_default)


def make_validate_fn(spec: ValidationSpec):
    from . import cached_stage
    return cached_stage(ValidateBatch, spec=spec)


def make_explain_fn(spec: ValidationSpec):
    from . import cached_stage
    return cached_stage(ExplainBatch, spec=spec)


def make_summarize_fn(spec: ValidationSpec, sample_violations: int = 100):
    from . import cached_stage
    return cached_stage(SummarizeBatch, spec=spec,
                        sample_violations=sample_violations)


def merge_summaries(rows: list[dict]) -> dict:
    """Driver-side merge of SummarizeBatch rows -> job report (small)."""
    report: dict[str, Any] = {"n_rows": 0, "n_valid": 0, "n_violations": 0}
    stats = ColumnStats()
    hlls: dict[str, HyperLogLog] = {}
    tds: dict[str, TDigest] = {}
    cmss: dict[str, CountMinSketch] = {}
    cands: dict[str, set] = {}
    sample: list = []
    for r in rows:
        report["n_rows"] += r["n_rows"]
        report["n_valid"] += r["n_valid"]
        report["n_violations"] += r["n_violations"]
        stats.merge(ColumnStats.from_json(r["stats_json"]))
        for col, dig in json.loads(r["hll_json"]).items():
            h = HyperLogLog.from_digest(dig)
            hlls[col] = hlls[col].merge(h) if col in hlls else h
        for col, dig in json.loads(r["tdigest_json"]).items():
            t = TDigest.from_digest(dig)
            tds[col] = tds[col].merge(t) if col in tds else t
        for col, entry in json.loads(r.get("cms_json") or "{}").items():
            sk = CountMinSketch.from_digest(entry["digest"])
            cmss[col] = cmss[col].merge(sk) if col in cmss else sk
            cands.setdefault(col, set()).update(entry["cand"])
        if len(sample) < 1000:
            sample.extend(json.loads(r["violations_json"]))
    report["pass"] = report["n_violations"] == 0
    report["stats"] = stats.stats
    report["distinct"] = {c: h.cardinality() for c, h in hlls.items()}
    report["quantiles"] = {
        c: {q: t.quantile(q) for q in (0.5, 0.9, 0.99)} for c, t in tds.items()}
    if cmss:
        # hot keys: batch-local top values scored by the MERGED sketch —
        # a global heavy hitter tops at least one batch, so the candidate
        # union covers it; estimates are one-sided (never under true count)
        hot = {}
        for col, sk in cmss.items():
            vals = sorted(cands.get(col, ()))
            est = sk.estimate(vals)
            order = sorted(range(len(vals)), key=lambda i: (-est[i], vals[i]))
            hot[col] = [{"value": vals[i], "est_count": int(est[i])}
                        for i in order[:10]]
        report["hot_keys"] = hot
    report["violation_sample"] = sample[:1000]
    report["_sketches"] = {"hll": {c: h.digest() for c, h in hlls.items()},
                           "tdigest": {c: t.digest() for c, t in tds.items()}}
    return report
