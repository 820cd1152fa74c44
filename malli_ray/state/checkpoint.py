"""Per-partition lineage + atomic checkpoint commits for resumable jobs.

Design (SURVEY.md SS4.2 "checkpoint / resume"): a validation job's unit of
commit is one input fragment (parquet file / row-group range). Each processed
partition writes a lineage record
``{partition_id, fragment, row_count, violation_count, n_valid, sketches}``
to ``<dir>/partitions/<partition_id>.json`` atomically (temp file + rename —
rename is atomic on POSIX). On resume the driver lists committed records and
filters the fragment list before building the Dataset; identical verdicts are
guaranteed because partition == fixed fragment set and every op is
deterministic, and sketch digests are merged in sorted partition order
(merge-order determinism, SURVEY.md SS7.5.5).

The reference has no checkpointing (single JVM call); this implements the
north_rule's "resumable from checkpoint with per-partition lineage + metrics".
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Iterable

__all__ = ["CheckpointStore"]


class CheckpointStore:
    def __init__(self, root: str):
        self.root = root
        self.partition_dir = os.path.join(root, "partitions")
        os.makedirs(self.partition_dir, exist_ok=True)

    # -- job-level metadata -------------------------------------------------
    def write_meta(self, meta: dict) -> None:
        self._atomic_write(os.path.join(self.root, "job.json"), meta)

    def read_meta(self) -> dict | None:
        return self._read(os.path.join(self.root, "job.json"))

    def write_baseline(self, baseline: dict) -> None:
        """Checkpointed drift baseline (histograms) for chi2/KL scoring."""
        self._atomic_write(os.path.join(self.root, "baseline.json"), baseline)

    def read_baseline(self) -> dict | None:
        return self._read(os.path.join(self.root, "baseline.json"))

    # -- per-partition lineage ---------------------------------------------
    def commit_partition(self, partition_id: str, record: dict) -> None:
        record = {"partition_id": partition_id, **record}
        self._atomic_write(self._partition_path(partition_id), record)

    def committed(self) -> dict[str, dict]:
        out: dict[str, dict] = {}
        for name in os.listdir(self.partition_dir):
            if not name.endswith(".json"):
                continue
            rec = self._read(os.path.join(self.partition_dir, name))
            if rec and rec.get("status") == "committed":
                out[rec["partition_id"]] = rec
        return out

    def pending(self, partition_ids: Iterable[str]) -> list[str]:
        done = self.committed()
        return [p for p in partition_ids if p not in done]

    # -- io -----------------------------------------------------------------
    def _partition_path(self, partition_id: str) -> str:
        safe = partition_id.replace("/", "__").replace(":", "_")
        return os.path.join(self.partition_dir, f"{safe}.json")

    def _atomic_write(self, path: str, payload: dict) -> None:
        d = os.path.dirname(path)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(payload, f, default=str)
            os.replace(tmp, path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise

    def _read(self, path: str) -> dict | None:
        try:
            with open(path) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None
