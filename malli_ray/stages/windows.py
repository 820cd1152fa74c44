"""Windowed aggregates, sessionization, and as-of joins.

Operators the reference doesn't have (it is a pure function library,
SURVEY.md SS2.12) and Ray Data lacks natively — implemented as compositions of
``map_batches`` + ``groupby().map_groups`` per the custom-operator guidance:

  - tumbling_window: pc.floor_temporal per batch (embarrassingly parallel),
    then a grouped aggregate on (window, keys) — ONE shuffle on low-cardinality
    composite keys.
  - sessionize: hash groupby on the entity key; per-group vectorized gap
    detection (sort + diff + cumsum). Partitioning assumption: one entity's
    events fit in one group (true when per-entity volume << node memory;
    salt by time-range for pathological entities).
  - asof_join: both sides tagged and unioned to a common schema, ONE hash
    shuffle on the join key, per-group np.searchsorted probe (sorted merge).
    Partitioning assumption: per-key group fits in memory; at 10^12 rows
    pre-bucket by (key, coarse time bucket) and run per-bucket.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count

__all__ = ["tumbling_window", "sessionize", "asof_join"]


def tumbling_window(ds: Dataset, ts_col: str, minutes: int,
                    key_cols: list[str], aggs: list | None = None,
                    window_col: str = "window") -> Dataset:
    """Tumbling (fixed) time-window aggregate: count per (window, keys)."""

    def bucket(batch: pa.Table) -> pa.Table:
        w = pc.floor_temporal(batch.column(ts_col), multiple=minutes,
                              unit="minute")
        return batch.append_column(window_col, w)

    bucketed = ds.map_batches(bucket, batch_format="pyarrow")
    aggs = aggs or [Count(alias_name="n")]
    return bucketed.groupby([window_col, *key_cols]).aggregate(*aggs)


def sessionize(ds: Dataset, key: str, ts_col: str, gap_minutes: int,
               session_col: str = "session_id") -> Dataset:
    """Session windows: a new session starts when the gap to the previous
    event of the same ``key`` exceeds ``gap_minutes``.

    Returns per-session summaries: (key, session_id, n_events, session_start).
    Session ids are 1-based in time order per key (deterministic).
    """
    gap = np.timedelta64(gap_minutes * 60, "s")

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        ts = g[ts_col].to_numpy()
        new_session = np.ones(len(g), dtype=np.int64)
        if len(g) > 1:
            new_session[1:] = (np.diff(ts) > gap).astype(np.int64)
        sid = np.cumsum(new_session)
        g = g.assign(**{session_col: sid})
        out = g.groupby(session_col, sort=True).agg(
            n_events=(ts_col, "size"), session_start=(ts_col, "min"))
        out = out.reset_index()
        out.insert(0, key, g[key].iloc[0])
        return out

    projected = ds.select_columns([key, ts_col])
    return projected.groupby(key).map_groups(per_key, batch_format="pandas")


def asof_join(left: Dataset, right: Dataset, key: str,
              left_ts: str, right_ts: str,
              right_cols: list[str], suffix: str = "_right",
              strict: bool = True) -> Dataset:
    """For each left row, attach the right row with the greatest
    ``right_ts`` <= left_ts (``<`` when strict) within the same ``key``.

    Left rows with no match keep null right columns. Ties on right_ts break
    to the LAST row in (right_ts, right_cols) sort order (deterministic).
    """
    right_renamed = {c: (c + suffix if c != key else c) for c in
                     [key, right_ts, *right_cols]}

    def prep_right(batch: pa.Table) -> pa.Table:
        cols = [key, right_ts, *right_cols]
        t = batch.select(cols)
        t = t.rename_columns([right_renamed[c] for c in cols])
        return t.append_column("__side__", pa.array([1] * t.num_rows,
                                                    type=pa.int8()))

    def prep_left(batch: pa.Table) -> pa.Table:
        return batch.append_column("__side__", pa.array([0] * batch.num_rows,
                                                        type=pa.int8()))

    l_tagged = left.map_batches(prep_left, batch_format="pyarrow")
    r_tagged = right.map_batches(prep_right, batch_format="pyarrow")
    unioned = l_tagged.union(r_tagged)
    rts = right_renamed[right_ts]
    rvals = [right_renamed[c] for c in right_cols]

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        lrows = g[g["__side__"] == 0].drop(columns=["__side__", rts, *rvals],
                                           errors="ignore")
        rrows = g[g["__side__"] == 1]
        if len(rrows) == 0 or len(lrows) == 0:
            out = lrows.copy()
            out[rts] = pd.NaT
            for c in rvals:
                out[c] = None
            return out
        rrows = rrows.sort_values([rts, *rvals], kind="mergesort")
        r_times = rrows[rts].to_numpy()
        l_times = lrows[left_ts].to_numpy()
        side = "left" if strict else "right"
        idx = np.searchsorted(r_times, l_times, side=side) - 1
        matched = idx >= 0
        out = lrows.copy()
        safe_idx = np.clip(idx, 0, len(rrows) - 1)
        out[rts] = np.where(matched, r_times[safe_idx], np.datetime64("NaT"))
        for c in rvals:
            vals = rrows[c].to_numpy()[safe_idx]
            out[c] = pd.Series(vals, index=out.index).where(pd.Series(matched, index=out.index))
        return out

    return unioned.groupby(key).map_groups(per_key, batch_format="pandas")
