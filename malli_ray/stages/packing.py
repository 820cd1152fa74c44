"""Sequence packing: group documents into fixed token-budget training blocks.

The LLM-pipeline step between tokenization and shard writing: every document
carries a token (or char) count and must land in a block whose total stays
near a budget. Two variants:

- ``chunk_blocks``: non-resetting budget chunking — ``block_id =
  floor(cumulative_count_before / cap)`` within a partition group, computed
  with ONE groupby shuffle and a vectorized per-group cumsum (exactly the
  SQL window ``SUM(n) OVER (PARTITION BY g ORDER BY id) - n``, so it is
  oracle-checkable). Blocks may overflow by at most one document.
- ``pack_greedy``: classic greedy first-fit-in-order packing (a block closes
  when the NEXT doc would overflow; oversized docs get their own block).
  The resetting scan is inherently sequential per group — a bounded numpy
  loop over the group's rows.

Partitioning assumption (documented, same as windows.sessionize): one
group's rows fit in a worker's memory. At 100 TB pick a grouping key of
bounded size (source × date shard); only (group, id, count) columns move
through the shuffle, never the payload.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from . import concurrency_kwargs as _conc

__all__ = ["chunk_blocks", "pack_greedy", "greedy_block_ids",
           "concat_token_blocks", "padding_waste_report",
           "truncate_sequences", "spfhp_plan", "pack_histogram"]


def chunk_blocks(ds: Dataset, group_column: str, id_column: str,
                 count_column: str, cap: int) -> Dataset:
    """(group, id, count, block_id) with block_id = cum_before // cap per
    group in id order."""

    from .analytics import _adjacent_change_mask, bucketed_groups

    def per_bucket(g: pa.Table) -> pa.Table:
        # hash(group) % buckets exchange (never one Python call per
        # distinct group); per bucket ONE sort + a run-rebased cumsum
        t = g.sort_by([(group_column, "ascending"),
                       (id_column, "ascending")])
        n = t.column(count_column).to_numpy(
            zero_copy_only=False).astype(np.int64)
        cum_before = np.cumsum(n) - n
        starts = np.flatnonzero(_adjacent_change_mask(t, [group_column]))
        lens = np.diff(np.append(starts, t.num_rows))
        before = cum_before - np.repeat(cum_before[starts], lens)
        return t.append_column("block_id", pa.array(before // cap,
                                                    type=pa.int64()))

    cols = [group_column, id_column, count_column]
    return bucketed_groups(ds.select_columns(cols), group_column,
                           per_bucket, seed=17)


def greedy_block_ids(counts: np.ndarray, cap: int) -> np.ndarray:
    """Greedy first-fit-in-order block ids for one ordered group: the block
    closes when the next doc would push the total past ``cap``; a doc larger
    than ``cap`` occupies its own block."""
    out = np.empty(len(counts), dtype=np.int64)
    block, total = 0, 0
    for i, c in enumerate(counts):
        c = int(c)
        if total > 0 and total + c > cap:
            block += 1
            total = 0
        out[i] = block
        total += c
    return out


def pack_greedy(ds: Dataset, group_column: str, id_column: str,
                count_column: str, cap: int) -> Dataset:
    """(group, id, count, block_id) with greedy resetting packing per group."""

    from .analytics import _adjacent_change_mask, bucketed_groups

    def per_bucket(g: pa.Table) -> pa.Table:
        # bucketed exchange; greedy packing is inherently sequential per
        # group, so the per-RUN loop stays — but in-process per bucket,
        # never one Ray map_groups call per distinct group
        t = g.sort_by([(group_column, "ascending"),
                       (id_column, "ascending")])
        n = t.column(count_column).to_numpy(
            zero_copy_only=False).astype(np.int64)
        starts = np.flatnonzero(_adjacent_change_mask(t, [group_column]))
        bounds = np.append(starts, t.num_rows)
        out = np.empty(t.num_rows, dtype=np.int64)
        for i in range(len(starts)):
            lo, hi = bounds[i], bounds[i + 1]
            out[lo:hi] = greedy_block_ids(n[lo:hi], cap)
        return t.append_column("block_id", pa.array(out, type=pa.int64()))

    cols = [group_column, id_column, count_column]
    return bucketed_groups(ds.select_columns(cols), group_column,
                           per_bucket, seed=17)


def concat_token_blocks(ds: Dataset, group_column: str, id_column: str,
                        count_column: str, block_size: int) -> Dataset:
    """GPT-style concat-and-cut packing: documents in ``id`` order within a
    group form one contiguous token stream; the stream is cut into blocks of
    exactly ``block_size`` tokens, and documents SPLIT across block
    boundaries (unlike ``chunk_blocks``/``pack_greedy``, which keep each doc
    whole). Emits one row per (document, block) span:

      ``(group, id, block_id, tok_start, tok_end, block_offset)``

    where ``[tok_start, tok_end)`` is the within-document token range the
    span covers (0-based, exclusive end) and ``block_offset`` is where the
    span begins inside its block.  Every block except a group's last holds
    exactly ``block_size`` tokens; docs with count <= 0 (or null) emit no
    spans.  All arithmetic is integer — SQL replays it with a window cumsum
    + ``range(first_blk, last_blk + 1)`` expansion, so the op is fully
    oracle-checkable.

    Scale shape: only ``(group, id, count)`` shuffle (never the payload);
    one groupby exchange, then a fully vectorized per-group expansion
    (cumsum + repeat/arange — no Python loop).  Partitioning assumption, as
    chunk_blocks: one group's (id, count) rows fit in a worker (pick a
    bounded grouping key — source x date shard — at 100 TB); the flat span
    output streams.  A trainer then joins spans back to tokenized payloads
    by id (broadcast or bucketed join) and assembles blocks shard-locally.
    """
    if block_size <= 0:
        raise ValueError("block_size must be positive")
    B = int(block_size)

    from .analytics import _adjacent_change_mask, bucketed_groups

    def per_bucket(g: pa.Table) -> pa.Table:
        # bucketed exchange + run-rebased cumsum: `before` restarts at
        # each group's first row, everything downstream is per-row math
        # vectorized across ALL groups in the bucket at once
        t = g.sort_by([(group_column, "ascending"),
                       (id_column, "ascending")])
        n_all = t.column(count_column).to_numpy(zero_copy_only=False)
        n_all = np.nan_to_num(n_all.astype(np.float64),
                              nan=0.0).astype(np.int64)
        # clamp BEFORE the cumsum: a negative count must contribute zero
        # to every later doc's offset (docstring: count <= 0 docs emit no
        # spans), not shift the whole group's block ids
        n_all = np.maximum(n_all, 0)
        cum_before = np.cumsum(n_all) - n_all
        starts = np.flatnonzero(_adjacent_change_mask(t, [group_column]))
        lens = np.diff(np.append(starts, t.num_rows))
        before_all = cum_before - np.repeat(cum_before[starts], lens)
        keep = n_all > 0
        keep_idx = pa.array(np.flatnonzero(keep), type=pa.int64())
        n = n_all[keep]
        before = before_all[keep]
        gcol = t.column(group_column)
        idcol = t.column(id_column)
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        if isinstance(idcol, pa.ChunkedArray):
            idcol = idcol.combine_chunks()
        gcol = gcol.take(keep_idx)
        idcol = idcol.take(keep_idx)
        first = before // B
        last = (before + n - 1) // B
        k = last - first + 1
        rows = np.repeat(np.arange(len(n), dtype=np.int64), k)
        offs = np.arange(int(k.sum()), dtype=np.int64) \
            - np.repeat(np.cumsum(k) - k, k)
        blk = first[rows] + offs
        span_lo = np.maximum(before[rows], blk * B)
        span_hi = np.minimum(before[rows] + n[rows], (blk + 1) * B)
        row_idx = pa.array(rows, type=pa.int64())
        return pa.table({
            group_column: gcol.take(row_idx),
            id_column: idcol.take(row_idx),
            "block_id": pa.array(blk, type=pa.int64()),
            "tok_start": pa.array(span_lo - before[rows], type=pa.int64()),
            "tok_end": pa.array(span_hi - before[rows], type=pa.int64()),
            "block_offset": pa.array(span_lo - blk * B, type=pa.int64()),
        })

    cols = [group_column, id_column, count_column]
    return bucketed_groups(ds.select_columns(cols), group_column,
                           per_bucket, seed=17)


# ---------------------------------------------------------------------------
# sliding-window document chunking (context-window splitting)
# ---------------------------------------------------------------------------


def chunk_text(ds: Dataset, text_column: str, id_column: str,
               size: int, stride: int, concurrency=None) -> Dataset:
    """Split long documents into overlapping character windows (the
    long-doc -> context-window step before tokenization): chunk ``i``
    covers characters ``[i*stride, i*stride + size)``; the last window
    starts at the smallest multiple of ``stride`` whose window reaches the
    end, so every character lands in >= 1 chunk and no chunk starts past
    the text.  Empty/null docs emit no chunks.

    Shuffle-free flat expansion per batch (streaming — the output block
    count grows, the executor pipelines it): char counts via polars
    len_chars, per-doc chunk counts by exact integer ceil, one vectorized
    str.slice with per-row offsets.  Character (not byte) offsets — the
    same unit as SQL substr/length.

    Emits ``(id, chunk_id, chunk_start, chunk_text, chunk_len)``."""
    if size <= 0 or stride <= 0:
        raise ValueError("size and stride must be positive")
    if stride > size:
        raise ValueError(
            f"stride={stride} > size={size} would skip characters")

    def chunk(batch: pa.Table) -> pa.Table:
        import polars as pl
        ids = batch.column(id_column)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        col = batch.column(text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            col = col.cast(pa.string())
        texts = pl.from_arrow(col).fill_null("")
        n = texts.str.len_chars().to_numpy().astype(np.int64)
        k = np.where(n == 0, 0,
                     np.where(n <= size, 1,
                              (n - size + stride - 1) // stride + 1))
        rows = np.repeat(np.arange(batch.num_rows, dtype=np.int64), k)
        # chunk index within each doc: global arange minus each doc's start
        offs = np.arange(len(rows), dtype=np.int64) \
            - np.repeat(np.cumsum(k) - k, k)
        starts = offs * stride
        out = pl.DataFrame({
            "t": texts.gather(rows),
            "start": starts,
        }).select(pl.col("t").str.slice(pl.col("start"), size)
                  .alias("chunk_text"))
        chunk_arr = out.get_column("chunk_text")
        return pa.table({
            id_column: pc.take(ids, pa.array(rows)),
            "chunk_id": pa.array(offs),
            "chunk_start": pa.array(starts),
            "chunk_text": chunk_arr.to_arrow().cast(pa.string()),
            "chunk_len": chunk_arr.str.len_chars().cast(pl.Int64).to_arrow(),
        })

    return ds.map_batches(chunk, batch_format="pyarrow", **_conc(concurrency))


# ---------------------------------------------------------------------------
# packing-efficiency report + context-length enforcement (sequences table)
# ---------------------------------------------------------------------------


def padding_waste_report(ds: Dataset, tokens_column: str = "tokens",
                         group_column: str = "source",
                         block_len: int = 2048,
                         null_group: str = "") -> Dataset:
    """Per-group packing-efficiency report for pad-to-``block_len``
    training: how many tokens of padding would each corpus slice cost if
    every sequence were padded up to a multiple of ``block_len`` (the
    no-packing baseline a packer is judged against).

    Emits ``(group, n_seqs, total_tokens, n_blocks, padded_tokens,
    waste_tokens, waste_pct)`` — all integer-exact except ``waste_pct``,
    which is ONE IEEE division of two exactly-computed int64 sums (the
    bit-safe float contract).  Token counts come from the list lengths
    (never a declared-count column — the n_tok!=len anomaly must not skew
    the report).

    Scale shape: each batch collapses to O(groups) partial rows map-side
    (one polars group_by over the batch), so the ONE groupby exchange
    carries ``batches x groups`` tiny rows; null group keys fold to
    ``null_group`` map-side (SQL ``COALESCE(g,'')`` parity — and Ray's
    sort-based groupby cannot sort null string keys)."""
    if block_len <= 0:
        raise ValueError("block_len must be positive")
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        lens = pc.cast(pc.list_value_length(batch.column(tokens_column)),
                       pa.int64())
        grp = pc.fill_null(batch.column(group_column),
                           pa.scalar(null_group, pa.string()))
        n = pl.from_arrow(lens.combine_chunks()
                          if isinstance(lens, pa.ChunkedArray) else lens)
        blocks = (n + (block_len - 1)) // block_len
        df = pl.DataFrame({group_column: pl.from_arrow(
                               grp.combine_chunks()
                               if isinstance(grp, pa.ChunkedArray) else grp),
                           "__n": n, "__b": blocks})
        out = (df.group_by(group_column)
               .agg(n_seqs=pl.len().cast(pl.Int64),
                    total_tokens=pl.col("__n").sum(),
                    n_blocks=pl.col("__b").sum()))
        return out.to_arrow()

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(group_column)
           .aggregate(Sum("n_seqs", alias_name="n_seqs"),
                      Sum("total_tokens", alias_name="total_tokens"),
                      Sum("n_blocks", alias_name="n_blocks")))

    def finish(batch: pa.Table) -> pa.Table:
        total = pc.cast(batch.column("total_tokens"), pa.int64())
        blocks = pc.cast(batch.column("n_blocks"), pa.int64())
        padded = pc.multiply_checked(blocks,
                                     pa.scalar(block_len, pa.int64()))
        waste = pc.subtract(padded, total)
        return pa.table({
            group_column: batch.column(group_column),
            "n_seqs": pc.cast(batch.column("n_seqs"), pa.int64()),
            "total_tokens": total,
            "n_blocks": blocks,
            "padded_tokens": padded,
            "waste_tokens": waste,
            "waste_pct": pc.divide(pc.cast(waste, pa.float64()),
                                   pc.cast(padded, pa.float64()))})

    return agg.map_batches(finish, batch_format="pyarrow")


def truncate_sequences(ds: Dataset, tokens_column: str = "tokens",
                       max_len: int = 2048,
                       count_column: str | None = "n_tok",
                       flag_column: str = "was_truncated") -> Dataset:
    """Context-length enforcement: clip every token list to its first
    ``max_len`` elements, refresh ``count_column`` to the ACTUAL kept
    length, and flag clipped rows.  The standard pre-packing step for a
    model context window.

    Map-only (``pc.list_slice`` is a zero-copy offset rewrite — the
    values buffer is shared), shuffle-free, payload-preserving; all other
    columns pass through untouched."""
    if max_len <= 0:
        raise ValueError("max_len must be positive")

    def clip(batch: pa.Table) -> pa.Table:
        toks = batch.column(tokens_column)
        lens = pc.list_value_length(toks)
        clipped = pc.list_slice(toks, 0, max_len)
        new_len = pc.cast(pc.list_value_length(clipped), pa.int64())
        batch = batch.set_column(
            batch.schema.get_field_index(tokens_column),
            tokens_column, clipped)
        if count_column is not None:
            idx = batch.schema.get_field_index(count_column)
            cnt = pc.cast(new_len, batch.schema.field(idx).type)
            batch = batch.set_column(idx, count_column, cnt)
        return batch.append_column(
            flag_column, pc.fill_null(pc.greater(
                pc.cast(lens, pa.int64()), pa.scalar(max_len, pa.int64())),
                False))

    return ds.map_batches(clip, batch_format="pyarrow")


def spfhp_plan(hist: np.ndarray, max_len: int,
               max_events: int = 10_000_000):
    """Driver-side Shortest-Pack-First Histogram-Packing plan (Krell et
    al. 2021, "Efficient Sequence Packing without Cross-contamination",
    arXiv:2107.02027): decide a near-optimal assignment of sequences to
    fixed-capacity training packs FROM THE LENGTH HISTOGRAM ALONE — the
    driver state is O(max_len), independent of corpus size, which is what
    makes histogram packing the scale-correct alternative to per-doc
    first-fit (whose driver would have to see every document).

    Deterministic batched spec (what both this planner and the naive
    per-doc reference in tools/make_golden.py implement):

    - lengths are processed from ``max_len`` down to 1;
    - each step places ``k = min(remaining docs, packs in the chosen
      group)`` docs one-per-pack into the OPEN PACK GROUP with the
      smallest remaining capacity ``>= L`` (ties: earliest-created group;
      within a group, lowest pack ids first);
    - if no group fits, all remaining docs of that length open new packs
      (ids assigned contiguously in rank order);
    - the ``k`` just-filled packs split off as a NEW group (appended in
      creation order), so they are immediately eligible again — the
      shortest-pack-first greed that stuffs repeats of one length into
      the same pack across iterations;
    - docs of equal length consume ranks in ``(length, id)`` sort order.

    Returns ``(plan, n_packs, n_events)`` where ``plan[L] =
    (rank_starts, id_starts)``: doc with per-length rank ``r`` maps to
    ``id_starts[j] + (r - rank_starts[j])`` for ``j = searchsorted(
    rank_starts, r, 'right') - 1``.  ``max_events`` bounds the planning
    loop fail-loud (adversarial histograms could fragment groups; real
    length distributions plan in O(10^3-10^5) events)."""
    from collections import deque

    hist = np.asarray(hist, dtype=np.int64)
    if len(hist) != max_len + 1:
        raise ValueError("spfhp_plan: hist must have max_len+1 bins")
    if hist[0] != 0:
        raise ValueError("spfhp_plan: zero-length sequences unsupported")
    groups: dict[int, list] = {}      # gid -> [ranges [(start, n)], m]
    buckets: dict[int, deque] = {}    # rem -> FIFO of gids
    live = np.zeros(max_len + 1, dtype=np.int64)
    plan_runs: dict[int, list] = {}
    next_gid = 0
    next_pack = 0
    events = 0

    def _take(ranges: list, k: int) -> list:
        taken = []
        while k:
            s, n = ranges[0]
            t = min(k, n)
            taken.append((s, t))
            if t == n:
                ranges.pop(0)
            else:
                ranges[0] = (s + t, n - t)
            k -= t
        return taken

    for L in range(max_len, 0, -1):
        c = int(hist[L])
        if c <= 0:
            continue
        runs = plan_runs.setdefault(L, [])
        while c > 0:
            events += 1
            if events > max_events:
                raise ValueError(
                    f"spfhp_plan: exceeded max_events={max_events} "
                    f"(pathologically fragmented histogram); raise the "
                    f"cap or coarsen lengths")
            nz = np.flatnonzero(live[L:])
            if len(nz) == 0:
                runs.append((next_pack, c))
                rem = max_len - L
                if rem >= 1:
                    groups[next_gid] = [[(next_pack, c)], c]
                    buckets.setdefault(rem, deque()).append(next_gid)
                    live[rem] += 1
                    next_gid += 1
                next_pack += c
                c = 0
            else:
                rem = L + int(nz[0])
                gid = buckets[rem][0]
                ranges, m = groups[gid]
                k = min(c, m)
                taken = _take(ranges, k)
                runs.extend(taken)
                if m == k:
                    buckets[rem].popleft()
                    live[rem] -= 1
                    del groups[gid]
                else:
                    groups[gid][1] = m - k
                new_rem = rem - L
                if new_rem >= 1:
                    groups[next_gid] = [list(taken), k]
                    buckets.setdefault(new_rem, deque()).append(next_gid)
                    live[new_rem] += 1
                    next_gid += 1
                c -= k

    plan = {}
    for L, runs in plan_runs.items():
        n = np.array([r[1] for r in runs], dtype=np.int64)
        rank_starts = np.zeros(len(n), dtype=np.int64)
        np.cumsum(n[:-1], out=rank_starts[1:])
        plan[L] = (rank_starts,
                   np.array([r[0] for r in runs], dtype=np.int64))
    return plan, next_pack, events


def pack_histogram(ds: Dataset, id_column: str, count_column: str,
                   max_len: int, num_buckets: int = 32,
                   max_events: int = 10_000_000) -> Dataset:
    """Distributed SPFHP sequence packing: assign every document a
    ``pack_id`` such that each pack's total length fits ``max_len``,
    using :func:`spfhp_plan`'s histogram-level plan.  Output rows:
    ``(id, length, pack_id)``.

    Scale shape: pass 1 collapses each batch to its length histogram
    (O(distinct lengths) partial rows; the driver folds O(batches) such
    partials — at extreme block counts insert one combining groupby
    first), the plan is computed driver-side from O(max_len) ints, and
    pass 2 is ONE ``hash(length) % num_buckets`` exchange: every doc of
    a length lands in one bucket, a per-bucket ``(length, id)`` Arrow
    sort + run-rebased ``arange`` yields the GLOBAL per-length rank, and
    the broadcast plan maps ``(length, rank) -> pack_id`` with two
    ``searchsorted`` lookups per run.  The input executes twice, so it
    is materialized once up front (the documented re-execution guard; a
    parquet checkpoint at 100 TB).  Length skew bounds: the largest
    bucket carries the most frequent lengths' rows — lengths are
    bounded by ``max_len``, so hot lengths are the histogram's max bin,
    not an unbounded entity key.  Counts outside ``[1, max_len]`` or
    null raise (clip upstream with :func:`truncate_sequences`); ids
    must sort bytewise (ASCII) for the fixture-parity rank order."""
    import ray

    from .analytics import bucketed_groups

    if max_len <= 0:
        raise ValueError("pack_histogram: max_len must be positive")
    ds = ds.select_columns([id_column, count_column]).materialize()

    def hist_partial(batch: pa.Table) -> pa.Table:
        v = batch.column(count_column)
        if v.null_count:
            raise ValueError("pack_histogram: null counts unsupported")
        a = v.to_numpy(zero_copy_only=False).astype(np.int64)
        if len(a) and (a.min() < 1 or a.max() > max_len):
            raise ValueError(
                f"pack_histogram: counts outside [1, {max_len}] — clip "
                f"upstream (truncate_sequences) or drop empties")
        h = np.bincount(a, minlength=max_len + 1)
        nz = np.flatnonzero(h)
        return pa.table({"L": pa.array(nz, pa.int64()),
                         "cnt": pa.array(h[nz], pa.int64())})

    hist = np.zeros(max_len + 1, dtype=np.int64)
    for part in ds.map_batches(hist_partial,
                               batch_format="pyarrow").take_all():
        hist[part["L"]] += part["cnt"]

    plan, n_packs, _ = spfhp_plan(hist, max_len, max_events=max_events)
    plan_ref = ray.put(plan)

    def per_bucket(t: pa.Table) -> pa.Table:
        plan = ray.get(plan_ref)
        idx = pc.sort_indices(t, sort_keys=[(count_column, "ascending"),
                                            (id_column, "ascending")])
        t = t.take(idx)
        L = t.column(count_column).to_numpy(zero_copy_only=False).astype(
            np.int64)
        pack = np.empty(len(L), dtype=np.int64)
        starts = np.flatnonzero(np.concatenate(
            ([True], L[1:] != L[:-1]))) if len(L) else np.array([], np.int64)
        ends = np.append(starts[1:], len(L))
        for s, e in zip(starts, ends):
            rank_starts, id_starts = plan[int(L[s])]
            r = np.arange(e - s, dtype=np.int64)
            j = np.searchsorted(rank_starts, r, side="right") - 1
            pack[s:e] = id_starts[j] + (r - rank_starts[j])
        return pa.table({id_column: t.column(id_column),
                         "length": pa.array(L, pa.int64()),
                         "pack_id": pa.array(pack, pa.int64())})

    return bucketed_groups(ds, count_column, per_bucket,
                           num_buckets=num_buckets)
