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

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from . import concurrency_kwargs as _conc

logger = logging.getLogger(__name__)

__all__ = ["chunk_blocks", "pack_greedy", "greedy_block_ids",
           "concat_token_blocks", "padding_waste_report",
           "truncate_sequences", "spfhp_plan", "pack_histogram",
           "assemble_packed_blocks", "window_tokens"]


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


def clip_sentinel_tokens(ds: Dataset, tokens_column: str = "tokens",
                         max_len: int = 2048,
                         bos_id: "int | None" = None,
                         eos_id: "int | None" = None) -> Dataset:
    """FUSED context-clip + sentinel insertion — the composition of
    :func:`truncate_sequences` (count/flag columns elided) and
    :func:`malli_ray.stages.text.add_sentinel_tokens` in ONE kernel:
    a single output values allocation and a single vectorized gather per
    batch, instead of building the intermediate clipped list array and
    then re-scattering it.  Null lists count as empty and still get
    sentinels (SQL parity: ``[bos] || COALESCE(tokens[:max_len], []) ||
    [eos]``).  Map-only, shuffle-free; all other columns pass through."""
    if max_len <= 0:
        raise ValueError("max_len must be positive")
    if bos_id is None and eos_id is None:
        raise ValueError("clip_sentinel_tokens: pass bos_id and/or eos_id"
                         " (use truncate_sequences for clip alone)")
    nb = 1 if bos_id is not None else 0
    ne = 1 if eos_id is not None else 0

    def fused(batch: pa.Table) -> pa.Table:
        toks = batch.column(tokens_column)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        val_type = toks.type.value_type
        rows = batch.num_rows
        n0 = pc.fill_null(pc.cast(pc.list_value_length(toks), pa.int64()),
                          0).to_numpy(zero_copy_only=False)
        v = toks.flatten().to_numpy(zero_copy_only=False)
        doc_off = np.cumsum(n0) - n0
        n = np.minimum(n0, max_len)
        new_n = n + nb + ne
        new_off = np.zeros(rows + 1, dtype=np.int64)
        np.cumsum(new_n, out=new_off[1:])
        out_v = np.empty(int(new_off[-1]), dtype=np.int64)
        if nb:
            out_v[new_off[:-1]] = bos_id
        if ne:
            out_v[new_off[1:] - 1] = eos_id
        within = (np.arange(int(n.sum()), dtype=np.int64)
                  - np.repeat(np.cumsum(n) - n, n))
        out_v[np.repeat(new_off[:-1] + nb, n) + within] = \
            v[np.repeat(doc_off, n) + within]
        col = pa.ListArray.from_arrays(
            pa.array(new_off.astype(np.int32), type=pa.int32()),
            pa.array(out_v, type=pa.int64()).cast(val_type))
        i = batch.schema.get_field_index(tokens_column)
        return batch.set_column(i, tokens_column, col)

    return ds.map_batches(fused, batch_format="pyarrow")


def _emit_fragments(toks: pa.Array, before: np.ndarray, grp: pa.Array,
                    B: int, group_column: str) -> pa.Table:
    """Slice each doc's token list into per-block fragments (a fragment =
    doc x block intersection — at most ``1 + n/block_size`` per doc) with
    one vectorized gather.  ``toks`` is the (combined) list array of the
    matched docs, ``before`` their global stream offsets, ``grp`` their
    group keys, all row-aligned."""
    n = pc.fill_null(pc.cast(pc.list_value_length(toks), pa.int64()),
                     0).to_numpy(zero_copy_only=False)
    values = toks.flatten()
    doc_off = np.cumsum(n) - n
    first = before // B
    last = (before + np.maximum(n, 1) - 1) // B
    k = last - first + 1
    frag_doc = np.repeat(np.arange(len(n), dtype=np.int64), k)
    j = np.arange(int(k.sum()), dtype=np.int64) \
        - np.repeat(np.cumsum(k) - k, k)
    blk = first[frag_doc] + j
    span_lo = np.maximum(before[frag_doc], blk * B)
    span_hi = np.minimum(before[frag_doc] + n[frag_doc], (blk + 1) * B)
    flen = span_hi - span_lo
    tok_start = span_lo - before[frag_doc]
    tot = int(flen.sum())
    flat = np.repeat(doc_off[frag_doc] + tok_start, flen) \
        + (np.arange(tot, dtype=np.int64)
           - np.repeat(np.cumsum(flen) - flen, flen))
    frag_off = np.zeros(len(flen) + 1, dtype=np.int64)
    np.cumsum(flen, out=frag_off[1:])
    vals = pc.take(values, pa.array(flat, type=pa.int64()))
    if isinstance(vals, pa.ChunkedArray):
        vals = vals.combine_chunks()
    return pa.table({
        group_column: grp.take(pa.array(frag_doc, type=pa.int64())),
        "block_id": pa.array(blk, type=pa.int64()),
        "__boff__": pa.array(span_lo - blk * B, type=pa.int64()),
        "__tstart__": pa.array(tok_start, type=pa.int64()),
        "__frag__": pa.ListArray.from_arrays(
            pa.array(frag_off.astype(np.int32), type=pa.int32()),
            vals)})


def assemble_packed_blocks(ds: Dataset, tokens_column: str = "tokens",
                           id_column: str = "doc_id",
                           group_column: str = "source",
                           block_size: int = 2048,
                           null_group: str = "",
                           num_buckets: int = 64,
                           tokens_type: "pa.DataType | None" = None,
                           max_broadcast_docs: int = 8_000_000
                           ) -> Dataset:
    """Materialize trainer-ready packed blocks from the sequences table —
    the terminal step the span/assignment ops (:func:`concat_token_blocks`,
    :func:`pack_histogram`) prepare for.  Documents within a group form one
    contiguous token stream in ``id`` order (GPT-style concat-and-cut); the
    stream is cut every ``block_size`` tokens and each block row carries
    the three columns a training loader consumes:

      - ``input_ids``   : the block's tokens (``list`` of the input type);
      - ``position_ids``: each token's WITHIN-DOCUMENT index (int32) — a
        document split across blocks continues its positions, fresh
        documents restart at 0 (the cross-contamination-free convention of
        Krell 2021 §3.2);
      - ``segment_ids`` : 1-based index of the token's document within the
        block (int32) — the block-diagonal attention-mask key.

    plus ``(group, block_id, n_tokens, n_docs)``.  Every block except a
    group's last holds exactly ``block_size`` tokens.  Empty/null token
    lists contribute nothing (and never count as a segment); null group
    keys fold to ``null_group`` map-side.  ``id`` must be unique per
    group (assembly runs post-dedup; a duplicated id makes the concat
    order ill-defined) — duplicates RAISE in the assignment pass.

    Scale shape (three phases, NO group-fits-worker assumption — the
    unit of state is one BLOCK, parallelism is block-level, a hot group
    spreads over every bucket):

      1. stream-offset assignment: ONE counts-only bucketed exchange
         (``(group, id, n)`` rows — never the payload) computes each
         doc's global offset ``before`` in its group's stream via a
         run-rebased cumsum (materialized once: O(docs) scalar rows);
      2. ``(group, before)`` attaches to the payload and each doc slices
         into per-block fragments (a fragment = doc x block intersection
         — at most ``1 + n/block_size`` per doc) with one vectorized
         gather.  Two strategies, picked by the assignment table's size:
         when it holds ≤ ``max_broadcast_docs`` rows it broadcasts ONCE
         (``ray.put`` of hash-sorted lookup arrays, ~32 B/doc,
         object-store resident and shared per node) and the attach is a
         map-only ``searchsorted`` pass — the payload never shuffles
         here; above the cap (10^12 docs ≈ terabytes — never
         broadcastable) it falls back (logged) to an id-keyed tag+union
         bucketed join (Ray's native join rejects list payload columns
         AND has the documented empty-tiny-side bug);
      3. fragments exchange ONCE on ``hash((group, block_id))`` —
         evenly sized buckets regardless of group skew — and each
         bucket rebuilds its blocks with run-masked vector passes
         (values buffer concatenated in sorted fragment order, reused
         zero-copy for ``input_ids``).

    On the broadcast path the payload crosses the wire exactly once
    (the fragment exchange — measured 25.2 s → 7.7 s at sf0.1,
    num_buckets=64, vs the join path); on the fallback it crosses twice
    — the price of unbounded groups.  Ray's HASH_SHUFFLE strategy was
    measured 3.5× SLOWER than sort-shuffle on this exchange (aggregator
    actors serialize the large list payload through Python) — the
    sort-based exchange is deliberate.  The single-exchange alternative (key on the raw
    group) serializes each group into one worker, which a 47%-hot
    source makes a straggler (measured 55 s vs ~4 s at sf0.1).  A
    64-bit id-hash collision in the broadcast lookup (p ≈ n²/2⁶⁵) is
    detected after the sort and falls back to the join path."""
    if block_size <= 0:
        raise ValueError("block_size must be positive")
    B = int(block_size)

    from ..state.sketches import hash64
    from .analytics import _adjacent_change_mask, bucketed_groups

    def prep_counts(batch: pa.Table) -> pa.Table:
        grp = batch.column(group_column)
        if pa.types.is_null(grp.type):
            grp = grp.cast(pa.string())
        n = pc.fill_null(pc.cast(pc.list_value_length(
            batch.column(tokens_column)), pa.int64()), 0)
        out = pa.table({
            group_column: pc.fill_null(grp, pa.scalar(null_group,
                                                      pa.string())),
            id_column: batch.column(id_column),
            "__n__": n})
        return out.filter(pc.greater(n, 0))

    def assign_bucket(g: pa.Table) -> pa.Table:
        t = g.sort_by([(group_column, "ascending"),
                       (id_column, "ascending")])
        if t.num_rows:
            same = ~_adjacent_change_mask(t, [group_column, id_column])
            same[0] = False
            if same.any():
                i = int(np.flatnonzero(same)[0])
                raise ValueError(
                    f"assemble_packed_blocks: duplicate id "
                    f"{t.column(id_column)[i].as_py()!r} in group "
                    f"{t.column(group_column)[i].as_py()!r} — the concat "
                    f"order is ill-defined; dedup upstream "
                    f"(exact_dedup_keep_first / uniqueness_violations)")
        n = t.column("__n__").to_numpy(zero_copy_only=False)
        cum = np.cumsum(n) - n
        starts = np.flatnonzero(_adjacent_change_mask(t, [group_column]))
        lens = np.diff(np.append(starts, t.num_rows))
        before = cum - np.repeat(cum[starts], lens)
        return pa.table({
            group_column: t.column(group_column),
            id_column: t.column(id_column),
            "__before__": pa.array(before, type=pa.int64())})

    assign = bucketed_groups(
        ds.select_columns([group_column, id_column, tokens_column])
        .map_batches(prep_counts, batch_format="pyarrow"),
        group_column, assign_bucket, num_buckets=num_buckets,
        seed=17).materialize()
    n_docs_total = assign.count()

    tok_t = tokens_type
    if tok_t is None:
        sch = ds.schema(fetch_if_missing=False)
        if sch is not None and tokens_column in sch.base_schema.names:
            tok_t = sch.base_schema.field(tokens_column).type
    if tok_t is None:
        raise ValueError(
            "assemble_packed_blocks: tokens list type unknown on a lazy "
            "transformed dataset — pass tokens_type=pa.list_(...) "
            "explicitly (probing would execute the upstream pipeline)")
    if not (pa.types.is_list(tok_t) or pa.types.is_large_list(tok_t)):
        raise ValueError(
            f"assemble_packed_blocks: {tokens_column!r} must be a list "
            f"column, got {tok_t}")

    # --- phase 2a: broadcast attach (map-only, payload never shuffles) --
    frag_ds = None
    if n_docs_total <= max_broadcast_docs:
        import ray

        # transient driver pull of the O(docs) scalar table — bounded by
        # max_broadcast_docs (~32 B/doc, ≤ ~256 MB at the default cap)
        batches = list(assign.iter_batches(batch_format="pyarrow",
                                           batch_size=None))
        if batches:
            atbl = pa.concat_tables(batches)
            h = hash64(atbl.column(id_column), seed=23)
            order = np.argsort(h, kind="stable")
            hs = np.ascontiguousarray(h[order])
        else:  # no non-empty docs at all — empty lookup, nothing attaches
            atbl = None
            order = np.zeros(0, dtype=np.int64)
            hs = np.zeros(0, dtype=np.uint64)
        collision = False
        if len(hs) > 1:
            eq = np.flatnonzero(hs[1:] == hs[:-1])
            if len(eq):
                ids_s = atbl.column(id_column).combine_chunks().take(
                    pa.array(order, type=pa.int64()))
                for i in eq:
                    if ids_s[int(i)].as_py() == ids_s[int(i) + 1].as_py():
                        raise ValueError(
                            f"assemble_packed_blocks: id "
                            f"{ids_s[int(i)].as_py()!r} appears in "
                            f"multiple groups — ids must be globally "
                            f"unique (dedup upstream)")
                logger.warning(
                    "assemble_packed_blocks: 64-bit id-hash collision in "
                    "the broadcast lookup — falling back to the "
                    "tag+union join path")
                collision = True
        if not collision:
            if atbl is not None:
                take_o = pa.array(order, type=pa.int64())
                before_s = atbl.column("__before__").to_numpy(
                    zero_copy_only=False).astype(np.int64)[order]
                grp_s = atbl.column(group_column).combine_chunks().take(
                    take_o)
            else:
                before_s = np.zeros(0, dtype=np.int64)
                grp_s = pa.array([], pa.string())
            lookup_ref = ray.put((hs, before_s, grp_s))

            def attach_fragments(batch: pa.Table) -> pa.Table:
                hs_, before_, grp_ = ray.get(lookup_ref)
                hb = hash64(batch.column(id_column), seed=23)
                if len(hs_) == 0 or len(hb) == 0:
                    found = np.zeros(len(hb), dtype=bool)
                    idx = np.zeros(len(hb), dtype=np.int64)
                else:
                    idx = np.searchsorted(hs_, hb)
                    idx = np.minimum(idx, len(hs_) - 1)
                    found = hs_[idx] == hb
                toks = batch.column(tokens_column)
                if isinstance(toks, pa.ChunkedArray):
                    toks = toks.combine_chunks()
                toks = toks.cast(tok_t).filter(pa.array(found))
                idx_f = idx[found]
                return _emit_fragments(toks, before_[idx_f],
                                       grp_.take(pa.array(
                                           idx_f, type=pa.int64())),
                                       B, group_column)

            frag_ds = (ds.select_columns([id_column, tokens_column])
                       .map_batches(attach_fragments,
                                    batch_format="pyarrow"))
    else:
        logger.warning(
            "assemble_packed_blocks: %d docs exceed max_broadcast_docs=%d "
            "— using the id-keyed tag+union join path (payload crosses "
            "the wire twice)", n_docs_total, max_broadcast_docs)

    if frag_ds is None:
        def tag_payload(batch: pa.Table) -> pa.Table:
            h = hash64(batch.column(id_column), seed=23)
            return pa.table({
                id_column: batch.column(id_column),
                tokens_column: batch.column(tokens_column).cast(tok_t),
                group_column: pa.nulls(batch.num_rows, pa.string()),
                "__before__": pa.nulls(batch.num_rows, pa.int64()),
                "__side": pa.array(np.zeros(batch.num_rows,
                                            dtype=np.int8)),
                "__b": pa.array((h % np.uint64(num_buckets))
                                .astype(np.int64))})

        def tag_assign(batch: pa.Table) -> pa.Table:
            h = hash64(batch.column(id_column), seed=23)
            return pa.table({
                id_column: batch.column(id_column),
                tokens_column: pa.nulls(batch.num_rows, tok_t),
                group_column: batch.column(group_column),
                "__before__": batch.column("__before__"),
                "__side": pa.array(np.ones(batch.num_rows,
                                           dtype=np.int8)),
                "__b": pa.array((h % np.uint64(num_buckets))
                                .astype(np.int64))})

        uni = (ds.select_columns([id_column, tokens_column])
               .map_batches(tag_payload, batch_format="pyarrow")
               .union(assign.map_batches(tag_assign,
                                         batch_format="pyarrow")))

        def join_fragments(g: pa.Table) -> pa.Table:
            side = g.column("__side").to_numpy(zero_copy_only=False)
            pay = g.filter(pa.array(side == 0))
            asg = g.filter(pa.array(side == 1))
            # the id must be GLOBALLY unique, not just unique per group:
            # the payload row carries no group, so an id present in two
            # groups is ambiguous at this join (same-group dups already
            # raised in the assignment pass; this catches the cross-group
            # case — every row of an id hashes to this bucket, so the
            # check is complete)
            asg_ids = asg.column(id_column).combine_chunks()
            if len(asg_ids):
                vc = pc.value_counts(asg_ids)
                dup = vc.filter(pc.greater(vc.field("counts"),
                                           pa.scalar(1)))
                if len(dup):
                    raise ValueError(
                        f"assemble_packed_blocks: id "
                        f"{dup.field('values')[0].as_py()!r} appears in "
                        f"multiple groups — ids must be globally unique "
                        f"(dedup upstream)")
            # inner match: empty-token payload rows have no assign row
            idx = pc.index_in(pay.column(id_column), value_set=asg_ids)
            ok = pc.is_valid(idx)
            pay = pay.filter(ok)
            idx = idx.filter(ok)
            toks = pay.column(tokens_column)
            if isinstance(toks, pa.ChunkedArray):
                toks = toks.combine_chunks()
            take_idx = idx.cast(pa.int64())
            before = pc.take(asg.column("__before__"), take_idx).to_numpy(
                zero_copy_only=False).astype(np.int64)
            grp = pc.take(asg.column(group_column), take_idx)
            if isinstance(grp, pa.ChunkedArray):
                grp = grp.combine_chunks()
            return _emit_fragments(toks, before, grp, B, group_column)

        frag_ds = uni.groupby("__b").map_groups(join_fragments,
                                                batch_format="pyarrow")

    def assemble_bucket(g: pa.Table) -> pa.Table:
        t = g.sort_by([(group_column, "ascending"),
                       ("block_id", "ascending"),
                       ("__boff__", "ascending")])
        frags = t.column("__frag__")
        if isinstance(frags, pa.ChunkedArray):
            frags = frags.combine_chunks()
        val_type = frags.type.value_type
        flen = pc.cast(pc.list_value_length(frags),
                       pa.int64()).to_numpy(zero_copy_only=False)
        values = frags.flatten()
        total = int(flen.sum())
        if total >= 2 ** 31:
            raise ValueError(
                f"assemble_packed_blocks: bucket holds {total} tokens "
                f"(>= 2^31, int32 list offsets) — raise num_buckets")
        nfrag = t.num_rows
        if nfrag == 0:
            gtype = g.schema.field(group_column).type
            return pa.table({
                group_column: pa.array([], type=gtype),
                "block_id": pa.array([], type=pa.int64()),
                "input_ids": pa.array([], type=pa.list_(val_type)),
                "position_ids": pa.array([], type=pa.list_(pa.int32())),
                "segment_ids": pa.array([], type=pa.list_(pa.int32())),
                "n_tokens": pa.array([], type=pa.int64()),
                "n_docs": pa.array([], type=pa.int64())})
        starts = np.flatnonzero(
            _adjacent_change_mask(t, [group_column, "block_id"]))
        run_lens = np.diff(np.append(starts, nfrag))
        frag_off = np.cumsum(flen) - flen
        tok_start = t.column("__tstart__").to_numpy(zero_copy_only=False)
        # per-token: within-doc position = fragment's tok_start + intra
        pos = np.repeat(tok_start, flen) \
            + (np.arange(total, dtype=np.int64) - np.repeat(frag_off, flen))
        # per-token: 1-based fragment rank within its block (== doc rank:
        # a doc contributes at most one fragment per block)
        frank = np.arange(nfrag, dtype=np.int64) \
            - np.repeat(starts, run_lens) + 1
        seg = np.repeat(frank, flen)
        blk_tok = np.add.reduceat(flen, starts)
        out_off = np.zeros(len(starts) + 1, dtype=np.int64)
        np.cumsum(blk_tok, out=out_off[1:])
        off = pa.array(out_off.astype(np.int32), type=pa.int32())
        take_starts = pa.array(starts, type=pa.int64())
        gcol = t.column(group_column)
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        bcol = t.column("block_id")
        if isinstance(bcol, pa.ChunkedArray):
            bcol = bcol.combine_chunks()
        return pa.table({
            group_column: gcol.take(take_starts),
            "block_id": bcol.take(take_starts),
            "input_ids": pa.ListArray.from_arrays(off, values),
            "position_ids": pa.ListArray.from_arrays(
                off, pa.array(pos.astype(np.int32), type=pa.int32())),
            "segment_ids": pa.ListArray.from_arrays(
                off, pa.array(seg.astype(np.int32), type=pa.int32())),
            "n_tokens": pa.array(blk_tok, type=pa.int64()),
            "n_docs": pa.array(run_lens, type=pa.int64())})

    return bucketed_groups(frag_ds, [group_column, "block_id"],
                           assemble_bucket, num_buckets=num_buckets,
                           seed=17)


def window_tokens(ds: Dataset, tokens_column: str = "tokens",
                  id_column: str = "doc_id",
                  size: int = 256, stride: int = 128,
                  concurrency=None) -> Dataset:
    """Token-level sliding-window splitting (the LM counterpart of
    :func:`chunk_text`): window ``i`` of a document covers tokens
    ``[i*stride, i*stride + size)``; a document of ``n <= size`` tokens
    emits exactly one window, longer documents emit
    ``ceil((n - size) / stride) + 1`` so every token lands in >= 1 window
    and no window starts at or past the end.  Empty/null docs emit
    nothing.  Emits ``(id, win_id, win_start, win_len, input_ids)``.

    Shuffle-free flat expansion per batch (streaming): one gather over
    the flattened values buffer per batch (``pc.take`` — a C kernel),
    offsets rebuilt by cumsum.  Overlap duplication is inherent to the
    semantics (output tokens = ~``n * size/stride``); size the batch so
    ``batch_tokens * size/stride`` fits the worker heap."""
    if size <= 0 or stride <= 0:
        raise ValueError("size and stride must be positive")
    if stride > size:
        raise ValueError(
            f"stride={stride} > size={size} would skip tokens")

    def expand(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        toks = batch.column(tokens_column)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        val_type = toks.type.value_type
        n = pc.fill_null(pc.cast(pc.list_value_length(toks), pa.int64()),
                         0).to_numpy(zero_copy_only=False)
        values = toks.flatten()
        doc_start = np.cumsum(n) - n
        k = np.where(n == 0, 0,
                     np.where(n <= size, 1,
                              (n - size + stride - 1) // stride + 1))
        win_doc = np.repeat(np.arange(batch.num_rows, dtype=np.int64), k)
        wid = np.arange(len(win_doc), dtype=np.int64) \
            - np.repeat(np.cumsum(k) - k, k)
        ws = wid * stride
        wl = np.minimum(size, n[win_doc] - ws)
        tot = int(wl.sum())
        if tot >= 2 ** 31:
            raise ValueError(
                f"window_tokens: batch expands to {tot} tokens (>= 2^31 "
                f"int32 offsets) — lower the batch size")
        flat = np.repeat(doc_start[win_doc] + ws, wl) \
            + (np.arange(tot, dtype=np.int64)
               - np.repeat(np.cumsum(wl) - wl, wl))
        out_off = np.zeros(len(wl) + 1, dtype=np.int64)
        np.cumsum(wl, out=out_off[1:])
        vals = pc.take(values, pa.array(flat, type=pa.int64()))
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        return pa.table({
            id_column: pc.take(ids, pa.array(win_doc, type=pa.int64())),
            "win_id": pa.array(wid, type=pa.int64()),
            "win_start": pa.array(ws, type=pa.int64()),
            "win_len": pa.array(wl, type=pa.int64()),
            "input_ids": pa.ListArray.from_arrays(
                pa.array(out_off.astype(np.int32), type=pa.int32()),
                vals)})

    return ds.map_batches(expand, batch_format="pyarrow",
                          **_conc(concurrency))


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


def length_sorted_batches(ds: Dataset, id_column: str, count_column: str,
                          budget_tokens: int, max_len: int,
                          num_buckets: int = 32) -> Dataset:
    """Length-sorted stream-cut batching (the fairseq/T5 'sorted
    batching' dataloader prep): walk documents in global ``(length, id)``
    order and cut a new batch every time the running token total crosses
    a multiple of ``budget_tokens`` —
    ``batch_id = (sum of lengths before this doc) // budget_tokens``.
    Because neighbours in the order have near-equal lengths, per-batch
    padding-to-max waste is minimal without any bin-packing.  Output
    rows: ``(id, length, batch_id)``.

    Scale shape (the :func:`pack_histogram` pattern): pass 1 collapses
    each block to a bounded length histogram; the driver folds O(max_len)
    ints into the per-length BASE offsets (``sum of L'*count(L')`` over
    ``L' < L``); pass 2 is ONE ``hash(length) % num_buckets`` exchange
    where each bucket sorts ``(length, id)``, run-rebases the per-length
    rank, and computes ``(base[L] + rank*L) // budget`` vectorized.  SQL
    replays it with a window cumsum over ``ORDER BY length, id``.  The
    input executes twice — materialized once up front."""
    import ray

    from .analytics import bucketed_groups

    if budget_tokens <= 0:
        raise ValueError("length_sorted_batches: budget_tokens must be "
                         "positive")
    if max_len <= 0:
        raise ValueError("length_sorted_batches: max_len must be positive")
    ds = ds.select_columns([id_column, count_column]).materialize()

    def hist_partial(batch: pa.Table) -> pa.Table:
        v = batch.column(count_column)
        if v.null_count:
            raise ValueError("length_sorted_batches: null counts "
                             "unsupported")
        a = v.to_numpy(zero_copy_only=False).astype(np.int64)
        if len(a) and (a.min() < 1 or a.max() > max_len):
            raise ValueError(
                f"length_sorted_batches: counts outside [1, {max_len}] — "
                f"clip upstream (truncate_sequences) or drop empties")
        h = np.bincount(a, minlength=max_len + 1)
        nz = np.flatnonzero(h)
        return pa.table({"L": pa.array(nz, pa.int64()),
                         "cnt": pa.array(h[nz], pa.int64())})

    hist = np.zeros(max_len + 1, dtype=np.int64)
    for part in ds.map_batches(hist_partial,
                               batch_format="pyarrow").take_all():
        hist[part["L"]] += part["cnt"]
    tok = hist * np.arange(max_len + 1, dtype=np.int64)
    base = np.zeros(max_len + 1, dtype=np.int64)
    np.cumsum(tok[:-1], out=base[1:])   # tokens strictly before length L
    base_ref = ray.put(base)
    B = int(budget_tokens)

    def per_bucket(t: pa.Table) -> pa.Table:
        base = ray.get(base_ref)
        idx = pc.sort_indices(t, sort_keys=[(count_column, "ascending"),
                                            (id_column, "ascending")])
        t = t.take(idx)
        L = t.column(count_column).to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = len(L)
        starts = np.flatnonzero(np.concatenate(
            ([True], L[1:] != L[:-1]))) if n else np.array([], np.int64)
        rank = (np.arange(n, dtype=np.int64)
                - np.repeat(starts, np.diff(np.append(starts, n))))
        before = base[L] + rank * L
        return pa.table({id_column: t.column(id_column),
                         "length": pa.array(L, pa.int64()),
                         "batch_id": pa.array(before // B, pa.int64())})

    return bucketed_groups(ds, count_column, per_bucket,
                           num_buckets=num_buckets)


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
