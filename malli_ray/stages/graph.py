"""Distributed graph operators: connected components over an edge Dataset.

Ray-native training-data operator (no reference analogue — malli is
single-value): the SCALE path for near-dup clustering.  The existing
``dedup.cluster_pairs`` runs a driver union-find over the pairs output,
which is right while pairs fit one machine; ``connected_components`` is
the distributed alternative — hash-min label propagation with pointer
jumping (the classic MapReduce/Pregel formulation; the same shuffle shape
as Kiveris et al. 2014's star-contraction family).

Per round, two propagation steps of TWO bucketed exchanges each, zero
per-node Python:

1. neighbor min — attach: edges (both directions) union with the label
   table, bucket on ``hash(node) % num_buckets``; each bucket resolves
   ``label(a)`` for its edges with one sort + searchsorted and emits
   messages ``(b, label_a)``; then min: messages union with the label
   table, bucket on hash(node); each bucket takes the per-node minimum
   candidate (one sort + run mask) and flags changes against the old.
2. pointer jumping — the same two exchanges over the label table itself
   (``label(v) <- label(label(v))``), which halves chain depth every
   round: total rounds are O(log diameter), not O(diameter).

Rounds repeat until the neighbor-min step changes nothing (labels only
decrease, so the change count is an exact convergence test: a
neighbor-stable labeling is constant per component and the constant must
be the component min); each step materializes the label table — labels
are O(nodes), tiny next to the corpus the edges were derived from (at
100 TB checkpoint them to parquet instead).
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Sum

logger = logging.getLogger(__name__)

_SIDE, _BUCKET = "__gside__", "__gbucket__"


def _bucketed(batch: pa.Table, node_col: str, payload_col: str,
              payload, payload_type, side: int, num_buckets: int,
              seed: int) -> pa.Table:
    from ..state.sketches import hash64
    n = batch.num_rows
    nodes = batch.column(node_col)
    h = (hash64(nodes, seed=seed) % np.uint64(num_buckets)).astype(np.int64)
    return pa.table({
        "node": nodes,
        payload_col: (payload if payload is not None
                      else pa.nulls(n, payload_type)),
        _SIDE: pa.array(np.full(n, side, dtype=np.int8)),
        _BUCKET: pa.array(h)})


def connected_components(edges: Dataset, src: str, dst: str,
                         out_node: str = "node",
                         out_component: str = "component",
                         num_buckets: int = 64,
                         num_partitions: int | None = None,
                         max_rounds: int = 50) -> Dataset:
    """Connected components of the undirected graph given by ``edges``:
    one row per node that appears in any edge — ``(out_node,
    out_component)`` where the component label is the MINIMUM node id in
    the component (ids must be orderable; ints and strings both work).

    Self-loops and duplicate edges are tolerated.  Nodes with no edges
    never appear (a corpus-level "everything else is its own singleton"
    is a broadcast anti-join away and needs no propagation).

    See the module docstring for the per-round shuffle shape and the
    100-TB story.
    """
    import ray

    # one fixed partition count for every shuffle AND the per-step label
    # coalesce (see one_step) — the iterative loop needs a bounded block
    # count per round
    if num_partitions is None:
        num_partitions = num_buckets

    node_type = edges.schema().base_schema.field(src).type
    if edges.count() == 0:
        return ray.data.from_arrow(pa.table({
            out_node: pa.array([], type=node_type),
            out_component: pa.array([], type=node_type)}))

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = batch.column(src)
        b = batch.column(dst)
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        if isinstance(b, pa.ChunkedArray):
            b = b.combine_chunks()
        return pa.table({"a": pa.concat_arrays([a, b.cast(a.type)]),
                         "b": pa.concat_arrays([b, a.cast(b.type)])})

    # materialize once: every round re-reads the edge list
    e2 = (edges.select_columns([src, dst])
          .map_batches(both_dirs, batch_format="pyarrow")).materialize()

    def distinct_nodes(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "node" not in g.column_names:
            return pa.table({"node": pa.array([], type=node_type),
                             "label": pa.array([], type=node_type)})
        nodes = g.column("node")
        if isinstance(nodes, pa.ChunkedArray):
            nodes = nodes.combine_chunks()
        uniq = pc.unique(nodes)
        return pa.table({"node": uniq, "label": uniq})

    def init_bucketize(batch: pa.Table) -> pa.Table:
        from ..state.sketches import hash64
        h = (hash64(batch.column("a"), seed=7)
             % np.uint64(num_buckets)).astype(np.int64)
        return pa.table({"node": batch.column("a"),
                         _BUCKET: pa.array(h)})

    labels = (e2.map_batches(init_bucketize, batch_format="pyarrow")
              .groupby(_BUCKET, num_partitions=num_partitions)
              .map_groups(distinct_nodes, batch_format="pyarrow")
              ).materialize()

    def attach(g: pa.Table) -> pa.Table:
        """Resolve label(a) for this bucket's edges; emit (b, label_a)."""
        empty = pa.table({"node": pa.array([], type=node_type),
                          "cand": pa.array([], type=node_type)})
        if g.num_rows == 0 or _SIDE not in g.column_names:
            return empty
        side = g.column(_SIDE).to_numpy(zero_copy_only=False)
        lab = g.filter(pa.array(side == 0)).sort_by([("node", "ascending")])
        edge = g.filter(pa.array(side == 1))
        if edge.num_rows == 0 or lab.num_rows == 0:
            return empty
        lab_nodes = lab.column("node").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(
            lab_nodes, edge.column("node").to_numpy(zero_copy_only=False))
        return pa.table({
            "node": edge.column("payload"),
            "cand": pc.take(lab.column("payload"),
                            pa.array(idx, type=pa.int64()))})

    def take_min(g: pa.Table) -> pa.Table:
        """Per-node min over candidates + the old label; flag changes."""
        empty = pa.table({"node": pa.array([], type=node_type),
                          "label": pa.array([], type=node_type),
                          "changed": pa.array([], type=pa.int64())})
        if g.num_rows == 0 or _SIDE not in g.column_names:
            return empty
        g = g.sort_by([("node", "ascending"), ("payload", "ascending")])
        nodes = g.column("node").to_numpy(zero_copy_only=False)
        n = len(nodes)
        new = np.ones(n, dtype=bool)
        new[1:] = nodes[1:] != nodes[:-1]
        starts = np.flatnonzero(new)
        run_id = np.cumsum(new) - 1
        cand = g.column("payload")
        # exactly one old-label row per node run (side == 0)
        old_mask = g.column(_SIDE).to_numpy(zero_copy_only=False) == 0
        old_vals = cand.to_numpy(zero_copy_only=False)[old_mask]
        min_vals = cand.to_numpy(zero_copy_only=False)[starts]
        changed = (old_vals != min_vals).astype(np.int64)
        take_idx = pa.array(starts, type=pa.int64())
        return pa.table({
            "node": pc.take(g.column("node"), take_idx),
            "label": pc.take(cand, take_idx),
            "changed": pa.array(changed)})

    def tag_labels(lab: Dataset) -> Dataset:
        return lab.map_batches(
            lambda b: _bucketed(b, "node", "payload", b.column("label"),
                                node_type, 0, num_buckets, 7),
            batch_format="pyarrow")

    def one_step(lab_tagged: Dataset, rel_tagged: Dataset):
        """Propagate candidate labels along ``rel`` rows (node=src,
        payload=dst → message (dst, label(src))), take the per-node min,
        and return (materialized new labels, change count)."""
        msgs = (lab_tagged.union(rel_tagged)
                .groupby(_BUCKET, num_partitions=num_partitions)
                .map_groups(attach, batch_format="pyarrow"))
        msg_tagged = msgs.map_batches(
            lambda b: _bucketed(b, "node", "payload", b.column("cand"),
                                node_type, 1, num_buckets, 7),
            batch_format="pyarrow")
        # coalesce before materializing: map_groups emits ~one block per
        # INPUT block (num_partitions does not cap it), and each round
        # unions the previous round's output back in — without the
        # coalesce the block count triples per step and round time grows
        # exponentially (measured 5 -> 1725 blocks, 2s -> 208s per step).
        # shuffle=False is a split/merge, not an exchange.
        new_labels = (lab_tagged.union(msg_tagged)
                      .groupby(_BUCKET, num_partitions=num_partitions)
                      .map_groups(take_min, batch_format="pyarrow")
                      .repartition(num_partitions, shuffle=False)
                      ).materialize()
        changed = (new_labels.aggregate(Sum("changed"))["sum(changed)"]
                   or 0)
        return new_labels.drop_columns(["changed"]), changed

    for rnd in range(max_rounds):
        # neighbor min: label(v) <- min over v's neighbors' labels
        edge_tagged = e2.map_batches(
            lambda b: _bucketed(b, "a", "payload", b.column("b"),
                                node_type, 1, num_buckets, 7),
            batch_format="pyarrow")
        labels, ch_n = one_step(tag_labels(labels), edge_tagged)
        if ch_n == 0:
            # neighbor-stable means label is constant per component, and a
            # constant that includes the min node's (non-increasing) label
            # must BE the min: fully converged
            logger.info("connected_components: converged after %d rounds",
                        rnd)
            break
        # pointer jumping: label(v) <- label(label(v)) — halves chain
        # depth every round, so total rounds are O(log diameter) instead
        # of O(diameter)
        ptr_tagged = labels.map_batches(
            lambda b: _bucketed(b, "label", "payload", b.column("node"),
                                node_type, 1, num_buckets, 7),
            batch_format="pyarrow")
        labels, ch_p = one_step(tag_labels(labels), ptr_tagged)
        logger.info("connected_components round %d: %d + %d labels changed",
                    rnd + 1, ch_n, ch_p)
    else:
        logger.warning(
            "connected_components: max_rounds=%d reached before "
            "convergence — labels may be non-minimal (raise max_rounds)",
            max_rounds)

    return labels.rename_columns([out_node, out_component])


#: fixed-point denominator for integer PageRank — same contract as
#: sampling.DSIR_SCALE: all per-iteration arithmetic is int64, so the
#: result is exactly reproducible regardless of partitioning, block
#: order, or summation strategy, and an SQL oracle can replay it.
PAGERANK_SCALE = 1 << 40


def pagerank(edges: Dataset, src: str, dst: str,
             iterations: int = 10, damping: "tuple[int, int]" = (17, 20),
             out_node: str = "node",
             node_type: "pa.DataType | None" = None,
             num_buckets: int = 64, checkpoint_every: int = 0,
             num_partitions: int | None = None) -> Dataset:
    """Integer fixed-point PageRank over an edge Dataset (directed;
    duplicate edges collapse — the graph is a set of edges).

    The update is the textbook power iteration made INTEGER-EXACT:
    ranks are int64 multiples of ``1/2^40`` and each iteration computes
    ``r'(v) = base + (d_num * S_v) // d_den`` with
    ``S_v = sum over in-edges (u,v) of r(u) // outdeg(u)`` and
    ``base = ((d_den - d_num) * 2^40) // (d_den * N)`` — every operation
    integer, every sum associative, so the result is bit-identical
    under any partitioning and an SQL oracle can replay the iterations
    with ``//`` arithmetic.  Floor divisions leak a little mass (as do
    dangling nodes — the standard simplification); ranks remain a
    deterministic fixed-point of the stated recurrence.

    Scale shape: ONE bucketed exchange per iteration (K+1 total), not
    two — the combine-messages and emit-next-contributions steps FUSE:
    every round's exchange carries edge rows (bucketed by hash(src)),
    contribution messages (bucketed by hash(target)) and per-node zero
    rows, and each bucket both computes its nodes' new ranks (one sort
    + segmented sum) and forwards their out-edge contributions
    (outdeg from the bucket's own edge runs — all of a src's edges
    share its bucket).  The iteration count is fixed, so all rounds
    chain LAZILY into a single streaming execution; the edge and node
    tables materialize once.  ``checkpoint_every=k`` materializes the
    in-flight messages every k rounds (bounds recompute-on-failure
    depth at cluster scale).

    ``node_type``: pass the node id Arrow dtype when ``edges`` has
    upstream transforms — reading it via ``edges.schema()`` would
    execute a probe pipeline (same contract as asof_join's schemas)."""
    import ray

    from ..state.sketches import hash64

    dnum, dden = damping
    if not (0 < dnum < dden):
        raise ValueError("pagerank: damping must be (num, den), 0<num<den")
    if iterations < 1:
        raise ValueError("pagerank: iterations must be >= 1")
    if num_partitions is None:
        num_partitions = min(num_buckets, 16)
    if node_type is None:
        node_type = edges.schema().base_schema.field(src).type

    def dedup_edges(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "n" not in g.column_names:
            return pa.table({"n": pa.array([], node_type),
                             "d": pa.array([], node_type)})
        return (g.select(["n", "d"])
                .group_by(["n", "d"], use_threads=False).aggregate([]))

    def bucket_edges(batch: pa.Table) -> pa.Table:
        h = (hash64(batch.column(src), seed=23)
             % np.uint64(num_buckets)).astype(np.int64)
        return pa.table({"n": batch.column(src),
                         "d": pc.cast(batch.column(dst), node_type),
                         _BUCKET: pa.array(h)})

    def to_union(batch: pa.Table) -> pa.Table:
        """Edge rows in the per-round union layout: (n=src, d=dst,
        c=null), bucketed by hash(n)."""
        h = (hash64(batch.column("n"), seed=23)
             % np.uint64(num_buckets)).astype(np.int64)
        return pa.table({"n": batch.column("n"), "d": batch.column("d"),
                         "c": pa.nulls(batch.num_rows, pa.int64()),
                         _BUCKET: pa.array(h)})

    # distinct edges in union layout, materialized ONCE — every round
    # re-reads these blocks
    e2 = (edges.select_columns([src, dst])
          .map_batches(bucket_edges, batch_format="pyarrow")
          .groupby(_BUCKET, num_partitions=num_partitions)
          .map_groups(dedup_edges, batch_format="pyarrow")
          .map_batches(to_union, batch_format="pyarrow")).materialize()

    def both_cols(batch: pa.Table) -> pa.Table:
        a = batch.column("n")
        b = batch.column("d")
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        if isinstance(b, pa.ChunkedArray):
            b = b.combine_chunks()
        return pa.table({"n": pa.concat_arrays([a, b])})

    def distinct_nodes(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "n" not in g.column_names:
            return pa.table({"n": pa.array([], type=node_type)})
        nodes = g.column("n")
        if isinstance(nodes, pa.ChunkedArray):
            nodes = nodes.combine_chunks()
        return pa.table({"n": pc.unique(nodes)})

    def node_bucketize(batch: pa.Table) -> pa.Table:
        h = (hash64(batch.column("n"), seed=23)
             % np.uint64(num_buckets)).astype(np.int64)
        return batch.append_column(_BUCKET, pa.array(h))

    # zero-contribution rows: one per node, re-unioned every round so
    # message-less nodes still rank and forward their out-edges
    zeros = (e2.map_batches(both_cols, batch_format="pyarrow")
             .map_batches(node_bucketize, batch_format="pyarrow")
             .groupby(_BUCKET, num_partitions=num_partitions)
             .map_groups(distinct_nodes, batch_format="pyarrow")
             .map_batches(lambda b: pa.table({
                 "n": b.column("n"),
                 "d": pa.nulls(b.num_rows, node_type),
                 "c": pa.array(np.zeros(b.num_rows, dtype=np.int64))}),
                 batch_format="pyarrow")
             .map_batches(node_bucketize, batch_format="pyarrow")
             ).materialize()
    n_nodes = zeros.count()
    if n_nodes == 0:
        return ray.data.from_arrow(pa.table({
            out_node: pa.array([], node_type),
            "rank_q": pa.array([], pa.int64()),
            "pagerank": pa.array([], pa.float64())}))
    r0 = PAGERANK_SCALE // n_nodes
    base = ((dden - dnum) * PAGERANK_SCALE) // (dden * n_nodes)

    def _split(g: pa.Table):
        """(edge rows sorted by n with deg + src order, msg rows)."""
        is_edge = pc.is_valid(g.column("d")).to_numpy(zero_copy_only=False)
        ed = g.filter(pa.array(is_edge)).sort_by([("n", "ascending")])
        ms = g.filter(pa.array(~is_edge))
        return ed, ms

    def _rank_per_node(ms: pa.Table):
        """Sorted distinct msg nodes + their new rank (base + d*S)."""
        ms = ms.sort_by([("n", "ascending")])
        nodes = ms.column("n").to_numpy(zero_copy_only=False)
        k = len(nodes)
        new = np.ones(k, dtype=bool)
        new[1:] = nodes[1:] != nodes[:-1]
        starts = np.flatnonzero(new)
        c = ms.column("c").to_numpy(zero_copy_only=False)
        sums = np.add.reduceat(c, starts) if k else np.zeros(0, np.int64)
        r = base + (dnum * sums) // dden
        return ms, starts, r

    def _combine_msgs(dsts, contrib: np.ndarray) -> pa.Table:
        """Map-side combiner: messages sharing a dst SUM here (int64,
        associative) so the next exchange moves at most one row per
        distinct dst per bucket instead of one per edge."""
        agg = (pa.table({"n": dsts, "c": pa.array(contrib, pa.int64())})
               .group_by(["n"], use_threads=False)
               .aggregate([("c", "sum")]))
        return pa.table({"n": agg.column("n"),
                         "d": pa.nulls(agg.num_rows, node_type),
                         "c": agg.column("c_sum")})

    def _emit(ed: pa.Table, node_keys, r) -> pa.Table:
        """Next-round contribution messages (n=dst, c=r(src)//deg)."""
        srcs = ed.column("n").to_numpy(zero_copy_only=False)
        m = len(srcs)
        new = np.ones(m, dtype=bool)
        new[1:] = srcs[1:] != srcs[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, m))
        deg = np.repeat(lens, lens).astype(np.int64)
        idx = np.searchsorted(node_keys, srcs)
        contrib = r[idx] // deg
        return _combine_msgs(ed.column("d"), contrib)

    empty_msgs = pa.table({"n": pa.array([], node_type),
                           "d": pa.array([], node_type),
                           "c": pa.array([], pa.int64())})

    def step_first(g: pa.Table) -> pa.Table:
        """Round 1: every rank is r0 — forward r0 // deg per edge."""
        if g.num_rows == 0 or "d" not in g.column_names:
            return empty_msgs
        ed, _ = _split(g)
        if ed.num_rows == 0:
            return empty_msgs
        srcs = ed.column("n").to_numpy(zero_copy_only=False)
        m = len(srcs)
        new = np.ones(m, dtype=bool)
        new[1:] = srcs[1:] != srcs[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, m))
        deg = np.repeat(lens, lens).astype(np.int64)
        return _combine_msgs(ed.column("d"), r0 // deg)

    def step_mid(g: pa.Table) -> pa.Table:
        """Fused round: rank this bucket's nodes from incoming messages,
        forward their out-edge contributions."""
        if g.num_rows == 0 or "d" not in g.column_names:
            return empty_msgs
        ed, ms = _split(g)
        if ed.num_rows == 0:
            return empty_msgs
        ms, starts, r = _rank_per_node(ms)
        node_keys = ms.column("n").to_numpy(zero_copy_only=False)[starts]
        return _emit(ed, node_keys, r)

    def step_last(g: pa.Table) -> pa.Table:
        """Final combine: rank from incoming messages, emit (node, r)."""
        empty = pa.table({"n": pa.array([], node_type),
                          "r": pa.array([], pa.int64())})
        if g.num_rows == 0 or "c" not in g.column_names:
            return empty
        _, ms = _split(g)
        if ms.num_rows == 0:
            return empty
        ms, starts, r = _rank_per_node(ms)
        return pa.table({
            "n": pc.take(ms.column("n"), pa.array(starts, pa.int64())),
            "r": pa.array(r, pa.int64())})

    # round 1: contributions from the uniform r0 (edges only)
    msgs = (e2.groupby(_BUCKET, num_partitions=num_partitions)
            .map_groups(step_first, batch_format="pyarrow"))
    # rounds 2..K: fused rank-and-forward
    for it in range(2, iterations + 1):
        msgs = (e2.union(msgs.map_batches(node_bucketize,
                                          batch_format="pyarrow"))
                .union(zeros)
                .groupby(_BUCKET, num_partitions=num_partitions)
                .map_groups(step_mid, batch_format="pyarrow"))
        if checkpoint_every and it % checkpoint_every == 0:
            msgs = msgs.materialize()
    # final combine of round K's messages into ranks
    ranks = (msgs.map_batches(node_bucketize, batch_format="pyarrow")
             .union(zeros)
             .groupby(_BUCKET, num_partitions=num_partitions)
             .map_groups(step_last, batch_format="pyarrow"))

    def finish(batch: pa.Table) -> pa.Table:
        r = batch.column("r").to_numpy(zero_copy_only=False)
        return pa.table({
            out_node: batch.column("n"),
            "rank_q": batch.column("r"),
            "pagerank": pa.array(r.astype(np.float64)
                                 / float(PAGERANK_SCALE), pa.float64())})

    return ranks.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# shared undirected-graph primitives
# ---------------------------------------------------------------------------


def canonical_edges(edges: Dataset, src: str, dst: str,
                    num_buckets: int = 32,
                    num_partitions: int | None = None) -> Dataset:
    """Canonical deduped undirected edge list ``(u, v)`` with ``u < v``
    (int64 node ids): self-loops dropped, duplicate and reversed edges
    collapsed.  Map-side per-batch pre-dedup (2-key Arrow group_by — under
    the pyarrow >=3-key null bug threshold), then ONE bucketed exchange on
    ``hash(u)`` with a per-bucket sort + run-mask distinct."""
    from ..state.sketches import hash64

    if num_partitions is None:
        num_partitions = num_buckets

    def canon(batch: pa.Table) -> pa.Table:
        a = batch.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        u = np.minimum(a, b)
        v = np.maximum(a, b)
        keep = u != v
        u, v = u[keep], v[keep]
        t = pa.table({"u": pa.array(u), "v": pa.array(v)})
        t = t.group_by(["u", "v"], use_threads=False).aggregate([])
        h = (hash64(t.column("u"), seed=11)
             % np.uint64(num_buckets)).astype(np.int64)
        return t.append_column(_BUCKET, pa.array(h))

    def bucket_dedup(g: pa.Table) -> pa.Table:
        g = g.sort_by([("u", "ascending"), ("v", "ascending")])
        u = g.column("u").to_numpy(zero_copy_only=False)
        v = g.column("v").to_numpy(zero_copy_only=False)
        first = np.ones(len(u), dtype=bool)
        first[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
        return g.filter(pa.array(first)).select(["u", "v"])

    return (edges.select_columns([src, dst])
            .map_batches(canon, batch_format="pyarrow")
            .groupby(_BUCKET, num_partitions=num_partitions)
            .map_groups(bucket_dedup, batch_format="pyarrow"))


def degree_counts(E: Dataset) -> Dataset:
    """(node, sum(count_all)) degrees of a canonical ``(u, v)`` edge list:
    per-batch partial counts over both endpoints, one tiny groupby."""

    def deg_partial(batch: pa.Table) -> pa.Table:
        u = batch.column("u")
        v = batch.column("v")
        if isinstance(u, pa.ChunkedArray):
            u = u.combine_chunks()
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        t = pa.table({"node": pa.concat_arrays([u, v])})
        return t.group_by(["node"], use_threads=False).aggregate(
            [([], "count_all")])

    return (E.map_batches(deg_partial, batch_format="pyarrow")
            .groupby("node").sum("count_all"))


# ---------------------------------------------------------------------------
# triangle counting (degree-oriented wedge check)
# ---------------------------------------------------------------------------


def triangle_counts(edges: Dataset, src: str, dst: str,
                    out_node: str = "node",
                    out_count: str = "n_triangles",
                    num_buckets: int = 32,
                    num_partitions: int | None = None,
                    broadcast_node_limit: int = 2_000_000) -> Dataset:
    """Per-node triangle counts of the undirected graph given by ``edges``
    (integer node ids): ``(out_node, out_count)`` with one row per node
    that closes at least one triangle.  Self-loops and duplicate/reversed
    edges are tolerated (the op canonicalizes and dedups first).

    The classic degree-oriented formulation (Cohen 2009 / Suri &
    Vassilvitskii 2011 "MR. Triangles"): orient every edge from the
    lower-rank to the higher-rank endpoint where rank = (degree, id), so
    each triangle is found EXACTLY once — at its lowest-rank vertex — and
    every out-neighborhood has size O(sqrt(m)), which bounds wedge
    generation at O(m^(3/2)) regardless of skew (a degree-10^6 hub vertex
    generates no wedges unless its neighbors have even higher degree).

    Shuffle shape — six bucketed exchanges, zero per-row Python:
      1. canonical dedup: (min,max) pairs bucketed on hash(u); per bucket
         one sort + run mask.
      2. degrees: per-batch partial counts, one (node, count) groupby.
      3-4. attach deg(u), deg(v): tag+union searchsorted lookups (the
         engine's standard local-join shape — Ray's native join is
         avoided, see SCALE.md).
      5. wedges + membership probe: oriented edges bucketed on hash(src)
         generate each source's rank-sorted out-neighbor pairs with a
         shifted-gap scan (one vectorized pass per gap, max gap =
         max out-degree = O(sqrt m)); candidate wedges re-bucket on
         hash(a) and meet the oriented edge set in a per-bucket polars
         semi join on BOTH endpoints (exact — no hash-collision risk).
      6. per-node counts: each found triangle emits its 3 corners to a
         partial-count combine + one tiny (node, count) groupby.

    Only (u, v, deg) triples ever shuffle — never a payload.  The edge
    table is materialized once (it is read by steps 2, 3 and 5); at 100 TB
    checkpoint it to parquet instead, same as connected_components labels.
    """
    from ..state.sketches import hash64

    if num_partitions is None:
        num_partitions = num_buckets

    E = canonical_edges(edges, src, dst, num_buckets,
                        num_partitions).materialize()
    deg = degree_counts(E)

    # --- attach deg to an endpoint via the tag+union searchsorted join ---
    def _attach_deg(edge_ds: Dataset, key: str, out: str) -> Dataset:
        def tag_deg(batch: pa.Table) -> pa.Table:
            h = (hash64(batch.column("node"), seed=13)
                 % np.uint64(num_buckets)).astype(np.int64)
            return pa.table({
                "u": batch.column("node"),
                "v": pa.nulls(batch.num_rows, pa.int64()),
                "d": batch.column("sum(count_all)").cast(pa.int64()),
                _SIDE: pa.array(np.zeros(batch.num_rows, dtype=np.int8)),
                _BUCKET: pa.array(h)})

        def tag_edge(batch: pa.Table) -> pa.Table:
            h = (hash64(batch.column(key), seed=13)
                 % np.uint64(num_buckets)).astype(np.int64)
            other = "v" if key == "u" else "u"
            cols = {"u": batch.column(key), "v": batch.column(other),
                    "d": (batch.column("du") if "du" in batch.column_names
                          else pa.nulls(batch.num_rows, pa.int64())),
                    _SIDE: pa.array(np.ones(batch.num_rows, dtype=np.int8)),
                    _BUCKET: pa.array(h)}
            return pa.table(cols)

        def lookup(g: pa.Table) -> pa.Table:
            names = ["u", "v", "du", "dv"] if key == "v" else ["u", "v", "du"]
            empty = pa.table({n: pa.array([], type=pa.int64())
                              for n in names})
            if g.num_rows == 0 or _SIDE not in g.column_names:
                return empty
            side = g.column(_SIDE).to_numpy(zero_copy_only=False)
            dtab = g.filter(pa.array(side == 0)).sort_by(
                [("u", "ascending")])
            etab = g.filter(pa.array(side == 1))
            if etab.num_rows == 0:
                return empty
            nodes = dtab.column("u").to_numpy(zero_copy_only=False)
            idx = np.searchsorted(
                nodes, etab.column("u").to_numpy(zero_copy_only=False))
            degs = pc.take(dtab.column("d"),
                           pa.array(idx, type=pa.int64()))
            if key == "u":
                return pa.table({"u": etab.column("u"),
                                 "v": etab.column("v"),
                                 "du": degs})
            return pa.table({"u": etab.column("v"),
                             "v": etab.column("u"),
                             "du": etab.column("d"),
                             "dv": degs})

        return (deg.map_batches(tag_deg, batch_format="pyarrow")
                .union(edge_ds.map_batches(tag_edge,
                                           batch_format="pyarrow"))
                .groupby(_BUCKET, num_partitions=num_partitions)
                .map_groups(lookup, batch_format="pyarrow"))

    # degree attach: the degree table is O(nodes) — when it fits the
    # object store comfortably, ONE broadcast + a map-side searchsorted
    # replaces TWO bucketed exchanges AND the duplicated degree pass
    # (measured ~2x end-to-end at bench scale: each tiny all-to-all costs
    # ~2s of Ray fixed overhead).  Past the limit, fall back to the
    # exchange path — same results.
    deg_mat = deg.materialize()
    n_nodes = deg_mat.count()
    if n_nodes == 0:
        import ray as _ray
        return _ray.data.from_arrow(pa.table({
            out_node: pa.array([], type=pa.int64()),
            out_count: pa.array([], type=pa.int64())}))
    if n_nodes <= broadcast_node_limit:
        import ray as _ray
        dtab = pa.concat_tables(
            list(deg_mat.iter_batches(batch_format="pyarrow"))
        ).combine_chunks().sort_by([("node", "ascending")])
        deg_ref = _ray.put((
            dtab.column("node").to_numpy(zero_copy_only=False),
            dtab.column("sum(count_all)").to_numpy(
                zero_copy_only=False).astype(np.int64)))

        def attach_both(batch: pa.Table) -> pa.Table:
            nodes_np, degs_np = (_ray.get(deg_ref)
                                 if isinstance(deg_ref, _ray.ObjectRef)
                                 else deg_ref)
            u = batch.column("u").to_numpy(zero_copy_only=False)
            v = batch.column("v").to_numpy(zero_copy_only=False)
            du = degs_np[np.searchsorted(nodes_np, u)]
            dv = degs_np[np.searchsorted(nodes_np, v)]
            return pa.table({"u": batch.column("u"),
                             "v": batch.column("v"),
                             "du": pa.array(du), "dv": pa.array(dv)})

        e_deg = E.map_batches(attach_both,
                              batch_format="pyarrow").materialize()
    else:
        deg = deg_mat
        e_du = _attach_deg(E, "u", "du")
        e_deg = _attach_deg(e_du, "v", "dv").materialize()

    # --- orient low rank -> high rank; rank = (deg, id) ---
    def orient(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        du = batch.column("du").to_numpy(zero_copy_only=False)
        dv = batch.column("dv").to_numpy(zero_copy_only=False)
        fwd = (du < dv) | ((du == dv) & (u < v))
        s = np.where(fwd, u, v)
        t = np.where(fwd, v, u)
        dt = np.where(fwd, dv, du)
        h = (hash64(pa.array(s), seed=17)
             % np.uint64(num_buckets)).astype(np.int64)
        return pa.table({"s": pa.array(s), "t": pa.array(t),
                         "dt": pa.array(dt.astype(np.int64)),
                         _BUCKET: pa.array(h)})

    oriented = e_deg.map_batches(orient, batch_format="pyarrow")

    def wedges(g: pa.Table) -> pa.Table:
        """All rank-ordered out-neighbor pairs per source in this bucket:
        one vectorized shifted scan per gap (max gap = max out-degree)."""
        empty = pa.table({"a": pa.array([], type=pa.int64()),
                          "b": pa.array([], type=pa.int64()),
                          "c": pa.array([], type=pa.int64()),
                          _BUCKET: pa.array([], type=pa.int64())})
        if g.num_rows == 0:
            return empty
        g = g.sort_by([("s", "ascending"), ("dt", "ascending"),
                       ("t", "ascending")])
        s = g.column("s").to_numpy(zero_copy_only=False)
        t = g.column("t").to_numpy(zero_copy_only=False)
        n = len(s)
        parts_a, parts_b, parts_c = [], [], []
        gap = 1
        while gap < n:
            ok = s[gap:] == s[:-gap]
            if not ok.any():
                break
            parts_a.append(t[:-gap][ok])
            parts_b.append(t[gap:][ok])
            parts_c.append(s[gap:][ok])
            gap += 1
        if not parts_a:
            return empty
        a = np.concatenate(parts_a)
        b = np.concatenate(parts_b)
        c = np.concatenate(parts_c)
        h = (hash64(pa.array(a), seed=17)
             % np.uint64(num_buckets)).astype(np.int64)
        return pa.table({"a": pa.array(a), "b": pa.array(b),
                         "c": pa.array(c), _BUCKET: pa.array(h)})

    cand = (oriented.groupby(_BUCKET, num_partitions=num_partitions)
            .map_groups(wedges, batch_format="pyarrow"))

    # --- probe: wedge (a, b) closes iff oriented edge a->b exists ---
    def tag_wedge(batch: pa.Table) -> pa.Table:
        return pa.table({"a": batch.column("a"), "b": batch.column("b"),
                         "c": batch.column("c"),
                         _SIDE: pa.array(
                             np.zeros(batch.num_rows, dtype=np.int8)),
                         _BUCKET: batch.column(_BUCKET)})

    def tag_edge2(batch: pa.Table) -> pa.Table:
        return pa.table({"a": batch.column("s"), "b": batch.column("t"),
                         "c": pa.nulls(batch.num_rows, pa.int64()),
                         _SIDE: pa.array(
                             np.ones(batch.num_rows, dtype=np.int8)),
                         _BUCKET: batch.column(_BUCKET)})

    def probe(g: pa.Table) -> pa.Table:
        """Exact 2-column semi join (polars) + per-corner partial counts."""
        import polars as pl
        empty = pa.table({"node": pa.array([], type=pa.int64()),
                          "c": pa.array([], type=pa.int64())})
        if g.num_rows == 0 or _SIDE not in g.column_names:
            return empty
        side = g.column(_SIDE).to_numpy(zero_copy_only=False)
        w = g.filter(pa.array(side == 0))
        e = g.filter(pa.array(side == 1))
        if w.num_rows == 0 or e.num_rows == 0:
            return empty
        wf = pl.from_arrow(w.select(["a", "b", "c"]))
        ef = pl.from_arrow(e.select(["a", "b"]))
        hit = wf.join(ef, on=["a", "b"], how="semi")
        if hit.height == 0:
            return empty
        corners = pl.concat([hit.get_column("a").rename("node"),
                             hit.get_column("b").rename("node"),
                             hit.get_column("c").rename("node")])
        counts = (pl.DataFrame({"node": corners})
                  .group_by("node").len(name="c"))
        return pa.table({
            "node": counts.get_column("node").to_arrow().cast(pa.int64()),
            "c": counts.get_column("c").to_arrow().cast(pa.int64())})

    found = (cand.map_batches(tag_wedge, batch_format="pyarrow")
             .union(oriented.map_batches(tag_edge2, batch_format="pyarrow"))
             .groupby(_BUCKET, num_partitions=num_partitions)
             .map_groups(probe, batch_format="pyarrow"))

    out = found.groupby("node").sum("c")

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            out_node: batch.column("node"),
            out_count: batch.column("sum(c)").cast(pa.int64())})

    return out.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# k-core decomposition (iterative peeling)
# ---------------------------------------------------------------------------


def k_core(edges: Dataset, src: str, dst: str, k: int,
           out_node: str = "node", out_degree: str = "degree",
           num_buckets: int = 32, num_partitions: int | None = None,
           max_rounds: int = 30) -> "tuple[Dataset, bool]":
    """The k-core of the undirected graph: iteratively peel nodes of
    degree < k until every remaining node has degree >= k within the
    remaining subgraph.  Returns ``(dataset of (out_node, out_degree)
    rows, converged)`` — the k-core's nodes with their within-core
    degrees, and whether peeling reached a fixed point within
    ``max_rounds`` (the community/"dense cluster" extraction primitive;
    also the standard pre-filter before clique-ish analyses).

    Per round: one degree pass (per-batch partial counts + a tiny (node,
    count) groupby) and TWO membership semi-joins (the engine's bucketed
    tag+union shape — Ray's native join is avoided, see SCALE.md) that
    keep only edges whose BOTH endpoints survive.  The edge table
    re-materializes each round (the pagerank lesson: per-round
    materialize beats a fully-lazy round chain because each round
    reshuffles anyway); labels/degrees are O(nodes).  Rounds are
    data-dependent but bounded by the peeling depth (degeneracy ordering
    depth), which is small for real graphs; an unconverged exit is
    reported, never silent."""
    from .joins import semi_join

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if num_partitions is None:
        num_partitions = num_buckets

    def named_deg(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch.column("node"),
            "deg": batch.column("sum(count_all)").cast(pa.int64())})

    E = canonical_edges(edges, src, dst, num_buckets,
                        num_partitions).materialize()
    converged = False
    for rnd in range(max_rounds):
        deg = (degree_counts(E)
               .map_batches(named_deg, batch_format="pyarrow")).materialize()
        total = deg.count()
        keep = deg.filter(expr=f"deg >= {int(k)}")
        n_keep = keep.count()
        if n_keep == total:
            converged = True
            logger.info("k_core: converged after %d peel rounds", rnd)
            break
        if n_keep == 0:
            import ray
            empty = ray.data.from_arrow(pa.table({
                out_node: pa.array([], type=pa.int64()),
                out_degree: pa.array([], type=pa.int64())}))
            return empty, True
        keep_nodes = keep.select_columns(["node"])
        E = semi_join(E, keep_nodes, on="u", right_on="node",
                      num_partitions=num_partitions)
        E = semi_join(E, keep_nodes, on="v", right_on="node",
                      num_partitions=num_partitions).materialize()
    else:
        logger.warning("k_core: max_rounds=%d reached before convergence",
                       max_rounds)
        deg = (degree_counts(E)
               .map_batches(named_deg, batch_format="pyarrow")).materialize()

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            out_node: batch.column("node"),
            out_degree: batch.column("deg")})

    return deg.map_batches(finish, batch_format="pyarrow"), converged


def bfs_levels(edges: Dataset, src: str, dst: str,
               sources: "list[int]", max_rounds: int = 30,
               out_node: str = "node", out_dist: str = "dist",
               num_buckets: int = 32,
               num_partitions: int | None = None,
               max_broadcast_nodes: int = 4_000_000
               ) -> "tuple[Dataset, bool]":
    """Multi-source BFS over the undirected graph: ``(out_node,
    out_dist)`` — the unweighted shortest hop count from the nearest
    source, for every reachable node (influence radius, taint
    propagation, "how far is every doc from the seed set" curation
    checks).  Returns ``(dataset, converged)``; an unconverged exit
    (frontier still live at ``max_rounds``) is reported, never silent.

    Per round, ONE keyed exchange (the PageRank fusion discipline):

    1. **Expansion is shuffle-free**: the frontier node set broadcasts
       once (``ray.put`` of a sorted int64 array) and a map-only pass
       over the materialized canonical edge list emits neighbors in both
       directions via two ``searchsorted`` membership probes — the edge
       table is never re-exchanged (the old per-round semi-join reshuffled
       the doubled edge list every round).  Above ``max_broadcast_nodes``
       the round falls back to bucketed semi-joins on the edge list
       (logged) — the 100-TB guard for frontiers too big to broadcast.
    2. **Dedup + anti-join + level assignment fuse into one exchange**:
       candidates (tagged ``rnd+1``) union the seen table and ONE
       ``hash(node) % num_buckets`` groupby keeps the min-dist row per
       node (a seen node's dist is always < rnd+1, so first-of-run is
       exactly the old anti-join + first_seen composition).
    3. **No count round-trips**: emptiness falls out of the materialized
       seen table's row-count delta (metadata on a materialized dataset);
       the next frontier is a map-only filter ``dist == rnd+1``.

    The seen table (O(nodes)) re-materializes per round — the
    connected_components label contract (checkpoint to parquet at
    100 TB).  All-integer; SQL replays the rounds verbatim."""
    import ray

    from ..state.sketches import hash64
    from .joins import semi_join

    if num_partitions is None:
        num_partitions = num_buckets
    if not sources:
        raise ValueError("bfs_levels: sources must be non-empty")

    E = canonical_edges(edges, src, dst, num_buckets,
                        num_partitions).materialize()

    src_nodes = sorted(set(int(s) for s in sources))
    seen = ray.data.from_arrow(pa.table({
        out_node: pa.array(src_nodes, type=pa.int64()),
        out_dist: pa.array([0] * len(src_nodes), type=pa.int64())}))
    n_seen = len(src_nodes)
    frontier_np: "np.ndarray | None" = np.asarray(src_nodes,
                                                  dtype=np.int64)
    frontier_ds: "Dataset | None" = None
    converged = False

    def _member(col: pa.ChunkedArray, f: np.ndarray) -> np.ndarray:
        a = col.to_numpy(zero_copy_only=False)
        pos = np.searchsorted(f, a)
        pos_c = np.minimum(pos, len(f) - 1)
        return f[pos_c] == a

    for rnd in range(max_rounds):
        if frontier_np is not None:
            ref = ray.put(frontier_np)

            def expand(batch: pa.Table, ref=ref) -> pa.Table:
                f = ray.get(ref)
                u, v = batch.column("u"), batch.column("v")
                in_u = _member(u, f)
                in_v = _member(v, f)
                out = []
                if in_u.any():
                    out.append(v.filter(pa.array(in_u)).combine_chunks())
                if in_v.any():
                    out.append(u.filter(pa.array(in_v)).combine_chunks())
                nodes = (pc.unique(pa.concat_arrays(out)) if out
                         else pa.array([], type=pa.int64()))
                return pa.table({out_node: nodes})

            cand = E.map_batches(expand, batch_format="pyarrow")
        else:  # pragma: no cover - >max_broadcast_nodes frontiers
            logger.warning("bfs_levels: frontier exceeds "
                           "max_broadcast_nodes=%d; semi-join round",
                           max_broadcast_nodes)

            def tail(other: str):
                def fn(batch: pa.Table) -> pa.Table:
                    col = batch.column(other)
                    if isinstance(col, pa.ChunkedArray):
                        col = col.combine_chunks()
                    return pa.table({out_node: pc.unique(col)})
                return fn

            cand = (semi_join(E, frontier_ds, on="u", right_on=out_node,
                              num_partitions=num_partitions)
                    .map_batches(tail("v"), batch_format="pyarrow")
                    .union(
                        semi_join(E, frontier_ds, on="v",
                                  right_on=out_node,
                                  num_partitions=num_partitions)
                        .map_batches(tail("u"), batch_format="pyarrow")))

        def tag_cand(batch: pa.Table, rnd=rnd) -> pa.Table:
            return batch.append_column(
                out_dist, pa.array(np.full(batch.num_rows, rnd + 1,
                                           dtype=np.int64)))

        def nb(batch: pa.Table) -> pa.Table:
            h = (hash64(batch.column(out_node), seed=67)
                 % np.uint64(num_buckets)).astype(np.int64)
            return batch.append_column(_BUCKET, pa.array(h))

        def bucket_min(g: pa.Table) -> pa.Table:
            # min dist per node: seen rows always sort before this
            # round's rnd+1 candidates, so first-of-run == anti-join +
            # first-seen assignment in one pass
            g = g.sort_by([(out_node, "ascending"),
                           (out_dist, "ascending")])
            nodes = g.column(out_node).to_numpy(zero_copy_only=False)
            first = np.ones(len(nodes), dtype=bool)
            first[1:] = nodes[1:] != nodes[:-1]
            return g.filter(pa.array(first)).select([out_node, out_dist])

        seen = (seen.union(cand.map_batches(tag_cand,
                                            batch_format="pyarrow"))
                .map_batches(nb, batch_format="pyarrow")
                .groupby(_BUCKET, num_partitions=num_partitions)
                .map_groups(bucket_min, batch_format="pyarrow")
                ).materialize()
        total = seen.count()          # metadata read on a materialized ds
        n_new = total - n_seen
        n_seen = total
        if n_new == 0:
            converged = True
            logger.info("bfs_levels: frontier empty after %d rounds", rnd)
            break
        frontier_filter = seen.filter(expr=f"{out_dist} == {rnd + 1}")
        if n_new <= max_broadcast_nodes:
            frontier_np = np.sort(
                frontier_filter.select_columns([out_node]).to_pandas()
                [out_node].to_numpy().astype(np.int64))
            frontier_ds = None
        else:  # pragma: no cover - >max_broadcast_nodes frontiers
            frontier_np = None
            frontier_ds = (frontier_filter.select_columns([out_node])
                           .materialize())
    else:
        logger.warning("bfs_levels: max_rounds=%d reached with a live "
                       "frontier — distances beyond are missing",
                       max_rounds)

    return seen, converged
