"""Synthesize a 10x (sf1-equivalent) spot-check input from sf0.1.

The driver provides sf{0.001,0.01,0.1} only; the 100x-scale argument
needs at least one measured growth point, so this builds a deterministic
sf1 under /tmp:

- ``documents``: 10 replicas of sf0.1's 5000 docs.  Replica 0 is the
  original; replica k suffixes every word with ``~k`` and offsets doc_id
  by k*5000.  Each replica is therefore a vocabulary-disjoint island
  with EXACTLY the original's internal duplicate/near-duplicate
  structure — a corpus 10x bigger at a constant duplication rate, the
  honest null hypothesis for dedup-output growth (plain replication
  would instead make every doc a 10-way near-duplicate and grow the
  pair output 45x by construction).
- ``orders``: 10 replicas with o_orderkey offset by k*150000 (other
  columns copied verbatim).  The bfs_orders graph derives nodes mod 97,
  so the graph itself is scale-invariant — the sf1 measurement isolates
  the scan/canonicalize cost from the round cost.

Usage: python tools/make_sf1.py [outdir=/tmp/sf1]
"""

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
REPLICAS = 10


def make_documents(outdir: str) -> None:
    t = pq.read_table(f"{SRC}/documents.parquet")
    n = t.num_rows
    parts = []
    for k in range(REPLICAS):
        ids = pc.add(t.column("doc_id"), pa.scalar(k * n, pa.int64()))
        if k == 0:
            text = t.column("text")
        else:
            text = pc.replace_substring_regex(
                t.column("text"), r"([^\t\n\f\r ]+)", rf"\1~{k}")
        parts.append(pa.table({
            "doc_id": ids,
            "text": text,
            "lang": t.column("lang"),
            "source": t.column("source"),
            "n_chars": t.column("n_chars")}))
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{outdir}/documents.parquet",
                   row_group_size=5000)
    print(f"documents: {out.num_rows} rows")


def make_orders(outdir: str) -> None:
    t = pq.read_table(f"{SRC}/orders.parquet")
    n = t.num_rows
    parts = []
    for k in range(REPLICAS):
        keys = pc.add(t.column("o_orderkey"), pa.scalar(k * n, pa.int64()))
        cols = {"o_orderkey": keys}
        for c in t.column_names:
            if c != "o_orderkey":
                cols[c] = t.column(c)
        parts.append(pa.table(cols))
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{outdir}/orders.parquet",
                   row_group_size=75000)
    print(f"orders: {out.num_rows} rows")


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    os.makedirs(outdir, exist_ok=True)
    make_documents(outdir)
    make_orders(outdir)
