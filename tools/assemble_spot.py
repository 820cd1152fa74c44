"""10x growth spot-check for the block-assembly family (r4 session 6).

Unlike tools/seq_spot.py's hardlink-replicated x10 input (ids repeat, which
assemble's global-uniqueness contract rejects), this uses the REAL sf1
sequences table (5M rows, distinct ids, ensure_sequences-generated) vs
sf0.1 (500k rows) — so the broadcast-assignment fast path is measured on a
10x-bigger (1.6M-doc-table) broadcast too.

Run: python tools/assemble_spot.py   (writes BENCH/assemble_spot_r4.json)
"""
import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import pyarrow as pa
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False)

    import __ray_entry__ as entry
    from malli_ray.stages.packing import (assemble_packed_blocks,
                                          truncate_sequences)
    from malli_ray.stages.text import add_sentinel_tokens

    def ops(d):
        def read(cols):
            return rd.read_parquet(sorted(glob.glob(f"{d}/*.parquet")),
                                   columns=cols)

        def assemble():
            ds = entry._drop_duplicated_ids(
                read(["doc_id", "tokens", "source"]), "doc_id")
            return assemble_packed_blocks(
                ds, block_size=2048, num_buckets=64,
                tokens_type=pa.list_(pa.int32()))

        def pack_prep():
            ds = entry._drop_duplicated_ids(
                read(["doc_id", "tokens", "source"]), "doc_id")
            ds = truncate_sequences(ds, "tokens", max_len=1022,
                                    count_column=None)
            ds = add_sentinel_tokens(ds, "tokens", bos_id=50255,
                                     eos_id=50256).materialize()
            return assemble_packed_blocks(
                ds, block_size=512, num_buckets=64,
                tokens_type=pa.list_(pa.int32()))

        return {"assemble_2048": assemble, "pack_prep_512": pack_prep}

    base = "/tmp/malli_ray_sequences/sf0.1_rps25000"
    big = "/tmp/malli_ray_sequences/sf1.0_rps25000"
    out = {}
    for label, d in (("sf0.1", base), ("sf1", big)):
        for name, mk in ops(d).items():
            t0 = time.perf_counter()
            n = mk().materialize().count()
            dt = round(time.perf_counter() - t0, 3)
            out.setdefault(name, {})[label] = {"sec": dt, "rows": n}
            print(f"{label:6s} {name:16s} {dt:7.2f}s  {n} rows", flush=True)
    for name, r in out.items():
        r["time_growth"] = round(r["sf1"]["sec"] / r["sf0.1"]["sec"], 2)
        r["rows_growth"] = round(r["sf1"]["rows"] / max(1, r["sf0.1"]["rows"]), 2)
    path = os.path.join(REPO, "BENCH", "assemble_spot_r4.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: {"time_growth": v["time_growth"],
                          "rows_growth": v["rows_growth"]}
                      for k, v in out.items()}))
    ray.shutdown()


if __name__ == "__main__":
    main()
