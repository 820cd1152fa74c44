"""10x growth spot-check for the session-4 sequences-table operators.

Runs each op at sf0.1 (500k rows, 20 shards) and on the hardlink-replicated
x10 input (5M rows, 200 shards — bench.py's scaling input; replication is
valid here because every op is map-only or group-bounded, with no cross-doc
interaction that replication would distort), in ONE warm Ray session, and
reports wall-time growth vs the exact 10.0x row growth.

Run: python tools/seq_spot.py   (writes BENCH/seq_spot_r4.json)
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False)

    from malli_ray.stages.analytics import list_value_counts_by_group
    from malli_ray.stages.packing import (padding_waste_report,
                                          truncate_sequences)
    from malli_ray.stages.text import (token_dup_ngram_stats,
                                       token_ngram_contamination)
    import __ray_entry__ as entry

    base = "/tmp/malli_ray_sequences/sf0.1_rps25000"
    big = base + "_x10"
    probes = entry._token_decon_probes(0.1)

    def ops(d):
        def read(cols):
            import glob
            return rd.read_parquet(sorted(glob.glob(f"{d}/*.parquet")),
                                   columns=cols)
        return {
            "pad_waste": lambda: padding_waste_report(
                read(["tokens", "source"]), "tokens", "source", 2048),
            "truncate": lambda: truncate_sequences(
                read(["doc_id", "tokens", "n_tok"]), "tokens", 512),
            "token_decon": lambda: token_ngram_contamination(
                read(["doc_id", "tokens"]), probes, "tokens", "doc_id"),
            "dup_ngram": lambda: token_dup_ngram_stats(
                read(["doc_id", "tokens"]), "tokens", "doc_id", n=2),
            "freq_by_source": lambda: list_value_counts_by_group(
                read(["tokens", "source"]), "tokens", "source",
                bounded_range=(0, 50257), out_value="token"),
            "pack_spfhp": lambda: _pack(read(["doc_id", "tokens"])),
        }

    def _pack(ds):
        import pyarrow as pa
        import pyarrow.compute as pc
        from malli_ray.stages.packing import pack_histogram

        def lens(batch):
            n = pc.cast(pc.list_value_length(batch.column("tokens")),
                        pa.int64())
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "length": pc.min_element_wise(n, pa.scalar(2048, pa.int64()))})

        return pack_histogram(ds.map_batches(lens, batch_format="pyarrow"),
                              "doc_id", "length", max_len=2048)

    out = {}
    for label, d in (("sf0.1", base), ("x10", big)):
        for name, mk in ops(d).items():
            t0 = time.perf_counter()
            n = mk().count()
            dt = round(time.perf_counter() - t0, 3)
            out.setdefault(name, {})[label] = {"sec": dt, "rows": n}
            print(f"{label:6s} {name:16s} {dt:7.2f}s  {n} rows",
                  flush=True)
    for name, r in out.items():
        r["time_growth"] = round(r["x10"]["sec"] / r["sf0.1"]["sec"], 2)
        r["rows_growth"] = round(r["x10"]["rows"] / max(1, r["sf0.1"]["rows"]), 2)
    path = os.path.join(REPO, "BENCH", "seq_spot_r4.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: {"time_growth": v["time_growth"],
                          "rows_growth": v["rows_growth"]}
                      for k, v in out.items()}))
    ray.shutdown()


if __name__ == "__main__":
    main()
