"""5x growth spot-check for the token-level exact substring dedup
queries (r5): runs dup_spans_sequences and remove_dup_spans_sequences at
sf0.05 (250k rows) and sf0.25 (1.25M rows, genuinely unique ids — NOT the
hardlink-replicated x10 input, which would make every doc a 10-fold
exact duplicate and distort first-occurrence semantics), one fresh Ray
session, and reports wall growth vs the exact 5x row growth (a 5x pair at sf0.05/sf0.25: the sf1 and even sf0.5 occurrence exchanges
spill past this box's ~78 GB usable disk — Ray OutOfDiskError at the 95%
threshold, observed; the growth LAW is what the pair pins).

Run: python tools/span_spot.py   (writes BENCH/span_spot_r5.json)
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False)
    import __ray_entry__ as entry

    qs = entry.queries()
    out = {}
    for name in ("dup_spans_sequences", "remove_dup_spans_sequences"):
        out[name] = {}
        for sf_dir, label in (("/root/testdata/sf0.05", "sf0.05"),
                              ("/root/testdata/sf0.25", "sf0.25")):
            t0 = time.time()
            n = qs[name](sf_dir).count()
            out[name][label] = {"wall_s": round(time.time() - t0, 2),
                                "rows": n}
        g = out[name]
        out[name]["growth_at_5x_rows"] = round(
            g["sf0.25"]["wall_s"] / g["sf0.05"]["wall_s"], 2)
    path = os.path.join(REPO, "BENCH", "span_spot_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
