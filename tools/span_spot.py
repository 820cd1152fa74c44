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


def _fresh():
    # a FRESH Ray session per phase: one sf0.25 exchange leaves GBs of
    # spilled objects pinned for the session's lifetime; stacking the
    # growth queries and the strategy A/B in one session runs the box
    # out of disk (OutOfDiskError observed)
    import ray

    if ray.is_initialized():
        ray.shutdown()
    ray.init(address="local", num_cpus=32, include_dashboard=False)


def main():
    import ray

    import __ray_entry__ as entry

    from malli_ray.stages import dedup

    qs = entry.queries()
    out = {}
    for name in ("dup_spans_sequences", "remove_dup_spans_sequences"):
        out[name] = {}
        _fresh()
        for sf_dir, label in (("/root/testdata/sf0.05", "sf0.05"),
                              ("/root/testdata/sf0.25", "sf0.25")):
            t0 = time.time()
            n = qs[name](sf_dir).count()
            out[name][label] = {"wall_s": round(time.time() - t0, 2),
                                "rows": n}
        g = out[name]
        out[name]["growth_at_5x_rows"] = round(
            g["sf0.25"]["wall_s"] / g["sf0.05"]["wall_s"], 2)
    # strategy A/B for the remove op: broadcast wins at BOTH scales when
    # each run gets a clean session (sf0.25: 71.4s vs 98.2s) — an
    # earlier same-session A/B showed the opposite ordering purely from
    # intra-session interference (the first run's spilled objects stay
    # lineage-pinned and tax the second), which is why the measurement
    # isolates sessions
    out["strategy_ab"] = {}
    for sf_dir, label in (("/root/testdata/sf0.05", "sf0.05"),
                          ("/root/testdata/sf0.25", "sf0.25")):
        ab = {}
        for strat in ("broadcast", "exchange"):
            # one session PER STRATEGY: completed-run lineage pins the
            # spilled exchange objects, and two sf0.25 runs in one
            # session cross the 95% disk threshold (observed)
            _fresh()
            base = (entry._seq_union_with_copies(sf_dir, "trunc")
                    .materialize())
            t0 = time.time()
            dedup.remove_duplicate_token_spans(
                base, "tokens", "doc_id", k=10,
                strategy=strat).count()
            ab[strat] = round(time.time() - t0, 2)
        out["strategy_ab"][label] = ab
    path = os.path.join(REPO, "BENCH", "span_spot_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
