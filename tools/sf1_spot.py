"""sf1 (10x) spot-check of the heavy pipelines — VERDICT r3 item 5.

Runs the five heaviest pipelines at sf0.1 and at the synthesized 10x
input (tools/make_sf1.py), in ONE Ray session with a warmup, and writes
BENCH/sf1_spot.json with wall times and growth factors.  A growth
factor near 10 (or below) on a 10x input is linear-or-better scaling;
super-linear growth flags a quadratic term the 100x design argument
would need to explain.

Usage: python tools/sf1_spot.py [sf1dir=/tmp/sf1]
"""

import json
import os
import sys
import time

QUERIES = ["near_dup_pairs_prefix", "containment_pairs_documents",
           "corpus_prep_v5_documents", "dup_spans_documents",
           "bfs_orders",
           # r4 session-3 additions (documents-table heavies)
           "with_frequencies_documents", "logreg_classify_documents",
           "incremental_near_dup_documents", "bigram_lm_hashed_documents"]


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __ray_entry__ as entry
    qs = entry.queries()
    os.popen("uptime").read()
    result = {"sf1_dir": sf1, "queries": {}}
    # warmup: spin workers so the first timed query isn't cold
    qs["token_count_documents"]("/root/testdata/sf0.1").count()
    for name in QUERIES:
        row = {}
        for label, d in (("sf0.1", "/root/testdata/sf0.1"), ("sf1", sf1)):
            t0 = time.perf_counter()
            out = qs[name](d)
            n = out.count() if hasattr(out, "count") else len(out)
            row[label] = {"sec": round(time.perf_counter() - t0, 2),
                          "rows": int(n)}
        row["growth_time"] = round(row["sf1"]["sec"]
                                   / max(row["sf0.1"]["sec"], 1e-9), 2)
        row["growth_rows"] = round(row["sf1"]["rows"]
                                   / max(row["sf0.1"]["rows"], 1), 2)
        result["queries"][name] = row
        print(name, json.dumps(row))
    result["load_after"] = os.getloadavg()[0]
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "sf1_spot.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", out_path)
    ray.shutdown()


if __name__ == "__main__":
    main()
