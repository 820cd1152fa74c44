"""Local replica of the driver's correctness gate.

Runs every `__ray_entry__.queries()` entry at a given sf dir AND its
`oracle_sql()` DuckDB counterpart (tables registered as views over the
parquet files), then compares row count, column-name set, and a value hash
computed over columns sorted by name and rows sorted by all columns —
mirroring the driver's documented compare.  Queries without an oracle are
reported rows-only.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

import hashlib
import json
import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _to_pandas(res):
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif s.dtype == object or pd.api.types.is_string_dtype(s):
            df[c] = s.map(lambda v: json.dumps(v, sort_keys=True, default=str)
                          if isinstance(v, (list, dict)) else v)
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def _hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_float_dtype(col):
            vals = [repr(float(v)) if pd.notna(v) else "null" for v in col]
        else:
            vals = [("null" if v is None or (isinstance(v, float) and pd.isna(v))
                     else str(v)) for v in col]
        h.update(("\x1f".join(vals) + "\x1e").encode())
    return h.hexdigest()[:16]


def main(argv):
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get(
            "RAY_GRAFT_CPUS", "32")), include_dashboard=False,
            logging_level="ERROR")

    import __ray_entry__ as entry
    queries, oracles = entry.queries(), entry.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    results, n_pass, n_fail, n_rows_only = {}, 0, 0, 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = _canon(_to_pandas(fn(sf_dir)))
        except Exception as ex:  # noqa: BLE001
            results[name] = {"err": f"query: {type(ex).__name__}: {ex}"}
            n_fail += 1
            print(f"FAIL  {name}: query raised {ex}")
            continue
        if name not in oracles:
            results[name] = {"rows": len(mine), "no_oracle": True}
            n_rows_only += 1
            print(f"rows  {name}: {len(mine)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            want = _canon(con.execute(oracles[name]).fetchdf())
        except Exception as ex:  # noqa: BLE001
            results[name] = {"err": f"oracle: {type(ex).__name__}: {ex}"}
            n_fail += 1
            print(f"FAIL  {name}: oracle raised {ex}")
            continue
        rows = len(mine) == len(want)
        schema = list(mine.columns) == list(want.columns)
        hmatch = rows and schema and _hash(mine) == _hash(want)
        results[name] = {"rows_match": rows, "schema_match": schema,
                         "hash_match": hmatch, "mine": len(mine),
                         "oracle": len(want)}
        if rows and schema and hmatch:
            n_pass += 1
            print(f"ok    {name}: {len(mine)} rows [{time.time()-t0:.1f}s]")
        else:
            n_fail += 1
            print(f"FAIL  {name}: rows={rows} ({len(mine)} vs {len(want)}) "
                  f"schema={schema} hash={hmatch}")
            if not schema:
                print(f"      mine:   {list(mine.columns)}")
                print(f"      oracle: {list(want.columns)}")
            elif rows and not hmatch and len(mine):
                diff = (mine != want) & ~(mine.isna() & want.isna())
                bad = diff.any(axis=0)
                for c in mine.columns[bad][:3]:
                    i = diff[c].idxmax()
                    print(f"      col {c} row {i}: "
                          f"{mine[c][i]!r} vs {want[c][i]!r}")

    print(f"\n{n_pass} pass, {n_fail} FAIL, {n_rows_only} rows-only "
          f"/ {len(results)} run")
    with open("/tmp/correctness_local.json", "w") as f:
        json.dump(results, f, indent=1, default=str)
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
