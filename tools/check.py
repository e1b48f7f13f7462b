#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: after `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"`,
run `python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out [query...]`.

Loads each <name>/ parquet result, runs the corresponding oracle_sql.json
entry in DuckDB with the sf tables registered by name, sorts columns by
name, and compares row-by-row with value normalization (timestamps →
isoformat, floats → repr, NaN/None unified).
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return repr(round(v, 9))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(norm_cell(x) for x in v)
    return v


def normalize(df):
    df = df[sorted(df.columns)]
    rows = []
    for t in df.itertuples(index=False):
        rows.append(tuple(norm_cell(v) for v in t))
    return rows


def main(sf_dir, out_dir, only, manifest=None, sf_label=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    try:
        timings = json.load(open(f"{out_dir}/verify_timings.json"))
    except Exception:
        timings = {}
    results = {}
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        results[name] = {"ok": False, "rows": 0,
                         "seconds": timings.get(name)}
        try:
            mine = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})")
            n_bad += 1
            continue
        try:
            ref = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            n_bad += 1
            continue
        if sorted(mine.columns) != sorted(ref.columns):
            print(f"FAIL {name}: columns {sorted(mine.columns)} vs {sorted(ref.columns)}")
            n_bad += 1
            continue
        a, b = normalize(mine), normalize(ref)
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            n_bad += 1
            continue
        diffs = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y]
        if diffs:
            i, x, y = diffs[0]
            print(f"FAIL {name}: {len(diffs)}/{len(a)} rows differ; first @{i}:")
            print(f"  spark : {x}")
            print(f"  duckdb: {y}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(a)} rows)")
            results[name] = {"ok": True, "rows": len(a),
                             "seconds": timings.get(name)}
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    if manifest:
        # round-close manifest (VERDICT r14 #5): merge this run's
        # verdicts into {sf_label: {query: {ok, rows, seconds}}} so the
        # round's hard correctness signal is a committed artifact
        try:
            existing = json.load(open(manifest))
        except Exception:
            existing = {}
        existing[sf_label or sf_dir] = results
        json.dump(existing, open(manifest, "w"), indent=1, sort_keys=True)
        print(f"manifest -> {manifest}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    manifest = sf_label = None
    if "--manifest" in args:
        i = args.index("--manifest")
        manifest = args[i + 1]
        del args[i:i + 2]
    if "--sf" in args:
        i = args.index("--sf")
        sf_label = args[i + 1]
        del args[i:i + 2]
    sys.exit(main(args[0], args[1], set(args[2:]), manifest, sf_label))
