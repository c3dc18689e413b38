#!/usr/bin/env python3
"""Local oracle pre-check (mirrors the driver's t2 compare; SURVEY §5.2).

Usage: python3 tools/precheck.py [sfDir] [outDir]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran, so
<outDir> holds one parquet dir per query plus oracle_sql.json. Runs each
oracle SQL in DuckDB against the same source parquet tables and compares:
row count, column names (sorted), and values (exact, after sorting
columns by name — same normalization the driver hashes under).

Local-dev tool only; the shipped Scala library does not depend on it.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    """Normalize a scalar for exact comparison."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):          # datetime/date
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(norm(x) for x in v)
    return v


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    produced = {p.name for p in Path(out).iterdir() if p.is_dir()}
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if name not in produced:
            print(f"FAIL {name}: no parquet output produced")
            n_fail += 1
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        got = con.sql(
            f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").df()
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        # Driver-faithful step: the driver sorts rows by ALL columns before
        # hashing; array/struct cells raise "unhashable ndarray" there (the
        # round-1 a7/f4 failures). Reproduce that locally so it dies here.
        try:
            exp = exp.sort_values(list(exp.columns)).reset_index(drop=True)
            got = got.sort_values(list(got.columns)).reset_index(drop=True)
        except (TypeError, ValueError) as e:
            # TypeError for multi-column lexsort over array cells,
            # ValueError for the single-column case
            print(f"FAIL {name}: driver-style sort failed (array/struct "
                  f"output column?): {e}")
            n_fail += 1
            continue
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            n_fail += 1
            continue
        bad = None
        for i in range(len(exp)):
            for c in exp.columns:
                ev, gv = norm(exp[c].iloc[i]), norm(got[c].iloc[i])
                if ev != gv and not (ev is None and gv is None):
                    bad = (i, c, ev, gv)
                    break
            if bad:
                break
        if bad:
            i, c, ev, gv = bad
            print(f"FAIL {name}: row {i} col {c}: oracle={ev!r} got={gv!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows)")
            n_pass += 1
    missing_oracle = produced - set(oracle) - {"oracle_sql.json"}
    for name in sorted(missing_oracle):
        print(f"NOTE {name}: produced but no oracle (rows-only check)")
    print(f"\n{n_pass} pass, {n_fail} fail, {len(missing_oracle)} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
