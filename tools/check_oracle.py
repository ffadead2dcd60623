#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: reads each
<outDir>/<name> parquet written by `graft.Verify`, runs the matching oracle
SQL from <outDir>/oracle_sql.json in DuckDB over the sf tables, and compares
row counts, sorted column names, and a hash of the sorted values.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import json
import math
import os
import sys

import duckdb


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, bool):
        return str(v).lower()
    # Decimal, datetime, int, str all stringify deterministically
    return str(v)


def frame_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(canon(r[i]) for i in order) for r in rows)
    return len(rows), [cols[i] for i in order], hash(tuple(lines)), lines[:3]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for tbl in ("region nation customer supplier part orders lineitem "
                "events documents embeddings").split():
        p = f"{sf_dir}/{tbl}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        got = con.execute(f"SELECT * FROM '{path}/*.parquet'")
        g_cols = [d[0] for d in got.description]
        g_rows = got.fetchall()
        if name not in oracles:
            print(f"{name}: rows-only ({len(g_rows)} rows) "
                  f"{'OK' if len(g_rows) > 0 else 'EMPTY!'}")
            if len(g_rows) == 0:
                failures += 1
            continue
        want = con.execute(oracles[name])
        w_cols = [d[0] for d in want.description]
        w_rows = want.fetchall()
        gk = frame_key(g_cols, g_rows)
        wk = frame_key(w_cols, w_rows)
        if gk[:3] == wk[:3]:
            print(f"{name}: MATCH ({gk[0]} rows)")
        else:
            failures += 1
            print(f"{name}: MISMATCH spark=({gk[0]} rows, {gk[1]}) "
                  f"duck=({wk[0]} rows, {wk[1]})")
            print("  spark sample:", gk[3])
            print("  duck  sample:", wk[3])
    print("FAILURES:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
