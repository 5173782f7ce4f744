#!/usr/bin/env python3
"""Result-identity check between two Verify output dirs (before/after an
optimization): canonical (sorted columns, sorted rows, exact values)
comparison of every query's parquet dump — covers rows-only queries that
have no DuckDB oracle.

Usage: diff_verify.py BEFORE_DIR AFTER_DIR
"""
import os, sys
import duckdb

def canon(con, qdir):
    r = con.execute(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
    cols = [d[0] for d in r.description]
    rows = r.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            vals.append("%.17g" % v if isinstance(v, float) else repr(v))
        out.append("\x01".join(vals))
    out.sort()
    return sorted(cols), out

def main(before, after):
    con = duckdb.connect()
    names = sorted(n for n in os.listdir(before)
                   if os.path.isdir(os.path.join(before, n)))
    n_same = n_diff = 0
    # symmetric coverage: an output present only in AFTER (renamed or
    # added) must fail the gate, not silently skip comparison
    for n in sorted(os.listdir(after)):
        if os.path.isdir(os.path.join(after, n)) and n not in names:
            n_diff += 1
            print(f"DIFF {n}: present only in after dir")
    for name in names:
        a_dir = os.path.join(after, name)
        if not os.path.isdir(a_dir):
            n_diff += 1
            print(f"DIFF {name}: missing in after dir")
            continue
        bc, br = canon(con, os.path.join(before, name))
        ac, ar = canon(con, a_dir)
        if bc != ac:
            n_diff += 1
            print(f"DIFF {name}: columns {bc} vs {ac}")
        elif br != ar:
            n_diff += 1
            i = next((i for i in range(min(len(br), len(ar))) if br[i] != ar[i]),
                     min(len(br), len(ar)))
            print(f"DIFF {name}: rows {len(br)} vs {len(ar)}, first mismatch at {i}:")
            if i < len(br): print(f"  before: {br[i][:300]}")
            if i < len(ar): print(f"  after : {ar[i][:300]}")
        else:
            n_same += 1
            print(f"SAME {name} ({len(br)} rows)")
    print(f"\n{n_same} identical, {n_diff} DIFFER")
    return 1 if n_diff else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
