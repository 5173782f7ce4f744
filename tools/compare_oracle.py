#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run each oracle SQL from
oracle_sql.json in DuckDB over the sf tables, compare against the parquet
the Verify main dumped (sorted columns, sorted rows, exact values).

Usage: compare_oracle.py SF_DIR OUT_DIR
"""
import json, math, os, sys
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                vals.append("%.12g" % v)
            else:
                vals.append(repr(v))
        out.append("\x01".join(vals))
    out.sort()
    return sorted(c for c in cols), out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_rows_only = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        got = con.execute(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        got_cols = [d[0] for d in got.description]
        got_rows = got.fetchall()
        if name not in oracle:
            status = "rows-only"
            ok = len(got_rows) > 0
            n_rows_only += 1
            if not ok:
                n_fail += 1
                print(f"FAIL {name}: rows-only but EMPTY")
            else:
                print(f"ok   {name}: rows-only ({len(got_rows)} rows)")
            continue
        try:
            exp = con.execute(oracle[name])
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:
            n_fail += 1
            print(f"FAIL {name}: oracle SQL error: {e}")
            continue
        gc, gr = canon(got_rows, got_cols)
        ec, er = canon(exp_rows, exp_cols)
        if gc != ec:
            n_fail += 1
            print(f"FAIL {name}: columns differ spark={gc} duck={ec}")
        elif len(gr) != len(er):
            n_fail += 1
            print(f"FAIL {name}: row count spark={len(gr)} duck={len(er)}")
        elif gr != er:
            n_fail += 1
            bad = next(i for i in range(len(gr)) if gr[i] != er[i])
            print(f"FAIL {name}: values differ at sorted-row {bad}:")
            print(f"  spark: {gr[bad][:300]}")
            print(f"  duck : {er[bad][:300]}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(gr)} rows)")
    print(f"\n{n_pass} oracle-pass, {n_rows_only} rows-only, {n_fail} FAIL")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
