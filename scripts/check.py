#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle_sql.json
entry in DuckDB over the testdata parquet tables and compare against the
Verify-dumped Spark result parquet (columns sorted by name, exact values).

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}"); n_fail += 1; continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1; continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f"FAIL {name}: columns differ spark={gc} duck={ec}"); n_fail += 1; continue
        got, exp = got[gc], exp[gc]
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} duck={len(exp)}"); n_fail += 1; continue
        bad = None
        for c in gc:
            gv, ev = got[c].tolist(), exp[c].tolist()
            for i, (a, b) in enumerate(zip(gv, ev)):
                if a is None and b is None: continue
                if isinstance(a, float) and isinstance(b, float):
                    if math.isnan(a) and math.isnan(b): continue
                    if a != b:
                        bad = (c, i, a, b, abs(a - b)); break
                elif isinstance(a, (list, tuple)) or str(type(a).__name__) == 'ndarray':
                    if list(a) != list(b): bad = (c, i, a, b, None); break
                elif a != b:
                    if str(a) == str(b): continue  # dtype wrapper mismatch
                    bad = (c, i, a, b, None); break
            if bad: break
        if bad:
            c, i, a, b, delta = bad
            print(f"FAIL {name}: col={c} row={i} spark={a!r} duck={b!r} delta={delta}")
            n_fail += 1
        else:
            # dtype-level schema check (int32 vs int64 etc.)
            gt = [str(got[c].dtype) for c in gc]
            et = [str(exp[c].dtype) for c in gc]
            note = "" if gt == et else f"  [dtype diff: {list(zip(gc, gt, et))}]"
            print(f"PASS {name} ({len(got)} rows){note}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
