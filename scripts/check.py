#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle_sql.json
entry in DuckDB over the testdata parquet tables and compare against the
Verify-dumped Spark result parquet (columns sorted by name, exact values).

Comparison happens at the ARROW level, not pandas: pandas flattens DuckDB
decimals to float64, which hid a real driver-gate failure (sql_q2: Spark
Decimal('22.10') vs DuckDB 22.1 hash differently even though the values are
numerically equal). Every cell is canonicalized to a string the way the
driver's hash does — decimal.Decimal keeps its scale — so a raw-DECIMAL
output column with mismatched scale FAILS here exactly as it would there.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query1,query2,...]
The optional third arg restricts the gate to a comma-separated subset —
how the giant-oracle scales (sf10) run in shards so one DuckDB process
never holds every spill at once.
"""
import sys, os, json, glob, math, decimal, datetime
import duckdb
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    """Canonical string for one cell, mirroring the driver's hash input.

    decimal.Decimal deliberately preserves scale (str(Decimal('22.10')) !=
    str(Decimal('22.1'))) — that is the divergence class this gate must see.
    """
    if v is None:
        return "\x00null"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return "dec:" + str(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, bytes):
        return "bin:" + v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={canon(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        # the driver's pandas-level hash reads a DATE as a midnight
        # Timestamp, so a date and a timestamp-at-midnight compare equal
        # there; mirror that (decimals stay strict — that class the
        # driver DOES fail on)
        return datetime.datetime(v.year, v.month, v.day).isoformat()
    return str(v)


def col_values(tbl, name):
    return [canon(v) for v in tbl.column(name).to_pylist()]


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    # cap DuckDB parallelism when sharing the host with a timed run
    # (default = all cores): GRAFT_CHECK_THREADS=8 python3 scripts/check.py ...
    t_env = os.environ.get("GRAFT_CHECK_THREADS")
    if t_env:
        con.execute(f"SET threads TO {int(t_env)}")
    # the giant media oracles (dedup_video's 144M-row frame grid at sf10)
    # spill DuckDB temp past the disk when run with default settings
    # alongside another check process; a memory cap + one-process-per-query
    # (scripts/gate_scale.py) keep the hash joins in budget.
    m_env = os.environ.get("GRAFT_CHECK_MEMLIMIT")
    if m_env:
        con.execute(f"SET memory_limit = '{m_env}'")
    # GRAFT_CHECK_NO_ORDER is UNSOUND for this gate and exists only for
    # ad-hoc row-count triage: with preserve_insertion_order=false this
    # DuckDB's Arrow fetch path can return a final ORDER BY's batches out
    # of order for some parallel plans — measured at sf1: 8 of 229 queries
    # (bpe_encode, fn_math, graph_pagerank, ...) came back unsorted
    # DESPITE total unique ORDER BY keys, and re-ran clean with insertion
    # order preserved. The driver's gate runs DuckDB at defaults; so must
    # any run whose verdict is recorded.
    if os.environ.get("GRAFT_CHECK_NO_ORDER"):
        con.execute("SET preserve_insertion_order = false")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        missing = [q for q in only if q not in oracle]
        if missing:
            print(f"FAIL subset: not in oracle_sql.json: {missing}")
            return 1
        oracle = {q: oracle[q] for q in only}
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}"); n_fail += 1; continue
        try:
            exp = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1; continue
        gc, ec = sorted(got.column_names), sorted(exp.column_names)
        if gc != ec:
            print(f"FAIL {name}: columns differ spark={gc} duck={ec}"); n_fail += 1; continue
        if got.num_rows != exp.num_rows:
            print(f"FAIL {name}: rows spark={got.num_rows} duck={exp.num_rows}"); n_fail += 1; continue
        bad = None
        dec_cols = []
        for c in gc:
            gt, et = got.schema.field(c).type, exp.schema.field(c).type
            if pa.types.is_decimal(gt) or pa.types.is_decimal(et):
                dec_cols.append(f"{c}(spark={gt},duck={et})")
            gv, ev = col_values(got, c), col_values(exp, c)
            for i, (a, b) in enumerate(zip(gv, ev)):
                if a != b:
                    bad = (c, i, a, b); break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col={c} row={i} spark={a!r} duck={b!r}")
            n_fail += 1
        else:
            note = ""
            if dec_cols:
                # Values canonicalized identically this time, but a raw
                # DECIMAL output column is one scale mismatch away from a
                # driver hash-red; the registry policy is ONE final cast to
                # DOUBLE. Surface it loudly.
                note = f"  [WARN raw-decimal output: {dec_cols}]"
            print(f"PASS {name} ({got.num_rows} rows){note}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    subset = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], subset))
