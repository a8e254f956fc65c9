#!/usr/bin/env python3
"""Resumable large-scale oracle gate: run scripts/check.py one query at a
time (its own DuckDB process, so a giant oracle's spill is reclaimed before
the next starts), append results to a log, and skip queries already PASSed
in that log — a crashed/killed run resumes where it left off.

Usage: python3 scripts/gate_scale.py <sfDir> <verifyOutDir> <logFile>
Env:   GRAFT_CHECK_MEMLIMIT / GRAFT_CHECK_THREADS pass through to check.py
       (the sf10 media oracles need MEMLIMIT≈24GB; per-query process
       isolation reclaims each oracle's spill before the next starts).
       Do NOT set GRAFT_CHECK_NO_ORDER for a recorded gate — it is
       unsound (see check.py: DuckDB's Arrow fetch can return a final
       ORDER BY's batches out of order under it), and a PASS produced
       under it would stick in the resume log.
"""
import json
import os
import subprocess
import sys

sf_dir, out_dir, log_file = sys.argv[1], sys.argv[2], sys.argv[3]
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

done = set()
if os.path.exists(log_file):
    for line in open(log_file):
        if line.startswith("PASS "):
            done.add(line.split()[1])

todo = [q for q in sorted(oracle) if q not in done]
print(f"[gate] {len(done)} already passed, {len(todo)} to run", flush=True)

n_fail = 0
with open(log_file, "a") as log:
    for i, q in enumerate(todo):
        r = subprocess.run(
            [sys.executable, "scripts/check.py", sf_dir, out_dir, q],
            capture_output=True, text=True)
        verdict = [l for l in r.stdout.splitlines()
                   if l.startswith(("PASS", "FAIL"))]
        line = verdict[0] if verdict else f"FAIL {q}: no verdict (rc={r.returncode})"
        log.write(line + "\n")
        log.flush()
        if line.startswith("FAIL"):
            n_fail += 1
        print(f"[gate {len(done) + i + 1}/{len(oracle)}] {line}", flush=True)

print(f"[gate] complete: {len(oracle) - n_fail} pass, {n_fail} fail "
      f"(of {len(oracle)})", flush=True)
sys.exit(1 if n_fail else 0)
