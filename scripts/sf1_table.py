#!/usr/bin/env python3
"""Render the sf0.1-vs-sf1 scaling table (BASELINE.md "Bench at sf1") from
the two committed bench artifacts. Usage:

    python3 scripts/sf1_table.py [BENCH_FULL.json] [BENCH_SF1.json]

Prints the heavy-query markdown table (every query ≥ 0.5 s at sf1, plus any
query whose time OR shuffle ratio exceeds 10× regardless of absolute cost)
and summary lines — paste into BASELINE.md after a bench re-run.
"""
import json, sys

full = sys.argv[1] if len(sys.argv) > 1 else "BENCH_FULL.json"
sf1 = sys.argv[2] if len(sys.argv) > 2 else "BENCH_SF1.json"
a, b = json.load(open(full)), json.load(open(sf1))
qa, qb, sa, sb = a["queries"], b["queries"], a["shuffle_mb"], b["shuffle_mb"]

rows = []
for k, t1 in qb.items():
    if k not in qa:
        continue
    t0, m0, m1 = qa[k], sa.get(k, 0.0), sb.get(k, 0.0)
    tr = t1 / t0 if t0 > 0 else float("inf")
    mr = m1 / m0 if m0 > 0 else (float("inf") if m1 > 0.05 else 1.0)
    if t1 >= 0.5 or tr > 10 or mr > 10:
        rows.append((t1, k, t0, tr, m0, m1, mr))
rows.sort(reverse=True)

print("| query | sf0.1 s | sf1 s | ×time | sf0.1 MB | sf1 MB | ×shuffle |")
print("|---|---|---|---|---|---|---|")
for t1, k, t0, tr, m0, m1, mr in rows:
    mrs = "new" if mr == float("inf") else f"{mr:.0f}×"
    print(f"| `{k}` | {t0:.2f} | {t1:.2f} | {tr:.1f}× | {m0:.1f} | {m1:.1f} | {mrs} |")

tot0, tot1 = a["value"], b["value"]
n = len(qb)
print(f"\ntotals: {tot0:.1f} s -> {tot1:.1f} s over {n} queries "
      f"({tot1/tot0:.2f}x on 10x data); failed: {b['failed']}; "
      f"over-budget: {list(b.get('shuffle_over_budget', {}))}")
grow = [(k, qb[k] / qa[k]) for k in qb if k in qa and qa[k] > 0 and qb[k] / qa[k] > 15]
print("time >15x growers:", grow if grow else "none")
