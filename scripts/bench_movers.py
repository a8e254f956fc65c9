#!/usr/bin/env python3
"""Per-query movers between two Bench artifacts (committed closing-chain
discipline): prints entries whose min-time moved more than `ratio` in
either direction and above `floor_sec`, plus totals. Usage:
  python3 scripts/bench_movers.py OLD.json NEW.json [ratio] [floor_sec]
"""
import json, sys

old = json.load(open(sys.argv[1]))
new = json.load(open(sys.argv[2]))
ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.5
oq, nq = old["queries"], new["queries"]
movers = []
for k in sorted(set(oq) & set(nq)):
    a, b = oq[k], nq[k]
    if max(a, b) < floor:
        continue
    if b > a * ratio or a > b * ratio:
        movers.append((k, a, b))
print(f"old total {old['value']:.1f}s / {len(oq)} entries; "
      f"new total {new['value']:.1f}s / {len(nq)} entries")
print(f"only-old: {sorted(set(oq) - set(nq))}")
print(f"only-new: {sorted(set(nq) - set(oq))}")
print(f"movers >{ratio}x (floor {floor}s): {len(movers)}")
for k, a, b in sorted(movers, key=lambda m: -max(m[1], m[2])):
    r = f"{b/a:5.2f}x" if a > 0 else "  infx"
    print(f"  {k:32s} {a:8.2f} -> {b:8.2f}  ({r})")
print(f"failed old={old.get('failed')} new={new.get('failed')}")
print(f"over_budget new={new.get('shuffle_over_budget')}")
print(f"persisted_mb old={old.get('persisted_mb')} new={new.get('persisted_mb')}")
