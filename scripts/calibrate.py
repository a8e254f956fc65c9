#!/usr/bin/env python3
"""Host calibration stamp for cross-round bench comparability.

Bench artifacts (BENCH_FULL/SF1/SF10) are only comparable across rounds
when the host generation is the same — the sandbox VM is recreated per
session and per-core speed has been observed to vary by >5x between
instances (round 12: the committed 110.6 s sf0.1 chain re-measured at
599.5 s on a fresh VM with NOTHING else changed; every one of 121
"movers" was uniform host slowdown, zero were plan regressions).

This probe takes ~20 s and writes HOST_CALIBRATION.json next to the
bench artifacts. Compare rounds via the ratio of their `spin_mips`
stamps before reading any cross-round mover table; within-round
comparisons (same stamp) remain absolute.
"""
import json
import multiprocessing as mp
import os
import sys
import time


def spin(n):
    x = 0
    for i in range(n):
        x += i * i
    return x


def spin_rate(n=20_000_000):
    t0 = time.perf_counter()
    spin(n)
    return n / (time.perf_counter() - t0) / 1e6  # M iter/s


def clock_rate(n=2_000_000):
    t0 = time.perf_counter()
    for _ in range(n):
        time.monotonic_ns()
    return n / (time.perf_counter() - t0) / 1e6  # M calls/s


def main():
    nproc = os.cpu_count()
    single = spin_rate()
    t0 = time.perf_counter()
    with mp.Pool(nproc) as p:
        p.map(spin, [20_000_000] * nproc)
    wall = time.perf_counter() - t0
    agg = nproc * 20_000_000 / wall / 1e6
    out = {
        "nproc": nproc,
        "cpu_model": next((l.split(":", 1)[1].strip()
                           for l in open("/proc/cpuinfo")
                           if l.startswith("model name")), "?"),
        "spin_mips": round(single, 2),          # single-core M iter/s
        "spin_mips_allcore": round(agg, 2),     # all-core aggregate
        "scaling": round(agg / single / nproc, 3),
        "clock_mcalls": round(clock_rate(), 2),  # monotonic_ns M calls/s
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    json.dump(out, open("HOST_CALIBRATION.json", "w"), indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
