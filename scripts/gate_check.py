#!/usr/bin/env python3
"""Per-query 2x gate check: BENCH json vs BASELINE.json floors.

Usage: python3 scripts/gate_check.py [BENCH_LAST.json]

Prints queries at >= 1.5x their recorded floor (WATCH) and >= 2.0x
(VIOLATION), plus the total ratio. Floors follow the BASELINE.md
refresh policy; queries without a floor are listed so they get one.
Exit code 1 iff a VIOLATION exists — but remember the host VM's
bimodal noise: confirm any violation with a solo min-of-5 run
(SPARK_GRAFT_ONLY=<query>) before treating it as real.
"""
import json
import sys

bench_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_LAST.json"
base = json.load(open("BASELINE.json"))["queries_min_sec"]
bench = json.load(open(bench_path))
cur = bench["queries"] if "queries" in bench else bench

violations = []
for name, t in sorted(cur.items()):
    if t < 0:
        print(f"ERROR {name}: query failed (t={t})")
        violations.append(name)
        continue
    floor = base.get(name)
    if floor is None:
        print(f"NOFLOOR {name}: {t:.3f}s — record one (BASELINE.md rule 1)")
        continue
    r = t / floor
    if r >= 2.0:
        print(f"VIOLATION {name}: {t:.3f}s vs floor {floor:.3f}s = {r:.2f}x")
        violations.append(name)
    elif r >= 1.5:
        print(f"WATCH {name}: {t:.3f}s vs floor {floor:.3f}s = {r:.2f}x")

tot = sum(t for t in cur.values() if t >= 0)
floor_tot = sum(base[n] for n in cur if n in base and cur[n] >= 0)
if floor_tot:
    print(f"total {tot:.2f}s vs floor-sum {floor_tot:.2f}s "
          f"= {tot / floor_tot:.2f}x")
sys.exit(1 if violations else 0)
