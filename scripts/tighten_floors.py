#!/usr/bin/env python3
"""Tighten per-query floors DOWNWARD from a same-semantics board.

Usage: python3 scripts/tighten_floors.py BENCH_LAST.json q_a q_b ...

For each named query, if the board's min-of-N reading is LOWER than
the recorded floor in BASELINE.json, the floor tightens to the board
value (the r13-addendum convention: floors recorded on a degraded
host re-tighten automatically when a cleaner window shows up). Never
raises a floor. Prints each change; appends one changelog entry when
anything moved.
"""
import json
import sys

bench_path = sys.argv[1]
names = sys.argv[2:]

bench = json.load(open(bench_path))
base = json.load(open("BASELINE.json"))
floors = base["queries_min_sec"]

moved = []
for q in names:
    got = bench["queries"].get(q)
    if got is None or got < 0:
        print(f"SKIP {q}: not on the board")
        continue
    old = floors.get(q)
    if old is None:
        print(f"SKIP {q}: no recorded floor")
        continue
    if got < old:
        floors[q] = got
        moved.append(f"{q} {old} -> {got}")
        print(f"TIGHTEN {q}: {old} -> {got}")
    else:
        print(f"KEEP    {q}: floor {old} <= board {got}")

if moved:
    base["changelog"].append(
        "floors tightened downward to a later same-semantics board minimum "
        "(the r13-addendum convention, scripts/tighten_floors.py): "
        + "; ".join(moved))
    json.dump(base, open("BASELINE.json", "w"), indent=1, sort_keys=True)
    print(f"{len(moved)} floor(s) tightened; changelog appended")
else:
    print("nothing to tighten")
