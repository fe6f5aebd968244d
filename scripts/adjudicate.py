#!/usr/bin/env python3
"""Machine adjudication of a bench board's flagged rows.

Usage:
  python3 scripts/adjudicate.py BENCH_LAST.json [PRIOR_BOARD.json ...]
      [--threshold 2.0] [--write]

Classifies every row reading >= threshold x its BASELINE.json floor
using the evidence the round verdicts applied by hand (drift samples
#4-#8 in BASELINE.md):

  1. the board's own host_drift probe (start/mid/end vs the 0.073
     clean-class reference measured in the floor era);
  2. pass-array shape — flat-slow (a sustained noise window), bimodal
     (min pass near the floor: the row itself is fine), recovering /
     entering (a window boundary caught mid-row);
  3. board-position clustering — multi-minute noise windows flag
     CONTIGUOUS rows (the r14 positions-185-193 signature);
  4. prior-board readings of the same query — a row any prior board
     read near its floor is environmental unless its code changed.

Output: one adjudication line per flagged row, plus a verdict class:
  ENVIRONMENTAL  evidence says host noise — no action
  BIMODAL-NOISE  this board's own min pass is near the floor
  PERSISTENT     reproduced across boards/passes with no noise
                 signature — needs a solo min-of-10 probe (rule-2
                 re-floor candidate, scripts/tighten_floors.py after)
With --write the lines are embedded into the board JSON under
"adjudication" so BENCH_LAST carries them.

Mechanical evidence only: the script does NOT know whether a query's
code changed since its floor — confirm with git before acting on a
PERSISTENT verdict.
"""
import json
import sys

CLEAN_PROBE = 0.073   # floor-era clean-class drift probe reading
NEAR_FLOOR = 1.3      # a pass under this ratio clears the row itself
CLUSTER_GAP = 8       # flags this close chain into one window cluster

args = [a for a in sys.argv[1:] if not a.startswith("--")]
threshold = 2.0
if "--threshold" in sys.argv:
    threshold = float(sys.argv[sys.argv.index("--threshold") + 1])
    args = [a for a in args if a != str(threshold)]
write_back = "--write" in sys.argv

board_path, prior_paths = args[0], args[1:]
board = json.load(open(board_path))
floors = json.load(open("BASELINE.json"))["queries_min_sec"]
priors = []
for p in prior_paths:
    try:
        j = json.load(open(p))
        if "queries" in j:
            priors.append((p, j["queries"]))
    except (json.JSONDecodeError, KeyError):
        print(f"note: skipping unreadable prior board {p}")

order = list(board["queries"].keys())  # insertion order = run order
flagged = []
for pos, q in enumerate(order):
    got = board["queries"][q]
    floor = floors.get(q)
    if floor and got > 0 and got / floor >= threshold:
        flagged.append((pos, q, got / floor))

drift = board.get("host_drift") or {}
drift_line = ""
if drift:
    worst = max(v for k, v in drift.items() if k != "ratio")
    drift_line = (
        f"host_drift start/mid/end = {drift.get('start')}/"
        f"{drift.get('mid')}/{drift.get('end')} "
        f"({worst / CLEAN_PROBE:.1f}x the clean class at worst)")
    print(f"board: {drift_line}")
print(f"{len(flagged)} row(s) >= {threshold}x of {len(order)} on the board\n")


def shape(passes, floor):
    """Classify a pass array against the row's floor."""
    if not passes or len(passes) < 2:
        return "single-pass", False
    ratios = [p / floor for p in passes]
    if min(ratios) < NEAR_FLOOR:
        return f"bimodal (min pass {min(ratios):.2f}x — near floor)", True
    spread = max(ratios) / min(ratios)
    half = len(ratios) // 2
    first, second = ratios[:half], ratios[half:]
    if sum(second) / len(second) < 0.6 * (sum(first) / len(first)):
        return f"recovering ({ratios[0]:.2f}x -> {ratios[-1]:.2f}x)", False
    if sum(first) / len(first) < 0.6 * (sum(second) / len(second)):
        return f"entering ({ratios[0]:.2f}x -> {ratios[-1]:.2f}x)", False
    if spread < 1.6:
        return f"flat-slow (all {min(ratios):.2f}-{max(ratios):.2f}x)", False
    return f"mixed (spread {spread:.1f}x)", False


# chain flags whose positions are within CLUSTER_GAP into window
# clusters — a multi-minute noise window flags a CONTIGUOUS run of
# board rows (r14's positions 185-193), not scattered singletons
flag_positions = sorted(pos for pos, _, _ in flagged)
cluster_of = {}
run = []
for p in flag_positions:
    if run and p - run[-1] > CLUSTER_GAP:
        for x in run:
            cluster_of[x] = run[:]
        run = []
    run.append(p)
for x in run:
    cluster_of[x] = run[:]

adjudication = {}
for pos, q, ratio in flagged:
    evid = []
    passes = (board.get("passes") or {}).get(q) or []
    floor = floors[q]
    shp, near_floor_pass = shape(passes, floor)
    evid.append(f"passes {shp}")

    cluster = cluster_of.get(pos, [pos])
    clustered = len(cluster) >= 2
    if clustered:
        evid.append(
            f"in a {len(cluster)}-flag window cluster at board positions "
            f"{cluster} — window signature")
    else:
        evid.append(f"isolated at board position {pos}")

    prior_best = None
    for name, pq in priors:
        v = pq.get(q)
        if v and v > 0 and (prior_best is None or v / floor < prior_best[1]):
            prior_best = (name, v / floor)
    if prior_best:
        evid.append(
            f"prior-board min {prior_best[1]:.2f}x ({prior_best[0]})")

    if near_floor_pass:
        cls = "BIMODAL-NOISE"
    elif prior_best and prior_best[1] < NEAR_FLOOR:
        cls = "ENVIRONMENTAL"
    elif clustered:
        # the contiguous-flag window is itself the evidence; confirm
        # the cluster's rows are UNRELATED code before trusting it (a
        # shared-operator regression would also flag adjacent rows)
        cls = "ENVIRONMENTAL"
    else:
        cls = "PERSISTENT"
    line = f"{q} {ratio:.2f}x [{cls}] " + "; ".join(evid)
    adjudication[q] = line
    print(line)

if not flagged:
    print("no flags — nothing to adjudicate")
if write_back and flagged:
    board["adjudication"] = {"threshold": threshold,
                             "drift": drift_line,
                             "rows": adjudication}
    json.dump(board, open(board_path, "w"))
    print(f"\nadjudication embedded in {board_path}")
