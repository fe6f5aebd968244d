#!/usr/bin/env python3
"""Generate golden fixtures for the Scala SequenceMatcher port from the
real CPython difflib (the reference's exact dependency). Deterministic
(seed 42). Output: src/test/resources/lcs_golden.jsonl — one case per
line: {a, b, blocks, opcodes, equal_runs_min4}.
"""
import difflib
import json
import random

random.seed(42)
VOCAB = [f"w{i}" for i in range(30)]
cases = []

# hand-picked edge cases
cases += [
    ([], []),
    (["a"], []),
    ([], ["a"]),
    (["a", "b", "c"], ["a", "b", "c"]),
    (["a", "b", "c"], ["x", "y", "z"]),
    (["a", "a", "a", "a"], ["a", "a"]),
    (["a", "b", "a", "b", "a"], ["b", "a", "b"]),
    (["x", "a", "b", "c", "y"], ["a", "b", "c"]),
    (["a", "b", "c", "a", "b", "c"], ["a", "b", "c"]),
    (["t", "t", "t", "a", "t"], ["t", "a", "t", "t", "t"]),
]

# random word streams with scripted edits (mirrors FIXTURES.md A2 fake-ASR)
for trial in range(120):
    n = random.randint(1, 80)
    a = [random.choice(VOCAB) for _ in range(n)]
    b = list(a)
    for _ in range(random.randint(0, n // 3 + 1)):
        op = random.choice(["drop", "ins", "sub"])
        if not b:
            break
        i = random.randrange(len(b))
        if op == "drop":
            del b[i]
        elif op == "ins":
            b.insert(i, random.choice(VOCAB))
        else:
            b[i] = random.choice(VOCAB)
    cases.append((a, b))

# highly repetitive streams (stress tie-breaking)
for trial in range(30):
    n = random.randint(5, 60)
    a = [random.choice(VOCAB[:3]) for _ in range(n)]
    b = [random.choice(VOCAB[:3]) for _ in range(random.randint(1, 60))]
    cases.append((a, b))

out = []
for a, b in cases:
    sm = difflib.SequenceMatcher(None, a, b, autojunk=False)
    blocks = [[m.a, m.b, m.size] for m in sm.get_matching_blocks()]
    ops = [[t, i1, i2, j1, j2] for t, i1, i2, j1, j2 in sm.get_opcodes()]
    runs = [[i1, i2, j1, j2] for t, i1, i2, j1, j2 in sm.get_opcodes()
            if t == "equal" and i2 - i1 >= 4]
    out.append(json.dumps({"a": a, "b": b, "blocks": blocks,
                           "opcodes": ops, "equal_runs_min4": runs}))

path = "src/test/resources/lcs_golden.jsonl"
with open(path, "w") as f:
    f.write("\n".join(out) + "\n")
print(f"wrote {len(out)} cases to {path}")
