#!/usr/bin/env python3
"""Synthesize an sf1 fixture (~10x sf0.1) for scaling-curve runs.

/root/testdata tops out at sf0.1, so 100x-scale claims otherwise rest
on plan reading alone. This driver-side script (duckdb + pyarrow, same
toolchain as oracle_check.py) replicates the three engine-heavy tables
10x with structure-preserving perturbation and symlinks the rest:

- documents: doc_id offset per replica; text passed through a
  per-replica lowercase-alphabet rotation. Token/shingle STRUCTURE
  (lengths, whitespace, within-replica near-dup plantings) is
  preserved exactly, while cross-replica shingles never collide - so
  dedup pair counts scale linearly with the corpus instead of
  quadratically with the replica count.
- events: user_id kept (join keys to other tables stay valid); ts
  shifted 40 days per replica so per-user streams become disjoint
  epochs - (user_id, ts) stays unique and sessions never bridge
  replicas; event_id offset keeps global uniqueness.
- embeddings: vec_id offset; vectors unchanged (exact-cosine work is
  inherently quadratic in corpus size - the point of measuring it).

Usage: python3 scripts/gen_sf1.py [OUT_DIR] [REPLICAS]
       (defaults /tmp/sf1, 10 — REPLICAS=3 gives an sf0.3 midpoint
       for 3-point exponent fits)
"""
import os
import string
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
REPLICAS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
ID_STRIDE = 1_000_000
EVENT_ID_STRIDE = 10_000_000
TS_STRIDE_DAYS = 40

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()

lower = string.ascii_lowercase


def rotated(i: int) -> str:
    return lower[i:] + lower[:i]


# --- documents ---------------------------------------------------------
parts = []
for i in range(REPLICAS):
    parts.append(f"""
      SELECT doc_id + {i * ID_STRIDE} AS doc_id,
             translate(text, '{lower}', '{rotated(i)}') AS text,
             lang, source, n_chars
      FROM '{SRC}/documents.parquet'""")
docs = con.execute(" UNION ALL ".join(parts)).arrow()
pq.write_table(docs, f"{OUT}/documents.parquet")
print(f"documents: {docs.num_rows} rows")

# --- events ------------------------------------------------------------
parts = []
for i in range(REPLICAS):
    parts.append(f"""
      SELECT event_id + {i * EVENT_ID_STRIDE} AS event_id,
             ts + INTERVAL {i * TS_STRIDE_DAYS} DAY AS ts,
             user_id, event_type, value, props
      FROM '{SRC}/events.parquet'""")
events = con.execute(" UNION ALL ".join(parts)).arrow()
# the engine's reader requires parquet TIMESTAMP(NANOS) like the
# driver-generated fixtures (QueryDef.events reads nanos-as-long)
schema = pa.schema(
    [
        f if f.name != "ts" else pa.field("ts", pa.timestamp("ns"))
        for f in events.schema
    ]
)
pq.write_table(events.cast(schema), f"{OUT}/events.parquet",
               coerce_timestamps=None)
print(f"events: {events.num_rows} rows")

# --- embeddings --------------------------------------------------------
parts = []
for i in range(REPLICAS):
    parts.append(f"""
      SELECT vec_id + {i * ID_STRIDE} AS vec_id, embedding, label
      FROM '{SRC}/embeddings.parquet'""")
emb = con.execute(" UNION ALL ".join(parts)).arrow()
pq.write_table(emb, f"{OUT}/embeddings.parquet")
print(f"embeddings: {emb.num_rows} rows")

# --- unchanged tables: symlink ----------------------------------------
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem"]:
    dst = f"{OUT}/{t}.parquet"
    if not os.path.exists(dst):
        os.symlink(f"{SRC}/{t}.parquet", dst)
print(f"done -> {OUT}")
