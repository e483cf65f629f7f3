#!/usr/bin/env python3
"""Build the sf1-ish scale-probe fixture (VERDICT r8 #5).

Replicates the sf0.1 fact tables ~10x with id offsets so per-query
sf0.1 -> sf1 scaling exponents can be measured locally. Replication is
content-aware so the probe measures PLAN scaling, not fixture
pathology:

- lineitem/orders: replica i offsets l_orderkey/o_orderkey by
  i * (max+1) in lockstep, so the order join keeps its 1:n shape and
  basket/graph rows see 10x real baskets.
- events: event_id offset; users/timestamps unchanged (SCD2 history
  gets 10x the change pressure per user — the write-amplification
  case).
- documents: replica i prefixes every token with r<i>, so each replica
  keeps the ORIGINAL near-dup structure internally but shares no
  shingles across replicas (10x corpus = 10x novel vocabulary, the
  realistic growth mode). Naive copying would make every replica pair
  an exact dup and near-dup pair counts would grow 100x by
  construction.
- embeddings: replica i cyclically rotates the 64 dims by 7*i: all
  within-replica inner products are preserved EXACTLY (same near-dup
  geometry), cross-replica cosines decorrelate to ~N(0, 1/64) noise.
  Labels/queries unchanged.

Usage: python3 tools/make_scale_fixture.py [src_sf_dir] [out_dir] [replicas]
Defaults: /root/testdata/sf0.1 /tmp/graft_sf1 10
"""
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10

import os

os.makedirs(out, exist_ok=True)
con = duckdb.connect()
con.execute("SET threads TO 16")

copy_verbatim = ["region", "nation", "customer", "supplier", "part"]
for t in copy_verbatim:
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    print(f"copied {t}")

okey = con.execute(
    f"SELECT MAX(o_orderkey) + 1 FROM read_parquet('{src}/orders.parquet')").fetchone()[0]
con.execute(f"""
COPY (
  SELECT o_orderkey + i * {okey} AS o_orderkey, COLUMNS(c -> c <> 'o_orderkey')
  FROM read_parquet('{src}/orders.parquet'), range({reps}) r(i)
) TO '{out}/orders.parquet' (FORMAT PARQUET)""")
con.execute(f"""
COPY (
  SELECT l_orderkey + i * {okey} AS l_orderkey, COLUMNS(c -> c <> 'l_orderkey')
  FROM read_parquet('{src}/lineitem.parquet'), range({reps}) r(i)
) TO '{out}/lineitem.parquet' (FORMAT PARQUET)""")
print("replicated orders + lineitem")

ekey = con.execute(
    f"SELECT MAX(event_id) + 1 FROM read_parquet('{src}/events.parquet')").fetchone()[0]
con.execute(f"""
COPY (
  SELECT event_id + i * {ekey} AS event_id, COLUMNS(c -> c <> 'event_id')
  FROM read_parquet('{src}/events.parquet'), range({reps}) r(i)
) TO '{out}/events.parquet' (FORMAT PARQUET)""")
print("replicated events")

dkey = con.execute(
    f"SELECT MAX(doc_id) + 1 FROM read_parquet('{src}/documents.parquet')").fetchone()[0]
con.execute(f"""
COPY (
  SELECT doc_id + i * {dkey} AS doc_id,
    CASE WHEN i = 0 THEN text
         ELSE 'r' || i || ' ' || replace(text, ' ', ' r' || i || ' ') END AS text,
    COLUMNS(c -> c NOT IN ('doc_id', 'text'))
  FROM read_parquet('{src}/documents.parquet'), range({reps}) r(i)
) TO '{out}/documents.parquet' (FORMAT PARQUET)""")
print("replicated documents (token-prefixed per replica)")

vkey = con.execute(
    f"SELECT MAX(vec_id) + 1 FROM read_parquet('{src}/embeddings.parquet')").fetchone()[0]
con.execute(f"""
COPY (
  SELECT vec_id + i * {vkey} AS vec_id,
    CASE WHEN i = 0 THEN embedding
         ELSE list_concat(embedding[((7 * i) % 64) + 1:64],
                          embedding[1:((7 * i) % 64)]) END AS embedding,
    label
  FROM read_parquet('{src}/embeddings.parquet'), range({reps}) r(i)
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
print("replicated embeddings (dim-rotated per replica)")

for t in ["orders", "lineitem", "events", "documents", "embeddings"]:
    n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {n} rows")
