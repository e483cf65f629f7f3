#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/parity.py [sfDir] [outDir] [--no-verify] [only_query ...]

1. Runs `sbt "runMain graft.Verify <sfDir> <outDir>"` (unless --no-verify).
2. Loads <outDir>/oracle_sql.json.
3. For each query with an oracle: runs the SQL in DuckDB against views over
   the sfDir parquet tables, reads the Spark result parquet, sorts columns
   by name on both sides, and compares row-by-row.

This is a pre-flight check only — the driver's own compare is authoritative.
"""
import json
import math
import subprocess
import sys
from decimal import Decimal
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def connect(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def norm(v):
    if isinstance(v, Decimal):
        return ("num", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("num", Decimal(repr(v)))
    if isinstance(v, int):
        return ("num", Decimal(v))
    if isinstance(v, (list, tuple)):
        return ("list", tuple(norm(x) for x in v))
    if isinstance(v, dict):
        return ("map", tuple(sorted((k, norm(x)) for k, x in v.items())))
    return (type(v).__name__, v)


def compare(name: str, spark_rows, spark_cols, duck_rows, duck_cols):
    sc, dc = sorted(spark_cols), sorted(duck_cols)
    if sc != dc:
        return f"SCHEMA: spark={sc} duck={dc}"
    if len(spark_rows) != len(duck_rows):
        return f"ROWS: spark={len(spark_rows)} duck={len(duck_rows)}"
    s_ix = [spark_cols.index(c) for c in sc]
    d_ix = [duck_cols.index(c) for c in sc]
    for i, (sr, dr) in enumerate(zip(spark_rows, duck_rows)):
        for cs, cd, col in zip(s_ix, d_ix, sc):
            a, b = norm(sr[cs]), norm(dr[cd])
            if a != b:
                return (f"VALUE row {i} col {col}: spark={sr[cs]!r} duck={dr[cd]!r}")
    return None


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    out_dir = args[1] if len(args) > 1 else "/tmp/parity_out"
    only = set(args[2:])

    if "--no-verify" not in flags:
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {sf_dir} {out_dir}'],
            capture_output=True, text=True, cwd="/root/repo")
        if r.returncode != 0:
            print(r.stdout[-3000:])
            print(r.stderr[-3000:])
            sys.exit(1)
        for line in r.stdout.splitlines():
            if "[verify]" in line:
                print(line)

    oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    con = connect(sf_dir)
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_glob = f"{out_dir}/{name}/*.parquet"
        try:
            srel = con.execute(f"SELECT * FROM read_parquet('{spark_glob}')")
            spark_cols = [d[0] for d in srel.description]
            spark_rows = srel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            drel = con.execute(sql)
            duck_cols = [d[0] for d in drel.description]
            duck_rows = drel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        diff = compare(name, spark_rows, spark_cols, duck_rows, duck_cols)
        if diff:
            print(f"FAIL {name}: {diff}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
