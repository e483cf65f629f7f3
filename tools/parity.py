#!/usr/bin/env python3
"""Local dev harness emulating the driver's DuckDB-oracle compare.

NOT part of the engine (the engine is pure Scala/Spark). This mirrors what
the driver does per round: run graft.Verify at sf0.01, then execute each
oracle_sql.json entry in DuckDB 1.0.0 against the same parquet tables and
compare (columns sorted by name, then row-by-row value compare).

Usage:
    python3 tools/parity.py [outDir] [sfDir] [--skip-verify] [only_query ...]
"""
import json
import math
import subprocess
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def run_verify(sf_dir: str, out_dir: str) -> None:
    cmd = ["sbt", f'runMain graft.Verify {sf_dir} {out_dir}']
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True)
    tail = (r.stdout + r.stderr)[-3000:]
    if r.returncode != 0:
        print(tail)
        sys.exit(f"verify failed rc={r.returncode}")
    for line in (r.stdout + r.stderr).splitlines():
        if "[verify]" in line:
            print(line)


def norm(v, col_type: str):
    """Normalize a cell for comparison: decimals/floats → canonical string."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    # decimal.Decimal, timestamps, ints, strs compare naturally via str()
    return str(v)


def compare(name: str, sql: str, out_dir: str, con) -> tuple[bool, str]:
    spark_path = Path(out_dir) / name
    files = list(spark_path.glob("*.parquet"))
    if not files:
        return False, "no spark output"
    got = con.execute(f"SELECT * FROM read_parquet('{files[0]}')")
    got_cols = [d[0] for d in got.description]
    got_rows = got.fetchall()
    try:
        exp = con.execute(sql)
    except Exception as e:
        return False, f"oracle SQL error: {e}"
    exp_cols = [d[0] for d in exp.description]
    exp_rows = exp.fetchall()
    if sorted(got_cols) != sorted(exp_cols):
        return False, f"columns differ: spark={sorted(got_cols)} duckdb={sorted(exp_cols)}"
    if len(got_rows) != len(exp_rows):
        return False, f"row count: spark={len(got_rows)} duckdb={len(exp_rows)}"
    g_ix = [got_cols.index(c) for c in sorted(got_cols)]
    e_ix = [exp_cols.index(c) for c in sorted(exp_cols)]
    for rn, (gr, er) in enumerate(zip(got_rows, exp_rows)):
        for gi, ei in zip(g_ix, e_ix):
            gv, ev = norm(gr[gi], ""), norm(er[ei], "")
            if gv != ev:
                col = sorted(got_cols)[g_ix.index(gi)]
                return False, f"row {rn} col {col}: spark={gv!r} duckdb={ev!r}"
    return True, f"{len(got_rows)} rows"


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_dir = args[0] if len(args) > 0 else "/tmp/verify_out"
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
    only = set(args[2:])
    if "--skip-verify" not in sys.argv:
        run_verify(sf_dir, out_dir)
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    ok = bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        good, msg = compare(name, sql, out_dir, con)
        print(f"{'PASS' if good else 'FAIL'}  {name}: {msg}")
        ok += good
        bad += not good
    # declared queries without oracle = property-tested rows; report presence
    declared = {p.name for p in Path(out_dir).iterdir() if p.is_dir()}
    no_oracle = declared - set(oracle)
    if no_oracle:
        print(f"no-oracle (property-tested): {sorted(no_oracle)}")
    print(f"== {ok} pass / {bad} fail ==")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
