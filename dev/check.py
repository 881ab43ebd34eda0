#!/usr/bin/env python3
"""Local driver-simulator: run graft.Verify via sbt, then replay each
oracle SQL in DuckDB over the same sf dir and compare row-for-row.

Usage: python3 dev/check.py [sfdir] [--skip-verify] [query ...]

This mirrors the real driver's CORRECTNESS gate (sorted columns,
value compare) so mismatches are caught before the round ends.
Dev tooling only — NOT part of the shipped library (which is pure
Scala/Spark; duckdb/pyarrow live only on the driver side).
"""
import json, math, subprocess, sys, os

SF = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "/root/testdata/sf0.01"
OUT = "/tmp/graft_verify"
ONLY = [a for a in sys.argv[2:] if not a.startswith("-")]

if "--skip-verify" not in sys.argv:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True)
    tail = "\n".join((r.stdout + r.stderr).splitlines()[-25:])
    if r.returncode != 0:
        print(tail); sys.exit(1)
    for line in (r.stdout + r.stderr).splitlines():
        if "[verify]" in line:
            print(line)

import duckdb  # noqa: E402

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v!r}"
    return str(v)

fails = 0
for name, sql in sorted(oracle.items()):
    if ONLY and name not in ONLY:
        continue
    try:
        spark_rel = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'")
        duck_rel = con.sql(sql)
        scols = sorted(spark_rel.columns)
        dcols = sorted(duck_rel.columns)
        if scols != dcols:
            print(f"FAIL {name}: columns spark={scols} duck={dcols}")
            fails += 1
            continue
        collist = ", ".join(f'"{c}"' for c in scols)
        srows = con.sql(f"SELECT {collist} FROM spark_rel ORDER BY ALL").fetchall()
        drows = con.sql(f"SELECT {collist} FROM duck_rel ORDER BY ALL").fetchall()
        if len(srows) != len(drows):
            print(f"FAIL {name}: rows spark={len(srows)} duck={len(drows)}")
            fails += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(srows, drows)):
            if tuple(map(canon, a)) != tuple(map(canon, b)):
                bad = (i, a, b)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}\n  spark={bad[1]}\n  duck ={bad[2]}")
            fails += 1
        else:
            print(f"OK   {name} ({len(srows)} rows)")
    except Exception as e:
        print(f"ERR  {name}: {e}")
        fails += 1

# rows-only queries (no oracle)
for d in sorted(os.listdir(OUT)):
    p = os.path.join(OUT, d)
    if os.path.isdir(p) and d not in oracle:
        try:
            n = con.sql(f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
            print(f"ROWS {d} ({n} rows{'' if n else ' — EMPTY!'})")
            if n == 0:
                fails += 1
        except Exception as e:
            print(f"ERR  {d}: {e}")
            fails += 1

sys.exit(1 if fails else 0)
