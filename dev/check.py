#!/usr/bin/env python3
"""Local driver-simulator: run graft.Verify via sbt, then replay each
oracle SQL in DuckDB over the same sf dir and compare row-for-row.

Usage: python3 dev/check.py [sfdir] [--skip-verify] [query ...]

This mirrors the real driver's CORRECTNESS gate (sorted columns,
value compare) so mismatches are caught before the round ends.
Dev tooling only — NOT part of the shipped library (which is pure
Scala/Spark; duckdb/pyarrow live only on the driver side).
"""
import json, math, shutil, subprocess, sys, os

# first positional arg is the sf dir only if it IS a directory;
# anything else non-flag is a query-name filter
_pos = [a for a in sys.argv[1:] if not a.startswith("-")]
if _pos and os.path.isdir(_pos[0]):
    SF, ONLY = _pos[0], _pos[1:]
else:
    SF, ONLY = "/root/testdata/sf0.01", _pos
OUT = "/tmp/graft_verify"

fails = 0

if "--skip-verify" not in sys.argv:
    # stale outputs from a previous run would mask a now-failing query
    shutil.rmtree(OUT, ignore_errors=True)
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True)
    tail = "\n".join((r.stdout + r.stderr).splitlines()[-25:])
    if r.returncode != 0:
        print(tail); sys.exit(1)
    for line in (r.stdout + r.stderr).splitlines():
        if "[verify]" in line:
            print(line)
            fails += 1  # a query that threw in Verify is a failure

import duckdb  # noqa: E402

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
# full catalog manifest: a query missing from the output dir (e.g. a
# rows-only query that threw on its FIRST ever run) must fail loudly
try:
    manifest = set(json.load(open(f"{OUT}/queries.json")))
except FileNotFoundError:
    manifest = set(oracle)

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v!r}"
    return str(v)

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
        # The real driver hashes through Arrow, which is TYPE-SENSITIVE:
        # DuckDB widening SUM(int)->HUGEINT vs Spark's int64 parquet is a
        # hash mismatch even when every value agrees (round-1 failure
        # class). Compare declared types, not just values.
        stypes = dict(zip(spark_rel.columns, map(str, spark_rel.types)))
        dtypes = dict(zip(duck_rel.columns, map(str, duck_rel.types)))
        badtypes = [c for c in scols if stypes[c] != dtypes[c]]
        if badtypes:
            detail = ", ".join(
                f"{c}: spark={stypes[c]} duck={dtypes[c]}" for c in badtypes)
            print(f"FAIL {name}: types {detail}")
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

# rows-only queries (no oracle) — driven by the manifest, not by
# whichever output dirs happen to exist
for name in sorted(manifest - set(oracle)):
    if ONLY and name not in ONLY:
        continue
    p = os.path.join(OUT, name)
    try:
        n = con.sql(f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
        print(f"ROWS {name} ({n} rows{'' if n else ' — EMPTY!'})")
        if n == 0:
            fails += 1
    except Exception as e:
        print(f"ERR  {name}: {e}")
        fails += 1

sys.exit(1 if fails else 0)
