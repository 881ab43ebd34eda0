#!/usr/bin/env python3
"""Adjudicate bench regressions: host drift vs real.

Usage: python3 dev/adjudicate.py BENCH.json [--threshold 2.0] [--no-run]
           [--sfdir /root/testdata/sf0.1] [--out dev/bench_adjiso.json]

Automates what three judges did by hand (rounds 11-13):
 1. parse BASELINE.md's floor table + floor anchors,
 2. compare the artifact's anchor_secs / io_anchor_secs against the
    floors' (elevated anchor = the HOST drifted, not the code),
 3. pick every query reading > threshold x its floor,
 4. unless --no-run, re-measure exactly those via an isolated
    SPARK_GRAFT_BENCH_ONLY pass (min-of-3, double warmup — the
    BASELINE refresh convention),
 5. emit one verdict line per suspect:
      cleared      — isolated reading <= threshold x floor: the full
                     pass's number was contention/drift, floor stands
      REAL         — still > threshold x floor in isolation on a
                     host whose anchors are NOT elevated: a genuine
                     regression (or a floor from a retired host era —
                     adjudicate against the query's own history)
      host-drift   — still > threshold but this host's anchors are
                     elevated vs the floors': normalize, don't chase

The isolated artifact is written to --out so a verdict of "floor is
stale, re-floor" can feed dev/refresh_baseline.py directly.
"""
import json, os, re, subprocess, sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ANCHOR_TOL = 1.15  # anchors within 15% of floor = same host family


def parse_baseline():
    md = open(os.path.join(REPO, "BASELINE.md")).read()
    floors = {}
    for m in re.finditer(r"^\| (\w+) \| ([0-9.]+) \|", md, re.M):
        floors[m.group(1)] = float(m.group(2))
    # \s+ between words: the prose wraps at 72 cols, so "Floor IO
    # anchor" can straddle a line break
    cpu = re.search(r"Floor\s+anchor:\s+([0-9.]+)\s*s", md)
    io = re.search(r"Floor\s+IO\s+anchor:\s+([0-9.]+)\s*s", md)
    return (floors,
            float(cpu.group(1)) if cpu else None,
            float(io.group(1)) if io else None)


def main(argv):
    if not argv or argv[0].startswith("-"):
        sys.exit(__doc__)
    art_path = argv[0]
    opts = argv[1:]
    def opt(name, default):
        if name not in opts:
            return default
        i = opts.index(name) + 1
        if i >= len(opts):
            sys.exit(f"missing value for {name}\n\n{__doc__}")
        return opts[i]
    threshold = float(opt("--threshold", "2.0"))
    sfdir = opt("--sfdir", "/root/testdata/sf0.1")
    out = opt("--out", os.path.join(REPO, "dev", "bench_adjiso.json"))
    no_run = "--no-run" in opts

    art = json.load(open(art_path))
    floors, cpu_floor, io_floor = parse_baseline()
    cpu = art.get("anchor_secs")
    io = art.get("io_anchor_secs")

    def anchor_note(tag, got, floor):
        if got is None or floor is None:
            return f"{tag}: n/a"
        r = got / floor
        state = "ELEVATED" if r > ANCHOR_TOL else "ok"
        return f"{tag}: {got:.3f}s vs floor {floor:.3f}s ({r:.2f}x, {state})"

    print(anchor_note("cpu_anchor", cpu, cpu_floor))
    print(anchor_note("io_anchor", io, io_floor))
    art_drifted = any(
        got is not None and floor is not None and got / floor > ANCHOR_TOL
        for got, floor in ((cpu, cpu_floor), (io, io_floor)))
    if art_drifted:
        print("NOTE: the artifact's host reads slower than the floor host —"
              " expect uniform elevation; only isolated re-measures on a"
              " non-drifted host can call a regression REAL.")

    suspects = []
    failed = []  # outright failures in the full pass are ALSO suspects
    for q, secs in art.get("queries", {}).items():
        f = floors.get(q)
        if secs is None or secs < 0:
            failed.append((q, float("nan"), f or 0.0))
        elif f and secs > threshold * f:
            suspects.append((q, secs, f))
    if failed:
        print(f"{len(failed)} query(ies) FAILED in the full-pass artifact:")
        for q, _, _ in failed:
            print(f"  {q}: failed (secs < 0) — re-measuring in isolation")
    if not suspects and not failed:
        print(f"no query above {threshold}x floor — nothing to adjudicate")
        return 0
    suspects.sort(key=lambda t: -(t[1] / t[2]))
    if suspects:
        print(f"{len(suspects)} suspect(s) above {threshold}x floor:")
        for q, secs, f in suspects:
            print(f"  {q}: {secs:.2f}s vs floor {f:.2f} ({secs / f:.2f}x)")
    if no_run:
        # full-pass failures are real until an isolated run clears them
        return 1 if failed else 0

    names = ",".join(q for q, _, _ in suspects + failed)
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sfdir, SPARK_GRAFT_CPUS="32",
               SPARK_GRAFT_BENCH_ONLY=names, SPARK_GRAFT_BENCH_OUT=out)
    print(f"running isolated pass: SPARK_GRAFT_BENCH_ONLY={names}")
    r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                       cwd=REPO, env=env, capture_output=True, text=True)
    if r.returncode != 0 or not os.path.exists(out):
        print(r.stdout[-2000:])
        print(r.stderr[-2000:], file=sys.stderr)
        sys.exit("isolated bench failed")
    iso = json.load(open(out))
    iso_cpu, iso_io = iso.get("anchor_secs"), iso.get("io_anchor_secs")
    print(anchor_note("iso cpu_anchor", iso_cpu, cpu_floor))
    print(anchor_note("iso io_anchor", iso_io, io_floor))
    iso_drifted = any(
        got is not None and floor is not None and got / floor > ANCHOR_TOL
        for got, floor in ((iso_cpu, cpu_floor), (iso_io, io_floor)))

    real = 0
    for q, _, f in failed:
        got = iso.get("queries", {}).get(q)
        if got is None or got < 0:
            print(f"VERDICT {q}: FAILED in the full pass AND in isolation "
                  "— a real breakage, investigate")
            real += 1
        else:
            print(f"VERDICT {q}: recovered — failed in the full pass but "
                  f"ran {got:.2f}s isolated; transient, but check the "
                  "full-pass stderr for the cause")
    for q, secs, f in suspects:
        got = iso.get("queries", {}).get(q)
        if got is None or got < 0:
            print(f"VERDICT {q}: FAILED in isolation — investigate")
            real += 1
        elif got <= threshold * f:
            print(f"VERDICT {q}: cleared — {got:.2f}s isolated "
                  f"({got / f:.2f}x floor {f:.2f}); full-pass "
                  f"{secs:.2f}s was contention/drift")
        elif iso_drifted:
            print(f"VERDICT {q}: host-drift — {got:.2f}s isolated is "
                  f"{got / f:.2f}x floor but this host's anchors are "
                  f"elevated; normalize before chasing")
        else:
            print(f"VERDICT {q}: REAL — {got:.2f}s isolated "
                  f"({got / f:.2f}x floor {f:.2f}) on a non-drifted host")
            real += 1
    print(f"isolated artifact: {out}")
    return 1 if real else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
