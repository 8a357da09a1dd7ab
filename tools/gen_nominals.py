#!/usr/bin/env python3
"""Regenerate BenchNominals.sf01 (per-query clean-run BANDS) from >= 3
clean bench runs.

Usage:
    for i in 1 2 3; do
      SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
        sbt -batch "runMain graft.Bench" 2>/dev/null
    done | python3 tools/gen_nominals.py

Reads every per_query/total JSON pair on stdin (one pair per run),
checks each run was clean (suspect_congestion false — a congested run
must not become the reference), and rewrites the sf01 band map inside
src/main/scala/graft/BenchNominals.scala in place with each query's
(min, max) across the runs. Bench compares its 1.5x congestion triggers
against the band's HIGH edge, so the bands must come from clean runs
only: a congested high edge would blind the trigger.

--allow-suspect skips the cleanliness refusal (for an intentional broad
slowdown that makes the old nominals unreachable — the distributional
trigger would otherwise flag every refresh run). --allow-few accepts
fewer than 3 runs (dev loop); the shipped bands should come from >= 3.
"""
import json
import sys

allow_suspect = "--allow-suspect" in sys.argv[1:]
allow_few = "--allow-few" in sys.argv[1:]

runs = []  # list of (per_query, total) pairs, in stdin order
pending = None
for line in sys.stdin:
    line = line.strip()
    if not line.startswith("{"):
        continue
    try:
        obj = json.loads(line)
    except json.JSONDecodeError:
        continue
    if obj.get("metric") == "per_query":
        pending = obj
    elif obj.get("metric") == "total" and pending is not None:
        runs.append((pending, obj))
        pending = None

if not runs:
    sys.exit("no bench JSON found on stdin (need per_query + total lines)")
if len(runs) < 3 and not allow_few:
    sys.exit(f"refusing: only {len(runs)} run(s) on stdin — bands need >= 3 "
             "clean runs (pass --allow-few for a dev-loop refresh)")
for i, (pq, tot) in enumerate(runs):
    if tot.get("suspect_congestion") and not allow_suspect:
        sys.exit(f"refusing: run {i + 1} flagged suspect_congestion — rerun "
                 "on a quiet host, or pass --allow-suspect after an "
                 "intentional broad slowdown")
    # basename EQUALITY, same rule as BenchNominals.forDir: '.../xsf0.1'
    # is a different dataset whose timings must not become the reference
    sf_base = pq.get("sf", "").rstrip("/").rsplit("/", 1)[-1]
    if sf_base != "sf0.1":
        sys.exit(f"refusing: run {i + 1} was at {pq.get('sf')}, "
                 "nominals are sf0.1")
    bad = {k: v for k, v in pq["queries"].items() if v < 0}
    if bad:
        sys.exit(f"refusing: failed queries in run {i + 1}: {sorted(bad)}")

names = set(runs[0][0]["queries"])
for i, (pq, _) in enumerate(runs[1:], start=2):
    if set(pq["queries"]) != names:
        sys.exit(f"refusing: run {i} has a different query inventory than "
                 "run 1 — regenerate from runs of one build")

bands = {
    n: (min(pq["queries"][n] for pq, _ in runs),
        max(pq["queries"][n] for pq, _ in runs))
    for n in names}

entries = ",\n".join(
    f'    "{n}" -> (({bands[n][0]:.3f}, {bands[n][1]:.3f}))'
    for n in sorted(bands))
block = ("  val sf01: Map[String, (Double, Double)] = Map(\n"
         + entries + ")\n")

path = "src/main/scala/graft/BenchNominals.scala"
with open(path) as fh:
    lines = fh.readlines()
# Locate the block LINE-WISE, bounded to the map itself: the header
# line, then every consecutive entry line ('"name" -> ((lo, hi))').
# This survives arbitrary "->" tokens elsewhere in the file (the old
# rfind("->") end-detection spliced out everything between the map and
# the file's last arrow) and bootstraps a fresh `Map.empty` header.
import re
HDR = "  val sf01: Map[String, (Double, Double)] ="
hdr_idx = [i for i, l in enumerate(lines) if l.startswith(HDR)]
if len(hdr_idx) != 1:
    sys.exit(f"refusing: expected exactly one sf01 header in {path}, "
             f"found {len(hdr_idx)}")
hdr = hdr_idx[0]
entry_re = re.compile(r'^\s*"[^"]+"\s*->\s*\(\(')
end = hdr  # header-only (Map.empty / Map()) bootstrap replaces one line
if "Map(" in lines[hdr] and "()" not in lines[hdr]:
    j = hdr + 1
    while j < len(lines) and entry_re.match(lines[j]):
        j += 1
    if j == hdr + 1:
        sys.exit(f"refusing: sf01 header opens Map( but no entry lines "
                 f"follow at {path}:{hdr + 2}")
    end = j - 1
    if not lines[end].rstrip().endswith("))"):
        sys.exit(f"refusing: last entry line does not close the map at "
                 f"{path}:{end + 1}: {lines[end]!r}")
new = "".join(lines[:hdr]) + block + "".join(lines[end + 1:])
with open(path, "w") as fh:
    fh.write(new)
print(f"wrote {len(bands)} nominal bands from {len(runs)} runs to {path}")
