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
    src = fh.read()
start = src.find("  val sf01: Map[String, (Double, Double)] = Map")
if start < 0:
    sys.exit(f"refusing: band map block not found in {path}")
end = src.find(")\n", src.rfind("->"))
if end < 0:
    sys.exit(f"refusing: cannot locate end of band map in {path}")
new = src[:start] + block + src[end + 2:]
with open(path, "w") as fh:
    fh.write(new)
print(f"wrote {len(bands)} nominal bands from {len(runs)} runs to {path}")
