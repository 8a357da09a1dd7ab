#!/usr/bin/env python3
"""Regenerate BenchNominals.sf01 from a clean bench run.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      sbt -batch "runMain graft.Bench" 2>/dev/null | python3 tools/gen_nominals.py

Reads the bench's stdout, checks the run was clean (suspect_congestion
false — a congested run must not become the reference), and rewrites the
sf01 map inside src/main/scala/graft/BenchNominals.scala in place.

--allow-suspect skips the cleanliness refusal. It exists for the one
legitimate case the flag cannot distinguish from congestion: a change
that INTENTIONALLY makes many queries slower also trips the
distributional trigger (uniformlySlow) on every run, so the stale-fast
nominals could never be refreshed through this script without an
escape hatch. Use it only after confirming the run was quiet.
"""
import json
import re
import sys

allow_suspect = "--allow-suspect" in sys.argv[1:]

per_query = None
total = None
for line in sys.stdin:
    line = line.strip()
    if not line.startswith("{"):
        continue
    try:
        obj = json.loads(line)
    except json.JSONDecodeError:
        continue
    if obj.get("metric") == "per_query":
        per_query = obj
    elif obj.get("metric") == "total":
        total = obj

if per_query is None or total is None:
    sys.exit("no bench JSON found on stdin (need per_query + total lines)")
if total.get("suspect_congestion") and not allow_suspect:
    sys.exit("refusing: run flagged suspect_congestion — rerun on a quiet "
             "host, or pass --allow-suspect after an intentional broad "
             "slowdown made the old nominals unreachable")
# basename EQUALITY, same rule as BenchNominals.forDir: '.../xsf0.1' is
# a different dataset whose timings must not become the sf0.1 reference
sf_base = per_query.get("sf", "").rstrip("/").rsplit("/", 1)[-1]
if sf_base != "sf0.1":
    sys.exit(f"refusing: run was at {per_query.get('sf')}, nominals are sf0.1")

queries = per_query["queries"]
bad = {k: v for k, v in queries.items() if v < 0}
if bad:
    sys.exit(f"refusing: failed queries in the run: {sorted(bad)}")

entries = ",\n".join(
    f'    "{name}" -> {queries[name]:.3f}' for name in sorted(queries))
block = "  val sf01: Map[String, Double] = Map(\n" + entries + ")\n"

path = "src/main/scala/graft/BenchNominals.scala"
with open(path) as fh:
    src = fh.read()
# subn, not "new == src": an idempotent rerun regenerating byte-identical
# nominals is a success, while a zero-match regex is the failure — the
# two are indistinguishable by comparing output to input
new, n_subs = re.subn(
    r"  val sf01: Map\[String, Double\] = Map[^\n]*(\n[^\n]*?->[^\n]*)*\n?",
    block, src, count=1)
if n_subs == 0 and "Map.empty" in src:
    new = src.replace("  val sf01: Map[String, Double] = Map.empty\n", block)
    n_subs = 1 if new != src else 0
if n_subs == 0:
    sys.exit(f"refusing: no substitution made in {path} "
             "(map block not found; check the regex against the file)")
with open(path, "w") as fh:
    fh.write(new)
print(f"wrote {len(queries)} nominals to {path}")
