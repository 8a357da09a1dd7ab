#!/usr/bin/env python3
"""Regenerate BenchNominals.sf01 from a clean bench run.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      sbt -batch "runMain graft.Bench" 2>/dev/null | python3 tools/gen_nominals.py

Reads the bench's stdout, checks the run was clean (suspect_congestion
false — a congested run must not become the reference), and rewrites the
sf01 map inside src/main/scala/graft/BenchNominals.scala in place.
"""
import json
import re
import sys

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
if total.get("suspect_congestion"):
    sys.exit("refusing: run flagged suspect_congestion — rerun on a quiet host")
if not per_query.get("sf", "").rstrip("/").endswith("sf0.1"):
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
new = re.sub(
    r"  val sf01: Map\[String, Double\] = Map[^\n]*(\n[^\n]*?->[^\n]*)*\n?",
    block, src, count=1)
if new == src and "Map.empty" in src:
    new = src.replace("  val sf01: Map[String, Double] = Map.empty\n", block)
if new == src:
    # the regex matched nothing (formatting drift?) — a silent no-op
    # would leave stale nominals in place while still printing success
    sys.exit(f"refusing: no substitution made in {path} "
             "(map block not found; check the regex against the file)")
with open(path, "w") as fh:
    fh.write(new)
print(f"wrote {len(queries)} nominals to {path}")
