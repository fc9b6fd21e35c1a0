#!/usr/bin/env python3
"""Rewrite every bench number quoted in PLANS.md from bench_out.json.

PLANS.md narrates the plan audit; its numbers must be byte-derived from
the committed bench artifact, not hand-copied (round 4/5 both drifted:
doc said 49.6 s while the artifact said 51.5 s). This script is the only
sanctioned way to put timings into PLANS.md:

    python3 tools/sync_plans.py [bench_out.json]

It rewrites, in place:
  - every `x_name (T s, spread [a, b, c])` and bare `x_name (T s)`
    mention, from `queries` / `spread`;
  - the `Total: T s across N queries, E errors` headline;
  - the `Index builds (pre-bench, ...)` line, from `index_build_sec`.
Query names present in the doc but absent from the artifact are left
untouched (and reported), so a renamed query can't silently keep a
stale number.
"""
import json
import re
import sys

ARTIFACT = sys.argv[1] if len(sys.argv) > 1 else "bench_out.json"
bench = json.load(open(ARTIFACT))
queries = bench["queries"]
spread = bench.get("spread", {})
md = open("PLANS.md").read()

stale = set()


def fmt(x):
    return f"{x:.2f}"


def repl_spread(m):
    name = m.group(1)
    if name not in queries or name not in spread:
        stale.add(name)
        return m.group(0)
    s = spread[name]
    return (f"{name} ({fmt(queries[name])} s, "
            f"spread [{fmt(s[0])}, {fmt(s[1])}, {fmt(s[2])}])")


def repl_bare(m):
    name = m.group(1)
    if name not in queries:
        stale.add(name)
        return m.group(0)
    return f"{name} ({fmt(queries[name])} s)"


md = re.sub(r"(x_[a-z0-9_]+) \([0-9.]+ s, spread \[[0-9., ]+\]\)",
            repl_spread, md)
md = re.sub(r"(x_[a-z0-9_]+) \([0-9.]+ s\)", repl_bare, md)

n, errs = len(queries), len(bench.get("errors", {}))
md = re.sub(
    r"Total: [0-9.]+ s across \d+ queries, \d+ errors",
    f"Total: {bench['value']:.1f} s across {n} queries, {errs} errors",
    md)

ib = bench.get("index_build_sec", {})
ib_line = ("Index builds (pre-bench, excluded from the per-query serve "
           "timings): " + ", ".join(
               f"{k} {fmt(v)} s" for k, v in sorted(ib.items())) + "."
           if ib else
           "Index builds (pre-bench, excluded from the per-query serve "
           "timings): none — warm indexes reused.")
if re.search(r"^Index builds \(pre-bench.*$", md, flags=re.M):
    md = re.sub(r"^Index builds \(pre-bench.*$", ib_line, md, flags=re.M)

open("PLANS.md", "w").write(md)
print(f"PLANS.md synced from {ARTIFACT}: total {bench['value']:.1f} s, "
      f"{n} queries, {errs} errors")
if stale:
    print("WARNING: doc mentions queries absent from the artifact: "
          + ", ".join(sorted(stale)))
