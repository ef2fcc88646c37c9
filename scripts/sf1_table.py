#!/usr/bin/env python3
"""Build the per-entry sf0.1 → sf1 scaling table (VERDICT r13 #1).

Inputs:
  argv[1]  sweep log from `runMain graft.ScaleRehearsal … --all`
           (its final line is the sf1_rehearsal JSON)
  argv[2]  the sf0.1 full-bench artifact (target/bench.json)

Output: a markdown table on stdout, sorted by scaling ratio descending,
plus summary stats. Dev tool only — the shipped library is pure Scala.
"""
import json, re, sys

sweep_log = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_sweep_r14.log"
bench_path = sys.argv[2] if len(sys.argv) > 2 else "target/bench.json"

sf1 = None
for line in open(sweep_log, encoding="utf-8", errors="replace"):
    line = line.strip()
    if line.startswith("[info] "):
        line = line[len("[info] "):]
    if line.startswith('{"metric":"sf1_rehearsal"'):
        sf1 = json.loads(line)
if sf1 is None:
    sys.exit("no sf1_rehearsal JSON line found — sweep not finished?")

base = json.load(open(bench_path))["queries"]
rows = []
for name, cell in sf1["queries"].items():
    s1, n = cell["sec"], cell["rows"]
    s01 = base.get(name)
    ratio = (s1 / s01) if s01 else None
    rows.append((name, s01, s1, ratio, n))

rows.sort(key=lambda r: -(r[3] or 0))
print(f"sweep: {len(rows)} entries; docs={sf1['docs']} embeddings={sf1['embeddings']} events={sf1['events']}")
errs = [r for r in rows if r[4] == -1]
print(f"errors: {len(errs)} {[r[0] for r in errs]}")
total01 = sum(r[1] for r in rows if r[1])
total1 = sum(r[2] for r in rows)
print(f"total sf0.1 (driver r13 run) {total01:.1f}s -> sf1 {total1:.1f}s ({total1/total01:.2f}x at 10x data)\n")
over = [r for r in rows if r[3] and r[1] and r[1] >= 0.15 and r[3] > 10]
print(f">10x rows (sf0.1 >= 0.15s): {len(over)} -> {[r[0] for r in over]}\n")
print("| query | sf0.1 (bench) | sf1 | ratio | note (required when >10×) |")
print("|---|---|---|---|---|")
for name, s01, s1, ratio, n in sorted(rows):
    # a ratio over the fixed per-query overhead floor is noise
    r = f"{ratio:.1f}×" if (ratio and s01 and s01 >= 0.15) else "—"
    s01s = f"{s01:.2f}" if s01 else "—"
    print(f"| {name} | {s01s} | {s1:.2f} | {r} |  |")
