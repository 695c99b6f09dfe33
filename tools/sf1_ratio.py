#!/usr/bin/env python3
"""Join two solo Bench JSON lines (sf0.1 and sf1) into the per-query
scale-ratio table for BASELINE.md: every query >= a floor at sf0.1
(cold-JIT noise dominates below it), ratio = sf1/sf0.1, ranked
worst-first. Dev tool only.

Usage: sf1_ratio.py <bench_sf01.json> <bench_sf1.json> [floor_sec=1.0]
"""
import json
import sys


def load(path):
    for line in open(path):
        # tolerate sbt's "[info] " prefix on the bench line
        i = line.find('{')
        if i < 0:
            continue
        # a brace on a non-JSON log line (e.g. "[error] ... {stack}")
        # must not abort the scan
        try:
            d = json.loads(line[i:].strip())
        except json.JSONDecodeError:
            continue
        if 'queries' in d:
            return d['queries'], d.get('total', d.get('value'))
    raise SystemExit(f'no bench JSON line in {path}')


q01, t01 = load(sys.argv[1])
q1, t1 = load(sys.argv[2])
floor = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0

rows = []
for name, s01 in q01.items():
    if name in q1 and s01 >= floor:
        rows.append((q1[name] / s01, name, s01, q1[name]))
rows.sort(reverse=True)

print(f'| query | sf0.1 s | sf1 s | ratio |')
print(f'|---|---|---|---|')
for r, name, a, b in rows:
    print(f'| {name} | {a:.2f} | {b:.2f} | {r:.2f}x |')
n_all = len(set(q01) & set(q1))
sub = [x for x in rows if x[0] <= 2.5]
print()
print(f'-- {len(rows)} queries >= {floor}s at sf0.1 (of {n_all} shared); '
      f'{len(rows) - len(sub)} above 2.5x; '
      f'totals {t01:.1f}s -> {t1:.1f}s ({t1 / t01:.2f}x at 10x data)')
