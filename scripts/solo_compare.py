#!/usr/bin/env python3
"""Compare two solo-bench baselines (see solo_bench.py) and flag true
regressions: queries slower than RATIO x (default 2.0) solo-vs-solo.

Usage: python3 scripts/solo_compare.py <old.json> <new.json> [ratio]
Exit 1 if any regression crosses the ratio.
"""
import json, sys

old = json.load(open(sys.argv[1]))["queries_ms"]
new = json.load(open(sys.argv[2]))["queries_ms"]
ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0

regressions, broken = [], []
for name in sorted(set(old) & set(new)):
    a, b = old[name], new[name]
    if a > 0 and b <= 0:
        # the worst regression class: the query no longer runs at all
        broken.append(name)
    elif a > 0 and b > 0 and b >= a * ratio:
        regressions.append((b / a, name, a, b))
for name in sorted(set(new) - set(old)):
    print(f"NEW   {name}: {new[name]:.0f} ms (no baseline)")
for name in sorted(set(old) - set(new)):
    print(f"GONE  {name} (was {old[name]:.0f} ms)")

for name in broken:
    print(f"BROKEN {name}: was {old[name]:.0f} ms, now fails (-1)")
for r, name, a, b in sorted(regressions, reverse=True):
    print(f"REGRESSION {name}: {a:.0f} -> {b:.0f} ms ({r:.1f}x)")
if not regressions and not broken:
    print(f"no regressions >= {ratio}x across {len(set(old) & set(new))} shared queries")
sys.exit(1 if (regressions or broken) else 0)
