#!/usr/bin/env python3
"""Diff two Bench JSON files (graft.Bench output) per query.

Usage: python3 tools/bench_compare.py OLD.json NEW.json [threshold_sec]

Prints queries added/removed and any query whose time moved more than
threshold_sec (default 0.5 s — the documented single-JVM noise floor
for non-streaming queries). Exit code 1 if any regression exceeds the
threshold, so it can gate CI.
"""
import json
import sys

old_path, new_path = sys.argv[1], sys.argv[2]
thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 0.5
old = json.load(open(old_path))["queries"]
new = json.load(open(new_path))["queries"]

added = sorted(set(new) - set(old))
removed = sorted(set(old) - set(new))
if added:
    print(f"added ({len(added)}):", ", ".join(f"{k}={new[k]:.2f}s" for k in added))
if removed:
    print(f"removed ({len(removed)}):", ", ".join(removed))

shared = sorted(set(old) & set(new), key=lambda k: new[k] - old[k], reverse=True)
regressions = []
for k in shared:
    d = new[k] - old[k]
    if abs(d) > thresh:
        tag = "SLOWER" if d > 0 else "faster"
        print(f"{tag:7} {k:28} {old[k]:7.2f} -> {new[k]:7.2f}  ({d:+.2f}s)")
        if d > 0:
            regressions.append(k)

t_old = sum(old[k] for k in shared)
t_new = sum(new[k] for k in shared)
print(f"shared-query total: {t_old:.1f}s -> {t_new:.1f}s "
      f"({t_new - t_old:+.1f}s over {len(shared)} queries)")
sys.exit(1 if regressions else 0)
