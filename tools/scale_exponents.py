#!/usr/bin/env python3
"""Scale-growth analysis: per-query scaling exponents between two
BENCH_FULL.json runs at different scale factors.

Usage: python3 tools/scale_exponents.py <bench_small.json> <bench_big.json> <size_ratio>

exponent = log(t_big / t_small) / log(size_ratio)
  ~0   = constant (startup/model-sized work dominates)
  ~1   = linear — the target for scan/agg/join families
  >1.3 = superlinear — investigate

Queries faster than FLOOR seconds at BOTH scales are classed
'sub-floor' (fixed overhead dominates; exponent meaningless).
Dev-only tool; not part of the shipped library.
"""
import json, math, sys

FLOOR = 0.6

def main(small_p, big_p, ratio):
    small = json.load(open(small_p)); big = json.load(open(big_p))
    qs, qb = small["queries"], big["queries"]
    rows = []
    for name in sorted(qs):
        if name not in qb:
            continue
        ts, tb = qs[name], qb[name]
        exp = math.log(tb / ts) / math.log(ratio)
        cls = "sub-floor" if (ts < FLOOR and tb < FLOOR) else (
            "SUPER" if exp > 1.3 else ("linear" if exp > 0.55 else "sublinear"))
        rows.append((name, ts, tb, exp, cls))
    rows.sort(key=lambda r: -r[3])
    print(f"{'query':30s} {'t_small':>8s} {'t_big':>8s} {'exp':>6s}  class")
    for name, ts, tb, exp, cls in rows:
        print(f"{name:30s} {ts:8.2f} {tb:8.2f} {exp:6.2f}  {cls}")
    tot_s, tot_b = small["value"], big["value"]
    print(f"\ntotal: {tot_s:.1f}s -> {tot_b:.1f}s  "
          f"exp={math.log(tot_b/tot_s)/math.log(ratio):.2f}")
    flagged = [r for r in rows if r[4] == "SUPER"]
    print(f"superlinear (> x^1.3, above floor): {len(flagged)}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], float(sys.argv[3]))
