#!/usr/bin/env python3
"""Layout-invariance differential: compare two graft.Verify dumps that
were produced from the SAME logical data in DIFFERENT physical layouts
(standard fixture vs tools LayoutWorld's 7-file hash-scrambled rewrite).

For every query present in both dumps, the row MULTISETS must be
bit-equal (floats compared by bits, like check.py): the engines-agree
differentials cannot see layout sensitivity because both engines read
whatever layout the world has — this check is Spark-vs-Spark and pins
the production property that re-ingesting / compacting a 100 TB table
never changes any query's answer.

Queries whose CONTRACT is only ε-approximate under physical reorder are
declared in SENSITIVE below and reported as `NOTE` instead of `FAIL`
(they may or may not diverge at a given scale); anything else that
diverges is a real nondeterminism bug.

Usage: python3 tools/layout_check.py <standardVerifyOut> <layoutVerifyOut>
Exit 0 = no unexpected divergence. Dev-only tool.
"""
import glob
import math
import os
import sys

import duckdb

# Declared layout-sensitive contracts (merge-order-dependent sketches /
# float-iterative internals). Everything NOT listed must be bit-stable.
SENSITIVE = {
    # Greenwald-Khanna percentile summaries are merge-order-dependent
    "agg_percentile_approx",
    # (text_hot_tokens was here — the original layout-sweep run caught
    # its raw Misra-Gries estimates diverging, and the fix promoted it
    # to candidate+exact-verify: now bit-stable AND oracled)
    # float centroid sums: partitioning moves the addition order
    "embed_kmeans", "embed_pca", "embed_semdedup", "pipeline_curate_embed",
    "sim_search_ivf", "sim_search_pq", "sim_knn_join_ann",
    # rerank consumes the LSH shortlist whose k-th tie may flip
    "sim_search_rerank",
}


def canon(v):
    if isinstance(v, float):
        return ("f", 1, 0.0) if math.isnan(v) else ("f", 0, v)
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    return v


def rows_of(path):
    files = sorted(glob.glob(f"{path}/*.parquet"))
    if not files:
        return None
    rel = duckdb.sql(f"SELECT * FROM read_parquet({files!r})")
    cols = list(rel.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(canon(r[i]) for i in order) for r in rel.fetchall()),
        key=lambda row: tuple((v is None, str(type(v)), v) for v in row))


def main(std_dir, lay_dir):
    names = sorted(d for d in os.listdir(std_dir)
                   if os.path.isdir(f"{std_dir}/{d}")
                   and os.path.isdir(f"{lay_dir}/{d}"))
    n_eq = n_note = n_fail = 0
    for name in names:
        a, b = rows_of(f"{std_dir}/{name}"), rows_of(f"{lay_dir}/{name}")
        if a is None or b is None:
            print(f"FAIL  {name}: missing parquet on one side"); n_fail += 1
            continue
        if a == b:
            tag = "EQ   " if name not in SENSITIVE else "EQ*  "
            print(f"{tag} {name} ({len(a)} rows)"); n_eq += 1
        elif name in SENSITIVE:
            print(f"NOTE  {name}: declared layout-sensitive, differs "
                  f"({len(a)} vs {len(b)} rows)"); n_note += 1
        else:
            bad = next((i for i, (x, y) in enumerate(zip(a, b)) if x != y),
                       min(len(a), len(b)))
            print(f"FAIL  {name}: layout changed the answer — first diff "
                  f"at sorted row {bad}:")
            print(f"      std   : {a[bad] if bad < len(a) else '<absent>'}")
            print(f"      layout: {b[bad] if bad < len(b) else '<absent>'}")
            n_fail += 1
    print(f"\n{n_eq} bit-equal, {n_note} declared-sensitive diffs, "
          f"{n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
