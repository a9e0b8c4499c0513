#!/usr/bin/env python3
"""graph_cc oracle probe: the standard worlds all yield a ONE-ROW census
(a single giant component at every sf), so the DuckDB differential alone
exercises almost none of the hybrid oracle's structure. This probe builds
an adversarial multi-component co-purchase fixture and proves the shipped
oracle SQL equals a from-scratch union-find on it:

  - a 401-part chain (quotient diameter far beyond the 6 unrolled
    propagation rounds -> the recursive closure tail is load-bearing)
  - a 50-part single-basket clique and two overlapping 10-baskets
  - 30 isolated pair components
  - an over-cap basket (1030 parts, must be EXCLUDED by the <=1024 cap)
    with 5 of its parts rescued into a small basket
  - singleton baskets (untouched vertices, must NOT appear)
  - duplicated (order, part) rows (distinctness)

Usage:
  python3 tools/cc_probe.py <verifyOutDir>   # dir holding oracle_sql.json
  # optional 3-way: if /tmp/cc_probe_world_out/graph_cc/*.parquet exists
  # (produced from THIS probe's fixture via
  #  sbt 'runMain graft.Verify /tmp/cc_probe_world /tmp/cc_probe_world_out
  #  graph_cc'), it is compared too. The Spark dump location is pinned to
  # the fixture's so a dump from some OTHER world can never be compared
  # by mistake (<verifyOutDir> contributes only the oracle SQL).

Writes the fixture to /tmp/cc_probe_world/lineitem.parquet so the Spark
side can be run against it. Dev-only tool; not part of the shipped
library. Exit 0 = oracle matches union-find (and Spark if present).
"""
import glob
import json
import os
import random
import sys
from collections import defaultdict

import duckdb

WORLD = "/tmp/cc_probe_world"


def build_rows():
    rows, o = [], 1
    for i in range(400):                                   # chain: size 401
        rows += [(o, 10000 + i), (o, 10000 + i + 1)]; o += 1
    rows += [(o, 20000 + i) for i in range(50)]; o += 1    # clique: size 50
    rows += [(o, 30000 + i) for i in range(10)]; o += 1    # overlap: size 19
    rows += [(o, 30009 + i) for i in range(10)]; o += 1
    for i in range(30):                                    # 30 x size-2
        rows += [(o, 40000 + 2 * i), (o, 40000 + 2 * i + 1)]; o += 1
    rows += [(o, 90000 + i) for i in range(1030)]; o += 1  # over-cap: dropped
    rows += [(o, 90000 + i) for i in range(5)]; o += 1     # rescue: size 5
    for i in range(7):                                     # singletons
        rows += [(o, 50000 + i)]; o += 1
    rows += [(1, 10000), (1, 10001)]                       # duplicate rows
    random.Random(13).shuffle(rows)
    return rows


def union_find_census(rows):
    baskets = defaultdict(set)
    for ok, pk in rows:
        baskets[ok].add(pk)
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    touched = set()
    for ps in baskets.values():
        ps = sorted(ps)
        if not 2 <= len(ps) <= 1024:
            continue
        touched.update(ps)
        for p in ps[1:]:
            parent[find(p)] = find(ps[0])
    comp = defaultdict(int)
    for p in touched:
        comp[find(p)] += 1
    census = defaultdict(int)
    for c in comp.values():
        census[c] += 1
    return sorted(census.items())


def main(verify_out):
    rows = build_rows()
    os.makedirs(WORLD, exist_ok=True)
    con = duckdb.connect()
    con.execute("CREATE TABLE li (l_orderkey BIGINT, l_partkey BIGINT)")
    con.executemany("INSERT INTO li VALUES (?, ?)", rows)
    con.execute(f"COPY li TO '{WORLD}/lineitem.parquet' (FORMAT PARQUET)")

    expected = union_find_census(rows)
    sql = json.load(open(f"{verify_out}/oracle_sql.json"))["graph_cc"]
    ora = duckdb.connect()
    ora.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{WORLD}/lineitem.parquet')")
    got = [tuple(r) for r in ora.sql(sql).fetchall()]
    print(f"union-find: {expected}")
    print(f"oracle    : {got}")
    assert got == expected, "graph_cc oracle diverges from union-find"

    spark_files = glob.glob(f"{WORLD}_out/graph_cc/*.parquet")
    if spark_files:
        sp = [tuple(r) for r in duckdb.sql(
            f"SELECT * FROM read_parquet('{spark_files[0]}') ORDER BY n_members"
        ).fetchall()]
        print(f"spark     : {sp}")
        assert sp == expected, "Spark graph_cc diverges from union-find"
    else:
        print(f"(no Spark dump at {WORLD}_out/graph_cc — 2-way check only; "
              f"run: sbt 'runMain graft.Verify {WORLD} {WORLD}_out graph_cc')")
    print("cc_probe OK")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/gate_vout")
