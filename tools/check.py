#!/usr/bin/env python3
"""Local replica of the driver's DuckDB differential check.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers the fixture tables from
<sfDir> as DuckDB views, runs each oracle, and compares against the
Spark parquet dump in <verifyOutDir>/<name>/. Comparison: sort columns
by name, then exact value equality row-by-row (floats compared by bits)
— stricter than any plausible driver hash, so passing here is safe.

Dev-only tool; not part of the shipped library.
"""
import json, math, sys, glob, os

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        return ("f", math.nan if math.isnan(v) else v)
    return v


def rows_of(cur):
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = cur.fetchall()
    return [cols[i] for i in order], [tuple(canon(r[i]) for i in order) for r in data]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    n_pass = n_fail = n_noracle = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no spark output parquet"); n_fail += 1
            continue
        got_cols, got = rows_of(con.execute(
            f"SELECT * FROM read_parquet('{files[0]}')"))
        if name not in oracle:
            print(f"SKIP  {name}: no oracle ({len(got)} rows)"); n_noracle += 1
            continue
        try:
            exp_cols, exp = rows_of(con.execute(oracle[name]))
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}"); n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL  {name}: columns {got_cols} != {exp_cols}"); n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL  {name}: rows {len(got)} != {len(exp)}"); n_fail += 1
            continue
        bad = next((i for i, (g, e) in enumerate(zip(got, exp)) if g != e), None)
        if bad is not None:
            print(f"FAIL  {name}: first diff at row {bad}:")
            print(f"      spark : {got[bad]}")
            print(f"      duckdb: {exp[bad]}")
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(got)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} no-oracle")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
