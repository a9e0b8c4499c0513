#!/usr/bin/env python3
"""Local replica of the driver's DuckDB differential check.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [--unordered]

Reads <verifyOutDir>/oracle_sql.json, registers the fixture tables from
<sfDir> as DuckDB views, runs each oracle, and compares against the
Spark parquet dump in <verifyOutDir>/<name>/. Comparison: sort columns
by name, then exact value equality row-by-row (floats compared by bits)
— stricter than any plausible driver hash, so passing here is safe.

--unordered compares rows as multisets instead of in emitted order.
Used by the null-world differential (NullWorld fixtures plant NULLs in
columns many queries ORDER BY, and the engines disagree on default
null placement: Spark ASC = NULLS FIRST, DuckDB ASC = NULLS LAST — a
presentation difference, not a value-semantics one). The driver's own
check always runs ordered, on the standard world.

Dev-only tool; not part of the shipped library.
"""
import json, math, sys, glob, os

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        # NaN canonicalizes to a sortable MARKER, not float('nan'):
        # nan != nan, so a query where BOTH engines emit NaN would
        # spuriously fail equality (and unordered-mode sorting would be
        # unstable). The rank element keeps NaN comparable to reals.
        return ("f", 1, 0.0) if math.isnan(v) else ("f", 0, v)
    return v


# DuckDB result types the driver's hash is known to agree with Spark on.
# Anything else (HUGEINT from an uncast sum(), DECIMAL, TINYINT...) hashes
# at a different width than the Spark parquet even when values are equal —
# the r10 dq_expect/join_fifo/sql_pivot failure class. Fail loudly here.
# NOTE: must come from con.sql(...).types — the DB-API cursor.description
# collapses every numeric to 'NUMBER' and would hide HUGEINT.
OK_TYPES = {"BIGINT", "INTEGER", "DOUBLE", "FLOAT", "VARCHAR", "BOOLEAN",
            "DATE", "TIMESTAMP", "TIMESTAMP_NS", "TIMESTAMP WITH TIME ZONE"}


def bad_types(rel):
    return [(c, str(t)) for c, t in zip(rel.columns, rel.types)
            if str(t) not in OK_TYPES
            and not str(t).endswith("[]")]  # list cols compare by value


def rows_of(rel):
    cols = list(rel.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = rel.fetchall()
    return [cols[i] for i in order], [tuple(canon(r[i]) for i in order) for r in data]


def sort_key(row):
    # None is not comparable to values in py3; a (is_null, value) pair per
    # cell sorts nulls first consistently. Columns are type-homogeneous so
    # non-null cells always compare.
    return tuple((v is None, v) for v in row)


def main(sf_dir, out_dir, unordered=False):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table: directory of parts
            p = f"{p}/*.parquet"
        if glob.glob(p):
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
        got_cols, got = rows_of(con.sql(
            f"SELECT * FROM read_parquet('{files[0]}')"))
        if name not in oracle:
            print(f"SKIP  {name}: no oracle ({len(got)} rows)"); n_noracle += 1
            continue
        try:
            rel = con.sql(oracle[name])
            bad = bad_types(rel)
            exp_cols, exp = rows_of(rel)
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}"); n_fail += 1
            continue
        if bad:
            print(f"FAIL  {name}: oracle result types outside driver-safe "
                  f"set: {bad} — CAST the offending aggregate"); n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL  {name}: columns {got_cols} != {exp_cols}"); n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL  {name}: rows {len(got)} != {len(exp)}"); n_fail += 1
            continue
        if unordered:
            got, exp = sorted(got, key=sort_key), sorted(exp, key=sort_key)
        bad = next((i for i, (g, e) in enumerate(zip(got, exp)) if g != e), None)
        if bad is not None:
            print(f"FAIL  {name}: first diff at row {bad}:")
            print(f"      spark : {got[bad]}")
            print(f"      duckdb: {exp[bad]}")
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(got)} rows)"); n_pass += 1
    # Full-pack type sweep: even on a subset run, type-check every oracle
    # (con.sql is lazy — .types binds the plan without executing it) so a
    # latent HUGEINT in an unverified query still fails the gate.
    n_type = 0
    for name, sql in sorted(oracle.items()):
        if name in names:
            continue  # already type-checked above
        try:
            bad = bad_types(con.sql(sql))
        except Exception as e:
            print(f"FAIL  {name}: oracle error in type sweep: {e}")
            n_fail += 1
            continue
        if bad:
            print(f"FAIL  {name}: oracle result types outside driver-safe "
                  f"set: {bad} — CAST the offending aggregate")
            n_fail += 1
        else:
            n_type += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} no-oracle, "
          f"{n_type} type-swept")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], "--unordered" in sys.argv[3:]))
