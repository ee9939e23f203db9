#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <name>/ parquet result written by graft.Verify, runs the
matching oracle_sql.json entry in DuckDB with every test table registered
as a view, sorts columns by name and rows by all columns, and compares
values exactly (the strictest interpretation of the driver's hash check).
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def cells_equal(a, b):
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            return fa == fb
    except (TypeError, ValueError):
        pass
    return a == b

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    import os
    # manifest.json records which queries Verify ATTEMPTED (name -> "ok" or
    # error text), so a crashed query (attempted, no result dir) counts as
    # FAIL instead of being indistinguishable from a name-filtered one.
    manifest = None
    if os.path.exists(f"{out_dir}/manifest.json"):
        manifest = json.load(open(f"{out_dir}/manifest.json"))
    for name in sorted(oracles):
        sql = oracles[name]
        if manifest is not None and name not in manifest:
            continue  # query filtered out of this Verify run (local iteration)
        if not os.path.isdir(f"{out_dir}/{name}"):
            if manifest is None:
                continue  # pre-manifest output dir: can't distinguish, skip
            print(f"FAIL {name}: verify crashed: {manifest.get(name, '?')}")
            n_fail += 1
            continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
            exp = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1
            continue
        # The driver's hash is TYPE-sensitive: DuckDB HUGEINT (e.g. an
        # uncast sum(BIGINT)) surfaces as float64 and hashes differently
        # from Spark's int64 even when every value is numerically equal.
        # That bit q83 in round 2 — flag dtype kind mismatches as FAIL.
        kind_bad = [c for c in got.columns
                    if got[c].dtype.kind != exp[c].dtype.kind]
        if kind_bad:
            c = kind_bad[0]
            print(f"FAIL {name}: col {c} dtype spark={got[c].dtype} "
                  f"duckdb={exp[c].dtype} (driver hash is type-sensitive)")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        bad = None
        for c in got.columns:
            gv, ev = got[c].tolist(), exp[c].tolist()
            for i, (x, y) in enumerate(zip(gv, ev)):
                if not cells_equal(x, y):
                    bad = (c, i, x, y)
                    break
            if bad:
                break
        if bad:
            c, i, x, y = bad
            print(f"FAIL {name}: col {c} row {i}: spark={x!r} duckdb={y!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
