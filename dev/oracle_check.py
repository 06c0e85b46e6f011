#!/usr/bin/env python3
"""Dev-only harness mirroring the driver's DuckDB oracle compare.

NOT part of the shipped library (the Scala engine has no Python deps).
Usage: python3 dev/oracle_check.py <sfDir> <verifyOutDir> [query ...]

Loads every table of <sfDir> as a DuckDB view, runs each oracle SQL from
<verifyOutDir>/oracle_sql.json, reads the Spark result parquet written by
graft.Verify, sorts columns by name on both sides, and compares row-by-row.
"""
import json, sys, glob, math

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple((k, norm(x)) for k, x in sorted(v.items()))
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result parquet")
            n_fail += 1
            continue
        try:
            spark_rel = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            spark_cols = sorted(spark_rel.columns)
            spark_rows = con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in spark_cols)
                + f" FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchall()
            duck_rel = con.sql(sql)
            duck_cols_orig = duck_rel.columns
            duck_cols = sorted(duck_cols_orig)
            duck_rows = con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in duck_cols) + f" FROM ({sql})"
            ).fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if spark_cols != duck_cols:
            print(f"FAIL {name}: columns spark={spark_cols} duck={duck_cols}")
            n_fail += 1
            continue
        # Result TYPES must agree too: the driver's hash serializes values,
        # so e.g. DuckDB summing ints into HUGEINT vs Spark's int64 hash-
        # mismatches even when Python-level == compares equal (the exact
        # mode that shipped q_tpch_q12 red in round 16).
        spark_types = dict(zip(spark_rel.columns, (str(t) for t in spark_rel.types)))
        duck_types = dict(zip(duck_rel.columns, (str(t) for t in duck_rel.types)))
        type_diff = {c: (spark_types[c], duck_types[c]) for c in spark_cols
                     if spark_types[c] != duck_types[c]}
        if type_diff:
            print(f"FAIL {name}: result types differ (spark, duck): {type_diff}")
            n_fail += 1
            continue
        if len(spark_rows) != len(duck_rows):
            print(f"FAIL {name}: rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(spark_rows, duck_rows)):
            na, nb = tuple(map(norm, a)), tuple(map(norm, b))
            if na != nb:
                bad = (i, na, nb)
                break
        if bad:
            i, a, b = bad
            print(f"FAIL {name}: first diff at row {i}:\n  spark={a}\n  duck ={b}\n  cols={duck_cols}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
