#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name>/ parquet (Spark result), runs the matching SQL
from <outDir>/oracle_sql.json in DuckDB against the sfDir parquet tables,
sorts columns by name + rows by all columns, and compares values exactly.
"""
import os, re, sys, json, glob, math

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def cell_eq(a, b):
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            if a is None or b is None:
                return False
            if math.isnan(a) and math.isnan(b):
                return True
            return a == b
    except TypeError:
        pass
    return str(a) == str(b)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # Optional resource caps for beyond-sf0.01 sweeps: the PQ-family oracle
    # re-derivations (q99/q100/q103) materialize ~20M-row distance CTEs at
    # sf1 and DuckDB will happily take the whole box without a limit.
    if os.environ.get("DUCKDB_MEMORY_LIMIT"):
        con.execute(f"SET memory_limit='{os.environ['DUCKDB_MEMORY_LIMIT']}'")
    if os.environ.get("DUCKDB_THREADS"):
        con.execute(f"SET threads={int(os.environ['DUCKDB_THREADS'])}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    only = os.environ.get("SPARK_GRAFT_ONLY")
    if only:  # dev loop: same filter the Scala Verify/Bench mains honor
        keep = {n.strip() for n in only.split(",") if n.strip()}
        oracle = {k: v for k, v in oracle.items() if k in keep}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            duck = con.execute(sql).fetch_arrow_table().to_pandas()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        spark = pq.read_table(files).to_pandas()
        duck, spark = normalize(duck), normalize(spark)
        if list(duck.columns) != list(spark.columns):
            print(f"FAIL {name}: columns duck={list(duck.columns)} spark={list(spark.columns)}")
            n_fail += 1
            continue
        if len(duck) != len(spark):
            print(f"FAIL {name}: rows duck={len(duck)} spark={len(spark)}")
            n_fail += 1
            continue
        bad = None
        for c in duck.columns:
            dv, sv = duck[c].tolist(), spark[c].tolist()
            for i, (a, b) in enumerate(zip(dv, sv)):
                if not cell_eq(a, b):
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col {c} row {i}: duck={a!r} spark={b!r}")
            n_fail += 1
        else:
            dt_d = [str(t) for t in duck.dtypes]
            dt_s = [str(t) for t in spark.dtypes]
            note = "" if dt_d == dt_s else f"  [dtypes duck={dt_d} spark={dt_s}]"
            print(f"PASS {name} ({len(duck)} rows){note}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
