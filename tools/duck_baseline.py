#!/usr/bin/env python3
"""Single-threaded DuckDB baseline over the repo's own oracle SQL.

Times every query in <verifyOutDir>/oracle_sql.json against the parquet
tables in <sfDir> with `SET threads TO 1` — the same-data, same-semantics
comparison BASELINE.md tracks against the engine's warm Bench totals.

Usage: python3 tools/duck_baseline.py <sfDir> <verifyOutDir> [mem_gb]
"""
import json, sys, time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf, outdir = sys.argv[1], sys.argv[2]
    mem = sys.argv[3] if len(sys.argv) > 3 else "40"
    con = duckdb.connect()
    con.execute("SET threads TO 1")
    con.execute(f"SET memory_limit='{mem}GB'")
    con.execute("SET temp_directory='/tmp/duck_spill'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    sql = json.load(open(f"{outdir}/oracle_sql.json"))
    total = 0.0
    times = {}
    for name in sorted(sql):
        t0 = time.time()
        try:
            con.execute(sql[name]).fetchall()
            dt = time.time() - t0
            times[name] = round(dt, 2)
            total += dt
            print(f"[duck] {name:28s} {dt:8.2f} s", flush=True)
        except Exception as e:  # noqa: BLE001 - record and continue
            times[name] = None
            print(f"[duck] {name:28s}   ERROR {str(e)[:80]}", flush=True)
    print(json.dumps({"sf": sf, "n": len(sql), "total_sec": round(total, 1),
                      "queries": times}))


if __name__ == "__main__":
    main()
