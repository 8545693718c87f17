#!/usr/bin/env python3
"""Time each oracle_sql.json query in DuckDB over a testdata dir (verification
tooling, like compare.py — NOT part of the Spark library). Used for the
BASELINE.md Spark-vs-DuckDB ratio tables at validation scales.

Usage: python3 tools/ducktime.py <sfDir> <verifyOutDir> [reps=2]
Prints per-query best-of-reps seconds + one JSON summary line.
"""
import sys, json, os, time
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def main(sf_dir, out_dir, reps):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    times = {}
    # warm pass first (page cache + duckdb internal state), then best-of-reps;
    # queries past 30 s take their single-shot time (repeating a 10-minute
    # O(N^2) oracle refines nothing the ratio table cares about)
    for name in sorted(oracle):
        best = None
        for _ in range(reps + 1):
            t0 = time.time()
            try:
                con.execute(oracle[name]).fetchall()
            except Exception as e:
                print(f"ERR {name}: {str(e)[:120]}")
                best = -1.0
                break
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            if dt > 30:
                break
        times[name] = round(best, 3)
        print(f"DUCK {name:28s} {best:8.3f}")
    ok = {k: v for k, v in times.items() if v >= 0}
    print(json.dumps({"metric": "duckdb_total", "value": round(sum(ok.values()), 2),
                      "unit": "sec", "queries": times, "sf": sf_dir}))

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 2)
