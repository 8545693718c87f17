#!/usr/bin/env python3
"""Local pre-check of the driver's oracle gate: run each oracleSql in DuckDB
over the testdata tables, load the Spark result parquet written by
graft.Verify, sort columns by name, and compare values exactly.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        import math
        if math.isnan(v):
            return None
        return float(v)
    if isinstance(v, int):
        return int(v)
    return str(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"EMPTY-OUT {name}")
            n_fail += 1
            continue
        got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
        got = got[sorted(got.columns)]
        if name not in oracle:
            print(f"ROWSONLY  {name}: rows={len(got)} {'OK' if len(got)>0 else 'ZERO-ROWS FAIL'}")
            if len(got) == 0:
                n_fail += 1
            else:
                n_pass += 1
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {str(e)[:160]}")
            n_fail += 1
            continue
        exp = exp[sorted(exp.columns)]
        ok = True
        if list(got.columns) != list(exp.columns):
            print(f"FAIL      {name}: columns {list(got.columns)} != {list(exp.columns)}")
            ok = False
        elif len(got) != len(exp):
            print(f"FAIL      {name}: rows {len(got)} != {len(exp)}")
            ok = False
        else:
            gv = [[norm(v) for v in row] for row in got.itertuples(index=False)]
            ev = [[norm(v) for v in row] for row in exp.itertuples(index=False)]
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(gv, ev)) if a != b]
            if diffs:
                i, a, b = diffs[0]
                print(f"FAIL      {name}: {len(diffs)} differing rows; first @{i}:")
                print(f"          spark: {a}")
                print(f"          duck : {b}")
                ok = False
        if ok:
            print(f"PASS      {name}: rows={len(got)}")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
