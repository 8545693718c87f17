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

# Types the driver's canonical hash handles losslessly. Anything outside this
# set (HUGEINT from an uncast integer SUM, DECIMAL from unparameterized
# arithmetic) hashes differently from the Spark parquet even when every value
# is identical — exactly the defect class that shipped x47 red in round 6.
BANNED_TYPE_MARKERS = ("HUGEINT", "DECIMAL")
KNOWN_OK = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "UBIGINT", "UINTEGER",
            "DOUBLE", "FLOAT", "VARCHAR", "DATE", "BOOLEAN",
            "TIMESTAMP", "TIMESTAMP WITH TIME ZONE", "TIMESTAMP_NS"}

def check_twin_types(con, oracle):
    """DESCRIBE every oracle twin and fail on any output column whose DuckDB
    type the driver hash cannot compare against an int64/float64 parquet."""
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            print(f"TYPE-ERR  {name}: {str(e)[:160]}")
            n_bad += 1
            continue
        for col, typ, *_ in desc:
            t = typ.upper()
            if any(m in t for m in BANNED_TYPE_MARKERS):
                print(f"TYPE-FAIL {name}.{col}: {typ} (cast this in the twin SQL)")
                n_bad += 1
            else:
                base = t.split("(")[0].rstrip("[]").strip()
                if base not in KNOWN_OK and not (t.startswith("STRUCT") or "[]" in t):
                    print(f"TYPE-WARN {name}.{col}: {typ} not in known-good set")
    return n_bad

def main(sf_dir, out_dir, types_only=False):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_type_bad = check_twin_types(con, oracle)
    print(f"twin-type check: {'OK' if n_type_bad == 0 else f'{n_type_bad} BAD'} over {len(oracle)} twins")
    if types_only:
        return 1 if n_type_bad else 0
    n_pass = 0
    n_fail = n_type_bad
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
    sys.exit(main(sys.argv[1], sys.argv[2], types_only="--types-only" in sys.argv))
