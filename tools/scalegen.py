#!/usr/bin/env python3
"""Scale-validation data generator (verification tooling, like compare.py —
NOT part of the Spark library): build an ~sf1 dataset from sf0.1 by stacking
REPLICAS offset copies of each fact table, preserving physical parquet types
(events.ts stays timestamp[ns] — graft.Tables.t depends on it).

Per-copy transforms keep referential integrity and determinism:
  - every key column is offset by copy_index * OFFSET[col] (offsets exceed
    the sf0.1 key ranges, so literal predicates like vec_id = 0 keep hitting
    copy 0 only);
  - measure doubles get + copy_index whole CENTS (and whole DOLLARS for
    l_extendedprice, which queries multiply by (1-l_discount)) so
    previously-distinct values don't become exact cross-copy ties (top-k
    LIMIT determinism). The perturbation must keep values exact scale-2
    rationals: a first attempt used +i*1e-3, which put every copy-5 value
    exactly on a half-cent (x.xx5) where DuckDB's DECIMAL(28,2) cast
    (round-half-up on the decimal string) and Spark's round(x*100) (IEEE
    double, lands either side) disagree — 4 queries failed on sub-cent
    aggregate drift. Cents survive every downstream rounding identically
    on both engines; dollars survive the ×(1-discount) product at scale 2;
  - events.ts gets + copy_index nanoseconds (uniqueness without moving any
    window boundary in practice);
  - dimension tables (region, nation) are NOT replicated — dims don't scale
    with fact data;
  - documents.text and embeddings.embedding are copied verbatim: the dedup /
    ANN suites then face real 10-way duplicates, which is exactly the
    100 TB dedup workload shape.

Usage: python3 tools/scalegen.py <srcDir> <dstDir> [replicas=10]
"""
import sys
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPLICAS_DEFAULT = 10

# key-column offsets (per copy index); chosen far above sf0.1 key ranges
OFFSETS = {
    "customer":  {"c_custkey": 10_000_000},
    "supplier":  {"s_suppkey": 1_000_000},
    "part":      {"p_partkey": 100_000_000},
    "orders":    {"o_orderkey": 1_000_000_000, "o_custkey": 10_000_000},
    "lineitem":  {"l_orderkey": 1_000_000_000, "l_partkey": 100_000_000,
                  "l_suppkey": 1_000_000},
    "events":    {"event_id": 1_000_000_000, "user_id": 10_000_000},
    "documents": {"doc_id": 10_000_000},
    "embeddings": {"vec_id": 1_000_000},
}
# measure columns perturbed by +i*step (determinism for cross-copy ordering);
# steps are exact scale-2 amounts — see module docstring for why 1e-3 is WRONG
PERTURB = {
    "customer": {"c_acctbal": 0.01},
    "supplier": {"s_acctbal": 0.01},
    "part": {"p_retailprice": 0.01},
    "orders": {"o_totalprice": 0.01},
    "lineitem": {"l_extendedprice": 1.0},
    "events": {"value": 0.01},
}
DIMS = ["region", "nation"]  # single copy
FACTS = ["customer", "supplier", "part", "orders", "lineitem",
         "events", "documents", "embeddings"]


def copy_of(table, name, i):
    if i == 0:
        return table
    cols = []
    for field in table.schema:
        col = table.column(field.name)
        off = OFFSETS.get(name, {}).get(field.name)
        if off is not None:
            col = pc.add(col, pa.scalar(off * i, type=field.type))
        elif field.name in PERTURB.get(name, {}):
            step = PERTURB[name][field.name]
            col = pc.add(col, pa.scalar(i * step, type=pa.float64()))
        elif name == "events" and field.name == "ts":
            as_int = col.cast(pa.int64())
            col = pc.add(as_int, pa.scalar(i, type=pa.int64())).cast(field.type)
        cols.append(col)
    return pa.table(cols, schema=table.schema)


def main(src, dst, replicas):
    import os
    os.makedirs(dst, exist_ok=True)
    for name in DIMS + FACTS:
        t = pq.read_table(f"{src}/{name}.parquet")
        if name in FACTS:
            t = pa.concat_tables([copy_of(t, name, i) for i in range(replicas)])
        # multiple row groups -> real scan parallelism (sf0.1's single-group
        # files serialize scans; see memory: single-task scan trap)
        rg = max(65_536, min(500_000, t.num_rows // 24 + 1))
        pq.write_table(t, f"{dst}/{name}.parquet", row_group_size=rg)
        print(f"{name}: {t.num_rows} rows, row_group={rg}")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/out/sf1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else REPLICAS_DEFAULT
    main(src, dst, n)
