#!/usr/bin/env python3
"""Build the 10x scaling corpus: ten key-offset copies of every sf0.1
table, written to <out>/sf1/*.parquet (plus a copy of sf0.001 as the
sibling warm dir Bench expects).

Each copy offsets every key/FK column consistently, so the result is 10
disjoint, referentially intact replicas of the sf0.1 universe — row
counts x10, value distributions identical, true near-dup structure x10
clones per document/vector (the dedup stress shape recorded in
BASELINE.md). Builder-side tooling only (driver-side python has duckdb).

Usage: make_10x.py [srcDir] [outDir] [copies]
"""
import duckdb
import shutil
import sys
import os

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10x"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10

K = 10_000_000  # int64 key offset per copy (int32 dims use their row count)

# table -> {column: per-copy offset}
OFFSETS = {
    "region":   {"r_regionkey": 5},
    "nation":   {"n_nationkey": 25, "n_regionkey": 5},
    "customer": {"c_custkey": K, "c_nationkey": 25},
    "supplier": {"s_suppkey": K, "s_nationkey": 25},
    "part":     {"p_partkey": K},
    "orders":   {"o_orderkey": K, "o_custkey": K},
    "lineitem": {"l_orderkey": K, "l_partkey": K, "l_suppkey": K},
    "events":   {"event_id": K, "user_id": K},
    "documents": {"doc_id": K},
    "embeddings": {"vec_id": K},
}


def main():
    dst = os.path.join(OUT, "sf1")
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for table, offs in OFFSETS.items():
        src = f"{SRC}/{table}.parquet"
        desc = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src}')").fetchall()
        cols = [d[0] for d in desc]
        types = {d[0]: d[1] for d in desc}  # SQL type names (DESCRIBE)
        sel = ", ".join(
            f"CAST(\"{c}\" + c.copy * {offs[c]} AS {types[c]}) AS \"{c}\""
            if c in offs else f"\"{c}\"" for c in cols)
        con.execute(f"""
            COPY (SELECT {sel}
                  FROM read_parquet('{src}'),
                       (SELECT unnest(generate_series(0, {COPIES - 1})) AS copy) c)
            TO '{dst}/{table}.parquet' (FORMAT PARQUET)""")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{table}.parquet')").fetchone()[0]
        print(f"[10x] {table}: {n:,} rows")
    # warm-dir sibling for graft.Bench
    warm = os.path.join(OUT, "sf0.001")
    if not os.path.isdir(warm):
        shutil.copytree(SRC.replace("sf0.1", "sf0.001"), warm)
    print(f"[10x] corpus at {dst}")


if __name__ == "__main__":
    main()
