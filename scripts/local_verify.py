#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: local_verify.py <sfDir> <outDir>

Assumes `graft.Verify <sfDir> <outDir>` already ran (parquet per query +
oracle_sql.json). Registers each test table as a DuckDB view, runs every
oracle SQL, and compares against our parquet dump: columns sorted by name,
rows sorted, exact value equality. Exit 1 on any mismatch.

This is a builder-side tool only (driver-side python has duckdb); it is NOT
part of the Spark library.
"""
import duckdb
import json
import math
import sys

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(con, rel_sql):
    """Fetch a relation with columns sorted by name, rows fully sorted."""
    cols = [d[0] for d in con.execute(f"SELECT * FROM ({rel_sql}) LIMIT 0").description]
    ordered = sorted(cols)
    collist = ", ".join(f'"{c}"' for c in ordered)
    rows = con.execute(
        f'SELECT {collist} FROM ({rel_sql}) ORDER BY {collist}').fetchall()
    types = [d[1] for d in con.execute(
        f"SELECT {collist} FROM ({rel_sql}) LIMIT 0").description]
    return ordered, types, rows


def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracles = json.load(f)
    # optional third arg mirrors graft.Verify's targeted mode: check only
    # these names (oracle_sql.json always holds the FULL map)
    if len(sys.argv) > 3:
        only = set(sys.argv[3].split(","))
        oracles = {k: v for k, v in oracles.items() if k in only}

    n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            ocols, otypes, orows = canon(con, sql)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            scols, stypes, srows = canon(
                con, f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: columns differ spark={scols} oracle={ocols}")
            n_fail += 1
            continue
        if stypes != otypes:
            print(f"WARN {name}: dtypes differ spark={stypes} oracle={otypes}")
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
            continue
        bad = None
        for i, (sr, orow) in enumerate(zip(srows, orows)):
            if not all(eq(x, y) for x, y in zip(sr, orow)):
                bad = (i, sr, orow)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} spark={bad[1]} oracle={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
    print(f"\n{len(oracles) - n_fail}/{len(oracles)} oracle queries pass")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
