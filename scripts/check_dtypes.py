#!/usr/bin/env python3
"""Strict dtype audit: the driver's correctness hash is TYPE-sensitive
(knn_pq failed r5 on DuckDB HUGEINT vs Spark BIGINT with identical
values), while check.py compares with check_dtype=False. This script
runs every oracle and diffs the resulting pandas dtypes against the
Spark parquet output's dtypes, flagging any drift class (HUGEINT,
DECIMAL, int32-vs-int64 ...) before the driver does.

Usage: python3 scripts/check_dtypes.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        if not glob.glob(f"{outdir}/{name}/*.parquet"):
            print(f"SKIP {name}: no spark output")
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:160]}")
            n_fail += 1
            continue
        got = duckdb.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        g = {c: str(got[c].dtype) for c in sorted(got.columns)}
        e = {c: str(exp[c].dtype) for c in sorted(exp.columns)}
        if g != e:
            diffs = {c: (g.get(c), e.get(c))
                     for c in set(g) | set(e) if g.get(c) != e.get(c)}
            print(f"FAIL {name}: dtype drift {diffs}")
            n_fail += 1
        else:
            n_pass += 1
    print(f"== dtypes: {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
