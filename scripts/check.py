#!/usr/bin/env python3
"""Local oracle check mimicking the driver: run Verify's parquet dumps
against DuckDB executing oracle_sql.json on the same tables.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for value comparison
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.reset_index(drop=True)

def dtype_kind(dt) -> str:
    """Coarse dtype class for the strictness gate: the driver hashes
    exact value reprs, so an int64 Spark column vs a float64 oracle
    column (e.g. DuckDB sum(BIGINT) -> HUGEINT -> pandas float64)
    hash-mismatches even when every value is numerically identical."""
    k = getattr(dt, "kind", "?")
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    return "other"

def dtype_mismatch(g: pd.DataFrame, e: pd.DataFrame):
    """Return list of (col, spark_dtype, oracle_dtype) where the dtype
    CLASS differs (int vs float vs bool). Mirrors the driver's hash
    strictness that check_dtype=False used to hide."""
    bad = []
    for c in g.columns:
        if c not in e.columns:
            # schema drift is caught by the column-list gate before this
            # runs; guard anyway so a drifted frame reports a FAIL line
            # instead of aborting the whole run with a KeyError
            bad.append((c, str(g[c].dtype), "<missing>"))
            continue
        kg, ke = dtype_kind(g[c].dtype), dtype_kind(e[c].dtype)
        if kg != ke:
            bad.append((c, str(g[c].dtype), str(e[c].dtype)))
    return bad

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
        sql = oracle[name]
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            n_fail += 1
            continue
        got = duckdb.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            n_fail += 1
            continue
        dk = dtype_mismatch(g, e)
        if dk:
            print(f"FAIL {name}: dtype-class mismatch (spark vs oracle): {dk}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        except AssertionError as ex:
            # find first differing cell for a useful message
            diff = None
            for c in g.columns:
                neq = (g[c] != e[c]) & ~(g[c].isna() & e[c].isna())
                if neq.any():
                    i = int(neq.idxmax())
                    diff = (c, i, g[c].iloc[i], e[c].iloc[i])
                    break
            print(f"FAIL {name}: value mismatch {diff}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
