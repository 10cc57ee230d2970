#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Reads each `<verifyOutDir>/<name>/` parquet (written by graft.Verify), runs
the matching SQL from oracle_sql.json in DuckDB over the same testdata
parquet, then compares: schema (column names), row count, and values
(columns sorted by name, rows sorted by all columns) with exact equality.
NOT part of the shipped library — dev harness only.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize datetimes to ns, dates stay as objects
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[ns]")
    sort_cols = list(df.columns)
    try:
        df = df.sort_values(sort_cols, kind="mergesort")
    except Exception:
        df = df.sort_values(sort_cols[0], kind="mergesort")
    return df.reset_index(drop=True)


def compare(name, spark_df, duck_df):
    problems = []
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns differ: spark={list(a.columns)} duck={list(b.columns)}")
        return problems
    if len(a) != len(b):
        problems.append(f"row count differs: spark={len(a)} duck={len(b)}")
        return problems
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype(float); bv = bv.astype(float)
            neq = ~((av == bv) | (np.isnan(av) & np.isnan(bv)))
            if neq.any():
                i = int(np.argmax(neq))
                problems.append(f"col {c}: {int(neq.sum())}/{len(av)} mismatch; first at row {i}: spark={av[i]!r} duck={bv[i]!r} (diff={av[i]-bv[i]!r})")
        else:
            neq = pd.Series(av) .ne(pd.Series(bv)) & ~(pd.isna(pd.Series(av)) & pd.isna(pd.Series(bv)))
            if neq.any():
                i = int(np.argmax(neq.to_numpy()))
                problems.append(f"col {c} ({av.dtype} vs {bv.dtype}): {int(neq.sum())}/{len(av)} mismatch; first at row {i}: spark={av[i]!r} duck={bv[i]!r}")
    return problems


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    declared = set(oracle)
    produced = {os.path.basename(d) for d in glob.glob(f"{outdir}/*") if os.path.isdir(d)}
    for name in sorted(produced - declared):
        rows = len(pd.read_parquet(f"{outdir}/{name}"))
        print(f"[rows-only] {name}: {rows} rows {'OK' if rows >= 0 else ''}")
    for name in sorted(declared):
        if name not in produced:
            print(f"[FAIL] {name}: spark output missing"); n_fail += 1
            continue
        try:
            spark_df = pd.read_parquet(f"{outdir}/{name}")
            duck_df = con.execute(oracle[name]).fetchdf()
            problems = compare(name, spark_df, duck_df)
        except Exception as e:
            problems = [f"exception: {e}"]
        if problems:
            n_fail += 1
            print(f"[FAIL] {name}")
            for p in problems[:6]:
                print(f"       {p}")
        else:
            n_pass += 1
            print(f"[ok]   {name} ({len(spark_df)} rows)")
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
