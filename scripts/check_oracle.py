#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for every query in
outDir/oracle_sql.json, run the SQL in DuckDB over the sf parquet tables
and compare against the Spark-written parquet in outDir/<name>/.

Usage: check_oracle.py [sfDir] [outDir]
"""
import glob
import json
import sys

import duckdb
import numpy as np
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.reset_index(drop=True)


def dtype_err(a: pd.DataFrame, b: pd.DataFrame):
    """Driver-strictness dtype gate: the driver's typed-hash comparator
    distinguishes int64 from float64/object/HUGEINT, so a value-level
    pass with coerced dtypes (numpy ==) is NOT a driver pass. DuckDB
    widens integer sum() to HUGEINT (-> float64/object in fetchdf);
    flag any column whose dtype differs between the Spark parquet and
    the DuckDB result before comparing values."""
    errs = []
    for c in a.columns:
        ad, bd = a[c].dtype, b[c].dtype
        if ad == bd:
            continue
        # Nullable-int representation drift is not a driver signal:
        # pandas surfaces an int64 column containing nulls as float64
        # or object on EITHER side. Only flag when the non-null values
        # themselves disagree in kind.
        if a[c].isna().any() or b[c].isna().any():
            if {ad.kind, bd.kind} <= {"i", "f", "O"}:
                continue
        errs.append(f"{c}: spark={ad} oracle={bd}")
    if errs:
        return "dtype mismatch (driver hash would fail): " + "; ".join(errs)
    return None


def cmp(a: pd.DataFrame, b: pd.DataFrame):
    if list(a.columns) != list(b.columns):
        return f"columns {list(a.columns)} != {list(b.columns)}"
    if len(a) != len(b):
        return f"rows {len(a)} != {len(b)}"
    derr = dtype_err(a, b)
    if derr:
        return derr
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            av = av.astype(np.float64)
            bv = bv.astype(np.float64)
            eq = (av == bv) | (np.isnan(av) & np.isnan(bv))
        else:
            eq = pd.Series(av).eq(pd.Series(bv)) | (pd.Series(av).isna() & pd.Series(bv).isna())
            eq = eq.values
        if not eq.all():
            i = int(np.argmin(eq))
            return f"col {c} first mismatch at row {i}: spark={a[c].iloc[i]!r} oracle={b[c].iloc[i]!r}"
    return None


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        files = glob.glob(f"{OUT_DIR}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no spark output")
            n_bad += 1
            continue
        try:
            spark_df = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
            duck_df = norm(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"ERROR    {name}: {str(e)[:160]}")
            n_bad += 1
            continue
        err = cmp(spark_df, duck_df)
        if err:
            print(f"MISMATCH {name}: {err}")
            n_bad += 1
        else:
            print(f"ok       {name} ({len(spark_df)} rows)")
            n_ok += 1
    rows_only = [d.split("/")[-1] for d in sorted(glob.glob(f"{OUT_DIR}/*"))
                 if "." not in d.split("/")[-1] and d.split("/")[-1] not in oracle]
    print(f"\n{n_ok} ok, {n_bad} failing; rows-only (no oracle): {rows_only}")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
