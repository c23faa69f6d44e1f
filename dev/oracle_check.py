#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Dev tooling only (driver-side python: duckdb/pandas/pyarrow) - NOT part
of the Scala library. Mirrors the per-round correctness gate locally.

Usage: python3 oracle_check.py <sfDir> <verifyOut>
Registers DuckDB views over the sf parquet tables, runs each entry in
oracle_sql.json, and compares against the Verify parquet dumps:
row count, sorted column names, and value equality (numeric columns
compared with tolerance after canonical sort).
"""
import sys, os, glob, json, math
import duckdb
import pandas as pd
import numpy as np

sfdir, vout = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}/*.parquet')"
                if os.path.isdir(p) else
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(vout, "oracle_sql.json")))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    key_cols = list(df.columns)
    df = df.copy()
    for c in df.columns:
        if df[c].dtype == object:
            # DuckDB HUGEINT/DECIMAL arrive as object even when Spark
            # emits int64 — coerce numerics first so both frames sort
            # the same way ('10' < '2' lexically), stringify the rest
            coerced = pd.to_numeric(df[c], errors="coerce")
            if coerced.notna().all() and len(df) > 0:
                df[c] = coerced
            else:
                df[c] = df[c].astype(str)
    df = df.sort_values(key_cols, kind="mergesort").reset_index(drop=True)
    return df

def compare(name):
    spark_files = glob.glob(os.path.join(vout, name, "*.parquet"))
    if not spark_files:
        return (name, "NO_SPARK_OUTPUT")
    sdf = pd.concat([pd.read_parquet(f) for f in spark_files], ignore_index=True)
    if name not in oracle:
        return (name, f"rows_only({len(sdf)})" if len(sdf) > 0 else "ROWS_ONLY_EMPTY")
    try:
        odf = con.execute(oracle[name]).df()
    except Exception as e:
        return (name, f"ORACLE_SQL_ERROR: {e}")
    if len(sdf) != len(odf):
        return (name, f"ROWS_MISMATCH spark={len(sdf)} oracle={len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        return (name, f"SCHEMA_MISMATCH spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
    s, o = canon(sdf), canon(odf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if np.issubdtype(np.asarray(sv).dtype, np.number) and np.issubdtype(np.asarray(ov).dtype, np.number):
            sa = np.asarray(sv, dtype=float); oa = np.asarray(ov, dtype=float)
            both_nan = np.isnan(sa) & np.isnan(oa)
            ok = both_nan | np.isclose(sa, oa, rtol=1e-6, atol=1e-9)
            if not ok.all():
                i = int(np.argmin(ok))
                return (name, f"VALUE_MISMATCH col={c} row={i} spark={sa[i]} oracle={oa[i]}")
        else:
            sv2 = sv.astype(str); ov2 = ov.astype(str)
            if not (sv2 == ov2).all():
                i = int(np.argmin((sv2 == ov2).values))
                return (name, f"VALUE_MISMATCH col={c} row={i} spark={sv2.iloc[i]!r} oracle={ov2.iloc[i]!r}")
    return (name, "OK")

names = sorted(os.path.basename(d) for d in glob.glob(os.path.join(vout, "*")) if os.path.isdir(d))
fails = 0
for n in names:
    name, status = compare(n)
    tag = "PASS" if status == "OK" or status.startswith("rows_only") else "FAIL"
    if tag == "FAIL":
        fails += 1
    print(f"{tag:4} {name:28} {status}")
missing = [k for k in oracle if not os.path.isdir(os.path.join(vout, k))]
for k in missing:
    fails += 1
    print(f"FAIL {k:28} ORACLE_WITHOUT_QUERY_OUTPUT")
print(f"\n{len(names)} queries, {fails} failures")
sys.exit(1 if fails else 0)
