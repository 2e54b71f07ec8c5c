#!/usr/bin/env python3
"""Local differential checker mirroring the driver's correctness gate.

Usage: python3 tools/localverify.py <verify_out_dir> <sf_dir> [query ...]

For each query with an oracle in oracle_sql.json: load the Spark-written
parquet result, run the oracle SQL in DuckDB over views named after the
testdata tables, then compare (columns sorted by name, rows sorted by all
columns, exact value equality incl. float bits). This is a dev tool only —
the engine itself is pure Scala/Spark.
"""
import json
import sys
import glob

import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def load_spark(qdir):
    files = sorted(glob.glob(f"{qdir}/*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamp-ish columns to int64 micros for comparison
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            s = s.astype("datetime64[us]")
        elif s.dtype == object and len(s) and isinstance(s.dropna().iloc[0] if s.notna().any() else None, __import__("datetime").date):
            s = pd.to_datetime(s).astype("datetime64[us]")
        out[c] = s
    df = pd.DataFrame(out)
    df = df.sort_values(by=list(df.columns), ignore_index=True, kind="mergesort")
    return df


def compare(name, a, b):
    issues = []
    if list(a.columns) != list(b.columns):
        return [f"schema: spark={list(a.columns)} oracle={list(b.columns)}"]
    if len(a) != len(b):
        return [f"rows: spark={len(a)} oracle={len(b)}"]
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
            ok = (av.values.view("int64") == bv.values.view("int64")) | (av.isna().values & bv.isna().values)
            if not ok.all():
                bad = int((~ok).sum())
                i = int(np.argmax(~ok))
                issues.append(f"col {c}: {bad} float mismatches e.g. row{i}: {av.iloc[i]!r} vs {bv.iloc[i]!r}")
        else:
            eq = (av.astype(object).where(pd.notna(av), None) == bv.astype(object).where(pd.notna(bv), None))
            both_na = pd.isna(av) & pd.isna(bv)
            ok = eq | both_na
            if not ok.all():
                bad = int((~ok).sum())
                i = int(np.argmax((~ok).values))
                issues.append(
                    f"col {c} ({av.dtype}/{bv.dtype}): {bad} mismatches e.g. row{i}: {av.iloc[i]!r} vs {bv.iloc[i]!r}")
    # dtype drift (int32 vs int64 etc.) — warn only
    for c in a.columns:
        if str(a[c].dtype) != str(b[c].dtype):
            issues.append(f"WARN dtype {c}: spark={a[c].dtype} oracle={b[c].dtype}")
    return issues


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    passed, failed, warned = [], [], []
    for name in sorted(oracle):
        if only and name not in only:
            continue
        spark_df = load_spark(f"{out_dir}/{name}")
        if spark_df is None:
            failed.append(name)
            print(f"FAIL {name}: no spark output")
            continue
        try:
            oracle_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: oracle error: {e}")
            continue
        issues = compare(name, canon(spark_df), canon(oracle_df))
        hard = [i for i in issues if not i.startswith("WARN")]
        if hard:
            failed.append(name)
            print(f"FAIL {name}:")
            for i in issues:
                print(f"   {i}")
        elif issues:
            warned.append(name)
            print(f"WARN {name}: " + "; ".join(issues))
        else:
            passed.append(name)
            print(f"PASS {name}")
    print(f"\n== {len(passed)} pass, {len(warned)} warn, {len(failed)} fail ==")
    if failed:
        print("failed:", " ".join(failed))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
