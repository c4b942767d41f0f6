#!/usr/bin/env python3
"""Dev-only local mirror of the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/<name>/ parquet (written by graft.Verify) and
<verifyOutDir>/oracle_sql.json, runs each oracle in DuckDB with the testdata
tables registered as views, and compares: schema (column names), row count,
and exact cell values after sorting columns by name and rows by all columns.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def compare(name, spark_df, duck_df):
    problems = []
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        return [f"schema: spark={sc} duck={dc}"]
    if len(spark_df) != len(duck_df):
        problems.append(f"rows: spark={len(spark_df)} duck={len(duck_df)}")
        return problems
    s, d = canon(spark_df), canon(duck_df)
    for c in s.columns:
        a, b = s[c], d[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            a = a.astype(float); b = b.astype(float)
            both_nan = a.isna() & b.isna()
            neq = ~both_nan & (a != b)
            if neq.any():
                i = neq.idxmax()
                maxdiff = (a - b).abs().max(skipna=True)
                problems.append(
                    f"col {c}: {int(neq.sum())}/{len(a)} mismatches, first at row {i}: "
                    f"spark={a[i]!r} duck={b[i]!r} (maxabsdiff={maxdiff:.3e})")
        else:
            a = a.astype(str); b = b.astype(str)
            neq = a != b
            if neq.any():
                i = neq.idxmax()
                problems.append(
                    f"col {c}: {int(neq.sum())}/{len(a)} mismatches, first at row {i}: "
                    f"spark={a[i]!r} duck={b[i]!r}")
    return problems


def main():
    # optional: --json <path> writes a driver-shaped artifact (same per-query
    # record shape as CORRECTNESS_r*.json) alongside the text report — used
    # to commit the sf1 sweep as CORRECTNESS_sf1_r13.json (r12 VERDICT #4)
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            sys.exit("usage: check.py <sf_dir> <out_dir> [query ...] [--json <path>]")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    if len(argv) < 2:
        sys.exit("usage: check.py <sf_dir> <out_dir> [query ...] [--json <path>]")
    sf_dir, out_dir = argv[0], argv[1]
    only = set(argv[2:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table (graft.tools.ScaleGen): a dir of parts
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    npass = nfail = 0
    record = {}
    for name in names:
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); nfail += 1
            record[name] = dict(rows_match=False, schema_match=False,
                                hash_match=False, spark_rows=0,
                                oracle_rows=None, err="no spark output")
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)],
                             ignore_index=True)
        if name not in oracles:
            status = "ROWS" if len(spark_df) > 0 else "EMPTY!"
            print(f"{status} {name}: rows={len(spark_df)} (no oracle)")
            record[name] = dict(rows_match=None, schema_match=None,
                                hash_match=None, spark_rows=len(spark_df),
                                oracle_rows=None, err="no_oracle")
            continue
        try:
            duck_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); nfail += 1
            record[name] = dict(rows_match=None, schema_match=None,
                                hash_match=None, spark_rows=len(spark_df),
                                oracle_rows=None, err=f"oracle error: {e}")
            continue
        problems = compare(name, spark_df, duck_df)
        schema_ok = not any(p.startswith("schema:") for p in problems)
        rows_ok = schema_ok and not any(p.startswith("rows:") for p in problems)
        record[name] = dict(rows_match=rows_ok, schema_match=schema_ok,
                            hash_match=not problems, spark_rows=len(spark_df),
                            oracle_rows=len(duck_df),
                            err="; ".join(problems) if problems else None)
        if problems:
            nfail += 1
            print(f"FAIL {name}:")
            for p in problems:
                print(f"  - {p}")
        else:
            npass += 1
            print(f"PASS {name} ({len(spark_df)} rows)")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)
        print(f"wrote {json_out} ({len(record)} entries)")
    print(f"\n{npass} pass, {nfail} fail")
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
