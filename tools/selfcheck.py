#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run graft.Verify output against
DuckDB executing SparkEntry.oracleSql on the same parquet tables, compare
row count, schema, and values (columns sorted by name, rows sorted by all
columns). Usage: selfcheck.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    # normalize tz-aware → naive for comparison
    for c in df.columns:
        if isinstance(df[c].dtype, pd.DatetimeTZDtype):
            df[c] = df[c].dt.tz_localize(None)
    return df


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            duck = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        try:
            spark = ds.dataset(f"{out_dir}/{name}").to_table().to_pandas()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        d, s = norm(duck), norm(spark)
        if list(d.columns) != list(s.columns):
            print(f"FAIL {name}: columns duck={list(d.columns)} spark={list(s.columns)}")
            n_fail += 1
            continue
        if len(d) != len(s):
            print(f"FAIL {name}: rows duck={len(d)} spark={len(s)}")
            n_fail += 1
            continue
        bad = []
        for c in d.columns:
            dv, sv = d[c], s[c]
            if str(dv.dtype) != str(sv.dtype):
                bad.append(f"{c}: dtype {dv.dtype} vs {sv.dtype}")
            try:
                eq = (dv.isna() & sv.isna()) | (dv == sv)
                if not eq.all():
                    i = (~eq).idxmax()
                    bad.append(f"{c}: value row{i} duck={dv[i]!r} spark={sv[i]!r} "
                               f"({int((~eq).sum())} diffs)")
            except Exception as e:
                bad.append(f"{c}: compare error {e}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad[:4]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(d)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len(oracle)} with oracle")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
