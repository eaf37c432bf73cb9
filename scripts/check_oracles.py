#!/usr/bin/env python3
"""Driver-mimic: compare graft.Verify parquet output against the DuckDB
oracle SQL, the same way the round driver does (row count, schema width,
sorted-by-column-name value hash).

Usage: python3 scripts/check_oracles.py <outDir> <sfDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import glob
import json
import sys

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def norm_cell(v):
    if isinstance(v, float):
        return round(v, 9)
    return v


def frame_sig(df: pd.DataFrame):
    rows = [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    return rows


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events", "lineitem", "orders",
              "customer", "part", "supplier", "nation", "region"):
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
        except Exception as e:
            print(f"  (view {t}: {e})")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    ok = bad = 0
    for name in sorted(oracles):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISS {name}: no spark output")
            bad += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        try:
            duck_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"SQLERR {name}: {str(e).splitlines()[0][:160]}")
            bad += 1
            continue
        s, d = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"SCHEMA {name}: spark={list(s.columns)} duck={list(d.columns)}")
            bad += 1
            continue
        if len(s) != len(d):
            print(f"ROWS {name}: spark={len(s)} duck={len(d)}")
            bad += 1
            continue
        ss, dd = frame_sig(s), frame_sig(d)
        if ss != dd:
            diffs = [(a, b) for a, b in zip(ss, dd) if a != b][:3]
            print(f"HASH {name}: first diffs {diffs}")
            bad += 1
            continue
        print(f"OK   {name}: rows={len(s)}")
        ok += 1
    # rows-only queries (no oracle)
    for path in sorted(glob.glob(f"{out_dir}/*/")):
        name = path.rstrip("/").split("/")[-1]
        if name not in oracles:
            files = glob.glob(f"{path}/*.parquet")
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            print(f"ROWS-ONLY {name}: rows={n}")
    print(f"\n{ok} ok, {bad} bad")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
