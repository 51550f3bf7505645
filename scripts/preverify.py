#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads the parquet dumps produced by `graft.Verify` (one dir per query) plus
`oracle_sql.json`, runs each oracle in DuckDB against the same sf tables, and
compares: row count, column set (sorted by name), and values (rows sorted).
Reports exact match, plus max float deviation when not exact, so parity bugs
are visible before the driver runs.

Usage: preverify.py <sfDir> <outDir>
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison (dates arrive as datetime64 from duckdb
    # but as object-of-datetime.date from parquet via pyarrow)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            import datetime
            if df[c].map(lambda v: isinstance(v, datetime.date) or v is None).all():
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
            else:
                df[c] = df[c].map(
                    lambda v: str(v) if v is not None and not (
                        isinstance(v, float) and math.isnan(v)) else None)
    return df.sort_values(by=list(df.columns), ignore_index=True,
                          na_position="first")


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    # subset iteration: honor the same filter graft.Verify used, so queries
    # that were deliberately not dumped don't report as failures
    import os
    only = os.environ.get("SPARK_GRAFT_ONLY")
    if only:
        keep = {n.strip() for n in only.split(",")}
        oracles = {n: s for n, s in oracles.items() if n in keep}
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            mine = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            oracle = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        a, b = canon(mine), canon(oracle)
        if sorted(a.columns) != sorted(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
            continue
        if a.equals(b):
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
            continue
        # diagnose: which columns differ, max float deviation
        bad = []
        for c in a.columns:
            if not a[c].equals(b[c]):
                try:
                    dev = (pd.to_numeric(a[c]) - pd.to_numeric(b[c])).abs().max()
                    bad.append(f"{c} (maxdev={dev:.3e})")
                except Exception:
                    nbad = int((a[c].fillna('\0') != b[c].fillna('\0')).sum())
                    bad.append(f"{c} ({nbad} cells)")
        print(f"FAIL {name}: value mismatch in {bad}")
        n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
