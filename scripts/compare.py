#!/usr/bin/env python3
"""Local replica of the driver's correctness compare: run each oracle SQL in
DuckDB against the sf parquet tables, compare to the Spark result parquet
(columns sorted by name, rows sorted, values hashed)."""
import duckdb, glob, json, math, os, sys

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_r2"
names = sys.argv[3].split(",") if len(sys.argv) > 3 else None

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                v = "%.9g" % v
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)

fails = 0
for name in sorted(oracle):
    if names and name not in names:
        continue
    spark_dir = os.path.join(outdir, name)
    if not os.path.isdir(spark_dir):
        continue
    try:
        o = con.sql(oracle[name])
        orows, ocols = o.fetchall(), [c for c in o.columns]
        sq = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'")
        srows, scols = sq.fetchall(), [c for c in sq.columns]
        ok_schema = sorted(map(str.lower, ocols)) == sorted(map(str.lower, scols))
        a, b = canon(orows, ocols), canon(srows, scols)
        ok = ok_schema and a == b
        print(f"{name}: rows {len(srows)}/{len(orows)} schema={ok_schema} match={ok}")
        if not ok:
            fails += 1
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    print("  first diff oracle:", x)
                    print("           spark :", y)
                    break
            if len(a) != len(b):
                print(f"  row count differs: oracle {len(a)} spark {len(b)}")
    except Exception as e:
        fails += 1
        print(f"{name}: ERROR {e}")
sys.exit(1 if fails else 0)
