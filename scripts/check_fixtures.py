#!/usr/bin/env python3
"""Fixture schema drift guard — run at round start, before anything else.

The driver regenerates /root/testdata between rounds, and physical encodings
have silently changed before (round 5: events.ts went parquet TIMESTAMP(NANOS)
-> timestamp[us], which surfaced as 108 opaque query failures). This script
pins every fixture table's logical schema, with an explicit allowlist of the
physical timestamp encodings the Scala loaders (graft.Tables) can adapt to,
and fails LOUDLY naming the drifted column otherwise.

Usage: check_fixtures.py [sfDir ...]   (default: all three sf dirs)
Exit 0 = schemas as expected; exit 1 = drift (message names table.column).
"""
import sys

import pyarrow.parquet as pq

# column -> set of acceptable arrow type strings.
#
# events.ts is the ONLY schema-adaptive column (graft.Tables.events handles
# NANOS-as-long / NTZ micros / UTC micros). Plain int64 is deliberately NOT
# accepted even there: pyarrow reports parquet TIMESTAMP(NANOS) as
# timestamp[ns], so a genuine int64 column would be ambiguous (nanos? micros?)
# and Tables' LongType branch must only be reachable via nanosAsLong on a real
# NANOS file. Tables.events additionally magnitude-checks the first value
# before truncating.
TS_EVENTS_OK = {"timestamp[ns]", "timestamp[us]", "timestamp[us, tz=UTC]",
                "timestamp[ns, tz=UTC]"}
# o_orderdate / l_shipdate are RAW reads (no adaptive loader) and
# FixtureSchemaSpec pins them to exactly TimestampNTZType — so the guard must
# accept exactly what that raw read produces: non-UTC-adjusted micros. A NANOS
# or tz=UTC file here WOULD break the suite (LongType / TimestampType surface
# types), so the guard must fail loudly on them, not allowlist them.
TS_RAW_NTZ_OK = {"timestamp[us]"}
EXPECT = {
    "region":   {"r_regionkey": {"int32", "int64"},
                 "r_name": {"string", "large_string"}},
    "nation":   {"n_nationkey": {"int32", "int64"},
                 "n_regionkey": {"int32", "int64"},
                 "n_name": {"string", "large_string"}},
    "customer": {"c_custkey": {"int64"}, "c_nationkey": {"int32", "int64"},
                 "c_acctbal": {"double"}},
    "supplier": {"s_suppkey": {"int64"}, "s_nationkey": {"int32", "int64"}},
    "part":     {"p_partkey": {"int64"}, "p_retailprice": {"double"}},
    "orders":   {"o_orderkey": {"int64"}, "o_custkey": {"int64"},
                 "o_totalprice": {"double"}, "o_orderdate": TS_RAW_NTZ_OK,
                 "o_orderstatus": {"string", "large_string"},
                 "o_orderpriority": {"string", "large_string"}},
    "lineitem": {"l_orderkey": {"int64"}, "l_partkey": {"int64"},
                 "l_suppkey": {"int64"}, "l_linenumber": {"int32", "int64"},
                 "l_quantity": {"double"}, "l_extendedprice": {"double"},
                 "l_discount": {"double"}, "l_tax": {"double"},
                 "l_returnflag": {"string", "large_string"},
                 "l_linestatus": {"string", "large_string"},
                 "l_shipdate": TS_RAW_NTZ_OK},
    "events":   {"event_id": {"int64"}, "ts": TS_EVENTS_OK, "user_id": {"int64"},
                 "event_type": {"string", "large_string"},
                 "value": {"double"}, "props": {"string", "large_string"}},
    "documents": {"doc_id": {"int64"}, "text": {"string", "large_string"},
                  "lang": {"string", "large_string"},
                  "source": {"string", "large_string"}, "n_chars": {"int64"}},
    "embeddings": {"vec_id": {"int64"},
                   "embedding": {"list<element: float>", "list<item: float>",
                                 "large_list<element: float>"},
                   "label": {"int32", "int64"}},
}


def check_dir(sf_dir: str) -> list:
    problems = []
    for table, cols in EXPECT.items():
        path = f"{sf_dir}/{table}.parquet"
        try:
            schema = pq.read_schema(path)
        except Exception as e:
            problems.append(f"{sf_dir}: {table}: unreadable ({e})")
            continue
        have = {f.name: str(f.type) for f in schema}
        for col, ok in cols.items():
            if col not in have:
                problems.append(f"{sf_dir}: {table}.{col}: MISSING "
                                f"(present: {sorted(have)})")
            elif have[col] not in ok:
                problems.append(
                    f"{sf_dir}: {table}.{col}: DRIFTED to {have[col]} "
                    f"(expected one of {sorted(ok)}) — if this is a new "
                    "timestamp encoding, teach graft.Tables + this allowlist")
    return problems


def main(dirs) -> int:
    if not dirs:
        dirs = [f"/root/testdata/sf{s}" for s in ("0.001", "0.01", "0.1")]
    problems = []
    for d in dirs:
        problems += check_dir(d)
    if problems:
        print("FIXTURE SCHEMA DRIFT DETECTED:")
        for p in problems:
            print(f"  {p}")
        return 1
    print(f"fixture schemas OK in {len(dirs)} dir(s)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
