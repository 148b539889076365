#!/usr/bin/env python
"""Dev harness: run each registered query on Spark AND its DuckDB oracle,
compare row count + schema-ish + order-insensitive values (approximating
the driver's correctness gate). Usage:

    python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")

import duckdb

from privacy_cdc_lakehouse_spark.queries import all_oracles, all_queries
from privacy_cdc_lakehouse_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # EXACT shortest-roundtrip repr — the driver's gate hashes
        # values exactly, so the dev harness must be at least as
        # strict (a 6-sig-digit normalization here passed diffs the
        # driver would fail). Queries already round where cross-engine
        # fp drift is legitimate.
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def normalize_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check_oracles")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries, oracles = all_queries(), all_oracles()
    unknown = only - set(queries)
    if unknown:
        # a typo'd name silently checking NOTHING and exiting 0 is the
        # worst failure mode a verification harness can have
        print(f"FAIL unknown query name(s): {sorted(unknown)}")
        return 1
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            res = con.sql(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            failures += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}")
            failures += 1
            continue
        s_n, d_n = normalize_rows(scols, srows), normalize_rows(dcols, drows)
        if s_n != d_n:
            diff = [(a, b) for a, b in zip(s_n, d_n) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diff}")
            failures += 1
            continue
        print(f"OK   {name}: {len(srows)} rows")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
