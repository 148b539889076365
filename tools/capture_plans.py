#!/usr/bin/env python
"""Capture .explain('formatted') for headline queries -> plans/r15/.

Usage: python tools/capture_plans.py <suffix> [name ...]
Writes plans/r15/<name>_<suffix>.txt. Queries that do driver-side work
at build time (sql_merge_orders) still run it; the captured plan is the
returned frame's."""
from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from contextlib import redirect_stdout

from bench import headline_queries
from privacy_cdc_lakehouse_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUND = os.environ.get("SPARK_GRAFT_ROUND", "r16")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", ROUND
)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("capture_plans")
    qs = headline_queries()
    if names:
        # any registered query, not just the headline set
        from privacy_cdc_lakehouse_spark.queries import all_queries

        qs = dict(qs, **all_queries())
    os.makedirs(OUT, exist_ok=True)
    for name, fn in qs.items():
        if names and name not in names:
            continue
        if not names and name not in __import__("bench").HEADLINE:
            continue
        df = fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)")


if __name__ == "__main__":
    main()
