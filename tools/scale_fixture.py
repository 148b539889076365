#!/usr/bin/env python
"""Scale a testdata fixture N× for scale rehearsals.

No network in this sandbox → DuckDB's tpch dbgen extension cannot be
installed, so sf1 is synthesized from sf0.1: FACT tables (orders,
lineitem, events, documents, embeddings) replicate N× with shifted
primary keys — document text gets a per-replica suffix so the corpus
is not a degenerate 100%-duplicate set — while DIMENSION tables copy
through unchanged (dims growing slower than facts is exactly the
shape that keeps broadcast-vs-shuffle decisions honest at scale).

Usage: python tools/scale_fixture.py SRC_DIR DST_DIR FACTOR
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

# Key shift per replica — far above any fixture's real key range, so
# replica key spaces never collide.
SHIFT = 100_000_000

DIMS = ["region", "nation", "customer", "supplier", "part"]


def main() -> None:
    src, dst, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def gen(sql: str, out: str) -> None:
        path = f"{dst}/{out}.parquet"
        con.sql(f"COPY ({sql}) TO '{path}' (FORMAT PARQUET, COMPRESSION SNAPPY)")
        n_rows = con.sql(
            f"SELECT count(*) FROM read_parquet('{path}')"
        ).fetchone()[0]
        print(f"{out}: {n_rows} rows")

    rep = f"range({n}) t(i)"
    gen(
        f"""SELECT o_orderkey + i*{SHIFT} AS o_orderkey, o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM read_parquet('{src}/orders.parquet'), {rep}""",
        "orders",
    )
    gen(
        f"""SELECT l_orderkey + i*{SHIFT} AS l_orderkey, l_partkey,
               l_suppkey, l_linenumber, l_quantity, l_extendedprice,
               l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM read_parquet('{src}/lineitem.parquet'), {rep}""",
        "lineitem",
    )
    gen(
        f"""SELECT event_id + i*{SHIFT} AS event_id, ts, user_id,
               event_type, value, props
        FROM read_parquet('{src}/events.parquet'), {rep}""",
        "events",
    )
    gen(
        f"""SELECT doc_id + i*{SHIFT} AS doc_id,
               CASE WHEN i = 0 THEN text
                    ELSE text || ' r' || CAST(i AS VARCHAR) END AS text,
               lang, source,
               CAST(length(CASE WHEN i = 0 THEN text
                    ELSE text || ' r' || CAST(i AS VARCHAR) END) AS BIGINT)
                 AS n_chars
        FROM read_parquet('{src}/documents.parquet'), {rep}""",
        "documents",
    )
    gen(
        f"""SELECT vec_id + i*{SHIFT} AS vec_id, embedding, label
        FROM read_parquet('{src}/embeddings.parquet'), {rep}""",
        "embeddings",
    )
    # documents_rt (round 14, verdict task #3): the RARE-TAIL documents
    # variant the exact AllPairs similarity join can prove itself on.
    # The plain scaled corpus defeats prefix filtering BY CONSTRUCTION
    # (tiny shared vocabulary — every doc's rarest shingles still carry
    # family-crossing df, so exact-recall pruning provably degenerates);
    # real corpora have a Zipf rare tail. Synthesized deterministically
    # (no RNG): each BASE doc gets a 16-token salt tail ('zd<id>x<j>')
    # appended BEFORE the per-replica suffix, so (a) the tail's 3-gram
    # shingles are FAMILY-UNIQUE with df == replica count — the rarest
    # shingles in every doc, exactly the prefix-filter food — and (b)
    # replicas of one family still share the tail, keeping same-family
    # Jaccard >= ~(s-1)/(s+1) (only the ' rN' suffix gram differs), so
    # J >= 0.9 pairs exist to find. 16 tokens covers the prefix length
    # p = s - ceil(0.9 s) + 1 <= 12 for every doc length in the fixture.
    gen(
        f"""WITH tails AS (
            SELECT doc_id,
                   string_agg('zd' || doc_id || 'x' || j, ' ' ORDER BY j)
                     AS tail
            FROM read_parquet('{src}/documents.parquet'),
                 generate_series(1, 16) s(j)
            GROUP BY doc_id
        )
        SELECT d.doc_id + i*{SHIFT} AS doc_id,
               d.text || ' ' || tl.tail ||
                 CASE WHEN i = 0 THEN ''
                      ELSE ' r' || CAST(i AS VARCHAR) END AS text,
               d.lang, d.source,
               CAST(length(d.text || ' ' || tl.tail ||
                 CASE WHEN i = 0 THEN ''
                      ELSE ' r' || CAST(i AS VARCHAR) END) AS BIGINT)
                 AS n_chars
        FROM read_parquet('{src}/documents.parquet') d
        JOIN tails tl USING (doc_id), {rep}""",
        "documents_rt",
    )
    for t in DIMS:
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
        print(f"{t}: copied")


if __name__ == "__main__":
    main()
