"""Mergeable frequency sketches: count-min (Cormode & Muthukrishnan
2005) as a plain DataFrame.

The bounded-size answer to "how often does item X occur in 100 TB"
when the exact per-item groupBy is too big to keep: the sketch is
``depth × width`` counters (a few KB-MB, independent of corpus size),
built with ONE map-side-combinable aggregate, merged across
days/partitions/streams by pure counter addition, and probed with a
probe-sized join. Estimates never undercount; overcount is bounded by
``total_weight / width`` per hash row (take the min over rows — the
classic guarantee, pinned by a property test).

Everything is relational — the sketch IS a (row, bucket, c) DataFrame,
so it stores as a table, merges as union+groupBy, and replays exactly
in any engine. Hashing is the repo's portable md5 idiom
(engine-replayable for the oracle); a pure-Spark deployment can swap
``xxhash64(lit(i), item)`` for speed — the structure is hash-agnostic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _validate(depth: int, width: int) -> None:
    if depth < 1 or width < 1:
        raise ValueError(f"need depth, width >= 1; got {depth}x{width}")


def _bucket(item: Column, row_i: int, width: int) -> Column:
    """Portable bucket hash for sketch row ``row_i``: 13 md5 nibbles
    mod width (independent rows via the row-index salt)."""
    h = F.md5(F.concat_ws("|", F.lit(str(row_i)), item.cast("string")))
    return F.conv(F.substring(h, 1, 13), 16, 10).cast("long") % width


def cms_build(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a count-min sketch over ``item_col`` (NULL items are
    skipped; optional integer ``weight_col`` adds that much instead of
    1). Output: (row, bucket, c) — at most depth×width rows.

    Scale: each input row expands to ``depth`` (row, bucket) pairs via
    a per-row array (no join, no shuffle before the aggregate); the
    ONE groupBy's shuffle carries at most depth×width combined rows
    per input partition — the sketch size, not the corpus size."""
    _validate(depth, width)
    item = F.col(item_col)
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"), _bucket(item, i, width).alias("bucket")
            )
            for i in range(depth)
        ]
    )
    return (
        df.filter(item.isNotNull())
        .select(F.explode(pairs).alias("p"), w.alias("_w"))
        .groupBy(F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket"))
        .agg(F.sum("_w").alias("c"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the SAME depth/width/hash: pure
    counter addition — ``merge(build(A), build(B)) == build(A ∪ B)``
    exactly (pinned by test). This is what makes the sketch a
    lakehouse-maintainable aggregate: store per-day sketches, merge on
    read."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("c").alias("c"))


def cms_lookup(
    sketch: DataFrame,
    probes: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-estimate the frequency of each probe item: min over the
    sketch's rows of the item's bucket counter (never an undercount;
    absent buckets count 0). ``depth``/``width`` must match the build.
    Output: probes' ``item_col`` + ``estimate``.

    Scale: probes expand ×depth then LEFT-join the sketch on
    (row, bucket) — probe-sized work against a ≤ depth×width table
    (AQE broadcasts the sketch; it is bounded by construction)."""
    _validate(depth, width)
    item = F.col(item_col)
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"), _bucket(item, i, width).alias("bucket")
            )
            for i in range(depth)
        ]
    )
    expanded = probes.select(item_col, F.explode(pairs).alias("p")).select(
        item_col, F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket")
    )
    return (
        expanded.join(sketch, ["row", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("estimate"))
    )


# ---------------------- HLL distinct-count sketch store -----------------


def hll_store_build(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Per-group HyperLogLog sketches (Spark's Apache DataSketches
    binding): the mergeable distinct-count table a lakehouse maintains
    incrementally — build per ingest batch, store as a table, union on
    read. Output: (group cols, hll binary). One map-side-combinable
    aggregate; sketch size is 2^lg_k registers per group, independent
    of the data."""
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(item_col), F.lit(lg_k)).alias("hll")
    )


def hll_store_merge(*stores: DataFrame) -> DataFrame:
    """Merge per-batch sketch stores (same group cols + lg_k):
    register-wise union — ``merge(build(A), build(B))`` estimates
    exactly what ``build(A ∪ B)`` estimates (HLL union is register
    max; pinned by test). This is the O(churn) maintenance story for
    distinct counts: never rescan history, just union sketches."""
    if not stores:
        raise ValueError("need at least one store")
    out = stores[0]
    group_cols = [c for c in out.columns if c != "hll"]
    for s in stores[1:]:
        out = out.unionByName(s)
    return out.groupBy(*group_cols).agg(
        F.hll_union_agg(F.col("hll")).alias("hll")
    )


def hll_store_estimate(store: DataFrame) -> DataFrame:
    """Read the store: per-group distinct-count estimates (long)."""
    group_cols = [c for c in store.columns if c != "hll"]
    return store.select(
        *group_cols, F.hll_sketch_estimate(F.col("hll")).alias("n_distinct_est")
    )
