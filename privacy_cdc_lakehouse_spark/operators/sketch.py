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


def hist_sketch_build(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 256,
) -> DataFrame:
    """Build a MERGEABLE fixed-grid histogram sketch over a numeric
    column — the quantile companion of :func:`cms_build` (frequencies)
    and the HLL store (distincts): at most ``n_bins + 2`` rows of
    (bin, n), where bin -1 / ``n_bins`` are the underflow / overflow
    bins for values outside [lo, hi). The grid is FIXED at build time
    — that is what makes two sketches mergeable by plain counter
    addition (a t-digest's adaptive centroids are float-summation-
    order dependent and not engine-replayable; the fixed grid is this
    repo's standing PSI/KS discipline). Quantile answers are
    BIN-QUANTIZED: error ≤ (hi-lo)/n_bins, chosen at build time.

    Scale: one projection + ONE map-side-combinable groupBy whose
    shuffle carries ≤ n_bins+2 rows per input partition — sketch
    size, never corpus size. NULLs are skipped."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got lo={lo} hi={hi}")
    v = F.col(value_col).cast("double")
    width = (float(hi) - float(lo)) / float(n_bins)
    raw = F.floor((v - F.lit(float(lo))) / F.lit(width))
    bin_ = (
        F.when(v < F.lit(float(lo)), F.lit(-1))
        .when(v >= F.lit(float(hi)), F.lit(n_bins))
        .otherwise(F.least(F.lit(n_bins - 1), raw))
        .cast("int")
    )
    return (
        df.filter(v.isNotNull())
        .select(bin_.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
        # grid params STAMPED on every row (constant columns — parquet
        # RLE makes a persisted sketch's stamp free): a different-grid
        # artifact yields same-shaped (bin, n) rows, undetectable from
        # the data itself — the lsh_index stamp discipline
        .select(
            "bin",
            "n",
            F.lit(float(lo)).alias("_lo"),
            F.lit(float(hi)).alias("_hi"),
            F.lit(n_bins).alias("_bins"),
        )
    )


def hist_sketch_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the SAME (lo, hi, n_bins) grid: pure
    counter addition (union + one ≤ n_bins+2-row groupBy). The grid
    stamps ride the group key, so a mixed-grid merge produces rows
    whose stamps disagree — :func:`hist_sketch_quantile`'s stamp
    assertion then fails loudly instead of summing apples and
    oranges."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return (
        out.groupBy("bin", "_lo", "_hi", "_bins")
        .agg(F.sum("n").alias("n"))
        .select("bin", "n", "_lo", "_hi", "_bins")  # the build's order
    )


def hist_sketch_quantile(
    sketch: DataFrame,
    qs: list[float],
    lo: float,
    hi: float,
    n_bins: int = 256,
) -> DataFrame:
    """Quantile estimates from a histogram sketch: for each requested
    ``q`` the UPPER EDGE of the first bin whose cumulative share
    reaches ``q`` (the :func:`text.perplexity_buckets` cut rule) —
    within (hi-lo)/n_bins of the true quantile for in-range data; an
    underflow hit answers ``lo``, an overflow hit ``hi``. Pass the
    SAME (lo, hi, n_bins) the sketch was built with — enforced
    against the build-time grid STAMP via the ``assert_true`` filter
    idiom (``lsh_index``'s runtime guard: a wrong-grid read would
    yield confidently wrong quantiles, undetectable from the data).
    Pure arithmetic over the ≤ n_bins+2-row sketch (windows bounded
    by the sketch, engine-replayable exactly). Output: (q, value
    6dp)."""
    from pyspark.sql import Window

    if not qs or not all(0.0 < q <= 1.0 for q in qs):
        raise ValueError(f"qs must be in (0, 1], got {qs}")
    missing = {"_lo", "_hi", "_bins"} - set(sketch.columns)
    if missing:
        raise ValueError(
            f"hist sketch lacks its grid stamp columns {sorted(missing)} "
            "— rebuild it with hist_sketch_build()"
        )
    ok = (
        (F.col("_lo") == float(lo))
        & (F.col("_hi") == float(hi))
        & (F.col("_bins") == n_bins)
    )
    sketch = sketch.filter(
        F.assert_true(
            ok,
            F.lit(
                f"hist sketch grid stamp does not match lo={lo} hi={hi} "
                f"n_bins={n_bins} (or a mixed-grid merge) — rebuild or "
                "query with the build params"
            ),
        ).isNull()
    )
    width = (float(hi) - float(lo)) / float(n_bins)
    w = Window.partitionBy(F.lit(1)).orderBy("bin")  # bounded: sketch rows
    cum = sketch.select(
        "bin",
        (
            F.sum("n").over(w) / F.sum("n").over(Window.partitionBy(F.lit(1)))
        ).alias("_cum"),
    )
    rows = []
    for q in qs:
        first = F.min(
            F.when(F.col("_cum") >= F.lit(float(q)), F.col("bin"))
        )
        edge = (
            F.when(first < 0, F.lit(float(lo)))
            .when(first >= n_bins, F.lit(float(hi)))
            .otherwise(F.lit(float(lo)) + (first + 1) * F.lit(width))
        )
        rows.append(
            F.struct(
                F.lit(float(q)).alias("q"), F.round(edge, 6).alias("value")
            )
        )
    return (
        cum.agg(F.array(*rows).alias("_r"))
        .select(F.explode("_r").alias("r"))
        .select("r.q", "r.value")
    )


def bloom_build(
    df: DataFrame,
    item_col: str,
    m_bits: int = 8192,
    k: int = 4,
) -> DataFrame:
    """Build a Bloom filter (Bloom 1970) over ``item_col`` as a
    DataFrame — the membership companion of :func:`cms_build`
    (frequencies) / the HLL store (distincts) / :func:`hist_sketch_build`
    (quantiles): the filter IS the distinct set of set bit positions,
    one (pos) row each, at most ``m_bits`` rows. Mergeable by plain
    union+distinct (:func:`bloom_merge`) — the standard use is a
    bounded seen-list screen (URLs already crawled, ids already
    ingested) probed BEFORE an expensive exact lookup: no false
    negatives ever; false positives at the classic
    ``(1 - e^(-kn/m))^k`` rate.

    Bit positions are portable md5 arithmetic (the repo's seeded-
    randomness contract): ``pos_i = int(md5('bloom<i>|' || item)
    hex[:13], 16) % m_bits`` — exactly replayable in DuckDB. NULL
    items are skipped. Scale: each row expands to ``k`` positions via
    a per-row array (no join); the ONE distinct's shuffle carries at
    most ``m_bits`` combined rows per partition — sketch size, never
    corpus size."""
    if m_bits < 2 or k < 1:
        raise ValueError(f"need m_bits >= 2 and k >= 1, got {m_bits}, {k}")
    item = F.col(item_col).cast("string")
    return (
        df.filter(item.isNotNull())
        .select(F.explode(_bloom_positions(item, m_bits, k)).alias("pos"))
        .distinct()
        # (m_bits, k) STAMPED on every row (the lsh_index discipline;
        # parquet RLE makes a persisted filter's stamp free): probing
        # with the wrong params yields confidently wrong membership,
        # undetectable from the bit set itself
        .select("pos", F.lit(m_bits).alias("_m"), F.lit(k).alias("_k"))
    )


def _bloom_positions(item: Column, m_bits: int, k: int) -> Column:
    """The k md5 bit positions of one item — ONE shared definition so
    build and probe cannot drift apart (a divergent copy would make
    every lookup silently degrade toward false)."""
    return F.array(
        *[
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"bloom{i}|"), item)), 1, 13
                    ),
                    16,
                    10,
                ).cast("long")
                % m_bits
            ).cast("int")
            for i in range(k)
        ]
    )


def bloom_merge(*filters: DataFrame) -> DataFrame:
    """Merge Bloom filters built with the SAME (m_bits, k, hash):
    union of set bits (one ≤ m_bits-row distinct). The param stamps
    ride the distinct key, so a mixed-param merge produces rows whose
    stamps disagree — :func:`bloom_might_contain`'s stamp assertion
    then fails loudly."""
    if not filters:
        raise ValueError("need at least one filter")
    out = filters[0]
    for f in filters[1:]:
        out = out.unionByName(f)
    return out.distinct()


def bloom_might_contain(
    bloom: DataFrame,
    probes: DataFrame,
    item_col: str,
    m_bits: int = 8192,
    k: int = 4,
) -> DataFrame:
    """Probe a Bloom filter: an item is maybe-present iff ALL ``k`` of
    its bit positions are set. Pass the SAME (m_bits, k) the filter
    was built with — enforced against the build-time param STAMP via
    the ``assert_true`` filter idiom (``lsh_index``'s runtime guard).
    Output: probes + ``might_contain`` boolean (true
    may be a false positive; false is definitive — the Bloom
    contract). A NULL probe item answers explicit FALSE: the build
    skips NULLs, so it is definitively absent (a NULL here would make
    ``NOT might_contain`` filters silently drop the row from both
    branches). Scale: the probe explodes to k positions and joins the
    ≤ m_bits-row filter (AQE broadcasts it); per-probe recombine is a
    k-bounded groupBy."""
    if m_bits < 2 or k < 1:
        raise ValueError(f"need m_bits >= 2 and k >= 1, got {m_bits}, {k}")
    missing = {"_m", "_k"} - set(bloom.columns)
    if missing:
        raise ValueError(
            f"bloom filter lacks its param stamp columns {sorted(missing)} "
            "— rebuild it with bloom_build()"
        )
    bloom = bloom.filter(
        F.assert_true(
            (F.col("_m") == m_bits) & (F.col("_k") == k),
            F.lit(
                f"bloom filter param stamp does not match m_bits={m_bits} "
                f"k={k} (or a mixed-param merge) — rebuild or probe with "
                "the build params"
            ),
        ).isNull()
    ).select("pos")
    item = F.col(item_col).cast("string")
    probed = probes.select(
        item_col, F.explode(_bloom_positions(item, m_bits, k)).alias("pos")
    )
    hits = (
        probed.join(bloom.withColumn("_set", F.lit(1)), "pos", "left")
        .groupBy(item_col)
        .agg((F.count(F.lit(1)) == F.sum(F.coalesce("_set", F.lit(0)))).alias(
            "_mc"
        ))
    )
    return probes.join(hits, item_col, "left").select(
        *[F.col(c) for c in probes.columns],
        F.coalesce(F.col("_mc"), F.lit(False)).alias("might_contain"),
    )


# --- KMV / theta sketch ------------------------------------------------------

# 16^13: the value space of the 13-nibble md5 prefix. Fits a BIGINT
# (4.5e15 < 2^63) so θ arithmetic stays in exact integers until the
# final double division.
KMV_SPACE = 16 ** 13


def _kmv_hash(item: Column) -> Column:
    """Portable 52-bit item hash: int(md5('kmv|' || item) hex[:13], 16)
    — the repo's md5 nibble idiom (same contract as the Bloom bit
    positions), exactly replayable in DuckDB."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit("kmv|"), item.cast("string"))), 1, 13),
        16,
        10,
    ).cast("long")


def kmv_build(df: DataFrame, item_col: str, k: int = 64) -> DataFrame:
    """Build a KMV (k-minimum-values) distinct sketch (Bar-Yossef et
    al. 2002; the theta-sketch family): the ``k`` SMALLEST distinct
    item hashes. Unlike the HLL store this supports set INTERSECTION
    estimation (:func:`kmv_intersect_estimate`) — the one operation
    HLL registers cannot answer without inclusion-exclusion blow-up.

    Rows: (hv, _k stamp), at most ``k`` of them. NULL items skipped.
    Scale: one distinct on the hash column, then a TakeOrdered top-k
    (per-partition heads merged on the driver-side take — never a
    global sort). Deterministic by construction: the sketch IS a pure
    function of the input SET, so build == merge-of-partial-builds
    (pytest-pinned) and the DuckDB oracle replays it exactly."""
    if k < 2:
        raise ValueError(f"need k >= 2, got {k}")
    item = F.col(item_col)
    return (
        df.filter(item.isNotNull())
        .select(_kmv_hash(item).alias("hv"))
        .distinct()
        .orderBy("hv")
        .limit(k)
        .select("hv", F.lit(k).alias("_k"))
    )


def _kmv_assert_stamp(sketch: DataFrame, k: int) -> DataFrame:
    """Fail loudly if the sketch was built with a different k (the
    Bloom param-stamp discipline): estimates under a wrong k are
    confidently wrong, undetectable from the hash set itself."""
    if "_k" not in sketch.columns:
        raise ValueError("not a KMV sketch (missing _k stamp) — build with kmv_build()")
    return sketch.filter(
        F.assert_true(
            F.col("_k") == k,
            F.lit(f"KMV sketch param stamp does not match k={k}"),
        ).isNull()
    ).select("hv")


def kmv_merge(*sketches: DataFrame, k: int = 64) -> DataFrame:
    """Merge KMV sketches built with the SAME ``k``: distinct union of
    hashes, keep the k smallest — identical to building over the
    unioned inputs (the mergeability law the pytest pins). Cost: a
    ≤ len(sketches)·k row union."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = _kmv_assert_stamp(sketches[0], k)
    for s in sketches[1:]:
        out = out.unionByName(_kmv_assert_stamp(s, k))
    return (
        out.distinct().orderBy("hv").limit(k).select("hv", F.lit(k).alias("_k"))
    )


def kmv_distinct_estimate(sketch: DataFrame, k: int = 64) -> DataFrame:
    """1-row estimate of the distinct count. Saturated sketch
    (|sketch| == k): the classic KMV estimator (k-1)/θ_k with
    θ_k = kth-min-hash / KMV_SPACE (relative error ~1/sqrt(k-2)).
    Unsaturated: the sketch IS the distinct hash set — exact count.
    Output: (n_est double 4dp, exact boolean)."""
    s = _kmv_assert_stamp(sketch, k)
    return s.agg(
        F.count(F.lit(1)).alias("_c"), F.max("hv").alias("_kth")
    ).select(
        F.round(
            F.when(F.col("_c") < k, F.col("_c").cast("double")).otherwise(
                F.lit(float(k - 1)) * F.lit(float(KMV_SPACE)) / F.col("_kth")
            ),
            4,
        ).alias("n_est"),
        (F.col("_c") < k).alias("exact"),
    )


def kmv_intersect_estimate(
    a: DataFrame, b: DataFrame, k: int = 64
) -> DataFrame:
    """Theta-style intersection estimate: θ = min(θ_a, θ_b) where
    θ_x = kth-min of x when saturated else KMV_SPACE (exact regime);
    count common hashes below θ; estimate = common · KMV_SPACE / θ.
    When BOTH sketches are unsaturated θ = KMV_SPACE and the estimate
    is the EXACT hash-set intersection size. Output 1 row:
    (n_common long, n_est double 4dp). Scale: the join is
    sketch-sized (≤ k vs ≤ k, AQE-broadcast), the θ scalars ride
    broadcast 1-row aggregates."""

    def theta(s: DataFrame, name: str) -> DataFrame:
        return _kmv_assert_stamp(s, k).agg(
            F.when(F.count(F.lit(1)) >= k, F.max("hv"))
            .otherwise(F.lit(KMV_SPACE))
            .alias(name)
        )

    common = _kmv_assert_stamp(a, k).join(_kmv_assert_stamp(b, k), "hv")
    return (
        common.crossJoin(F.broadcast(theta(a, "_ta")))
        .crossJoin(F.broadcast(theta(b, "_tb")))
        .select("hv", F.least("_ta", "_tb").alias("_t"))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("hv") < F.col("_t"), 1)), F.lit(0)
            ).alias("n_common"),
            F.coalesce(F.min("_t"), F.lit(KMV_SPACE)).alias("_t"),
        )
        .select(
            F.col("n_common").cast("long").alias("n_common"),
            F.round(
                F.col("n_common")
                * F.lit(float(KMV_SPACE))
                / F.col("_t").cast("double"),
                4,
            ).alias("n_est"),
        )
    )
