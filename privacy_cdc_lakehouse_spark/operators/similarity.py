"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, and an LSH-bucketed
(random hyperplane / SimHash-for-vectors) variant as the scale path.

Scale design (100 TB):
- Brute force is O(|queries| × |corpus|): correct only when the query
  set is small — the query side is broadcast so the corpus is scanned
  once, embarrassingly parallel, no shuffle. The per-pair dot product
  is `aggregate(zip_with(...))` — codegen'd, no Python.
- The LSH variant buckets vectors by the sign-pattern of R random
  hyperplanes (deterministic seeded pseudo-random planes derived from
  md5 bits — portable). Query cost drops to the bucket's share; recall
  is tunable via number of tables/planes. The bucket join shuffles on
  the bucket key.
- An IVF variant (k-means coarse quantizer) is the next step; with no
  MLlib dependency required it composes from groupBy + argmin over
  centroid distances. TODO(round 2+).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays (0 when either is zero)."""
    denom = _norm(a) * _norm(b)
    return F.when(denom > 0, _dot(a, b) / denom).otherwise(F.lit(0.0))


def as_double(a: Column) -> Column:
    return F.transform(a, lambda x: x.cast("double"))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors per query vector.

    queries: (query_id, embedding). Output: query_id, neighbor_id, rank,
    cos_sim — deterministic tie-break on (sim desc, neighbor_id asc).
    """
    from pyspark.sql import Window

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cvec")
    )
    q = queries.select(
        F.col("query_id"), as_double(F.col(vec_col)).alias("qvec")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("qvec"), F.col("cvec")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


def plane_vector(plane_seed: int, dim: int) -> list[float]:
    """Deterministic ±1 hyperplane from md5("p<seed>|<i>") parity.

    Driver-side derivation of the same bits the previous in-plan
    ``conv(substring(md5(...)),16,10) % 2`` computed per row — the
    planes are data-independent, so they are literals, not expressions:
    zero per-row hashing cost, and the identical ±1 list can be inlined
    into the DuckDB oracle SQL for bit-for-bit banding parity.
    """
    import hashlib

    return [
        1.0
        if int(hashlib.md5(f"p{plane_seed}|{i}".encode()).hexdigest()[:8], 16) % 2
        == 0
        else -1.0
        for i in range(dim)
    ]


def _plane_sign(vec: Column, plane_seed: int, dim: int) -> Column:
    """Sign bit of <vec, plane_seed> against the literal ±1 plane."""
    plane = F.array(*[F.lit(x) for x in plane_vector(plane_seed, dim)])
    return (_dot(vec, plane) >= 0).cast("int")


def lsh_bucket(vec: Column, planes: int, dim: int, plane_offset: int = 0) -> Column:
    """Random-hyperplane LSH bucket id: concatenated sign bits.

    ``plane_offset`` selects a disjoint plane range so multiple hash
    tables (OR-amplification) draw independent planes.
    """
    return F.concat_ws(
        "",
        *[
            _plane_sign(vec, plane_offset + p, dim).cast("string")
            for p in range(planes)
        ],
    )


def lsh_table_buckets(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    tables: int,
    band_planes: int,
    dim: int,
) -> DataFrame:
    """(id, t, bucket) for T independent hash tables of b planes each.

    OR-amplified LSH: a pair is a candidate when it collides in ANY
    table. P(candidate) = 1 - (1 - (1-θ/π)^b)^T — b controls selectivity
    (bucket count 2^b), T controls recall. One row explodes to T rows;
    the downstream self-join is an equi-join on (t, bucket): no cross
    product, shuffle keyed on the bucket space.
    """
    tagged = [
        F.struct(
            F.lit(t).alias("t"),
            lsh_bucket(
                F.col(vec_col), band_planes, dim, plane_offset=t * band_planes
            ).alias("bucket"),
        )
        for t in range(tables)
    ]
    return df.select(
        F.col(id_col), F.explode(F.array(*tagged)).alias("tb")
    ).select(id_col, F.col("tb.t").alias("t"), F.col("tb.bucket").alias("bucket"))


def lsh_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.99,
    tables: int = 12,
    band_planes: int = 12,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """Near-duplicate pairs (cosine ≥ threshold) without an all-pairs join.

    Candidates come from OR-amplified hyperplane LSH (collide in any of
    ``tables`` hash tables of ``band_planes`` sign bits); only candidates
    get the exact cosine verify. At cos ≥ 0.99 (θ ≤ 0.142 rad) a true
    pair misses one table w.p. 1-(1-θ/π)^12 ≈ 0.42 and all twelve w.p.
    0.42^12 ≈ 3e-5 — while near-orthogonal pairs collide w.p. 2^-12 per
    table, so candidate volume stays ~linear. The plan is bucket
    equi-self-join + two id equi-joins: every join hash-partitioned,
    no BroadcastNestedLoop, survives a 100× corpus.
    """
    tb = lsh_table_buckets(corpus, id_col, vec_col, tables, band_planes, dim)
    left = tb.select("t", "bucket", F.col(id_col).alias("id_a"))
    right = tb.select("t", "bucket", F.col(id_col).alias("id_b"))
    cand = (
        left.join(right, ["t", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("cos_sim", cosine(F.col("_va"), F.col("_vb")))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact rerank within the query's LSH bucket.

    Recall < 1 by construction; rows-only correctness check. At scale
    the equi-join on bucket replaces the cross join — cost drops by
    ~2^planes for uniform buckets.
    """
    from pyspark.sql import Window

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("cvec"),
    ).withColumn("bucket", lsh_bucket(F.col("cvec"), planes, dim))
    q = queries.select(
        "query_id", as_double(F.col(vec_col)).alias("qvec")
    ).withColumn("bucket", lsh_bucket(F.col("qvec"), planes, dim))
    scored = c.join(F.broadcast(q), "bucket").select(
        "query_id",
        "neighbor_id",
        cosine(F.col("qvec"), F.col("cvec")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )
