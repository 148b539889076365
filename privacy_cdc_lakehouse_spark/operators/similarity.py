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


def _plane_sign(vec: Column, plane_seed: int, dim: int) -> Column:
    """Sign of <vec, r_seed> where r_seed is a deterministic ±1 plane
    derived from md5(seed|i) parity — portable pseudo-randomness."""
    signed = F.aggregate(
        F.zip_with(
            vec,
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.when(
                    F.conv(F.substring(F.md5(F.concat(F.lit(f"p{plane_seed}|"), i.cast("string"))), 1, 8), 16, 10)
                    .cast("long") % 2
                    == 0,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0)),
            ),
            lambda x, y: x * y,
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (signed >= 0).cast("int")


def lsh_bucket(vec: Column, planes: int, dim: int) -> Column:
    """Random-hyperplane LSH bucket id: concatenated sign bits."""
    return F.concat_ws(
        "", *[_plane_sign(vec, p, dim).cast("string") for p in range(planes)]
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
