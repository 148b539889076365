"""Skew-handling join: key salting.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
default in this engine's session) handles most skew at runtime; manual
salting remains the tool when one side must be *replicated* — e.g. a
hot grouping key feeding an aggregation, or a skewed key joining a
medium-sized table that can't broadcast whole.

``salted_join`` replicates each right-side row ``salt`` times and
scatters left rows uniformly across the salt space, so a hot key's rows
spread over ``salt`` reducers instead of one straggler task. Cost:
right side inflated ×salt — choose salt ≈ (hot-key rows / target rows
per task), keep the right side the smaller one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` with the left side's hot keys scattered over
    ``salt`` buckets and the right side replicated to meet them.

    Deterministic scatter (hash of the full row's key + a uniform
    spread via monotonically increasing id is NOT deterministic across
    runs — use a content hash) keeps results reproducible.

    Only ``inner`` and ``left`` joins are sound under replication: in a
    right/full outer join every unmatched right row would surface once
    per replica (×salt duplicates). ``pmod`` (not ``abs(...) %``) maps
    the hash to [0, salt): abs(Long.MIN_VALUE) overflows negative and
    would silently drop that row from an inner join.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r}: "
            "replicated right rows would duplicate outer-side output"
        )
    left_salted = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*left.columns), F.lit(salt)).cast("int")
    )
    right_salted = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = left_salted.join(right_salted, [on, "_salt"], how)
    return out.drop("_salt")
