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

    The scatter is ``monotonically_increasing_id() % salt`` — a
    per-ROW spread. A content hash of the row would NOT work for the
    canonical skew case: a hot key's rows are often byte-identical
    (same key, same payload), so they'd all hash to ONE salt bucket and
    the straggler task would survive salting entirely (round-5 review
    finding). The id is partition-dependent, but the JOIN RESULT is
    invariant to which bucket a row lands in — only physical placement
    varies — so results stay correct and deterministic.

    Only ``inner`` and ``left`` joins are sound under replication: in a
    right/full outer join every unmatched right row would surface once
    per replica (×salt duplicates). ``pmod`` maps to [0, salt) for any
    input sign.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r}: "
            "replicated right rows would duplicate outer-side output"
        )
    left_salted = left.withColumn(
        "_salt",
        F.pmod(F.monotonically_increasing_id(), F.lit(salt)).cast("int"),
    )
    right_salted = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = left_salted.join(right_salted, [on, "_salt"], how)
    return out.drop("_salt")
