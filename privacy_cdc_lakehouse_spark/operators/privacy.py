"""Privacy-preserving release operators: k-anonymity suppression,
l-diversity auditing, numeric generalization.

The reference repo's privacy layer is a masking VIEW (pseudonymized
user key, `orders_current_priv` — rebuilt as `catalog.py`'s standing
view and the `sql_privacy_view` registry row). These operators add the
other half of a privacy release pipeline: Sweeney 2002's k-anonymity
(no quasi-identifier equivalence class smaller than k) and Machanavajjhala
et al. 2007's l-diversity (each class carries >= l distinct sensitive
values), both as deterministic, oracle-checkable DataFrame shapes.

Scale shapes (100 TB):
- ``k_anonymize``: ONE map-side-combinable groupBy on the
  quasi-identifier columns produces the |classes|-row count table
  (bounded by the quasi-value cross product, not the corpus), then an
  un-hinted equi-join back tags/filters rows — AQE broadcasts the
  class table when small and degrades to shuffle when a
  high-cardinality quasi set makes it corpus-like (degrade-not-die,
  the round-10 broadcast discipline). No window over the corpus.
- ``l_diversity_audit``: one exact groupBy — |classes| output rows.
- ``generalize_numeric``: pure codegen'd projection (floor-bucket
  label), the generalization step that WIDENS classes so k-anonymity
  suppresses less.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def k_anonymize(
    df: DataFrame,
    quasi_cols: list[str],
    k: int,
    size_col: str = "class_size",
) -> DataFrame:
    """Suppression-model k-anonymity: drop every row whose
    quasi-identifier equivalence class has fewer than ``k`` members.
    Surviving rows keep all input columns plus ``size_col`` (the class
    size — useful downstream for risk scoring). Rows with a NULL in
    any quasi column form their own NULL-keyed classes (null-safe
    grouping, matching SQL ``GROUP BY``)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    classes = (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias(size_col))
        .filter(F.col(size_col) >= k)
        # prefix-rename the key columns: the class table derives from
        # df, so joining on df[c] == classes[c] is self-join-ambiguous
        .select(
            *[F.col(c).alias(f"_class_{c}") for c in quasi_cols], size_col
        )
    )
    # null-safe equi-join: eqNullSafe per quasi column so NULL-keyed
    # classes survive when large enough (plain join drops them)
    cond = None
    for c in quasi_cols:
        p = df[c].eqNullSafe(F.col(f"_class_{c}"))
        cond = p if cond is None else (cond & p)
    return df.join(classes, cond).select(
        *[df[c] for c in df.columns], F.col(size_col)
    )


def k_anonymity_audit(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """Per-class audit: (quasi cols, n, is_suppressed) — the release
    report accompanying :func:`k_anonymize` (how many classes, and how
    many rows, the chosen k suppresses)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("n"),
        (F.count(F.lit(1)) < k).alias("is_suppressed"),
    )


def l_diversity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l_threshold: int,
) -> DataFrame:
    """Distinct l-diversity audit: per quasi-identifier class, the
    exact number of distinct sensitive values and whether it reaches
    ``l_threshold`` — k-anonymity without it is vulnerable to the
    homogeneity attack (every member of a class sharing one sensitive
    value). Output: (quasi cols, n, n_sensitive, is_l_diverse)."""
    if l_threshold < 1:
        raise ValueError(f"l_threshold must be >= 1, got {l_threshold}")
    return df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(sensitive_col).alias("n_sensitive"),
        (F.countDistinct(sensitive_col) >= l_threshold).alias(
            "is_l_diverse"
        ),
    )


def generalize_numeric(col: Column, width: int) -> Column:
    """Generalization: replace a numeric quasi-identifier with its
    ``[lo,hi)`` floor-bucket label (integer ``width``) — coarser
    classes mean larger equivalence classes and less suppression.
    Integer widths only: the label must render identically in every
    engine, and float formatting does not. Pure projection; NULL
    passes through as NULL."""
    if int(width) != width or width <= 0:
        raise ValueError(f"width must be a positive integer, got {width}")
    w = int(width)
    lo = F.floor(col / F.lit(w)).cast("long") * F.lit(w)
    return F.when(
        col.isNotNull(),
        F.concat(
            F.lit("["),
            lo.cast("string"),
            F.lit(","),
            (lo + F.lit(w)).cast("string"),
            F.lit(")"),
        ),
    )


# ------------------------- differential privacy -------------------------


def seeded_uniform(key: Column, salt: str) -> Column:
    """Deterministic uniform in (0, 1] from ``md5(salt|key)`` — the
    repo's standing no-RNG-state randomness contract
    (``curation.weighted_sample``): 13 hex nibbles → (int + 1) / 2^52,
    reproducible across runs, engines and partitionings."""
    h = F.md5(F.concat_ws("|", F.lit(salt), key))
    return (
        F.conv(F.substring(h, 1, 13), 16, 10).cast("double") + 1.0
    ) / 2.0**52


def laplace_noise(key: Column, scale: float, salt: str = "dp") -> Column:
    """Laplace(0, ``scale``) noise via the inverse CDF over the seeded
    uniform: ``-scale * sgn(u - 1/2) * ln(1 - 2|u - 1/2|)``, rounded to
    6dp (cross-engine ``ln`` may drift a ulp; the value-over-rounded
    contract keeps releases engine-identical). The ``u = 1`` edge
    (probability 2^-52) clamps the log argument at 2^-53 instead of
    producing ±inf."""
    if scale <= 0:
        raise ValueError(f"scale must be positive, got {scale}")
    u = seeded_uniform(key, salt)
    mag = F.greatest(F.lit(2.0**-53), 1.0 - 2.0 * F.abs(u - 0.5))
    sign = F.when(u >= 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
    return F.round(F.lit(-float(scale)) * sign * F.log(mag), 6)


def _group_key(group_cols: list[str]) -> Column:
    # NULL group values coalesce to a sentinel so the per-class noise
    # seed stays total (concat_ws silently DROPS nulls, which would
    # alias different classes onto one seed)
    return F.concat_ws(
        "\x1f",
        *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in group_cols],
    )


def dp_count(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float,
    salt: str = "dp-count",
) -> DataFrame:
    """ε-differentially-private noisy counts per group (Dwork et al.
    2006): exact count + Laplace(1/ε) — sensitivity 1 under
    add/remove-one-row. Output: (group cols, n, dp_n).

    Determinism vs privacy: the noise is SEEDED from the class key so
    the release is testable/engine-replayable; a production release
    must use a secret per-release salt (a predictable seed lets an
    adversary subtract the noise — the ε accounting holds only while
    the salt is secret and used once).

    Scale: one map-side-combinable groupBy (|classes| rows out) + a
    pure projection. No joins, no windows."""
    if epsilon <= 0:
        raise ValueError(f"epsilon must be positive, got {epsilon}")
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    return (
        df.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            *group_cols,
            "n",
            (
                F.col("n") + laplace_noise(_group_key(group_cols), 1.0 / epsilon, salt)
            ).alias("dp_n"),
        )
    )


def dp_sum(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    epsilon: float,
    salt: str = "dp-sum",
) -> DataFrame:
    """ε-DP noisy sums per group with per-row clipping to [``lo``,
    ``hi``] — the clip bounds the per-row sensitivity at
    ``max(|lo|, |hi|)``, so noise is Laplace(sensitivity/ε). Output:
    (group cols, clipped_sum, dp_sum). Same seeded-noise determinism
    contract (and caveat) as :func:`dp_count`. Feed integer-valued
    doubles (e.g. cents) when the release must be bit-exact across
    engines: integer sums are order-independent, float sums are not."""
    if epsilon <= 0:
        raise ValueError(f"epsilon must be positive, got {epsilon}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    sens = max(abs(lo), abs(hi))
    clipped = F.least(
        F.greatest(F.col(value_col).cast("double"), F.lit(float(lo))),
        F.lit(float(hi)),
    )
    return (
        df.groupBy(*group_cols)
        .agg(F.sum(clipped).alias("clipped_sum"))
        .select(
            *group_cols,
            "clipped_sum",
            (
                F.col("clipped_sum")
                + laplace_noise(_group_key(group_cols), sens / epsilon, salt)
            ).alias("dp_sum"),
        )
    )


def dp_quantile(
    df: DataFrame,
    value_col: str,
    qs: list[float],
    lo: float,
    hi: float,
    n_bins: int = 100,
    epsilon: float = 1.0,
    salt: str = "dp-quantile",
) -> DataFrame:
    """ε-DP quantiles via the noisy-histogram mechanism (Dwork &
    Roth 2014 §3.4, the standard baseline): values clip to the
    CALLER-FIXED grid [``lo``, ``hi``) (data-independent bounds —
    required; data-derived bounds would leak), per-bin exact counts
    get Laplace(1/ε) each (one row lands in ONE bin, so parallel
    composition makes the whole histogram ε-DP, not ε·bins), noisy
    counts clamp at 0, and each quantile reports the upper edge of
    the first bin where the noisy cumulative reaches q · noisy-total.

    Same seeded-noise determinism contract (and production caveat) as
    :func:`dp_count`: noise is seeded per BIN INDEX from ``salt``, so
    the release replays bit-identically in DuckDB — the cumulative
    is an ordered ≤ n_bins-row window over 6dp-rounded addends.

    Scale: ONE map-side-combinable groupBy (≤ n_bins rows out); the
    grid completion is a generated n_bins-row frame (empty bins MUST
    be released too — their noise is part of the mechanism); the
    cumsum window runs over the bounded bin frame, never the data.
    Output: (q, value, dp_total)."""
    if epsilon <= 0:
        raise ValueError(f"epsilon must be positive, got {epsilon}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    if n_bins < 1:
        raise ValueError(f"need n_bins >= 1, got {n_bins}")
    if not qs or any(not (0.0 < q <= 1.0) for q in qs):
        raise ValueError(f"quantiles must be in (0, 1], got {qs}")
    width = (hi - lo) / n_bins
    v = F.col(value_col).cast("double")
    clipped = F.least(F.greatest(v, F.lit(float(lo))), F.lit(float(hi)))
    bin_i = F.least(
        F.floor((clipped - F.lit(float(lo))) / F.lit(width)).cast("int"),
        F.lit(n_bins - 1),
    )
    counts = (
        df.filter(v.isNotNull())
        .select(bin_i.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spark = df.sparkSession
    grid = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    noisy = (
        grid.join(counts, "bin", "left")
        .select(
            "bin",
            F.greatest(
                F.lit(0.0),
                F.coalesce(F.col("n"), F.lit(0))
                + laplace_noise(
                    F.col("bin").cast("string"), 1.0 / epsilon, salt
                ),
            ).alias("dp_n"),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = noisy.select(
        "bin",
        F.round(F.sum("dp_n").over(w), 6).alias("cum"),
    )
    total = cum.orderBy(F.desc("bin")).limit(1).select(
        F.col("cum").alias("dp_total")
    )
    edge = F.lit(float(lo)) + (F.col("bin") + 1) * F.lit(width)
    picks = None
    for q in qs:
        p = (
            cum.crossJoin(F.broadcast(total))
            .filter(F.col("cum") >= F.lit(float(q)) * F.col("dp_total"))
            .orderBy("bin")
            .limit(1)
            .select(
                F.lit(float(q)).alias("q"),
                F.round(edge, 6).alias("value"),
                F.round("dp_total", 6).alias("dp_total"),
            )
        )
        picks = p if picks is None else picks.unionByName(p)
    return picks
