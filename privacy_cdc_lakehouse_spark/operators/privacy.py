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
