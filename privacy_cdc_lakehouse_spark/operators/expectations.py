"""Declarative data-quality expectations: validate, report, quarantine.

The reference's roadmap names a data-quality metrics table
(``/root/reference/README.md`` "data quality" item); the
``cdc_bronze_dq`` row rebuilds its counters. This module generalizes
that into the expectations layer a lakehouse actually runs per ingest
(the Great-Expectations / Delta-constraints pattern, rebuilt
Spark-first):

- **row rules** (not-null, range, regex, set membership, arbitrary SQL
  expression) compile to ONE pure projection — every rule evaluated in
  a single codegen'd pass, no rule-at-a-time scans;
- **set rules** (uniqueness, referential integrity) compile to the one
  aggregate/anti-join shape each genuinely needs;
- :func:`validate` returns the per-rule violation report (exact
  counts — it IS the DQ metrics table);
- :func:`quarantine` splits rows into (valid, invalid+reasons) for the
  standard quarantine-table ingestion flow, evaluating the row rules
  once via an array of failed rule names.

Scale: row rules add zero shuffles (projection over the scan);
``unique`` is a map-side-combinable groupBy on the key; ``referential``
is one LEFT ANTI equi-join against the dimension (un-hinted — AQE
broadcasts a small dimension, degrades to shuffle on a corpus-sized
one). The report output is |rules| rows regardless of data size.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One rule. ``kind``: 'row' (violation = predicate FALSE/NULL on a
    row), 'unique' (cols must be unique together), 'referential'
    (values of ``col`` must exist in ``ref_df[ref_col]``)."""

    name: str
    kind: str
    predicate: Column | None = None
    cols: tuple[str, ...] = field(default=())
    ref_df: DataFrame | None = None
    ref_col: str | None = None


def expect_not_null(col: str, name: str | None = None) -> Expectation:
    return Expectation(
        name or f"not_null_{col}", "row", F.col(col).isNotNull()
    )


def expect_in_range(
    col: str, lo, hi, name: str | None = None
) -> Expectation:
    """Inclusive bounds; NULL values count as violations (use an
    explicit not-null rule to report them separately)."""
    return Expectation(
        name or f"in_range_{col}",
        "row",
        (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi)),
    )


def expect_regex(col: str, pattern: str, name: str | None = None) -> Expectation:
    return Expectation(
        name or f"regex_{col}", "row", F.col(col).rlike(pattern)
    )


def expect_in_set(col: str, values: list, name: str | None = None) -> Expectation:
    return Expectation(
        name or f"in_set_{col}", "row", F.col(col).isin(values)
    )


def expect_expr(name: str, predicate: Column) -> Expectation:
    """Arbitrary boolean expression; FALSE or NULL = violation."""
    return Expectation(name, "row", predicate)


def expect_unique(*cols: str, name: str | None = None) -> Expectation:
    if not cols:
        raise ValueError("expect_unique needs at least one column")
    return Expectation(
        name or f"unique_{'_'.join(cols)}", "unique", cols=tuple(cols)
    )


def expect_referential(
    col: str, ref_df: DataFrame, ref_col: str, name: str | None = None
) -> Expectation:
    """Every non-null value of ``col`` must exist in
    ``ref_df[ref_col]`` (SQL FK semantics: NULLs are not violations —
    pair with a not-null rule to forbid them)."""
    return Expectation(
        name or f"fk_{col}",
        "referential",
        cols=(col,),
        ref_df=ref_df,
        ref_col=ref_col,
    )


def _row_violation(e: Expectation) -> Column:
    # FALSE or NULL predicate = violation (the CHECK-constraint rule)
    return (~F.coalesce(e.predicate, F.lit(False))).cast("long")


def validate(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Per-rule violation report: (rule, kind, n_violations, passed).
    All row rules share ONE aggregate pass; each set rule adds exactly
    its own aggregate/anti-join. Deterministic, exact counts."""
    if not expectations:
        raise ValueError("expectations must be non-empty")
    names = [e.name for e in expectations]
    if len(set(names)) != len(names):
        dupes = sorted({n for n in names if names.count(n) > 1})
        raise ValueError(f"duplicate expectation names: {dupes}")
    parts: list[DataFrame] = []
    row_rules = [e for e in expectations if e.kind == "row"]
    if row_rules:
        # positional aliases + a struct-array unpivot, NOT a selectExpr
        # stack with interpolated names: a rule name is caller data and
        # must never be parsed as SQL (round-10 advice finding — a
        # quote/backtick in the name broke or injected into the query)
        agg = df.agg(
            *[
                F.sum(_row_violation(e)).alias(f"_r{i}")
                for i, e in enumerate(row_rules)
            ]
        )
        stacked = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(e.name).alias("rule"),
                        F.coalesce(F.col(f"_r{i}"), F.lit(0)).alias(
                            "n_violations"
                        ),
                    )
                    for i, e in enumerate(row_rules)
                ]
            )
        )
        parts.append(
            agg.select(stacked.alias("p")).select(
                "p.rule", F.lit("row").alias("kind"), "p.n_violations"
            )
        )
    for e in expectations:
        if e.kind == "unique":
            dup = (
                df.groupBy(*e.cols)
                .agg(F.count(F.lit(1)).alias("_n"))
                .filter(F.col("_n") > 1)
                .agg(
                    F.coalesce(F.sum(F.col("_n") - 1), F.lit(0)).alias(
                        "n_violations"
                    )
                )
            )
            parts.append(
                dup.select(
                    F.lit(e.name).alias("rule"),
                    F.lit("unique").alias("kind"),
                    "n_violations",
                )
            )
        elif e.kind == "referential":
            missing = (
                df.filter(F.col(e.cols[0]).isNotNull())
                .join(
                    e.ref_df.select(
                        F.col(e.ref_col).alias(e.cols[0])
                    ).distinct(),
                    e.cols[0],
                    "left_anti",
                )
                .agg(F.count(F.lit(1)).alias("n_violations"))
            )
            parts.append(
                missing.select(
                    F.lit(e.name).alias("rule"),
                    F.lit("referential").alias("kind"),
                    "n_violations",
                )
            )
        elif e.kind != "row":
            raise ValueError(f"unknown expectation kind: {e.kind!r}")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "rule", "kind", "n_violations", (F.col("n_violations") == 0).alias("passed")
    )


def quarantine(
    df: DataFrame, expectations: list[Expectation]
) -> tuple[DataFrame, DataFrame]:
    """Split rows by the ROW rules (set rules have no single offending
    row): returns (valid, invalid) where invalid carries
    ``failed_rules`` (array of rule names, deterministic rule order).
    One shared projection evaluates every rule once; both returned
    frames derive from it (cache/persist upstream when materializing
    both sides at scale)."""
    row_rules = [e for e in expectations if e.kind == "row"]
    if not row_rules:
        raise ValueError("quarantine needs at least one row rule")
    failed = F.filter(
        F.array(
            *[
                F.when(_row_violation(e) == 1, F.lit(e.name))
                for e in row_rules
            ]
        ),
        lambda x: x.isNotNull(),
    )
    tagged = df.withColumn("failed_rules", failed)
    valid = tagged.filter(F.size("failed_rules") == 0).drop("failed_rules")
    invalid = tagged.filter(F.size("failed_rules") > 0)
    return valid, invalid
