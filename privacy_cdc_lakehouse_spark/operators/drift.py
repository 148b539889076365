"""Distribution-drift detection between two samples of a column.

The monitoring layer a 100 TB training-data pipeline runs between
ingestion batches (and the production counterpart of the reference's
DQ counters, ``README.md`` roadmap "data quality metrics"): has the
distribution of a feature / score / length moved since the reference
window? Implements the standard model-monitoring metrics:

- **PSI** (population stability index, the banking-industry standard):
  ``sum((q_i - p_i) * ln(q_i / p_i))`` over histogram bins — fixed-width
  bins anchored on the REFERENCE sample's [min, max] so the metric is
  pure arithmetic (engine-identical; quantile binning would need exact
  percentiles, which degrade at scale — the fixed grid is the scale
  path). Empty-bin shares are floored at ``eps`` (the usual smoothing).
- **Categorical PSI**: same statistic with categories as bins (no
  binning pass; unseen-in-either-side categories smoothed the same
  way).
- **KS statistic** (two-sample Kolmogorov–Smirnov D): computed exactly
  on the binned distributions — ``max |cumF_ref - cumF_cur|`` over the
  shared grid. Quantizing first is what makes it scale: the cumulative
  window runs over ≤ ``n_bins`` rows, never the corpus.
- **Moment drift**: mean/stddev per side (one aggregate each), the
  cheap first-alarm numbers every report leads with.

Scale shape: two corpus scans (one per side) → map-side-combinable
``groupBy(bin)`` counts (shuffle carries ≤ |bins| rows per side) →
all remaining work on ≤ |bins| rows. The only windows are over that
bounded bin frame (explicitly NOT corpus-sized); the reference bounds
ride a broadcast 1-row scalar. All metrics rounded to 6dp — the
standing cross-engine determinism contract for log/division math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_EPS = 1e-6


def _tagged_union(ref: DataFrame, cur: DataFrame, expr) -> DataFrame:
    """Union both samples under one plan with a side tag, projecting
    ``expr(df)`` as the value column."""
    r = ref.select(expr(ref).alias("_v"), F.lit(1).alias("_ref"), F.lit(0).alias("_cur"))
    c = cur.select(expr(cur).alias("_v"), F.lit(0).alias("_ref"), F.lit(1).alias("_cur"))
    return r.unionByName(c)


def binned_histogram(
    ref: DataFrame, cur: DataFrame, value_col: str, n_bins: int = 10
) -> DataFrame:
    """Per-bin shares of both samples over a fixed-width grid anchored
    on the reference's [min, max]: (bin, p_ref, p_cur). Out-of-range
    current values clamp into the edge bins (the standard treatment —
    drift OUT of the reference range must register, not vanish).
    NULL values are excluded on both sides."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    bounds = ref.agg(
        F.min(value_col).cast("double").alias("_lo"),
        F.max(value_col).cast("double").alias("_hi"),
    )
    both = (
        _tagged_union(ref, cur, lambda d: F.col(value_col).cast("double"))
        .filter(F.col("_v").isNotNull())
        .crossJoin(F.broadcast(bounds))
    )
    # degenerate reference (constant column): everything lands in bin 0
    width = F.when(
        F.col("_hi") > F.col("_lo"),
        (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bins)),
    )
    raw = F.floor((F.col("_v") - F.col("_lo")) / width)
    bin_ = F.coalesce(
        F.greatest(F.lit(0), F.least(F.lit(n_bins - 1), raw)), F.lit(0)
    ).cast("int")
    counts = (
        both.select(bin_.alias("bin"), "_ref", "_cur")
        .groupBy("bin")
        .agg(F.sum("_ref").alias("_n_ref"), F.sum("_cur").alias("_n_cur"))
    )
    # totals via an unpartitioned window — bounded: the frame is the
    # ≤ n_bins count rows, never the corpus
    w = Window.partitionBy(F.lit(1))
    # try_divide: an EMPTY side (total 0) yields NULL shares instead of
    # an ANSI divide-by-zero — downstream smoothing floors handle it
    return counts.select(
        "bin",
        F.try_divide(F.col("_n_ref"), F.sum("_n_ref").over(w)).alias("p_ref"),
        F.try_divide(F.col("_n_cur"), F.sum("_n_cur").over(w)).alias("p_cur"),
    )


def categorical_shares(
    ref: DataFrame, cur: DataFrame, value_col: str
) -> DataFrame:
    """Per-category shares of both samples: (category, p_ref, p_cur).
    Categories absent from one side get share 0 (smoothed by the PSI
    epsilon downstream). Scale: one groupBy on the category — shuffle
    is |categories|-sized after map-side combine."""
    counts = (
        _tagged_union(ref, cur, lambda d: F.col(value_col).cast("string"))
        .groupBy(F.col("_v").alias("category"))
        .agg(F.sum("_ref").alias("_n_ref"), F.sum("_cur").alias("_n_cur"))
    )
    w = Window.partitionBy(F.lit(1))
    return counts.select(
        "category",
        F.try_divide(F.col("_n_ref"), F.sum("_n_ref").over(w)).alias("p_ref"),
        F.try_divide(F.col("_n_cur"), F.sum("_n_cur").over(w)).alias("p_cur"),
    )


def _psi_of_shares(shares: DataFrame) -> DataFrame:
    p = F.greatest(F.col("p_ref"), F.lit(_EPS))
    q = F.greatest(F.col("p_cur"), F.lit(_EPS))
    return shares.agg(
        F.round(F.sum((q - p) * F.log(q / p)), 6).alias("psi")
    )


def psi(
    ref: DataFrame, cur: DataFrame, value_col: str, n_bins: int = 10
) -> DataFrame:
    """Population stability index over reference-anchored fixed-width
    bins; 1-row (psi double). Rule of thumb: < 0.1 stable, 0.1-0.25
    moderate shift, > 0.25 action."""
    return _psi_of_shares(binned_histogram(ref, cur, value_col, n_bins))


def categorical_psi(ref: DataFrame, cur: DataFrame, value_col: str) -> DataFrame:
    """PSI with categories as bins; 1-row (psi double)."""
    return _psi_of_shares(categorical_shares(ref, cur, value_col))


def _divergences_of_shares(shares: DataFrame) -> DataFrame:
    """Jensen-Shannon divergence (nats), chi-square on shares, total
    variation distance — all from one shares frame (≤ |bins| rows),
    long-format (metric, value). JS and chi2 use the PSI epsilon floor
    (log/division need it); TV is absolute-difference arithmetic, so
    it uses the RAW shares with nulls as 0 (an empty side is simply
    'all mass moved')."""
    p = F.greatest(F.col("p_ref"), F.lit(_EPS))
    q = F.greatest(F.col("p_cur"), F.lit(_EPS))
    m = (p + q) / F.lit(2.0)
    p0 = F.coalesce(F.col("p_ref"), F.lit(0.0))
    q0 = F.coalesce(F.col("p_cur"), F.lit(0.0))
    return shares.agg(
        F.round(
            F.lit(0.5) * F.sum(p * F.log(p / m))
            + F.lit(0.5) * F.sum(q * F.log(q / m)),
            6,
        ).alias("js"),
        F.round(F.sum(F.pow(q - p, F.lit(2.0)) / p), 6).alias("chi2"),
        F.round(F.lit(0.5) * F.sum(F.abs(q0 - p0)), 6).alias("tv"),
    ).selectExpr(
        "stack(3, 'js', js, 'chi2', chi2, 'tv', tv) AS (metric, value)"
    )


def js_divergence(
    ref: DataFrame, cur: DataFrame, value_col: str, n_bins: int = 10
) -> DataFrame:
    """Jensen-Shannon divergence (nats) over reference-anchored bins;
    1-row (js double). Symmetric and bounded by ln 2 — the standard
    'how different are these corpora' number next to PSI's
    'how far did production move' framing."""
    return (
        _divergences_of_shares(binned_histogram(ref, cur, value_col, n_bins))
        .filter(F.col("metric") == "js")
        .select(F.col("value").alias("js"))
    )


def chi_square_drift(
    ref: DataFrame, cur: DataFrame, value_col: str, n_bins: int = 10
) -> DataFrame:
    """Chi-square statistic ON SHARES (``sum((q-p)^2 / p)``, epsilon-
    floored) over reference-anchored bins; 1-row (chi2 double). The
    share form is sample-size-invariant — the count-weighted test
    statistic is just N_cur times it if a p-value is wanted."""
    return (
        _divergences_of_shares(binned_histogram(ref, cur, value_col, n_bins))
        .filter(F.col("metric") == "chi2")
        .select(F.col("value").alias("chi2"))
    )


def ks_statistic(
    ref: DataFrame, cur: DataFrame, value_col: str, n_bins: int = 1000
) -> DataFrame:
    """Two-sample KS statistic on the quantized (binned) distributions:
    ``max |cumF_ref - cumF_cur|`` over the shared grid; 1-row
    (ks double). Exact KS over raw values needs a totally-ordered pass
    over every distinct value — the n_bins grid bounds that window at
    any corpus size (and 1000 bins bounds the quantization error of D
    at 0.001 for the reference side)."""
    shares = binned_histogram(ref, cur, value_col, n_bins)
    w = Window.partitionBy(F.lit(1)).orderBy("bin")  # bounded: ≤ n_bins rows
    cums = shares.select(
        (F.sum("p_ref").over(w) - F.sum("p_cur").over(w)).alias("_d")
    )
    return cums.agg(F.round(F.max(F.abs(F.col("_d"))), 6).alias("ks"))


def drift_report(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    n_bins: int = 10,
    ks_bins: int = 1000,
    categorical_col: str | None = None,
) -> DataFrame:
    """The monitoring panel as long-format (metric, value) rows: psi,
    js, chi2, tv, ks, per-side counts / means / sample-stddevs, plus
    categorical PSI over ``categorical_col`` when given.

    Cost discipline: ONE binning pass at the fine (``ks_bins``) grid
    feeds both KS and PSI — the coarse PSI histogram is the fine one
    re-bucketed (exact, since the grids share anchors and
    ``ks_bins % n_bins == 0`` is enforced); moments are one tagged
    two-side scan. So the whole numeric panel costs two scans per side
    (+1 for the categorical column), everything downstream ≤ |bins|
    rows; rounded 6dp."""
    if ks_bins % n_bins:
        raise ValueError(
            f"ks_bins ({ks_bins}) must be a multiple of n_bins ({n_bins}) "
            "so the PSI histogram is an exact re-bucketing of the KS grid"
        )
    fine = binned_histogram(ref, cur, value_col, ks_bins)
    coarse = fine.groupBy(
        F.floor(F.col("bin") / F.lit(ks_bins // n_bins)).cast("int").alias("bin")
    ).agg(F.sum("p_ref").alias("p_ref"), F.sum("p_cur").alias("p_cur"))
    psi_row = _psi_of_shares(coarse).select(
        F.lit("psi").alias("metric"), F.col("psi").alias("value")
    )
    # round-11: JS / chi-square / total-variation ride the SAME coarse
    # histogram — three more ≤|bins|-row aggregates, zero extra scans
    div_rows = _divergences_of_shares(coarse)
    w = Window.partitionBy(F.lit(1)).orderBy("bin")  # bounded: ≤ ks_bins rows
    # round 12: Wasserstein-1 (earth mover's) rides the SAME cumulative
    # diffs as KS — W1 on the quantized grid is Σ|cumF_ref − cumF_cur|
    # per GRID step, reported DOMAIN-NORMALIZED (÷ ks_bins, grid span
    # = 1): 0 = identical, →1 = all mass moved across the whole range.
    # The histogram frame is SPARSE (absent bins carry no row), so each
    # present bin's cum diff is gap-weighted by the distance to the
    # next present bin — the cum is constant across empty bins, making
    # this the EXACT grid EMD, not an approximation.
    cums = fine.select(
        "bin", (F.sum("p_ref").over(w) - F.sum("p_cur").over(w)).alias("_d")
    ).withColumn(
        "_gap",
        F.coalesce(F.lead("bin").over(w), F.lit(ks_bins)) - F.col("bin"),
    )
    ks_stat = cums.agg(
        F.round(F.max(F.abs(F.col("_d"))), 6).alias("ks"),
        F.round(
            F.sum(F.abs(F.col("_d")) * F.col("_gap")) / F.lit(float(ks_bins)),
            6,
        ).alias("w1"),
    )
    ks_row = ks_stat.selectExpr(
        "stack(2, 'ks', ks, 'w1', w1) AS (metric, value)"
    )
    # per-side count/mean/std from ONE tagged two-side scan; the SAME
    # aggregate subtree also supplies the KS p-value's sample sizes
    # below (identical exchange → Spark's exchange reuse dedups it —
    # the round-11 separate `sizes` scan per panel/micro-batch is gone,
    # a round-11 advice finding)
    side_stats = (
        _tagged_union(ref, cur, lambda d: F.col(value_col).cast("double"))
        .filter(F.col("_v").isNotNull())
        .groupBy(F.col("_ref").alias("_side"))
        .agg(
            F.count("_v").cast("double").alias("n"),
            F.round(F.avg("_v"), 6).alias("mean"),
            F.round(F.stddev_samp("_v"), 6).alias("std"),
        )
    )
    # asymptotic TWO-SIDED two-sample KS p-value: the leading term of
    # the Kolmogorov series, 2*exp(-2 D^2 nm/(n+m)), clamped to 1 —
    # pure arithmetic over the 1-row KS stat and the per-side counts
    # (both broadcast scalars). The round-11 form lacked the factor 2
    # (the one-sided/DKW bound), understating p by ~2x — round-11
    # advice finding.
    sizes = side_stats.agg(
        F.sum(F.when(F.col("_side") == 1, F.col("n"))).alias("_nr"),
        F.sum(F.when(F.col("_side") == 0, F.col("n"))).alias("_nc"),
    )
    pval_row = ks_stat.crossJoin(F.broadcast(sizes)).select(
        F.lit("ks_pvalue").alias("metric"),
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(2.0)
                * F.exp(
                    F.lit(-2.0)
                    * F.col("ks")
                    * F.col("ks")
                    * F.try_divide(
                        F.col("_nr") * F.col("_nc"),
                        F.col("_nr") + F.col("_nc"),
                    )
                ),
            ),
            6,
        ).alias("value"),
    )
    moments = side_stats.selectExpr(
        "CASE WHEN _side = 1 THEN 'ref' ELSE 'cur' END AS s", "n", "mean", "std"
    ).selectExpr(
        "stack(3, 'n_' || s, n, 'mean_' || s, mean, 'std_' || s, std)"
        " AS (metric, value)"
    )
    out = (
        psi_row.unionByName(div_rows)
        .unionByName(ks_row)
        .unionByName(pval_row)
        .unionByName(moments)
    )
    if categorical_col is not None:
        out = out.unionByName(
            categorical_psi(ref, cur, categorical_col).select(
                F.lit("psi_categorical").alias("metric"),
                F.col("psi").alias("value"),
            )
        )
    return out
