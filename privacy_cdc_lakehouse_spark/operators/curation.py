"""Corpus curation for LLM training pipelines: deterministic splits and
benchmark decontamination.

Beyond the reference's own surface (no counterpart in SURVEY.md §2 —
the reference is a CDC/lakehouse demo): these are the operations a
100 TB training-data pipeline runs after dedup/quality filtering, and
they complete this repo's LLM-data story.

Scale design:
- ``hash_split`` is a pure per-row function of the document id (md5
  bucket) — no sampling pass, no shuffle, no state: a codegen'd
  projection. Crucially the assignment is STABLE under corpus growth
  (a doc's split never depends on other rows), which is what makes
  incremental ingest reproducible.
- ``ngram_contamination`` follows the published decontamination recipe
  (n-gram overlap against held-out benchmarks, à la the GPT-3 paper's
  appendix and successors): the benchmark's distinct n-gram set is
  tiny relative to the corpus, so it is broadcast; the corpus explodes
  its n-grams ONCE and aggregates hits map-side. Never an all-pairs
  document join. At 100 TB the corpus explode dominates, so checks
  against multiple benchmark sets should share one pass: materialize
  ``corpus_ngrams`` once (write it next to the corpus) and hand it to
  every ``ngram_contamination`` call via ``corpus_grams``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from privacy_cdc_lakehouse_spark.operators.dedup import shingles

SPLIT_BUCKETS = 1000
QUALITY_FLOOR = 0.7


def split_bucket(id_col: Column, salt: str = "split") -> Column:
    """Deterministic bucket in [0, SPLIT_BUCKETS) from
    ``md5(salt|id)`` — the same portable hex-slice arithmetic as the
    MinHash construction (one crypto hash; replicated bit-for-bit in
    the DuckDB oracle)."""
    h = F.md5(F.concat_ws("|", F.lit(salt), id_col.cast("string")))
    return F.conv(F.substring(h, 1, 7), 16, 10).cast("long") % SPLIT_BUCKETS


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train: float = 0.9,
    val: float = 0.05,
    salt: str = "split",
) -> DataFrame:
    """Add a ``split`` column: 'train' / 'val' / 'test' by cumulative
    bucket ranges (test = remainder). Fractions are resolved to whole
    buckets, so the realized proportions are exact multiples of
    1/SPLIT_BUCKETS."""
    if train < 0 or val < 0 or train + val > 1:
        raise ValueError(
            f"invalid split fractions train={train} val={val} "
            f"(need train, val >= 0 and train + val <= 1)"
        )
    b = split_bucket(F.col(id_col), salt)
    t_hi = int(round(train * SPLIT_BUCKETS))
    v_hi = t_hi + int(round(val * SPLIT_BUCKETS))
    return df.withColumn(
        "split",
        F.when(b < t_hi, F.lit("train"))
        .when(b < v_hi, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def epoch_shuffle_key(
    id_col: Column, epoch: int, salt: str = "epoch"
) -> Column:
    """Deterministic per-epoch shuffle key — the reproducible
    dataloader-order primitive: sort (or range-partition) training
    rows by ``md5(salt|epoch|id)`` and every worker, rerun, and resume
    sees the SAME order for a given epoch while different epochs get
    independent orders (no RNG state to checkpoint — the ``hash_split``
    determinism contract applied to ordering). A pure codegen'd
    projection; at scale feed it to ``repartitionByRange`` +
    ``sortWithinPartitions`` so the global order materializes without
    a single-partition sort."""
    return F.md5(
        F.concat_ws(
            "|", F.lit(salt), F.lit(int(epoch)).cast("string"),
            id_col.cast("string"),
        )
    )


def leakage_safe_split(
    df: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
    comp_col: str = "component",
    train: float = 0.9,
    val: float = 0.05,
    salt: str = "split",
) -> DataFrame:
    """Dedup-aware train/val/test split: bucket by the near-dup
    COMPONENT id instead of the doc id, so every member of a duplicate
    cluster lands in the SAME split — near-dups straddling train/test
    are the classic eval-leakage bug that survives doc-keyed splitting
    (Lee et al. 2022 measure it directly). ``components`` is an
    ``(id, component)`` frame from any of this repo's cluster sources
    — :func:`dedup.connected_components` over verified MinHash/SimHash
    pairs, :func:`dedup.exact_duplicates` keeper groups, or
    ``similarity.semantic_dedup`` — docs absent from it are their own
    singleton (component defaults to the doc id). Adds
    ``(_split_key, split)``; same whole-bucket fraction semantics as
    :func:`hash_split`.

    Scale shape: ONE left equi-join on the id (both sides id-keyed —
    co-partition/bucket by id at scale) followed by the same pure
    codegen'd bucket projection as ``hash_split``; growth-stable as
    long as components are (min-id components are: adding docs never
    relabels an existing cluster below its current min)."""
    key = F.coalesce(F.col(comp_col), F.col(id_col)).cast("string")
    joined = df.join(
        components.select(
            F.col(id_col), F.col(comp_col)
        ),
        id_col,
        "left",
    ).withColumn("_split_key", key)
    return hash_split(
        joined.drop(comp_col), id_col="_split_key", train=train, val=val,
        salt=salt,
    )


def corpus_ngrams(
    corpus: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exploded (id, gram) pairs for the corpus — the write-once
    artifact of decontamination. One pass over the corpus produces it;
    every benchmark set is then a broadcast join against it. Persist
    this (parquet next to the corpus) when screening more than one
    benchmark — re-exploding 100 TB per benchmark set is the cost to
    avoid. The gram size is STAMPED into the artifact (``_n``, a
    constant column — free under parquet RLE) so a consumer using a
    different ``n`` fails loudly instead of silently joining nothing
    (gram word-counts alone can't prove the build ``n``: short docs
    legitimately emit shorter grams)."""
    return corpus.select(
        F.col(id_col),
        F.explode(shingles(F.col(text_col), n)).alias("g"),
        F.lit(n).alias("_n"),
    )


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    corpus_grams: DataFrame | None = None,
) -> DataFrame:
    """(id, n_contam_grams): distinct word ``n``-grams each corpus doc
    shares with ANY benchmark doc. Decontamination = drop (or flag)
    docs with ``n_contam_grams > 0`` before training so eval numbers
    measure generalization, not memorized benchmark text.

    ``corpus_grams`` — optional pre-exploded (id, g) pairs from
    :func:`corpus_ngrams` (built with the SAME ``n``); pass it when
    screening multiple benchmark sets so the corpus explode happens
    once, not once per benchmark."""
    bg = benchmark.select(
        F.explode(shingles(F.col(text_col), n)).alias("g")
    ).distinct()
    if corpus_grams is not None:
        if "_n" not in corpus_grams.columns:
            raise ValueError(
                "corpus_grams artifact lacks its _n stamp column — "
                "rebuild it with corpus_ngrams()"
            )
        # assert_true → NULL on success; the filter keeps every valid
        # row and cannot be pruned, so an n-mismatched artifact raises
        # instead of silently reporting zero contamination.
        cg = corpus_grams.filter(
            F.assert_true(
                F.col("_n") == n,
                F.lit(
                    f"corpus_ngrams artifact was built with a different "
                    f"n (expected {n})"
                ),
            ).isNull()
        ).select(id_col, "g")
    else:
        cg = corpus_ngrams(corpus, n, text_col, id_col).select(id_col, "g")
    hits = (
        cg.join(F.broadcast(bg), "g")
        .groupBy(id_col)
        .agg(F.countDistinct("g").alias("n_contam_grams"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_contam_grams"), F.lit(0))
            .cast("long")
            .alias("n_contam_grams"),
        )
    )


def fuzzy_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    num_perm: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    corpus_signatures: DataFrame | None = None,
) -> DataFrame:
    """MinHash-level benchmark decontamination — the fuzzy twin of
    :func:`ngram_contamination`. Exact n-gram screening misses
    reformatted / lightly-paraphrased benchmark text (the overlap
    published eval-contamination audits actually find); this flags
    corpus docs whose shingle-set Jaccard against ANY benchmark doc
    clears ``threshold``, discovered via MinHash-LSH banding so the
    corpus is never joined all-pairs against the benchmark. Output:
    ``(id, n_fuzzy_docs, max_jaccard)`` for EVERY corpus doc
    (zero-filled when clean) — ``n_fuzzy_docs`` is the number of
    distinct benchmark docs near-duplicated, ``max_jaccard`` the worst
    overlap (integer-ratio double, engine-exact).

    Scale shape: benchmark signatures + banded buckets are
    benchmark-sized and BROADCAST; the corpus side reuses the
    write-once ``minhash_signatures`` artifact via
    ``corpus_signatures`` (the same amortization contract as
    ``corpus_ngrams`` — one signature pass serves every benchmark
    sweep AND the self-dedup pipeline); banding is a pure projection,
    so the broadcast bucket join adds ZERO corpus shuffles. The exact
    Jaccard verify touches only candidate docs (semi-join first, the
    ``ngram_jaccard_pairs`` discipline)."""
    from privacy_cdc_lakehouse_spark.operators import dedup as dd

    if corpus_signatures is not None:
        csig = corpus_signatures.filter(
            F.assert_true(
                F.size("signature") == num_perm,
                F.lit(
                    f"minhash signatures artifact was built with a "
                    f"different num_perm (expected {num_perm})"
                ),
            ).isNull()
        )
    else:
        csig = dd.minhash_signatures(corpus, text_col, id_col, num_perm)
    bsig = dd.minhash_signatures(benchmark, text_col, id_col, num_perm)
    bband = dd.band_buckets(bsig, id_col, num_perm, bands).select(
        F.col(id_col).alias("_bench_id"), "band", "bucket"
    )
    cband = dd.band_buckets(csig, id_col, num_perm, bands)
    cands = (
        cband.join(F.broadcast(bband), ["band", "bucket"])
        .select(id_col, "_bench_id")
        .distinct()
    )
    # Exact-Jaccard verify on candidates only: corpus docs are
    # semi-joined to the candidate id set before growing a shingle
    # array (only colliding docs pay). The benchmark side stays
    # broadcast (benchmark suites are bounded by construction); the
    # CANDIDATE shingle frame carries no hint — a contamination-heavy
    # corpus can make it corpus-scale, and AQE broadcasts it when
    # small / shuffles when not instead of OOMing on a forced
    # broadcast (round-10 hardening).
    cand_ids = cands.select(id_col).distinct()
    csh = corpus.join(cand_ids, id_col, "left_semi").select(
        F.col(id_col), shingles(F.col(text_col)).alias("sh_c")
    )
    bsh = benchmark.select(
        F.col(id_col).alias("_bench_id"),
        shingles(F.col(text_col)).alias("sh_b"),
    )
    ver = (
        cands.join(csh, id_col)
        .join(F.broadcast(bsh), "_bench_id")
        .withColumn(
            "inter", F.size(F.array_intersect("sh_c", "sh_b")).cast("double")
        )
        .withColumn("uni", F.size(F.array_union("sh_c", "sh_b")).cast("double"))
        .withColumn(
            "jaccard",
            F.when(F.col("uni") > 0, F.col("inter") / F.col("uni")).otherwise(
                0.0
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    hits = ver.groupBy(id_col).agg(
        F.countDistinct("_bench_id").alias("n_fuzzy_docs"),
        F.max("jaccard").alias("max_jaccard"),
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_fuzzy_docs"), F.lit(0))
            .cast("long")
            .alias("n_fuzzy_docs"),
            F.coalesce(F.col("max_jaccard"), F.lit(0.0)).alias("max_jaccard"),
        )
    )


def curate_corpus(
    corpus: DataFrame,
    benchmark: DataFrame,
    quality_floor: float = QUALITY_FLOOR,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    train: float = 0.9,
    val: float = 0.05,
    persist_intermediate: bool = False,
    token_budget: int | None = None,
    safe_split: bool = False,
) -> DataFrame:
    """The end-to-end curation pipeline a training run consumes:

    1. quality filter  — composite score >= ``quality_floor``
    2. exact dedup     — keeper (min id) per normalized-md5 fingerprint
    3. decontamination — drop docs sharing ANY word ``n``-gram with the
       held-out ``benchmark``
    4. (optional) budgeting — ``token_budget=`` keeps the best
       survivors by rounded quality score until the budget fills
       (:func:`token_budget_select`'s strict prefix rule)
    5. split           — deterministic growth-stable train/val/test;
       ``safe_split=True`` keys it on the exact-dup COMPONENT
       (:func:`leakage_safe_split`) so every fingerprint group —
       including the non-keeper members ALREADY dropped in stage 2 —
       maps to one split, keeping assignments stable if dropped dups
       are ever re-admitted

    Returns survivors as (id, quality_score, split). Every stage is a
    verified operator composed unchanged; the chain stays fully
    declarative, so Catalyst pipelines the whole thing (quality scoring
    and fingerprinting fuse into the scan projection; the shuffles are
    the fingerprint group and the gram join, nothing for the split).
    The ``kept`` subplan is referenced twice (gram explode + the
    contamination join back); ``persist_intermediate=True`` caches it
    so the quality+dedup subtree runs once instead of twice — the
    right call whenever the pipeline runs to completion in one job (at
    100 TB stage it to a table instead; the default stays lazy so
    callers control materialization)."""
    from privacy_cdc_lakehouse_spark.operators.dedup import normalized_fingerprint
    from privacy_cdc_lakehouse_spark.operators.text import quality_score

    scored = quality_score(corpus, text_col).filter(
        F.col("quality_score") >= quality_floor
    )
    fp = scored.select(
        id_col,
        text_col,
        "quality_score",
        normalized_fingerprint(F.col(text_col)).alias("_fp"),
    )
    keepers = fp.groupBy("_fp").agg(F.min(id_col).alias(id_col))
    kept = fp.join(keepers, ["_fp", id_col], "left_semi").drop("_fp")
    if persist_intermediate:
        # slot-bounded: repeated pipeline invocations in one session
        # (bench reps, oracle harness) hold one cached subplan, not a
        # growing pile awaiting LRU eviction.
        from privacy_cdc_lakehouse_spark.operators.util import slot_persist

        kept = slot_persist(kept, "curate_corpus_kept")
    # Inline contamination (vs calling ngram_contamination, whose
    # zero-fill join would reference `kept` a third time): hits joined
    # back once, clean = no-hit rows.
    bg = benchmark.select(
        F.explode(shingles(F.col(text_col), n)).alias("g")
    ).distinct()
    hits = (
        kept.select(F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("g"))
        .join(F.broadcast(bg), "g")
        .select(id_col)
        .distinct()
    )
    clean = kept.join(hits, id_col, "left_anti")
    if token_budget is not None:
        clean = (
            token_budget_select(
                clean.withColumn("_qs2", F.round("quality_score", 2)),
                budget=token_budget,
                score_col="_qs2",
                id_col=id_col,
                text_col=text_col,
            )
            .filter(F.col("is_selected"))
            .drop("_qs2", "_tokens", "is_selected")
        )
    if safe_split:
        comps = (
            fp.select(F.col(id_col), "_fp")
            .join(keepers.withColumnRenamed(id_col, "component"), "_fp")
            .select(id_col, "component")
        )
        out = leakage_safe_split(
            clean, comps, id_col=id_col, train=train, val=val
        )
    else:
        out = hash_split(clean, id_col, train, val)
    return out.select(
        id_col,
        F.round("quality_score", 2).alias("quality_score"),
        "split",
    )


def pack_sequences(
    df: DataFrame,
    tokens_per_pack: int = 2048,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
    salt: str = "pack",
) -> DataFrame:
    """GPT-style concat-and-chunk sequence packing: documents are
    concatenated in deterministic id order within hash shards and cut
    every ``tokens_per_pack`` tokens; a document may straddle pack
    boundaries — the standard pretraining treatment (docs separated by
    an EOS token, chunks fed as fixed-length sequences), not bin
    packing.

    Output per doc: ``shard``, ``n_tokens``, ``start_offset`` (of the
    doc's first token in its shard's concatenated stream), ``pack``
    (shard-local pack index of that first token), ``offset_in_pack``,
    and ``n_packs_spanned`` (0 for empty docs).

    100 TB shape: packing is per-shard and embarrassingly parallel —
    the only shuffle is the window's partition-by-shard exchange, and
    shard count (not corpus size) bounds each window task; size
    ``n_shards`` to the cluster. Assignment is a pure function of
    (id-set, ids, token counts), reproducible across runs; pass
    ``token_col`` when token counts are precomputed (the write-once
    pattern — counting is the scan-heavy part).
    """
    from pyspark.sql import Window

    from privacy_cdc_lakehouse_spark.operators.text import token_count

    if tokens_per_pack <= 0 or n_shards <= 0:
        raise ValueError("tokens_per_pack and n_shards must be positive")
    n_tok = (
        F.col(token_col).cast("long")
        if token_col is not None
        else token_count(F.col(text_col)).cast("long")
    )
    h = F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))
    shard = (
        F.conv(F.substring(h, 1, 7), 16, 10).cast("long") % n_shards
    ).alias("shard")
    base = df.select(F.col(id_col), shard, n_tok.alias("n_tokens"))
    w = Window.partitionBy("shard").orderBy(id_col)
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias(
        "start_offset"
    )
    out = base.select(id_col, "shard", "n_tokens", start)
    b = F.lit(tokens_per_pack)
    return out.select(
        id_col,
        "shard",
        "n_tokens",
        "start_offset",
        F.floor(F.col("start_offset") / b).cast("long").alias("pack"),
        (F.col("start_offset") % b).cast("long").alias("offset_in_pack"),
        F.when(
            F.col("n_tokens") > 0,
            F.floor((F.col("start_offset") + F.col("n_tokens") - 1) / b)
            - F.floor(F.col("start_offset") / b)
            + 1,
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_packs_spanned"),
    )


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mix",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic data-mixture downsampling: keep each row with its
    stratum's target rate, decided by the md5 bucket of the row id —
    the mixing step that turns per-domain/per-language weights into an
    actual training corpus.

    Like ``hash_split``, the keep/drop decision is a pure per-row
    function of (id, salt): no sampling pass, no shuffle, no RNG state
    — a codegen'd projection + filter — and a row's fate is stable
    under corpus growth and reruns (incremental ingest resamples
    nothing). Rates are resolved to whole buckets (multiples of
    1/SPLIT_BUCKETS); rows whose stratum is absent from ``rates`` get
    ``default_rate``. The emitted ``sample_bucket`` column makes the
    decision auditable downstream.
    """
    for k, r in rates.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate out of [0,1] for stratum {k!r}: {r}")
    if not (0.0 <= default_rate <= 1.0):
        raise ValueError(f"default_rate out of [0,1]: {default_rate}")
    b = split_bucket(F.col(id_col), salt)
    thresh = F.lit(int(round(default_rate * SPLIT_BUCKETS)))
    for k, r in sorted(rates.items()):
        thresh = F.when(
            F.col(strata_col) == k, F.lit(int(round(r * SPLIT_BUCKETS)))
        ).otherwise(thresh)
    return df.withColumn("sample_bucket", b).filter(
        F.col("sample_bucket") < thresh
    )


def token_budget_select(
    df: DataFrame,
    budget: int,
    score_col: str,
    token_col: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Quality-ranked corpus selection under a token budget — the data
    budgeting step when assembling a training mix ("take the best docs
    until we have B tokens"). Docs are ordered by (``score_col`` desc,
    id asc) and kept while the running token total stays <= ``budget``
    (strict prefix rule: the doc that would overflow is dropped and
    nothing later backfills — deterministic, growth-stable given a
    deterministic score). Output: the input plus ``(_tokens,
    is_selected)``. ``token_col`` is the precomputed-counts reuse hook
    (``pack_sequences``' contract); otherwise whitespace tokens are
    counted here. The caller owns score determinism — pass a rounded
    score (the repo-wide rank-over-rounded-score contract) or ranking
    is engine/partition-dependent.

    100 TB shape — the naive form is a GLOBAL ordered cumsum (one
    window partition = the whole corpus), so this is two-phase like
    ``stratified_sample``: (1) one map-side-combinable aggregate
    collapses the corpus to per-SCORE-bucket token sums; the running
    total over that SCORE-distribution-sized table (a single-partition
    window over |distinct scores| rows, corpus-independent) classifies
    every bucket all-in / all-out / boundary; (2) the per-doc cumsum
    window runs ONLY inside the single boundary bucket (cum totals are
    monotone, so exactly one bucket straddles the budget) — its
    partition is one score-tie group, never the corpus. Docs in
    all-in/all-out buckets are decided by the bucket join alone —
    un-hinted, so AQE broadcasts a small (rounded-score) bucket table
    and falls back to a shuffle join for a pathological unrounded
    score instead of OOMing.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    from pyspark.sql import Window

    from privacy_cdc_lakehouse_spark.operators.text import token_count

    toks = (
        F.col(token_col).cast("long")
        if token_col
        else token_count(F.col(text_col))
    )
    d = df.withColumn("_tokens", toks)
    buckets = d.groupBy(F.col(score_col).alias("_s")).agg(
        F.sum("_tokens").alias("_bt")
    )
    # running total BEFORE each bucket, over the score-distribution-
    # sized table (orderBy with no partition: |distinct scores| rows)
    wb = (
        Window.orderBy(F.desc("_s"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    buckets = buckets.select(
        "_s",
        "_bt",
        F.coalesce(F.sum("_bt").over(wb), F.lit(0)).alias("_cum_before"),
    )
    # No broadcast hint: the bucket table is |distinct scores| rows —
    # tiny when the caller rounds scores (the documented contract),
    # but corpus-sized for an unrounded float score. AQE broadcasts a
    # genuinely small bucket table at runtime and degrades to a
    # shuffle join otherwise, where a forced broadcast would OOM the
    # driver (round-10 hardening).
    d = d.join(
        buckets,
        d[score_col] == buckets["_s"],
    ).drop("_s")
    full = F.col("_cum_before") + F.col("_bt") <= budget
    # STRICT: at cum_before == budget the bucket is boundary (its
    # zero-token docs still fit), keeping two-phase == the naive
    # global-cumsum rule even on that edge; bt=0 buckets are always
    # `full`, so exactly one bucket can satisfy neither branch
    none = F.col("_cum_before") > budget
    decided = d.filter(full | none).withColumn("is_selected", full)
    # exactly one boundary bucket: per-doc cumsum window over that
    # score-tie group only
    wd = (
        Window.partitionBy(F.col(score_col))
        .orderBy(F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    boundary = (
        d.filter(~(full | none))
        .withColumn("_run", F.sum("_tokens").over(wd))
        .withColumn(
            "is_selected",
            F.col("_cum_before") + F.col("_run") <= budget,
        )
        .drop("_run")
    )
    return decided.unionByName(boundary).drop("_bt", "_cum_before")


def mixture_upsample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mixup",
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic data-mixture UP-sampling — the replication twin of
    :func:`mixture_sample` for rates ABOVE 1 (low-resource strata that
    temperature flattening says to see more than once per epoch).
    Each row is replicated ``floor(rate)`` times plus one more when its
    md5 bucket falls under the fractional part — exact expectation,
    no RNG state, and a row's replica count is a pure function of
    (id, salt): growth-stable and reproducible across reruns, the
    ``hash_split`` contract. Emits ``copy`` (0-based replica index) so
    replicas are distinguishable downstream (sequence packing, epoch
    bookkeeping); rate 0 drops the row (explode of an empty sequence).

    Scale shape: a codegen'd projection + ``explode(sequence)`` — no
    shuffle, no join; output size is the ceil-expectation of the
    rates. Compose: ``temperature_rates`` → rates > 1 here, rates < 1
    to ``mixture_sample``."""
    for k, r in rates.items():
        if r < 0:
            raise ValueError(f"rate must be >= 0 for stratum {k!r}: {r}")
    if default_rate < 0:
        raise ValueError(f"default_rate must be >= 0: {default_rate}")

    def n_copies(rate: float):
        base = int(rate)
        extra = int(round((rate - base) * SPLIT_BUCKETS))
        return base, extra

    b = split_bucket(F.col(id_col), salt)
    d_base, d_extra = n_copies(default_rate)
    n = F.lit(d_base) + (b < d_extra).cast("int")
    for k, r in sorted(rates.items()):
        kb, ke = n_copies(r)
        n = F.when(
            F.col(strata_col) == k, F.lit(kb) + (b < ke).cast("int")
        ).otherwise(n)
    copies = F.when(
        n >= 1, F.sequence(F.lit(0), (n - 1).cast("int"))
    ).otherwise(F.array().cast("array<int>"))
    return df.withColumn("copy", F.explode(copies))


def temperature_rates(
    df: DataFrame,
    alpha: float = 0.5,
    strata_col: str = "lang",
    token_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Temperature-smoothed mixture rates — the multilingual exponent
    sampling recipe (mBERT / XLM-R, Conneau et al. 2020: sample
    stratum i with probability q_i ∝ p_i^alpha). Emits per-stratum
    keep-RATES for :func:`mixture_sample`: ``rate_i ∝ p_i^(alpha-1)``
    normalized so the SMALLEST stratum keeps everything (rate 1.0) —
    high-resource strata are down-sampled toward the flattened target
    instead of duplicating low-resource data. ``alpha=1`` reproduces
    the natural distribution (all rates 1); ``alpha → 0`` flattens
    toward uniform. ``p_i`` is the stratum's TOKEN share (``token_col``
    is the precomputed-counts reuse hook). Output:
    ``(stratum, n_tokens, share 6dp, rate 6dp)``.

    Scale shape: ONE map-side-combinable per-stratum token aggregate;
    the total and the minimum share arrive as broadcast 1-row scalars
    over the strata-sized table. The result is a driver-resident model
    the size of the stratum count (the ``kmeans_fit`` contract) —
    collect it into ``mixture_sample(rates=...)`` to materialize the
    mix as a pure projection."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    from privacy_cdc_lakehouse_spark.operators.text import token_count

    toks = (
        F.col(token_col).cast("long")
        if token_col
        else token_count(F.col(text_col))
    )
    per = (
        df.select(F.col(strata_col).alias("stratum"), toks.alias("_t"))
        .groupBy("stratum")
        .agg(F.sum("_t").alias("n_tokens"))
    )
    tot = per.agg(F.sum("n_tokens").alias("_tot"))
    shared = per.crossJoin(F.broadcast(tot)).withColumn(
        "_share", F.col("n_tokens") / F.col("_tot")
    )
    mn = shared.agg(F.min("_share").alias("_mn"))
    return shared.crossJoin(F.broadcast(mn)).select(
        "stratum",
        "n_tokens",
        F.round("_share", 6).alias("share"),
        F.round(
            F.pow(F.col("_share") / F.col("_mn"), F.lit(alpha - 1.0)), 6
        ).alias("rate"),
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wrs",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement — Efraimidis & Spirakis
    2006 (A-Res): every row gets key ``ln(u)/w`` with ``u`` a
    deterministic per-id uniform and ``w`` its positive weight; the k
    LARGEST keys are exactly a weighted sample without replacement
    (inclusion probability proportional to weight at each draw). The
    quality-weighted subset-selection primitive: ``token_budget_select``
    keeps the BEST docs until a budget, this keeps a size-k RANDOMIZED
    mixture that still favors high weights — the standard way to
    subsample a corpus without collapsing onto only top-scored docs.

    Determinism contract (``hash_split``'s, applied to randomness): the
    uniform is ``(int(md5(salt|id)[:13 hex], 16) + 1) / 2^52`` — in
    (0, 1], reproducible across runs, engines and partitionings, no RNG
    state — and the key is ROUNDED to 6dp with id tie-break, the
    rank-over-rounded-score contract (cross-engine ``ln`` may drift a
    ulp; ranking on the rounded value with a total tie-break keeps the
    selected set engine-independent).

    100 TB shape: one pure projection + ``orderBy().limit(k)``, which
    physically plans as TakeOrderedAndProject — per-partition top-k
    heaps merged on the driver, NO global sort/shuffle of the corpus
    (k rows cross the wire per partition). Rows with weight <= 0 or
    NULL are excluded (zero weight = zero inclusion probability; ES
    keys are undefined there). Output: (id, weight, es_key,
    sample_rank), rank 1 = first drawn."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    from pyspark.sql import Window

    h = F.md5(
        F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))
    )
    u = (
        F.conv(F.substring(h, 1, 13), 16, 10).cast("double") + 1.0
    ) / 2.0 ** 52
    key = F.round(F.log(u) / F.col(weight_col).cast("double"), 6)
    top = (
        df.filter(F.col(weight_col).cast("double") > 0)
        .select(
            F.col(id_col),
            F.col(weight_col).cast("double").alias("weight"),
            key.alias("es_key"),
        )
        .orderBy(F.desc("es_key"), F.asc(id_col))
        .limit(k)
    )
    # the rank window runs over <= k already-selected rows, not the corpus
    w = Window.orderBy(F.desc("es_key"), F.asc(id_col))
    return top.withColumn(
        "sample_rank", F.row_number().over(w).cast("long")
    ).select(id_col, "weight", "es_key", "sample_rank")


def dataset_report(
    corpus: DataFrame,
    strata_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One-call corpus profile — the "dataset card" numbers a training
    run starts from, as tagged (kind, k, v) metric rows:

    - ``docs`` / ``tokens`` / ``chars`` per stratum (language mix and
      its token weight — what the mixture weights act on);
    - ``quality`` — doc count per quality-score decile (filter-floor
      calibration);
    - ``dup`` — ``exact_groups`` (duplicate groups) and
      ``redundant_docs`` (docs an exact dedup would drop).

    Composes only verified operators (text stats, quality score, exact
    dedup); every arm is a map-side-combinable aggregate over one scan
    family, unioned into a long-format frame that stays tiny
    (strata + deciles + 2 rows) no matter the corpus size.
    """
    from privacy_cdc_lakehouse_spark.operators.text import (
        quality_score,
        token_count,
    )

    base = corpus.select(
        F.col(id_col),
        F.col(strata_col).alias("_stratum"),
        token_count(F.col(text_col)).cast("long").alias("_toks"),
        F.length(F.col(text_col)).cast("long").alias("_chars"),
    )
    per_stratum = base.groupBy("_stratum").agg(
        F.count("*").alias("n_docs"),
        F.sum("_toks").alias("n_tokens"),
        F.sum("_chars").alias("n_chars"),
    )

    def arm(kind: str, k, v) -> list:
        return [F.lit(kind).alias("kind"), k.cast("string").alias("k"),
                v.cast("double").alias("v")]

    docs_rows = per_stratum.select(*arm("docs", F.col("_stratum"), F.col("n_docs")))
    tok_rows = per_stratum.select(*arm("tokens", F.col("_stratum"), F.col("n_tokens")))
    chr_rows = per_stratum.select(*arm("chars", F.col("_stratum"), F.col("n_chars")))

    q = quality_score(corpus, text_col).select(
        F.least(F.floor(F.col("quality_score") * 10), F.lit(9)).alias("dec")
    )
    q_rows = q.groupBy("dec").count().select(
        *arm("quality", F.concat(F.lit("decile_"), F.col("dec")), F.col("count"))
    )

    from privacy_cdc_lakehouse_spark.operators.dedup import exact_duplicates

    groups = exact_duplicates(corpus, text_col, id_col)
    dup_rows = groups.agg(
        F.count("*").alias("g"),
        F.coalesce(F.sum(F.col("group_size") - 1), F.lit(0)).alias("r"),
    ).selectExpr(
        "stack(2, 'exact_groups', CAST(g AS DOUBLE), "
        "'redundant_docs', CAST(r AS DOUBLE)) AS (k, v)"
    ).select(F.lit("dup").alias("kind"), "k", "v")

    return (
        docs_rows.unionByName(tok_rows)
        .unionByName(chr_rows)
        .unionByName(q_rows)
        .unionByName(dup_rows)
        .orderBy("kind", "k")
    )


def dataset_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus version diff — the reproducibility-audit question "what
    changed in my training set between snapshot v1 and v2": one row
    per non-identical doc with ``status`` ``added`` / ``removed`` /
    ``changed`` (content fingerprint, not mtime) and the old/new token
    counts, so ``dataset_diff_summary`` can report net token movement
    per class. Feed it two :class:`~...tables.LakeTable` time-travel
    reads (``t.read(version=v1)`` vs ``t.read()``) — the pytest suite
    cross-checks the result against the table's Change Data Feed over
    the same version range.

    100 TB shape: a single full-outer equi-join on the doc id — both
    sides are corpus-sized so nothing broadcasts; co-partition/bucket
    the snapshots by id and the join is co-located. Fingerprints and
    token counts are computed inside the scan projection; identical
    docs are dropped before any downstream work, so output is
    O(churn), not O(corpus).
    """
    from privacy_cdc_lakehouse_spark.operators.text import token_count

    # Presence-prefixed fingerprint: md5(NULL) is NULL, and a NULL
    # fingerprint is how the full-outer join signals "row absent on
    # this side" — a doc present in both snapshots with NULL text would
    # otherwise be misclassified as added/removed. The '0'/'1' presence
    # prefix additionally keeps NULL text distinct from '' (a doc whose
    # text flips between the two IS a change: token_count('')=0 vs
    # NULL), and is injective on non-null text — no planted sentinel
    # string can collide with real content.
    fp = lambda c: F.md5(  # noqa: E731
        F.when(c.isNull(), F.lit("0")).otherwise(F.concat(F.lit("1"), c))
    )
    a = old.select(
        F.col(id_col),
        fp(F.col(text_col)).alias("_fp_a"),
        token_count(F.col(text_col)).alias("tokens_old"),
    )
    b = new.select(
        F.col(id_col),
        fp(F.col(text_col)).alias("_fp_b"),
        token_count(F.col(text_col)).alias("tokens_new"),
    )
    status = (
        F.when(F.col("_fp_a").isNull(), F.lit("added"))
        .when(F.col("_fp_b").isNull(), F.lit("removed"))
        .when(F.col("_fp_a") != F.col("_fp_b"), F.lit("changed"))
    )
    return (
        a.join(b, id_col, "full_outer")
        .withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(id_col, "status", "tokens_old", "tokens_new")
    )


def dataset_diff_summary(diff: DataFrame) -> DataFrame:
    """Aggregate a :func:`dataset_diff` to the numbers a dataset card
    records per release: docs and net token delta per change class."""
    return diff.groupBy("status").agg(
        F.count("*").alias("n_docs"),
        F.sum(
            F.coalesce(F.col("tokens_new"), F.lit(0))
            - F.coalesce(F.col("tokens_old"), F.lit(0))
        ).alias("token_delta"),
    )


def stratified_sample(
    df: DataFrame,
    n_per_stratum: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    oversample: float = 4.0,
) -> DataFrame:
    """Deterministic EXACT-count stratified sample — eval-set /
    balanced-subset construction: per stratum, the ``n_per_stratum``
    rows with the lowest ``md5(id)`` (tie-break id), so the selection
    is reproducible across runs and engines and growth-stable the same
    way :func:`hash_split` is. Output: ``(strata_col, id_col,
    sample_rank)``.

    100 TB shape (two-phase top-n): a naive per-stratum window ranks —
    and therefore shuffles — the ENTIRE corpus to keep n rows. Instead:
    (1) one map-side-combinable agg counts each stratum; (2) a pure
    PROJECTION pre-filter keeps rows whose hash-fraction (first 8 md5
    nibbles as uniform [0,1)) clears ~``oversample``×n/count — the
    expected survivor set is oversample×n per stratum, so the exact
    window in (3) ranks a few thousand rows however big the corpus is.
    Because hex order is prefix-monotone, the threshold keeps a
    prefix-closed set of the hash order: whenever ≥n rows survive, the
    top-n among survivors IS the global top-n. Strata that come up
    short (hash variance, or n > stratum size) get a doubled threshold
    — and the doubling decision costs NO extra Spark jobs: one grouped
    aggregate histograms every row by its DOUBLING LEVEL
    ``ceil(log2(u·count/(oversample·n)))`` (the number of doublings
    before that row survives), so the driver reads the cumulative
    counts at EVERY candidate threshold from a single O(strata×64)-row
    result and picks each stratum's final threshold exactly. Total: 2
    jobs always (count + level histogram), even for pathological
    stratum distributions; degenerates to keep-everything, never to a
    wrong answer.

    The per-stratum counts/thresholds are driver-resident (the same
    model contract as the quantizer fits); rows with a NULL stratum
    are excluded. Few strata inline the threshold as a literal CASE
    (pure projection); past ~64 strata it rides a broadcast
    (stratum, threshold) join — same dispatch discipline as the
    centroid argmin sites.
    """
    from pyspark.sql import Window

    h = F.md5(F.col(id_col).cast("string"))
    base = df.select(
        F.col(strata_col), F.col(id_col), h.alias("_h"),
        (F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / 2.0 ** 32).alias("_u"),
    )
    # Job 1: per-stratum counts (sets the base threshold scale).
    counts = {
        r[strata_col]: r["_n"]
        for r in base.groupBy(strata_col).agg(F.count("*").alias("_n")).collect()
        if r[strata_col] is not None
    }
    w = Window.partitionBy(strata_col).orderBy(F.asc("_h"), F.asc(id_col))
    factor = float(oversample)

    def per_stratum(values: dict, alias: str):
        """Dispatch a driver-resident per-stratum scalar into the plan:
        literal CASE for few strata, broadcast join past 64."""
        if len(values) <= 64:
            expr = F.lit(None).cast("double")
            for s, v in values.items():
                expr = F.when(F.col(strata_col) == s, F.lit(v)).otherwise(expr)
            return lambda frame: frame.withColumn(alias, expr)
        vdf = df.sparkSession.createDataFrame(
            [(s, float(v)) for s, v in values.items()], [strata_col, alias]
        )
        return lambda frame: frame.join(F.broadcast(vdf), strata_col)

    # Job 2: doubling-level histogram. A row survives threshold
    # min(1, factor·2^k·n/c) iff u·c/(factor·n) <= 2^k, so its LEVEL
    # (first doubling at which it survives) is ceil(log2(u·c/(factor·n)))
    # clamped at 0 — one grouped count per (stratum, level) replaces the
    # old count-survivors-per-doubling driver loop (one job per doubling).
    scale = per_stratum(
        {s: float(c) / (factor * n_per_stratum) for s, c in counts.items()},
        "_scale",
    )
    g = F.col("_u") * F.col("_scale")
    level = F.when(g <= 1.0, F.lit(0)).otherwise(
        F.ceil(F.log2(g)).cast("int")
    )
    hist: dict = {}
    rows = (
        scale(base.filter(F.col(strata_col).isNotNull()))
        .withColumn("_lvl", level)
        .groupBy(strata_col, "_lvl")
        .agg(F.count("*").alias("_n"))
        .collect()
    )
    for r in rows:
        hist.setdefault(r[strata_col], {})[r["_lvl"]] = r["_n"]

    # Driver: per stratum, the smallest doubling k whose cumulative
    # survivor count reaches min(n, stratum size) — or the
    # keep-everything cap when the threshold saturates at 1.0 first.
    thresholds: dict = {}
    for s, c in counts.items():
        target = min(n_per_stratum, c)
        levels = hist.get(s, {})
        cum, k = 0, 0
        while True:
            thr = factor * (2.0 ** k) * n_per_stratum / max(c, 1)
            cum += levels.get(k, 0)
            if thr >= 1.0 or cum >= target:
                break
            k += 1
        # 1e-9 relative headroom: the histogram's u·scale <= 2^k and the
        # final u <= thr are different float expressions; the margin
        # keeps boundary rows in (a SUPERSET of survivors is harmless —
        # prefix-closure means the top-n among survivors is unchanged).
        thresholds[s] = min(1.0, thr * (1.0 + 1e-9))

    survivors = per_stratum(thresholds, "_thr")(base).filter(
        F.col("_u") <= F.col("_thr")
    )
    return (
        survivors.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n_per_stratum)
        .select(strata_col, id_col, "sample_rank")
    )


def sample_negatives(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "query_id",
    doc_id: str = "doc_id",
    positives: DataFrame | None = None,
    oversample: int = 8,
    salt: str = "neg",
) -> DataFrame:
    """Deterministic negative sampling for contrastive / retrieval
    training (DPR-style): for each query, ``k`` pseudo-random corpus
    docs, reproducible across runs/engines/partitionings and excluding
    the query's ``positives`` (a (query_id, doc_id) frame — they must
    not leak in as negatives).

    Mechanics — the consistent-hashing ring: every doc gets a uniform
    position ``u = md5('<salt>-d'|id)`` in [0, 1); every query an
    anchor ``a = md5('<salt>-q'|id)``; the query's negatives are the
    first ``k`` docs CLOCKWISE from its anchor (ring distance
    ``(u - a) mod 1``, doc-id tie-break). Per-query selections look
    independent, yet adding corpus docs only inserts new ring points —
    existing selections shift minimally (the consistent-hashing
    property), unlike an RNG whose whole draw reshuffles.

    Scale shape: NO query×corpus expansion — the ring is bucketized at
    ``B ≈ N/(oversample·k)`` so each query's candidate window spans
    ~2-3 buckets: docs carry (bucket, u) from one projection, queries
    explode to their few window buckets, and ONE equi-join on the
    bucket + a ring-distance filter yields ~oversample·k candidates
    per query before the per-query top-k window (query-sized
    partitions). ``N = corpus.count()`` is the one driver scalar (the
    ``temperature_rates`` contract). With ``oversample`` at the
    default 8 the window underfills with negligible probability; a
    short window returns fewer than k rather than scanning wider
    (two-phase == naive at any outcome — both engines replay the same
    window).

    Output: (query_id, doc_id, neg_rank, ring_dist)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if oversample < 1:
        raise ValueError(f"oversample must be >= 1, got {oversample}")
    from pyspark.sql import Window

    n = corpus.count()
    if n == 0:
        raise ValueError("corpus is empty")
    w = min(1.0, oversample * k / n)
    n_buckets = max(1, int(n // max(1, oversample * k)))

    def ring(col: Column, tag: str) -> Column:
        h = F.md5(F.concat_ws("|", F.lit(f"{salt}-{tag}"), col.cast("string")))
        return (
            F.conv(F.substring(h, 1, 13), 16, 10).cast("double") / 2.0**52
        )

    docs_r = corpus.select(
        F.col(doc_id),
        ring(F.col(doc_id), "d").alias("_u"),
    ).withColumn("_b", F.floor(F.col("_u") * n_buckets).cast("long"))
    q_r = queries.select(
        F.col(query_id), ring(F.col(query_id), "q").alias("_a")
    )
    q_buckets = q_r.select(
        query_id,
        "_a",
        F.explode(
            F.sequence(
                F.floor(F.col("_a") * n_buckets).cast("long"),
                F.floor((F.col("_a") + F.lit(w)) * n_buckets).cast("long"),
            )
        ).alias("_rawb"),
    ).select(
        query_id, "_a", F.pmod(F.col("_rawb"), F.lit(n_buckets)).alias("_b")
    ).distinct()
    # ^ the exploded window spans n_buckets+1 raw bucket values; when
    # the window wraps the whole ring (tiny corpus: n_buckets <= 2)
    # pmod aliases two of them to the SAME bucket, and without the
    # distinct each doc in that bucket would join twice and claim two
    # neg_rank slots (round-10 advice finding: n=50, k=5, oversample=8
    # yielded 36 duplicated pairs, breaking two-phase == naive).
    # |buckets per query| is ~3, so the distinct is query-sized.
    dist = F.col("_u") - F.col("_a") + F.when(
        F.col("_u") < F.col("_a"), F.lit(1.0)
    ).otherwise(F.lit(0.0))
    cand = (
        q_buckets.join(docs_r, "_b")
        .withColumn("_dist", dist)
        .filter(F.col("_dist") < F.lit(w))
    )
    if positives is not None:
        cand = cand.join(
            positives.select(query_id, doc_id), [query_id, doc_id], "left_anti"
        )
    win = Window.partitionBy(query_id).orderBy(
        F.col("_dist").asc(), F.col(doc_id).asc()
    )
    return (
        cand.withColumn("neg_rank", F.row_number().over(win))
        .filter(F.col("neg_rank") <= k)
        .select(
            query_id,
            doc_id,
            F.col("neg_rank").cast("int").alias("neg_rank"),
            F.col("_dist").alias("ring_dist"),
        )
    )


def hard_negatives(
    candidates: DataFrame,
    positives: DataFrame,
    k: int,
    query_id: str = "query_id",
    doc_id: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Hard-negative mining for contrastive retrieval training (the
    ANCE / DPR-hard-negatives recipe): from a SCORED candidate list —
    any retrieval output, exact top-N or ANN — drop each query's
    ``positives`` (a (query_id, doc_id) frame), then keep the ``k``
    HIGHEST-scoring remaining docs per query: the negatives the
    current ranker finds most confusable, which is exactly what the
    next training round should see.

    The random-negative companion is :func:`sample_negatives` (easy
    negatives off the consistent-hashing ring); production recipes mix
    both.

    Scale shape: one anti-join + one per-query window, BOTH over the
    candidate-sized frame (top-N-bounded by construction — this never
    touches the corpus; the retrieval stage that produced the
    candidates already priced that). Determinism: rank over the
    6dp-ROUNDED score with doc-id tie-break (the standing
    rank-over-rounded contract). Output: (query_id, doc_id, hn_rank
    1..k, score6)."""
    from pyspark.sql import Window

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    c = candidates.select(
        F.col(query_id).alias("query_id"),
        F.col(doc_id).alias("doc_id"),
        F.round(F.col(score_col), 6).alias("score6"),
    ).join(
        positives.select(
            F.col(query_id).alias("query_id"), F.col(doc_id).alias("doc_id")
        ),
        ["query_id", "doc_id"],
        "left_anti",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score6"), F.asc("doc_id")
    )
    return (
        c.withColumn("hn_rank", F.row_number().over(w))
        .filter(F.col("hn_rank") <= k)
        .select("query_id", "doc_id", F.col("hn_rank").cast("int"), "score6")
    )
