#!/usr/bin/env python
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "total_headline_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Each query is forced end-to-end with a noop-style write (count of a
1-column projection would let Catalyst prune work; ``collect`` on the
final DataFrame evaluates every output column, and headline results
are small by construction).

Per-query times are MEDIANS of SPARK_GRAFT_BENCH_REPS runs (default 3;
the two flagship CDC queries get 5 — round 3's driver medians-of-3
showed a phantom +39% on them under box contention that a clean 5-rep
median refuted): single-run numbers on this box swing 3-40s for
identical jobs under contention, so medians are the only defensible
per-round comparison.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from privacy_cdc_lakehouse_spark.queries import all_queries  # noqa: E402
from privacy_cdc_lakehouse_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "cdc_orders_current",        # flagship CDC medallion pipeline
    "cdc_orders_current_priv",   # + privacy projection
    "q1_pricing_summary",        # grouped agg over the fact table
    "q3_top_unshipped",          # star join + topk
    "q5_revenue_by_nation",      # snowflake join
    "window_analytics",          # window topk per group + running frames
    "events_sessionize",         # sessionization windows
    "dedup_jaccard_verified",    # minhash LSH candidates + jaccard verify
    "sim_topk_bruteforce",       # cosine topk (exact baseline)
    "sim_lsh_topk",              # cosine topk (LSH scale path)
    "text_stats_by_lang",        # text feature aggregation
    # WRITE-path headline (round 5): seeds silver from half the event
    # log, SQL-MERGEs the other half in, reads the table back — tracks
    # the MERGE + commit/delta-manifest cost round-over-round (the one
    # path the read-only headlines never touched).
    "sql_merge_orders",
]


def headline_queries() -> dict:
    """Registry queries + retired-headline direct calls. Round-7
    registry consolidations folded text_stats_by_lang (into
    text_quality_panel) and the two ANN top-k rows (into
    sim_ann_topk_panel), but each stays a HEADLINE under its original
    name — same plan, called directly — so per-query bench history
    remains comparable round over round."""
    queries = all_queries()
    from privacy_cdc_lakehouse_spark.queries.llmops import (
        q_sim_lsh_topk,
        q_sim_topk_bruteforce,
        q_text_stats_by_lang,
    )

    queries.setdefault("text_stats_by_lang", q_text_stats_by_lang)
    queries.setdefault("sim_topk_bruteforce", q_sim_topk_bruteforce)
    queries.setdefault("sim_lsh_topk", q_sim_lsh_topk)
    return queries


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(os.path.normpath(sf_dir)).replace("sf", ""))
    except ValueError:
        sf = -1.0
    spark = get_spark("bench")
    queries = headline_queries()

    # JVM/JIT + Arrow warmup so the first timed query doesn't absorb
    # session bring-up (standard benchmarking practice; we time queries,
    # not interpreter startup).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.createDataFrame([(1,)], "x int").collect()

    # Box-speed canary: a fixed synthetic workload (pure JVM codegen,
    # no I/O, no query-code dependence) timed like a headline query.
    # Round-over-round query comparisons divide by this to separate
    # host slowdown from real regressions — round 5 measured the SAME
    # code 1.8-3x slower than round 4 purely from box state.
    def calibrate() -> float:
        samples = []
        for _ in range(3):
            t0 = time.time()
            spark.range(200_000_000).selectExpr(
                "sum(id * 2 + 1)", "count(if(id % 7 = 0, 1, NULL))"
            ).collect()
            samples.append(time.time() - t0)
        return round(statistics.median(samples), 3)

    calibration = calibrate()
    print(f"# calibration: {calibration}s", file=sys.stderr)

    # I/O-bound box canary (round 9; complements the CPU canary): a
    # timed full-width scan+decode of the lineitem fixture, median of
    # 3. xxhash64 over every column defeats column pruning and forces
    # full parquet decode while adding only cheap hashing, so the run
    # is dominated by the same scan/decode path the headline queries'
    # table reads exercise. Two canaries make round-over-round
    # movement attributable: CPU-bound queries track calibration_sec,
    # scan-bound ones track io_calibration_sec — previously a slower
    # disk and a slower CPU were indistinguishable in the history.
    def calibrate_io() -> float:
        from pyspark.sql import functions as F

        from privacy_cdc_lakehouse_spark.sources.fixtures import load_table

        samples = []
        for _ in range(3):
            t0 = time.time()
            li = load_table(spark, sf_dir, "lineitem")
            # bit_xor, not sum: summing 64-bit hashes overflows long
            # under ANSI mode; xor is overflow-free and still forces
            # every column through the decoder
            li.select(F.bit_xor(F.xxhash64(*li.columns)).alias("h")).collect()
            samples.append(time.time() - t0)
        return round(statistics.median(samples), 3)

    io_calibration = calibrate_io()
    print(f"# io_calibration: {io_calibration}s", file=sys.stderr)

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    # The flagship pair is the round-over-round comparison that matters
    # most — extra reps buy noise immunity where it counts.
    flagship_reps = max(
        reps, int(os.environ.get("SPARK_GRAFT_BENCH_FLAGSHIP_REPS", "5"))
    )
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        samples = []
        rows = []
        # sql_merge_orders joins the flagship pair at 5 reps (round-12
        # watch item: its medians-of-3 swung 1.22x with NO code change
        # on its path — [8.08, 5.82, 5.19] raw samples — so it gets the
        # same noise immunity the r11 cdc_orders_current settlement got)
        n = (
            flagship_reps
            if name.startswith("cdc_orders_current") or name == "sql_merge_orders"
            else reps
        )
        for _ in range(n):
            t0 = time.time()
            rows = fn(spark, sf_dir).collect()
            samples.append(time.time() - t0)
        timings[name] = round(statistics.median(samples), 3)
        print(
            f"# {name}: median {timings[name]}s of "
            f"{[round(s, 3) for s in samples]} ({len(rows)} rows)",
            file=sys.stderr,
        )

    # Informational, NOT part of the total: the 100 TB ANN contract is
    # "build the LSH index once, query many". The sim_lsh_topk headline
    # deliberately prices the full build-and-probe; this line times the
    # steady-state per-batch cost alone — lsh_topk() consuming a
    # MATERIALIZED lsh_index() artifact (written to parquet and read
    # back, exactly how a deployment would persist it next to the
    # corpus).
    import shutil
    import tempfile

    from privacy_cdc_lakehouse_spark.operators import similarity as sim_ops
    from privacy_cdc_lakehouse_spark.queries.llmops import (
        LSH_TOPK_PLANES,
        LSH_TOPK_TABLES,
    )
    from privacy_cdc_lakehouse_spark.session import pin_utc
    from privacy_cdc_lakehouse_spark.sources.fixtures import load_table
    from pyspark.sql import functions as F

    pin_utc(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    idx_dir = tempfile.mkdtemp(prefix="lsh_index_bench_")
    try:
        sim_ops.lsh_index(
            emb, planes=LSH_TOPK_PLANES, tables=LSH_TOPK_TABLES, dim=64
        ).write.mode("overwrite").parquet(idx_dir)
        index = spark.read.parquet(idx_dir)
        qdf = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        samples = []
        for _ in range(reps):
            t0 = time.time()
            sim_ops.lsh_topk(
                emb,
                qdf,
                k=10,
                planes=LSH_TOPK_PLANES,
                tables=LSH_TOPK_TABLES,
                dim=64,
                corpus_index=index,
            ).collect()
            samples.append(time.time() - t0)
        amortized = round(statistics.median(samples), 3)
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
    print(
        f"# sim_lsh_topk_amortized (prebuilt index): median {amortized}s "
        f"of {[round(s, 3) for s in samples]}",
        file=sys.stderr,
    )

    # Same steady-state story for the round-7 IVFADC path: codebook +
    # cluster-tagged code table are the persisted artifacts (built once
    # at ingest); this times the per-batch probe alone — cell-pruned
    # ADC scan over the materialized codes + winners-only float fetch.
    pq_m, pq_codes_n, pq_iters, pq_cells, pq_nprobe = 16, 16, 1, 16, 4
    mdl_dir = tempfile.mkdtemp(prefix="pq_model_bench_")
    coarse_dir = tempfile.mkdtemp(prefix="pq_coarse_bench_")
    codes_dir = tempfile.mkdtemp(prefix="pq_codes_bench_")
    try:
        sim_ops.pq_model(
            emb, m=pq_m, n_codes=pq_codes_n, iters=pq_iters, dim=64
        ).write.mode("overwrite").parquet(mdl_dir)
        model = spark.read.parquet(mdl_dir)
        sim_ops.ivf_model(emb, n_clusters=pq_cells, iters=1).write.mode(
            "overwrite"
        ).parquet(coarse_dir)
        coarse_model = spark.read.parquet(coarse_dir)
        cb = sim_ops._pq_codebook(model, pq_m, pq_codes_n, pq_iters)
        ccents = sim_ops._model_centroids(coarse_model, pq_cells, 1)
        sim_ops.pq_encode(emb, cb, coarse=ccents).write.mode(
            "overwrite"
        ).parquet(codes_dir)
        codes = spark.read.parquet(codes_dir)
        samples = []
        for _ in range(reps):
            t0 = time.time()
            sim_ops.pq_topk(
                emb, qdf, k=10, m=pq_m, n_codes=pq_codes_n, iters=pq_iters,
                dim=64, model=model, corpus_codes=codes,
                coarse_clusters=pq_cells, nprobe=pq_nprobe, coarse_iters=1,
                coarse_model=coarse_model,
            ).collect()
            samples.append(time.time() - t0)
        pq_amortized = round(statistics.median(samples), 3)
    finally:
        shutil.rmtree(mdl_dir, ignore_errors=True)
        shutil.rmtree(coarse_dir, ignore_errors=True)
        shutil.rmtree(codes_dir, ignore_errors=True)
    print(
        f"# sim_pq_adc_amortized (prebuilt codebook+codes): median "
        f"{pq_amortized}s of {[round(s, 3) for s in samples]}",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "total_headline_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                # not part of the total: divide query times by these
                # box-speed canaries when comparing across rounds —
                # calibration_sec is CPU-bound (pure codegen, no I/O),
                # io_calibration_sec is scan-bound (full-width parquet
                # decode of the lineitem fixture)
                "calibration_sec": calibration,
                "io_calibration_sec": io_calibration,
                # not part of the total: per-batch ANN cost with the
                # corpus bucketing amortized into a write-once artifact
                "informational": {
                    "sim_lsh_topk_amortized": amortized,
                    "sim_pq_adc_amortized": pq_amortized,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
