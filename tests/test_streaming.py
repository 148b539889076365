"""Structured Streaming: foreachBatch medallion, watermark dedup, windows."""

from __future__ import annotations

from pyspark.sql import functions as F

from privacy_cdc_lakehouse_spark.cdc.jobs import Lakehouse, ingest_bronze, rebuild_silver
from privacy_cdc_lakehouse_spark.sources.debezium import cdc_events
from privacy_cdc_lakehouse_spark.streaming.pipeline import (
    BRONZE_SCHEMA,
    run_stream_to_silver,
    streaming_window_counts,
    watermarked_dedup,
)


def test_stream_to_silver_matches_batch(spark, sf_dir, tmp_path):
    events = cdc_events(spark, sf_dir)
    src = str(tmp_path / "stream_src")
    # two files → two micro-batches with maxFilesPerTrigger=1. Split by
    # offset RANGE: the checkpointed merge assumes in-order delivery per
    # partition (Kafka's guarantee), so earlier offsets must arrive first.
    mid = events.approxQuantile("offset", [0.5], 0.0)[0]
    events.filter(F.col("offset") <= mid).coalesce(1).write.parquet(f"{src}/p0")
    events.filter(F.col("offset") > mid).coalesce(1).write.parquet(f"{src}/p1")
    # readStream wants a flat dir of files
    import glob
    import shutil

    flat = str(tmp_path / "flat")
    import os

    os.makedirs(flat)
    # FileStreamSource orders batches by file MODIFICATION TIME, not
    # name — equal mtimes make delivery order nondeterministic (the
    # high-offset file first → checkpoint filter discards the other
    # batch). Strictly increasing mtimes pin the order.
    import time

    t0 = time.time()
    for i, f in enumerate(sorted(glob.glob(f"{src}/p*/part-*.parquet"))):
        dst = f"{flat}/{i:04d}.parquet"
        shutil.copy(f, dst)
        os.utime(dst, (t0 + i * 10, t0 + i * 10))

    lake = Lakehouse(spark, str(tmp_path / "stream_lake"))
    run_stream_to_silver(
        spark, flat, lake, str(tmp_path / "ckpt"), max_files_per_trigger=1
    )

    batch = Lakehouse(spark, str(tmp_path / "batch_lake"))
    ingest_bronze(batch, events)
    rebuild_silver(batch)

    cols = ["order_id", "user_id", "amount_eur", "status", "last_change_ts"]
    a = sorted(tuple(r) for r in lake.silver.read().select(cols).collect())
    b = sorted(tuple(r) for r in batch.silver.read().select(cols).collect())
    assert a == b

    # the second micro-batch's MERGE commit is partition-scoped: prior
    # dirs survive with the touched-bucket exclusion, one new dir added
    m = lake.silver._snapshot(lake.silver.current_version())
    assert m["op"] == "merge" and m["partition_by"] == ["order_bucket"]
    entries = [e if isinstance(e, dict) else {"path": e, "excludes": []} for e in m["files"]]
    assert any(
        any("order_bucket IN" in x for x in e["excludes"]) for e in entries
    )
    assert sum(1 for e in entries if not e["excludes"]) == 1


def test_watermarked_dedup_drops_duplicates(spark, tmp_path):
    src = str(tmp_path / "dupsrc")
    # offset 1 delivered twice (at-least-once redelivery) must collapse;
    # offset 2 is a GENUINE second event for k1 and must survive.
    rows = spark.createDataFrame(
        [
            ("t", 0, 1, "2024-01-01 00:00:00", "k1", "v", "2024-01-01 00:00:00"),
            ("t", 0, 1, "2024-01-01 00:00:00", "k1", "v", "2024-01-01 00:00:00"),
            ("t", 0, 2, "2024-01-01 00:00:10", "k1", "v2", "2024-01-01 00:00:10"),
            ("t", 0, 3, "2024-01-01 00:00:20", "k2", "v", "2024-01-01 00:00:20"),
        ],
        "topic string, partition int, offset long, kafka_ts string, k string, v string, ingested_at string",
    ).selectExpr(
        "topic", "partition", "offset", "cast(kafka_ts as timestamp) kafka_ts",
        "k", "v", "cast(ingested_at as timestamp) ingested_at",
    )
    rows.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(BRONZE_SCHEMA).parquet(src)
    deduped = watermarked_dedup(stream)
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("SELECT k FROM dedup_out").collect()
    assert sorted(r["k"] for r in out) == ["k1", "k1", "k2"]


def test_streaming_window_counts(spark, tmp_path):
    src = str(tmp_path / "winsrc")
    spark.createDataFrame(
        [
            (1, "2024-01-01 00:01:00", 1, "click", 1.0, "{}"),
            (2, "2024-01-01 00:02:00", 1, "click", 2.0, "{}"),
            (3, "2024-01-01 00:07:00", 2, "click", 3.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).selectExpr(
        "event_id", "cast(ts as timestamp) ts", "user_id", "event_type", "value", "props"
    ).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).parquet(src)
    agg = streaming_window_counts(stream)
    # complete mode: append would emit only windows already finalized by
    # the watermark, and this bounded stream ends before any window
    # passes (event-time max 00:07 − 10 min delay). The watermarked
    # append path is exercised by test_watermarked_dedup above.
    q = (
        agg.writeStream.format("memory")
        .queryName("win_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (str(r["window_start"]), r["n"], r["total_value"])
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    assert ("2024-01-01 00:00:00", 2, 3.0) in got
    assert ("2024-01-01 00:05:00", 1, 3.0) in got


def test_stream_static_enrich_rereads_latest_dim_snapshot(spark, tmp_path):
    """The static side must be re-planned per micro-batch: a dimension
    update between batches shows up in the second batch's output."""
    import os
    import time

    from pyspark.sql import types as T

    from privacy_cdc_lakehouse_spark.streaming.pipeline import stream_static_enrich
    from privacy_cdc_lakehouse_spark.tables import LakeTable

    dim = LakeTable(spark, str(tmp_path / "dim"))
    dim.overwrite(
        spark.createDataFrame([(1, "bronze")], "cust_id long, tier string")
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = T.StructType(
        [T.StructField("cust_id", T.LongType()), T.StructField("amt", T.LongType())]
    )
    t0 = time.time()
    for i in range(2):
        p = f"{src}/{i:04d}.parquet"
        spark.createDataFrame([(1, 100 + i)], schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(p + ".dir")
        import glob
        import shutil

        shutil.copy(glob.glob(p + ".dir/part-*.parquet")[0], p)
        os.utime(p, (t0 + i * 10, t0 + i * 10))

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    seen: list[tuple] = []

    def process(batch_df, batch_id):
        enriched = stream_static_enrich(batch_df, dim.read(), on="cust_id")
        seen.extend(sorted((r["amt"], r["tier"]) for r in enriched.collect()))
        # after the first batch, promote the customer
        dim.overwrite(
            spark.createDataFrame([(1, "gold")], "cust_id long, tier string")
        )

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert seen == [(100, "bronze"), (101, "gold")]


def test_streaming_hash_split_matches_batch(spark, tmp_path):
    """Curation split in a stream: hash_split is a pure stateless
    projection, so it runs unchanged inside readStream and assigns
    every doc the SAME split the batch path does — the growth-stability
    contract demonstrated end to end (documents arriving later can
    never perturb earlier assignments)."""
    from pyspark.sql import functions as F

    from privacy_cdc_lakehouse_spark.operators.curation import hash_split

    src = str(tmp_path / "splitsrc")
    docs = spark.range(500).select(F.col("id").alias("doc_id"))
    docs.coalesce(2).write.parquet(src)

    batch = {
        r["doc_id"]: r["split"]
        for r in hash_split(spark.read.parquet(src), id_col="doc_id").collect()
    }

    stream = spark.readStream.schema("doc_id long").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        hash_split(stream, id_col="doc_id")
        .writeStream.format("memory")
        .queryName("split_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        r["doc_id"]: r["split"]
        for r in spark.sql("SELECT doc_id, split FROM split_out").collect()
    }
    assert streamed == batch and len(streamed) == 500


def test_streaming_change_feed_replay_reconstructs_silver(spark, sf_dir, tmp_path):
    """run_stream_to_silver(write_change_data=True): every micro-batch
    MERGE records its Change Data Feed, and replaying the feed in
    commit order (latest insert/update_postimage/delete per key)
    reconstructs the final silver exactly — the downstream-consumer
    contract: tail the feed, never re-read snapshots."""
    import glob
    import os
    import shutil
    import time

    from privacy_cdc_lakehouse_spark.tables import (
        CHANGE_TYPE_COL,
        COMMIT_VERSION_COL,
    )

    events = cdc_events(spark, sf_dir)
    src = str(tmp_path / "cdf_src")
    mid = events.approxQuantile("offset", [0.5], 0.0)[0]
    events.filter(F.col("offset") <= mid).coalesce(1).write.parquet(f"{src}/p0")
    events.filter(F.col("offset") > mid).coalesce(1).write.parquet(f"{src}/p1")
    flat = str(tmp_path / "cdf_flat")
    os.makedirs(flat)
    t0 = time.time()
    for i, f in enumerate(sorted(glob.glob(f"{src}/p*/part-*.parquet"))):
        dst = f"{flat}/{i:04d}.parquet"
        shutil.copy(f, dst)
        os.utime(dst, (t0 + i * 10, t0 + i * 10))

    lake = Lakehouse(spark, str(tmp_path / "cdf_lake"))
    run_stream_to_silver(
        spark,
        flat,
        lake,
        str(tmp_path / "cdf_ckpt"),
        max_files_per_trigger=1,
        write_change_data=True,
    )

    silver = lake.silver
    feed = silver.read_changes(1, silver.current_version())
    cols = ["order_id", "user_id", "amount_eur", "status", "last_change_ts"]
    winners = (
        feed.filter(
            F.col(CHANGE_TYPE_COL).isin(
                "insert", "update_postimage", "delete"
            )
        )
        .groupBy("order_id")
        .agg(
            F.max_by(
                F.struct(CHANGE_TYPE_COL, *[c for c in cols if c != "order_id"]),
                F.col(COMMIT_VERSION_COL),
            ).alias("s")
        )
    )
    recon = winners.filter(F.col(f"s.{CHANGE_TYPE_COL}") != "delete").select(
        "order_id", *[F.col(f"s.{c}").alias(c) for c in cols if c != "order_id"]
    )
    a = sorted(tuple(r) for r in recon.select(cols).collect())
    b = sorted(tuple(r) for r in silver.read().select(cols).collect())
    assert a == b and len(b) > 0


def test_streaming_mixture_sample_matches_batch(spark, tmp_path):
    """mixture_sample is a pure projection+filter, so it applies to a
    streaming DataFrame unchanged and every micro-batching of the same
    corpus keeps the identical row set — the deterministic-mixing
    contract end to end (arrival order cannot perturb a row's fate)."""
    from pyspark.sql import functions as F

    from privacy_cdc_lakehouse_spark.operators.curation import mixture_sample

    src = str(tmp_path / "mixsrc")
    docs = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("zh")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("lang"),
    )
    docs.coalesce(2).write.parquet(src)
    rates = {"en": 0.8, "de": 0.4}

    batch = {
        (r["doc_id"], r["lang"], r["sample_bucket"])
        for r in mixture_sample(
            spark.read.parquet(src), rates, default_rate=0.1
        ).collect()
    }

    stream = spark.readStream.schema("doc_id long, lang string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        mixture_sample(stream, rates, default_rate=0.1)
        .writeStream.format("memory")
        .queryName("mix_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r["doc_id"], r["lang"], r["sample_bucket"])
        for r in spark.sql(
            "SELECT doc_id, lang, sample_bucket FROM mix_out"
        ).collect()
    }
    assert streamed == batch and len(batch) > 0


def test_streaming_cdf_no_double_emit_on_batch_replay(spark, sf_dir, tmp_path):
    """The export contract under at-least-once foreachBatch replay: a
    crash between the bronze append and the stream-checkpoint commit
    redelivers the batch; the idempotent ingest discards it and
    merge_silver early-exits, so the Change Data Feed must NOT
    double-emit — replaying the same micro-batch adds zero feed rows,
    and the concatenated feed still reconstructs the final silver."""
    from privacy_cdc_lakehouse_spark.cdc.jobs import (
        ingest_bronze_idempotent,
        merge_silver,
    )
    from privacy_cdc_lakehouse_spark.tables import (
        CHANGE_TYPE_COL,
        COMMIT_VERSION_COL,
    )

    events = cdc_events(spark, sf_dir)
    mid = events.approxQuantile("offset", [0.5], 0.0)[0]
    b0 = events.filter(F.col("offset") <= mid)
    b1 = events.filter(F.col("offset") > mid)

    lake = Lakehouse(spark, str(tmp_path / "replay_lake"))
    ingest_bronze_idempotent(lake, b0)
    assert merge_silver(lake, write_change_data=True) is not None
    v1 = lake.silver.current_version()
    n1 = lake.silver.read_changes(1, v1).count()
    assert n1 > 0

    # replay micro-batch 0 verbatim: discarded at bronze, merge no-ops,
    # silver version unchanged, zero new feed rows
    assert ingest_bronze_idempotent(lake, b0) is None
    assert merge_silver(lake, write_change_data=True) is None
    assert lake.silver.current_version() == v1
    assert lake.silver.read_changes(1, v1).count() == n1

    ingest_bronze_idempotent(lake, b1)
    assert merge_silver(lake, write_change_data=True) is not None
    v2 = lake.silver.current_version()
    n2 = lake.silver.read_changes(1, v2).count()

    # replay micro-batch 1: again zero new feed rows
    assert ingest_bronze_idempotent(lake, b1) is None
    assert merge_silver(lake, write_change_data=True) is None
    assert lake.silver.current_version() == v2
    assert lake.silver.read_changes(1, v2).count() == n2

    feed = lake.silver.read_changes(1, v2)
    # a clean feed is duplicate-free on (key, commit, change_type) —
    # a double-emitted batch would collide here
    assert (
        feed.groupBy("order_id", COMMIT_VERSION_COL, CHANGE_TYPE_COL)
        .count()
        .filter(F.col("count") > 1)
        .isEmpty()
    )
    # and the feed replay still reconstructs the final silver exactly
    cols = ["order_id", "user_id", "amount_eur", "status", "last_change_ts"]
    winners = (
        feed.filter(
            F.col(CHANGE_TYPE_COL).isin("insert", "update_postimage", "delete")
        )
        .groupBy("order_id")
        .agg(
            F.max_by(
                F.struct(CHANGE_TYPE_COL, *[c for c in cols if c != "order_id"]),
                F.col(COMMIT_VERSION_COL),
            ).alias("s")
        )
    )
    recon = winners.filter(F.col(f"s.{CHANGE_TYPE_COL}") != "delete").select(
        "order_id", *[F.col(f"s.{c}").alias(c) for c in cols if c != "order_id"]
    )
    a = sorted(tuple(r) for r in recon.select(cols).collect())
    b = sorted(tuple(r) for r in lake.silver.read().select(cols).collect())
    assert a == b and len(b) > 0


def test_streaming_incremental_dedup_foreachbatch(spark, tmp_path):
    """Ingest-time dedup in a stream: incremental_exact_dedup runs
    inside foreachBatch with the fingerprint store as a LakeTable that
    GROWS per micro-batch (survivors append back), so (a) duplicates
    across micro-batches are dropped even though no batch sees the
    others, (b) replayed content is dropped via the store, and (c) the
    final accepted set equals one batch-mode dedup of the whole stream.
    """
    from privacy_cdc_lakehouse_spark.operators.dedup import (
        incremental_exact_dedup,
        normalized_fingerprint,
    )
    from privacy_cdc_lakehouse_spark.tables import LakeTable

    # three files -> three micro-batches; dup texts straddle batches
    rows = [
        (1, "alpha doc"), (2, "beta doc"),           # batch 0
        (3, "alpha doc"), (4, "gamma doc"),          # batch 1: 3 dups 1
        (5, "Beta  DOC"), (6, "delta doc"),          # batch 2: 5 dups 2
    ]
    src = str(tmp_path / "incsrc")
    for i in range(3):
        spark.createDataFrame(
            rows[2 * i : 2 * i + 2], "doc_id long, text string"
        ).coalesce(1).write.parquet(f"{src}/b{i}")
    import glob
    import os
    import shutil
    import time

    flat = str(tmp_path / "incflat")
    os.makedirs(flat)
    t0 = time.time()
    for i, f in enumerate(sorted(glob.glob(f"{src}/b*/part-*.parquet"))):
        dst = f"{flat}/{i:04d}.parquet"
        shutil.copy(f, dst)
        os.utime(dst, (t0 + i * 10, t0 + i * 10))

    store = LakeTable(spark, str(tmp_path / "fpstore"))
    store.overwrite(
        spark.createDataFrame([], "fingerprint string")
    )
    accepted = LakeTable(spark, str(tmp_path / "accepted"))
    accepted.overwrite(
        spark.createDataFrame([], "doc_id long, fingerprint string")
    )

    def process(batch_df, batch_id):
        surv = incremental_exact_dedup(batch_df, store.read())
        accepted.append(surv)
        store.append(surv.select("fingerprint"))

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", str(tmp_path / "incckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = sorted(r["doc_id"] for r in accepted.read().collect())
    assert got == [1, 2, 4, 6]
    # == batch-mode dedup of the whole stream against an empty store
    whole = spark.createDataFrame(rows, "doc_id long, text string")
    batch_ids = sorted(
        r["doc_id"]
        for r in incremental_exact_dedup(
            whole, spark.createDataFrame([], "fingerprint string")
        ).collect()
    )
    assert got == batch_ids
    # store holds exactly the accepted fingerprints
    assert store.read().count() == 4


def test_streaming_mixture_upsample_matches_batch(spark, tmp_path):
    """Up-sampling in a stream: mixture_upsample is a pure stateless
    projection + explode, so it runs unchanged inside readStream and
    emits the SAME (doc, copy) replicas the batch path does — ingest
    order and micro-batch boundaries can never perturb replica counts."""
    from pyspark.sql import functions as F

    from privacy_cdc_lakehouse_spark.operators.curation import (
        mixture_upsample,
    )

    src = str(tmp_path / "upsrc")
    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "fr").otherwise("zh").alias("lang"),
    )
    docs.coalesce(3).write.parquet(src)

    rates = {"fr": 2.5, "zh": 0.5}
    batch = sorted(
        (r["doc_id"], r["copy"])
        for r in mixture_upsample(spark.read.parquet(src), rates).collect()
    )

    stream = spark.readStream.schema("doc_id long, lang string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        mixture_upsample(stream, rates)
        .writeStream.format("memory")
        .queryName("up_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = sorted(
        (r["doc_id"], r["copy"])
        for r in spark.sql("SELECT doc_id, copy FROM up_out").collect()
    )
    assert streamed == batch and len(streamed) > 300


def test_streaming_drift_monitor_matches_batch(spark, tmp_path):
    """Per-micro-batch drift metrics == the batch drift_report over the
    same (reference, batch) frames — stream/batch parity for the
    monitoring surface; plus per-batch idempotent append (one row set
    per batch_id)."""
    import os

    from pyspark.sql import types as T

    from privacy_cdc_lakehouse_spark.operators.drift import drift_report
    from privacy_cdc_lakehouse_spark.streaming.monitor import (
        read_drift_metrics,
        run_drift_monitor,
    )

    schema = T.StructType(
        [
            T.StructField("value", T.DoubleType()),
            T.StructField("cat", T.StringType()),
        ]
    )
    ref = spark.createDataFrame(
        [(float(i % 20), "a" if i % 3 else "b") for i in range(200)], schema
    )
    b0 = spark.createDataFrame(
        [(float(i % 20), "a") for i in range(100)], schema
    )
    b1 = spark.createDataFrame(
        [(float(i % 7) + 30.0, "b") for i in range(80)], schema
    )
    src = str(tmp_path / "drift_src")
    os.makedirs(src)
    b0.coalesce(1).write.parquet(str(tmp_path / "raw0"))
    b1.coalesce(1).write.parquet(str(tmp_path / "raw1"))
    import glob
    import shutil
    import time

    t0 = time.time()
    for i, raw in enumerate(["raw0", "raw1"]):
        f = glob.glob(str(tmp_path / raw / "part-*.parquet"))[0]
        dst = os.path.join(src, f"{i:04d}.parquet")
        shutil.copy(f, dst)
        os.utime(dst, (t0 + i * 10, t0 + i * 10))

    metrics = str(tmp_path / "metrics")
    run_drift_monitor(
        spark,
        src,
        schema,
        ref,
        "value",
        metrics,
        str(tmp_path / "ckpt"),
        n_bins=10,
        ks_bins=100,
        categorical_col="cat",
        max_files_per_trigger=1,
    )
    got = read_drift_metrics(spark, metrics)
    per_batch = {
        r["batch_id"]: {}
        for r in got.select("batch_id").distinct().collect()
    }
    assert set(per_batch) == {0, 1}
    for r in got.collect():
        per_batch[r["batch_id"]][r["metric"]] = r["value"]
    for bid, frame in ((0, b0), (1, b1)):
        expected = {
            r["metric"]: r["value"]
            for r in drift_report(
                ref, frame, "value", n_bins=10, ks_bins=100,
                categorical_col="cat",
            ).collect()
        }
        assert per_batch[bid] == expected
    # batch 1 moved the distribution out of range: drift must register
    assert per_batch[1]["psi"] > per_batch[0]["psi"]
    # out-of-range values clamp into the edge bin, which also holds the
    # reference's top-of-range mass — KS is near-1, not exactly 1
    assert per_batch[1]["ks"] >= 0.9


def test_streaming_quarantine_matches_batch(spark, tmp_path):
    """Expectations quarantine inside foreachBatch: per micro-batch the
    valid rows append to the clean table and the invalid rows (with
    failed-rule reasons) to the quarantine table — totals must equal
    the batch operator over the union of all batches."""
    import glob
    import os
    import shutil
    import time

    from pyspark.sql import types as T

    from privacy_cdc_lakehouse_spark.operators import expectations as ex

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("amount", T.DoubleType()),
        ]
    )
    b0 = spark.createDataFrame([(i, float(i)) for i in range(50)], schema)
    b1 = spark.createDataFrame(
        [(i, float(i - 200)) for i in range(50, 80)], schema  # negatives
    )
    src = str(tmp_path / "q_src")
    os.makedirs(src)
    t0 = time.time()
    for i, frame in enumerate((b0, b1)):
        frame.coalesce(1).write.parquet(str(tmp_path / f"qraw{i}"))
        f = glob.glob(str(tmp_path / f"qraw{i}" / "part-*.parquet"))[0]
        dst = os.path.join(src, f"{i:04d}.parquet")
        shutil.copy(f, dst)
        os.utime(dst, (t0 + i * 10, t0 + i * 10))

    rules = [ex.expect_in_range("amount", 0.0, 1e6)]
    clean_dir = str(tmp_path / "clean")
    quar_dir = str(tmp_path / "quar")

    def process(batch_df, batch_id):
        valid, invalid = ex.quarantine(batch_df, rules)
        valid.write.mode("append").parquet(clean_dir)
        invalid.write.mode("append").parquet(quar_dir)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", str(tmp_path / "qckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    batch_valid, batch_invalid = ex.quarantine(b0.unionByName(b1), rules)
    assert spark.read.parquet(clean_dir).count() == batch_valid.count() == 50
    got_q = spark.read.parquet(quar_dir)
    assert got_q.count() == batch_invalid.count() == 30
    assert all(
        r["failed_rules"] == ["in_range_amount"] for r in got_q.collect()
    )


def test_scd2_stream_matches_full_rebuild(spark, sf_dir, tmp_path):
    """run_scd2_stream (foreachBatch incremental apply with
    assume_ordered=True — the checkpointed source supplies the PER-KEY
    ordering) must equal the batch full rebuild, including under a
    REPLAYED batch (exact-offset-membership dedup strips
    redeliveries).

    The batch split is deliberately KEY-INTERLEAVED: batch 0 carries
    every key's first events (seq 0-1), batch 1 its later events
    (seq 2-3), so batch 1's offsets (key*4+2) dip far below batch 0's
    global max (maxkey*4+1) while per-key ordering holds — the
    realistic CDC delivery shape. A global max-offset replay filter
    would silently drop almost all of batch 1 (per-key-monotone
    offsets are not globally ordered); this pins that it doesn't."""
    import glob
    import os
    import shutil
    import time

    from privacy_cdc_lakehouse_spark.cdc.scd2 import scd2_history
    from privacy_cdc_lakehouse_spark.cdc.silver import parse_cdc_envelope
    from privacy_cdc_lakehouse_spark.streaming.pipeline import run_scd2_stream
    from privacy_cdc_lakehouse_spark.tables import LakeTable

    events = cdc_events(spark, sf_dir)
    src = str(tmp_path / "scd2_src")
    events.filter(F.col("offset") % 4 <= 1).coalesce(1).write.parquet(f"{src}/p0")
    events.filter(F.col("offset") % 4 >= 2).coalesce(1).write.parquet(f"{src}/p1")
    flat = str(tmp_path / "scd2_flat")
    os.makedirs(flat)
    t0 = time.time()
    files = sorted(glob.glob(f"{src}/p*/part-*.parquet"))
    for i, f in enumerate(files):
        dst = f"{flat}/{i:04d}.parquet"
        shutil.copy(f, dst)
        os.utime(dst, (t0 + i * 10, t0 + i * 10))

    hist = LakeTable(spark, str(tmp_path / "scd2_hist"))
    run_scd2_stream(
        spark, flat, hist, str(tmp_path / "scd2_ckpt"), max_files_per_trigger=1
    )
    expected = scd2_history(parse_cdc_envelope(events))
    cols = [
        "order_id", "version", "user_id", "amount_eur", "status",
        "valid_from", "valid_to", "is_current",
    ]
    a = sorted(tuple(r) for r in hist.read().select(cols).collect())
    b = sorted(tuple(r) for r in expected.select(cols).collect())
    assert a == b and len(a) > 0

    # replay the LAST file through a fresh stream checkpoint (same
    # history table): exact-membership dedup folds it in as zero
    # rows — history unchanged, no duplicate versions
    v_before = hist.current_version()
    replay = str(tmp_path / "scd2_replay")
    os.makedirs(replay)
    shutil.copy(files[-1], f"{replay}/0000.parquet")
    run_scd2_stream(spark, replay, hist, str(tmp_path / "scd2_ckpt2"))
    a2 = sorted(tuple(r) for r in hist.read().select(cols).collect())
    assert a2 == a
    assert hist.current_version() > v_before  # it DID commit (idempotently)


def test_stream_stream_join_inner_matches_batch(spark, tmp_path):
    from privacy_cdc_lakehouse_spark.streaming.pipeline import stream_stream_join

    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    base = "2024-01-01 00:{:02d}:00"
    left = spark.createDataFrame(
        [(k, base.format(m), f"o{k}") for k, m in
         [(1, 0), (2, 5), (3, 10), (4, 20)]],
        "k int, lts string, l_payload string",
    ).withColumn("lts", F.col("lts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, base.format(3), "pay"),   # within 15m of k=1 -> match
         (2, base.format(25), "pay"),  # 20m after k=2 -> no match
         (3, base.format(9), "pay"),   # BEFORE left ts -> no match
         (5, base.format(1), "pay")],  # no left key
        "k int, rts string, r_payload string",
    ).withColumn("rts", F.col("rts").cast("timestamp"))
    left.write.parquet(ldir)
    right.write.parquet(rdir)

    ls = spark.readStream.schema(left.schema).parquet(ldir)
    rs = spark.readStream.schema(right.schema).parquet(rdir)
    joined = stream_stream_join(ls, rs, "k", "lts", "rts", within="15 minutes")
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_inner")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["k"], r["l_payload"], r["r_payload"])
        for r in spark.sql("SELECT * FROM ssj_inner").collect()
    }
    batch = {
        (r["k"], r["l_payload"], r["r_payload"])
        for r in left.join(right, "k")
        .filter(
            (F.col("rts") >= F.col("lts"))
            & (F.col("rts") <= F.col("lts") + F.expr("INTERVAL 15 minutes"))
        )
        .collect()
    }
    assert got == batch == {(1, "o1", "pay")}


def test_stream_stream_join_left_outer_flushes_on_watermark(spark, tmp_path):
    from privacy_cdc_lakehouse_spark.streaming.pipeline import stream_stream_join

    ldir, rdir, ck = str(tmp_path / "l"), str(tmp_path / "r"), str(tmp_path / "ck")
    outdir = str(tmp_path / "out")
    schema_l = "k int, lts timestamp, l_payload string"
    schema_r = "k int, rts timestamp, r_payload string"
    spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "o1"), (2, "2024-01-01 00:01:00", "o2")],
        "k int, lts string, l_payload string",
    ).withColumn("lts", F.col("lts").cast("timestamp")).write.parquet(ldir)
    spark.createDataFrame(
        [(1, "2024-01-01 00:02:00", "pay")],
        "k int, rts string, r_payload string",
    ).withColumn("rts", F.col("rts").cast("timestamp")).write.parquet(rdir)

    def run_once():
        ls = spark.readStream.schema(schema_l).parquet(ldir)
        rs = spark.readStream.schema(schema_r).parquet(rdir)
        j = stream_stream_join(
            ls, rs, "k", "lts", "rts",
            left_delay="1 minutes", right_delay="1 minutes",
            within="5 minutes", how="left_outer",
        )
        q = (
            j.writeStream.format("parquet")
            .option("path", outdir)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    # second batch far in the future advances BOTH watermarks past
    # k=2's join window, flushing its unmatched left row with nulls
    spark.createDataFrame(
        [(99, "2024-01-01 02:00:00", "late-l")],
        "k int, lts string, l_payload string",
    ).withColumn("lts", F.col("lts").cast("timestamp")).write.mode(
        "append"
    ).parquet(ldir)
    spark.createDataFrame(
        [(99, "2024-01-01 02:00:00", "late-r")],
        "k int, rts string, r_payload string",
    ).withColumn("rts", F.col("rts").cast("timestamp")).write.mode(
        "append"
    ).parquet(rdir)
    run_once()

    rows = {
        (r["k"], r["l_payload"], r["r_payload"])
        for r in spark.read.parquet(outdir).collect()
    }
    assert (1, "o1", "pay") in rows          # matched pair
    assert (2, "o2", None) in rows           # flushed unmatched left


def test_stream_stream_join_rejects_column_collision(spark):
    import pytest as _pytest

    from privacy_cdc_lakehouse_spark.streaming.pipeline import stream_stream_join

    a = spark.range(1).select(
        F.col("id").alias("k"), F.current_timestamp().alias("ts"),
        F.lit("x").alias("v"),
    )
    b = spark.range(1).select(
        F.col("id").alias("k"), F.current_timestamp().alias("ts"),
        F.lit("y").alias("v"),
    )
    with _pytest.raises(ValueError, match="collision"):
        stream_stream_join(a, b, "k", "ts", "ts")


def test_streaming_session_window_matches_batch(spark, tmp_path):
    from privacy_cdc_lakehouse_spark.streaming.pipeline import (
        streaming_session_counts,
    )

    rows = [
        (1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:10:00"),  # one session
        (1, "2024-01-01 01:30:00"),                               # new session
        (2, "2024-01-01 00:05:00"), (2, "2024-01-01 00:50:00"),  # 45m > gap
    ]
    batch = spark.createDataFrame(
        rows, "user_id int, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    src = str(tmp_path / "sess")
    batch.write.parquet(src)

    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = (
        streaming_session_counts(stream, gap="30 minutes")
        .writeStream.format("memory")
        .queryName("sess_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], str(r["session_start"]), r["n_events"])
        for r in spark.sql("SELECT * FROM sess_counts").collect()
    }
    want = {
        (r["user_id"], str(r["session_start"]), r["n_events"])
        for r in streaming_session_counts(batch, gap="30 minutes").collect()
    }
    assert got == want
    assert (1, "2024-01-01 00:00:00", 2) in got  # merged session
    assert (1, "2024-01-01 01:30:00", 1) in got
    assert len([g for g in got if g[0] == 2]) == 2  # gap split user 2
