"""Streaming drift monitor: per-micro-batch distribution checks.

The streaming face of ``operators/drift.py`` — the production pattern
where every ingest micro-batch is scored against a FIXED reference
window (yesterday's data, the training corpus, a golden sample) and
the metric rows land in a monitoring table an alerting job tails.
Batch/stream parity holds by construction: each batch's metrics are
computed by the exact batch operator (``drift_report``) over
(reference, batch) — pinned by test against the direct batch call.

Scale: the reference is bounded (it is a *sample/window* by
definition — persist it); per batch the monitor adds two scans of the
batch + one of the reference and ≤|bins| downstream rows. foreachBatch
keeps MERGE-class flexibility: the metrics append is idempotent per
``batch_id`` (re-delivered batches overwrite their own rows, the
at-least-once discipline of ``streaming/pipeline.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from privacy_cdc_lakehouse_spark.operators.drift import drift_report


def run_drift_monitor(
    spark: SparkSession,
    source_dir: str,
    schema,
    reference: DataFrame,
    value_col: str,
    metrics_dir: str,
    checkpoint_dir: str,
    n_bins: int = 10,
    ks_bins: int = 100,
    categorical_col: str | None = None,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drive a file stream to completion (availableNow), scoring every
    micro-batch against ``reference`` with the full drift panel and
    appending (batch_id, metric, value) rows to a parquet monitoring
    table. Idempotent per batch: a re-delivered batch rewrites its own
    ``batch_id=...`` partition instead of duplicating rows."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        rows = drift_report(
            reference,
            batch_df,
            value_col,
            n_bins=n_bins,
            ks_bins=ks_bins,
            categorical_col=categorical_col,
        ).withColumn("batch_id", F.lit(batch_id))
        # dynamic partition overwrite scoped to THIS batch's partition:
        # replay-safe without reading the metrics table back
        rows.write.mode("overwrite").partitionBy("batch_id").option(
            "partitionOverwriteMode", "dynamic"
        ).parquet(metrics_dir)

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_drift_metrics(spark: SparkSession, metrics_dir: str) -> DataFrame:
    """The monitoring table: (batch_id, metric, value).

    Existence is checked through the Hadoop FileSystem API so the
    check is true for ANY supported scheme (HDFS/S3/local) — a local
    ``os.path`` check would false-negative on every remote filesystem
    this module's deployment story targets (round-10 advice finding).
    """
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(metrics_dir)
    if not path.getFileSystem(hconf).exists(path):
        raise FileNotFoundError(metrics_dir)
    return spark.read.parquet(metrics_dir)
