#!/usr/bin/env python
"""Drive the streaming medallion pipeline end-to-end: file stream →
foreachBatch bronze append + checkpointed MERGE → silver, then print
the resulting table state and checkpoint."""
import sys, tempfile, os

sys.path.insert(0, ".")
from pyspark.sql import functions as F

from privacy_cdc_lakehouse_spark.session import get_spark
from privacy_cdc_lakehouse_spark.sources.debezium import cdc_events
from privacy_cdc_lakehouse_spark.cdc.jobs import Lakehouse
from privacy_cdc_lakehouse_spark.streaming.pipeline import run_stream_to_silver

spark = get_spark("smoke_streaming")
root = tempfile.mkdtemp(prefix="pcl_stream_smoke_")
events = cdc_events(spark, "/root/testdata/sf0.001")
mid = events.approxQuantile("offset", [0.5], 0.0)[0]
os.makedirs(f"{root}/src")
events.filter(F.col("offset") <= mid).coalesce(1).write.parquet(f"{root}/f0")
events.filter(F.col("offset") > mid).coalesce(1).write.parquet(f"{root}/f1")
import glob, shutil
for i, f in enumerate(sorted(glob.glob(f"{root}/f*/part-*.parquet"))):
    shutil.copy(f, f"{root}/src/{i:04d}.parquet")

lake = Lakehouse(spark, f"{root}/lake")
run_stream_to_silver(spark, f"{root}/src", lake, f"{root}/ckpt", max_files_per_trigger=1)
silver = lake.silver.read()
print("silver rows:", silver.count(), flush=True)
print("versions: bronze", lake.bronze.current_version(), "silver", lake.silver.current_version(), flush=True)
print("checkpoint:", lake.checkpoints.read().collect(), flush=True)
print("sample:", silver.orderBy("order_id").limit(3).collect(), flush=True)
# replay: restart the same stream with same checkpoint → no-op
run_stream_to_silver(spark, f"{root}/src", lake, f"{root}/ckpt", max_files_per_trigger=1)
print("after replay silver rows:", lake.silver.read().count(), "version:", lake.silver.current_version(), flush=True)
