#!/usr/bin/env python
"""Isolate: silver over parquet-materialized events; stage timings."""
import os, sys, time

sys.path.insert(0, ".")
from privacy_cdc_lakehouse_spark.session import get_spark
from privacy_cdc_lakehouse_spark.sources.debezium import cdc_events
from privacy_cdc_lakehouse_spark.cdc.silver import parse_cdc_envelope, latest_state
from pyspark.sql import functions as F

sf = "/root/testdata/sf0.01"
spark = get_spark("profile3")
print("cores:", os.cpu_count(), "parallelism:", spark.sparkContext.defaultParallelism, flush=True)

tmp = "/tmp/ev_parquet"
t = time.time()
cdc_events(spark, sf).write.mode("overwrite").parquet(tmp)
print(f"write events parquet: {time.time()-t:.1f}s", flush=True)

ev = spark.read.parquet(tmp)

t = time.time()
parsed = parse_cdc_envelope(ev)
print(f"parsed count={parsed.count()}: {time.time()-t:.1f}s", flush=True)

t = time.time()
print(f"silver count={latest_state(parsed).count()}: {time.time()-t:.1f}s", flush=True)

t = time.time()
print(f"silver count again={latest_state(parse_cdc_envelope(ev)).count()}: {time.time()-t:.1f}s", flush=True)

# how expensive is plain from_json alone?
t = time.time()
n = ev.select(F.get_json_object("v", "$.payload.after.order_id").alias("x")).filter(F.col("x").isNotNull()).count()
print(f"plain get_json_object count={n}: {time.time()-t:.1f}s", flush=True)
