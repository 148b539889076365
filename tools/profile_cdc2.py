#!/usr/bin/env python
"""Test fix: shuffle barrier between event generation and parse."""
import sys, time

sys.path.insert(0, ".")
from privacy_cdc_lakehouse_spark.session import get_spark
from privacy_cdc_lakehouse_spark.sources.debezium import cdc_events
from privacy_cdc_lakehouse_spark.cdc.silver import parse_cdc_envelope, latest_state

sf = "/root/testdata/sf0.01"
spark = get_spark("profile2")

# Variant A: repartition barrier
t = time.time()
ev = cdc_events(spark, sf).repartition(32, "k")
parsed = parse_cdc_envelope(ev)
n = parsed.count()
print(f"A repartition barrier: parsed={n}: {time.time()-t:.1f}s", flush=True)

t = time.time()
n = latest_state(parsed).count()
print(f"A silver: {n}: {time.time()-t:.1f}s", flush=True)

# Variant B: localCheckpoint
t = time.time()
ev2 = cdc_events(spark, sf).localCheckpoint(eager=True)
parsed2 = parse_cdc_envelope(ev2)
n = parsed2.count()
print(f"B localCheckpoint: parsed={n}: {time.time()-t:.1f}s", flush=True)
t = time.time()
n = latest_state(parsed2).count()
print(f"B silver: {n}: {time.time()-t:.1f}s", flush=True)
