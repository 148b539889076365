#!/usr/bin/env python
"""Profile the CDC flagship pipeline stage by stage."""
import sys, time

sys.path.insert(0, ".")
from privacy_cdc_lakehouse_spark.session import get_spark
from privacy_cdc_lakehouse_spark.sources.debezium import cdc_events
from privacy_cdc_lakehouse_spark.cdc.silver import parse_cdc_envelope, latest_state

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
t0 = time.time()
spark = get_spark("profile")
print(f"session: {time.time()-t0:.1f}s", flush=True)

t = time.time()
ev = cdc_events(spark, sf)
print(f"build events plan: {time.time()-t:.1f}s", flush=True)
t = time.time()
n = ev.count()
print(f"events count={n}: {time.time()-t:.1f}s", flush=True)

t = time.time()
parsed = parse_cdc_envelope(ev)
print(f"parse plan: {time.time()-t:.1f}s", flush=True)
t = time.time()
n = parsed.count()
print(f"parsed count={n}: {time.time()-t:.1f}s", flush=True)

t = time.time()
silver = latest_state(parsed)
n = silver.count()
print(f"silver count={n}: {time.time()-t:.1f}s", flush=True)

t = time.time()
rows = silver.collect()
print(f"collect {len(rows)}: {time.time()-t:.1f}s", flush=True)
