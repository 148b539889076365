#!/usr/bin/env python
"""Drive the driver contract end-to-end the way the driver does:
import __spark_entry__, run entry(spark), count rows, show schema."""
import sys

sys.path.insert(0, ".")
import __spark_entry__ as e
from privacy_cdc_lakehouse_spark.session import get_spark

spark = get_spark("smoke_entry")
df = e.entry(spark)
rows = df.collect()
print("schema:", df.schema.simpleString(), flush=True)
print("rows:", len(rows), flush=True)
print("sample:", rows[:3], flush=True)
print("queries:", len(e.queries()), "oracles:", len(e.oracle_sql()), flush=True)
missing = set(e.oracle_sql()) - set(e.queries())
print("oracles without query (must be empty):", missing, flush=True)
