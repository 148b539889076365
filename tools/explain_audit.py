#!/usr/bin/env python
"""Plan audit: print formatted physical plans for key queries and grep
for the properties that matter at scale (pushdown, pruning, broadcast,
codegen)."""
import re
import sys

sys.path.insert(0, ".")
from privacy_cdc_lakehouse_spark.queries import all_queries
from privacy_cdc_lakehouse_spark.session import get_spark

AUDIT = {
    "q1_pricing_summary": ["PushedFilters", "ReadSchema", "HashAggregate"],
    "q3_top_unshipped": ["BroadcastHashJoin", "TakeOrderedAndProject"],
    "q5_revenue_by_nation": ["BroadcastHashJoin"],
    "join_anti_customers_without_orders": ["BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"],
    "window_top3_per_segment": ["WindowGroupLimit|Window"],
    "cdc_orders_current": ["WindowGroupLimit|Window", "PushedFilters"],
    "sim_topk_bruteforce": ["BroadcastNestedLoopJoin|CartesianProduct"],
    "q6_forecast_revenue": ["PushedFilters", "ReadSchema", "HashAggregate"],
    "q12_priority_by_returnflag": ["SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"],
    "q14_promo_revenue": ["BroadcastHashJoin"],
    "q18_large_volume_customers": ["HashAggregate", "BroadcastHashJoin"],
    "dedup_jaccard_verified": ["HashAggregate", "Generate"],
}

spark = get_spark("explain_audit")
qs = all_queries()
sf = "/root/testdata/sf0.01"
for name, checks in AUDIT.items():
    df = qs[name](spark, sf)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    print(f"\n===== {name} =====")
    # summary line per check
    for c in checks:
        hit = re.search(c, plan)
        print(f"  [{'x' if hit else ' '}] {c}")
    # show scan lines (pushdown evidence) and join nodes
    for line in plan.splitlines():
        if re.search(r"PushedFilters|ReadSchema|Join|WindowGroupLimit|TakeOrdered|codegen id", line):
            print("   ", line.strip()[:200])
