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
    "join_semi_anti": ["BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"],
    "window_analytics": ["WindowGroupLimit|Window"],
    # round-2 rewrite: latest-state dedup is a max_by AGGREGATE with
    # partial (map-side) combine, deliberately NOT a window. Physically
    # it is a SortAggregate (struct values have no mutable hash-agg
    # buffer) — the point is `partial_max_by` BEFORE the exchange: the
    # shuffle carries ~|keys| rows, not every event like a window would.
    "cdc_orders_current": ["SortAggregate|HashAggregate", "partial_max_by"],
    # round 7: the three ANN top-k rows ride one union — the brute-force
    # arm's sanctioned cross-score plus the LSH/IVF broadcast joins
    "sim_ann_topk_panel": ["BroadcastNestedLoopJoin|CartesianProduct", "BroadcastHashJoin", "!SortMergeJoin"],
    # round 9: recall panel (lsh/ivf/pq + the pca_full/pca16 lossless-
    # rotation arms). The exact baselines are the sanctioned broadcast
    # cross-scores; the hit-count semi-joins join window outputs whose
    # stats the static planner can't see, so SMJ appears pre-AQE and is
    # converted at runtime — assert no cartesian and no Python instead
    # (pca_project must stay a pure codegen'd projection).
    # round 12 adds the hn (hard-negative) arm: a candidate-sized
    # anti-join + per-query rank window — Window asserted.
    "sim_ann_recall": ["BroadcastNestedLoopJoin", "Window", "!CartesianProduct", "!BatchEvalPython", "!ArrowEvalPython"],
    # round 9: the norm arm's normalize_text is the SANCTIONED Arrow
    # ingest-path operator (driver-visibility arm) — Arrow-batched is
    # expected; row-at-a-time Python never is. Round 12 adds the ppl
    # (perplexity-bucket) arm whose tercile cuts ride broadcast 1-row
    # scalars (BroadcastNestedLoopJoin asserted — the sanctioned
    # scalar cross-join form, never a real cartesian) and the chrf
    # arm (more Generate/HashAggregate, covered).
    "text_quality_panel": ["Generate", "HashAggregate", "ArrowEvalPython", "BroadcastNestedLoopJoin", "!BatchEvalPython", "!CartesianProduct"],
    # line-level boilerplate removal: explode + count-distinct agg +
    # anti-join + per-doc rebuild; never a corpus self-join. The
    # boilerplate anti-join is deliberately NOT broadcast-hinted (the
    # duplicated-line set is corpus-scale at 100 TB), so any join
    # strategy is acceptable — assert shape, not join flavor.
    "text_line_dedup": ["Generate", "HashAggregate", "LeftAnti", "!CartesianProduct"],
    # round 9: exact groups are a plain fingerprint groupBy; the winnow
    # arm is posexplode + doc-keyed window + per-doc digest aggregate
    # (join-free); the wpair arm adds the boilerplate-fingerprint
    # broadcast ANTI-join (dedup_lines' discipline) and the grouped
    # in-bucket pair expansion — never a sort-merge or cartesian
    "dedup_exact_groups": ["Generate", "Window", "HashAggregate", "LeftAnti", "!SortMergeJoin", "!CartesianProduct"],
    # round 9: the sig arm is explode+groupBy; the pair arm's candidate
    # semi-join and both signature fetches are un-hinted since round 10
    # (AQE broadcasts them at this SF; a duplicate-heavy corpus may
    # legitimately shuffle) — banding must never go all-pairs
    "simhash_portable": ["Generate", "HashAggregate", "BroadcastHashJoin", "!SortMergeJoin", "!CartesianProduct"],
    # batch-vs-store anti-join + in-batch keeper election
    "dedup_incremental": ["LeftAnti", "HashAggregate", "!CartesianProduct"],
    # SemDeDup: the closure's checkpoint MATERIALIZES the upstream
    # assignment/pair-expansion subplan (same truncation as
    # dedup_clusters), so the visible final plan is the keeper
    # election join over checkpointed components — assert the join is
    # an equi-join, never a cartesian.
    "dedup_semantic": ["Join", "!CartesianProduct", "!BroadcastNestedLoopJoin"],
    # q12 rides inside the scalar-aggregate union since round 5 — its
    # fact-fact join broadcasts at test SF (AQE observes tiny sides)
    # and sort-merges at scale, so any join node satisfies the check.
    "tpch_scalar_aggregates": ["PushedFilters", "ReadSchema", "HashAggregate", "BroadcastHashJoin", "SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"],
    # hash_split must be a pure projection over the scan — no
    # aggregate, no join, no explode. (The one Exchange+Sort in the
    # plan is the registry query's output orderBy for the oracle
    # comparator, not part of the operator. Codegen ids aren't printed
    # pre-execution under AQE, so assert shape, not codegen markers.)
    # the doc arm is a pure projection (pinned at the operator level by
    # test_hash_split_plan_is_pure_projection); the round-9 safe arm
    # adds the exact-dup component aggregate + member explode + the
    # id-keyed component join — assert nothing sort-merges or crosses
    "curation_hash_split": ["Project", "Scan parquet", "HashAggregate", "Generate", "!SortMergeJoin", "!CartesianProduct"],
    # round 9: + fuzzy arm — benchmark banded buckets broadcast, the
    # candidate verify semi-joins before growing shingles; the ONE
    # SortMergeJoin is the final exact⋈fuzzy per-doc assembly (both
    # sides corpus-keyed full-width results — dataset_diff's standing);
    # never a cartesian product.
    "curation_decontam": [
        "BroadcastHashJoin",
        "Generate",
        "HashAggregate",
        "!CartesianProduct",
    ],
    # round 6: q18 rides inside the tpch_customer_revenue union
    "tpch_customer_revenue": ["HashAggregate", "BroadcastHashJoin"],
    # round 10: privacy release surface — the kanon arm's class table
    # is ONE aggregate joined back (AQE broadcasts it; a
    # high-cardinality quasi set may legitimately shuffle, so no join
    # flavor asserted); never a cartesian. Round 12: the dpq arm's
    # noisy-histogram cumulative adds ONE window, bounded at the
    # generated 110-row bin grid by construction — the blanket
    # !Window is retired (positive Window asserted instead).
    "sql_privacy_view": ["HashAggregate", "Window", "!CartesianProduct"],
    # round 15: the candidate frame is localCheckpoint-ed inside
    # _candidate_hint, so its generation pipeline (the minhash explode
    # that used to satisfy a Generate assert) is a materialized RDD
    # scan in THIS plan — assert that scan + the broadcast verify
    # joins + never-cartesian instead.
    "dedup_jaccard_verified": [
        "HashAggregate", "Scan ExistingRDD", "BroadcastHashJoin",
        "!CartesianProduct",
    ],
    # CDF read: explicit change files are a plain parquet scan — no
    # join, no aggregate on the read side (the merge paid them). The
    # round-10 scd2 arm adds the incremental history: key-partitioned
    # stacked windows (lead + row_number share ONE exchange) plus the
    # batch-key-sized closing/version-base equi-joins — never cartesian.
    "cdc_changes_feed": ["Scan parquet", "Window", "!CartesianProduct"],
    # round 10 (cont.): the expect arm's row rules share ONE aggregate
    # pass; unique is a key groupBy and the FK check an anti-join —
    # never a window over the corpus, never cartesian (the dq arm's
    # 1x1x1 scalar cross joins are the sanctioned broadcast form).
    "cdc_bronze_dq": ["HashAggregate|SortAggregate", "LeftAnti", "!Window", "!CartesianProduct"],
    # round 10 (cont.): hll arms — sketch build/merge are plain
    # aggregates; the estimate-vs-exact check is a |priorities|-sized
    # equi-join; the set-op arms keep their shapes. Round 12 adds the
    # kmv arms: the k-smallest-hash sketches must plan as TakeOrdered
    # (never a global sort) and every theta/estimate scalar rides a
    # broadcast 1-row cross join (BNLJ — the sanctioned scalar form)
    "setops_customer_cohorts": ["HashAggregate", "ObjectHashAggregate|SortAggregate|HashAggregate", "TakeOrderedAndProject", "BroadcastNestedLoopJoin", "!CartesianProduct"],
    # packing = one per-shard window over a projection; never a join
    "curation_pack_sequences": ["Window", "!Join"],
    # round 10: the drift arm's only non-equi joins are broadcast 1-row
    # scalars (mid-ts split + reference bounds); bin/category counts are
    # map-side-combinable aggregates and the cumulative-KS window runs
    # over the bounded bin frame, never the corpus
    "events_rollups": ["HashAggregate", "BroadcastNestedLoopJoin", "!CartesianProduct", "!SortMergeJoin"],
    # round 6 (cont.): Q7 broadcasts every dimension hop; Q13's outer
    # join may broadcast at test SF; Q22's scalar avg is a broadcast
    # 1-row cross join + a left-anti join. Round 10 adds the supplier
    # arms (Q9/Q11/Q15/Q16/Q20/Q21 — 22/22 shape coverage): dims
    # broadcast, the Q11/Q15 global scalars are sanctioned
    # broadcast-1-row cross joins, Q21's EXISTS/NOT-EXISTS are
    # semi/anti joins on the orderkey — never a cartesian.
    # Round 12 adds the fslink arm (resolution under LEARNED FS
    # weights): per-dirty-record rank windows — Window asserted (the
    # link arm has had them since round 10) — and the pr (PageRank)
    # arm: per-iteration contribution aggregates, the dangling-mass /
    # N scalars ride broadcast 1-row cross joins (BNLJ asserted), and
    # the top-20 is a TakeOrdered, never a global sort.
    "tpch_join_panel": ["BroadcastHashJoin", "HashAggregate", "Window", "LeftAnti|left_anti", "BroadcastNestedLoopJoin", "TakeOrderedAndProject", "!CartesianProduct"],
    # the mix arm is a pure projection + filter (that purity is pinned
    # at the operator level by test_mixture_sample_plan_is_pure_projection);
    # the round-9 budget arm legitimately adds ONE score-bucket
    # aggregate, a bucket join (un-hinted since round 10 — AQE
    # broadcasts the rounded-score bucket table at this SF) and the
    # boundary-bucket window — never SMJ or cartesian here
    "curation_mixture_sample": ["Project", "Scan parquet", "BroadcastHashJoin", "Window", "!SortMergeJoin", "!CartesianProduct"],
    # tfidf: one explode, two aggregates, vocabulary join, per-doc window
    # round 11: the bm25 arm's query-term table must broadcast (it is
    # a handful of literal terms — term-at-a-time retrieval's posting
    # filter) and nothing may go all-pairs. Round 12 adds the rake
    # arm: ONE phrase-word explode, a vocabulary-sized word-score
    # aggregate + join, and a TakeOrdered top-k (asserted).
    "text_tfidf_topterms": ["Generate", "HashAggregate", "Window", "BroadcastHashJoin", "TakeOrderedAndProject", "!CartesianProduct"],
    # round 10: + BPE arms. Train never appears in this plan (it is k
    # driver-collected vocab-sized aggregates, each pinned join-free by
    # test_bpe_train_plan_is_vocab_sized_no_join); what the final plan
    # shows is encode — posexplode + ONE un-hinted vocabulary join
    # (AQE broadcasts a small vocab; the static plan may SMJ) + the
    # order-preserving reassembly aggregate. Never a cartesian, never
    # Python.
    "text_chunk_stats": ["Generate", "HashAggregate", "!CartesianProduct", "!BatchEvalPython", "!ArrowEvalPython"],
    # spans: positional-gram explode + dup aggregate + islands window;
    # never a cartesian/self-join of the corpus
    "dedup_duplicate_spans": ["Generate", "HashAggregate", "Window", "!CartesianProduct"],
    # round 7: dataset_report + collocations + dataset_diff union —
    # explodes and map-side-combinable aggregates; the only non-equi
    # join is the sanctioned broadcast-1-row totals scalar, never a
    # corpus self-join (collocation pairs come from an index-aware
    # transform, not a join); top-k via TakeOrdered, not a global
    # sort. The diff arm's FULL OUTER id-join is deliberately a
    # SortMergeJoin (full outer cannot broadcast; both sides are
    # corpus-sized — co-partition by id at scale), so assert it is the
    # equi form, not absent: FullOuter must appear, Cartesian must not.
    "corpus_profile": ["Generate", "HashAggregate", "TakeOrderedAndProject", "FullOuter", "!CartesianProduct"],
}

spark = get_spark("explain_audit")
qs = all_queries()
sf = "/root/testdata/sf0.01"
# optional argv filter: `explain_audit.py simhash_portable ...` audits
# only the named queries (full run when no args)
only = set(sys.argv[1:])
n_fail = 0
for name, checks in AUDIT.items():
    if only and name not in only:
        continue
    df = qs[name](spark, sf)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    print(f"\n===== {name} =====")
    # summary line per check ("!pattern" = must NOT appear in the plan)
    for c in checks:
        if c.startswith("!"):
            ok = not re.search(c[1:], plan)
        else:
            ok = bool(re.search(c, plan))
        n_fail += 0 if ok else 1
        print(f"  [{'x' if ok else ' '}] {c}")
    # show scan lines (pushdown evidence) and join nodes
    for line in plan.splitlines():
        if re.search(r"PushedFilters|ReadSchema|Join|WindowGroupLimit|TakeOrdered|codegen id", line):
            print("   ", line.strip()[:200])

print(f"\n{n_fail} failed checks")
sys.exit(1 if n_fail else 0)
