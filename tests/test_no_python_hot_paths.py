"""Hot paths must stay JVM-side: no row-at-a-time Python evaluation
anywhere, and Arrow-batched Python only in the two sanctioned pandas
operators. Plans are built (analyzed + planned), not executed — this
sweeps the ENTIRE query registry cheaply."""

from __future__ import annotations

from privacy_cdc_lakehouse_spark.queries import all_queries

# Arrow-batched (ArrowEvalPython / FlatMapGroupsInPandas / MapInPandas)
# is allowed ONLY here — these exist to exercise the pandas surface.
# text_quality_panel joined in round 9: its norm arm is the
# driver-visibility row for normalize_text, which is itself the
# documented sanctioned-Arrow ingest-path operator (Spark has no
# built-in ICU normalizer) — the arm exists to verify it, not to put
# Python in an analytic hot path. Round 10 adds the rouge arm on the
# same row: the LCS dynamic program has no relational form, so rouge_l
# is the second sanctioned pandas operator riding this panel.
PANDAS_SANCTIONED = {
    "pandas_zscore_outliers",
    "multimodal_panel",
    "text_quality_panel",
}


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_no_python_eval_in_any_registered_query(spark, sf_dir):
    # Builds run in a small thread pool (guide §2.6 applied to our own
    # harness): many registry rows do real driver-side work at build
    # time (streaming replays, MERGE commits, model fits, eager
    # checkpoint spines) — sequentially this single test cost ~290 s
    # of the suite's pytest budget, and the builds are independent.
    # slot_persist'd subtrees may be evicted by a concurrent build and
    # recompute from lineage (documented-correct, just unaccelerated).
    from concurrent.futures import ThreadPoolExecutor

    def build(item):
        name, fn = item
        return name, _plan(fn(spark, sf_dir))

    with ThreadPoolExecutor(max_workers=4) as pool:
        plans = list(pool.map(build, sorted(all_queries().items())))

    offenders = []
    for name, plan in plans:
        if "BatchEvalPython" in plan:
            offenders.append((name, "BatchEvalPython (row-at-a-time UDF)"))
        if name not in PANDAS_SANCTIONED and (
            "ArrowEvalPython" in plan
            or "FlatMapGroupsInPandas" in plan
            or "MapInPandas" in plan
        ):
            offenders.append((name, "unsanctioned Python node"))
    assert not offenders, f"Python in hot paths: {offenders}"
