"""Physical-plan assertions — the 100 TB design gate (SURVEY.md §7 M4).

Correctness says the answer is right at sf0.01; these tests pin the SHAPE
of the plan so it stays right at 1000 executors:
- dimension joins must be BroadcastHashJoin (no fact-table shuffle),
- scans must show pushed filters / pruned schemas,
- global top-k must be TakeOrderedAndProject (no global sort),
- no Python (BatchEvalPython) in relational hot paths.
"""

from __future__ import annotations

import re

import pytest

from structured_streaming_cassandra_sink_spark.plans import registry

registry.load_all()


def _plan(spark, sf_dir, name: str) -> str:
    df = registry.QUERIES[name](spark, sf_dir)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_broadcast_join_for_dims(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_inner_broadcast")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "filter_predicate")
    assert re.search(r"PushedFilters: \[.*GreaterThan\(l_quantity", plan)


def test_column_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "scan_project_cast")
    m = re.search(r"ReadSchema: (struct<[^\n]*)", plan)
    assert m, plan
    read = m.group(1)
    assert "l_extendedprice" not in read  # untouched columns not read
    assert "l_quantity" not in read


def test_topk_no_global_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sort_limit_topk")
    assert "TakeOrderedAndProject" in plan


def test_no_python_in_relational_paths(spark, sf_dir):
    for name in [
        "flagship_latest_event_per_user",
        "groupby_agg",
        "join_range",
        "window_frame",
        "split_explode",
    ]:
        plan = _plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, name
        assert "MapInPandas" not in plan, name


def test_whole_stage_codegen_on_agg(spark, sf_dir):
    # With AQE the physical plan only finalizes on execution; run the
    # query, then assert codegen stages exist in the final adaptive plan.
    df = registry.QUERIES["groupby_agg"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "*(" in plan  # '*(n)' prefixes = whole-stage-codegen'd operators
