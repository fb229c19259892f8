"""Physical-plan hygiene tests (the 100 TB posture, SURVEY §7 M4):
filters reach the parquet scan, projections prune columns, small
dims broadcast. A plan regression here is a scale bug even when
results stay correct."""

from __future__ import annotations

import re

import pytest

from lol_data_pipeline_spark.plans import REGISTRY


def physical_plan(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_to_scan(spark, sf_dir):
    plan = physical_plan(spark, sf_dir, "ref_filter_status")
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan).group(1)
    assert "EqualTo(event_type,error)" in pushed
    assert "GreaterThan(value,5.0)" in pushed


def test_column_pruning_reaches_scan(spark, sf_dir):
    plan = physical_plan(spark, sf_dir, "rel_q3_shipping")
    # lineitem scan must read only the 3 needed columns
    li_schema = next(s for s in re.findall(r"ReadSchema: struct<([^>]*)", plan) if "l_orderkey" in s)
    assert "l_shipdate" not in li_schema and "l_quantity" not in li_schema


def test_dim_joins_broadcast(spark, sf_dir):
    for name in ("rel_q3_shipping", "rel_q5_local_supplier", "rel_join_broadcast"):
        plan = physical_plan(spark, sf_dir, name)
        assert "BroadcastHashJoin" in plan, name


def test_timestamp_predicate_pushdown(spark, sf_dir):
    plan = physical_plan(spark, sf_dir, "rel_q1_pricing")
    assert "LessThanOrEqual(l_shipdate" in plan


def test_no_cartesian_in_relational_queries(spark, sf_dir):
    # the only intentional nested-loop joins are the pairwise
    # similarity kernels; relational queries must never degrade
    for name in ("rel_q1_pricing", "rel_q3_shipping", "rel_q5_local_supplier",
                 "rel_join_left_agg", "rel_range_join", "rel_asof_join"):
        plan = physical_plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
