"""Physical-plan assertions: the optimizations we rely on at 100 TB
must actually appear in the plan, not just in docstrings.

Checks (via explain(formatted)): parquet filter pushdown, column
pruning (ReadSchema), broadcast joins for fixed-cardinality dims,
partial (map-side) aggregation, TakeOrderedAndProject for top-k, and
no accidental CartesianProduct in the fact-side joins.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from pe_firm_investment_database_pipeline_spark.plans import all_queries

SF = "/root/testdata/sf0.01"
_Q = all_queries()


def _plan(spark, op_id: str) -> str:
    df = _Q[op_id].fn(spark, SF)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_flagship(spark):
    plan = _plan(spark, "flagship_revenue_by_nation")
    assert "PushedFilters" in plan
    # the shipdate range predicate reaches the lineitem scan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_shipdate" in plan


def test_filter_pushdown_isin(spark):
    plan = _plan(spark, "flt_member_pe_au")
    assert "In(c_mktsegment" in plan


def test_column_pruning(spark):
    """proj_select reads exactly its 3 columns — no full-row scan."""
    plan = _plan(spark, "proj_select")
    read_schema = next(
        line for line in plan.splitlines() if "ReadSchema" in line
    )
    assert "c_custkey" in read_schema
    assert "c_name" in read_schema
    assert "c_mktsegment" in read_schema
    assert "c_acctbal" not in read_schema
    assert "c_address" not in read_schema


@pytest.mark.parametrize(
    "op_id",
    ["flagship_revenue_by_nation", "join_broadcast", "join_score_argmax"],
)
def test_dims_broadcast(spark, op_id):
    plan = _plan(spark, op_id)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_partial_aggregation(spark):
    """agg_hash_groupby runs map-side partial + final HashAggregate —
    the shuffle carries pre-combined groups, not raw rows."""
    plan = _plan(spark, "agg_hash_groupby")
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan or "partial_count" in plan


def test_topk_is_take_ordered(spark):
    """Global top-k never materializes a full sort."""
    plan = _plan(spark, "sort_topk")
    assert "TakeOrderedAndProject" in plan


def test_semi_anti_join_operators(spark):
    assert "LeftSemi" in _plan(spark, "join_left_semi")
    assert "LeftAnti" in _plan(spark, "join_left_anti")


def test_lsh_join_is_equi_not_cross(spark):
    """The MinHash LSH candidate join must be a hash/merge equi-join
    on (band, bkey) — the sub-quadratic property."""
    plan = _plan(spark, "dedup_minhash_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
