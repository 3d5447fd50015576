"""Physical-plan assertions: the 100 TB properties the engine claims —
small sides broadcast, predicates/projections reach the parquet scan,
no cartesian products, no row-at-a-time Python in any registered query.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from big_data___knowledge_graph_construction_with_llm_spark.plans import QUERIES
from tests.conftest import SF_DIR


def plan_text(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def test_star_join_broadcasts_small_dims(spark):
    p = plan_text(QUERIES["q_join_orders_customer"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_canonicalize_is_broadcast_lookup(spark):
    p = plan_text(QUERIES["q_canonicalize_relations"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p
    # the big events side must NOT hash-shuffle for the lookup join
    assert "SortMergeJoin" not in p


def test_range_join_broadcast_not_cartesian(spark):
    p = plan_text(QUERIES["q_range_join"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p


def test_filter_reaches_parquet_scan(spark):
    p = plan_text(QUERIES["q_filter_project"](spark, SF_DIR))
    assert "PushedFilters: [" in p
    # at least one real pushed predicate (not an empty list)
    assert "PushedFilters: []" not in p


def test_column_pruning_reaches_scan(spark):
    p = plan_text(QUERIES["q_topk_global"](spark, SF_DIR))
    # ReadSchema must be narrower than the full lineitem schema (16 cols)
    read_line = next(ln for ln in p.splitlines() if "ReadSchema" in ln)
    assert read_line.count(",") < 8


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_python_row_udfs_anywhere(spark, name):
    """Row-at-a-time Python (BatchEvalPython) must never appear; Arrow
    batch (mapInPandas etc.) is the only allowed Python boundary."""
    p = plan_text(QUERIES[name](spark, SF_DIR), mode="extended")
    assert "BatchEvalPython" not in p
    assert "PythonUDF" not in p
