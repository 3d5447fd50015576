"""Mirror of the driver's correctness gate: run every registered query on
Spark AND its DuckDB oracle twin at sf0.001, compare row count + column
names + order-insensitive values.

Oracle-less queries get a smoke run (plan executes, schema stable).
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod
from big_data___knowledge_graph_construction_with_llm_spark.plans import ORACLE, QUERIES
from tests.conftest import SF_DIR

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if v is None:
        return "\0NULL"
    return str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query(name, spark, duck):
    sdf = QUERIES[name](spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    if name not in ORACLE:
        # rows-only smoke: plan executed, schema non-empty
        assert s_cols
        return
    res = duck.execute(ORACLE[name])
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()
    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} (spark) != {len(d_rows)} (duckdb)"
    )
    sc, dc = _canon(s_rows, s_cols), _canon(d_rows, d_cols)
    mismatches = [(a, b) for a, b in zip(sc, dc) if a != b][:5]
    assert sc == dc, f"{name}: value mismatch, first diffs: {mismatches}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    # the driver's gate is rows > 0 — mirror it exactly
    assert len(rows) > 0 and df.columns


#: oracle_sql() strings that are ANSI-portable enough to run VERBATIM on
#: Spark SQL too (the rest use DuckDB-specific routines — quantile_cont,
#: string_split_regex, ::VARCHAR casts, epoch(); q_dedup_exact PARSES on
#: Spark but means something else — DuckDB's regexp_replace 'g' flag arg
#: is Spark's position arg and [[:punct:]] is a POSIX class Java regex
#: lacks — the cautionary tale for why this list is pinned, not probed).
#: For these, the SQL entry point (plans.tables.sql) must reproduce the
#: DataFrame registry's results exactly — the dual-surface contract.
SPARK_PORTABLE_ORACLES = [
    "q_agg_basic",
    "q_canonicalize_relations",
    "q_connected_components",  # recursive CTE — Spark 4 runs it
    "q_filter_project",
    "q_graph_build",
    "q_grouping_sets",
    "q_join_orders_customer",
    "q_membership",
    "q_range_join",
    "q_scan_stats",
    "q_sim_join_names",
    "q_skew_join",
    "q_triangle_count",
    "q_two_hop",
    "q_union_fill",
    "q_weighted_mean",
    "q_xml_records",
]


@pytest.mark.parametrize("name", SPARK_PORTABLE_ORACLES)
def test_sql_surface_parity(name, spark):
    """Dual-surface parity: the oracle SQL string through the engine's
    OWN SQL entry point equals the DataFrame plan — same session, same
    normalized views, order-insensitive value compare."""
    from big_data___knowledge_graph_construction_with_llm_spark.plans.tables import register_tables

    register_tables(spark, SF_DIR)
    sdf = QUERIES[name](spark, SF_DIR)
    qdf = spark.sql(ORACLE[name])
    assert sorted(sdf.columns) == sorted(qdf.columns)
    a = _canon([tuple(r) for r in sdf.collect()], sdf.columns)
    b = _canon([tuple(r) for r in qdf.collect()], qdf.columns)
    assert a == b, f"{name}: SQL-surface result differs from DataFrame plan"
