"""Row-level deletes (key tombstones) and upserts over generational
tables: a delete is a small delta commit, never a table rewrite;
readers hide ancestor rows by broadcast anti-join; compaction
materializes; rows landed AFTER a delete are new data and stay."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data___knowledge_graph_construction_with_llm_spark import fsutil
from big_data___knowledge_graph_construction_with_llm_spark.operators import (
    layout,
)


def _seed(spark, root, n=100):
    df = spark.range(n).select(
        F.col("id"),
        F.lit(0).alias("v"),
        F.md5(F.col("id").cast("string")).alias("fp"),
    )
    return layout.write_table(df.repartition(4), root)


def _ids(df):
    return sorted(r["id"] for r in df.select("id").collect())


def test_delete_hides_rows_time_travel_keeps_them(spark, tmp_path):
    root = f"{tmp_path}/t"
    gen0 = _seed(spark, root)
    rep = layout.delete_from_table(spark, root, "id", keys=[3, 5, 5, None])
    assert rep["n_keys"] == 2 and rep["generation"]
    got = layout.read_table(spark, root)
    assert got.count() == 98
    assert not {3, 5} & set(_ids(got))
    # pinned time travel to the pre-delete generation still sees them
    old = layout.read_table(spark, root, generation=gen0)
    assert old.count() == 100
    census = layout.table_tombstones(spark, root)
    assert [(c["key_col"], c["n_keys"]) for c in census] == [("id", 2)]


def test_delete_where_uses_pruned_read(spark, tmp_path):
    root = f"{tmp_path}/t"
    _seed(spark, root)
    rep = layout.delete_from_table(spark, root, "id", where=("id", "<", 10))
    assert rep["n_keys"] == 10
    got = layout.read_table(spark, root)
    assert got.count() == 90 and min(_ids(got)) == 10
    # stacked second delete composes
    layout.delete_from_table(spark, root, "id", keys=[10, 11])
    assert layout.read_table(spark, root).count() == 88


def test_delete_keys_dataframe_input(spark, tmp_path):
    root = f"{tmp_path}/t"
    _seed(spark, root)
    keys = spark.range(4).select(
        (F.col("id") * 2).alias("id"), F.lit("x").alias("junk")
    )
    rep = layout.delete_from_table(spark, root, "id", keys=keys)
    assert rep["n_keys"] == 4
    assert layout.read_table(spark, root).count() == 96


def test_delete_empty_keys_commits_nothing(spark, tmp_path):
    root = f"{tmp_path}/t"
    gen0 = _seed(spark, root)
    rep = layout.delete_from_table(spark, root, "id", keys=[None])
    assert rep == {"generation": None, "n_keys": 0}
    cur = layout._resolve_table_generation(spark, root)
    assert cur.rsplit("/", 1)[-1] == gen0


def test_upsert_replaces_and_adds(spark, tmp_path):
    root = f"{tmp_path}/t"
    _seed(spark, root)
    up = spark.createDataFrame(
        [(5, 1, "h5"), (6, 1, "h6"), (200, 1, "h200")], "id long, v int, fp string"
    )
    layout.upsert_table(spark, root, up, "id")
    got = layout.read_table(spark, root)
    assert got.count() == 101  # 100 - 2 replaced + 3 (2 replace, 1 new)
    vs = {r["id"]: r["v"] for r in got.select("id", "v").collect()}
    assert vs[5] == 1 and vs[6] == 1 and vs[200] == 1 and vs[7] == 0
    # exactly one version of each upserted key survives
    assert got.filter(F.col("id").isin([5, 6, 200])).count() == 3


def test_readd_after_delete_is_visible(spark, tmp_path):
    root = f"{tmp_path}/t"
    _seed(spark, root)
    layout.delete_from_table(spark, root, "id", keys=[7])
    assert layout.read_table(spark, root).filter(F.col("id") == 7).count() == 0
    # a LATER delta re-adds key 7: new data, the older tombstone does
    # not reach forward
    cur = layout._resolve_table_generation(spark, root).rsplit("/", 1)[-1]
    readd = spark.createDataFrame([(7, 9, "new")], "id long, v int, fp string")
    layout.write_table(readd, root, parent=cur)
    got = layout.read_table(spark, root).filter(F.col("id") == 7).collect()
    assert [(r["id"], r["v"]) for r in got] == [(7, 9)]


def test_pruned_read_parity_with_tombstones(spark, tmp_path):
    root = f"{tmp_path}/t"
    _seed(spark, root)
    layout.delete_from_table(spark, root, "id", where=("id", ">=", 80))
    up = spark.createDataFrame([(40, 7, "h")], "id long, v int, fp string")
    layout.upsert_table(spark, root, up, "id")
    where = [("id", ">=", 30), ("id", "<", 60)]
    pruned = layout.read_table(spark, root, where=where)
    full = layout.read_table(spark, root).filter(
        (F.col("id") >= 30) & (F.col("id") < 60)
    )
    assert _ids(pruned) == _ids(full)
    assert pruned.filter(F.col("id") == 40).collect()[0]["v"] == 7


def test_compact_materializes_tombstones(spark, tmp_path):
    root = f"{tmp_path}/t"
    _seed(spark, root)
    layout.delete_from_table(spark, root, "id", keys=[1, 2, 3])
    up = spark.createDataFrame([(4, 1, "h")], "id long, v int, fp string")
    layout.upsert_table(spark, root, up, "id")
    before = _ids(layout.read_table(spark, root))
    rep = layout.compact_table(spark, root, target_file_bytes=1 << 30)
    assert rep["committed"]
    after_df = layout.read_table(spark, root)
    assert _ids(after_df) == before
    assert after_df.filter(F.col("id") == 4).collect()[0]["v"] == 1
    assert layout.table_tombstones(spark, root) == []
    gen = layout._resolve_table_generation(spark, root)
    assert not fsutil.exists(spark, f"{gen}/_TOMBSTONE_KEY")
    # physically gone: the new generation's own data lacks the rows
    assert 1 not in _ids(
        spark.read.parquet(f"{gen}/data")
    )


def test_mixed_tombstone_key_cols_raise(spark, tmp_path):
    root = f"{tmp_path}/t"
    _seed(spark, root)
    layout.delete_from_table(spark, root, "id", keys=[1])
    with pytest.raises(ValueError, match="already tombstones"):
        layout.delete_from_table(spark, root, "fp", keys=["x"])
    with pytest.raises(ValueError, match="already tombstones"):
        layout.upsert_table(
            spark,
            root,
            spark.createDataFrame([(1, 1, "h")], "id long, v int, fp string"),
            "fp",
        )


def test_delete_arg_validation(spark, tmp_path):
    root = f"{tmp_path}/t"
    _seed(spark, root)
    with pytest.raises(ValueError, match="exactly one"):
        layout.delete_from_table(spark, root, "id")
    with pytest.raises(ValueError, match="exactly one"):
        layout.delete_from_table(
            spark, root, "id", keys=[1], where=("id", "==", 1)
        )
    with pytest.raises(ValueError, match="absent"):
        layout.delete_from_table(spark, root, "nope", keys=[1])


def test_ingest_view_respects_tombstones(spark, tmp_path):
    """The live view's GENERATION leg hides deleted keys; LANDING rows
    are newer than any generation and stay visible even when they
    share a deleted key (re-adding is new data)."""
    root = f"{tmp_path}/ing"
    base = spark.range(50).select(
        F.col("id"), F.lit("base").alias("src")
    )
    layout.write_table(base.repartition(2), root)
    layout.delete_from_table(spark, root, "id", keys=[10, 11])
    batch = spark.createDataFrame(
        [(10, "landed"), (500, "landed")], "id long, src string"
    )
    layout.landing_append(batch, root, batch_id=1)
    got = layout.read_ingest_table(spark, root)
    rows = {(r["id"], r["src"]) for r in got.collect()}
    assert (11, "base") not in rows and (10, "base") not in rows
    assert (10, "landed") in rows and (500, "landed") in rows
    assert got.count() == 50 - 2 + 2
    # absorbing keeps the same answer
    layout.absorb_landing(spark, root, min_batches=1, incremental=True)
    got2 = layout.read_ingest_table(spark, root)
    assert {(r["id"], r["src"]) for r in got2.collect()} == rows


def test_absorb_upsert_latest_per_key(spark, tmp_path):
    """CDC-shaped absorb: the delta keeps the latest landed version
    per key and tombstones the rest — read_table serves exactly one
    current row per key the moment the marker flips."""
    root = f"{tmp_path}/cdc"
    base = spark.range(10).select(F.col("id"), F.lit(0).alias("v"))
    layout.write_table(base.repartition(2), root)
    b1 = spark.createDataFrame([(3, 1), (4, 1)], "id long, v int")
    b2 = spark.createDataFrame([(3, 2), (100, 9)], "id long, v int")
    layout.landing_append(b1, root, batch_id=1)
    layout.landing_append(b2, root, batch_id=2)
    rep = layout.absorb_landing(
        spark, root, min_batches=1, incremental=True, upsert_key="id"
    )
    assert rep["absorbed"] and rep["committed"]
    got = layout.read_table(spark, root)
    vs = {r["id"]: r["v"] for r in got.select("id", "v").collect()}
    assert got.count() == 11  # 10 base - 2 replaced + 2 latest + 1 new
    assert vs[3] == 2 and vs[4] == 1 and vs[100] == 9 and vs[5] == 0
    # a second round of updates stacks: the newer delta's tombstones
    # retire the first delta's versions too
    b3 = spark.createDataFrame([(3, 7)], "id long, v int")
    layout.landing_append(b3, root, batch_id=3)
    layout.absorb_landing(
        spark, root, min_batches=1, incremental=True, upsert_key="id"
    )
    got2 = layout.read_table(spark, root)
    assert got2.count() == 11
    assert got2.filter(F.col("id") == 3).collect()[0]["v"] == 7
    # compaction materializes one physical version per key
    rep2 = layout.compact_table(spark, root, target_file_bytes=1 << 30)
    assert rep2["committed"]
    gen = layout._resolve_table_generation(spark, root)
    phys = spark.read.parquet(f"{gen}/data")
    assert phys.filter(F.col("id") == 3).count() == 1
    assert phys.count() == 11
    assert layout.table_tombstones(spark, root) == []


def test_absorb_upsert_null_keys_append(spark, tmp_path):
    root = f"{tmp_path}/cdc"
    base = spark.createDataFrame([(1, 0)], "id long, v int")
    layout.write_table(base, root)
    b = spark.createDataFrame([(None, 5), (None, 6)], "id long, v int")
    layout.landing_append(b, root, batch_id=1)
    layout.absorb_landing(
        spark, root, min_batches=1, incremental=True, upsert_key="id"
    )
    got = layout.read_table(spark, root)
    assert got.count() == 3  # both null-key rows appended, base kept


def test_absorb_upsert_requires_incremental(spark, tmp_path):
    root = f"{tmp_path}/cdc"
    layout.write_table(spark.range(3).select("id"), root)
    with pytest.raises(ValueError, match="incremental=True"):
        layout.absorb_landing(spark, root, min_batches=1, upsert_key="id")


from hypothesis import given, settings
from hypothesis import strategies as st

_KEYS = st.integers(min_value=0, max_value=9)
_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.lists(_KEYS, min_size=1, max_size=3)),
        st.tuples(st.just("delete"), st.lists(_KEYS, min_size=1, max_size=3)),
        st.tuples(st.just("upsert"), st.lists(_KEYS, min_size=1, max_size=3)),
        st.tuples(st.just("compact"), st.just([])),
    ),
    min_size=1,
    max_size=5,
)


@settings(max_examples=12, deadline=None)
@given(ops=_OPS)
def test_tombstone_semantics_match_model(spark, tmp_path_factory, ops):
    """Model-based check of the delete/upsert/append/compact algebra:
    a Python multiset oracle applies the documented semantics — a
    delete removes CURRENT rows with the key, an upsert replaces them
    with its own rows (dup keys inside one upsert all land), an append
    adds rows regardless of past deletes, compaction changes nothing —
    and read_table must agree after every operation."""
    root = f"{tmp_path_factory.mktemp('prop')}/t"
    seq = 1000
    # seed: keys 0..4, version 0
    layout.write_table(
        spark.createDataFrame([(k, 0) for k in range(5)], "id long, v long"),
        root,
    )
    model: list[tuple[int, int]] = [(k, 0) for k in range(5)]
    for op, keys in ops:
        if op == "append":
            rows = [(k, seq) for k in keys]
            seq += 1
            cur = layout._resolve_table_generation(spark, root)
            layout.write_table(
                spark.createDataFrame(rows, "id long, v long"),
                root,
                parent=cur.rsplit("/", 1)[-1],
            )
            model += rows
        elif op == "delete":
            layout.delete_from_table(spark, root, "id", keys=list(keys))
            model = [(k, v) for k, v in model if k not in set(keys)]
        elif op == "upsert":
            rows = [(k, seq) for k in keys]
            seq += 1
            layout.upsert_table(
                spark,
                root,
                spark.createDataFrame(rows, "id long, v long"),
                "id",
            )
            model = [(k, v) for k, v in model if k not in set(keys)] + rows
        else:  # compact: materializes, must not change the answer
            layout.compact_table(spark, root, target_file_bytes=1 << 30)
        got = sorted(
            (r["id"], r["v"])
            for r in layout.read_table(spark, root).collect()
        )
        assert got == sorted(model), (op, keys, got, sorted(model))


def test_absorb_upsert_multi_lineage_requires_order_col(spark, tmp_path):
    """ADVICE r11: _batch_id counts independently per lineage, so a
    keyed fold across lineages has no defensible "latest" — batch 7 of
    lineage A would beat batch 3 of a later-arriving lineage B. The
    absorb must refuse rather than pick an arbitrary winner."""
    root = f"{tmp_path}/cdc"
    layout.write_table(
        spark.createDataFrame([(1, 0)], "id long, v int"), root
    )
    a = spark.createDataFrame([(1, 10)], "id long, v int")
    b = spark.createDataFrame([(1, 20)], "id long, v int")
    layout.landing_append(a, root, batch_id=7, lineage="runA")
    layout.landing_append(b, root, batch_id=3, lineage="runB")
    with pytest.raises(ValueError, match="not well-ordered"):
        layout.absorb_landing(
            spark, root, min_batches=1, incremental=True, upsert_key="id"
        )
    # nothing was folded; the landing partitions are untouched
    assert layout.read_ingest_table(spark, root).count() == 3


def test_absorb_upsert_order_col_decides_across_lineages(spark, tmp_path):
    """With an explicit event/sequence column the cross-lineage fold
    is well-ordered by the data itself: the higher seq wins even from
    the lower batch id of a lexicographically-earlier lineage."""
    root = f"{tmp_path}/cdc"
    layout.write_table(
        spark.createDataFrame([(1, 0, 0), (2, 0, 0)], "id long, v int, seq long"),
        root,
    )
    a = spark.createDataFrame([(1, 10, 100)], "id long, v int, seq long")
    b = spark.createDataFrame(
        [(1, 20, 200), (2, 5, 50)], "id long, v int, seq long"
    )
    layout.landing_append(a, root, batch_id=7, lineage="runA")
    layout.landing_append(b, root, batch_id=3, lineage="runB")
    rep = layout.absorb_landing(
        spark,
        root,
        min_batches=1,
        incremental=True,
        upsert_key="id",
        order_col="seq",
    )
    assert rep["absorbed"] and rep["committed"]
    vs = {
        r["id"]: (r["v"], r["seq"])
        for r in layout.read_table(spark, root).collect()
    }
    assert vs == {1: (20, 200), 2: (5, 50)}
    # single lineage + order_col: seq outranks batch id there too
    c = spark.createDataFrame([(1, 30, 150)], "id long, v int, seq long")
    layout.landing_append(c, root, batch_id=8, lineage="runB")
    d = spark.createDataFrame([(1, 40, 300)], "id long, v int, seq long")
    layout.landing_append(d, root, batch_id=9, lineage="runB")
    layout.absorb_landing(
        spark,
        root,
        min_batches=1,
        incremental=True,
        upsert_key="id",
        order_col="seq",
    )
    got = layout.read_table(spark, root)
    assert got.filter(F.col("id") == 1).collect()[0]["v"] == 40
    with pytest.raises(ValueError, match="order_col"):
        layout.landing_append(
            spark.createDataFrame([(9, 1, 1)], "id long, v int, seq long"),
            root,
            batch_id=10,
            lineage="runB",
        ) or layout.absorb_landing(
            spark,
            root,
            min_batches=1,
            incremental=True,
            upsert_key="id",
            order_col="nope",
        )
