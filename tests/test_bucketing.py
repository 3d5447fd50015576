"""Scale-layout tests: bucketed tables make the big⋈big join co-located
(no Exchange before the join), and IVF/ANN operators honor their
contracts. These encode the at-rest decisions the 100 TB design relies
on (SURVEY.md §4, q_join_orders_customer docstring).
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from big_data___knowledge_graph_construction_with_llm_spark.operators.similarity import (
    ivf_centroids,
    knn_brute_force,
    knn_ivf,
)
from big_data___knowledge_graph_construction_with_llm_spark.plans.tables import load
from tests.conftest import SF_DIR


def _plan(df, mode="formatted"):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktest LOCATION '{wh}'")
    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_extendedprice")
    o = load(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    (
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("bktest.li_b")
    )
    (
        o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("bktest.o_b")
    )
    yield "bktest"
    spark.sql("DROP DATABASE bktest CASCADE")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    li = spark.table("bktest.li_b")
    o = spark.table("bktest.o_b")
    # hint forces SMJ (at test scale AQE would broadcast); at real scale
    # both sides are too big to broadcast and SMJ is what happens anyway
    joined = li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
    p = _plan(joined)
    # co-located: the sort-merge join reads bucket files directly
    assert "SortMergeJoin" in p
    assert "Exchange" not in p, p
    # and it still returns the right rows
    expected = (
        load(spark, SF_DIR, "lineitem")
        .join(
            load(spark, SF_DIR, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert joined.count() == expected


def test_unbucketed_same_join_does_exchange(spark):
    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_extendedprice")
    o = load(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    # force SMJ so the comparison is apples-to-apples with the bucketed plan
    p = _plan(li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey))
    assert "Exchange" in p


def test_ivf_centroids_contract(spark):
    vecs = load(spark, SF_DIR, "embeddings").filter(F.col("vec_id") != 0)
    cents = ivf_centroids(vecs, k=4, iterations=1)
    rows = cents.collect()
    assert {r["cluster"] for r in rows} <= set(range(4))
    dim = len(vecs.head()["embedding"])
    assert all(len(r["centroid"]) == dim for r in rows)


def test_ivf_centroids_mod_init_and_rounding(spark):
    """r14 oracle-replayable quantizer knobs (VERDICT r13 #2):
    ``init="mod"`` seeds clusters as ``vec_id pmod k`` (ANSI-SQL
    replayable, unlike xxhash64) and ``round_dp`` rounds every centroid
    mean — together they make the trained quantizer bit-reproducible
    across runs and engines. Pin: (a) rounded means carry at most
    round_dp decimals, (b) two independent trainings produce IDENTICAL
    centroid doubles, (c) an unknown init raises."""
    import pytest as _pytest

    vecs = load(spark, SF_DIR, "embeddings").filter(F.col("vec_id") != 0)
    a = ivf_centroids(vecs, k=4, iterations=2, init="mod", round_dp=6)
    b = ivf_centroids(vecs, k=4, iterations=2, init="mod", round_dp=6)
    ra = {r["cluster"]: list(r["centroid"]) for r in a.collect()}
    rb = {r["cluster"]: list(r["centroid"]) for r in b.collect()}
    assert ra == rb  # bit-identical, not approximately equal
    for cen in ra.values():
        for x in cen:
            assert x == round(x, 6)
    with _pytest.raises(ValueError, match="unknown ivf init"):
        ivf_centroids(vecs, k=4, init="bogus")


def test_knn_ivf_returns_ranked_topk(spark):
    vecs = load(spark, SF_DIR, "embeddings").filter(F.col("vec_id") != 0)
    q = [float(x) for x in load(spark, SF_DIR, "embeddings").filter("vec_id = 0").head()["embedding"]]
    cents = ivf_centroids(vecs, k=4, iterations=1)
    got = knn_ivf(vecs, cents, q, 5, n_probe=4).collect()
    assert len(got) == 5
    cos = [r["cosine"] for r in got]
    assert cos == sorted(cos, reverse=True)
    # probing ALL clusters must equal brute force exactly
    brute = knn_brute_force(vecs, q, 5).collect()
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in brute]


def test_quantize_int8_roundtrip_and_cosine_error(spark):
    """int8 quantization of unit vectors: dequantized cosine must stay
    within 2/127 of the exact cosine, and the quantized column must be
    tinyint (the 4x-at-rest claim is only true if the type is real)."""
    from big_data___knowledge_graph_construction_with_llm_spark.operators.similarity import (
        cosine,
        dequantize_int8,
        l2_normalize,
        quantize_int8,
    )

    vecs = (
        load(spark, SF_DIR, "embeddings")
        .filter(F.col("vec_id") != 0)
        .limit(50)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .withColumn("u", l2_normalize(F.col("v")))
    )
    q = vecs.withColumn("q", quantize_int8(F.col("u")))
    assert dict(q.dtypes)["q"] == "array<tinyint>"
    both = q.withColumn("dq", dequantize_int8(F.col("q")))
    err = both.select(
        F.abs(
            cosine(F.col("u"), F.col("u")) - cosine(F.col("u"), F.col("dq"))
        ).alias("e")
    ).agg(F.max("e").alias("m")).head()["m"]
    assert err < 2.0 / 127


def test_multi_probe_lsh_recovers_boundary_neighbor(spark):
    """A near-neighbor that straddles the weakest hyperplane lands in an
    adjacent bucket: single-probe misses it, n_probe=2 finds it, and the
    probe order must flip the least-confident bit first."""
    from big_data___knowledge_graph_construction_with_llm_spark.operators.similarity import knn_lsh

    query = [0.01, 1.0, 1.0, 1.0, 0.5, 0.5, 0.5, 0.5]
    neighbor = [-0.01, 1.0, 1.0, 1.0, 0.5, 0.5, 0.5, 0.5]  # flips dim 0 only
    decoy = [1.0, 1.0, 1.0, 1.0, -1.0, -1.0, -1.0, -1.0]   # same bucket, far
    df = spark.createDataFrame(
        [(1, neighbor), (2, decoy)], "vec_id int, embedding array<double>"
    )
    single = [r["vec_id"] for r in knn_lsh(df, query, 2, n_probe=1).collect()]
    multi = [r["vec_id"] for r in knn_lsh(df, query, 2, n_probe=2).collect()]
    assert 1 not in single
    assert multi[0] == 1  # boundary neighbor found AND ranked first


def test_decontaminate_drops_benchmark_leaks(spark):
    """Corpus docs near-identical to a benchmark doc must be dropped;
    unrelated docs must survive with all their columns."""
    from big_data___knowledge_graph_construction_with_llm_spark.operators.dedup import decontaminate

    leak = "the quick brown fox jumps over the lazy dog again and again today"
    docs = spark.createDataFrame(
        [
            (1, leak, "en"),
            (2, leak + " ok", "en"),  # near-dup of the benchmark doc
            (3, "completely unrelated text about spark query planning internals", "en"),
        ],
        "doc_id int, text string, lang string",
    )
    bench = spark.createDataFrame([(leak,)], "text string")
    clean = decontaminate(docs, bench, "doc_id", "text", threshold=0.5)
    assert sorted(r["doc_id"] for r in clean.collect()) == [3]
    assert set(clean.columns) == {"doc_id", "text", "lang"}
    # high threshold keeps the near-dup, still drops the exact leak
    loose = decontaminate(docs, bench, "doc_id", "text", threshold=0.999)
    assert sorted(r["doc_id"] for r in loose.collect()) == [2, 3]


def test_write_bucketed_helper_zero_exchange(spark, tmp_path_factory):
    """Tables written via the helper must sort-merge-join with no
    Exchange — the co-location contract the helper exists to provide."""
    from big_data___knowledge_graph_construction_with_llm_spark.sources.tabular import write_bucketed

    wh = tmp_path_factory.mktemp("wh2")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bkh LOCATION '{wh}'")
    try:
        a = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("x"))
        b = spark.range(500).select(F.col("id").alias("k"), (F.col("id") * 3).alias("y"))
        write_bucketed(a, "bkh.a_b", ["k"], n_buckets=4)
        write_bucketed(b, "bkh.b_b", ["k"], n_buckets=4)
        joined = spark.table("bkh.a_b").join(spark.table("bkh.b_b").hint("merge"), "k")
        p = _plan(joined)
        assert "SortMergeJoin" in p
        assert "Exchange" not in p, p
        assert joined.count() == 500
    finally:
        spark.sql("DROP DATABASE bkh CASCADE")


def test_ensure_ivf_index_builds_once_and_probes(spark, tmp_path):
    """Build-once contract: first call trains + writes the partitioned
    layout, second call must NOT rebuild (directory untouched) and the
    probe against the read-back index matches brute force when probing
    all clusters."""
    import os

    from big_data___knowledge_graph_construction_with_llm_spark.operators.similarity import (
        ensure_ivf_index,
    )

    vecs = load(spark, SF_DIR, "embeddings").filter(F.col("vec_id") != 0)
    path = str(tmp_path / "ivf")
    idx, cents = ensure_ivf_index(spark, vecs, path, k=4, iterations=1)
    assert idx.count() == vecs.count()
    marker = os.path.join(path, "_DONE")
    stamp = os.path.getmtime(marker)
    idx2, cents2 = ensure_ivf_index(spark, vecs, path, k=4, iterations=1)
    assert os.path.getmtime(marker) == stamp  # no rebuild
    assert cents2.count() == cents.count()
    q = [
        float(x)
        for x in load(spark, SF_DIR, "embeddings").filter("vec_id = 0").head()[
            "embedding"
        ]
    ]
    got = knn_ivf(idx2, cents2, q, 5, n_probe=4).collect()
    brute = knn_brute_force(vecs, q, 5).collect()
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in brute]


def test_ensure_ivf_index_concurrent_builders(spark, tmp_path):
    """Two builders race on ONE path (thread barrier: both pass the
    marker-absent check before either commits). The marker-last commit
    protocol must leave BOTH with a complete readable index — whichever
    marker write landed last is the winner every later reader resolves."""
    import threading

    from big_data___knowledge_graph_construction_with_llm_spark.operators.similarity import (
        ensure_ivf_index,
    )

    vecs = load(spark, SF_DIR, "embeddings").filter(F.col("vec_id") != 0).cache()
    n = vecs.count()
    path = str(tmp_path / "ivf_race")
    results, errors = [], []
    barrier = threading.Barrier(2)

    def build():
        try:
            barrier.wait(timeout=60)  # both enter before either commits
            results.append(ensure_ivf_index(spark, vecs, path, k=4, iterations=1))
        except Exception as e:  # noqa: BLE001 - surface in main thread
            errors.append(e)

    threads = [threading.Thread(target=build) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors
    assert len(results) == 2
    for idx, cents in results:
        assert idx.count() == n          # complete index, no partial reads
        assert cents.count() == 4
    # a fresh reader resolves the winning attempt and sees a full index
    idx3, cents3 = ensure_ivf_index(spark, vecs, path, k=4, iterations=1)
    assert idx3.count() == n and cents3.count() == 4
    vecs.unpersist()


def test_ensure_ivf_index_tolerates_bad_marker(spark, tmp_path):
    """An empty marker (HDFS mid-write observation) or a marker naming a
    vanished attempt (stale) must trigger a clean rebuild, never a read
    of a half-written index."""
    from big_data___knowledge_graph_construction_with_llm_spark import fsutil
    from big_data___knowledge_graph_construction_with_llm_spark.operators.similarity import (
        ensure_ivf_index,
    )

    vecs = load(spark, SF_DIR, "embeddings").filter(F.col("vec_id") != 0)
    n = vecs.count()
    for bad in ("", "attempt-deadbeef0000"):
        path = str(tmp_path / f"ivf_bad_{len(bad)}")
        fsutil.write_text(spark, f"{path}/_DONE", bad)
        idx, cents = ensure_ivf_index(spark, vecs, path, k=4, iterations=1)
        assert idx.count() == n and cents.count() == 4
        # and the rebuild repaired the marker for the next reader
        assert fsutil.read_text(spark, f"{path}/_DONE").strip().startswith("attempt-")


def test_gc_ivf_attempts_protects_winner_and_young_builds(spark, tmp_path):
    """GC deletes only OLD losing attempts: the marker's attempt is
    protected at any age, a young attempt (possibly a build in flight)
    survives, the marker file itself is untouched, and the index still
    resolves after the sweep. After an external loss of the winner dir
    (stale marker), GC leaves the marker alone and the next
    ensure_ivf_index call rebuilds cleanly."""
    from big_data___knowledge_graph_construction_with_llm_spark import fsutil
    from big_data___knowledge_graph_construction_with_llm_spark.operators.similarity import (
        ensure_ivf_index,
        gc_ivf_attempts,
    )

    vecs = load(spark, SF_DIR, "embeddings").filter(F.col("vec_id") != 0)
    n = vecs.count()
    path = str(tmp_path / "ivf_gc")
    ensure_ivf_index(spark, vecs, path, k=4, iterations=1)
    winner = fsutil.read_text(spark, f"{path}/_DONE").strip()
    # two losers: both look complete; only age separates them from a
    # build in progress
    for loser in ("attempt-loser0000old", "attempt-loser0000new"):
        fsutil.write_text(spark, f"{path}/{loser}/_COMPLETE", "")
    old_stamp = fsutil.mtime(spark, f"{path}/attempt-loser0000old")
    # sweep moments after the losers appeared: both are younger than the
    # threshold (indistinguishable from builds in flight) -> untouched
    assert (
        gc_ivf_attempts(
            spark, path, max_age_ms=3_600_000, now_ms=old_stamp + 1_000
        )
        == []
    )
    assert fsutil.exists(spark, f"{path}/attempt-loser0000new")
    # sweep two hours later: both losers are stale -> deleted
    now = old_stamp + 7_200_000
    deleted = gc_ivf_attempts(spark, path, max_age_ms=3_600_000, now_ms=now)
    assert deleted == ["attempt-loser0000new", "attempt-loser0000old"]
    # winner protected unconditionally, even with max_age 0 in the future
    deleted2 = gc_ivf_attempts(spark, path, max_age_ms=0, now_ms=now + 10_000_000)
    assert winner not in deleted2
    assert fsutil.exists(spark, f"{path}/{winner}/_COMPLETE")
    assert fsutil.read_text(spark, f"{path}/_DONE").strip() == winner
    idx, cents = ensure_ivf_index(spark, vecs, path, k=4, iterations=1)
    assert idx.count() == n and cents.count() == 4
    # stale-marker rebuild: winner vanishes externally; GC must not
    # delete the marker, and the next ensure call rebuilds
    fsutil.delete(spark, f"{path}/{winner}")
    gc_ivf_attempts(spark, path, max_age_ms=0, now_ms=now + 20_000_000)
    assert fsutil.exists(spark, f"{path}/_DONE")
    idx2, cents2 = ensure_ivf_index(spark, vecs, path, k=4, iterations=1)
    assert idx2.count() == n and cents2.count() == 4
    assert fsutil.read_text(spark, f"{path}/_DONE").strip() != winner


def test_ensure_ivf_index_opt_in_gc_sweeps_crashed_attempt(spark, tmp_path):
    """The wired janitor: a crashed build's attempt dir (no _COMPLETE —
    the builder died mid-write) is collected by the NEXT successful
    ensure_ivf_index call when gc_max_age_ms is passed; the winner and
    marker survive and the index resolves. Without the opt-in the
    crashed dir is left alone (external-GC default)."""
    from big_data___knowledge_graph_construction_with_llm_spark import fsutil
    from big_data___knowledge_graph_construction_with_llm_spark.operators.similarity import (
        ensure_ivf_index,
    )

    vecs = load(spark, SF_DIR, "embeddings").filter(F.col("vec_id") != 0)
    n = vecs.count()

    # default: no sweep, the crashed dir stays
    path = str(tmp_path / "ivf_nogc")
    fsutil.write_text(spark, f"{path}/attempt-crashed00001/index/part-0", "junk")
    ensure_ivf_index(spark, vecs, path, k=4, iterations=1)
    assert fsutil.exists(spark, f"{path}/attempt-crashed00001")

    # opt-in: the same crashed dir is reaped on the next successful build
    path = str(tmp_path / "ivf_gc_wired")
    fsutil.write_text(spark, f"{path}/attempt-crashed00002/index/part-0", "junk")
    import time

    time.sleep(0.05)  # the crashed dir must be strictly older than "now"
    idx, cents = ensure_ivf_index(
        spark, vecs, path, k=4, iterations=1, gc_max_age_ms=0
    )
    assert idx.count() == n and cents.count() == 4
    assert not fsutil.exists(spark, f"{path}/attempt-crashed00002")
    winner = fsutil.read_text(spark, f"{path}/_DONE").strip()
    assert fsutil.exists(spark, f"{path}/{winner}/_COMPLETE")
    # idempotent re-entry with the sweep still resolves from disk
    idx2, _ = ensure_ivf_index(spark, vecs, path, k=4, iterations=1, gc_max_age_ms=0)
    assert idx2.count() == n
    assert fsutil.exists(spark, f"{path}/{winner}/_COMPLETE")


def test_gc_ivf_attempts_distinct_ages(spark, tmp_path):
    """Age is per-attempt: with two losers written at different times,
    a threshold between their ages deletes exactly the older one."""
    import time

    from big_data___knowledge_graph_construction_with_llm_spark import fsutil
    from big_data___knowledge_graph_construction_with_llm_spark.operators.similarity import (
        gc_ivf_attempts,
    )

    path = str(tmp_path / "ivf_ages")
    fsutil.write_text(spark, f"{path}/attempt-aaa/_COMPLETE", "")
    time.sleep(1.1)
    fsutil.write_text(spark, f"{path}/attempt-bbb/_COMPLETE", "")
    ta = fsutil.mtime(spark, f"{path}/attempt-aaa")
    tb = fsutil.mtime(spark, f"{path}/attempt-bbb")
    assert tb > ta
    cut = (tb - ta + 1) // 2 + 1  # older than aaa, younger than bbb
    deleted = gc_ivf_attempts(spark, path, max_age_ms=cut, now_ms=tb + 1)
    assert deleted == ["attempt-aaa"]
    assert fsutil.exists(spark, f"{path}/attempt-bbb")


def test_decontaminate_rejects_negative_corpus_ids(spark):
    from big_data___knowledge_graph_construction_with_llm_spark.operators.dedup import decontaminate

    docs = spark.createDataFrame(
        [(-1, "negative id doc"), (2, "fine doc")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([("fine doc",)], "text string")
    with pytest.raises(ValueError, match="non-negative corpus ids"):
        decontaminate(docs, bench, "doc_id", "text")


def test_decontaminate_warns_when_benchmark_hits_capped_bucket(spark, caplog):
    """Benchmark rows are exempt from the skew cap, but when their corpus
    partners were capped away the leak check is blind there — that must
    be loud, and the benchmark doc itself must never be what trips the
    cap (corpus-side counts only)."""
    import logging

    from big_data___knowledge_graph_construction_with_llm_spark.operators.dedup import decontaminate

    # 4 identical corpus docs + that text as benchmark: every (band,
    # bucket) of the clones has corpus-size 4 > max_bucket=2 -> capped,
    # and the benchmark doc hashes into those same buckets
    docs = spark.createDataFrame(
        [(i, "leak leak leak leak leak leak") for i in range(4)]
        + [(10, "a perfectly clean document about spark")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("leak leak leak leak leak leak",)], "text string"
    )
    with caplog.at_level(logging.WARNING):
        out = decontaminate(docs, bench, "doc_id", "text", max_bucket=2)
    assert any("benchmark doc" in r.message for r in caplog.records)
    # capped bucket -> the leak goes undetected (documented recall loss)
    assert out.count() == 5


def test_decontaminate_rejects_negative_id_with_null_text(spark):
    """Regression: a NULL-text row sheds no shingles and never reaches
    the banded frame, so the id validation must scan the corpus ids
    directly — not the signature table."""
    from big_data___knowledge_graph_construction_with_llm_spark.operators.dedup import decontaminate

    docs = spark.createDataFrame(
        [(-5, None), (2, "fine doc")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([("fine doc",)], "text string")
    with pytest.raises(ValueError, match="non-negative corpus ids"):
        decontaminate(docs, bench, "doc_id", "text", max_bucket=100)


def test_append_ivf_index_extends_without_retraining(spark, tmp_path):
    """Incremental index maintenance: a new embedding batch is assigned
    to the EXISTING centroids and committed as a _PARENT-linked attempt
    — no k-means re-run, no rewrite of prior index data. Readers union
    the chain; assignment must equal what a from-the-same-centroids
    full build would give; GC must protect the whole chain."""
    from big_data___knowledge_graph_construction_with_llm_spark import fsutil
    from big_data___knowledge_graph_construction_with_llm_spark.operators.similarity import (
        append_ivf_index,
        ensure_ivf_index,
        gc_ivf_attempts,
        ivf_index,
        read_ivf_index,
    )

    emb = load(spark, SF_DIR, "embeddings").filter(F.col("vec_id") != 0)
    base = emb.filter(F.col("vec_id") % 10 < 8)
    b1 = emb.filter(F.col("vec_id") % 10 == 8)
    b2 = emb.filter(F.col("vec_id") % 10 == 9)
    n_base, n1, n2 = base.count(), b1.count(), b2.count()
    path = str(tmp_path / "ivf_app")

    import pytest as _pytest

    with _pytest.raises(ValueError, match="no committed IVF index"):
        append_ivf_index(spark, b1, path)

    idx0, cents0 = ensure_ivf_index(spark, base, path, k=4, iterations=1)
    gen0 = fsutil.read_text(spark, f"{path}/_DONE").strip()
    idx1, cents1 = append_ivf_index(spark, b1, path)
    assert idx1.count() == n_base + n1
    # centroids unchanged (copied forward, not re-trained)
    c0 = {(r["cluster"], tuple(r["centroid"])) for r in cents0.collect()}
    c1 = {(r["cluster"], tuple(r["centroid"])) for r in cents1.collect()}
    assert c0 == c1
    # the appended attempt links to the superseded winner
    gen1 = fsutil.read_text(spark, f"{path}/_DONE").strip()
    assert gen1 != gen0
    assert fsutil.read_text(spark, f"{path}/{gen1}/_PARENT").strip() == gen0

    # append ≡ rebuild assignment: the batch's clusters match a direct
    # map-only assignment against the same centroids
    want = {
        r["vec_id"]: r["cluster"] for r in ivf_index(b1, cents0).collect()
    }
    got = {
        r["vec_id"]: r["cluster"]
        for r in idx1.join(
            b1.select("vec_id"), "vec_id", "left_semi"
        ).collect()
    }
    assert got == want

    # second append: three-link chain, read-only resolver sees it all
    append_ivf_index(spark, b2, path)
    idx2, cents2 = read_ivf_index(spark, path)
    assert idx2.count() == n_base + n1 + n2
    # partition pruning survives the chain union: a one-cluster probe
    # filter DECODES only that cluster's rows in every chain member
    # (inputFiles is relation-level, so the proof is scan-decoded rows)
    from big_data___knowledge_graph_construction_with_llm_spark.operators.layout import (
        decoded_scan_rows,
    )

    c0 = idx2.select("cluster").first()[0]
    pruned = idx2.filter(F.col("cluster") == c0)
    n_c0 = pruned.count()
    assert 0 < n_c0 < idx2.count()
    assert decoded_scan_rows(pruned) == n_c0

    # probe-all equals brute force over the FULL (appended) corpus
    q = [
        float(x)
        for x in load(spark, SF_DIR, "embeddings")
        .filter("vec_id = 0")
        .head()["embedding"]
    ]
    got_ids = [r["vec_id"] for r in knn_ivf(idx2, cents2, q, 5, n_probe=4).collect()]
    want_ids = [r["vec_id"] for r in knn_brute_force(emb, q, 5).collect()]
    assert got_ids == want_ids

    # GC at zero age protects the whole parent chain; an unrelated
    # stale loser is swept
    fsutil.write_text(spark, f"{path}/attempt-stale0000000/_COMPLETE", "")
    deleted = gc_ivf_attempts(spark, path, max_age_ms=0, now_ms=2**62)
    assert deleted == ["attempt-stale0000000"]
    idx3, _ = read_ivf_index(spark, path)
    assert idx3.count() == n_base + n1 + n2


def test_compact_ivf_chain_folds_appends(spark, tmp_path):
    """Folding the _PARENT chain is a data move, not a re-train:
    assignments, centroids and probe results are identical before and
    after; the superseded chain attempts become GC-eligible; the gate
    skips short chains."""
    from big_data___knowledge_graph_construction_with_llm_spark import fsutil
    from big_data___knowledge_graph_construction_with_llm_spark.operators.similarity import (
        append_ivf_index,
        compact_ivf_chain,
        ensure_ivf_index,
        gc_ivf_attempts,
        read_ivf_index,
    )

    emb = load(spark, SF_DIR, "embeddings").filter(F.col("vec_id") != 0)
    path = str(tmp_path / "ivf_fold")
    ensure_ivf_index(spark, emb.filter("vec_id % 4 != 0"), path, k=4, iterations=1)
    for m in (0,):
        append_ivf_index(spark, emb.filter(f"vec_id % 4 = {m}"), path)
    # chain of 2 < min_links=3: census-only skip
    assert compact_ivf_chain(spark, path, min_links=3) == {
        "compacted": False,
        "links": 2,
    }
    before_idx, before_cents = read_ivf_index(spark, path)
    want = {
        (r["vec_id"], r["cluster"]) for r in before_idx.collect()
    }
    rep = compact_ivf_chain(spark, path, min_links=2)
    assert rep["compacted"] is True and rep["links_folded"] == 2
    after_idx, after_cents = read_ivf_index(spark, path)
    assert {(r["vec_id"], r["cluster"]) for r in after_idx.collect()} == want
    assert {
        (r["cluster"], tuple(r["centroid"])) for r in after_cents.collect()
    } == {
        (r["cluster"], tuple(r["centroid"])) for r in before_cents.collect()
    }
    # the folded attempt is parentless; old chain attempts now sweep
    winner = fsutil.read_text(spark, f"{path}/_DONE").strip()
    assert not fsutil.exists(spark, f"{path}/{winner}/_PARENT")
    deleted = gc_ivf_attempts(spark, path, max_age_ms=0, now_ms=2**62)
    assert len(deleted) == 2
    still_idx, _ = read_ivf_index(spark, path)
    assert still_idx.count() == emb.count()


def test_compact_ivf_chain_retrain_closes_drift(spark, tmp_path):
    """compact_ivf_chain(retrain=True): the fold re-runs k-means on
    the union it was already reading and re-assigns every vector — the
    folded attempt has fresh-build structure (every stored cluster is
    the nearest new centroid), not frozen-centroid drift; probe-all
    still equals brute force; plain folds stay bit-identical."""
    from big_data___knowledge_graph_construction_with_llm_spark import fsutil
    from big_data___knowledge_graph_construction_with_llm_spark.operators.similarity import (
        append_ivf_index,
        compact_ivf_chain,
        ensure_ivf_index,
        nearest_cluster,
        read_ivf_index,
    )

    emb = load(spark, SF_DIR, "embeddings").filter(F.col("vec_id") != 0)
    path = str(tmp_path / "ivf_retrain")
    # train on a skewed subset so appended data genuinely drifts the
    # true clustering
    ensure_ivf_index(spark, emb.filter("vec_id % 4 = 1"), path, k=4, iterations=1)
    for m in (2, 3, 0):
        append_ivf_index(spark, emb.filter(f"vec_id % 4 = {m}"), path)
    _idx_before, cents_before = read_ivf_index(spark, path)
    c_before = {
        (r["cluster"], tuple(r["centroid"])) for r in cents_before.collect()
    }

    rep = compact_ivf_chain(spark, path, min_links=2, retrain=True, iterations=2)
    assert rep["compacted"] is True and rep["retrained"] is True
    idx, cents = read_ivf_index(spark, path)
    winner = fsutil.read_text(spark, f"{path}/_DONE").strip()
    assert not fsutil.exists(spark, f"{path}/{winner}/_PARENT")
    assert idx.count() == emb.count()  # every vector survived the fold
    c_after = {
        (r["cluster"], tuple(r["centroid"])) for r in cents.collect()
    }
    assert c_after != c_before  # centroids actually re-trained

    # fresh-build consistency: every stored cluster IS the nearest new
    # centroid (frozen-centroid drift would violate this)
    cpairs = [(r["cluster"], list(r["centroid"])) for r in cents.collect()]
    mism = idx.withColumn(
        "_want", nearest_cluster(F.col("embedding").cast("array<double>"), cpairs)
    ).filter(F.col("cluster") != F.col("_want"))
    assert mism.count() == 0

    # probe-all ≡ brute force over the folded + retrained index
    q = [
        float(x)
        for x in load(spark, SF_DIR, "embeddings")
        .filter("vec_id = 0")
        .head()["embedding"]
    ]
    got = [r["vec_id"] for r in knn_ivf(idx, cents, q, 5, n_probe=4).collect()]
    want = [r["vec_id"] for r in knn_brute_force(emb, q, 5).collect()]
    assert got == want


def test_append_ivf_index_retries_lost_marker_commit(spark, tmp_path, monkeypatch):
    """A delta attempt losing its marker write is a LOST UPDATE (the
    winner chain lacks the batch), not a harmless duplicate: the append
    must retry against the resolved winner until the batch is in the
    committed chain — never return success with the vectors missing."""
    from big_data___knowledge_graph_construction_with_llm_spark import fsutil
    from big_data___knowledge_graph_construction_with_llm_spark.operators.similarity import (
        append_ivf_index,
        ensure_ivf_index,
        read_ivf_index,
    )

    emb = load(spark, SF_DIR, "embeddings").filter(F.col("vec_id") != 0)
    base = emb.filter("vec_id % 5 != 0")
    batch = emb.filter("vec_id % 5 = 0")
    path = str(tmp_path / "ivf_retry")
    ensure_ivf_index(spark, base, path, k=4, iterations=1)

    real = fsutil.write_text
    state = {"fails": 1}

    def flaky(sp, p, content):
        if p.endswith("/_DONE") and state["fails"] > 0:
            state["fails"] -= 1
            raise OSError("injected: _DONE write failed")
        return real(sp, p, content)

    monkeypatch.setattr(fsutil, "write_text", flaky)
    idx, _ = append_ivf_index(spark, batch, path)
    monkeypatch.setattr(fsutil, "write_text", real)
    assert idx.count() == emb.count()  # the batch IS in the result
    # and in the AT-REST committed chain, not just the returned frame
    idx2, _ = read_ivf_index(spark, path)
    assert idx2.count() == emb.count()

    # persistent failure: raises instead of quietly dropping the batch
    import pytest as _pytest

    state["fails"] = 10**9
    monkeypatch.setattr(fsutil, "write_text", flaky)
    with _pytest.raises(RuntimeError, match="could not commit"):
        append_ivf_index(spark, batch.limit(1), path)
    monkeypatch.setattr(fsutil, "write_text", real)


def test_compact_ivf_chain_reports_invisible_fold(spark, tmp_path, monkeypatch):
    """A fold whose marker write fails behind the existing winner must
    report compacted=False (the chain is untouched), so a scheduler
    retries instead of trusting a fold that never took effect."""
    from big_data___knowledge_graph_construction_with_llm_spark import fsutil
    from big_data___knowledge_graph_construction_with_llm_spark.operators.similarity import (
        append_ivf_index,
        compact_ivf_chain,
        ensure_ivf_index,
        read_ivf_index,
    )

    emb = load(spark, SF_DIR, "embeddings").filter(F.col("vec_id") != 0)
    path = str(tmp_path / "ivf_fold_fail")
    ensure_ivf_index(spark, emb.filter("vec_id % 2 = 1"), path, k=4, iterations=1)
    append_ivf_index(spark, emb.filter("vec_id % 2 = 0"), path)
    n = emb.count()

    real = fsutil.write_text

    def failing(sp, p, content):
        if p.endswith("/_DONE"):
            raise OSError("injected: _DONE write failed")
        return real(sp, p, content)

    monkeypatch.setattr(fsutil, "write_text", failing)
    rep = compact_ivf_chain(spark, path, min_links=2)
    monkeypatch.setattr(fsutil, "write_text", real)
    assert rep["compacted"] is False and rep["links_folded"] == 0
    idx, _ = read_ivf_index(spark, path)
    assert idx.count() == n  # old chain still serves, nothing lost
    rep2 = compact_ivf_chain(spark, path, min_links=2)  # healthy retry
    assert rep2["compacted"] is True
    idx2, _ = read_ivf_index(spark, path)
    assert idx2.count() == n


def _drift_vecs(spark, lo, hi, shift=0.0):
    """Deterministic 3-dim synthetic vectors: two tight clusters at
    x≈0 and x≈10 (+shift), sub-0.3 jitter derived from the id — no
    RNG, so drift ratios are reproducible."""
    return spark.range(lo, hi).select(
        F.col("id").alias("vec_id"),
        F.array(
            ((F.col("id") % 2) * 10.0 + shift + (F.col("id") % 5) * 0.05).cast(
                "double"
            ),
            ((F.col("id") % 7) * 0.04).cast("double"),
            ((F.col("id") % 3) * 0.06).cast("double"),
        ).alias("embedding"),
    )


def test_maybe_compact_ivf_gates_on_measured_drift(spark, tmp_path):
    """VERDICT r10 #4: the retrain cadence is a MEASURED decision, not
    a human guess. Every build/append records its mean assignment
    distance in a _STATS sidecar (data those writes already touch);
    maybe_compact_ivf reads the sidecars driver-side and folds — plain
    (bit-identical move) while appended data still fits the frozen
    quantizer, WITH retraining once the drift ratio crosses the
    threshold. On a drifting synthetic stream the gate must retrain
    and the folded quantizer must actually cover the drifted region."""
    from big_data___knowledge_graph_construction_with_llm_spark.operators.similarity import (
        append_ivf_index,
        ensure_ivf_index,
        ivf_drift,
        maybe_compact_ivf,
        nearest_cluster,
        read_ivf_index,
    )

    # --- stationary stream: appends from the SAME distribution -------
    p_flat = str(tmp_path / "ivf_flat")
    ensure_ivf_index(spark, _drift_vecs(spark, 0, 400), p_flat, k=2, iterations=2)
    assert maybe_compact_ivf(spark, p_flat, min_links=2)["compacted"] is False
    for lo in (400, 600):
        append_ivf_index(spark, _drift_vecs(spark, lo, lo + 200), p_flat)
    d = ivf_drift(spark, p_flat)
    assert d["links"] == 3 and d["appended_n"] == 400
    assert d["drift_ratio"] is not None and d["drift_ratio"] < 1.25
    rep = maybe_compact_ivf(spark, p_flat, min_links=2)
    assert rep["compacted"] is True and rep["retrained"] is False
    # the plain fold carried the chain's stats forward driver-side
    d2 = ivf_drift(spark, p_flat)
    assert d2["links"] == 1 and d2["train_mean_d2"] == pytest.approx(
        d["train_mean_d2"]
    )

    # --- drifting stream: appends land FAR from every centroid -------
    p_drift = str(tmp_path / "ivf_drift")
    ensure_ivf_index(
        spark, _drift_vecs(spark, 0, 400), p_drift, k=2, iterations=2
    )
    for lo in (400, 600):
        append_ivf_index(
            spark, _drift_vecs(spark, lo, lo + 200, shift=50.0), p_drift
        )
    d = ivf_drift(spark, p_drift)
    assert d["drift_ratio"] is not None and d["drift_ratio"] > 1.25
    rep = maybe_compact_ivf(spark, p_drift, min_links=2)
    assert rep["compacted"] is True and rep["retrained"] is True
    assert rep["drift_ratio"] == d["drift_ratio"]

    # the retrained quantizer fits the union: every stored cluster is
    # the nearest new centroid, and the fresh baseline makes the SAME
    # drifted distribution now look stationary
    idx, cents = read_ivf_index(spark, p_drift)
    assert idx.count() == 800
    cpairs = [(r["cluster"], list(r["centroid"])) for r in cents.collect()]
    mism = idx.withColumn(
        "_want",
        nearest_cluster(F.col("embedding").cast("array<double>"), cpairs),
    ).filter(F.col("cluster") != F.col("_want"))
    assert mism.count() == 0
    append_ivf_index(
        spark, _drift_vecs(spark, 800, 900, shift=50.0), p_drift
    )
    d3 = ivf_drift(spark, p_drift)
    assert d3["drift_ratio"] is not None


def test_knn_brute_force_many_matches_per_query_loop(spark):
    """Batch exact KNN: one corpus pass for every query of a frame ==
    the per-query knn_brute_force loop, and the plan has the bounded-
    shuffle shape — query frame broadcast (BroadcastNestedLoopJoin,
    never CartesianProduct), partial per-partition top-k collapsing
    map-side before the only shuffle."""
    from big_data___knowledge_graph_construction_with_llm_spark.operators.similarity import (
        knn_brute_force_many,
    )

    vecs = load(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    qframe = (
        load(spark, SF_DIR, "embeddings")
        .filter(F.col("vec_id") < 4)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    many = knn_brute_force_many(vecs, qframe, 5)
    by_q: dict = {}
    for r in many.collect():
        by_q.setdefault(r["query_id"], []).append((r["vec_id"], r["cosine"]))
    qvecs = {
        r["query_id"]: [float(x) for x in r["embedding"]]
        for r in qframe.collect()
    }
    assert sorted(by_q) == sorted(qvecs)
    for qid, qv in qvecs.items():
        want = [
            (r["vec_id"], r["cosine"])
            for r in knn_brute_force(vecs, qv, 5).collect()
        ]
        got = sorted(by_q[qid], key=lambda t: (-t[1], t[0]))
        assert got == want, f"query {qid}: batch != per-query"
    plan = many._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan


def test_bm25_topk_many_plan_shape(spark):
    """Batch BM25's plan: query-terms and df frames broadcast into the
    posting join; no row-at-a-time Python, no cartesian."""
    from big_data___knowledge_graph_construction_with_llm_spark.operators.text import (
        bm25_topk_many,
        text_index,
    )

    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    idx = text_index(docs, "doc_id", "text")
    qdf = spark.createDataFrame(
        [(0, "vector join"), (1, "stream filter")],
        "query_id long, query string",
    )
    out = bm25_topk_many(idx, qdf, k=5, n_docs=500, avgdl=40.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2  # probe terms + df + qterms
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_knn_ivf_many_matches_per_query_loop(spark, tmp_path):
    """Batch IVF ANN == the per-query knn_ivf loop for every query and
    every n_probe (same L2 probe selection, same tie-breaks), against
    an at-rest partitioned index; probing all clusters equals brute
    force, and the index read prunes to the union of probed clusters."""
    from big_data___knowledge_graph_construction_with_llm_spark.operators.similarity import (
        ensure_ivf_index,
        knn_ivf_many,
    )

    vecs = load(spark, SF_DIR, "embeddings").filter(F.col("vec_id") != 0)
    idx, cents = ensure_ivf_index(
        spark, vecs, str(tmp_path / "ivf"), k=4, iterations=1
    )
    qframe = (
        load(spark, SF_DIR, "embeddings")
        .filter(F.col("vec_id").isin([0, 7, 21, 40]))
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    qvecs = {
        r["query_id"]: [float(x) for x in r["embedding"]]
        for r in qframe.collect()
    }
    for n_probe in (1, 2, 4):
        many = knn_ivf_many(idx, cents, qframe, 5, n_probe=n_probe)
        by_q: dict = {}
        for r in many.collect():
            by_q.setdefault(r["query_id"], []).append((r["vec_id"], r["cosine"]))
        for qid, qv in qvecs.items():
            want = [
                (r["vec_id"], r["cosine"])
                for r in knn_ivf(idx, cents, qv, 5, n_probe=n_probe).collect()
            ]
            got = sorted(by_q.get(qid, []), key=lambda t: (-t[1], t[0]))
            assert got == want, f"n_probe={n_probe} query {qid}"
    # all clusters probed == exact brute force, per query
    many_all = knn_ivf_many(idx, cents, qframe, 5, n_probe=4)
    by_q = {}
    for r in many_all.collect():
        by_q.setdefault(r["query_id"], []).append((r["vec_id"], r["cosine"]))
    for qid, qv in qvecs.items():
        brute = [
            (r["vec_id"], r["cosine"]) for r in knn_brute_force(vecs, qv, 5).collect()
        ]
        assert sorted(by_q[qid], key=lambda t: (-t[1], t[0])) == brute


def test_knn_batch_degenerate_vectors_and_dim_guard(spark):
    """Degenerate-cosine candidates (null embedding / zero-norm vector
    under ANSI-off / NaN ELEMENTS, which make the cosine NaN rather
    than null — r14 ADVICE fix: every scoring site normalizes NaN to
    null, because Spark desc ranks NaN ABOVE all doubles while the
    batch fold is null-last) must order LAST in both the single and
    batch forms, matching exactly; and knn_ivf_many keeps knn_ivf's
    dimensionality guard (a mismatched query raises instead of
    silently probing arbitrary clusters)."""
    import pytest

    from big_data___knowledge_graph_construction_with_llm_spark.operators.similarity import (
        ivf_centroids,
        knn_brute_force_many,
        knn_ivf_many,
    )

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, None),                      # null embedding -> null cosine
        (4, [0.0, 0.0, 0.0, 0.0]),      # zero norm -> null cosine (ANSI off)
        (5, [0.0, 1.0, 0.0, 0.0]),
        (6, [float("nan"), 1.0, 0.0, 0.0]),  # NaN element -> NaN cosine
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [1.0, 0.0, 0.0, 0.0]
    qframe = spark.createDataFrame(
        [(0, q)], "query_id long, embedding array<double>"
    )
    # k exceeds the non-null candidate count: single and batch must
    # agree on BOTH the real neighbors and the null-tail behavior
    want = [
        (r["vec_id"], r["cosine"]) for r in knn_brute_force(vecs, q, 6).collect()
    ]
    got = [
        (r["vec_id"], r["cosine"])
        for r in knn_brute_force_many(vecs, qframe, 6)
        .orderBy(F.col("cosine").desc_nulls_last(), "vec_id")
        .collect()
    ]
    assert got == want
    # real neighbors lead; degenerates (incl. the NaN row, normalized
    # to null) only ever trail — never NaN-above-everything
    real = [t for t in got if t[1] is not None]
    assert [t[0] for t in real[:3]] == [1, 2, 5]
    assert all(t[1] is None for t in got[len(real):])
    assert {t[0] for t in got[len(real):]} == {3, 4, 6}
    # dimension mismatch: guarded, not silent
    good = vecs.filter(F.col("embedding").isNotNull()).filter(F.col("vec_id") != 4)
    cents = ivf_centroids(good, k=2, iterations=1)
    bad_q = spark.createDataFrame(
        [(0, [1.0, 0.0])], "query_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="dims"):
        knn_ivf_many(good, cents, bad_q, 2, n_probe=1).collect()
