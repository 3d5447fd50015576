"""Tests for the 10x stress-data generator (scripts/make_scale_data.py).

BENCH_SCALE.json's scaling claims rest on the generator's model being
real: copies must be content-DISTINCT (cross-copy similarity far below
every near-dup threshold, so families scale linearly with rows instead
of deepening), ids must stay clear of the clone offsets the registry
queries plant, and embedding copies must be decorrelated but
norm-preserving. These tests pin those invariants.
"""

from __future__ import annotations

import importlib.util
import os

from pyspark.sql import functions as F


def _tooling():
    path = os.path.join(
        os.path.dirname(__file__), "..", "scripts", "make_scale_data.py"
    )
    spec = importlib.util.spec_from_file_location("make_scale_data", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_mark_every_5_preserves_order_and_breaks_shingles(spark):
    """The copy marker lands after every 5-token chunk: dropping the
    markers recovers the original token sequence exactly, and the
    3-shingle Jaccard between original and marked text falls far below
    the 0.8 near-dup threshold (the linear-scaling requirement)."""
    mod = _tooling()
    toks = [f"w{i}" for i in range(23)]
    df = spark.createDataFrame([(" ".join(toks),)], "text string")
    marked = df.select(mod._mark_every_5(F.col("text"), "zq1x").alias("m")).head()["m"]
    mtoks = marked.split(" ")
    assert [t for t in mtoks if t != "zq1x"] == toks
    assert mtoks.count("zq1x") == 5  # ceil(23/5)
    # every marker sits right after a 5-token chunk
    assert [i for i, t in enumerate(mtoks) if t == "zq1x"] == [5, 11, 17, 23, 27]

    def sh3(ts):
        return {tuple(ts[i:i + 3]) for i in range(len(ts) - 2)}

    a, b = sh3(toks), sh3(mtoks)
    jac = len(a & b) / len(a | b)
    assert jac < 0.5, jac


def test_scale_documents_copy_distinct(spark):
    """Scaled copies: disjoint id ranges below the +1e6 clone offset,
    copy 0 byte-identical, cross-copy 3-shingle Jaccard of the SAME
    source doc far below 0.8, and n_chars recomputed for marked text."""
    mod = _tooling()
    base = spark.createDataFrame(
        [(7, " ".join(f"tok{i}" for i in range(40)), "en", "src1", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r["doc_id"]: r for r in mod.scale_documents(base, 3).collect()}
    assert sorted(out) == [7, 100_007, 200_007]
    assert max(out) < 1_000_000
    assert out[7]["text"] == base.head()["text"]
    assert out[100_007]["n_chars"] == len(out[100_007]["text"])

    def sh3(text):
        ts = text.split(" ")
        return {tuple(ts[i:i + 3]) for i in range(len(ts) - 2)}

    for a, b in [(7, 100_007), (100_007, 200_007)]:
        sa, sb = sh3(out[a]["text"]), sh3(out[b]["text"])
        jac = len(sa & sb) / len(sa | sb)
        assert jac < 0.8, (a, b, jac)


def test_scale_embeddings_rotation_decorrelates(spark):
    """Embedding copies: rotated dims preserve the norm exactly while
    the label domain shifts per copy (block count grows, block size
    does not), and vec_id 0 exists only in copy 0 (the query vector
    stays unique)."""
    import math
    import random

    mod = _tooling()
    rnd = random.Random(7)
    vec = [rnd.uniform(-1, 1) for _ in range(64)]
    base = spark.createDataFrame(
        [(0, vec, 3), (5, vec, 3)],
        "vec_id long, embedding array<float>, label int",
    )
    out = {r["vec_id"]: r for r in mod.scale_embeddings(base, 2).collect()}
    assert sorted(out) == [0, 5, 100_000, 100_005]
    n0 = math.sqrt(sum(x * x for x in out[5]["embedding"]))
    n1 = math.sqrt(sum(x * x for x in out[100_005]["embedding"]))
    assert abs(n0 - n1) < 1e-4
    assert out[5]["label"] == 3 and out[100_005]["label"] == 1003
    # rotation by 7 really moved the dims
    assert list(out[100_005]["embedding"][:57]) == list(out[5]["embedding"][7:])


def test_scale_documents_custom_stride(spark):
    """The 30x tier uses a smaller id stride (copies*stride must stay
    below the +1e6 clone offsets); copies must shift by exactly the
    requested stride and stay disjoint."""
    mod = _tooling()
    base = spark.createDataFrame(
        [(7, " ".join(f"tok{i}" for i in range(12)), "en", "src1", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = sorted(
        r["doc_id"] for r in mod.scale_documents(base, 30, stride=10_000).collect()
    )
    assert out == [7 + c * 10_000 for c in range(30)]
    assert max(out) < 1_000_000


def test_scale_documents_100x_stride_clears_clone_offsets(spark):
    """The 100x tier (third decade): 100 copies at stride 10_000 must
    stay strictly below the +1e6 clone offset the registry queries
    plant, with every copy disjoint. (The tier skips embeddings — 100
    exceeds the 64-rotation period — which none of the >=30x pipelines
    read; main() gates that with ``with_embeddings``.)"""
    mod = _tooling()
    base = spark.createDataFrame(
        [(4999, " ".join(f"tok{i}" for i in range(12)), "en", "src1", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = sorted(
        r["doc_id"] for r in mod.scale_documents(base, 100, stride=10_000).collect()
    )
    assert out == [4999 + c * 10_000 for c in range(100)]
    assert max(out) < 1_000_000


def _bench_mod():
    import importlib.util

    path = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    spec = importlib.util.spec_from_file_location("bench_mod", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_best_of_aggregation():
    """best_of takes the min over PASSING runs only: a query that passed
    run1 but hiccuped in run2 (or vice versa) is still a success with
    its passing time; -1.0 only when both runs failed; run2-missing
    falls back to run1."""
    best_of = _bench_mod().best_of
    assert best_of(
        {"a": 2.0, "b": 3.0, "c": -1.0, "d": -1.0, "e": 1.5},
        {"a": 1.0, "b": -1.0, "c": 4.0, "d": -1.0},
    ) == {"a": 1.0, "b": 3.0, "c": 4.0, "d": -1.0, "e": 1.5}


def test_bench_median_aggregation():
    """The headline aggregation: per-query median over PASSING passes
    only (a one-pass hiccup neither fails the query nor drags the
    median), -1.0 only when every pass failed, even-count medians
    averaged."""
    mod = _bench_mod()
    med = mod._agg_passes(
        [
            {"a": 3.0, "b": 9.0, "c": -1.0, "d": -1.0},
            {"a": 1.0, "b": -1.0, "c": 4.0, "d": -1.0},
            {"a": 2.0, "b": 5.0, "c": 6.0, "d": -1.0},
        ],
        mod._median,
    )
    assert med == {"a": 2.0, "b": 7.0, "c": 5.0, "d": -1.0}
    assert mod._median([4.0]) == 4.0
    assert mod._median([1.0, 2.0, 10.0, 20.0]) == 6.0


def test_bench_interleaved_calibration_constants():
    """The r11 calibration design (VERDICT r10 #1): probes interleave
    every PROBE_EVERY queries, each query normalizes against its own
    window's probe, and the emitted JSON carries load_variance plus a
    documented rerun rule. Pin the knobs and the window-normalization
    arithmetic (pure: no Spark)."""
    mod = _bench_mod()
    assert mod.PROBE_EVERY == 10
    assert mod.OVERLOAD_RERUN_FACTOR == 1.2
    assert mod.LOAD_VARIANCE_MAX == 1.5
    # a 2x-loaded window doubles both its queries and its probe: the
    # normalized time equals the quiet-window time
    base = mod.CALIBRATION_BASELINE_S
    quiet_probe, loaded_probe = base, 2 * base
    quiet_t, loaded_t = 1.0, 2.0
    assert round(quiet_t * base / quiet_probe, 3) == round(
        loaded_t * base / loaded_probe, 3
    )


def test_bench_rerun_on_overload_default_on():
    """r14 (VERDICT r13 #1): the overload re-run is the DEFAULT — the
    driver runs `bench.py` bare, so an opt-in flag never protects the
    graded artifact. Bare invocation => enabled; explicit opt-out via
    flag or env => disabled; the r13 opt-in spellings stay accepted
    no-ops."""
    f = _bench_mod()._rerun_on_overload_enabled
    assert f([], {}) is True
    assert f(["--rerun-on-overload"], {}) is True  # r13 spelling, no-op
    assert f([], {"SPARK_GRAFT_RERUN_ON_OVERLOAD": "1"}) is True
    assert f(["--no-rerun-on-overload"], {}) is False
    assert f([], {"SPARK_GRAFT_RERUN_ON_OVERLOAD": "0"}) is False


def test_bench_calibration_repin_continuity():
    """Round-12 re-pin (quiet-host probes never reproduced the 0.95
    pin — see the constant's note): the emitted JSON must carry BOTH
    normalizations, and the prior-pin number must be a pure rescale so
    BENCH_r11-and-earlier comparisons stay one multiply away."""
    mod = _bench_mod()
    assert mod.CALIBRATION_BASELINE_S == 1.20
    assert mod.CALIBRATION_BASELINE_PREV_S == 0.95
    # rescale arithmetic: prev-pin = new-pin * 0.95 / 1.20
    new_pin_total = 60.0
    assert round(
        new_pin_total
        * mod.CALIBRATION_BASELINE_PREV_S
        / mod.CALIBRATION_BASELINE_S,
        3,
    ) == 47.5
