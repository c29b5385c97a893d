"""Misra-Gries heavy-hitters sketch: exact-regime equality, the classic
frequency guarantee under heavy compression, and merge stability."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geospatialtools_spark.functions.sketch import heavy_hitters


def _word_df(spark, rows, parts=8):
    return spark.createDataFrame([(w,) for w in rows], "w string") \
                .repartition(parts)


def test_heavy_hitters_exact_regime_matches_groupby(spark):
    # 40 distinct items, capacity 4096 -> zero compression, certified exact
    rows = [f"item{i % 40}" for i in range(4000)] + ["rare"] * 3
    df = _word_df(spark, rows)
    got = heavy_hitters(df, "w", k=10, capacity=4096).collect()
    assert all(r["err_bound"] == 0 for r in got)
    truth = {r["w"]: r["n"] for r in
             df.groupBy("w").agg(F.count("*").alias("n")).collect()}
    expect = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["item"], r["est"]) for r in got] == expect
    assert [r["rank"] for r in got] == list(range(1, 11))


def test_heavy_hitters_guarantee_under_compression(spark):
    # planted skew: 3 heavy items dominate a long tail of one-off items;
    # capacity 8 << 3003 distinct forces real compression
    rows = (["hot_a"] * 5000 + ["hot_b"] * 3000 + ["hot_c"] * 2000
            + [f"tail{i}" for i in range(3000)])
    n = len(rows)
    cap = 8
    df = _word_df(spark, rows, parts=4)
    got = {r["item"]: r for r in
           heavy_hitters(df, "w", k=cap, capacity=cap).collect()}
    err = next(iter(got.values()))["err_bound"]
    assert err > 0                       # compression genuinely happened
    truth = {"hot_a": 5000, "hot_b": 3000, "hot_c": 2000}
    for item, true_n in truth.items():
        # every item with freq > N/(cap+1) must be present...
        assert true_n > n / (cap + 1)
        assert item in got
        # ...with an undercounting estimate inside the reported bound
        assert got[item]["est"] <= true_n <= got[item]["est"] + err
    # ranking of the three heavies is preserved (gaps >> error bound)
    assert got["hot_a"]["est"] > got["hot_b"]["est"] > got["hot_c"]["est"]


def test_heavy_hitters_exactness_is_partition_stable(spark):
    rows = [f"w{i % 25}" for i in range(2500)]
    a = heavy_hitters(_word_df(spark, rows, 3), "w", 5, 1000).collect()
    b = heavy_hitters(_word_df(spark, rows, 11), "w", 5, 1000).collect()
    assert [(r["item"], r["est"], r["err_bound"]) for r in a] == \
           [(r["item"], r["est"], r["err_bound"]) for r in b]


def test_heavy_hitters_null_items_ignored(spark):
    df = spark.createDataFrame([("a",), ("a",), (None,), ("b",)],
                               "w string")
    got = heavy_hitters(df, "w", k=5, capacity=100).collect()
    assert [(r["item"], r["est"]) for r in got] == [("a", 2), ("b", 1)]


# ---------------------------------------------------------------------------
# KMV distinct-count sketch
# ---------------------------------------------------------------------------

from geospatialtools_spark.functions.sketch import (kmv_distinct,
                                                    kmv_finalize,
                                                    kmv_summaries)


def test_kmv_exact_regime_matches_count_distinct(spark):
    rows = [f"item{i % 137}" for i in range(3000)] + [None, None]
    df = _word_df(spark, rows)
    got = kmv_distinct(df, "w", k=512).collect()
    assert len(got) == 1
    r = got[0]
    # 137 distinct < k: exact, NULLs ignored like COUNT(DISTINCT w)
    assert (r["n_kept"], r["est"], r["is_exact"]) == (137, 137.0, 1)


def test_kmv_estimate_accuracy_and_partition_stability(spark):
    # 50k distinct at k=512: RSE ~ 1/sqrt(k-2) ~ 4.4%; md5 is fixed, so
    # the estimate is deterministic — assert the known tolerance, and
    # that the answer is identical under different partitionings (the
    # k smallest distinct hashes of a union don't depend on the split)
    n = 50_000
    df = spark.range(n).select(
        F.concat(F.lit("item-"), F.col("id")).alias("w"))
    a = kmv_distinct(df.repartition(3), "w", k=512).collect()[0]
    b = kmv_distinct(df.repartition(17), "w", k=512).collect()[0]
    assert (a["n_kept"], a["est"], a["is_exact"]) == \
           (b["n_kept"], b["est"], b["is_exact"])
    assert a["is_exact"] == 0 and a["n_kept"] == 512
    assert abs(a["est"] - n) / n < 0.15


def test_kmv_summaries_merge_equals_single_sketch(spark):
    # mergeability: sketch two halves separately, union the summaries,
    # finalize — identical to sketching the whole corpus at once
    k = 128
    df = spark.range(10_000).select(
        F.concat(F.lit("x"), (F.col("id") % 2000).cast("string")).alias("w"))
    lo, hi = df.filter("id < 5000"), df.filter("id >= 5000")
    merged = kmv_finalize(
        kmv_summaries(lo, "w", k).unionByName(kmv_summaries(hi, "w", k)), k)
    whole = kmv_distinct(df, "w", k)
    assert merged.collect() == whole.collect()


def test_kmv_empty_and_all_null_input(spark):
    df = _word_df(spark, [None, None], parts=2)
    r = kmv_distinct(df, "w", k=64).collect()
    assert [(x["n_kept"], x["est"], x["is_exact"]) for x in r] == [(0, 0.0, 1)]


# ---------------------------------------------------------------------------
# MRL quantile sketch
# ---------------------------------------------------------------------------

import math

import numpy as np

from geospatialtools_spark.functions.sketch import (
    mrl_summaries, quantile_finalize, quantile_sketch)

QS = [0.25, 0.5, 0.75, 0.9, 0.99]


def _vals_df(spark, arr, parts=8):
    return spark.createDataFrame([(float(v),) for v in arr], "v double") \
                .repartition(parts)


def _type1(arr, q):
    a = np.sort(np.asarray(arr, dtype=float))
    return a[max(math.ceil(q * len(a)), 1) - 1]


def test_quantile_exact_regime_matches_type1(spark):
    arr = (np.arange(5000) * 3.5) % 997.0
    got = {r["q"]: r for r in
           quantile_sketch(_vals_df(spark, arr), "v", QS).collect()}
    for q in QS:
        r = got[q]
        assert r["is_exact"] == 1 and r["n"] == len(arr)
        assert r["value"] == _type1(arr, q)


def test_quantile_approx_rank_error_bounded(spark):
    # capacity 256 on 60k rows: ~8 compaction levels; deterministic MRL
    # alternating-parity bound is loose, empirically ~0.4% here — assert 3%
    n = 60_000
    arr = (np.arange(n, dtype=np.int64) * 2654435761) % 1_000_003
    srt = np.sort(arr.astype(float))
    rows = quantile_sketch(_vals_df(spark, arr), "v", QS,
                           capacity=256).collect()
    assert all(r["is_exact"] == 0 for r in rows)
    for r in rows:
        rank = np.searchsorted(srt, r["value"], side="right")
        assert abs(rank - r["q"] * n) / n < 0.03


def test_quantile_weight_conservation_and_merge(spark):
    # total weight == N exactly even through odd-sized compactions, and
    # summaries built per-half UNION-merge to the same finalize contract
    n = 10_001  # odd on purpose
    arr = np.linspace(0.0, 1.0, n)
    df = _vals_df(spark, arr, parts=7)
    s = mrl_summaries(df.select(F.col("v").alias("value")), "value",
                      capacity=128)
    assert s.agg(F.sum("weight")).collect()[0][0] == n
    half1 = mrl_summaries(
        _vals_df(spark, arr[: n // 2]).select(F.col("v").alias("value")),
        "value", capacity=128)
    half2 = mrl_summaries(
        _vals_df(spark, arr[n // 2:]).select(F.col("v").alias("value")),
        "value", capacity=128)
    merged = quantile_finalize(half1.unionByName(half2), QS).collect()
    assert {r["n"] for r in merged} == {n}
    srt = np.sort(arr)
    for r in merged:
        rank = np.searchsorted(srt, r["value"], side="right")
        assert abs(rank - r["q"] * n) / n < 0.05


def test_quantile_partition_stable_in_exact_regime(spark):
    arr = (np.arange(3000) * 17.0) % 101.0
    a = sorted(map(tuple, quantile_sketch(
        _vals_df(spark, arr, 3), "v", QS).collect()))
    b = sorted(map(tuple, quantile_sketch(
        _vals_df(spark, arr, 11), "v", QS).collect()))
    assert a == b


def test_quantile_ignores_null_and_nan(spark):
    # both drop in the fold's dropna (the single filtering layer); n
    # counts only real values
    df = spark.createDataFrame(
        [(1.0,), (2.0,), (3.0,), (None,), (float("nan"),)], "v double")
    got = {r["q"]: r for r in
           quantile_sketch(df, "v", [0.5, 1.0]).collect()}
    assert got[0.5]["n"] == 3 and got[0.5]["value"] == 2.0
    assert got[1.0]["value"] == 3.0 and got[1.0]["is_exact"] == 1
