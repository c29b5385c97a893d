"""DSIR importance resampling — featurization, model fit, scoring and
Gumbel top-k resample pinned against an independent python reference
(md5 is identical across Spark / Python / DuckDB, so featurization and
the resample key are EXACT cross-engine; log-weights match to float
tolerance)."""

from __future__ import annotations

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from geospatialtools_spark.functions import dsir as DS


def _grams(text: str) -> list[str]:
    toks = re.findall(r"[a-z0-9]+", (text or "").lower())
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket(g: str, n_buckets: int) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets


def _ref_model(target, raw, n_buckets):
    ct, cr = [0] * n_buckets, [0] * n_buckets
    for t in target:
        for g in _grams(t):
            ct[_bucket(g, n_buckets)] += 1
    for t in raw:
        for g in _grams(t):
            cr[_bucket(g, n_buckets)] += 1
    tt, rt = sum(ct), sum(cr)
    return [math.log((ct[b] + 1) / float(tt + n_buckets))
            - math.log((cr[b] + 1) / float(rt + n_buckets))
            for b in range(n_buckets)]


def _ref_log_w(text, model, n_buckets):
    return sum(model[_bucket(g, n_buckets)] for g in _grams(text))


def _u(key) -> float:
    h = int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16)
    return (h + 0.5) / 4294967296.0


_RAW = [
    (1, "the cat sat on the mat"),
    (2, "stock market prices rose sharply today after the announcement"),
    (3, "the dog sat on the log near the cat"),
    (4, "buy cheap pills online now discount offer click here"),
    (5, "a cat and a dog walked on a mat"),
    (6, ""),
    (7, None),
]
_TARGET = ["the cat sat quietly", "a dog on a mat", "the cat and the dog"]


def test_gram_buckets_match_python(spark):
    df = spark.createDataFrame(_RAW, "doc_id long, text string")
    rows = df.select("doc_id",
                     DS.gram_buckets(F.col("text"), 97).alias("b")).collect()
    for r in rows:
        text = dict(_RAW)[r["doc_id"]]
        expect = [_bucket(g, 97) for g in _grams(text)] if text else []
        assert r["b"] == expect


def test_fit_and_log_weights_match_reference(spark):
    B = 97
    raw = spark.createDataFrame(_RAW, "doc_id long, text string")
    target = spark.createDataFrame([(i, t) for i, t in enumerate(_TARGET)],
                                   "doc_id long, text string")
    model = DS.fit_dsir(target, raw, n_buckets=B)
    ref = _ref_model(_TARGET, [t for _, t in _RAW], B)
    got = {r["bucket"]: r["log_ratio"] for r in model.collect()}
    assert set(got) == set(range(B))
    for b in range(B):
        assert got[b] == pytest.approx(ref[b], rel=1e-12, abs=1e-12)

    lw = DS.dsir_log_weights(raw, model, n_buckets=B)
    got_w = {r["doc_id"]: r["log_w"] for r in lw.collect()}
    for i, t in _RAW:
        assert got_w[i] == pytest.approx(
            _ref_log_w(t, ref, B) if t else 0.0, rel=1e-9, abs=1e-12)
    # cat/dog prose must outscore the spam and the finance doc under a
    # cat/dog target — the method's whole point
    assert min(got_w[1], got_w[3], got_w[5]) > max(got_w[2], got_w[4])


def test_dsir_sample_gumbel_topk_deterministic(spark):
    B = 97
    raw = spark.createDataFrame(_RAW, "doc_id long, text string")
    target = spark.createDataFrame([(i, t) for i, t in enumerate(_TARGET)],
                                   "doc_id long, text string")
    lw = DS.dsir_log_weights(raw, DS.fit_dsir(target, raw, n_buckets=B),
                             n_buckets=B)
    picked = [r["doc_id"] for r in DS.dsir_sample(lw, k=3).collect()]
    ref_model = _ref_model(_TARGET, [t for _, t in _RAW], B)
    keys = {i: (_ref_log_w(t, ref_model, B) if t else 0.0)
            - math.log(-math.log(_u(i))) for i, t in _RAW}
    expect = [i for i, _ in sorted(keys.items(),
                                   key=lambda kv: (-kv[1], kv[0]))][:3]
    assert picked == expect
    # stable under repartition
    again = [r["doc_id"]
             for r in DS.dsir_sample(lw.repartition(5), k=3).collect()]
    assert again == picked


def test_dsir_sample_plan_is_take_ordered(spark):
    raw = spark.createDataFrame(_RAW, "doc_id long, text string") \
        .withColumn("log_w", F.lit(0.0))
    plan = DS.dsir_sample(raw, k=2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
