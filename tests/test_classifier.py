"""Logistic-regression quality classifier: distributed full-batch GD
training parity vs a pure-python reference, scoring expression parity,
and separability on a planted-rule corpus."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from geospatialtools_spark.functions.classifier import (
    fit_logreg, logreg_predict_py, logreg_score, sigmoid)


def _py_fit(rows, k, lr, iters, l2=0.0, standardize=True):
    """Reference trainer: identical math to fit_logreg, single-threaded."""
    n = len(rows)
    if standardize:
        mean = [sum(r[i] for r in rows) / n for i in range(k)]
        var = [sum((r[i] - mean[i]) ** 2 for r in rows) / n for i in range(k)]
        std = [math.sqrt(v) if v > 0 else 1.0 for v in var]
    else:
        mean, std = [0.0] * k, [1.0] * k
    xs = [[(r[i] - mean[i]) / std[i] for i in range(k)] for r in rows]
    ys = [r[k] for r in rows]
    w, b = [0.0] * k, 0.0
    for _ in range(iters):
        gb = 0.0
        gw = [0.0] * k
        for x, y in zip(xs, ys):
            z = max(-40.0, min(40.0, b + sum(xi * wi for xi, wi in zip(x, w))))
            e = 1.0 / (1.0 + math.exp(-z)) - y
            gb += e
            for i in range(k):
                gw[i] += e * x[i]
        b -= lr * gb / n
        w = [wi - lr * (gw[i] / n + l2 * wi) for i, wi in enumerate(w)]
    return ([w[i] / std[i] for i in range(k)],
            b - sum(w[i] * mean[i] / std[i] for i in range(k)))


def _toy_rows(n=400):
    """Deterministic separable-ish 2-feature data: label = 1 iff
    0.4*f0 - 0.7*f1 + noiselike hash term > 0."""
    rows = []
    for i in range(n):
        f0 = (i * 37 % 100) / 10.0
        f1 = (i * 61 % 100) / 10.0
        bump = ((i * 97) % 7 - 3) * 0.1
        y = 1.0 if 0.4 * f0 - 0.7 * f1 + bump > 0 else 0.0
        rows.append((float(f0), float(f1), y))
    return rows


def test_fit_logreg_matches_python_reference(spark):
    rows = _toy_rows()
    df = spark.createDataFrame(rows, "f0 double, f1 double, y double")
    model = fit_logreg(df, ["f0", "f1"], "y", lr=0.5, iters=25)
    w_ref, b_ref = _py_fit(rows, 2, lr=0.5, iters=25)
    # distributed float sums are order-nondeterministic; parity is tight
    # but not bit-exact
    for a, b in zip(model["weights"] + [model["intercept"]],
                    w_ref + [b_ref]):
        assert abs(a - b) <= 1e-6 * max(1.0, abs(b))
    assert model["n"] == len(rows)


def test_fit_logreg_separates_and_scores(spark):
    rows = _toy_rows()
    df = spark.createDataFrame(rows, "f0 double, f1 double, y double")
    model = fit_logreg(df, ["f0", "f1"], "y", lr=1.0, iters=200)
    scored = df.withColumn("p", logreg_score(
        [F.col("f0"), F.col("f1")], model["weights"], model["intercept"]))
    acc = scored.filter(((F.col("p") >= 0.5) & (F.col("y") == 1.0)) |
                        ((F.col("p") < 0.5) & (F.col("y") == 0.0))).count() \
        / len(rows)
    assert acc >= 0.95
    # learned direction: f0 up-weights, f1 down-weights
    assert model["weights"][0] > 0 > model["weights"][1]


def test_logreg_score_matches_python_predictor(spark):
    feats = [(1.0, 2.0), (0.0, 0.0), (10.0, -3.0), (1e6, -1e6)]
    w, b = [0.3, -0.9], 0.2
    df = spark.createDataFrame([(i, a, c) for i, (a, c) in enumerate(feats)],
                               "id long, f0 double, f1 double")
    got = {r["id"]: r["p"] for r in df.select(
        "id", logreg_score([F.col("f0"), F.col("f1")], w, b).alias("p"))
        .collect()}
    ref = logreg_predict_py(feats, w, b)
    for i, p in enumerate(ref):
        assert got[i] == pytest.approx(p, abs=1e-12)
    # extreme logits saturate instead of overflowing (the +-40 clamp)
    assert got[3] in (0.0, 1.0) or 0.0 < got[3] < 1.0


def test_unigram_model_and_nll(spark):
    from geospatialtools_spark.functions.classifier import (fit_unigram,
                                                            unigram_nll)
    # corpus: 'the' x6, 'cat' x3, 'dog' x2, 'rare' x1 -> total 12
    df = spark.createDataFrame(
        [(1, "the cat the dog"), (2, "the cat the dog the cat"),
         (3, "the rare"), (4, ""), (5, None)],
        "doc_id long, text string")
    model = fit_unigram(df, vocab_size=3)
    rows = {r["w"]: r["logp"] for r in model.collect()}
    # the OOV penalty row is NULL-keyed — no real token can collide
    assert set(rows) == {"the", "cat", "dog", None}
    assert rows["the"] == pytest.approx(math.log(6 / 12), abs=1e-12)
    assert rows["cat"] == pytest.approx(math.log(3 / 12), abs=1e-12)
    # OOV penalty = log(mean tail prob) = log((1/1)/12)
    assert rows[None] == pytest.approx(math.log(1 / 12), abs=1e-12)

    out = {r["doc_id"]: r["nll"] for r in unigram_nll(df, model).collect()}
    exp1 = -(2 * math.log(6 / 12) + math.log(3 / 12) + math.log(2 / 12)) / 4
    assert out[1] == pytest.approx(exp1, rel=1e-12)
    # doc 3 hits the OOV row for 'rare'
    exp3 = -(math.log(6 / 12) + math.log(1 / 12)) / 2
    assert out[3] == pytest.approx(exp3, rel=1e-12)
    assert out[4] is None and out[5] is None
    # fluent (head-word) text scores LOWER nll than tail-word text
    assert out[1] < out[3]


def test_unigram_no_tail_falls_back_to_min_prob(spark):
    from geospatialtools_spark.functions.classifier import fit_unigram
    df = spark.createDataFrame([(1, "a a b")], "doc_id long, text string")
    model = {r["w"]: r["logp"]
             for r in fit_unigram(df, vocab_size=10).collect()}
    assert model[None] == pytest.approx(math.log(1 / 3), abs=1e-12)


def test_unigram_real_oov_token_is_normal_vocab(spark):
    # a corpus where the literal '<OOV>' string is a frequent WORD: it
    # must be a normal vocab row, distinct from the NULL-keyed penalty
    from geospatialtools_spark.functions.classifier import (fit_unigram,
                                                            unigram_nll)
    df = spark.createDataFrame(
        [(1, "<OOV> <OOV> token docs"), (2, "<OOV> weird")],
        "doc_id long, text string")
    model = fit_unigram(df, vocab_size=2)
    rows = {r["w"]: r["logp"] for r in model.collect()}
    assert rows["<OOV>"] == pytest.approx(math.log(3 / 6), abs=1e-12)
    out = {r["doc_id"]: r["nll"] for r in unigram_nll(df, model).collect()}
    # doc 1: 2x log(3/6) + 2x OOV penalty (docs/token are tail, mean tail
    # prob = 1/6); exactly one penalty row -> no crossJoin duplication
    exp1 = -(2 * math.log(3 / 6) + 2 * math.log(1 / 6)) / 4
    assert out[1] == pytest.approx(exp1, rel=1e-12)


def test_unigram_empty_corpus_raises(spark):
    from geospatialtools_spark.functions.classifier import fit_unigram
    df = spark.createDataFrame([(1, ""), (2, "   ")],
                               "doc_id long, text string")
    with pytest.raises(ValueError, match="no words"):
        fit_unigram(df)


def test_fit_logreg_drops_null_rows_and_guards_empty(spark):
    from geospatialtools_spark.functions.classifier import fit_logreg
    rows = [(float(i % 7), float(i % 5), float(i % 2)) for i in range(60)]
    df = spark.createDataFrame(rows, "f0 double, f1 double, y double")
    withnull = df.union(spark.createDataFrame(
        [(None, 1.0, 1.0), (1.0, None, 0.0), (1.0, 1.0, None)],
        "f0 double, f1 double, y double"))
    a = fit_logreg(df, ["f0", "f1"], "y", iters=5)
    b = fit_logreg(withnull, ["f0", "f1"], "y", iters=5)
    assert b["n"] == a["n"] == 60          # NULL rows never trained
    assert b["weights"] == a["weights"] and b["intercept"] == a["intercept"]
    empty = spark.createDataFrame([], "f0 double, f1 double, y double")
    with pytest.raises(ValueError, match="empty training set"):
        fit_logreg(empty, ["f0", "f1"], "y", iters=2)


def test_curation_pipeline_lm_filter(spark, tmp_path):
    """max_nll in the curation quality stage: tail-word docs (high NLL
    under the corpus-fit unigram model) drop; head-word docs survive."""
    from geospatialtools_spark.pipeline import (CurationConfig,
                                                run_curation_pipeline)
    # the one-off filler sits mid-sequence so every 3-shingle contains it:
    # head docs share WORDS (the LM head) but zero shingles, so the
    # near-dedup stage upstream keeps them all
    head = [(i, f"alpha beta filler{i} gamma delta", 30)
            for i in range(1, 41)]
    tail = [(100 + i, f"zz{i} qq{i} xx{i} vv{i} kk{i}", 30)
            for i in range(1, 11)]
    df = spark.createDataFrame(head + tail,
                               "doc_id long, text string, n_chars long")
    cfg = CurationConfig(quality_min=0.0, splits={"train": 1.0},
                         shard_budget=500, max_nll=3.5, lm_vocab_size=10)
    out = run_curation_pipeline(spark, df, cfg, str(tmp_path / "cur"))
    ids = {r["doc_id"] for r in out["quality"].select("doc_id").collect()}
    # head docs: 4 of 5 words are corpus-dominant (p=40/250 each), one
    # filler -> NLL ~ (4*ln(250/40) + ln-OOV)/5 well under the tail docs,
    # which are 100% one-off words at the OOV penalty
    assert all(i in ids for i in range(1, 41))
    assert all(100 + i not in ids for i in range(1, 11))


def test_fit_logreg_hash_sampled_training(spark):
    rows = _toy_rows(1000)
    df = spark.createDataFrame(
        [(i, *r) for i, r in enumerate(rows)],
        "id long, f0 double, f1 double, y double")
    model = fit_logreg(df, ["f0", "f1"], "y", lr=1.0, iters=100,
                       sample_fraction=0.5, sample_key="id")
    assert 300 < model["n"] < 700          # md5 bucket ~half
    again = fit_logreg(df.repartition(13), ["f0", "f1"], "y", lr=1.0,
                       iters=100, sample_fraction=0.5, sample_key="id")
    assert again["n"] == model["n"]        # deterministic cohort
    scored = df.withColumn("p", logreg_score(
        [F.col("f0"), F.col("f1")], model["weights"], model["intercept"]))
    acc = scored.filter(((F.col("p") >= 0.5) & (F.col("y") == 1.0)) |
                        ((F.col("p") < 0.5) & (F.col("y") == 0.0))).count() \
        / len(rows)
    assert acc >= 0.9                      # generalizes off-sample


# ---------------------------------------------------------------------------
# rank_buckets / perplexity_buckets (CCNet head/middle/tail)


def _py_rank_buckets(rows, nb):
    """Reference: per group, sort by (score, id); row r of n -> (r*nb)//n.
    rows = [(id, group, score)] with non-null scores."""
    from collections import defaultdict
    by_g = defaultdict(list)
    for rid, g, s in rows:
        by_g[g].append((s, rid))
    out = {}
    for g, members in by_g.items():
        members.sort()
        n = len(members)
        for r, (_, rid) in enumerate(members):
            out[rid] = (r * nb) // n
    return out


def test_rank_buckets_matches_python_reference(spark):
    from geospatialtools_spark.functions.classifier import rank_buckets
    # uneven groups incl. size 1 and 2, with exact score ties
    rows = []
    rid = 0
    for g, n in [("en", 10), ("fr", 7), ("de", 2), ("xx", 1)]:
        for i in range(n):
            score = float((i * 37) % 5)        # many ties -> id tie-break
            rows.append((rid, g, score))
            rid += 1
    df = spark.createDataFrame(rows, "id long, lang string, s double")
    out = rank_buckets(df, "lang", "s", "id", n_buckets=3,
                       labels=["head", "middle", "tail"])
    got = {r["id"]: (r["bucket"], r["bucket_label"])
           for r in out.collect()}
    ref = _py_rank_buckets(rows, 3)
    assert len(got) == len(rows)
    for rid2, b in ref.items():
        lab = ["head", "middle", "tail"][b]
        assert got[rid2] == (b, lab), rid2
    # balanced within one row per group
    from collections import Counter
    for g, n in [("en", 10), ("fr", 7)]:
        sizes = Counter(ref[rid3] for rid3, gg, _ in rows if gg == g)
        assert max(sizes.values()) - min(sizes.values()) <= 1


def test_rank_buckets_null_score_and_null_group(spark):
    from geospatialtools_spark.functions.classifier import rank_buckets
    rows = [(0, "en", 1.0), (1, "en", None), (2, None, 2.0),
            (3, None, 1.0), (4, None, 3.0)]
    df = spark.createDataFrame(rows, "id long, lang string, s double")
    out = {r["id"]: r["bucket"]
           for r in rank_buckets(df, "lang", "s", "id", 3).collect()}
    assert len(out) == 5
    assert out[1] is None                 # NULL score kept, NULL bucket
    assert out[0] == 0                    # singleton non-null group
    # NULL group is its own 3-member group: ranks 1.0 < 2.0 < 3.0
    assert (out[3], out[2], out[4]) == (0, 1, 2)


def test_rank_buckets_partition_invariance(spark):
    from geospatialtools_spark.functions.classifier import rank_buckets
    rows = [(i, "g%d" % (i % 3), float((i * 19) % 11)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, lang string, s double")
    a = {r["id"]: r["bucket"]
         for r in rank_buckets(df, "lang", "s", "id", 4).collect()}
    b = {r["id"]: r["bucket"]
         for r in rank_buckets(df.repartition(13), "lang", "s", "id",
                               4).collect()}
    assert a == b
    ref = _py_rank_buckets(rows, 4)
    assert a == ref


def test_rank_buckets_rejects_bad_args(spark):
    from geospatialtools_spark.functions.classifier import rank_buckets
    df = spark.createDataFrame([(0, "en", 1.0)],
                               "id long, lang string, s double")
    with pytest.raises(ValueError):
        rank_buckets(df, "lang", "s", "id", n_buckets=0)
    with pytest.raises(ValueError):
        rank_buckets(df, "lang", "s", "id", n_buckets=3, labels=["a"])


def test_perplexity_buckets_garbage_lands_in_tail(spark):
    from geospatialtools_spark.functions.classifier import (
        fit_unigram, perplexity_buckets)
    fluent = "the cat sat on the mat and the dog ran"
    rows = []
    for i in range(12):                    # 12 fluent en + 6 garbage en
        rows.append((i, "en", fluent))
    for i in range(6):
        rows.append((100 + i, "en", "zzq%dq wxk%dj vvb%dp" % (i, i, i)))
    for i in range(9):                     # second language, all fluent
        rows.append((200 + i, "fr", "le chat le chien le chat"))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    model = fit_unigram(df, vocab_size=15)
    out = perplexity_buckets(df, model)
    got = {r["doc_id"]: (r["bucket_label"], r["nll"]) for r in out.collect()}
    assert len(got) == len(rows)
    # every garbage doc scores a strictly higher NLL than every fluent
    # en doc, so all 6 land in the 6-slot tail of the 18-doc en group
    assert all(got[100 + i][0] == "tail" for i in range(6))
    assert all(got[i][0] in ("head", "middle") for i in range(12))
    # fr is its own 9-doc group of identical docs: ids split 3/3/3
    from collections import Counter
    fr = Counter(got[200 + i][0] for i in range(9))
    assert fr == {"head": 3, "middle": 3, "tail": 3}
