"""Model-based quality scoring: logistic regression trained with
distributed full-batch gradient descent (scored as a pure Catalyst
expression) and a CCNet-style unigram LM perplexity filter
(fit_unigram / unigram_nll).

Modern curation pipelines (FineWeb-Edu, DCLM) gate documents with a small
learned quality classifier rather than hand rules alone. This module is
that stage re-expressed Spark-first:

- **Features** are the engine's existing Catalyst text signals
  (textstats ratios / counts) — computed JVM-side, whole-stage codegen.
- **Training** (``fit_logreg``) is full-batch gradient descent where each
  iteration is ONE aggregation: the per-row gradient contributions
  ``(sigmoid(x·w) - y) * x_j`` are summed per feature with map-side
  partial aggregation, so an iteration's shuffle is d+1 doubles per map
  task regardless of corpus size. The weight vector (d+1 floats) lives on
  the driver — the only driver-side state, by design. At 100 TB you train
  on a deterministic hash sample (``sample_fraction``) and score the full
  corpus; scoring is embarrassingly parallel.
- **Scoring** (``logreg_score``) takes the weights as plan literals, so
  the deployed model is one codegen'd expression: no UDF, no model
  object, fully pushdown-compatible and DuckDB-oracle-able.

No sklearn/scipy in this container (and none needed): the optimizer is
~20 lines of explicit math, seeded deterministically.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sigmoid(z: Column) -> Column:
    """Numerically-safe logistic function as a Catalyst expression.
    exp() overflows double at z < -745; clamping the argument at +-40
    (where sigmoid saturates past 1e-17) keeps the plan ANSI-safe and
    matches the DuckDB oracle's formula exactly."""
    zc = F.greatest(F.lit(-40.0), F.least(F.lit(40.0), z))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-zc))


def logit(features: list[Column], weights: list[float],
          intercept: float) -> Column:
    if len(features) != len(weights):
        raise ValueError(f"{len(features)} features vs {len(weights)} weights")
    z = F.lit(float(intercept))
    for c, w in zip(features, weights):
        z = z + c.cast("double") * F.lit(float(w))
    return z


def logreg_score(features: list[Column], weights: list[float],
                 intercept: float) -> Column:
    """P(label=1 | features) with the trained weights inlined as literals —
    the deployable scoring expression."""
    return sigmoid(logit(features, weights, intercept))


def fit_logreg(df: DataFrame, feature_cols: list[str], label_col: str,
               lr: float = 0.5, iters: int = 30, l2: float = 0.0,
               sample_fraction: float | None = None,
               sample_key: str | None = None,
               standardize: bool = True) -> dict:
    """Train logistic regression by full-batch gradient descent; returns
    ``{"weights": [...], "intercept": b, "mean": [...], "std": [...],
    "n": rows}`` with weights in ORIGINAL feature units (the internal
    standardization is folded back out), ready for ``logreg_score``.
    Rows with a NULL label or any NULL feature are dropped before
    training; ``n`` counts the rows that actually trained.

    Each iteration is one aggregation job: sum over rows of
    ``(sigmoid(x·w) - y)`` and ``(sigmoid(x·w) - y) * x_j`` — algebraic
    sums, map-side combined, d+2 doubles of shuffle per map task. The
    driver update is O(d). ``standardize`` (one extra leading aggregate
    for mean/std) keeps a single learning rate workable across
    differently-scaled text features.

    For a 100 TB corpus pass ``sample_fraction`` (with ``sample_key``) to
    train on a deterministic md5-bucket sample — the same stability
    contract as functions/sampling.py — and score the full corpus with the
    returned weights.
    """
    src = df
    if sample_fraction is not None:
        from .sampling import BUCKETS, hash_bucket
        if sample_key is None:
            raise ValueError("sample_fraction needs sample_key")
        src = df.filter(hash_bucket(F.col(sample_key))
                        < int(round(sample_fraction * BUCKETS)))
    # rows with any NULL feature or label are dropped up front: they would
    # inflate count('*') while contributing nothing to the gradient sums
    # (silently scaling down the effective learning rate) and skew the
    # per-column standardization stats
    d = src.select(*(F.col(c).cast("double").alias(c) for c in feature_cols),
                   F.col(label_col).cast("double").alias("_y")).na.drop()
    d = d.localCheckpoint(eager=True)   # 2 + iters passes read this once

    k = len(feature_cols)
    if standardize:
        stats = d.agg(
            F.count("*").alias("_n"),
            *[F.avg(c).alias(f"_m{i}") for i, c in enumerate(feature_cols)],
            *[F.stddev_pop(c).alias(f"_s{i}")
              for i, c in enumerate(feature_cols)]).head()
        n = stats["_n"]
        if not n:
            raise ValueError("empty training set (after NULL drop/sampling)")
        mean = [float(stats[f"_m{i}"]) for i in range(k)]
        std = [float(stats[f"_s{i}"]) or 1.0 for i in range(k)]
        std = [s if s > 0 else 1.0 for s in std]
    else:
        n = d.count()
        if not n:
            raise ValueError("empty training set (after NULL drop/sampling)")
        mean, std = [0.0] * k, [1.0] * k

    xs = [(F.col(c) - F.lit(mean[i])) / F.lit(std[i])
          for i, c in enumerate(feature_cols)]
    w = [0.0] * k
    b = 0.0
    for _ in range(iters):
        z = logit(xs, w, b)
        err = sigmoid(z) - F.col("_y")
        g = d.agg(F.sum(err).alias("_g_b"),
                  *[F.sum(err * xs[i]).alias(f"_g{i}")
                    for i in range(k)]).head()
        b -= lr * (float(g["_g_b"]) / n)
        w = [wi - lr * (float(g[f"_g{i}"]) / n + l2 * wi)
             for i, wi in enumerate(w)]

    # fold the standardization back into original-unit weights so scoring
    # needs no mean/std columns: w'_j = w_j/std_j, b' = b - sum w_j*m_j/s_j
    w_raw = [w[i] / std[i] for i in range(k)]
    b_raw = b - sum(w[i] * mean[i] / std[i] for i in range(k))
    return {"weights": w_raw, "intercept": b_raw,
            "mean": mean, "std": std, "n": int(n)}


def fit_unigram(df: DataFrame, text_col: str = "text",
                vocab_size: int = 50_000) -> DataFrame:
    """Unigram language model over whitespace words: the ``vocab_size``
    most frequent words with their log-probabilities (natural log of
    count / total-count over the WHOLE corpus, including the tail mass —
    so probabilities are honest, not renormalized over the kept vocab).
    Returns (word, logp) plus one row with ``w = NULL`` carrying the log
    of the mean tail-word probability (the CCNet-style unknown-word
    penalty). NULL is the sentinel precisely because no real token can
    collide with it — a corpus where the literal string '<OOV>' is a
    frequent word (tokenizer docs, ML papers) must stay a normal vocab
    row. When nothing falls outside the vocab the penalty row gets the
    log of the corpus-minimum word probability instead, so scoring never
    sees NULL log-probabilities.

    One explode + one map-side-combined count aggregation + a top-k on
    counts (TakeOrdered shape via orderBy/limit). The model is
    O(vocab_size) rows — broadcastable by construction. Raises on a
    corpus with zero words.
    """
    from .textstats import words_array
    words = df.select(F.explode(words_array(F.col(text_col))).alias("w"))
    counts = words.groupBy("w").agg(F.count("*").alias("n"))
    counts = counts.localCheckpoint(eager=True)     # reused 3x below
    total = counts.agg(F.sum("n")).head()[0]
    if not total:
        raise ValueError("fit_unigram: corpus contains no words")
    top = counts.orderBy(F.desc("n"), "w").limit(vocab_size)
    tail = counts.join(top.select("w"), "w", "left_anti") \
                 .agg(F.sum("n").alias("tn"), F.count("*").alias("tc")).head()
    if tail["tc"] and tail["tc"] > 0:
        oov_logp = math.log((tail["tn"] / tail["tc"]) / total)
    else:
        mn = counts.agg(F.min("n")).head()[0]
        oov_logp = math.log(mn / total)
    model = top.select("w", F.log(F.col("n") / F.lit(float(total)))
                       .alias("logp"))
    oov = model.sparkSession.createDataFrame(
        [(None, float(oov_logp))], "w string, logp double")
    return model.unionByName(oov)


def unigram_nll(docs: DataFrame, model: DataFrame, id_col: str = "doc_id",
                text_col: str = "text",
                out_col: str = "nll") -> DataFrame:
    """Per-document average negative log-likelihood under the unigram
    model — the CCNet-style perplexity proxy (Wenzek et al. 2020): low =
    head-like fluent text, high = tail/garbage. Empty docs score NULL.

    Shape: explode words -> broadcast-join the O(vocab) model (words
    missing from the vocab take the NULL-keyed penalty row) -> one
    groupBy(id) average. The only shuffle is the final per-doc
    aggregation, keyed on the doc id."""
    from .textstats import words_array
    ex = docs.select(F.col(id_col).alias("_id"),
                     F.explode(words_array(F.col(text_col))).alias("w"))
    oov = F.broadcast(model.filter(F.col("w").isNull())
                      .select(F.col("logp").alias("_oov")))
    scored = (ex.join(F.broadcast(model.filter(F.col("w").isNotNull())),
                      "w", "left")
              .crossJoin(oov)
              .select("_id", F.coalesce(F.col("logp"), F.col("_oov"))
                      .alias("_lp")))
    per_doc = scored.groupBy("_id").agg((-F.avg("_lp")).alias(out_col))
    return docs.join(per_doc.withColumnRenamed("_id", id_col),
                     id_col, "left")


def rank_buckets(df: DataFrame, group_col: str, score_col: str,
                 id_col: str, n_buckets: int = 3,
                 labels: list[str] | None = None,
                 out_col: str = "bucket",
                 label_col: str = "bucket_label") -> DataFrame:
    """Per-group equal-count quantile buckets by ascending score — the
    CCNet head/middle/tail split (Wenzek et al. 2020 partition each
    language's corpus into perplexity thirds; geospatialtools' analog is
    the percentile binning terrain_tools.py uses on covariates). Within
    each ``group_col`` value, rows are ranked by ``(score_col, id_col)``
    ascending and row r of n lands in bucket ``(r * n_buckets) // n``
    (0-based, so buckets differ in size by at most one row and the
    mapping is pure integer arithmetic — bit-reproducible in any
    engine). Rows with a NULL score keep their columns and get a NULL
    bucket; a NULL group ranks as its own group.

    Scale shape: the per-group rank is NOT a
    ``Window.partitionBy(group)`` (one task per language — the dominant
    language of a web corpus is most of it) but the two-level global
    rank of ``operators/seq.py`` over the combined key
    ``(group, score, id)`` — a range shuffle all executors share — minus
    the group's first global rank, which comes from one algebraic
    min/count aggregation (O(#groups) rows, broadcast back). No task
    ever holds more than ~1/shuffle-partitions of any group.

    Ties: callers ranking a float computed independently by an oracle
    engine should pass a pre-rounded score so the order (not just the
    value) is cross-engine stable; ``id_col`` breaks exact ties
    deterministically.
    """
    from ..operators.seq import seq_ids
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if labels is not None and len(labels) != n_buckets:
        raise ValueError(f"{len(labels)} labels for {n_buckets} buckets")
    scored = df.filter(F.col(score_col).isNotNull())
    ranked = seq_ids(scored, [group_col, score_col, id_col], "_grank")
    per_g = (ranked.groupBy(F.col(group_col).alias("_gkey"))
             .agg(F.min("_grank").alias("_g0"),
                  F.count(F.lit(1)).alias("_gn")))
    # eqNullSafe: a NULL group is a real group (groupBy keeps it) and
    # must match its own aggregate row, which a plain equi-join drops
    ranked = ranked.join(F.broadcast(per_g),
                         F.col(group_col).eqNullSafe(F.col("_gkey")),
                         "left").drop("_gkey")
    # `div` = exact long integer division (double `/` could round an
    # exact bucket boundary like 3.0 down to 2.9999... before floor)
    out = ranked.withColumn(
        out_col,
        F.expr(f"((_grank - _g0) * {int(n_buckets)}L) div _gn")
         .cast("long")).drop("_grank", "_g0", "_gn")
    nulls = df.filter(F.col(score_col).isNull()) \
              .withColumn(out_col, F.lit(None).cast("long"))
    out = out.unionByName(nulls)
    if labels is not None:
        lab = F.element_at(F.array(*[F.lit(s) for s in labels]),
                           (F.col(out_col) + 1).cast("int"))
        out = out.withColumn(label_col, lab)
    return out


def perplexity_buckets(docs: DataFrame, model: DataFrame,
                       lang_col: str = "lang", id_col: str = "doc_id",
                       text_col: str = "text",
                       n_buckets: int = 3) -> DataFrame:
    """The assembled CCNet bucketing stage: score every document's
    unigram NLL (``unigram_nll``) then split each language into
    equal-count head/middle/tail by ascending NLL (``rank_buckets`` —
    head = most fluent). NLL is rounded to 6 decimals BEFORE ranking so
    the bucket boundary is a function of the cross-engine-stable rounded
    value, not of 1-ulp float noise. Empty docs (NULL NLL) get a NULL
    bucket."""
    labels = ["head", "middle", "tail"] if n_buckets == 3 else None
    scored = unigram_nll(docs, model, id_col=id_col, text_col=text_col)
    scored = scored.withColumn("nll", F.round(F.col("nll"), 6))
    return rank_buckets(scored, lang_col, "nll", id_col,
                        n_buckets=n_buckets, labels=labels)


def logreg_predict_py(x_rows, weights, intercept):
    """Tiny numpy-free reference predictor for tests."""
    out = []
    for row in x_rows:
        z = intercept + sum(float(v) * wj for v, wj in zip(row, weights))
        z = max(-40.0, min(40.0, z))
        out.append(1.0 / (1.0 + math.exp(-z)))
    return out
