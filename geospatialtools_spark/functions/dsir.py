"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
public): select raw-corpus documents whose hashed n-gram distribution
looks like a TARGET corpus (Wikipedia+books in the paper; any curated
seed set here).

The method, unchanged from the paper:

1. featurize every document as a bag of hashed unigrams+bigrams over
   ``n_buckets`` buckets;
2. fit two bucket histograms — target corpus and raw corpus — as
   Laplace-smoothed categorical distributions p and q;
3. score each raw document with the importance log-weight
   ``log w(x) = sum over the doc's gram occurrences of
   (ln p[bucket] - ln q[bucket])``;
4. resample without replacement via the Gumbel top-k trick:
   keep the k largest ``log w(x) + Gumbel(u_x)``.

Engine mapping (the 100 TB design):

- featurization is a pure Catalyst expression (canonical
  ``textstats.text_tokens`` -> ``word_ngrams`` bigrams -> md5 bucket) —
  zero shuffle, and the md5 bucket is the ``sampling.hash_bucket``
  discipline: Spark, DuckDB and Python compute the identical bucket, so
  the gate oracle replays featurization exactly.
- each histogram is ONE map-side-combined count aggregate over the
  exploded grams (bucket skew collapses before the shuffle); the model
  is an ``n_buckets``-row table, broadcast everywhere it is used.
- scoring is one broadcast join + one per-document sum — the corpus
  shuffles once, keyed by the doc id.
- resampling reuses the ``sampling.hash_uniform`` md5 uniform, so the
  selected cohort is a pure function of (target, raw) content — stable
  across retries, partitionings and engines. The Gumbel key compiles to
  TakeOrderedAndProject (local k-heaps, no global sort), exactly like
  ``sampling.weighted_sample``.

Float contract: the smoothed probabilities are built from exact integer
counts with the same literal op order in both engines; ``ln`` is libm on
both sides and per-document sums are order-nondeterministic double
reductions — both absorbed by the gate's round(6), the established
cross-engine reduction discipline (PLANS.md).

Reference scope: the reference engine has no text surface; this module is
part of the mandated training-data pipeline layer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import text_tokens, word_ngrams

DEFAULT_BUCKETS = 10_000


def gram_buckets(text: Column, n_buckets: int = DEFAULT_BUCKETS) -> Column:
    """Hashed unigram+bigram bucket ids of a text column as
    ``array<long>`` (one element PER OCCURRENCE — DSIR counts occurrences,
    not distinct grams). Bucket = first 32 bits of md5(gram) mod
    ``n_buckets``; NULL text -> empty array."""
    toks = text_tokens(text)
    grams = F.concat(toks, word_ngrams(toks, 2))
    buckets = F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10)
                   .cast("long") % n_buckets)
    # transform propagates NULL text as a NULL array; the documented
    # contract (and what explode-based consumers need) is "no grams"
    return F.coalesce(buckets, F.array().cast("array<long>"))


def fit_dsir(target: DataFrame, raw: DataFrame, text_col: str = "text",
             n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """Fit the DSIR importance model: one dense ``(bucket, log_ratio)``
    row per bucket in ``[0, n_buckets)``, where
    ``log_ratio = ln(p_target[b]) - ln(p_raw[b])`` with Laplace smoothing
    ``p[b] = (count[b] + 1) / (total + n_buckets)`` (zero-count buckets
    get the floor probability, so the model never emits -inf). Two
    map-side-combined count aggregates — each corpus is touched once; the
    totals are collected as exact integers and folded in as literals so
    both engines evaluate the identical float expression."""
    spark = target.sparkSession

    def counts(df: DataFrame, name: str) -> DataFrame:
        return (df.select(F.explode(gram_buckets(F.col(text_col),
                                                 n_buckets))
                          .alias("bucket"))
                .groupBy("bucket")
                .agg(F.count("*").alias(name)))

    ct = counts(target, "_ct").localCheckpoint(eager=True)
    cr = counts(raw, "_cr").localCheckpoint(eager=True)
    t_tot = ct.agg(F.sum("_ct")).head()[0] or 0
    r_tot = cr.agg(F.sum("_cr")).head()[0] or 0
    dense = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    return (dense.join(ct, "bucket", "left").join(cr, "bucket", "left")
            .select("bucket",
                    (F.log((F.coalesce(F.col("_ct"), F.lit(0)) + 1)
                           .cast("double")
                           / F.lit(float(t_tot + n_buckets)))
                     - F.log((F.coalesce(F.col("_cr"), F.lit(0)) + 1)
                             .cast("double")
                             / F.lit(float(r_tot + n_buckets))))
                    .alias("log_ratio")))


def dsir_log_weights(docs: DataFrame, model: DataFrame,
                     id_col: str = "doc_id", text_col: str = "text",
                     n_buckets: int = DEFAULT_BUCKETS,
                     out_col: str = "log_w") -> DataFrame:
    """Per-document importance log-weight: sum of the model's log-ratio
    over the doc's gram occurrences. One broadcast join (the model is
    ``n_buckets`` rows) + one sum keyed by the doc id; documents with no
    grams (empty/NULL text) score 0.0. Output: every input row plus
    ``out_col``."""
    ex = docs.select(F.col(id_col).alias("_id"),
                     F.explode(gram_buckets(F.col(text_col), n_buckets))
                      .alias("bucket"))
    lw = (ex.join(F.broadcast(model), "bucket")
          .groupBy("_id")
          .agg(F.sum("log_ratio").alias(out_col)))
    return (docs.join(lw, docs[id_col] == lw["_id"], "left")
            .drop("_id")
            .withColumn(out_col, F.coalesce(F.col(out_col), F.lit(0.0))))


def dsir_sample(docs: DataFrame, k: int, id_col: str = "doc_id",
                log_w_col: str = "log_w",
                out_col: str = "gumbel_key") -> DataFrame:
    """Gumbel top-k importance resample WITHOUT replacement: keep the k
    largest ``log_w + Gumbel(u)`` with ``u`` md5-derived from the row key
    (Vieira 2014 / the DSIR paper's resampling step; equivalent to A-ES
    in log space). Deterministic like every sampler in this repo;
    compiles to TakeOrderedAndProject — no global sort."""
    from .sampling import hash_uniform
    gumbel = -F.log(-F.log(hash_uniform(F.col(id_col))))
    return (docs.withColumn(out_col, F.col(log_w_col) + gumbel)
            .orderBy(F.desc(out_col), F.col(id_col))
            .limit(k))
