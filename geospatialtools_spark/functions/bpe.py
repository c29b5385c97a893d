"""Distributed BPE tokenizer induction — learn a byte-pair-encoding merge
table from a corpus and encode documents with it.

The operator a training-data pipeline runs right before tokenizer-bound
work (token budgeting, packing, vocabulary design): given 100 TB of text,
learn the top-N character-pair merges and the subword vocabulary they
induce (Sennrich, Haddow & Birch 2016, "Neural Machine Translation of
Rare Words with Subword Units" — the counted-words formulation).

Scale shape — the classic fast-BPE factorization:

- The CORPUS is touched exactly twice, both linearly: one map-side-
  combined ``word -> count`` aggregation to build the word-count table
  (bounded: natural-language vocabulary, optionally capped to the top
  ``vocab_cap`` words, which is what every production BPE trainer does),
  and one Arrow-batched encode pass at the end.
- Every TRAINING iteration runs over the word-count table only
  (<= vocab_cap rows): one weighted pair-count aggregation + a driver-side
  argmax of ONE row (the same bounded-table driver-loop shape as
  ``clustering.reduce_basin_number``), then one Arrow pass re-segmenting
  the <= vocab_cap symbol arrays. n_merges x O(vocab) — never
  n_merges x O(corpus).

Determinism: ties in pair counts break on the pair's lexicographic order
(count DESC, a ASC, b ASC), so the merge sequence is a pure function of
the word counts; pytest locks it against an independent pure-python
reference implementation (tests/test_bpe.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as TY

from .textstats import words_array


def word_counts(docs: DataFrame, text_col: str = "text",
                vocab_cap: int | None = None) -> DataFrame:
    """``(word, n)`` whitespace-token counts — ONE map-side-combined
    aggregation over the corpus; optionally capped to the ``vocab_cap``
    most frequent words (ties to the lexicographically smaller word),
    which bounds every later training iteration."""
    wc = (docs.select(F.explode(words_array(F.col(text_col))).alias("word"))
          .groupBy("word").agg(F.count("*").alias("n")))
    if vocab_cap is not None:
        wc = wc.orderBy(F.desc("n"), "word").limit(vocab_cap)
    return wc


def _chars(word: Column) -> Column:
    """Character array of a word (array<string> of 1-char strings)."""
    return F.transform(F.sequence(F.lit(1), F.length(word)),
                       lambda i: word.substr(i, F.lit(1)))


def pair_counts(vocab: DataFrame, syms_col: str = "syms",
                n_col: str = "n") -> DataFrame:
    """Weighted adjacent-symbol pair counts ``(a, b, cnt)`` over a vocab
    table carrying a symbol-array column — zip_with over shifted slices
    (one fused pass, the same shape as textstats' n-gram builder), then
    one aggregation over <= vocab rows."""
    syms = F.col(syms_col)
    sz = F.size(syms)
    pairs = F.zip_with(
        F.slice(syms, 1, F.greatest(sz - 1, F.lit(0))),
        F.slice(syms, 2, F.greatest(sz - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")))
    return (vocab.select(F.explode(pairs).alias("p"), F.col(n_col))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum(n_col).alias("cnt")))


def _merge_syms_udf(a: str, b: str):
    """Arrow UDF replacing every non-overlapping adjacent (a, b) with the
    fused symbol a+b, scanning left to right (the BPE merge step)."""
    ab = a + b

    @F.pandas_udf(TY.ArrayType(TY.StringType()))
    def merge(syms):
        import pandas as pd
        out = []
        for s in syms:
            s = list(s)
            res, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    res.append(ab)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            out.append(res)
        return pd.Series(out)

    return merge


def bpe_train(docs: DataFrame, n_merges: int, text_col: str = "text",
              vocab_cap: int | None = 50_000,
              min_pair_count: int = 2) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the ordered
    merge table ``[(a, b, count), ...]`` (may be shorter than n_merges if
    pair counts fall below ``min_pair_count``).

    The driver loop runs over the BOUNDED word-count table (see module
    docstring); each iteration localCheckpoints the re-segmented vocab so
    lineage stays O(1) across iterations instead of stacking n_merges
    Arrow stages into one plan.
    """
    vocab = (word_counts(docs, text_col, vocab_cap)
             .withColumn("syms", _chars(F.col("word")))
             .select("syms", "n")
             .localCheckpoint(eager=True))
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = (pair_counts(vocab)
                .orderBy(F.desc("cnt"), "a", "b").limit(1).collect())
        if not best or best[0]["cnt"] < min_pair_count:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        merges.append((a, b, cnt))
        vocab = (vocab.withColumn("syms", _merge_syms_udf(a, b)(F.col("syms")))
                 .localCheckpoint(eager=True))
    return merges


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str, int]],
               text_col: str = "text", id_col: str = "doc_id",
               out_col: str = "tokens") -> DataFrame:
    """Encode every document with a learned merge table: per word, start
    from characters and apply the lowest-rank applicable merge until none
    applies (the standard rank-priority BPE encode — equivalent to
    replaying the merges in order). One Arrow-batched pass over the
    corpus; the merge table ships as a broadcast-sized closure constant.

    Returns ``(id_col, tokens array<string>, n_tokens)``; empty/NULL text
    encodes to an empty token array.
    """
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}

    @F.pandas_udf(TY.ArrayType(TY.StringType()))
    def encode(text):
        import re

        import pandas as pd

        # Java's \s set written out (NOT python str.split(): that also
        # splits on Unicode whitespace like NBSP, which words_array keeps
        # inside tokens) — same fix as the token/quality oracles
        ws = re.compile(r"[ \t\n\x0b\f\r]+")

        cache: dict[str, list[str]] = {}

        def enc_word(w: str) -> list[str]:
            got = cache.get(w)
            if got is not None:
                return got
            s = list(w)
            while len(s) > 1:
                best_rank, best_i = None, -1
                for i in range(len(s) - 1):
                    r = ranks.get((s[i], s[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best_i = r, i
                if best_rank is None:
                    break
                s[best_i:best_i + 2] = [s[best_i] + s[best_i + 1]]
            cache[w] = s
            return s

        out = []
        for t in text:
            toks: list[str] = []
            for w in ws.split(t or ""):
                if w:
                    toks.extend(enc_word(w))
            out.append(toks)
        return pd.Series(out)

    return docs.select(
        F.col(id_col),
        encode(F.col(text_col)).alias(out_col),
    ).withColumn("n_tokens", F.size(F.col(out_col)))
