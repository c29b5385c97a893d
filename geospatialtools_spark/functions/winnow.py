"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003,
the MOSS algorithm) — position-robust sub-document fingerprinting.

The dedup hierarchy so far keys on whole docs (``fingerprint``), spans,
lines and fixed token windows (``passage_dedup``). Winnowing is the
classic LOCAL fingerprint selector between those: hash every character
k-gram of the normalized text, slide a window of ``w`` consecutive
hashes, and keep the window minimum (rightmost on ties). Its guarantee
(the winnowing theorem, paper §3): any shared substring of length
>= k + w - 1 between two documents yields at least one shared selected
fingerprint — so ``winnow_pairs`` has EXACT recall for long-enough
clones, at ~2/(w+1) of the k-gram density.

Two implementations with the module's usual twin discipline:

- ``winnow_fingerprints`` — pure Catalyst HOF chain (transform over the
  gram positions -> md5-derived 60-bit hashes -> per-window slice /
  array_min / reversed array_position for the rightmost-min -> explode
  distinct). Every step has an exact DuckDB spelling (``sql_winnow``
  emits it from the same constants), so the gate value-checks the
  selected (pos, fp) set bit-for-bit. Interpreted HOFs — the honest
  oracle-parity form, not the hot path.
- ``winnow_fast`` — Arrow ``mapInPandas`` twin: one numpy/hashlib pass
  per batch producing the identical rows (bit-parity asserted in
  tests). The volume path.

Hash: ``int(md5(gram)[:15], 16)`` — the repo's standard cross-engine
60-bit construction (same as sampling.hash_bucket / warc_to_docs
doc ids). Positions are 1-based gram indices into the NORMALIZED text.

Scale shape: both paths are per-row map work (zero shuffle);
``winnow_pairs`` shuffles once on the fingerprint value with the same
``max_df`` boilerplate cap + disclosed-contract guard as
``dedup.ngram_jaccard_pairs`` — a fingerprint shared by the whole
corpus (a license header k-gram) must not build a B^2 join.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import normalize_text

DEFAULT_K = 8      # k-gram length (chars of normalized text)
DEFAULT_W = 4      # window: guarantee threshold t = k + w - 1 = 11


def _gram_hash(s: Column, i: Column, k: int) -> Column:
    """60-bit cross-engine hash of the k-gram at 1-based position i."""
    return F.conv(F.substring(F.md5(F.substring(s, i, k)), 1, 15),
                  16, 10).cast("long")


def _select_structs(hashes: Column, w: int) -> Column:
    """array<struct<pos,fp>> of selected fingerprints over a BOUND hash
    array column (may contain duplicates across windows — callers
    dedup). Fewer than w hashes -> one short window over all of them
    (short docs still fingerprint; the guarantee only speaks for length
    >= k + w - 1 anyway).

    ``hashes`` MUST be a plain column reference, not the hashing
    expression itself: interpreted HOF lambdas re-evaluate captured
    subtrees per element, so an inlined O(ng)-md5 subtree inside an
    O(ng) transform is the quadratic element_at trap from the textstats
    module header (measured: the inlined form timed out at 550 s on 500
    x 300-char docs where the bound form runs in ~2 s). Slices of a
    bound array are O(w) copies — cheap."""
    nw = F.greatest(F.size(hashes) - (w - 1), F.lit(1))

    def pick(st: Column) -> Column:
        vals = F.slice(hashes, st, w)
        m = F.array_min(vals)
        # rightmost occurrence of the min: first position in the
        # reversed window (ties broken toward later grams, paper §4 —
        # makes adjacent windows reuse selections)
        rpos = F.array_position(F.reverse(vals), m)
        return F.struct((st + F.size(vals) - rpos).cast("long")
                        .alias("pos"), m.alias("fp"))

    return F.transform(F.sequence(F.lit(1), nw), pick)


def winnow_fingerprints(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", k: int = DEFAULT_K,
                        w: int = DEFAULT_W) -> DataFrame:
    """(id, pos, fp) — the distinct selected fingerprints per document.
    NULL/short texts contribute no rows. Zero shuffle up to the final
    per-row distinct (local array_distinct, not an exchange).

    Three chained Projects on purpose: normalize, hash, select. The
    hash array is referenced many times by the selection lambdas, and
    Spark's CollapseProject keeps a multiply-referenced non-cheap alias
    in its own Project — so the ng md5s evaluate ONCE per row instead
    of once per window (see _select_structs)."""
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got k={k} w={w}")
    s = df.select(F.col(id_col), normalize_text(F.col(text_col))
                  .alias("_s"))
    s = s.filter(F.length("_s") >= k)
    h = s.select(
        id_col,
        F.transform(F.sequence(F.lit(1), F.length("_s") - (k - 1)),
                    lambda i: _gram_hash(F.col("_s"), i, k)).alias("_h"))
    sel = F.array_distinct(_select_structs(F.col("_h"), w))
    return (h.select(F.col(id_col), F.explode(sel).alias("s"))
            .select(id_col, F.col("s.pos").alias("pos"),
                    F.col("s.fp").alias("fp")))


def winnow_fast(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text", k: int = DEFAULT_K,
                w: int = DEFAULT_W) -> DataFrame:
    """Arrow twin of ``winnow_fingerprints`` — identical rows, one
    hashlib/python pass per batch instead of interpreted HOFs."""
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got k={k} w={w}")
    import hashlib
    import re

    import pandas as pd

    tok = re.compile("[a-z0-9]+")
    id_dtype = dict(df.dtypes)[id_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, poss, fps = [], [], []
            for rid, t in zip(b[id_col], b[text_col]):
                if t is None or (isinstance(t, float) and pd.isna(t)):
                    continue
                s = " ".join(tok.findall(str(t).lower()))
                ng = len(s) - (k - 1)
                if ng < 1:
                    continue
                hs = [int(hashlib.md5(s[i:i + k].encode())
                          .hexdigest()[:15], 16)
                      for i in range(ng)]
                seen = set()
                nw = max(ng - (w - 1), 1)
                for st in range(nw):
                    vals = hs[st:st + w]
                    m = min(vals)
                    # rightmost min
                    ri = len(vals) - 1 - vals[::-1].index(m)
                    key = (st + ri + 1, m)
                    if key not in seen:
                        seen.add(key)
                        ids.append(rid)
                        poss.append(key[0])
                        fps.append(key[1])
            yield pd.DataFrame({id_col: pd.Series(ids, dtype="object"),
                                "pos": pd.Series(poss, dtype="int64"),
                                "fp": pd.Series(fps, dtype="int64")})

    schema = f"{id_col} {id_dtype}, pos long, fp long"
    return df.select(id_col, text_col).mapInPandas(run, schema)


def winnow_pairs(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", k: int = DEFAULT_K,
                 w: int = DEFAULT_W, max_df: int = 1000,
                 use_arrow: bool = True) -> DataFrame:
    """Unordered doc pairs sharing at least one selected fingerprint —
    exact recall for clones of length >= k + w - 1 (winnowing theorem),
    false positives only via 60-bit hash collisions.

    ``max_df`` drops fingerprints held by more than that many docs
    before the self-join (the ngram_jaccard max_df contract: a
    corpus-wide boilerplate k-gram must not build a quadratic join;
    pairs joined ONLY by dropped fingerprints are lost — disclosed, and
    the cap is a dial). One shuffle on fp; pair emission is per-bucket."""
    fps = (winnow_fast(df, id_col, text_col, k, w) if use_arrow
           else winnow_fingerprints(df, id_col, text_col, k, w))
    # materialized once: posts feeds the df-cap aggregate AND both sides
    # of the self-join — without the checkpoint each subtree re-runs the
    # full fingerprint pass over the corpus (the dedup._minhash_banded
    # rule; measured 2.2x at 60k docs)
    posts = (fps.select(F.col(id_col).alias("id"), "fp").distinct()
             .localCheckpoint(eager=True))
    keep = (posts.groupBy("fp").agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_df).select("fp"))
    p = posts.join(keep, "fp")
    a = p.alias("a")
    b = p.alias("b")
    return (a.join(b, (F.col("a.fp") == F.col("b.fp"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"))
            .distinct())


# --- DuckDB twin ------------------------------------------------------------

def sql_winnow(id_expr: str, text_expr: str, k: int = DEFAULT_K,
               w: int = DEFAULT_W, table: str = "documents") -> str:
    """SELECT id, pos, fp — the identical selection rule as DuckDB SQL
    (normalize via the replace-chain twin, the same 60-bit md5 hash,
    list ops mirroring the Catalyst HOFs)."""
    norm = (f"trim(regexp_replace(regexp_replace(lower({text_expr}), "
            f"'[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g'))")
    h = (f"CAST(('0x' || substr(md5(substr(s, CAST(i AS INT), {k})), "
         f"1, 15)) AS BIGINT)")
    return f"""
        WITH nz AS (
          SELECT {id_expr} AS id, {norm} AS s FROM {table}
          WHERE {text_expr} IS NOT NULL),
        hs AS (
          SELECT id, list_transform(range(1, length(s) - {k - 1} + 1),
                                    i -> {h}) AS hashes
          FROM nz WHERE length(s) >= {k}),
        sel AS (
          SELECT id, list_transform(
                   range(1, greatest(len(hashes) - {w - 1}, 1) + 1),
                   st -> struct_pack(
                     pos := st + len(hashes[st:st+{w - 1}])
                            - list_position(list_reverse(
                                hashes[st:st+{w - 1}]),
                                list_aggregate(hashes[st:st+{w - 1}],
                                               'min')),
                     fp := list_aggregate(hashes[st:st+{w - 1}],
                                          'min'))) AS picks
          FROM hs)
        -- row-level DISTINCT (duckdb's list_distinct lacks struct lists)
        SELECT DISTINCT id, CAST(u.pos AS BIGINT) AS pos, u.fp AS fp
        FROM (SELECT id, unnest(picks) AS u FROM sel)"""
