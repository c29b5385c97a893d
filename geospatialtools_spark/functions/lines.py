"""Line-level corpus operators: C4-style line cleaning and global
line-level exact deduplication.

Production web corpora are cleaned *within* documents before any
document-level dedup runs: C4 (Raffel et al. 2020, §2.2) keeps only lines
that look like prose (enough words, terminal punctuation, no boilerplate
phrases), and both C4 and later pipelines (RefinedWeb, FineWeb) drop
repeated lines *across* the corpus — navigation chrome, cookie banners and
license footers appear verbatim on millions of pages, and keeping one
global occurrence removes most boilerplate mass without touching
document-level near-dup machinery.

Two operators, two very different execution shapes:

- ``clean_lines``: a PURE per-row Catalyst expression (split -> array
  filter -> re-join). Zero shuffle, embarrassingly parallel, whole
  pipeline stays in the scan stage at 100 TB.
- ``line_dedup``: the only genuinely global one. One shuffle keyed on the
  line value to elect each line's first occurrence (min(struct(doc, pos))
  — an algebraic aggregate, so Spark's map-side partial aggregation
  collapses the 10^9 copies of "enable javascript to continue" to one row
  per map task BEFORE the shuffle; boilerplate skew never travels), one
  shuffle back on the doc id to reassemble. No joins against the raw
  corpus text beyond the exploded lines themselves.

For corpora whose text carries no newlines (the synthetic gate corpus),
``wrap_words`` derives deterministic pseudo-lines of k words so the same
operators and the same DuckDB oracles still exercise end-to-end.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import word_ngrams, words_array

# C4's boilerplate phrase list (public): lines containing any of these are
# dropped by clean_lines when no explicit blacklist is passed.
DEFAULT_BLACKLIST = ["javascript", "lorem ipsum", "cookie", "terms of use",
                     "privacy policy", "all rights reserved"]
TERMINAL_PUNCT = (".", "!", "?", '"', "'")


def wrap_words(text: Column, k: int) -> Column:
    """Deterministic pseudo-lines: whitespace words chunked k at a time,
    space-joined per chunk, newline-joined overall. NULL text -> NULL,
    empty/blank text -> ''. Used by tests and the gate queries to give a
    newline-free corpus a line structure both engines can reproduce."""
    ws = words_array(text)
    n = F.size(ws)
    # NB: Spark's sequence(0, hi) auto-steps DESCENDING when hi < 0, so the
    # empty case must short-circuit rather than rely on an empty sequence.
    chunks = F.when(n > 0, F.transform(
        F.sequence(F.lit(0), F.floor((n - 1) / k).cast("int")),
        lambda i: F.array_join(F.slice(ws, i * k + 1, k), " "))
    ).otherwise(F.array().cast("array<string>"))
    return F.when(text.isNull(), F.lit(None).cast("string")) \
            .otherwise(F.array_join(chunks, "\n"))


def _trim_ws(x: Column) -> Column:
    """Strip ALL leading/trailing Java whitespace (F.trim strips ASCII
    space only — a '\\r' left by CRLF line endings or tab indentation
    would defeat cross-document line identity, the same whitespace-flavor
    class words_array already fixed)."""
    return F.regexp_replace(x, r"^\s+|\s+$", "")


def split_lines(text: Column, sep: str = "\n") -> Column:
    """Non-empty lines of ``text`` as array<string> (literal separator).
    NULL text -> NULL; lines are trimmed of surrounding whitespace (every
    Java \\s flavor, so CRLF endings and tab indentation don't defeat
    cross-document line identity) and whitespace-only lines drop out."""
    import re as _re
    parts = F.split(text, _re.escape(sep))
    return F.filter(F.transform(parts, _trim_ws),
                    lambda x: F.length(x) > 0)


def _keep_line(line: Column, min_words: int, blacklist: list[str],
               require_terminal_punct: bool) -> Column:
    """Predicate: does a single line survive the C4-style rules?"""
    keep = F.size(F.filter(F.split(line, r"\s+"),
                           lambda x: F.length(x) > 0)) >= min_words
    if blacklist:
        low = F.lower(line)
        for term in blacklist:
            keep = keep & ~low.contains(term.lower())
    if require_terminal_punct:
        # lines arrive pre-trimmed by split_lines, so the raw last char is
        # the real terminal character whatever the whitespace flavor was
        tail = F.substring(line, -1, 1)
        keep = keep & tail.isin(*TERMINAL_PUNCT)
    return keep


def clean_lines(df: DataFrame, text_col: str = "text", sep: str = "\n",
                min_words: int = 3,
                blacklist: list[str] | None = None,
                require_terminal_punct: bool = False,
                out_col: str = "clean_text") -> DataFrame:
    """C4-style line filtering (Raffel et al. 2020 §2.2), per document.

    Keeps lines with >= ``min_words`` whitespace words, containing none of
    the (case-insensitive) ``blacklist`` substrings, and — when
    ``require_terminal_punct`` — ending in sentence punctuation. Adds
    ``out_col`` (surviving lines re-joined with ``sep``), ``n_lines`` and
    ``n_kept`` audit counts. NULL text propagates NULLs.

    Pure per-row Catalyst (array filter + join): zero shuffle, scales with
    the scan. Reference scope: the reference engine has no text-corpus
    surface; this is part of the mandated training-data pipeline layer.
    """
    bl = DEFAULT_BLACKLIST if blacklist is None else blacklist
    t = F.col(text_col)
    lines = split_lines(t, sep)
    kept = F.filter(lines, lambda ln: _keep_line(ln, min_words, bl,
                                                 require_terminal_punct))
    return (df.withColumn("n_lines", F.size(lines).cast("long"))
              .withColumn("n_kept", F.size(kept).cast("long"))
              .withColumn(out_col,
                          F.when(t.isNull(), F.lit(None).cast("string"))
                           .otherwise(F.array_join(kept, sep))))


def line_dedup(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", sep: str = "\n",
               out_col: str = "dedup_text") -> DataFrame:
    """Global line-level exact dedup: each distinct line survives only at
    its first corpus occurrence (smallest ``(id, position)``); later
    occurrences are dropped from their documents. Returns one row per
    input document: ``id_col``, ``n_lines``, ``n_kept`` and ``out_col``
    (surviving lines re-joined in original order; '' when every line was a
    repeat). NULL/blank text yields 0/0 and '' (NULL text stays NULL).

    Execution shape (the 100 TB design):

    1. posexplode the trimmed non-empty lines — rows (id, pos, line).
    2. groupBy(line).agg(min(struct(id, pos))) elects the winner
       occurrence. min over structs is algebraic, so partial aggregation
       runs map-side: a boilerplate line repeated 10^9 times contributes
       ONE row per map task to the shuffle — corpus-scale line skew is
       absorbed before the exchange, no salting needed.
    3. The exploded rows join the winners on the line value; a row
       survives iff it IS the winner. AQE broadcasts the winner side when
       small; otherwise both sides already hash-partition on the join key
       from step 2's shuffle.
    4. groupBy(id) reassembles surviving lines with sort_array over
       (pos, line) structs — one shuffle keyed on the doc id.

    Grouping is on the exact line value (not a hash), so results are
    collision-free by construction; the shuffle key is the line string,
    whose population after map-side combine is the DISTINCT line set.
    """
    t = F.col(text_col)
    base = df.select(F.col(id_col).alias("_id"), t.alias("_text"),
                     split_lines(t, sep).alias("_lines"))
    ex = base.select(
        "_id", F.posexplode("_lines").alias("_pos", "_line"))

    winners = (ex.groupBy("_line")
                 .agg(F.min(F.struct(F.col("_id"), F.col("_pos")))
                       .alias("_win")))

    kept = (ex.join(winners, "_line")
              .filter((F.col("_win._id") == F.col("_id")) &
                      (F.col("_win._pos") == F.col("_pos")))
              .select("_id", "_pos", "_line"))

    assembled = (kept.groupBy("_id")
                 .agg(F.count("*").cast("long").alias("n_kept"),
                      F.array_join(
                          F.transform(
                              F.array_sort(F.collect_list(
                                  F.struct(F.col("_pos"), F.col("_line")))),
                              lambda s: s["_line"]),
                          sep).alias(out_col)))

    return (base.join(assembled, "_id", "left")
            .select(F.col("_id").alias(id_col),
                    F.coalesce(F.size("_lines").cast("long"), F.lit(0))
                     .alias("n_lines"),
                    F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
                    F.when(F.col("_text").isNull(),
                           F.lit(None).cast("string"))
                     .otherwise(F.coalesce(F.col(out_col), F.lit("")))
                     .alias(out_col)))


def passage_dedup(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", n: int = 8,
                  out_col: str = "dedup_text") -> DataFrame:
    """Corpus-wide duplicated-PASSAGE removal — the substring level of the
    dedup hierarchy (document -> span -> line -> passage): Lee et al. 2021
    ("Deduplicating Training Data Makes Language Models Better", ExactSubstr)
    remove every occurrence but one of any substring duplicated across the
    corpus. Their single-machine suffix array does not distribute; the
    established distributed approximation is fixed-width token windows,
    which this operator implements EXACTLY (no hashing, no probability):

    A token at position ``p`` of document ``d`` is REMOVED iff some n-token
    window covering it (start ``s``, ``s <= p < s+n``) has a window string
    that occurs at more than one ``(doc, start)`` position corpus-wide AND
    ``(d, s)`` is not that window's keeper occurrence (the smallest
    ``(doc, start)``). Duplicated runs longer than ``n`` are covered by
    their overlapping windows, so whole repeated passages vanish from every
    document except the first; within-document repetition (the same window
    twice in one doc) is removed the same way. The keeper document can
    still lose tokens of a kept window when a DIFFERENT overlapping window
    is duplicated elsewhere — exactly the boundary behaviour of the
    window approximation, documented rather than hidden.

    Returns one row per input document: ``id_col``, ``n_tokens``,
    ``n_kept``, and ``out_col`` (surviving whitespace tokens re-joined with
    single spaces in original order — whitespace flavor collapses, the
    contract every operator in this module shares). Documents with fewer
    than ``n`` tokens have no windows and survive verbatim (token-joined);
    NULL text stays NULL, empty/blank text yields 0/0 and ''.

    Execution shape (the 100 TB design, same skeleton as ``line_dedup``):

    1. One windows table: posexplode of ``word_ngrams`` — rows
       ``(id, start, window_string)``; the n-gram array is the zip_with
       fused pass (textstats HOF law), not per-element slicing.
    2. groupBy(window).agg(min(struct(id, start)), count) elects keepers.
       Both aggregates are ALGEBRAIC, so map-side partial aggregation
       collapses a boilerplate passage repeated 10^9 times to one row per
       map task before the shuffle — window skew never travels, no salting.
    3. Non-keeper occurrences of duplicated windows explode to their n
       covered positions -> distinct (id, position) drop set. The join
       reuses step 2's hash partitioning on the window key.
    4. Tokens anti-join the drop set on (id, position), then one groupBy
       on the doc id reassembles survivors in order (sort_array over
       (pos, token) structs).

    Grouping is on the exact window STRING, so duplication is
    collision-free by construction (the line_dedup discipline). Shuffle
    inventory: the window election (key = window string, ~n x corpus bytes
    map-side input but distinct-window rows out), the drop-set distinct,
    and the per-doc reassembly. Reference scope: the reference engine has
    no text surface; this is the mandated training-data layer.
    """
    if n < 2:
        raise ValueError("n >= 2 (window of 1 token would drop every "
                         "repeated word in the corpus)")
    t = F.col(text_col)
    base = df.select(F.col(id_col).alias("_id"), t.alias("_text"),
                     words_array(t).alias("_w"))
    wins = base.select(
        "_id", F.posexplode(word_ngrams(F.col("_w"), n))
                .alias("_start", "_win"))

    elect = (wins.groupBy("_win")
             .agg(F.min(F.struct(F.col("_id"), F.col("_start")))
                   .alias("_keep"),
                  F.count("*").alias("_cnt")))

    dropped = (wins.join(elect, "_win")
               .filter((F.col("_cnt") > 1) &
                       ~((F.col("_keep._id") == F.col("_id")) &
                         (F.col("_keep._start") == F.col("_start"))))
               .select("_id",
                       F.explode(F.sequence(
                           F.col("_start"),
                           F.col("_start") + F.lit(n - 1))).alias("_p"))
               .distinct())

    toks = base.select("_id", F.posexplode("_w").alias("_p", "_tok"))
    kept = toks.join(dropped, ["_id", "_p"], "left_anti")

    assembled = (kept.groupBy("_id")
                 .agg(F.count("*").cast("long").alias("n_kept"),
                      F.array_join(
                          F.transform(
                              F.array_sort(F.collect_list(
                                  F.struct(F.col("_p"), F.col("_tok")))),
                              lambda s: s["_tok"]),
                          " ").alias(out_col)))

    return (base.join(assembled, "_id", "left")
            .select(F.col("_id").alias(id_col),
                    F.coalesce(F.size("_w").cast("long"), F.lit(0))
                     .alias("n_tokens"),
                    F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
                    F.when(F.col("_text").isNull(),
                           F.lit(None).cast("string"))
                     .otherwise(F.coalesce(F.col(out_col), F.lit("")))
                     .alias(out_col)))


def chunk_text(df: DataFrame, text_col: str = "text",
               chunk_chars: int = 2048, overlap_chars: int = 0,
               out_cols: tuple[str, str] = ("chunk_id", "chunk_text")
               ) -> DataFrame:
    """Split each document into fixed-size overlapping character chunks —
    the complement of ``sampling.pack_sequences``: packing fills context
    windows with short documents, chunking cuts documents LONGER than the
    window (RAG indexing, embedding corpora, long-doc training shards).

    Chunk starts are ``0, stride, 2*stride, ...`` with
    ``stride = chunk_chars - overlap_chars``; every chunk is
    ``chunk_chars`` long except the last, which ends at the text's end
    (chunk count = ``1 + ceil((len - chunk) / stride)`` for
    ``len > chunk``, else 1). NULL or empty text yields ZERO chunks (the
    row drops out — mirror of the emptied-doc drops in the lines stage).

    Scale shape: pure per-row Catalyst (sequence -> explode ->
    substring) — zero shuffle, stateless, streaming-safe; output rows
    carry every input column except ``text_col`` plus
    ``(chunk_id, chunk_text)``, so (your row key, chunk_id) is the
    global chunk key with in-document order preserved.
    """
    if overlap_chars >= chunk_chars:
        raise ValueError("overlap_chars must be smaller than chunk_chars "
                         "(stride would be <= 0 and chunking would never "
                         "advance)")
    stride = int(chunk_chars - overlap_chars)
    cid, ctext = out_cols
    ln = F.length(F.col(text_col))
    # integer ceil((len - chunk) / stride) via the +stride-1 trick, in
    # pure Column ops (no F.expr string interpolation — quoted column
    # names stay safe): a - a%stride is exactly divisible by stride, so
    # the double division is exact and the truncating cast is the floor
    a = ln - F.lit(chunk_chars) + F.lit(stride - 1)
    fdiv = ((a - a % stride) / stride).cast("long")
    n = F.when(ln <= chunk_chars, F.lit(1)).otherwise(F.lit(1) + fdiv)
    arr = F.when(ln > 0, F.sequence(F.lit(0), (n - 1).cast("int")))
    keep = [c for c in df.columns if c != text_col]
    d = df.select(*df.columns, F.explode(arr).alias("_chunk_i"))
    return d.select(*keep,
                    F.col("_chunk_i").cast("long").alias(cid),
                    F.substring(F.col(text_col),
                                F.col("_chunk_i") * stride + 1,
                                F.lit(chunk_chars)).alias(ctext))


# ---------------------------------------------------------------------------
# Unicode normalization + control stripping
# ---------------------------------------------------------------------------

# C0 controls except \t\n\r, DEL, and the C1 block — the bytes mojibake
# and broken scrapes leave behind; kept OUT of the regex: \t\n\r (layout
# the line operators above consume) and all printable unicode
_CONTROL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\x9f]"


def strip_controls(text: Column) -> Column:
    """Drop C0/C1 control characters (except tab/newline/CR) — a pure
    Catalyst ``regexp_replace``, zero shuffle, stays in the scan stage."""
    return F.regexp_replace(text, _CONTROL_RE, "")


def normalize_unicode(text: Column, form: str = "NFC") -> Column:
    """Unicode-normalize a text column (NFC by default; NFKC/NFD/NFKD
    accepted) — the canonicalization step every web corpus needs before
    ANY hash-keyed operator above it: "é" as one codepoint and "e" + a
    combining acute are byte-different, so without this the exact/line/
    passage dedups, the MinHash shingles and the URL keys all treat
    equal-looking text as distinct (and a quality regex sees different
    word lengths).

    Engine shape: an Arrow-batched pandas UDF over ``Series.str.
    normalize`` (ICU-equivalent tables from Python's unicodedata) — a
    per-row Python pass, the honest cost of an operation Spark has no
    builtin for; it is stateless and shuffle-free, so it pipelines
    inside the scan stage like any projection. The NFC form is
    cross-engine value-oracled against DuckDB's ``nfc_normalize`` at the
    gate; NFKC (compatibility folding: ligatures, fullwidth forms) has
    no DuckDB twin and is pytest-verified against unicodedata directly.
    NULLs pass through as NULL.
    """
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form: {form}")

    @F.pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.str.normalize(form)

    return _norm(text)
