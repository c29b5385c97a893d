"""Line-level corpus operators (C4-style cleaning, global line dedup),
weighted sampling and next-fit sequence packing.

Each operator's gate query also has a DuckDB value oracle in
``__spark_entry__.py``; these tests pin the semantics on handcrafted and
randomized inputs where the behavior is checkable by construction.
"""

from __future__ import annotations

import math
import hashlib

import pandas as pd
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from geospatialtools_spark.functions import lines as LN
from geospatialtools_spark.functions.sampling import (
    pack_sequences, weighted_sample)


# ----------------------------------------------------------------- lines

def test_wrap_words_chunks_and_edges(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b"), (3, ""), (4, "   "), (5, None)],
        "id long, text string")
    out = {r["id"]: r["w"] for r in
           df.select("id", LN.wrap_words(F.col("text"), 2).alias("w")).collect()}
    assert out[1] == "a b\nc d\ne"
    assert out[2] == "a b"
    assert out[3] == ""
    assert out[4] == ""
    assert out[5] is None


def test_clean_lines_rules(spark):
    doc = ("This is a proper sentence with enough words.\n"
           "short line\n"
           "Please enable JavaScript to view this site properly okay.\n"
           "Another good sentence that survives every rule here")
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    out = LN.clean_lines(df, min_words=5, require_terminal_punct=False).head()
    assert out["n_lines"] == 4
    # 'short line' fails min_words; the JavaScript line hits the default
    # blacklist; two survive
    assert out["n_kept"] == 2
    assert out["clean_text"].splitlines() == [
        "This is a proper sentence with enough words.",
        "Another good sentence that survives every rule here"]

    punct = LN.clean_lines(df, min_words=5, require_terminal_punct=True).head()
    # terminal-punct rule additionally drops the unpunctuated last line
    assert punct["n_kept"] == 1


def test_clean_lines_null_and_empty(spark):
    df = spark.createDataFrame([(1, None), (2, "")],
                               "doc_id long, text string")
    rows = {r["doc_id"]: r for r in LN.clean_lines(df).collect()}
    assert rows[1]["clean_text"] is None
    assert rows[2]["clean_text"] == ""
    assert rows[2]["n_lines"] == 0 and rows[2]["n_kept"] == 0


def test_line_dedup_first_occurrence_semantics(spark):
    docs = [
        (1, "alpha beta\nshared line\nunique one"),
        (2, "shared line\nanother text"),           # loses 'shared line'
        (3, "shared line"),                          # loses its only line
        (4, None),
        (5, "  \n  "),                               # blank -> no lines
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in LN.line_dedup(df).collect()}
    assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 3
    assert out[1]["dedup_text"] == "alpha beta\nshared line\nunique one"
    assert out[2]["n_lines"] == 2 and out[2]["n_kept"] == 1
    assert out[2]["dedup_text"] == "another text"
    assert out[3]["n_kept"] == 0 and out[3]["dedup_text"] == ""
    assert out[4]["dedup_text"] is None and out[4]["n_lines"] == 0
    assert out[5]["n_lines"] == 0 and out[5]["dedup_text"] == ""


def test_line_dedup_within_document_repeats(spark):
    # the SECOND copy inside the same doc is also a later occurrence
    df = spark.createDataFrame([(7, "x y z\nx y z\nother")],
                               "doc_id long, text string")
    r = LN.line_dedup(df).head()
    assert r["n_lines"] == 3 and r["n_kept"] == 2
    assert r["dedup_text"] == "x y z\nother"


def test_line_dedup_trims_indentation(spark):
    df = spark.createDataFrame([(1, "  menu home  "), (2, "menu home")],
                               "doc_id long, text string")
    out = {r["doc_id"]: r for r in LN.line_dedup(df).collect()}
    assert out[1]["n_kept"] == 1 and out[2]["n_kept"] == 0


def test_line_identity_survives_crlf_and_tabs(spark):
    # CRLF endings and tab indentation must not defeat cross-document line
    # identity (the whitespace-flavor class words_array fixed); a
    # whitespace-only line is not content
    df = spark.createDataFrame(
        [(1, "menu home\r\nbody one."), (2, "\tmenu home\nbody two."),
         (3, " \t \nonly real line")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in LN.line_dedup(df).collect()}
    assert out[1]["n_kept"] == 2                       # first 'menu home'
    assert out[2]["n_kept"] == 1
    assert out[2]["dedup_text"] == "body two."
    assert out[3]["n_lines"] == 1                      # blank line dropped
    # terminal-punct rule sees the real last char through a CRLF ending
    punct = LN.clean_lines(
        spark.createDataFrame([(1, "good sentence here today ok.\r\nbad")],
                              "doc_id long, text string"),
        min_words=2, blacklist=[], require_terminal_punct=True).head()
    assert punct["n_kept"] == 1


def test_line_dedup_stable_under_repartition(spark):
    docs = [(i, f"common header\nbody {i % 7}\ntail {i % 3}")
            for i in range(1, 101)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = sorted(map(tuple, LN.line_dedup(df).collect()))
    b = sorted(map(tuple, LN.line_dedup(df.repartition(13)).collect()))
    assert a == b
    # exactly one global survivor of 'common header' (doc 1), and each
    # 'body k' / 'tail k' survives once
    kept = sum(r[2] for r in a)
    assert kept == 1 + 7 + 3


# -------------------------------------------------------- passage dedup

def _passage_ref(docs: list[tuple[int, str | None]], n: int):
    """Independent python implementation of the passage_dedup contract:
    token (d, p) dropped iff covered by a non-keeper occurrence of a
    corpus-duplicated n-token window (keeper = min (doc, start))."""
    import re
    toks = {d: ([w for w in re.split(r"\s+", t) if w]
                if t is not None else None) for d, t in docs}
    occ: dict[str, list[tuple[int, int]]] = {}
    for d, _ in sorted(docs):
        ws = toks[d] or []
        for s in range(len(ws) - n + 1):
            occ.setdefault(" ".join(ws[s:s + n]), []).append((d, s))
    dropped: set[tuple[int, int]] = set()
    for lst in occ.values():
        if len(lst) > 1:
            keeper = min(lst)
            for d, s in lst:
                if (d, s) != keeper:
                    dropped.update((d, p) for p in range(s, s + n))
    out = {}
    for d, t in docs:
        if t is None:
            out[d] = (0, 0, None)
            continue
        ws = toks[d]
        kept = [w for p, w in enumerate(ws) if (d, p) not in dropped]
        out[d] = (len(ws), len(kept), " ".join(kept))
    return out


def _run_passage(spark, docs, n):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {r["doc_id"]: (r["n_tokens"], r["n_kept"], r["dedup_text"])
            for r in LN.passage_dedup(df, n=n).collect()}


def test_passage_dedup_planted_passage_kept_once(spark):
    boiler = "the quick brown fox jumps over the lazy dog today"  # 10 tokens
    docs = [
        (1, f"intro words here {boiler} closing remark"),
        (2, f"{boiler} different unique suffix content"),
        (3, f"prefix material {boiler}"),
        (4, "completely unrelated text with no repeats at all"),
    ]
    out = _run_passage(spark, docs, n=10)
    ref = _passage_ref(docs, n=10)
    assert out == ref
    # doc 1 is the keeper (smallest doc_id): its text survives verbatim
    assert out[1][2] == docs[0][1]
    # docs 2 and 3 lose exactly the 10 boilerplate tokens
    assert out[2] == (14, 4, "different unique suffix content")
    assert out[3] == (12, 2, "prefix material")
    assert out[4][1] == out[4][0]


def test_passage_dedup_within_doc_repetition_and_overlap(spark):
    # 'a a a a a': every 2-window is 'a a'; keeper is start 0, starts
    # 1..3 are duplicates -> tokens 1..4 drop, only token 0 survives
    docs = [(1, "a a a a a"), (2, "b c b c b c")]
    out = _run_passage(spark, docs, n=2)
    assert out == _passage_ref(docs, n=2)
    assert out[1] == (5, 1, "a")
    # 'b c b c b c': windows bc(0) cb(1) bc(2) cb(3) bc(4); non-keeper
    # bc@2, bc@4, cb@3 drop tokens 2..5 -> 'b c' survives
    assert out[2] == (6, 2, "b c")


def test_passage_dedup_short_null_empty(spark):
    docs = [(1, "one two three"), (2, "one two three"), (3, None), (4, "  ")]
    # n larger than any doc: no windows exist anywhere -> verbatim
    out = _run_passage(spark, docs, n=5)
    assert out[1] == (3, 3, "one two three")
    assert out[2] == (3, 3, "one two three")
    assert out[3] == (0, 0, None)
    assert out[4] == (0, 0, "")
    # n=3: doc 2's single window duplicates doc 1's -> emptied
    out3 = _run_passage(spark, docs, n=3)
    assert out3[1] == (3, 3, "one two three")
    assert out3[2] == (3, 0, "")


def test_passage_dedup_matches_reference_randomized(spark):
    import random
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(12)]
    phrase = "p0 p1 p2 p3 p4 p5"
    docs = []
    for d in range(1, 41):
        words = [vocab[rng.randrange(len(vocab))]
                 for _ in range(rng.randrange(4, 30))]
        if d % 3 == 0:  # plant the shared passage in a third of docs
            at = rng.randrange(0, len(words))
            words[at:at] = phrase.split()
        docs.append((d, " ".join(words)))
    out = _run_passage(spark, docs, n=6)
    assert out == _passage_ref(docs, n=6)


def test_passage_dedup_stable_under_repartition(spark):
    docs = [(i, f"shared shingle run here again d{i % 4} x{i % 5} y{i % 3}")
            for i in range(1, 61)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = sorted(map(tuple, LN.passage_dedup(df, n=5).collect()))
    b = sorted(map(tuple,
                   LN.passage_dedup(df.repartition(13), n=5).collect()))
    assert a == b
    assert a == sorted((d, *v) for d, v in _passage_ref(docs, 5).items())


def test_passage_dedup_rejects_window_of_one(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        LN.passage_dedup(df, n=1)


# ----------------------------------------------------------- span dedup

def _spans_df(spark, rows):
    from geospatialtools_spark.operators.docs import spans_schema
    import pyspark.sql.types as T
    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("spans", spans_schema())])
    return spark.createDataFrame(rows, schema)


def test_span_dedup_first_occurrence_and_order(spark):
    from geospatialtools_spark.operators.docs import span_dedup
    lic = ("text", "license", None, 0)
    img = ("image", None, "blob://shared", 5)
    df = _spans_df(spark, [
        (1, [lic, ("text", "body one", None, 10), img]),
        (2, [lic, img, ("text", "body two", None, 20)]),
        (3, [lic]),                                   # loses everything
    ])
    out = {r["doc_id"]: r for r in span_dedup(df).collect()}
    assert out[1]["n_spans"] == 3 and out[1]["n_kept"] == 3
    assert [s["text"] or s["media_ref"] for s in out[1]["spans_dedup"]] == \
        ["license", "body one", "blob://shared"]
    # doc 2 loses the license AND the shared image, keeps its body in place
    assert out[2]["n_kept"] == 1
    assert out[2]["spans_dedup"][0]["text"] == "body two"
    assert out[3]["n_kept"] == 0 and out[3]["spans_dedup"] == []


def test_span_dedup_within_doc_repeat_and_stability(spark):
    from geospatialtools_spark.operators.docs import span_dedup
    rep = ("text", "repeated watermark", None, 0)
    rows = [(i, [rep, ("text", f"unique {i}", None, 1), rep])
            for i in range(1, 51)]
    df = _spans_df(spark, rows)
    a = span_dedup(df)
    got = {r["doc_id"]: r for r in a.collect()}
    # the watermark survives once globally (doc 1, pos 0); every doc keeps
    # its unique span; doc 1 keeps 2 of 3 (its own pos-2 repeat drops too)
    assert got[1]["n_kept"] == 2
    for i in range(2, 51):
        assert got[i]["n_kept"] == 1
        assert got[i]["spans_dedup"][0]["text"] == f"unique {i}"
    b = {r["doc_id"]: r["n_kept"]
         for r in span_dedup(df.repartition(7)).collect()}
    assert b == {k: v["n_kept"] for k, v in got.items()}


# ------------------------------------------------------- weighted sampling

def test_weighted_sample_matches_python_reference(spark):
    rows = [(i, (i * 37) % 90 + 10) for i in range(1, 501)]
    df = spark.createDataFrame(rows, "id long, w long")

    def pri(key, w):
        h = int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16)
        return -math.log((h + 0.5) / 2**32) / w

    expect = sorted(rows, key=lambda r: (pri(r[0], r[1]), r[0]))[:50]
    got = weighted_sample(df, "id", "w", k=50).select("id", "w").collect()
    assert [(r["id"], r["w"]) for r in got] == expect


def test_weighted_sample_deterministic_and_weight_sensitive(spark):
    rows = [(i, 1 if i <= 450 else 1000) for i in range(1, 501)]
    df = spark.createDataFrame(rows, "id long, w long")
    got = weighted_sample(df, "id", "w", k=50)
    again = weighted_sample(df.repartition(17), "id", "w", k=50)
    ids = {r["id"] for r in got.collect()}
    assert ids == {r["id"] for r in again.collect()}
    # the 50 heavy rows (w=1000, ids 451..500) should dominate the sample
    heavy = sum(1 for i in ids if i > 450)
    assert heavy >= 45


def test_weighted_sample_nonpositive_weights_never_sampled(spark):
    df = spark.createDataFrame(
        [(1, 0), (2, -5), (3, 10), (4, 10)], "id long, w long")
    ids = {r["id"] for r in weighted_sample(df, "id", "w", k=2).collect()}
    assert ids == {3, 4}


# --------------------------------------------------------------- packing

def _pack_reference(rows, cap):
    """Single-threaded next-fit per shard (the contract)."""
    out = {}
    by_shard = {}
    for key, w, shard in sorted(rows):
        by_shard.setdefault(shard, []).append((key, w))
    for shard, items in by_shard.items():
        pack, fill, first = 0, 0, True
        for key, w in items:
            if not first and fill + w > cap:
                pack += 1
                fill = 0
            fill += w
            first = False
            out[key] = (shard, pack)
    return out


def test_pack_sequences_matches_reference_and_respects_capacity(spark):
    rows = [(i, (i * 131) % 900 + 50) for i in range(1, 401)]
    df = spark.createDataFrame(rows, "id long, w long")
    cap, budget = 1500, 12_000
    out = pack_sequences(df, "id", "w", capacity=cap, shard_budget=budget)
    got = {r["id"]: (r["shard"], r["pack"]) for r in out.collect()}

    # shard assignment is the budget prefix cut; recompute it exactly
    prefix, shards = 0, {}
    for i, w in sorted(rows):
        shards[i] = prefix // budget
        prefix += w
    expect = _pack_reference([(i, w, shards[i]) for i, w in rows], cap)
    assert got == expect

    # every pack fits the capacity unless it is a single oversize row
    import collections
    fills = collections.Counter()
    counts = collections.Counter()
    for i, w in rows:
        fills[got[i]] += w
        counts[got[i]] += 1
    for pk, fill in fills.items():
        assert fill <= cap or counts[pk] == 1


def test_pack_sequences_oversize_row_gets_own_pack(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 5000), (3, 100)], "id long, w long")
    out = {r["id"]: (r["shard"], r["pack"])
           for r in pack_sequences(df, "id", "w", capacity=1000).collect()}
    assert out[1] != out[2] and out[2] != out[3]
    assert len({v for v in out.values()}) == 3


def test_curation_pipeline_lines_stage(spark, tmp_path):
    """The optional C4-style ``lines`` stage at the head of the curation
    chain: per-document line cleaning, then global first-occurrence line
    dedup; emptied docs drop, weights recompute from the edited text."""
    from geospatialtools_spark.pipeline import (CurationConfig,
                                                run_curation_pipeline)
    boiler = "please enable cookies and javascript to continue browsing"
    docs = [(i,
             f"{boiler}\n"
             f"document {i} carries its own unique prose body line\n"
             "ok",
             len(boiler) + 60) for i in range(1, 41)]
    docs.append((99, boiler, len(boiler)))       # boilerplate-only doc
    df = spark.createDataFrame(docs, "doc_id long, text string, n_chars long")

    cfg = CurationConfig(clean_min_words=4, clean_blacklist=["nomatch"],
                         line_dedup=True, quality_min=0.0,
                         splits={"train": 1.0}, shard_budget=500)
    out = run_curation_pipeline(spark, df, cfg, str(tmp_path / "cur"))

    lines_out = {r["doc_id"]: r for r in out["lines"].collect()}
    # 'ok' fails min_words everywhere; the boilerplate line survives only
    # in doc 1; doc 99 (boilerplate-only) is emptied and dropped
    assert 99 not in lines_out
    assert lines_out[1]["text"].splitlines()[0] == boiler
    for i in range(2, 41):
        assert lines_out[i]["text"] == \
            f"document {i} carries its own unique prose body line"
        assert lines_out[i]["n_chars"] == len(lines_out[i]["text"])
    # stage committed first, chain intact downstream
    from geospatialtools_spark.plans.checkpointing import StageRunner
    r = StageRunner(spark, str(tmp_path / "cur"),
                    {"pipeline": "curation", **cfg.as_dict()})
    assert [e["stage"] for e in r.snapshots()][0] == "lines"
    # downstream chain intact: the one-word-apart prose bodies are genuine
    # near-dups, so MinHash group resolution collapses them to keepers;
    # quality_min=0 + train=1.0 means every keeper reaches the shard stage
    n_keepers = out["near_dedup"].count()
    assert 1 <= n_keepers < 40
    assert out["shard"].count() == n_keepers


def test_curation_pipeline_passages_stage(spark, tmp_path):
    """The optional ``passages`` stage after near-dedup: corpus-duplicated
    token windows are removed from every occurrence but the first; the
    docs here share ONLY a 12-token license passage (too small a fraction
    for document-level MinHash to pair them), so the passage stage is the
    only pass that can remove it."""
    from geospatialtools_spark.pipeline import (CurationConfig,
                                                run_curation_pipeline)
    passage = ("all rights reserved copyright two thousand twenty four "
               "by the site owners")           # 12 tokens
    def body(i):
        return " ".join(f"w{i}x{j}" for j in range(30))
    docs = [(i, f"{body(i)} {passage}", 0) for i in range(1, 21)]
    docs.append((99, passage, 0))              # passage-only doc
    df = spark.createDataFrame(docs, "doc_id long, text string, n_chars long") \
              .withColumn("n_chars", F.length("text").cast("long"))

    cfg = CurationConfig(passage_window=6, quality_min=0.0,
                         splits={"train": 1.0}, shard_budget=5000)
    out = run_curation_pipeline(spark, df, cfg, str(tmp_path / "cur"))

    ps = {r["doc_id"]: r for r in out["passages"].collect()}
    # every doc survives near-dedup (bodies dominate the shingle sets);
    # doc 1 is the window keeper and stays verbatim, 2..20 lose exactly
    # the passage tokens, the passage-only doc empties and drops
    assert out["near_dedup"].count() == 21
    assert 99 not in ps
    assert ps[1]["text"] == f"{body(1)} {passage}"
    for i in range(2, 21):
        assert ps[i]["text"] == body(i)
        assert ps[i]["n_chars"] == len(body(i))
    from geospatialtools_spark.plans.checkpointing import StageRunner
    r = StageRunner(spark, str(tmp_path / "cur"),
                    {"pipeline": "curation", **cfg.as_dict()})
    stages = [e["stage"] for e in r.snapshots()]
    assert "passages" in stages and \
        stages.index("passages") > stages.index("near_dedup")
    assert out["shard"].count() == 20


def test_streaming_quality_ops_match_batch(spark, tmp_path):
    """The per-row curation operators (clean_lines, quality_logreg
    scoring) run THROUGH the streaming engine (file-source micro-batches,
    availableNow drain) and equal the batch plan row-for-row — they are
    stateless Catalyst expressions, so the same operator tree drops into
    readStream unchanged. This is the streaming face of the curation
    surface (the stateful face — sessionize, watermarked dedup — lives in
    streaming/ingest.py)."""
    from geospatialtools_spark.functions.classifier import logreg_score
    from geospatialtools_spark.streaming import ingest as ST
    from geospatialtools_spark.functions.textstats import token_count

    sf_dir = "/root/testdata/sf0.001"

    def transform(df):
        t = F.col("text")
        wrapped = LN.wrap_words(t, 8)
        ntok = token_count(t).cast("double")
        out = LN.clean_lines(
            df.withColumn("text", wrapped), min_words=6,
            blacklist=["slow", "lorem"])
        return out.select(
            "doc_id", "n_lines", "n_kept",
            F.md5(F.col("clean_text")).alias("clean_md5"),
            F.round(logreg_score([ntok], [0.05], -1.5), 6).alias("p"))

    stream = transform(ST.read_docs_stream(spark, sf_dir))
    out_dir = str(tmp_path / "out")
    ST.run_available_now(stream, str(tmp_path / "ck"), out_dir)
    got = spark.read.parquet(out_dir).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)

    want = transform(spark.read.parquet(f"{sf_dir}/documents.parquet")) \
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want)


def test_streaming_chunking_matches_batch(spark, tmp_path):
    """chunk_text is a stateless generator (sequence -> explode ->
    substring), so the same operator tree runs unchanged through
    readStream. Raw documents all have non-empty text, so every doc is
    represented in the compared frames (the doc-level parity test above
    keeps its full per-doc coverage including emptied/NULL docs)."""
    from geospatialtools_spark.streaming import ingest as ST

    sf_dir = "/root/testdata/sf0.001"

    def transform(df):
        chunked = LN.chunk_text(df.select("doc_id", "text"),
                                chunk_chars=40, overlap_chars=8)
        return chunked.select(
            "doc_id", "chunk_id", F.md5(F.col("chunk_text")).alias("md5"))

    stream = transform(ST.read_docs_stream(spark, sf_dir))
    out_dir = str(tmp_path / "out")
    ST.run_available_now(stream, str(tmp_path / "ck"), out_dir)
    keys = ["doc_id", "chunk_id"]
    got = spark.read.parquet(out_dir).toPandas() \
        .sort_values(keys).reset_index(drop=True)
    want = transform(spark.read.parquet(f"{sf_dir}/documents.parquet")) \
        .toPandas().sort_values(keys).reset_index(drop=True)
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want)


def test_pack_sequences_stable_under_repartition(spark):
    rows = [(i, (i * 17) % 300 + 1) for i in range(1, 301)]
    df = spark.createDataFrame(rows, "id long, w long")
    a = sorted(map(tuple, pack_sequences(df, "id", "w", 500, 4_000).collect()))
    b = sorted(map(tuple, pack_sequences(
        df.repartition(11), "id", "w", 500, 4_000).collect()))
    assert a == b


def test_chunk_text_matches_python_reference(spark):
    # position-dependent characters (not uniform fill) so a start-offset
    # bug that preserves chunk LENGTHS still fails the content compare
    def mktext(n):
        alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
        return "".join(alpha[j % len(alpha)] for j in range(n))

    rows = [(i, mktext((i * 53) % 400)) for i in range(1, 80)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    chunk, overlap = 64, 16
    stride = chunk - overlap

    def ref(text):
        if not text:
            return []
        n = 1 if len(text) <= chunk else \
            1 + -(-(len(text) - chunk) // stride)
        return [(j, text[j * stride:j * stride + chunk]) for j in range(n)]

    expect = [(i, j, c) for i, t in rows for j, c in ref(t)]
    got = sorted(map(tuple, LN.chunk_text(
        df, chunk_chars=chunk, overlap_chars=overlap).collect()))
    assert got == sorted(expect)
    # reconstruction: dropping each chunk's leading overlap (except chunk 0)
    # and concatenating in order rebuilds the document exactly
    by_doc = {}
    for i, j, c in got:
        by_doc.setdefault(i, []).append((j, c))
    for (i, t) in rows:
        if not t:
            assert i not in by_doc
            continue
        parts = [c if j == 0 else c[overlap:]
                 for j, c in sorted(by_doc[i])]
        assert "".join(parts) == t


def test_chunk_text_rejects_nonpositive_stride(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError, match="stride"):
        LN.chunk_text(df, chunk_chars=8, overlap_chars=8)


# ---------------------------------------------------------------------------
# unicode normalization + control stripping
# ---------------------------------------------------------------------------

import unicodedata

from geospatialtools_spark.functions.lines import (normalize_unicode,
                                                   strip_controls)


def test_normalize_unicode_matches_unicodedata(spark):
    rows = [
        ("étude",),            # combining acute -> é
        ("ﬁn du café",),  # ﬁ ligature + combining
        ("Ｈｅllo",),        # fullwidth
        ("plain ascii",),
        (None,),
    ]
    df = spark.createDataFrame(rows, "text string")
    for form in ("NFC", "NFKC"):
        got = [r["n"] for r in
               df.select(normalize_unicode(F.col("text"), form)
                         .alias("n")).collect()]
        exp = [unicodedata.normalize(form, t) if t is not None else None
               for (t,) in rows]
        assert got == exp
    # NFC preserves compatibility chars; NFKC folds them
    nfc = df.select(normalize_unicode(F.col("text")).alias("n")).collect()
    assert nfc[1]["n"].startswith("ﬁ")        # ligature survives NFC
    nfkc = df.select(normalize_unicode(F.col("text"), "NFKC")
                     .alias("n")).collect()
    assert nfkc[1]["n"].startswith("fin")          # NFKC folds it


def test_normalize_unicode_idempotent_and_rejects_bad_form(spark):
    import pytest as _pytest
    df = spark.createDataFrame([("étude x",)], "text string")
    once = df.select(normalize_unicode(F.col("text")).alias("n"))
    twice = once.select(normalize_unicode(F.col("n")).alias("n"))
    assert once.collect() == twice.collect()
    with _pytest.raises(ValueError):
        normalize_unicode(F.col("text"), "NFX")


def test_strip_controls_keeps_layout_whitespace(spark):
    df = spark.createDataFrame(
        [("a\x00b\x08c\tkeep\nme\rok\x7f\x9fz",)], "text string")
    got = df.select(strip_controls(F.col("text")).alias("t")).head()["t"]
    assert got == "abc\tkeep\nme\rokz"


def test_streaming_normalize_unicode_matches_batch(spark, tmp_path):
    """normalize_unicode + strip_controls are stateless (one Arrow UDF,
    one regexp) — the same operator tree runs unchanged through the
    streaming engine, so the curation pipeline's leading canonicalization
    stage has a streaming face for free."""
    from geospatialtools_spark.streaming import ingest as ST

    sf_dir = "/root/testdata/sf0.001"

    def transform(df):
        t = F.concat(F.col("text"), F.lit(" café\x07!"))  # decomposed
        out = normalize_unicode(strip_controls(t))
        return df.select("doc_id", F.md5(out).alias("norm_md5"),
                         F.length(out).alias("n_chars"))

    stream = transform(ST.read_docs_stream(spark, sf_dir))
    out_dir = str(tmp_path / "out")
    ST.run_available_now(stream, str(tmp_path / "ck"), out_dir)
    got = spark.read.parquet(out_dir).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = transform(spark.read.parquet(f"{sf_dir}/documents.parquet")) \
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want)
