"""BM25 retrieval (functions/retrieval.py) vs an independent pure-Python
twin, plus the plan/persistence contracts the 100 TB design rests on."""

import math
import re

from pyspark.sql import functions as F

from geospatialtools_spark.functions.retrieval import (bm25_probe,
                                                       bm25_topk,
                                                       build_text_index,
                                                       load_text_index,
                                                       persist_text_index)

SF = "/root/testdata/sf0.001"

CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "a quick brown cat naps on the warm brown rug"),
    (2, "dogs and cats live together in the quiet house"),
    (3, "fox hunting was banned; the fox population grew"),
    (4, "numerical weather prediction uses terrain elevation data"),
    (5, "elevation data feeds the flow accumulation model"),
    (6, ""),                      # tokenless: must never appear in results
    (7, None),                    # NULL text: likewise
]
QUERIES = [(100, "quick brown fox"), (101, "elevation data"),
           (102, "zebra")]        # no corpus hit -> zero rows for 102


def _tok(s):
    return re.findall("[a-z0-9]+", s.lower()) if s else []


def py_bm25(corpus, queries, k=5, k1=1.2, b=0.75):
    """Independent BM25: same Lucene idf, same rounding/tie contract."""
    toks = {i: _tok(t) for i, t in corpus}
    dl = {i: len(ts) for i, ts in toks.items() if ts}
    n = len(dl)
    avgdl = sum(dl.values()) / n
    tf = {}
    for i, ts in toks.items():
        for t in ts:
            tf[(t, i)] = tf.get((t, i), 0) + 1
    df = {}
    for (t, _i) in tf:
        df[t] = df.get(t, 0) + 1
    out = []
    for qid, qtext in queries:
        scores = {}
        for t in dict.fromkeys(_tok(qtext)):      # distinct, order kept
            if t not in df:
                continue
            idf = math.log(1.0 + (float(n) - df[t] + 0.5) / (df[t] + 0.5))
            for i in dl:
                if (t, i) in tf:
                    f = float(tf[(t, i)])
                    scores[i] = scores.get(i, 0.0) + idf * f * (k1 + 1.0) / \
                        (f + k1 * (1.0 - b + b * dl[i] / avgdl))
        ranked = sorted(((round(s, 6), i) for i, s in scores.items()),
                        key=lambda p: (-p[0], p[1]))[:k]
        out += [(qid, r + 1, i, s) for r, (s, i) in enumerate(ranked)]
    return sorted(out)


def _spark_corpus(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def _spark_queries(spark):
    return spark.createDataFrame(QUERIES, "query_id long, q_text string")


def test_bm25_matches_python_twin(spark):
    got = sorted(tuple(r) for r in bm25_topk(
        _spark_corpus(spark), _spark_queries(spark), k=5).collect())
    assert got == py_bm25(CORPUS, QUERIES, k=5)
    # the no-hit query contributed nothing, the hit queries <= k rows each
    assert not any(r[0] == 102 for r in got)


def test_bm25_self_retrieval(spark):
    """A query of a document's own DISTINCTIVE tokens ranks that document
    first (provable on the controlled corpus). On the driver's documents
    table — ~30 shared vocabulary words, so no token is distinctive and
    another doc can legitimately outscore the source — the source doc must
    still land in the top-k."""
    q = spark.createDataFrame([(300, "fox population banned")],
                              "query_id long, q_text string")
    top1 = bm25_topk(_spark_corpus(spark), q, k=1).collect()
    assert len(top1) == 1 and top1[0]["doc_id"] == 3

    d = spark.read.parquet(f"{SF}/documents.parquet")
    from geospatialtools_spark.functions.retrieval import _tokens
    q = (d.filter(F.col("doc_id") == 41)
         .select(F.col("doc_id").alias("query_id"),
                 F.array_join(F.slice(_tokens(F.col("text")), 1, 12), " ")
                 .alias("q_text")))
    top = bm25_topk(d, q, k=10).collect()
    assert 41 in [r["doc_id"] for r in top]


def test_bm25_probe_plan_contract(spark):
    """Probe plan: the query side broadcasts (BroadcastHashJoin present),
    and no CartesianProduct / broadcast nested loop appears — the corpus-
    sized postings table is only filtered by the term equi-join."""
    idx = build_text_index(_spark_corpus(spark))
    plan = bm25_probe(idx, _spark_queries(spark))._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bm25_persist_load_roundtrip(spark, tmp_path):
    idx = build_text_index(_spark_corpus(spark))
    persist_text_index(idx, str(tmp_path / "tidx"))
    loaded = load_text_index(spark, str(tmp_path / "tidx"))
    assert (loaded.n_docs, loaded.avgdl, loaded.id_col) == \
        (idx.n_docs, idx.avgdl, idx.id_col)
    a = sorted(tuple(r) for r in
               bm25_probe(idx, _spark_queries(spark)).collect())
    b = sorted(tuple(r) for r in
               bm25_probe(loaded, _spark_queries(spark)).collect())
    assert a == b == py_bm25(CORPUS, QUERIES, k=5)


def test_bm25_max_df_frac_drops_stop_terms(spark):
    """'the' appears in 5 of the 6 token-bearing docs (all but doc 4);
    max_df_frac=0.5 (cap = floor(0.5*6) = 3 < 5) must drop it from the
    index, and the scores must equal a python twin computed with 'the'
    unqueryable — i.e. the guard removes the hottest, lowest-signal
    postings list without touching any other term."""
    idx = build_text_index(_spark_corpus(spark), max_df_frac=0.5)
    assert idx.term_stats.filter(F.col("term") == "the").count() == 0
    got = sorted(tuple(r) for r in bm25_probe(
        idx, spark.createDataFrame([(200, "the fox")],
                                   "query_id long, q_text string")).collect())
    # twin: same corpus lengths (dl keeps 'the'!) but 'the' unqueryable —
    # guard drops the POSTINGS, not the tokens' contribution to dl
    want = [r for r in py_bm25(CORPUS, [(200, "fox")], k=5)]
    assert [(q, rk, d, s) for q, rk, d, s in got] == want


def test_bm25_persisted_index_partition_pruned_probe(spark, tmp_path):
    """The 100 TB index layout made physical: persist_text_index writes
    postings/term stats partitioned by term hash bucket; probing the
    loaded index must (a) give the same answers as the in-memory index,
    and (b) carry the query batch's bucket restriction as
    PartitionFilters on the parquet scans — a pruned read of the query's
    own term buckets, not a filtered full scan."""
    idx = build_text_index(_spark_corpus(spark))
    persist_text_index(idx, str(tmp_path / "tidx"))
    loaded = load_text_index(spark, str(tmp_path / "tidx"))
    mem = sorted(tuple(r) for r in
                 bm25_probe(idx, _spark_queries(spark)).collect())
    disk_df = bm25_probe(loaded, _spark_queries(spark))
    assert sorted(tuple(r) for r in disk_df.collect()) == mem

    plan = disk_df._jdf.queryExecution().executedPlan().toString()
    scan_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert scan_lines, plan
    assert any("_bkt" in ln and ("INSET" in ln or " IN " in ln or "In(" in ln)
               for ln in scan_lines), "\n".join(scan_lines)


def test_bm25_empty_corpus_guard(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    idx = build_text_index(empty)
    assert idx.n_docs == 0 and idx.avgdl == 0.0
    assert bm25_probe(idx, _spark_queries(spark)).count() == 0
