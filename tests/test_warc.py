"""WARC ingest (sources/warc.py) vs the generator-known ground truth —
the parser and the fixture generator share no code path."""

import pandas as pd
from pyspark.sql import functions as F

from geospatialtools_spark.sources import warc as W


def _expected(n_files, n_records):
    rows = []
    for f in range(n_files):
        for r in W.make_warc_records(f, n_records):
            rows.append((r["target_uri"], r["http_status"],
                         r["content_type"], r["payload"]))
    return sorted(rows)


def test_warc_roundtrip_matches_generator(spark, tmp_path):
    root = W.write_warc_fixture(str(tmp_path / "warc"), n_files=3,
                                n_records=25)
    got = (W.read_warc(spark, root)
           .select("target_uri", "http_status", "content_type", "payload")
           .collect())
    assert sorted(map(tuple, got)) == _expected(3, 25)


def test_warc_type_filter(spark, tmp_path):
    """Default keeps responses only; each fetch also wrote a request record
    and each file a warcinfo record — all present when asked for."""
    root = W.write_warc_fixture(str(tmp_path / "warc"), n_files=2,
                                n_records=10)
    resp = W.read_warc(spark, root)
    allr = W.read_warc(spark, root, types=())
    counts = {r["warc_type"]: r["n"] for r in
              allr.groupBy("warc_type").agg(F.count("*").alias("n"))
              .collect()}
    assert resp.count() == 20
    assert counts == {"warcinfo": 2, "request": 20, "response": 20}
    # request records carry no HTTP status and keep their raw block
    reqs = allr.filter(F.col("warc_type") == "request")
    assert reqs.filter(F.col("http_status").isNotNull()).count() == 0


def test_warc_truncated_tail_drops_cleanly(tmp_path):
    """A torn final record (declared Content-Length past EOF) is dropped
    with every complete record before it intact — a torn transfer must
    not fabricate a short payload."""
    blob = W.make_warc_bytes(0, 5)
    torn = blob[:len(blob) - 30]               # cut into the last record
    whole = W.parse_warc_records(blob)
    cut = W.parse_warc_records(torn)
    assert len(cut) == len(whole) - 1
    assert cut == whole[:-1]


def test_warc_parse_is_pure_and_status_parsed():
    recs = W.parse_warc_records(W.make_warc_bytes(1, 14))
    resp = [r for r in recs if r["warc_type"] == "response"]
    want = W.make_warc_records(1, 14)
    assert [r["http_status"] for r in resp] == \
        [w["http_status"] for w in want]
    assert [r["n_bytes"] for r in resp] == \
        [len(w["payload"].encode()) for w in want]


def test_warc_plan_no_shuffle(spark, tmp_path):
    """Ingest is scan -> mapInPandas: no Exchange anywhere (files are the
    parallelism unit; a 100k-file crawl spreads by input split)."""
    root = W.write_warc_fixture(str(tmp_path / "warc"), n_files=2,
                                n_records=5)
    plan = W.read_warc(spark, root)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_warc_negative_content_length_terminates():
    """Hostile/corrupt record with a negative Content-Length must stop the
    parse (previously the cursor moved backwards and the parser looped
    forever on the same record); everything before it still parses."""
    good = W.make_warc_bytes(0, 3)
    bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"Content-Length: -58\r\n\r\nxx\r\n\r\n")
    recs = W.parse_warc_records(good + bad + W.make_warc_bytes(1, 3))
    assert recs == W.parse_warc_records(good)   # stop AT the bad record


def test_warc_fixture_rewrites_stale_same_size_file(tmp_path):
    """write_warc_fixture must compare CONTENT, not size: a stale file of
    coincidentally equal length is replaced, not silently reused."""
    root = str(tmp_path / "warc")
    W.write_warc_fixture(root, n_files=1, n_records=3)
    import os
    p = os.path.join(root, "crawl-000.warc")
    data = open(p, "rb").read()
    open(p, "wb").write(b"X" * len(data))       # stale, same size
    W.write_warc_fixture(root, n_files=1, n_records=3)
    assert open(p, "rb").read() == data


def _expected_docs(n_files, n_records, min_chars=1):
    return sorted(
        (d["doc_id"], d["text"], d["lang"], d["source"], d["n_chars"])
        for f in range(n_files)
        for d in W.make_expected_docs(f, n_records, min_chars=min_chars))


def test_warc_to_docs_matches_python_twin(spark, tmp_path):
    """The crawl->documents bridge: 200-status text/* responses only,
    markup stripped, md5-derived stable doc_id, URI host as source —
    against an independent python twin of the whole projection."""
    root = W.write_warc_fixture(str(tmp_path / "warc"), n_files=2,
                                n_records=21)
    got = sorted(tuple(r) for r in
                 W.warc_to_docs(W.read_warc(spark, root)).collect())
    want = _expected_docs(2, 21)
    assert got == want
    # the filter really dropped rows: 404s (i%7==0) and json (i%5==0)
    assert 0 < len(want) < 2 * 21
    # min_chars is live on both sides: a cutoff above the shortest doc
    # drops rows identically in the operator and the twin
    cut = min(r[4] for r in want) + 1
    got_cut = sorted(tuple(r) for r in W.warc_to_docs(
        W.read_warc(spark, root), min_chars=cut).collect())
    want_cut = _expected_docs(2, 21, min_chars=cut)
    assert got_cut == want_cut and 0 < len(want_cut) < len(want)


def test_crawl_to_training_shards_end_to_end(spark, tmp_path):
    """The full story: WARC archives -> warc_to_docs -> the one-call
    curation pipeline -> budget-packed training shards, resumable. The
    fixture's bodies are unique per record, so dedup keeps them all and
    the shard stage sees the whole surviving cohort."""
    from geospatialtools_spark.pipeline import (CurationConfig,
                                                run_curation_pipeline)
    root = W.write_warc_fixture(str(tmp_path / "warc"), n_files=3,
                                n_records=25)
    docs = W.warc_to_docs(W.read_warc(spark, root))
    cfg = CurationConfig(quality_min=0.0, shard_budget=2000,
                         splits={"train": 1.0})
    out = run_curation_pipeline(spark, docs, cfg,
                                str(tmp_path / "cur"))
    n_in = docs.count()
    shard = out["shard"].toPandas()
    # bodies are templated ("... content for record i of file f"), so
    # MinHash legitimately collapses a few near-identical pages — the
    # shard cohort must equal the pipeline's own surviving split exactly,
    # and most of the crawl must make it through
    assert len(shard) == out["split"].count()
    assert 0.8 * n_in <= len(shard) < n_in + 1
    assert shard["shard"].nunique() > 1         # actually packed
    # resume recomputes nothing
    out2 = run_curation_pipeline(spark, docs, cfg, str(tmp_path / "cur"))
    assert all(m.get("resumed") for m in out2["_metrics"])


def test_warc_gz_member_per_record_parity(spark, tmp_path):
    """.warc.gz in the Common Crawl layout (one gzip member per record)
    parses to EXACTLY the rows of the plain archive — same records, same
    payloads — through the same distributed reader; mixed directories of
    .warc and .warc.gz read together."""
    import os
    root = str(tmp_path / "warc")
    os.makedirs(root)
    with open(os.path.join(root, "a.warc"), "wb") as fh:
        fh.write(W.make_warc_bytes(0, 12))
    with open(os.path.join(root, "b.warc.gz"), "wb") as fh:
        fh.write(W.make_warc_gz_bytes(1, 12))
    got = (W.read_warc(spark, root)
           .select("target_uri", "http_status", "content_type", "payload")
           .collect())
    assert sorted(map(tuple, got)) == _expected(2, 12)
    # byte-identity of the two encodings after the reader
    plain = W.parse_warc_records(W.make_warc_bytes(1, 12))
    import gzip
    unzipped = W.parse_warc_records(gzip.decompress(W.make_warc_gz_bytes(1, 12)))
    assert plain == unzipped


def test_warc_gz_torn_member_salvages(spark, tmp_path):
    """A .warc.gz truncated mid-member (interrupted transfer) must salvage
    every complete member and drop the torn one — previously
    gzip.decompress raised EOFError and the whole ingest job died on the
    exact damage the plain parser already survives. Trailing garbage
    likewise drops cleanly."""
    import os
    root = str(tmp_path / "warc")
    os.makedirs(root)
    gz = W.make_warc_gz_bytes(0, 10)
    with open(os.path.join(root, "torn.warc.gz"), "wb") as fh:
        fh.write(gz[:len(gz) - 40])               # cut into the last member
    got = W.read_warc(spark, root, types=()).count()
    whole = len(W.parse_warc_records(W.make_warc_bytes(0, 10)))
    assert got == whole - 1                       # only the torn one lost

    with open(os.path.join(root, "garbage.warc.gz"), "wb") as fh:
        fh.write(W.make_warc_gz_bytes(1, 3) + b"NOT GZIP AT ALL")
    got2 = (W.read_warc(spark, root, types=())
            .filter(F.col("src_file").contains("garbage")).count())
    assert got2 == len(W.parse_warc_records(W.make_warc_bytes(1, 3)))


def test_warc_gz_single_stream_torn_salvages(tmp_path, spark):
    """A plain `gzip crawl.warc` (ONE stream, not member-per-record) with a
    torn tail must salvage every complete record: the partial inflated
    bytes are kept and the parser drops only the incomplete record —
    previously the whole archive silently yielded zero rows."""
    import gzip
    import os
    root = str(tmp_path / "warc")
    os.makedirs(root)
    stream = gzip.compress(W.make_warc_bytes(0, 10), mtime=0)
    with open(os.path.join(root, "single.warc.gz"), "wb") as fh:
        fh.write(stream[:len(stream) - 25])       # torn single-stream tail
    got = W.read_warc(spark, root, types=()).count()
    whole = len(W.parse_warc_records(W.make_warc_bytes(0, 10)))
    assert whole - 3 <= got < whole               # most records salvaged
    assert got > 0


def test_read_warc_stream_matches_batch(spark, tmp_path):
    """The crawl-as-a-stream face: read_warc_stream over a directory of
    archives (availableNow catch-up) produces exactly the batch
    read_warc rows, and the chain through warc_to_docs stays
    streaming-legal (pure projection — no state store)."""
    from geospatialtools_spark.sources import warc as W
    from geospatialtools_spark.streaming.ingest import run_available_now
    import gzip
    d = tmp_path / "crawl"
    d.mkdir()
    for f in range(3):
        (d / f"crawl-{f:02d}.warc").write_bytes(W.make_warc_bytes(f, 20))
    # one gz archive too: the stream face must take the same gz branch
    for blob_no, blobs in [(3, W.make_warc_record_blobs(3, 20))]:
        (d / f"crawl-{blob_no:02d}.warc.gz").write_bytes(
            b"".join(gzip.compress(b) for b in blobs))
    batch = W.read_warc(spark, str(d))
    want = {tuple(r) for r in batch.collect()}
    stream = W.read_warc_stream(spark, str(d))
    assert stream.isStreaming
    out1 = str(tmp_path / "out1")
    run_available_now(stream, str(tmp_path / "ck"), out1)
    got = {tuple(r) for r in spark.read.parquet(out1).collect()}
    assert got == want and len(got) == 80
    # COUNT equality too: a re-parse/duplicate-emission regression would
    # survive the set comparison (sets dedup)
    assert spark.read.parquet(out1).count() == batch.count() == 80
    # the docs bridge composes on the stream (still streaming-legal)
    docs = W.warc_to_docs(W.read_warc_stream(spark, str(d)),
                          extractor="blocks")
    assert docs.isStreaming
    out2 = str(tmp_path / "out2")
    run_available_now(docs, str(tmp_path / "ck2"), out2)
    bdocs = W.warc_to_docs(batch, extractor="blocks")
    want_docs = {tuple(r) for r in bdocs.collect()}
    assert {tuple(r) for r in spark.read.parquet(out2).collect()} \
        == want_docs
    assert spark.read.parquet(out2).count() == bdocs.count() > 0
