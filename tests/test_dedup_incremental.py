"""Incremental dedup (functions/dedup.py MinhashIndex) — the daily-ingest
operation: new batches dedup against indexed history without ever
re-signaturing it, with pair semantics equal by construction to a full
re-run minus the old-old pairs."""

from pyspark.sql import functions as F

from geospatialtools_spark.functions import dedup as DD

SF = "/root/testdata/sf0.001"


def _split(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    return d.filter(F.col("doc_id") % 5 != 0), d.filter(F.col("doc_id") % 5 == 0), d


def _pairset(df):
    return set(map(tuple, df.toPandas()[["id_a", "id_b"]].to_numpy()))


def test_incremental_pairs_match_full_run(spark):
    """incremental(old-index, new) == full(old UNION new) minus old-old —
    the semantics the operator sells, on the real documents table."""
    old, new, full_docs = _split(spark)
    full = _pairset(DD.minhash_lsh_pairs(full_docs))
    want = {(a, b) for a, b in full if a % 5 == 0 or b % 5 == 0}
    assert want and want != full          # both sides non-trivial

    idx = DD.build_minhash_index(old)
    pairs, _nb = DD.incremental_dup_pairs(idx, new)
    assert _pairset(pairs) == want


def test_incremental_extend_chain(spark):
    """Three-batch ingest: full(b1) + inc(idx1, b2) + inc(extend, b3)
    covers EXACTLY the full-run pair set — extend_minhash_index makes
    batch 3 see batch 2's docs."""
    d = spark.read.parquet(f"{SF}/documents.parquet")
    b = [d.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    full = _pairset(DD.minhash_lsh_pairs(d))

    got = _pairset(DD.minhash_lsh_pairs(b[0]))
    idx = DD.build_minhash_index(b[0])
    p2, nb2 = DD.incremental_dup_pairs(idx, b[1])
    got |= _pairset(p2)
    idx = DD.extend_minhash_index(idx, nb2)
    p3, _ = DD.incremental_dup_pairs(idx, b[2])
    got |= _pairset(p3)
    assert got == full


def test_incremental_star_guard_linear_pairs_same_groups(spark):
    """Clique guard across the increment boundary: a boilerplate family
    spanning 40 indexed + 20 new docs emits O(B_old + B_new) hub-star
    pairs (hub = min NEW id) instead of B_old*B_new + B_new^2/2, and
    group resolution still sees ONE 60-member component (old members
    connect through the new hub)."""
    boiler = "terms of service apply to all users of this site"
    old = spark.createDataFrame([(i, boiler) for i in range(40)]
                                + [(100, "unrelated content about engines")],
                                "doc_id long, text string")
    new = spark.createDataFrame([(1000 + i, boiler) for i in range(20)],
                                "doc_id long, text string")
    idx = DD.build_minhash_index(old)
    pairs, _ = DD.incremental_dup_pairs(idx, new, star_threshold=10)
    pdf = pairs.toPandas()
    # 19 new->hub + 40 old->hub = 59 rows; unguarded join emits 990
    assert len(pdf) == 59
    assert set(pdf["id_a"]) | set(pdf["id_b"]) == set(range(40)) | set(
        range(1000, 1020))
    groups = DD.dedup_groups(old.unionByName(new), pairs).toPandas()
    assert len(groups) == 60 and set(groups["group_size"]) == {60}

    # unguarded equivalence of components on the same inputs
    pairs_u, _ = DD.incremental_dup_pairs(idx, new)
    assert len(pairs_u.toPandas()) == 40 * 20 + 19 * 20 / 2
    gu = DD.dedup_groups(old.unionByName(new), pairs_u).toPandas()
    assert len(gu) == 60 and set(gu["group_size"]) == {60}
    assert set(gu["keeper_id"]) == set(groups["keeper_id"])


def test_incremental_persist_load_roundtrip(spark, tmp_path):
    old, new, _ = _split(spark)
    idx = DD.build_minhash_index(old)
    DD.persist_minhash_index(idx, str(tmp_path / "mh"))
    loaded = DD.load_minhash_index(spark, str(tmp_path / "mh"))
    assert (loaded.k, loaded.n_hashes, loaded.bands) == \
        (idx.k, idx.n_hashes, idx.bands)
    a, _ = DD.incremental_dup_pairs(idx, new)
    b, _ = DD.incremental_dup_pairs(loaded, new)
    assert _pairset(a) == _pairset(b)


def test_streaming_incremental_dedup_matches_full_run(spark, tmp_path):
    """The streaming face: micro-batches (file source, maxFilesPerTrigger=1)
    probed against the persisted index via foreachBatch, each batch folded
    in afterwards — the union of all batch pair outputs must equal the
    full-run pair set minus the indexed history's internal pairs,
    REGARDLESS of batch arrival order (every cross-batch pair lands when
    its later endpoint arrives). Then a manual REPLAY of the last batch
    (the Structured Streaming at-least-once window) must leave both the
    pair output and the index counts unchanged."""
    from geospatialtools_spark.streaming.ingest import (
        dedup_batch_handler, incremental_dedup_stream)

    d = spark.read.parquet(f"{SF}/documents.parquet")
    base = d.filter(F.col("doc_id") % 2 == 0)
    streamed = d.filter(F.col("doc_id") % 2 != 0)

    idx_path = str(tmp_path / "mhidx")
    DD.persist_minhash_index(DD.build_minhash_index(base), idx_path)

    src = str(tmp_path / "arriving")
    for i in range(3):
        (streamed.filter(F.col("doc_id") % 3 == i).coalesce(1)
         .write.mode("append").parquet(src))
    stream = (spark.readStream.schema(streamed.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    pairs_dir = str(tmp_path / "pairs")
    incremental_dedup_stream(stream, idx_path, pairs_dir,
                             str(tmp_path / "ck"), star_threshold=None)

    full = _pairset(DD.minhash_lsh_pairs(d))
    base_internal = _pairset(DD.minhash_lsh_pairs(base))
    got = _pairset(spark.read.parquet(pairs_dir + "/batch=*"))
    assert got == full - base_internal

    # replay the last committed batch by hand: outputs and index stable
    import glob
    batches = sorted(int(p.rsplit("=", 1)[1]) for p in
                     glob.glob(pairs_dir + "/batch=*"))
    last = batches[-1]
    last_banded = spark.read.parquet(f"{idx_path}/inc/batch={last}/banded")
    last_ids = [r["_id"] for r in last_banded.select("_id").distinct().collect()]
    replay_df = streamed.filter(F.col("doc_id").isin(last_ids))
    before_counts = DD.load_minhash_index(spark, idx_path) \
        .bucket_counts.agg(F.sum("_oc")).first()[0]
    dedup_batch_handler(idx_path, pairs_dir, star_threshold=None)(
        replay_df, last)
    after_counts = DD.load_minhash_index(spark, idx_path) \
        .bucket_counts.agg(F.sum("_oc")).first()[0]
    assert after_counts == before_counts                 # no double count
    assert _pairset(spark.read.parquet(pairs_dir + "/batch=*")) == got


def test_incremental_guarded_replay_idempotent(spark, tmp_path):
    """The at-least-once crash window WITH the clique guard armed: a
    bucket of 40 indexed + 20 new identical docs sits UNDER threshold 64
    (990 clique pairs). If the batch is already appended (crash between
    index append and checkpoint commit), a naive replay would count the
    batch's own rows into the old side (60+20 > 64) and flip the bucket
    to 59 star rows — exclude_new_from_history (what the streaming
    handler passes) must keep the replay bit-identical instead."""
    boiler = "terms of service apply to all users of this site"
    old = spark.createDataFrame([(i, boiler) for i in range(40)],
                                "doc_id long, text string")
    new = spark.createDataFrame([(1000 + i, boiler) for i in range(20)],
                                "doc_id long, text string")
    idx_path = str(tmp_path / "mh")
    DD.persist_minhash_index(DD.build_minhash_index(old), idx_path)
    idx = DD.load_minhash_index(spark, idx_path)
    first, nb = DD.incremental_dup_pairs(idx, new, star_threshold=64,
                                         exclude_new_from_history=True)
    first = _pairset(first)
    assert len(first) == 40 * 20 + 19 * 20 / 2          # clique, not star

    DD.append_minhash_batch(idx_path, nb, 0)            # the crash window
    replay_idx = DD.load_minhash_index(spark, idx_path)
    replay, _ = DD.incremental_dup_pairs(replay_idx, new, star_threshold=64,
                                         exclude_new_from_history=True)
    assert _pairset(replay) == first
    # and WITHOUT the exclusion the guard would indeed have flipped
    naive, _ = DD.incremental_dup_pairs(replay_idx, new, star_threshold=64)
    assert len(_pairset(naive)) == 59


def test_incremental_persisted_index_partition_pruned_probe(spark, tmp_path):
    """The persisted layout (banded partitioned by band + 64-way bhash
    bucket) must answer identically to the in-memory index AND carry the
    probe's bucket restriction as PartitionFilters on the parquet scan."""
    old, new, _ = _split(spark)
    idx = DD.build_minhash_index(old)
    idx_path = str(tmp_path / "mh")
    DD.persist_minhash_index(idx, idx_path)
    loaded = DD.load_minhash_index(spark, idx_path)
    mem, _ = DD.incremental_dup_pairs(idx, new)
    disk_df, _ = DD.incremental_dup_pairs(loaded, new)
    assert _pairset(disk_df) == _pairset(mem)
    plan = disk_df._jdf.queryExecution().executedPlan().toString()
    scan_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert scan_lines, plan
    assert any("_bkt" in ln and ("INSET" in ln or " IN " in ln or "In(" in ln)
               for ln in scan_lines), "\n".join(scan_lines)


def test_incremental_compaction(spark, tmp_path):
    """compact_minhash_index consolidates base + streaming increments into
    a fresh path whose probes answer identically with no inc/ left."""
    import os
    old, new, _ = _split(spark)
    b1 = new.filter(F.col("doc_id") % 2 == 0)
    b2 = new.filter(F.col("doc_id") % 2 != 0)
    src = str(tmp_path / "src")
    DD.persist_minhash_index(DD.build_minhash_index(old), src)
    idx = DD.load_minhash_index(spark, src)
    _, nb1 = DD.incremental_dup_pairs(idx, b1)
    DD.append_minhash_batch(src, nb1, 0)
    dst = str(tmp_path / "dst")
    DD.compact_minhash_index(spark, src, dst)
    assert not os.path.exists(dst + "/inc")
    a, _ = DD.incremental_dup_pairs(DD.load_minhash_index(spark, src), b2)
    b, _ = DD.incremental_dup_pairs(DD.load_minhash_index(spark, dst), b2)
    assert _pairset(a) == _pairset(b)
    import pytest
    with pytest.raises(ValueError):
        DD.compact_minhash_index(spark, src, src)


def test_extend_rejects_foreign_band_range(spark):
    old, _, _ = _split(spark)
    idx = DD.build_minhash_index(old)
    bad = spark.createDataFrame([(1, idx.bands + 3, "ff")],
                                "_id long, band int, bhash string")
    import pytest
    with pytest.raises(ValueError, match="band"):
        DD.extend_minhash_index(idx, bad)
