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
