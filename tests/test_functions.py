"""Tests for the scalar/aggregate function layer + training-data ops.

Oracles are numpy/scipy/sklearn-free pure-python where possible, the
reference's own golden table for pedotransfer (fixtures.saxton_golden), and
brute-force numpy for similarity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geospatialtools_spark import fixtures
from geospatialtools_spark.functions import dedup as DD
from geospatialtools_spark.functions import metrics as MET
from geospatialtools_spark.functions import pedotransfer as PT
from geospatialtools_spark.functions import similarity as SIM
from geospatialtools_spark.functions import upscaling as UP
from geospatialtools_spark.oracle import terrain as OT


def test_saxton_golden(spark):
    """Engine pedotransfer matches the reference's own commented-out test
    table (pedotransfer.py:118-143) at the reference's tolerances."""
    g = fixtures.saxton_golden()
    pdf = pd.DataFrame({"clay": g["clay"], "sand": g["sand"]})
    df = spark.createDataFrame(pdf)
    # reference's Run_Tests passes (clay, sand) positionally into (S, C)
    S, C, OM = F.col("clay"), F.col("sand"), F.lit(g["om"])
    out = df.select(
        PT.ksat_saxton2006(S, C, OM).alias("ksat"),
        PT.theta_s(S, C, OM).alias("thetas"),
        PT.theta_33(S, C, OM).alias("theta33"),
        PT.theta_1500(S, C, OM).alias("theta1500"),
    ).toPandas()
    assert np.allclose(out["ksat"], g["ksat"], atol=5e-1)
    assert np.allclose(out["thetas"], g["thetas"], atol=1e-2)
    assert np.allclose(out["theta33"], g["theta33"], atol=1e-2)
    assert np.allclose(out["theta1500"], g["theta1500"], atol=1e-2)


def test_fao_texture(spark):
    pdf = pd.DataFrame({
        "sand": [83.0, 17.0, 46.0, None],
        "clay": [9.0, 67.0, 35.0, 10.0],
        "silt": [8.0, 17.0, 19.0, 10.0],
    })
    df = spark.createDataFrame(pdf)
    out = df.select(PT.fao_soil_texture(
        F.col("sand"), F.col("clay"), F.col("silt")).alias("c")).toPandas()
    assert out["c"].tolist()[:3] == [1, 3, 7]
    assert pd.isna(out["c"].iloc[3])


def test_quality_score_null_and_empty_text(spark):
    """NULL text must score NULL (not 0.3 — F.least skips NULLs, the
    round-5 regex rewrite's one semantic hazard) so the curation quality
    gate keeps dropping NULL-text rows; empty text scores its real
    (non-NULL) composite like the DuckDB twin's CASE WHEN form."""
    from geospatialtools_spark.functions import textstats as TX
    pdf = pd.DataFrame({"text": [None, "", "the quick brown fox and the dog"]})
    out = (spark.createDataFrame(pdf)
           .select(TX.quality_score(F.col("text")).alias("q")).toPandas())
    assert pd.isna(out["q"].iloc[0])
    assert not pd.isna(out["q"].iloc[1])
    assert out["q"].iloc[2] > out["q"].iloc[1]


def test_metrics_against_numpy(spark):
    rng = np.random.RandomState(7)
    obs = rng.normal(10, 2, 500)
    model = obs * 1.1 + rng.normal(0, 0.5, 500) - 0.3
    obs[10] = np.nan  # NaN-pair filtering path
    df = spark.createDataFrame(pd.DataFrame({"obs": obs, "model": model}))
    out = MET.summary(df, "obs", "model").toPandas().iloc[0]

    m = ~(np.isnan(obs) | np.isnan(model))
    o, mm = obs[m], model[m]
    rho = np.corrcoef(mm, o)[0, 1]
    beta = mm.mean() / o.mean()
    alpha12 = (mm.std() / o.std()) / beta
    kge12 = 1 - np.sqrt((rho - 1) ** 2 + (beta - 1) ** 2 + (alpha12 - 1) ** 2)
    nse = 1 - np.sum((o - mm) ** 2) / np.sum((o - o.mean()) ** 2)
    rmse = np.sqrt(np.mean((mm - o) ** 2))

    assert abs(out["kge2012_kge"] - kge12) < 1e-9
    assert abs(out["nse"] - nse) < 1e-9
    assert abs(out["nse_nse"] - (2 * (mm.std() / o.std()) * rho
                                 - (mm.std() / o.std()) ** 2
                                 - ((mm.mean() - o.mean()) / o.std()) ** 2)) < 1e-9
    assert abs(out["rmse"] - rmse) < 1e-9
    assert abs(out["r2"] - rho ** 2) < 1e-9
    assert abs(out["mae"] - np.mean(np.abs(mm - o))) < 1e-9


def test_time_average_matches_fortran_oracle(spark):
    series = fixtures.make_series(nt_in=720)
    golden = OT.time_average(series, nt_out=24)
    df = spark.createDataFrame(
        pd.DataFrame({"t": np.arange(720), "value": series}))
    out = (UP.time_average(df, nt_in=720, nt_out=24)
           .orderBy("block").toPandas())
    assert len(out) == 24
    assert np.allclose(out["avg_value"].to_numpy(), golden, rtol=1e-12)


_DOCS = pd.DataFrame({
    "doc_id": [0, 1, 2, 3, 4, 5],
    "text": [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",   # near-dup of 0
        "completely different content about spark engines",
        "the quick brown fox jumps over the lazy dog",   # exact dup of 0
        "der hund und die katze sind nicht ein team",
        "short",
    ],
})


def test_exact_dedup(spark):
    df = spark.createDataFrame(_DOCS)
    out = DD.exact_dups(df).toPandas()
    assert len(out) == 1
    assert out["keeper_id"].iloc[0] == 0 and out["n_dups"].iloc[0] == 2


def test_minhash_lsh_finds_near_dups(spark):
    df = spark.createDataFrame(_DOCS)
    pairs = DD.minhash_lsh_pairs(df).toPandas()
    got = set(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))
    # exact dup pair always collides in every band; near-dup (0,1)/(1,3)
    # shares 6/8 shingles (J=0.75) -> expected to collide in >=1 of 4 bands
    assert (0, 3) in got
    assert (0, 1) in got and (1, 3) in got
    assert (2, 4) not in got


def test_connected_components_chains_and_cycles(spark):
    """Transitive chains (A-B, B-C must merge even though A,C never pair),
    a cycle, and an isolated pair — labels vs a python union-find oracle."""
    from geospatialtools_spark.operators.graph import connected_components
    edges = [(1, 2), (2, 3), (3, 4),            # chain 1-2-3-4
             (10, 11), (11, 12), (12, 10),      # cycle
             (20, 21),                          # isolated pair
             (5, 4)]                            # extends the chain
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {n: find(n) for n in parent}
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["comp"]
           for r in connected_components(df).collect()}
    assert got == expect


def test_dedup_groups_transitive_keeper(spark):
    """Pairs -> groups -> keeper: A~B and B~C collapse to one group with ONE
    keeper (the longest text, ties to smallest id); singletons never appear."""
    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "aaaaaaaa"), (3, "aa"), (4, "zz"),
         (5, "qqqq"), (6, "qqqq"), (7, "solo")],
        "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long")
    out = DD.dedup_groups(docs, pairs).toPandas().set_index("doc_id")
    assert set(out.index) == {1, 2, 3, 5, 6}          # 4,7 untouched
    assert set(out.loc[[1, 2, 3], "group_id"]) == {1}  # min id of component
    assert set(out.loc[[1, 2, 3], "keeper_id"]) == {2}  # longest text wins
    assert set(out.loc[[1, 2, 3], "group_size"]) == {3}
    assert set(out.loc[[5, 6], "keeper_id"]) == {5}     # tie -> smallest id
    # applying the dedup: anti-join non-keepers removes exactly 3 docs
    drop = out[out["keeper_id"] != out.index].index
    assert set(drop) == {1, 3, 6}


def test_minhash_star_threshold_same_groups_linear_pairs(spark):
    """The clique guard: a 60-member boilerplate family must emit O(B) star
    pairs instead of B(B-1)/2 clique pairs, while dedup_groups resolves the
    IDENTICAL components (stars and cliques share connectivity); normal
    sub-threshold near-dups are byte-identical to the default path."""
    fam = [(i, "terms of service apply to all users of this site") for i in range(60)]
    normal = [(100, "the quick brown fox jumps over the lazy dog"),
              (101, "the quick brown fox jumps over the lazy cat"),
              (200, "completely unrelated content about spark engines")]
    df = spark.createDataFrame(fam + normal, "doc_id long, text string")
    clique = DD.minhash_lsh_pairs(df).toPandas()
    starred = DD.minhash_lsh_pairs(df, star_threshold=10).toPandas()
    # family: 59 star pairs (hub=0) instead of 1770 clique pairs
    assert len(starred[starred.id_b < 100]) == 59
    assert (starred[starred.id_b < 100].id_a == 0).all()
    assert len(clique[clique.id_b < 100]) == 60 * 59 / 2
    # the sub-threshold pair is untouched
    assert (100, 101) in set(map(tuple, starred[["id_a", "id_b"]].to_numpy()))
    # identical transitive groups either way
    for pairs in (clique, starred):
        g = DD.dedup_groups(df, spark.createDataFrame(pairs)).toPandas()
        fam_g = g[g.doc_id < 100]
        assert len(fam_g) == 60 and set(fam_g.group_id) == {0} \
            and set(fam_g.group_size) == {60}
        assert set(g[g.doc_id >= 100].doc_id) == {100, 101}


def test_dedup_groups_plan_no_cartesian(spark):
    """The group-resolution plan must stay bucketed: no CartesianProduct
    anywhere (pairs meet through equi-joins only), and the keeper window is
    PARTITIONED by group (never a single-partition global window)."""
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(20)], "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "id_a long, id_b long")
    plan = DD.dedup_groups(docs, pairs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ngram_jaccard_exact(spark):
    df = spark.createDataFrame(_DOCS)
    out = DD.ngram_jaccard_pairs(df, threshold=0.5).toPandas()
    rows = {(a, b): j for a, b, j in out.to_numpy()}
    assert rows[(0, 3)] == 1.0
    # docs 0/1: 9 tokens -> 7 shingles each, 6 shared -> J = 6/8
    assert abs(rows[(0, 1)] - 0.75) < 1e-9
    assert (2, 4) not in rows


def test_ngram_capped_keeps_boilerplate_dups(spark):
    """ADVICE r2: with max_df=1 every shared shingle is over the cap, yet
    identical boilerplate docs must still pair via the lowest-df-shingle
    fallback, and reported jaccard stays exact."""
    rows = [(i, "terms of service apply to all users here") for i in range(4)]
    rows += [(10, "completely unrelated text about spark physical plans")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = DD.ngram_jaccard_pairs(df, threshold=0.5, max_df=1).toPandas()
    pairs = {(a, b): j for a, b, j in out.to_numpy()}
    for a in range(4):
        for b in range(a + 1, 4):
            assert pairs[(a, b)] == 1.0, (a, b)
    assert all(10 not in p for p in pairs)


def test_simhash_pairs_exact_recall_vs_brute(spark):
    """Pigeonhole banding has EXACT recall: simhash_pairs must equal the
    brute all-pairs hamming filter on a corpus with near and far docs."""
    rows = [(i, f"shared boilerplate text block number {i % 4} with tail {i}")
            for i in range(30)]
    rows += [(100, "the quick brown fox jumps over the lazy dog"),
             (101, "the quick brown fox jumps over the lazy dog"),
             (102, "the quick brown fox jumps over a lazy dog")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = DD.simhash_pairs(df, bits=16, max_hamming=3).toPandas()
    fp = df.select("doc_id", DD.simhash_pudf(16)(F.col("text")).alias("f")).toPandas()
    fps = dict(zip(fp.doc_id, fp.f))
    ids = sorted(fps)
    brute = {(a, b, bin(fps[a] ^ fps[b]).count("1"))
             for i, a in enumerate(ids) for b in ids[i + 1:]
             if bin(fps[a] ^ fps[b]).count("1") <= 3}
    assert set(map(tuple, got.to_numpy())) == brute
    assert (100, 101, 0) in brute            # identical text -> hamming 0


def test_simhash_star_threshold_same_groups_linear_pairs(spark):
    """The simhash clique guard (round 5): a 60-member identical-boilerplate
    family has identical fingerprints, so it fills ONE bucket of ALL
    max_hamming+1 bands — the clique join form is (t+1)*B(B-1)/2 rows. With
    star_threshold it must emit O(B) hub-star pairs (hamming exact at
    emission), resolve the IDENTICAL dedup_groups components, and leave
    sub-threshold near-dups byte-identical to the default path."""
    fam = [(i, "terms of service apply to all users of this site")
           for i in range(60)]
    normal = [(100, "the quick brown fox jumps over the lazy dog"),
              (101, "the quick brown fox jumps over a lazy dog"),
              (200, "completely unrelated content about spark engines")]
    df = spark.createDataFrame(fam + normal, "doc_id long, text string")
    clique = DD.simhash_pairs(df, bits=16, max_hamming=3).toPandas()
    starred = DD.simhash_pairs(df, bits=16, max_hamming=3,
                               star_threshold=10).toPandas()
    # family: 59 star pairs (hub=0, hamming 0) instead of 1770 clique pairs
    fam_star = starred[starred.id_b < 100]
    assert len(fam_star) == 59
    assert (fam_star.id_a == 0).all() and (fam_star.hamming == 0).all()
    assert len(clique[clique.id_b < 100]) == 60 * 59 / 2
    # sub-threshold pairs are byte-identical to the unguarded plan
    sub = lambda p: set(map(tuple, p[p.id_a >= 100].to_numpy()))
    assert sub(starred) == sub(clique)
    # identical transitive groups either way
    for pairs in (clique, starred):
        g = DD.dedup_groups(
            df, spark.createDataFrame(pairs[["id_a", "id_b"]])).toPandas()
        fam_g = g[g.doc_id < 100]
        assert len(fam_g) == 60 and set(fam_g.group_id) == {0} \
            and set(fam_g.group_size) == {60}


def test_simhash_near_dups_close(spark):
    df = spark.createDataFrame(_DOCS)
    out = df.select("doc_id", DD.simhash(F.col("text")).alias("sh")).toPandas()
    sh = dict(zip(out["doc_id"], out["sh"]))
    assert sh[0] == sh[3]  # identical text -> identical fingerprint
    ham_near = bin(sh[0] ^ sh[1]).count("1")
    ham_far = bin(sh[0] ^ sh[2]).count("1")
    assert ham_near < ham_far


def test_simhash_pudf_bit_parity(spark):
    """The Arrow hot path must emit the exact fingerprints of the Catalyst
    expression (the cross-engine oracle twin) — incl. empty/punct-only text
    (normalize -> '' -> the empty token is hashed, not skipped) and repeated
    tokens (non-distinct votes)."""
    rows = (list(zip(_DOCS["doc_id"].tolist(), _DOCS["text"].tolist()))
            + [(90, ""), (91, "!!! ???"), (92, "dup dup dup dup one"),
               (93, "Tab\tand\nnewline  spaced"), (94, None)])
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = df.select(
        DD.simhash(F.col("text")).alias("expr"),
        DD.simhash_pudf(16)(F.col("text")).alias("pudf")).toPandas()
    assert (out["expr"] == out["pudf"]).all()


def test_cosine_topk_vs_numpy(spark):
    rng = np.random.RandomState(11)
    vecs = rng.normal(size=(60, 8)).astype(np.float32)
    corpus = spark.createDataFrame(pd.DataFrame({
        "vec_id": np.arange(60), "embedding": [v.tolist() for v in vecs]}))
    queries = spark.createDataFrame(pd.DataFrame({
        "query_id": [0, 1], "q_vec": [vecs[0].tolist(), vecs[1].tolist()]}))
    out = SIM.cosine_topk(corpus, queries, k=3).toPandas()

    vd = vecs.astype(np.float64)
    sims = vd @ vd.T / (np.linalg.norm(vd, axis=1)[:, None] * np.linalg.norm(vd, axis=1)[None, :])
    for q in (0, 1):
        expect = np.argsort(-np.round(sims[q], 6), kind="stable")[:3]
        got = out[out["query_id"] == q].sort_values("rank")["vec_id"].to_numpy()
        assert list(got) == list(expect)
        assert got[0] == q  # self is always the top hit


def test_bucketed_topk_self_hit(spark):
    rng = np.random.RandomState(12)
    vecs = rng.normal(size=(100, 8)).astype(np.float32)
    corpus = spark.createDataFrame(pd.DataFrame({
        "vec_id": np.arange(100), "embedding": [v.tolist() for v in vecs]}))
    queries = spark.createDataFrame(pd.DataFrame({
        "query_id": [5], "q_vec": [vecs[5].tolist()]}))
    out = SIM.bucketed_topk(corpus, queries, dim=8, k=3, n_planes=4).toPandas()
    assert out.sort_values("rank")["vec_id"].iloc[0] == 5


def test_lsh_bucket_stability(spark):
    """Bucket ids are pure functions of the vector (deterministic planes)."""
    rng = np.random.RandomState(13)
    vecs = [rng.normal(size=8).astype(np.float32).tolist() for _ in range(20)]
    df = spark.createDataFrame(pd.DataFrame({"embedding": vecs}))
    a = df.select(SIM.lsh_buckets(F.col("embedding"), 8, 6).alias("b")).toPandas()
    b = df.select(SIM.lsh_buckets(F.col("embedding"), 8, 6).alias("b")).toPandas()
    assert (a["b"] == b["b"]).all()
    assert a["b"].between(0, 63).all()


def test_ivf_topk_recall(spark):
    """IVF with nprobe=all centroids == brute force; small nprobe keeps the
    self-hit and high overlap."""
    rng = np.random.RandomState(21)
    vecs = rng.normal(size=(200, 8)).astype(np.float32)
    corpus = spark.createDataFrame(pd.DataFrame({
        "vec_id": np.arange(200), "embedding": [v.tolist() for v in vecs]}))
    queries = spark.createDataFrame(pd.DataFrame({
        "query_id": [3, 7], "q_vec": [vecs[3].tolist(), vecs[7].tolist()]}))
    brute = SIM.cosine_topk(corpus, queries, k=5).toPandas()
    exact_ivf = SIM.ivf_topk(corpus, queries, dim=8, k=5,
                             n_centroids=4, nprobe=4).toPandas()
    a = brute.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = exact_ivf.sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    approx = SIM.ivf_topk(corpus, queries, dim=8, k=5,
                          n_centroids=8, nprobe=2).toPandas()
    for q in (3, 7):
        got = set(approx[approx["query_id"] == q]["vec_id"])
        want = set(brute[brute["query_id"] == q]["vec_id"])
        assert q in got               # self-hit always found
        assert len(got & want) >= 3   # decent recall at nprobe=2/8


def test_ivf_build_probe_split(spark):
    """The round-5 index split: build once, probe many. Probing a built
    index must equal the one-shot ivf_topk; a second probe with new queries
    pays NO build action (corpus.count is never called when the caller
    supplies n_corpus, and the assigned table is already materialized)."""
    rng = np.random.RandomState(22)
    vecs = rng.normal(size=(200, 8)).astype(np.float32)
    corpus = spark.createDataFrame(pd.DataFrame({
        "vec_id": np.arange(200), "embedding": [v.tolist() for v in vecs]}))

    def q_df(ids):
        return spark.createDataFrame(pd.DataFrame({
            "query_id": ids, "q_vec": [vecs[i].tolist() for i in ids]}))

    one_shot = SIM.ivf_topk(corpus, q_df([3, 7]), dim=8, k=5,
                            n_centroids=4, nprobe=4).toPandas()
    # n_corpus supplied -> the build must not count the corpus itself
    corpus.count = lambda: (_ for _ in ()).throw(
        AssertionError("build_ivf_index must not count when n_corpus given"))
    index = SIM.build_ivf_index(corpus, dim=8, n_centroids=4, n_corpus=200)
    split = SIM.ivf_probe(index, q_df([3, 7]), k=5, nprobe=4).toPandas()
    a = one_shot.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = split.sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # second query batch reuses the SAME index (different nprobe is a
    # probe-time dial, no retrain/reassign)
    again = SIM.ivf_probe(index, q_df([11]), k=3, nprobe=2).toPandas()
    assert 11 in set(again["vec_id"]) and len(again) == 3


def test_ivf_persisted_index_partition_pruned_probe(spark, tmp_path):
    """The 100 TB index layout made physical: persist_ivf_index writes the
    assignment partitioned by _list; probing the loaded table must (a) give
    the same answers as the in-memory index, and (b) carry the probe-batch
    list restriction as PartitionFilters on the parquet scan — a pruned
    READ of nprobe/n_centroids of the data, not a filtered full scan."""
    rng = np.random.RandomState(23)
    vecs = rng.normal(size=(300, 8)).astype(np.float32)
    corpus = spark.createDataFrame(pd.DataFrame({
        "vec_id": np.arange(300), "embedding": [v.tolist() for v in vecs]}))
    queries = spark.createDataFrame(pd.DataFrame({
        "query_id": [5, 42], "q_vec": [vecs[5].tolist(), vecs[42].tolist()]}))

    index = SIM.build_ivf_index(corpus, dim=8, n_centroids=8, n_corpus=300)
    path = str(tmp_path / "ivf")
    SIM.persist_ivf_index(index, path)
    loaded = SIM.load_ivf_index(spark, path)
    assert loaded.id_col == "vec_id" and loaded.vec_col == "embedding"
    np.testing.assert_allclose(loaded.centroids, index.centroids)

    mem = SIM.ivf_probe(index, queries, k=5, nprobe=3).toPandas()
    disk_df = SIM.ivf_probe(loaded, queries, k=5, nprobe=3)
    disk = disk_df.toPandas()
    a = mem.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = disk.sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    # the parquet scan node must show a non-trivial partition filter on
    # _list (INSET/IN of the probed lists), i.e. unprobed lists' files are
    # pruned before read
    plan = disk_df._jdf.queryExecution().executedPlan().toString()
    scan_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert scan_lines, plan
    assert any("_list" in ln and ("INSET" in ln or " IN " in ln or "In(" in ln)
               for ln in scan_lines), "\n".join(scan_lines)


def test_embedding_dups_bucketed_matches_brute(spark):
    """VERDICT r1: the embedding near-dup query must use the bucketed path —
    same output as the brute self-join, and no cartesian product in the
    physical plan."""
    rng = np.random.RandomState(11)
    vecs = rng.normal(size=(120, 16)).astype(np.float32)
    vecs[100:] = vecs[:20] * 1.7           # exact-direction clones (cos=1)
    vecs[90:95] = vecs[20:25] + rng.normal(scale=1e-3, size=(5, 16)).astype(np.float32)
    emb = spark.createDataFrame(pd.DataFrame({
        "vec_id": np.arange(120), "embedding": [v.tolist() for v in vecs]}))
    brute = DD.embedding_dup_pairs(emb, threshold=0.99).toPandas()
    fast = DD.embedding_dup_pairs_bucketed(emb, dim=16, threshold=0.99,
                                           probe_radius=2)
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    a = brute.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    b = fast.toPandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_embedding_star_threshold_same_groups(spark):
    """Embedding clique guard: a 50-member identical-vector family emits 49
    hub-star pairs (exact cosine 1.0) instead of 1225, with identical
    dedup_groups components; sub-threshold buckets keep clique emission."""
    rng = np.random.RandomState(3)
    vecs = rng.normal(size=(60, 16)).astype(np.float32)
    vecs[:50] = vecs[0]                      # one exact-dup family
    vecs[55] = vecs[54] * 2.0                # a normal pair (cos=1)
    emb = spark.createDataFrame(pd.DataFrame({
        "vec_id": np.arange(60), "embedding": [v.tolist() for v in vecs]}))
    starred = DD.embedding_dup_pairs_bucketed(
        emb, dim=16, threshold=0.99, star_threshold=10).toPandas()
    fam = starred[starred.id_b < 50]
    assert len(fam) == 49 and (fam.id_a == 0).all() and (fam.cosine == 1.0).all()
    assert (54, 55) in set(map(tuple, starred[["id_a", "id_b"]].to_numpy()))
    docs_like = spark.createDataFrame(
        [(int(i), "x" * int(i + 1)) for i in range(60)], "doc_id long, text string")
    g = DD.dedup_groups(docs_like,
                        spark.createDataFrame(starred[["id_a", "id_b"]]),
                        ).toPandas()
    fam_g = g[g.doc_id < 50]
    assert len(fam_g) == 50 and set(fam_g.group_size) == {50} \
        and set(fam_g.keeper_id) == {49}     # longest text keeper


def _semantic_ref(vecs, eps):
    """Union-find reference for semantic_dedup's n_clusters=1 regime:
    brute cosine pairs >= eps -> components -> min-id keeper."""
    import itertools
    n = len(vecs)
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, j in itertools.combinations(range(n), 2):
        c = float(np.dot(vecs[i], vecs[j])
                  / (np.linalg.norm(vecs[i]) * np.linalg.norm(vecs[j])))
        if round(c, 6) >= eps:
            ri, rj = find(i), find(j)
            if ri != rj:
                parent[max(ri, rj)] = min(ri, rj)
    from collections import defaultdict
    groups = defaultdict(list)
    for i in range(n):
        groups[find(i)].append(i)
    return {min(g): sorted(g) for g in groups.values() if len(g) > 1}


def _semantic_groups(out_pdf):
    from collections import defaultdict
    g = defaultdict(list)
    for r in out_pdf.itertuples(index=False):
        g[int(r.group_id)].append(int(r.vec_id))
    return {k: sorted(v) for k, v in g.items()}


def test_semantic_dedup_single_cluster_matches_reference(spark):
    """n_clusters=1 is the exact corpus-wide regime (also the gate
    oracle's): groups and keepers must equal the brute union-find
    reference, including transitive chains."""
    rng = np.random.RandomState(5)
    vecs = rng.normal(size=(70, 12)).astype(np.float64)
    vecs[60:65] = vecs[0] * 1.3                    # exact-direction family
    vecs[65] = vecs[1] + 1e-4 * rng.normal(size=12)  # near pair
    # transitive chain: 66~67 and 67~68 close, 66 vs 68 slightly farther
    base = rng.normal(size=12)
    vecs[66] = base
    vecs[67] = base + 3e-3 * rng.normal(size=12)
    vecs[68] = vecs[67] + 3e-3 * rng.normal(size=12)
    emb = spark.createDataFrame(pd.DataFrame({
        "vec_id": np.arange(70), "embedding": [v.tolist() for v in vecs]}))
    out = DD.semantic_dedup(emb, dim=12, eps=0.999, n_clusters=1).toPandas()
    ref = _semantic_ref(vecs, 0.999)
    assert _semantic_groups(out) == ref
    assert (out["keeper_id"] == out["group_id"]).all()
    sizes = out.groupby("group_id")["group_size"].first()
    assert all(sizes[k] == len(v) for k, v in ref.items())


def test_semantic_dedup_clustered_finds_planted_blob_dups(spark):
    """With k=2 clusters on two well-separated blobs, every planted
    within-blob dup family resolves; the output's cluster column is the
    quantizer's assignment (family members share it)."""
    rng = np.random.RandomState(9)
    a = rng.normal(loc=+8.0, scale=0.5, size=(40, 8))
    b = rng.normal(loc=-8.0, scale=0.5, size=(40, 8))
    a[30:35] = a[0]                              # family in blob A
    b[30:40] = b[2]                              # family in blob B
    vecs = np.vstack([a, b])
    emb = spark.createDataFrame(pd.DataFrame({
        "vec_id": np.arange(80), "embedding": [v.tolist() for v in vecs]}))
    out = DD.semantic_dedup(emb, dim=8, eps=0.9999, n_clusters=2,
                            train_sample=80).toPandas()
    groups = _semantic_groups(out)
    assert groups[0] == [0, 30, 31, 32, 33, 34]
    assert groups[42] == [42, 70, 71, 72, 73, 74, 75, 76, 77, 78, 79]
    for gid, members in groups.items():
        rows = out[out.group_id == gid]
        assert rows["cluster"].nunique() == 1


def test_semantic_dedup_star_guard_same_groups(spark):
    """Oversized-cluster guard: a 50-member identical family under
    star_threshold=10 yields the SAME groups and keepers as the exact
    clique run (hub-star pairs are cosine-verified against the min-id
    hub, which an exact-dup family always passes)."""
    rng = np.random.RandomState(13)
    vecs = rng.normal(size=(60, 10)).astype(np.float64)
    vecs[:50] = vecs[0]
    emb = spark.createDataFrame(pd.DataFrame({
        "vec_id": np.arange(60), "embedding": [v.tolist() for v in vecs]}))
    exact = DD.semantic_dedup(emb, dim=10, eps=0.999, n_clusters=1)
    guarded = DD.semantic_dedup(emb, dim=10, eps=0.999, n_clusters=1,
                                star_threshold=10)
    assert _semantic_groups(exact.toPandas()) == \
        _semantic_groups(guarded.toPandas())


def test_semantic_dedup_arrow_pairs_bit_parity(spark):
    """GEMM pair kernel == expression cosine join (groups identical on
    random + planted data away from the 1e-6 rounding boundary), across
    both the single-cluster and clustered regimes."""
    rng = np.random.RandomState(21)
    vecs = rng.normal(size=(90, 12)).astype(np.float64)
    vecs[80:85] = vecs[3] * 0.7
    vecs[85] = vecs[4] + 1e-4 * rng.normal(size=12)
    emb = spark.createDataFrame(pd.DataFrame({
        "vec_id": np.arange(90), "embedding": [v.tolist() for v in vecs]}))
    for k in (1, 3):
        expr = DD.semantic_dedup(emb, dim=12, eps=0.999, n_clusters=k)
        fast = DD.semantic_dedup(emb, dim=12, eps=0.999, n_clusters=k,
                                 arrow_pairs=True)
        assert _semantic_groups(expr.toPandas()) == \
            _semantic_groups(fast.toPandas())


def test_semantic_dedup_rejects_bad_eps(spark):
    emb = spark.createDataFrame(pd.DataFrame({
        "vec_id": [0], "embedding": [[1.0, 0.0]]}))
    with pytest.raises(ValueError):
        DD.semantic_dedup(emb, dim=2, eps=0.0)


def test_ngram_jaccard_max_df_cap(spark):
    """DF-capped candidate generation still reports exact jaccard values and
    keeps pairs that share any below-cap shingle."""
    df = spark.createDataFrame(_DOCS)
    full = DD.ngram_jaccard_pairs(df, threshold=0.5).toPandas()
    capped = DD.ngram_jaccard_pairs(df, threshold=0.5, max_df=3).toPandas()
    a = full.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    b = capped.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_gradstime_roundtrip(spark):
    """gradstime2datetime is the exact inverse of datetime2gradstime on
    hour-resolution timestamps (grads_tools.py:23-35 pair)."""
    import datetime

    from geospatialtools_spark.functions import upscaling as UP
    stamps = [datetime.datetime(2003, 2, 28, h) for h in (0, 6, 12, 23)] + \
             [datetime.datetime(2000, 12, 1, 18)]
    df = spark.createDataFrame(pd.DataFrame({"ts": stamps}))
    out = df.select(
        UP.datetime2gradstime(F.col("ts")).alias("g"),
        UP.gradstime2datetime(UP.datetime2gradstime(F.col("ts"))).alias("rt"),
    ).toPandas()
    for ts, g, rt in zip(stamps, out["g"], out["rt"]):
        assert g == ts.strftime("%HZ%d%b%Y")
        assert datetime.datetime.strptime(g, "%HZ%d%b%Y") == rt.to_pydatetime()


def test_bucketed_topk_multiprobe_recall_monotone(spark):
    """Query-side multi-probe: r=0 results are a subset of r=1 which is a
    subset of r=2 candidates; recall vs exact brute is monotone in r and
    r=2 strictly beats r=0 on a corpus where neighbors straddle plane
    boundaries. Schema/ranking contract identical at every r."""
    rng = np.random.RandomState(5)
    vecs = rng.normal(size=(400, 16)).astype(np.float64)
    emb = spark.createDataFrame(pd.DataFrame({
        "vec_id": np.arange(400), "embedding": [v.tolist() for v in vecs]}))
    qs = spark.createDataFrame(pd.DataFrame({
        "query_id": np.arange(5),
        "q_vec": [(vecs[i] + rng.normal(scale=0.05, size=16)).tolist()
                  for i in range(5)]}))
    brute = SIM.cosine_topk(emb, qs, k=5).toPandas()
    truth = set(map(tuple, brute[["query_id", "vec_id"]].to_numpy()))
    rec = {}
    for r in (0, 1, 2):
        got = SIM.bucketed_topk(emb, qs, dim=16, k=5, probe_radius=r).toPandas()
        rec[r] = len(set(map(tuple, got[["query_id", "vec_id"]].to_numpy())) & truth)
        assert set(got.columns) == {"query_id", "rank", "vec_id", "cosine"}
        assert (got.groupby("query_id")["rank"].min() == 1).all()
    assert rec[0] <= rec[1] <= rec[2]
    assert rec[2] > rec[0]


def test_repetition_stats_vs_brute(spark):
    """Gopher repetition signals (dup-word fraction, top n-gram char
    coverage) match a brute-force Python computation, including the
    edge cases: empty/blank text, single word, all-identical words
    (where overlap makes raw coverage exceed 1.0 — must clamp),
    whitespace-BOUNDED text (no phantom empty tokens — review fix), and
    NULL text (all three stats NULL — F.least skips nulls, the
    quality_score footgun)."""
    from geospatialtools_spark.functions import textstats as TX
    texts = [
        "the cat sat on the mat the cat sat",
        "a a a a a",            # clamp case: raw 2-gram coverage > 1
        "one two three",
        "solo",
        "",
        "   ",
        "x y x y x y x y",
        "\nHello\n",            # newline-bounded one-word doc: all 0.0
        "\n",                   # blank by newline: no tokens
        None,                   # NULL text: NULL stats
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id int, text string")
    t = F.col("text")
    out = (df.select(
        "doc_id",
        TX.dup_unit_frac(TX.words_array(t)).alias("dup_word_frac"),
        TX.top_ngram_char_frac(t, 2).alias("top2"),
        TX.top_ngram_char_frac(t, 3).alias("top3"),
    ).orderBy("doc_id").toPandas())

    def brute_top(text, n):
        w = text.split()
        grams = [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]
        if not grams:
            return 0.0
        best = max(grams.count(g) * len(g) for g in set(grams))
        return min(1.0, round(best / len(text), 6))

    for i, text in enumerate(texts):
        if text is None:
            assert out.iloc[i, 1:].isna().all(), out.iloc[i]
            continue
        w = text.split()
        exp_dup = round((len(w) - len(set(w))) / len(w), 6) if w else 0.0
        assert out["dup_word_frac"].iloc[i] == exp_dup, (i, text)
        assert out["top2"].iloc[i] == brute_top(text, 2), (i, text)
        assert out["top3"].iloc[i] == brute_top(text, 3), (i, text)
    assert out["top2"].iloc[1] == 1.0  # the clamp actually engaged
    assert out["dup_word_frac"].iloc[7] == 0.0  # '\nHello\n': one clean token


def test_repetition_fast_bit_parity(spark):
    """Arrow counter path (repetition_stats_fast) must be bit-identical to
    the pure-Catalyst forms on adversarial tokenization inputs: tabs /
    CR-LF / runs of mixed ASCII whitespace (Java \\s), unicode NBSP (NOT
    whitespace to Java's ASCII \\s — must stay inside a token), leading
    and trailing whitespace (F.trim strips ASCII space only), empty and
    blank strings, and the overlap-clamp case."""
    from geospatialtools_spark.functions import textstats as TX
    texts = [
        "a\tb\tc a b",              # tabs
        "x  y \r\n z x y",          # runs + CRLF
        "nb sp nb sp q",  # NBSP inside tokens (not a separator)
        "  lead and trail  ",       # ASCII-space trim
        "\t tab-lead",              # trim leaves the tab; split eats it
        "a a a a",                  # clamp
        "",
        " ",
        "single",
        "\nHello\n",                # whitespace-bounded: no phantom tokens
        None,                       # NULL text: NULL on BOTH paths
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id int, text string")
    t = F.col("text")
    slow = (df.select(
        "doc_id",
        TX.dup_unit_frac(TX.words_array(t)).alias("d"),
        TX.top_ngram_char_frac(t, 2).alias("t2"),
        TX.top_ngram_char_frac(t, 3).alias("t3"),
    ).orderBy("doc_id").toPandas())
    fd, f2, f3 = TX.repetition_stats_fast(t)
    fast = (df.select("doc_id", fd.alias("d"), f2.alias("t2"), f3.alias("t3"))
            .orderBy("doc_id").toPandas())
    for c in ("d", "t2", "t3"):
        a, b = slow[c], fast[c]
        assert (a.isna() == b.isna()).all(), (c, a.tolist(), b.tolist())
        m = ~a.isna()
        assert a[m].tolist() == b[m].tolist(), (c, a.tolist(), b.tolist())
        assert a.isna().iloc[-1]            # the NULL row really is NULL


def test_lsh_arrow_assign_parity(spark):
    """The GEMM bucket twin (lsh_buckets_pudf) assigns the identical bucket
    to every vector as the Catalyst expression, and the arrow_assign paths
    of bucketed_topk / embedding_dup_pairs_bucketed return row-identical
    results to the expression paths."""
    rng = np.random.RandomState(31)
    vecs = rng.normal(size=(300, 16)).astype(np.float32)
    vecs[50] = vecs[40]                      # one exact-dup pair
    df = spark.createDataFrame(pd.DataFrame({
        "vec_id": np.arange(300), "embedding": [v.tolist() for v in vecs]}))
    exprb = df.select(SIM.lsh_buckets(F.col("embedding"), 16, 8).alias("b")).toPandas()
    gemm = df.select(SIM.lsh_buckets_pudf(16, 8)(F.col("embedding")).alias("b")).toPandas()
    assert (exprb["b"] == gemm["b"]).all()

    queries = spark.createDataFrame(pd.DataFrame({
        "query_id": [3, 9], "q_vec": [vecs[3].tolist(), vecs[9].tolist()]}))
    key = lambda p: sorted(map(tuple, p.to_numpy().tolist()))
    a = SIM.bucketed_topk(df, queries, dim=16, k=3, probe_radius=1).toPandas()
    b = SIM.bucketed_topk(df, queries, dim=16, k=3, probe_radius=1,
                          arrow_assign=True).toPandas()
    assert key(a) == key(b)
    c = DD.embedding_dup_pairs_bucketed(df, dim=16, threshold=0.95).toPandas()
    d = DD.embedding_dup_pairs_bucketed(df, dim=16, threshold=0.95,
                                        arrow_assign=True).toPandas()
    assert key(c) == key(d)
    assert (40.0, 50.0, 1.0) in set(map(tuple, d.to_numpy().tolist()))


def test_corpus_stats_rollup_total_and_null_semantics(spark):
    """corpus_stats: the TOTAL row's additive columns equal the sum of the
    per-source rows; a real NULL source gets its own '(null)' row distinct
    from TOTAL (GROUPING()); NULL text counts toward docs only."""
    from geospatialtools_spark.functions.textstats import corpus_stats
    docs = spark.createDataFrame(
        [(1, "one two three", "en", "web"),
         (2, "one two three", "en", "web"),     # exact dup of 1
         (3, "vier funf", "de", "wiki"),
         (4, None, "en", "wiki"),               # NULL text
         (5, "  ", "fr", None)],                # blank text, NULL source
        "doc_id long, text string, lang string, source string")
    out = corpus_stats(docs).toPandas().set_index("source")
    assert set(out.index) == {"TOTAL", "web", "wiki", "(null)"}
    assert out["is_total"].sum() == 1                 # exactly one TOTAL row
    t = out.loc["TOTAL"]
    assert t["is_total"] == 1
    per = out.drop("TOTAL")
    for c in ("docs", "chars", "tokens"):
        assert t[c] == per[c].sum()
    assert t["docs"] == 5
    assert out.loc["web", "distinct_texts"] == 1      # exact dup collapses
    assert t["distinct_texts"] == 3                   # NULL text not counted
    assert out.loc["wiki", "docs"] == 2 and out.loc["wiki", "tokens"] == 2
    assert out.loc["(null)", "tokens"] == 0           # blank -> 0 tokens
    assert t["langs"] == 3
    # TOTAL avg_chars is the global mean over non-NULL texts
    assert t["avg_chars"] == round((13 + 13 + 9 + 2) / 4, 4)


# ---------------------------------------------------------------------------
# unicode script composition (script_counts / script_fracs / dominant)


SCRIPT_DOCS = [
    (0, "hello world plain english text"),
    (1, "Привет мир это русский текст"),
    (2, "这是中文文本 漢字"),
    (3, "こんにちは世界 カタカナ"),
    (4, "مرحبا بالعالم نص عربي"),
    (5, "שלום עולם טקסט עברי"),
    (6, "नमस्ते दुनिया हिंदी पाठ"),
    (7, "안녕하세요 세계 한국어"),
    (8, "γεια σου κοσμος ελληνικα"),
    (9, "mixed русский and english 漢字 text"),
    (10, "1234 5678 !!! ???"),        # no script chars at all
    (11, ""),
    (12, None),
    (13, "Μΰ"),                        # greek incl. extended-range chars
    (14, "ab яю"),                     # exact 2-2 tie -> cyrillic? no: tie
]


def _py_script_counts(t):
    from geospatialtools_spark.functions.textstats import SCRIPT_RANGES
    if t is None:
        return None
    out = {}
    for name, ranges in SCRIPT_RANGES.items():
        out[name] = sum(1 for ch in t
                        if any(a <= ord(ch) <= b for a, b in ranges))
    return out


def test_script_counts_match_python_reference(spark):
    from geospatialtools_spark.functions.textstats import (dominant_script,
                                                           script_counts)
    df = spark.createDataFrame(SCRIPT_DOCS, "doc_id long, text string")
    cols = script_counts(F.col("text"))
    out = df.select("doc_id", dominant_script(F.col("text")).alias("dom"),
                    *[c.alias(n) for n, c in cols.items()])
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    for i, t in SCRIPT_DOCS:
        ref = _py_script_counts(t)
        if ref is None:
            assert got[i]["dom"] is None
            assert all(got[i][n] is None for n in ref or
                       ["latin", "cjk"])  # NULL counts
            continue
        for name, n in ref.items():
            assert got[i][name] == n, (i, name)
    assert got[0]["dom"] == "latin"
    assert got[1]["dom"] == "cyrillic"
    assert got[2]["dom"] == "cjk" and got[3]["dom"] == "cjk"
    assert got[4]["dom"] == "arabic" and got[5]["dom"] == "hebrew"
    assert got[6]["dom"] == "devanagari" and got[7]["dom"] == "hangul"
    assert got[8]["dom"] == "greek" and got[13]["dom"] == "greek"
    assert got[10]["dom"] == "und" and got[11]["dom"] == "und"
    # doc 14: latin 2 vs cyrillic 2 — exact tie, alphabetically first wins
    assert got[14]["dom"] == "cyrillic"


def test_script_fracs_and_duckdb_twin(spark):
    import duckdb

    from geospatialtools_spark.functions.textstats import (script_fracs,
                                                           sql_script_counts)
    df = spark.createDataFrame(SCRIPT_DOCS, "doc_id long, text string")
    fr = script_fracs(F.col("text"))
    out = {r["doc_id"]: r.asDict() for r in
           df.select("doc_id",
                     *[c.alias(n) for n, c in fr.items()]).collect()}
    assert out[11]["latin"] == 0.0 and out[12]["latin"] is None
    assert abs(out[0]["latin"]
               - round(sum(1 for ch in SCRIPT_DOCS[0][1]
                           if ch.isalpha()) / len(SCRIPT_DOCS[0][1]),
                       6)) < 1e-12
    con = duckdb.connect()
    con.sql("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", SCRIPT_DOCS)
    e = sql_script_counts("text")
    sel = ", ".join(f"{sql} AS {n}" for n, sql in e.items())
    rows = con.sql(f"SELECT doc_id, {sel} FROM documents").fetchall()
    names = sorted(e)
    for row in rows:
        i = row[0]
        ref = _py_script_counts(dict(SCRIPT_DOCS)[i])
        for j, n in enumerate(names):
            want = None if ref is None else ref[n]
            assert row[1 + j] == want, (i, n)


# ---------------------------------------------------------------------------
# PMI collocations + TF-IDF keywords


def _pmi_docs():
    rows = []
    for i in range(50):
        # "strong glue" always adjacent; "weak"/"tie" co-occur but
        # non-adjacent; filler varies
        rows.append((i, f"strong glue filler{i % 7} weak other{i % 5} tie"))
    rows.append((50, "Weak, tie!"))     # punctuation/case: canonical
                                        # text_tokens must see 'weak tie'
    # rare exclusive pair: words occur ONLY together, 3 times — PMI
    # favors rarity, so this must rank top-1
    for j in range(3):
        rows.append((60 + j, "zq wv"))
    rows.append((51, None))
    rows.append((52, ""))
    return rows


def _py_pmi(rows, min_count):
    import math
    import re
    from collections import Counter
    wc, gc = Counter(), Counter()
    for _, t in rows:
        if not t:
            continue
        ws = re.findall("[a-z0-9]+", t.lower())
        wc.update(ws)
        gc.update(" ".join(p) for p in zip(ws, ws[1:]))
    W, B = sum(wc.values()), sum(gc.values())
    out = {}
    for g, cab in gc.items():
        if cab < min_count:
            continue
        a, b = g.split(" ")
        out[g] = (cab, round(math.log((cab / B) /
                                      ((wc[a] / W) * (wc[b] / W))), 6))
    return out


def test_pmi_bigrams_matches_python_reference(spark):
    from geospatialtools_spark.functions.textstats import pmi_bigrams
    rows = _pmi_docs()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["bigram"]: (r["cab"], r["pmi"])
           for r in pmi_bigrams(df, min_count=2, top_k=100).collect()}
    ref = _py_pmi(rows, 2)
    assert got == ref
    # the always-adjacent planted pair outranks everything
    top = pmi_bigrams(df, min_count=2, top_k=1).collect()[0]
    assert top["bigram"] == "zq wv" and top["cab"] == 3
    import pytest
    with pytest.raises(ValueError):
        pmi_bigrams(df, min_count=0)
    # degenerate corpora: EMPTY result (the SQL twin's behavior), no raise
    empty = spark.createDataFrame([(0, "")], "doc_id long, text string")
    assert pmi_bigrams(empty).count() == 0
    onetok = spark.createDataFrame([(0, "solo"), (1, "words")],
                                   "doc_id long, text string")
    assert pmi_bigrams(onetok).count() == 0


def test_tfidf_keywords_matches_python_reference(spark):
    import math
    import re
    from collections import Counter

    from geospatialtools_spark.functions.retrieval import (build_text_index,
                                                           tfidf_keywords)
    rows = [(0, "apple apple banana common common common"),
            (1, "banana cherry common zebra"),
            (2, "common cherry cherry dog dog dog dog"),
            (3, "common")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_text_index(df)
    got = {(r["doc_id"], r["rank"]): (r["term"], r["tf"], r["score"])
           for r in tfidf_keywords(idx, k=2).collect()}
    # python reference
    docs = {i: re.findall("[a-z0-9]+", t.lower()) for i, t in rows}
    dfreq = Counter()
    for ws in docs.values():
        dfreq.update(set(ws))
    n = len(rows)
    for i, ws in docs.items():
        tf = Counter(ws)
        scored = sorted(((round(c * math.log(n / dfreq[w]), 6), w, c)
                         for w, c in tf.items()),
                        key=lambda x: (-x[0], x[1]))[:2]
        for rk, (sc, w, c) in enumerate(scored, 1):
            assert got[(i, rk)] == (w, c, sc), (i, rk)
    # 'common' is in every doc -> idf 0 -> never a top keyword where
    # any other term exists
    assert got[(0, 1)][0] == "apple" and got[(2, 1)][0] == "dog"
    # doc 3 has ONLY 'common': it still gets a (zero-scored) keyword
    assert got[(3, 1)] == ("common", 1, 0.0)
