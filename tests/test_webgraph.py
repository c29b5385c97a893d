"""Web-link-graph chain: href extraction, host-edge construction, and
PageRank power iteration — pinned against a pure numpy/python reference
and by the analytic ranks of canonical graphs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geospatialtools_spark.functions import webgraph as WG


# ------------------------------------------------------------- extraction

def test_extract_links_and_hosts(spark):
    html = ('<html><a href="https://WWW.Example.COM:443/a?x=1#f">x</a>'
            '<a HREF=\'http://user:pw@other.org/page\'>y</a>'
            '<area href="//cdn.example.net/lib.js">'
            '<a href="/relative/path">z</a>'
            '<a href="#anchor">self</a>'
            '<a href = "mailto://mail.host/x">m</a></html>')
    df = spark.createDataFrame([("www.base.com", html), ("base2.org", None)],
                               "source string, text string")
    links = df.select(WG.extract_links(F.col("text")).alias("l")).collect()
    assert links[0]["l"] == [
        "https://WWW.Example.COM:443/a?x=1#f",
        "http://user:pw@other.org/page",
        "//cdn.example.net/lib.js",
        "/relative/path",
        "#anchor",
        "mailto://mail.host/x"]
    assert links[1]["l"] is None

    hosts = df.filter(F.col("text").isNotNull()).select(
        F.explode(WG.extract_links(F.col("text"))).alias("lk"),
        F.lower(F.regexp_replace("source", "^www\\.", "")).alias("bh")
    ).select(WG.link_host(F.col("lk"), F.col("bh")).alias("h")).collect()
    # absolute: lowercased, www/port/userinfo stripped; protocol-relative
    # resolved; relative + fragment land on the base host
    assert [r["h"] for r in hosts] == [
        "example.com", "other.org", "cdn.example.net",
        "base.com", "base.com", "mail.host"]


def test_extract_links_ignores_suffixed_attributes(spark):
    html = ('<div data-href="https://tracker.test/x" '
            'ng-href="https://ng.test/y" xlink:href="https://svg.test/z">'
            '<a href="https://real.test/ok">r</a></div>')
    df = spark.createDataFrame([(html,)], "text string")
    out = df.select(WG.extract_links(F.col("text")).alias("l")).head()
    assert out["l"] == ["https://real.test/ok"]


def test_link_host_drops_ipv6_literals(spark):
    df = spark.createDataFrame(
        [("http://[2001:db8::1]/x",), ("https://ok.test/y",)],
        "lk string")
    out = [r["h"] for r in df.select(
        WG.link_host(F.col("lk"), F.lit("base.test")).alias("h")).collect()]
    assert out == [None, "ok.test"]


def test_host_edges_weights_and_self_drop(spark):
    rows = [
        ("a.com", '<a href="http://b.com/1"></a><a href="http://b.com/2">'
                  '</a><a href="http://a.com/self"></a><a href="/rel">'),
        ("WWW.A.com", '<a href="https://c.org/x">'),
        ("b.com", '<a href="https://c.org/y">'),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    e = {(r["src"], r["dst"]): r["weight"]
         for r in WG.host_edges(df).collect()}
    # self-link and relative link (-> own host) both drop as self edges;
    # the www./case-normalized second page is the SAME src host a.com
    assert e == {("a.com", "b.com"): 2, ("a.com", "c.org"): 1,
                 ("b.com", "c.org"): 1}
    keep_self = {(r["src"], r["dst"]): r["weight"]
                 for r in WG.host_edges(df, drop_self_edges=False).collect()}
    assert keep_self[("a.com", "a.com")] == 2


# --------------------------------------------------------------- pagerank

def _pagerank_ref(edges, damping=0.85, n_iter=20):
    """Independent python power iteration (same dangling-uniform
    formulation)."""
    from collections import defaultdict
    w = defaultdict(float)
    for s, d_, ww in edges:
        w[(s, d_)] += ww
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    outw = defaultdict(float)
    for (s, d_), ww in w.items():
        outw[s] += ww
    r = {v: 1.0 / n for v in nodes}
    for _ in range(n_iter):
        dm = sum(r[v] for v in nodes if v not in outw)
        contrib = defaultdict(float)
        for (s, d_), ww in w.items():
            contrib[d_] += r[s] * ww / outw[s]
        r = {v: (1 - damping) / n + damping * (contrib[v] + dm / n)
             for v in nodes}
    return r


def _run_pr(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    out = WG.pagerank(df, weight_col="w", **kw)
    return {r["node"]: r["rank"] for r in out.collect()}


def test_pagerank_cycle_uniform(spark):
    edges = [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0)]
    r = _run_pr(spark, edges, n_iter=30)
    for v in "abc":
        assert r[v] == pytest.approx(1.0 / 3, abs=1e-12)
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_star_and_dangling(spark):
    # b..e all link to hub a; a links nowhere (dangling: its mass
    # redistributes uniformly). Hub must rank far above the leaves.
    edges = [(leaf, "a", 1.0) for leaf in "bcde"]
    r = _run_pr(spark, edges, n_iter=40)
    ref = _pagerank_ref([(s, d, w) for s, d, w in edges], n_iter=40)
    for v in r:
        assert r[v] == pytest.approx(ref[v], abs=1e-9)
    assert r["a"] > 3 * r["b"]
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_matches_reference_random_graph(spark):
    import random
    rng = random.Random(7)
    nodes = [f"h{i}" for i in range(25)]
    edges = []
    for _ in range(120):
        s, d = rng.sample(nodes, 2)
        edges.append((s, d, float(rng.randint(1, 4))))
    r = _run_pr(spark, edges, n_iter=15)
    ref = _pagerank_ref(edges, n_iter=15)
    assert set(r) == set(ref)
    for v in r:
        assert r[v] == pytest.approx(ref[v], rel=1e-9, abs=1e-12)


def test_pagerank_duplicate_edges_equal_weights(spark):
    # two unit rows a->b must equal one weight-2 row
    dup = _run_pr(spark, [("a", "b", 1.0), ("a", "b", 1.0),
                          ("a", "c", 1.0)], n_iter=10)
    merged = _run_pr(spark, [("a", "b", 2.0), ("a", "c", 1.0)], n_iter=10)
    for v in dup:
        assert dup[v] == pytest.approx(merged[v], abs=1e-12)


def test_pagerank_validates_args(spark):
    df = spark.createDataFrame([("a", "b", 1.0)],
                               "src string, dst string, w double")
    with pytest.raises(ValueError):
        WG.pagerank(df, damping=1.0)
    with pytest.raises(ValueError):
        WG.pagerank(df, n_iter=0)


def test_warc_to_pagerank_end_to_end(spark):
    """The full chain on synthesized pages: host_edges off an HTML corpus
    with a planted celebrity host, pagerank ranks it first."""
    rows = []
    for i in range(40):
        host = f"site{i}.test"
        body = '<p>content</p><a href="https://hub.test/page">hub</a>'
        if i % 2 == 0:
            body += f'<a href="https://site{(i + 1) % 40}.test/x">n</a>'
        rows.append((host, body))
    rows.append(("hub.test", '<a href="https://site0.test/back">b</a>'))
    df = spark.createDataFrame(rows, "source string, text string")
    pr = WG.pagerank(WG.host_edges(df), n_iter=20)
    top = pr.orderBy(F.desc("rank")).head()
    assert top["node"] == "hub.test"
