"""Link-graph operators: outlink extraction, host graph, PageRank.

PageRank is pinned against an independent numpy power-iteration replica
(dense transition matrix + dangling redistribution) — same model, totally
different execution — so a join/agg mistake in the distributed form
cannot agree by construction.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from resume_ocr_spark.operators import linkgraph, urltools  # noqa: E402


HTML = (
    '<p>intro</p>'
    '<a href="https://Foo.COM/a#frag">abs, host case-folds, frag strips</a> '
    "<A HREF='/rel/path'>single-quoted attr, root-relative</A> "
    '<a class="x" rel="nofollow" href="//cdn.bar.org/x">protocol-relative</a> '
    '<a href="mailto:someone@host.org">mail</a> '
    '<a href="javascript:void(0)">js</a> '
    '<a href="sub.html">relative</a> '
    '<a href="#top">fragment-only</a> '
    '<a name="anchor">no href at all</a>'
)


def _links(spark, rows):
    df = spark.createDataFrame(rows, "url string, html string")
    return linkgraph.extract_outlinks(df)


def test_extract_outlinks_resolution(spark):
    out = _links(spark, [("https://www.example.co.uk/page", HTML)])
    got = {(r["link"], r["link_host"], r["link_domain"])
           for r in out.collect()}
    assert got == {
        ("https://Foo.COM/a", "foo.com", "foo.com"),
        ("https://www.example.co.uk/rel/path", "www.example.co.uk",
         "example.co.uk"),
        ("https://cdn.bar.org/x", "cdn.bar.org", "bar.org"),
        ("https://www.example.co.uk/sub.html", "www.example.co.uk",
         "example.co.uk"),
    }


def test_extract_outlinks_null_and_empty(spark):
    out = _links(spark, [("http://solo.net", None),
                         ("http://solo.net", ""),
                         ("http://solo.net", "<p>no links</p>")])
    assert out.count() == 0


def test_extract_outlinks_first_href_wins_in_tag(spark):
    # duplicate href attributes: the lazy [^>]*? makes the first one win
    out = _links(spark, [
        ("http://a.com", '<a href="http://x.org/1" href="http://y.org/2">t</a>')])
    assert [r["link_domain"] for r in out.collect()] == ["x.org"]


def test_registered_domain_expr_regex_form(spark):
    from pyspark.sql import functions as F

    rows = [("localhost",), ("example.com",), ("www.example.com",),
            ("a.b.co.uk",), ("co.uk",), ("",), ("a..b",)]
    df = spark.createDataFrame(rows, "host string").withColumn(
        "domain", urltools.registered_domain_expr(F.col("host")))
    got = {r["host"]: r["domain"] for r in df.collect()}
    assert got == {
        "localhost": "localhost",
        "example.com": "example.com",
        "www.example.com": "example.com",
        "a.b.co.uk": "b.co.uk",
        "co.uk": "co.uk",       # 2-label host is its own domain
        "": "",
        "a..b": "a..b",          # degenerate empty label: full host
    }


def test_host_link_graph_weights_and_self_loops(spark):
    rows = [("a.com", "b.com"), ("a.com", "b.com"), ("a.com", "a.com"),
            ("b.com", "a.com"), ("", "b.com"), ("a.com", "")]
    df = spark.createDataFrame(rows, "domain string, link_domain string")
    got = {(r["src_domain"], r["dst_domain"]): r["weight"]
           for r in linkgraph.host_link_graph(df).collect()}
    assert got == {("a.com", "b.com"): 2, ("b.com", "a.com"): 1}
    with_self = {(r["src_domain"], r["dst_domain"]): r["weight"]
                 for r in linkgraph.host_link_graph(
                     df, drop_self=False).collect()}
    assert with_self[("a.com", "a.com")] == 1


def _numpy_pagerank(edges, n_iter, damping=0.85, weighted=True):
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    mat = np.zeros((n, n))
    out_w: dict[str, float] = {}
    for s, d, w in edges:
        out_w[s] = out_w.get(s, 0.0) + (w if weighted else 1.0)
    for s, d, w in edges:
        mat[idx[d], idx[s]] += (w if weighted else 1.0) / out_w[s]
    dangle = np.array([1.0 if v not in out_w else 0.0 for v in nodes])
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        r = ((1 - damping) / n
             + damping * (mat @ r + float(dangle @ r) / n))
    return {v: r[idx[v]] for v in nodes}


EDGES = [("a", "b", 2), ("a", "c", 1), ("b", "c", 1), ("c", "a", 1),
         ("b", "d", 1), ("e", "a", 3)]  # d is a dangler; e is a source


def test_pagerank_matches_numpy_replica(spark):
    df = spark.createDataFrame(
        EDGES, "src_domain string, dst_domain string, weight long")
    got = {r["domain"]: r["rank"]
           for r in linkgraph.pagerank(df, n_iter=6).collect()}
    want = _numpy_pagerank(EDGES, n_iter=6)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    # total mass conserved: dangling redistribution keeps sum(rank) = 1
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_unweighted(spark):
    df = spark.createDataFrame(
        EDGES, "src_domain string, dst_domain string, weight long")
    got = {r["domain"]: r["rank"]
           for r in linkgraph.pagerank(df, n_iter=4,
                                       weight_col=None).collect()}
    want = _numpy_pagerank(EDGES, n_iter=4, weighted=False)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_pagerank_hub_outranks_leaf(spark):
    # star: everyone links to hub; hub links to one leaf
    edges = [(f"s{i}.com", "hub.com", 1) for i in range(6)]
    edges.append(("hub.com", "s0.com", 1))
    df = spark.createDataFrame(
        edges, "src_domain string, dst_domain string, weight long")
    got = {r["domain"]: r["rank"]
           for r in linkgraph.pagerank(df, n_iter=8).collect()}
    # the hub collects 6 in-links; s0 inherits the hub's whole out-mass
    # (its only link) so s0 legitimately outranks the hub — the invariant
    # is that both dwarf a teleport-only leaf
    assert got["hub.com"] > got["s1.com"]
    assert got["s0.com"] > got["s1.com"]
    assert got == pytest.approx(_numpy_pagerank(edges, n_iter=8), abs=1e-12)


def test_pagerank_rejects_zero_iterations(spark):
    df = spark.createDataFrame(
        EDGES, "src_domain string, dst_domain string, weight long")
    with pytest.raises(ValueError):
        linkgraph.pagerank(df, n_iter=0)


def test_end_to_end_html_to_ranks(spark):
    # pages on two domains linking each other + one external target
    pages = [
        ("https://a.com/1", '<a href="https://b.com/x">1</a>'
                            '<a href="https://b.com/y">2</a>'),
        ("https://b.com/1", '<a href="https://a.com/">r</a>'
                            '<a href="https://c.org/z">ext</a>'),
        ("https://a.com/2", '<a href="/local">self, dropped</a>'),
    ]
    df = spark.createDataFrame(pages, "url string, html string")
    links = linkgraph.extract_outlinks(df).withColumn(
        "domain", urltools.registered_domain_expr(
            urltools.host_expr(F.col("url"))))
    graph = linkgraph.host_link_graph(links)
    got = {(r["src_domain"], r["dst_domain"]): r["weight"]
           for r in graph.collect()}
    assert got == {("a.com", "b.com"): 2, ("b.com", "a.com"): 1,
                   ("b.com", "c.org"): 1}
    ranks = {r["domain"]: r["rank"]
             for r in linkgraph.pagerank(graph, n_iter=3).collect()}
    assert set(ranks) == {"a.com", "b.com", "c.org"}
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)
