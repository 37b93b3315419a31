"""Round-5 late additions: paired anchor-text extraction + per-target
aggregation, the shuffled-join decontam twin, and CDX-style latest-capture
dedup.

Plan pins here guard the SCALE levers, not just semantics:
  * benchmark_decontam_join must plan a ShuffledHashJoin for the gram
    match even though the test-scale bench would fit a broadcast — the
    hint, not AQE, is the contract (otherwise the plan under test is not
    the 100 TB plan);
  * keep_latest_capture must stay a single map-side-combined aggregation
    (one Exchange, no Window) — the whole point over row_number;
  * anchor_text_stats must consume the regex-explode child exactly once
    (the two-branch form re-scanned it AND overflowed janino's 64 KB
    method limit — see linkgraph.anchor_text_stats docstring).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from resume_ocr_spark.operators import linkgraph, urltools  # noqa: E402


ANCHOR_HTML = (
    '<p>intro</p>'
    '<a href="https://Foo.COM/a#frag"> <b>Nested</b>\n  markup </a>'
    "<A HREF='/rel/path'>UPPER tag</A>"
    '<a class="x" rel="nofollow" href="//cdn.bar.org/x">proto-rel</a>'
    '<a href="mailto:someone@host.org">mail text</a>'
    '<a href="https://img.only.net/i"><img src="x.png"></a>'
    '<a href="#top">frag only</a>'
    '<a name="anchor">no href at all</a>'
    '<a href="https://Foo.COM/a">second to foo</a>'
)


def _anchors(spark, rows):
    df = spark.createDataFrame(rows, "url string, html string")
    pages = df.withColumn(
        "domain",
        urltools.registered_domain_expr(urltools.host_expr(F.col("url"))))
    return linkgraph.extract_anchors(pages)


def test_extract_anchors_pairing_and_text(spark):
    out = _anchors(spark, [("https://www.example.co.uk/page", ANCHOR_HTML)])
    got = {(r["link"], r["link_domain"], r["anchor"]) for r in out.collect()}
    assert got == {
        # nested <b> stripped, newline + runs of spaces collapsed, trimmed
        ("https://Foo.COM/a", "foo.com", "Nested markup"),
        # uppercase <A HREF='...'> element still matches
        ("https://www.example.co.uk/rel/path", "example.co.uk",
         "UPPER tag"),
        ("https://cdn.bar.org/x", "bar.org", "proto-rel"),
        # same target, different text: each href pairs with ITS OWN text
        ("https://Foo.COM/a", "foo.com", "second to foo"),
    }
    # dropped: mailto (scheme), img-only (empty text), fragment-only and
    # no-href elements (empty link)


def test_extract_anchors_null_and_linkless(spark):
    out = _anchors(spark, [("http://solo.net", None),
                           ("http://solo.net", ""),
                           ("http://solo.net", "<p>no anchors</p>"),
                           ("http://solo.net", "<a href='/x'><img></a>")])
    assert out.count() == 0


def test_anchor_text_stats_modal_and_sources(spark):
    rows = [
        ("https://a.com/1",
         '<a href="https://t.org/x">buy cheap</a>'
         '<a href="https://t.org/y">buy cheap</a>'
         '<a href="https://t.org/z">archive</a>'),
        ("https://b.com/1",
         '<a href="https://t.org/x">archive</a>'
         # self-link: dropped by drop_self, never counted
         '<a href="https://b.com/me">home</a>'),
        ("https://c.com/1", '<a href="https://t.org/q">archive</a>'),
    ]
    a = _anchors(spark, rows)
    s = {r["link_domain"]: r for r in
         linkgraph.anchor_text_stats(a).collect()}
    assert set(s) == {"t.org"}
    r = s["t.org"]
    assert r["total_anchors"] == 5
    assert r["n_src_domains"] == 3
    # 'archive' (3) beats 'buy cheap' (2)
    assert (r["top_anchor"], r["top_anchor_n"]) == ("archive", 3)


def test_anchor_text_stats_tie_breaks_lexicographic(spark):
    rows = [
        ("https://a.com/1", '<a href="https://t.org/x">zeta</a>'),
        ("https://b.com/1", '<a href="https://t.org/x">alpha</a>'),
    ]
    s = linkgraph.anchor_text_stats(_anchors(spark, rows)).collect()
    assert len(s) == 1
    # equal counts: lexicographically smallest text wins, deterministically
    assert (s[0]["top_anchor"], s[0]["top_anchor_n"]) == ("alpha", 1)


def _final_plan(df) -> str:
    """The AQE-final plan section only — AdaptiveSparkPlan's toString
    appends the '== Initial Plan ==' section, which double-counts every
    node a count-based pin looks for."""
    s = df._jdf.queryExecution().executedPlan().toString()
    return s.split("== Initial Plan ==")[0]


def test_anchor_stats_plan_single_corpus_scan(spark):
    rows = [("https://a.com/1", '<a href="https://t.org/x">t</a>')]
    df = linkgraph.anchor_text_stats(_anchors(spark, rows))
    df.collect()
    final = _final_plan(df)
    # the regex-explode child is consumed by exactly ONE aggregation —
    # a second Generate means the corpus is being scanned twice
    assert final.count("Generate") == 1, final


def test_keep_latest_capture_semantics(spark):
    caps = spark.createDataFrame(
        [("u1", 5, 10, "old"), ("u1", 9, 11, "new"), ("u1", 9, 3, "tie-lo"),
         ("u2", 1, 1, "only")],
        "url string, fetch_ts int, doc_id int, payload string")
    got = {r["url"]: r for r in
           urltools.keep_latest_capture(caps).collect()}
    assert set(got) == {"u1", "u2"}
    # newest ts wins; ts tie broken by LARGER tie_col (lexicographic max)
    assert (got["u1"]["fetch_ts"], got["u1"]["doc_id"],
            got["u1"]["payload"]) == (9, 11, "new")
    assert got["u2"]["payload"] == "only"
    # input schema preserved, column order included
    assert urltools.keep_latest_capture(caps).columns == caps.columns


def test_keep_latest_capture_plan_is_one_aggregation(spark):
    caps = spark.createDataFrame(
        [("u1", 5, 10, "a"), ("u1", 9, 11, "b")],
        "url string, fetch_ts int, doc_id int, payload string")
    df = urltools.keep_latest_capture(caps)
    df.collect()
    final = _final_plan(df)
    # the scale contract: map-side-combined max_by (partial_max_by below
    # the exchange), not a window that ships every capture of a hot URL
    # to one task
    assert "Window" not in final, final
    assert "max_by" in final, final
    assert final.count("Exchange") == 1, final


def test_decontam_join_variant_semantics_and_plan(spark):
    from resume_ocr_spark.operators import decontam

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "zeta eta theta iota")],
        "doc_id long, text string")
    bench = spark.createDataFrame([("alpha beta gamma epsilon",)],
                                  "text string")
    kw = dict(n=3, broadcast_bench=False)
    cc = decontam.contamination_counts(docs, bench, **kw)
    assert [(r["doc_id"], r["contaminated_ngrams"], r["contaminated"])
            for r in cc.collect()] == [(1, 1, True)]
    final = cc._jdf.queryExecution().executedPlan().toString()
    # the hint must hold even at test scale where AQE would broadcast
    assert "ShuffledHashJoin" in final, final
    assert "BroadcastHashJoin" not in final, final
    # the broadcast default still broadcasts
    bcast = decontam.contamination_counts(docs, bench, n=3)
    bcast.collect()
    bplan = bcast._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in bplan, bplan
    # and decontaminate() drops the flagged doc through the same path
    kept = decontam.decontaminate(docs, bench, **kw)
    assert [r["doc_id"] for r in kept.collect()] == [2]
