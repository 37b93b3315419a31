"""Meta-robots gate + crawl-snapshot delta (urltools round-5 tail).

The gate replica hash-checks both entries against DuckDB every CI pass
(test_contract_tail); these tests pin what the SQL oracle cannot see —
the robots parser's edge semantics on adversarial tags the fixture
doesn't enumerate, snapshot_delta's schema/option contract, and the
join STRATEGY (the 100 TB plan is a merge SMJ; at test scale AQE would
happily broadcast the small side, so the hint must hold it).
"""

import pytest

from resume_ocr_spark.operators import urltools


def _flags(spark, html, header=None):
    df = spark.createDataFrame(
        [(0, html, header)], "id int, html string, hdr string")
    out = urltools.with_robots_directives(
        df, html_col="html", header_col="hdr" if header is not None else None)
    row = out.collect()[0]
    return row.robots_noindex, row.robots_nofollow


@pytest.mark.parametrize(
    "html,want",
    [
        # canonical
        ('<meta name="robots" content="noindex">', (True, False)),
        ('<meta name="robots" content="nofollow">', (False, True)),
        ('<meta name="robots" content="noindex, nofollow">', (True, True)),
        # none = noindex + nofollow
        ('<meta name="robots" content="none">', (True, True)),
        # all / index are no-ops
        ('<meta name="robots" content="all">', (False, False)),
        # case / attribute order / quote style
        ("<META CONTENT='NOINDEX' NAME='ROBOTS'>", (True, False)),
        ("<meta name=robots content=noindex>", (True, False)),
        ('<meta content=nofollow name=robots />', (False, True)),
        # whitespace-separated directives (seen in the wild)
        ('<meta name="robots" content="noindex nofollow">', (True, True)),
        # decoys: wrong name, name-prefix, directive in other attrs
        ('<meta name="description" content="noindex">', (False, False)),
        ('<meta name="robots-extra" content="noindex">', (False, False)),
        ('<meta property="robots" content="">noindex', (False, False)),
        # most-restrictive-wins across conflicting tags
        ('<meta name="robots" content="index"><meta name=robots '
         'content="noindex">', (True, False)),
        # directive embedded in a LONGER token must not match
        ('<meta name="robots" content="noindexing">', (False, False)),
        # no metas at all
        ("<html><body>plain</body></html>", (False, False)),
    ],
)
def test_robots_meta_edge_cases(spark, html, want):
    assert _flags(spark, html) == want


def test_robots_header_column(spark):
    # header alone flips the flags; empty header is inert
    assert _flags(spark, "<p>x</p>", header="noindex") == (True, False)
    assert _flags(spark, "<p>x</p>", header="NONE") == (True, True)
    assert _flags(spark, "<p>x</p>", header="") == (False, False)
    # header and meta combine disjunctively
    assert _flags(
        spark, '<meta name="robots" content="nofollow">',
        header="noindex") == (True, True)


def test_robots_null_html_is_total(spark):
    df = spark.createDataFrame([(0, None)], "id int, html string")
    row = urltools.with_robots_directives(df).collect()[0]
    assert (row.robots_noindex, row.robots_nofollow) == (False, False)


def _snapshots(spark):
    old = spark.createDataFrame(
        [("u1", "d1"), ("u2", "d2"), ("u3", None)],
        "url string, digest string")
    new = spark.createDataFrame(
        [("u1", "d1", 10), ("u2", "d2x", 20), ("u4", "d4", 40),
         ("u5", None, 50)],
        "url string, digest string, text_len int")
    return old, new


def test_snapshot_delta_statuses(spark):
    old, new = _snapshots(spark)
    out = urltools.snapshot_delta(old, new)
    assert out.columns == [
        "url", "status", "old_digest", "new_digest", "text_len"]
    got = {r.url: r.status for r in out.collect()}
    assert got == {"u1": "unchanged", "u2": "changed", "u3": "removed",
                   "u4": "added", "u5": "added"}
    # removed rows carry no new-side payload
    removed = out.filter("status = 'removed'").collect()[0]
    assert removed.new_digest is None and removed.text_len is None


def test_snapshot_delta_null_digest_semantics(spark):
    # null == null digests are UNCHANGED (eqNullSafe), not spuriously
    # changed; presence is tracked by markers, not digest nullability
    old = spark.createDataFrame([("u", None)], "url string, digest string")
    new = spark.createDataFrame(
        [("u", None, 1)], "url string, digest string, text_len int")
    row = urltools.snapshot_delta(old, new).collect()[0]
    assert row.status == "unchanged"


def test_snapshot_delta_changed_only(spark):
    old, new = _snapshots(spark)
    out = urltools.snapshot_delta(old, new, changed_only=True)
    got = {r.url for r in out.collect()}
    assert got == {"u2", "u4", "u5"}


def test_snapshot_delta_plan_is_merge_join(spark):
    # both snapshots are corpus-sized at 100 TB: the hint must pin the
    # co-partitioned SMJ even where AQE would broadcast the test-sized
    # side, and no exchange may carry the old-side payload columns
    old, new = _snapshots(spark)
    out = urltools.snapshot_delta(old, new)
    out.collect()  # executedPlan below reflects AQE's final choice
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan


# ---------------------------------------------------------------------------
# robots.txt interpreter (RFC 9309 + Google REP wildcard extension)
# ---------------------------------------------------------------------------

def _robots_check(spark, txt, agent, cases):
    """cases: list of (path, expected_allowed)."""
    robots = spark.createDataFrame(
        [("h.com", txt)], "host string, robots_txt string")
    rules = urltools.parse_robots(robots, agent=agent)
    urls = spark.createDataFrame(
        [("h.com", p) for p, _ in cases], "host string, path string")
    out = urltools.filter_robots_allowed(
        urls, rules, broadcast_rules=True, annotate_only=True)
    got = {r.path: r.robots_allowed for r in out.collect()}
    assert got == dict(cases), got


def test_robots_google_spec_precedence_vectors(spark):
    # the Google REP documentation's own precedence examples:
    # longest-match wins; on a tie the least restrictive (allow) wins
    txt = ("User-agent: *\n"
           "Allow: /p\n"
           "Disallow: /\n")
    _robots_check(spark, txt, "anybot",
                  [("/page", True), ("/", False), ("/other", False)])
    txt = ("User-agent: *\n"
           "Allow: /folder\n"
           "Disallow: /folder\n")
    _robots_check(spark, txt, "anybot", [("/folder/page", True)])
    txt = ("User-agent: *\n"
           "Allow: /page\n"
           "Disallow: /*.htm\n")
    _robots_check(spark, txt, "anybot", [("/page.htm", False)])


def test_robots_wildcard_and_anchor(spark):
    txt = ("User-agent: *\n"
           "Disallow: /*.php$\n"
           "Disallow: /fish*bowl\n")
    _robots_check(spark, txt, "anybot", [
        ("/index.php", False), ("/index.php?x=1", True),
        ("/a/deep/file.php", False),
        ("/fishbowl", False), ("/fish/tank/bowl", False),
        ("/fish", True),
    ])
    # '$' in the middle of a rule is literal, not an anchor
    txt = "User-agent: *\nDisallow: /a$b\n"
    _robots_check(spark, txt, "anybot", [("/a$b/c", False), ("/ab", True)])


def test_robots_group_semantics(spark):
    # consecutive UA lines share a group; an exact-agent group shadows
    # the * group entirely (RFC 9309 most-specific-group rule)
    txt = ("User-agent: abot\n"
           "User-agent: bbot\n"
           "Disallow: /x\n"
           "\n"
           "User-agent: *\n"
           "Disallow: /\n")
    _robots_check(spark, txt, "BBot",  # agent match is case-insensitive
                  [("/x/1", False), ("/y", True)])
    _robots_check(spark, txt, "cbot", [("/x/1", False), ("/y", False)])


def test_robots_empty_disallow_and_orphans(spark):
    # empty Disallow = unrestricted; rules before any UA line are
    # ignored; comments stripped; unknown directives don't split groups
    txt = ("Disallow: /orphan\n"
           "User-agent: *  # trailing comment\n"
           "Crawl-delay: 5\n"
           "Disallow:\n"
           "Allow: /a\n")
    _robots_check(spark, txt, "anybot",
                  [("/orphan/x", True), ("/a/b", True), ("/z", True)])


def test_robots_no_rules_host_defaults(spark):
    rules = urltools.parse_robots(
        spark.createDataFrame([("other.com", "User-agent: *\nDisallow: /\n")],
                              "host string, robots_txt string"))
    urls = spark.createDataFrame(
        [("bare.com", "/x")], "host string, path string")
    out = urltools.filter_robots_allowed(
        urls, rules, annotate_only=True).collect()
    assert out[0].robots_allowed is True
    denied = urltools.filter_robots_allowed(
        urls, rules, default_allow=False).collect()
    assert denied == []


def test_robots_bom_prefixed_file(spark):
    # UTF-8 BOM survives a utf-8/replace decode as ﻿; it must not
    # orphan the first User-agent line (review r5: silent compliance
    # failure — every Disallow was dropped)
    txt = "\ufeffUser-agent: *\nDisallow: /\n"
    _robots_check(spark, txt, "anybot", [("/x", False)])


def test_robots_explicit_allow_all_vs_absent(spark):
    # 'Disallow:' (explicit allow-all) must be distinguishable from no
    # robots.txt: default_allow=False denies only the ABSENT host
    rules = urltools.parse_robots(
        spark.createDataFrame(
            [("open.com", "User-agent: *\nDisallow:\n")],
            "host string, robots_txt string"))
    urls = spark.createDataFrame(
        [("open.com", "/x"), ("silent.com", "/x")],
        "host string, path string")
    got = {r.host: r.robots_allowed
           for r in urltools.filter_robots_allowed(
               urls, rules, default_allow=False,
               annotate_only=True).collect()}
    assert got == {"open.com": True, "silent.com": False}


def test_robots_unmatched_path_is_rfc_allowed_under_default_deny(spark):
    # a host WITH robots data allows unmatched paths per RFC 9309 even
    # under the deny-unless-robots-observed policy
    rules = urltools.parse_robots(
        spark.createDataFrame(
            [("h.com", "User-agent: *\nDisallow: /private/\n")],
            "host string, robots_txt string"))
    urls = spark.createDataFrame(
        [("h.com", "/public/x"), ("h.com", "/private/x")],
        "host string, path string")
    got = {r.path: r.robots_allowed
           for r in urltools.filter_robots_allowed(
               urls, rules, default_allow=False,
               annotate_only=True).collect()}
    assert got == {"/public/x": True, "/private/x": False}


def test_robots_duplicate_host_rows_deterministic(spark):
    # two captures of one host must not interleave their line numbers
    # (review r5); the parser collapses to ONE body deterministically
    a = "User-agent: *\nDisallow: /a/\n"
    b = "User-agent: *\nDisallow: /b/\n"
    for order in ([a, b], [b, a]):
        rules = urltools.parse_robots(
            spark.createDataFrame([("h.com", t) for t in order],
                                  "host string, robots_txt string"))
        rows = rules.collect()
        assert len(rows) == 1
        pats = sorted(r["pattern"] for r in rows[0].rules)
        # lexicographic max of the two bodies is the 'b' file
        assert pats == ["^/b/"], pats


# ---------------------------------------------------------------------------
# sitemap parsing
# ---------------------------------------------------------------------------

def test_sitemap_entries_kinds_and_entities(spark):
    xml = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc>https://a.com/p?x=1&amp;y=2</loc>"
        "<lastmod>2026-01-02</lastmod><priority>0.8</priority></url>"
        "<url><loc> https://a.com/padded </loc></url>"
        "<url><lastmod>2026-01-01</lastmod></url>"  # no loc → dropped
        "</urlset>"
        "<sitemap><loc>https://a.com/maps/1.xml</loc></sitemap>"
        "<loc>https://stray.example/x</loc>")  # outside any block
    df = spark.createDataFrame([(1, xml)], "id int, sitemap_xml string")
    rows = {(r.loc, r.kind): (r.lastmod, r.priority)
            for r in urltools.sitemap_entries(df).collect()}
    assert rows == {
        ("https://a.com/p?x=1&y=2", "url"): ("2026-01-02", "0.8"),
        ("https://a.com/padded", "url"): ("", ""),
        ("https://a.com/maps/1.xml", "sitemap"): ("", ""),
    }


def test_sitemap_entity_decode_order(spark):
    # &amp;lt; is a literal '&lt;' — the ampersand decode must run LAST
    xml = "<url><loc>https://a.com/p?q=&amp;lt;tag&amp;gt;</loc></url>"
    df = spark.createDataFrame([(1, xml)], "id int, sitemap_xml string")
    row = urltools.sitemap_entries(df).collect()[0]
    assert row.loc == "https://a.com/p?q=&lt;tag&gt;"


def test_sitemap_null_and_caseless(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "<URLSET><URL><LOC>https://b.io/x</LOC></URL>"
                        "</URLSET>")],
        "id int, sitemap_xml string")
    rows = urltools.sitemap_entries(df).collect()
    assert [(r.id, r.loc) for r in rows] == [(2, "https://b.io/x")]
