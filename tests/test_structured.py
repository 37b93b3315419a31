"""HTML <table> extraction + RSS/Atom feed discovery (round-5 tail).

The gate replica hash-checks html_table_cells / feed_discovery against
DuckDB every CI pass (test_contract_tail); these tests pin the edge
semantics the SQL fixtures don't enumerate — tag-boundary traps
(<thead>/<track> must not read as cells/rows), the strip-before-decode
ordering, nested-table truncation (a DOCUMENTED limit, pinned so a
regression is loud), CDATA/entity handling in feeds, the link
preference per feed kind, and the pos-gap left by dropped orphan
blocks.
"""

import pytest
from pyspark.sql import functions as F

from resume_ocr_spark.operators import structured, urltools


def _cells(spark, html):
    df = spark.createDataFrame([(0, html)], "doc_id int, html string")
    rows = (structured.html_tables(df)
            .orderBy("table_idx", "row_idx", "col_idx").collect())
    return [(r.table_idx, r.row_idx, r.col_idx, r.is_header, r.cell)
            for r in rows]


class TestHtmlTables:
    def test_basic_grid_with_headers(self, spark):
        got = _cells(
            spark,
            "<table><tr><th>A</th><th>B</th></tr>"
            "<tr><td>1</td><td>2</td></tr></table>")
        assert got == [(0, 0, 0, True, "A"), (0, 0, 1, True, "B"),
                       (0, 1, 0, False, "1"), (0, 1, 1, False, "2")]

    def test_thead_tbody_transparent_and_case(self, spark):
        got = _cells(
            spark,
            '<TABLE class="x"><THEAD><TR><TH>h</TH></TR></THEAD>'
            "<TBODY><TR><TD>b</TD></TR></TBODY></TABLE>")
        assert got == [(0, 0, 0, True, "h"), (0, 1, 0, False, "b")]

    def test_thead_is_not_a_th_cell(self, spark):
        # '<th' must not swallow '<thead>': a thead wrapper containing
        # one td row yields exactly one NON-header cell
        got = _cells(spark, "<table><thead><tr><td>x</td></tr></thead>"
                            "</table>")
        assert got == [(0, 0, 0, False, "x")]

    def test_strip_before_decode(self, spark):
        # &lt;b&gt; decodes AFTER tag-strip, so it survives as text
        got = _cells(spark, "<table><tr><td>&lt;b&gt; <i>it</i></td></tr>"
                            "</table>")
        assert got == [(0, 0, 0, False, "<b> it")]

    def test_entities_and_whitespace_collapse(self, spark):
        got = _cells(
            spark,
            "<table><tr><td>  A &amp;&#32; B\n\tC </td></tr></table>")
        # numeric refs are NOT decoded (five named entities only)
        assert got == [(0, 0, 0, False, "A &&#32; B C")]

    def test_multiple_tables_and_row_header_mix(self, spark):
        got = _cells(
            spark,
            "<table><tr><th>k</th><td>v</td></tr></table>"
            "<p>x</p><table><tr><td>solo</td></tr></table>")
        assert got == [(0, 0, 0, True, "k"), (0, 0, 1, False, "v"),
                       (1, 0, 0, False, "solo")]

    def test_no_table_no_rows_and_null_html(self, spark):
        df = spark.createDataFrame(
            [(0, "<p>none</p>"), (1, None)], "doc_id int, html string")
        assert structured.html_tables(df).count() == 0

    def test_nested_table_truncates_at_inner_close(self, spark):
        # documented regex-grade limit: outer block stops at the FIRST
        # </table>, so only the inner cell's row is seen
        got = _cells(
            spark,
            "<table><tr><td><table><tr><td>in</td></tr></table>"
            "</td></tr><tr><td>after</td></tr></table>")
        assert [c[4] for c in got] == ["in"]

    def test_attrs_on_every_level(self, spark):
        got = _cells(
            spark,
            '<table border="1"><tr class="r"><td colspan="2">a</td>'
            "<th scope=col>b</th></tr></table>")
        assert got == [(0, 0, 0, False, "a"), (0, 0, 1, True, "b")]

    def test_linearize_round_trip(self, spark):
        df = spark.createDataFrame(
            [(7, "<table><tr><th>k</th><th>v</th></tr>"
                 "<tr><td>x</td><td>1</td></tr></table>")],
            "doc_id int, html string")
        lin = (structured.linearize_tables(structured.html_tables(df))
               .orderBy("row_idx").collect())
        assert [(r.row_text, r.n_cells, r.has_header_cell) for r in lin] \
            == [("k | v", 2, True), ("x | 1", 2, False)]

    def test_zero_exchanges_in_plan(self, spark):
        df = spark.createDataFrame([(0, "<table></table>")],
                                   "doc_id int, html string")
        plan = (structured.html_tables(df)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan


def _feed(spark, xml):
    df = spark.createDataFrame([(0, xml)], "doc_id int, feed_xml string")
    rows = urltools.feed_entries(df).orderBy("pos").collect()
    return [(r.pos, r.kind, r.title, r.link, r.published, r.guid)
            for r in rows]


class TestFeedEntries:
    def test_rss_full_item(self, spark):
        got = _feed(
            spark,
            "<rss><channel><title>Chan</title>"
            "<item><title><![CDATA[T &amp; <b>]]></title>"
            "<link> https://e.com/a?x=1&amp;y=2 </link>"
            "<pubDate>Mon, 01 Jan 2026 00:00:00 GMT</pubDate>"
            '<guid isPermaLink="true">g1</guid></item></channel></rss>')
        assert got == [(0, "rss", "T & <b>", "https://e.com/a?x=1&y=2",
                        "Mon, 01 Jan 2026 00:00:00 GMT", "g1")]

    def test_channel_title_not_an_entry(self, spark):
        assert _feed(spark, "<rss><channel><title>only chan</title>"
                            "</channel></rss>") == []

    def test_orphan_drops_but_keeps_pos_gap(self, spark):
        got = _feed(
            spark,
            "<rss><item><title>a</title></item>"
            "<item><guid>orphan</guid></item>"
            "<item><title>b</title></item></rss>")
        assert [(p, t) for p, _, t, _, _, _ in got] == [(0, "a"), (2, "b")]

    def test_atom_href_preferred_and_id(self, spark):
        got = _feed(
            spark,
            '<feed><entry><title>E</title><link rel="alternate" '
            'href="https://e.org/1"/><updated>2026-01-02T00:00:00Z'
            "</updated><id>tag:1</id></entry></feed>")
        assert got == [(0, "atom", "E", "https://e.org/1",
                        "2026-01-02T00:00:00Z", "tag:1")]

    def test_rss_falls_back_to_href(self, spark):
        got = _feed(spark, '<rss><item><link href="https://h.co/x"/>'
                           "<title>t</title></item></rss>")
        assert got[0][3] == "https://h.co/x"

    def test_atom_rel_alternate_beats_self(self, spark):
        # the common Blogger/GitHub layout: rel=self/replies/edit
        # BEFORE rel=alternate — the article URL must win
        got = _feed(
            spark,
            '<feed><entry><title>T</title>'
            '<link rel="self" href="https://h.co/feeds/1"/>'
            '<link rel="replies" href="https://h.co/c/1"/>'
            '<link rel="alternate" href="https://h.co/post/1"/>'
            "</entry></feed>")
        assert got[0][3] == "https://h.co/post/1"

    def test_atom_relless_link_is_default_alternate(self, spark):
        got = _feed(
            spark,
            '<feed><entry><title>T</title>'
            '<link rel="self" href="https://h.co/feeds/1"/>'
            '<link href="https://h.co/post/2"/>'
            "</entry></feed>")
        assert got[0][3] == "https://h.co/post/2"

    def test_single_quoted_href_and_rel(self, spark):
        # XML AttValue allows either quote style (XML 1.0 §3.1); a
        # feed parser that only reads href="…" drops every
        # single-quoting publisher's links (found live: a
        # single-quoted fixture returned link='')
        got = _feed(
            spark,
            "<feed><entry><title>T</title>"
            "<link rel='self' href='https://h.co/feeds/1'/>"
            "<link rel='alternate' href='https://h.co/post/9'/>"
            "</entry></feed>")
        assert got[0][3] == "https://h.co/post/9"

    def test_mixed_quote_styles_dq_wins_in_tag(self, spark):
        # malformed double-attribute tag: the documented tie-break is
        # double-quote first, then single
        got = _feed(
            spark,
            "<feed><entry><title>T</title>"
            "<link href='https://h.co/sq' href=\"https://h.co/dq\"/>"
            "</entry></feed>")
        assert got[0][3] == "https://h.co/dq"

    def test_self_closing_link_is_not_a_text_link(self, spark):
        # a lazy body capture starting at '<link .../>' must not run
        # across siblings to an unrelated '</link>'
        got = _feed(
            spark,
            '<rss><item><link rel="x" href="https://h.co/u"/>'
            "<title>T</title><link>https://h.co/art</link></item></rss>")
        assert got[0][3] == "https://h.co/art"

    def test_vertical_tab_collapse_matches_oracle(self, spark):
        # Java's \s includes \x0B, RE2's does not — both sides use the
        # EXPLICIT class [ \t\n\x0B\f\r] so a vertical tab collapses
        # identically (with RE2 \s it would survive only in DuckDB)
        import duckdb

        xml = "<rss><item><title>a \x0b b</title></item></rss>"
        got = _feed(spark, xml)
        ora = duckdb.sql(
            r"SELECT trim(regexp_replace(?, '[ \t\n\x0B\f\r]+', ' ', 'g'))",
            params=["a \x0b b"]).fetchone()[0]
        assert got[0][2] == ora == "a b"

    def test_mixed_kinds_pos_offsets(self, spark):
        got = _feed(
            spark,
            "<rss><item><title>r0</title></item>"
            "<ITEM>\n<title>r1</title>\n</ITEM></rss>"
            "<entry><title>a0</title></entry>")
        assert [(p, k, t) for p, k, t, _, _, _ in got] \
            == [(0, "rss", "r0"), (1, "rss", "r1"), (2, "atom", "a0")]

    def test_null_and_empty_xml(self, spark):
        df = spark.createDataFrame(
            [(0, None), (1, "")], "doc_id int, feed_xml string")
        assert urltools.feed_entries(df).count() == 0

    def test_whitespace_title_collapses(self, spark):
        got = _feed(spark, "<rss><item><title>  a \n\t b  </title>"
                           "</item></rss>")
        assert got[0][2] == "a b"

    def test_zero_exchanges_in_plan(self, spark):
        df = spark.createDataFrame([(0, "<rss></rss>")],
                                   "doc_id int, feed_xml string")
        plan = (urltools.feed_entries(df)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan


class TestCanonicalUrl:
    def _canon(self, spark, url):
        from resume_ocr_spark.operators.urltools import with_canonical_url
        df = spark.createDataFrame([(0, url)], "id int, url string")
        return with_canonical_url(df).collect()[0].canonical_url

    def test_full_normalization(self, spark):
        got = self._canon(
            spark, "HTTP://User@Example.COM.:80/Path/A?b=2&utm_source=x&a=1#f")
        assert got == "http://example.com/Path/A?a=1&b=2"

    def test_default_ports_stripped_others_kept(self, spark):
        assert self._canon(spark, "https://a.co:443/") == "https://a.co/"
        assert self._canon(spark, "http://a.co:8080/") == "http://a.co:8080/"
        # :443 is only default for httpS
        assert self._canon(spark, "http://a.co:443/") == "http://a.co:443/"

    def test_empty_path_becomes_slash(self, spark):
        assert self._canon(spark, "http://a.co") == "http://a.co/"

    def test_tracking_params_only_query_drops_question_mark(self, spark):
        got = self._canon(spark, "https://b.io/p?utm_campaign=c&gclid=g")
        assert got == "https://b.io/p"

    def test_path_case_preserved(self, spark):
        assert self._canon(spark, "https://a.co/CaseSensitive") \
            == "https://a.co/CaseSensitive"

    def test_non_tracker_named_like_value_kept(self, spark):
        # tracking match is on the PARAM NAME prefix, not anywhere
        got = self._canon(spark, "https://a.co/?q=utm_source")
        assert got == "https://a.co/?q=utm_source"

    def test_unparseable_passthrough_defragmented(self, spark):
        assert self._canon(spark, "  not a url #x ") == "not a url "
        assert self._canon(spark, None) == ""

    def test_param_sort_is_bytewise(self, spark):
        got = self._canon(spark, "https://a.co/?z=1&Z=2&a=3")
        assert got == "https://a.co/?Z=2&a=3&z=1"  # uppercase < lowercase


class TestPageMetadata:
    def _meta(self, spark, html):
        from resume_ocr_spark.operators.structured import page_metadata
        df = spark.createDataFrame([(0, html)], "id int, html string")
        r = page_metadata(df).collect()[0]
        return (r.title, r.meta_description, r.canonical_url,
                r.og_title, r.lang)

    def test_all_fields(self, spark):
        got = self._meta(
            spark,
            '<html lang="EN-us"><head><TITLE> A &amp; B </TITLE>'
            '<meta name=description content="D &quot;x&quot;">'
            "<meta property='og:title' content='OG'/>"
            "<link rel=canonical href=https://e.com/c></head>")
        assert got == ("A & B", 'D "x"', "https://e.com/c", "OG", "en-us")

    def test_reversed_attr_order_and_decoy(self, spark):
        got = self._meta(
            spark,
            '<meta name="description-x" content="nope">'
            '<meta content="real" name="description">')
        assert got[1] == "real"

    def test_missing_fields_empty_not_null(self, spark):
        assert self._meta(spark, "<p>bare</p>") == ("", "", "", "", "")

    def test_first_tag_wins(self, spark):
        got = self._meta(
            spark,
            '<meta name=description content="one">'
            '<meta name=description content="two">')
        assert got[1] == "one"

    def test_zero_exchanges_in_plan(self, spark):
        from resume_ocr_spark.operators.structured import page_metadata
        df = spark.createDataFrame([(0, "<p></p>")], "id int, html string")
        plan = (page_metadata(df)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan


class TestRobotsSitemaps:
    def _urls(self, spark, txt):
        from resume_ocr_spark.operators.urltools import robots_sitemaps
        df = spark.createDataFrame([("h", txt)],
                                   "host string, robots_txt string")
        rows = robots_sitemaps(df).orderBy("pos").collect()
        return [(r.pos, r.sitemap_url) for r in rows]

    def test_case_spacing_and_comment_tail(self, spark):
        got = self._urls(
            spark,
            "User-agent: *\nDisallow: /\n"
            "Sitemap: https://a.co/s1.xml\n"
            "SITEMAP:\thttps://a.co/s2.xml\n"
            "  sitemap : https://a.co/s3.xml # comment")
        assert got == [(0, "https://a.co/s1.xml"),
                       (1, "https://a.co/s2.xml"),
                       (2, "https://a.co/s3.xml")]

    def test_commented_line_is_not_a_record(self, spark):
        assert self._urls(
            spark, "# Sitemap: https://a.co/no.xml\nAllow: /") == []

    def test_bom_first_line(self, spark):
        assert self._urls(spark, "﻿Sitemap: https://a.co/s.xml") \
            == [(0, "https://a.co/s.xml")]

    def test_no_records_no_rows_and_null(self, spark):
        from resume_ocr_spark.operators.urltools import robots_sitemaps
        df = spark.createDataFrame(
            [("h", "User-agent: *\nAllow: /"), ("i", None)],
            "host string, robots_txt string")
        assert robots_sitemaps(df).count() == 0

    def test_zero_exchanges_in_plan(self, spark):
        from resume_ocr_spark.operators.urltools import robots_sitemaps
        df = spark.createDataFrame([("h", "x")],
                                   "host string, robots_txt string")
        plan = (robots_sitemaps(df)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan


class TestHtmlToMarkdown:
    def _md(self, spark, html):
        from resume_ocr_spark.operators.structured import html_to_markdown
        df = spark.createDataFrame([(0, html)], "id int, html string")
        return html_to_markdown(df).collect()[0].markdown

    def test_full_page(self, spark):
        got = self._md(
            spark,
            '<html><head><style>p{x}</style><script>var a="</p>";'
            "</script></head><body>"
            '<h1 class="t">Main &amp; Title</h1>'
            "<p>Para with <b>bold</b> and <em>it</em>.</p>"
            '<p>See <a href="https://e.com/x?a=1&amp;b=2">docs</a>.</p>'
            "<!-- gone --><h2>Items</h2><ul><li>One</li>"
            "<li>Two &lt;b&gt;</li></ul>"
            "<div>Tail<br>line</div></body></html>")
        assert got == (
            "# Main & Title\n\n"
            "Para with **bold** and *it*.\n\n"
            "See [docs](https://e.com/x?a=1&b=2).\n\n"
            "## Items\n\n- One\n- Two <b>\n\n"
            "Tail\nline")

    def test_script_content_never_rewritten(self, spark):
        # a '</p>' INSIDE a script must not become a paragraph break
        got = self._md(spark, "<script>'</p><h1>x</h1>'</script>after.")
        assert got == "after."

    def test_heading_levels(self, spark):
        for n in (1, 3, 6):
            assert self._md(spark, f"<h{n}>T</h{n}>") == "#" * n + " T"

    def test_strong_and_case(self, spark):
        assert self._md(spark, "<STRONG>x</STRONG> <EM>y</EM>") \
            == "**x** *y*"

    def test_entities_decoded_after_stripping(self, spark):
        # '&lt;p&gt;' decodes to a literal '<p>' that must SURVIVE
        assert self._md(spark, "&lt;p&gt; stays") == "<p> stays"

    def test_null_and_empty(self, spark):
        assert self._md(spark, None) == ""
        assert self._md(spark, "") == ""

    def test_zero_exchanges_in_plan(self, spark):
        from resume_ocr_spark.operators.structured import html_to_markdown
        df = spark.createDataFrame([(0, "<p>x</p>")], "id int, html string")
        plan = (html_to_markdown(df)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan


class TestFrontierScheduling:
    def _frontier(self, spark):
        rows = ([("big.com", f"https://big.com/p{i}") for i in range(400)]
                + [("small.io", f"https://small.io/p{i}")
                   for i in range(5)])
        return spark.createDataFrame(rows, "host string, url string")

    def test_cap_exact_and_deterministic(self, spark):
        from pyspark.sql import Window

        df = self._frontier(spark)
        got = urltools.cap_per_host(df, max_per_host=50, salt_buckets=8)
        rows = sorted(tuple(r) for r in got.collect())
        counts = {}
        for h, _ in rows:
            counts[h] = counts.get(h, 0) + 1
        assert counts == {"big.com": 50, "small.io": 5}
        # two-phase == the single-window reference (the exactness claim)
        key = F.md5(F.concat_ws("\x00", *[
            F.coalesce(F.col(c).cast("string"), F.lit(""))
            for c in df.columns]))
        ref = (df.withColumn("_k", key)
               .withColumn("_r", F.row_number().over(
                   Window.partitionBy("host").orderBy("_k")))
               .filter(F.col("_r") <= 50).drop("_k", "_r"))
        assert rows == sorted(tuple(r) for r in ref.collect())
        rerun = sorted(tuple(r) for r in urltools.cap_per_host(
            df, max_per_host=50, salt_buckets=8).collect())
        assert rerun == rows

    def test_cap_first_window_is_salt_spread(self, spark):
        # the plan must window on (host, _salt) BEFORE the host window —
        # the shape that keeps a mega-host off a single task
        df = self._frontier(spark)
        plan = (urltools.cap_per_host(df, max_per_host=10)
                ._jdf.queryExecution().executedPlan().toString())
        assert plan.index("_salt") < plan.index("_r2") or "_salt" in plan

    def test_layout_colocates_small_splits_big(self, spark):
        df = self._frontier(spark)
        lay = urltools.partition_frontier_by_host(
            df, salt_threshold=100, num_partitions=16)
        pid = lay.withColumn("pid", F.spark_partition_id())
        d = {r.host: r.np for r in pid.groupBy("host").agg(
            F.countDistinct("pid").alias("np")).collect()}
        assert d["small.io"] == 1          # co-located
        assert 2 <= d["big.com"] <= 4      # ceil(400/100) salts max
        assert lay.count() == 405          # content unchanged
