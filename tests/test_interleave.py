"""HTML → interleaved span ingest (operators/interleave.py): quote
styles, scrub decoys, drop/renumber rules, table-shape compatibility
with the extract pipeline."""

from pyspark.sql import functions as F

from resume_ocr_spark.operators import interleave


def _spans(spark, html):
    df = spark.createDataFrame([("d0", html)], "doc_id string, html string")
    row = interleave.html_to_spans(df).collect()[0]
    return [(s.offset, s.kind, s.text, s.media_ref) for s in row.spans]


class TestHtmlToSpans:
    def test_text_img_interleave_document_order(self, spark):
        got = _spans(
            spark,
            '<p>before</p><img src="https://e.com/a.jpg" alt="cap">'
            "<p>after</p>")
        assert got == [(0, "text", "before", ""),
                       (1, "image", "cap", "https://e.com/a.jpg"),
                       (2, "text", "after", "")]

    def test_all_three_attr_quote_styles(self, spark):
        got = _spans(
            spark,
            '<img src="https://q.co/dq">x'
            "<img src='https://q.co/sq'>y"
            "<img src=https://q.co/uq>z")
        assert [(k, r if k == "image" else t) for _, k, t, r in got] == [
            ("image", "https://q.co/dq"), ("text", "x"),
            ("image", "https://q.co/sq"), ("text", "y"),
            ("image", "https://q.co/uq"), ("text", "z")]

    def test_scrub_blocks_hide_img_decoys(self, spark):
        got = _spans(
            spark,
            '<script>var s = "<img src=a.png>"</script>'
            "<style>.x { background: url(b.png) }</style>"
            "<noscript><img src=c.png></noscript>"
            '<!-- <img src="d.png"> -->real<img src=e.png>')
        assert got == [(0, "text", "real", ""),
                       (1, "image", "", "e.png")]

    def test_srcless_img_dropped_offsets_gapfree(self, spark):
        got = _spans(spark, 'a<img class="noref">b<img src=k.png>')
        assert got == [(0, "text", "a", ""), (1, "text", "b", ""),
                       (2, "image", "", "k.png")]

    def test_adjacent_imgs_empty_chunk_dropped(self, spark):
        got = _spans(spark, "<img src=1.png><img src=2.png>")
        assert [(o, r) for o, _, _, r in got] == [(0, "1.png"), (1, "2.png")]

    def test_alt_entities_and_whitespace(self, spark):
        got = _spans(spark, '<img src=i.png alt="A &amp;  B &lt;x&gt;">')
        assert got == [(0, "image", "A & B <x>", "i.png")]

    def test_text_cleaning_chain(self, spark):
        got = _spans(spark, "<h1>Head &amp;\n\t tail</h1><b>bold</b>")
        assert got == [(0, "text", "Head & tail bold", "")]

    def test_null_and_empty_html(self, spark):
        df = spark.createDataFrame([("a", None), ("b", "")],
                                   "doc_id string, html string")
        rows = interleave.html_to_spans(df).collect()
        assert all(r.spans == [] for r in rows)

    def test_schema_is_the_engine_table_shape(self, spark):
        df = spark.createDataFrame([("d", "x")],
                                   "doc_id string, html string")
        out = interleave.html_to_spans(df)
        assert out.schema["spans"].dataType.simpleString() == (
            "array<struct<kind:string,text:string,media_ref:string,"
            "offset:int>>")

    def test_zero_exchanges_in_plan(self, spark):
        df = spark.createDataFrame([("d", "<p>x</p>")],
                                   "doc_id string, html string")
        plan = (interleave.html_to_spans(df)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan

    def test_feeds_extract_pipeline_directly(self, spark):
        # the produced shape IS the extract input: text spans extract
        # as-is; an image span whose media_ref has no blob becomes an
        # error ROW (error-as-data), never a crash
        from resume_ocr_spark.operators import extract

        df = spark.createDataFrame(
            [("d0", '<p>hello world</p><img src="https://e.com/x.png">')],
            "doc_id string, html string")
        docs = interleave.html_to_spans(df).withColumn(
            "source", F.lit("crawl"))
        blobs = spark.createDataFrame(
            [], "media_ref string, kind string, payload binary")
        out = extract.extract_documents(docs, blobs).collect()[0]
        assert out.full_text.startswith("hello world")
        assert out.parse_failures == 1  # the unresolved media_ref


class TestSpanRows:
    def test_explode_matches_nested(self, spark):
        df = spark.createDataFrame(
            [("a", "x<img src=u.png>y"), ("b", "<p>z</p>")],
            "doc_id string, html string")
        nested = interleave.html_to_spans(df)
        flat = interleave.span_rows(nested).orderBy("doc_id", "offset")
        assert [tuple(r) for r in flat.collect()] == [
            ("a", 0, "text", "x", ""), ("a", 1, "image", "", "u.png"),
            ("a", 2, "text", "y", ""), ("b", 0, "text", "z", "")]
