"""Raw crawl HTML → the engine's interleaved span table.

The whole engine runs over one table shape — ``(doc_id,
spans:array<struct<kind,text,media_ref,offset>>)`` (BASELINE.json
input_hint; the reference ingests the same shape one upload at a time,
`app/routers/resumes.py`). This module is the ingest step that
PRODUCES that shape from crawled pages: each document's visible text
becomes ``text`` spans and each ``<img src>`` becomes an ``image``
span whose ``media_ref`` is the source URL (for the fetch/blob-resolve
stage) and whose ``text`` carries the entity-decoded ``alt`` caption,
all in document order with 0-based ``offset``. The output feeds
``operators.extract`` directly — its kind dispatch already routes
``text`` and ``image``.

Distributed shape: pure Column ops end to end — one regex scrub
(script/style/noscript/comment blocks), one split on ``<img>`` tags,
one ``regexp_extract_all`` of the tags, then array transform /
flatten / filter / renumber. ZERO shuffles, zero Python, whole-stage
codegen; a 100 TB ingest is scan-shaped. Every regex is in the
RE2 ∩ Java subset so the DuckDB oracle mirrors 1:1.

Semantics (regex-grade, same documented limits as
``operators.structured``):

- ``src``/``alt`` accept all three HTML attribute styles (double-,
  single-, and un-quoted), double-quote winning within a tag.
- An ``<img>`` with no usable ``src`` is dropped (nothing to fetch);
  a text chunk that cleans to empty is dropped — offsets renumber
  over the survivors, so span sequences stay gap-free.
- Text cleaning is the shared chain: tag-strip FIRST (so ``&lt;``
  cannot manufacture strippable tags), the five XML entities, then
  the explicit RE2∩Java whitespace class collapse.
- Boilerplate is NOT removed here — compose
  ``htmlcodec.strip_boilerplate`` / the jusText gate upstream when
  curation wants main content only; ingest stays lossless-ish.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# block elements whose CONTENT must never leak into text spans; one
# alternation (RE2 has no backreferences) + HTML comments
_SCRUB_RE = (r"(?is)<script(?:\s[^>]*)?>.*?</script\s*>"
             r"|<style(?:\s[^>]*)?>.*?</style\s*>"
             r"|<noscript(?:\s[^>]*)?>.*?</noscript\s*>"
             r"|<!--.*?-->")
# void element: '<img>' or '<img …>' ('/' before '>' sits in [^>]*)
_IMG_TAG_RE = r"(?is)<img(?:\s[^>]*)?>"


def _attr_expr(tag, name: str) -> "F.Column":
    """First ``name=`` attribute value in a tag, any of the three HTML
    quote styles; '' when absent. Mirrors the per-style regex pairs of
    linkgraph/urltools (RE2-safe, no backreference)."""
    dq = F.coalesce(F.regexp_extract(
        tag, rf"(?is)\s{name}\s*=\s*\"([^\"]*)\"", 1), F.lit(""))
    sq = F.coalesce(F.regexp_extract(
        tag, rf"(?is)\s{name}\s*=\s*'([^']*)'", 1), F.lit(""))
    uq = F.coalesce(F.regexp_extract(
        tag, rf"(?is)\s{name}\s*=\s*([^\s\"'>]+)", 1), F.lit(""))
    return F.when(dq != "", dq).when(sq != "", sq).otherwise(uq)


def _span_struct(kind, text, media_ref, offset) -> "F.Column":
    return F.struct(kind.alias("kind"), text.alias("text"),
                    media_ref.alias("media_ref"),
                    offset.cast("int").alias("offset"))


def html_to_spans(pages: DataFrame, html_col: str = "html",
                  id_col: str = "doc_id") -> DataFrame:
    """``(doc_id, html)`` → ``(doc_id, spans)`` in the engine's
    interleaved table shape (see module docstring)."""
    from resume_ocr_spark.operators.structured import _cell_text_expr

    html = F.coalesce(F.col(html_col), F.lit(""))
    scrubbed = F.regexp_replace(html, _SCRUB_RE, "")
    imgs = F.regexp_extract_all(scrubbed, F.lit(_IMG_TAG_RE), 0)

    def paired(chunk, i):
        # chunk i, then img i (when one follows it) — document order
        img = F.element_at(imgs, (i + 1).cast("int"))
        return F.array(
            _span_struct(F.lit("text"), _cell_text_expr(chunk),
                         F.lit(""), F.lit(0)),
            F.when(i < F.size(imgs), _span_struct(
                F.lit("image"), _cell_text_expr(_attr_expr(img, "alt")),
                _attr_expr(img, "src"), F.lit(0))))

    flat = F.filter(
        F.flatten(F.transform(F.split(scrubbed, _IMG_TAG_RE, -1), paired)),
        lambda s: s.isNotNull() & (
            ((s["kind"] == "text") & (s["text"] != ""))
            | ((s["kind"] == "image") & (s["media_ref"] != ""))))
    spans = F.transform(flat, lambda s, i: _span_struct(
        s["kind"], s["text"], s["media_ref"], i))
    return pages.select(F.col(id_col).alias("doc_id"),
                        spans.alias("spans"))


def span_rows(spans_df: DataFrame) -> DataFrame:
    """Exploded twin — one row per span ``(doc_id, offset, kind, text,
    media_ref)``, the flat surface the north rule's span-sequence
    equality check (and the SQL oracle) compares on."""
    return (spans_df
            .select("doc_id", F.explode("spans").alias("s"))
            .select("doc_id", F.col("s.offset").alias("offset"),
                    F.col("s.kind").alias("kind"),
                    F.col("s.text").alias("text"),
                    F.col("s.media_ref").alias("media_ref")))
