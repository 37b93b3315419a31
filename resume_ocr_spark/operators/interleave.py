"""Raw crawl HTML → the engine's interleaved span table.

The whole engine runs over one table shape — ``(doc_id,
spans:array<struct<kind,text,media_ref,offset>>)`` (BASELINE.json
input_hint; the reference ingests the same shape one upload at a time —
`app/routers/analysis.py:443-453` files → kind-dispatched spans). This
module is the ingest step that
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


def caption_pairs(spans_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Image–text pair mining over the interleaved table (the
    LAION/OBELICS-style step that turns an interleaved web corpus into
    (image, caption, context) training pairs): one output row per image
    span, carrying its entity-decoded ``alt`` caption plus the adjacent
    text spans as before/after context ('' when the neighbor is another
    image or the document edge).

    Precondition: ``offset`` equals array position (gap-free, as
    ``html_to_spans`` / ``drop_frequent_media`` emit) — neighbors are
    ``F.get`` array lookups, which return NULL (never throw) off either
    edge, so the first/last-span cases fold into the '' default.

    Distributed shape: pure Column ops (filter + transform over the
    spans array, then one explode) — ZERO shuffles; docs without images
    vanish at the explode, so a 100 TB text-mostly crawl costs a scan."""
    spans = F.col("spans")

    def pair(s):
        before = F.get(spans, s["offset"] - 1)
        after = F.get(spans, s["offset"] + 1)
        btxt = F.coalesce(
            F.when(before["kind"] == "text", before["text"]), F.lit(""))
        atxt = F.coalesce(
            F.when(after["kind"] == "text", after["text"]), F.lit(""))
        return F.struct(s["offset"].alias("offset"),
                        s["media_ref"].alias("media_ref"),
                        s["text"].alias("caption"),
                        btxt.alias("context_before"),
                        atxt.alias("context_after"))

    pairs = F.transform(
        F.filter(spans, lambda s: s["kind"] == "image"), pair)
    return (spans_df
            .select(F.col(id_col).alias("doc_id"),
                    F.explode(pairs).alias("p"))
            .select("doc_id", "p.offset", "p.media_ref", "p.caption",
                    "p.context_before", "p.context_after"))


def drop_frequent_media(spans_df: DataFrame, id_col: str = "doc_id",
                        min_docs: int = 2) -> DataFrame:
    """Corpus-level boilerplate-media removal — the span-table analog of
    CCNet/RefinedWeb line dedup (``dedup.remove_duplicate_lines``): an
    image whose ``media_ref`` appears in at least ``min_docs`` distinct
    documents is site chrome (logos, nav sprites, tracking pixels), and
    EVERY copy is dropped (RefinedWeb semantics — no keeper; a logo is
    worth zero training pairs). Text spans are never touched; surviving
    spans renumber gap-free so downstream positional ops
    (:func:`caption_pairs`) stay valid.

    100 TB shape (mirrors ``remove_duplicate_lines``): the explode is
    narrow; the boilerplate set costs one (media_ref, count-distinct-doc)
    aggregation with map-side combine; the span side joins it
    co-partitioned on media_ref (no broadcast — the chrome set scales
    with the number of SITES, i.e. with the corpus); one final shuffle
    regroups spans per document. Docs that lose every span (or had
    none) survive with empty arrays — totality.

    Output: ``(doc_id, spans, n_media_removed, n_spans_total)``."""
    if min_docs < 2:
        raise ValueError("min_docs must be >= 2")
    exploded = spans_df.select(
        F.col(id_col).alias("doc_id"), F.explode_outer("spans").alias("s"))
    chrome = (
        exploded.filter(F.col("s.kind") == "image")
        .groupBy(F.col("s.media_ref").alias("_ref"))
        .agg(F.countDistinct("doc_id").alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("_ref"))
    marked = exploded.join(
        chrome,
        (F.col("s.kind") == "image") & (F.col("s.media_ref") == F.col("_ref")),
        "left").withColumn("_keep", F.col("_ref").isNull())
    # the s-NOT-NULL guard matters: explode_outer emits a NULL s for an
    # EMPTY input array, and F.struct(NULL.field, ...) is a non-null
    # struct of nulls — without the guard an empty doc grows one bogus
    # span instead of staying empty
    kept = F.array_sort(F.collect_list(F.when(
        F.col("_keep") & F.col("s").isNotNull(), F.struct(
        F.col("s.offset").alias("o"), F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref")))))
    renumbered = F.transform(kept, lambda x, i: _span_struct(
        x["kind"], x["text"], x["media_ref"], i))
    return marked.groupBy("doc_id").agg(
        renumbered.alias("spans"),
        F.sum(F.when(F.col("s").isNotNull() & ~F.col("_keep"), 1)
              .otherwise(0)).cast("int").alias("n_media_removed"),
        F.count(F.col("s")).cast("int").alias("n_spans_total"))


def with_span_stats(spans_df: DataFrame) -> DataFrame:
    """Per-document composition metrics over the interleaved table —
    everything an interleaved-corpus quality gate reads, in ONE pass
    over the spans array (three ``F.aggregate``/``F.filter`` folds,
    zero shuffles, scan-shaped at 100 TB):

    ``n_spans, n_text, n_images`` — span counts by kind;
    ``text_chars`` — total visible-text length;
    ``image_fraction`` — n_images / n_spans (0.0 for empty docs);
    ``chars_per_image`` — text_chars / n_images (text_chars when no
    images — the no-image doc is all text);
    ``max_image_run`` — longest run of CONSECUTIVE image spans (the
    OBELICS gallery-page signal: image walls carry no aligned text)."""
    spans = F.col("spans")
    n_spans = F.size(spans)
    n_images = F.size(F.filter(spans, lambda s: s["kind"] == "image"))
    n_text = (n_spans - n_images).cast("int")
    text_chars = F.aggregate(
        spans, F.lit(0).cast("bigint"),
        lambda acc, s: acc + F.when(
            s["kind"] == "text", F.length(s["text"])).otherwise(0))
    # run/best fold: run resets on every non-image span
    run_best = F.aggregate(
        spans,
        F.struct(F.lit(0).cast("int").alias("run"),
                 F.lit(0).cast("int").alias("best")),
        lambda acc, s: F.struct(
            F.when(s["kind"] == "image", acc["run"] + 1)
            .otherwise(0).cast("int").alias("run"),
            F.greatest(
                acc["best"],
                F.when(s["kind"] == "image", acc["run"] + 1)
                .otherwise(0)).cast("int").alias("best")),
        lambda acc: acc["best"])
    return (spans_df
            .withColumn("n_spans", n_spans.cast("int"))
            .withColumn("n_text", n_text)
            .withColumn("n_images", n_images.cast("int"))
            .withColumn("text_chars", text_chars)
            .withColumn("image_fraction", F.round(
                F.when(n_spans > 0, n_images.cast("double") / n_spans)
                .otherwise(0.0), 6))
            .withColumn("chars_per_image", F.round(
                F.when(n_images > 0,
                       F.col("text_chars").cast("double") / n_images)
                .otherwise(F.col("text_chars").cast("double")), 6))
            .withColumn("max_image_run", run_best))


def interleaved_quality(spans_df: DataFrame,
                        min_text_chars: int = 100,
                        max_image_fraction: float = 0.5,
                        max_image_run: int = 3) -> DataFrame:
    """OBELICS-style document gate for an interleaved multimodal corpus
    (Laurençon et al. 2023 §3: drop pages whose structure says the
    images carry no aligned text): first-drop-wins ``drop_reason`` over
    :func:`with_span_stats` —

    ``no_text``     not a single text span (pure image gallery);
    ``too_short``   under ``min_text_chars`` of visible text;
    ``image_wall``  over ``max_image_fraction`` of spans are images;
    ``image_run``   a run of more than ``max_image_run`` consecutive
                    images (carousel/gallery block);
    NULL            keep.

    Same convention as ``curate.curate``: every row survives with its
    reason — filter ``drop_reason IS NULL`` for the keepers. Pure
    Column ops on top of the stats fold; zero shuffles."""
    stats = with_span_stats(spans_df)
    reason = (
        F.when(F.col("n_text") == 0, "no_text")
        .when(F.col("text_chars") < min_text_chars, "too_short")
        .when(F.col("image_fraction") > max_image_fraction, "image_wall")
        .when(F.col("max_image_run") > max_image_run, "image_run"))
    return stats.withColumn("drop_reason", reason)


def pack_interleaved(spans_df: DataFrame, id_col: str = "doc_id",
                     image_token_cost: int = 64,
                     budget: int | None = None,
                     shards: int | None = None) -> DataFrame:
    """Sequence packing for interleaved multimodal documents: a doc's
    token cost is the sum over its spans — text spans at the engine's
    chars/4 BPE estimate (``textstats.with_token_counts``), image spans
    at a fixed ``image_token_cost`` (the patch-token budget a vision
    encoder spends per image, e.g. 64 for a 448px/14-patch-pool model).
    The cost fold is one ``F.aggregate`` over the array (zero shuffles);
    assignment reuses :func:`packing.pack_sequences_from_counts` — the
    same single hash exchange, so multimodal packing costs exactly what
    text packing costs at 100 TB.

    Output matches ``pack_sequences``: ``(doc_id, shard, seq_id,
    n_tokens, seq_offset)``."""
    from resume_ocr_spark.operators import packing

    budget = packing.DEFAULT_BUDGET if budget is None else budget
    shards = packing.DEFAULT_SHARDS if shards is None else shards
    cost = F.aggregate(
        "spans", F.lit(0).cast("bigint"),
        lambda acc, s: acc + F.when(
            s["kind"] == "image", F.lit(image_token_cost)
        ).otherwise(
            F.ceil(F.length(F.regexp_replace(s["text"], r"\s", ""))
                   / F.lit(4.0))).cast("bigint"))
    counts = spans_df.select(F.col(id_col), cost.alias("n_tokens"))
    return packing.pack_sequences_from_counts(
        counts, id_col=id_col, budget=budget, shards=shards)
