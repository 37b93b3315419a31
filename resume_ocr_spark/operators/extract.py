"""Distributed extraction: documents_raw → documents_extracted.

Spark-first redesign of the reference's per-file pipeline
(reference: app/services/analyze_service.py:93-118 fan-out,
app/services/ocr_service.py:20-127 extraction; SURVEY.md §3.1 stage map):

    read documents_raw (bucket-pruned)
      → posexplode spans                       (P2 analog: per-span rows)
      → split by branch                        (F5 kind dispatch — the OCR UDF
                                                only ever sees media spans)
        text  : pure Column ops (no Python)
        html  : mapInPandas boilerplate strip
        media : LEFT join media_blobs (broadcast small dict / AQE skew-join
                otherwise) → repartition on (doc_id, offset) — span-level
                parallelism is the skew salt: a doc with 10^3 media spans
                spreads over the whole stage instead of pinning one task
      → unionByName
      → groupBy(doc_id) collect_list + array_sort(struct(offset, kind,
        media_ref, text, …))                   (order restored by explicit
                                                sort key, never row order)
      → left join doc ids (empty-span docs survive)

Every branch emits the same span-result shape; failures are error *values*
(error-as-data, reference: app/services/analyze_service.py:105-117).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import oracle
from ..config import SKEW_SPAN_THRESHOLD

BROADCAST_CUTOFF_CLUSTER = 64 * 1024 * 1024
BROADCAST_CUTOFF_LOCAL = 256 * 1024 * 1024


def blob_broadcast_cutoff(spark: SparkSession) -> int:
    """Max on-disk blob-dict size to broadcast for the spans⋈media_blobs
    join. Broadcast cost is (dict size × executor count): on a cluster the
    64 MB cutoff caps network fan-out and executor heap; in single-JVM
    local mode there is exactly one copy, so the cutoff rises to 256 MB —
    measured ~8% faster than the shuffle join at 141 MB on this box."""
    master = spark.sparkContext.master or ""
    # "local"/"local[...]" only — "local-cluster[...]" is multi-JVM and
    # must keep the cluster cutoff
    is_single_jvm = master == "local" or master.startswith("local[")
    return BROADCAST_CUTOFF_LOCAL if is_single_jvm else BROADCAST_CUTOFF_CLUSTER


SPAN_RESULT_SCHEMA = (
    "doc_id string, offset int, kind string, media_ref string, "
    "text string, error string, ocr_pages int"
)
_RESULT_COLS = ["doc_id", "offset", "kind", "media_ref", "text", "error", "ocr_pages"]


# --------------------------------------------------------------------------
# batch UDFs (Arrow-transferred; the only Python in the pipeline)
# --------------------------------------------------------------------------

def _html_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ..formats import htmlcodec

    for pdf in batches:
        texts, errors = [], []
        for raw in pdf["text"]:
            if not (raw or "").strip():
                texts.append("")
                errors.append("empty file")
                continue
            try:
                texts.append(htmlcodec.strip_boilerplate(raw))
                errors.append(None)
            except Exception as exc:  # never fail the task on bad input
                texts.append("")
                errors.append(f"unexpected: {exc}")
        out = pdf[["doc_id", "offset", "kind", "media_ref"]].copy()
        out["text"] = texts
        out["error"] = errors
        out["ocr_pages"] = 0
        yield out[_RESULT_COLS]


def _media_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        texts, errors, pages = [], [], []
        for kind, payload in zip(pdf["kind"], pdf["payload"]):
            raw = bytes(payload) if payload is not None else None
            text, error, n = oracle.extract_span(kind, "", "", raw)
            texts.append(text)
            errors.append(error)
            pages.append(n)
        out = pdf[["doc_id", "offset", "kind", "media_ref"]].copy()
        out["text"] = texts
        out["error"] = errors
        out["ocr_pages"] = pages
        yield out[_RESULT_COLS]


# --------------------------------------------------------------------------
# pipeline
# --------------------------------------------------------------------------

def explode_spans(docs_df: DataFrame) -> DataFrame:
    """documents_raw → one row per span (empty-span docs drop out here and
    are restored by the left join in reassemble)."""
    return (
        docs_df
        .select("doc_id", F.explode("spans").alias("span"))
        .select(
            "doc_id",
            F.col("span.offset").alias("offset"),
            F.col("span.kind").alias("kind"),
            F.col("span.text").alias("text"),
            F.col("span.media_ref").alias("media_ref"),
        )
    )


def extract_spans(
    spans_df: DataFrame,
    blobs_df: DataFrame,
    broadcast_blobs: bool = False,
    ocr_partitions: int | None = None,
) -> DataFrame:
    """Per-span extraction, branch-split so each branch's plan is minimal."""
    is_text = F.col("kind") == "text"
    is_html = F.col("kind") == "html"
    is_media = F.col("kind").isin("pdf", "image")

    # text + unsupported-kind branch: one pure-Column scan — whole-stage
    # codegen, zero Python, and one fewer pass over the source than
    # separate branches. Emptiness uses the oracle's Python str.strip()
    # whitespace set (F.trim strips ASCII space only — a '\xa0' span must
    # be "empty file" on both sides, oracle.extract_span parity).
    # NULL-safe routing: a null kind makes every branch predicate SQL
    # NULL, which would silently drop the span — coalesce routes it here
    # with the oracle's "unsupported kind: None".
    from ..textproc import PY_WHITESPACE_CLASS

    stripped_len = F.length(F.regexp_replace(
        F.coalesce(F.col("text"), F.lit("")), PY_WHITESPACE_CLASS, ""))
    text_b = (
        spans_df.filter(
            is_text | ~F.coalesce(is_text | is_html | is_media, F.lit(False)))
        .withColumn(
            "error",
            F.when(~F.coalesce(is_text, F.lit(False)),
                   F.concat(F.lit("unsupported kind: "),
                            F.coalesce(F.col("kind"), F.lit("None"))))
            .when(stripped_len == 0, F.lit("empty file")))
        .withColumn("text", F.when(F.col("error").isNull(), F.col("text"))
                    .otherwise(F.lit("")))
        .withColumn("ocr_pages", F.lit(0))
        .select(_RESULT_COLS)
    )

    html_b = (
        spans_df.filter(is_html)
        .select("doc_id", "offset", "kind", "media_ref", "text")
        .mapInPandas(_html_batches, schema=SPAN_RESULT_SCHEMA)
    )

    # media branch: spread spans, join payloads, batch-extract
    blobs = blobs_df.select("media_ref", "payload")
    # explicit partition count: AQE's coalescing sizes partitions by bytes,
    # but media payloads are tiny relative to their OCR CPU cost — letting it
    # coalesce serializes the whole OCR stage (observed: 6 MB → 1 partition).
    # Chunky tasks: each Python task carries a fixed protocol overhead
    # (~0.27 s measured here), so partitions target seconds of OCR work each;
    # 2× parallelism bounds wave-straggle while span-level hashing spreads
    # the skew tail (a doc with 10³ media spans never pins one task).
    if not ocr_partitions:
        sc = spans_df.sparkSession.sparkContext
        ocr_partitions = sc.defaultParallelism * 2
    media_spans = spans_df.filter(is_media).select(
        "doc_id", "offset", "kind", "media_ref")
    if broadcast_blobs:
        # repartition BEFORE the broadcast join: the shuffle then carries
        # only the narrow span keys, never payload bytes — the map-side
        # join attaches payloads after the exchange, same row distribution
        media = media_spans.repartition(
            ocr_partitions, "doc_id", "offset"
        ).join(F.broadcast(blobs), "media_ref", "left")
        # left join: dangling refs become "missing media blob" error rows
    else:
        # shuffle join repartitions by media_ref anyway; restore span-level
        # distribution afterwards (payload bytes must cross here regardless)
        media = media_spans.join(blobs, "media_ref", "left").repartition(
            ocr_partitions, "doc_id", "offset")
    media_b = media.select(
        "doc_id", "offset", "kind", "media_ref", "payload"
    ).mapInPandas(_media_batches, schema=SPAN_RESULT_SCHEMA)
    # dangling media_ref: payload arrived null → oracle.extract_span returned
    # "missing media blob" (it sees payload=None), so nothing extra needed.

    return text_b.unionByName(html_b).unionByName(media_b)


def reassemble(doc_ids_df: DataFrame, span_results: DataFrame) -> DataFrame:
    """Per-span rows → ordered span array per doc. Order is the explicit
    result key (offset, kind, media_ref, text, error, ocr_pages) —
    FIXTURES.md §7 dup-offset tie-break, oracle.RESULT_SORT_KEY — restored
    with array_sort after the shuffle. Each nullable key field contributes a
    null-coalesced copy plus an is-null flag (null sorts after ''), so two
    spans identical except null-vs-'' still compare deterministically on the
    key alone — struct comparison never reaches the trailing span struct and
    never hits engine-specific NULL ordering; the oracle's Python tuple key
    is the same (value-or-'', is-null) sequence.

    Empty-span docs survive via a null-sentinel row per doc unioned into the
    aggregate (collect_list drops nulls → empty array).  This costs one
    narrow column scan instead of the distinct + left-join it replaces
    (two fewer shuffles and one fewer full pass at cluster scale)."""
    span_struct = F.struct("offset", "kind", "media_ref", "text", "error",
                           "ocr_pages")
    def _nflag(col: str):
        return F.when(F.col(col).isNull(), 1).otherwise(0)

    keyed = F.struct(
        F.col("offset").alias("k_off"),
        F.coalesce(F.col("kind"), F.lit("")).alias("k_kind"),
        _nflag("kind").alias("k_kind_n"),
        F.coalesce(F.col("media_ref"), F.lit("")).alias("k_ref"),
        _nflag("media_ref").alias("k_ref_n"),
        F.coalesce(F.col("text"), F.lit("")).alias("k_text"),
        _nflag("text").alias("k_text_n"),
        F.coalesce(F.col("error"), F.lit("")).alias("k_err"),
        _nflag("error").alias("k_err_n"),
        F.coalesce(F.col("ocr_pages"), F.lit(0)).alias("k_pages"),
        span_struct.alias("span"),
    )
    null_keyed = F.lit(None).cast(
        "struct<k_off:int,k_kind:string,k_kind_n:int,k_ref:string,k_ref_n:int,"
        "k_text:string,k_text_n:int,k_err:string,k_err_n:int,k_pages:int,"
        "span:struct<offset:int,kind:string,media_ref:string,"
        "text:string,error:string,ocr_pages:int>>"
    )
    sentinels = doc_ids_df.select("doc_id").withColumn("kspan", null_keyed)
    rows = span_results.select("doc_id", keyed.alias("kspan"))
    return (
        rows.unionByName(sentinels)
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list("kspan")), lambda x: x["span"]
            ).alias("spans")
        )
    )


def with_doc_text(extracted: DataFrame) -> DataFrame:
    """full_text = newline-join of successful span texts, in span order."""
    ok = F.filter("spans", lambda s: s.error.isNull())
    return extracted.withColumn(
        "full_text", F.array_join(F.transform(ok, lambda s: s.text), "\n")
    ).withColumn(
        "doc_error",
        F.when(F.size("spans") == 0, F.lit("empty document")).when(
            F.size(ok) == 0, F.element_at("spans", 1).error
        ),
    ).withColumn(
        "ocr_pages", F.aggregate(
            "spans", F.lit(0), lambda acc, s: acc + F.coalesce(s.ocr_pages, F.lit(0))
        )
    ).withColumn(
        "parse_failures",
        F.size(F.filter("spans", lambda s: s.error.isNotNull())),
    )


def extract_documents(
    docs_df: DataFrame,
    blobs_df: DataFrame,
    broadcast_blobs: bool = False,
    ocr_partitions: int | None = None,
) -> DataFrame:
    """End-to-end: documents_raw DF → (doc_id, spans, full_text, doc_error,
    ocr_pages, parse_failures)."""
    spans = explode_spans(docs_df)
    results = extract_spans(spans, blobs_df, broadcast_blobs, ocr_partitions)
    return with_doc_text(reassemble(docs_df, results))


def skewed_doc_ids(docs_df: DataFrame, threshold: int = SKEW_SPAN_THRESHOLD) -> DataFrame:
    """Docs whose media-span count exceeds the skew threshold (diagnostic /
    metrics input; the pipeline itself is span-parallel so these don't pin
    tasks, but the metrics table reports them)."""
    return docs_df.select(
        "doc_id",
        F.size(F.filter("spans", lambda s: s.kind.isin("pdf", "image")))
        .alias("media_spans"),
    ).filter(F.col("media_spans") > threshold)


def strip_html_column(
    df: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    mode: str = "tags",
) -> DataFrame:
    """Standalone HTML main-content projection for curation inputs
    (round 5): ``(id_col, html)`` → ``(id_col, text, error)`` via the
    shared pure classifier — ``mode='tags'`` for document-class HTML,
    ``mode='justext'`` for real crawl pages (context-sensitive
    stopword-density classification; see formats/htmlcodec.py).

    Zero-shuffle Arrow batch projection; empty/None input and classifier
    exceptions become error rows."""
    from ..formats import htmlcodec

    if mode not in ("tags", "justext"):
        raise ValueError(f"unknown strip mode: {mode!r}")
    id_type = dict(df.dtypes)[id_col]  # preserve the caller's id type

    def strip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts, errors = [], []
            for raw in pdf[html_col]:
                if not (raw or "").strip():
                    texts.append("")
                    errors.append("empty file")
                    continue
                try:
                    texts.append(htmlcodec.strip_boilerplate(raw, mode=mode))
                    errors.append(None)
                except Exception as exc:  # error-as-data, never task death
                    texts.append("")
                    errors.append(f"unexpected: {exc}")
            out = pdf[[id_col]].copy()
            out["text"] = texts
            out["error"] = errors
            yield out

    return df.select(id_col, html_col).mapInPandas(
        strip, schema=f"{id_col} {id_type}, text string, error string")
