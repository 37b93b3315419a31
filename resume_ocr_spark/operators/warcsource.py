"""WARC ingest operator: binary crawl members → typed record rows.

The ingest edge of the web-scale pipeline: a DataFrame with a binary
WARC column (one crawl FILE or gzip member group per row — exactly how
Common Crawl shards land in object storage) fans out to one row per
contained WARC record with the fields the downstream stages key on
(target URI for :mod:`.urltools`, content type for kind dispatch, HTTP
status + body for :mod:`.extract`'s HTML stages).

100 TB shape: ``mapInPandas`` Arrow batch UDF, no shuffle — record
explosion happens inside the scan, and each input blob is independent
(Spark parallelism = input files, the natural crawl partitioning).
Malformed containers become ERROR ROWS naming the violated invariant
(the codec contract: poisoned inputs must never fail tasks); individual
record payloads that fail the HTTP split degrade to a per-record error.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..formats import warcformat

RECORD_SCHEMA = (
    "doc_id long, rec_idx int, warc_type string, target_uri string, "
    "content_type string, http_status int, n_payload_bytes int, "
    "text_head string, error string"
)
TEXT_HEAD_CHARS = 64


def warc_records(
    df: DataFrame, bin_col: str = "warc", id_col: str = "doc_id"
) -> DataFrame:
    """One row per WARC record found in each blob of ``bin_col``.

    Output: ``(doc_id, rec_idx, warc_type, target_uri, content_type,
    http_status, n_payload_bytes, text_head, error)`` — ``http_status``
    and the body-derived fields come from the ``application/http`` split
    when the record wraps an HTTP message, from the bare payload
    otherwise; ``text_head`` is the first 64 chars of the (UTF-8,
    replace) body. A malformed blob yields ONE error row for that blob;
    a NULL blob likewise (error-as-data totality)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "rec_idx", "warc_type", "target_uri",
                "content_type", "http_status", "n_payload_bytes",
                "text_head", "error"]
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[bin_col]):
                if blob is None:
                    rows.append((doc_id, None, None, None, None, None,
                                 None, None, "null payload"))
                    continue
                try:
                    recs = warcformat.parse_warc(bytes(blob))
                except warcformat.WarcError as exc:
                    rows.append((doc_id, None, None, None, None, None,
                                 None, None, str(exc)))
                    continue
                for i, rec in enumerate(recs):
                    try:
                        status, _, body = warcformat.split_http_payload(
                            rec["payload"])
                        err = None
                    except warcformat.WarcError as exc:
                        status, body, err = None, b"", str(exc)
                    head = body[:4 * TEXT_HEAD_CHARS].decode(
                        "utf-8", "replace")[:TEXT_HEAD_CHARS]
                    rows.append((
                        doc_id, i, rec["warc_type"], rec["target_uri"],
                        rec["content_type"], status,
                        len(rec["payload"]), head, err))
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(parse, schema=RECORD_SCHEMA)


DOC_SCHEMA = (
    "doc_id long, rec_idx int, url string, http_status int, "
    "text string, n_html_bytes int, error string"
)


def warc_html_documents(
    df: DataFrame,
    bin_col: str = "warc",
    id_col: str = "doc_id",
    mode: str = "justext",
) -> DataFrame:
    """The full ingest→extraction coupling: WARC members → main-content
    DOCUMENTS. Keeps ``response`` records whose HTTP message is a
    ``text/html`` 200, decodes the body (UTF-8, replace), strips
    boilerplate with :func:`..formats.htmlcodec.strip_boilerplate`
    (``mode='justext'`` — crawl-class pages — by default), and emits
    ``(doc_id, rec_idx, url, http_status, text, n_html_bytes, error)``
    rows ready for the curation/dedup/selection stages (one
    :mod:`.urltools` pass away from domain triage).

    Same zero-shuffle mapInPandas shape as :func:`warc_records`;
    malformed members and non-keepable records are error rows and
    silent skips respectively (a crawl is MOSTLY non-HTML records —
    warcinfo, requests, metadata — and skipping them is the semantics,
    not an error)."""
    from ..formats import htmlcodec

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "rec_idx", "url", "http_status", "text",
                "n_html_bytes", "error"]
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[bin_col]):
                if blob is None:
                    rows.append((doc_id, None, None, None, None, None,
                                 "null payload"))
                    continue
                try:
                    recs = warcformat.parse_warc(bytes(blob))
                except warcformat.WarcError as exc:
                    rows.append((doc_id, None, None, None, None, None,
                                 str(exc)))
                    continue
                for i, rec in enumerate(recs):
                    if rec["warc_type"] != "response":
                        continue
                    try:
                        status, hdr, body = warcformat.split_http_payload(
                            rec["payload"])
                    except warcformat.WarcError as exc:
                        rows.append((doc_id, i, rec["target_uri"], None,
                                     None, None, str(exc)))
                        continue
                    ctype = hdr.get("content-type", "")
                    if status != 200 or "text/html" not in ctype:
                        continue
                    text = htmlcodec.strip_boilerplate(
                        body.decode("utf-8", "replace"), mode=mode)
                    rows.append((doc_id, i, rec["target_uri"], status,
                                 text, len(body), None))
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(extract, schema=DOC_SCHEMA)
