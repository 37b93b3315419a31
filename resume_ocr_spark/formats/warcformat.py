"""WARC (Web ARChive, ISO 28500) container codec — from scratch.

WARC is the native container of web crawls (Common Crawl ships ~100 TB
of them per snapshot), so a 100 TB extraction pipeline's ingest edge is
"binary WARC member → (uri, content-type, payload) records". This module
implements the subset real crawl processing needs:

  * record grammar: ``WARC/1.0`` version line, CRLF-terminated named
    headers, ``Content-Length``-delimited payload block, two-CRLF record
    separator (ISO 28500 §4);
  * per-member gzip (the Common Crawl on-disk form: each record is its
    own gzip member, concatenated — seekable without an index), detected
    by magic and inflated member-by-member via ``unused_data``;
  * ``application/http`` payload splitting: status line + headers + body
    (the shape of every ``response`` record).

Writer + parser are both here so tests and the gate entry can build
deterministic fixtures; parsing failures raise :class:`WarcError` with a
named message (the operator layer converts them to error rows — the
repo's error-as-data codec contract, `formats/jpegcodec.py` precedent).

Reference parity note: the reference app has no crawl surface at all
(it ingests uploaded files, `app/api/routes.py`); this module belongs to
the beyond-reference web-scale tier like operators/urltools.py.
"""

from __future__ import annotations

import zlib

WARC_VERSION = b"WARC/1.0"
_CRLF = b"\r\n"
_FIXED_DATE = "2024-01-01T00:00:00Z"  # deterministic fixtures; callers
#                                       with real timestamps pass their own


class WarcError(ValueError):
    """Malformed WARC data; message names the violated invariant."""


def build_warc(
    records: list[dict],
    gzip_members: bool = False,
    date: str = _FIXED_DATE,
) -> bytes:
    """Serialize records to WARC bytes. Each record dict:
    ``warc_type`` (required: 'warcinfo'/'response'/'resource'/...),
    ``payload`` (required bytes), optional ``target_uri``,
    ``content_type``, ``record_id``. With ``gzip_members`` each record
    becomes its own gzip member (the Common Crawl layout)."""
    out = []
    for i, rec in enumerate(records):
        payload = rec["payload"]
        if not isinstance(payload, (bytes, bytearray)):
            raise TypeError(f"record {i}: payload must be bytes")
        headers = [
            b"WARC-Type: " + rec["warc_type"].encode("ascii"),
            b"WARC-Record-ID: <urn:uuid:"
            + rec.get("record_id", f"rec-{i:08d}").encode("ascii") + b">",
            b"WARC-Date: " + date.encode("ascii"),
            b"Content-Length: " + str(len(payload)).encode("ascii"),
        ]
        if rec.get("target_uri"):
            headers.append(
                b"WARC-Target-URI: " + rec["target_uri"].encode("utf-8"))
        if rec.get("content_type"):
            headers.append(
                b"Content-Type: " + rec["content_type"].encode("ascii"))
        member = (WARC_VERSION + _CRLF + _CRLF.join(headers)
                  + _CRLF + _CRLF + bytes(payload) + _CRLF + _CRLF)
        if gzip_members:
            co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
            member = co.compress(member) + co.flush()
        out.append(member)
    return b"".join(out)


def _gunzip_members(data: bytes) -> bytes:
    """Inflate concatenated gzip members (the seekable crawl layout)."""
    out, rest = [], bytes(data)
    while rest:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out.append(d.decompress(rest))
        except zlib.error as exc:
            raise WarcError(f"warc: corrupt gzip member: {exc}") from exc
        out.append(d.flush())
        if not d.eof:
            raise WarcError("warc: truncated gzip member")
        rest = d.unused_data
    return b"".join(out)


def parse_warc(data: bytes) -> list[dict]:
    """Parse WARC bytes (plain or per-member gzip) into record dicts:
    ``(warc_type, target_uri, content_type, record_id, date, payload)``.
    Strict by design — a malformed container raises :class:`WarcError`
    naming the violated invariant; the operator layer turns that into an
    error ROW, never a task failure."""
    data = bytes(data)
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    records, pos, n = [], 0, len(data)
    while pos < n:
        if not data.startswith(WARC_VERSION, pos):
            raise WarcError(
                f"warc: expected version line at offset {pos}")
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            raise WarcError("warc: unterminated header block")
        headers: dict[str, str] = {}
        for line in data[pos + len(WARC_VERSION) + 2:head_end].split(_CRLF):
            name, sep, value = line.partition(b":")
            if not sep:
                raise WarcError(
                    f"warc: malformed header line {line[:40]!r}")
            try:  # header NAMES are ASCII by spec — non-ASCII is malformed
                key = name.strip().lower().decode("ascii")
            except UnicodeDecodeError:
                raise WarcError(
                    f"warc: non-ascii header name {name[:40]!r}") from None
            headers[key] = value.strip().decode("utf-8", "replace")
        try:
            clen = int(headers["content-length"])
        except KeyError:
            raise WarcError("warc: record missing Content-Length") from None
        except ValueError:
            raise WarcError("warc: non-integer Content-Length") from None
        if clen < 0:  # a negative length would alias earlier bytes
            raise WarcError("warc: negative Content-Length")
        if "warc-type" not in headers:
            raise WarcError("warc: record missing WARC-Type")
        body_start = head_end + 4
        body_end = body_start + clen
        if body_end + 4 > n:
            raise WarcError("warc: payload truncated")
        if data[body_end:body_end + 4] != _CRLF + _CRLF:
            raise WarcError("warc: missing record separator")
        uri = headers.get("warc-target-uri")
        rid = headers.get("warc-record-id", "")
        records.append({
            "warc_type": headers["warc-type"],
            "target_uri": uri,
            "content_type": headers.get("content-type"),
            "record_id": rid.strip("<>").removeprefix("urn:uuid:"),
            "date": headers.get("warc-date"),
            "payload": data[body_start:body_end],
        })
        pos = body_end + 4
    return records


def split_http_payload(payload: bytes) -> tuple[int | None, dict, bytes]:
    """Split an ``application/http`` record payload into
    ``(status, headers, body)``. Non-HTTP payloads (no status line)
    return ``(None, {}, payload)`` — totality, not an error: ``resource``
    records carry bare content."""
    if not payload.startswith(b"HTTP/"):
        return None, {}, payload
    head_end = payload.find(_CRLF + _CRLF)
    if head_end < 0:
        raise WarcError("warc: unterminated http header block")
    lines = payload[:head_end].split(_CRLF)
    parts = lines[0].split(None, 2)
    if len(parts) < 2 or not parts[1].isdigit():
        raise WarcError("warc: malformed http status line")
    headers = {}
    for line in lines[1:]:
        name, sep, value = line.partition(b":")
        if sep:
            try:
                key = name.strip().lower().decode("ascii")
            except UnicodeDecodeError:
                raise WarcError(
                    f"warc: non-ascii http header name {name[:40]!r}"
                ) from None
            headers[key] = value.strip().decode("utf-8", "replace")
    return int(parts[1]), headers, payload[head_end + 4:]
