"""WARC (Web ARChive, ISO 28500) container codec — from scratch.

WARC is the native container of web crawls (Common Crawl ships ~100 TB
of them per snapshot), so a 100 TB extraction pipeline's ingest edge is
"binary WARC member → (uri, content-type, payload) records". This module
implements the subset real crawl processing needs:

  * record grammar: ``WARC/1.0`` / ``WARC/1.1`` version line,
    CRLF-terminated named headers (with ISO 28500 §4 folded continuation
    lines), ``Content-Length``-delimited payload block, two-CRLF record
    separator;
  * per-member gzip (the Common Crawl on-disk form: each record is its
    own gzip member, concatenated — seekable without an index), detected
    by magic and inflated in a single LINEAR streaming pass (chunked
    feed; the copy overhead at each member boundary is bounded by the
    chunk size, never by the remaining stream — a whole-tail
    ``unused_data`` loop would be O(N²) on real 100k-member shards);
  * ``application/http`` payload splitting: status line + headers + body
    (the shape of every ``response`` record).

Writer + parser are both here so tests and the gate entry can build
deterministic fixtures; parsing failures raise :class:`WarcError` with a
named message (the operator layer converts them to error rows — the
repo's error-as-data codec contract, `formats/jpegcodec.py` precedent).
Strictness choices that matter for record-boundary safety: duplicate
header names raise (two Content-Lengths would desync the record stream
between first-wins and last-wins consumers), negative / non-integer
lengths raise, non-ASCII header names raise.

Validation is all-or-nothing but slicing is lazy: :func:`_scan` checks
the whole container (raising before anything is yielded) while
:func:`iter_warc` materializes one payload at a time, so a streaming
consumer holds the inflated blob + ONE payload, not 2× the blob. The
inflated-blob residency itself is inherent to blob-per-cell ingestion —
bound it upstream by sharding crawl files into member groups of bounded
size (documented in COVERAGE.md).

Reference parity note: the reference app has no crawl surface at all
(it ingests uploaded files, `app/api/routes.py`); this module belongs to
the beyond-reference web-scale tier like operators/urltools.py.
"""

from __future__ import annotations

import zlib
from typing import Iterator

_VERSIONS = (b"WARC/1.0", b"WARC/1.1")
WARC_VERSION = _VERSIONS[0]
_CRLF = b"\r\n"
_FIXED_DATE = "2024-01-01T00:00:00Z"  # deterministic fixtures; callers
#                                       with real timestamps pass their own
_GZIP_CHUNK = 1 << 16  # per-member-boundary copy bound for _gunzip_members


class WarcError(ValueError):
    """Malformed WARC data; message names the violated invariant."""


def _hval(value: str, field: str) -> str:
    """Writer-side guard: a CR/LF inside a header value would smuggle an
    extra header line into the container (header injection) and silently
    truncate the value on re-parse — the same boundary-desync class the
    parser's duplicate-header strictness exists to prevent. API misuse,
    so ValueError (not WarcError, which is reserved for parse failures)."""
    if "\r" in value or "\n" in value:
        raise ValueError(f"{field} contains CR/LF: {value[:60]!r}")
    return value


def build_warc(
    records: list[dict],
    gzip_members: bool = False,
    date: str = _FIXED_DATE,
    version: str = "1.0",
) -> bytes:
    """Serialize records to WARC bytes. Each record dict:
    ``warc_type`` (required: 'warcinfo'/'response'/'resource'/...),
    ``payload`` (required bytes), optional ``target_uri``,
    ``content_type``, ``record_id``. With ``gzip_members`` each record
    becomes its own gzip member (the Common Crawl layout)."""
    if version not in ("1.0", "1.1"):
        raise ValueError(f"unsupported WARC version {version!r}")
    vline = b"WARC/" + version.encode("ascii")
    out = []
    for i, rec in enumerate(records):
        payload = rec["payload"]
        if not isinstance(payload, (bytes, bytearray)):
            raise TypeError(f"record {i}: payload must be bytes")
        headers = [
            b"WARC-Type: "
            + _hval(rec["warc_type"], f"record {i}: warc_type")
            .encode("ascii"),
            b"WARC-Record-ID: <urn:uuid:"
            + _hval(rec.get("record_id", f"rec-{i:08d}"),
                    f"record {i}: record_id").encode("ascii") + b">",
            b"WARC-Date: " + _hval(date, "date").encode("ascii"),
            b"Content-Length: " + str(len(payload)).encode("ascii"),
        ]
        if rec.get("target_uri"):
            headers.append(
                b"WARC-Target-URI: "
                + _hval(rec["target_uri"],
                        f"record {i}: target_uri").encode("utf-8"))
        if rec.get("content_type"):
            headers.append(
                b"Content-Type: "
                + _hval(rec["content_type"],
                        f"record {i}: content_type").encode("ascii"))
        member = (vline + _CRLF + _CRLF.join(headers)
                  + _CRLF + _CRLF + bytes(payload) + _CRLF + _CRLF)
        if gzip_members:
            co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
            member = co.compress(member) + co.flush()
        out.append(member)
    return b"".join(out)


def _gunzip_members(data: bytes) -> bytes:
    """Inflate concatenated gzip members (the seekable crawl layout) in
    one linear pass.

    The naive loop — ``d.decompress(rest); rest = d.unused_data`` —
    copies the entire remaining stream into ``unused_data`` at EVERY
    member boundary: O(members × stream) byte-copies, measured
    superlinear at a few thousand members and hours on a real 100k-member
    Common Crawl shard. Feeding fixed-size chunks instead bounds the
    per-boundary overshoot (and therefore each copy) by ``_GZIP_CHUNK``.
    """
    out: list[bytes] = []
    view = memoryview(data)
    n, pos = len(data), 0
    d = None  # None == positioned at a clean member boundary
    while pos < n:
        chunk = view[pos:pos + _GZIP_CHUNK]
        pos += len(chunk)
        if d is None:
            d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out.append(d.decompress(chunk))
        except zlib.error as exc:
            raise WarcError(f"warc: corrupt gzip member: {exc}") from exc
        while d is not None and d.eof:  # drain boundaries in the fed bytes
            tail = d.unused_data  # bounded by the chunk, shrinks per member
            d = None
            if tail:
                d = zlib.decompressobj(16 + zlib.MAX_WBITS)
                try:
                    out.append(d.decompress(tail))
                except zlib.error as exc:
                    raise WarcError(
                        f"warc: corrupt gzip member: {exc}") from exc
    if d is not None:  # input exhausted mid-member
        raise WarcError("warc: truncated gzip member")
    return b"".join(out)


def _scan(data: bytes) -> list[tuple[dict[str, str], int, int]]:
    """Validate the WHOLE container and return per-record
    ``(headers, body_start, body_end)`` — no payload copies. Raises
    :class:`WarcError` on the first violated invariant, so callers get
    all-or-nothing semantics before any record is materialized."""
    metas: list[tuple[dict[str, str], int, int]] = []
    pos, n = 0, len(data)
    if n == 0:
        # ISO 28500 §6.1: a WARC file SHALL contain one or more records.
        # A zero-byte member is a real object-store corruption shape; a
        # silent [] would make the document vanish with no accounting.
        raise WarcError("warc: empty container")
    while pos < n:
        for v in _VERSIONS:
            # the version TOKEN must be followed by CRLF — matching the
            # prefix alone would silently read "WARC/1.09" or a
            # corrupted "WARC/1.0 junk" line as 1.0
            if data.startswith(v + _CRLF, pos):
                vlen = len(v)
                break
        else:
            raise WarcError(
                f"warc: expected version line at offset {pos}")
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            raise WarcError("warc: unterminated header block")
        headers: dict[str, str] = {}
        last_key: str | None = None
        for line in data[pos + vlen + 2:head_end].split(_CRLF):
            if line[:1] in (b" ", b"\t"):  # ISO 28500 folded continuation
                if last_key is None:
                    raise WarcError(
                        "warc: continuation line before any header")
                headers[last_key] += " " + line.strip().decode(
                    "utf-8", "replace")
                continue
            name, sep, value = line.partition(b":")
            if not sep:
                raise WarcError(
                    f"warc: malformed header line {line[:40]!r}")
            try:  # header NAMES are ASCII by spec — non-ASCII is malformed
                key = name.strip().lower().decode("ascii")
            except UnicodeDecodeError:
                raise WarcError(
                    f"warc: non-ascii header name {name[:40]!r}") from None
            if not key:  # ": value" would become a reachable '' dict key
                raise WarcError(
                    f"warc: empty header name in line {line[:40]!r}")
            if key in headers:  # duplicate lengths would desync boundaries
                raise WarcError(f"warc: duplicate header {key!r}")
            headers[key] = value.strip().decode("utf-8", "replace")
            last_key = key
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
        metas.append((headers, body_start, body_end))
        pos = body_end + 4
    return metas


def _mk_record(data: bytes, meta: tuple[dict[str, str], int, int]) -> dict:
    headers, body_start, body_end = meta
    rid = headers.get("warc-record-id", "")
    return {
        "warc_type": headers["warc-type"],
        "target_uri": headers.get("warc-target-uri"),
        "content_type": headers.get("content-type"),
        "record_id": rid.strip("<>").removeprefix("urn:uuid:"),
        "date": headers.get("warc-date"),
        "payload": data[body_start:body_end],
    }


def iter_warc(data: bytes) -> Iterator[dict]:
    """Yield record dicts (see :func:`parse_warc`) one at a time. The
    container is fully validated BEFORE the first yield (all-or-nothing,
    same contract as :func:`parse_warc`), but payload bytes are sliced
    lazily — a streaming consumer holds one payload, not all of them."""
    data = bytes(data)
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    metas = _scan(data)
    for meta in metas:
        yield _mk_record(data, meta)


def parse_warc(data: bytes) -> list[dict]:
    """Parse WARC bytes (plain or per-member gzip) into record dicts:
    ``(warc_type, target_uri, content_type, record_id, date, payload)``.
    Strict by design — a malformed container raises :class:`WarcError`
    naming the violated invariant; the operator layer turns that into an
    error ROW, never a task failure."""
    return list(iter_warc(data))


def split_http_payload(payload: bytes) -> tuple[int | None, dict, bytes]:
    """Split an ``application/http`` record payload into
    ``(status, headers, body)``. Non-HTTP payloads (no status line)
    return ``(None, {}, payload)`` — totality, not an error: ``resource``
    records carry bare content. The status must be the spec's 3-digit
    code (§ RFC 9112: status-code = 3DIGIT); anything else — longer
    (would overflow the operators' int32 column) or shorter — is
    malformed."""
    if not payload.startswith(b"HTTP/"):
        return None, {}, payload
    head_end = payload.find(_CRLF + _CRLF)
    if head_end < 0:
        raise WarcError("warc: unterminated http header block")
    lines = payload[:head_end].split(_CRLF)
    parts = lines[0].split(None, 2)
    if len(parts) < 2 or not parts[1].isdigit() or len(parts[1]) != 3:
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
