"""Minimal deterministic PDF writer + pure-Python PDF parser.

The reference extracts PDF text with PyMuPDF ``page.get_text()`` in page
order (reference: app/services/ocr_service.py:50-58) and, when the direct
text is ≤200 chars, rasterizes pages with pdf2image and OCRs each
(ocr_service.py:61, :84-117).  Neither PyMuPDF nor poppler exist in this
container, so this module provides the same two capabilities in pure Python:

  write_text_pdf(pages, ...)    -> bytes   real PDF: Flate content streams,
                                           BT/Tf/Td/TJ text ops, optional
                                           two-column layout, optional CID
                                           (Identity-H + ToUnicode CMap,
                                           UTF-16BE hex strings — the fixture
                                           encoding, SURVEY.md §5)
  write_scanned_pdf(page_imgs)  -> bytes   image-only PDF: one RIMG image
                                           XObject per page, no text layer
  extract_text(pdf)             -> str     per-page runs sorted into reading
                                           order ((column, -y, x)); pages
                                           joined with \\f
  extract_page_images(pdf)      -> list    ordered raw image payloads (the
                                           pdf2image analog)

Corrupt input raises ``PdfParseError`` — callers convert to error rows
(error-as-data, reference: app/services/ocr_service.py:56-58).
"""

from __future__ import annotations

import re
import zlib

COLUMN_SPLIT_GAP = 150.0  # pt; two x-clusters farther apart than this = 2 columns
LINE_Y_TOL = 2.0


class PdfParseError(ValueError):
    """Raised on malformed PDF input."""


# --------------------------------------------------------------------------
# writer
# --------------------------------------------------------------------------

def _esc(s: bytes) -> bytes:
    return s.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def _text_stream(lines: list[tuple[float, float, str]], cid: bool) -> bytes:
    """lines: (x, y, text) in page space."""
    ops = [b"BT /F1 11 Tf"]
    for x, y, text in lines:
        ops.append(b"1 0 0 1 %.2f %.2f Tm" % (x, y))
        if cid:
            hexs = text.encode("utf-16-be").hex().upper().encode()
            ops.append(b"<" + hexs + b"> Tj")
        else:
            ops.append(b"(" + _esc(text.encode("latin-1", "replace")) + b") Tj")
    ops.append(b"ET")
    return b"\n".join(ops)


_CMAP_TEMPLATE = b"""/CIDInit /ProcSet findresource begin
12 dict begin begincmap
/CMapName /Adobe-Identity-UCS def /CMapType 2 def
1 begincodespacerange <0000> <FFFF> endcodespacerange
1 beginbfrange <0000> <FFFF> <0000> endbfrange
endcmap CMapName currentdict /CMap defineresource pop end end"""


def _build_pdf(page_objs: list[dict]) -> bytes:
    """Assemble a PDF from per-page dicts {content: bytes, extra: [(dict_body,
    stream|None), ...], resources: bytes}."""
    objs: list[bytes] = []  # 1-indexed bodies, without "N 0 obj"/"endobj"

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    page_ids: list[int] = []
    kids_slots = []
    for p in page_objs:
        extra_ids = {}
        for name, (dict_body, stream) in p.get("extra", {}).items():
            if stream is not None:
                comp = zlib.compress(stream)
                body = (
                    dict_body.replace(b"%LEN%", str(len(comp)).encode())
                    + b"\nstream\n" + comp + b"\nendstream"
                )
            else:
                body = dict_body
            extra_ids[name] = add(body)
        comp = zlib.compress(p["content"])
        cid_ = add(
            b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(comp)
            + comp + b"\nendstream"
        )
        res = p["resources"]
        for name, oid in extra_ids.items():
            res = res.replace(b"%" + name + b"%", b"%d 0 R" % oid)
        page_ids.append(add(
            b"<< /Type /Page /Parent %PAGES% /MediaBox [0 0 612 792] "
            b"/Resources " + res + b" /Contents %d 0 R >>" % cid_
        ))
        kids_slots.append(page_ids[-1])
    pages_id = add(
        b"<< /Type /Pages /Kids [" + b" ".join(b"%d 0 R" % i for i in kids_slots)
        + b"] /Count %d >>" % len(kids_slots)
    )
    catalog_id = add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_id)
    out = [b"%PDF-1.4"]
    offsets = [0]
    pos = len(out[0]) + 1
    for i, body in enumerate(objs, start=1):
        body = body.replace(b"%PAGES%", b"%d 0 R" % pages_id)
        chunk = b"%d 0 obj\n" % i + body + b"\nendobj"
        offsets.append(pos)
        out.append(chunk)
        pos += len(chunk) + 1
    xref_pos = pos
    xref = [b"xref", b"0 %d" % (len(objs) + 1), b"0000000000 65535 f "]
    xref += [b"%010d 00000 n " % off for off in offsets[1:]]
    out.append(b"\n".join(xref))
    out.append(b"trailer\n<< /Size %d /Root %d 0 R >>" % (len(objs) + 1, catalog_id))
    out.append(b"startxref\n%d\n%%%%EOF" % xref_pos)
    return b"\n".join(out)


def write_text_pdf(
    pages: list[str], cid: bool = False, two_column: bool = False
) -> bytes:
    """Each element of ``pages`` is that page's text ('\\n'-separated lines)."""
    if cid:
        font = (
            b"<< /Type /Font /Subtype /Type0 /BaseFont /Synth-Identity "
            b"/Encoding /Identity-H /ToUnicode %CMAP% >>"
        )
        extra = {b"CMAP": (b"<< /Length %LEN% /Filter /FlateDecode >>", _CMAP_TEMPLATE)}
    else:
        font = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
        extra = {}
    page_objs = []
    for text in pages:
        lines = text.split("\n")
        placed: list[tuple[float, float, str]] = []
        if two_column:
            half = (len(lines) + 1) // 2
            for i, ln in enumerate(lines[:half]):
                placed.append((72.0, 720.0 - 14.0 * i, ln))
            for i, ln in enumerate(lines[half:]):
                placed.append((340.0, 720.0 - 14.0 * i, ln))
        else:
            for i, ln in enumerate(lines):
                placed.append((72.0, 720.0 - 14.0 * i, ln))
        placed = [(x, y, t) for x, y, t in placed if t.strip()]
        page_objs.append({
            "content": _text_stream(placed, cid),
            "resources": b"<< /Font << /F1 " + font + b" >> >>",
            "extra": dict(extra),
        })
    return _build_pdf(page_objs)


def write_scanned_pdf(page_images: list[bytes]) -> bytes:
    """Image-only PDF: one RIMG payload per page as an image XObject."""
    page_objs = []
    for img in page_images:
        page_objs.append({
            "content": b"q 612 0 0 792 0 0 cm /Im1 Do Q",
            "resources": b"<< /XObject << /Im1 %IMG% >> >>",
            "extra": {
                b"IMG": (
                    b"<< /Type /XObject /Subtype /Image /Width 612 /Height 792 "
                    b"/ColorSpace /DeviceGray /BitsPerComponent 8 "
                    b"/Length %LEN% /Filter /FlateDecode >>",
                    img,
                )
            },
        })
    return _build_pdf(page_objs)


# --------------------------------------------------------------------------
# parser
# --------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+) 0 obj\s*(.*?)\s*endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\nendstream", re.S)


def _parse_objects(pdf: bytes) -> dict[int, bytes]:
    if not pdf.startswith(b"%PDF"):
        raise PdfParseError("not a PDF (missing %PDF header)")
    objs = {int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(pdf)}
    if not objs:
        raise PdfParseError("no objects found")
    return objs


def _get_stream(body: bytes) -> bytes | None:
    m = _STREAM_RE.search(body)
    if m is None:
        return None
    data = m.group(1)
    if b"/FlateDecode" in body:
        try:
            return zlib.decompress(data)
        except zlib.error as exc:
            raise PdfParseError(f"corrupt Flate stream: {exc}") from exc
    return data


def _page_order(objs: dict[int, bytes]) -> list[int]:
    """Object ids of pages, in /Kids order."""
    for body in objs.values():
        if b"/Type /Pages" in body or b"/Type/Pages" in body:
            kids = re.search(rb"/Kids\s*\[(.*?)\]", body, re.S)
            if kids:
                return [int(x) for x in re.findall(rb"(\d+) 0 R", kids.group(1))]
    raise PdfParseError("no /Pages object")


def _ref(body: bytes, name: bytes) -> int | None:
    m = re.search(rb"/" + name + rb"\s+(\d+) 0 R", body)
    return int(m.group(1)) if m else None


_LITERAL_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _decode_literal(raw: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1 : i + 2]
            if nxt in _LITERAL_ESCAPES:
                out += _LITERAL_ESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal, up to 3 digits
                j = i + 1
                while j < min(i + 4, len(raw)) and raw[j : j + 1].isdigit():
                    j += 1
                out.append(int(raw[i + 1 : j], 8) & 0xFF)
                i = j
                continue
        out += c
        i += 1
    return out.decode("latin-1")


def _parse_cmap(cmap: bytes) -> "_CMap":
    ranges = []
    for m in re.finditer(
        rb"beginbfrange(.*?)endbfrange", cmap, re.S
    ):
        for lo, hi, dst in re.findall(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", m.group(1)
        ):
            ranges.append((int(lo, 16), int(hi, 16), int(dst, 16)))
    chars = {}
    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", cmap, re.S):
        for src, dst in re.findall(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", m.group(1)
        ):
            chars[int(src, 16)] = int(dst, 16)
    return _CMap(ranges, chars)


class _CMap:
    def __init__(self, ranges, chars):
        self.ranges, self.chars = ranges, chars

    def decode(self, code: int) -> str:
        if code in self.chars:
            return chr(self.chars[code])
        for lo, hi, dst in self.ranges:
            if lo <= code <= hi:
                return chr(dst + (code - lo))
        return "�"


_TOKEN_RE = re.compile(
    rb"\((?:[^()\\]|\\.)*\)|<[0-9A-Fa-f\s]*>|\[|\]|/[A-Za-z0-9]+|"
    rb"[-+.0-9]+|[A-Za-z'\"*]+"
)


def _content_runs(content: bytes, cmap: _CMap | None) -> list[tuple[float, float, str]]:
    """Execute the text-positioning subset of the content stream; return
    (x, y, text) runs."""
    runs: list[tuple[float, float, str]] = []
    stack: list = []
    x = y = 0.0
    lx = ly = 0.0  # line start (for Td/TD/T*)
    leading = 14.0

    def emit(s: str) -> None:
        if s:
            runs.append((x, y, s))

    def decode_str(tok: bytes) -> str:
        if tok.startswith(b"("):
            return _decode_literal(tok[1:-1])
        hexs = re.sub(rb"\s", b"", tok[1:-1])
        if cmap is not None:
            return "".join(
                cmap.decode(int(hexs[i : i + 4], 16))
                for i in range(0, len(hexs) - len(hexs) % 4, 4)
            )
        if len(hexs) % 2:
            hexs += b"0"
        return bytes.fromhex(hexs.decode()).decode("latin-1")

    for m in _TOKEN_RE.finditer(content):
        tok = m.group(0)
        if tok.startswith((b"(", b"<")):
            stack.append(tok)
        elif tok in (b"[", b"]"):
            continue
        elif tok[:1] in b"-+.0123456789":
            stack.append(float(tok))
        elif tok == b"Tm":
            if len(stack) >= 6:
                x, y = float(stack[-2]), float(stack[-1])
                lx, ly = x, y
            stack.clear()
        elif tok in (b"Td", b"TD"):
            if len(stack) >= 2:
                lx, ly = lx + float(stack[-2]), ly + float(stack[-1])
                x, y = lx, ly
                if tok == b"TD":
                    leading = -float(stack[-2])
            stack.clear()
        elif tok == b"T*":
            ly -= leading
            x, y = lx, ly
            stack.clear()
        elif tok == b"TL":
            if stack:
                leading = float(stack[-1])
            stack.clear()
        elif tok == b"Tj":
            if stack and isinstance(stack[-1], bytes):
                emit(decode_str(stack[-1]))
            stack.clear()
        elif tok == b"'":
            ly -= leading
            x, y = lx, ly
            if stack and isinstance(stack[-1], bytes):
                emit(decode_str(stack[-1]))
            stack.clear()
        elif tok == b"TJ":
            text = "".join(
                decode_str(t) for t in stack if isinstance(t, bytes)
            )
            emit(text)
            stack.clear()
        elif tok in (b"BT", b"ET", b"Tf"):
            stack.clear()
    return runs


def _reading_order(runs: list[tuple[float, float, str]]) -> str:
    """Sort runs into reading order with column reconstruction: cluster x
    positions; if two clusters are separated by > COLUMN_SPLIT_GAP, read the
    left column fully before the right (north_star: column/reading-order
    reconstruction)."""
    if not runs:
        return ""
    xs = sorted({x for x, _, _ in runs})
    split = None
    for a, b in zip(xs, xs[1:]):
        if b - a > COLUMN_SPLIT_GAP:
            split = (a + b) / 2
            break
    def key(run):
        x, y, _ = run
        col = 0 if split is None or x < split else 1
        return (col, -round(y / LINE_Y_TOL), x)
    ordered = sorted(runs, key=key)
    return _join_lines(ordered, split)


def _join_lines(ordered, split) -> str:
    lines: list[str] = []
    cur_line: list[str] = []
    cur_k = None
    for x, y, t in ordered:
        col = 0 if split is None or x < split else 1
        k = (col, -round(y / LINE_Y_TOL))
        if k != cur_k:
            if cur_line:
                lines.append(" ".join(cur_line))
            cur_line, cur_k = [], k
        cur_line.append(t)
    if cur_line:
        lines.append(" ".join(cur_line))
    return "\n".join(lines)


def extract_text(pdf: bytes) -> str:
    """Direct text extraction, pages joined with \\f (page.get_text() analog)."""
    objs = _parse_objects(pdf)
    pages = []
    for pid in _page_order(objs):
        body = objs.get(pid)
        if body is None:
            raise PdfParseError(f"missing page object {pid}")
        content_id = _ref(body, b"Contents")
        content = _get_stream(objs[content_id]) if content_id in objs else None
        if content is None:
            pages.append("")
            continue
        cmap = None
        # font ref lives in the page's /Resources inline dict
        fm = re.search(rb"/F1\s+(\d+) 0 R", body)
        if fm:
            font_body = objs.get(int(fm.group(1)), b"")
            cm = _ref(font_body, b"ToUnicode")
            if cm is not None and cm in objs:
                cmap_stream = _get_stream(objs[cm])
                if cmap_stream:
                    cmap = _parse_cmap(cmap_stream)
        else:
            # inline font dict on the page: CID iff Identity-H declared
            if b"/Identity-H" in body:
                cm = _ref(body, b"ToUnicode")
                if cm is not None and cm in objs:
                    cmap_stream = _get_stream(objs[cm])
                    if cmap_stream:
                        cmap = _parse_cmap(cmap_stream)
        pages.append(_reading_order(_content_runs(content, cmap)))
    return "\f".join(pages)


def extract_page_images(pdf: bytes) -> list[bytes]:
    """Ordered list of raw image payloads, one per page with an image XObject
    (the pdf2image ``convert_from_bytes`` analog,
    reference: app/services/ocr_service.py:84-98)."""
    objs = _parse_objects(pdf)
    out: list[bytes] = []
    for pid in _page_order(objs):
        body = objs.get(pid, b"")
        im = re.search(rb"/Im\d+\s+(\d+) 0 R", body)
        if not im:
            continue
        img_body = objs.get(int(im.group(1)))
        if img_body is None:
            raise PdfParseError(f"missing image object on page {pid}")
        data = _get_stream(img_body)
        if data is None:
            raise PdfParseError(f"image object on page {pid} has no stream")
        out.append(data)
    return out
