"""EXIF (APP1/TIFF) metadata: parse, orientation transform, writer.

Web-corpus JPEGs routinely carry camera EXIF whose Orientation tag
(0x0112) says the stored pixel grid must be rotated/flipped for
display. OCRing an un-normalized portrait photo (orientation 6/8) reads
rows across rotated glyphs and produces garbage, so the extraction tier
needs orientation normalization BEFORE preprocessing — the reference
delegates this to PIL/cv2 inside pytesseract's image load
(app/services/ocr_service.py:23-46); here it is from scratch.

Everything is spec-level (EXIF 2.3 / TIFF 6.0): a TIFF header, IFD
entry tables, and eight fixed orientation transforms — no out-of-band
constant tables, so unlike MP3/H.264 this is honestly decodable in a
sandbox (COVERAGE.md "Known gaps" decodability rule).

Parsing is bounds-checked and budgeted: entry counts are capped, only
the IFD0→Exif and IFD0→GPS pointers are followed (each once, forward
references only), so adversarial payloads cannot loop or amplify.
Corrupt EXIF raises :class:`ExifError` — callers in the decode hot
path treat that as "no usable EXIF" (a photo with a mangled APP1 is
still a decodable photo), while the metadata operator surfaces it as
an error-as-data row.
"""

from __future__ import annotations

import struct

import numpy as np

#: tag ids (EXIF 2.3 §4.6.4/4.6.5)
TAG_MAKE = 0x010F
TAG_MODEL = 0x0110
TAG_ORIENTATION = 0x0112
TAG_DATETIME = 0x0132
TAG_EXIF_IFD = 0x8769
TAG_GPS_IFD = 0x8825
TAG_DATETIME_ORIGINAL = 0x9003
TAG_PIXEL_X = 0xA002
TAG_PIXEL_Y = 0xA003

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}
_MAX_ENTRIES = 512  # a real IFD0 has ~20; cap bounds adversarial walks
_EXIF_PREFIX = b"Exif\x00\x00"


class ExifError(ValueError):
    """Structurally corrupt EXIF payload (truncated IFD, bad offsets)."""


def _find_app1(jpeg: bytes) -> bytes | None:
    """Walk JPEG segments from SOI to SOS; return the first APP1 body
    with the Exif prefix (TIFF stream), or None when absent."""
    if len(jpeg) < 4 or jpeg[:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(jpeg):
        if jpeg[pos] != 0xFF:  # desynced stream: give up, not an error
            return None
        marker = jpeg[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2  # standalone markers carry no length
            continue
        if marker == 0xDA:  # SOS: entropy data follows, no EXIF past here
            return None
        seglen = int.from_bytes(jpeg[pos + 2:pos + 4], "big")
        if seglen < 2 or pos + 2 + seglen > len(jpeg):
            return None
        if marker == 0xE1:
            body = jpeg[pos + 4:pos + 2 + seglen]
            if body[:6] == _EXIF_PREFIX:
                return body[6:]
        pos += 2 + seglen
    return None


def _read_ifd(tiff: bytes, off: int, fmt: str) -> dict[int, tuple]:
    """One IFD → {tag: (type, count, raw_value_bytes)}; bounds-checked."""
    if off + 2 > len(tiff):
        raise ExifError("IFD offset past end")
    (n,) = struct.unpack_from(fmt + "H", tiff, off)
    if n > _MAX_ENTRIES:
        raise ExifError(f"IFD entry count {n} over budget")
    if off + 2 + 12 * n > len(tiff):
        raise ExifError("IFD table truncated")
    out: dict[int, tuple] = {}
    for i in range(n):
        base = off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(fmt + "HHI", tiff, base)
        size = _TYPE_SIZE.get(typ, 0) * cnt
        if size == 0:
            continue  # unknown type: skip, don't fail the whole block
        if size <= 4:
            raw = tiff[base + 8:base + 8 + size]
        else:
            (voff,) = struct.unpack_from(fmt + "I", tiff, base + 8)
            if voff + size > len(tiff):
                raise ExifError("IFD value offset past end")
            raw = tiff[voff:voff + size]
        out[tag] = (typ, cnt, raw)
    return out


def _scalar(entry: tuple, fmt: str) -> int | None:
    typ, _cnt, raw = entry
    if typ == 3 and len(raw) >= 2:
        return struct.unpack_from(fmt + "H", raw)[0]
    if typ == 4 and len(raw) >= 4:
        return struct.unpack_from(fmt + "I", raw)[0]
    return None


def _ascii(entry: tuple) -> str | None:
    typ, _cnt, raw = entry
    if typ != 2:
        return None
    return raw.split(b"\x00", 1)[0].decode("latin-1", "replace")


def parse_exif(jpeg: bytes) -> dict | None:
    """EXIF fields of a JPEG byte stream, or None when no Exif APP1.

    Returns ``{orientation, make, model, datetime, datetime_original,
    pixel_x, pixel_y, has_gps}`` (absent tags → None; ``has_gps`` is a
    bool — presence of the GPS IFD pointer is the privacy-relevant
    signal for curation PII gates, the coordinates themselves are
    deliberately not extracted). Raises :class:`ExifError` on a
    structurally corrupt TIFF block.
    """
    tiff = _find_app1(jpeg)
    if tiff is None:
        return None
    if len(tiff) < 8:
        raise ExifError("TIFF header truncated")
    order = tiff[:2]
    if order == b"II":
        fmt = "<"
    elif order == b"MM":
        fmt = ">"
    else:
        raise ExifError("bad TIFF byte order")
    magic, ifd0 = struct.unpack_from(fmt + "HI", tiff, 2)
    if magic != 42:
        raise ExifError("bad TIFF magic")
    d0 = _read_ifd(tiff, ifd0, fmt)
    out = {
        "orientation": _scalar(d0[TAG_ORIENTATION], fmt)
        if TAG_ORIENTATION in d0 else None,
        "make": _ascii(d0[TAG_MAKE]) if TAG_MAKE in d0 else None,
        "model": _ascii(d0[TAG_MODEL]) if TAG_MODEL in d0 else None,
        "datetime": _ascii(d0[TAG_DATETIME]) if TAG_DATETIME in d0 else None,
        "datetime_original": None,
        "pixel_x": None,
        "pixel_y": None,
        "has_gps": TAG_GPS_IFD in d0,
    }
    if TAG_EXIF_IFD in d0:
        eoff = _scalar(d0[TAG_EXIF_IFD], fmt)
        if eoff is not None:
            de = _read_ifd(tiff, eoff, fmt)
            if TAG_DATETIME_ORIGINAL in de:
                out["datetime_original"] = _ascii(de[TAG_DATETIME_ORIGINAL])
            if TAG_PIXEL_X in de:
                out["pixel_x"] = _scalar(de[TAG_PIXEL_X], fmt)
            if TAG_PIXEL_Y in de:
                out["pixel_y"] = _scalar(de[TAG_PIXEL_Y], fmt)
    return out


def orientation_of(jpeg: bytes) -> int:
    """Best-effort Orientation for the decode hot path: absent, corrupt
    or out-of-range EXIF all mean 'use the stored grid' (1)."""
    try:
        info = parse_exif(jpeg)
    except ExifError:
        return 1
    o = (info or {}).get("orientation")
    return o if isinstance(o, int) and 1 <= o <= 8 else 1


def apply_orientation(img: np.ndarray, orientation: int) -> np.ndarray:
    """Stored pixel grid → display orientation (EXIF 2.3 tag 0x0112;
    the eight row0/col0 placements, same mapping as PIL's
    ``exif_transpose``). Out-of-range values are identity. Works for
    2-D grayscale and 3-D (H, W, C) arrays."""
    flip_h = (slice(None), slice(None, None, -1))
    if orientation == 2:
        return img[flip_h]
    if orientation == 3:
        return img[::-1][flip_h]
    if orientation == 4:
        return img[::-1]
    if orientation == 5:
        return np.swapaxes(img, 0, 1)
    if orientation == 6:
        return np.swapaxes(img, 0, 1)[flip_h]  # 90° CW
    if orientation == 7:
        return np.swapaxes(img, 0, 1)[::-1][flip_h]
    if orientation == 8:
        return np.swapaxes(img, 0, 1)[::-1]  # 90° CCW
    return img


#: inverse transform per orientation: store = apply(original, INVERSE[o])
#: makes apply(store, o) == original (6 and 8 swap; the rest self-invert)
INVERSE = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 8, 7: 7, 8: 6}


def build_app1(*, orientation: int | None = None, make: str | None = None,
               model: str | None = None, datetime: str | None = None,
               datetime_original: str | None = None,
               pixel_x: int | None = None, pixel_y: int | None = None,
               gps: bool = False, byte_order: str = "II") -> bytes:
    """A complete APP1 segment (marker + length + Exif prefix + TIFF)
    carrying the given fields — the writer half, used to EXIF-tag
    engine-encoded JPEGs and to build test/gate fixtures in either
    byte order."""
    fmt = "<" if byte_order == "II" else ">"

    def entry(tag: int, typ: int, cnt: int, raw: bytes,
              data: list, data_base: list) -> bytes:
        if len(raw) <= 4:
            return struct.pack(fmt + "HHI", tag, typ, cnt) + raw.ljust(4, b"\x00")
        off = data_base[0] + sum(len(d) for d in data)
        data.append(raw + (b"\x00" if len(raw) % 2 else b""))
        return struct.pack(fmt + "HHII", tag, typ, cnt, off)

    def ascii_raw(s: str) -> bytes:
        return s.encode("latin-1") + b"\x00"

    ifd0_tags: list[tuple[int, int, int, bytes]] = []
    if make is not None:
        ifd0_tags.append((TAG_MAKE, 2, len(make) + 1, ascii_raw(make)))
    if model is not None:
        ifd0_tags.append((TAG_MODEL, 2, len(model) + 1, ascii_raw(model)))
    if orientation is not None:
        ifd0_tags.append((TAG_ORIENTATION, 3, 1,
                          struct.pack(fmt + "H", orientation)))
    if datetime is not None:
        ifd0_tags.append((TAG_DATETIME, 2, len(datetime) + 1,
                          ascii_raw(datetime)))
    exif_tags: list[tuple[int, int, int, bytes]] = []
    if datetime_original is not None:
        exif_tags.append((TAG_DATETIME_ORIGINAL, 2,
                          len(datetime_original) + 1,
                          ascii_raw(datetime_original)))
    if pixel_x is not None:
        exif_tags.append((TAG_PIXEL_X, 4, 1, struct.pack(fmt + "I", pixel_x)))
    if pixel_y is not None:
        exif_tags.append((TAG_PIXEL_Y, 4, 1, struct.pack(fmt + "I", pixel_y)))

    n0 = len(ifd0_tags) + (1 if exif_tags else 0) + (1 if gps else 0)
    ifd0_off = 8
    ifd0_size = 2 + 12 * n0 + 4
    exif_off = ifd0_off + ifd0_size
    exif_size = (2 + 12 * len(exif_tags) + 4) if exif_tags else 0
    gps_off = exif_off + exif_size
    gps_size = (2 + 12 + 4) if gps else 0
    data_base = [gps_off + gps_size]
    data: list[bytes] = []

    body = bytearray()
    body += struct.pack(fmt + "H", n0)
    ptr_entries = []
    if exif_tags:
        ptr_entries.append((TAG_EXIF_IFD, 4, 1,
                            struct.pack(fmt + "I", exif_off)))
    if gps:
        ptr_entries.append((TAG_GPS_IFD, 4, 1,
                            struct.pack(fmt + "I", gps_off)))
    # TIFF requires ascending tag order within an IFD
    for tag, typ, cnt, raw in sorted(ifd0_tags + ptr_entries):
        body += entry(tag, typ, cnt, raw, data, data_base)
    body += struct.pack(fmt + "I", 0)  # next-IFD = none
    if exif_tags:
        body += struct.pack(fmt + "H", len(exif_tags))
        for tag, typ, cnt, raw in sorted(exif_tags):
            body += entry(tag, typ, cnt, raw, data, data_base)
        body += struct.pack(fmt + "I", 0)
    if gps:
        body += struct.pack(fmt + "H", 1)
        body += struct.pack(fmt + "HHI", 0x0000, 1, 4) + bytes([2, 3, 0, 0])
        body += struct.pack(fmt + "I", 0)
    tiff = (b"II" if fmt == "<" else b"MM") \
        + struct.pack(fmt + "HI", 42, ifd0_off) + bytes(body) + b"".join(data)
    payload = _EXIF_PREFIX + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def splice_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Insert an APP1 segment right after SOI (where EXIF lives)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ExifError("not a JPEG (no SOI)")
    return jpeg[:2] + app1 + jpeg[2:]
