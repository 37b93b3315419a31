"""Minimal ISO BMFF (MP4) container codec: MJPEG track read + write.

Retires the round-2 "MP4 stays stubbed" gap for the one compressed-video
shape this sandbox can genuinely decode end-to-end: Motion-JPEG samples,
each a complete baseline JPEG that formats/jpegcodec.py decodes natively.
H.264/H.265/VP9 tracks still raise — entropy-decoding them is ffmpeg-class
work and stubbing otherwise would be dishonest.

Parsing follows the public ISO/IEC 14496-12 box structure: ftyp/mdat/moov,
trak→mdia→minf→stbl with stsd (sample description), stsz (sizes),
stsc (sample-to-chunk), stco/co64 (chunk offsets). The writer emits the
same minimal single-track layout, so write→read is a bit-faithful
round trip and doubles as the spec pin for the parser (the same strategy
jpegcodec uses with its test-side encoder).

Reference parity note: the reference never ingests video (SURVEY.md §2.6);
this is part of the beyond-reference multimodal capability set.
"""

from __future__ import annotations

import struct

import numpy as np

from . import raise_site

MP4_BRANDS = (b"isom", b"mp41", b"mp42", b"iso2", b"avc1", b"M4V ", b"qt  ")


class Mp4DecodeError(ValueError):
    """Raised on corrupt/unsupported MP4 payloads."""


def is_mp4(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[4:8] == b"ftyp"


def _walk(data: bytes, start: int, end: int):
    """Yield (box_type, body_start, body_end) for boxes in [start, end)."""
    off = start
    while off + 8 <= end:
        size = struct.unpack_from(">I", data, off)[0]
        btype = data[off + 4:off + 8]
        body = off + 8
        if size == 1:  # 64-bit largesize
            if off + 16 > end:
                raise Mp4DecodeError("truncated largesize box")
            size = struct.unpack_from(">Q", data, off + 8)[0]
            body = off + 16
        elif size == 0:  # to end of file
            size = end - off
        if size < 8 or off + size > end:
            raise Mp4DecodeError(f"bad box size {size} for {btype!r}")
        yield btype, body, off + size
        off += size


def _find(data: bytes, start: int, end: int, btype: bytes):
    for t, b, e in _walk(data, start, end):
        if t == btype:
            return b, e
    return None


def _full(body: int) -> int:
    """Skip the version/flags word of a FullBox."""
    return body + 4


# exception types a mutated box tree can squeeze out of the table walk
# (mutation-fuzz-found: struct.error past a truncated chunk offset table,
# bare ValueError/StopIteration from odd unpacks). The public entry point
# translates them to Mp4DecodeError so error-as-data handling holds.
_PARSE_LEAKS = (ValueError, IndexError, KeyError, StopIteration,
                struct.error, OverflowError)


def extract_mjpeg_samples(payload: bytes) -> list[bytes]:
    """MP4 → list of raw sample byte strings from the first video track.
    Raises only Mp4DecodeError on corrupt input or a non-MJPEG codec."""
    try:
        return _extract_mjpeg_samples(payload)
    except Mp4DecodeError:
        raise
    except _PARSE_LEAKS as exc:
        raise Mp4DecodeError(
            f"corrupt MP4 structure: {type(exc).__name__}: {exc}"
            f" [{raise_site(exc)}]") from exc


def _extract_mjpeg_samples(payload: bytes) -> list[bytes]:
    data = payload
    n = len(data)
    if not is_mp4(data):
        raise Mp4DecodeError("not an MP4 (no ftyp)")
    moov = _find(data, 0, n, b"moov")
    if moov is None:
        raise Mp4DecodeError("no moov box")
    stbl = None
    for t, b, e in _walk(data, *moov):
        if t != b"trak":
            continue
        mdia = _find(data, b, e, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(data, *mdia, b"hdlr")
        if hdlr is None or data[hdlr[0] + 8:hdlr[0] + 12] != b"vide":
            continue
        minf = _find(data, *mdia, b"minf")
        if minf is None:
            continue
        stbl = _find(data, *minf, b"stbl")
        if stbl is not None:
            break
    if stbl is None:
        raise Mp4DecodeError("no video track")
    sb, se = stbl
    stsd = _find(data, sb, se, b"stsd")
    stsz = _find(data, sb, se, b"stsz")
    stsc = _find(data, sb, se, b"stsc")
    stco = _find(data, sb, se, b"stco") or _find(data, sb, se, b"co64")
    if not (stsd and stsz and stsc and stco):
        raise Mp4DecodeError("incomplete sample tables")
    # codec check: first sample entry fourcc
    p = _full(stsd[0])
    entry_count = struct.unpack_from(">I", data, p)[0]
    if entry_count < 1:
        raise Mp4DecodeError("empty stsd")
    fourcc = data[p + 8:p + 12]
    if fourcc not in (b"jpeg", b"mjpa", b"mjpb"):
        raise Mp4DecodeError(
            f"unsupported video codec {fourcc!r} (only MJPEG decodes here; "
            "H.264-class codecs need ffmpeg)")
    # sample sizes
    p = _full(stsz[0])
    fixed, count = struct.unpack_from(">II", data, p)
    if fixed:
        sizes = [fixed] * count
    else:
        sizes = list(struct.unpack_from(f">{count}I", data, p + 8))
    # chunk offsets
    is64 = data[stco[0] - 4:stco[0]] == b"co64"
    p = _full(stco[0])
    n_chunks = struct.unpack_from(">I", data, p)[0]
    fmt = ">%d%s" % (n_chunks, "Q" if is64 else "I")
    chunk_offs = list(struct.unpack_from(fmt, data, p + 4))
    # sample→chunk mapping
    p = _full(stsc[0])
    n_ent = struct.unpack_from(">I", data, p)[0]
    ents = [struct.unpack_from(">III", data, p + 4 + 12 * i)
            for i in range(n_ent)]  # (first_chunk, samples_per_chunk, desc)
    samples: list[bytes] = []
    si = 0
    for ci in range(n_chunks):
        spc = 0
        for (first, per, _d) in ents:
            if first <= ci + 1:
                spc = per
        off = chunk_offs[ci]
        for _ in range(spc):
            if si >= count:
                break
            size = sizes[si]
            if off + size > n:
                raise Mp4DecodeError("sample beyond EOF")
            samples.append(data[off:off + size])
            off += size
            si += 1
    if si != count:
        raise Mp4DecodeError(f"sample table mismatch ({si} != {count})")
    return samples


def extract_frames_gray(payload: bytes) -> np.ndarray:
    """MP4/MJPEG → uint8 frames (n, h, w): every sample JPEG-decoded to
    grayscale via the native baseline decoder."""
    from . import jpegcodec

    frames = []
    for s in extract_mjpeg_samples(payload):
        try:
            frames.append(jpegcodec.decode_jpeg_gray(s))
        except jpegcodec.JpegDecodeError as exc:
            raise Mp4DecodeError(f"corrupt MJPEG sample: {exc}") from exc
    if not frames:
        raise Mp4DecodeError("no samples")
    h, w = frames[0].shape
    if any(f.shape != (h, w) for f in frames):
        raise Mp4DecodeError("inconsistent frame dimensions")
    return np.stack(frames)


# --------------------------------------------------------------------------
# writer (single MJPEG video track; also the parser's spec pin in tests)
# --------------------------------------------------------------------------

def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _fullbox(btype: bytes, body: bytes, version: int = 0) -> bytes:
    return _box(btype, struct.pack(">I", version << 24) + body)


def write_mjpeg_mp4(jpeg_samples: list[bytes], width: int, height: int,
                    fps: int = 30) -> bytes:
    """Compose a minimal single-track MJPEG MP4 from pre-encoded baseline
    JPEG sample bytes."""
    if not jpeg_samples:
        raise ValueError("need at least one sample")
    n = len(jpeg_samples)
    timescale = fps * 100
    delta = 100
    duration = n * delta
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    mdat_payload = b"".join(jpeg_samples)
    mdat = _box(b"mdat", mdat_payload)
    mdat_data_off = len(ftyp) + 8  # absolute offset of first sample

    mvhd = _fullbox(b"mvhd", struct.pack(
        ">IIII", 0, 0, timescale, duration)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = _fullbox(b"tkhd", struct.pack(
        ">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16))
    tkhd = tkhd[:8] + struct.pack(">I", 3) + tkhd[12:]  # flags: enabled|in-movie
    mdhd = _fullbox(b"mdhd", struct.pack(
        ">IIII", 0, 0, timescale, duration) + struct.pack(">HH", 0x55C4, 0))
    hdlr = _fullbox(b"hdlr", struct.pack(">I", 0) + b"vide"
                    + b"\x00" * 12 + b"MJPEG Video Handler\x00")
    vmhd = _fullbox(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0))
    vmhd = vmhd[:8] + struct.pack(">I", 1) + vmhd[12:]
    url = struct.pack(">I", 12) + b"url " + struct.pack(">I", 1)  # self-contained
    dref = _fullbox(b"dref", struct.pack(">I", 1) + url)
    dinf = _box(b"dinf", dref)
    sample_entry = (
        b"\x00" * 6 + struct.pack(">H", 1)          # reserved + dref index
        + struct.pack(">HHII", 0, 0, 0, 0)          # predefined/reserved
        + struct.pack(">I", 0)
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)                      # frame count
        + b"\x05MJPEG" + b"\x00" * 26               # compressor name (32)
        + struct.pack(">Hh", 24, -1))               # depth, color table
    stsd = _fullbox(b"stsd", struct.pack(">I", 1)
                    + _box(b"jpeg", sample_entry))
    stts = _fullbox(b"stts", struct.pack(">III", 1, n, delta))
    stsc = _fullbox(b"stsc", struct.pack(">IIII", 1, 1, n, 1))
    stsz = _fullbox(b"stsz", struct.pack(">II", 0, n)
                    + b"".join(struct.pack(">I", len(s))
                               for s in jpeg_samples))
    stco = _fullbox(b"stco", struct.pack(">II", 1, mdat_data_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
