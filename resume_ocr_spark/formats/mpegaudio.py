"""Compressed-audio container probing (MP3 / OGG) — metadata without decode.

The reference never ingests audio; the beyond-reference multimodal brief
does.  Full MP3/OGG decode-to-PCM genuinely needs ffmpeg-class DSP and
stays stubbed (operators/multimodal.decode_audio), but the *container*
level — what ``ffprobe`` reports: codec, sample rate, channels, bitrate,
frame count, duration — is plain header arithmetic, and it is exactly the
pass a 100 TB ingest pipeline runs over every blob BEFORE deciding what to
transcode.  This module walks MPEG audio frame headers (all versions /
layers, ID3v2/ID3v1 tags, Xing/Info/VBRI headers) and OGG pages
(Vorbis / Opus identification headers, duration from the terminal granule
position).  Pure byte arithmetic, O(1) memory, no external libs.

Probing never decodes payload bits, so it is O(n_frames) time on the
header bytes only — at scale this runs inside the same Arrow batch UDF as
the other media probes (operators/multimodal.audio_container_metadata).
"""

from __future__ import annotations

import struct

from .avcodec import AudioDecodeError

# ---------------------------------------------------------------------------
# MPEG audio (MP3 and friends)
# ---------------------------------------------------------------------------

# header bit decode tables (ISO/IEC 11172-3 / 13818-3)
_VERSIONS = {0: "2.5", 2: "2", 3: "1"}  # index 1 reserved
_LAYERS = {1: 3, 2: 2, 3: 1}  # header code -> layer number

_BITRATES_KBPS = {
    # (version_group, layer) -> 14-entry table for indexes 1..14
    ("1", 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    ("1", 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    ("1", 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    ("2", 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    ("2", 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    ("2", 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}

_SAMPLE_RATES = {
    "1": (44100, 48000, 32000),
    "2": (22050, 24000, 16000),
    "2.5": (11025, 12000, 8000),
}


def _id3v2_size(payload: bytes) -> int:
    """Bytes occupied by a leading ID3v2 tag (0 if absent)."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    if any(b & 0x80 for b in payload[6:10]):
        raise AudioDecodeError("corrupt ID3v2 syncsafe size")
    size = (payload[6] << 21) | (payload[7] << 14) | (payload[8] << 7) | payload[9]
    footer = 10 if payload[5] & 0x10 else 0
    return 10 + size + footer


def _parse_frame_header(b: bytes):
    """4 header bytes -> (version, layer, bitrate_kbps, sample_rate,
    channels, frame_bytes, samples_per_frame) or None if not a sync."""
    if len(b) < 4 or b[0] != 0xFF or (b[1] & 0xE0) != 0xE0:
        return None
    version = _VERSIONS.get((b[1] >> 3) & 3)
    layer = _LAYERS.get((b[1] >> 1) & 3)
    if version is None or layer is None:
        return None
    br_idx = (b[2] >> 4) & 15
    sr_idx = (b[2] >> 2) & 3
    if br_idx in (0, 15) or sr_idx == 3:  # "free"/bad bitrate, bad rate
        return None
    vgroup = "1" if version == "1" else "2"
    bitrate = _BITRATES_KBPS[(vgroup, layer)][br_idx - 1]
    sample_rate = _SAMPLE_RATES[version][sr_idx]
    padding = (b[2] >> 1) & 1
    channels = 1 if ((b[3] >> 6) & 3) == 3 else 2
    if layer == 1:
        spf = 384
        frame_bytes = (12 * bitrate * 1000 // sample_rate + padding) * 4
    else:
        spf = 576 if (layer == 3 and version != "1") else 1152
        frame_bytes = spf // 8 * bitrate * 1000 // sample_rate + padding
    return version, layer, bitrate, sample_rate, channels, frame_bytes, spf


def _xing_offset(version: str, channels: int) -> int:
    """Side-info size separating the Layer III header from a Xing tag."""
    if version == "1":
        return 4 + (17 if channels == 1 else 32)
    return 4 + (9 if channels == 1 else 17)


def parse_mp3_info(payload: bytes) -> dict:
    """Walk every MPEG audio frame header → ffprobe-style metadata dict.

    Raises :class:`AudioDecodeError` on payloads with no parseable frame
    (error-as-data upstream).  Frame count comes from the walk itself — a
    Xing/Info/VBRI header, when present, is cross-read for the ``vbr``
    flag and tag-declared frame count but never trusted over the walk.
    """
    i = _id3v2_size(payload)
    n = len(payload)
    if n >= 128 and payload[n - 128 : n - 125] == b"TAG":  # trailing ID3v1
        n -= 128
    # resync: tolerate junk before the first frame (common in the wild)
    first = None
    while i + 4 <= n:
        first = _parse_frame_header(payload[i : i + 4])
        if first is not None:
            break
        i += 1
    if first is None:
        raise AudioDecodeError("no MPEG audio frame sync found")

    version, layer, _, sample_rate, channels, _, spf = first
    n_frames = 0
    total_bytes = 0
    bitrates = set()
    tag_frames = None
    vbr_tag = False
    while i + 4 <= n:
        hdr = _parse_frame_header(payload[i : i + 4])
        if hdr is None:
            break  # trailing garbage ends the stream
        _, _, bitrate, _, _, frame_bytes, _ = hdr
        if n_frames == 0 and layer == 3:
            off = i + _xing_offset(version, channels)
            tag = payload[off : off + 4]
            # a stream truncated mid-tag must not escape as struct.error
            # (hypothesis-found); the tag is advisory, so just skip it
            if tag in (b"Xing", b"Info") and off + 12 <= len(payload):
                vbr_tag = tag == b"Xing"
                (flags,) = struct.unpack(">I", payload[off + 4 : off + 8])
                if flags & 1:
                    (tag_frames,) = struct.unpack(
                        ">I", payload[off + 8 : off + 12])
            elif (payload[i + 36 : i + 40] == b"VBRI"
                  and i + 54 <= len(payload)):
                vbr_tag = True
                (tag_frames,) = struct.unpack(
                    ">I", payload[i + 50 : i + 54])
        bitrates.add(bitrate)
        n_frames += 1
        total_bytes += frame_bytes
        i += frame_bytes
    duration = n_frames * spf / sample_rate
    avg_kbps = (round(total_bytes * 8 / duration / 1000)
                if duration else None)
    return {
        "codec": f"mpeg{version}-layer{layer}",
        "sample_rate": sample_rate,
        "channels": channels,
        "bitrate_kbps": avg_kbps,
        "n_frames": n_frames,
        "duration_sec": round(duration, 4),
        "vbr": vbr_tag or len(bitrates) > 1,
        "tag_frames": tag_frames,
    }


# ---------------------------------------------------------------------------
# OGG (Vorbis / Opus)
# ---------------------------------------------------------------------------


def parse_ogg_info(payload: bytes) -> dict:
    """Walk OGG pages → codec ident metadata + duration from the terminal
    granule position.  Supports Vorbis and Opus identification headers;
    page CRCs are not recomputed (a probe, not an integrity checker)."""
    if payload[:4] != b"OggS":
        raise AudioDecodeError("bad OGG capture pattern")
    i, n = 0, len(payload)
    codec = sample_rate = channels = None
    preskip = 0
    nominal_kbps = None
    last_granule = None
    n_pages = 0
    while i + 27 <= n:
        if payload[i : i + 4] != b"OggS":
            break  # trailing garbage ends the stream
        if payload[i + 4] != 0:
            raise AudioDecodeError(f"unsupported OGG version {payload[i + 4]}")
        (granule,) = struct.unpack("<q", payload[i + 6 : i + 14])
        nseg = payload[i + 26]
        seg_table = payload[i + 27 : i + 27 + nseg]
        if len(seg_table) != nseg:
            raise AudioDecodeError("truncated OGG segment table")
        body_len = sum(seg_table)
        body = payload[i + 27 + nseg : i + 27 + nseg + body_len]
        if len(body) != body_len:
            raise AudioDecodeError("truncated OGG page body")
        if n_pages == 0:
            # spec-minimum ident sizes (Vorbis I §4.2.2: 30; RFC 7845 §5.1:
            # 19) — a mutated/truncated ident must become an error row, not
            # a struct.error task failure (hypothesis-found)
            if body[:7] == b"\x01vorbis":
                if len(body) < 30:
                    raise AudioDecodeError("truncated Vorbis ident header")
                codec = "vorbis"
                channels = body[11]
                (sample_rate,) = struct.unpack("<I", body[12:16])
                (nominal,) = struct.unpack("<i", body[20:24])
                if nominal > 0:
                    nominal_kbps = round(nominal / 1000)
            elif body[:8] == b"OpusHead":
                if len(body) < 19:
                    raise AudioDecodeError("truncated Opus ident header")
                codec = "opus"
                channels = body[9]
                (preskip,) = struct.unpack("<H", body[10:12])
                (sample_rate,) = struct.unpack("<I", body[12:16])
            else:
                raise AudioDecodeError("unknown OGG codec ident header")
        if granule >= 0:
            last_granule = granule
        n_pages += 1
        i += 27 + nseg + body_len
    if sample_rate in (None, 0) or n_pages == 0:
        raise AudioDecodeError("no parseable OGG ident header")
    duration = None
    if last_granule is not None:
        if codec == "opus":  # granule is in 48 kHz ticks regardless of input
            duration = max(last_granule - preskip, 0) / 48000.0
        else:
            duration = last_granule / sample_rate
    return {
        "codec": codec,
        "sample_rate": sample_rate,
        "channels": channels,
        "bitrate_kbps": nominal_kbps,
        "n_frames": n_pages,
        "duration_sec": round(duration, 4) if duration is not None else None,
        "vbr": codec != "vorbis" or nominal_kbps is None,
        "tag_frames": None,
    }
