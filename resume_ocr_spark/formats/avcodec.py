"""Deterministic audio/video container codecs (RAUD / RVID).

Real RIFF/WAV PCM decode is native here (``decode_wav`` — WAV is a plain
chunked container, no libs needed; ``decode_audio_any`` dispatches
RAUD|WAV).  ``probe_audio_any`` additionally reads container-level
metadata (ffprobe subset) for MP3 / OGG via formats/mpegaudio.py.
Decode-to-PCM for compressed audio (MP3/OGG) genuinely needs ffmpeg-class
libraries absent from this sandbox and stays stubbed in
operators/multimodal.py, while these two tiny containers make the
Spark-side plumbing (binary columns, Arrow batch UDFs, frame explode,
feature schemas) real and fully tested.  Both are pure numpy, seeded only
by payload content, so every render/decode round-trip is bit-deterministic
across batch sizes and executors.

RAUD1 layout: ``b"RAUD1" | <u4 sample_rate> | <u4 n_samples> | int16 LE PCM``
RVID1 layout: ``b"RVID1" | <u4 n_frames> | <u4 h> | <u4 w> | u8 frames``
(RVID frames are grayscale, frame-major — one decoded frame re-wraps as a
RIMG payload so sampled frames flow straight into the image operators).
"""

from __future__ import annotations

import hashlib

import numpy as np

AUDIO_MAGIC = b"RAUD1"
VIDEO_MAGIC = b"RVID1"
SAMPLE_RATE = 8000


class AudioDecodeError(ValueError):
    """Raised on corrupt/truncated RAUD payloads."""


class VideoDecodeError(ValueError):
    """Raised on corrupt/truncated RVID payloads."""


def _seed(text: str) -> int:
    return int.from_bytes(hashlib.md5(text.encode("utf-8")).digest()[:4], "little")


def render_audio(text: str, sample_rate: int = SAMPLE_RATE) -> bytes:
    """Deterministic PCM synthesis from text: three superposed sinusoids with
    content-derived frequencies/phases; length varies with the text so batch
    rows are ragged (the realistic case for an audio column)."""
    seed = _seed(text)
    rng = np.random.RandomState(seed)
    n = 2048 + 512 * (len(text) % 5)
    t = np.arange(n, dtype=np.float64) / sample_rate
    wave = np.zeros(n)
    for _ in range(3):
        freq = 100.0 + rng.randint(0, 3000)
        phase = rng.uniform(0, 2 * np.pi)
        amp = rng.uniform(0.2, 0.9)
        wave += amp * np.sin(2 * np.pi * freq * t + phase)
    pcm = np.clip(wave / 3.0, -1.0, 1.0)
    samples = (pcm * 32767).astype("<i2")
    header = AUDIO_MAGIC + np.array([sample_rate, n], dtype="<u4").tobytes()
    return header + samples.tobytes()


def decode_raud(payload: bytes) -> tuple[int, np.ndarray]:
    """→ (sample_rate, int16 sample array). Error-as-data callers catch
    :class:`AudioDecodeError` and emit an error row, never a task failure."""
    if len(payload) < 13 or payload[:5] != AUDIO_MAGIC:
        raise AudioDecodeError("bad RAUD magic")
    sr, n = (int(x) for x in np.frombuffer(payload[5:13], dtype="<u4"))
    body = payload[13:]
    if sr <= 0 or n <= 0 or len(body) != 2 * n:
        raise AudioDecodeError(f"truncated RAUD payload ({len(body)} != {2 * n})")
    return sr, np.frombuffer(body, dtype="<i2").copy()


def write_wav(pcm: np.ndarray, sample_rate: int = SAMPLE_RATE) -> bytes:
    """int16 mono PCM → RIFF/WAVE (PCM format 1, 16-bit)."""
    import struct

    data = np.asarray(pcm).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Real RIFF/WAV decode (PCM format 1, 8/16-bit, any channel count —
    multi-channel downmixes to mono by averaging). No external libs: WAV
    PCM is a plain chunked container. → (sample_rate, int16 mono array)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise AudioDecodeError("bad RIFF/WAVE header")
    i, n = 12, len(payload)
    sr = bits = channels = None
    data = None
    while i + 8 <= n:
        cid = payload[i : i + 4]
        (clen,) = struct.unpack("<I", payload[i + 4 : i + 8])
        body = payload[i + 8 : i + 8 + clen]
        if len(body) != clen:
            raise AudioDecodeError("truncated WAV chunk")
        if cid == b"fmt ":
            if clen < 16:
                raise AudioDecodeError("short fmt chunk")
            audio_fmt, channels, sr, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16])
            if audio_fmt != 1:
                raise AudioDecodeError(
                    f"non-PCM WAV (format {audio_fmt}) unsupported")
        elif cid == b"data":
            data = body
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    if sr is None or data is None:
        raise AudioDecodeError("missing fmt or data chunk")
    if sr <= 0:
        raise AudioDecodeError("invalid WAV sample rate 0")
    if bits == 16:
        samples = np.frombuffer(
            data[: len(data) // 2 * 2], dtype="<i2").astype(np.int32)
    elif bits == 8:  # unsigned 8-bit per spec
        samples = (np.frombuffer(data, dtype=np.uint8).astype(np.int32)
                   - 128) * 256
    else:
        raise AudioDecodeError(f"{bits}-bit WAV unsupported")
    if channels > 1:
        samples = samples[: len(samples) // channels * channels]
        samples = samples.reshape(-1, channels).mean(axis=1).astype(np.int32)
    return int(sr), np.clip(samples, -32768, 32767).astype(np.int16)


def decode_audio_any(payload: bytes) -> tuple[int, np.ndarray]:
    """Container dispatch: RAUD (engine-native) or real RIFF/WAV PCM."""
    if payload[:5] == AUDIO_MAGIC:
        return decode_raud(payload)
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    raise AudioDecodeError("unknown audio container (RAUD/WAV supported)")


def probe_audio_any(payload: bytes) -> dict:
    """ffprobe-style container probe → uniform metadata dict over every
    audio container the engine understands: RAUD / RIFF-WAV (header walk,
    no sample conversion) plus MP3 / OGG-Vorbis / OGG-Opus
    (formats/mpegaudio.py frame/page walk).  Decode-to-PCM for MP3/OGG
    remains stubbed; the probe is the honest no-DSP subset."""
    import struct

    from . import mpegaudio

    p = bytes(payload)
    if p[:5] == AUDIO_MAGIC:
        if len(p) < 13:
            raise AudioDecodeError("bad RAUD magic")
        sr, n = (int(x) for x in np.frombuffer(p[5:13], dtype="<u4"))
        if sr <= 0 or len(p[13:]) != 2 * n:
            raise AudioDecodeError("truncated RAUD payload")
        return {"codec": "raud-pcm", "sample_rate": sr, "channels": 1,
                "bitrate_kbps": round(sr * 16 / 1000), "n_frames": n,
                "duration_sec": round(n / sr, 4), "vbr": False,
                "tag_frames": None}
    if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
        i, n = 12, len(p)
        sr = channels = bits = data_len = None
        while i + 8 <= n:
            cid = p[i : i + 4]
            (clen,) = struct.unpack("<I", p[i + 4 : i + 8])
            if i + 8 + clen > n:
                raise AudioDecodeError("truncated WAV chunk")
            if cid == b"fmt " and clen >= 16:
                _fmt, channels, sr, _br, _ba, bits = struct.unpack(
                    "<HHIIHH", p[i + 8 : i + 24])
            elif cid == b"data":
                data_len = clen
            i += 8 + clen + (clen & 1)
        if not sr or data_len is None or not bits or not channels:
            raise AudioDecodeError("missing fmt or data chunk")
        n_samples = data_len // (bits // 8) // channels
        return {"codec": f"pcm_s{bits}le", "sample_rate": int(sr),
                "channels": int(channels),
                "bitrate_kbps": round(sr * bits * channels / 1000),
                "n_frames": n_samples,
                "duration_sec": round(n_samples / sr, 4), "vbr": False,
                "tag_frames": None}
    if p[:4] == b"OggS":
        return mpegaudio.parse_ogg_info(p)
    if (p[:3] == b"ID3"
            or (len(p) > 1 and p[0] == 0xFF and (p[1] & 0xE0) == 0xE0)):
        return mpegaudio.parse_mp3_info(p)
    raise AudioDecodeError("unknown audio container")


def render_video(text: str, h: int = 24, w: int = 32) -> bytes:
    """Deterministic grayscale clip: a content-seeded gradient that drifts one
    pixel per frame (so frame k is recoverable/checkable from frame 0)."""
    seed = _seed(text)
    n_frames = 4 + seed % 9
    base = (
        (np.arange(h)[:, None] * 7 + np.arange(w)[None, :] * 3 + seed) % 256
    ).astype(np.uint8)
    frames = np.stack([np.roll(base, k, axis=1) for k in range(n_frames)])
    header = VIDEO_MAGIC + np.array([n_frames, h, w], dtype="<u4").tobytes()
    return header + frames.tobytes()


def decode_rvid(payload: bytes) -> np.ndarray:
    """→ uint8 array of shape (n_frames, h, w)."""
    if len(payload) < 17 or payload[:5] != VIDEO_MAGIC:
        raise VideoDecodeError("bad RVID magic")
    n, h, w = (int(x) for x in np.frombuffer(payload[5:17], dtype="<u4"))
    body = payload[17:]
    if n * h * w == 0 or len(body) != n * h * w:
        raise VideoDecodeError(f"truncated RVID payload ({len(body)} != {n * h * w})")
    return np.frombuffer(body, dtype=np.uint8).reshape(n, h, w).copy()


def decode_video_any(payload: bytes) -> np.ndarray:
    """Container dispatch → uint8 frames (n, h, w): RVID (engine-native) or
    MP4 with an MJPEG track (formats/mp4codec.py). Anything else raises
    VideoDecodeError → an error row upstream."""
    if payload[:5] == VIDEO_MAGIC:
        return decode_rvid(payload)
    from . import mp4codec

    if mp4codec.is_mp4(payload):
        try:
            return mp4codec.extract_frames_gray(payload)
        except mp4codec.Mp4DecodeError as exc:
            raise VideoDecodeError(str(exc)) from exc
    raise VideoDecodeError("bad RVID magic")


def frame_to_rimg(frame: np.ndarray) -> bytes:
    """Re-wrap one decoded video frame as a RIMG payload so sampled frames
    feed the existing image operators (metadata/resize) unchanged."""
    from . import imagecodec

    header = imagecodec.MAGIC + np.array(frame.shape, dtype="<u4").tobytes()
    return header + frame.tobytes()
