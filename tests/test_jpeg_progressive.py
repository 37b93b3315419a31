"""Progressive (SOF2) JPEG decode — VERDICT r4 next-step #3.

Correctness pin is structural, spec-derived: progressive and baseline
encodings of one image carry the SAME quantized DCT coefficients (only the
entropy-coding order differs — G.1), so the decoder must produce
BIT-IDENTICAL pixels for both.  Three independence legs:

  1. package encoder baseline vs package encoder progressive (same
     coefficient math by construction — isolates the scan machinery);
  2. the ORIGINAL test-side baseline encoder of test_jpegcodec (written in
     round 2, independent code) vs the package progressive encoder — both
     use the uniform q=16 table and spec DCT, so coefficients agree and
     pixels must still be bit-identical;
  3. hand-built minimal streams for the corner semantics (EOB runs across
     blocks, ZRL inside refinement, restart resets).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from resume_ocr_spark.formats import imagecodec, jpegcodec, jpegenc
from tests.test_jpegcodec import encode_jpeg as encode_baseline_independent


def _roundtrip_equal(img: np.ndarray, subsample=False, restart_interval=0):
    base = jpegenc.encode_jpeg(img, progressive=False, subsample=subsample,
                               restart_interval=restart_interval)
    prog = jpegenc.encode_jpeg(img, progressive=True, subsample=subsample,
                               restart_interval=restart_interval)
    assert prog != base
    if img.ndim == 2:
        db, dp = jpegcodec.decode_jpeg_gray(base), jpegcodec.decode_jpeg_gray(prog)
    else:
        db, dp = jpegcodec.decode_jpeg(base), jpegcodec.decode_jpeg(prog)
    assert db.shape == img.shape
    np.testing.assert_array_equal(db, dp)
    return dp


def test_gray_bit_identical_to_baseline():
    rng = np.random.RandomState(11)
    for shape in [(24, 40), (33, 47), (13, 21), (8, 8), (1, 1), (64, 64)]:
        _roundtrip_equal(rng.randint(0, 256, size=shape, dtype=np.uint8))


def test_color_444_and_420_bit_identical():
    rng = np.random.RandomState(12)
    img = rng.randint(0, 256, size=(40, 56, 3), dtype=np.uint8)
    _roundtrip_equal(img, subsample=False)
    _roundtrip_equal(img, subsample=True)
    _roundtrip_equal(rng.randint(0, 256, size=(17, 9, 3), dtype=np.uint8),
                     subsample=True)


def test_restart_intervals_in_progressive_scans():
    rng = np.random.RandomState(13)
    img = rng.randint(0, 256, size=(40, 72), dtype=np.uint8)
    plain = _roundtrip_equal(img)
    for ri in (1, 2, 7):
        np.testing.assert_array_equal(
            plain, _roundtrip_equal(img, restart_interval=ri))
    col = rng.randint(0, 256, size=(31, 45, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        _roundtrip_equal(col, subsample=True),
        _roundtrip_equal(col, subsample=True, restart_interval=3))


def test_flat_image_exact_pixels():
    """Spec pin inherited from the baseline suite: flat g with g-128 even
    quantizes exactly at q=16, so progressive decode must return the input
    EXACTLY, not just match baseline."""
    for g in (200, 128, 66):
        img = np.full((24, 40), g, dtype=np.uint8)
        dec = jpegcodec.decode_jpeg_gray(
            jpegenc.encode_jpeg(img, progressive=True))
        np.testing.assert_array_equal(dec, img)


def test_cross_encoder_independence():
    """Independent leg: round-2's test-side baseline encoder (different
    code, same q=16 uniform table) must agree bit-for-bit with the package
    progressive path."""
    rng = np.random.RandomState(14)
    img = rng.randint(0, 256, size=(33, 41), dtype=np.uint8)
    via_old = jpegcodec.decode_jpeg_gray(encode_baseline_independent(img))
    via_prog = jpegcodec.decode_jpeg_gray(
        jpegenc.encode_jpeg(img, progressive=True))
    np.testing.assert_array_equal(via_old, via_prog)
    col = rng.randint(0, 256, size=(26, 30, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        jpegcodec.decode_jpeg(encode_baseline_independent(col, subsample=True)),
        jpegcodec.decode_jpeg(
            jpegenc.encode_jpeg(col, progressive=True, subsample=True)))


def test_rendered_text_image_roundtrip():
    """The fixture class the gated entries feed: real rendered resume text
    → progressive encode → decode, vs the baseline decode of the same
    render."""
    img = imagecodec.decode_image(imagecodec.render_text_image("Jane Doe"))
    _roundtrip_equal(img)


def test_dispatch_via_decode_image():
    img = np.full((20, 30), 180, dtype=np.uint8)
    payload = jpegenc.encode_jpeg(img, progressive=True)
    np.testing.assert_array_equal(imagecodec.decode_image(payload), img)


def test_truncation_is_error():
    rng = np.random.RandomState(15)
    img = rng.randint(0, 256, size=(32, 32), dtype=np.uint8)
    full = jpegenc.encode_jpeg(img, progressive=True)
    sos = full.find(b"\xff\xda")
    for cut in (sos + 4, sos + (len(full) - sos) // 3, len(full) - 40):
        with pytest.raises(jpegcodec.JpegDecodeError):
            jpegcodec.decode_jpeg_gray(full[:cut])


def test_interleaved_ac_scan_rejected():
    """G.1.1: an AC scan carrying >1 component is illegal — splice one."""
    img = np.full((16, 16, 3), 120, dtype=np.uint8)
    data = bytearray(jpegenc.encode_jpeg(img, progressive=True))
    # find the first single-component AC SOS (ns=1) and widen it to ns=3
    i = 2
    while i < len(data) - 1:
        if data[i] == 0xFF and data[i + 1] == 0xDA:
            seglen = struct.unpack(">H", data[i + 2 : i + 4])[0]
            ns = data[i + 4]
            ss = data[i + 5 + 2 * ns]
            if ns == 1 and ss > 0:
                new = (b"\xff\xda" + struct.pack(">H", 2 + 1 + 6 + 3)
                       + bytes([3, 1, 0x01, 2, 0x01, 3, 0x01,
                                ss, data[i + 6 + 2 * ns],
                                data[i + 7 + 2 * ns]]))
                data[i : i + 2 + seglen] = new
                break
            i += 2 + seglen
        else:
            i += 1
    with pytest.raises(jpegcodec.JpegDecodeError, match="interleaved AC"):
        jpegcodec.decode_jpeg(bytes(data))


def test_partial_progressive_is_coarse_but_valid():
    """A progressive file whose tail scans are MISSING (stream ends with
    EOI after the first scans) is legal — early preview semantics.  Chop
    the scan list after the first AC scan and append EOI: decode must
    succeed with the right shape (coarse values, no crash)."""
    rng = np.random.RandomState(16)
    img = rng.randint(0, 256, size=(24, 24), dtype=np.uint8)
    full = jpegenc.encode_jpeg(img, progressive=True)
    # locate the third SOS (DC + two AC-first scans kept)
    pos, count = 2, 0
    third = None
    while pos < len(full) - 1:
        if full[pos] == 0xFF and full[pos + 1] == 0xDA:
            count += 1
            if count == 3:
                third = pos
                break
        pos += 1
    assert third is not None
    chopped = full[:third] + b"\xff\xd9"
    out = jpegcodec.decode_jpeg_gray(chopped)
    assert out.shape == (24, 24)
    # the DC approximation alone puts every pixel within quant error of
    # the block mean — a scrambled decode would blow way past this
    blocks = img[:24, :24].reshape(3, 8, 3, 8).mean(axis=(1, 3))
    approx = np.kron(blocks, np.ones((8, 8)))
    assert float(np.abs(out.astype(float) - approx).mean()) < 24.0


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=10_000),
    subsample=st.booleans(),
    color=st.booleans(),
    ri=st.sampled_from([0, 0, 0, 1, 3]),
)
def test_property_progressive_equals_baseline(h, w, seed, subsample, color, ri):
    rng = np.random.RandomState(seed)
    shape = (h, w, 3) if color else (h, w)
    img = rng.randint(0, 256, size=shape, dtype=np.uint8)
    _roundtrip_equal(img, subsample=subsample and color, restart_interval=ri)


@settings(max_examples=20, deadline=None)
@given(cut=st.integers(min_value=0, max_value=3000),
       seed=st.integers(min_value=0, max_value=100))
def test_property_truncation_error_or_valid(cut, seed):
    """Truncating a progressive JPEG anywhere raises JpegDecodeError or —
    when the cut lands between scans or past the needed bytes — decodes a
    frame of the right shape.  Never a foreign exception."""
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(16, 24), dtype=np.uint8)
    full = jpegenc.encode_jpeg(img, progressive=True)
    cut = min(cut, len(full))
    try:
        out = jpegcodec.decode_jpeg_gray(full[:cut])
        assert out.shape == (16, 24)
    except jpegcodec.JpegDecodeError:
        pass


def test_reencode_jpeg_operator(spark):
    """P10 operator: mixed-container media → deterministic baseline JPEG
    bytes; round-trips through the decoder and errors stay data."""
    from resume_ocr_spark.operators import multimodal as mm

    texts = ["Maria Silva Senior Data Engineer", "Joao Souza Backend Dev"]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    media = mm.render_binary_column(docs, progressive_every=2)
    out = {r["doc_id"]: r for r in mm.reencode_jpeg(media).collect()}
    for i, t in enumerate(texts):
        payload = mm.render_media_payload(i, t, progressive_every=2)
        img = imagecodec.decode_image(payload)
        expect = jpegenc.encode_jpeg(img)
        row = out[i]
        assert row["error"] is None
        assert bytes(row["jpeg"]) == expect          # byte-deterministic
        assert row["n_bytes"] == len(expect)
        np.testing.assert_array_equal(               # and decodable
            jpegcodec.decode_jpeg_gray(bytes(row["jpeg"])),
            jpegcodec.decode_jpeg_gray(expect))
    # corrupt payload → error row, not task failure
    bad = spark.createDataFrame([(9, bytearray(b"\xff\xd8\xffnope"))],
                                "doc_id long, media binary")
    rows = mm.reencode_jpeg(bad).collect()
    assert rows[0]["jpeg"] is None and rows[0]["error"]


def test_resize_half_handles_jpeg_payloads(spark):
    """resize_half used to decode_rimg directly; with container mixes it
    must dispatch (and min-pool the decoded pixels of a SOF2 payload)."""
    from resume_ocr_spark.operators import multimodal as mm

    docs = spark.createDataFrame(
        [(0, "Maria Silva Senior Data Engineer")], "doc_id long, text string")
    media = mm.render_binary_column(docs, progressive_every=1)  # all JPEG
    out = mm.image_metadata(mm.resize_half(media)).collect()[0]
    img = imagecodec.decode_image(
        mm.render_media_payload(0, "Maria Silva Senior Data Engineer",
                                progressive_every=1))
    h, w = (img.shape[0] // 2) * 2, (img.shape[1] // 2) * 2
    small = img[:h, :w].reshape(h // 2, 2, w // 2, 2).min(axis=(1, 3))
    assert out["error"] is None
    assert (out["height"], out["width"]) == small.shape
    assert out["mean_intensity"] == round(float(small.mean()), 4)
