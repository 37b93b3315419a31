"""Baseline JPEG decoder tests.

No JPEG files exist anywhere in this sandbox (reference fixtures are
PDF/PNG only), so the tests carry their own minimal baseline ENCODER —
grayscale and 4:2:0 color, restart intervals, custom canonical Huffman
tables (fixed-length layouts: legal JPEG, and immune to spec-table
transcription typos). Decoder correctness is pinned three ways:

  1. spec math: a flat image whose DC coefficient divides the quant step
     must decode EXACTLY (any DCT/quant scaling error breaks equality)
  2. round-trips: random/gradient images within quantization error bounds
  3. structure: restart-marker resync, chroma upsampling, error paths
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from resume_ocr_spark.formats import imagecodec, jpegcodec

Q_STEP = 16  # uniform quant table


# ---------------------------------------------------------------------------
# minimal encoder (test-only)
# ---------------------------------------------------------------------------

# canonical fixed-length tables: 12 DC symbols at length 4; 256 AC symbols
# impossible — JPEG AC alphabet is 162 symbols; put all at length 8
_DC_COUNTS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_SYMBOLS = bytes(range(12))
_AC_SYMBOLS = bytes(
    [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)])
_AC_COUNTS = [0, 0, 0, 0, 0, 0, 0, len(_AC_SYMBOLS), 0, 0, 0, 0, 0, 0, 0, 0]


def _enc_table(counts, symbols):
    code, k, lut = 0, 0, {}
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            lut[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return lut


_DC_LUT = _enc_table(_DC_COUNTS, _DC_SYMBOLS)
_AC_LUT = _enc_table(_AC_COUNTS, _AC_SYMBOLS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def flush(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-padding


def _cat(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _value_bits(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def _encode_block(bw: _BitWriter, block: np.ndarray, pred: list, ci: int):
    f = jpegcodec._DCT_M @ (block.astype(np.float64) - 128.0) @ jpegcodec._DCT_M.T
    coefs = np.rint(f.reshape(-1)[jpegcodec.ZIGZAG] / Q_STEP).astype(int)
    diff = int(coefs[0]) - pred[ci]
    pred[ci] = int(coefs[0])
    t = _cat(diff)
    bw.write(*_DC_LUT[t])
    if t:
        bw.write(_value_bits(diff, t), t)
    run = 0
    for k in range(1, 64):
        v = int(coefs[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.write(*_AC_LUT[0xF0])
            run -= 16
        s = _cat(v)
        bw.write(*_AC_LUT[(run << 4) | s])
        bw.write(_value_bits(v, s), s)
        run = 0
    if run:
        bw.write(*_AC_LUT[0x00])


def encode_jpeg(img: np.ndarray, subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """Baseline encode: (H,W) gray or (H,W,3) RGB; ``subsample`` → 4:2:0."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        comps = [("Y", img.astype(np.float64), 1, 1)]
        hmax = vmax = 1
    else:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] \
            + 0.5 * rgb[..., 2]
        cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] \
            - 0.081312 * rgb[..., 2]
        if subsample:
            hh, ww = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            cbp = np.pad(cb, ((0, hh - h), (0, ww - w)), mode="edge")
            crp = np.pad(cr, ((0, hh - h), (0, ww - w)), mode="edge")
            cb = cbp.reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3))
            comps = [("Y", y, 2, 2), ("Cb", cb, 1, 1), ("Cr", cr, 1, 1)]
            hmax = vmax = 2
        else:
            comps = [("Y", y, 1, 1), ("Cb", cb, 1, 1), ("Cr", cr, 1, 1)]
            hmax = vmax = 1

    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = []
    for _name, plane, ch, cv in comps:
        ph, pw = mcuy * cv * 8, mcux * ch * 8
        p = np.pad(plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
                   mode="edge")
        padded.append(p)

    bw = _BitWriter()
    pred = [0] * len(comps)
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, (_n, _p, ch, cv) in enumerate(comps):
                for by in range(cv):
                    for bx in range(ch):
                        py = (my * cv + by) * 8
                        px = (mx * ch + bx) * 8
                        _encode_block(
                            bw, padded[ci][py : py + 8, px : px + 8], pred, ci)
    bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    qt = bytes([0]) + bytes([Q_STEP] * 64)
    out += seg(0xDB, qt)
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for i, (_n, _p, ch, cv) in enumerate(comps):
        sof += bytes([i + 1, (ch << 4) | cv, 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_COUNTS) + _DC_SYMBOLS)
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_COUNTS) + _AC_SYMBOLS)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for i in range(len(comps)):
        sos += bytes([i + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_flat_image_decodes_exactly():
    """Spec pin: flat value g → DC = 8*(g-128); with g-128 even the DC
    quantizes exactly at q=16, so ANY scaling error in DCT/dequant/IDCT
    breaks exact equality."""
    for g in (200, 128, 66):
        img = np.full((24, 40), g, dtype=np.uint8)
        dec = jpegcodec.decode_jpeg_gray(encode_jpeg(img))
        assert dec.shape == (24, 40)
        np.testing.assert_array_equal(dec, img)


def test_random_gray_roundtrip_error_bounded():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, size=(33, 47), dtype=np.uint8)
    dec = jpegcodec.decode_jpeg_gray(encode_jpeg(img))
    err = np.abs(dec.astype(int) - img.astype(int))
    assert float(err.mean()) < 20  # uniform q=16 on white noise
    assert dec.shape == img.shape


def test_gradient_gray_high_fidelity():
    x = np.linspace(0, 255, 64)
    img = np.clip(np.rint(x[None, :] + x[:, None] / 4), 0, 255).astype(np.uint8)
    dec = jpegcodec.decode_jpeg_gray(encode_jpeg(img))
    err = np.abs(dec.astype(int) - img.astype(int))
    assert float(err.mean()) < 3 and int(err.max()) <= 24


def test_color_444_and_420_roundtrip():
    rng = np.random.RandomState(2)
    base = rng.randint(60, 196, size=(4, 5, 3))
    img = np.kron(base, np.ones((8, 8, 1))).astype(np.uint8)  # smooth blocks
    for subsample in (False, True):
        dec = jpegcodec.decode_jpeg(encode_jpeg(img, subsample=subsample))
        assert dec.shape == img.shape
        err = np.abs(dec.astype(int) - img.astype(int))
        assert float(err.mean()) < 6, f"subsample={subsample}"


def test_restart_interval_resync():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(40, 72), dtype=np.uint8)
    plain = jpegcodec.decode_jpeg_gray(encode_jpeg(img))
    rst = jpegcodec.decode_jpeg_gray(encode_jpeg(img, restart_interval=2))
    np.testing.assert_array_equal(plain, rst)


def test_odd_dimensions_crop():
    img = np.full((13, 21), 90, dtype=np.uint8)
    dec = jpegcodec.decode_jpeg_gray(encode_jpeg(img))
    assert dec.shape == (13, 21)
    np.testing.assert_array_equal(dec, img)


def test_errors_are_data():
    good = encode_jpeg(np.full((16, 16), 100, dtype=np.uint8))
    with pytest.raises(jpegcodec.JpegDecodeError):
        jpegcodec.decode_jpeg(good[:30])
    with pytest.raises(jpegcodec.JpegDecodeError):
        jpegcodec.decode_jpeg(b"\xff\xd8\xffnope")
    # progressive SOF2 is detected, not mis-decoded
    prog = bytearray(good)
    idx = prog.find(b"\xff\xc0")
    prog[idx + 1] = 0xC2
    with pytest.raises(jpegcodec.JpegDecodeError):
        jpegcodec.decode_jpeg(bytes(prog))


def test_image_branch_dispatch():
    """decode_image routes real JPEG payloads into the OCR path."""
    img = np.full((20, 30), 180, dtype=np.uint8)
    payload = encode_jpeg(img)
    out = imagecodec.decode_image(payload)
    np.testing.assert_array_equal(out, img)
    with pytest.raises(imagecodec.ImageDecodeError):
        imagecodec.decode_image(payload[:20])


def test_truncated_scan_raises():
    """Cutting entropy-coded data mid-scan must raise, not decode the
    missing region as synthesized zeros."""
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(64, 64), dtype=np.uint8)
    full = encode_jpeg(img)
    sos = full.find(b"\xff\xda")
    cut = sos + (len(full) - sos) // 2
    with pytest.raises(jpegcodec.JpegDecodeError):
        jpegcodec.decode_jpeg(full[:cut])


def test_single_component_scan_is_noninterleaved():
    """JPEG B.2.3: grayscale scans ignore SOF sampling factors (jpegtran
    -grayscale keeps the source's 2x2 luma factors) — blocks are raster
    order over the full sample grid, not 2x2 MCIs."""
    img = np.clip(np.rint(np.linspace(0, 255, 24)[None, :]
                          + np.zeros((24, 1))), 0, 255).astype(np.uint8)
    data = bytearray(encode_jpeg(img))
    sof = data.find(b"\xff\xc0")
    assert data[sof + 11] == 0x11  # h=1,v=1 as written
    data[sof + 11] = 0x22          # pretend 2x2 luma factors
    dec = jpegcodec.decode_jpeg_gray(bytes(data))
    err = np.abs(dec.astype(int) - img.astype(int))
    assert float(err.mean()) < 3  # still decodes correctly, not scrambled


def test_four_component_rejected():
    good = encode_jpeg(np.full((8, 8), 90, dtype=np.uint8))
    data = bytearray(good)
    sof = data.find(b"\xff\xc0")
    # splice a 4-component SOF in place (lengths won't matter: the count
    # check fires before any table lookups)
    data[sof + 9] = 4
    with pytest.raises(jpegcodec.JpegDecodeError):
        jpegcodec.decode_jpeg(bytes(data))


def test_multi_scan_rejected():
    """A scan carrying fewer components than the frame (multi-scan
    baseline) must error, not return the Y plane as a fake success."""
    rgb = np.full((8, 8, 3), 120, dtype=np.uint8)
    data = bytearray(encode_jpeg(rgb))
    sos = data.find(b"\xff\xda")
    # rewrite SOS from 3 components to 1 (shrink the segment)
    seg_end = sos + 2 + struct.unpack(">H", data[sos + 2 : sos + 4])[0]
    new_sos = (b"\xff\xda" + struct.pack(">H", 2 + 1 + 2 + 3)
               + bytes([1, 1, 0x00, 0, 63, 0]))
    data[sos:seg_end] = new_sos
    with pytest.raises(jpegcodec.JpegDecodeError):
        jpegcodec.decode_jpeg(bytes(data))


from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=10_000),
    subsample=st.booleans(),
    color=st.booleans(),
)
def test_property_roundtrip_never_crashes(h, w, seed, subsample, color):
    """Any size (incl. non-multiple-of-8/16 and 1-pixel), any content,
    both color modes: encode→decode preserves shape and stays within
    quantization error — no crashes, no shape drift."""
    rng = np.random.RandomState(seed)
    if color:
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        dec = jpegcodec.decode_jpeg(encode_jpeg(img, subsample=subsample))
        assert dec.shape == (h, w, 3)
    else:
        img = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
        dec = jpegcodec.decode_jpeg_gray(encode_jpeg(img))
        assert dec.shape == (h, w)
        err = np.abs(dec.astype(int) - img.astype(int))
        assert float(err.mean()) < 40  # noise worst case at q=16


@settings(max_examples=25, deadline=None)
@given(cut=st.integers(min_value=0, max_value=400))
def test_property_truncation_is_error_or_valid(cut):
    """Truncating a JPEG anywhere either raises JpegDecodeError or, when
    the cut lands past the last needed byte, still decodes the full frame
    — it must never crash with a different exception type."""
    img = np.full((16, 24), 77, dtype=np.uint8)
    full = encode_jpeg(img)
    cut = min(cut, len(full))
    try:
        out = jpegcodec.decode_jpeg_gray(full[:cut])
        assert out.shape == (16, 24)  # only reachable if decode succeeded
    except jpegcodec.JpegDecodeError:
        pass
