"""Deterministic pure-numpy JPEG encoder — baseline (SOF0) and progressive
(SOF2, spectral selection + successive approximation, libjpeg's standard
scan script).

Three jobs:

1. **Fixture synthesis** for the progressive decoder's gate/test surfaces —
   no JPEG files exist in this sandbox, and the correctness pin for SOF2 is
   structural: progressive and baseline encodings carry the SAME quantized
   DCT coefficients (only the entropy-coding order differs), so the decoder
   must produce bit-identical pixels for both encodings of one image.
2. **The P10 re-encode sink**: the reference re-encodes page images as JPEG
   before shipping them onward (reference: app/services/ocr_service.py:84
   pixmap→image bytes); ``operators.multimodal.reencode_jpeg`` wraps this
   encoder as the Spark-side batch UDF.
3. **Web-corpus realism**: SOF2 is the majority raster encoding of real
   crawls, so the gated image entries (`dedup_phash`,
   `multimodal_pipeline`) each carry progressive payloads synthesized here
   (VERDICT r4 next-step #3).

Encoding choices are fixed for determinism: one uniform quant table
(``q_step``), fixed-length canonical Huffman tables (all AC symbols at one
code length — legal JPEG, immune to spec-table transcription typos), and
the 4:2:0 averaging filter of the baseline test encoder.  Compression
ratio is NOT the goal; byte-determinism and spec-shape coverage are.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpegcodec import _DCT_M, ZIGZAG

Q_STEP_DEFAULT = 16

# fixed-length canonical tables. DC: 12 categories at length 4.
# AC: EOBn (r<<4 for r=0..14, incl. 0x00=EOB), ZRL (0xF0), and (r<<4)|s for
# s=1..10 — 176 symbols, all at length 8 (176 < 256 ⇒ prefix-valid).
_DC_COUNTS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_SYMBOLS = bytes(range(12))
_AC_SYMBOLS = bytes(
    [r << 4 for r in range(15)] + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)])
_AC_COUNTS = [0, 0, 0, 0, 0, 0, 0, len(_AC_SYMBOLS), 0, 0, 0, 0, 0, 0, 0, 0]


def _enc_table(counts: list[int], symbols: bytes) -> dict[int, tuple[int, int]]:
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
    def __init__(self) -> None:
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


def _planes(img: np.ndarray, subsample: bool):
    """RGB/gray → list of (plane, h_factor, v_factor) + frame dims."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        return [(img.astype(np.float64), 1, 1)], h, w, 1, 1
    rgb = img.astype(np.float64)
    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] \
        + 0.5 * rgb[..., 2]
    cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] \
        - 0.081312 * rgb[..., 2]
    if not subsample:
        return [(y, 1, 1), (cb, 1, 1), (cr, 1, 1)], h, w, 1, 1
    hh, ww = (h + 1) // 2 * 2, (w + 1) // 2 * 2
    cbp = np.pad(cb, ((0, hh - h), (0, ww - w)), mode="edge")
    crp = np.pad(cr, ((0, hh - h), (0, ww - w)), mode="edge")
    cb2 = cbp.reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3))
    cr2 = crp.reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3))
    return [(y, 2, 2), (cb2, 1, 1), (cr2, 1, 1)], h, w, 2, 2


def _quant_blocks(plane: np.ndarray, bh: int, bw: int, q: int) -> np.ndarray:
    """Plane → (bh, bw, 64) int32 quantized coefficients in ZIGZAG order,
    all blocks at once (einsum = per-block ``M @ (B-128) @ M.T``)."""
    p = np.pad(plane, ((0, bh * 8 - plane.shape[0]),
                       (0, bw * 8 - plane.shape[1])), mode="edge") - 128.0
    blocks = p.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
    f = np.einsum("ij,yxjk,lk->yxil", _DCT_M, blocks, _DCT_M, optimize=True)
    return np.rint(f.reshape(bh, bw, 64)[:, :, ZIGZAG] / q).astype(np.int32)


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


class _ScanWriter:
    """One progressive scan's entropy stream, with the restart/EOB-run
    bookkeeping shared by all four scan kinds."""

    def __init__(self, restart_interval: int):
        self.bw = _BitWriter()
        self.ri = restart_interval
        self.unit = 0
        self.rst = 0
        self.pred = None  # set by caller
        self.eobrun = 0
        self.run_bits: list[int] = []  # correction bits owned by the run

    def maybe_restart(self, ncomp: int) -> None:
        if self.ri and self.unit and self.unit % self.ri == 0:
            self.flush_eobrun()
            self.bw.flush()
            self.bw.out += bytes([0xFF, 0xD0 + self.rst])
            self.rst = (self.rst + 1) & 7
            self.pred = [0] * ncomp
        self.unit += 1

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            self.bw.write(*_AC_LUT[r << 4])
            if r:
                self.bw.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.run_bits:
            self.bw.write(b, 1)
        self.run_bits = []


def _enc_dc_first(sw: _ScanWriter, blk: np.ndarray, ci: int, al: int) -> None:
    # DC point transform is an ARITHMETIC shift (G.1.2.1) — python's >>
    v = int(blk[0]) >> al
    diff = v - sw.pred[ci]
    sw.pred[ci] = v
    t = _cat(diff)
    sw.bw.write(*_DC_LUT[t])
    if t:
        sw.bw.write(_value_bits(diff, t), t)


def _enc_dc_refine(sw: _ScanWriter, blk: np.ndarray, al: int) -> None:
    sw.bw.write((int(blk[0]) >> al) & 1, 1)


def _enc_ac_first(sw: _ScanWriter, blk: np.ndarray, ss: int, se: int,
                  al: int) -> None:
    """AC point transform is a MAGNITUDE shift: sign · (|v| >> Al)."""
    r = 0
    wrote = False
    for k in range(ss, se + 1):
        v = int(blk[k])
        a = abs(v) >> al
        if a == 0:
            r += 1
            continue
        sw.flush_eobrun()
        while r > 15:
            sw.bw.write(*_AC_LUT[0xF0])
            r -= 16
        s = _cat(a)
        sw.bw.write(*_AC_LUT[(r << 4) | s])
        sw.bw.write(_value_bits(a if v > 0 else -a, s), s)
        r = 0
        wrote = True
    if r > 0 or not wrote:
        sw.eobrun += 1
        if sw.eobrun == 0x7FFF:
            sw.flush_eobrun()


def _enc_ac_refine(sw: _ScanWriter, blk: np.ndarray, ss: int, se: int,
                   al: int) -> None:
    """Mirror of the decoder's refinement walk (G.1.2.3 / jcphuff
    semantics): newly-significant coefficients (|v|>>Al == 1) become
    (run, 1) symbols; already-significant ones contribute one correction
    bit each, buffered and emitted right after the symbol whose advance
    pass the decoder reads them in; trailing content joins the EOB run.

    The ZRL check runs at EVERY nonzero position (not only at newly-
    significant ones) so correction bits partition onto the right side of
    each ZRL — the decoder consumes a history coefficient's bit during
    whichever symbol's advance pass crosses it.  The ``idx <= eob`` guard
    folds trailing ZRLs into the EOB run instead."""
    vals = [int(blk[k]) for k in range(ss, se + 1)]
    mags = [abs(v) >> al for v in vals]
    eob = -1  # last newly-significant index, -1 if none
    for idx, a in enumerate(mags):
        if a == 1:
            eob = idx
    cur_bits: list[int] = []
    r = 0
    for idx, a in enumerate(mags):
        if a == 0:
            r += 1
            continue
        while r > 15 and idx <= eob:
            sw.flush_eobrun()
            sw.bw.write(*_AC_LUT[0xF0])
            r -= 16
            for b in cur_bits:
                sw.bw.write(b, 1)
            cur_bits = []
        if a > 1:
            cur_bits.append(a & 1)  # history coefficient: correction bit
            continue
        # newly significant (|v|>>Al == 1 implies zero history at Al+1)
        sw.flush_eobrun()
        sw.bw.write(*_AC_LUT[(r << 4) | 1])
        sw.bw.write(1 if vals[idx] > 0 else 0, 1)
        for b in cur_bits:
            sw.bw.write(b, 1)
        cur_bits = []
        r = 0
    if r > 0 or cur_bits:
        sw.eobrun += 1
        sw.run_bits.extend(cur_bits)
        if sw.eobrun == 0x7FFF:
            sw.flush_eobrun()


def _default_script(ncomp: int) -> list[tuple[list[int], int, int, int, int]]:
    """libjpeg's jpeg_simple_progression script: (comp_indices, Ss, Se,
    Ah, Al) — exercises every decoder path (interleaved/non-interleaved DC,
    AC first split bands, AC refinement, DC refinement, EOB runs)."""
    if ncomp == 1:
        return [
            ([0], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    return [
        ([0, 1, 2], 0, 0, 0, 1),
        ([0], 1, 5, 0, 2),
        ([2], 1, 63, 0, 1),
        ([1], 1, 63, 0, 1),
        ([0], 6, 63, 0, 2),
        ([0], 1, 63, 2, 1),
        ([0, 1, 2], 0, 0, 1, 0),
        ([2], 1, 63, 1, 0),
        ([1], 1, 63, 1, 0),
        ([0], 1, 63, 1, 0),
    ]


def encode_jpeg(img: np.ndarray, *, progressive: bool = False,
                subsample: bool = False, restart_interval: int = 0,
                q_step: int = Q_STEP_DEFAULT) -> bytes:
    """(H,W) gray or (H,W,3) RGB uint8 → JPEG bytes.

    ``progressive=False`` emits single-scan baseline SOF0;
    ``progressive=True`` emits SOF2 with libjpeg's standard scan script.
    Both carry identical quantized coefficients by construction, so both
    decode to bit-identical pixels."""
    comps, h, w, hmax, vmax = _planes(img, subsample)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    coefs = []   # (bh_alloc, bw_alloc, 64) per component
    dims = []    # non-interleaved (bh, bw) per component (B.2.3)
    for plane, ch, cv in comps:
        coefs.append(_quant_blocks(plane, mcuy * cv, mcux * ch, q_step))
        cw = -(-(w * ch) // hmax)
        chh = -(-(h * cv) // vmax)
        dims.append((-(-chh // 8), -(-cw // 8)))

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes([q_step] * 64))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for i, (_p, ch, cv) in enumerate(comps):
        sof += bytes([i + 1, (ch << 4) | cv, 0])
    out += _seg(0xC2 if progressive else 0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_COUNTS) + _DC_SYMBOLS)
    out += _seg(0xC4, bytes([0x10]) + bytes(_AC_COUNTS) + _AC_SYMBOLS)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))

    if not progressive:
        script = [(list(range(len(comps))), 0, 63, 0, 0)]
    else:
        script = _default_script(len(comps))

    for comp_idx, ss, se, ah, al in script:
        sos = bytes([len(comp_idx)])
        for ci in comp_idx:
            sos += bytes([ci + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, sos)
        sw = _ScanWriter(restart_interval)
        sw.pred = [0] * len(comp_idx)
        if len(comp_idx) > 1:
            # interleaved (DC or full baseline) over the frame MCU grid
            for my in range(mcuy):
                for mx in range(mcux):
                    sw.maybe_restart(len(comp_idx))
                    for si, ci in enumerate(comp_idx):
                        _p, ch, cv = comps[ci]
                        for by in range(cv):
                            for bx in range(ch):
                                blk = coefs[ci][my * cv + by, mx * ch + bx]
                                _enc_unit(sw, blk, si, ss, se, ah, al)
        else:
            ci = comp_idx[0]
            bh, bw_ = dims[ci] if progressive else (
                coefs[ci].shape[0], coefs[ci].shape[1])
            for by in range(bh):
                for bx in range(bw_):
                    sw.maybe_restart(1)
                    _enc_unit(sw, coefs[ci][by, bx], 0, ss, se, ah, al)
        sw.flush_eobrun()
        sw.bw.flush()
        out += sw.bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _enc_unit(sw: _ScanWriter, blk: np.ndarray, si: int, ss: int, se: int,
              ah: int, al: int) -> None:
    """Encode one block's contribution to the current scan."""
    if ss == 0 and se == 0:          # DC scan
        if ah == 0:
            _enc_dc_first(sw, blk, si, al)
        else:
            _enc_dc_refine(sw, blk, al)
    elif ss == 0:                    # full-band baseline scan (DC + AC)
        _enc_dc_first(sw, blk, si, al)
        _enc_baseline_ac(sw, blk, se)
    elif ah == 0:
        _enc_ac_first(sw, blk, ss, se, al)
    else:
        _enc_ac_refine(sw, blk, ss, se, al)


def _enc_baseline_ac(sw: _ScanWriter, blk: np.ndarray, se: int) -> None:
    run = 0
    for k in range(1, se + 1):
        v = int(blk[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            sw.bw.write(*_AC_LUT[0xF0])
            run -= 16
        s = _cat(v)
        sw.bw.write(*_AC_LUT[(run << 4) | s])
        sw.bw.write(_value_bits(v, s), s)
        run = 0
    if run:
        sw.bw.write(*_AC_LUT[0x00])
