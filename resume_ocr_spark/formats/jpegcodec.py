"""Pure-Python baseline JPEG (JFIF) decoder — numpy IDCT, no external libs.

The reference accepts ``.jpg``/``.jpeg`` resume uploads alongside PNG
(reference: app/services/ocr_service.py:23); PNG decode went native in
round 2 (pngcodec.py) and this module completes the decode matrix so no
image container remains stubbed.

Supported: baseline sequential DCT (SOF0) and progressive DCT (SOF2 —
spectral selection + successive approximation, DC/AC first and refinement
scans, EOB runs, per spec G.1/G.2 and the libjpeg-compatible semantics),
8-bit samples, 1 or 3 components, chroma subsampling factors 1–2
(4:4:4 / 4:2:2 / 4:2:0), restart intervals.  Arithmetic coding and other
SOF variants raise ``JpegDecodeError`` — callers convert to error rows
(error-as-data).

Progressive matters at corpus scale: SOF2 is the majority raster encoding
of real web images (most photo JPEGs on the web are progressive), so a
100 TB crawl pipeline that errors on SOF2 drops most of its image spans
(VERDICT r4 next-step #3).  Correctness pin: progressive and baseline
encodings of the same image carry the SAME quantized DCT coefficients —
only the entropy-coding order differs — so decoding a progressive
re-encode must be bit-identical to the baseline decode
(tests/test_jpeg_progressive.py).

  decode_jpeg(data)       -> (H, W, C) uint8 (C = 1 or 3, YCbCr→RGB done)
  decode_jpeg_gray(data)  -> (H, W) uint8 (the Y/luma plane — what OCR
                             preprocessing consumes)
"""

from __future__ import annotations

import struct

import numpy as np

from . import raise_site

JPEG_MAGIC = b"\xff\xd8\xff"

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# orthonormal 8-point DCT-II basis; IDCT(block) = M.T @ block @ M
_k = np.arange(8)
_DCT_M = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) * np.sqrt(0.25)
_DCT_M[0, :] *= 1 / np.sqrt(2)


class JpegDecodeError(ValueError):
    """Raised on corrupt or unsupported JPEG input."""


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing;
    stops at any real marker (RSTn handled by the caller)."""

    # pad allowance past real data: the spec only permits the final byte's
    # 1-padding, so a decode that keeps consuming synthesized bytes is a
    # truncated scan — two bytes of grace covers the worst split read
    _MAX_PAD_BYTES = 2

    def __init__(self, data: bytes, pos: int):
        self.data, self.pos = data, pos
        self.bits = 0
        self.nbits = 0
        self.pad_bytes = 0

    def _fill_one(self) -> None:
        """Append exactly one byte — LAZY, so a well-formed image never
        touches the pad path at all (its final code ends inside real data)
        and the truncation guard only fires when decoding genuinely asks
        for bits that don't exist."""
        if self.pos >= len(self.data):
            self.pad_bytes += 1
            if self.pad_bytes > self._MAX_PAD_BYTES:
                raise JpegDecodeError("truncated entropy-coded scan")
            self.bits = (self.bits << 8) & 0xFFFFFFFF
            self.nbits += 8
            return
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0
            if nxt == 0x00:
                self.pos += 2  # stuffed FF
            else:
                # real marker (EOI/RSTn): stop consuming; needing bits past
                # it means the scan ended before all MCUs decoded
                self.pad_bytes += 1
                if self.pad_bytes > self._MAX_PAD_BYTES:
                    raise JpegDecodeError(
                        "entropy-coded scan ended before all MCUs")
                self.bits = (self.bits << 8) & 0xFFFFFFFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.bits = ((self.bits << 8) | b) & 0xFFFFFFFF
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill_one()
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> None:
        """Drop buffered bits and advance past an RSTn marker."""
        self.bits = 0
        self.nbits = 0
        self.pad_bytes = 0  # fresh interval, fresh truncation allowance
        d, n = self.data, len(self.data)
        while self.pos < n - 1:
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise JpegDecodeError("expected restart marker")


class _Huffman:
    """Canonical JPEG Huffman table as a (code, length) → symbol dict."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lut[(code, length)] = symbols[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            sym = self.lut.get((code, length))
            if sym is not None:
                return sym
        raise JpegDecodeError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """DIFF/AC value extension (JPEG F.2.2.1)."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# exception types a mutated stream can squeeze out of the entropy/marker
# walk (hypothesis/mutation-fuzz-found: StopIteration from an exhausted
# scan, ValueError from odd unpacks). The public decoders translate them
# to JpegDecodeError so callers' error-as-data handling holds.
_PARSE_LEAKS = (ValueError, IndexError, KeyError, StopIteration,
                struct.error, OverflowError)


def decode_jpeg(data: bytes) -> np.ndarray:
    """→ (H, W, C) uint8; 3-component YCbCr is converted to RGB.

    Raises only JpegDecodeError on any corrupt input."""
    try:
        planes = _decode_planes(data)
        img = np.stack(planes, axis=-1)
    except JpegDecodeError:
        raise
    except _PARSE_LEAKS as exc:
        raise JpegDecodeError(
            f"corrupt JPEG stream: {type(exc).__name__}: {exc}"
            f" [{raise_site(exc)}]") from exc
    if img.shape[2] == 3:
        img = _ycbcr_to_rgb(img)
    return np.clip(np.rint(img), 0, 255).astype(np.uint8)


def decode_jpeg_gray(data: bytes) -> np.ndarray:
    """The luma plane as grayscale (what OCR preprocessing consumes) —
    taken directly from the decoded Y plane, no RGB round trip.

    Raises only JpegDecodeError on any corrupt input."""
    try:
        y = _decode_planes(data)[0]
    except JpegDecodeError:
        raise
    except _PARSE_LEAKS as exc:
        raise JpegDecodeError(
            f"corrupt JPEG stream: {type(exc).__name__}: {exc}"
            f" [{raise_site(exc)}]") from exc
    return np.clip(np.rint(y), 0, 255).astype(np.uint8)


def _decode_planes(data: bytes) -> list[np.ndarray]:
    if data[:3] != JPEG_MAGIC:
        raise JpegDecodeError("bad JPEG magic")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huffman] = {}
    huff_ac: dict[int, _Huffman] = {}
    frame = None
    coef = None  # progressive coefficient state, keyed by component id
    restart_interval = 0
    i = 2
    n = len(data)
    try:
        while i < n:
            if data[i] != 0xFF:
                raise JpegDecodeError(f"marker expected at {i}")
            marker = data[i + 1]
            i += 2
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                continue
            if marker == 0xD9:  # EOI
                break
            (seglen,) = struct.unpack(">H", data[i : i + 2])
            seg = data[i + 2 : i + seglen]
            if marker == 0xDB:  # DQT
                j = 0
                while j < len(seg):
                    pq, tq = seg[j] >> 4, seg[j] & 15
                    if pq != 0:
                        raise JpegDecodeError("16-bit quant tables unsupported")
                    qt[tq] = np.frombuffer(
                        seg[j + 1 : j + 65], dtype=np.uint8).astype(np.int32)
                    j += 65
            elif marker == 0xC4:  # DHT
                j = 0
                while j < len(seg):
                    tc, th = seg[j] >> 4, seg[j] & 15
                    counts = list(seg[j + 1 : j + 17])
                    total = sum(counts)
                    symbols = seg[j + 17 : j + 17 + total]
                    (huff_dc if tc == 0 else huff_ac)[th] = _Huffman(
                        counts, symbols)
                    j += 17 + total
            elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
                prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
                if prec != 8:
                    raise JpegDecodeError("only 8-bit precision supported")
                if nc not in (1, 3):
                    raise JpegDecodeError(
                        f"{nc}-component JPEG unsupported (gray or YCbCr "
                        "only — CMYK/YCCK would silently mis-convert)")
                comps = []
                for c in range(nc):
                    cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                    comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                                  "tq": tq})
                frame = {"h": h, "w": w, "comps": comps,
                         "progressive": marker == 0xC2}
                if frame["progressive"]:
                    coef = _init_coef(frame)
            elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                raise JpegDecodeError(
                    f"unsupported SOF marker 0xFF{marker:02X} "
                    "(baseline sequential or progressive only)")
            elif marker == 0xDD:  # DRI
                (restart_interval,) = struct.unpack(">H", seg[:2])
            elif marker == 0xDA:  # SOS
                if frame is None:
                    raise JpegDecodeError("SOS before SOF")
                if frame["progressive"]:
                    # one of possibly many scans: decode into the shared
                    # coefficient state, then resync the marker walk at the
                    # next real marker (tables/DRI may change between scans)
                    end = _decode_prog_scan(
                        data, i + seglen, seg, frame, coef, huff_dc,
                        huff_ac, restart_interval)
                    frame["n_scans"] = frame.get("n_scans", 0) + 1
                    i = _next_marker(data, end)
                    continue
                ns = seg[0]
                if ns != len(frame["comps"]):
                    # a partial-component scan means multi-scan baseline:
                    # decoding only the first scan would return Y-only as
                    # a fake success
                    raise JpegDecodeError(
                        "multi-scan (non-interleaved per-component) "
                        "baseline unsupported")
                scan = []
                for c in range(ns):
                    cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                    comp = next(x for x in frame["comps"] if x["id"] == cs)
                    scan.append((comp, tt >> 4, tt & 15))
                return _decode_scan(data, i + seglen, frame, scan, qt,
                                    huff_dc, huff_ac, restart_interval)
            i += seglen
    except (IndexError, struct.error) as exc:
        raise JpegDecodeError(f"truncated JPEG structure: {exc}") from exc
    if frame is not None and frame.get("progressive") and frame.get("n_scans"):
        return _idct_assemble(frame, coef, qt)
    raise JpegDecodeError("no scan data found")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac,
                 restart_interval) -> list[np.ndarray]:
    h, w = frame["h"], frame["w"]
    if h == 0 or w == 0:
        raise JpegDecodeError("zero-sized image")
    if len(scan) == 1:
        # JPEG B.2.3: a single-component scan is NON-interleaved — the MCU
        # is one data unit in raster order over the component's full sample
        # grid, whatever sampling factors the SOF declared (jpegtran keeps
        # the source luma factors on -grayscale output)
        scan = [({**scan[0][0], "h": 1, "v": 1}, scan[0][1], scan[0][2])]
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    if hmax < 1 or vmax < 1 or hmax > 2 or vmax > 2:
        raise JpegDecodeError("sampling factors beyond 2 unsupported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for comp, _, _ in scan:
        planes.append(np.zeros((mcuy * comp["v"] * 8, mcux * comp["h"] * 8),
                               dtype=np.float32))
    br = _BitReader(data, pos)
    pred = [0] * len(scan)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                br.align_to_marker()
                pred = [0] * len(scan)
            mcu_count += 1
            for ci, (comp, td, ta) in enumerate(scan):
                try:
                    dc_tab, ac_tab = huff_dc[td], huff_ac[ta]
                    q = qt[comp["tq"]]
                except KeyError as exc:
                    raise JpegDecodeError(f"missing table {exc}") from exc
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        block = _decode_block(br, dc_tab, ac_tab, q, pred, ci)
                        py = (my * comp["v"] + by) * 8
                        px = (mx * comp["h"] + bx) * 8
                        planes[ci][py : py + 8, px : px + 8] = block
    out_planes = []
    for ci, (comp, _, _) in enumerate(scan):
        p = planes[ci]
        # upsample to full MCU-grid resolution, then crop to (h, w)
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w])
    return out_planes


def _decode_block(br, dc_tab, ac_tab, q, pred, ci) -> np.ndarray:
    coefs = np.zeros(64, dtype=np.int32)
    t = dc_tab.decode(br)
    diff = _extend(br.read_bits(t), t)
    pred[ci] += diff
    coefs[0] = pred[ci]
    k = 1
    while k < 64:
        rs = ac_tab.decode(br)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise JpegDecodeError("AC coefficient index out of range")
        coefs[k] = _extend(br.read_bits(s), s)
        k += 1
    dq = np.zeros(64, dtype=np.float32)
    dq[ZIGZAG] = coefs * q
    block = dq.reshape(8, 8)
    return _DCT_M.T @ block @ _DCT_M + 128.0


# ---------------------------------------------------------------------------
# progressive (SOF2) — spec G.1/G.2, libjpeg-compatible semantics
# ---------------------------------------------------------------------------

def _init_coef(frame) -> dict[int, np.ndarray]:
    """Per-component quantized-coefficient buffers, MCU-grid padded.

    Coefficients live in ZIGZAG index order (same layout the baseline
    block decoder fills) and accumulate across scans; dequant + IDCT run
    once at EOI.  Also precomputes each component's interleaved (MCU) and
    non-interleaved (own-sample-grid) block dims — AC scans are always
    non-interleaved (B.2.3), DC scans may be either."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not all(1 <= c["h"] <= 2 and 1 <= c["v"] <= 2 for c in comps):
        raise JpegDecodeError("sampling factors beyond 2 unsupported")
    h, w = frame["h"], frame["w"]
    if h == 0 or w == 0:
        raise JpegDecodeError("zero-sized image")
    frame["mcux"] = -(-w // (8 * hmax))
    frame["mcuy"] = -(-h // (8 * vmax))
    frame["hmax"], frame["vmax"] = hmax, vmax
    coef: dict[int, np.ndarray] = {}
    seen = set()
    for c in comps:
        if c["id"] in seen:
            raise JpegDecodeError("duplicate component id")
        seen.add(c["id"])
        cw = -(-(w * c["h"]) // hmax)   # component sample dims (A.1.1)
        ch = -(-(h * c["v"]) // vmax)
        c["bw"], c["bh"] = -(-cw // 8), -(-ch // 8)
        coef[c["id"]] = np.zeros(
            (frame["mcuy"] * c["v"], frame["mcux"] * c["h"], 64),
            dtype=np.int32)
    return coef


def _next_marker(data: bytes, pos: int) -> int:
    """Position of the next real marker's 0xFF at/after ``pos`` — skips
    entropy remainder bytes, stuffed FF00, fill FFs, and stray RSTn."""
    n = len(data)
    while pos < n - 1:
        if data[pos] != 0xFF:
            pos += 1
        elif data[pos + 1] == 0xFF:
            pos += 1          # fill byte
        elif data[pos + 1] == 0x00 or 0xD0 <= data[pos + 1] <= 0xD7:
            pos += 2          # stuffed byte / restart marker
        else:
            return pos
    raise JpegDecodeError("no marker after progressive scan")


def _dc_first(br, dc_tab, blk, pred, ci, al) -> None:
    t = dc_tab.decode(br)
    pred[ci] += _extend(br.read_bits(t), t)
    blk[0] = pred[ci] << al


def _dc_refine(br, blk, al) -> None:
    # DC point transform is an arithmetic shift (G.1.2.1), so each
    # refinement bit is literally bit Al of the two's-complement value
    if br.read_bit():
        blk[0] |= np.int32(1 << al)


def _ac_first(br, ac_tab, blk, ss, se, al, eobrun) -> int:
    """First AC scan for one block; returns the updated EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = ac_tab.decode(br)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:         # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1       # this block is run member #1
            if r:
                eobrun += br.read_bits(r)
            break
        k += r
        if k > se:
            raise JpegDecodeError("AC coefficient outside spectral band")
        blk[k] = _extend(br.read_bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine(br, ac_tab, blk, ss, se, al, eobrun) -> int:
    """AC refinement scan for one block (G.1.2.3); returns the EOB run.

    Every already-nonzero coefficient visited gets one correction bit;
    new coefficients arrive as ±(1<<Al) after skipping ``r`` zero-HISTORY
    positions (nonzero-history positions don't count toward the run)."""
    p1, m1 = 1 << al, -(1 << al)

    def correct(k: int) -> None:
        v = int(blk[k])
        if br.read_bit() and (v & p1) == 0:
            blk[k] = v + (p1 if v >= 0 else m1)

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = ac_tab.decode(br)
            r, s = rs >> 4, rs & 15
            newval = 0
            if s == 0:
                if r != 15:     # EOBn: refine the rest, then run
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    break
                # r == 15: ZRL — skip 16 zero-history positions below
            else:
                if s != 1:
                    raise JpegDecodeError("AC refinement magnitude != 1")
                newval = p1 if br.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_prog_scan(data, pos, seg, frame, coef, huff_dc, huff_ac,
                      restart_interval) -> int:
    """Decode one progressive scan into ``coef``; returns the byte
    position where entropy-coded data ended (marker resync from there)."""
    ns = seg[0]
    scan = []
    for c in range(ns):
        cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
        comp = next((x for x in frame["comps"] if x["id"] == cs), None)
        if comp is None:
            raise JpegDecodeError(f"scan references unknown component {cs}")
        scan.append((comp, tt >> 4, tt & 15))
    ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
    ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 15
    if ss == 0:
        if se != 0:
            raise JpegDecodeError("progressive scan mixes DC and AC")
    else:
        if ns != 1:
            raise JpegDecodeError("interleaved AC scan is illegal (G.1.1)")
        if not ss <= se <= 63:
            raise JpegDecodeError(f"bad spectral band [{ss},{se}]")
    if al > 13 or ah > 13 or (ah and ah != al + 1):
        raise JpegDecodeError(f"bad successive approximation Ah={ah} Al={al}")

    def tables(td, ta):
        try:
            dc = huff_dc[td] if (ss == 0 and ah == 0) else None
            ac = huff_ac[ta] if ss != 0 else None
        except KeyError as exc:
            raise JpegDecodeError(f"missing Huffman table {exc}") from exc
        return dc, ac

    br = _BitReader(data, pos)
    pred = [0] * ns
    eobrun = 0
    unit = 0

    def maybe_restart():
        nonlocal pred, eobrun
        if restart_interval and unit and unit % restart_interval == 0:
            br.align_to_marker()
            pred = [0] * ns
            eobrun = 0

    if ns > 1:
        # interleaved DC scan over the frame MCU grid (AC rejected above)
        tabs = [tables(td, ta) for _, td, ta in scan]
        for my in range(frame["mcuy"]):
            for mx in range(frame["mcux"]):
                maybe_restart()
                unit += 1
                for ci, (comp, _, _) in enumerate(scan):
                    blocks = coef[comp["id"]]
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            blk = blocks[my * comp["v"] + by,
                                         mx * comp["h"] + bx]
                            if ah == 0:
                                _dc_first(br, tabs[ci][0], blk, pred, ci, al)
                            else:
                                _dc_refine(br, blk, al)
    else:
        # non-interleaved: raster order over the component's own block grid
        comp, td, ta = scan[0]
        dc_tab, ac_tab = tables(td, ta)
        blocks = coef[comp["id"]]
        for by in range(comp["bh"]):
            for bx in range(comp["bw"]):
                maybe_restart()
                unit += 1
                blk = blocks[by, bx]
                if ss == 0:
                    if ah == 0:
                        _dc_first(br, dc_tab, blk, pred, 0, al)
                    else:
                        _dc_refine(br, blk, al)
                elif ah == 0:
                    eobrun = _ac_first(br, ac_tab, blk, ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine(br, ac_tab, blk, ss, se, al, eobrun)
    return br.pos


def _idct_assemble(frame, coef, qt) -> list[np.ndarray]:
    """Accumulated coefficients → planes: dequant, vectorized IDCT over all
    blocks at once (einsum = the per-block ``M.T @ B @ M``), upsample, crop
    — numerically identical to the baseline block path (float32 dequant,
    float64 basis, +128, float32 plane)."""
    h, w = frame["h"], frame["w"]
    planes = []
    for comp in frame["comps"]:
        q = qt.get(comp["tq"])
        if q is None:
            raise JpegDecodeError(f"missing quant table {comp['tq']}")
        dq = (coef[comp["id"]] * q[None, None, :]).astype(np.float32)
        nat = np.zeros_like(dq)
        nat[:, :, ZIGZAG] = dq
        bh, bw = nat.shape[:2]
        blocks = nat.reshape(bh, bw, 8, 8)
        out = np.einsum("ji,yxjk,kl->yxil", _DCT_M, blocks, _DCT_M,
                        optimize=True) + 128.0
        plane = out.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        plane = plane.astype(np.float32)
        ry = frame["vmax"] // comp["v"]
        rx = frame["hmax"] // comp["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    return planes


def _ycbcr_to_rgb(img: np.ndarray) -> np.ndarray:
    y, cb, cr = img[..., 0], img[..., 1] - 128.0, img[..., 2] - 128.0
    return np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=-1)
