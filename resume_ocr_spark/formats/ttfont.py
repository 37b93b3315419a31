"""Pure-Python TrueType glyph rasterizer (the prototype source for real-font
OCR, formats/realfont.py).

The reference OCRs real documents with Tesseract, whose classifiers were
trained on rendered fonts (app/services/ocr_service.py:42). This container
has no OCR engine but does ship the DejaVu TrueType family
(/usr/share/fonts/truetype/dejavu) — so the engine rasterizes its own glyph
prototypes directly from the font files: `cmap` (format 4) → glyph id,
`glyf` quadratic outlines (simple + composite), scanline fill with nonzero
winding over a supersampled grid → antialiased coverage bitmaps, plus
`hmtx` advances and `head`/`hhea`/`OS/2` vertical metrics.

Parsing follows the public OpenType/TrueType specification (Apple TrueType
Reference Manual / Microsoft OpenType spec). Only the tables needed for
b/w glyph rendering are implemented; no hinting (unhinted outlines are fine
for prototype matching — Tesseract's trainer rasterizes unhinted too).

Everything is deterministic: fixed subdivision count for quadratic
flattening, fixed supersampling grid.
"""

from __future__ import annotations

import struct
from functools import lru_cache

import numpy as np

DEJAVU_DIR = "/usr/share/fonts/truetype/dejavu"

# quadratic Bézier flattening: fixed 8 segments per curve — deterministic
# and comfortably below a pixel of error at the supersampled sizes used
_BEZ_SEGS = 8
_SS = 4  # supersampling factor for coverage


class FontParseError(ValueError):
    """Raised on malformed/unsupported font files."""


class TrueTypeFont:
    """Minimal TrueType reader: cmap/glyf/loca/head/maxp/hhea/hmtx."""

    def __init__(self, data: bytes):
        self.data = data
        self.tables: dict[bytes, tuple[int, int]] = {}
        (sfnt, num_tables) = struct.unpack_from(">IH", data, 0)
        if sfnt != 0x00010000:
            raise FontParseError(f"not a TrueType font (sfnt={sfnt:#x})")
        for i in range(num_tables):
            tag, _csum, off, length = struct.unpack_from(
                ">4sIII", data, 12 + 16 * i)
            self.tables[tag] = (off, length)
        for need in (b"head", b"maxp", b"cmap", b"loca", b"glyf", b"hmtx",
                     b"hhea"):
            if need not in self.tables:
                raise FontParseError(f"missing table {need!r}")
        head = self.tables[b"head"][0]
        self.units_per_em = struct.unpack_from(">H", data, head + 18)[0]
        self.index_to_loc_long = struct.unpack_from(">h", data, head + 50)[0] == 1
        maxp = self.tables[b"maxp"][0]
        self.num_glyphs = struct.unpack_from(">H", data, maxp + 4)[0]
        hhea = self.tables[b"hhea"][0]
        self.ascent, self.descent = struct.unpack_from(">hh", data, hhea + 4)
        self.num_hmetrics = struct.unpack_from(">H", data, hhea + 34)[0]
        # capHeight from OS/2 v2+ when present (field at offset 88)
        self.cap_height = None
        if b"OS/2" in self.tables:
            off, length = self.tables[b"OS/2"]
            if length >= 90:
                self.cap_height = struct.unpack_from(">h", data, off + 88)[0]
        if not self.cap_height:
            self.cap_height = int(0.7 * self.units_per_em)
        self._cmap = self._parse_cmap()
        self._loca = self._parse_loca()

    @classmethod
    @lru_cache(maxsize=8)
    def load(cls, path: str) -> "TrueTypeFont":
        with open(path, "rb") as f:
            return cls(f.read())

    # -- tables ------------------------------------------------------------

    def _parse_cmap(self) -> dict[int, int]:
        data = self.data
        base = self.tables[b"cmap"][0]
        n = struct.unpack_from(">H", data, base + 2)[0]
        best = None
        for i in range(n):
            plat, enc, off = struct.unpack_from(">HHI", data, base + 4 + 8 * i)
            if (plat, enc) in ((3, 1), (0, 3), (0, 4), (3, 10)):
                best = base + off
                if (plat, enc) == (3, 1):
                    break
        if best is None:
            raise FontParseError("no unicode cmap subtable")
        fmt = struct.unpack_from(">H", data, best)[0]
        table: dict[int, int] = {}
        if fmt == 4:
            segx2 = struct.unpack_from(">H", data, best + 6)[0]
            seg = segx2 // 2
            ends = struct.unpack_from(f">{seg}H", data, best + 14)
            starts = struct.unpack_from(f">{seg}H", data, best + 16 + segx2)
            deltas = struct.unpack_from(f">{seg}h", data, best + 16 + 2 * segx2)
            rng_off_base = best + 16 + 3 * segx2
            rng_offs = struct.unpack_from(f">{seg}H", data, rng_off_base)
            for s in range(seg):
                if starts[s] == 0xFFFF:
                    continue
                for code in range(starts[s], ends[s] + 1):
                    if rng_offs[s] == 0:
                        gid = (code + deltas[s]) & 0xFFFF
                    else:
                        addr = (rng_off_base + 2 * s + rng_offs[s]
                                + 2 * (code - starts[s]))
                        gid = struct.unpack_from(">H", data, addr)[0]
                        if gid:
                            gid = (gid + deltas[s]) & 0xFFFF
                    if gid:
                        table[code] = gid
        elif fmt == 12:
            ngroups = struct.unpack_from(">I", data, best + 12)[0]
            for g in range(ngroups):
                s, e, gid = struct.unpack_from(">III", data, best + 16 + 12 * g)
                for code in range(s, min(e, s + 0x10000) + 1):
                    table[code] = gid + (code - s)
        else:
            raise FontParseError(f"unsupported cmap format {fmt}")
        return table

    def _parse_loca(self) -> list[int]:
        off, length = self.tables[b"loca"]
        n = self.num_glyphs + 1
        if self.index_to_loc_long:
            return list(struct.unpack_from(f">{n}I", self.data, off))
        return [2 * v for v in struct.unpack_from(f">{n}H", self.data, off)]

    def glyph_id(self, ch: str) -> int:
        return self._cmap.get(ord(ch), 0)

    def advance(self, gid: int) -> int:
        off = self.tables[b"hmtx"][0]
        if gid < self.num_hmetrics:
            return struct.unpack_from(">H", self.data, off + 4 * gid)[0]
        return struct.unpack_from(
            ">H", self.data, off + 4 * (self.num_hmetrics - 1))[0]

    # -- outlines ----------------------------------------------------------

    def glyph_contours(self, gid: int, _depth: int = 0
                       ) -> list[list[tuple[float, float, bool]]]:
        """Contours of glyph ``gid`` in font units: list of (x, y, on_curve)
        point lists. Composite glyphs are resolved recursively."""
        if _depth > 5:
            raise FontParseError("composite glyph nesting too deep")
        glyf_off = self.tables[b"glyf"][0]
        start, end = self._loca[gid], self._loca[gid + 1]
        if start == end:
            return []  # empty glyph (e.g. space)
        data = self.data
        off = glyf_off + start
        n_contours = struct.unpack_from(">h", data, off)[0]
        off += 10  # skip bbox
        if n_contours >= 0:
            return self._simple_glyph(off, n_contours)
        # composite
        contours: list[list[tuple[float, float, bool]]] = []
        while True:
            flags, comp_gid = struct.unpack_from(">HH", data, off)
            off += 4
            if flags & 0x0001:  # ARG_1_AND_2_ARE_WORDS
                a1, a2 = struct.unpack_from(">hh", data, off)
                off += 4
            else:
                a1, a2 = struct.unpack_from(">bb", data, off)
                off += 2
            xx = yy = 1.0
            xy = yx = 0.0
            if flags & 0x0008:  # WE_HAVE_A_SCALE
                xx = yy = struct.unpack_from(">h", data, off)[0] / 16384.0
                off += 2
            elif flags & 0x0040:  # X_AND_Y_SCALE
                xx = struct.unpack_from(">h", data, off)[0] / 16384.0
                yy = struct.unpack_from(">h", data, off + 2)[0] / 16384.0
                off += 4
            elif flags & 0x0080:  # 2x2 transform
                xx, xy, yx, yy = (v / 16384.0 for v in
                                  struct.unpack_from(">hhhh", data, off))
                off += 8
            if not (flags & 0x0002):
                # point-matching placement is rare in DejaVu; treat as 0,0
                a1, a2 = 0, 0
            dx, dy = float(a1), float(a2)
            for c in self.glyph_contours(comp_gid, _depth + 1):
                contours.append([
                    (x * xx + y * yx + dx, x * xy + y * yy + dy, on)
                    for (x, y, on) in c
                ])
            if not (flags & 0x0020):  # MORE_COMPONENTS
                break
        return contours

    def _simple_glyph(self, off: int, n_contours: int
                      ) -> list[list[tuple[float, float, bool]]]:
        data = self.data
        end_pts = struct.unpack_from(f">{n_contours}H", data, off)
        off += 2 * n_contours
        n_pts = end_pts[-1] + 1 if n_contours else 0
        instr_len = struct.unpack_from(">H", data, off)[0]
        off += 2 + instr_len
        flags: list[int] = []
        while len(flags) < n_pts:
            f = data[off]
            off += 1
            flags.append(f)
            if f & 0x08:  # REPEAT
                rep = data[off]
                off += 1
                flags.extend([f] * rep)
        xs: list[int] = []
        x = 0
        for f in flags:
            if f & 0x02:  # short
                dx = data[off]
                off += 1
                x += dx if f & 0x10 else -dx
            elif not (f & 0x10):
                x += struct.unpack_from(">h", data, off)[0]
                off += 2
            xs.append(x)
        ys: list[int] = []
        y = 0
        for f in flags:
            if f & 0x04:
                dy = data[off]
                off += 1
                y += dy if f & 0x20 else -dy
            elif not (f & 0x20):
                y += struct.unpack_from(">h", data, off)[0]
                off += 2
            ys.append(y)
        contours = []
        start = 0
        for e in end_pts:
            contours.append([
                (float(xs[i]), float(ys[i]), bool(flags[i] & 0x01))
                for i in range(start, e + 1)
            ])
            start = e + 1
        return contours


def _flatten(contour: list[tuple[float, float, bool]]
             ) -> list[tuple[float, float]]:
    """TrueType quadratic contour → closed polyline. Consecutive off-curve
    points imply on-curve midpoints (the TrueType convention)."""
    if not contour:
        return []
    pts = contour
    # rotate so we start on-curve (insert implied midpoint if none exists)
    on_idx = next((i for i, p in enumerate(pts) if p[2]), None)
    if on_idx is None:
        x0 = (pts[0][0] + pts[-1][0]) / 2.0
        y0 = (pts[0][1] + pts[-1][1]) / 2.0
        pts = [(x0, y0, True)] + pts
        on_idx = 0
    pts = pts[on_idx:] + pts[:on_idx]
    poly: list[tuple[float, float]] = [(pts[0][0], pts[0][1])]
    i = 1
    n = len(pts)
    cur = (pts[0][0], pts[0][1])
    while i <= n:
        p = pts[i % n]
        if p[2]:
            poly.append((p[0], p[1]))
            cur = (p[0], p[1])
            i += 1
            continue
        # off-curve control; find the following anchor (real or implied)
        nxt = pts[(i + 1) % n]
        if nxt[2]:
            anchor = (nxt[0], nxt[1])
            i += 2
        else:
            anchor = ((p[0] + nxt[0]) / 2.0, (p[1] + nxt[1]) / 2.0)
            i += 1
        for s in range(1, _BEZ_SEGS + 1):
            t = s / _BEZ_SEGS
            mt = 1.0 - t
            bx = mt * mt * cur[0] + 2 * mt * t * p[0] + t * t * anchor[0]
            by = mt * mt * cur[1] + 2 * mt * t * p[1] + t * t * anchor[1]
            poly.append((bx, by))
        cur = anchor
    return poly


def _fill_polygons(polys: list[np.ndarray], h: int, w: int) -> np.ndarray:
    """Nonzero-winding scanline fill over an h×w grid (row y sampled at
    y+0.5, col x at x+0.5). Vectorized per edge-set across all rows."""
    cov = np.zeros((h, w), dtype=np.float32)
    if not polys:
        return cov
    edges = []
    for poly in polys:
        a = poly
        b = np.roll(poly, -1, axis=0)
        keep = a[:, 1] != b[:, 1]
        edges.append(np.concatenate([a[keep], b[keep]], axis=1))
    E = np.concatenate(edges, axis=0)  # x0 y0 x1 y1
    if not len(E):
        return cov
    x0, y0, x1, y1 = E[:, 0], E[:, 1], E[:, 2], E[:, 3]
    for row in range(h):
        yc = row + 0.5
        # edge crosses this scanline (half-open rule avoids double counts)
        up = (y0 <= yc) & (y1 > yc)
        dn = (y1 <= yc) & (y0 > yc)
        hit = up | dn
        if not hit.any():
            continue
        t = (yc - y0[hit]) / (y1[hit] - y0[hit])
        xs = x0[hit] + t * (x1[hit] - x0[hit])
        winding = np.where(up[hit], 1, -1)
        order = np.argsort(xs, kind="stable")
        xs, winding = xs[order], winding[order]
        acc = np.cumsum(winding)
        inside = acc != 0  # span [xs[i], xs[i+1]) is inside if acc[i] != 0
        for i in np.nonzero(inside)[0]:
            lo = xs[i]
            hi = xs[i + 1] if i + 1 < len(xs) else xs[i]
            if hi <= lo:
                continue
            c0 = max(0, int(np.ceil(lo - 0.5)))
            c1 = min(w - 1, int(np.floor(hi - 0.5)))
            if c1 >= c0:
                cov[row, c0:c1 + 1] = 1.0
    return cov


def render_glyph(font: TrueTypeFont, ch: str, px_per_em: float
                 ) -> tuple[np.ndarray, float, float, float] | None:
    """Rasterize ``ch`` at ``px_per_em``. Returns (coverage bitmap float32
    in [0,1] with rows top-down, left_px, top_above_baseline_px,
    advance_px) — or None when the font has no outline for the char
    (space returns None too; callers treat it via advances)."""
    gid = font.glyph_id(ch)
    if gid == 0 and ch != ".notdef":
        return None
    contours = font.glyph_contours(gid)
    adv = font.advance(gid) * px_per_em / font.units_per_em
    if not contours:
        return None
    scale = px_per_em * _SS / font.units_per_em
    polys = []
    for c in contours:
        poly = _flatten(c)
        if len(poly) >= 3:
            polys.append(np.array(poly, dtype=np.float64) * scale)
    if not polys:
        return None
    allpts = np.concatenate(polys, axis=0)
    xmin, ymin = allpts.min(axis=0)
    xmax, ymax = allpts.max(axis=0)
    pad = 1.0
    w = int(np.ceil(xmax - xmin + 2 * pad))
    h = int(np.ceil(ymax - ymin + 2 * pad))
    if w <= 0 or h <= 0 or w > 4096 or h > 4096:
        return None
    shifted = [p - [xmin - pad, ymin - pad] for p in polys]
    cov_ss = _fill_polygons(shifted, h, w)
    # downsample SS×SS → average coverage; flip to top-down rows
    H, W = h // _SS, w // _SS
    if H == 0 or W == 0:
        return None
    cov = cov_ss[: H * _SS, : W * _SS].reshape(H, _SS, W, _SS).mean(axis=(1, 3))
    cov = cov[::-1]  # font y-up → image rows top-down
    left_px = (xmin - pad) / _SS
    top_px = (ymax + pad) / _SS  # above baseline
    return cov.astype(np.float32), left_px, top_px, adv
