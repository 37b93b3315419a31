"""HTML main-content extraction: boilerplate strip + block classification.

The reference has no HTML branch (it accepts PDF/PNG/JPG only,
app/utils/utils.py:43-44); HTML spans come from BASELINE.json:north_rule
("HTML boilerplate strip, DOM heuristics").  This is a deterministic,
dependency-free block classifier in the spirit of Readability/jusText:

  1. split the document into block-level segments,
  2. score each block: tag-based prior (nav/footer/aside/ad ⇒ boilerplate,
     main/article ⇒ content) + link density + text density,
  3. keep content blocks, strip inline tags, unescape entities.

Pure function — shared verbatim by the single-node oracle and the Spark
batch UDF (the distributed-correctness questions are order/join/shuffle,
covered by the pipeline tests).
"""

from __future__ import annotations

import html as _html
import re

# elements whose CONTENT is never document text: stripping only the tags
# would leak raw JS/CSS/markup into the extracted blocks
_INVISIBLE_RE = re.compile(
    r"<(script|style|noscript|template|svg)\b[^>]*>.*?</\1\s*>|<!--.*?-->",
    re.I | re.S,
)
# truncated documents: an unterminated script/style swallows to EOF rather
# than leaking raw JS/CSS into the block splitter
_INVISIBLE_OPEN_RE = re.compile(r"<(script|style)\b[^>]*>.*\Z", re.I | re.S)

_BLOCK_SPLIT_RE = re.compile(
    r"<(nav|header|footer|aside|main|article|div|section|p|h[1-6]|ul|table)"
    r"(\s[^>]*)?>|</(nav|header|footer|aside|main|article|div|section|p|h[1-6]|ul|table)>",
    re.I,
)
_TAG_RE = re.compile(r"<[^>]+>")
_ANCHOR_RE = re.compile(r"<a\b[^>]*>(.*?)</a>", re.I | re.S)

_BOILERPLATE_TAGS = {"nav", "header", "footer", "aside"}
_CONTENT_TAGS = {"main", "article"}
_AD_CLASS_RE = re.compile(r'class="[^"]*\b(ad|ads|banner|promo|cookie|social)\b', re.I)

LINK_DENSITY_MAX = 0.5
MIN_BLOCK_CHARS = 3


def _blocks(doc: str) -> list[tuple[list[str], str]]:
    """Split into (open-marker-stack, raw-html) segments.

    The stack holds (actual_tag, marker) pairs: a closing tag pops by the
    ACTUAL tag name, while segments see only the markers — so an ad-classed
    <div> (marker 'aside') is correctly popped by its </div> instead of
    leaking the boilerplate marker over the rest of the document."""
    out: list[tuple[list[str], str]] = []
    stack: list[tuple[str, str]] = []
    pos = 0
    for m in _BLOCK_SPLIT_RE.finditer(doc):
        seg = doc[pos : m.start()]
        if seg.strip():
            out.append(([mk for _, mk in stack], seg))
        if m.group(3):  # closing tag
            tag = m.group(3).lower()
            if any(t == tag for t, _ in stack):
                while stack and stack[-1][0] != tag:
                    stack.pop()
                if stack:
                    stack.pop()
        else:
            tag = m.group(1).lower()
            marker = tag
            if m.group(2) and _AD_CLASS_RE.search(m.group(0)):
                marker = "aside"  # ad-classed divs treated as boilerplate
            stack.append((tag, marker))
        pos = m.end()
    tail = doc[pos:]
    if tail.strip():
        out.append(([mk for _, mk in stack], tail))
    return out


def _link_density(raw: str) -> float:
    anchor_text = sum(len(_TAG_RE.sub("", m)) for m in _ANCHOR_RE.findall(raw))
    total = len(_TAG_RE.sub("", raw))
    return anchor_text / total if total else 1.0


def strip_boilerplate(doc: str) -> str:
    """Main-content text of an HTML document, blocks joined by newlines."""
    doc = _INVISIBLE_RE.sub(" ", doc)
    doc = _INVISIBLE_OPEN_RE.sub(" ", doc)
    kept: list[str] = []
    for stack, raw in _blocks(doc):
        tags = set(stack)
        if tags & _BOILERPLATE_TAGS and not tags & _CONTENT_TAGS:
            continue
        if _link_density(raw) > LINK_DENSITY_MAX and not tags & _CONTENT_TAGS:
            continue
        text = _html.unescape(_TAG_RE.sub(" ", raw))
        text = re.sub(r"[ \t]+", " ", text).strip()
        if len(text) >= MIN_BLOCK_CHARS:
            kept.append(text)
    return "\n".join(kept)
