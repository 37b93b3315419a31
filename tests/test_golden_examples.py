"""Analysis parity against the reference's OpenAPI golden examples
(reference: app/routers/analysis.py:96-145), run on the REAL fixture PDFs.

The reference's scores/summaries are LLM-generated (Groq), so exact values
are not reproducible by a deterministic engine; what the golden examples DO
pin is directional behavior, asserted here:

  - "analise_sem_query": fernanda_lima.pdf → score "Pleno"
    (our date-range seniority rule lands on Pleno too: ~4.75y)
  - "analise_com_query" (data-engineering query): fernanda ranks LAST of
    the text fixtures (2.5 in the example) while a data-engineering resume
    ranks first — davi_moreira is the in-corpus data engineer
"""

from __future__ import annotations

import os

import pytest

from resume_ocr_spark import textproc
from resume_ocr_spark.formats import pdfcodec

FIXDIR = "/root/reference/tests/curriculos"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXDIR), reason="reference fixtures not present")

# the "analise_com_query" example's query family: data-engineering stack
DATA_QUERY = ("Engenheiro de Dados Senior: Python, Scala, Apache Airflow, "
              "Spark, AWS, SQL, Big Data")


def _text(name: str) -> str:
    with open(os.path.join(FIXDIR, name), "rb") as f:
        return pdfcodec.extract_text(f.read()).replace("\f", "\n")


def test_sem_query_fernanda_is_pleno():
    t = _text("fernanda_lima.pdf")
    assert textproc.is_resume(t)
    assert textproc.seniority_label(t) == "Pleno"


def test_sem_query_senior_resumes():
    # titles literally say Sênior; date ranges must support the label
    for name in ("davi_moreira.pdf", "igor_martins.pdf", "gabriel_rocha.pdf"):
        t = _text(name)
        assert textproc.is_resume(t), name
        assert textproc.seniority_label(t) == "Sênior", name


def test_com_query_ranking_direction():
    scores = {n: textproc.score_against_query(_text(n), DATA_QUERY)
              for n in ("davi_moreira.pdf", "ana_silva.pdf",
                        "fernanda_lima.pdf")}
    # golden example: the data engineer tops, the frontend dev is last
    assert scores["davi_moreira.pdf"] > scores["ana_silva.pdf"]
    assert scores["ana_silva.pdf"] > scores["fernanda_lima.pdf"]


def test_real_resumes_all_classified():
    for name in ("ana_silva.pdf", "davi_moreira.pdf", "fernanda_lima.pdf",
                 "gabriel_rocha.pdf", "helena_ribeiro.pdf",
                 "igor_martins.pdf"):
        assert textproc.is_resume(_text(name)), name


def test_cake_resume_semantic_reject():
    """receita_bolo.pdf is a recipe FORMATTED as a resume (headings
    'Resumo Profissional', 'Experiência Profissional', …). The reference
    rejects it semantically via its LLM judge (validation_service.py:115-187,
    'mascarado como currículo'); the deterministic mirror is the
    content-negative culinary lexicon (textproc.NEGATIVE_STEM_PATTERNS):
    12 distinct families trip on this document vs 0 on every genuine
    fixture, so the veto flips it to rejection (round-2 verdict ask #3)."""
    t = _text("receita_bolo.pdf")
    assert textproc.is_resume(t) is False


def test_real_fixture_field_extraction():
    fields = textproc.extract_fields(_text("ana_silva.pdf"))
    assert "ana.silva.dev@email.com" in fields["emails"]
    assert "(11) 98765-4321" in fields["phones"]
    assert any("Mar 2021" in d for d in fields["dates"])
    # pipe-delimited undated ranges (gabriel): "| 2019 - Presente"
    gfields = textproc.extract_fields(_text("gabriel_rocha.pdf"))
    assert any("2019 - Presente" in d for d in gfields["dates"])
