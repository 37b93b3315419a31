"""Encoding triage: mojibake detect/repair, NFC, control-strip.

The repair is pinned three ways: fixed-point examples (single and double
encoding, CJK, emoji), a hypothesis round-trip property (corrupt → repair
recovers the canonical form), and a Spark-vs-Python regex-dialect
cross-check (with_encoding_flags runs the SAME pattern through Java regex
that the oracle runs through Python re — counts must agree row-for-row).
"""

import os
import sys
import unicodedata

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from resume_ocr_spark.operators import encoding as enc  # noqa: E402


def _corrupt(s: str) -> str:
    return enc.sloppy_cp1252_decode(s.encode("utf-8"))


def _canon(s: str) -> str:
    return enc._CTRL_PY.sub("", unicodedata.normalize("NFC", s))


SAMPLES = [
    "Résumé — “naïve” café…",
    "señor João übermäßig çalışkan",
    "東京のレストラン ratings",
    "party 🎉 emoji line",
    "Łódź biały dwór",     # latin-2 script via UTF-8
]


@pytest.mark.parametrize("s", SAMPLES)
def test_single_and_double_encoding_repaired(s):
    assert enc.repair_encoding(_corrupt(s)) == (s, 1)
    assert enc.repair_encoding(_corrupt(_corrupt(s))) == (s, 2)


@pytest.mark.parametrize("s", SAMPLES + ["plain ascii only"])
def test_clean_text_untouched(s):
    assert enc.repair_encoding(s) == (s, 0)


def test_latin1_chain_also_repaired():
    # damage via strict latin-1 (continuation bytes become C1 controls)
    s = "Résumé — test"
    m = s.encode("utf-8").decode("latin-1")
    assert enc.repair_encoding(m) == (s, 1)


def test_nfd_normalized_and_controls_stripped():
    nfd = unicodedata.normalize("NFD", "Crème brûlée")
    assert enc.repair_encoding(nfd) == ("Crème brûlée", 0)
    assert enc.repair_encoding("a\x00b\x07c\ttab\nnl\rcr") == (
        "abc\ttab\nnl\rcr", 0)


def test_null_is_empty():
    assert enc.repair_encoding(None) == ("", 0)


def test_invalid_utf8_stream_left_alone():
    # 'Ã' followed by ASCII is a dangling lead byte after re-encode —
    # not valid UTF-8, so the candidate decode fails and text survives
    s = "price Ã 100"  # no continuation-class char after Ã
    assert enc.mojibake_count(s) == 0
    assert enc.repair_encoding(s) == (s, 0)


@settings(max_examples=200, deadline=None)
@given(st.text(
    alphabet=st.characters(
        codec="utf-8", categories=("L", "N", "P", "Zs"),
        min_codepoint=0x20, max_codepoint=0x2FFF),
    min_size=1, max_size=60))
def test_roundtrip_property(s):
    canon = _canon(s)
    if enc.mojibake_count(canon) != 0:
        return  # text that already looks damaged is out of contract
    damaged = _corrupt(canon)
    fixed, passes = enc.repair_encoding(damaged)
    assert fixed == canon
    assert passes == (1 if damaged != canon else 0)


def test_spark_flags_match_python_mirror(spark):
    import __spark_entry__ as entrymod

    rows = entrymod._encoding_fixture_rows()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in enc.with_encoding_flags(df).collect()}
    for doc_id, s in rows:
        t = s or ""
        r = got[doc_id]
        assert r["mojibake_hits"] == enc.mojibake_count(t), (doc_id, t)
        assert r["n_replacement_chars"] == t.count("�")
        assert r["n_ctrl_chars"] == len(enc._CTRL_PY.findall(t))


def test_spark_fix_text_matches_pure_function(spark):
    import __spark_entry__ as entrymod

    rows = entrymod._encoding_fixture_rows()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in enc.fix_text(df).collect()}
    for doc_id, s in rows:
        fixed, passes = enc.repair_encoding(s)
        assert got[doc_id]["text_fixed"] == fixed, doc_id
        assert got[doc_id]["n_repair_passes"] == passes, doc_id


def test_flags_then_gated_repair_composition(spark):
    # the documented 100 TB shape: flags route, only hits pay Python
    rows = [(0, "clean ascii"), (1, _corrupt("Résumé — naïve"))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    flagged = enc.with_encoding_flags(df)
    dirty = enc.fix_text(flagged.filter(F.col("mojibake_hits") > 0))
    clean = (flagged.filter(F.col("mojibake_hits") == 0)
             .withColumn("text_fixed", F.col("text"))
             .withColumn("n_repair_passes", F.lit(0)))
    out = {r["doc_id"]: r["text_fixed"]
           for r in clean.unionByName(dirty).collect()}
    assert out == {0: "clean ascii", 1: "Résumé — naïve"}
