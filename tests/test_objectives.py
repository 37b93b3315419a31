"""Training-objective transforms (operators/objectives.py): FIM/PSM
rewrite and T5 span corruption. The DuckDB hash parity runs in the tail
gate replica (test_contract_tail); these tests pin the SEMANTIC
guarantees the hash can't express — lossless reconstruction of every
document from the transformed form, sentinel-id contiguity, rate
calibration, and determinism."""

import os
import re
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from resume_ocr_spark.operators import objectives  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(os.path.join(SF, "documents.parquet"))
        .select("doc_id", "text")
    )


def _norm(text):
    return " ".join((text or "").split())


# ---------------------------------------------------------------- FIM


def test_fim_reconstruction_and_split_bounds(spark, docs):
    rows = objectives.fim_transform(docs).collect()
    originals = {r["doc_id"]: _norm(r["text"]) for r in docs.collect()}
    assert rows
    applied = 0
    for r in rows:
        if not r["fim_applied"]:
            assert r["cut1"] is None and r["cut2"] is None
            assert r["fim_text"] == originals[r["doc_id"]]
            continue
        applied += 1
        assert 1 <= r["cut1"] < r["cut2"] <= r["n_words"] - 1
        m = re.fullmatch(r"<PRE> (.+) <SUF> (.+) <MID> (.+)", r["fim_text"],
                         re.DOTALL)
        assert m, r["fim_text"][:80]
        prefix, suffix, middle = m.group(1), m.group(2), m.group(3)
        # lossless: PSM parts reassemble the normalized original
        assert f"{prefix} {middle} {suffix}" == originals[r["doc_id"]]
        assert len(prefix.split()) == r["cut1"]
        assert len(middle.split()) == r["cut2"] - r["cut1"]
    assert applied > 0


def test_fim_rate_calibration_and_determinism(spark, docs):
    out = objectives.fim_transform(docs, rate=0.5, min_words=8)
    rows = sorted(out.collect())
    eligible = [r for r in rows if r["n_words"] >= 8]
    frac = sum(r["fim_applied"] for r in eligible) / max(len(eligible), 1)
    assert 0.35 < frac < 0.65  # 16-bit md5 bucket vs rate=0.5
    assert not any(r["fim_applied"] for r in rows if r["n_words"] < 8)
    assert rows == sorted(objectives.fim_transform(docs).collect())
    # an independent seed redraws the gate
    other = {r["doc_id"]: r["fim_applied"]
             for r in objectives.fim_transform(docs, seed="fim2").collect()}
    assert any(other[r["doc_id"]] != r["fim_applied"] for r in eligible)


def test_fim_degenerate_inputs(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "one two three")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in objectives.fim_transform(df).collect()}
    assert rows[1]["n_words"] == 0 and rows[1]["fim_text"] == ""
    assert rows[2]["n_words"] == 0 and not rows[2]["fim_applied"]
    assert rows[3]["n_words"] == 0
    assert rows[4]["n_words"] == 3 and not rows[4]["fim_applied"]
    with pytest.raises(ValueError):
        objectives.fim_transform(df, rate=1.5)
    with pytest.raises(ValueError):
        objectives.fim_transform(df, min_words=2)


# ------------------------------------------------------- span corruption


def _rebuild(corrupted: str, target: str, n_spans: int) -> str:
    """Splice each target span back over its sentinel in the corrupted
    input — the loader-side inverse of the objective."""
    spans = {}
    parts = re.split(r"<X_(\d+)>", target)
    # parts = ['', k0, span0, k1, span1, ..., kn, ''] (terminator last)
    for i in range(1, len(parts) - 1, 2):
        spans[int(parts[i])] = parts[i + 1].strip()
    assert int(parts[-2]) == n_spans  # terminator sentinel
    out = corrupted
    for k in range(n_spans):
        out = out.replace(f"<X_{k}>", spans[k], 1)
    return _norm(out)


def test_span_corrupt_reconstruction(spark, docs):
    rows = objectives.span_corrupt(docs).collect()
    originals = {r["doc_id"]: _norm(r["text"]) for r in docs.collect()}
    assert rows
    saw_mask = 0
    for r in rows:
        if r["n_words"] == 0:
            assert r["corrupted"] == "" and r["target"] == ""
            continue
        assert 0 <= r["phase"] < 16
        if r["n_spans"]:
            saw_mask += 1
            # sentinel ids in the corrupted input are exactly 0..n-1
            ks = [int(k) for k in re.findall(r"<X_(\d+)>", r["corrupted"])]
            assert ks == list(range(r["n_spans"]))
            assert _rebuild(r["corrupted"], r["target"],
                            r["n_spans"]) == originals[r["doc_id"]]
        else:
            assert r["corrupted"] == originals[r["doc_id"]]
    assert saw_mask > 0


def test_span_corrupt_rate_and_params(spark, docs):
    rows = objectives.span_corrupt(docs, stride=16, span_len=3).collect()
    tot_words = sum(r["n_words"] for r in rows)
    tot_masked = sum(r["n_masked"] for r in rows)
    assert tot_words > 0
    rate = tot_masked / tot_words
    assert 0.12 < rate < 0.25  # 3/16 = 0.1875 expected
    with pytest.raises(ValueError):
        objectives.span_corrupt(docs, stride=4, span_len=4)
    with pytest.raises(ValueError):
        objectives.span_corrupt(docs, stride=4, span_len=0)


def test_span_corrupt_zero_shuffle_plan(spark, docs):
    plan = objectives.span_corrupt(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    plan2 = objectives.fim_transform(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan2
