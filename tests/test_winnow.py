"""Winnowing fingerprints (textstats.winnow_fingerprints): python-walk
parity including rightmost-min tie-breaks, the Schleimer guarantee (a
shared run of ≥ w+k-1 tokens shares a fingerprint), and edge geometry."""

import hashlib
import re

import pytest

from resume_ocr_spark.operators import textstats as T

K, W = 3, 4


def _pytok(t):
    return [x for x in re.sub(r"[^a-z0-9]+", " ", (t or "").lower())
            .split() if x]


def _py_winnow(text, k=K, w=W):
    toks = _pytok(text)
    grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:5], 16) for g in grams]
    out = set()
    for j in range(len(hs) - w + 1):
        win = hs[j:j + w]
        m = min(win)
        idx = max(i for i in range(w) if win[i] == m)  # rightmost min
        out.add((m, j + idx + 1))
    return out


def test_winnow_python_parity(spark):
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .filter("doc_id < 40"))
    got = {}
    for r in T.winnow_fingerprints(docs).collect():
        got.setdefault(r.doc_id, set()).add((r.ghash, r.pos))
    want = {r.doc_id: _py_winnow(r.text) for r in docs.collect()}
    want = {k: v for k, v in want.items() if v}
    assert got == want


def test_winnow_guarantee_shared_run(spark):
    """Two docs sharing a run of exactly w+k-1 tokens must share at
    least one fingerprint HASH (the paper's theorem) — checked for 20
    random shared runs planted in otherwise-different texts."""
    import random

    rng = random.Random(9)
    vocab = [f"w{i}" for i in range(50)]
    rows = []
    runs = []
    for i in range(20):
        run = " ".join(rng.choice(vocab) for _ in range(W + K - 1))
        runs.append(run)
        pad_a = " ".join(rng.choice(vocab) for _ in range(10))
        pad_b = " ".join(rng.choice(vocab) for _ in range(10))
        rows.append((2 * i, f"{pad_a} {run} {pad_b}"))
        rows.append((2 * i + 1, f"{pad_b} {run} {pad_a}"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = {}
    for r in T.winnow_fingerprints(df).collect():
        fp.setdefault(r.doc_id, set()).add(r.ghash)
    for i in range(20):
        shared = fp[2 * i] & fp[2 * i + 1]
        assert shared, f"pair {i} shares no fingerprint (run={runs[i]})"


def test_winnow_short_docs_empty(spark):
    """Docs with < k tokens yield no grams; docs with < k+w-1 tokens
    yield no full window."""
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b c d e"), (3, "a b c d e f")],
        "doc_id long, text string")
    got = {r.doc_id for r in T.winnow_fingerprints(df).collect()}
    assert 1 not in got and 2 not in got and 3 in got


def test_winnow_rejects_bad_geometry(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        T.winnow_fingerprints(df, k=0)


# --- robust_outliers (median/MAD modified z) --------------------------------

def test_robust_outliers_python_parity(spark):
    """Per-group median/MAD and modified z equal a python re-derivation;
    the planted anomaly is flagged, the bulk is not."""
    import statistics

    rows = [(i, "a", float(100 + (i % 7))) for i in range(40)]
    rows += [(100, "a", 10_000.0), (101, "a", 0.5)]
    rows += [(200 + i, "b", float(50 + i)) for i in range(21)]
    df = spark.createDataFrame(rows, "doc_id long, src string, v double")
    out = {r.doc_id: r for r in T.robust_outliers(
        df, "v", ["src"]).collect()}

    for grp in ("a", "b"):
        vals = [v for _, g, v in rows if g == grp]
        med = statistics.median(vals)
        mad = statistics.median(abs(v - med) for v in vals)
        for did, g, v in rows:
            if g != grp:
                continue
            r = out[did]
            assert r.grp_median == pytest.approx(med)
            assert r.grp_mad == pytest.approx(mad)
            z = 0.6745 * (v - med) / mad
            assert r.robust_z == pytest.approx(round(z, 6))
            assert r.is_outlier == (abs(z) > 3.5)
    assert out[100].is_outlier and out[101].is_outlier
    assert sum(1 for r in out.values() if r.is_outlier) == 2


def test_robust_outliers_zero_mad(spark):
    """MAD = 0 (majority identical): non-median values flag, median
    values don't, and robust_z stays NULL instead of dividing by zero."""
    df = spark.createDataFrame(
        [(i, "a", 5.0) for i in range(10)] + [(99, "a", 7.0)],
        "doc_id long, src string, v double")
    out = {r.doc_id: r for r in T.robust_outliers(
        df, "v", ["src"]).collect()}
    assert out[99].is_outlier and out[99].robust_z is None
    assert not out[0].is_outlier
