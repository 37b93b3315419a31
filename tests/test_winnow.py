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


# --- PMI collocations + TF-IDF keywords -------------------------------------

def test_collocations_python_parity(spark):
    import math
    from collections import Counter

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .filter("doc_id < 80"))
    got = {(r.w_a, r.w_b): (r.pair_count, r.count_a, r.count_b, r.pmi)
           for r in T.collocations(docs, min_count=5).collect()}
    uni, big = Counter(), Counter()
    for r in docs.collect():
        toks = _pytok(r.text)
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    n = sum(uni.values())
    want = {}
    for (a, b), c in big.items():
        if c >= 5:
            want[(a, b)] = (c, uni[a], uni[b],
                            round(math.log(n * c / (uni[a] * uni[b])), 6))
    assert got == want and got


def test_collocations_rank_real_phrases_high(spark):
    """A planted fixed phrase outranks independent co-occurrences."""
    rows = [(i, "alpha beta " + "x y " * 3) for i in range(20)]
    rows += [(100 + i, "x beta y alpha x y x y") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pmi = {(r.w_a, r.w_b): r.pmi for r in T.collocations(df).collect()}
    assert pmi[("alpha", "beta")] > pmi[("x", "y")]


def test_tfidf_keywords_python_parity(spark):
    import math
    from collections import Counter

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .filter("doc_id < 60"))
    rows = docs.collect()
    n = len(rows)
    per_doc = {r.doc_id: Counter(_pytok(r.text)) for r in rows}
    dft = Counter()
    for c in per_doc.values():
        dft.update(c.keys())
    got = {}
    for r in T.tfidf_keywords(docs, top_m=5).collect():
        got.setdefault(r.doc_id, []).append(
            (r.rnk, r.word, r.tf, r.df_t, r.tfidf))
    for did, c in per_doc.items():
        if not c:
            continue
        scored = sorted(
            ((round(tf * math.log((n + 1) / (dft[w] + 1)), 6), w, tf)
             for w, tf in c.items()), key=lambda t: (-t[0], t[1]))[:5]
        want = [(i + 1, w, tf, dft[w], s)
                for i, (s, w, tf) in enumerate(scored)]
        assert sorted(got[did]) == sorted(want), did


def test_tfidf_common_words_score_low(spark):
    """A word in every doc gets near-zero idf and never beats a rare
    discriminative term."""
    rows = [(i, f"common filler uniq{i} uniq{i}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    top1 = {r.doc_id: r.word
            for r in T.tfidf_keywords(df, top_m=1).collect()}
    assert all(w.startswith("uniq") for w in top1.values())
