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
