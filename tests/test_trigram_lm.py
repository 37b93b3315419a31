"""Interpolated trigram LM scorer (textstats.with_trigram_logprob,
VERDICT r4 next-step #7): exact parity with a pure-Python model, the
gibberish-ranks-worse property, trigram-context sensitivity beyond what a
bigram model can see, and the totality/guard contracts."""

import math

import pytest
from pyspark.sql import functions as F

from resume_ocr_spark.operators import bpe, textstats

LAM3, LAM2 = 0.5, 0.3


def _py_score(texts_by_id, model_texts, lam3=LAM3, lam2=LAM2, alpha=1.0):
    """Independent recompute: same add-α interpolated trigram definition
    (second word folds λ3 into λ2, first word is unigram-only)."""
    uni: dict[str, int] = {}
    big: dict[tuple, int] = {}
    tri: dict[tuple, int] = {}
    for t in model_texts:
        ws = bpe.norm_words(t)
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
        for a, b, c in zip(ws, ws[1:], ws[2:]):
            tri[(a, b, c)] = tri.get((a, b, c), 0) + 1
    total = sum(uni.values())
    floor = alpha * (len(uni) + 1)
    lam1 = 1.0 - lam3 - lam2
    out = {}
    for i, t in texts_by_id.items():
        ws = bpe.norm_words(t)
        if not ws:
            out[i] = (None, 0)
            continue
        nll = 0.0
        for j, w in enumerate(ws):
            pu = (uni.get(w, 0) + alpha) / (total + floor)
            if j == 0:
                p = pu
            else:
                pb = (big.get((ws[j - 1], w), 0) + alpha) / (
                    uni.get(ws[j - 1], 0) + floor)
                if j == 1:
                    p = (lam3 + lam2) * pb + lam1 * pu
                else:
                    pt = (tri.get((ws[j - 2], ws[j - 1], w), 0) + alpha) / (
                        big.get((ws[j - 2], ws[j - 1]), 0) + floor)
                    p = lam3 * pt + lam2 * pb + lam1 * pu
            nll -= math.log(p)
        out[i] = (round(nll / len(ws), 4), len(ws))
    return out


def _score_df(spark, texts):
    df = spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string")
    uni = textstats.word_counts(df)
    big = textstats.bigram_counts(df)
    tri = textstats.trigram_counts(df)
    return {r["doc_id"]: (r["trigram_nll"], r["n_scored_words"])
            for r in textstats.with_trigram_logprob(
                df, uni, big, tri, lam3=LAM3, lam2=LAM2).collect()}


@pytest.mark.usefixtures("spark")
def test_matches_python_model_exactly(spark, small_corpus):
    docs, _ = small_corpus
    texts = {i: " ".join(
        s["text"] or "" for s in d["spans"] if s["kind"] == "text")
        for i, d in enumerate(docs[:20])}
    assert _score_df(spark, texts) == _py_score(texts, list(texts.values()))


@pytest.mark.usefixtures("spark")
def test_gibberish_scores_worse_than_in_domain(spark):
    """The property the CCNet-style filter depends on: in-domain text
    scores a lower NLL than character soup and than shuffled-vocab text."""
    model = ["senior data engineer with python and spark experience",
             "data engineer with experience in python spark pipelines",
             "senior python engineer building spark data pipelines"]
    texts = {
        0: "senior data engineer with python and spark experience",
        1: "qzxv wkjh pqrs zzkq mvnb xyzt qqwz jjkl",         # gibberish
        2: "experience spark and senior with data python engineer",  # bag
    }
    df = spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string")
    mdf = spark.createDataFrame(
        list(enumerate(model)), "doc_id long, text string")
    got = {r["doc_id"]: r["trigram_nll"]
           for r in textstats.with_trigram_logprob(
               df, textstats.word_counts(mdf), textstats.bigram_counts(mdf),
               textstats.trigram_counts(mdf)).collect()}
    assert got[0] < got[2] < got[1]


@pytest.mark.usefixtures("spark")
def test_trigram_sees_past_bigram_saturation(spark):
    """Two docs with IDENTICAL bigram multisets but different trigram
    structure must separate under the trigram scorer — the saturation
    case VERDICT r4 cites as the reason bigram models plateau."""
    # model: 'a b a' is frequent; 'b a b' never follows it
    model = ["a b a b a b a", "a b a c a b a"]
    # in-model trigram order vs a doc whose bigrams (a b / b a) all exist
    # but whose trigram path is rarer
    texts = {0: "a b a c a", 1: "b a b a b"}
    df = spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string")
    mdf = spark.createDataFrame(
        list(enumerate(model)), "doc_id long, text string")
    uni, big, tri = (textstats.word_counts(mdf),
                     textstats.bigram_counts(mdf),
                     textstats.trigram_counts(mdf))
    tri_s = {r["doc_id"]: r["trigram_nll"]
             for r in textstats.with_trigram_logprob(
                 df, uni, big, tri).collect()}
    expect = _py_score(texts, model)
    assert tri_s[0] == expect[0][0] and tri_s[1] == expect[1][0]
    assert tri_s[0] != tri_s[1]  # trigram structure separates them


@pytest.mark.usefixtures("spark")
def test_totality_and_guards(spark):
    texts = {0: "", 1: "   ", 2: "one"}
    got = _score_df(spark, texts)
    assert got[0] == (None, 0) and got[1] == (None, 0)
    assert got[2][1] == 1
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    uni = textstats.word_counts(df)
    big = textstats.bigram_counts(df)
    tri = textstats.trigram_counts(df)
    with pytest.raises(ValueError, match="lam3"):
        textstats.with_trigram_logprob(df, uni, big, tri, lam3=0.8, lam2=0.3)
    with pytest.raises(ValueError, match="alpha"):
        textstats.with_trigram_logprob(df, uni, big, tri, alpha=0.0)
    with pytest.raises(ValueError, match="model too large"):
        textstats.with_trigram_logprob(df, uni, big, tri, max_model_rows=0)


@pytest.mark.usefixtures("spark")
def test_min_count_prunes_toward_lower_orders(spark):
    """min_count=2 drops singleton bigrams/trigrams: every pruned position
    backs off toward the α floor, so NLL can only move up or stay."""
    model = ["alpha beta gamma delta", "alpha beta gamma epsilon"]
    texts = {0: "alpha beta gamma delta"}
    df = spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string")
    mdf = spark.createDataFrame(
        list(enumerate(model)), "doc_id long, text string")
    uni, big, tri = (textstats.word_counts(mdf),
                     textstats.bigram_counts(mdf),
                     textstats.trigram_counts(mdf))
    full = textstats.with_trigram_logprob(df, uni, big, tri).collect()[0]
    pruned = textstats.with_trigram_logprob(
        df, uni, big, tri, min_count=2).collect()[0]
    assert pruned["trigram_nll"] >= full["trigram_nll"]
