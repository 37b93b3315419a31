"""Interpolated bigram LM scorer (textstats.with_bigram_logprob): exact
parity with a pure-Python model, gibberish-ranks-worse property, backoff
and totality contracts."""

import math

import pytest
from pyspark.sql import functions as F

from resume_ocr_spark.operators import bpe, textstats


def _py_score(texts_by_id, model_texts, lam=0.7, alpha=1.0):
    """Independent recompute: same add-α interpolated bigram definition."""
    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    for t in model_texts:
        ws = bpe.norm_words(t)
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    total = sum(uni.values())
    floor = alpha * (len(uni) + 1)
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
                p = lam * pb + (1 - lam) * pu
            nll -= math.log(p)
        out[i] = (round(nll / len(ws), 4), len(ws))
    return out


@pytest.mark.usefixtures("spark")
def test_matches_python_model_exactly(spark, small_corpus):
    docs, _ = small_corpus
    texts = {i: " ".join(
        s["text"] or "" for s in d["spans"] if s["kind"] == "text")
        for i, d in enumerate(docs[:20])}
    df = spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string")
    uni = textstats.word_counts(df)
    big = textstats.bigram_counts(df)
    got = {r["doc_id"]: (r["bigram_nll"], r["n_scored_words"])
           for r in textstats.with_bigram_logprob(df, uni, big).collect()}
    expect = _py_score(texts, list(texts.values()))
    assert got == expect


@pytest.mark.usefixtures("spark")
def test_gibberish_scores_worse_than_in_domain(spark):
    model = [
        "the quick brown fox jumps over the lazy dog",
        "the lazy dog sleeps while the quick fox runs",
        "a quick brown dog and a lazy fox play together",
    ] * 5
    mdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(model)], "doc_id long, text string")
    probe = spark.createDataFrame(
        [(0, "the quick brown fox jumps"),
         (1, "zxqv gkpw mznt qqrl vvbx")],
        "doc_id long, text string")
    uni = textstats.word_counts(mdf)
    big = textstats.bigram_counts(mdf)
    got = {r["doc_id"]: r["bigram_nll"]
           for r in textstats.with_bigram_logprob(probe, uni, big).collect()}
    assert got[1] > got[0] + 1.0  # OOV gibberish is much more surprising


@pytest.mark.usefixtures("spark")
def test_bigram_context_beats_unigram_shuffle(spark):
    # same word multiset, scrambled order: the interpolated model must
    # prefer the sequence whose bigrams it has seen
    model = ["alpha beta gamma delta epsilon"] * 10
    mdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(model)], "doc_id long, text string")
    probe = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon"),
         (1, "epsilon gamma alpha delta beta")],
        "doc_id long, text string")
    uni = textstats.word_counts(mdf)
    big = textstats.bigram_counts(mdf)
    got = {r["doc_id"]: r["bigram_nll"]
           for r in textstats.with_bigram_logprob(probe, uni, big).collect()}
    assert got[0] < got[1]


@pytest.mark.usefixtures("spark")
def test_totality_and_min_count_prune(spark):
    mdf = spark.createDataFrame(
        [(0, "aa bb aa bb aa bb"), (1, "aa cc")],
        "doc_id long, text string")
    probe = spark.createDataFrame(
        [(0, "aa bb"), (1, ""), (2, None), (3, "..."), (4, "aa cc")],
        "doc_id long, text string")
    uni = textstats.word_counts(mdf)
    big = textstats.bigram_counts(mdf)
    got = {r["doc_id"]: (r["bigram_nll"], r["n_scored_words"])
           for r in textstats.with_bigram_logprob(
               probe, uni, big, min_count=2).collect()}
    for empty_id in (1, 2, 3):
        assert got[empty_id] == (None, 0)
    # (aa,cc) count 1 < min_count 2 → pruned; probe 4 still scores via the
    # α floor, just worse than the retained (aa,bb) path
    assert got[4][0] > got[0][0]


@pytest.mark.usefixtures("spark")
def test_model_guards(spark):
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    uni = textstats.word_counts(df)
    big = textstats.bigram_counts(df)
    with pytest.raises(ValueError):
        textstats.with_bigram_logprob(df, uni, big, alpha=0.0)
    with pytest.raises(ValueError):
        textstats.with_bigram_logprob(df, uni, big, lam=1.5)
    with pytest.raises(ValueError, match="model too large"):
        textstats.with_bigram_logprob(df, uni, big, max_model_rows=1)


@pytest.mark.usefixtures("spark")
def test_lm_contrast_separates_target_domain(spark):
    """Reference-model contrast (round 5): target-domain docs must score
    POSITIVE (target model predicts them better than the raw-mix
    reference) and out-of-domain docs negative — on disjoint
    vocabularies the sign is unambiguous."""
    rows = [(i, "spark shuffle partition executor stage task " * 3, "en")
            for i in range(10)]
    rows += [(100 + i, "beurre farine sucre oeufs lait four " * 3, "fr")
             for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    target = df.filter("lang = 'en'").select("doc_id", "text")
    corpus = df.select("doc_id", "text")
    out = textstats.with_lm_contrast(
        corpus,
        textstats.word_counts(target), textstats.bigram_counts(target),
        textstats.word_counts(corpus), textstats.bigram_counts(corpus))
    got = {r["doc_id"]: r for r in out.collect()}
    for i in range(10):
        assert got[i]["lm_contrast"] > 0, i
        assert got[100 + i]["lm_contrast"] < 0, 100 + i
    # the identity: contrast = round(ref - target, 4) on the rounded means
    for r in got.values():
        assert r["lm_contrast"] == pytest.approx(
            round(r["ref_nll"] - r["target_nll"], 4), abs=1e-9)


@pytest.mark.usefixtures("spark")
def test_lm_contrast_totality_and_validation(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, ""), (3, None)],
        "doc_id long, text string")
    uni, big = textstats.word_counts(df), textstats.bigram_counts(df)
    out = {r["doc_id"]: r for r in textstats.with_lm_contrast(
        df, uni, big, uni, big).collect()}
    assert out[1]["lm_contrast"] == 0.0  # same model both sides
    for did in (2, 3):
        r = out[did]
        assert (r["target_nll"], r["ref_nll"], r["lm_contrast"],
                r["n_scored_words"]) == (None, None, None, 0)
    empty = df.filter("doc_id < 0")
    with pytest.raises(ValueError, match="at least one training token"):
        textstats.with_lm_contrast(
            df, textstats.word_counts(empty), textstats.bigram_counts(empty),
            uni, big)
    with pytest.raises(ValueError, match="lam"):
        textstats.with_lm_contrast(df, uni, big, uni, big, lam=2.0)


@pytest.mark.usefixtures("spark")
def test_lm_contrast_fused_plan_single_scan(spark):
    """The fusion claim: scoring two models = ONE corpus scan, six
    broadcast joins, no shuffle join."""
    df = spark.createDataFrame(
        [(1, "alpha beta gamma")], "doc_id long, text string")
    uni, big = textstats.word_counts(df), textstats.bigram_counts(df)
    plan = (textstats.with_lm_contrast(df, uni, big, uni, big)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("BroadcastHashJoin") == 6
    assert "SortMergeJoin" not in plan
