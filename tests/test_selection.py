"""Learned data selection (operators/selection.py): DSIR importance
weights + Gumbel top-k resampling, hashed-NB quality classifier.

The hard check is pure-python recomputation: hashlib md5 buckets, exact
integer micro-nat sums — the Spark output must match bit for bit (the
module's whole design is that scores are BIGINT-exact across engines).
The DuckDB gate twin lives in test_contract_tail via the registry."""

import hashlib
import math
import os
import re
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from resume_ocr_spark.operators import selection  # noqa: E402

B = selection.N_BUCKETS
MICRO = selection.MICRO


def _py_grams(text):
    toks = [w for w in re.sub(r"[^a-z0-9]+", " ", (text or "").lower())
            .strip().split(" ") if w != ""]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _py_bucket(gram, salt):
    h = hashlib.md5((gram + ":" + salt).encode()).hexdigest()
    return int(h[29:32], 16)


def _py_counts(texts, salt):
    dense = [0] * B
    for t in texts:
        for g in _py_grams(t):
            dense[_py_bucket(g, salt)] += 1
    return dense


DOCS = [
    (0, "alpha beta gamma alpha", "en"),
    (1, "beta beta delta", "en"),
    (2, "omega psi chi omega psi", "fr"),
    (3, "alpha delta gamma beta", "en"),
    (4, "chi chi psi omega", "fr"),
    (5, "", "en"),
    (6, None, "fr"),
    (7, "Alpha, BETA!! gamma-9", "en"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, lang string")


class TestDsir:
    def test_logweight_matches_pure_python(self, spark, docs_df):
        target = docs_df.filter("lang = 'en'").select("text")
        out = {
            r["doc_id"]: (r["n_grams"], r["logweight_micro"])
            for r in selection.with_dsir_logweight(docs_df, target).collect()
        }
        q = _py_counts([t for _, t, _ in DOCS], "dsirb")
        p = _py_counts([t for _, t, lg in DOCS if lg == "en"], "dsirb")
        ratios, _, _ = selection.log_ratio_micro(p, q)
        for did, text, _ in DOCS:
            grams = _py_grams(text)
            want = sum(ratios[_py_bucket(g, "dsirb")] for g in grams)
            assert out[did] == (len(grams), want), did
        # totality: empty and NULL texts are weightless, not missing
        assert out[5] == (0, 0) and out[6] == (0, 0)

    def test_target_domain_scores_higher(self, spark):
        # two disjoint vocabularies: target-like docs must outrank others
        rows = [(i, "spark shuffle partition join " * 3, "pos")
                for i in range(20)]
        rows += [(100 + i, "recette cuisine beurre four " * 3, "neg")
                 for i in range(20)]
        df = spark.createDataFrame(rows, "doc_id long, text string, k string")
        target = df.filter("k = 'pos'").select("text")
        got = selection.with_dsir_logweight(df, target).collect()
        pos = [r["logweight_micro"] for r in got if r["doc_id"] < 100]
        neg = [r["logweight_micro"] for r in got if r["doc_id"] >= 100]
        assert min(pos) > max(neg)

    def test_resample_gumbel_topk(self, spark, docs_df):
        target = docs_df.filter("lang = 'en'").select("text")
        out = selection.dsir_resample(docs_df, target, k=4).collect()
        assert sorted(r["sample_rank"] for r in out) == [1, 2, 3, 4]
        # python replay: same ratios, same gumbel keys, same top-4 set
        q = _py_counts([t for _, t, _ in DOCS], "dsirb")
        p = _py_counts([t for _, t, lg in DOCS if lg == "en"], "dsirb")
        ratios, _, _ = selection.log_ratio_micro(p, q)
        keys = {}
        for did, text, _ in DOCS:
            lw = sum(ratios[_py_bucket(g, "dsirb")] for g in _py_grams(text))
            h = hashlib.md5(f"{did}:dsir-g".encode()).hexdigest()
            u = (int(h[29:32], 16) + 0.5) / 4096.0
            keys[did] = lw + math.floor(-MICRO * math.log(-math.log(u)))
        want = sorted(keys, key=lambda d: (-keys[d], d))[:4]
        assert sorted(r["doc_id"] for r in out) == sorted(want)
        for r in out:
            assert r["gumbel_key_micro"] == keys[r["doc_id"]]

    def test_threshold_sample_matches_python_order_statistic(self, spark):
        """The keep-x% form: threshold = exact ceil(frac·m)-th largest
        sampled key; membership replayed in python bit for bit."""
        rows = [(i, f"word{i % 7} text alpha beta {i}") for i in range(120)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        target = df.filter("doc_id < 30").select("text")
        out = selection.dsir_threshold_sample(
            df, target, keep_frac=0.4, sample_rate=0.5)
        got = {r["doc_id"]: r for r in out.collect()}
        # python replay of weights, keys, sample, threshold
        texts = {i: t for i, t, in rows}
        q = _py_counts(list(texts.values()), "dsirb")
        p = _py_counts([texts[i] for i in range(30)], "dsirb")
        ratios, _, _ = selection.log_ratio_micro(p, q)
        keys = {}
        for i, t in texts.items():
            lw = sum(ratios[_py_bucket(g, "dsirb")] for g in _py_grams(t))
            hg = hashlib.md5(f"{i}:dsir-g".encode()).hexdigest()
            u = (int(hg[29:32], 16) + 0.5) / 4096.0
            keys[i] = lw + math.floor(-MICRO * math.log(-math.log(u)))
        cut = int(0.5 * 65536)
        samp = [keys[i] for i in texts
                if int(hashlib.md5(f"{i}:dsir-thr".encode())
                       .hexdigest()[28:32], 16) < cut]
        thr = sorted(samp, reverse=True)[math.ceil(0.4 * len(samp)) - 1]
        want = {i for i in texts if keys[i] >= thr}
        assert set(got) == want
        for r in got.values():
            assert r["threshold_micro"] == thr

    def test_threshold_sample_validation_and_plan(self, spark, docs_df):
        target = docs_df.filter("lang = 'en'").select("text")
        with pytest.raises(ValueError, match="keep_frac"):
            selection.dsir_threshold_sample(docs_df, target, keep_frac=0.0)
        with pytest.raises(ValueError, match="sample is empty"):
            # 8 docs at rate ~1/65536: deterministically no sampled ids
            selection.dsir_threshold_sample(
                docs_df, target, keep_frac=0.5, sample_rate=1e-5)
        # the 10^12-doc claim: NO window/global sort anywhere — the kept
        # set is a pure filter over the scoring projection
        out = selection.dsir_threshold_sample(
            docs_df, target, keep_frac=0.5, sample_rate=1.0)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan and "Sort" not in plan
        assert "Exchange" not in plan

    def test_empty_target_raises(self, spark, docs_df):
        empty = docs_df.filter("doc_id < 0").select("text")
        with pytest.raises(ValueError, match="target side has no grams"):
            selection.with_dsir_logweight(docs_df, empty)

    def test_resample_k_validation(self, spark, docs_df):
        with pytest.raises(ValueError, match="k must be positive"):
            selection.dsir_resample(docs_df, docs_df.select("text"), k=0)


class TestNbClassifier:
    def test_score_matches_pure_python(self, spark, docs_df):
        labeled = docs_df.select(
            "text", (docs_df.lang == "en").alias("label"))
        out = {
            r["doc_id"]: (r["n_grams"], r["nb_score_micro"], r["predicted"])
            for r in selection.with_nb_quality_score(docs_df, labeled)
            .collect()
        }
        cp = _py_counts([t for _, t, lg in DOCS if lg == "en"], "nbq")
        cn = _py_counts([t for _, t, lg in DOCS if lg != "en"], "nbq")
        w, _, _ = selection.log_ratio_micro(cp, cn)
        bias = math.floor(
            MICRO * math.log(float(sum(cp)) / float(sum(cn))))
        for did, text, _ in DOCS:
            grams = _py_grams(text)
            s = bias + sum(w[_py_bucket(g, "nbq")] for g in grams)
            assert out[did] == (len(grams), s, s > 0), did

    def test_separates_disjoint_classes(self, spark):
        rows = [(i, "good clean prose document " * 4, True)
                for i in range(15)]
        rows += [(100 + i, "zzspam qqqjunk xxcasino " * 4, False)
                 for i in range(15)]
        df = spark.createDataFrame(rows, "doc_id long, text string, label boolean")
        got = selection.with_nb_quality_score(
            df.select("doc_id", "text"), df.select("text", "label")
        ).collect()
        for r in got:
            assert r["predicted"] == (r["doc_id"] < 100)

    def test_single_class_raises(self, spark, docs_df):
        labeled = docs_df.select("text", F_lit_true())
        with pytest.raises(ValueError, match="both classes"):
            selection.with_nb_quality_score(docs_df, labeled)


def F_lit_true():
    from pyspark.sql import functions as F
    return F.lit(True).alias("label")


class TestPlanShape:
    def test_scoring_scan_has_no_exchange(self, spark, docs_df):
        """The 100 TB contract: after the two bounded model aggs, scoring
        is ONE zero-shuffle projection — no Exchange anywhere in the
        returned plan (model folded as literals, no joins)."""
        target = docs_df.filter("lang = 'en'").select("text")
        plan = (selection.with_dsir_logweight(docs_df, target)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan
        labeled = docs_df.select("text", (docs_df.lang == "en").alias("label"))
        plan = (selection.with_nb_quality_score(docs_df, labeled)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan
