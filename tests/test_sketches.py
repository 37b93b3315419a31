"""Property pins for the mergeable-sketch family (operators/sketches.py):
each sketch's THEORETICAL guarantee is asserted, not just a frozen output —
HLL error within the published band, Bloom one-sided error (zero false
negatives), CMS overcount-only, histogram quantiles within one bin width —
plus the merge law for each (max / bit_or / sum regroup), which is the
property the 100 TB story rests on (partial sketches combining map-side)."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from resume_ocr_spark.operators import sketches as sk  # noqa: E402

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def urls(spark):
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    url = F.concat(
        F.lit("https://h"), (F.col("doc_id") % 37).cast("string"),
        F.lit("/p"), (F.col("doc_id") % 211).cast("string"))
    return docs.select("doc_id", "lang", url.alias("url")).cache()


# --- HyperLogLog ------------------------------------------------------------

def test_hll_error_within_band(spark):
    # m=256 → standard error 1.04/sqrt(256) = 6.5%; assert < 3σ at three
    # very different cardinalities (the hash is fixed, so this is a
    # deterministic check that the implementation sits in the band, not a
    # flaky statistical test)
    for n in (60, 700, 5000):
        vals = spark.range(n).select(
            F.concat(F.lit("v"), F.col("id").cast("string")).alias("v"),
            F.lit("g").alias("g"))
        est = sk.hll_distinct(vals, "v", ["g"]).collect()[0]
        rel = abs(est["est_distinct"] - n) / n
        assert rel < 0.20, f"n={n}: est {est['est_distinct']} rel {rel:.3f}"


def test_hll_merge_is_register_max(spark):
    # sketch(A ∪ B) == max-merge of sketch(A), sketch(B): the law that
    # lets 10^6 tasks emit partial registers and combine map-side
    a = spark.range(0, 400).select(
        F.concat(F.lit("x"), F.col("id").cast("string")).alias("v"),
        F.lit("g").alias("g"))
    b = spark.range(200, 900).select(
        F.concat(F.lit("x"), F.col("id").cast("string")).alias("v"),
        F.lit("g").alias("g"))
    whole = sk.hll_registers(a.union(b), "v", ["g"])
    merged = (
        sk.hll_registers(a, "v", ["g"])
        .union(sk.hll_registers(b, "v", ["g"]))
        .groupBy("g", "bucket").agg(F.max("m_reg").alias("m_reg"))
    )
    assert (sorted(map(tuple, whole.collect()))
            == sorted(map(tuple, merged.collect())))


def test_hll_ignores_duplicates(spark):
    # distinct estimation must be insensitive to multiplicity
    once = spark.range(300).select(
        F.concat(F.lit("d"), F.col("id").cast("string")).alias("v"),
        F.lit("g").alias("g"))
    thrice = once.union(once).union(once)
    r1 = sk.hll_distinct(once, "v", ["g"]).collect()[0]
    r3 = sk.hll_distinct(thrice, "v", ["g"]).collect()[0]
    assert r1["est_distinct"] == r3["est_distinct"]
    assert r1["s_scaled"] == r3["s_scaled"]


# --- Bloom ------------------------------------------------------------------

def test_bloom_no_false_negatives_and_low_fp(spark, urls):
    seen = urls.filter(F.col("doc_id") < 60).select("url")
    words = sk.bloom_words(sk.bloom_build(seen, "url"))
    probed = sk.bloom_probe(urls, "url", words)
    truth = seen.distinct().withColumn("_t", F.lit(True))
    rows = (probed.join(truth, "url", "left")
            .select("bloom_member",
                    F.coalesce("_t", F.lit(False)).alias("t"))
            .collect())
    fn = sum(1 for r in rows if r["t"] and not r["bloom_member"])
    fp = sum(1 for r in rows if r["bloom_member"] and not r["t"])
    n_neg = sum(1 for r in rows if not r["t"])
    assert fn == 0, "Bloom must never false-negative"
    # 60 keys in 2048 bits, k=4 → expected fpr ≈ (1-e^-0.117)^4 ≈ 1.5e-4
    assert fp <= max(2, n_neg // 50), f"implausible fp count {fp}/{n_neg}"


def test_bloom_merge_is_bit_or(spark, urls):
    a = urls.filter(F.col("doc_id") < 30).select("url")
    b = urls.filter((F.col("doc_id") >= 30) & (F.col("doc_id") < 60)) \
            .select("url")
    whole = sk.bloom_build(a.union(b), "url")
    merged = (sk.bloom_build(a, "url").union(sk.bloom_build(b, "url"))
              .groupBy("word").agg(F.bit_or("bits").alias("bits")))
    assert (sorted(map(tuple, whole.collect()))
            == sorted(map(tuple, merged.collect())))


def test_bloom_rejects_bad_geometry(spark):
    with pytest.raises(ValueError):
        sk.bloom_build(None, "url", m_bits=100)  # not a lane multiple
    with pytest.raises(ValueError):
        sk.bloom_probe(None, "url", [0] * 10, m_bits=2048)  # wrong length


# --- Count-min --------------------------------------------------------------

def test_cms_overcounts_only_and_merges(spark):
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    words = (docs.select(F.explode(
        F.split(F.trim(F.regexp_replace(F.lower("text"),
                                        "[^a-z0-9]+", " ")), " "))
        .alias("word")).filter(F.col("word") != "")).cache()
    sketch = sk.cms_build(words, "word")
    exact = words.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    est = sk.cms_estimate(exact.select("word"), sketch, "word")
    joined = est.join(exact, "word").collect()
    assert joined, "no words"
    assert all(r["est_count"] >= r["c"] for r in joined), \
        "CMS must never undercount"
    # merge law: sum-regroup of two half-sketches == whole sketch
    a = words.limit(5000)
    whole = sk.cms_build(a, "word")
    h1 = sk.cms_build(a.filter(F.length("word") <= 4), "word")
    h2 = sk.cms_build(a.filter(F.length("word") > 4), "word")
    merged = (h1.union(h2).groupBy("row", "col")
              .agg(F.sum("cnt").alias("cnt")))
    assert (sorted(map(tuple, whole.collect()))
            == sorted(map(tuple, merged.collect())))


# --- Histogram quantiles ------------------------------------------------------

def test_hist_quantiles_within_one_bin(spark):
    import numpy as np

    li = spark.read.parquet(os.path.join(SF, "lineitem.parquet")) \
        .select("l_returnflag", "l_extendedprice")
    width = 1000.0
    out = {r["l_returnflag"]: r for r in
           sk.histogram_quantiles(li, "l_extendedprice", ["l_returnflag"],
                                  width=width).collect()}
    pdf = li.toPandas()
    for g, sub in pdf.groupby("l_returnflag"):
        true = np.percentile(sub["l_extendedprice"], [50, 95, 99])
        row = out[g]
        for est, t in zip(
                (row["q50_est"], row["q95_est"], row["q99_est"]), true):
            assert t <= est <= t + 2 * width, (g, est, t)
        assert row["n"] == len(sub)


def test_hist_bins_merge_by_sum(spark):
    li = spark.read.parquet(os.path.join(SF, "lineitem.parquet")) \
        .select("l_returnflag", "l_extendedprice")
    a = li.filter(F.col("l_extendedprice") < 50000)
    b = li.filter(F.col("l_extendedprice") >= 50000)
    whole = sk.histogram_quantiles(
        li, "l_extendedprice", ["l_returnflag"], width=1000.0)
    # merging = summing the bin tables before the quantile pass; emulate by
    # running the quantile pass over the unioned raw halves (bin counts sum
    # by construction) — equality proves no half-dependent state leaks in
    merged = sk.histogram_quantiles(
        a.union(b), "l_extendedprice", ["l_returnflag"], width=1000.0)
    assert (sorted(map(tuple, whole.collect()))
            == sorted(map(tuple, merged.collect())))


def test_bloom_probe_join_matches_literal(spark, urls):
    seen = urls.filter(F.col("doc_id") < 60).select("url")
    sketch = sk.bloom_build(seen, "url").cache()
    words = sk.bloom_words(sketch)
    lit_rows = sorted(map(tuple,
                          sk.bloom_probe(urls, "url", words)
                          .select("doc_id", "bloom_member").collect()))
    join_rows = sorted(map(tuple,
                           sk.bloom_probe_join(urls, "url", sketch)
                           .select("doc_id", "bloom_member").collect()))
    assert lit_rows == join_rows
    # NULL values are non-members on both paths
    nulls = spark.createDataFrame([(1, None)], "doc_id long, url string")
    assert not sk.bloom_probe(nulls, "url", words) \
        .collect()[0]["bloom_member"]
    assert not sk.bloom_probe_join(nulls, "url", sketch) \
        .collect()[0]["bloom_member"]


def test_bloom_probe_join_plan_has_no_corpus_shuffle(spark, urls):
    seen = urls.filter(F.col("doc_id") < 60).select("url")
    # realistic usage: the sketch is persisted state (a written/cached
    # table), so the probe plan contains ONLY the k broadcasts of it
    sketch = sk.bloom_build(seen, "url").cache()
    sketch.count()
    try:
        plan = sk.bloom_probe_join(urls, "url", sketch) \
            ._jdf.queryExecution().executedPlan().toString()
        import re
        assert len(re.findall(r"BroadcastExchange", plan)) == 4
        # every hash exchange in the plan text belongs to the sketch
        # BUILD's bounded groupBy(word) lineage (≤ m/32 = 64 keys, cached
        # — the repeated plan_ids are reuse, not re-execution); the PROBE
        # side must never shuffle, i.e. no exchange keyed on a corpus
        # column (url / doc_id / a _bw probe key)
        keys = re.findall(r"Exchange hashpartitioning\((\w+)#", plan)
        assert keys and all(k == "word" for k in keys), keys
        assert "Exchange rangepartitioning" not in plan, plan
    finally:
        sketch.unpersist()


def test_hll_set_estimates_union_and_intersection(spark):
    # A = 0..599, B = 400..999 → |A|=600 |B|=600 |A∪B|=1000 |A∩B|=200
    mk = lambda lo, hi: spark.range(lo, hi).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("v"),
        F.lit("g").alias("g"))
    ra = sk.hll_registers(mk(0, 600), "v", ["g"])
    rb = sk.hll_registers(mk(400, 1000), "v", ["g"])
    row = sk.hll_set_estimates(ra, rb, ["g"]).collect()[0]
    assert abs(row["est_union"] - 1000) / 1000 < 0.20
    # intersection inherits union-scale absolute error: |err| < 20% of union
    assert abs(row["est_intersection"] - 200) < 0.20 * 1000
    # disjoint sets: intersection clamps at >= 0
    rc = sk.hll_registers(mk(5000, 5600), "v", ["g"])
    row2 = sk.hll_set_estimates(ra, rc, ["g"]).collect()[0]
    assert row2["est_intersection"] >= 0.0


# --- KMV bottom-k -----------------------------------------------------------

def test_kmv_exact_below_k(spark):
    """< k distinct values → the sketch is the distinct set and the
    estimate is the exact count."""
    df = spark.createDataFrame(
        [(i % 17,) for i in range(500)], "v long")
    est = sk.kmv_estimate(
        sk.kmv_sketch(df.withColumn("g", F.lit("a")), "v", ["g"], k=64),
        ["g"], k=64).collect()[0]
    assert (est.n_held, est.est_distinct) == (17, 17.0)


def test_kmv_error_within_band(spark):
    """n=5000 distinct at k=64: relative error concentrates around
    1/sqrt(k-2) ≈ 13%; assert a generous 3-sigma band (the hash is
    deterministic, so this pins a single draw, not a distribution)."""
    df = spark.createDataFrame([(i,) for i in range(5000)], "v long")
    est = sk.kmv_estimate(
        sk.kmv_sketch(df.withColumn("g", F.lit("a")), "v", ["g"]),
        ["g"]).collect()[0].est_distinct
    assert abs(est - 5000) / 5000 < 0.4, est


def test_kmv_merge_law(spark):
    """bottom-k(merge(sketch(A), sketch(B))) == sketch(A ∪ B) row for
    row — the property shard-wise reduction rests on."""
    a = spark.createDataFrame([(i,) for i in range(0, 3000)], "v long")
    b = spark.createDataFrame([(i,) for i in range(1500, 4000)], "v long")
    g = F.lit("g")
    ska = sk.kmv_sketch(a.withColumn("g", g), "v", ["g"])
    skb = sk.kmv_sketch(b.withColumn("g", g), "v", ["g"])
    merged = sk.kmv_merge(ska, skb, ["g"]).orderBy("rnk").collect()
    direct = sk.kmv_sketch(
        a.unionByName(b).withColumn("g", g), "v", ["g"]
    ).orderBy("rnk").collect()
    assert [(r.rnk, r.hv) for r in merged] == [(r.rnk, r.hv) for r in direct]


def test_kmv_ignores_duplicates(spark):
    """Sketch state depends on the distinct set only."""
    base = spark.createDataFrame([(i,) for i in range(200)], "v long")
    dup = base.unionByName(base).unionByName(base)
    g = F.lit("g")
    s1 = sk.kmv_sketch(base.withColumn("g", g), "v", ["g"]).collect()
    s2 = sk.kmv_sketch(dup.withColumn("g", g), "v", ["g"]).collect()
    assert sorted((r.rnk, r.hv) for r in s1) == \
        sorted((r.rnk, r.hv) for r in s2)


def test_kmv_set_estimates(spark):
    """Theta-style set ops: union/intersection estimates within a loose
    band of truth; exact when the union fits inside k."""
    a = spark.createDataFrame([(i,) for i in range(0, 3000)], "v long")
    b = spark.createDataFrame([(i,) for i in range(2000, 5000)], "v long")
    g = F.lit("g")
    ska = sk.kmv_sketch(a.withColumn("g", g), "v", ["g"]).select("rnk", "hv")
    skb = sk.kmv_sketch(b.withColumn("g", g), "v", ["g"]).select("rnk", "hv")
    r = sk.kmv_set_estimates(ska, skb).collect()[0]
    assert abs(r.est_union - 5000) / 5000 < 0.4, r
    assert abs(r.est_intersection - 1000) / 1000 < 0.8, r

    # tiny sets: union below k → both estimates exact
    ta = spark.createDataFrame([(i,) for i in range(0, 30)], "v long")
    tb = spark.createDataFrame([(i,) for i in range(20, 50)], "v long")
    sta = sk.kmv_sketch(ta.withColumn("g", g), "v", ["g"]).select("rnk", "hv")
    stb = sk.kmv_sketch(tb.withColumn("g", g), "v", ["g"]).select("rnk", "hv")
    t = sk.kmv_set_estimates(sta, stb).collect()[0]
    assert (t.est_union, t.est_intersection) == (50.0, 10.0)
