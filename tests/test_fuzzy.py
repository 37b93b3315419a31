"""SymSpell edit-distance near-dup (dedup.fuzzy_pairs): exact
recall+precision vs brute-force levenshtein at d=1 and d=2, the
deletion-key recall guarantee, bucket-cap behavior, and input guards."""

import random

import pytest
from pyspark.sql import functions as F

from resume_ocr_spark.operators import dedup


def _lev(a, b):
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                   prev + (a[i - 1] != b[j - 1]))
    return d[n]


@pytest.fixture(scope="module")
def titles(spark):
    rng = random.Random(5)
    alpha = "abcdef"
    strs = ["".join(rng.choice(alpha) for _ in range(rng.randint(3, 9)))
            for _ in range(120)]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strs)], "doc_id long, title string")
    return df, strs


@pytest.mark.parametrize("d", [1, 2])
def test_fuzzy_pairs_equals_brute_force(titles, d):
    """Blocking is recall-exact and the verify filter precision-exact:
    the pair set equals all-pairs levenshtein ≤ d, distances included."""
    df, strs = titles
    got = {(r.id_a, r.id_b, r.dist)
           for r in dedup.fuzzy_pairs(df, max_dist=d).collect()}
    want = {(i, j, _lev(strs[i], strs[j]))
            for i in range(len(strs)) for j in range(i + 1, len(strs))
            if _lev(strs[i], strs[j]) <= d}
    assert got == want
    assert got  # the random fixture must actually produce pairs


def test_fuzzy_edit_kinds(spark):
    """One of each edit kind (substitute / insert / delete) at d=1."""
    df = spark.createDataFrame(
        [(1, "kitten"), (2, "mitten"), (3, "kittens"), (4, "kiten"),
         (5, "zzzzz")],
        "doc_id long, title string")
    got = {(r.id_a, r.id_b) for r in dedup.fuzzy_pairs(df).collect()}
    assert {(1, 2), (1, 3), (1, 4)} <= got
    assert not any(5 in p for p in got)


def test_fuzzy_bucket_cap(spark):
    """A degenerate key (many identical strings) is capped per bucket —
    the pair count stays bounded by the cap, not the bucket size."""
    df = spark.createDataFrame(
        [(i, "same") for i in range(100)], "doc_id long, title string")
    capped = dedup.fuzzy_pairs(df, max_bucket_size=5)
    assert capped.count() <= 5 * 4 // 2


def test_fuzzy_guards(spark):
    df = spark.createDataFrame(
        [(1, "x" * 200), (2, None), (3, "ok"), (4, "ok")],
        "doc_id long, title string")
    got = {(r.id_a, r.id_b, r.dist)
           for r in dedup.fuzzy_pairs(df).collect()}
    assert got == {(3, 4, 0)}  # overlong + NULL rows excluded, not fatal
    with pytest.raises(ValueError):
        dedup.fuzzy_pairs(df, max_dist=0)
