"""operators/privacy — seeded-Laplace DP release of corpus statistics.

Pins: the noise actually follows the inverse Laplace CDF of the 16-bit
md5 uniform (python replica agreement), the noise magnitude tracks the
sensitivity/ε scale, clamping never lets a release go negative, clipping
bounds dp_group_sums' sensitivity, and the guards reject bad ε/clip."""

import hashlib
import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from resume_ocr_spark.operators import privacy  # noqa: E402


def _lap_replica(key: str, b: float, seed: str = "dp",
                 stat: str = "count:eps=1.0") -> float:
    h = hashlib.md5(f"{key}:{seed}:{stat}".encode()).hexdigest()
    bucket = int(h[28:32], 16)
    u = (bucket + 0.5) / 65536.0
    half = u - 0.5
    sign = 1.0 if half > 0 else -1.0
    return -b * sign * math.log(1.0 - 2.0 * abs(half))


def _docs(spark, n_a=40, n_b=25):
    rows = [(i, "a") for i in range(n_a)] + \
           [(1000 + i, "b") for i in range(n_b)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


class TestDpRelease:
    def test_counts_match_python_replica(self, spark):
        out = {r["lang"]: r["dp_count"] for r in privacy.dp_group_counts(
            _docs(spark), "lang", epsilon=1.0).collect()}
        assert out["a"] == round(max(0.0, 40 + _lap_replica("a", 1.0)), 4)
        assert out["b"] == round(max(0.0, 25 + _lap_replica("b", 1.0)), 4)
        # the noise is real: the release is never the exact count
        assert out["a"] != 40.0 and out["b"] != 25.0

    def test_noise_scales_with_inverse_epsilon(self, spark):
        df = _docs(spark)
        loose = {r["lang"]: r["dp_count"] for r in privacy.dp_group_counts(
            df, "lang", epsilon=0.1).collect()}
        tight = {r["lang"]: r["dp_count"] for r in privacy.dp_group_counts(
            df, "lang", epsilon=10.0).collect()}
        # ε is part of the draw key (independent uniforms per release);
        # each release equals its own replica
        assert loose["a"] == round(
            max(0.0, 40 + _lap_replica("a", 10.0, stat="count:eps=0.1")), 4)
        assert tight["a"] == round(
            max(0.0, 40 + _lap_replica("a", 0.1, stat="count:eps=10.0")), 4)

    def test_small_count_clamps_at_zero(self, spark):
        # find a seed whose draw is negative for group 'z' under the
        # release's exact stat key, then overwhelm a count of 1
        seeds = ("dp", "dp1", "dp2", "dp3", "dp4", "dp5", "dp6")
        seed = next(s for s in seeds
                    if _lap_replica("z", 20.0, s, "count:eps=0.05") < -1)
        df = spark.createDataFrame([(0, "z")], "doc_id long, lang string")
        out = privacy.dp_group_counts(
            df, "lang", epsilon=0.05, seed=seed).collect()[0]
        assert out["dp_count"] == 0.0

    def test_group_sums_clip_bounds_contribution(self, spark):
        rows = [(0, "a", 50.0), (1, "a", 5000.0), (2, "b", 2.0)]
        df = spark.createDataFrame(rows, "doc_id long, lang string, v double")
        out = {r["lang"]: r["dp_sum"] for r in privacy.dp_group_sums(
            df, "lang", "v", clip=100.0, epsilon=1.0).collect()}
        # the 5000 outlier is clamped to the public bound before the sum
        stat = "sum:v:clip=100.0:eps=1.0"
        assert out["a"] == round(max(0.0, 150.0 +
                                     _lap_replica("a", 100.0, stat=stat)), 4)
        assert out["b"] == round(max(0.0, 2.0 +
                                     _lap_replica("b", 100.0, stat=stat)), 4)

    def test_joint_release_noise_does_not_cancel(self, spark):
        # review r5: with a SHARED uniform, dp_sum − clip·dp_count would
        # reconstruct S − clip·n exactly; the stat-keyed draws must break
        # that cancellation
        rows = [(i, "a", 1.0) for i in range(30)]
        df = spark.createDataFrame(rows, "doc_id long, lang string, v double")
        clip = 100.0
        cnt = privacy.dp_group_counts(df, "lang").collect()[0]["dp_count"]
        sm = privacy.dp_group_sums(
            df, "lang", "v", clip=clip).collect()[0]["dp_sum"]
        true_combo = 30.0 - clip * 30.0
        assert abs((sm - clip * cnt) - true_combo) > 1.0

    def test_guards(self, spark):
        df = _docs(spark)
        with pytest.raises(ValueError, match="epsilon"):
            privacy.dp_group_counts(df, "lang", epsilon=0.0)
        with pytest.raises(ValueError, match="clip"):
            privacy.dp_group_sums(df, "lang", "doc_id", clip=-1.0)
