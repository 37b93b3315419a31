"""similarity.hard_negatives — contrastive hard-negative mining.

Hand-computable cosines on unit-ish 3-d vectors pin the band semantics:
positives/near-dups (cos >= hi) and easy negatives (cos < lo) are both
excluded, ranks order by cosine descending with the id-asc tiebreak."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from resume_ocr_spark.operators import similarity  # noqa: E402


def _df(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),    # anchor
        (1, [1.0, 0.0, 0.0]),    # exact dup: cos 1.0 — excluded (>= hi)
        (2, [0.8, 0.6, 0.0]),    # cos 0.8 — hard negative
        (3, [0.6, 0.8, 0.0]),    # cos 0.6 — hard negative
        (4, [0.0, 1.0, 0.0]),    # cos 0.0 — too easy (< lo)
        (5, [-1.0, 0.0, 0.0]),   # cos -1.0 — too easy
        (6, [0.6, 0.8, 0.0]),    # cos 0.6 tie with id 3 — id-asc tiebreak
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


class TestHardNegatives:
    def test_band_and_ranking(self, spark):
        out = similarity.hard_negatives(
            _df(spark), anchor_ids=[0], k=5, lo=0.1, hi=0.9).collect()
        got = [(r["negative_id"], r["cosine"], r["neg_rank"]) for r in
               sorted(out, key=lambda r: r["neg_rank"])]
        assert got == [(2, 0.8, 1), (3, 0.6, 2), (6, 0.6, 3)]

    def test_anchor_never_its_own_negative_and_k_caps(self, spark):
        out = similarity.hard_negatives(
            _df(spark), anchor_ids=[0, 2], k=1, lo=-1.0, hi=0.9).collect()
        by_anchor = {}
        for r in out:
            assert r["negative_id"] != r["anchor_id"]
            by_anchor.setdefault(r["anchor_id"], []).append(r)
        assert set(by_anchor) == {0, 2}
        assert all(len(v) == 1 and v[0]["neg_rank"] == 1
                   for v in by_anchor.values())

    def test_near_dup_band_excluded_entirely(self, spark):
        # with hi just above the dup's cosine, the dup IS returned — the
        # exclusion is purely the band, not a hidden dedup
        out = similarity.hard_negatives(
            _df(spark), anchor_ids=[0], k=10, lo=0.95, hi=1.01).collect()
        assert [r["negative_id"] for r in out] == [1]
        assert out[0]["cosine"] == 1.0
