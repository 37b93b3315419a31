"""Margin-based bitext mining (operators/bitext.py): numpy parity of the
exact path, the hub-suppression property the margin exists for, the
candidate-restricted scale path, and the cross-side LSH generator."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from resume_ocr_spark.operators import bitext

K = bitext.MARGIN_K


@pytest.fixture(scope="module")
def sides(spark):
    emb = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
           .filter("vec_id < 50"))
    src = emb.filter("vec_id % 2 = 0").select(
        F.col("vec_id").alias("sid"), "embedding")
    tgt = emb.filter("vec_id % 2 = 1").select(
        F.col("vec_id").alias("tid"), "embedding")
    vecs = {int(r.vec_id): np.array(r.embedding, dtype=np.float64)
            for r in emb.collect()}
    return src, tgt, vecs


def _ref_mine(vecs, k, threshold):
    S = sorted(i for i in vecs if i % 2 == 0)
    T = sorted(i for i in vecs if i % 2 == 1)

    def cos(a, b):
        return float(a @ b / np.sqrt((a @ a) * (b @ b)))

    C = {(s, t): int(round(cos(vecs[s], vecs[t]) * 1e6))
         for s in S for t in T}
    sumx = {s: (lambda tt: (sum(C[(s, t)] for t in tt), len(tt)))(
        sorted(T, key=lambda t: (-C[(s, t)], t))[:k]) for s in S}
    sumy = {t: (lambda ss: (sum(C[(s, t)] for s in ss), len(ss)))(
        sorted(S, key=lambda s: (-C[(s, t)], s))[:k]) for t in T}
    out = {}
    for s in S:
        best = None
        for t in T:
            sx, cx = sumx[s]
            sy, cy = sumy[t]
            m = round(2.0 * C[(s, t)] * cx * cy / (sx * cy + sy * cx), 6)
            key = (-m, t)
            if best is None or key < best[0]:
                best = (key, t, C[(s, t)], m)
        if best[3] >= threshold:
            out[s] = (best[1], best[2], best[3])
    return out


def test_mine_bitext_numpy_parity(sides):
    src, tgt, vecs = sides
    got = {r.src_id: (r.tgt_id, r.c, r.margin)
           for r in bitext.mine_bitext(
               src, tgt, id_src="sid", id_tgt="tid", threshold=0.0
           ).collect()}
    assert got == _ref_mine(vecs, K, 0.0)


def test_margin_suppresses_hubs(spark):
    """Two targets with EQUAL raw cosine to x1 — one exclusive, one a hub
    also close to x2. The margin must rank the exclusive target first
    (the property raw cosine lacks and the margin paper exists for)."""
    rows_s = [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0])]
    hub = [0.6, 0.6, float(np.sqrt(1 - 2 * 0.36))]
    rows_t = [(10, [0.6, 0.0, 0.8]), (11, hub)]
    src = spark.createDataFrame(rows_s, "sid long, embedding array<double>")
    tgt = spark.createDataFrame(rows_t, "tid long, embedding array<double>")
    m = {(r.src_id, r.tgt_id): r.margin
         for r in bitext.margin_scores(
             src, tgt, k=2, id_src="sid", id_tgt="tid").collect()}
    assert m[(1, 10)] > m[(1, 11)]
    mined = bitext.mine_bitext(src, tgt, k=2, id_src="sid", id_tgt="tid",
                               threshold=0.0).collect()
    assert {r.src_id: r.tgt_id for r in mined}[1] == 10


def test_candidates_restrict_graph(sides):
    """With a candidate list, every cosine/neighborhood/mined pair stays
    inside the candidate graph."""
    src, tgt, _ = sides
    cand = (src.crossJoin(tgt.select("tid"))
            .filter((F.col("sid") + F.col("tid")) % 3 == 0)
            .select(F.col("sid").alias("src_id"),
                    F.col("tid").alias("tgt_id")))
    allowed = {(r.src_id, r.tgt_id) for r in cand.collect()}
    mined = bitext.mine_bitext(src, tgt, id_src="sid", id_tgt="tid",
                               threshold=0.0, candidates=cand).collect()
    assert mined and all((r.src_id, r.tgt_id) in allowed for r in mined)


def test_threshold_filters(sides):
    src, tgt, vecs = sides
    ref = _ref_mine(vecs, K, 1.02)
    got = {r.src_id: (r.tgt_id, r.c, r.margin)
           for r in bitext.mine_bitext(
               src, tgt, id_src="sid", id_tgt="tid", threshold=1.02
           ).collect()}
    assert got == ref
    assert len(got) < 25  # threshold actually cuts something


def test_lsh_candidates_find_planted_pairs(spark):
    """Identical cross-side vectors share every band (signature equality
    is guaranteed, not probabilistic) — the planted pairs must survive
    the LSH pruning and be mined."""
    rng = np.random.RandomState(3)
    base = rng.randn(30, 16)
    src = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(30)],
        "sid long, embedding array<double>")
    tgt = spark.createDataFrame(
        [(100 + i, [float(x) for x in base[i]]) for i in range(30)],
        "tid long, embedding array<double>")
    cand = bitext.lsh_candidates_cross(src, tgt, dim=16,
                                       id_src="sid", id_tgt="tid")
    pairs = {(r.src_id, r.tgt_id) for r in cand.collect()}
    assert all((i, 100 + i) in pairs for i in range(30))
    mined = {r.src_id: r.tgt_id
             for r in bitext.mine_bitext(
                 src, tgt, id_src="sid", id_tgt="tid",
                 threshold=0.0, candidates=cand).collect()}
    assert all(mined[i] == 100 + i for i in range(30))


def test_bucket_side_cap(spark):
    """max_bucket_side caps each side of a band bucket — a flooded
    bucket cannot explode the join."""
    vec = [1.0] * 8
    src = spark.createDataFrame(
        [(i, vec) for i in range(50)], "sid long, embedding array<double>")
    tgt = spark.createDataFrame(
        [(100 + i, vec) for i in range(50)],
        "tid long, embedding array<double>")
    cand = bitext.lsh_candidates_cross(
        src, tgt, dim=8, id_src="sid", id_tgt="tid", max_bucket_side=5)
    assert cand.count() <= 5 * 5  # ≤ cap² pairs however many collide
