"""Product quantization (similarity.pq_*): codebooks, encode, ADC top-k.

Pins: code range/shape, Spark-encode vs the shared numpy replica
(bit-identical — the oracle-parity contract), ADC top-k surfacing the
query's own cluster on separated data, and the dimension guards."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from resume_ocr_spark.operators import similarity  # noqa: E402


def _clustered(n_per=30, n_clusters=4, dim=8, seed=3):
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim) * 10.0
    vecs = np.concatenate([
        centers[c] + rng.randn(n_per, dim) * 0.1 for c in range(n_clusters)
    ])
    return vecs.astype(np.float64)


class TestPq:
    def test_encode_matches_numpy_replica_exactly(self, spark):
        vecs = _clustered()
        cb = similarity.pq_codebooks(vecs, m=4, k=8)
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>")
        got = {(r["vec_id"], r["sub"]): r["code"]
               for r in similarity.pq_encode(df, cb).collect()}
        want = similarity.pq_encode_array(vecs, cb)
        assert len(got) == len(vecs) * 4
        assert all(got[(i, s)] == want[i, s]
                   for i in range(len(vecs)) for s in range(4))
        assert want.min() >= 0 and want.max() < 8

    def test_adc_topk_finds_the_query_cluster(self, spark):
        vecs = _clustered()
        cb = similarity.pq_codebooks(vecs, m=4, k=8)
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>")
        codes = similarity.pq_encode(df, cb)
        # query = vector 5 (cluster 0 = ids 0..29); its top-10 by ADC must
        # all come from cluster 0, like exact L2 would
        out = similarity.pq_adc_topk(codes, cb, vecs[5], k=10).collect()
        assert len(out) == 10
        assert all(r["vec_id"] < 30 for r in out)
        dists = [r["adc_dist"] for r in out]
        assert dists == sorted(dists)

    def test_adc_matches_python_lut_sum(self, spark):
        vecs = _clustered(n_per=10, n_clusters=2)
        cb = similarity.pq_codebooks(vecs, m=4, k=8)
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>")
        codes_np = similarity.pq_encode_array(vecs, cb)
        q = vecs[0]
        m, kc, dsub = cb.shape
        lut = [[float(((q[s * dsub:(s + 1) * dsub] - cb[s][c]) ** 2).sum())
                for c in range(kc)] for s in range(m)]
        want = sorted(
            ((i, round(sum(lut[s][codes_np[i, s]] for s in range(m)), 6))
             for i in range(len(vecs))), key=lambda t: (t[1], t[0]))[:5]
        got = [(r["vec_id"], r["adc_dist"]) for r in similarity.pq_adc_topk(
            similarity.pq_encode(df, cb), cb, q, k=5).collect()]
        assert got == want

    def test_ivfpq_full_probe_equals_pure_adc(self, spark):
        # probing every cell removes the IVF pruning, so the composed
        # query must return exactly pq_adc_topk over the whole table
        vecs = _clustered(n_per=10, n_clusters=2)
        cb = similarity.pq_codebooks(vecs, m=4, k=8)
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>")
        cent = similarity.ivf_train(df, k=4)
        full = similarity.ivfpq_topk(df, vecs[3], k=5, n_probe=4,
                                     centroids=cent, codebooks=cb).collect()
        pure = similarity.pq_adc_topk(
            similarity.pq_encode(df, cb), cb, vecs[3], k=5).collect()
        assert [(r["vec_id"], r["adc_dist"]) for r in full] == \
               [(r["vec_id"], r["adc_dist"]) for r in pure]

    def test_ivfpq_prunes_to_query_cluster(self, spark):
        vecs = _clustered()
        cb = similarity.pq_codebooks(vecs, m=4, k=8)
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>")
        out = similarity.ivfpq_topk(df, vecs[5], k=10, n_probe=1,
                                    codebooks=cb).collect()
        # cluster 0 is ids 0..29; a 1-probe query from inside it must
        # return only members of it
        assert len(out) == 10
        assert all(r["vec_id"] < 30 for r in out)

    def test_residual_encode_matches_numpy_replica(self, spark):
        vecs = _clustered()
        cent, cb = similarity.ivfpq_train(vecs, k_cells=4, m=4, k_codes=8)
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>")
        got = {(r["vec_id"], r["sub"]): (r["cell"], r["code"])
               for r in similarity.ivfpq_encode(df, cent, cb).collect()}
        cells = similarity._l2_assign(vecs, cent)
        codes = similarity.pq_encode_residual_array(vecs, cells, cent, cb)
        assert len(got) == len(vecs) * 4
        for i in range(len(vecs)):
            for s in range(4):
                assert got[(i, s)] == (cells[i], codes[i, s])

    def test_residual_quantization_beats_raw_on_clustered_data(self):
        # the point of residual coding: with coarse cells removed, the
        # same codebook budget reconstructs vectors with LOWER error
        vecs = _clustered()
        cent, cb_res = similarity.ivfpq_train(vecs, k_cells=4, m=4,
                                              k_codes=8)
        cells = similarity._l2_assign(vecs, cent)
        codes_res = similarity.pq_encode_residual_array(
            vecs, cells, cent, cb_res)
        cb_raw = similarity.pq_codebooks(vecs, m=4, k=8)
        codes_raw = similarity.pq_encode_array(vecs, cb_raw)
        m, _, dsub = cb_res.shape

        def recon(codes, cb, base):
            out = np.array(base, dtype=np.float64, copy=True)
            for s in range(m):
                out[:, s * dsub:(s + 1) * dsub] += cb[s][codes[:, s]]
            return out

        err_res = ((recon(codes_res, cb_res, cent[cells]) - vecs) ** 2
                   ).sum(axis=1).mean()
        err_raw = ((recon(codes_raw, cb_raw, np.zeros_like(vecs)) - vecs)
                   ** 2).sum(axis=1).mean()
        assert err_res < err_raw

    def test_residual_topk_full_probe_ranks_query_first(self, spark):
        vecs = _clustered()
        cent, cb = similarity.ivfpq_train(vecs, k_cells=4, m=4, k_codes=8)
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>")
        index = similarity.ivfpq_encode(df, cent, cb)
        out = similarity.ivfpq_residual_topk(
            index, cent, cb, vecs[5], k=10, n_probe=4).collect()
        assert len(out) == 10
        # vector 5's own quantized residual must be the (near-)closest,
        # and its whole top-10 stays inside cluster 0 (ids 0..29)
        assert out[0]["vec_id"] == 5
        assert all(r["vec_id"] < 30 for r in out)

    def test_exact_l2_topk_matches_numpy(self, spark):
        vecs = _clustered(n_per=10, n_clusters=2)
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>")
        q = vecs[3]
        want = sorted(
            ((i, round(float(((vecs[i] - q) ** 2).sum()), 6))
             for i in range(len(vecs))), key=lambda t: (t[1], t[0]))[:5]
        got = [(r["vec_id"], r["l2_dist"]) for r in
               similarity.exact_l2_topk(df, q, k=5).collect()]
        assert got == want
        assert got[0] == (3, 0.0)  # the query itself

    def test_topk_recall_scores_overlap(self, spark):
        truth = spark.createDataFrame([(i,) for i in range(10)],
                                      "vec_id long")
        approx = spark.createDataFrame([(i,) for i in range(7, 17)],
                                       "vec_id long")
        row = similarity.topk_recall(approx, truth).collect()[0]
        assert (row["n_true"], row["n_hit"], row["recall"]) == (10, 3, 0.3)

    def test_ivfpq_recall_on_clustered_data_is_high(self, spark):
        # the end-to-end recall the gate entry measures, at test scale:
        # residual IVF-PQ with full probe should recover most of the
        # exact L2 top-10 on well-separated clusters
        vecs = _clustered()
        cent, cb = similarity.ivfpq_train(vecs, k_cells=4, m=4, k_codes=8)
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>")
        approx = similarity.ivfpq_residual_topk(
            similarity.ivfpq_encode(df, cent, cb), cent, cb, vecs[5],
            k=10, n_probe=4)
        row = similarity.topk_recall(
            approx, similarity.exact_l2_topk(df, vecs[5], 10)).collect()[0]
        assert row["n_true"] == 10
        assert row["recall"] >= 0.5

    def test_ivfpq_index_serves_same_answers_as_one_shot(self, spark):
        vecs = _clustered()
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>")
        idx = similarity.IvfPqIndex.build(df, k_cells=4, m=4, k_codes=8)
        try:
            got = [(r["vec_id"], r["adc_dist"]) for r in
                   idx.topk(vecs[5], k=8, n_probe=4).collect()]
            cent, cb = similarity.ivfpq_train(
                similarity._driver_sample(df, "vec_id", "embedding"),
                k_cells=4, m=4, k_codes=8)
            want = [(r["vec_id"], r["adc_dist"]) for r in
                    similarity.ivfpq_residual_topk(
                        similarity.ivfpq_encode(df, cent, cb), cent, cb,
                        vecs[5], k=8, n_probe=4).collect()]
            assert got == want
        finally:
            idx.unpersist()

    def test_ivfpq_index_durable_form_prunes_partitions(self, spark,
                                                        tmp_path):
        vecs = _clustered()
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>")
        path = str(tmp_path / "ivfpq_index")
        idx = similarity.IvfPqIndex.build(df, k_cells=4, m=4, k_codes=8,
                                          path=path)
        q = idx.topk(vecs[5], k=5, n_probe=1)
        plan = q._jdf.queryExecution().executedPlan().toString()
        # the probe must reach the parquet scan as a partition filter —
        # the n_probe/k_cells read-pruning claim, asserted not assumed
        assert "PartitionFilters" in plan
        assert "cell" in plan.split("PartitionFilters")[1][:200]
        rows = q.collect()
        assert len(rows) == 5 and rows[0]["vec_id"] == 5

    def test_dimension_guards(self, spark):
        vecs = _clustered(dim=8)
        with pytest.raises(ValueError, match="not divisible"):
            similarity.pq_codebooks(vecs, m=3)
        cb = similarity.pq_codebooks(vecs, m=4, k=8)
        df = spark.createDataFrame([(0, [0.0] * 8)],
                                   "vec_id long, embedding array<double>")
        with pytest.raises(ValueError, match="query dim"):
            similarity.pq_adc_topk(similarity.pq_encode(df, cb), cb,
                                   np.zeros(6))
