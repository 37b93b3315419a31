"""Quality-annealed curriculum order (packing.anneal_order): exact parity
with an independent Python recompute (sample order-statistic threshold,
phase split, hash order), positional density, determinism, validation."""

import hashlib
import math

import pytest

from resume_ocr_spark.operators import packing

CAP = 32768  # sample_rate 0.5 of the 16-bit bucket space


def _rows():
    rows = []
    for i in range(80):
        q = None if i % 17 == 0 else round((i * 7 % 41) / 40.0, 3)
        rows.append((i, q))
    return rows


def _b16(i, seed):
    return int(hashlib.md5(f"{i}:{seed}".encode()).hexdigest()[28:32], 16)


def _py_anneal(rows, final_frac=0.25, epoch=1, shards=8):
    samp = sorted(q for i, q in rows
                  if q is not None and _b16(i, "anneal-thr") < CAP)
    t = sorted(samp, reverse=True)[math.ceil(final_frac * len(samp)) - 1]
    out = {}
    keyed = []
    for i, q in rows:
        h = hashlib.md5(f"{i}:anneal:{epoch}".encode()).hexdigest()
        phase = 1 if (q is not None and q >= t) else 0
        keyed.append((phase, int(h[:4], 16) % shards, h, i, q))
    by_part = {}
    for phase, shard, h, i, q in keyed:
        by_part.setdefault((phase, shard), []).append((h, i, q))
    for (phase, shard), items in by_part.items():
        items.sort()
        for pos, (_, i, q) in enumerate(items):
            out[i] = (q, phase, shard, pos)
    return out


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(_rows(), "doc_id long, quality double")


def test_matches_python_recompute(spark, frame):
    got = {r["doc_id"]: (r["quality"], r["phase"], r["shard"], r["pos"])
           for r in packing.anneal_order(frame, final_frac=0.25, epoch=1,
                                         shards=8).collect()}
    assert got == _py_anneal(_rows())
    phases = {v[1] for v in got.values()}
    assert phases == {0, 1}
    # NULL quality must never anneal
    assert all(v[1] == 0 for v in got.values() if v[0] is None)


def test_positions_dense_within_each_phase_shard(spark, frame):
    out = packing.anneal_order(frame, epoch=0, shards=4).collect()
    assert len(out) == len({r["doc_id"] for r in out}) == 80
    by_part = {}
    for r in out:
        by_part.setdefault((r["phase"], r["shard"]), []).append(r["pos"])
    for part, poss in by_part.items():
        assert sorted(poss) == list(range(len(poss))), part


def test_deterministic_and_layout_invariant(spark, frame):
    def order(f):
        rows = packing.anneal_order(f, epoch=2, shards=4).collect()
        return [r["doc_id"] for r in sorted(
            rows, key=lambda r: (r["phase"], r["shard"], r["pos"]))]

    assert order(frame) == order(frame.repartition(7))


def test_validation(spark, frame):
    with pytest.raises(ValueError, match="final_frac"):
        packing.anneal_order(frame, final_frac=1.0)
    with pytest.raises(ValueError, match="sample_rate"):
        packing.anneal_order(frame, sample_rate=0.0)
    with pytest.raises(ValueError, match="shards"):
        packing.anneal_order(frame, shards=0)
    empty = frame.filter("quality IS NULL")
    with pytest.raises(ValueError, match="sample is empty"):
        packing.anneal_order(empty)
