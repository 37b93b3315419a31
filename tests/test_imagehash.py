"""Perceptual-hash dedup (operators/imagehash.py): hash correctness against
independent recomputation, banding recall guarantees, and the Spark pairing
path end-to-end."""

import numpy as np
import pytest

from resume_ocr_spark.formats import imagecodec
from resume_ocr_spark.operators import imagehash, multimodal


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_area_resize_exact_blocks():
    # 4x4 -> 2x2: each output cell is the mean of a disjoint 2x2 block
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = imagehash._area_resize(img, 2, 2)
    expect = np.array([[2.5, 4.5], [10.5, 12.5]])
    assert np.allclose(out, expect)


def test_area_resize_uneven_partitions_cover_input():
    # 5x7 -> 2x3: blocks partition the input (means weighted by true areas),
    # so the area-weighted mean of outputs equals the global mean
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(5, 7)).astype(np.uint8)
    out = imagehash._area_resize(img, 2, 3)
    re = np.minimum((np.arange(1, 3) * 5) // 2, 5)
    ce = np.minimum((np.arange(1, 4) * 7) // 3, 7)
    rs = np.concatenate(([0], re[:-1]))
    cs = np.concatenate(([0], ce[:-1]))
    areas = np.outer(re - rs, ce - cs)
    assert np.isclose((out * areas).sum() / areas.sum(), img.mean())


def test_area_resize_upscale_replicates_not_zero_fills(tmp_path=None):
    # image smaller than the grid: empty blocks would read mean 0 and turn
    # a uniform image into a checkerboard (code-review r4 finding) — the
    # widened blocks must nearest-sample instead
    img = np.full((4, 4), 200, dtype=np.uint8)
    out = imagehash._area_resize(img, 8, 8)
    assert np.allclose(out, 200.0)
    # and small-image similarity stays monotone: a 1-px retouch of a
    # 16x16 gradient is closer than an unrelated noise image (tiny inputs
    # upscale 2x into the DCT grid, so single-pixel edits carry more
    # relative energy than at native sizes — ordering, not tiny distance,
    # is the invariant worth pinning)
    def _d(a, b):
        return bin((imagehash.phash64(a) ^ imagehash.phash64(b))
                   & ((1 << 64) - 1)).count("1")

    icon = np.outer(np.arange(16), np.arange(16)).astype(np.uint8)
    icon2 = icon.copy()
    icon2[7, 7] = 255
    noise = np.random.RandomState(1).randint(
        0, 256, size=(16, 16)).astype(np.uint8)
    assert _d(icon, icon.copy()) == 0
    assert _d(icon, icon2) < _d(icon, noise)


def test_dct_matrix_orthonormal():
    c = imagehash._dct_matrix(8)
    assert np.allclose(c @ c.T, np.eye(8), atol=1e-12)


def test_phash_properties():
    img = imagecodec.decode_image(
        imagecodec.render_text_image("Maria Silva Senior Data Engineer"))
    h = imagehash.phash64(img)
    assert h == imagehash.phash64(img.copy())          # deterministic
    assert h & 1 == 0                                  # LSB pad bit is 0
    # brightness invariance: pHash ignores the DC term, so a global
    # brightness shift flips (almost) no bits
    brighter = np.clip(img.astype(np.int32) + 20, 0, 255).astype(np.uint8)
    assert _ham(h, imagehash.phash64(brighter)) <= 2


def test_phash_orders_by_similarity():
    base = "Maria Silva Senior Data Engineer Python"
    near = "Maria Silva Senior Data Engineer Scala.."
    far = "Completely unrelated pancake recipe text"
    hs = [
        imagehash.phash64(imagecodec.decode_image(
            imagecodec.render_text_image(t[:40])))
        for t in (base, near, far)
    ]
    assert _ham(hs[0], hs[1]) < _ham(hs[0], hs[2])
    assert _ham(hs[0], hs[2]) > 6


def test_bits_to_i64_two_complement():
    bits = np.zeros(64, dtype=bool)
    bits[0] = True  # MSB set -> negative in two's complement
    assert imagehash._bits_to_i64(bits) == -(2**63)
    bits = np.zeros(64, dtype=bool)
    bits[-1] = True
    assert imagehash._bits_to_i64(bits) == 1


@pytest.mark.usefixtures("spark")
def test_spark_hashes_match_local(spark):
    texts = ["Maria Silva Senior Data Engineer Python",
             "Joao Souza Junior Backend Developer Go!",
             "Completely unrelated pancake recipe text"]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    out = {
        r["doc_id"]: (r["phash"], r["dhash"])
        for r in imagehash.with_image_hashes(
            multimodal.render_binary_column(docs)).collect()
    }
    for i, t in enumerate(texts):
        img = imagecodec.decode_image(imagecodec.render_text_image(t[:40]))
        assert out[i] == (imagehash.phash64(img), imagehash.dhash64(img))


@pytest.mark.usefixtures("spark")
def test_near_dup_pairs_and_band_recall(spark):
    # 0/1 identical, 2 a one-word variant, 3 unrelated
    texts = {
        0: "Maria Silva Senior Data Engineer Python",
        1: "Maria Silva Senior Data Engineer Python",
        2: "Maria Silva Junior Data Engineer Python",
        3: "Completely unrelated pancake recipe text",
    }
    docs = spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string")
    hashes = imagehash.with_image_hashes(
        multimodal.render_binary_column(docs))
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in imagehash.phash_near_dup(hashes).collect()}
    assert pairs[(0, 1)] == 0
    # banding guarantee: any pair with hamming < bands shares a band, so
    # every such pair MUST be in the output regardless of bucket layout
    local = {
        i: imagehash.phash64(imagecodec.decode_image(
            imagecodec.render_text_image(t[:40])))
        for i, t in texts.items()
    }
    for a in texts:
        for b in texts:
            if a < b and _ham(local[a], local[b]) <= 3:
                assert (a, b) in pairs
    # unrelated doc never pairs under the distance cap
    assert not any(3 in p for p in pairs)


@pytest.mark.usefixtures("spark")
def test_corrupt_payload_becomes_error_row_not_pair(spark):
    good = imagecodec.render_text_image("Maria Silva Senior Data Engineer")
    media = spark.createDataFrame(
        [(0, bytes(good)), (1, b"NOTANIMAGE"), (2, None)],
        "doc_id long, media binary")
    out = imagehash.with_image_hashes(media).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["error"] is None and by_id[0]["phash"] is not None
    assert by_id[1]["phash"] is None and by_id[1]["error"]
    assert by_id[2]["error"] == "null payload"
    # error rows are filtered before banding, not joined as NULL keys
    assert imagehash.phash_near_dup(
        imagehash.with_image_hashes(media)).count() == 0


def test_phash_near_dup_rejects_bad_bands():
    with pytest.raises(ValueError):
        imagehash.phash_near_dup(None, bands=5)


@pytest.mark.usefixtures("spark")
def test_video_frames_compose_into_phash_dedup(spark):
    """Cross-modality composition: video_frame_sample re-wraps frames as
    RIMG image payloads, so sampled frames flow straight into the
    perceptual-hash dedup path — two clips of the same text must produce
    frame-level exact pHash pairs."""
    from resume_ocr_spark.operators import multimodal

    docs = spark.createDataFrame(
        [(0, "Maria Silva Senior Data Engineer"),
         (1, "Maria Silva Senior Data Engineer"),
         (2, "A completely different clip text!")],
        "doc_id long, text string")
    frames = multimodal.video_frame_sample(
        multimodal.render_video_column(docs), every_n=2)
    # one row per (doc, frame): re-key so each frame hashes independently
    keyed = frames.filter(frames.error.isNull()).select(
        (frames.doc_id * 1000 + frames.frame_idx).alias("doc_id"), "media")
    hashes = imagehash.with_image_hashes(keyed)
    pairs = imagehash.phash_near_dup(hashes, max_distance=2).collect()
    # clips 0 and 1 are identical -> every sampled frame pairs across them
    cross = [(r["id_a"], r["id_b"]) for r in pairs
             if r["id_a"] // 1000 == 0 and r["id_b"] // 1000 == 1
             and r["hamming"] == 0]
    assert cross, "identical clips produced no frame-level phash pairs"
    # nothing pairs with the different clip at distance <= 2
    assert not any(r["id_a"] // 1000 == 2 or r["id_b"] // 1000 == 2
                   for r in pairs)


@pytest.mark.usefixtures("spark")
def test_phash_probe_incremental_index(spark):
    """Incremental image dedup: a new batch probes the persisted hash
    index — pairs only ACROSS sides, never within either, and the index
    side is hashes only (16 bytes/image)."""
    texts = {
        10: "Maria Silva Senior Data Engineer Python",   # index
        11: "A completely different recipe for cake!!",  # index
        20: "Maria Silva Senior Data Engineer Python",   # new: dup of 10
        21: "Brand new never before seen document 42",   # new: fresh
        22: "Brand new never before seen document 42",   # new: dup of 21
    }

    def hashes(ids):
        docs = spark.createDataFrame(
            [(i, texts[i]) for i in ids], "doc_id long, text string")
        return imagehash.with_image_hashes(
            multimodal.render_binary_column(docs)).select("doc_id", "phash")

    index = hashes([10, 11])
    new = hashes([20, 21, 22])
    pairs = {(r["new_id"], r["index_id"]): r["hamming"]
             for r in imagehash.phash_probe(new, index).collect()}
    assert pairs[(20, 10)] == 0          # the cross-side duplicate
    # within-batch dup (21, 22) is NOT the probe's job — no same-side pairs
    assert all(n in (20, 21, 22) and i in (10, 11) for n, i in pairs)
    assert (21, 10) not in pairs and (21, 11) not in pairs
    # degenerate-index cap: bucket of size 1 drops everything
    assert imagehash.phash_probe(new, index, max_bucket_size=0).count() == 0
    with pytest.raises(ValueError):
        imagehash.phash_probe(new, index, bands=7)


def test_cross_container_near_dup_caught():
    """Round-5 realism pin: the same document rendered as RIMG vs re-encoded
    as a progressive (SOF2) JPEG must still pair under pHash — the
    real-world 'same image saved through different encoders' case. q=16
    quantization must not move the DCT sign structure pHash reads."""
    from resume_ocr_spark.formats import jpegenc

    text = "Maria Silva Senior Data Engineer Python"
    img = imagecodec.decode_image(imagecodec.render_text_image(text[:40]))
    prog = imagecodec.decode_image(jpegenc.encode_jpeg(img, progressive=True))
    d = bin(imagehash.phash64(img) ^ imagehash.phash64(prog)).count("1")
    assert d <= 6, f"cross-container pHash distance {d} exceeds pair cutoff"


@pytest.mark.usefixtures("spark")
def test_progressive_payloads_in_spark_hash_path(spark):
    """render_binary_column(progressive_every=2) ships half the corpus as
    SOF2 JPEG; the Spark hash path must match the single-node replica on
    the EXACT payload each doc got."""
    from resume_ocr_spark.operators import multimodal as mm

    texts = ["Maria Silva Senior Data Engineer Python",
             "Joao Souza Junior Backend Developer Go!"]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    out = {
        r["doc_id"]: r["phash"]
        for r in imagehash.with_image_hashes(
            mm.render_binary_column(docs, progressive_every=2)).collect()
    }
    for i, t in enumerate(texts):
        payload = mm.render_media_payload(i, t, progressive_every=2)
        if i % 2 == 0:
            assert payload[:3] == b"\xff\xd8\xff"  # really a JPEG
        img = imagecodec.decode_image(payload)
        assert out[i] == imagehash.phash64(img)
