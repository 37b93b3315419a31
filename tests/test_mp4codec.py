"""MP4 (ISO BMFF) MJPEG container: writer→parser round trip (the writer is
the parser's spec pin, same strategy as the test-side JPEG encoder) and the
Spark-side video sampling path over real MP4 payloads."""

from __future__ import annotations

import numpy as np
import pytest

from resume_ocr_spark.formats import avcodec, mp4codec
from resume_ocr_spark.operators import multimodal
from tests.test_jpegcodec import encode_jpeg


def _gradient_frames(n=5, h=32, w=48):
    base = ((np.arange(h)[:, None] * 5 + np.arange(w)[None, :] * 3) % 256
            ).astype(np.uint8)
    return [np.roll(base, k * 2, axis=1) for k in range(n)]


def _mp4_bytes(frames=None):
    frames = frames or _gradient_frames()
    h, w = frames[0].shape
    samples = [encode_jpeg(f) for f in frames]
    return mp4codec.write_mjpeg_mp4(samples, w, h, fps=10), frames


class TestMp4Codec:
    def test_write_read_round_trip(self):
        payload, frames = _mp4_bytes()
        assert mp4codec.is_mp4(payload)
        got = mp4codec.extract_frames_gray(payload)
        assert got.shape == (len(frames),) + frames[0].shape
        for g, f in zip(got, frames):
            # baseline JPEG is lossy; error bounded like test_jpegcodec
            assert float(np.abs(g.astype(int) - f.astype(int)).mean()) < 6.0

    def test_sample_extraction_exact_bytes(self):
        payload, frames = _mp4_bytes()
        samples = mp4codec.extract_mjpeg_samples(payload)
        assert samples == [encode_jpeg(f) for f in frames]

    def test_corrupt_and_unsupported(self):
        payload, _ = _mp4_bytes()
        with pytest.raises(mp4codec.Mp4DecodeError):
            mp4codec.extract_frames_gray(payload[: len(payload) // 2])
        with pytest.raises(mp4codec.Mp4DecodeError):
            mp4codec.extract_frames_gray(b"\x00\x00\x00\x08ftyp")
        # H.264-style fourcc is rejected with an explicit message
        h264 = payload.replace(b"jpeg", b"avc1", 1)
        # first 'jpeg' occurrence is inside stsd? ensure replace hit stsd:
        with pytest.raises(mp4codec.Mp4DecodeError, match="unsupported|corrupt|no samples"):
            mp4codec.extract_frames_gray(h264)

    def test_decode_video_any_dispatch(self):
        payload, frames = _mp4_bytes()
        got = avcodec.decode_video_any(payload)
        assert got.shape[0] == len(frames)
        rvid = avcodec.render_video("clip")
        assert avcodec.decode_video_any(rvid).ndim == 3
        with pytest.raises(avcodec.VideoDecodeError):
            avcodec.decode_video_any(b"not a video at all")

    def test_sample_video_frames_mp4(self):
        payload, frames = _mp4_bytes()
        out = multimodal.sample_video_frames(payload, every_n=2)
        assert len(out) == (len(frames) + 1) // 2
        with pytest.raises(NotImplementedError):
            multimodal.sample_video_frames(b"\x1aE\xdf\xa3webm...")


class TestMp4Spark:
    def test_video_frame_sample_over_mp4_column(self, spark):
        """The Spark fan-out path consumes MP4 payloads alongside RVID ones
        in the same binary column; corrupt rows stay error rows."""
        mp4_payload, frames = _mp4_bytes()
        rvid_payload = avcodec.render_video("texto do clipe")
        df = spark.createDataFrame(
            [(1, bytearray(mp4_payload)), (2, bytearray(rvid_payload)),
             (3, bytearray(b"garbage bytes"))],
            "doc_id long, media binary")
        rows = multimodal.video_frame_sample(df, every_n=2).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        assert len(by_doc[1]) == (len(frames) + 1) // 2
        assert all(r["error"] is None and r["media"] is not None
                   for r in by_doc[1])
        assert all(r["error"] is None for r in by_doc[2])
        assert len(by_doc[3]) == 1 and by_doc[3][0]["error"]
        # sampled MP4 frames re-wrap as RIMG → flow into image ops
        from resume_ocr_spark.formats import imagecodec

        img = imagecodec.decode_rimg(bytes(by_doc[1][0]["media"]))
        assert img.shape == frames[0].shape
