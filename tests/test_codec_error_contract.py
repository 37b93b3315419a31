"""Named-error contract under mutation: every codec's public decode entry
point must raise ONLY its documented error type on corrupted input — bit
flips and truncations of VALID streams, which reach far deeper parse paths
than random bytes. A leaked struct.error / StopIteration / bare ValueError
would be a task failure in the multimodal UDFs instead of an error row
(this hunt found and fixed exactly those in mp4codec/jpegcodec, plus
truncated OGG ident headers in mpegaudio)."""

from __future__ import annotations

import random

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from resume_ocr_spark.formats import (avcodec, imagecodec, jpegcodec,
                                      mp4codec, pdfcodec)
from tests.test_jpegcodec import encode_jpeg


@pytest.fixture(scope="module")
def bases():
    img = imagecodec.render_text_image("Currículo de Teste\njoao@x.com")
    raw = imagecodec.decode_rimg(img)
    js = encode_jpeg(raw[:64, :64])
    return {
        "pdf_text": pdfcodec.write_text_pdf(["Experiência\nPython"], cid=False),
        "pdf_cid": pdfcodec.write_text_pdf(["Olá Mundo"], cid=True),
        "pdf_scan": pdfcodec.write_scanned_pdf([raw]),
        "rimg": img,
        "jpg": js,
        "wav": avcodec.write_wav(np.zeros(400, np.int16), 8000),
        "mp4": mp4codec.write_mjpeg_mp4([js] * 2, 64, 64, fps=5),
    }


CASES = [
    ("pdf_text", lambda p: pdfcodec.extract_text(p), pdfcodec.PdfParseError),
    ("pdf_cid", lambda p: pdfcodec.extract_text(p), pdfcodec.PdfParseError),
    ("pdf_scan", lambda p: pdfcodec.extract_page_images(p),
     pdfcodec.PdfParseError),
    ("rimg", lambda p: imagecodec.decode_image(p), imagecodec.ImageDecodeError),
    ("jpg", lambda p: imagecodec.decode_image(p), imagecodec.ImageDecodeError),
    ("jpg", lambda p: jpegcodec.decode_jpeg_gray(p), jpegcodec.JpegDecodeError),
    ("wav", lambda p: avcodec.decode_wav(p), avcodec.AudioDecodeError),
    ("mp4", lambda p: mp4codec.extract_frames_gray(p), mp4codec.Mp4DecodeError),
    ("mp4", lambda p: avcodec.decode_video_any(p), avcodec.VideoDecodeError),
]


@given(st.integers(0, 2**32 - 1))
@settings(max_examples=120, deadline=None)
def test_mutated_streams_raise_only_named_errors(bases, seed):
    rng = random.Random(seed)
    key, fn, okexc = CASES[seed % len(CASES)]
    blob = bytearray(bases[key])
    for _ in range(rng.randint(1, 16)):
        blob[rng.randrange(len(blob))] ^= 1 << rng.randrange(8)
    if rng.random() < 0.4:
        blob = blob[: rng.randint(1, len(blob))]
    try:
        fn(bytes(blob))
    except okexc:
        pass  # the documented contract; anything else propagates and fails


class TestOcrSurfaceTotality:
    """ocr_image must return text or raise OcrConfidenceError /
    ImageDecodeError on ANY decodable page — adversarial images (noise,
    flats, salt, mutated renders, stripes) found a deskew crash
    (|k|·w ≥ h block shift) and two unbounded-cost paths, all fixed."""

    @given(st.integers(0, 2**32 - 1))
    @settings(max_examples=25, deadline=None)
    def test_adversarial_images_total(self, seed):
        rng = np.random.default_rng(seed)
        pyr = random.Random(seed)
        h = int(rng.integers(1, 300))
        w = int(rng.integers(1, 400))
        kind = seed % 5
        if kind == 0:
            img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        elif kind == 1:
            img = np.full((h, w), int(rng.integers(0, 256)), np.uint8)
        elif kind == 2:
            img = (255 - ((rng.random((h, w)) < 0.03)
                          .astype(np.uint8) * 255)).astype(np.uint8)
        elif kind == 3:
            base = imagecodec.decode_rimg(
                imagecodec.render_text_image("Experiência\nPython"))
            img = base.copy()
            for _ in range(pyr.randint(1, 200)):
                img[pyr.randrange(base.shape[0]),
                    pyr.randrange(base.shape[1])] ^= 255
        else:
            img = ((np.arange(h)[:, None] * int(rng.integers(1, 9))
                    + np.arange(w)[None, :]) % 256).astype(np.uint8)
        payload = (imagecodec.MAGIC
                   + np.array(img.shape, dtype="<u4").tobytes()
                   + img.tobytes())
        try:
            out = imagecodec.ocr_image(payload)
            assert isinstance(out, str)
        except (imagecodec.OcrConfidenceError, imagecodec.ImageDecodeError):
            pass
