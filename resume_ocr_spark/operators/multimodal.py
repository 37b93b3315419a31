"""Multimodal column plumbing: opaque binary media + typed metadata.

Real pipeline shape for image/audio/video columns at 100 TB scale: media
travels as a ``binary`` column, every transform is an Arrow batch UDF over
``mapInPandas`` (schema, partitioning, batch shape all real).  The decode
for *real* PNG/JPEG/audio/video is stubbed — those libs aren't in this
container — behind ``NotImplementedError``; the engine's own deterministic
RIMG codec exercises the full path end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..formats import imagecodec

META_SCHEMA = (
    "doc_id long, height int, width int, n_pixels long, mean_intensity double, "
    "error string"
)


def decode_external_image(payload: bytes) -> np.ndarray:
    """PNG/JPEG decode — requires an image library not present here.

    STUB: on a real cluster, swap in cv2.imdecode / PIL.Image.open; the
    RIMG path below exercises identical plumbing."""
    raise NotImplementedError("PNG/JPEG decode needs opencv/PIL (not in container)")


def decode_audio(payload: bytes) -> np.ndarray:
    """STUB — audio decode (soundfile/ffmpeg) not available in container."""
    raise NotImplementedError("audio decode needs soundfile/ffmpeg")


def sample_video_frames(payload: bytes, every_n: int = 30) -> list[np.ndarray]:
    """STUB — video frame sampling (ffmpeg) not available in container."""
    raise NotImplementedError("video decode needs ffmpeg")


def render_binary_column(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic media synthesis: text → RIMG binary column (the stand-in
    for reading real image bytes from blob storage)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame({
                "doc_id": pdf[id_col],
                "media": [
                    imagecodec.render_text_image((t or "")[:40])
                    for t in pdf[text_col]
                ],
            })
            yield out

    return docs.select(id_col, text_col).mapInPandas(
        gen, schema="doc_id long, media binary"
    )


def image_metadata(media_df: DataFrame) -> DataFrame:
    """binary → typed metadata (h, w, pixel count, mean intensity) via a
    vectorized batch UDF; corrupt payloads become error rows."""
    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                try:
                    img = imagecodec.decode_rimg(bytes(payload))
                    rows.append((doc_id, img.shape[0], img.shape[1],
                                 int(img.size), round(float(img.mean()), 4), None))
                except imagecodec.ImageDecodeError as exc:
                    rows.append((doc_id, None, None, None, None, str(exc)))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "height", "width", "n_pixels", "mean_intensity",
                "error"])

    return media_df.mapInPandas(meta, schema=META_SCHEMA)


def resize_half(media_df: DataFrame) -> DataFrame:
    """Real image transform on the binary column: 2× max-pool downsample
    (vectorized numpy inside the batch UDF)."""
    def rz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payloads = []
            for payload in pdf["media"]:
                img = imagecodec.decode_rimg(bytes(payload))
                h, w = (img.shape[0] // 2) * 2, (img.shape[1] // 2) * 2
                small = img[:h, :w].reshape(h // 2, 2, w // 2, 2).min(axis=(1, 3))
                header = imagecodec.MAGIC + np.array(
                    small.shape, dtype="<u4").tobytes()
                out_payloads.append(header + small.tobytes())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": out_payloads})

    return media_df.mapInPandas(rz, schema="doc_id long, media binary")
