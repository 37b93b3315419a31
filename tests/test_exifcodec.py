"""EXIF codec: writer/parser round trip, the eight orientation
transforms, corrupt-payload containment, and decode_image's
auto-normalization (formats/exifcodec.py)."""

import numpy as np
import pytest

from resume_ocr_spark.formats import exifcodec as ec
from resume_ocr_spark.formats import imagecodec, jpegenc

IMG = (np.arange(48 * 64, dtype=np.uint16).reshape(48, 64) % 251).astype(
    np.uint8)


def _tagged(**kw) -> bytes:
    return ec.splice_app1(jpegenc.encode_jpeg(IMG), ec.build_app1(**kw))


class TestRoundTrip:
    @pytest.mark.parametrize("bo", ["II", "MM"])
    def test_all_fields_both_byte_orders(self, bo):
        j = _tagged(orientation=6, make="CamX", model="M-1000",
                    datetime="2026:01:02 03:04:05",
                    datetime_original="2026:01:01 00:00:09",
                    pixel_x=64, pixel_y=48, gps=True, byte_order=bo)
        assert ec.parse_exif(j) == {
            "orientation": 6, "make": "CamX", "model": "M-1000",
            "datetime": "2026:01:02 03:04:05",
            "datetime_original": "2026:01:01 00:00:09",
            "pixel_x": 64, "pixel_y": 48, "has_gps": True}

    def test_sparse_fields_stay_none(self, ):
        info = ec.parse_exif(_tagged(orientation=3))
        assert info["orientation"] == 3
        assert info["make"] is None and info["datetime_original"] is None
        assert info["has_gps"] is False

    def test_no_app1_is_none_not_error(self):
        assert ec.parse_exif(jpegenc.encode_jpeg(IMG)) is None

    def test_long_ascii_goes_through_offset_area(self):
        make = "A" * 40  # > 4 bytes: value lives in the data area
        info = ec.parse_exif(_tagged(make=make, orientation=1))
        assert info["make"] == make


class TestOrientation:
    def test_inverse_property_all_eight(self):
        a = np.arange(6, dtype=np.uint8).reshape(2, 3)
        for o in range(1, 9):
            stored = ec.apply_orientation(a, ec.INVERSE[o])
            assert np.array_equal(ec.apply_orientation(stored, o), a), o

    def test_hand_computed_placements(self):
        a = np.array([[0, 1, 2], [3, 4, 5]], dtype=np.uint8)
        assert np.array_equal(ec.apply_orientation(a, 2),
                              [[2, 1, 0], [5, 4, 3]])        # mirror
        assert np.array_equal(ec.apply_orientation(a, 3),
                              [[5, 4, 3], [2, 1, 0]])        # rot180
        assert np.array_equal(ec.apply_orientation(a, 6),
                              [[3, 0], [4, 1], [5, 2]])      # 90 CW
        assert np.array_equal(ec.apply_orientation(a, 8),
                              [[2, 5], [1, 4], [0, 3]])      # 90 CCW

    def test_out_of_range_is_identity(self):
        a = np.arange(4, dtype=np.uint8).reshape(2, 2)
        for o in (0, 9, -1):
            assert ec.apply_orientation(a, o) is a

    def test_3d_channel_axis_untouched(self):
        a = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
        out = ec.apply_orientation(a, 6)
        assert out.shape == (4, 2, 3)
        assert np.array_equal(out[0, 0], a[1, 0])


class TestCorruptContainment:
    """Every malformation is a named ExifError (or a clean None /
    default), never a struct.error / IndexError leak."""

    def _raises(self, app1: bytes):
        j = ec.splice_app1(jpegenc.encode_jpeg(IMG), app1)
        with pytest.raises(ec.ExifError):
            ec.parse_exif(j)
        assert ec.orientation_of(j) == 1  # hot path swallows it

    def test_truncated_tiff_header(self):
        self._raises(b"\xff\xe1\x00\x0cExif\x00\x00II*\x00")

    def test_bad_byte_order(self):
        self._raises(b"\xff\xe1\x00\x10Exif\x00\x00XX\x2a\x00"
                     b"\x08\x00\x00\x00")

    def test_bad_magic(self):
        self._raises(b"\xff\xe1\x00\x10Exif\x00\x00II\x2b\x00"
                     b"\x08\x00\x00\x00")

    def test_ifd_offset_past_end(self):
        self._raises(b"\xff\xe1\x00\x10Exif\x00\x00II\x2a\x00"
                     b"\xff\xff\x00\x00")

    def test_entry_count_budget(self):
        # count=0xffff with no entries: over _MAX_ENTRIES → named error
        self._raises(b"\xff\xe1\x00\x12Exif\x00\x00II\x2a\x00"
                     b"\x08\x00\x00\x00\xff\xff")

    def test_value_offset_past_end(self):
        # one ASCII entry, count 64, offset far beyond the block
        body = (b"II\x2a\x00\x08\x00\x00\x00" + b"\x01\x00"
                + b"\x0f\x01\x02\x00\x40\x00\x00\x00\xff\xff\x00\x00"
                + b"\x00\x00\x00\x00")
        seg = b"\xff\xe1" + (len(body) + 8).to_bytes(2, "big") \
            + b"Exif\x00\x00" + body
        self._raises(seg)

    def test_desynced_segment_walk_is_none(self):
        # garbage between segments: the walk gives up quietly
        assert ec.parse_exif(b"\xff\xd8\x00\x00\x00\x00") is None

    def test_orientation_of_never_raises_on_mutations(self):
        rng = np.random.default_rng(7)
        base = bytearray(_tagged(orientation=6, make="Cam", gps=True))
        for _ in range(300):
            mut = bytearray(base)
            for i in rng.integers(2, len(mut), size=3):
                mut[i] = int(rng.integers(0, 256))
            o = ec.orientation_of(bytes(mut))
            assert isinstance(o, int) and 1 <= o <= 8


class TestDecodeImageNormalization:
    def test_stored_rotation_is_undone(self):
        # store the grid pre-rotated by INVERSE[o]; decode_image must
        # return exactly apply_orientation(stored_decode, o) — and for
        # the transpose family that means the upright (H, W) shape
        for o in (3, 6, 8):
            stored = ec.apply_orientation(IMG, ec.INVERSE[o])
            j = ec.splice_app1(jpegenc.encode_jpeg(stored),
                               ec.build_app1(orientation=o))
            raw = imagecodec.decode_image(jpegenc.encode_jpeg(stored))
            assert np.array_equal(imagecodec.decode_image(j),
                                  ec.apply_orientation(raw, o))
            assert imagecodec.decode_image(j).shape == IMG.shape

    def test_untagged_jpeg_unchanged(self):
        j = jpegenc.encode_jpeg(IMG)
        assert imagecodec.decode_image(j).shape == IMG.shape

    def test_corrupt_exif_still_decodes(self):
        j = ec.splice_app1(jpegenc.encode_jpeg(IMG),
                           b"\xff\xe1\x00\x0cExif\x00\x00II*\x00")
        assert imagecodec.decode_image(j).shape == IMG.shape
