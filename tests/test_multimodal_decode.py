"""REAL image decode through the multimodal mapInPandas path: synthetic
PPM/PGM/BMP payloads built byte-by-byte from the format specs, decoded with
the pure-numpy decoder inside Spark, features asserted exactly."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from healthcare_rcm_etl_pipeline_spark.operators.multimodal import (
    decode_image,
    extract_features,
    resize_nearest,
)


def make_ppm(w: int, h: int) -> tuple[bytes, np.ndarray]:
    img = (np.arange(w * h * 3, dtype=np.int64) * 7 % 256).astype(np.uint8).reshape(h, w, 3)
    return b"P6\n# comment\n%d %d\n255\n" % (w, h) + img.tobytes(), img


def make_pgm(w: int, h: int) -> tuple[bytes, np.ndarray]:
    img = (np.arange(w * h, dtype=np.int64) * 13 % 256).astype(np.uint8).reshape(h, w, 1)
    return b"P5\n%d %d\n255\n" % (w, h) + img.tobytes(), img


def make_bmp(w: int, h: int) -> tuple[bytes, np.ndarray]:
    """Uncompressed 24-bit BI_RGB, bottom-up, rows padded to 4 bytes."""
    img = (np.arange(w * h * 3, dtype=np.int64) * 11 % 256).astype(np.uint8).reshape(h, w, 3)
    stride = (w * 3 + 3) & ~3
    rows = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = img[y, :, ::-1].tobytes()  # RGB -> BGR
        rows += row + b"\x00" * (stride - len(row))
    pix_off = 54
    header = struct.pack(
        "<2sIHHI", b"BM", pix_off + len(rows), 0, 0, pix_off
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    return bytes(header) + bytes(rows), img


@pytest.mark.parametrize("maker,ch", [(make_ppm, 3), (make_pgm, 1), (make_bmp, 3)])
def test_decode_image_roundtrip(maker, ch):
    payload, img = maker(13, 7)  # odd width exercises BMP row padding
    out = decode_image(payload)
    assert out.shape == (7, 13, ch)
    np.testing.assert_array_equal(out, img)


def test_resize_nearest_exact():
    _, img = make_ppm(8, 8)
    small = resize_nearest(img, 4, 2)
    assert small.shape == (2, 4, 3)
    np.testing.assert_array_equal(small, img[[0, 4]][:, [0, 2, 4, 6]])


def test_extract_features_real_decode_in_spark(spark):
    ppm, ppm_img = make_ppm(13, 7)
    bmp, bmp_img = make_bmp(5, 4)
    rows = [(1, bytearray(ppm)), (2, bytearray(bmp)), (3, bytearray(b"not an image"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in extract_features(df).collect()}

    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (13, 7, 3)
    assert got[1]["decoded"] and got[1]["mean_luma"] == pytest.approx(float(ppm_img.mean()))
    assert (got[2]["width"], got[2]["height"], got[2]["channels"]) == (5, 4, 3)
    assert got[2]["decoded"] and got[2]["mean_luma"] == pytest.approx(float(bmp_img.mean()))
    # non-image payload: declared fake — flagged, channels 0, null luma
    # (pandas NaN is the float64 NA sentinel, so Arrow lands it as null)
    assert not got[3]["decoded"] and got[3]["channels"] == 0
    assert got[3]["mean_luma"] is None
