"""Pure-numpy baseline JPEG codec (operators/jpeg.py): encoder->decoder
round-trips within quantization tolerance, solid colors bit-exact (a flat
block quantizes losslessly), restart markers, subsampling, and the
non-baseline rejection path — then the same payloads through the Spark
mapInPandas feature extractor with ``decoded=true``."""

from __future__ import annotations

import numpy as np
import pytest

from healthcare_rcm_etl_pipeline_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
)
from healthcare_rcm_etl_pipeline_spark.operators.multimodal import (
    decode_image,
    extract_features,
)


def _structured(h, w):
    """Deterministic mid-frequency content (harsher than natural images)."""
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 2 + xx) % 256, (yy + 3 * xx) % 256, (255 - yy - xx) % 256], -1
    ).astype(np.uint8)


def test_solid_color_roundtrip_bit_exact():
    img = np.full((16, 24, 3), [200, 64, 13], dtype=np.uint8)
    for sub in (False, True):
        out = decode_jpeg(encode_jpeg(img, quality=90, subsample=sub))
        np.testing.assert_array_equal(out, img)


def test_structured_roundtrip_within_quantization_error():
    img = _structured(48, 56)
    out = decode_jpeg(encode_jpeg(img, quality=92))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 3.0 and err.max() < 40


def test_grayscale_and_odd_dimensions():
    g = (np.arange(13 * 17, dtype=np.int64) * 7 % 256).astype(np.uint8).reshape(13, 17)
    out = decode_jpeg(encode_jpeg(g, quality=95))
    assert out.shape == (13, 17, 1)
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).mean() < 4.0
    img = _structured(11, 9)  # non-multiple-of-8 RGB
    out2 = decode_jpeg(encode_jpeg(img, quality=95))
    assert out2.shape == (11, 9, 3)


def test_restart_markers_do_not_change_pixels():
    img = _structured(48, 56)
    base = decode_jpeg(encode_jpeg(img, quality=90))
    rst = decode_jpeg(encode_jpeg(img, quality=90, restart_interval=3))
    np.testing.assert_array_equal(base, rst)
    rst420 = decode_jpeg(encode_jpeg(img, quality=90, subsample=True, restart_interval=2))
    assert rst420.shape == img.shape


def test_progressive_and_non_jpeg_rejected():
    img = _structured(16, 16)
    payload = encode_jpeg(img, quality=90)
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(payload.replace(b"\xff\xc0", b"\xff\xc2", 1))  # SOF2
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n" + b"\x00" * 50)


def test_decode_image_dispatches_jpeg():
    img = _structured(24, 32)
    out = decode_image(encode_jpeg(img, quality=92))
    assert out.shape == (24, 32, 3)
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 3.0


def test_jpeg_features_in_spark(spark):
    """The flagged-stub class shrinks: baseline JPEG payloads come back
    ``decoded=true`` with REAL dimensions/luma through mapInPandas; a
    progressive payload stays on the honest ``decoded=false`` path."""
    img = _structured(24, 32)
    jpg = encode_jpeg(img, quality=92)
    jpg420 = encode_jpeg(img, quality=85, subsample=True)
    progressive = jpg.replace(b"\xff\xc0", b"\xff\xc2", 1)
    rows = [(1, bytearray(jpg)), (2, bytearray(jpg420)), (3, bytearray(progressive))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in extract_features(df).collect()}
    for i in (1, 2):
        assert got[i]["decoded"]
        assert (got[i]["width"], got[i]["height"], got[i]["channels"]) == (32, 24, 3)
        assert got[i]["mean_luma"] == pytest.approx(float(img.mean()), abs=3.0)
    assert not got[3]["decoded"] and got[3]["channels"] == 0
