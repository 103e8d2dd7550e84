"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The Spark-side architecture is real and tested: binary columns travel as
``BinaryType``, feature extraction runs as Arrow-batched ``mapInPandas``
with an explicit output schema, and partitioning/batching is controlled by
the caller.

Decode is REAL for the formats a numpy-only container can parse —
binary netpbm (P6 RGB / P5 gray) and uncompressed 24-bit BI_RGB BMP —
implemented from the published format specs in pure numpy
(``decode_image``), plus a nearest-neighbor ``resize_nearest``. Formats
that genuinely need PIL/ffmpeg (JPEG/PNG/video frame-sampling) fall back to
``decode_stub``: strict mode raises, lenient mode emits deterministic fake
dimensions flagged ``decoded=False`` so fake features can never be mistaken
for real ones downstream.

At 100 TB: payload bytes stay in executors end-to-end (parquet binary ->
Arrow batch -> pandas bytes), nothing is collected; `maxRecordsPerBatch`
bounds batch memory; the extraction is embarrassingly parallel.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("decoded", T.BooleanType()),
    ]
)


def _pnm_tokens(payload: bytes, n: int) -> tuple[list[int], int]:
    """First n whitespace-separated numeric tokens after the magic, skipping
    '#' comments (netpbm spec); returns (tokens, offset past final token's
    single whitespace separator)."""
    toks: list[int] = []
    i = 2  # past magic
    while len(toks) < n:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if i < len(payload) and payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        toks.append(int(payload[i:j]))
        i = j
    return toks, i + 1  # exactly one whitespace byte after maxval


def decode_image(payload: bytes) -> np.ndarray:
    """Pure-numpy image decode -> array of shape (h, w, channels).

    Supports binary netpbm (P6 RGB, P5 gray, maxval<=255) and uncompressed
    24-bit BI_RGB BMP (bottom-up or top-down). Raises ValueError for
    anything else.
    """
    magic = payload[:2]
    if magic in (b"P6", b"P5"):
        (w, h, maxval), off = _pnm_tokens(payload, 3)
        if maxval > 255:
            raise ValueError("16-bit netpbm not supported")
        ch = 3 if magic == b"P6" else 1
        n = w * h * ch
        arr = np.frombuffer(payload, dtype=np.uint8, count=n, offset=off)
        return arr.reshape(h, w, ch)
    if magic == b"BM":
        pix_off = int.from_bytes(payload[10:14], "little")
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        bpp = int.from_bytes(payload[28:30], "little")
        comp = int.from_bytes(payload[30:34], "little")
        if bpp != 24 or comp != 0:
            raise ValueError(f"only 24-bit BI_RGB BMP supported (bpp={bpp}, comp={comp})")
        bottom_up = h > 0
        h = abs(h)
        stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=stride * h, offset=pix_off
        ).reshape(h, stride)[:, : w * 3]
        img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
        return img[::-1] if bottom_up else img
    raise ValueError(f"unsupported format (magic={magic!r})")


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure index arithmetic (no interpolation
    libraries): output pixel (y, x) samples input (y*h//out_h, x*w//out_w)."""
    h, w = img.shape[0], img.shape[1]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return img[ys][:, xs]


def decode_stub(payload: bytes, strict: bool = False) -> tuple[int, int]:
    """Fallback for formats needing PIL/ffmpeg (not in this container):
    strict raises; lenient returns deterministic fake (width, height)
    derived from the payload hash (stable, testable, flagged as fake)."""
    if strict:
        raise NotImplementedError("JPEG/PNG/video decode requires PIL/ffmpeg — not in this container")
    h = hashlib.sha256(payload).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240


def decode_features(payload: bytes, strict: bool = False) -> tuple[int, int, int, float, bool]:
    """(width, height, channels, mean_luma, decoded) — real decode when the
    format allows, declared fake otherwise."""
    try:
        img = decode_image(payload)
        return img.shape[1], img.shape[0], img.shape[2], float(img.mean()), True
    except ValueError:
        w, h = decode_stub(payload, strict=strict)
        return w, h, 0, float("nan"), False


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Treat a text column as an opaque binary payload (UTF-8 bytes) — the
    stand-in for real image/audio bytes in this container."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def extract_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas)."""
    id_name, payload_name = id_col, payload_col

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_name]
            feats = [decode_features(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_name].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int32"),
                    "sha256": payloads.map(lambda p: hashlib.sha256(bytes(p)).hexdigest()),
                    "width": pd.Series([f[0] for f in feats], dtype="int32"),
                    "height": pd.Series([f[1] for f in feats], dtype="int32"),
                    "channels": pd.Series([f[2] for f in feats], dtype="int32"),
                    "mean_luma": pd.Series([f[3] for f in feats], dtype="float64"),
                    "decoded": pd.Series([f[4] for f in feats], dtype="bool"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_extract, FEATURE_SCHEMA)
