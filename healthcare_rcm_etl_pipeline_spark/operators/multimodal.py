"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The Spark-side architecture is real and tested: binary columns travel as
``BinaryType``, feature extraction runs as Arrow-batched ``mapInPandas``
with an explicit output schema, and partitioning/batching is controlled by
the caller. The actual media decode (image/audio/video) is STUBBED — the
decode libraries are not in this container — behind ``decode_stub``, which
either raises NotImplementedError (strict) or produces deterministic fake
features (for tests/benchmarks).

At 100 TB: payload bytes stay in executors end-to-end (parquet binary ->
Arrow batch -> pandas bytes), nothing is collected; `maxRecordsPerBatch`
bounds batch memory; the extraction is embarrassingly parallel.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

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
    ]
)


def decode_stub(payload: bytes, strict: bool = False) -> tuple[int, int]:
    """STUB for media decode — returns deterministic fake (width, height).

    Real deployments plug PIL/ffmpeg here; the container has neither, so the
    fake derives dimensions from the payload hash (stable, testable).
    """
    if strict:
        raise NotImplementedError("media decode requires PIL/ffmpeg — not in this container")
    h = hashlib.sha256(payload).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240


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
            dims = [decode_stub(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_name].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int32"),
                    "sha256": payloads.map(lambda p: hashlib.sha256(bytes(p)).hexdigest()),
                    "width": pd.Series([d[0] for d in dims], dtype="int32"),
                    "height": pd.Series([d[1] for d in dims], dtype="int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_extract, FEATURE_SCHEMA)
