"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata; the
heavy per-item work (decode, resize, feature extraction, frame sampling)
runs as Arrow-batched ``mapInPandas`` stages so it parallelizes with the
scan and never touches the driver.

The actual codec step is **stubbed** (this environment has no
image/audio libraries): ``_decode_stub`` derives deterministic fake
metadata from the bytes. The Spark-side plumbing — schema, batch
iteration, partition behavior, UDF signatures — is real and tested;
swapping the stub for PIL/ffmpeg is a one-function change (see
``decode_image_meta``).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGE_META_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("format", StringType()),
])


def with_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Materialize an opaque binary payload column (here: utf8 bytes of
    the text — the testdata has no real media; in production this is the
    raw image/audio bytes read from the source)."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").cast(BinaryType()).alias("payload"),
    )


def _decode_stub(payload: bytes) -> tuple[int, int, int, str]:
    """STUB image decode — deterministic fake metadata from the bytes.

    Replace with e.g.::

        img = PIL.Image.open(io.BytesIO(payload))
        return img.width, img.height, len(img.getbands()), img.format

    (kept here so the mapInPandas plumbing is exercised end to end).
    """
    n = len(payload)
    return (n * 7) % 64 + 1, (n * 13) % 64 + 1, 3, "fake/raw"


def decode_image_meta(df: DataFrame, payload_col: str = "payload",
                      id_col: str = "doc_id") -> DataFrame:
    """binary payload → typed metadata rows via Arrow-batched
    mapInPandas (one Python roundtrip per batch, not per row)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [_decode_stub(b) for b in pdf[payload_col]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "n_bytes": pdf[payload_col].map(len).astype("int64"),
                "width": [m[0] for m in meta],
                "height": [m[1] for m in meta],
                "channels": [m[2] for m in meta],
                "format": [m[3] for m in meta],
            })

    return df.mapInPandas(decode, IMAGE_META_SCHEMA)
