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


BYTE_FEATURES_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("byte_sum", LongType()),
    StructField("entropy6", LongType()),
    StructField("sample_fp", StringType()),
])


def byte_features(df: DataFrame, payload_col: str = "payload",
                  id_col: str = "doc_id", stride: int = 16) -> DataFrame:
    """REAL (non-stub) per-item feature extraction over opaque binary
    payloads — the numeric-feature stage of a multimodal pipeline,
    runnable with zero media libraries:

    - ``byte_sum`` / ``n_bytes``: exact ints (mean byte value = their
      ratio, computed JVM-side by callers needing the double);
    - ``entropy6``: Shannon entropy of the byte histogram in 1e-6 bits,
      as an exact int64 sum of per-bin ``floor(-p·log2(p)·1e6 + 0.5)``
      contributions — aggregation-order-independent and replicable in
      SQL, the established float-sum determinism trick;
    - ``sample_fp``: md5 of every ``stride``-th byte (the frame-sampling
      access pattern: fixed-stride probes into the payload).

    Arrow-batched ``mapInPandas`` with numpy ``frombuffer``/``bincount``
    per item — one Python roundtrip per batch, vectorized inside, no
    driver involvement, parallel with the scan."""
    import hashlib

    import numpy as np

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes, byte_sum, ent6, fps = [], [], [], []
            for b in pdf[payload_col]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                n = int(arr.size)
                n_bytes.append(n)
                byte_sum.append(int(arr.sum(dtype=np.int64)))
                if n:
                    counts = np.bincount(arr, minlength=256)
                    p = counts[counts > 0].astype(np.float64) / n
                    # mirror the oracle bit-for-bit: (-p * log2(p)) * 1e6
                    # + 0.5, floored — identical op order and rounding
                    ent6.append(int(
                        np.floor((-p * np.log2(p)) * 1000000.0 + 0.5)
                        .astype(np.int64).sum()))
                else:
                    ent6.append(0)
                fps.append(hashlib.md5(arr[::stride].tobytes()).hexdigest())
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "n_bytes": pd.Series(n_bytes, dtype="int64"),
                "byte_sum": pd.Series(byte_sum, dtype="int64"),
                "entropy6": pd.Series(ent6, dtype="int64"),
                "sample_fp": fps,
            })

    return df.mapInPandas(feats, BYTE_FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("src_width", LongType()),
    StructField("src_height", LongType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("channels", LongType()),
    StructField("payload", BinaryType()),
])


def resize_image(df: DataFrame, payload_col: str = "payload",
                 id_col: str = "doc_id", *, width: int = 16,
                 height: int = 16) -> DataFrame:
    """Resize stage of an image pipeline: payload → fixed (w, h)
    thumbnail payload, via Arrow-batched ``mapInPandas``.

    The DECODE is the honest stub (:func:`_decode_stub` dims; a real
    deployment swaps in ``PIL.Image.open``), but the resample is REAL
    numpy: the payload bytes are viewed as the stub's (h, w, c) pixel
    array (truncated/padded) and nearest-neighbor-sampled to the target
    grid with integer strides — deterministic, so tests can pin exact
    output bytes. Output payload is always ``width·height·channels``
    bytes: the fixed-shape tensor a training loader wants.

    Plumbing this pins: binary→binary mapInPandas (Arrow binary columns
    both ways), per-batch vectorization, zero driver involvement."""
    import numpy as np

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sw, sh, chans, out = [], [], [], []
            for b in pdf[payload_col]:
                raw = np.frombuffer(bytes(b), dtype=np.uint8)
                w0, h0, c, _ = _decode_stub(bytes(b))
                need = w0 * h0 * c
                px = np.resize(raw, need).reshape(h0, w0, c)
                yi = (np.arange(height) * h0) // height
                xi = (np.arange(width) * w0) // width
                thumb = px[yi][:, xi, :]
                sw.append(w0)
                sh.append(h0)
                # the DECODED channel count, not a constant: a real
                # decoder returning c=1/c=4 must keep payload length ==
                # width*height*channels true
                chans.append(c)
                out.append(thumb.tobytes())
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "src_width": pd.Series(sw, dtype="int64"),
                "src_height": pd.Series(sh, dtype="int64"),
                "width": pd.Series([width] * len(out), dtype="int64"),
                "height": pd.Series([height] * len(out), dtype="int64"),
                "channels": pd.Series(chans, dtype="int64"),
                "payload": out,
            })

    return df.mapInPandas(rs, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_index", LongType()),
    StructField("n_frames", LongType()),
    StructField("frame_payload", BinaryType()),
])


def sample_frames(df: DataFrame, payload_col: str = "payload",
                  id_col: str = "doc_id", *, frame_bytes: int = 256,
                  n_samples: int = 4) -> DataFrame:
    """Frame-sampling stage of a video pipeline: one input payload →
    ``n_samples`` frame rows, uniformly strided across the stream — the
    1→N fan-out shape (mapInPandas may yield MORE rows than it
    consumes, which is exactly how a video decoder parallelizes on
    Spark: fan out frames in the scan stage, process them as rows).

    The "container parse" is deterministic plumbing (fixed
    ``frame_bytes`` chunks play the role of decoded frames; a real
    deployment swaps in PyAV/ffmpeg iteration), the striding and
    slicing are real. Short payloads yield fewer frames (never empty
    for non-empty payloads): with ``take = min(n_samples, n_frames)``
    samples emitted, sample k is chunk ``floor(k·n_frames/take)`` —
    always ``take`` DISTINCT frames, uniformly strided."""

    def fs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, totals, frames = [], [], [], []
            for doc_id, b in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(b)
                n_frames = max(1, len(raw) // frame_bytes) if raw else 0
                take = min(n_samples, n_frames)
                for k in range(take):
                    fi = (k * n_frames) // take  # take >= 1 in the loop
                    ids.append(int(doc_id))
                    idxs.append(fi)
                    totals.append(n_frames)
                    frames.append(
                        raw[fi * frame_bytes:(fi + 1) * frame_bytes])
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_index": pd.Series(idxs, dtype="int64"),
                "n_frames": pd.Series(totals, dtype="int64"),
                "frame_payload": frames,
            })

    return df.mapInPandas(fs, FRAME_SCHEMA)
