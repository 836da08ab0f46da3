"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (north-star extension, BASELINE.json).

Model: a `binary` payload column next to a metadata struct
(mime/width/height/duration). All Spark-side plumbing — schema,
partition-friendly layout, Arrow-batched mapInPandas feature extraction —
is real and tested. The actual codec step is STUBBED: the image/audio
libraries are not in this container, so `decode_image` with
`real=True` raises NotImplementedError, and the default path produces a
deterministic fake decode (seeded from the payload bytes) with the same
shape contract a real decoder would satisfy. Swapping in PIL/ffmpeg
changes one function body, not the pipeline.

At 100 TB: payloads dominate storage — keep them in their own parquet
column (or external object store with a path column) so metadata-only
queries never read the bytes; feature extraction is a pure map stage
(mapInPandas) that parallelizes per file-split.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("mean_byte", DoubleType()),
        StructField("histogram", ArrayType(IntegerType())),
    ]
)


def attach_fake_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic stand-in payload: md5(text) bytes as the 'image',
    with a typed metadata struct (what a real ingest would carry)."""
    payload = F.unhex(F.md5(F.encode(F.col(text_col), "UTF-8")))
    meta = F.struct(
        F.lit("image/fake").alias("mime"),
        (F.length(payload) * 2).cast("int").alias("width"),
        F.length(payload).cast("int").alias("height"),
    )
    return df.withColumn("img", payload).withColumn("img_meta", meta)


def decode_image(payload: bytes, real: bool = False) -> np.ndarray:
    """Decode one image payload to an HxWx3 uint8 array.

    real=True is the seam for an actual codec (PIL/opencv — not in this
    container). The fake path is deterministic in the payload bytes and
    honors the shape contract.
    """
    if real:
        raise NotImplementedError(
            "real image decode requires PIL/opencv, not available here; "
            "deterministic fake decode is the supported path"
        )
    b = np.frombuffer(payload, dtype=np.uint8)
    if len(b) == 0:
        # deterministic fallback for empty payloads (mirrors the
        # empty-payload handling in extract_image_features): one black
        # pixel rather than an IndexError that fails the whole stage
        return np.zeros((1, 1, 3), dtype=np.uint8)
    h, w = max(int(b[0]) % 8, 1) + 1, max(int(b[-1]) % 8, 1) + 1
    rng = np.random.default_rng(int(b.sum()))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def extract_image_features(
    df: DataFrame, payload_col: str = "img", id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads: byte count,
    mean byte value, 8-bin byte histogram. The mapInPandas shape is
    exactly what a real embed/resize stage uses (batch in, batch out,
    bounded memory per batch)."""

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nb, mb, hists = [], [], [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                b = np.frombuffer(payload, dtype=np.uint8)
                ids.append(i)
                nb.append(len(b))
                mb.append(float(b.mean()) if len(b) else 0.0)
                hists.append(
                    np.bincount(b >> 5, minlength=8).astype("int32").tolist()
                )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_bytes": nb,
                    "mean_byte": mb,
                    "histogram": hists,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        _features, schema=FEATURE_SCHEMA
    )


def sample_video_frames(
    df: DataFrame,
    payload_col: str = "video",
    every_n: int = 10,
) -> DataFrame:
    """Frame-sampling signature for video payloads — stub: the pipeline
    contract (binary in, array-of-binary frames out) without a codec."""
    raise NotImplementedError(
        "video frame sampling requires ffmpeg bindings, not available in "
        "this container; see extract_image_features for the mapInPandas "
        "pattern a real implementation plugs into"
    )


def binary_byte_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Native (non-UDF) byte stats over the fake payload — the
    oracle-checkable slice of the multimodal path: payload length and
    mean byte computed from the md5 hex pairs."""
    md5h = F.md5(F.encode(F.col(text_col), "UTF-8"))
    payload = F.unhex(md5h)
    byte_vals = F.transform(
        F.sequence(F.lit(1), F.lit(16)),
        lambda i: F.conv(md5h.substr(i * 2 - 1, F.lit(2)), 16, 10).cast("int"),
    )
    mean_b = F.aggregate(
        byte_vals, F.lit(0), lambda acc, x: acc + x
    ) / F.lit(16.0)
    return df.select(
        "doc_id",
        F.length(payload).cast("int").alias("n_bytes"),
        F.round(mean_b, 6).alias("mean_byte"),
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("out_h", IntegerType()),
        StructField("out_w", IntegerType()),
        StructField("mean_px", DoubleType()),
    ]
)


def resize_images(
    df: DataFrame,
    out_h: int = 4,
    out_w: int = 4,
    payload_col: str = "img",
    id_col: str = "doc_id",
) -> DataFrame:
    """Decode → nearest-neighbor resize → summarize, as one Arrow-batched
    map stage. The resize itself is real numpy (index-gather — no codec
    needed); only the decode behind it is the deterministic fake. Output
    carries the resized shape and mean pixel so tests can pin the
    contract."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, means = [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                arr = decode_image(bytes(payload))
                h, w = arr.shape[:2]
                ri = (np.arange(out_h) * h) // out_h
                ci = (np.arange(out_w) * w) // out_w
                small = arr[ri][:, ci]
                ids.append(i)
                means.append(float(small.mean()))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "out_h": [out_h] * len(ids),
                    "out_w": [out_w] * len(ids),
                    "mean_px": means,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_resize, schema=RESIZE_SCHEMA)


AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_samples", IntegerType()),
        StructField("rms", DoubleType()),
        StructField("zero_crossings", IntegerType()),
    ]
)


def decode_audio(payload: bytes, real: bool = False) -> np.ndarray:
    """Decode one audio payload to a float32 waveform in [-1, 1].

    real=True is the seam for an actual codec (soundfile/ffmpeg — not in
    this container); the fake path maps payload bytes deterministically
    onto a centered waveform with the same dtype/range contract."""
    if real:
        raise NotImplementedError(
            "real audio decode requires soundfile/ffmpeg, not available "
            "here; deterministic fake decode is the supported path"
        )
    b = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    return (b - 127.5) / 127.5


def extract_audio_features(
    df: DataFrame, payload_col: str = "img", id_col: str = "doc_id"
) -> DataFrame:
    """Waveform features (sample count, RMS, zero-crossing count) via the
    same Arrow-batched mapInPandas shape as the image path."""

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, rms, zc = [], [], [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                wav = decode_audio(bytes(payload))
                ids.append(i)
                ns.append(len(wav))
                rms.append(float(np.sqrt((wav**2).mean())) if len(wav) else 0.0)
                zc.append(int((np.diff(np.sign(wav)) != 0).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_samples": ns,
                    "rms": rms,
                    "zero_crossings": zc,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_features, schema=AUDIO_SCHEMA)
