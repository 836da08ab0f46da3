"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (north-star extension, BASELINE.json).

Model: a `binary` payload column next to a metadata struct
(mime/width/height/duration). All Spark-side plumbing — schema,
partition-friendly layout, Arrow-batched mapInPandas feature extraction —
is real and tested. Codecs sit behind CAPABILITY PROBES (r6): decode
functions take a tri-state ``real`` flag — None auto-selects the real
codec when its library imports (PIL for images, soundfile for audio —
plus stdlib paths so real decode works even with no third-party codec
installed and is tested in this container: `wave` PCM16 for audio,
zlib+struct PNG (8-bit gray/RGB/RGBA, all five filters) for images), True
requires it (NotImplementedError naming the missing dependency),
False forces the deterministic fake (seeded from payload bytes, same
shape contract). Contract tests parameterize over both paths and
skip-mark the library-gated ones where the library is absent. Video
frame sampling remains a stub — no stdlib video demuxer exists.

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


def _pil():
    """Capability probe: PIL.Image if importable, else None. Probed per
    call (cheap — sys.modules hit after the first) so a worker env with
    PIL and a driver env without disagree per-process, correctly."""
    try:
        from PIL import Image  # type: ignore

        return Image
    except ImportError:
        return None


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# ceiling for the stdlib decoder (per-byte Python defilter loops for
# Average/Paeth) — thumbnail/icon scale; larger images need PIL
_STDLIB_PNG_MAX_PIXELS = 2_000_000


def _decode_png_stdlib(payload: bytes) -> np.ndarray | None:
    """PNG decode with only the stdlib (zlib + struct): returns the
    HxWx3 uint8 array, or None when the payload lacks the PNG magic
    (caller falls through). Scope mirrors the stdlib WAV path's
    "dominant interchange subset": 8-bit depth, color types 0
    (grayscale — replicated to RGB, matching PIL convert('RGB')),
    2 (truecolor) and 6 (truecolor+alpha — alpha dropped, matching
    PIL), non-interlaced; all five scanline filters (None/Sub/Up/
    Average/Paeth). 16-bit, palette and Adam7 raise
    NotImplementedError naming PIL — subset limits are a capability
    gap, never a silent wrong decode."""
    if payload[:8] != _PNG_MAGIC:
        return None
    import struct
    import zlib

    pos = 8
    ihdr = None
    idat: list[bytes] = []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        pos += 12 + length  # 4 length + 4 type + data + 4 crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color not in (0, 2, 6):
        raise NotImplementedError(
            f"stdlib PNG path supports 8-bit gray/RGB/RGBA "
            f"non-interlaced only (got depth={depth} color={color} "
            f"interlace={interlace}); install PIL for the full format"
        )
    if w * h > _STDLIB_PNG_MAX_PIXELS:
        # Average/Paeth defiltering is a per-byte PYTHON loop (the
        # left-recurrence defeats numpy); a 10MP photo would cost
        # minutes of executor CPU where PIL takes milliseconds. Bound
        # the stdlib path to thumbnail-scale images and declare larger
        # ones a capability gap — auto mode then falls back to the
        # deterministic fake instead of stalling the mapInPandas stage.
        raise NotImplementedError(
            f"stdlib PNG path is bounded to {_STDLIB_PNG_MAX_PIXELS} "
            f"pixels (got {w}x{h}); install PIL for large images"
        )
    ch = {0: 1, 2: 3, 6: 4}[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != (stride + 1) * h:
        raise ValueError("PNG scanline data size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(
            raw, np.uint8, stride, off + 1
        ).astype(np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub: recon = raw + left → prefix sum per lane
            cur = line.copy()
            for c in range(ch):
                cur[c::ch] = np.cumsum(line[c::ch]) % 256
        elif ftype == 2:  # Up
            cur = (line + prev) % 256
        elif ftype == 3:  # Average (left-recurrence: per-byte loop)
            cur = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                left = cur[i - ch] if i >= ch else 0
                cur[i] = (line[i] + (left + prev[i]) // 2) % 256
        elif ftype == 4:  # Paeth (left-recurrence: per-byte loop)
            cur = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (line[i] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        prev = cur
        out[y] = cur.astype(np.uint8)
    arr = out.reshape(h, w, ch)
    if ch == 1:
        return np.repeat(arr, 3, axis=2)
    return arr[:, :, :3]  # RGBA drops alpha (PIL convert('RGB') parity)


def decode_image(payload: bytes, real: bool | None = None) -> np.ndarray:
    """Decode one image payload to an HxWx3 uint8 array.

    ``real`` is a tri-state capability switch (same contract as
    decode_audio):
    - ``None`` (default): auto by CAPABILITY — PIL when importable,
      else the stdlib PNG path when the payload carries the PNG magic,
      else the deterministic fake.
    - ``True``: require a real codec — PIL if importable, else the
      stdlib PNG path for PNG payloads; raises NotImplementedError
      naming the missing dependency for anything else rather than
      silently faking. Once routed real, a decode failure RAISES
      (corrupt image = data error, not a capability gap).
    - ``False``: always the fake — deterministic in the payload bytes,
      honoring the same HxWx3 uint8 contract (tests pin both paths to
      the contract; the PIL path is skip-marked where PIL is absent).
    """
    img_mod = _pil()
    can_real = img_mod is not None or payload[:8] == _PNG_MAGIC
    auto = real is None
    if auto:
        real = can_real
    if real:
        if img_mod is not None:
            import io

            return np.asarray(
                img_mod.open(io.BytesIO(payload)).convert("RGB")
            )
        try:
            arr = _decode_png_stdlib(payload)
        except NotImplementedError:
            # the capability probe only sniffs the 8-byte magic, but the
            # stdlib decoder covers the 8-bit gray/RGB/RGBA subset — a
            # palette / 16-bit / interlaced PNG is a CAPABILITY gap, not
            # a data error. Auto mode promised "real when capable", so
            # fall back to the deterministic fake instead of failing the
            # executor task; explicit real=True still raises.
            if auto:
                arr = None
                real = False
            else:
                raise
        except Exception as e:
            raise ValueError(
                f"PNG payload failed decode ({e}) — corrupt image is a "
                "data error, not a capability gap; route it to a "
                "dead-letter path rather than decoding with real=False"
            ) from e
        if arr is not None:
            return arr
        if real:
            raise NotImplementedError(
                "real image decode for non-PNG formats requires "
                "PIL/opencv, not available here; pass real=False (or "
                "default None) for the deterministic fake decode"
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
                # a NULL payload must not fail the whole Arrow batch:
                # treat it as empty bytes (n_bytes 0, zero histogram)
                # — same contract as an empty payload
                b = np.frombuffer(
                    b"" if payload is None else payload, dtype=np.uint8
                )
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
    real: bool | None = False,
) -> DataFrame:
    """Decode → nearest-neighbor resize → summarize, as one Arrow-batched
    map stage. The resize itself is real numpy (index-gather — no codec
    needed). ``real`` passes through to decode_image per payload; the
    default pins the FAKE decode because the fixture payloads are md5
    bytes a real codec must not be asked to parse — callers with
    genuine image columns pass real=None (auto) or True. Output
    carries the resized shape and mean pixel so tests can pin the
    contract."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, means = [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                # NULL payload -> empty bytes: decode_image's empty
                # fallback (1x1 black) keeps the batch alive
                arr = decode_image(
                    b"" if payload is None else bytes(payload), real=real
                )
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


def _soundfile():
    """Capability probe: soundfile if importable, else None."""
    try:
        import soundfile  # type: ignore

        return soundfile
    except ImportError:
        return None


def _decode_wav_stdlib(payload: bytes) -> np.ndarray | None:
    """PCM WAV decode with only the stdlib `wave` module: returns the
    mono-averaged float32 waveform in [-1, 1], or None if the payload
    is not a RIFF/WAV container (caller falls through). 16-bit PCM —
    the dominant interchange format — is the supported depth; real
    deployments with flac/ogg/mp3 bring soundfile/ffmpeg."""
    if not payload[:4] == b"RIFF":
        return None
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        width = w.getsampwidth()
        if width != 2:
            raise NotImplementedError(
                f"stdlib WAV path supports 16-bit PCM only (got "
                f"{8 * width}-bit); install soundfile for other depths"
            )
        frames = np.frombuffer(
            w.readframes(w.getnframes()), dtype="<i2"
        ).astype(np.float32)
        ch = w.getnchannels()
        if ch > 1:
            frames = frames.reshape(-1, ch).mean(axis=1)
        return frames / 32768.0


def decode_audio(payload: bytes, real: bool | None = None) -> np.ndarray:
    """Decode one audio payload to a float32 waveform in [-1, 1].

    ``real`` tri-state, same contract as decode_image: ``None`` auto,
    ``True`` require real, ``False`` force the deterministic fake.
    Auto selects by CAPABILITY, not by decode success: soundfile
    importable, or the payload carrying the RIFF/WAV magic (the stdlib
    `wave` PCM16 path). Once a real-looking payload is routed real, a
    decode failure RAISES — a corrupt or unsupported-depth WAV is a
    data error, and silently substituting the byte-fake would feed
    garbage features downstream while looking healthy. Only payloads
    with no real capability at all (non-RIFF bytes, no soundfile) fall
    back to the fake in auto mode."""
    can_real = _soundfile() is not None or payload[:4] == b"RIFF"
    if real is None:
        real = can_real
    if real:
        sf = _soundfile()
        if sf is not None:
            import io

            wav, _rate = sf.read(io.BytesIO(payload), dtype="float32")
            if wav.ndim > 1:
                wav = wav.mean(axis=1)
            return wav.astype(np.float32)
        try:
            wav = _decode_wav_stdlib(payload)
        except NotImplementedError:
            raise
        except Exception as e:
            raise ValueError(
                f"RIFF payload failed WAV decode ({e}) — corrupt audio is "
                "a data error, not a capability gap; route it to a "
                "dead-letter path rather than decoding with real=False"
            ) from e
        if wav is not None:
            return wav
        raise NotImplementedError(
            "real audio decode for non-WAV formats requires "
            "soundfile/ffmpeg, not available here; pass real=False for "
            "the deterministic fake decode"
        )
    b = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    return (b - 127.5) / 127.5


def extract_audio_features(
    df: DataFrame, payload_col: str = "img", id_col: str = "doc_id",
    real: bool | None = False,
) -> DataFrame:
    """Waveform features (sample count, RMS, zero-crossing count) via the
    same Arrow-batched mapInPandas shape as the image path. ``real``
    passes through to decode_audio per payload; the default pins the
    FAKE decode because this extractor's fixture payloads are md5
    bytes, which a real codec must not be asked to parse — a caller
    with genuine audio columns passes real=None (auto) or True."""

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, rms, zc = [], [], [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                # NULL payload -> empty bytes (0 samples, rms 0) — a
                # null row must not fail the whole Arrow batch
                wav = decode_audio(
                    b"" if payload is None else bytes(payload), real=real
                )
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
