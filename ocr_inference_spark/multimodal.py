"""Multimodal media columns: images, audio, video as opaque binary +
typed metadata, processed by Arrow-batched ``mapInPandas`` kernels.

Images are fully real (imgcodec + page kernel). Audio decode and video
frame extraction have no codec libraries in this container, so their
decode steps are STUBBED:

- ``decode_audio`` raises ``NotImplementedError`` for real formats and
  accepts only the engine's own deterministic RAWA container (header +
  int16 PCM) — produced by ``encode_audio_fake`` for tests/fixtures;
- ``sample_video_frames`` likewise accepts only the RAWV container of
  concatenated PNG frames.

Everything Spark-side — schemas, partitioning, UDF signatures, Arrow
batch shapes — is real and tested; a production deployment swaps the
two decode functions for soundfile/pyav calls with identical
signatures.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .imgcodec import png_decode, png_encode

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

AUDIO_FEATURES_SCHEMA = (
    "media_ref string, n_samples long, sample_rate int, duration_s double,"
    " rms double, peak double, zero_crossings long, status string"
)

VIDEO_FRAMES_SCHEMA = (
    "media_ref string, frame_idx int, width int, height int,"
    " mean_luma double, frame_png binary, status string"
)

_RAWA_MAGIC = b"RAWA"
_RAWV_MAGIC = b"RAWV"


# ------------------------------------------------------------------ audio


def encode_audio_fake(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Deterministic test container: RAWA | rate | n | int16 PCM."""
    pcm = np.clip(samples, -1.0, 1.0)
    pcm16 = np.rint(pcm * 32767).astype("<i2")
    return _RAWA_MAGIC + struct.pack("<II", sample_rate, pcm16.size) + pcm16.tobytes()


def decode_audio(content: bytes) -> tuple[np.ndarray, int]:
    """-> (float64 samples, sample_rate). Real codecs are stubbed."""
    if content[:4] != _RAWA_MAGIC:
        raise NotImplementedError(
            "audio codecs (mp3/ogg/flac/wav) are not available in this "
            "container; only the RAWA fixture container decodes here"
        )
    rate, n = struct.unpack("<II", content[4:12])
    pcm = np.frombuffer(content[12 : 12 + 2 * n], dtype="<i2")
    return pcm.astype(np.float64) / 32767.0, rate


def audio_features(media_df: DataFrame) -> DataFrame:
    """Audio binary column -> per-clip acoustic features (vectorized
    mapInPandas; one Arrow batch = one decode+feature pass)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "media_ref", "n_samples", "sample_rate", "duration_s",
                "rms", "peak", "zero_crossings", "status",
            )}
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                try:
                    x, rate = decode_audio(bytes(content))
                    out["media_ref"].append(ref)
                    out["n_samples"].append(len(x))
                    out["sample_rate"].append(rate)
                    out["duration_s"].append(len(x) / rate if rate else 0.0)
                    out["rms"].append(float(np.sqrt(np.mean(x**2))) if len(x) else 0.0)
                    out["peak"].append(float(np.abs(x).max()) if len(x) else 0.0)
                    out["zero_crossings"].append(
                        int(np.count_nonzero(np.diff(np.signbit(x))))
                    )
                    out["status"].append("success")
                except NotImplementedError:
                    out["media_ref"].append(ref)
                    for k in ("n_samples", "sample_rate", "zero_crossings"):
                        out[k].append(0)
                    for k in ("duration_s", "rms", "peak"):
                        out[k].append(0.0)
                    out["status"].append("unsupported_codec")
            yield pd.DataFrame(out)

    return (
        media_df.where(F.col("modality") == "audio")
        .select("media_ref", "content")
        .mapInPandas(kernel, schema=AUDIO_FEATURES_SCHEMA)
    )


# ------------------------------------------------------------------ video


def encode_video_fake(frames: list[np.ndarray]) -> bytes:
    """RAWV | n_frames | (len | png)*  — concatenated PNG frames."""
    blobs = [png_encode(f) for f in frames]
    out = [_RAWV_MAGIC, struct.pack("<I", len(blobs))]
    for b in blobs:
        out.append(struct.pack("<I", len(b)))
        out.append(b)
    return b"".join(out)


def iter_video_frames(content: bytes):
    if content[:4] != _RAWV_MAGIC:
        raise NotImplementedError(
            "video codecs (h264/vp9/av1) are not available in this "
            "container; only the RAWV fixture container decodes here"
        )
    (n,) = struct.unpack("<I", content[4:8])
    pos = 8
    for _ in range(n):
        (ln,) = struct.unpack("<I", content[pos : pos + 4])
        pos += 4
        yield png_decode(content[pos : pos + ln])
        pos += ln


def sample_video_frames(media_df: DataFrame, every_nth: int = 2) -> DataFrame:
    """Video binary column -> sampled frames with per-frame stats
    (frame-sample as a mapInPandas kernel; frames re-encoded as PNG so
    downstream image operators — including the OCR page kernel — apply
    unchanged)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "media_ref", "frame_idx", "width", "height",
                "mean_luma", "frame_png", "status",
            )}
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                try:
                    for i, frame in enumerate(iter_video_frames(bytes(content))):
                        if i % every_nth:
                            continue
                        out["media_ref"].append(ref)
                        out["frame_idx"].append(i)
                        out["height"].append(int(frame.shape[0]))
                        out["width"].append(int(frame.shape[1]))
                        out["mean_luma"].append(float(frame.mean()))
                        out["frame_png"].append(png_encode(frame))
                        out["status"].append("success")
                except NotImplementedError:
                    out["media_ref"].append(ref)
                    out["frame_idx"].append(-1)
                    out["height"].append(0)
                    out["width"].append(0)
                    out["mean_luma"].append(0.0)
                    out["frame_png"].append(b"")
                    out["status"].append("unsupported_codec")
            yield pd.DataFrame(out)

    return (
        media_df.where(F.col("modality") == "video")
        .select("media_ref", "content")
        .repartition("media_ref")
        .mapInPandas(kernel, schema=VIDEO_FRAMES_SCHEMA)
    )
