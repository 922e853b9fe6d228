"""Multimodal binary-column plumbing: audio features and video frame
sampling via mapInPandas, with stubbed codecs failing soft."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from ocr_inference_spark.multimodal import (
    MEDIA_SCHEMA,
    audio_features,
    decode_audio,
    encode_audio_fake,
    encode_video_fake,
    sample_video_frames,
)
from ocr_inference_spark.render import render_page


def test_audio_roundtrip_unit():
    t = np.arange(16000) / 16000.0
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    back, rate = decode_audio(encode_audio_fake(x, 16000))
    assert rate == 16000
    assert np.allclose(back, x, atol=1e-4)


def test_real_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04mp3-ish bytes")


@pytest.fixture(scope="module")
def media_df(spark):
    t = np.arange(8000) / 8000.0
    clip = 0.25 * np.sin(2 * np.pi * 220 * t)
    frames = [render_page([f"frame {i}"]) for i in range(4)]
    rows = [
        Row(media_ref="a1", modality="audio",
            content=encode_audio_fake(clip, 8000), mime="audio/x-raw", meta={}),
        Row(media_ref="a2", modality="audio",
            content=b"OggS fake", mime="audio/ogg", meta={}),
        Row(media_ref="v1", modality="video",
            content=encode_video_fake(frames), mime="video/x-raw", meta={}),
    ]
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def test_audio_features_df(media_df):
    rows = {r["media_ref"]: r for r in audio_features(media_df).collect()}
    ok = rows["a1"]
    assert ok["status"] == "success"
    assert ok["n_samples"] == 8000 and ok["sample_rate"] == 8000
    assert abs(ok["duration_s"] - 1.0) < 1e-9
    assert 0.15 < ok["rms"] < 0.2  # sine rms = amp/sqrt(2) ~ 0.177
    assert rows["a2"]["status"] == "unsupported_codec"


def test_video_frame_sampling(media_df):
    frames = sample_video_frames(media_df, every_nth=2).collect()
    idx = sorted(r["frame_idx"] for r in frames)
    assert idx == [0, 2]
    for r in frames:
        assert r["status"] == "success"
        assert r["width"] > 0 and r["height"] > 0
        assert len(r["frame_png"]) > 0


def test_video_frames_feed_ocr(media_df, spark):
    """Sampled frames are PNG — the OCR page kernel applies unchanged."""
    from ocr_inference_spark.model import RecognitionSession, serialize_weights
    from ocr_inference_spark.page import process_page

    sess = RecognitionSession(serialize_weights())
    frame = sample_video_frames(media_df, every_nth=4).collect()[0]
    res = process_page(bytes(frame["frame_png"]), sess)
    assert res.status == "success"
    assert res.texts == ["frame 0"]
