"""Deterministic text-recognition "network" + executor-side session cache.

Plays the role of the reference's per-line ONNX CTC recognizer
(BDRC/inference.py:279-429): ``forward`` maps a binarized line image to
per-timestep vocab logits (one timestep per pixel column); CTC decoding
(kernels/ctc.py) turns the logit matrix into text. The "weights" are the
glyph templates (glyphs.py) serialized to bytes, shipped to executors
via ``SparkContext.broadcast`` exactly as real ONNX weight bytes would
be, and materialized into a process-global session once per executor —
mirroring the reference's single ``ort.InferenceSession`` per process
(BDRC/inference.py:128-130,294) so executors stay warm across
mapInPandas batches.
"""

from __future__ import annotations

import io

import numpy as np

from .glyphs import GLYPH_H, GLYPH_TOP, TEMPLATES, VOCAB_SIZE


def serialize_weights(templates: np.ndarray = TEMPLATES) -> bytes:
    """Weights -> bytes (what a real deployment would read from the model
    registry; here: the .npy wire format)."""
    buf = io.BytesIO()
    np.save(buf, templates.astype(np.uint8))
    return buf.getvalue()


def deserialize_weights(blob: bytes) -> np.ndarray:
    return np.load(io.BytesIO(blob))


class RecognitionSession:
    """The 'InferenceSession': holds weights, exposes batched forward."""

    def __init__(self, weight_blob: bytes):
        self.templates = deserialize_weights(weight_blob).astype(np.int16)
        if self.templates.shape != (VOCAB_SIZE, GLYPH_H):
            raise ValueError(f"bad weight shape {self.templates.shape}")
        self._template_pop = self.templates.sum(axis=1)  # (V,)

    def features(self, line_img: np.ndarray) -> np.ndarray:
        """Line ink {0,1} (H,W) -> per-column glyph features (W, GLYPH_H).

        Each column is anchored at its first ink row (the strut rule of
        the band), making the features invariant to residual sub-band
        vertical offsets left by deskew/dewarp resampling.
        """
        h, w = line_img.shape
        if h == 0 or w == 0:
            return np.zeros((0, GLYPH_H), dtype=np.int16)
        any_ink = line_img.any(axis=0)
        first = np.where(any_ink, line_img.argmax(axis=0), 0)
        rows = first[None, :] + GLYPH_TOP + np.arange(GLYPH_H)[:, None]  # (GH, W)
        valid = rows < h
        rows_c = np.minimum(rows, h - 1)
        feats = line_img[rows_c, np.arange(w)[None, :]].astype(np.int16)
        feats = np.where(valid, feats, 0)
        feats = np.where(any_ink[None, :], feats, 0)
        return feats.T  # (W, GLYPH_H)

    def forward(self, line_img: np.ndarray) -> np.ndarray:
        """Line ink -> logits (T=W, V): char score = -2*hamming(col,
        template); blank score = -2*popcount(col). A column matching a
        template wins; an (almost-)empty column yields blank."""
        feats = self.features(line_img)  # (W, GH) in {0,1}
        xor = feats[:, None, :] != self.templates[None, :, :]  # (W, V, GH)
        d = xor.sum(axis=2).astype(np.float32)  # hamming to every vocab entry
        d[:, 0] = feats.sum(axis=1)  # blank: distance to the empty column
        return -2.0 * d

    def forward_batch(self, line_imgs: list[np.ndarray]) -> list[np.ndarray]:
        """Batched call — pads lines to a common width and runs one
        vectorized pass (the reference runs per line; we batch, cf.
        SURVEY.md I31)."""
        if not line_imgs:
            return []
        feats = [self.features(img) for img in line_imgs]
        widths = [f.shape[0] for f in feats]
        w_max = max(widths) if widths else 0
        stacked = np.zeros((len(feats), w_max, GLYPH_H), dtype=np.int16)
        for i, f in enumerate(feats):
            stacked[i, : f.shape[0]] = f
        xor = stacked[:, :, None, :] != self.templates[None, None, :, :]
        d = xor.sum(axis=3).astype(np.float32)  # (N, W, V)
        d[:, :, 0] = stacked.sum(axis=2)
        logits = -2.0 * d
        return [logits[i, : widths[i]] for i in range(len(feats))]


_SESSION_CACHE: dict[int, RecognitionSession] = {}


def get_session(weight_blob: bytes) -> RecognitionSession:
    """Executor-global session keyed by weight identity — constructed once
    per Python worker process and reused across Arrow batches."""
    key = hash(weight_blob)
    sess = _SESSION_CACHE.get(key)
    if sess is None:
        sess = RecognitionSession(weight_blob)
        _SESSION_CACHE[key] = sess
    return sess
