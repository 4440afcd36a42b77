"""Multimodal column plumbing: opaque binary media + typed metadata.

Real decode libraries (PIL/ffmpeg/librosa) are NOT in this container, so
the decode kernels are deterministic stubs behind ``DecodeUnavailable``
guards — the Ray-side plumbing (binary schema, actor-pool stage, small
batch sizing for large payloads, output layout) is real and tested.

Stage shape: ``map_batches(MediaFeatureExtractor, batch_size=64,
concurrency=N)`` — small batches because each row may carry MBs of
bytes; the callable is a class so a real decoder would be loaded once
per actor in ``__init__``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


class DecodeUnavailable(NotImplementedError):
    pass


def real_decode(payload: bytes):  # pragma: no cover - stub by design
    """Placeholder for a true image/audio decode (PIL.Image.open etc.)."""
    raise DecodeUnavailable("no media codec libraries in this environment")


class MediaFeatureExtractor:
    """Actor-pool stage: binary media column -> typed feature columns.

    Deterministic fake decode (documented): features are pure functions
    of the payload bytes, so the oracle can mirror them in SQL on the
    payload length / first bytes.
    """

    def __init__(self, media_col: str = "media", use_real_decoder: bool = False):
        self.media_col = media_col
        self.use_real_decoder = use_real_decoder
        # real decoder would be constructed here, once per actor

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        payloads = df[self.media_col]
        if self.use_real_decoder:
            real_decode(b"")  # raises DecodeUnavailable
        n_bytes = payloads.map(lambda b: len(b) if b is not None else 0).to_numpy(dtype=np.int64)
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "n_bytes": n_bytes,
                "width": 64 + (n_bytes % 577),
                "height": 64 + (n_bytes % 417),
                "n_frames": 1 + (n_bytes % 24),
                "kind": np.where(n_bytes % 3 == 0, "video", np.where(n_bytes % 3 == 1, "image", "audio")),
            }
        )
        return out


class FrameSampler:
    """Frame-sampling stage: emits one row per sampled frame index
    (every ``stride``-th of n_frames) with a deterministic frame_ref."""

    def __init__(self, stride: int = 8):
        self.stride = stride

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        rows = {"doc_id": [], "frame_idx": [], "frame_ref": []}
        for doc_id, n_frames in zip(df["doc_id"], df["n_frames"]):
            for f in range(0, int(n_frames), self.stride):
                rows["doc_id"].append(doc_id)
                rows["frame_idx"].append(f)
                rows["frame_ref"].append(f"frame://{doc_id}/{f}")
        return pd.DataFrame(rows)


def media_features(docs_ds, media_col: str = "media", concurrency=None, batch_size: int = 64):
    kwargs = {"concurrency": concurrency} if concurrency else {}
    return docs_ds.map_batches(
        MediaFeatureExtractor(media_col), batch_format="pandas", batch_size=batch_size, **kwargs
    )
