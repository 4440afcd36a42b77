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


def probe_image(payload: bytes) -> tuple[str, int, int] | None:
    """REAL container-header probe (no codec library needed): returns
    (format, width, height) for PNG / GIF / JPEG / BMP payloads, None
    for anything else. Pixel decode stays stubbed; dimension/type
    extraction is what a metadata pass at 100 TB actually needs."""
    if payload is None or len(payload) < 12:
        return None
    b = bytes(payload[:64]) if len(payload) >= 64 else bytes(payload)
    # PNG: 8-byte magic, IHDR width/height big-endian at offsets 16/20
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        p = bytes(payload[16:24])
        return ("png", int.from_bytes(p[0:4], "big"), int.from_bytes(p[4:8], "big"))
    # GIF87a/89a: logical screen size little-endian at offsets 6/8
    if b[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        p = bytes(payload[6:10])
        return ("gif", int.from_bytes(p[0:2], "little"), int.from_bytes(p[2:4], "little"))
    # BMP: 'BM', width/height little-endian int32 at offsets 18/22
    if b[:2] == b"BM" and len(payload) >= 26:
        p = bytes(payload[18:26])
        return ("bmp", int.from_bytes(p[0:4], "little"), abs(int.from_bytes(p[4:8], "little", signed=True)))
    # JPEG: scan markers for SOF0/1/2 (height/width big-endian in frame header)
    if b[:2] == b"\xff\xd8":
        data = bytes(payload)
        i = 2
        while i + 9 < len(data):
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            if marker in (0xC0, 0xC1, 0xC2):
                h = int.from_bytes(data[i + 5 : i + 7], "big")
                w = int.from_bytes(data[i + 7 : i + 9], "big")
                return ("jpeg", w, h)
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = int.from_bytes(data[i + 2 : i + 4], "big")
            i += 2 + max(2, seg_len)
        return None
    return None


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
        # REAL header probe overrides the deterministic fake for payloads
        # that are actual PNG/GIF/JPEG/BMP containers
        probes = payloads.map(lambda b: probe_image(b) if b is not None else None)
        hit = probes.notna().to_numpy()
        if hit.any():
            fmt = probes.map(lambda p: p[0] if p else None)
            out.loc[hit, "kind"] = "image"
            out.loc[hit, "width"] = probes.map(lambda p: p[1] if p else 0)[hit].to_numpy()
            out.loc[hit, "height"] = probes.map(lambda p: p[2] if p else 0)[hit].to_numpy()
            out.loc[hit, "n_frames"] = 1
            out["format"] = fmt.to_numpy()
        else:
            out["format"] = None
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
