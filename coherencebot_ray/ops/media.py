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
    # WebP: RIFF container, 'WEBP' fourcc; VP8X canvas size is 24-bit
    # little-endian minus one at offsets 24/27; VP8L packs 14-bit dims
    # after the 0x2F signature byte; lossy VP8 has dims at +26/+28
    if b[:4] == b"RIFF" and len(payload) >= 30 and bytes(payload[8:12]) == b"WEBP":
        data = bytes(payload[:40])
        fourcc = data[12:16]
        if fourcc == b"VP8X":
            w = int.from_bytes(data[24:27], "little") + 1
            h = int.from_bytes(data[27:30], "little") + 1
            return ("webp", w, h)
        if fourcc == b"VP8L" and data[20] == 0x2F:
            bits = int.from_bytes(data[21:25], "little")
            return ("webp", (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1)
        if fourcc == b"VP8 " and len(data) >= 30:
            return (
                "webp",
                int.from_bytes(data[26:28], "little") & 0x3FFF,
                int.from_bytes(data[28:30], "little") & 0x3FFF,
            )
        return ("webp", 0, 0)
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


_MP3_RATES = {0: 44100, 1: 48000, 2: 32000}  # MPEG-1 sample-rate index


def probe_audio(payload: bytes) -> tuple[str, int, int] | None:
    """REAL audio container probe: returns (format, sample_rate,
    channels) for WAV and MP3 payloads, None otherwise. Like
    probe_image, this is header byte parsing only — sample decode stays
    stubbed."""
    if payload is None or len(payload) < 12:
        return None
    b = bytes(payload[: min(len(payload), 4096)])
    # WAV: RIFF/WAVE; walk chunks to the 'fmt ' chunk (channels at +2
    # LE16, sample rate at +4 LE32 within the chunk body)
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        i = 12
        while i + 8 <= len(b):
            cid = b[i : i + 4]
            clen = int.from_bytes(b[i + 4 : i + 8], "little")
            if cid == b"fmt " and i + 16 <= len(b):
                ch = int.from_bytes(b[i + 10 : i + 12], "little")
                sr = int.from_bytes(b[i + 12 : i + 16], "little")
                return ("wav", sr, ch)
            i += 8 + clen + (clen & 1)
        return ("wav", 0, 0)
    # MP3: ID3v2 tag or bare MPEG-1 Layer III frame sync
    start = 0
    if b[:3] == b"ID3" and len(b) >= 10:
        # syncsafe 28-bit tag length at offsets 6-9
        taglen = (
            ((b[6] & 0x7F) << 21) | ((b[7] & 0x7F) << 14) | ((b[8] & 0x7F) << 7) | (b[9] & 0x7F)
        )
        start = 10 + taglen
        if start + 4 > len(b):
            return ("mp3", 0, 0)
    h = b[start : start + 4]
    if len(h) == 4 and h[0] == 0xFF and (h[1] & 0xE0) == 0xE0:
        version = (h[1] >> 3) & 0x3  # 3 = MPEG-1
        sr_idx = (h[2] >> 2) & 0x3
        sr = _MP3_RATES.get(sr_idx, 0) if version == 3 else 0
        channels = 1 if ((h[3] >> 6) & 0x3) == 3 else 2
        return ("mp3", sr, channels)
    if b[:3] == b"ID3":
        return ("mp3", 0, 0)
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
        # REAL header probes override the deterministic fake for payloads
        # that are actual containers: PNG/GIF/JPEG/BMP/WebP images,
        # WAV/MP3 audio
        probes = payloads.map(lambda b: probe_image(b) if b is not None else None)
        hit = probes.notna().to_numpy()
        out["format"] = probes.map(lambda p: p[0] if p else None).to_numpy() if hit.any() else None
        if hit.any():
            out.loc[hit, "kind"] = "image"
            out.loc[hit, "width"] = probes.map(lambda p: p[1] if p else 0)[hit].to_numpy()
            out.loc[hit, "height"] = probes.map(lambda p: p[2] if p else 0)[hit].to_numpy()
            out.loc[hit, "n_frames"] = 1
        aprobes = payloads.map(lambda b: probe_audio(b) if b is not None else None)
        ahit = aprobes.notna().to_numpy() & ~hit
        out["sample_rate"] = np.int64(0)
        out["channels"] = np.int64(0)
        if ahit.any():
            if out["format"] is None or "format" not in out.columns:
                out["format"] = None
            out.loc[ahit, "kind"] = "audio"
            out.loc[ahit, "format"] = aprobes.map(lambda p: p[0] if p else None)[ahit].to_numpy()
            out.loc[ahit, "sample_rate"] = aprobes.map(lambda p: p[1] if p else 0)[ahit].to_numpy()
            out.loc[ahit, "channels"] = aprobes.map(lambda p: p[2] if p else 0)[ahit].to_numpy()
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


class ImageResizeStage:
    """Actor-pool resize stage: binary image column -> (doc_id, width,
    height, resized payload) at a bounded target size, aspect-ratio
    preserved.

    The Ray-side plumbing is REAL — callable class for
    ``map_batches(ImageResizeStage(max_w, max_h), concurrency=N)``,
    per-actor setup in ``__init__``, source dimensions from the REAL
    header probes — while the pixel resample is a deterministic stand-in
    (md5-seeded bytes tagged with the target dims; no codec libraries in
    this environment, ``use_real_decoder=True`` raises
    ``DecodeUnavailable`` where a real decoder would be called).
    """

    def __init__(self, max_w: int = 256, max_h: int = 256,
                 media_col: str = "media", use_real_decoder: bool = False):
        self.max_w, self.max_h = int(max_w), int(max_h)
        self.media_col = media_col
        self.use_real_decoder = use_real_decoder
        # a real decoder/resampler (PIL/opencv) would be loaded HERE,
        # once per actor

    def target_dims(self, w: int, h: int) -> tuple[int, int]:
        """Fit (w, h) into (max_w, max_h), preserving aspect; never
        upscale."""
        if w <= 0 or h <= 0:
            return 0, 0
        scale = min(self.max_w / w, self.max_h / h, 1.0)
        return max(1, int(w * scale)), max(1, int(h * scale))

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        if self.use_real_decoder:
            real_decode(b"")  # raises DecodeUnavailable
        out = {"doc_id": [], "src_width": [], "src_height": [],
               "width": [], "height": [], "resized": []}
        for doc_id, payload in zip(df["doc_id"], df[self.media_col]):
            probe = probe_image(bytes(payload)) if payload is not None else None
            if probe is None:
                continue  # not a decodable image: dropped, like a real
                # decoder failure path
            _, w, h = probe
            tw, th = self.target_dims(w, h)
            seed = hashlib.md5(bytes(payload)).digest()
            fake_raster = (b"RAW0" + tw.to_bytes(4, "big") + th.to_bytes(4, "big")
                           + (seed * ((tw * th) // len(seed) + 1))[: tw * th])
            out["doc_id"].append(doc_id)
            out["src_width"].append(w)
            out["src_height"].append(h)
            out["width"].append(tw)
            out["height"].append(th)
            out["resized"].append(fake_raster)
        return pd.DataFrame(out) if out["doc_id"] else pd.DataFrame(
            {"doc_id": pd.Series(dtype="object"),
             "src_width": pd.Series(dtype="int64"),
             "src_height": pd.Series(dtype="int64"),
             "width": pd.Series(dtype="int64"),
             "height": pd.Series(dtype="int64"),
             "resized": pd.Series(dtype="object")}
        )
