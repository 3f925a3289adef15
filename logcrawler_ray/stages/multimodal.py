"""Multimodal actor-pool stages: image resize/feature-extract (real),
video frame-sampling and audio feature stubs (plumbing real, codec faked).

The brief's contract: image/audio/video are opaque ``binary`` columns with
typed metadata; decode/resize/extract run as actor-pool ``map_batches``
stages. This container has no image/audio/video libraries beyond our own
codecs, so:

- ``ResizeStage`` is REAL: decode via the codec registry, area-mean resize
  (the same kernel as phash), re-encode as PNG.
- ``VideoFrameSample`` treats a "video" as our deterministic fake container
  ``FVID`` (header + K concatenated PNG frames) — the sampling logic,
  schema, batching and actor signature are real; the container is the
  stand-in. A real mp4 decoder would replace ``_iter_frames`` only.
- ``AudioFeatures`` computes real DSP (RMS energy, zero-crossing rate,
  8-band FFT energies via numpy) over PCM16 bytes — PCM needs no codec, so
  this one is fully real for raw audio; compressed formats would need a
  decoder at the marked point.

Mirrors the reference's video handling scope (09_input_videos.py lists and
types video files without decoding them) and its patch pipeline's
stateful-model pattern (ST2/ST3, patch_exporter/PatchExecutor.py:26-66).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from ..codecs import png, registry
from ..functions.phash import area_resize, grayscale

VIDEO_MAGIC = b"FVID"


# ---------------------------------------------------------------- images
class ResizeStage:
    """Resize images to (out_w, out_h) via area-mean pooling; output column
    ``resized`` holds PNG bytes (lossless, deterministic)."""

    def __init__(self, out_w: int = 64, out_h: int = 64):
        self.out_w = out_w
        self.out_h = out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        out = []
        ok = np.ones(len(blobs), dtype=bool)
        for i, blob in enumerate(blobs):
            try:
                rgb = registry.decode(fmts[i], blob, int(ws[i]), int(hs[i]))
                chans = [
                    area_resize(rgb[None, :, :, c].astype(np.float32),
                                self.out_h, self.out_w)[0]
                    for c in range(3)
                ]
                small = np.clip(np.round(np.stack(chans, axis=-1)), 0, 255).astype(np.uint8)
                out.append(png.encode(small))
            except Exception:
                ok[i] = False
                out.append(None)
            # real pixels decoded and re-encoded — nothing faked here
        t = batch.append_column("resized", pa.array(out, pa.binary()))
        return t.append_column("resize_ok", pa.array(ok))


class ImageFeatures:
    """Tiny feature vector per image: mean RGB + 4x4 luma grid (19 floats).
    The embedding-extraction slot of the pipeline (a real model would load
    in __init__ per actor, ST2 pattern)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for blob, fmt, w, h in zip(batch["bytes"].to_pylist(), batch["fmt"].to_pylist(),
                                   batch["w"].to_numpy(), batch["h"].to_numpy()):
            try:
                rgb = registry.decode(fmt, blob, int(w), int(h))
                mean_rgb = rgb.reshape(-1, 3).mean(axis=0)
                grid = area_resize(grayscale(rgb[None]), 4, 4)[0].reshape(-1)
                feats.append(np.concatenate([mean_rgb, grid]).astype(np.float32).tolist())
            except Exception:
                feats.append(None)
        return batch.append_column("features", pa.array(feats, pa.list_(pa.float32())))


# ---------------------------------------------------------------- video
def encode_fake_video(frames: list[np.ndarray]) -> bytes:
    """Deterministic stand-in container: FVID + u32 count + length-prefixed
    PNG frames. A real implementation would produce mp4; ONLY this encoder
    and _iter_frames are fake — everything around them is production shape."""
    out = bytearray(VIDEO_MAGIC + struct.pack("<I", len(frames)))
    for f in frames:
        blob = png.encode(f)
        out += struct.pack("<I", len(blob))
        out += blob
    return bytes(out)


def _iter_frames(data: bytes):
    if data[:4] != VIDEO_MAGIC:
        raise NotImplementedError(
            "real video containers need an mp4/mkv decoder (not in this "
            "container); only the FVID stand-in is supported")
    (n,) = struct.unpack_from("<I", data, 4)
    pos = 8
    for _ in range(n):
        (ln,) = struct.unpack_from("<I", data, pos)
        pos += 4
        img, _ = png.decode(data[pos : pos + ln])
        yield img
        pos += ln


class VideoFrameSample:
    """Sample every k-th frame of a video column -> exploded frame rows
    (video_id, frame_idx, bytes(png), w, h). flat_map-shaped: one input row
    yields many output rows."""

    def __init__(self, every_k: int = 2):
        self.every_k = every_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids, idxs, blobs, ws, hs = [], [], [], [], []
        for vid, data in zip(batch["video_id"].to_pylist(), batch["bytes"].to_pylist()):
            for i, frame in enumerate(_iter_frames(data)):
                if i % self.every_k:
                    continue
                vids.append(vid)
                idxs.append(i)
                blobs.append(png.encode(frame))
                hs.append(frame.shape[0])
                ws.append(frame.shape[1])
        return pa.table({
            "video_id": pa.array(vids, pa.string()),
            "frame_idx": pa.array(idxs, pa.int32()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
        })


# ---------------------------------------------------------------- audio
class AudioFeatures:
    """PCM16 mono bytes -> (rms, zero_crossing_rate, band_energies[8]).

    Real numpy DSP; compressed audio (mp3/ogg) would decode at the marked
    point with a codec library."""

    def __init__(self, sample_rate: int = 16000):
        self.sample_rate = sample_rate

    def __call__(self, batch: pa.Table) -> pa.Table:
        rms, zcr, bands = [], [], []
        for blob in batch["bytes"].to_pylist():
            # <- a compressed format would be decoded to PCM here
            x = np.frombuffer(blob, dtype="<i2").astype(np.float64) / 32768.0
            if len(x) == 0:
                rms.append(0.0)
                zcr.append(0.0)
                bands.append([0.0] * 8)
                continue
            rms.append(float(np.sqrt(np.mean(x * x))))
            zcr.append(float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))))
            spec = np.abs(np.fft.rfft(x)) ** 2
            edges = np.linspace(0, len(spec), 9, dtype=int)
            bands.append([float(spec[a:b].sum()) for a, b in zip(edges[:-1], edges[1:])])
        t = batch.append_column("rms", pa.array(rms))
        t = t.append_column("zcr", pa.array(zcr))
        return t.append_column("band_energy", pa.array(bands, pa.list_(pa.float64())))
