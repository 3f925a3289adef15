"""Deterministic lossy stand-in for JPEG ("qjpeg").

No JPEG library exists in this container (no PIL/cv2/libjpeg), so rows with
``fmt == "jpeg"`` carry this deterministic quantized codec instead. The
*semantics* mirror the reference's JPEG path bit-for-bit in structure
(reference: 06_extract_images.py:232-267 ``image_from_proto_jpeg``):

1. the stored payload is an **inverted** image — the reference applies
   ``255 - arr`` to every decoded JPEG ("HACK: for some reason the decoded
   image is inverted", 06_extract_images.py:238-239); we store ``255 - x``
   and the decoder un-inverts;
2. after un-inversion the payload is a YUV422 buffer routed through the
   exact same yuv422 -> YCbCr -> RGB path as raw images
   (06_extract_images.py:243-267).

Lossy step: YUV values are quantized to a step of 4 before inversion, which
keeps decode(encode(x)) within PSNR >= 40 dB of x (the FIXTURES.md lossy
oracle) while remaining fully deterministic.

Wire format: b"QJP1" + u16le w + u16le h + zlib(255 - quantized_yuv422).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from . import yuv422

MAGIC = b"QJP1"
_Q = 4  # quantization step on YUV bytes


def encode(rgb: np.ndarray) -> bytes:
    h, w, _ = rgb.shape
    yuv = np.frombuffer(yuv422.encode(rgb), dtype=np.uint8)
    quant = np.minimum((yuv.astype(np.uint16) + _Q // 2) // _Q * _Q, 255).astype(np.uint8)
    inverted = (255 - quant).astype(np.uint8)
    return MAGIC + struct.pack("<HH", w, h) + zlib.compress(inverted.tobytes(), 6)


def decode(data: bytes, w: int | None = None, h: int | None = None) -> np.ndarray:
    if data[:4] != MAGIC:
        raise ValueError("not a qjpeg payload")
    pw, ph = struct.unpack_from("<HH", data, 4)
    if w is not None and (pw != w or ph != h):
        raise ValueError(f"qjpeg dims {(pw, ph)} != expected {(w, h)}")
    inverted = np.frombuffer(zlib.decompress(data[8:]), dtype=np.uint8)
    # un-invert, then the reference's shared yuv422 path (06:243-267)
    yuv = (255 - inverted).astype(np.uint8)
    return yuv422.decode(yuv.tobytes(), pw, ph)


def decode_luma(data: bytes, w: int | None = None, h: int | None = None) -> np.ndarray:
    """Stats/phash fast path: un-invert, take the Y plane only."""
    if data[:4] != MAGIC:
        raise ValueError("not a qjpeg payload")
    pw, ph = struct.unpack_from("<HH", data, 4)
    if w is not None and (pw != w or ph != h):
        raise ValueError(f"qjpeg dims {(pw, ph)} != expected {(w, h)}")
    inverted = np.frombuffer(zlib.decompress(data[8:]), dtype=np.uint8)
    yuv = (255 - inverted).astype(np.uint8)
    return yuv422.decode_luma(yuv, pw, ph)
