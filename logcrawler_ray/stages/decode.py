"""Decode + stats + phash — the flagship per-image compute stage.

One ``map_batches`` callable class (actor pool) replaces the reference's
producer/consumer thread pool (reference: 06_extract_images.py:296-366 —
``ThreadPoolExecutor(2*cpu)`` popping batches of 50 from an unbounded
queue) and its separate stats pass (13_calculate_image_stats.py:61-124):
decode YUV422/JPEG/PNG (M5/M6), grayscale + brightness + blurredness (M11)
and the 64-bit phash (O7) in one pass over zero-copy Arrow batches.

Vectorization strategy: the per-row codec call is unavoidable (variable-size
binary payloads), but everything after decode is batched — rows are grouped
by (h, w) inside the batch and stacked into (N, h, w[, 3]) ndarrays so the
phash DCT and the Laplacian run as single numpy ops per size group.

Rows that fail to decode go to an error channel (``decode_ok = False``)
instead of killing the run — the reference ``quit()``s on the first bad row
(07_input_cognition_data_rust.py:104-106, 12_input_images.py:59); at 100 TB
a poison row must not stop the stream.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..codecs import registry
from ..functions.image_stats import blurredness_batch, brightness_batch
from ..functions.phash import grayscale, phash_from_gray
from ..functions.hashing import to_int64


class DecodeStats:
    """Actor-pool stage: ``ds.map_batches(DecodeStats, concurrency=N, batch_size=B,
    batch_format="pyarrow")``.

    Parameters are plain data so the class pickles cheaply; codec lookup
    happens once per actor in ``__init__`` (never per batch).
    """

    def __init__(self, keep_bytes: bool = True, keep_pixels: bool = False):
        self.keep_bytes = keep_bytes
        self.keep_pixels = keep_pixels
        self.decode = registry.decode  # bind once per actor
        self.decode_gray = registry.decode_gray

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        fmts = batch["fmt"].to_pylist()
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        blobs = batch["bytes"].to_pylist()

        # luma path only — Y-plane formats never materialize RGB here
        # (full RGB is decoded only when keep_pixels is requested)
        lumas: list[np.ndarray | None] = [None] * n
        decoded: list[np.ndarray | None] = [None] * n
        ok = np.ones(n, dtype=bool)
        for i in range(n):
            try:
                lumas[i] = self.decode_gray(fmts[i], blobs[i], int(ws[i]), int(hs[i]))
                if self.keep_pixels:
                    decoded[i] = self.decode(fmts[i], blobs[i], int(ws[i]), int(hs[i]))
            except Exception:
                ok[i] = False

        phash = np.zeros(n, dtype=np.uint64)
        bright = np.zeros(n, dtype=np.float64)
        blur = np.zeros(n, dtype=np.float64)

        good = np.nonzero(ok)[0]
        if len(good):
            sizes = hs[good].astype(np.int64) * (1 << 32) + ws[good]
            for s in np.unique(sizes):
                rows = good[sizes == s]
                gray = np.stack([lumas[i] for i in rows])
                phash[rows] = phash_from_gray(gray)
                bright[rows] = brightness_batch(gray)
                blur[rows] = blurredness_batch(gray)

        cols = {name: batch[name] for name in batch.column_names}
        if not self.keep_bytes:
            cols.pop("bytes", None)
        cols["phash"] = pa.array(to_int64(phash), type=pa.int64())
        cols["brightness"] = pa.array(bright)
        cols["blurredness"] = pa.array(blur)
        cols["resolution"] = pa.array(
            [f"{int(w)}x{int(h)}" for w, h in zip(ws, hs)], type=pa.string()
        )
        cols["decode_ok"] = pa.array(ok)
        if self.keep_pixels:
            cols["pixels"] = pa.array(
                [d.tobytes() if d is not None else None for d in decoded], type=pa.binary()
            )
        return pa.table(cols)
