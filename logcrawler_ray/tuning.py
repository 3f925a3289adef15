"""Memory-aware Ray Data context tuning for wide (image-payload) rows.

The reference's raw image rows are 614,404 bytes each (640x480x2 YUV422 +
4 B header, 02_combine_logs.py:24-27). Ray Data's default block/batch
targets assume narrow rows; with payload columns a block of default size
holds too many rows for a worker heap once a stage materializes pixels
(~3.7 MB RGB float per row in flight). These helpers compute and apply
sane targets so batch x concurrency fits the heap — call them from entry
points (CLI, bench), never at import time (library code must not mutate
global context as a side effect).
"""

from __future__ import annotations

RAW_IMAGE_ROW_BYTES = 614_404  # 02_combine_logs.py:24-27


def wide_row_targets(row_bytes: int = RAW_IMAGE_ROW_BYTES,
                     worker_heap_bytes: int = 2 << 30,
                     concurrency: int = 32,
                     inflight_factor: float = 6.0) -> dict:
    """Block/batch sizing for a payload of ``row_bytes`` per row.

    ``inflight_factor`` ~ bytes materialized per payload byte inside a
    decode stage (encoded + decoded RGB float + luma). Returns
    {target_max_block_size, batch_size} such that one batch per worker at
    full concurrency stays under the heap budget."""
    per_row_inflight = int(row_bytes * inflight_factor)
    batch_size = max(8, int(worker_heap_bytes // concurrency // per_row_inflight))
    target_block = max(1 << 20, batch_size * row_bytes)
    return {"target_max_block_size": target_block, "batch_size": batch_size}


def apply_wide_row_context(row_bytes: int = RAW_IMAGE_ROW_BYTES,
                           worker_heap_bytes: int = 2 << 30,
                           concurrency: int = 32) -> dict:
    """Apply :func:`wide_row_targets` to the current DataContext and return
    the chosen values (batch_size goes to the caller's map_batches)."""
    from ray.data import DataContext

    t = wide_row_targets(row_bytes, worker_heap_bytes, concurrency)
    DataContext.get_current().target_max_block_size = t["target_max_block_size"]
    return t
