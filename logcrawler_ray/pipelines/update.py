"""Second-pass update pipelines over the ImageStore — the reference's
bulk_update scripts re-expressed as partition rewrites.

``update_image_stats`` mirrors 13_calculate_image_stats.py:61-124: list
rows lacking stats, fetch their payloads (here: already co-located in the
store partition), compute grayscale/brightness/blurredness/resolution, and
upsert — ``bulk_update`` every 100 rows becomes one atomic
``merge_insert`` per partition. Resume is free: rows that already carry
stats are skipped on rerun, like the reference's is_done count checks.
"""

from __future__ import annotations

import pyarrow as pa

from ..sources.store import ImageStore
from ..stages.decode import DecodeStats


def update_image_stats(store: ImageStore, pid: str, *, batch_size: int = 128,
                       force: bool = False) -> int:
    """Compute/refresh stats columns for one partition; returns rows updated.

    Streams the partition through the same DecodeStats stage the ingest
    path uses (single implementation of M5/M6/M11), then merge_inserts the
    stat columns keyed by image_id.
    """
    table = store.read_table(pid)
    have_stats = "brightness" in table.column_names
    if have_stats and not force:
        mask = pa.compute.is_null(table["brightness"])
        todo = table.filter(mask)
    else:
        todo = table
    if todo.num_rows == 0:
        return 0

    stage = DecodeStats(keep_bytes=True)
    updated = []
    for start in range(0, todo.num_rows, batch_size):
        chunk = todo.slice(start, batch_size)
        base_cols = [c for c in ("image_id", "bytes", "w", "h", "fmt") if c in
                     chunk.column_names]
        out = stage(chunk.select(base_cols))
        updated.append(out)
    new = pa.concat_tables(updated)

    # align to the partition's schema: keep original non-stat columns
    carry = [c for c in table.column_names if c not in new.column_names]
    if carry:
        idx = {iid: i for i, iid in enumerate(table["image_id"].to_pylist())}
        rows = [idx[i] for i in new["image_id"].to_pylist()]
        for c in carry:
            new = new.append_column(c, table[c].take(pa.array(rows)))
    if have_stats:
        new = new.select(table.column_names)
        store.merge_insert(pid, new, key="image_id")
    else:
        # schema widened: rewrite the partition with stats attached
        untouched = table.filter(
            pa.compute.invert(pa.compute.is_in(
                table["image_id"], value_set=new["image_id"].combine_chunks())))
        if untouched.num_rows:
            stage2 = DecodeStats(keep_bytes=True)
            extra = stage2(untouched.select([c for c in ("image_id", "bytes", "w", "h",
                                                         "fmt")]))
            new = pa.concat_tables([new, extra.select(new.column_names)])
        store.append_table(pid, new, meta=store.manifest(pid).get("meta"))
    return new.num_rows
