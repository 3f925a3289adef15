"""Skew handling: salted aggregation and host-hash repartitioning.

The reference handles no skew — one giant log stalls its whole sequential
run (SURVEY.md §4). At crawl scale the hot host is the canonical skewed
key (the synthetic web plants one holding ~30% of rows), so:

- ``salted_aggregate``: two-phase groupby for skewed keys. Phase 1 is a
  map-side combiner (each batch reduces to one partial row per key it
  sees) — the hot key's volume collapses BEFORE any shuffle, which
  subsumes explicit salting for algebraic aggregates
  (sum/count/min/max — exactly the mergeable-partial condition); phase 2
  merges partials under one coarse-bucket shuffle.

- ``repartition_by_key``: explicit hash co-location of a key's rows
  (bucket column + sort-free groupby repartition), used before stages
  that want per-host locality (politeness batching, per-host outputs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def salted_aggregate(ds, key: str, agg_cols: dict[str, str],
                     n_salts: int = 16, num_buckets: int = 64):
    """Two-phase skew-safe aggregation.

    agg_cols: {column: "sum"|"count"|"min"|"max"}. Returns a Dataset with
    one row per key and the same output column names.

    Phase 1 is a map-side COMBINER: each batch reduces to one row per key
    it sees (C-level pandas groupby), so a hot key contributes O(blocks)
    partial rows instead of its full row count — for algebraic aggregates
    the combiner subsumes explicit key salting (``n_salts`` is kept for
    API compatibility; a salt bound only matters when phase 1 is itself a
    shuffle). Phase 2 merges the partials under ONE coarse-bucket shuffle
    — a native per-key ``groupby(key).aggregate`` pays per-GROUP cost
    (~17-150 us/distinct key, the r3 CLAUDE.md lesson), the wrong shape
    when key cardinality is the user/host population.
    """
    import pandas as pd

    from .dedup import _bucket_of, typed_from_pandas

    _PARTIAL = {"sum": "sum", "count": "size", "min": "min", "max": "max"}
    _MERGE = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for how in agg_cols.values():
        if how not in _PARTIAL:
            raise ValueError(how)

    needed = [key] + sorted({out for out, how in agg_cols.items()
                             if how != "count"})

    def partials(t: pa.Table) -> pa.Table:
        df = t.select(needed).to_pandas()
        spec = {out: ((key if how == "count" else out), _PARTIAL[how])
                for out, how in agg_cols.items()}
        g = df.groupby(key, as_index=False, sort=False,
                       dropna=False).agg(**spec)
        for out, how in agg_cols.items():
            if how == "count":
                g[out] = g[out].astype(np.int64)
        tab = typed_from_pandas(g)
        return tab.append_column("__kb", _bucket_of(tab[key], num_buckets))

    def merge(df: pd.DataFrame) -> pa.Table:
        spec = {out: (out, _MERGE[how]) for out, how in agg_cols.items()}
        g = df.groupby(key, as_index=False, sort=False,
                       dropna=False).agg(**spec)
        return typed_from_pandas(g[[key, *agg_cols]])

    return (ds.map_batches(partials, batch_format="pyarrow")
            .groupby("__kb").map_groups(merge, batch_format="pandas"))


def repartition_by_key(ds, key_hash_col: str, n_buckets: int):
    """Co-locate rows by hash bucket: add bucket column, then one shuffle.

    All rows of a bucket land in the same output partition group, so a
    downstream ``map_batches`` sees hosts co-located (the §7.4 partition
    discipline); the salt trick above is for when ONE key exceeds a
    partition."""

    def bucketize(t: pa.Table) -> pa.Table:
        hh = t[key_hash_col].to_numpy(zero_copy_only=False).view(np.uint64)
        return t.append_column(
            "__bucket", pa.array((hh % np.uint64(n_buckets)).astype(np.int32)))

    return (ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(lambda df: pa.Table.from_pandas(
                df.drop(columns="__bucket"), preserve_index=False),
                batch_format="pandas"))
