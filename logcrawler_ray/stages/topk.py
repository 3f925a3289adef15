"""Distributed exact top-k per group, and the stratified sampler built on it.

Two-phase shape (the partial-aggregation rule applied to ORDER BY ... LIMIT):

1. per-BATCH prune inside ``map_batches``: every block keeps at most ``k``
   rows per group it sees, so the shuffle carries O(k x groups_per_block)
   rows per block instead of the full table;
2. ONE co-group shuffle (int group keys bucket coarse via ``& (buckets-1)``
   — per-group ``map_groups`` costs ~1-2 ms per group, CLAUDE.md — other
   key types group per key) and the same prune runs once more per group,
   now globally exact.

The prune is a stable mergesort + C-level ``groupby().cumcount()`` — ties
are broken by the caller-supplied ``tiebreak_cols`` so results are a
deterministic set, independent of block layout.

``stratified_sample_hash`` reuses the operator with a multiplicative-hash
order column: "keep the k hash-smallest rows per stratum" IS top-k per
group, and the hash makes the sample deterministic, uniform within each
stratum, and expressible in ANSI SQL for the oracle (q60).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# Knuth's multiplicative constant: spreads sequential ids uniformly over
# [0, 2^32). Kept as plain SQL-expressible arithmetic ((id * A) % 2^32) so
# the DuckDB oracle can reproduce the exact sample.
HASH_MULT = 2654435761
HASH_MOD = 1 << 32


def _prune_df(df: pd.DataFrame, group_col: str, sort_cols: list[str],
              ascending: list[bool], k: int) -> pd.DataFrame:
    df = df.sort_values(sort_cols, ascending=ascending, kind="mergesort")
    # dropna=False: a NULL group key is a real partition under SQL
    # ROW_NUMBER() semantics — dropping it here would silently delete
    # those rows from the result (ADVICE r3).
    return df[df.groupby(group_col, sort=False, dropna=False).cumcount() < k]


def topk_per_group(ds, *, group_col: str, order_col: str, k: int,
                   descending: bool = True,
                   tiebreak_cols: tuple[str, ...] = (), buckets: int = 64):
    """Exact top-k rows per group; returns a Dataset with the input columns.

    Deterministic iff ``(order_col, *tiebreak_cols)`` is a total order
    within each group (pass the primary key as the last tiebreak).
    """
    sort_cols = [group_col, order_col, *tiebreak_cols]
    ascending = [True, not descending] + [True] * len(tiebreak_cols)
    in_names = list(ds.schema().names)

    def prune_batch(t: pa.Table) -> pa.Table:
        out = _prune_df(t.to_pandas(), group_col, sort_cols, ascending, k)
        return pa.Table.from_pandas(out, preserve_index=False)

    pruned = ds.map_batches(prune_batch, batch_format="pyarrow")

    # _bucket_of is null-safe (null keys land in ONE bucket) and works for
    # any key type, so every key type gets the coarse-bucket path — the
    # per-group map_groups cost (~1-2 ms/group, CLAUDE.md) never applies.
    from .dedup import _bucket_of

    def bucketize(t: pa.Table) -> pa.Table:
        return t.append_column("__g", _bucket_of(t[group_col], buckets))

    def finalize(df: pd.DataFrame) -> pa.Table:
        out = _prune_df(df[in_names], group_col, sort_cols, ascending, k)
        return pa.Table.from_pandas(out, preserve_index=False)

    return (pruned.map_batches(bucketize, batch_format="pyarrow")
            .groupby("__g").map_groups(finalize, batch_format="pandas"))


def stratified_sample_hash(ds, *, stratum_col: str, id_col: str, k: int,
                           buckets: int = 64):
    """Deterministic uniform sample of up to ``k`` rows per stratum.

    Order = ``(id * HASH_MULT) % 2^32`` ascending (ties -> smaller id):
    a rate-free stratified sampler — every stratum contributes
    ``min(k, |stratum|)`` rows, stable under repartitioning and resume.
    """
    def add_hash(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = (ids * np.int64(HASH_MULT)) % np.int64(HASH_MOD)
        return t.append_column("__h", pa.array(h, pa.int64()))

    out = topk_per_group(
        ds.map_batches(add_hash, batch_format="pyarrow"),
        group_col=stratum_col, order_col="__h", k=k, descending=False,
        tiebreak_cols=(id_col,), buckets=buckets)
    return out.drop_columns(["__h"])
