"""Size-guarded broadcast sides for map-side joins (SURVEY.md §2.4 J3).

The broadcast-join pattern — ship a small side once via ``ray.put``, probe
it vectorized inside ``map_batches`` — is only safe when the small side is
actually small: a fact table shipped this way OOMs the driver at scale
(round-1 verdict "What's wrong #2"). Every helper here enforces a row cap
and raises :class:`BroadcastTooLarge` instead of silently degrading, so a
query that outgrows the broadcast side fails loudly and must move to the
hash-partitioned ``Dataset.join`` path (q35-style).

Probes are Arrow-vectorized (``pc.is_in`` / ``pc.index_in`` + ``take``),
never per-row Python loops.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# A broadcast side is read by EVERY map task; 5M keys (~40-200 MB as Arrow)
# is the upper bound where once-per-node object-store placement still beats
# a shuffle join. Past this, use Dataset.join.
DEFAULT_MAX_BROADCAST_ROWS = 5_000_000


class BroadcastTooLarge(RuntimeError):
    """The would-be broadcast side exceeds the row cap — use a shuffle join."""


def _guard(n: int, what: str, max_rows: int) -> None:
    if n > max_rows:
        raise BroadcastTooLarge(
            f"{what}: {n} rows > broadcast cap {max_rows}; "
            "use Dataset.join (hash-partitioned) instead")


def distinct_keys_ds(ds, col: str, num_buckets: int = 64):
    """Distributed distinct of one column: per-batch ``pc.unique``
    partials -> ONE coarse-bucket shuffle -> a C-level drop_duplicates
    per bucket. (A native ``groupby(col).count`` pays per-GROUP cost at
    distinct-key cardinality — the r3 CLAUDE.md lesson.)"""
    import pandas as pd

    from .dedup import _bucket_of

    def partial(t: pa.Table) -> pa.Table:
        u = pc.unique(t[col].combine_chunks())
        return pa.table({col: u, "__db": _bucket_of(u, num_buckets)})

    def merge(df: "pd.DataFrame") -> pa.Table:
        from .dedup import typed_from_pandas

        return typed_from_pandas(df[[col]].drop_duplicates())

    return (ds.select_columns([col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("__db").map_groups(merge, batch_format="pandas"))


def broadcast_key_set(ds, col: str, *, max_rows: int = DEFAULT_MAX_BROADCAST_ROWS):
    """Distinct keys of ``ds[col]`` as an ObjectRef[pa.Array] for semi/anti
    probes. The distinct runs distributed (:func:`distinct_keys_ds`); the
    driver-side collect is LIMIT-bounded to ``max_rows + 1`` BEFORE
    materializing, so an oversized side raises without the driver ever
    holding it (round-2 advice: the guard must fire before the OOM it
    prevents)."""
    import ray

    uniq = distinct_keys_ds(ds, col)
    df = uniq.limit(max_rows + 1).to_pandas()
    _guard(len(df), f"key set {col}", max_rows)
    return ray.put(pa.Array.from_pandas(df[col]))


def broadcast_map(ds, key_col: str, val_col: str, *,
                  max_rows: int = DEFAULT_MAX_BROADCAST_ROWS):
    """``key -> value`` lookup side as ObjectRef[(pa.Array, pa.Array)].
    The collect is LIMIT-bounded to ``max_rows + 1`` rows — the cap check
    happens before an unbounded side could land on the driver."""
    import ray

    df = (ds.select_columns([key_col, val_col])
          .limit(max_rows + 1).to_pandas())
    _guard(len(df), f"map {key_col}->{val_col}", max_rows)
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    return ray.put((tbl[key_col].combine_chunks(), tbl[val_col].combine_chunks()))


def broadcast_map_from_dict(mapping: dict, *,
                            max_rows: int = DEFAULT_MAX_BROADCAST_ROWS):
    """Driver-built dict as the same (keys, vals) Arrow pair."""
    import ray

    _guard(len(mapping), "dict map", max_rows)
    return ray.put((pa.array(list(mapping.keys())), pa.array(list(mapping.values()))))


def semi_mask(col, key_set: pa.Array) -> pa.Array:
    """Boolean membership mask (vectorized ``pc.is_in``)."""
    return pc.is_in(col, value_set=key_set)


def anti_mask(col, key_set: pa.Array) -> pa.Array:
    return pc.invert(pc.is_in(col, value_set=key_set))


def probe_values(col, keys: pa.Array, vals: pa.Array):
    """Vectorized lookup: value per probe key, null on miss
    (``pc.index_in`` + ``take``)."""
    return pc.take(vals, pc.index_in(col, value_set=keys))
