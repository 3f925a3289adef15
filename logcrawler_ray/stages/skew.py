"""Skew handling: salted aggregation and host-hash repartitioning.

The reference handles no skew — one giant log stalls its whole sequential
run (SURVEY.md §4). At crawl scale the hot host is the canonical skewed
key (the synthetic web plants one holding ~30% of rows), so:

- ``salted_aggregate``: two-phase groupby for skewed keys. Phase 1 salts
  each row's key with ``hash(row) % n_salts`` and aggregates on
  (key, salt) — the hot key's rows now spread over n_salts reducers;
  phase 2 merges the n_salts partials per key. Works for any algebraic
  aggregate (sum/count/min/max) — exactly the mergeable-partial condition.

- ``repartition_by_key``: explicit hash co-location of a key's rows
  (bucket column + sort-free groupby repartition), used before stages
  that want per-host locality (politeness batching, per-host outputs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import hash64_str, splitmix64


def salted_aggregate(ds, key: str, agg_cols: dict[str, str], n_salts: int = 16):
    """Two-phase skew-safe aggregation.

    agg_cols: {column: "sum"|"count"|"min"|"max"}. Returns a Dataset with
    one row per key and the same output column names.
    """
    from ray.data.aggregate import Count, Max, Min, Sum

    def add_salt(t: pa.Table) -> pa.Table:
        # salt from the first row's key hash + row counter: uniform, cheap,
        # and DETERMINISTIC across runs (id(t) was not — round-1 hygiene)
        first = t[key][0].as_py() if t.num_rows else 0
        base = np.uint64(hash64_str(str(first)))
        salt = (splitmix64(np.arange(t.num_rows, dtype=np.uint64) + base)
                % np.uint64(n_salts)).astype(np.int32)
        return t.append_column("__salt", pa.array(salt))

    phase1_aggs = []
    for col, how in agg_cols.items():
        if how == "sum":
            phase1_aggs.append(Sum(col, alias_name=col))
        elif how == "count":
            phase1_aggs.append(Count(alias_name=col))
        elif how == "min":
            phase1_aggs.append(Min(col, alias_name=col))
        elif how == "max":
            phase1_aggs.append(Max(col, alias_name=col))
        else:
            raise ValueError(how)
    partial = ds.map_batches(add_salt, batch_format="pyarrow").groupby(
        [key, "__salt"]).aggregate(*phase1_aggs)

    phase2_aggs = []
    for col, how in agg_cols.items():
        if how in ("sum", "count"):
            phase2_aggs.append(Sum(col, alias_name=col))
        elif how == "min":
            phase2_aggs.append(Min(col, alias_name=col))
        else:
            phase2_aggs.append(Max(col, alias_name=col))
    return partial.groupby(key).aggregate(*phase2_aggs)


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
