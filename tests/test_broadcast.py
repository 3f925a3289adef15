"""Size-guarded broadcast helpers (stages/broadcast.py): vectorized probes
and the cap that keeps fact tables off the driver (round-1 What's-wrong #2)."""

import pandas as pd
import pyarrow as pa
import pytest
import ray

from logcrawler_ray.stages.broadcast import (
    BroadcastTooLarge,
    anti_mask,
    broadcast_key_set,
    broadcast_map,
    broadcast_map_from_dict,
    probe_values,
    semi_mask,
)


def test_probe_values_and_masks(ray_session):
    keys = pa.array([10, 20, 30])
    vals = pa.array(["a", "b", "c"])
    col = pa.chunked_array([[20, 99, 10]])
    got = probe_values(col, keys, vals)
    assert got.to_pylist() == ["b", None, "a"]
    assert semi_mask(col, keys).to_pylist() == [True, False, True]
    assert anti_mask(col, keys).to_pylist() == [False, True, False]


def test_broadcast_key_set_guard(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({"k": list(range(100)) * 2}))
    ref = broadcast_key_set(ds, "k", max_rows=100)
    assert len(ray.get(ref)) == 100  # distinct before the cap check
    with pytest.raises(BroadcastTooLarge):
        broadcast_key_set(ds, "k", max_rows=99)


def test_broadcast_map_guard(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({"k": range(50), "v": range(50)}))
    keys, vals = ray.get(broadcast_map(ds, "k", "v", max_rows=50))
    assert probe_values(pa.array([7]), keys, vals).to_pylist() == [7]
    with pytest.raises(BroadcastTooLarge):
        broadcast_map(ds, "k", "v", max_rows=10)
    with pytest.raises(BroadcastTooLarge):
        broadcast_map_from_dict({i: i for i in range(11)}, max_rows=10)
