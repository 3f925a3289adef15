"""MLPScorer (stages/model.py): the ST2 stateful-model actor-pool pattern
with real multi-MB per-actor weights — determinism, file/synth parity, and
the one-load-per-actor telemetry the round-3 verdict asked for."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from logcrawler_ray.stages.model import MLPScorer, make_weights, write_weights


def _emb_table(n: int, d: int = 19, seed: int = 4) -> pa.Table:
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, d)).astype(np.float32)
    return pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                     "features": pa.array([v.tolist() for v in m],
                                          pa.list_(pa.float32()))})


def test_scorer_deterministic_and_bounded():
    t = _emb_table(50)
    s1 = MLPScorer(d_in=19, hidden=1024)(t)["score"].to_numpy()
    s2 = MLPScorer(d_in=19, hidden=1024)(t)["score"].to_numpy()
    assert np.array_equal(s1, s2)
    assert ((s1 > 0) & (s1 < 1)).all()
    assert len(np.unique(s1)) > 40  # a real function of the input


def test_weight_file_matches_synth(tmp_path):
    path = write_weights(str(tmp_path / "w.npz"), d_in=19, hidden=2048)
    t = _emb_table(20)
    from_file = MLPScorer(d_in=19, hidden=2048, weights_path=path)(t)
    synth = MLPScorer(d_in=19, hidden=2048)(t)
    assert from_file["score"].equals(synth["score"])
    import os

    assert os.path.getsize(path) > 100_000  # a genuinely weighty blob
    with pytest.raises(ValueError, match="shape"):
        MLPScorer(d_in=19, hidden=4096, weights_path=path)


def test_null_vectors_get_null_scores():
    t = pa.table({"features": pa.array([[0.0] * 19, None, [1.0] * 19],
                                       pa.list_(pa.float32()))})
    out = MLPScorer(d_in=19, hidden=512)(t)
    assert out["score"].null_count == 1
    assert out["score"][1].as_py() is None


def test_one_weight_load_per_actor(ray_session):
    """concurrency=2 + many small batches: every output row must carry one
    of at most TWO loader ids (weights loaded once per ACTOR, never per
    batch) — and a big-batch default-weights run must still score
    identically (state does not drift)."""
    import ray.data as rd

    t = _emb_table(96)
    ds = rd.from_arrow([t.slice(i * 8, 8) for i in range(12)])
    out = ds.map_batches(
        MLPScorer,
        fn_constructor_kwargs={"d_in": 19, "hidden": 4096,
                               "tag_loader": True},
        batch_format="pyarrow", batch_size=8, concurrency=2).to_pandas()
    assert len(out) == 96
    loaders = set(out["loader_id"])
    assert 1 <= len(loaders) <= 2  # one __init__ per actor, 12 batches
    ref = MLPScorer(d_in=19, hidden=4096)(t).to_pandas()
    got = out.sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_series_equal(got["score"], ref["score"])
