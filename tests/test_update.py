"""Stats-update pass tests (S10 bulk_update -> merge_insert semantics)."""

import pyarrow as pa
import pytest

from logcrawler_ray.pipelines.update import update_image_stats
from logcrawler_ray.sources.corpus import corpus_table
from logcrawler_ray.sources.store import ImageStore


@pytest.fixture()
def raw_store(tmp_path):
    store = ImageStore(str(tmp_path / "s"))
    tab = corpus_table(30, seed=3)
    # partition WITHOUT stats columns (raw crawl output shape)
    store.append_table("p0", tab.select(
        ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]))
    return store, tab


def test_update_adds_stats(raw_store):
    store, tab = raw_store
    n = update_image_stats(store, "p0")
    assert n == 30
    out = store.read_table("p0")
    assert "brightness" in out.column_names
    assert "blurredness" in out.column_names
    assert out.num_rows == 30
    # caption column carried through the rewrite
    got = dict(zip(out["image_id"].to_pylist(), out["caption"].to_pylist()))
    want = dict(zip(tab["image_id"].to_pylist(), tab["caption"].to_pylist()))
    assert got == want
    # recomputed phash equals the corpus's stored phash
    gp = dict(zip(out["image_id"].to_pylist(), out["phash"].to_pylist()))
    wp = dict(zip(tab["image_id"].to_pylist(), tab["phash"].to_pylist()))
    assert gp == wp


def test_update_is_idempotent(raw_store):
    store, _ = raw_store
    update_image_stats(store, "p0")
    assert update_image_stats(store, "p0") == 0  # nothing left to do
    assert store.read_table("p0").num_rows == 30


def test_update_force_recomputes(raw_store):
    store, _ = raw_store
    update_image_stats(store, "p0")
    n = update_image_stats(store, "p0", force=True)
    assert n == 30
