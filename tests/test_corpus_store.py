"""Corpus fixture generator + ImageStore tests (no Ray needed)."""

import numpy as np
import pyarrow as pa
import pytest

from logcrawler_ray.codecs import registry
from logcrawler_ray.functions.phash import phash_batch
from logcrawler_ray.functions.hashing import to_uint64
from logcrawler_ray.sources import corpus
from logcrawler_ray.sources.store import ImageStore


@pytest.fixture(scope="module")
def tab():
    return corpus.corpus_table(120, seed=42)


def test_schema(tab):
    assert tab.schema.equals(corpus.SCHEMA)


def test_deterministic(tab):
    assert tab.equals(corpus.corpus_table(120, seed=42))
    assert not tab.equals(corpus.corpus_table(120, seed=43))


def test_batchwise_equals_whole(tab):
    """Synthesis is a pure function of row index: two half-batches == one."""
    a = corpus.corpus_batch(np.arange(0, 60), 42, n_rows_hint=120)
    b = corpus.corpus_batch(np.arange(60, 120), 42, n_rows_hint=120)
    assert pa.concat_tables([a, b]).equals(tab)


def test_captions_oracle(tab):
    for row in tab.slice(0, 20).to_pylist():
        assert row["caption"] == corpus.caption_for(row["image_id"])


def test_phash_column_matches_decoded_pixels(tab):
    """The stored phash is the phash of the decoded luma (exact, via the
    same registry.decode_gray path the pipeline uses)."""
    from logcrawler_ray.functions.phash import phash_from_gray

    for row in tab.slice(0, 30).to_pylist():
        luma = registry.decode_gray(row["fmt"], row["bytes"], row["w"], row["h"])
        assert int(phash_from_gray(luma[None])[0]) == to_uint64(row["phash"])


def test_planted_duplicates(tab):
    ph = tab["phash"].to_pylist()
    assert len(set(ph)) < len(ph)  # at least one planted dup group


def test_hot_host_skew(tab):
    hosts = tab["host"].to_pylist()
    frac = hosts.count("host-0000.test") / len(hosts)
    assert 0.15 < frac < 0.45  # ~30% planted


def test_decode_all_rows(tab):
    for row in tab.to_pylist():
        rgb = registry.decode(row["fmt"], row["bytes"], row["w"], row["h"])
        assert rgb.shape == (row["h"], row["w"], 3)


# ---------------------------------------------------------------- store
def test_store_commit_and_resume(tmp_path):
    store = ImageStore(str(tmp_path / "s"))
    t = pa.table({"image_id": ["a", "b"], "v": [1, 2]})
    assert not store.is_done("p0")
    store.append_table("p0", t, meta={"wave": 0})
    assert store.is_done("p0")
    assert store.rows() == 2
    assert store.partitions() == ["p0"]
    assert store.manifest("p0")["meta"] == {"wave": 0}
    assert store.read_table("p0").equals(t)


def test_store_multiple_partitions(tmp_path):
    store = ImageStore(str(tmp_path / "s"))
    store.append_table("a", pa.table({"k": [1]}))
    store.append_table("b", pa.table({"k": [2, 3]}))
    assert store.rows() == 3
    assert sorted(store.read_table()["k"].to_pylist()) == [1, 2, 3]


def test_store_merge_insert(tmp_path):
    store = ImageStore(str(tmp_path / "s"))
    store.append_table("p", pa.table({"image_id": ["a", "b"], "v": [1, 2]}))
    store.merge_insert("p", pa.table({"image_id": ["b", "c"], "v": [20, 30]}), key="image_id")
    out = store.read_table("p")
    got = dict(zip(out["image_id"].to_pylist(), out["v"].to_pylist()))
    assert got == {"a": 1, "b": 20, "c": 30}


def test_store_uncommitted_invisible(tmp_path):
    import os

    store = ImageStore(str(tmp_path / "s"))
    # simulate a crashed write: temp dir exists but no manifest
    os.makedirs(str(tmp_path / "s" / "data" / "p0.tmp.dead"))
    assert store.partitions() == []
    assert store.files() == []


def test_store_crash_mid_swap_rolls_back(tmp_path):
    """_swap_dir crash windows (review r5): the old rmtree-before-replace
    order could strand a manifest pointing at deleted files. With the
    rename-aside protocol, a crash BETWEEN the two renames leaves the old
    data aside; reopening the store must restore it."""
    import os
    import shutil

    root = str(tmp_path / "s")
    store = ImageStore(root)
    t = pa.table({"image_id": ["a", "b"], "v": [1, 2]})
    store.append_table("p", t)
    # crash state A: final dir renamed aside, replacement never arrived
    final = os.path.join(root, "data", "p")
    os.replace(final, final + ".old.deadbeef")
    store2 = ImageStore(root)  # reopen heals
    assert store2.read_table("p").equals(t)
    assert not os.path.exists(final + ".old.deadbeef")


def test_store_completed_swap_drops_aside(tmp_path):
    """Crash state B: commit completed (manifest matches the new dir) but
    the aside copy was never removed — reopening sweeps it, keeping the
    committed data."""
    import os
    import shutil

    root = str(tmp_path / "s")
    store = ImageStore(root)
    t = pa.table({"image_id": ["a", "b"], "v": [1, 2]})
    store.append_table("p", t)
    final = os.path.join(root, "data", "p")
    # a stale aside copy of some earlier version
    shutil.copytree(final, final + ".old.cafebabe")
    with open(os.path.join(final + ".old.cafebabe", "junk.bin"), "wb") as f:
        f.write(b"old-version-leftover")
    store2 = ImageStore(root)
    assert store2.read_table("p").equals(t)
    assert not os.path.exists(final + ".old.cafebabe")


def test_store_crash_mid_swap_view(tmp_path):
    """Same rollback for view partitions (delete-file dirs)."""
    import os

    root = str(tmp_path / "s")
    store = ImageStore(root)
    store.append_table("base", pa.table({"image_id": ["a", "b", "c"],
                                         "v": [1, 2, 3]}))
    store.commit_delete_view("view", "base", ["b"], key_col="image_id")
    assert store.rows("view") == 2
    final = os.path.join(root, "data", "view")
    os.replace(final, final + ".old.0123")
    store2 = ImageStore(root)
    assert sorted(store2.read_table("view")["image_id"].to_pylist()) == [
        "a", "c"]
    assert not os.path.exists(final + ".old.0123")
