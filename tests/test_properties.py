"""Property-based tests (hypothesis) for the engine's core invariants."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from logcrawler_ray.codecs import png, yuv422
from logcrawler_ray.functions.urlnorm import canonicalize
from logcrawler_ray.sources import naoth
from logcrawler_ray.state.cuckoo import CuckooFilter
from logcrawler_ray.stages.asof import closest_join_arrays


# ---------------------------------------------------------------- urlnorm
@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJ0123456789-._/:?=&#",
               min_size=1, max_size=60))
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent_any_input(s):
    try:
        once = canonicalize(s)
    except ValueError:
        return  # unparseable input may raise; it must not loop or corrupt
    assert canonicalize(once) == once


# ---------------------------------------------------------------- cuckoo
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=1,
                max_size=200))
@settings(max_examples=50, deadline=None)
def test_cuckoo_no_false_negatives(keys):
    cf = CuckooFilter(1024)
    arr = np.array(keys, dtype=np.uint64)
    cf.add_if_new(arr)
    assert cf.contains(arr).all()


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=1,
                max_size=100))
@settings(max_examples=50, deadline=None)
def test_cuckoo_add_if_new_counts_distinct(keys):
    cf = CuckooFilter(1024)
    arr = np.array(keys, dtype=np.uint64)
    new = cf.add_if_new(arr)
    # newly-added count equals distinct count (up to fingerprint collisions,
    # which with <=100 keys in 2048 buckets x 16-bit fp are ~never hit)
    assert new.sum() == len(set(keys))


# ---------------------------------------------------------------- png
@given(st.integers(min_value=1, max_value=24), st.integers(min_value=1, max_value=24),
       st.integers(min_value=0, max_value=2**32 - 1))
@settings(max_examples=50, deadline=None)
def test_png_roundtrip_any_shape(w, h, seed):
    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3)).astype(np.uint8)
    dec, _ = png.decode(png.encode(img))
    assert (dec == img).all()


# ---------------------------------------------------------------- yuv luma
@given(st.integers(min_value=1, max_value=16), st.integers(min_value=1, max_value=16),
       st.integers(min_value=0, max_value=2**32 - 1))
@settings(max_examples=50, deadline=None)
def test_yuv_luma_preserved(w2, h, seed):
    w = w2 * 2  # even width
    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3)).astype(np.uint8)
    ycbcr = yuv422.rgb_to_ycbcr(img)
    buf = yuv422.ycbcr_to_yuv422(ycbcr)
    back = yuv422.yuv422_to_ycbcr(buf, w, h)
    assert (back[..., 0] == ycbcr[..., 0]).all()  # Y survives exactly


# ---------------------------------------------------------------- scanner
@given(st.lists(
    st.tuples(st.integers(min_value=-2**31, max_value=2**31 - 1),
              st.lists(st.tuples(st.sampled_from(["FrameInfo", "Image", "X"]),
                                 st.binary(max_size=20)), min_size=1, max_size=3)),
    min_size=0, max_size=8))
@settings(max_examples=100, deadline=None)
def test_scanner_roundtrip_clean(frames):
    data = naoth.write_records(frames)
    idx = naoth.scan_records(data)
    flat = [(fn, name, payload) for fn, fields in frames for name, payload in fields]
    got = list(zip(idx["frame_number"].to_pylist(), idx["name"].to_pylist(),
                   idx["size"].to_pylist()))
    assert got == [(fn, n, len(p)) for fn, n, p in flat]
    for row, (_, _, payload) in zip(idx.to_pylist(), flat):
        assert naoth.payload(data, row["offset"], row["size"]) == payload


@given(st.lists(
    st.tuples(st.integers(min_value=0, max_value=1000),
              st.lists(st.tuples(st.sampled_from(["FrameInfo", "Image"]),
                                 st.binary(min_size=1, max_size=10)),
                       min_size=1, max_size=2)),
    min_size=1, max_size=5),
    st.integers(min_value=1, max_value=30))
@settings(max_examples=100, deadline=None)
def test_scanner_truncation_keeps_prefix(frames, cut):
    data = naoth.write_records(frames)
    if cut >= len(data):
        return
    idx = naoth.scan_records(data[:-cut])
    full = naoth.scan_records(data)
    # truncated scan is a prefix of the full scan
    n = idx.num_rows
    assert idx.equals(full.slice(0, n))
    # and it never ends mid-frame: the last kept frame is complete
    if n:
        last_fn = idx["frame_number"][n - 1].as_py()
        full_count = sum(1 for r in full.to_pylist() if r["frame_number"] == last_fn)
        kept_count = sum(1 for r in idx.to_pylist() if r["frame_number"] == last_fn)
        # frames can repeat numbers non-contiguously; compare the contiguous run
        assert kept_count <= full_count


# ---------------------------------------------------------------- closest
@given(st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40),
       st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40))
@settings(max_examples=100, deadline=None)
def test_closest_matches_bruteforce_any(l_times, r_times):
    l_time = np.array(sorted(l_times))
    r_time = np.array(sorted(r_times))
    r_id = np.arange(100, 100 + len(r_time))
    got = closest_join_arrays(l_time, np.arange(len(l_time)), r_time, r_id)
    for i, t in enumerate(l_time):
        best = min(zip(r_time, r_id), key=lambda p: (abs(int(t) - int(p[0])), p[1]))
        assert got[i] == best[1]


# ------------------------------------------------------------ loser pass
@given(st.lists(st.tuples(st.integers(min_value=0, max_value=12),
                          st.integers(min_value=0, max_value=10_000)),
                min_size=1, max_size=120),
       st.integers(min_value=1, max_value=16))
@settings(max_examples=100, deadline=None)
def test_loser_partials_merge_matches_first_wins(pairs, batch):
    """Any split of rows into batches: loser_partials per batch merged by
    merge_loser_partials must equal global first-wins losers (the fused
    ingest dedup contract, independent of batching)."""
    import pyarrow as pa

    from logcrawler_ray.stages.dedup import loser_partials, merge_loser_partials

    keys = np.array([p[0] for p in pairs], dtype=np.int64)
    # unique order values (image_id contract) with shuffled assignment
    order = np.array([f"id{p[1]:05d}_{i:03d}" for i, p in enumerate(pairs)])
    parts = []
    for i in range(0, len(keys), batch):
        t = pa.table({"k": pa.array(keys[i:i + batch]),
                      "o": pa.array(order[i:i + batch])})
        parts.append(loser_partials(t, "k", "o"))
    import pandas as pd

    pdf = pa.concat_tables(parts).to_pandas()
    got = merge_loser_partials(pdf, "k")
    df = pd.DataFrame({"k": keys, "o": order})
    expect = set(df["o"]) - set(df.sort_values("o").groupby("k")["o"].first())
    assert got == frozenset(expect)
