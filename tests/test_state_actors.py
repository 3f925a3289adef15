"""Standalone control-plane actor wrappers (granular API beside CrawlShard)."""

import numpy as np
import pytest


def test_seen_shard_actor(ray_session):
    import ray

    from logcrawler_ray.state.urlseen import make_seen_actor_cls

    Actor = make_seen_actor_cls()
    a = Actor.remote(capacity=4096)
    keys = np.array([1, 2, 1, 3], dtype=np.uint64)
    new = ray.get(a.add_if_new.remote(keys))
    assert new.tolist() == [True, True, False, True]
    assert ray.get(a.size.remote()) == 3
    # snapshot -> new actor continues identically
    st = ray.get(a.state.remote())
    b = Actor.remote(capacity=4096, state=st)
    assert not ray.get(b.add_if_new.remote(np.array([2], dtype=np.uint64)))[0]
    ray.kill(a)
    ray.kill(b)


def test_frontier_actor(ray_session):
    import ray

    from logcrawler_ray.state.frontier import make_frontier_actor_cls

    Actor = make_frontier_actor_cls()
    f = Actor.remote(0, 1, delays={"slow": 100})
    ray.get(f.push.remote([{"url": "u1", "host": "slow", "priority": 0},
                           {"url": "u2", "host": "slow", "priority": 0}]))
    rows, now = ray.get(f.drain.remote(0, 10, 10_000))
    assert [r["fetch_time"] for r in rows] == [0, 100]
    assert ray.get(f.size.remote()) == 0
    ray.kill(f)


def test_robots_actor(ray_session):
    import ray

    from logcrawler_ray.state.politeness import make_robots_actor_cls

    Actor = make_robots_actor_cls()
    r = Actor.remote(lambda host: "User-agent: *\nDisallow: /no\nCrawl-delay: 0.2\n")
    allowed = ray.get(r.filter_allowed.remote(["h1", "h1"], ["/no/x", "/yes"]))
    assert allowed == [False, True]
    assert ray.get(r.delays.remote(["h1"])) == {"h1": 200}
    ray.kill(r)


def test_full_614400_byte_row_through_pipeline(ray_session):
    """The reference's exact raw-image record size (640*480*2 = 614,400 B,
    02_combine_logs.py:24-27) flows through fetch-shape decode + stats +
    phash and round-trips the store."""
    import pyarrow as pa
    import ray.data as rd

    from logcrawler_ray.codecs import yuv422
    from logcrawler_ray.sources.corpus import _pixels
    from logcrawler_ray.stages.decode import DecodeStats

    rgb = _pixels(123, 640, 480)
    blob = yuv422.encode(rgb)
    assert len(blob) == 614_400
    t = pa.table({
        "image_id": ["big"], "bytes": [blob],
        "w": pa.array([640], pa.int32()), "h": pa.array([480], pa.int32()),
        "fmt": ["yuv422"],
    })
    out = rd.from_arrow(t).map_batches(
        DecodeStats(), batch_format="pyarrow", batch_size=1).to_pandas()
    assert out["decode_ok"].iloc[0]
    assert out["resolution"].iloc[0] == "640x480"
    assert out["phash"].iloc[0] != 0
