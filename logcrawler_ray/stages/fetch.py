"""Fetch stage: the stateful actor-pool that turns frontier rows into raw
image rows + discovered links.

Maps the reference's HTTP-fetch-with-failover stage (reference:
13_calculate_image_stats.py:11-29 choose-alive-server-once + :78-84
fetch+decode) onto ``map_batches(FetchWorker, concurrency=N)``: the backend
handle (here the deterministic SyntheticWeb; in production an HTTP session
pool with mirror failover) is built ONCE per actor in ``__init__``.

Output schema per input row:
  url, host, seq, fetch_time, depth, image_id, bytes, w, h, fmt, caption,
  links (list<string>), fetch_ok

Fetch failures are an error channel (fetch_ok=False), not a crash — the
reference ``quit()``s instead (13:107)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.hosts import SyntheticWeb

FETCH_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("host", pa.string()),
    ("seq", pa.int64()),
    ("fetch_time", pa.int64()),
    ("depth", pa.int32()),
    ("image_id", pa.string()),
    ("bytes", pa.binary()),
    ("w", pa.int32()),
    ("h", pa.int32()),
    ("fmt", pa.string()),
    ("caption", pa.string()),
    ("links", pa.list_(pa.string())),
    ("fetch_ok", pa.bool_()),
])


class FetchWorker:
    """``ds.map_batches(FetchWorker, fn_constructor_kwargs={"web_params": ...},
    batch_format="pyarrow", concurrency=N)``."""

    def __init__(self, web_params: dict | None = None):
        self.web = SyntheticWeb(**(web_params or {}))

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        hosts = batch["host"].to_pylist()
        seqs = batch["seq"].to_pylist()
        fts = batch["fetch_time"].to_pylist()
        depths = batch["depth"].to_pylist()
        cols = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt", "caption", "links")}
        ok = np.ones(len(urls), dtype=bool)
        for i, u in enumerate(urls):
            try:
                page = self.web.fetch(u)
            except Exception:
                ok[i] = False
                page = {"image_id": "", "bytes": b"", "w": 0, "h": 0, "fmt": "",
                        "caption": "", "links": []}
            for key in cols:
                cols[key].append(page[key])
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "host": pa.array(hosts, pa.string()),
            "seq": pa.array(seqs, pa.int64()),
            "fetch_time": pa.array(fts, pa.int64()),
            "depth": pa.array(depths, pa.int32()),
            "image_id": pa.array(cols["image_id"], pa.string()),
            "bytes": pa.array(cols["bytes"], pa.binary()),
            "w": pa.array(cols["w"], pa.int32()),
            "h": pa.array(cols["h"], pa.int32()),
            "fmt": pa.array(cols["fmt"], pa.string()),
            "caption": pa.array(cols["caption"], pa.string()),
            "links": pa.array(cols["links"], pa.list_(pa.string())),
            "fetch_ok": pa.array(ok),
        }, schema=FETCH_SCHEMA)
