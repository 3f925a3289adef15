"""SyntheticWeb: a deterministic, self-contained "internet" for the crawler.

No network exists in this container, so fetching is a pure function of the
URL (seeded): every page URL yields one encoded image + caption (the
engine's row unit, per BASELINE.json input_hint) plus outgoing links.
This plays the role the filesystem tree of game logs plays for the
reference (README.md:6-76): a deterministic, enumerable corpus the crawler
discovers incrementally.

Determinism is the point — the serial reference executor and the parallel
Ray engine fetch the same URLs and must produce identical bytes, so the
equivalence tests (ordering, seen-set, kill+resume) are exact.

Link structure per page (all derived from splitmix64 of the URL key):
- 0..3 same-host child pages (the frontier's bread and butter)
- ~10% chance of one cross-host link (hot host favored -> skew)
- ~10% chance of a /private/... link (robots disallow exercise)
- ~15% chance one link is a NON-CANONICAL spelling (trailing slash or
  explicit :80) of an already-linked page (URL-seen canonicalization test)
"""

from __future__ import annotations

import numpy as np

from ..codecs import registry
from ..functions.hashing import hash64_str, splitmix64
from ..sources.corpus import FMTS, SIZES, _pixels, caption_for

_SIZE_SMALL = [(64, 48), (96, 64), (128, 96)]


class SyntheticWeb:
    def __init__(self, seed: int = 42, n_hosts: int = 12, pages_per_host: int = 200,
                 hot_host: int = 0):
        self.seed = seed
        self.n_hosts = n_hosts
        self.pages_per_host = pages_per_host
        self.hot_host = hot_host

    # -- naming --------------------------------------------------------
    def host_name(self, h: int) -> str:
        return f"host-{h:04d}.test"

    def page_url(self, h: int, p: int) -> str:
        return f"http://{self.host_name(h)}/p/{p % self.pages_per_host}"

    def seed_urls(self, n: int) -> list[dict]:
        """First pages of each host, round-robin, with deterministic
        priorities — plus a couple of duplicate/non-canonical seeds."""
        rows = []
        for i in range(n):
            h = i % self.n_hosts
            url = self.page_url(h, i // self.n_hosts)
            prio = int(splitmix64(np.uint64(hash64_str(url)) ^ np.uint64(self.seed)) % np.uint64(10))
            rows.append({"url": url, "priority": prio, "depth": 0})
        if n >= 4:
            rows.append({"url": rows[0]["url"] + "/", "priority": 0, "depth": 0})
            rows.append({"url": rows[1]["url"].replace("http://", "HTTP://"), "priority": 0,
                         "depth": 0})
        return rows

    # -- robots --------------------------------------------------------
    def robots_txt(self, host: str) -> str:
        k = splitmix64(np.uint64(hash64_str(host)) ^ np.uint64(self.seed * 13 + 5))
        delay_ms = [0, 0, 100, 500][int(k % np.uint64(4))]
        lines = ["User-agent: *"]
        # host-0001 always disallows (fixture guarantee); ~10% of others do
        if host == self.host_name(1) or int(splitmix64(k) % np.uint64(10)) == 0:
            lines.append("Disallow: /private")
        if delay_ms:
            lines.append(f"Crawl-delay: {delay_ms / 1000}")
        return "\n".join(lines)

    # -- pages ---------------------------------------------------------
    def _key(self, url: str) -> int:
        return int(splitmix64(np.uint64(hash64_str(url)) ^ np.uint64(self.seed * 1_000_003)))

    def fetch(self, url: str) -> dict:
        """URL -> {image_id, bytes, w, h, fmt, caption, links}.

        ~3% of URLs return a corrupt payload (decode error channel test).
        """
        key = self._key(url)
        k = np.uint64(key)
        host = url.split("://", 1)[1].split("/", 1)[0]
        path = "/" + url.split("://", 1)[1].split("/", 1)[1] if "/" in url.split("://", 1)[1] else "/"
        image_id = f"{host}{path}"

        fmt = FMTS[int(k % np.uint64(3))]
        size_pool = _SIZE_SMALL if int(splitmix64(k ^ np.uint64(1)) % np.uint64(10)) < 9 else SIZES[3:]
        w, h = size_pool[int(splitmix64(k ^ np.uint64(2)) % np.uint64(len(size_pool)))]
        if int(splitmix64(k ^ np.uint64(3)) % np.uint64(100)) < 3:
            blob = b"CORRUPT" + bytes(str(key), "ascii")
        else:
            rgb = _pixels(key, w, h)
            blob = registry.encode(fmt, rgb)

        links = self._links(host, k)
        return {"image_id": image_id, "bytes": blob, "w": w, "h": h, "fmt": fmt,
                "caption": caption_for(image_id), "links": links}

    def _links(self, host: str, k: np.uint64) -> list[str]:
        h_idx = int(host.split("-")[1].split(".")[0])
        n_children = 1 + int(splitmix64(k ^ np.uint64(10)) % np.uint64(4))
        links = []
        for c in range(n_children):
            p = int(splitmix64(k ^ np.uint64(20 + c)) % np.uint64(self.pages_per_host))
            links.append(self.page_url(h_idx, p))
        r = np.uint64(splitmix64(k ^ np.uint64(30)))
        if int(r % np.uint64(10)) == 0:  # cross-host, hot host favored
            target = self.hot_host if int(r % np.uint64(2)) else int(
                splitmix64(r) % np.uint64(self.n_hosts))
            p = int(splitmix64(r ^ np.uint64(1)) % np.uint64(self.pages_per_host))
            links.append(self.page_url(target, p))
        if int(splitmix64(k ^ np.uint64(40)) % np.uint64(10)) == 0:
            links.append(f"http://{host}/private/{int(k % np.uint64(50))}")
        if links and int(splitmix64(k ^ np.uint64(50)) % np.uint64(100)) < 15:
            links.append(links[0] + "/")  # non-canonical duplicate
        return links
