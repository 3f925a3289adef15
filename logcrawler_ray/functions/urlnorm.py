"""URL canonicalization + host hashing for the frontier.

The reference normalizes every filesystem path before using it as a key
(``str(p).removeprefix(log_root).strip("/")``, reference:
01_input_game_data.py:117-131, 12_input_images.py:61); in the crawl graft
the same role is played by URL canonicalization: two spellings of one URL
must map to one frontier entry, or the URL-seen set diverges.

Rules (applied in ``canonicalize``):
- lowercase scheme and host; default scheme http
- strip default ports (:80 for http, :443 for https)
- drop fragments; keep query as-is
- collapse duplicate slashes in the path; resolve "." and ".." segments
- strip trailing slash (except the bare root, which becomes "/")
- empty path -> "/"
"""

from __future__ import annotations

from urllib.parse import urlsplit

from .hashing import hash64_str

_DEFAULT_PORTS = {"http": 80, "https": 443}


def canonicalize(url: str) -> str:
    url = url.strip()
    if "://" not in url:
        url = "http://" + url
    parts = urlsplit(url)
    scheme = parts.scheme.lower() or "http"
    host = (parts.hostname or "").lower()
    port = parts.port
    netloc = host if (port is None or _DEFAULT_PORTS.get(scheme) == port) else f"{host}:{port}"
    segs: list[str] = []
    for seg in parts.path.split("/"):
        if seg in ("", "."):
            continue
        if seg == "..":
            if segs:
                segs.pop()
            continue
        segs.append(seg)
    path = "/" + "/".join(segs)
    out = f"{scheme}://{netloc}{path}"
    if parts.query:
        out += "?" + parts.query
    return out


def host_of(url: str) -> str:
    return (urlsplit(url).hostname or "").lower()


def path_of(cu: str) -> str:
    """Path-with-query of a CANONICALIZED url, by positional slice.

    ``cu.split(host, 1)[1]`` — the obvious spelling — is wrong whenever the
    host string also occurs earlier in the url (host ``t`` matches inside
    ``http://``) or the netloc carries an explicit non-default port; the
    path always starts at the first ``/`` after ``://`` in a canonical url
    (``canonicalize`` guarantees one exists).
    """
    return cu[cu.index("/", cu.index("://") + 3):]


def host_hash(host: str) -> int:
    """Stable uint64 host hash — THE partition key of the whole engine.

    The same key drives URL-seen sharding, frontier sharding, politeness
    shards and the skew repartition before dedup (SURVEY.md §7.4), so blocks
    only need to be co-located once.
    """
    return hash64_str(host, seed=0x05757)
