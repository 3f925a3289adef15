"""logcrawler_ray — a Ray-Data-native crawl/ingest engine.

Public API surface (see README.md for architecture, COVERAGE.md for the
operator inventory):

- pipelines: ``CrawlEngine``/``CrawlConfig`` (frontier crawl),
  ``ingest`` (decode+stats+phash+dedup), ``update_image_stats``,
  combine pipelines.
- sources: ``ImageStore`` (atomic partitioned store with delete-vector
  views), corpus synthesizers, NaoTH binary scanners, ``SyntheticWeb``.
- stages: ``DecodeStats``, ``FetchWorker``, dedup (exact/MinHash/SimHash),
  ANN, as-of joins, skew helpers, multimodal stages.
- state: bloom/cuckoo URL-seen, frontier shards, politeness, checkpoints.
"""

__version__ = "0.1.0"

__all__ = [
    "CrawlConfig",
    "CrawlEngine",
    "ImageStore",
    "ingest",
]


def __getattr__(name):  # lazy: importing the package must not pull ray
    if name in ("CrawlConfig", "CrawlEngine"):
        from .pipelines import crawl

        return getattr(crawl, name)
    if name == "ImageStore":
        from .sources.store import ImageStore

        return ImageStore
    if name == "ingest":
        from .pipelines.ingest import ingest

        return ingest
    raise AttributeError(name)
