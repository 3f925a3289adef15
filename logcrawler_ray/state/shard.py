"""CrawlShard — one self-contained control-plane shard: frontier heap +
politeness budget + URL-seen (bloom+cuckoo) + robots rules for the hosts
that hash to it.

This is the unit the north rule shards by host_hash: a host's URLs always
meet the same shard, so shards never coordinate. The SAME class runs

- serially on the driver inside the reference executor (plain calls), and
- as one Ray actor per shard in the engine (``make_shard_actor_cls``), so
  enqueue/drain of a wave parallelizes across shards.

Equivalence argument (tested): the engine routes each wave's links to
shards preserving per-shard relative order; seq spaces are interleaved per
shard (seq ≡ shard_id mod n_shards), budgets and seen state are
shard-local — so per-shard state evolution is independent of whether the
shards execute concurrently. The merged drain output, sorted by the global
(priority, fetch_time, seq) order, is therefore identical to the serial
executor's.
"""

from __future__ import annotations

import numpy as np

from ..functions.hashing import hash64_str_array
from .frontier import FrontierShard
from .politeness import HostBudget, RobotsCache
from .urlseen import GrowableSeen


class CrawlShard:
    def __init__(self, shard_id: int, n_shards: int, seen_capacity: int,
                 seed: int, robots_fetcher):
        self.shard_id = shard_id
        self.frontier = FrontierShard(shard_id, n_shards)
        self.budget = HostBudget()
        self.seen = GrowableSeen(seen_capacity, seed=seed + shard_id)
        self.robots = RobotsCache(robots_fetcher)

    def enqueue_routed_blocks(self, blocks) -> int:
        """Shard-side ordered enqueue (round-2 verdict #4): ``blocks`` are
        the wave's ROUTED link tables (columns seq, idx, url, host, path,
        depth, priority, shard) — as ObjectRefs in actor mode (the driver
        ships handles, never link data) or pa.Tables in-process. The shard
        filters ITS rows and sorts them by (seq, idx) — the per-shard
        relative order IS the engine contract — then enqueues. The last
        O(wave) driver term in the crawl goes away."""
        import pyarrow as pa
        import pyarrow.compute as pc

        refs = [b for b in blocks if not isinstance(b, pa.Table)]
        if refs:
            import ray

            got = iter(ray.get(refs))
            blocks = [b if isinstance(b, pa.Table) else next(got)
                      for b in blocks]
        mine = [b.filter(pc.equal(b["shard"], self.shard_id))
                for b in blocks if b.num_rows]
        mine = [m for m in mine if m.num_rows]
        if not mine:
            return 0
        t = pa.concat_tables(mine)
        order = np.lexsort((t["idx"].to_numpy(), t["seq"].to_numpy()))
        t = t.take(pa.array(order))
        return self.enqueue_columns(
            t["url"].to_pylist(), t["host"].to_pylist(),
            t["path"].to_pylist(), t["depth"].to_pylist(),
            t["priority"].to_pylist())

    def enqueue_columns(self, urls: list[str], hosts: list[str],
                        paths: list[str], depths: list[int],
                        prios: list[int]) -> int:
        """Columnar enqueue: the engine ships numpy/list slices per shard
        and the tuple zip happens HERE — inside the shard actor, in
        parallel across shards — instead of a driver-side Python loop over
        every discovered link."""
        return self.enqueue_batch(list(zip(urls, hosts, paths, depths, prios)))

    def enqueue_batch(self, items: list[tuple[str, str, str, int, int]]) -> int:
        """Items: (canonical_url, host, path, depth, priority), in order.

        robots filter -> crawl-delay registration -> seen add_if_new
        (batched over the whole item list) -> frontier push. Returns count
        admitted."""
        allowed: list[tuple[str, str, int, int]] = []
        for url, host, path, depth, priority in items:
            rules = self.robots.rules(host)
            if not rules.allowed(path):
                continue
            if rules.crawl_delay_ms and host not in self.budget.delays:
                self.budget.delays[host] = rules.crawl_delay_ms
            allowed.append((url, host, depth, priority))
        if not allowed:
            return 0
        keys = hash64_str_array([u for u, _, _, _ in allowed], seed=0x5EED)
        new = self.seen.add_if_new(keys)
        rows = [
            {"url": u, "host": h, "priority": p, "depth": d}
            for (u, h, d, p), is_new in zip(allowed, new) if is_new
        ]
        if rows:
            self.frontier.push(rows)
        return len(rows)

    def drain(self, now: int, max_n: int, horizon: int):
        return self.frontier.drain(self.budget, now, max_n, horizon)

    def size(self) -> int:
        return len(self.frontier)

    def seen_size(self) -> int:
        return self.seen.size

    def cuckoo_table(self) -> np.ndarray:
        # all generations flattened — the byte-equivalence probe
        return np.concatenate([g.cuckoo.table.reshape(-1) for g in self.seen.gens])

    # -- snapshot ----------------------------------------------------------
    def state(self) -> dict:
        return {
            "frontier": self.frontier.state(),
            "budget": self.budget.state(),
            "seen": self.seen.state(),
            "robots": {h: (r.crawl_delay_ms, list(r.disallow))
                       for h, r in self.robots.cache.items()},
        }

    def restore(self, st: dict) -> None:
        from .politeness import RobotsRules

        self.frontier = FrontierShard.from_state(st["frontier"])
        self.budget = HostBudget.from_state(st["budget"])
        self.seen = GrowableSeen.from_state(st["seen"])
        self.robots.cache = {h: RobotsRules(d, dis)
                             for h, (d, dis) in st["robots"].items()}


def make_shard_actor_cls():
    import ray

    @ray.remote(num_cpus=0)
    class CrawlShardActor(CrawlShard):
        pass

    return CrawlShardActor
