"""Ray actors holding the crawl's shared mutable state (SURVEY.md §2.3
ST5-ST7) — the only pieces the Dataset API genuinely can't express.

- :class:`SeenShard` — one shard of the URL-seen set (cuckoo filter + exact
  backstop + append-only delta log for checkpointing). Shard key =
  ``url_hash % num_shards``.  ``add_many`` is idempotent, so Ray task
  retries are safe (watch-list #2).
- :class:`HostPolicy` — per-host politeness token buckets + robots cache.
  Shard key = ``hash(host) % num_actors`` so a host always routes to the
  same actor.  Budgets are deterministic counts per epoch, never wall-clock
  (crawl-order determinism, SURVEY.md §4.3).

Batched APIs throughout: one RPC per (batch × shard), never per URL.
"""

from __future__ import annotations

import numpy as np

import ray

from sidecar import synth
from sidecar.state import BloomFilter, CuckooFilter


@ray.remote(num_cpus=0)  # pure state actor: zero CPU reservation so pools
# of state shards always schedule even on tiny clusters (a 0.25 reservation
# deadlocked fetch actors blocked on shard RPCs at num_cpus=4)
class SeenShard:
    def __init__(self, shard_id: int, n_buckets: int = 1 << 16, bloom_bits: int = 1 << 20):
        self.shard_id = shard_id
        self.cuckoo = CuckooFilter(n_buckets=n_buckets)
        self.exact: set[int] = set()  # correctness backstop (watch-list #4)
        self.delta: list[int] = []  # appended since last checkpoint
        self.bloom_bits = bloom_bits

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        """Membership: cuckoo answers 'maybe'; positives verified exactly."""
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        maybe = self.cuckoo.contains_many(np.asarray(hashes, dtype=np.uint64))
        out = np.zeros(len(hashes), dtype=bool)
        for i in np.flatnonzero(maybe):
            out[i] = int(hashes[i]) in self.exact
        return out

    def add_many(self, hashes: np.ndarray) -> int:
        """Idempotent insert; returns number of genuinely-new keys."""
        added = 0
        for h in np.asarray(hashes, dtype=np.uint64):
            hi = int(h)
            if hi not in self.exact:
                self.exact.add(hi)
                self.cuckoo.add(hi)
                self.delta.append(hi)
                added += 1
        return added

    def bloom_summary(self) -> bytes:
        """Serialized bloom over this shard's keys (worker-side pre-filter)."""
        bf = BloomFilter(n_bits=self.bloom_bits)
        if self.exact:
            bf.add_many(np.fromiter(self.exact, dtype=np.uint64))
        return bf.serialize()

    def snapshot(self) -> np.ndarray:
        return np.sort(np.fromiter(self.exact, dtype=np.uint64, count=len(self.exact)))

    def drain_delta(self) -> np.ndarray:
        """Keys added since the last drain (checkpoint delta log)."""
        out = np.array(sorted(self.delta), dtype=np.uint64)
        self.delta = []
        return out

    def write_delta(self, path: str) -> int:
        """Write this shard's delta log to ``path`` SHARD-SIDE (atomic tmp +
        rename) and clear it; returns the key count.  The driver handles
        only paths and counts — at the 10^10-URL target a driver-side
        concat of all shards' deltas is an OOM (VERDICT r1 #3)."""
        import os

        out = np.array(sorted(self.delta), dtype=np.uint64)
        self.delta = []
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            np.save(f, out)
        os.replace(tmp, path)
        return len(out)

    def restore(self, keys: np.ndarray) -> int:
        return self.add_many(keys)

    def size(self) -> int:
        return len(self.exact)


@ray.remote(num_cpus=0)  # pure state actor: zero CPU reservation so pools
# of state shards always schedule even on tiny clusters (a 0.25 reservation
# deadlocked fetch actors blocked on shard RPCs at num_cpus=4)
class HostPolicy:
    """Politeness + robots for the hosts sharded onto this actor."""

    def __init__(self, actor_id: int, budget_per_epoch: int, n_hosts: int = 20, seed: int = 42):
        self.actor_id = actor_id
        self.budget = budget_per_epoch
        self.tokens: dict[tuple[str, int], int] = {}  # (host, epoch) -> remaining
        self._robots = synth.robots_rules(n_hosts=n_hosts, seed=seed)  # cache built once
        self.granted: int = 0
        self.denied_robots: int = 0

    def robots_disallowed(self, hosts: list[str], paths: list[str]) -> list[bool]:
        from sidecar.robots import is_allowed

        out = []
        for host, path in zip(hosts, paths):
            bad = not is_allowed(self._robots.get(host, []), path)
            if bad:
                self.denied_robots += 1
            out.append(bad)
        return out

    def grant(self, host: str, epoch: int, n: int) -> int:
        """Deterministic token bucket: ``budget`` tokens per (host, epoch).
        Returns how many of the n requests are granted."""
        key = (host, epoch)
        remaining = self.tokens.get(key, self.budget)
        take = min(remaining, n)
        self.tokens[key] = remaining - take
        self.granted += take
        return take

    def metrics(self) -> dict:
        return {"granted": self.granted, "denied_robots": self.denied_robots}


def make_seen_shards(num_shards: int, **kwargs) -> list:
    return [SeenShard.remote(i, **kwargs) for i in range(num_shards)]


def make_host_policies(num_actors: int, budget_per_epoch: int, n_hosts: int = 20,
                       seed: int = 42) -> list:
    return [
        HostPolicy.remote(i, budget_per_epoch, n_hosts=n_hosts, seed=seed)
        for i in range(num_actors)
    ]


def host_shard(host: str, num_actors: int) -> int:
    """Stable host → actor routing (never Python's salted hash)."""
    import hashlib

    return int.from_bytes(hashlib.blake2b(host.encode(), digest_size=4).digest(), "big") % num_actors
