"""Approximate-membership structures for the URL-seen set: bloom pre-filter
+ cuckoo filter, with an exact backstop (SURVEY.md §4.3; mandated shapes from
BASELINE.json:north_star "sharded cuckoo-filter URL-seen set (with bloom
pre-filter)").

Design at scale: workers hold a replicated bloom summary (rebuilt per epoch)
that answers "definitely unseen" locally, eliminating ~99% of actor RPCs; the
sharded actors hold a cuckoo filter for O(1) membership plus an exact hash
set as the correctness backstop (cuckoo false positives must never silently
drop URLs — watch-list #4).  All inputs are already 64-bit url hashes
(sidecar/canon.py), so "hashing" here is cheap mixing.
"""

from __future__ import annotations

import numpy as np

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _mix(h: np.ndarray, salt: int) -> np.ndarray:
    salt64 = np.uint64((salt * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
    with np.errstate(over="ignore"):  # modular 64-bit arithmetic is intended
        x = (h + salt64).astype(np.uint64)
        x ^= x >> np.uint64(33)
        x = (x * np.uint64(0xFF51AFD7ED558CCD)).astype(np.uint64)
        x ^= x >> np.uint64(33)
    return x


class BloomFilter:
    """Fixed-size bloom over uint64 keys; replicated worker-side pre-filter."""

    def __init__(self, n_bits: int = 1 << 20, k: int = 4):
        assert n_bits & (n_bits - 1) == 0, "n_bits must be a power of two"
        self.n_bits = n_bits
        self.k = k
        self.bits = np.zeros(n_bits // 8, dtype=np.uint8)

    def add_many(self, hashes: np.ndarray) -> None:
        h = hashes.astype(np.uint64)
        for salt in range(self.k):
            idx = _mix(h, salt) & np.uint64(self.n_bits - 1)
            np.bitwise_or.at(self.bits, (idx >> np.uint64(3)).astype(np.int64),
                             np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))

    def maybe_contains(self, hashes: np.ndarray) -> np.ndarray:
        h = hashes.astype(np.uint64)
        out = np.ones(len(h), dtype=bool)
        for salt in range(self.k):
            idx = _mix(h, salt) & np.uint64(self.n_bits - 1)
            byte = self.bits[(idx >> np.uint64(3)).astype(np.int64)]
            out &= (byte >> (idx & np.uint64(7)).astype(np.uint8)) & 1 == 1
        return out

    def merge(self, other: "BloomFilter") -> None:
        assert self.n_bits == other.n_bits and self.k == other.k
        np.bitwise_or(self.bits, other.bits, out=self.bits)

    def serialize(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def deserialize(cls, data: bytes, k: int = 4) -> "BloomFilter":
        bf = cls(n_bits=len(data) * 8, k=k)
        bf.bits = np.frombuffer(data, dtype=np.uint8).copy()
        return bf


class CuckooFilter:
    """16-bit-fingerprint, 4-way-bucket cuckoo filter over uint64 keys.

    Supports add/contains (no delete — the seen set is append-only, and a
    cuckoo delete would need stash/backstop coordination the design doesn't
    carry) with ~0.01% FP at 95% load.  Kept beside an
    exact set in SeenShard (the filter is the scale architecture; the exact
    set the correctness backstop — a positive `contains` is verified there).
    """

    def __init__(self, n_buckets: int = 1 << 16, slots: int = 4, max_kicks: int = 500):
        assert n_buckets & (n_buckets - 1) == 0
        self.n_buckets = n_buckets
        self.slots = slots
        self.max_kicks = max_kicks
        self.table = np.zeros((n_buckets, slots), dtype=np.uint16)  # 0 = empty
        self.count = 0
        # eviction stash: when max_kicks is exhausted, the orphaned VICTIM
        # fingerprint (some previously-inserted key's!) lands here instead
        # of vanishing — losing it would make that key's `contains` answer
        # "definitely not", a seen-set FALSE NEGATIVE (a re-fetch / duplicate
        # row at high load), which a cuckoo filter must never produce.
        # Fingerprint-only membership keeps the stash bytes-small; it can
        # only add false positives, which the exact backstop resolves.
        self.stash: set[int] = set()

    def _fp(self, h: int) -> int:
        fp = (h >> 48) & 0xFFFF
        return fp if fp != 0 else 1

    def _i1(self, h: int) -> int:
        return h & (self.n_buckets - 1)

    def _i2(self, i1: int, fp: int) -> int:
        return (i1 ^ (fp * 0x5BD1)) & (self.n_buckets - 1)

    def add(self, h: int) -> bool:
        fp = self._fp(h)
        i1 = self._i1(h)
        i2 = self._i2(i1, fp)
        for i in (i1, i2):
            row = self.table[i]
            free = np.flatnonzero(row == 0)
            if len(free):
                row[free[0]] = fp
                self.count += 1
                return True
        # deterministic eviction: rotate slot 0
        i = i1
        for kick in range(self.max_kicks):
            row = self.table[i]
            old = int(row[kick % self.slots])
            row[kick % self.slots] = fp
            fp = old
            i = self._i2(i, fp)
            row = self.table[i]
            free = np.flatnonzero(row == 0)
            if len(free):
                row[free[0]] = fp
                self.count += 1
                return True
        # table saturated: `fp` is now the evicted VICTIM (the new key was
        # placed during the first kick) — stash it so no key loses membership
        self.stash.add(int(fp))
        self.count += 1
        return False  # full — caller should grow/rebuild when this recurs

    def contains(self, h: int) -> bool:
        fp = self._fp(h)
        i1 = self._i1(h)
        i2 = self._i2(i1, fp)
        return bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any()
                    or fp in self.stash)

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        h = hashes.astype(np.uint64)
        fp = ((h >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)
        i1 = (h & np.uint64(self.n_buckets - 1)).astype(np.int64)
        i2 = (i1 ^ (fp.astype(np.int64) * 0x5BD1)) & (self.n_buckets - 1)
        t = self.table
        hit1 = (t[i1] == fp[:, None]).any(axis=1)
        hit2 = (t[i2] == fp[:, None]).any(axis=1)
        out = hit1 | hit2
        if self.stash:
            out |= np.isin(fp, np.fromiter(self.stash, dtype=np.uint16,
                                           count=len(self.stash)))
        return out

    def _place_batch(self, buckets: np.ndarray, fps: np.ndarray) -> np.ndarray:
        """Vectorized free-slot placement: put each (bucket, fp) into one of
        its bucket's free slots.  Duplicate buckets in one batch get distinct
        slots via the within-bucket occurrence rank.  Returns the positions
        (into ``buckets``) that could NOT be placed (bucket full)."""
        n = len(buckets)
        order = np.argsort(buckets, kind="stable")
        b = buckets[order]
        rank = np.arange(n) - np.searchsorted(b, b, side="left")
        rows = self.table[b]                      # (n, slots) — dup rows OK: reads
        free_count = (rows == 0).sum(axis=1)
        placed = rank < free_count
        if placed.any():
            # free slots first, in slot order (argsort of occupied-flag is stable)
            fs = np.argsort(rows != 0, axis=1, kind="stable")
            slot = fs[np.arange(n), np.minimum(rank, self.slots - 1)]
            self.table[b[placed], slot[placed]] = fps[order][placed]
            self.count += int(placed.sum())
        return order[~placed]

    def add_many(self, hashes: np.ndarray) -> None:
        """Batch insert: vectorized i1 then i2 placement; only keys whose
        both buckets are full fall back to the per-key kicking path."""
        h = np.asarray(hashes, dtype=np.uint64)
        if len(h) == 0:
            return
        fp = ((h >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)
        i1 = (h & np.uint64(self.n_buckets - 1)).astype(np.int64)
        rem = self._place_batch(i1, fp)
        if len(rem):
            i2 = (i1[rem] ^ (fp[rem].astype(np.int64) * 0x5BD1)) & (self.n_buckets - 1)
            rem2 = self._place_batch(i2, fp[rem])
            for pos in rem[rem2]:
                self.add(int(h[pos]))
