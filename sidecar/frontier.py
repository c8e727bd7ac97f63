"""Frontier epoch planning: the priority-queue-as-shuffles core of the crawl
(BASELINE.json:north_rule — "priority-queue frontier realized as
groupby(host)-aggregate-sort shuffles ... with explicit hash partitioning and
hot-host skew splitting").

All frontier tables carry METADATA ONLY (url/host/priority/...) — image bytes
never enter these shuffles (SURVEY.md §4.2, watch-list #3).

Total ordering (crawl-order determinism, SURVEY.md §2.6): every selection
sorts by the same key ``(-priority, depth, url_hash, seed_id)`` — never by
partition arrival order.  The single-threaded oracle (sidecar/oracle.py) uses
the identical functions, which is what makes bit-for-bit equality testable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from sidecar import synth
from sidecar.canon import canonical_url, host_of, url_hash

SORT_COLS = ["priority", "depth", "url_hash", "seed_id", "url"]
SORT_ASC = [False, True, True, True, True]
NUM_BUDGET_PARTS = 64  # coarse Ray-level partition count for select_budget


def _sort_group(g: pd.DataFrame) -> pd.DataFrame:
    return g.sort_values(SORT_COLS, ascending=SORT_ASC, kind="mergesort")


def order_key(row: dict) -> tuple:
    """The one total order used everywhere (negated priority first)."""
    return (-row["priority"], row["depth"], row["url_hash"], row["seed_id"], row["url"])


def candidates_from_urls(rows: list[dict], epoch: int) -> pa.Table:
    """urls+priority+depth+seed_id dicts → FRONTIER-shaped Arrow table."""
    out = {
        "url": [], "url_canon": [], "url_hash": [], "host": [],
        "priority": [], "depth": [], "seed_id": [], "epoch": [],
    }
    for r in rows:
        canon = canonical_url(r["url"])
        out["url"].append(r["url"])
        out["url_canon"].append(canon)
        out["url_hash"].append(url_hash(canon))
        out["host"].append(host_of(r["url"]))
        out["priority"].append(float(r["priority"]))
        out["depth"].append(int(r.get("depth", 0)))
        out["seed_id"].append(int(r.get("seed_id", -1)))
        out["epoch"].append(epoch)
    return pa.table(
        {
            "url": pa.array(out["url"], pa.string()),
            "url_canon": pa.array(out["url_canon"], pa.string()),
            "url_hash": pa.array(out["url_hash"], pa.uint64()),
            "host": pa.array(out["host"], pa.string()),
            "priority": pa.array(out["priority"], pa.float64()),
            "depth": pa.array(out["depth"], pa.int32()),
            "seed_id": pa.array(out["seed_id"], pa.int64()),
            "epoch": pa.array(out["epoch"], pa.int32()),
        }
    )


def dedup_by_url_hash(frontier: "rd.Dataset") -> "rd.Dataset":
    """Exact per-epoch dedup (A4 / J3 exactness layer): one row per url_hash,
    keeping the best by the total order.

    The Ray groupby key is a coarse url_hash partition; the per-key keep-best
    is a vectorized sort + drop_duplicates inside each task (a groupby on the
    raw url_hash would dispatch Python once per distinct URL).
    """

    def add_part(batch: pa.Table) -> pa.Table:
        h = batch.column("url_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
        return batch.append_column(
            "dpart", pa.array((h % np.uint64(NUM_BUDGET_PARTS)).astype(np.int64)))

    def best_per_partition(g: pd.DataFrame) -> pd.DataFrame:
        return (_sort_group(g).drop_duplicates("url_hash", keep="first")
                .drop(columns=["dpart"]))

    return (frontier.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("dpart").map_groups(best_per_partition, batch_format="pandas"))


# per-worker-process memo: ObjectRef -> deserialized BloomFilter (read-only
# in the anti-join; one live epoch summary at a time)
_BLOOM_MEMO: dict = {}


def filter_unseen(frontier: "rd.Dataset", seen_shards: list, bloom_blob: bytes | None,
                  num_shards: int) -> "rd.Dataset":
    """Anti-join against the seen-set shards (J3).

    Worker-side bloom pre-filter (replicated via ``ray.put`` once, not
    re-shipped per batch) answers "definitely unseen" locally; only bloom
    positives RPC the shards, batched per shard.
    """
    bloom_ref = ray.put(bloom_blob)
    shard_handles = list(seen_shards)

    def f(batch: pa.Table) -> pa.Table:
        from sidecar.state import BloomFilter

        hashes = batch.column("url_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(hashes)
        if n == 0:
            return batch
        # fetch + deserialize ONCE per (worker process, epoch summary), not
        # per 8k-row batch — at crawl scale the summary is large, and both
        # the ray.get bytes copy AND BloomFilter.deserialize would otherwise
        # repeat per batch (None — no summary yet — is memoized too)
        if bloom_ref not in _BLOOM_MEMO:
            _BLOOM_MEMO.clear()  # ≤1 live summary per worker (per epoch)
            blob = ray.get(bloom_ref)
            _BLOOM_MEMO[bloom_ref] = (None if blob is None
                                      else BloomFilter.deserialize(blob))
        bf = _BLOOM_MEMO[bloom_ref]
        if bf is None:
            maybe_seen = np.ones(n, dtype=bool)  # no summary yet → ask shards
        else:
            maybe_seen = bf.maybe_contains(hashes)
        seen = np.zeros(n, dtype=bool)
        idx = np.flatnonzero(maybe_seen)
        if len(idx):
            shard_of = (hashes[idx] % np.uint64(num_shards)).astype(np.int64)
            futures, slots = [], []
            for s in range(num_shards):
                rows = idx[shard_of == s]
                if len(rows):
                    futures.append(shard_handles[s].contains_many.remote(hashes[rows]))
                    slots.append(rows)
            for rows, res in zip(slots, ray.get(futures)):
                seen[rows] = res
        return batch.filter(pa.array(~seen))

    return frontier.map_batches(f, batch_format="pyarrow", batch_size=8192,
                                zero_copy_batch=True)


def filter_robots(frontier: "rd.Dataset", host_policies: list, num_actors: int,
                  rules_ref=None) -> "rd.Dataset":
    """Drop rows disallowed by the robots rules.

    The HostPolicy actors OWN the robots cache (they'd fetch/refresh
    robots.txt in a live crawl); each epoch the driver replicates a read-only
    snapshot via ``ray.put`` (``rules_ref``) and workers evaluate locally —
    per-row evaluation inside the fixed-count actor pool was a serial
    fraction that capped crawl-loop scaling.  Denial COUNTS (not rows) are
    folded back per batch with one O(1) ``note_denied`` RPC, so the actors'
    metrics stay authoritative.  Falls back to in-actor evaluation when no
    snapshot is provided (legacy path, used by tests that probe the actors).
    """
    handles = list(host_policies)

    if rules_ref is None:
        def f_actor(batch: pa.Table) -> pa.Table:
            from sidecar.actors import host_shard
            from urllib.parse import urlsplit

            hosts = batch.column("host").to_pylist()
            paths = [urlsplit(u).path or "/" for u in batch.column("url_canon").to_pylist()]
            n = len(hosts)
            denied = np.zeros(n, dtype=bool)
            by_actor: dict[int, list[int]] = {}
            for i, h in enumerate(hosts):
                by_actor.setdefault(host_shard(h, num_actors), []).append(i)
            futures, slots = [], []
            for a, rows in by_actor.items():
                futures.append(
                    handles[a].robots_disallowed.remote(
                        [hosts[i] for i in rows], [paths[i] for i in rows]
                    )
                )
                slots.append(rows)
            for rows, res in zip(slots, ray.get(futures)):
                for i, bad in zip(rows, res):
                    denied[i] = bad
            return batch.filter(pa.array(~denied))

        return frontier.map_batches(f_actor, batch_format="pyarrow", batch_size=8192,
                                    zero_copy_batch=True)

    def f(batch: pa.Table) -> pa.Table:
        from sidecar.robots import is_allowed
        from urllib.parse import urlsplit

        rules = ray.get(rules_ref)  # node-local after first fetch
        hosts = batch.column("host").to_pylist()
        n = len(hosts)
        denied = np.zeros(n, dtype=bool)
        # evaluate per (host, path); memoize within the batch — frontier
        # batches repeat hosts heavily and paths are synthetic templates
        memo: dict[tuple[str, str], bool] = {}
        for i, (host, u) in enumerate(zip(hosts, batch.column("url_canon").to_pylist())):
            path = urlsplit(u).path or "/"
            key = (host, path)
            bad = memo.get(key)
            if bad is None:
                bad = memo[key] = not is_allowed(rules.get(host, []), path)
            denied[i] = bad
        n_denied = int(denied.sum())
        if n_denied:
            # attribute counts to the denied hosts' cache shards (O(1) actor work)
            import hashlib

            from sidecar.actors import host_shard

            per_actor: dict[int, int] = {}
            for host in (hosts[i] for i in np.flatnonzero(denied)):
                a = host_shard(host, num_actors)
                per_actor[a] = per_actor.get(a, 0) + 1
            # idempotency key = (task id, content hash over url_hash +
            # seed_id + depth): a Ray retry re-executes the SAME task id
            # with the same batches, so the key re-reports and the actor
            # drops it — while two distinct logical batches with identical
            # content land in different tasks and both count.  Hashing the
            # discovery coordinates too (not url_hash alone) means even two
            # same-task batch slices full of one hot duplicated URL collide
            # only if every row is a FULL duplicate — which upstream link
            # discovery cannot emit for one (source, j) twice.  No
            # per-process state: any re-execution, warm worker or fresh,
            # reproduces the same key.
            tid = ray.get_runtime_context().get_task_id() or "driver"
            hh = hashlib.blake2b(digest_size=8)
            hh.update(batch.column("url_hash").to_numpy(zero_copy_only=False)
                      .astype(np.uint64).tobytes())
            for extra in ("seed_id", "depth"):
                if extra in batch.column_names:
                    hh.update(batch.column(extra)
                              .to_numpy(zero_copy_only=False)
                              .astype(np.int64).tobytes())
            bkey = f"{tid}:{hh.hexdigest()}"
            ep = (int(batch.column("epoch")[0].as_py())
                  if "epoch" in batch.column_names and batch.num_rows else None)
            # awaited so the counts land before the epoch-end metrics read
            ray.get([handles[a].note_denied.remote(c, bkey, ep)
                     for a, c in per_actor.items()])
        return batch.filter(pa.array(~denied))

    return frontier.map_batches(f, batch_format="pyarrow", batch_size=8192,
                                zero_copy_batch=True)


SMALL_FRONTIER_ROWS = 20_000  # below this, driver-side ranking beats 2 shuffles


def select_budget(frontier: "rd.Dataset", budget: int,
                  n_salts: int = 16, dedup: bool = False,
                  size_hint: int | None = None,
                  policy=None) -> "rd.Dataset":
    """Politeness top-k per host with hot-host skew splitting (A4, §2.6).

    Stage 1 groups by ``(host, salt)`` (salt = url_hash % n_salts) and marks
    each group's local top-``budget`` as finalists — so a hot host's million
    candidates are ranked in parallel sub-groups, none bigger than
    group/n_salts.  Stage 2 ranks only the ≤ budget×n_salts finalists per
    host.  Rows keep a ``selected`` flag; non-selected rows are the leftover
    frontier (the persistent priority queue).  Top-k(host) ≡ top-k of the
    union of per-salt top-k, so salting never changes the selection.

    ``dedup=True`` folds the exact url_hash dedup (A4's groupby(url_hash),
    keep-best-by-total-order) into stage 1 — duplicates of a url_hash always
    share (host, salt), so this is exactly equivalent to a separate
    groupby(url_hash) pass but saves one all-to-all per epoch.

    ``size_hint`` (an upper bound on input rows, known by the caller from
    checkpoint metadata) enables the adaptive small-input plan: below
    SMALL_FRONTIER_ROWS the whole ranking runs driver-side in one vectorized
    pandas pass (identical semantics — the selection math is the same code
    path shapes; proven equal by the bit-for-bit tests) instead of paying
    two all-to-all barrier constants on a few thousand metadata rows.

    ``policy`` (a ``sidecar.policy.FrontierPolicy``) overrides the constant
    per-host budget via its vectorized ``host_budget`` hook; ``None`` keeps
    the scalar fast path.
    """

    def _budgets(hosts) -> "int | np.ndarray":
        if policy is None:
            return budget
        return policy.host_budget(np.asarray(hosts), budget)

    if size_hint is not None and size_hint <= SMALL_FRONTIER_ROWS:
        df = frontier.to_pandas()  # executes the (narrow) upstream filters once
        if len(df) == 0:
            # shape parity with the selected path: downstream splitters read
            # t['selected'] even on an all-filtered tail epoch
            df = df.assign(selected=pd.Series([], dtype=bool))
            return rd.from_pandas(df.reset_index(drop=True))
        h = df["url_hash"].to_numpy().astype(np.uint64)
        df = df.assign(salt=(h % np.uint64(n_salts)).astype(np.int32))
        df = _sort_group(df)
        if dedup:
            df = df.drop_duplicates("url_hash", keep="first")
        df = df.copy()
        bud = _budgets(df["host"].to_numpy())
        df["finalist"] = df.groupby(["host", "salt"], sort=False).cumcount().to_numpy() < bud
        fin_rank = (df.groupby("host", sort=False)["finalist"].cumsum()
                    - df["finalist"].astype(int))
        df["selected"] = df["finalist"].to_numpy() & (fin_rank.to_numpy() < bud)
        df = df.drop(columns=["salt", "finalist"])
        return rd.from_pandas(df.reset_index(drop=True))


    # Ray-level grouping uses COARSE partition keys (≤ NUM_BUDGET_PARTS
    # groups per stage); the exact (host, salt) / host grouping happens
    # vectorized INSIDE each task via sort + groupby().cumcount() — per-group
    # Python dispatch over (hosts × salts) tiny groups dominated wall time
    # otherwise (measured 13-17s → ~4s for a 400k-row frontier at 32 CPUs).
    from zlib import crc32

    def with_keys(batch: pa.Table) -> pa.Table:
        h = batch.column("url_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
        salt = (h % np.uint64(n_salts)).astype(np.int32)
        hp = np.array([crc32(x.encode()) for x in batch.column("host").to_pylist()],
                      dtype=np.int64)
        part1 = ((hp * np.int64(31) + salt) % NUM_BUDGET_PARTS).astype(np.int64)
        part2 = (hp % NUM_BUDGET_PARTS).astype(np.int64)
        t = batch.append_column("salt", pa.array(salt))
        t = t.append_column("part1", pa.array(part1))
        return t.append_column("part2", pa.array(part2))

    def stage1(g: pd.DataFrame) -> pd.DataFrame:
        g = _sort_group(g)
        if dedup:  # first row per url_hash is the best (total-order sorted)
            g = g.drop_duplicates("url_hash", keep="first")
        g = g.copy()
        bud = _budgets(g["host"].to_numpy())
        g["finalist"] = g.groupby(["host", "salt"], sort=False).cumcount().to_numpy() < bud
        return g.drop(columns=["part1"])

    def stage2(g: pd.DataFrame) -> pd.DataFrame:
        g = _sort_group(g).copy()
        # rank finalists per host in total order; cumsum counts only them
        fin_rank = (g.groupby("host", sort=False)["finalist"]
                    .cumsum() - g["finalist"].astype(int))
        bud = _budgets(g["host"].to_numpy())
        g["selected"] = g["finalist"].to_numpy() & (fin_rank.to_numpy() < bud)
        return g.drop(columns=["salt", "finalist", "part2"])

    keyed = frontier.map_batches(with_keys, batch_format="pyarrow", zero_copy_batch=True)
    ranked = keyed.groupby("part1").map_groups(stage1, batch_format="pandas")
    return ranked.groupby("part2").map_groups(stage2, batch_format="pandas")


def discover_links(selected: "rd.Dataset", epoch: int, n_hosts: int, seed: int,
                   policy=None, graph: str = "b2",
                   hot_frac: int = 4) -> "rd.Dataset":
    """Deterministic link discovery from the fetched set (ST7's discovery
    half): one flat_map-shaped map_batches emitting next-epoch candidates.
    ``policy`` (a ``sidecar.policy.FrontierPolicy``) rewrites the
    graph-emitted link priorities via its vectorized ``link_priority``."""

    def f(batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for canon, depth, seed_id in zip(
            batch.column("url_canon").to_pylist(),
            batch.column("depth").to_pylist(),
            batch.column("seed_id").to_pylist(),
        ):
            for link_url, prio in synth.out_links(canon, n_hosts=n_hosts,
                                                  seed=seed, graph=graph,
                                                  hot_frac=hot_frac):
                rows.append(
                    {"url": link_url, "priority": prio, "depth": depth + 1,
                     "seed_id": seed_id}
                )
        if policy is not None and rows:
            new_p = policy.link_priority(
                [r["url"] for r in rows],
                np.array([r["priority"] for r in rows], dtype=np.float64),
                np.array([r["depth"] for r in rows], dtype=np.int64),
            )
            for r, p in zip(rows, new_p):
                r["priority"] = float(p)
        return candidates_from_urls(rows, epoch + 1)

    return selected.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
