"""Single-threaded pure-Python reference crawler (SURVEY.md §5.2 #2).

Defines the crawl semantics the Ray engine must reproduce **bit-for-bit**
(BASELINE.json:north_rule): same canonicalization, same total order, same
politeness budget, same robots rules, same deterministic fetcher/detectors.
~150 LoC, no Ray, no parallelism — the trusted executable specification.
"""

from __future__ import annotations

from urllib.parse import urlsplit

from sidecar import synth
from sidecar.canon import canonical_url, host_of, url_hash
from sidecar.frontier import order_key


def _mk_candidate(url: str, priority: float, depth: int, seed_id: int) -> dict:
    canon = canonical_url(url)
    return {
        "url": url,
        "url_canon": canon,
        "url_hash": url_hash(canon),
        "host": host_of(url),
        "priority": float(priority),
        "depth": int(depth),
        "seed_id": int(seed_id),
    }


def crawl(
    n_seeds: int = 100,
    n_hosts: int = 20,
    budget_per_host: int = 5,
    max_epochs: int = 3,
    max_depth: int = 3,
    seed: int = 42,
    policy=None,
    graph: str = "b2",
    hot_frac: int = 4,
) -> dict:
    """Run the reference crawl; returns
    ``{"crawl_order": [[url_canon,...] per epoch], "seen": sorted url_hash
    list, "fetched": {url_canon: sidecar-relevant fields}, "metrics": [...]}``.
    """
    robots = synth.robots_rules(n_hosts=n_hosts, seed=seed, graph=graph)
    seen: set[int] = set()
    frontier: list[dict] = [
        _mk_candidate(s["url"], s["priority"], 0, s["seed_id"])
        for s in synth.make_seeds(n_seeds, n_hosts, seed, graph)
    ]
    crawl_order: list[list[str]] = []
    metrics: list[dict] = []
    fetched: dict[str, dict] = {}

    for epoch in range(max_epochs):
        if not frontier:
            break
        m = {"epoch": epoch, "candidates": len(frontier)}

        # 1. exact dedup by url_hash, best row by the total order
        best: dict[int, dict] = {}
        for c in frontier:
            cur = best.get(c["url_hash"])
            if cur is None or order_key(c) < order_key(cur):
                best[c["url_hash"]] = c
        cands = list(best.values())
        m["after_dedup"] = len(cands)

        # 2. anti-join vs seen set
        cands = [c for c in cands if c["url_hash"] not in seen]
        m["unseen"] = len(cands)

        # 3. robots filter
        def allowed(c: dict) -> bool:
            path = urlsplit(c["url_canon"]).path or "/"
            from sidecar.robots import is_allowed

            return is_allowed(robots.get(c["host"], []), path)

        cands = [c for c in cands if allowed(c)]
        m["after_robots"] = len(cands)

        # 4. politeness: top-k per host by the total order
        by_host: dict[str, list[dict]] = {}
        for c in cands:
            by_host.setdefault(c["host"], []).append(c)
        selected: list[dict] = []
        leftover: list[dict] = []
        for host in by_host:
            rows = sorted(by_host[host], key=order_key)
            if policy is None:
                bud = budget_per_host
            else:
                import numpy as np

                bud = int(policy.host_budget(np.array([host]), budget_per_host)[0])
            selected.extend(rows[:bud])
            leftover.extend(rows[bud:])
        selected.sort(key=order_key)
        m["selected"] = len(selected)
        m["leftover"] = len(leftover)

        # 5. fetch + mark seen; record crawl order
        crawl_order.append([c["url_canon"] for c in selected])
        links: list[dict] = []
        for c in selected:
            seen.add(c["url_hash"])
            row = synth.fetch_url(c["url_canon"], seed)
            fetched[c["url_canon"]] = {
                "payload_len": len(row["bytes"]),
                "fmt": row["fmt"],
                "phash": row["phash"],
                "w": row["w"],
                "h": row["h"],
                "caption": row["caption"],
            }
            if c["depth"] < max_depth:
                for link_url, prio in synth.out_links(c["url_canon"], n_hosts,
                                                      seed, graph, hot_frac):
                    if policy is not None:
                        import numpy as np

                        prio = float(policy.link_priority(
                            [link_url], np.array([prio], dtype=np.float64),
                            np.array([c["depth"] + 1], dtype=np.int64))[0])
                    links.append(_mk_candidate(link_url, prio, c["depth"] + 1, c["seed_id"]))
        m["links"] = len(links)
        metrics.append(m)

        frontier = leftover + links

    return {
        "crawl_order": crawl_order,
        "seen": sorted(seen),
        "fetched": fetched,
        "metrics": metrics,
    }
