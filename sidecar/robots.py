"""RFC 9309-style robots.txt parsing and matching (from scratch).

The reference repo has no robots handling; BASELINE.json's north_rule
mandates "robots.txt caches held in Ray actor pools".  This module is the
shared evaluation core — the HostPolicy actors AND the single-threaded
oracle both call :func:`is_allowed`, which is what keeps the crawl
bit-for-bit reproducible when robots semantics get richer.

Semantics implemented (the REP rules that matter for matching):
- group selection by ``User-agent`` (exact agent, else ``*`` group);
  consecutive UA lines share one group
- ``Allow`` / ``Disallow`` path rules; empty ``Disallow:`` = allow all
- ``*`` wildcard matches any char sequence; ``$`` anchors end-of-path
- longest-match wins (by literal rule length); on equal length Allow wins
- no matching rule → allowed
"""

from __future__ import annotations

import re


def parse_robots(text: str, agent: str = "*") -> list[tuple[str, bool]]:
    """robots.txt text → list of (path_rule, is_allow) for ``agent``.

    Exact-agent group preferred over the ``*`` group (RFC 9309 §2.2.1);
    rules keep their textual form — matching happens in :func:`is_allowed`.
    """
    groups: dict[str, list[tuple[str, bool]]] = {}
    current_agents: list[str] = []
    last_was_ua = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, value = line.split(":", 1)
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not last_was_ua:
                current_agents = []
            current_agents.append(value.lower())
            for a in current_agents:
                groups.setdefault(a, [])
            last_was_ua = True
        elif field in ("allow", "disallow"):
            last_was_ua = False
            if not current_agents:
                continue
            if field == "disallow" and value == "":
                continue  # empty Disallow ≡ allow everything (no rule)
            for a in current_agents:
                groups.setdefault(a, []).append((value, field == "allow"))
        else:
            last_was_ua = False
    a = agent.lower()
    if a in groups:
        return groups[a]
    return groups.get("*", [])


def _rule_matches(rule: str, path: str) -> bool:
    if "*" not in rule and not rule.endswith("$"):
        return path.startswith(rule)
    pat = re.escape(rule).replace(r"\*", ".*")
    if pat.endswith(r"\$"):
        pat = pat[:-2] + "$"
    return re.match(pat, path) is not None


def _rule_length(rule: str) -> int:
    """Specificity = length of the rule sans the trailing $ (REP practice)."""
    return len(rule[:-1]) if rule.endswith("$") else len(rule)


def is_allowed(rules: list[tuple[str, bool]], path: str) -> bool:
    """Longest-match evaluation; Allow wins length ties; default allowed."""
    best_len = -1
    best_allow = True
    for rule, allow in rules:
        if _rule_matches(rule, path):
            ln = _rule_length(rule)
            if ln > best_len or (ln == best_len and allow and not best_allow):
                best_len = ln
                best_allow = allow
    return best_allow
