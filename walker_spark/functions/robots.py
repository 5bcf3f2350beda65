"""robots.txt parsing + testing (pure Python, vectorizable).

Reimplements from public knowledge the observable behavior walker gets
from the temoto/robotstxt library (reference usage: fetcher.go:656-721):

* group selection: the group whose ``User-agent`` token is the longest
  case-insensitive prefix of our agent string wins; ``*`` is the
  fallback (REP, RFC 9309 §2.2.1).
* rule matching: ``Allow``/``Disallow`` path rules with ``*`` wildcards
  and ``$`` end anchors; the longest-pattern match takes precedence and
  ``Allow`` wins ties (RFC 9309 §2.2.2). Empty ``Disallow:`` means
  allow-all.
* ``Crawl-delay`` per group, seconds (float accepted); the fetcher caps
  it at ``max_crawl_delay`` (fetcher.go:714-718).
* A 4xx/failed robots fetch means "no robots.txt": default group with
  no rules and the default crawl delay (fetcher.go:698-706).

Rules serialize to/from JSON so they can ride a broadcast-joined
DataFrame column (SURVEY §2.1/S11: robots rules travel as a broadcast
map keyed by host).
"""

from __future__ import annotations

import json
import re


def parse_robots_txt(body: str, user_agent: str = "Walker") -> tuple[list[tuple[bool, str]], float | None]:
    """Parse robots.txt, returning (rules, crawl_delay) for the group
    matching ``user_agent``. Rules are (allow, pattern) in file order;
    crawl_delay is None when unspecified."""
    groups: list[dict] = []  # {"agents": [...], "rules": [...], "delay": ...}
    current: dict | None = None
    last_was_agent = False
    for raw_line in body.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if current is None or not last_was_agent:
                current = {"agents": [], "rules": [], "delay": None}
                groups.append(current)
            current["agents"].append(val.lower())
            last_was_agent = True
        else:
            last_was_agent = False
            if current is None:
                continue
            if key in ("allow", "disallow"):
                current["rules"].append((key == "allow", val))
            elif key == "crawl-delay":
                try:
                    current["delay"] = float(val)
                except ValueError:
                    pass

    ua = user_agent.lower()
    best: dict | None = None
    best_len = -1
    for g in groups:
        for agent in g["agents"]:
            if agent == "*":
                if best_len < 0:
                    best, best_len = g, 0
            elif ua.startswith(agent) and len(agent) > best_len:
                best, best_len = g, len(agent)
    if best is None:
        return [], None
    # empty Disallow == allow everything; drop it (it matches nothing)
    rules = [(a, p) for (a, p) in best["rules"] if p]
    return rules, best["delay"]


def _compile_pattern(pattern: str) -> re.Pattern:
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = [re.escape(chunk) for chunk in pattern.split("*")]
    regex = "^" + ".*".join(parts) + ("$" if anchored else "")
    return re.compile(regex)


class RobotsGroup:
    """Compiled per-host rule set; ``test(path)`` mirrors
    robots.Test(link.RequestURI()) in fetcher.go:531."""

    __slots__ = ("rules", "crawl_delay")

    def __init__(self, rules: list[tuple[bool, str]], crawl_delay: float | None):
        self.rules = [(allow, len(p), _compile_pattern(p)) for (allow, p) in rules]
        self.crawl_delay = crawl_delay

    def test(self, path: str) -> bool:
        best_allow = True  # no matching rule -> allowed
        best_len = -1
        for allow, plen, rx in self.rules:
            if rx.match(path):
                if plen > best_len or (plen == best_len and allow and not best_allow):
                    best_allow, best_len = allow, plen
        return best_allow

    # -- JSON round-trip for the broadcast column --
    def to_json(self) -> str:
        return json.dumps([[a, rx.pattern] for (a, _, rx) in self.rules])

    @classmethod
    def from_json(cls, rules_json: str, crawl_delay: float | None = None) -> "RobotsGroup":
        g = cls.__new__(cls)
        g.rules = [(a, len(p), re.compile(p)) for (a, p) in json.loads(rules_json)]
        g.crawl_delay = crawl_delay
        return g


ALLOW_ALL = RobotsGroup([], None)


def group_for(body: str | None, user_agent: str = "Walker") -> RobotsGroup:
    """Build the effective group for one host's robots.txt body
    (None/unparseable -> default allow-all group)."""
    if body is None:
        return ALLOW_ALL
    try:
        rules, delay = parse_robots_txt(body, user_agent)
    except Exception:
        return ALLOW_ALL
    return RobotsGroup(rules, delay)
