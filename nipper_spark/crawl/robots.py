"""robots.txt parsing → per-host disallow rules + politeness budgets.

The north star requires "per-host politeness/robots budgets". The
engine closes the loop from the corpus itself: hosts' robots.txt
bodies (rows of the pages table at ``http://host/robots.txt``) parse
into (a) disallow path prefixes and (b) a Crawl-delay that converts to
a per-round token budget (round_seconds / delay). Both merge into the
same :class:`CrawlPolicy` the engine AND the single-threaded oracle
execute, so robots handling can never diverge between them.

Parser follows the original REP (User-agent groups, Disallow/Allow
prefixes, Crawl-delay); longest-prefix Allow precedence is
approximated by treating an exact-prefix Allow as an exemption only
when it is longer than the matching Disallow — the common case in
practice and the one the fixtures pin.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from nipper_spark.crawl.politeness import CrawlPolicy
from nipper_spark.functions.url import host_of


@dataclass
class RobotsRules:
    disallow: list[str] = field(default_factory=list)
    allow: list[str] = field(default_factory=list)
    crawl_delay: float | None = None

    def allowed(self, path: str) -> bool:
        best_dis = max((len(p) for p in self.disallow
                        if p and path.startswith(p)), default=-1)
        if best_dis < 0:
            return True
        best_allow = max((len(p) for p in self.allow
                          if p and path.startswith(p)), default=-1)
        return best_allow > best_dis


def parse_robots_txt(text: str | bytes, agent: str = "*") -> RobotsRules:
    """Parse one robots.txt body for the given user-agent (falls back
    to the ``*`` group)."""
    if isinstance(text, (bytes, bytearray)):
        text = bytes(text).decode("utf-8", errors="replace")
    groups: dict[str, RobotsRules] = {}
    current: list[str] = []
    last_was_agent = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            name = val.lower()
            if not last_was_agent:
                current = []
            current.append(name)
            groups.setdefault(name, RobotsRules())
            last_was_agent = True
            continue
        last_was_agent = False
        if not current:
            continue
        for name in current:
            g = groups[name]
            if key == "disallow" and val:
                g.disallow.append(val)
            elif key == "allow" and val:
                g.allow.append(val)
            elif key == "crawl-delay":
                try:
                    g.crawl_delay = float(val)
                except ValueError:
                    pass
    return groups.get(agent.lower(), groups.get("*", RobotsRules()))


def harvest_robots(pages_rows: list[tuple[str, str | bytes]],
                   policy: CrawlPolicy, agent: str = "*",
                   round_seconds: float = 60.0) -> CrawlPolicy:
    """Fold (url, body) robots.txt rows into a policy: disallow
    prefixes extend ``robots_disallow``; Crawl-delay caps the host's
    per-round tokens at ``round_seconds / delay`` (min 1)."""
    for url, body in pages_rows:
        host = host_of(url)
        if not host:
            continue
        rules = parse_robots_txt(body, agent)
        if rules.disallow:
            merged = policy.robots_disallow.get(host, [])
            for p in rules.disallow:
                if not any(p.startswith(a) for a in rules.allow):
                    if p not in merged:
                        merged.append(p)
            policy.robots_disallow[host] = merged
        if rules.crawl_delay and rules.crawl_delay > 0:
            budget = max(1, math.floor(round_seconds / rules.crawl_delay))
            cur = policy.host_tokens.get(host, policy.default_tokens)
            policy.host_tokens[host] = min(cur, budget)
    return policy


def harvest_robots_from_pages(pages_df, policy: CrawlPolicy,
                              agent: str = "*",
                              round_seconds: float = 60.0) -> CrawlPolicy:
    """Spark-side harvest: robots.txt rows are a tiny, pushdown-pruned
    slice of the pages table (one row per host), collected to the
    driver because the policy itself is broadcast-scale state."""
    from pyspark.sql import functions as F
    rows = (pages_df
            .filter(F.col("url").endswith("/robots.txt"))
            .select("url", "html").collect())
    return harvest_robots([(r["url"], r["html"]) for r in rows],
                          policy, agent, round_seconds)
