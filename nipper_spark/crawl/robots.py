"""robots.txt parsing → per-host disallow rules + politeness budgets.

The north star requires "per-host politeness/robots budgets". The
engine closes the loop from the corpus itself: hosts' robots.txt
bodies (rows of the pages table at ``http://host/robots.txt``) parse
into (a) disallow path prefixes and (b) a Crawl-delay that converts to
a per-round token budget (round_seconds / delay). Both merge into the
same :class:`CrawlPolicy` the engine AND the single-threaded oracle
execute, so robots handling can never diverge between them.

Parser and matcher follow RFC 9309 (User-agent groups, Disallow/Allow
rules with ``*`` any-sequence and trailing ``$`` end-anchor wildcards,
Crawl-delay): the most specific (longest) matching rule wins, Allow
winning length ties. The pure :func:`rule_matches` kernel is shared by
the dict policy, the single-threaded oracle, and — via the SQL LIKE
translation :func:`rule_to_like` — the distributed per-host rules-table
filter, so robots semantics cannot diverge between them.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from nipper_spark.crawl.politeness import (  # noqa: F401 — re-exports
    CrawlPolicy, robots_decision, rule_matches, rule_to_like)
from nipper_spark.functions.url import host_of


@dataclass
class RobotsRules:
    disallow: list[str] = field(default_factory=list)
    allow: list[str] = field(default_factory=list)
    crawl_delay: float | None = None
    # `Sitemap:` advertisements are GLOBAL records (sitemaps.org: they
    # are independent of any user-agent group), carried on whatever
    # group parse_robots_txt returns
    sitemaps: list[str] = field(default_factory=list)

    def allowed(self, path: str) -> bool:
        return robots_decision(self.disallow, self.allow, path)


def parse_robots_txt(text: str | bytes, agent: str = "*") -> RobotsRules:
    """Parse one robots.txt body for the given user-agent (falls back
    to the ``*`` group)."""
    if isinstance(text, (bytes, bytearray)):
        text = bytes(text).decode("utf-8", errors="replace")
    # real-world robots.txt files frequently start with a UTF-8 BOM;
    # without stripping it the first line's key becomes "﻿user-
    # agent" and the whole first group is silently ignored
    text = text.lstrip("﻿")
    groups: dict[str, RobotsRules] = {}
    current: list[str] = []
    last_was_agent = False
    sitemaps: list[str] = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "sitemap":
            # global record: legal before any group and outside all of
            # them; full absolute URL (the value itself contains ':')
            if val and val not in sitemaps:
                sitemaps.append(val)
            last_was_agent = False
            continue
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
    # RFC 9309 §2.2.1: the crawler obeys the group with the MOST
    # SPECIFIC matching user-agent — a group token matches when it is
    # a case-insensitive prefix of the crawler's product token ending
    # at a token boundary ("googlebot" matches agent "googlebot-news";
    # "googlebot-n" does not); exact match is the longest possible.
    # No match → the "*" group.
    a = agent.lower()
    best = None
    for name in groups:
        if name == "*":
            continue
        if a == name or (a.startswith(name)
                         and a[len(name)] in "-_/ ."):
            if best is None or len(name) > len(best):
                best = name
    out = groups.get(best) if best is not None else \
        groups.get("*", RobotsRules())
    if out is None:
        out = RobotsRules()
    out.sitemaps = sitemaps
    return out


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
                if p not in merged:
                    merged.append(p)
            policy.robots_disallow[host] = merged
        if rules.allow:
            merged_a = policy.robots_allow.get(host, [])
            for p in rules.allow:
                if p not in merged_a:
                    merged_a.append(p)
            policy.robots_allow[host] = merged_a
        if rules.crawl_delay and rules.crawl_delay > 0:
            budget = max(1, math.floor(round_seconds / rules.crawl_delay))
            cur = policy.host_tokens.get(host, policy.default_tokens)
            policy.host_tokens[host] = min(cur, budget)
    return policy


_HARVEST_SCHEMA = ("host string, prefix string, allow boolean, "
                   "tokens int")


def harvest_robots_tables(pages_df, agent: str = "*",
                          round_seconds: float = 60.0,
                          default_tokens: int = 4):
    """Executor-side harvest: robots.txt rows parse inside a
    ``mapInPandas`` pass (same ``parse_robots_txt`` kernel the oracle
    uses) and come back as two per-host DATAFRAMES — never as driver
    dicts, never as robots.txt bodies collected to the driver:

        rules:   (host, prefix, allow)  RFC 9309 rules, both kinds
        budgets: (host, tokens)         min(default, ⌊round_seconds/delay⌋)

    Both are host-keyed tables the engine joins like any other
    dimension, so 10^8 polite hosts cost a bucketed join, not an
    analyzer-killing literal expression or a driver OOM. The oracle
    twin reads the SAME tables via :func:`policy_from_tables`
    (collect — the oracle is single-threaded and test-scale by
    definition)."""
    from pyspark.sql import functions as F

    robots = (pages_df
              .filter(F.col("url").endswith("/robots.txt"))
              .select("url", "html"))

    def _parse(batches):
        import pandas as pd
        for pdf in batches:
            hosts, prefixes, allows, tokens = [], [], [], []
            for url, body in zip(pdf["url"], pdf["html"]):
                host = host_of(url)
                if not host:
                    continue
                rules = parse_robots_txt(
                    body if body is not None else b"", agent)
                for p in dict.fromkeys(rules.disallow):
                    hosts.append(host)
                    prefixes.append(p)
                    allows.append(False)
                    tokens.append(None)
                for p in dict.fromkeys(rules.allow):
                    hosts.append(host)
                    prefixes.append(p)
                    allows.append(True)
                    tokens.append(None)
                if rules.crawl_delay and rules.crawl_delay > 0:
                    budget = max(1, math.floor(
                        round_seconds / rules.crawl_delay))
                    hosts.append(host)
                    prefixes.append(None)
                    allows.append(None)
                    tokens.append(min(default_tokens, budget))
            yield pd.DataFrame({"host": hosts, "prefix": prefixes,
                                "allow": pd.array(allows,
                                                  dtype="boolean"),
                                "tokens": pd.array(tokens,
                                                   dtype="Int32")})

    # lazy localCheckpoint: the first action runs the (whole-table-
    # scanning) parse once; the rules/budgets branches then both read
    # the materialized result instead of re-scanning pages
    harvested = robots.mapInPandas(_parse, schema=_HARVEST_SCHEMA) \
        .localCheckpoint(eager=False)
    rules_df = (harvested.filter(F.col("prefix").isNotNull())
                .select("host", "prefix", "allow").distinct())
    budgets_df = (harvested.filter(F.col("tokens").isNotNull())
                  .groupBy("host").agg(F.min("tokens").alias("tokens")))
    return rules_df, budgets_df


POLICY_COLLECT_MAX_ROWS = 1_000_000


def policy_from_tables(policy: CrawlPolicy, rules_df, budgets_df,
                       max_rows: int = POLICY_COLLECT_MAX_ROWS
                       ) -> CrawlPolicy:
    """Fold harvested TABLES into a dict-backed policy for the
    single-threaded oracle (and for seed filtering) — a test-scale
    collect by definition; the distributed engine never calls this.

    The contract is enforced structurally: each collect goes through a
    ``limit(max_rows + 1)`` and raises if the table exceeds the bound,
    so an engine-path caller at corpus scale fails fast instead of
    OOMing the driver."""
    def _bounded(df, name):
        rows = df.limit(max_rows + 1).collect()
        if len(rows) > max_rows:
            raise ValueError(
                f"policy_from_tables: {name} exceeds {max_rows} rows — "
                "this oracle-twin helper collects to the driver; the "
                "distributed engine must join the tables instead "
                "(FrontierEngine(rules=..., budgets=...))")
        return rows

    has_allow_col = "allow" in rules_df.columns
    for r in _bounded(rules_df, "rules_df"):
        if has_allow_col and r["allow"]:
            policy.robots_allow.setdefault(r["host"], []).append(
                r["prefix"])
        else:
            policy.robots_disallow.setdefault(r["host"], []).append(
                r["prefix"])
    for h in policy.robots_disallow:
        policy.robots_disallow[h] = sorted(policy.robots_disallow[h])
    for h in policy.robots_allow:
        policy.robots_allow[h] = sorted(policy.robots_allow[h])
    for r in _bounded(budgets_df, "budgets_df"):
        cur = policy.host_tokens.get(r["host"], policy.default_tokens)
        policy.host_tokens[r["host"]] = min(cur, int(r["tokens"]))
    return policy


def harvest_robots_from_pages(pages_df, policy: CrawlPolicy,
                              agent: str = "*",
                              round_seconds: float = 60.0) -> CrawlPolicy:
    """Dict-policy convenience on top of the table harvest (parse still
    happens executor-side; only the parsed per-host RULES are
    collected, bounded by rule count — suitable for config-scale host
    counts and for building the oracle's policy)."""
    rules_df, budgets_df = harvest_robots_tables(
        pages_df, agent, round_seconds,
        default_tokens=policy.default_tokens)
    return policy_from_tables(policy, rules_df, budgets_df)


def robots_sitemap_seeds(pages_df, agent: str = "*"):
    """Executor-side harvest of `Sitemap:` advertisements from the
    robots.txt rows of the pages table — the sitemaps.org discovery
    channel that complements URL-pattern discovery
    (`sitemaps.harvest_sitemap_tables`): sites advertise their
    sitemap's location in robots.txt precisely because its filename is
    not guessable.

    Returns a (host, url) DataFrame: canonicalized, SAME-HOST filtered
    (the engine's sitemap trust policy — a cross-host advertisement
    requires the cross-host submission handshake this engine does not
    model), deduplicated. Rows feed `frontier.bootstrap_from_df` (add
    score/depth) or union with the pattern-harvest entries table.

    Caveat (documented): the fetch dispatch heuristic
    (`sitemaps.is_sitemap_url`) routes by URL path pattern, so an
    advertised sitemap at a non-sitemap-looking path schedules but
    parses as HTML; advertised sitemaps matching the pattern get the
    full recursive treatment."""
    from pyspark.sql import functions as F

    from nipper_spark.functions.url import canonicalize_url

    robots = (pages_df
              .filter(F.col("url").endswith("/robots.txt"))
              .select("url", "html"))

    def _parse(batches):
        import pandas as pd
        for pdf in batches:
            hosts, urls = [], []
            for url, body in zip(pdf["url"], pdf["html"]):
                host = host_of(url)
                if not host:
                    continue
                rules = parse_robots_txt(
                    body if body is not None else b"", "*")
                for ad in rules.sitemaps:
                    canon = canonicalize_url(ad)
                    if canon is None or host_of(canon) != host:
                        continue
                    hosts.append(host)
                    urls.append(canon)
            yield pd.DataFrame({"host": hosts, "url": urls})

    return (robots.mapInPandas(_parse, schema="host string, url string")
            .dropDuplicates(["host", "url"]))


def synth_robots_sitemap_rows(n_hosts: int = 6) -> list[tuple]:
    """Deterministic robots.txt pages-table rows (PAGES_SCHEMA shape)
    for the sitemap-advertisement driver query and its oracle twin.
    Per host: a global advertisement BEFORE any group, one mid-group,
    a cross-host spam advertisement (must be dropped), a duplicate,
    and a non-canonical form (uppercase host, default port) that must
    canonicalize."""
    import datetime

    ts = datetime.datetime(2026, 1, 1)
    rows = []
    for h in range(n_hosts):
        host = f"rsm{h:02d}.test"
        body = (
            f"Sitemap: http://{host}/sitemap-main.xml\n"
            "User-agent: *\n"
            "Disallow: /private\n"
            f"Sitemap: HTTP://{host.upper()}:80/sitemap-news.xml\n"
            f"Sitemap: http://evil{h}.test/sitemap.xml\n"
            f"Sitemap: http://{host}/sitemap-main.xml\n"
            "\n"
            "User-agent: bot\n"
            "Disallow: /\n")
        rows.append((f"http://{host}/robots.txt", ts, body.encode(),
                     None, "en"))
    return rows
