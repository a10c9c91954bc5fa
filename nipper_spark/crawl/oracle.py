"""Single-threaded crawl oracle.

A sequential reference implementation of exactly the semantics the
Spark frontier engine distributes. It shares the *same* pure kernels —
``extract_text_and_links`` (parse + select + canonicalize) and the
``CrawlPolicy`` budget/robots rules — so any divergence between engine
and oracle isolates a distribution bug (ordering, dedup, partitioning),
never a semantics bug. This is the fixture generator for
FIXTURES.md §5 (expected_order / expected_seen) and the correctness
gate for the north rule ("matching the reference's crawl ordering and
URL-seen set under the same seed list + politeness budget").
"""

from __future__ import annotations

from dataclasses import dataclass, field

from nipper_spark.crawl.politeness import CrawlPolicy
from nipper_spark.crawl.sitemaps import crawl_extract_outlinks
from nipper_spark.functions.url import canonicalize_url, host_bucket, host_of


@dataclass
class OracleResult:
    # per round: ordered list of (url, host, depth, score) actually fetched
    schedules: list[list[tuple[str, str, int, float]]] = field(
        default_factory=list)
    seen: set[str] = field(default_factory=set)
    rounds: int = 0
    # per round: host_bucket -> fresh-URL count (twin of the engine's
    # round_log per-bucket rows; feeds the skew-stats oracle)
    fresh_buckets: list[dict[int, int]] = field(default_factory=list)


def crawl_oracle(pages: dict[str, bytes | str],
                 seeds: list[tuple[str, float]],
                 policy: CrawlPolicy,
                 max_rounds: int = 32) -> OracleResult:
    """BFS in politeness-budgeted rounds with the deterministic total
    order (depth asc, score desc, url asc)."""
    res = OracleResult()
    frontier: dict[str, tuple[int, float]] = {}  # url -> (depth, score)
    for url, score in seeds:
        canon = canonicalize_url(url)
        if canon is None or canon in frontier:
            continue
        if not policy.allowed(host_of(canon), canon):
            continue
        frontier[canon] = (0, float(score))
    res.seen = set(frontier)

    for _ in range(max_rounds):
        if not frontier:
            break
        # wave: per-host top-k under (depth, -score, url)
        by_host: dict[str, list[tuple[int, float, str]]] = {}
        for url, (d, s) in frontier.items():
            by_host.setdefault(host_of(url), []).append((d, s, url))
        wave: list[tuple[str, str, int, float]] = []
        for host, items in by_host.items():
            items.sort(key=lambda t: (t[0], -t[1], t[2]))
            for d, s, url in items[:policy.tokens(host)]:
                wave.append((url, host, d, s))
        wave.sort(key=lambda t: (t[2], -t[3], t[0]))
        res.schedules.append(wave)
        res.rounds += 1
        for url, _, _, _ in wave:
            del frontier[url]

        # fetch + extract (same kernel as the Spark UDF): HTML pages
        # yield a[href] outlinks (priority None → score decay);
        # sitemap-pattern URLs yield parse_sitemap entries — including
        # child sitemaps, which recurse as ordinary frontier rows
        cand: dict[str, tuple[int, float]] = {}
        for url, host, d, s in wave:
            html = pages.get(url)
            if html is None:
                continue
            for dst, prio in crawl_extract_outlinks(
                    url, html,
                    respect_nofollow=policy.respect_nofollow):
                nd = d + 1
                ns = prio if prio is not None else s * policy.score_decay
                if dst in cand:
                    od, os_ = cand[dst]
                    cand[dst] = (min(od, nd), max(os_, ns))
                else:
                    cand[dst] = (nd, ns)

        # robots + depth cap + URL-seen dedup
        buckets: dict[int, int] = {}
        for dst in sorted(cand):
            d, s = cand[dst]
            if d > policy.max_depth:
                continue
            host = host_of(dst)
            if not policy.allowed(host, dst):
                continue
            if dst in res.seen:
                continue
            res.seen.add(dst)
            frontier[dst] = (d, s)
            b = host_bucket(host, policy.n_buckets)
            buckets[b] = buckets.get(b, 0) + 1
        res.fresh_buckets.append(buckets)

        if not frontier:
            break
    return res
