"""sitemap.xml harvesting → a frontier-shaped seed table.

Real crawls bootstrap discovery from two per-host files: robots.txt
(the restriction side — harvested as per-host tables in robots.py) and
sitemap.xml (the advertisement side). This module closes the discovery
loop the same way: sitemap bodies (rows of the pages table at
``http://host/sitemap.xml[.gz|.txt]``) parse inside a ``mapInPandas``
pass into (host, url, kind, lastmod, priority) entries — executor-side,
never collected to the driver — canonicalized with the engine's own
URL kernel and shaped so a crawl can bootstrap (or top up) its
frontier directly from the corpus.

Format coverage (sitemaps.org protocol, all public):
- ``<urlset>`` entries with loc / lastmod / priority;
- ``<sitemapindex>`` references, emitted as ``kind='sitemap'`` rows so
  a crawler can schedule the child sitemap fetches;
- gzip payloads (magic-byte sniff, stdlib gzip);
- the plain-text one-URL-per-line variant.

Parsing is namespace-agnostic regex scanning of ``<loc>``-level
structure: the sandbox has no lxml, and sitemap files are flat
machine-generated XML where a block scanner is the honest tool (the
WHATWG-grade parser in ``nipper_spark/html`` is for HTML, not XML).

Cross-host entries are dropped (sitemaps.org: a sitemap may only
advertise URLs on its own host — the standard spam protection real
crawlers enforce).
"""

from __future__ import annotations

import gzip
import html as _htmlmod
import re
import zlib

from nipper_spark.functions.url import canonicalize_url, host_of

# (?:\w+:)? — sitemap generators occasionally emit prefixed namespaces
# (<sm:urlset xmlns:sm=...>); the scanner matches the LOCAL name
_BLOCK_RE = re.compile(
    r"<(?:\w+:)?(url|sitemap)\b[^>]*>(.*?)</(?:\w+:)?\1\s*>",
    re.S | re.I)
_LOC_RE = re.compile(
    r"<(?:\w+:)?loc\b[^>]*>\s*(.*?)\s*</(?:\w+:)?loc\s*>", re.S | re.I)
_LASTMOD_RE = re.compile(
    r"<(?:\w+:)?lastmod\b[^>]*>\s*(.*?)\s*</(?:\w+:)?lastmod\s*>",
    re.S | re.I)
_PRIORITY_RE = re.compile(
    r"<(?:\w+:)?priority\b[^>]*>\s*(.*?)\s*</(?:\w+:)?priority\s*>",
    re.S | re.I)
_HAS_XML_RE = re.compile(
    r"<\s*(\?xml|(?:\w+:)?urlset|(?:\w+:)?sitemapindex)\b", re.I)
_CDATA_RE = re.compile(r"^<!\[CDATA\[(.*?)\]\]>$", re.S)


def _elem_text(raw: str) -> str:
    """Element text per XML rules: CDATA content is LITERAL (no entity
    decoding); everything else entity-unescapes."""
    m = _CDATA_RE.match(raw)
    return m.group(1) if m is not None else _htmlmod.unescape(raw)


def parse_sitemap(body: bytes | str) -> list[tuple[str, str,
                                                   str | None,
                                                   float | None]]:
    """One sitemap body → ``[(kind, loc, lastmod, priority), ...]``
    with ``kind`` in ``{'url', 'sitemap'}``. Pure function (the oracle
    twin runs the same kernel). Garbage in → empty list, never a
    raise."""
    if isinstance(body, (bytes, bytearray)):
        data = bytes(body)
        if data[:2] == b"\x1f\x8b":  # gzip magic
            try:
                data = gzip.decompress(data)
            except (OSError, EOFError, zlib.error):
                return []
        text = data.decode("utf-8", errors="replace")
    else:
        text = body or ""
    text = text.lstrip("﻿")  # BOM must not poison line 1 / <?xml
    out: list[tuple[str, str, str | None, float | None]] = []
    if _HAS_XML_RE.search(text) is not None:
        for m in _BLOCK_RE.finditer(text):
            kind = m.group(1).lower()
            block = m.group(2)
            locm = _LOC_RE.search(block)
            if locm is None:
                continue
            loc = _elem_text(locm.group(1))
            lastmod_m = _LASTMOD_RE.search(block)
            lastmod = _elem_text(lastmod_m.group(1)) if lastmod_m \
                else None
            priority: float | None = None
            pm = _PRIORITY_RE.search(block)
            if pm is not None:
                try:
                    priority = float(pm.group(1))
                except ValueError:
                    priority = None
            out.append((kind, loc, lastmod, priority))
        return out
    # plain-text variant: one URL per line, nothing else is legal
    for line in text.splitlines():
        line = line.strip()
        if line.lower().startswith(("http://", "https://")):
            out.append(("url", line, None, None))
    return out


# anchored to the PATH component, with an optional query suffix:
# paginated sitemaps (sitemap.xml?page=2) are common on large sites and
# canonicalize_url preserves the query — end-anchoring on the full URL
# would silently dispatch them to the HTML extractor. One pattern
# string, legal in both Python re and Java rlike.
_SITEMAP_URL_RE = r"/sitemap[^/?#]*\.(xml|xml\.gz|txt)(\?.*)?$"
SITEMAP_SCHEMA = ("host string, url string, kind string, "
                  "lastmod string, priority double")


def is_sitemap_url(url: str) -> bool:
    """Fetch-dispatch heuristic shared by engine and oracle: a frontier
    row whose URL path looks like a sitemap is parsed with
    :func:`parse_sitemap` instead of the HTML extractor."""
    return re.search(_SITEMAP_URL_RE, url) is not None


def sitemap_outlinks(url: str, body) -> list[tuple[str, float | None]]:
    """Fetched-sitemap body → sorted ``[(canonical dst, priority|None)]``.

    Emits BOTH ``kind='url'`` page advertisements and ``kind='sitemap'``
    child references — the recursion step: a child sitemap URL becomes
    an ordinary fetchable frontier row (politeness-budgeted,
    robots-checked, deduped) and is parsed as a sitemap when its body
    is fetched in a later round, so a sitemapindex chain discovered
    mid-crawl is followed to any depth. Same-host filter and
    canonicalization as :func:`harvest_sitemap_tables`; duplicate locs
    keep the max priority. Pure kernel — the crawl oracle runs the
    identical function."""
    host = host_of(url)
    if not host:
        return []
    acc: dict[str, float | None] = {}
    for _kind, loc, _lastmod, prio in parse_sitemap(
            body if body is not None else b""):
        canon = canonicalize_url(loc)
        if canon is None or host_of(canon) != host:
            continue
        old = acc.get(canon)
        if canon not in acc or (prio is not None
                                and (old is None or prio > old)):
            acc[canon] = prio
    return sorted(acc.items())


def crawl_extract_outlinks(url: str, body,
                           respect_nofollow: bool = False
                           ) -> list[tuple[str, float | None]]:
    """THE fetch-extraction kernel of a crawl round: sitemap-pattern
    URLs parse as sitemaps (priorities surface so the scheduler can
    honor them); everything else takes the WHATWG parse + ``a[href]``
    path (priority ``None`` → the caller applies score decay), with
    optional rel=nofollow / meta-robots honoring (CrawlPolicy.
    respect_nofollow). Shared verbatim by the Spark round UDF and the
    single-threaded oracle."""
    if is_sitemap_url(url):
        return sitemap_outlinks(url, body)
    from nipper_spark.functions.html_udfs import extract_text_and_links
    _, links, _, _ = extract_text_and_links(
        url, body, respect_nofollow=respect_nofollow)
    return [(dst, None) for dst in links]


def harvest_sitemap_tables(pages_df):
    """Executor-side harvest: sitemap rows of the pages table parse
    inside ``mapInPandas`` (same :func:`parse_sitemap` kernel the
    oracle twin uses) and come back as ONE entries DataFrame

        (host, url, kind, lastmod, priority)

    canonicalized, same-host-filtered, deduplicated per (host, url,
    kind) keeping the max lastmod/priority. Shaped like every other
    dimension table in the engine: at 10^8 sitemap hosts this is a
    scan + map + one host-keyed aggregation — no driver state."""
    from pyspark.sql import functions as F

    sitemaps = (pages_df
                .filter(F.col("url").rlike(_SITEMAP_URL_RE))
                .select("url", "html"))

    def _parse(batches):
        import pandas as pd
        for pdf in batches:
            hosts, urls, kinds, lastmods, prios = [], [], [], [], []
            for smap_url, body in zip(pdf["url"], pdf["html"]):
                smap_host = host_of(smap_url)
                if not smap_host:
                    continue
                for kind, loc, lastmod, prio in parse_sitemap(
                        body if body is not None else b""):
                    canon = canonicalize_url(loc)
                    if canon is None:
                        continue
                    if host_of(canon) != smap_host:
                        continue  # cross-host advertisement: dropped
                    hosts.append(smap_host)
                    urls.append(canon)
                    kinds.append(kind)
                    lastmods.append(lastmod)
                    prios.append(prio)
            yield pd.DataFrame({
                "host": hosts, "url": urls, "kind": kinds,
                "lastmod": lastmods,
                "priority": pd.array(prios, dtype="float64")})

    entries = sitemaps.mapInPandas(_parse, schema=SITEMAP_SCHEMA)
    return (entries.groupBy("host", "url", "kind")
            .agg(F.max("lastmod").alias("lastmod"),
                 F.max("priority").alias("priority")))


def harvest_sitemap_entries_py(pages_rows):
    """Single-threaded twin of :func:`harvest_sitemap_tables` for the
    driver oracle: same :func:`parse_sitemap` kernel, same
    canonicalize/same-host/dedup rules, over ``(url, body)`` pairs.
    Returns sorted ``(host, url, kind, lastmod, priority)`` tuples."""
    acc: dict[tuple[str, str, str], list] = {}
    for smap_url, body in pages_rows:
        if re.search(_SITEMAP_URL_RE, smap_url) is None:
            continue
        smap_host = host_of(smap_url)
        if not smap_host:
            continue
        for kind, loc, lastmod, prio in parse_sitemap(
                body if body is not None else b""):
            canon = canonicalize_url(loc)
            if canon is None or host_of(canon) != smap_host:
                continue
            cur = acc.setdefault((smap_host, canon, kind), [None, None])
            if lastmod is not None and (cur[0] is None or lastmod > cur[0]):
                cur[0] = lastmod
            if prio is not None and (cur[1] is None or prio > cur[1]):
                cur[1] = prio
    return sorted((h, u, k, lm, p)
                  for (h, u, k), (lm, p) in acc.items())


def synth_sitemap_rows(n_hosts: int = 6, urls_per_host: int = 5,
                       seed: int = 42) -> list[tuple]:
    """Deterministic sitemap pages-table rows (PAGES_SCHEMA shape) for
    the driver query and its oracle twin: per host, one of three
    variants — plain urlset (with priorities/lastmods, an escaped
    query URL, and a cross-host spam entry that must be dropped),
    sitemapindex + gzipped child, or the plain-text format."""
    import datetime
    import random

    rnd = random.Random(seed)
    ts = datetime.datetime(2026, 1, 1)
    rows = []
    for h in range(n_hosts):
        host = f"smap{h:02d}.test"
        urls = [f"http://{host}/doc/{i}" for i in range(urls_per_host)]
        entries = []
        for i, u in enumerate(urls):
            prio = (round(rnd.randrange(0, 11) / 10.0, 1)
                    if rnd.random() < 0.7 else None)
            lastmod = (f"2026-0{1 + (i % 9)}-15"
                       if rnd.random() < 0.5 else None)
            entries.append((u, lastmod, prio))
        variant = h % 3
        if variant == 0:
            body = "<urlset>"
            for u, lastmod, prio in entries:
                body += f"<url><loc>{u}</loc>"
                if lastmod:
                    body += f"<lastmod>{lastmod}</lastmod>"
                if prio is not None:
                    body += f"<priority>{prio}</priority>"
                body += "</url>"
            body += (f"<url><loc>http://{host}/q?b=2&amp;a=1</loc></url>"
                     "<url><loc>http://spam.example/x</loc></url>"
                     "</urlset>")
            rows.append((f"http://{host}/sitemap.xml", ts,
                         body.encode(), None, "en"))
        elif variant == 1:
            child = "<urlset>" + "".join(
                f"<url><loc>{u}</loc></url>" for u, _, _ in entries) \
                + "</urlset>"
            rows.append((f"http://{host}/sitemap.xml", ts,
                         (f"<sitemapindex><sitemap><loc>http://{host}"
                          "/sitemap-0.xml.gz</loc></sitemap>"
                          "</sitemapindex>").encode(), None, "en"))
            rows.append((f"http://{host}/sitemap-0.xml.gz", ts,
                         gzip.compress(child.encode()), None, "en"))
        else:
            rows.append((f"http://{host}/sitemap.txt", ts,
                         ("\n".join(u for u, _, _ in entries) + "\n")
                         .encode(), None, "en"))
    return rows


def sitemap_seed_frontier(entries_df, policy, default_score: float = 0.5):
    """``kind='url'`` entries → a FRONTIER_SCHEMA-shaped DataFrame
    (depth 0, score = sitemap priority or ``default_score``,
    discovered_round 0) ready for
    :meth:`FrontierEngine.bootstrap_from_df`. Stays a DataFrame end to
    end — the 10^10-scale path for seeding a crawl from harvested
    sitemaps (the list-based ``bootstrap`` is for driver-side seed
    lists, which are bounded by contract)."""
    from pyspark.sql import functions as F

    from nipper_spark.crawl.frontier import _host_cols

    seeds = (entries_df.filter(F.col("kind") == "url")
             .select("url",
                     F.coalesce(F.col("priority"),
                                F.lit(float(default_score)))
                     .alias("score")))
    seeds = _host_cols(seeds, policy)
    return seeds.select(
        "url", "host", "host_bucket",
        F.lit(0).cast("int").alias("depth"),
        F.col("score").cast("double").alias("score"),
        F.lit(0).cast("int").alias("discovered_round"))


def sitemap_refresh_frontier(entries_df, fetch_log_df, policy,
                             default_score: float = 0.5,
                             round_no: int = 0):
    """Stale-URL detection — the REFRESH step of the sitemap
    lifecycle (discovery → bootstrap → recursive fetch → refresh):
    ``kind='url'`` entries whose advertised ``lastmod`` is strictly
    newer than the URL's last fetch become a FRONTIER_SCHEMA-shaped
    re-seed table for the next crawl generation.

    ``fetch_log_df`` is (url, fetched_at); both sides are W3C-datetime
    strings (sitemaps.org mandates the format), compared as PARSED
    TIMESTAMPS (``try_to_timestamp`` — native, still a pure Catalyst
    filter): mixed granularity (date-only vs full datetime) and
    numeric timezone offsets compare by instant, not lexicographically.
    Zone-less values are interpreted in the Spark session timezone
    (UTC in this deployment; the single-threaded twin assumes UTC for
    them). Unparseable values on either side → NULL → excluded. The
    inner join keeps only previously-fetched URLs (never-fetched
    advertisements are the bootstrap/top-up path's job, not
    refresh's).

    Scale shape: url-equi join (broadcast when the entries table is
    known-small, shuffle otherwise — the caller controls via the same
    size-guard conventions as every dimension join) + narrow
    projection. The output seeds a NEW crawl state (the engine's seen
    set is per-generation by design: refresh = re-fetch despite seen,
    which is exactly a new generation bootstrapped from stale URLs,
    same as production batch crawlers).
    """
    from pyspark.sql import functions as F

    from nipper_spark.crawl.frontier import _host_cols

    stale = (entries_df
             .filter((F.col("kind") == "url") &
                     F.col("lastmod").isNotNull())
             .join(fetch_log_df.select("url", "fetched_at"), "url")
             .filter(F.try_to_timestamp("lastmod") >
                     F.try_to_timestamp("fetched_at")))
    seeds = stale.select(
        "url",
        F.coalesce(F.col("priority"), F.lit(float(default_score)))
        .alias("score"))
    seeds = _host_cols(seeds, policy)
    return seeds.select(
        "url", "host", "host_bucket",
        F.lit(0).cast("int").alias("depth"),
        F.col("score").cast("double").alias("score"),
        F.lit(int(round_no)).cast("int").alias("discovered_round"))


def sitemap_refresh_py(entries, fetch_log,
                       default_score: float = 0.5):
    """Single-threaded twin of :func:`sitemap_refresh_frontier` for
    the oracle: entries as (host, url, kind, lastmod, priority)
    tuples, fetch_log as {url: fetched_at}. Returns sorted
    (url, score) pairs."""
    import datetime

    def _parse(v):
        try:
            dt = datetime.datetime.fromisoformat(
                v.replace("Z", "+00:00"))
        except (ValueError, AttributeError):
            return None
        if dt.tzinfo is None:  # zone-less → UTC (session tz contract)
            dt = dt.replace(tzinfo=datetime.timezone.utc)
        return dt

    out = []
    for _host, url, kind, lastmod, priority in entries:
        if kind != "url" or lastmod is None:
            continue
        lm = _parse(lastmod)
        fa = _parse(fetch_log.get(url))
        if lm is None or fa is None or not lm > fa:
            continue
        out.append((url, priority if priority is not None
                    else float(default_score)))
    return sorted(out)
