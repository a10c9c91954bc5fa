"""Redirect-chain resolution — 3xx chains → canonical final target.

A web crawl's fetch log is full of redirects (host moves, http→https
upgrades, tracking hops). The frontier must (a) credit the FINAL
target with the fetch, (b) mark every intermediate source URL as seen
so it is never scheduled again, and (c) drop redirect cycles and
over-long chains instead of chasing them forever. The reference
(importcjj/nipper) is a per-page extractor and has no notion of this;
it is core frontier machinery any crawl at 10^10-URL scale needs.

Semantics (ONE pure kernel, `resolve_chain`, shared by the engine,
the DuckDB recursive-CTE oracle and the tests):

- input is a redirect MAP ``url → redirect_to`` (one outgoing edge
  per source; duplicate fetch rows deduplicate to the lexicographic
  min target, deterministically);
- from each source, follow edges while the current node is itself a
  source, up to ``max_hops`` edges;
- landing on a non-source node resolves the chain:
  ``(final_url, hops, resolved=true)``;
- still on a source node after ``max_hops`` edges → cycle or
  over-long chain: ``(NULL, NULL, resolved=false)`` — the crawler
  treats these as fetch errors, exactly like curl's --max-redirs.

Scale shape: the distributed path is pointer jumping (successor ←
successor-of-successor), so a chain of length L resolves in
⌈log₂ L⌉ + 1 rounds, and ⌈log₂ max_hops⌉ + 1 rounds decide EVERY
row — cycles never need cycle detection, they simply fail to resolve
within the round budget. Every round is one self-equi-join on the
(source → state) table, which is redirect-rows-sized, never
corpus-sized; the state is localCheckpoint'ed per round so driver-side
plan analysis stays O(1) per round (the connected_components lesson,
dedup.py:417-422). No Python UDF anywhere in the resolver.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_chain(mapping: dict, src: str, max_hops: int):
    """THE definition. ``mapping`` is the url→redirect_to map; ``src``
    must be a key. Returns (final_url | None, hops | None, resolved).
    """
    cur = src
    hops = 0
    while cur in mapping and hops < max_hops:
        cur = mapping[cur]
        hops += 1
    if cur in mapping:          # budget exhausted on a source: cycle
        return None, None, False  # or chain longer than max_hops
    return cur, hops, True


def resolve_redirects_py(edges, max_hops: int = 16):
    """Single-threaded twin over (url, redirect_to) rows → sorted
    [(url, final_url, hops, resolved)] — the oracle's kernel."""
    mapping: dict[str, str] = {}
    for u, t in edges:
        if u not in mapping or t < mapping[u]:
            mapping[u] = t
    out = []
    for u in sorted(mapping):
        fin, hops, ok = resolve_chain(mapping, u, max_hops)
        out.append((u, fin, hops, ok))
    return out


def resolve_redirects(edges: DataFrame, url_col: str = "url",
                      to_col: str = "redirect_to",
                      max_hops: int = 16) -> DataFrame:
    """(url, redirect_to) rows → (url, final_url, hops, resolved),
    one row per distinct source url. Pointer jumping; matches
    `resolve_redirects_py` exactly (hypothesis-pinned)."""
    m = (edges.groupBy(F.col(url_col).alias("url"))
         .agg(F.min(to_col).alias("cur")))
    srcs = m.select(F.col("url").alias("_s"))
    # done ⇔ cur is not itself a source (left anti would lose the row;
    # a left join marks it)
    state = (m.join(srcs, m["cur"] == srcs["_s"], "left")
             .select("url", "cur", F.lit(1).cast("long").alias("hops"),
                     F.col("_s").isNull().alias("done"))
             .localCheckpoint())
    rounds = max(0, math.ceil(math.log2(max_hops))) if max_hops > 1 else 0
    for _ in range(rounds):
        # jump: not-done rows point at a source, whose state row
        # carries where IT got to and in how many hops
        nxt = state.select(F.col("url").alias("_ju"),
                           F.col("cur").alias("_jc"),
                           F.col("hops").alias("_jh"),
                           F.col("done").alias("_jd"))
        state = (state.join(nxt, state["cur"] == nxt["_ju"], "left")
                 .select(
                     "url",
                     F.when(F.col("done"), F.col("cur"))
                     .otherwise(F.col("_jc")).alias("cur"),
                     F.when(F.col("done"), F.col("hops"))
                     .otherwise(F.col("hops") + F.col("_jh")).alias("hops"),
                     F.when(F.col("done"), F.lit(True))
                     .otherwise(F.coalesce("_jd", F.lit(True)))
                     .alias("done"))
                 .localCheckpoint())
    resolved = F.col("done") & (F.col("hops") <= max_hops)
    return state.select(
        "url",
        F.when(resolved, F.col("cur")).alias("final_url"),
        F.when(resolved, F.col("hops")).cast("long").alias("hops"),
        resolved.alias("resolved"))


def redirect_oracle_sql(edges_sql: str, max_hops: int = 16) -> str:
    """DuckDB recursive-CTE twin of `resolve_redirects`: walks each
    chain step-by-step up to ``max_hops`` edges. ``edges_sql`` must
    yield (url, redirect_to)."""
    return f"""
WITH RECURSIVE m AS (
  SELECT url, min(redirect_to) AS redirect_to
  FROM ({edges_sql}) GROUP BY url),
walk(src, cur, hops) AS (
  SELECT url AS src, redirect_to AS cur, 1 AS hops FROM m
  UNION ALL
  SELECT w.src, m.redirect_to, w.hops + 1
  FROM walk w JOIN m ON w.cur = m.url
  WHERE w.hops < {max_hops}),
fin AS (
  SELECT w.src, w.cur, w.hops
  FROM walk w LEFT JOIN m ON w.cur = m.url
  WHERE m.url IS NULL)
SELECT m.url AS url, fin.cur AS final_url,
       CAST(fin.hops AS BIGINT) AS hops,
       fin.cur IS NOT NULL AS resolved
FROM m LEFT JOIN fin ON m.url = fin.src
"""


def redirect_alias_seen_rows(resolved: DataFrame, policy,
                             round_no: int = 0) -> DataFrame:
    """Resolved redirect SOURCES as SEEN_SCHEMA rows: unioned into the
    crawl's seen state, they stop every intermediate hop from ever
    being scheduled again (the final target is recorded by the normal
    fetch path). Unresolved rows (cycles / over-long chains) are
    included too — re-scheduling a known cycle wastes budget forever.
    """
    from nipper_spark.crawl.frontier import _host_cols

    src = resolved.select("url")
    src = _host_cols(src, policy)
    return src.select("url", "host_bucket", "url_hash",
                      F.lit(int(round_no)).cast("int").alias("round"))
